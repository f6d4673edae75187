"""Event-time tumbling windows + watermark (ST5 extension).

The watermark progression is made deterministic by splitting the input
across separate availableNow runs sharing one checkpoint: each run is
its own micro-batch sequence, and the watermark persists in the
checkpoint between runs (exactly how a resumed production stream
behaves)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crawler_spark import schemas as S
from crawler_spark.operators.windows import (
    event_tumbling_agg,
    fetch_rate_windows,
    stream_fetch_rate_windows,
)


def write_log_file(d, name, rows):
    """rows: list of (round, url, status, bytes) matching FETCH_LOG."""
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int32()),
            "url": pa.array([r[1] for r in rows], pa.string()),
            "status": pa.array([r[2] for r in rows], pa.int32()),
            "bytes": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, name))


def test_fetch_rate_windows_batch(spark):
    log = spark.createDataFrame(
        [
            (0, "u0", 200, 10),
            (1, "u1", 404, 0),
            (2, "u6", 429, 0),
            (3, "u7", 597, 0),
            (4, "u2", 200, 5),
            (5, "u3", 0, 0),
            (7, "u4", 503, 1),
            (8, "u8", 599, 0),
            (9, "u9", 451, 0),
            (12, "u5", 200, 2),
        ],
        S.FETCH_LOG,
    )
    got = {
        (r.w_round, r.status_class): (r.n_fetches, r.bytes)
        for r in fetch_rate_windows(log, rounds_per_window=5).collect()
    }
    assert got == {
        (0, "ok"): (2, 15),
        (0, "not_found"): (1, 0),
        # 429 must stay distinguishable — it IS the backoff signal
        (0, "rate_limit"): (1, 0),
        (0, "sitemap"): (1, 0),
        (5, "timeout"): (1, 0),
        (5, "server_error"): (1, 1),
        (5, "transport"): (1, 0),
        (5, "client_error"): (1, 0),
        (10, "ok"): (1, 2),
    }


def test_stream_fetch_rate_windows_watermark_drops_late(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = stream_fetch_rate_windows(
            spark, log_dir, ckpt, out_dir, rounds_per_window=5, late_rounds=2
        )
        q.awaitTermination(180)

    # run 1: rounds 0..9 -> watermark = 540s - 120s = 420s after the batch
    on_time = [(r, f"u{r}", 200, r) for r in range(10)]
    write_log_file(log_dir, "f1.parquet", on_time)
    run()

    # run 2: rounds 10..13 advance the watermark to 660s (> 600s, so the
    # [300,600) window finalizes); one STRAGGLER for round 0 arrives 13
    # rounds late — far past the 2-round lateness bound -> dropped
    tail = [(r, f"u{r}", 200, r) for r in range(10, 14)]
    write_log_file(log_dir, "f2.parquet", tail + [(0, "late", 200, 999)])
    run()

    # run 3: one more round so the emission of [300,600) does not depend
    # on the optional no-data flush micro-batch
    write_log_file(log_dir, "f3.parquet", [(14, "u14", 200, 14)])
    run()

    got = {
        (r.w_round, r.status_class): (r.n_fetches, r.bytes)
        for r in spark.read.parquet(out_dir).collect()
    }
    # finalized: [0,300) and [300,600). [600,900) stays open (watermark
    # 720s < 900s). The late round-0 row (bytes=999) is NOT in [0,300).
    assert got == {
        (0, "ok"): (5, sum(range(5))),
        (5, "ok"): (5, sum(range(5, 10))),
    }

    # batch twin on the on-time rows, restricted to the finalized
    # windows, is row-identical to what the stream emitted
    batch = fetch_rate_windows(
        spark.createDataFrame(on_time + tail + [(14, "u14", 200, 14)], S.FETCH_LOG),
        rounds_per_window=5,
    ).filter(F.col("w_round") < 10)
    want = {
        (r.w_round, r.status_class): (r.n_fetches, r.bytes) for r in batch.collect()
    }
    assert got == want


def test_event_tumbling_agg_matches_duckdb(spark, tmp_path):
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    got = {
        (r.w_start, r.event_type): (r.n_events, r.sum_value)
        for r in event_tumbling_agg(ev, "10 minutes").collect()
    }
    con = duckdb.connect()
    want = {
        (int(w), t): (int(n), float(s))
        for w, t, n, s in con.execute(
            f"""
            SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT) AS w_start,
                   event_type, count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE), 2) AS sum_value
            FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want
