"""Structured Streaming monitor equivalents (S3/ST1-ST2)."""

import os

from crawler_spark import schemas as S
from crawler_spark.engine import ENGINE_SCHEMAS
from crawler_spark.functions.urls import md5_hex
from crawler_spark.io.snapshot import ParquetSnapshotIO
from crawler_spark.streaming import (
    drain_pending_ingest,
    stream_fetch_metrics,
    stream_frontier_ingest,
)


def write_urls_file(d, name, urls):
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, name + ".tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(urls) + "\n\n")  # trailing blank line (P7)
    os.rename(tmp, os.path.join(d, name))


def test_stream_frontier_ingest_dedups_across_batches(spark, tmp_path):
    urls_dir = str(tmp_path / "urls")
    io = ParquetSnapshotIO(str(tmp_path / "snap"), schemas=ENGINE_SCHEMAS)
    io.commit(0, overwrites={"frontier": spark.createDataFrame([], S.FRONTIER)})

    write_urls_file(urls_dir, "site_a.txt", [
        "https://a.com/p/1", "https://a.com/p/2", "https://a.com/p/1",  # in-file dup
    ])
    q = stream_frontier_ingest(spark, urls_dir, io, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    # stream stages into pending_ingest; drain folds into the frontier
    assert len(io.table_rels("pending_ingest")) > 0
    drain_pending_ingest(spark, io)
    assert io.table_rels("pending_ingest") == []  # consumed atomically
    got = {r.url for r in io.read(spark, "frontier").collect()}
    assert got == {"https://a.com/p/1", "https://a.com/p/2"}

    # new file arrives: one dup against history, one genuinely new
    write_urls_file(urls_dir, "site_b.txt", ["https://a.com/p/2", "https://b.com/x"])
    q2 = stream_frontier_ingest(spark, urls_dir, io, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    drain_pending_ingest(spark, io)
    rows = io.read(spark, "frontier").collect()
    assert {r.url for r in rows} == {
        "https://a.com/p/1", "https://a.com/p/2", "https://b.com/x"
    }
    assert len(rows) == 3  # no dup rows
    by_url = {r.url: r for r in rows}
    assert by_url["https://b.com/x"].url_hash == md5_hex("https://b.com/x")
    assert all(r.state == "pending" for r in rows)


def test_stream_fetch_metrics(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(
        [(1, "u1", 200, 10), (1, "u2", 404, 0), (2, "u3", 200, 20)], S.FETCH_LOG
    ).write.parquet(log_dir)
    q = stream_fetch_metrics(spark, log_dir, str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    out = {r.status: (r.n, r.bytes) for r in spark.sql("select * from fetch_metrics").collect()}
    assert out[200] == (2, 30)
    assert out[404] == (1, 0)


def test_stream_host_politeness_state(spark, tmp_path):
    """applyInPandasWithState: budget + 429 backoff carried across
    triggers in the state store."""
    from crawler_spark.oracle import backoff_rounds
    from crawler_spark.streaming import stream_host_politeness

    log_dir = str(tmp_path / "results")
    ck = str(tmp_path / "ck3")
    # trigger 1: round 1, host a.com gets 2 results (budget 1) incl a 429
    spark.createDataFrame(
        [(1, "https://a.com/x", 429, 0), (1, "https://a.com/y", 200, 5),
         (1, "https://b.com/z", 200, 7)],
        S.FETCH_LOG,
    ).coalesce(1).write.mode("append").parquet(log_dir)
    out_dir = str(tmp_path / "decisions")
    q = stream_host_politeness(spark, log_dir, ck, out_dir, budget=1)
    q.awaitTermination(120)
    rows = {(r.host, r.round): r for r in spark.read.parquet(out_dir).collect()}
    a1 = rows[("a.com", 1)]
    until = 1 + backoff_rounds("a.com", 1)
    assert (a1.allowed, a1.deferred, a1.backoff_until) == (1, 1, until)
    assert rows[("b.com", 1)].allowed == 1 and rows[("b.com", 1)].backoff_until == -1
    # trigger 2 (new files, resumed checkpoint): a.com still in backoff
    rnd2 = 2
    assert rnd2 < until
    spark.createDataFrame(
        [(rnd2, "https://a.com/w", 200, 3), (rnd2, "https://b.com/q", 200, 2)], S.FETCH_LOG
    ).coalesce(1).write.mode("append").parquet(log_dir)
    q2 = stream_host_politeness(spark, log_dir, ck, out_dir, budget=1)
    q2.awaitTermination(120)
    rows2 = {(r.host, r.round): r for r in spark.read.parquet(out_dir).collect()}
    a2 = rows2[("a.com", rnd2)]
    assert (a2.allowed, a2.deferred) == (0, 1)  # backoff survived the restart
    assert rows2[("b.com", rnd2)].allowed == 1


def test_streaming_ingest_feeds_engine_crawl(spark, tmp_path):
    """S3 end-to-end: the streaming url-monitor fills the frontier, the
    round loop crawls it — the reference's file-bus handoff
    (app.py:112-135 -> crawler.py:279-348) as stream -> batch rounds."""
    from pyspark.sql import functions as F

    from crawler_spark.engine import CrawlEngine
    from crawler_spark.world import make_world

    world = make_world(seed=71, n_hosts=2, n_urls=12, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path / "snap"), embed_dim=0)
    # seed an EMPTY frontier, then let the stream deliver the URL files
    eng.seed(spark.createDataFrame([], "url string, site string"))
    urls_dir = str(tmp_path / "urls")
    by_site = {}
    for r in world.web.itertuples(index=False):
        if "#" in r.url or r.url != r.url.lower():
            continue
        by_site.setdefault(r.host.replace(".", "_"), []).append(r.url)
    for site, urls in by_site.items():
        write_urls_file(urls_dir, f"{site}.txt", sorted(urls))
    q = stream_frontier_ingest(spark, urls_dir, eng.io, str(tmp_path / "ck"))
    q.awaitTermination(120)
    # the round loop drains the staging table itself at round start
    eng.drain_ingest()
    assert eng.io.read(spark, "frontier").filter(F.col("state") == "pending").count() > 0
    eng._control_rows = []
    s1 = eng.run_round(eng.io.last_round() + 1, t)
    assert s1["fetched"] > 0
    seen = eng.io.read(spark, "seen")
    assert seen.count() == s1["fetched"]


def test_stream_document_curation(spark, tmp_path):
    """Streaming gates == batch gates; cross-batch exact dedup keeps the
    first-arrival canonical row only."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.text import text_profile
    from crawler_spark.streaming import stream_document_curation

    docs_dir = str(tmp_path / "docs-in")
    os.makedirs(docs_dir)
    io = ParquetSnapshotIO(str(tmp_path / "snap"))

    good = ("the quick brown fox jumps over the lazy dog and then "
            "the fox sleeps in the sun for a while longer today")
    spam = "x" * 3
    batch1 = [(1, good), (2, good + " extra"), (3, spam)]
    batch2 = [(4, good), (5, "a different but equally fine sentence about "
                             "the quiet dog and the old fox in the garden")]
    spark.createDataFrame(batch1, "doc_id long, text string").coalesce(1).write.parquet(
        docs_dir + "/b1"
    )
    # file source needs a flat dir of files; write parts directly
    import glob, shutil as sh
    for i, b in enumerate((batch1, batch2)):
        d = str(tmp_path / f"stage{i}")
        spark.createDataFrame(b, "doc_id long, text string").coalesce(1).write.parquet(d)
        for f in glob.glob(d + "/*.parquet"):
            sh.copy(f, f"{docs_dir}/batch{i}.parquet")

    q = stream_document_curation(
        spark, docs_dir, io, str(tmp_path / "ckpt"), min_tokens=5
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: r for r in io.read(spark, "curated_docs").collect()}
    all_docs = spark.createDataFrame(
        batch1 + batch2, "doc_id long, text string"
    )
    want_kept = {
        r["doc_id"]: r
        for r in text_profile(all_docs)
        .filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5)
                & (F.col("pred_lang") != "und"))
        .collect()
    }
    # doc 4 duplicates doc 1's text -> only the min-id canonical stays
    assert 1 in got and 4 not in got
    assert 3 not in got  # gated out
    # every kept row matches the batch profile values
    for did, r in got.items():
        w = want_kept[did]
        assert (r["n_tokens"], r["pred_lang"], r["fingerprint"]) == (
            w["n_tokens"], w["pred_lang"], w["fingerprint"]
        )
    # fingerprints are unique (cross-batch dedup held)
    fps = [r["fingerprint"] for r in got.values()]
    assert len(fps) == len(set(fps))
    # restart over the same input is a no-op (replay-safe)
    n_before = len(got)
    q2 = stream_document_curation(
        spark, docs_dir, io, str(tmp_path / "ckpt"), min_tokens=5
    )
    q2.awaitTermination(120)
    assert io.read(spark, "curated_docs").count() == n_before
