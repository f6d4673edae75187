"""Event-time tumbling windows with watermarked late-data semantics.

The reference has no windowed aggregation (its status page is
all-time counters, SURVEY.md §2.10 ST5 n/a) — this module is the
north-rule extension that makes the crawl metrics a *live* view: fetch
throughput per event-time window, finalized by a watermark so late
stragglers past the allowed lateness are dropped instead of reopening
closed windows (Structured Streaming append-mode semantics).

Determinism rule (schemas.py): rounds are the engine's time quantum,
so the fetch-log's event time is the deterministic mapping
round -> timestamp_seconds(round * seconds_per_round); no wall clock
enters keyed data. The batch twin (`event_tumbling_agg`,
`fetch_rate_windows`) computes the identical aggregation relationally
— one shuffle on (window, key), partial aggregation map-side, no UDFs
— and is what the DuckDB oracle certifies (time_bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import schemas as S

SECONDS_PER_ROUND = 60


def round_event_time(round_col: Column, seconds_per_round: int = SECONDS_PER_ROUND) -> Column:
    """Deterministic event time for round-quantized rows."""
    return F.timestamp_seconds(round_col.cast("long") * seconds_per_round)


def _windowed(df: DataFrame, ts_col: str, window: str, keys: list[str]) -> DataFrame:
    return df.groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)


def event_tumbling_agg(
    events: DataFrame,
    window: str = "10 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Batch tumbling-window aggregation over an event table.

    Emits one row per (window start, *keys): event count + exact sum of
    `value_col` (DECIMAL-aggregated, emitted as rounded double so the
    result is order-independent). Window start is exported as epoch
    seconds (BIGINT) — raw timestamps don't hash identically across
    engines.
    """
    keys = ["event_type"] if keys is None else keys
    agg = _windowed(events, ts_col, window, keys).agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(27,6)")).cast("double"), 2
        ).alias("sum_value"),
    )
    return agg.select(
        F.unix_timestamp(F.col("w.start")).alias("w_start"),
        *keys,
        "n_events",
        "sum_value",
    )


def fetch_rate_windows(
    fetch_log: DataFrame,
    rounds_per_window: int = 5,
    seconds_per_round: int = SECONDS_PER_ROUND,
) -> DataFrame:
    """Crawl throughput per tumbling round-window and status class.

    The batch twin of `stream_fetch_rate_windows`: URLs fetched and
    bytes moved per `rounds_per_window`-round window, split by status
    class (ok / client_error / server_error / timeout — the status
    taxonomy of status.categorize, reference app.py:704-714).
    """
    ev = fetch_log.withColumn(
        "ts", round_event_time(F.col("round"), seconds_per_round)
    ).withColumn("status_class", status_class(F.col("status")))
    dur = f"{rounds_per_window * seconds_per_round} seconds"
    agg = _windowed(ev, "ts", dur, ["status_class"]).agg(
        F.count("*").alias("n_fetches"), F.sum("bytes").alias("bytes")
    )
    return agg.select(
        (F.unix_timestamp(F.col("w.start")) / seconds_per_round)
        .cast("int")
        .alias("w_round"),
        "status_class",
        "n_fetches",
        "bytes",
    )


def status_class(status: Column) -> Column:
    """2xx plus the reference's error taxonomy (app.py:704-714 — the
    status.error_log categories), refined with real-HTTP 4xx/5xx
    classes: rate_limit (429) stays its own class — it's the
    backoff-pressure signal the throughput windows exist to surface —
    and the synthetic statuses keep their identities (597 sitemap,
    599 transport, 0 timeout) instead of reading as 5xx."""
    from crawler_spark.operators.fetch import TRANSPORT_ERROR_STATUS
    from crawler_spark.schemas import SITEMAP_ERROR_STATUS

    return (
        F.when((status >= 200) & (status < 300), F.lit("ok"))
        .when(status == SITEMAP_ERROR_STATUS, F.lit("sitemap"))
        .when(status == TRANSPORT_ERROR_STATUS, F.lit("transport"))
        .when(status == 429, F.lit("rate_limit"))
        .when(status == 404, F.lit("not_found"))
        .when(status == 0, F.lit("timeout"))
        .when((status >= 400) & (status < 500), F.lit("client_error"))
        .when((status >= 500) & (status < 600), F.lit("server_error"))
        .otherwise(F.lit("general"))
    )


def stream_fetch_rate_windows(
    spark: SparkSession,
    fetch_log_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    rounds_per_window: int = 5,
    late_rounds: int = 2,
    seconds_per_round: int = SECONDS_PER_ROUND,
    max_files_per_trigger: int | None = None,
):
    """Streaming fetch-throughput windows with a watermark (ST5).

    Append-mode windowed aggregation: a window is emitted exactly once,
    when the watermark (max event time seen minus `late_rounds` rounds)
    passes its end; results land in a durable parquet sink. Rows
    arriving more than `late_rounds` rounds after the fact are DROPPED
    by the watermark — closed windows never reopen, so downstream
    consumers of the sink can treat every row as final. Resumes from
    checkpoint like every other stream in the engine.
    """
    reader = spark.readStream.schema(S.FETCH_LOG)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(fetch_log_dir)
    ev = (
        raw.withColumn("ts", round_event_time(F.col("round"), seconds_per_round))
        .withColumn("status_class", status_class(F.col("status")))
        .withWatermark("ts", f"{late_rounds * seconds_per_round} seconds")
    )
    dur = f"{rounds_per_window * seconds_per_round} seconds"
    agg = (
        ev.groupBy(F.window("ts", dur).alias("w"), "status_class")
        .agg(F.count("*").alias("n_fetches"), F.sum("bytes").alias("bytes"))
        .select(
            (F.unix_timestamp(F.col("w.start")) / seconds_per_round)
            .cast("int")
            .alias("w_round"),
            "status_class",
            "n_fetches",
            "bytes",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
