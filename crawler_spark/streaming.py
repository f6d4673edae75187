"""Structured Streaming variant of the reference's monitor loops.

The reference polls directories on an interval and reloads files whose
mtime changed (url monitor crawler.py:279-348, json monitor :365-417,
embeddings monitor :460-512). Structured Streaming's file source IS
that pattern done right: the offset log replaces the mtime watermark,
exactly-once per file, resumable from checkpoint.

`stream_frontier_ingest` is the url-monitor equivalent: watch a
directory of URL-list text files (the reference's data/urls/*.txt bus,
app.py:112-135), canonicalize/hash each line, drop duplicates against
streaming state AND against the already-committed frontier, and append
new pending rows per micro-batch via foreachBatch (the MERGE INTO
pattern). Trigger availableNow in tests ≙ the 5s poll tick in
production (Trigger.ProcessingTime('5 seconds')).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import schemas as S
from crawler_spark.functions.urls import with_url_keys
from crawler_spark.io.snapshot import ParquetSnapshotIO


def parse_url_lines(raw: DataFrame, mode: str = "reference") -> DataFrame:
    """text lines -> frontier-shaped rows (P7 blank filter + URL keys)."""
    urls = raw.select(F.trim(F.col("value")).alias("url")).filter(F.length("url") > 0)
    return (
        with_url_keys(urls, mode=mode)
        .withColumn("depth", F.lit(0))
        .withColumn("discovered_round", F.lit(0))
        .withColumn("state", F.lit(S.PENDING))
    )


def stream_frontier_ingest(
    spark: SparkSession,
    urls_dir: str,
    io: ParquetSnapshotIO,
    checkpoint_dir: str,
    mode: str = "reference",
    trigger_seconds: int | None = None,
):
    """Start the streaming url-monitor; returns the StreamingQuery.

    Per micro-batch: in-batch dedup (dropDuplicates on url_hash —
    bounded: one batch), then ONE append to the `pending_ingest` staging
    table. The round loop folds staged rows into the frontier at round
    start (`CrawlEngine.drain_ingest`), anti-joining against frontier
    and seen there. Staging instead of touching the frontier directly
    means the stream and the engine never write the same table — the old
    read-union-overwrite sink silently lost the loser's rows when both
    writers raced on the frontier pointer. Exactly-once: the file-source
    offset log advances per batch; drain_ingest consumes the staged
    delta paths atomically with its frontier append and is idempotent
    on replay (anti-join vs base).
    """
    raw = spark.readStream.format("text").load(urls_dir)
    parsed = parse_url_lines(raw, mode)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # processingTime triggers fire on a clock, data or not: an
            # empty batch must NOT commit — each commit is a snapshot
            # version + an (empty) pending_ingest delta + a turn of the
            # cross-process flock, i.e. pure manifest churn that starves
            # the round loop's commits under a fast trigger
            return
        new_rows = batch_df.dropDuplicates(["url_hash"]).select(
            *[f.name for f in S.FRONTIER.fields]
        )
        io.commit(
            int(io.last_round()),
            appends={"pending_ingest": new_rows.coalesce(1)},
            meta={"stream_batch": batch_id},
        )

    writer = (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_pending_ingest(spark: SparkSession, io: ParquetSnapshotIO, coalesce: int | None = 1) -> int:
    """Fold staged pending_ingest rows into the frontier base.

    Pins the staged delta paths FIRST and consumes exactly those in the
    same atomic commit that appends the merged rows — a concurrent
    stream append between pin and commit survives untouched, and a crash
    after commit simply re-merges nothing (the anti-join against the
    base makes replay a no-op). Returns the number of consumed deltas.
    """
    rels = io.table_rels("pending_ingest")
    if not rels:
        return 0
    ing = io.read_rels(spark, "pending_ingest", rels).dropDuplicates(["url_hash"])
    fresh = (
        ing.join(io.read(spark, "frontier").select("url_hash"), "url_hash", "left_anti")
        .join(io.read(spark, "seen").select("url_hash"), "url_hash", "left_anti")
        .select(*[f.name for f in S.FRONTIER.fields])
    )
    if coalesce:
        fresh = fresh.coalesce(coalesce)
    io.commit(
        io.last_round(),
        appends={"frontier": fresh},
        consumes={"pending_ingest": rels},
    )
    return len(rels)


HOST_DECISION = "host string, round int, allowed int, deferred int, backoff_until int"
HOST_STATE_SCHEMA = "backoff_until int, fetched_total long"


def stream_host_politeness(
    spark: SparkSession,
    results_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    budget: int = 1,
):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-host politeness + 429-backoff over a live stream of fetch
    results (the streaming twin of O-SCHED3/O-SCHED4).

    Input: a stream of fetch-result rows (round, url, status, bytes)
    whose url encodes the host; state per host = (backoff_until round,
    fetched_total). Each trigger emits, per (host, round) group seen in
    the batch, how many results were within budget ('allowed'), how
    many exceeded it or hit a backoff window ('deferred'), and the
    host's current backoff horizon. The batch engine derives the same
    facts relationally (gate_candidates + budget window); this is the
    always-on variant with state in the streaming state store —
    resumable from checkpoint like everything else.
    """
    import pandas as pd

    from crawler_spark.functions.urls import host_col

    raw = spark.readStream.schema(S.FETCH_LOG).parquet(results_dir)
    keyed = raw.withColumn("host", host_col("url"))

    def update(key, pdfs, state):
        from crawler_spark.oracle import backoff_rounds

        (host,) = key
        if state.exists:
            backoff_until, fetched_total = state.get
        else:
            backoff_until, fetched_total = -1, 0
        rows = []
        for pdf in pdfs:
            for rnd, grp in pdf.sort_values(["round", "url"]).groupby("round"):
                allowed = deferred = 0
                taken = 0
                for status in grp["status"]:
                    if int(rnd) < backoff_until or taken >= budget:
                        deferred += 1
                        continue
                    taken += 1
                    allowed += 1
                    fetched_total += 1
                    if status == 429:
                        backoff_until = int(rnd) + backoff_rounds(host, int(rnd))
                rows.append((host, int(rnd), allowed, deferred, backoff_until))
        state.update((backoff_until, fetched_total))
        yield pd.DataFrame(
            rows, columns=["host", "round", "allowed", "deferred", "backoff_until"]
        )

    out = keyed.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=HOST_DECISION,
        stateStructType=HOST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return (
        out.writeStream.outputMode("append")
        .format("parquet")  # durable sink: the query resumes from checkpoint
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_fetch_metrics(
    spark: SparkSession, fetch_log_dir: str, checkpoint_dir: str
):
    """Streaming per-status counts over the fetch log (the status-page
    aggregation A2/A6 as a live view). Demonstrates the streaming
    aggregation path; state is tiny (one row per status code)."""
    raw = (
        spark.readStream.schema(S.FETCH_LOG).parquet(fetch_log_dir)
    )
    agg = raw.groupBy("status").agg(
        F.count("*").alias("n"), F.sum("bytes").alias("bytes")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("fetch_metrics")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_document_curation(
    spark: SparkSession,
    docs_dir: str,
    io: ParquetSnapshotIO,
    checkpoint_dir: str,
    min_quality: float = 0.5,
    min_tokens: int = 5,
    trigger_seconds: int | None = None,
):
    """Streaming corpus curation: documents arriving as parquet files
    are profiled + gated IN the stream (text_profile is a pure scan
    projection, so it runs unchanged on a streaming DataFrame — the
    same expressions the batch gates use), then exact-deduped across
    batches and appended to the `curated_docs` snapshot table. The
    curation half of the training pipeline as a continuous job: batch
    and stream share one definition of "kept".

    Cross-batch exact dedup without unbounded operator state: the
    accumulated table itself is the state — per micro-batch, collapse
    in-batch dups to the min-doc_id canonical row (deterministic), then
    left_anti against the committed fingerprints. First-arrival wins
    across batches (the engine `seen` semantics applied to content
    fingerprints); replay after a crash is a no-op by the same
    anti-join. Expected input schema: (doc_id long, text string).

    Returns the StreamingQuery."""
    from crawler_spark.functions.text import text_profile

    raw = spark.readStream.schema("doc_id long, text string").parquet(docs_dir)
    gated = text_profile(raw).filter(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("pred_lang") != "und")
    )
    cols = ["doc_id", "n_tokens", "quality", "pred_lang", "fingerprint"]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        canon = (
            batch_df.groupBy("fingerprint")
            .agg(F.min(F.struct(*[c for c in cols if c != "fingerprint"])).alias("s"))
            .select("fingerprint", "s.*")
            .select(*cols)
        )
        if io.table_paths("curated_docs"):
            seen_fp = io.read(spark, "curated_docs").select("fingerprint")
            canon = canon.join(seen_fp, "fingerprint", "left_anti")
        io.commit(
            int(io.last_round()),
            appends={"curated_docs": canon.coalesce(1)},
            meta={"stream_batch": batch_id},
        )

    writer = (
        gated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
