"""Read/aggregate path: status, summary, logs (SURVEY.md S8/C6, §3.3).

The reference serves these from per-site JSON status files + log tails
(app.py:415-495, 663-739) and computes the global rollup client-side
(templates/summary.html:152-178). Here each is one or two
groupBy().agg() queries over the snapshot tables — all JVM built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.io.snapshot import ParquetSnapshotIO
from crawler_spark.operators.extract import type_counts


def site_status(spark: SparkSession, io: ParquetSnapshotIO) -> DataFrame:
    """Per-site status rows (status-file schema, app.py:394-403):
    total_urls (A4), crawled_urls (A3), errors map (A2), total_objects
    + type_counts (A1/A7), paused/deleted flags."""
    frontier = io.read(spark, "frontier")
    seen = io.read(spark, "seen")
    metrics = io.read(spark, "metrics")
    records = io.read(spark, "records")
    ctl = io.read(spark, "engine_control")

    total = frontier.groupBy("site").agg(F.count("*").alias("total_urls"))
    crawled = seen.groupBy("site").agg(F.count("*").alias("crawled_urls"))
    errors = (
        metrics.select("site", F.explode_outer("errors").alias("code", "n"))
        .filter(F.col("code").isNotNull())
        .groupBy("site", "code")
        .agg(F.sum("n").alias("n"))
        .groupBy("site")
        .agg(F.map_from_entries(F.collect_list(F.struct("code", "n"))).alias("errors"))
    )
    tc = (
        type_counts(records)
        .groupBy("site")
        .agg(
            F.sum("count").alias("total_objects"),
            F.map_from_entries(F.collect_list(F.struct("type", "count"))).alias("type_counts"),
        )
    )
    return (
        total.join(crawled, "site", "left")
        .join(errors, "site", "left")
        .join(tc, "site", "left")
        .join(ctl, "site", "left")
        .select(
            "site",
            "total_urls",
            F.coalesce("crawled_urls", F.lit(0)).alias("crawled_urls"),
            "errors",
            F.coalesce("total_objects", F.lit(0)).alias("total_objects"),
            "type_counts",
            F.coalesce("paused", F.lit(False)).alias("paused"),
            F.coalesce("deleted", F.lit(False)).alias("deleted"),
        )
    )


def summary(spark: SparkSession, io: ParquetSnapshotIO) -> DataFrame:
    """A6 global rollup: Σ totals + progress % (summary.html:152-178)."""
    s = site_status(spark, io)
    return s.agg(
        F.count("*").alias("n_sites"),
        F.sum("total_urls").alias("total_urls"),
        F.sum("crawled_urls").alias("crawled_urls"),
        F.sum("total_objects").alias("total_objects"),
        F.round(
            100.0 * F.sum("crawled_urls") / F.greatest(F.sum("total_urls"), F.lit(1)), 0
        ).alias("progress_pct"),
    )


def recent_records(spark: SparkSession, io: ParquetSnapshotIO, site: str, k: int = 5) -> DataFrame:
    """T2 (app.py:429-433): last-k extracted objects, newest first."""
    return (
        io.read(spark, "records")
        .filter(F.col("site") == site)
        .orderBy(F.desc("seq"), F.asc("entity_key"))
        .limit(k)
    )


def recent_log(spark: SparkSession, io: ParquetSnapshotIO, k: int = 100) -> DataFrame:
    """T3/T4 (app.py:669-676): last-k fetch-log lines, newest first."""
    return (
        io.read(spark, "fetch_log")
        .orderBy(F.desc("round"), F.desc("url"))
        .limit(k)
    )


def error_log(spark: SparkSession, io: ParquetSnapshotIO, k: int = 200) -> DataFrame:
    """T4 + P8: recent non-200 lines with the error-category CASE chain
    (app.py:704-714) — including the reference's SITEMAP category for
    discovery failures (sitemap-first, like the reference's dispatch)."""
    from crawler_spark.schemas import SITEMAP_ERROR_STATUS

    cat = (
        F.when(F.col("status") == SITEMAP_ERROR_STATUS, "sitemap")
        .when(F.col("status") == 429, "rate_limit")
        .when(F.col("status") == 404, "not_found")
        .when(F.col("status") == 0, "timeout")
        .otherwise("general")
    )
    return (
        io.read(spark, "fetch_log")
        # 304 is a success (revalidation: not modified), not an error
        .filter(~F.col("status").isin(200, 304))
        .withColumn("category", cat)
        .orderBy(F.desc("round"), F.desc("url"))
        .limit(k)
    )
