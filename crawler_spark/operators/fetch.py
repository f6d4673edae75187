"""Fetch step: simulated in-sandbox (S4), pluggable for a real cluster.

The reference fetches with aiohttp, 10 concurrent, 30s timeout
(crawler.py:30,951-958,1334-1336). The sandbox has no network, so the
fetch is a deterministic equi-join of the scheduled assignment against
the synthetic `web(url -> status, spans, out_links)` table, with the
429-burst scenario applied as a broadcast-join override. Per-partition
concurrency ≙ Spark task parallelism; the salt column from the
scheduler spreads hot hosts across tasks before this join.

Plan shape: `scheduled` is bounded by n_hosts × budget rows per round —
with AQE it becomes the broadcast side against an arbitrarily large
`web`, so the big table never shuffles.

`fetch_via_http` sketches the real-cluster operator: mapInPandas over
the salted assignment, one HTTP client per partition — stubbed here
because the sandbox has no network/aiohttp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simulate_fetch(
    scheduled: DataFrame, web: DataFrame, bursts: DataFrame, round_no: int
) -> DataFrame:
    """Resolve each scheduled URL against the synthetic web.

    Unknown URL -> 404 (the simulated DNS/404 path). Burst window on the
    host -> 429 regardless of page status (exercises O-SCHED4).
    Status 0 models a timeout (reference crawler.py:998-1002).
    """
    fetched = (
        scheduled.repartition("salt", "host")
        .join(web.select("url", "status", "spans", "out_links"), "url", "left")
        .withColumn("status", F.coalesce("status", F.lit(404)))
    )
    burst_now = bursts.filter(
        (F.lit(round_no) >= F.col("from_round")) & (F.lit(round_no) <= F.col("to_round"))
    ).select("host", F.lit(True).alias("bursting"))
    fetched = (
        fetched.join(F.broadcast(burst_now), "host", "left")
        .withColumn(
            "status",
            F.when(F.coalesce("bursting", F.lit(False)), F.lit(429)).otherwise(F.col("status")),
        )
        .drop("bursting")
    )
    return fetched.withColumn(
        "bytes",
        F.when(
            F.col("status") == 200,
            F.aggregate(
                F.coalesce(F.col("spans"), F.array()),
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.length(s["text"]) + F.length(s["media_ref"]),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )


def fetch_via_http(scheduled: DataFrame, timeout_s: int = 30) -> DataFrame:
    """Real-cluster fetch operator (NOT runnable in this sandbox).

    Shape: scheduled.repartition("salt", "host").mapInPandas(batch_get,
    schema=scheduled.schema + status/spans/out_links/bytes), where
    batch_get opens one pooled HTTP client per partition and GETs each
    URL with a per-host min-delay honoring the same budget the
    scheduler enforced. Kept as an explicit stub so the cluster path is
    visible and typed.
    """
    raise NotImplementedError(
        "sandbox has no network; use simulate_fetch. On a cluster, implement "
        "batch_get with aiohttp/httpx inside mapInPandas over (salt, host) "
        "partitions."
    )
