"""Conditional-GET revalidation: the HTTP 304 path for the recrawl loop.

The reference refetches a page blindly whenever its lifecycle demands it
(restart_site / refresh_sitemaps, reference crawler.py:197-277): every
refetch pays the full fetch + extract + index-maintenance cost even when
the page did not change. Real incremental crawlers revalidate instead —
a conditional GET (If-None-Match / If-Modified-Since, RFC 9110 §13.1)
costs one round-trip and no body when the server answers 304, and the
crawler touches NO stored state for an unchanged page.

This module is the Spark-first form of that loop, built on the engine's
append-only `fetch_fingerprints` observation history:

  latest_fingerprints   one row per URL: the newest stored content hash
                        (groupBy + max_by — a single partial-aggregated
                        shuffle keyed like the frontier bucketing).
  observe_simulated     probe a synthetic web edition (sandbox): left
                        join on url, unknown -> 404, new hash derived
                        JVM-side from the span sequence.
  observe_via_http      probe over the wire: Arrow-batched mapInPandas,
                        per-host pacing, transport(url, etag) may answer
                        304 (no body) — bodies only flow for changes.
  decide                the pure decision operator: per URL one of
                        changed=0 (304, or 200 with an equal hash),
                        changed=1 (200 with a different hash), or
                        changed NULL (error — no evidence either way).

`CrawlEngine.revalidate` composes these and commits atomically: for
unchanged pages ONLY a fingerprint observation (changed=0 evidence for
the Cho & Garcia-Molina change-rate estimator in
scheduler.recrawl_priorities) and a fetch_log(304) line are appended —
documents / records / indexes / seen are untouched, so revalidating T
pages of which C changed costs O(T) probe + O(C) state churn instead of
schedule_recrawl's O(T) full refetch. Changed pages are re-enqueued
through the existing one-commit recrawl cascade and refetched by the
next run_round under the normal gates/politeness machinery.

Scale shape (the part that must survive 10^10 URLs): one keyed
aggregation over the fingerprint history, one equi-join against the web
/ one fetch pass over the probe set, no self-joins, no driver collects
beyond the three stat counters; every decision column is a JVM
expression (md5/to_json/when) — Python only runs inside the wire
transport batches.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NOT_MODIFIED = 304

# transport for conditional requests: (url, etag|None) ->
#   (status, spans, ...) — 304 means "validator matched, no body";
#   extra tuple elements (links/anchors) are tolerated and ignored.
ConditionalTransport = Callable[[str, Optional[str]], tuple]


def span_content_hash(spans_col) -> F.Column:
    """The engine's change-detector hash: md5 over the JSON-rendered
    span sequence (schema-ordered struct fields -> deterministic).
    Shared with run_round's fetch_fingerprints append so revalidation
    compares apples to apples BY CONSTRUCTION."""
    return F.md5(F.to_json(spans_col))


def span_bytes(spans_col) -> F.Column:
    """Body size of a span sequence (text + media_ref lengths) — the
    same accounting simulate_fetch uses for its bytes column."""
    return F.aggregate(
        F.coalesce(spans_col, F.array()),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.length(s["text"]) + F.length(s["media_ref"]),
    )


def latest_fingerprints(fingerprints: DataFrame) -> DataFrame:
    """One row per url_hash: the most recent observation from the
    append-only fetch_fingerprints history.

    (url_hash, url, site, host, last_round, content_hash). run_round
    appends at most one fingerprint per URL per round, so max_by is
    tie-free. One partial-aggregated shuffle keyed on url_hash — the
    frontier's own key layout, co-located on the bucketed IO."""
    return (
        fingerprints.groupBy("url_hash")
        .agg(
            F.max("round").alias("last_round"),
            F.max_by(
                F.struct("url", "site", "host", "content_hash"), "round"
            ).alias("_s"),
        )
        .select(
            "url_hash",
            F.col("_s.url").alias("url"),
            F.col("_s.site").alias("site"),
            F.col("_s.host").alias("host"),
            "last_round",
            F.col("_s.content_hash").alias("content_hash"),
        )
    )


def observe_simulated(latest: DataFrame, web: DataFrame) -> DataFrame:
    """Sandbox probe: resolve each revalidation target against a (new
    edition of the) synthetic web. Unknown URL -> 404, like
    simulate_fetch's vanished-page path. Output: (url_hash, status,
    new_hash, bytes) with new_hash only for 200s.

    `latest` is bounded by the recrawl budget — with AQE it broadcasts
    against an arbitrarily large web, which never shuffles."""
    obs = (
        latest.select("url_hash", "url")
        .join(web.select("url", "status", "spans"), "url", "left")
        .withColumn("status", F.coalesce("status", F.lit(404)))
    )
    return obs.select(
        "url_hash",
        "status",
        F.when(F.col("status") == 200, span_content_hash(F.col("spans"))).alias(
            "new_hash"
        ),
        F.when(F.col("status") == 200, span_bytes(F.col("spans")))
        .otherwise(F.lit(0).cast("long"))
        .alias("bytes"),
    )


_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("spans_json", T.StringType(), True),
    ]
)


def observe_via_http(
    latest: DataFrame,
    transport: ConditionalTransport,
    min_delay_s: float = 0.0,
    timeout_status: int = 0,
    error_status: int = 599,
) -> DataFrame:
    """Wire probe: conditional GET per target with the stored content
    hash offered as the entity validator (If-None-Match). 304 -> no
    body, no hash work; 200 -> the body's span sequence rides back as
    JSON and the comparison hash is derived JVM-SIDE by the same
    from_json -> to_json -> md5 chain run_round stores, so a pandas
    round-trip can never make an unchanged page look changed.

    Same in-partition per-host pacing as fetch_via_http; rows are
    host-partitioned so pacing is global per host."""
    from crawler_spark import schemas as S

    def batch_get(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        last_hit: dict[str, float] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["host", "url"], kind="mergesort").reset_index(
                drop=True
            )
            out = {"url_hash": [], "status": [], "spans_json": []}
            for uh, host, url, etag in zip(
                pdf["url_hash"], pdf["host"], pdf["url"], pdf["content_hash"]
            ):
                if min_delay_s:
                    prev = last_hit.get(host)
                    now = time.monotonic()
                    if prev is not None and now - prev < min_delay_s:
                        time.sleep(min_delay_s - (now - prev))
                    last_hit[host] = time.monotonic()
                try:
                    got = transport(url, etag)
                    status, spans = int(got[0]), got[1]
                except TimeoutError:
                    status, spans = timeout_status, None
                except Exception:
                    status, spans = error_status, None
                out["url_hash"].append(uh)
                out["status"].append(status)
                out["spans_json"].append(
                    None if status != 200 or spans is None else json.dumps(spans)
                )
            yield pd.DataFrame(out)

    raw = latest.select("url_hash", "host", "url", "content_hash").repartition(
        "host"
    ).mapInPandas(batch_get, _WIRE_SCHEMA)
    spans = F.from_json("spans_json", S.SPANS)
    return raw.select(
        "url_hash",
        "status",
        F.when(F.col("status") == 200, span_content_hash(spans)).alias("new_hash"),
        F.when(F.col("status") == 200, span_bytes(spans))
        .otherwise(F.lit(0).cast("long"))
        .alias("bytes"),
    )


def decide(latest: DataFrame, observed: DataFrame) -> DataFrame:
    """The revalidation decision per URL — pure, SQL-expressible (the
    driver's `revalidate_plan` oracle certifies exactly this operator):

      changed = 0     status 304, or status 200 with new_hash equal to
                      the stored hash (the page did not change);
      changed = 1     status 200 with a different hash;
      changed = NULL  anything else (404/timeout/5xx — an error is not
                      change evidence; lifecycle ops own vanishing).

    Output: latest's identity columns + (status, prev_hash, new_hash,
    bytes, changed). One equi-join on url_hash."""
    return (
        latest.withColumnRenamed("content_hash", "prev_hash")
        .join(observed, "url_hash", "inner")
        .select(
            "url_hash",
            "url",
            "site",
            "host",
            "last_round",
            "prev_hash",
            "status",
            "new_hash",
            "bytes",
            F.when(
                (F.col("status") == NOT_MODIFIED)
                | ((F.col("status") == 200) & (F.col("new_hash") == F.col("prev_hash"))),
                F.lit(0),
            )
            .when(F.col("status") == 200, F.lit(1))
            .otherwise(F.lit(None))
            .cast("int")
            .alias("changed"),
        )
    )


def conditional_urllib_transport(
    timeout_s: float = 30.0, user_agent: str | None = None
) -> ConditionalTransport:
    """Real-cluster conditional transport: GET with If-None-Match set to
    the stored validator; HTTP 304 surfaces as (304, None). Reuses the
    plain transport's span/anchor extraction for 200 bodies. Unusable in
    this sandbox (no network) — tests inject fakes."""
    import socket
    import urllib.error
    import urllib.request

    from crawler_spark.operators.fetch import USER_AGENT, default_urllib_transport

    plain = default_urllib_transport(timeout_s, user_agent or USER_AGENT)

    def get(url: str, etag: Optional[str]) -> tuple:
        if etag is None:
            return plain(url)
        req = urllib.request.Request(
            url,
            headers={
                "User-Agent": user_agent or USER_AGENT,
                "If-None-Match": f'"{etag}"',
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read().decode("utf-8", errors="replace")
        except urllib.error.HTTPError as e:
            if e.code == NOT_MODIFIED:
                return NOT_MODIFIED, None
            return int(e.code), None
        except urllib.error.URLError as e:
            if isinstance(e.reason, (TimeoutError, socket.timeout)):
                raise TimeoutError(str(e.reason)) from e
            raise
        return 200, [{"kind": "text", "text": body, "media_ref": "", "offset": 0}]

    return get
