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

`fetch_via_http` is the real-cluster operator: mapInPandas over the
salted (salt, host) assignment with an injectable `transport` callable
(url -> (status, spans, out_links)), per-host min-delay honored WITHIN
each partition (the scheduler already bounded per-host rows per round).
The default transport uses urllib (no aiohttp in this image) and is the
only part that needs network — everything else is tested against a fake
transport reproducing the synthetic web.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference UA string semantics (crawler.py:49-52): identify as a crawler
USER_AGENT = "crawler-spark/0.2 (+https://example.invalid/bot)"

# transport result: (status:int, spans:list[dict]|None, out_links:list[str]|None)
Transport = Callable[[str], tuple]

TIMEOUT_STATUS = 0  # reference logs TIMEOUT (crawler.py:998-1002)
TRANSPORT_ERROR_STATUS = 599  # any other transport exception


def simulate_fetch(
    scheduled: DataFrame, web: DataFrame, bursts: DataFrame, round_no: int
) -> DataFrame:
    """Resolve each scheduled URL against the synthetic web.

    Unknown URL -> 404 (the simulated DNS/404 path). Burst window on the
    host -> 429 regardless of page status (exercises O-SCHED4).
    Status 0 models a timeout (reference crawler.py:998-1002).
    """
    web_cols = ["url", "status", "spans", "out_links"]
    if "out_anchors" in web.columns:
        web_cols.append("out_anchors")
    fetched = (
        scheduled.repartition("salt", "host")
        .join(web.select(*web_cols), "url", "left")
        .withColumn("status", F.coalesce("status", F.lit(404)))
    )
    if "out_anchors" not in web.columns:
        # legacy web fixtures: links with no anchor bodies
        fetched = fetched.withColumn(
            "out_anchors", F.transform("out_links", lambda _: F.lit(""))
        )
    ra = (
        F.col("retry_after_s").cast("int")
        if "retry_after_s" in bursts.columns
        else F.lit(None).cast("int")
    )
    burst_now = (
        bursts.filter(
            (F.lit(round_no) >= F.col("from_round"))
            & (F.lit(round_no) <= F.col("to_round"))
        )
        .select("host", ra.alias("retry_after_s"))
        # overlapping windows: one row per host, harshest hint wins
        .groupBy("host")
        .agg(F.max("retry_after_s").alias("retry_after_s"))
        .select("host", F.lit(True).alias("bursting"), "retry_after_s")
    )
    fetched = (
        fetched.join(F.broadcast(burst_now), "host", "left")
        .withColumn(
            "status",
            F.when(F.coalesce("bursting", F.lit(False)), F.lit(429)).otherwise(F.col("status")),
        )
        # Retry-After rides only on 429 rows (RFC 9110 §10.2.3)
        .withColumn(
            "retry_after_s",
            F.when(F.col("status") == 429, F.col("retry_after_s")).cast("int"),
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


def default_urllib_transport(timeout_s: float = 30.0, user_agent: str = USER_AGENT) -> Transport:
    """Network transport for real clusters (reference crawler.py:951-958:
    GET with UA header + 30 s timeout). Raw HTML becomes one text span;
    href targets become out_links (a real deployment swaps in its HTML->
    span extractor here). Unusable in this sandbox (no network) — tests
    inject a fake transport instead."""
    import re
    import socket
    import urllib.error
    import urllib.request

    href = re.compile(r"""href=["']([^"'#][^"']*)["']""")
    a_tag = re.compile(
        r"""<a\s[^>]*href=["']([^"'#][^"']*)["'][^>]*>(.*?)</a>""",
        re.IGNORECASE | re.DOTALL,
    )
    strip_tags = re.compile(r"<[^>]+>")

    def get(url: str) -> tuple:
        req = urllib.request.Request(url, headers={"User-Agent": user_agent})
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read().decode("utf-8", errors="replace")
        except urllib.error.HTTPError as e:
            # non-2xx is a RESPONSE, not a transport failure: surface the
            # real status so 429 drives O-SCHED4 backoff and 404/5xx land
            # in the reference's rate_limit/not_found error categories
            # (crawler.py:978-995 records response.status for non-200s).
            # A 429's Retry-After (delta-seconds form, RFC 9110 §10.2.3)
            # rides as the 5th element and overrides the backoff surrogate.
            if e.code == 429:
                ra = (e.headers or {}).get("Retry-After")
                secs = int(ra) if ra is not None and str(ra).strip().isdigit() else None
                return 429, None, None, None, secs
            return int(e.code), None, None, None
        except urllib.error.URLError as e:
            # connect timeouts arrive WRAPPED in URLError — unwrap so
            # fetch_via_http maps them to TIMEOUT(0), not ERROR(599)
            if isinstance(e.reason, (TimeoutError, socket.timeout)):
                raise TimeoutError(str(e.reason)) from e
            raise
        spans = [{"kind": "text", "text": body, "media_ref": "", "offset": 0}]
        links = href.findall(body)
        # anchor bodies: first <a> occurrence per href, tags stripped,
        # whitespace collapsed; non-<a> hrefs (link/script tags) get ""
        bodies: dict[str, str] = {}
        for tgt, inner in a_tag.findall(body):
            bodies.setdefault(tgt, " ".join(strip_tags.sub(" ", inner).split()))
        return 200, spans, links, [bodies.get(t, "") for t in links]

    return get


def fetch_via_http(
    scheduled: DataFrame,
    transport: Optional[Transport] = None,
    timeout_s: float = 30.0,
    min_delay_s: float = 0.0,
    user_agent: str = USER_AGENT,
) -> DataFrame:
    """Wire fetch: mapInPandas over the salted (salt, host) assignment.

    Within a partition, rows are processed in (host, url) order and
    same-host requests are paced >= min_delay_s apart (O-SCHED3 inside
    the politeness quantum; the scheduler's budget window already
    bounded per-host rows per round, so the pacing loop is short). All
    of a host's rows land in ONE partition (repartition on salt+host),
    so in-partition pacing is global pacing for that host.

    transport(url) -> (status, spans, out_links) or
    (status, spans, out_links, out_anchors) — the 4-tuple form carries
    index-aligned anchor text for each link (record_anchors consumers);
    3-tuple transports get "" anchors. A 5th element carries the 429's
    Retry-After delta-seconds (overrides the backoff surrogate, like
    simulate_fetch's bursts.retry_after_s). Timeouts map to status 0
    (reference TIMEOUT, crawler.py:998-1002), other transport failures
    to 599 (reference ERROR path, crawler.py:1004-1006). The output
    schema/columns match simulate_fetch exactly, so the round loop is
    transport-agnostic.
    """
    if transport is None:
        transport = default_urllib_transport(timeout_s, user_agent)

    from crawler_spark import schemas as S

    out_schema = T.StructType(
        list(scheduled.schema.fields)
        + [
            T.StructField("status", T.IntegerType(), False),
            T.StructField("spans", S.SPANS, True),
            T.StructField("out_links", T.ArrayType(T.StringType()), True),
            T.StructField("out_anchors", T.ArrayType(T.StringType()), True),
            T.StructField("bytes", T.LongType(), False),
            T.StructField("retry_after_s", T.IntegerType(), True),
        ]
    )

    def batch_get(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        last_hit: dict[str, float] = {}  # per-partition per-host pacing clock
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["host", "url"], kind="mergesort").reset_index(drop=True)
            statuses, spanss, linkss, anchorss, nbytes, retries = [], [], [], [], [], []
            for host, url in zip(pdf["host"], pdf["url"]):
                if min_delay_s:
                    prev = last_hit.get(host)
                    now = time.monotonic()
                    if prev is not None and now - prev < min_delay_s:
                        time.sleep(min_delay_s - (now - prev))
                    last_hit[host] = time.monotonic()
                anchors, retry_after = None, None
                try:
                    got = transport(url)
                    if len(got) == 5:
                        status, spans, links, anchors, retry_after = got
                    elif len(got) == 4:
                        status, spans, links, anchors = got
                    else:
                        status, spans, links = got
                except TimeoutError:
                    status, spans, links = TIMEOUT_STATUS, None, None
                except Exception:
                    status, spans, links = TRANSPORT_ERROR_STATUS, None, None
                if anchors is None and links is not None:
                    anchors = [""] * len(links)
                statuses.append(int(status))
                spanss.append(spans)
                linkss.append(links)
                anchorss.append(anchors)
                retries.append(
                    int(retry_after)
                    if status == 429 and retry_after is not None
                    else None
                )
                nbytes.append(
                    sum(len(s.get("text") or "") + len(s.get("media_ref") or "") for s in spans)
                    if status == 200 and spans
                    else 0
                )
            pdf = pdf.assign(status=statuses, bytes=nbytes)
            pdf["spans"] = spanss
            pdf["out_links"] = linkss
            pdf["out_anchors"] = anchorss
            pdf["retry_after_s"] = pd.array(retries, dtype="Int32")
            yield pdf[[f.name for f in out_schema.fields]]

    return scheduled.repartition("salt", "host").mapInPandas(batch_get, out_schema)
