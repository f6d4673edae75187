"""URL kernel: canonicalization, host/site extraction, dedup hashing.

Reference semantics pinned here (see SURVEY.md §2.9):
- host          = urlparse(url).netloc            (crawler.py:87-90)
- site name     = host with '.' -> '_'            (crawler.py:82-85)
- dedup key     = md5(raw url) hex                (crawler.py:92-94) — the
  reference does NO canonicalization; "reference" mode must keep that.
- "scaled" mode (north-star extension): canonicalize first (lowercase
  scheme+host, strip fragment, strip default port, sort query params),
  then hash; xxhash64 for Bloom/bucketing.

Everything is either a JVM builtin (md5, xxhash64, parse_url,
regexp_replace) or a Series→Series pandas UDF over Arrow batches —
never per-row Python at the Spark layer. The plain-Python twins
(`canonicalize_url`, `md5_hex`) are shared with the oracle so engine and
oracle can never drift.
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443"}


# click/campaign identifiers that never change the resource a URL names
# (public convention: Google/Meta/Microsoft/Mailchimp/Yandex click ids +
# the utm_* campaign family). Stripping them before hashing collapses
# the classic crawl-dedup explosion where every inbound campaign link
# spells the same page differently.
TRACKING_PARAMS = frozenset(
    {"gclid", "fbclid", "msclkid", "dclid", "yclid", "igshid", "mc_cid", "mc_eid"}
)
TRACKING_PREFIX = "utm_"


def is_tracking_param(key: str) -> bool:
    k = key.lower()
    return k in TRACKING_PARAMS or k.startswith(TRACKING_PREFIX)


def canonicalize_url(url: str, strip_tracking: bool = False) -> str:
    """Plain-Python canonicalizer (engine 'scaled' mode; F4 in SURVEY.md).

    lowercase scheme+host, strip fragment, strip default port, sort query
    params by (key, value), empty path -> '/'. Identity on unparseable
    input. strip_tracking=True additionally drops utm_*/click-id params
    (TRACKING_PARAMS) before sorting — opt-in so reference-mode dedup
    equality is untouched.
    """
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    host, sep, port = netloc.rpartition(":")
    if sep and port == _DEFAULT_PORTS.get(scheme) and "]" not in port:
        netloc = host
    path = parts.path or "/"
    pairs = parse_qsl(parts.query, keep_blank_values=True)
    if strip_tracking:
        pairs = [(k, v) for k, v in pairs if not is_tracking_param(k)]
    query = urlencode(sorted(pairs))
    return urlunsplit((scheme, netloc, path, query, ""))


def strip_tracking_col(url: Column | str) -> Column:
    """JVM-side tracking-param removal: drop utm_*/click-id query params
    from a URL column, preserving everything else byte-for-byte (param
    order included — this is NOT the full canonicalizer, it composes
    with it). Pure higher-order array ops on the split query string —
    no UDF, fuses into the scan projection, and is SQL-expressible so
    the oracle twin reproduces it exactly. Assumes fragments are
    already stripped (crawl discipline; '#...' would ride the last
    param otherwise)."""
    c = F.col(url) if isinstance(url, str) else url
    base = F.substring_index(c, "?", 1)
    # everything after the FIRST '?' (substring_index(-1) would split at
    # the last one if a value itself contains '?')
    q = F.when(c.contains("?"), c.substr(F.length(base) + 2, F.length(c))).otherwise(
        F.lit("")
    )
    key = lambda p: F.lower(F.substring_index(p, "=", 1))  # noqa: E731
    tracked = lambda p: key(p).startswith(TRACKING_PREFIX) | key(p).isin(  # noqa: E731
        *sorted(TRACKING_PARAMS)
    )
    kept = F.filter(F.split(q, "&"), lambda p: ~tracked(p) & (p != ""))
    newq = F.array_join(kept, "&")
    return F.when(
        ~c.contains("?") | (newq == ""), base
    ).otherwise(F.concat(base, F.lit("?"), newq))


def md5_hex(url: str) -> str:
    """Reference dedup key: md5 hex of the raw URL (crawler.py:92-94)."""
    return hashlib.md5(url.encode()).hexdigest()


def host_of_py(url: str) -> str:
    """Python twin of `host_col` (Spark parse_url(url,'HOST')): the
    netloc with any :port stripped, case preserved. (The reference's
    get_domain keeps the port — crawler.py:87-90 — but our canonical
    discipline keys politeness on the hostname; a port never names a
    different physical host.)"""
    netloc = urlsplit(url).netloc
    host, sep, port = netloc.rpartition(":")
    if sep and port.isdigit():
        return host
    return netloc


def site_of_py(host: str) -> str:
    return host.replace(".", "_")


# --- vectorized (Arrow) UDF: canonicalization is the one string op with no
# --- JVM builtin equivalent; everything else stays JVM-side.
# (explicit StringType: DDL-string return types need an active session at
# import time)
from pyspark.sql import types as _T  # noqa: E402


@F.pandas_udf(_T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_url)


@F.pandas_udf(_T.StringType())
def canonicalize_strip_udf(urls: pd.Series) -> pd.Series:
    """canonicalize_url(strip_tracking=True) over Arrow batches — the
    campaign-link-collapsing dedup key; compose with strip_tracking_col
    when the rest of the URL must stay raw."""
    return urls.map(lambda u: canonicalize_url(u, strip_tracking=True))


def host_col(url: Column | str) -> Column:
    """Host extraction, JVM-side (parse_url is codegen'd)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.parse_url(c, F.lit("HOST"))


def site_col(host: Column | str) -> Column:
    c = F.col(host) if isinstance(host, str) else host
    return F.regexp_replace(c, r"\.", "_")


def dedup_key_col(url: Column | str, mode: str) -> Column:
    """The string the seen-set is keyed on.

    reference: the raw URL (reference hashes the raw string).
    scaled:    the canonical URL (Arrow UDF).
    """
    c = F.col(url) if isinstance(url, str) else url
    if mode == "reference":
        return c
    if mode == "scaled":
        return canonicalize_udf(c)
    raise ValueError(f"unknown dedup mode: {mode}")


def with_url_keys(df, url_col: str = "url", mode: str = "reference"):
    """Attach url_hash (md5 hex), h64 (xxhash64), host, site columns.

    md5 keeps reference-equality; h64 drives Bloom buckets/skew salting at
    scale. Both derive from the same dedup key so the two modes only
    differ in canonicalization.
    """
    key = dedup_key_col(url_col, mode)
    return (
        df.withColumn("__key", key)
        .withColumn("url_hash", F.md5(F.col("__key")))
        .withColumn("h64", F.xxhash64(F.col("__key")))
        .withColumn("host", host_col(url_col))
        .withColumn("site", site_col(host_col(url_col)))
        .drop("__key")
    )
