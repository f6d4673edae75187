"""Crawler-trap / URL-spam detection over the frontier.

Web-scale crawlers burn budget on "spider traps": auto-generated URL
spaces (calendars, faceted search, session-id links) where the URL
count is unbounded but the content is worthless. The classic public
countermeasures (Heydon & Najork's Mercator, the IRLbot BEAST module)
flag hosts whose URL SHAPE distribution looks machine-generated rather
than editorial. This module computes those signals as pure DataFrame
expressions + ONE groupBy(host):

- per-URL shape features (``url_shape_features``): path depth, query
  parameter count, repeated path segments (/a/b/a/b/...), date-like
  calendar segments, and the digit-normalized path TEMPLATE
  (/item/123 -> /item/N).
- per-host profile (``host_trap_profile``): exact-integer sums of the
  above plus URL-space explosion = distinct paths per distinct
  template — an auto-generated space has few templates stamping out
  unbounded paths, editorial sites have ~1 path per template.
- verdicts (``trap_hosts``): thresholded boolean per signal + overall.

Everything is JVM-side (regexp/array builtins, no UDFs); means and
ratios are single divisions of exact int64 aggregates, so the whole
pipeline is hash-certifiable against the DuckDB oracle. Scale shape:
zero exchanges for the features, one partial-agg shuffle keyed on host
for the profile (same key layout as the frontier — co-located on the
bucketed layout); the two count_distincts ride the same shuffle.

Engine wiring: ``CrawlEngine.trap_report`` aggregates by SITE (the
control-plane unit) and ``pause_trap_hosts`` folds the verdict into
the same atomic pause commit as quality-driven curation.

Reference parity: the reference crawler has no trap defense (its
frontier is sitemap-bounded, crawler.py:92-104); this generalizes its
source gating to unbounded link-following crawls per the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared regex set — Java-regex ∩ RE2 (DuckDB) common subset
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?"
_QUERY_RE = r"\?([^#]*)"
_DATE_SEG_RE = r"/(19|20)[0-9]{2}[-/](0?[1-9]|1[0-2])([-/](0?[1-9]|[12][0-9]|3[01]))?"
_DIGITS_RE = r"[0-9]+"


def _path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def _segments(path: Column) -> Column:
    return F.filter(F.split(path, "/"), lambda x: x != "")


def url_shape_features(
    frontier: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-URL trap-shape features appended to the input columns:
    depth, n_params, has_repeat_seg, has_date_seg, path, template.
    Pure per-row expressions — fuses into the scan projection."""
    url = F.col(url_col)
    path = _path(url)
    segs = _segments(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    return frontier.select(
        F.col(host_col).alias("host"),
        *[F.col(c) for c in extra_cols],
        url.alias("url"),
        path.alias("path"),
        F.size(segs).cast("long").alias("depth"),
        F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&")))
        .cast("long")
        .alias("n_params"),
        (F.size(segs) > F.size(F.array_distinct(segs)))
        .cast("long")
        .alias("has_repeat_seg"),
        F.regexp_like(path, F.lit(_DATE_SEG_RE)).cast("long").alias("has_date_seg"),
        F.regexp_replace(path, _DIGITS_RE, "N").alias("template"),
    )


def host_trap_profile(
    frontier: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    exact: bool = True,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Per-host URL-shape profile: one shuffle keyed on host.

    Output (all counts int64; ratios are single exact-int divisions):
    n_urls, max_depth, mean_depth, mean_params, repeat_frac, date_frac,
    n_paths, n_templates, explosion (distinct paths per distinct
    template — >> 1 means a few templates generate the URL space).

    exact=False swaps the two count_distincts for HLL
    approx_count_distinct (mergeable sketches) — the 100 TB default
    when the profile feeds thresholds rather than the oracle gate.
    """
    feats = url_shape_features(
        frontier, url_col=url_col, host_col=host_col, extra_cols=extra_keys
    )
    cd = F.count_distinct if exact else F.approx_count_distinct
    prof = feats.groupBy("host", *extra_keys).agg(
        F.count("*").alias("n_urls"),
        F.max("depth").alias("max_depth"),
        F.sum("depth").alias("_sum_depth"),
        F.sum("n_params").alias("_sum_params"),
        F.sum("has_repeat_seg").alias("n_repeat"),
        F.sum("has_date_seg").alias("n_date"),
        cd("path").cast("long").alias("n_paths"),
        cd("template").cast("long").alias("n_templates"),
    )
    n = F.col("n_urls").cast("double")
    return prof.select(
        "host",
        *extra_keys,
        "n_urls",
        "max_depth",
        (F.col("_sum_depth").cast("double") / n).alias("mean_depth"),
        (F.col("_sum_params").cast("double") / n).alias("mean_params"),
        (F.col("n_repeat").cast("double") / n).alias("repeat_frac"),
        (F.col("n_date").cast("double") / n).alias("date_frac"),
        "n_paths",
        "n_templates",
        (
            F.col("n_paths").cast("double")
            / F.greatest(F.col("n_templates"), F.lit(1)).cast("double")
        ).alias("explosion"),
    )


def trap_hosts(
    profile: DataFrame,
    max_mean_depth: float = 8.0,
    max_mean_params: float = 3.0,
    max_repeat_frac: float = 0.2,
    max_date_frac: float = 0.5,
    max_explosion: float = 20.0,
    min_urls: int = 20,
) -> DataFrame:
    """Threshold verdicts over a host_trap_profile: one boolean per
    signal + ``is_trap`` (any signal fired on a host with enough URLs
    to judge — below min_urls everything passes; a trap host is one
    that EXPLODED, so small hosts are never flagged). Per-row
    expressions only."""
    judged = F.col("n_urls") >= F.lit(int(min_urls))
    sig = {
        "deep": F.col("mean_depth") > F.lit(float(max_mean_depth)),
        "param_heavy": F.col("mean_params") > F.lit(float(max_mean_params)),
        "repetitive": F.col("repeat_frac") > F.lit(float(max_repeat_frac)),
        "calendar": F.col("date_frac") > F.lit(float(max_date_frac)),
        "exploding": F.col("explosion") > F.lit(float(max_explosion)),
    }
    any_sig = F.lit(False)
    out = profile
    for name, c in sig.items():
        out = out.withColumn(name, judged & c)
        any_sig = any_sig | c
    return out.withColumn("is_trap", judged & any_sig)
