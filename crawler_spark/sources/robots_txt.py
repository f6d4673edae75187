"""robots.txt source (SURVEY.md S1, reference app.py:51-70).

The reference GETs /robots.txt and keeps lines starting with
'sitemap:' (case-insensitive), splitting on the first ':'. Engine
twin: a DataFrame over (host, body) robots documents ->
robots_rules(host, sitemap_urls, disallow_prefixes, crawl_budget).

All line handling is JVM-side (split/explode/filter/substring_index —
no UDF). Extensions over the reference (north rule): Disallow
prefixes and a Crawl-delay-derived per-round budget are parsed too;
reference-equality tests keep them inert (no such lines in fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(raw: DataFrame, default_budget: int = 1) -> DataFrame:
    """(host, body) -> ROBOTS-shaped rules.

    sitemap lines: startswith('sitemap:') after lower+strip, value =
    everything after the first ':' (reference splits once, app.py:60-62).
    disallow/allow lines: 'disallow: /prefix' / 'allow: /prefix'
    (engine extension; the gate applies longest-match precedence, ties
    -> allow, per the public robots spec / RFC 9309 §2.2.2).
    crawl-delay: ceil(1/delay)-like budget — 1 URL per delay-second per
    round quantum; missing -> default_budget.
    """
    lines = raw.select(
        "host", F.explode(F.split(F.col("body"), r"\r?\n")).alias("line")
    ).select(
        "host",
        F.trim(F.col("line")).alias("line"),
        F.lower(F.trim(F.col("line"))).alias("low"),
    )
    sitemaps = (
        lines.filter(F.col("low").startswith("sitemap:"))
        .select(
            "host",
            F.expr("trim(substring(line, instr(line, ':') + 1))").alias("sm"),
        )
        .groupBy("host")
        .agg(F.collect_list("sm").alias("sitemap_urls"))
    )
    disallows = (
        lines.filter(F.col("low").startswith("disallow:"))
        .select("host", F.expr("trim(substring(line, instr(line, ':') + 1))").alias("p"))
        .filter(F.length("p") > 0)
        .groupBy("host")
        .agg(F.collect_list("p").alias("disallow_prefixes"))
    )
    allows = (
        lines.filter(F.col("low").startswith("allow:"))
        .select("host", F.expr("trim(substring(line, instr(line, ':') + 1))").alias("p"))
        .filter(F.length("p") > 0)
        .groupBy("host")
        .agg(F.collect_list("p").alias("allow_prefixes"))
    )
    delays = (
        lines.filter(F.col("low").startswith("crawl-delay:"))
        .select(
            "host",
            F.expr("trim(substring(line, instr(line, ':') + 1))").cast("double").alias("d"),
        )
        .groupBy("host")
        .agg(F.max("d").alias("delay"))
        .select(
            "host",
            F.greatest(F.floor(F.lit(1.0) / F.greatest(F.col("delay"), F.lit(0.001))), F.lit(1))
            .cast("int")
            .alias("crawl_budget"),
        )
    )
    hosts = raw.select("host").distinct()
    return (
        hosts.join(sitemaps, "host", "left")
        .join(disallows, "host", "left")
        .join(allows, "host", "left")
        .join(delays, "host", "left")
        .select(
            "host",
            F.coalesce("sitemap_urls", F.array()).alias("sitemap_urls"),
            F.coalesce("disallow_prefixes", F.array()).alias("disallow_prefixes"),
            F.coalesce("allow_prefixes", F.array()).alias("allow_prefixes"),
            F.coalesce("crawl_budget", F.lit(default_budget)).alias("crawl_budget"),
        )
    )


def render_robots_txt(
    sitemap_urls: list[str],
    disallow_prefixes: list[str] = (),
    crawl_delay: float | None = None,
    allow_prefixes: list[str] = (),
) -> str:
    """Inverse for tests/fixtures (mixed case + noise like real files)."""
    parts = ["User-agent: *"]
    for p in disallow_prefixes:
        parts.append(f"Disallow: {p}")
    for p in allow_prefixes:
        parts.append(f"Allow: {p}")
    if crawl_delay is not None:
        parts.append(f"Crawl-delay: {crawl_delay}")
    for i, sm in enumerate(sitemap_urls):
        key = "Sitemap" if i % 2 == 0 else "SITEMAP"
        parts.append(f"{key}: {sm}")
    parts.append("# comment line")
    return "\n".join(parts) + "\n"
