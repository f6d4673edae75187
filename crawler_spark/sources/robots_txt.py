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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# our product token for RFC 9309 §2.2.1 group selection (the first
# token of fetch.USER_AGENT's product string)
PRODUCT_TOKEN = "crawler-spark"


def parse_robots(
    raw: DataFrame,
    default_budget: int = 1,
    user_agent: str | None = PRODUCT_TOKEN,
) -> DataFrame:
    """(host, body) -> ROBOTS-shaped rules.

    sitemap lines: startswith('sitemap:') after lower+strip, value =
    everything after the first ':' (reference splits once, app.py:60-62).
    Sitemap is group-independent (RFC 9309 §2.2.4) — always collected
    from the whole file.
    disallow/allow lines: 'disallow: /prefix' / 'allow: /prefix'
    (engine extension; the gate applies longest-match precedence, ties
    -> allow, per the public robots spec / RFC 9309 §2.2.2, with
    '*'/'$' wildcards compiled by the scheduler gate).
    crawl-delay: ceil(1/delay)-like budget — 1 URL per delay-second per
    round quantum; missing -> default_budget.

    user_agent: our product token for §2.2.1 GROUP SELECTION —
    consecutive User-agent lines open a group whose rules run to the
    next group start; rules are taken from the group(s) naming our
    token (case-insensitive exact match), falling back to the '*'
    group(s) when none does. Rules before any User-agent line apply
    unconditionally (lenient-global). user_agent=None merges every
    group (pre-group legacy behavior).

    Everything is JVM-side; the per-host line window runs on the tiny
    rules dim, never on crawl-scale data.
    """
    lines = raw.select(
        "host", F.posexplode(F.split(F.col("body"), r"\r?\n")).alias("idx", "line")
    ).select(
        "host",
        "idx",
        F.trim(F.col("line")).alias("line"),
        F.lower(F.trim(F.col("line"))).alias("low"),
    )
    if user_agent is not None:
        val = F.expr("trim(substring(line, instr(line, ':') + 1))")
        w = Window.partitionBy("host").orderBy("idx")
        grouped = (
            lines.withColumn("_ua", F.col("low").startswith("user-agent:"))
            .withColumn(
                "_start",
                F.col("_ua") & ~F.coalesce(F.lag("_ua").over(w), F.lit(False)),
            )
            .withColumn("gid", F.sum(F.col("_start").cast("int")).over(w))
        )
        agents = (
            grouped.filter(F.col("_ua"))
            .select("host", "gid", F.lower(val).alias("agent"))
            .groupBy("host", "gid")
            .agg(F.collect_set("agent").alias("agents"))
        )
        sel = agents.select(
            "host",
            "gid",
            F.array_contains("agents", user_agent.lower()).alias("hit"),
            F.array_contains("agents", "*").alias("star"),
        )
        any_hit = sel.groupBy("host").agg(F.max("hit").alias("any_hit"))
        chosen = (
            sel.join(any_hit, "host")
            .filter(F.col("hit") | (~F.col("any_hit") & F.col("star")))
            .select("host", "gid", F.lit(True).alias("_chosen"))
        )
        rule_lines = (
            grouped.join(chosen, ["host", "gid"], "left")
            .filter((F.col("gid") == 0) | F.coalesce("_chosen", F.lit(False)))
            .select("host", "idx", "line", "low")
        )
    else:
        rule_lines = lines.select("host", "idx", "line", "low")
    sitemaps = (
        lines.filter(F.col("low").startswith("sitemap:"))
        .select(
            "host",
            F.expr("trim(substring(line, instr(line, ':') + 1))").alias("sm"),
        )
        .groupBy("host")
        .agg(F.collect_list("sm").alias("sitemap_urls"))
    )
    def _rules(prefix: str, out: str) -> DataFrame:
        # file-order rule lists, stable through the group-selection join
        # (collect_list order is not guaranteed post-shuffle: sort by idx)
        return (
            rule_lines.filter(F.col("low").startswith(prefix))
            .select(
                "host",
                "idx",
                F.expr("trim(substring(line, instr(line, ':') + 1))").alias("p"),
            )
            .filter(F.length("p") > 0)
            .groupBy("host")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("idx", "p"))),
                    lambda s: s["p"],
                ).alias(out)
            )
        )

    disallows = _rules("disallow:", "disallow_prefixes")
    allows = _rules("allow:", "allow_prefixes")
    delays = (
        rule_lines.filter(F.col("low").startswith("crawl-delay:"))
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
    agent: str = "*",
    extra_groups: tuple = (),
) -> str:
    """Inverse for tests/fixtures (mixed case + noise like real files).

    extra_groups: additional (agents, disallow, allow) group tuples for
    §2.2.1 group-selection tests — rendered after the main group;
    Sitemap lines stay at the end (group-independent either way)."""
    parts = [f"User-agent: {agent}"]
    for p in disallow_prefixes:
        parts.append(f"Disallow: {p}")
    for p in allow_prefixes:
        parts.append(f"Allow: {p}")
    if crawl_delay is not None:
        parts.append(f"Crawl-delay: {crawl_delay}")
    for agents, dis, allow in extra_groups:
        parts.append("")
        for a in agents:
            parts.append(f"User-Agent: {a}")
        for p in dis:
            parts.append(f"Disallow: {p}")
        for p in allow:
            parts.append(f"Allow: {p}")
    for i, sm in enumerate(sitemap_urls):
        key = "Sitemap" if i % 2 == 0 else "SITEMAP"
        parts.append(f"{key}: {sm}")
    parts.append("# comment line")
    return "\n".join(parts) + "\n"
