"""Seed discovery: robots -> sitemap BFS -> initial frontier (SURVEY.md M3).

The reference discovers URLs by fetching robots.txt for sitemap lines
(app.py:51-70) then walking sitemap-index trees breadth-first with a
visited set (app.py:270-344, BFS worklist at app.py:293-319), filtering
page URLs by substring (app.py:100-102).

Here the sitemap bodies are a fixture table `sitemaps(sitemap_url, site,
kind, entries)`; the BFS is an iterative anti-join loop (J6):

    worklist := robots.sitemap_urls of the seed hosts
    repeat: resolve worklist rows against `sitemaps`;
            urlset entries -> page URLs; index entries -> next worklist,
            anti-joined against processed

Sitemap trees are shallow (2 levels in the reference's ecosystem); the
loop runs one Spark job per level with a driver-side emptiness check —
the standard iterative-BFS shape (same as GraphX/Pregel supersteps).

Tombstone reconcile (J5, crawler.py:197-277): stored − current = removed
set, cascaded as deletes across tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.urls import host_col


def discover_frontier(
    seeds: DataFrame,
    robots: DataFrame,
    sitemaps: DataFrame,
    url_filter: str | None = None,
    max_depth: int = 8,
) -> DataFrame:
    """Return distinct page URLs (url, site) discovered from the seed
    hosts' sitemap trees, unioned with the seeds themselves."""
    seed_hosts = seeds.select(host_col("url").alias("host")).distinct()
    worklist = (
        robots.join(seed_hosts, "host")
        .select(F.explode("sitemap_urls").alias("sitemap_url"))
        .distinct()
    )
    processed = worklist.limit(0)
    pages = seeds.select("url", "site")

    for _ in range(max_depth):
        if worklist.isEmpty():
            break
        resolved = worklist.join(sitemaps, "sitemap_url")
        urlset = (
            resolved.filter(F.col("kind") == "urlset")
            .select("site", F.explode("entries").alias("url"))
        )
        if url_filter:
            urlset = urlset.filter(F.col("url").contains(url_filter))  # P1
        pages = pages.unionByName(urlset.select("url", "site"))
        processed = processed.unionByName(worklist).distinct()
        worklist = (
            resolved.filter(F.col("kind") == "index")
            .select(F.explode("entries").alias("sitemap_url"))
            .distinct()
            .join(processed, "sitemap_url", "left_anti")
        )
    return pages.dropDuplicates(["url"])


def discover_frontier_wire(
    spark,
    seeds: DataFrame,
    robots_raw: DataFrame,
    sitemaps_raw: DataFrame,
    url_filter: str | None = None,
    default_budget: int = 1,
) -> DataFrame:
    """Wire-format discovery: raw robots.txt bodies (host, body string)
    and raw sitemap bytes (sitemap_url, body binary) -> page URLs.

    This is the exact cluster path (S1+S2 end-to-end): parse robots for
    sitemap URLs/rules, parse XML(+gzip) sitemap bodies, then run the
    same BFS as the fixture path. The fixture `sitemaps` table is just
    the parsed form of `sitemaps_raw`.
    """
    from crawler_spark.sources.robots_txt import parse_robots
    from crawler_spark.sources.sitemap_xml import parse_sitemaps

    rules = parse_robots(robots_raw, default_budget=default_budget)
    parsed = parse_sitemaps(sitemaps_raw, url_filter=None).join(
        sitemaps_raw.select("sitemap_url", "site"), "sitemap_url"
    ).select("sitemap_url", "site", "kind", "entries")
    return discover_frontier(seeds, rules, parsed, url_filter=url_filter)


def reconcile_tombstones(stored: DataFrame, current: DataFrame, key: str = "url") -> DataFrame:
    """J5: rows of `stored` whose key vanished from `current` (EXCEPT
    semantics via left_anti). Caller cascades the delete across tables."""
    return stored.join(current.select(key).distinct(), key, "left_anti")
