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


# P4 (app.py:370): derived site names must be word-characters only
SITE_NAME_RE = "^[a-zA-Z0-9_]+$"


def _sitemap_bfs(
    worklist: DataFrame,
    sitemaps: DataFrame,
    pages: DataFrame,
    url_filter: str | None,
    max_depth: int,
) -> DataFrame:
    """Iterative sitemap-tree BFS (J6): worklist of sitemap_url rows ->
    (page URLs, unresolved sitemap URLs). Unresolvable sitemap fetches
    are returned — not silently dropped — so callers can log them with
    the reference's SITEMAP error category (app.py:704-714)."""
    processed = worklist.limit(0)
    unresolved = worklist.limit(0)
    for _ in range(max_depth):
        if worklist.isEmpty():
            break
        unresolved = unresolved.unionByName(
            worklist.join(sitemaps.select("sitemap_url"), "sitemap_url", "left_anti")
        )
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
    return pages.dropDuplicates(["url"]), unresolved.distinct()


def discover_frontier(
    seeds: DataFrame,
    robots: DataFrame,
    sitemaps: DataFrame,
    url_filter: str | None = None,
    max_depth: int = 8,
    with_unresolved: bool = False,
):
    """Return distinct page URLs (url, site) discovered from the seed
    hosts' sitemap trees, unioned with the seeds themselves.

    with_unresolved=True returns (pages, unresolved(sitemap_url)) so the
    caller can log unresolvable sitemap fetches with the reference's
    SITEMAP error category (app.py:704-714) instead of dropping them —
    engine.seed_from_world and engine.refresh_sitemaps both do."""
    seed_hosts = seeds.select(host_col("url").alias("host")).distinct()
    worklist = (
        robots.join(seed_hosts, "host")
        .select(F.explode("sitemap_urls").alias("sitemap_url"))
        .distinct()
    )
    pages, unresolved = _sitemap_bfs(
        worklist, sitemaps, seeds.select("url", "site"), url_filter, max_depth
    )
    if with_unresolved:
        return pages, unresolved
    return pages


def dispatch_seed_urls(raw: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P2 + F5 + P4 (app.py:281-291, 370): the reference's most common
    entry — a user submits ANY URL ("here's a website, crawl it").

    - site-name validation: host -> site (dots to underscores); names
      failing ^[a-zA-Z0-9_]+$ are rejected, not crawled (app.py:370);
    - sitemap-vs-site dispatch: URLs containing 'sitemap' (lowercased)
      or ending '.xml' enter the sitemap worklist directly (app.py:281);
    - otherwise robots-first: the host's robots sitemap_urls (S1); when
      robots lists none, fall back to urljoin(url, '/sitemap.xml')
      (app.py:288-291).

    Returns (worklist(sitemap_url, site, host), rejected(url, site)).
    """
    u = (
        raw.select(F.trim(F.col("url")).alias("url"))
        .filter(F.length("url") > 0)
        .withColumn("host", host_col("url"))
        .withColumn("site", F.regexp_replace("host", r"\.", "_"))
        .withColumn("valid", F.col("site").rlike(SITE_NAME_RE))
    )
    rejected = u.filter(~F.col("valid")).select("url", "site")
    ok = u.filter(F.col("valid"))
    is_sitemap = F.lower(F.col("url")).contains("sitemap") | F.col("url").endswith(".xml")
    direct = ok.filter(is_sitemap).select(F.col("url").alias("sitemap_url"), "site", "host")
    origin = F.regexp_extract("url", r"^(https?://[^/]+)", 1)
    via_robots = (
        ok.filter(~is_sitemap)
        .join(F.broadcast(robots.select("host", "sitemap_urls")), "host", "left")
        .withColumn(
            "sms",
            F.when(
                F.size(F.coalesce("sitemap_urls", F.array())) > 0, F.col("sitemap_urls")
            ).otherwise(F.array(F.concat(origin, F.lit("/sitemap.xml")))),
        )
        .select(F.explode("sms").alias("sitemap_url"), "site", "host")
    )
    return direct.unionByName(via_robots).distinct(), rejected


def discover_from_raw_seeds(
    raw: DataFrame,
    robots: DataFrame,
    sitemaps: DataFrame,
    url_filter: str | None = None,
    max_depth: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Raw-URL entry point: dispatch (P2/F5/P4) then the sitemap BFS.
    Unlike discover_frontier, the submitted URLs themselves are NOT
    pages — only sitemap-listed URLs are crawled, exactly as the
    reference's /process flow (app.py:270-344). Returns
    (pages(url, site), rejected(url, site), unresolved(sitemap_url)) —
    unresolved sitemap fetches feed the SITEMAP error category."""
    worklist, rejected = dispatch_seed_urls(raw, robots)
    empty_pages = (
        worklist.select(
            F.col("sitemap_url").alias("url"), "site"
        ).limit(0)
    )
    pages, unresolved = _sitemap_bfs(
        worklist.select("sitemap_url").distinct(), sitemaps, empty_pages, url_filter, max_depth
    )
    return pages, rejected, unresolved


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
