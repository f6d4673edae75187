"""Crawl link graph (record_edges=True): edges table integrity, graph
APIs (link_stats / pagerank), cascade delete, resume."""

import tempfile

from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


def _crawl(spark, tmp, **eng_kwargs):
    world = make_world(seed=11, n_hosts=3, n_urls=24, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, tmp, embed_dim=0, record_edges=True, **eng_kwargs)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    eng.run(t, max_rounds=12)
    return eng, t


def test_edges_cover_discovered_frontier_and_come_from_fetched_pages(spark):
    tmp = tempfile.mkdtemp(prefix="linkgraph-")
    eng, t = _crawl(spark, tmp)
    edges = eng.link_edges()
    assert edges.count() > 0
    # every frontier row discovered via links is some edge's destination
    discovered = (
        eng.io.read(spark, "frontier")
        .filter(F.col("discovered_round") > 0)
        .select("url_hash")
        .distinct()
    )
    uncovered = discovered.join(
        edges.select(F.col("dst_hash").alias("url_hash")).distinct(),
        "url_hash",
        "left_anti",
    ).count()
    assert uncovered == 0
    # every edge source is a fetched page
    seen = eng.io.read(spark, "seen").select(F.col("url_hash").alias("src_hash"))
    assert edges.join(seen, "src_hash", "left_anti").count() == 0
    # distinct within the table (per-round distinct + fetch-once)
    assert edges.count() == edges.select("src_hash", "dst_hash").distinct().count()


def test_link_stats_and_pagerank_consistency(spark):
    tmp = tempfile.mkdtemp(prefix="linkgraph-")
    eng, t = _crawl(spark, tmp)
    edges = eng.link_edges()
    n_edges = edges.count()
    stats = eng.link_stats()
    agg = stats.agg(F.sum("out_deg"), F.sum("in_deg")).first()
    assert agg[0] == n_edges and agg[1] == n_edges
    pr = eng.pagerank(iters=4)
    n_nodes = (
        edges.select(F.col("src_hash").alias("n"))
        .union(edges.select("dst_hash"))
        .distinct()
        .count()
    )
    assert pr.count() == n_nodes
    # determinism: same integer scores on a second invocation
    a = {(r.node, r.score_e12) for r in pr.collect()}
    b = {(r.node, r.score_e12) for r in eng.pagerank(iters=4).collect()}
    assert a == b


def test_delete_site_cascades_edges(spark):
    tmp = tempfile.mkdtemp(prefix="linkgraph-")
    eng, t = _crawl(spark, tmp)
    edges_before = eng.link_edges()
    sites = [r.site for r in edges_before.select("site").distinct().collect()]
    assert len(sites) >= 2
    victim = sorted(sites)[0]
    n_victim = edges_before.filter(F.col("site") == victim).count()
    n_total = edges_before.count()
    assert n_victim > 0
    eng.delete_site(victim)
    after = eng.link_edges()
    assert after.filter(F.col("site") == victim).count() == 0
    assert after.count() == n_total - n_victim


def test_edges_survive_resume(spark):
    tmp = tempfile.mkdtemp(prefix="linkgraph-")
    eng, t = _crawl(spark, tmp)
    n = eng.link_edges().count()
    eng2 = CrawlEngine(spark, tmp, embed_dim=0, record_edges=True)
    assert eng2.link_edges().count() == n


def test_record_edges_requires_follow_links(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="follow_links"):
        CrawlEngine(
            spark, tempfile.mkdtemp(), record_edges=True, follow_links=False
        )
