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


def test_score_priority_recrawl_orders_by_pagerank(spark):
    """The crawl-then-recrawl-by-importance loop: crawl once recording
    the link graph, compute integer PageRank, recrawl a fresh root with
    priority='score' — within every (round, host) the fetch order must
    follow (pr_score DESC, url), unscored URLs last, and the final seen
    set must equal the fifo crawl's (priority changes order, not
    coverage, once the frontier drains)."""
    tmp1 = tempfile.mkdtemp(prefix="linkgraph-")
    eng, t = _crawl(spark, tmp1)
    scores = eng.pagerank(iters=4)

    tmp2 = tempfile.mkdtemp(prefix="linkgraph-")
    world = make_world(seed=11, n_hosts=3, n_urls=24, budget=3, burst=False)
    t2 = world.to_spark(spark)
    eng2 = CrawlEngine(spark, tmp2, embed_dim=0, priority="score")
    eng2.set_priority_scores(scores)
    eng2.seed(discover_frontier(t2["seeds"], t2["robots"], t2["sitemaps"]))
    eng2._control_rows = t2["control"].collect()
    eng2.run(t2, max_rounds=12)
    # drain both fully: different priorities discover links at different
    # rounds, so equal coverage is only guaranteed at the fixpoint.
    # max_rounds is an ABSOLUTE round cap — use the same cap as the
    # oracle below, since intrinsically-429 pages retry until the cap.
    eng.run(t, max_rounds=42)
    eng2.run(t2, max_rounds=42)

    seen1 = {r.url_hash for r in eng.io.read(spark, "seen").select("url_hash").collect()}
    seen2 = {r.url_hash for r in eng2.io.read(spark, "seen").select("url_hash").collect()}
    assert seen1 == seen2

    pr = {r.node: r.score_e12 for r in scores.collect()}
    fr = eng2.io.read(spark, "frontier").select("url", "url_hash", "host").distinct()
    rows = (
        eng2.io.read(spark, "crawl_order")
        .join(fr, "url")
        .select("round", "host", "seq", "url", "url_hash")
        .collect()
    )
    assert rows
    groups = {}
    for r in rows:
        groups.setdefault((r.round, r.host), []).append(r)
    multi = 0
    for (_, _), grp in groups.items():
        grp.sort(key=lambda r: r.seq)
        want = sorted(grp, key=lambda r: (-pr.get(r.url_hash, 0), r.url))
        assert [r.url for r in grp] == [r.url for r in want]
        multi += len(grp) > 1
    assert multi > 0  # the assertion actually exercised ordering

    # full crawl-order equality vs the python oracle twin of the score
    # priority (same scores dict, same world)
    from crawler_spark.oracle import Oracle

    ora = Oracle(world, priority="score", scores=pr).run(max_rounds=42)
    got = [
        (r.round, r.seq, r.site, r.url, r.status)
        for r in eng2.io.read(spark, "crawl_order").orderBy("seq").collect()
    ]
    assert got == ora.crawl_order
    assert seen2 == set(ora.seen.keys())


def test_score_priority_without_scores_raises(spark):
    import pytest as _pytest

    world = make_world(seed=11, n_hosts=2, n_urls=8, budget=2, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, tempfile.mkdtemp(), embed_dim=0, priority="score")
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    with _pytest.raises(ValueError, match="set_priority_scores"):
        eng.run(t, max_rounds=1)


def test_set_priority_scores_robustness(spark):
    """Install-time hygiene: duplicate url_hash rows collapse (a dup key
    would fan out the candidate join and double-schedule the URL),
    fractional scores keep their value as DOUBLE (a long cast would
    floor float-PageRank tables to all-0s), and an ambiguous
    multi-column table raises ValueError even under python -O."""
    import pytest as _pytest

    eng = CrawlEngine(spark, tempfile.mkdtemp(), embed_dim=0, priority="score")

    dup = spark.createDataFrame(
        [("h1", 5), ("h1", 9), ("h2", 3)], ["node", "score"]
    )
    eng.set_priority_scores(dup)
    rows = {r.url_hash: r.pr_score for r in eng._priority_scores.collect()}
    assert rows == {"h1": 9, "h2": 3}
    assert dict(eng._priority_scores.dtypes)["pr_score"] == "bigint"

    flt = spark.createDataFrame([("h1", 0.25), ("h2", 0.75)], ["node", "score"])
    eng.set_priority_scores(flt)
    rows = {r.url_hash: r.pr_score for r in eng._priority_scores.collect()}
    assert rows == {"h1": 0.25, "h2": 0.75}
    assert dict(eng._priority_scores.dtypes)["pr_score"] == "double"

    ambig = spark.createDataFrame([("h1", 1, 2)], ["node", "score", "rank"])
    with _pytest.raises(ValueError, match="ambiguous"):
        eng.set_priority_scores(ambig)


def test_engine_hits_over_recorded_graph(spark):
    from crawler_spark.operators.graph import hits as hits_op

    tmp = tempfile.mkdtemp(prefix="linkgraph-")
    eng, t = _crawl(spark, tmp)
    edges = eng.link_edges()
    got = {(r.node, r.hub_e6, r.auth_e6) for r in eng.hits(iters=3).collect()}
    want = {
        (r.node, r.hub_e6, r.auth_e6)
        for r in hits_op(
            edges, iters=3, src_col="src_hash", dst_col="dst_hash"
        ).collect()
    }
    assert got == want and got
    # max-rescale invariant holds on the real crawl graph
    assert max(h for _, h, _ in got) == 1_000_000
    assert max(a for _, _, a in got) == 1_000_000


def test_seed_distances_bound_discovery_depth(spark):
    """True BFS distance over the recorded edges can never exceed the
    frontier's discovery depth, and seeds sit at dist 0."""
    tmp = tempfile.mkdtemp(prefix="linkgraph-")
    eng, t = _crawl(spark, tmp)
    sd = eng.seed_distances(max_depth=12).cache()
    assert sd.count() > 0
    assert sd.filter(F.col("dist") == 0).count() > 0
    # every BFS-reached node that the frontier knows satisfies
    # dist <= discovery_depth (links can only SHORTEN the path)
    bad = sd.filter(
        F.col("discovery_depth").isNotNull()
        & (F.col("dist") > F.col("discovery_depth"))
    ).count()
    assert bad == 0
    sd.unpersist()


def test_host_graph_and_host_rank_capacity_loop(spark):
    """Host-level graph: endpoints map through the frontier, self-links
    dropped, n_links counts distinct page edges; host_rank feeds
    apportion_budget -> set_host_budgets (the authority-weighted
    capacity loop) and the next run respects the override."""
    from crawler_spark.operators.scheduler import apportion_budget

    tmp = tempfile.mkdtemp(prefix="linkgraph-")
    eng, t = _crawl(spark, tmp)
    hg = eng.host_graph().cache()
    rows = hg.collect()
    assert rows, "cross-host links exist in the fixture"
    assert all(r["src_host"] != r["dst_host"] for r in rows)
    # n_links totals == distinct cross-host page edges
    hosts = eng.io.read(spark, "frontier").select("url_hash", "host")
    e = (
        eng.link_edges()
        .select("src_hash", "dst_hash")
        .distinct()
        .join(hosts.withColumnRenamed("url_hash", "src_hash"), "src_hash")
        .withColumnRenamed("host", "sh")
        .join(
            hosts.withColumnRenamed("url_hash", "dst_hash").withColumnRenamed(
                "host", "dh"
            ),
            "dst_hash",
        )
        .filter(F.col("sh") != F.col("dh"))
        .count()
    )
    assert hg.agg(F.sum("n_links")).first()[0] == e
    hr = eng.host_rank(iters=3)
    assert hr.count() == hg.select(
        F.col("src_host").alias("h")
    ).union(hg.select("dst_host")).distinct().count()
    budgets = apportion_budget(
        hr.select(F.col("node").alias("host"), F.col(hr.columns[1]).alias("weight")),
        5,
    )
    assert budgets.agg(F.sum("budget")).first()[0] == 5
    eng.set_host_budgets(budgets)  # applies without error on a live engine
    hg.unpersist()
