"""Quality-feedback crawl loop: per-doc/per-site curation metrics from
the committed documents table, quality-first recrawl via the score
priority, and the control-plane pause policy."""

import tempfile

from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


def _crawl(spark, tmp, **eng_kwargs):
    world = make_world(seed=23, n_hosts=3, n_urls=18, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, tmp, embed_dim=0, **eng_kwargs)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    eng.run(t, max_rounds=24)
    return eng, t


def test_doc_quality_covers_every_crawled_doc_and_matches_direct_compute(spark):
    tmp = tempfile.mkdtemp(prefix="quality-")
    eng, _ = _crawl(spark, tmp)
    docs = eng.io.read(spark, "documents")
    q = eng.doc_quality()
    assert q.count() == docs.count()
    # spot-check: the logit recomputed from the visible text of one doc
    # via the public classifier equals the engine's column
    from crawler_spark.functions.text import classifier_score
    from crawler_spark.operators.textdedup import doc_text

    flat = docs.select(F.col("doc_id"), doc_text().alias("text"))
    direct = {
        r["doc_id"]: r["logit"]
        for r in classifier_score(flat.withColumnRenamed("doc_id", "d").select(
            F.col("d").alias("doc_id"), "text")).collect()
    }
    got = {r["url_hash"]: r["logit"] for r in q.collect()}
    assert got == direct


def test_site_quality_aggregates_are_exact(spark):
    tmp = tempfile.mkdtemp(prefix="quality-")
    eng, _ = _crawl(spark, tmp)
    per_doc = eng.doc_quality().collect()
    want = {}
    for r in per_doc:
        w = want.setdefault(r["site"], [0, 0, 0, 0])
        w[0] += 1
        w[1] += r["n_words"]
        w[2] += r["logit"]
        w[3] += int(r["logit"] > 0)
    got = {
        r["site"]: [r["n_docs"], r["total_words"], r["total_logit"], r["n_pos_docs"]]
        for r in eng.site_quality().collect()
    }
    assert got == want


def test_quality_score_recrawl_orders_by_logit(spark):
    """The classifier analog of the PageRank recrawl loop: crawl once,
    score docs, recrawl a fresh root with priority='score' — within
    every (round, host) the fetch order follows (logit DESC, url)."""
    tmp1 = tempfile.mkdtemp(prefix="quality-")
    eng, _ = _crawl(spark, tmp1)
    scores = eng.doc_quality().select("url_hash", "logit")

    tmp2 = tempfile.mkdtemp(prefix="quality-")
    world = make_world(seed=23, n_hosts=3, n_urls=18, budget=3, burst=False)
    t2 = world.to_spark(spark)
    eng2 = CrawlEngine(spark, tmp2, embed_dim=0, priority="score")
    eng2.set_priority_scores(scores, id_col="url_hash", score_col="logit")
    eng2.seed(discover_frontier(t2["seeds"], t2["robots"], t2["sitemaps"]))
    eng2._control_rows = t2["control"].collect()
    eng2.run(t2, max_rounds=24)

    lg = {r["url_hash"]: r["logit"] for r in scores.collect()}
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
    for grp in groups.values():
        grp.sort(key=lambda r: r.seq)
        want = sorted(grp, key=lambda r: (-lg.get(r.url_hash, 0), r.url))
        assert [r.url for r in grp] == [r.url for r in want]
        multi += len(grp) > 1
    assert multi > 0


def test_pause_low_quality_sites_is_one_atomic_commit_and_reversible(spark):
    tmp = tempfile.mkdtemp(prefix="quality-")
    eng, t = _crawl(spark, tmp)
    sq = {r["site"]: r for r in eng.site_quality().collect()}
    assert len(sq) > 1
    # pick a threshold separating the sites: strictly above the worst
    # mean, at most the best mean
    means = sorted(r["total_logit"] / r["n_docs"] for r in sq.values())
    thr = means[-1]  # pauses every site with mean < best mean
    expect = sorted(
        s for s, r in sq.items() if r["total_logit"] / r["n_docs"] < thr
    )
    before = eng.io.last_round()
    got = eng.pause_low_quality_sites(min_mean_logit=thr)
    assert got == expect
    ctl = {
        r["site"]: r["paused"]
        for r in eng.io.read(spark, "engine_control").collect()
    }
    for s in expect:
        assert ctl[s] is True
    # all paused flags landed in ONE commit (round pointer moved 0 or
    # stayed; no per-site commit storm)
    assert eng.io.last_round() == before
    # a paused site schedules nothing on the next run
    if expect:
        hist = eng.run(t, max_rounds=2)
        crawled_sites = {
            r["site"]
            for r in eng.io.read(spark, "documents")
            .filter(F.col("fetched_round") > before)
            .select("site")
            .collect()
        }
        assert not (crawled_sites & set(expect))
    # reversible
    for s in got:
        eng.resume_site(s)
    ctl2 = {
        r["site"]: r["paused"]
        for r in eng.io.read(spark, "engine_control").collect()
    }
    assert not any(ctl2[s] for s in got)


def test_pause_low_quality_sites_noop_below_threshold(spark):
    tmp = tempfile.mkdtemp(prefix="quality-")
    eng, _ = _crawl(spark, tmp)
    means = [
        r["total_logit"] / r["n_docs"] for r in eng.site_quality().collect()
    ]
    got = eng.pause_low_quality_sites(min_mean_logit=min(means) - 1)
    assert got == []
    ctl = eng.io.read(spark, "engine_control")
    assert ctl.filter(F.col("paused")).count() == 0


def test_pii_report_counts_planted_pii(spark):
    """The synthetic corpus is PII-free (negative case), then PII is
    PLANTED into two sites' documents through the engine's own IO and
    the per-site counts must come back exact."""
    tmp = tempfile.mkdtemp(prefix="quality-")
    eng, _ = _crawl(spark, tmp)
    docs = eng.io.read(spark, "documents")
    rep0 = {r["site"]: r for r in eng.pii_report().collect()}
    assert sum(r["n_docs"] for r in rep0.values()) == docs.count()
    assert all(r["n_pii_total"] == 0 for r in rep0.values())  # clean corpus

    # plant: one doc per site gets a text span with an email + an IP,
    # committed via the engine's snapshot IO (overwrite, same schema)
    first = {
        r["site"]: r["doc_id"]
        for r in docs.groupBy("site").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    victims = sorted(first)[:2]
    planted_span = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("mail leak@example.com from 10.1.2.3 twice 10.4.5.6").alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    hit = F.col("doc_id").isin([first[s] for s in victims])
    eng.io.commit(
        eng.io.last_round(),
        overwrites={
            "documents": docs.withColumn(
                "spans", F.when(hit, planted_span).otherwise(F.col("spans"))
            )
        },
    )
    rep = {r["site"]: r for r in eng.pii_report().collect()}
    for s in victims:
        assert rep[s]["n_email"] == 1 and rep[s]["n_ipv4"] == 2
        assert rep[s]["n_pii_total"] == 3 and rep[s]["n_docs_with_pii"] == 1
    for s in set(rep) - set(victims):
        assert rep[s]["n_pii_total"] == 0 and rep[s]["n_docs_with_pii"] == 0
