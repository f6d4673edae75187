"""Change-rate recrawl loop: track_changes fingerprint history ->
fetch_history/recrawl_scores -> schedule_recrawl -> refetch round.

The incremental-crawl generalization of the reference's lifecycle-only
refetching (crawler.py:197-277): the engine records one content
fingerprint per successful fetch, estimates per-URL change rates, and
re-enqueues the stalest URLs in one atomic commit.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


def _mutate_web(web, url_substr: str):
    """A new 'edition' of the synthetic web: pages whose url contains
    url_substr get one text span's content changed."""
    changed = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "text", F.concat(s["text"], F.lit(" v2")))
            .otherwise(s["text"])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return web.withColumn(
        "spans",
        F.when(F.col("url").contains(url_substr), changed).otherwise(
            F.col("spans")
        ),
    )


@pytest.fixture(scope="module")
def crawled(spark):
    """One full crawl with change tracking + dedup index, then three
    recrawl generations: same content, mutated content, mutated again."""
    world = make_world(seed=31, n_hosts=3, n_urls=15, budget=3, burst=False)
    t = world.to_spark(spark)
    root = tempfile.mkdtemp(prefix="recrawl_")
    eng = CrawlEngine(
        spark, root, track_changes=True, dedup_index=True, follow_links=False
    )
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=12)
    return eng, t, world


def test_fingerprints_recorded_once_per_fetch(spark, crawled):
    eng, t, _ = crawled
    fp = eng.io.read(spark, "fetch_fingerprints")
    seen = eng.io.read(spark, "seen")
    assert fp.count() == seen.count()
    hist = eng.fetch_history()
    assert hist.count() == fp.count()
    # single observation per URL -> no change evidence anywhere
    assert hist.agg(F.sum("changed")).collect()[0][0] == 0


def test_recrawl_unchanged_content_records_no_change(spark, crawled):
    eng, t, _ = crawled
    before_seen = eng.io.read(spark, "seen").count()
    before_docs = eng.io.read(spark, "documents").count()
    targets = eng.io.read(spark, "seen").limit(4).select("url_hash")
    n = eng.schedule_recrawl(targets)
    assert n == 4
    # re-enqueued: seen shrinks, frontier view shows them pending again
    assert eng.io.read(spark, "seen").count() == before_seen - 4
    # max_rounds is an ABSOLUTE round ceiling; the resumed run starts
    # after the first crawl's last round
    eng.run(t, max_rounds=25)
    # refetch restored everything: same seen/doc counts, no duplicates
    assert eng.io.read(spark, "seen").count() == before_seen
    docs = eng.io.read(spark, "documents")
    assert docs.count() == before_docs
    assert docs.select("doc_id").distinct().count() == before_docs
    # history now has 2 observations for the 4 urls, all unchanged
    hist = eng.fetch_history()
    two_obs = hist.groupBy("url_hash").count().filter("count = 2")
    assert two_obs.count() == 4
    assert hist.agg(F.sum("changed")).collect()[0][0] == 0


def test_recrawl_detects_changed_content_and_ranks_it(spark, crawled):
    eng, t, world = crawled
    seen = eng.io.read(spark, "seen")
    # recrawl EVERY url against a mutated web edition: /p/00001 pages change
    assert eng.schedule_recrawl(seen.select("url_hash")) == seen.count()
    t2 = dict(t)
    t2["web"] = _mutate_web(t["web"], "/p/00001")
    eng.run(t2, max_rounds=45)
    hist = eng.fetch_history()
    changed_urls = [
        r["url"]
        for r in hist.filter("changed = 1").select("url").distinct().collect()
    ]
    assert changed_urls and all("/p/00001" in u for u in changed_urls)
    # a changed URL must outrank every unchanged URL with the same
    # observation count and staleness (higher estimated change rate)
    rows = eng.recrawl_scores().collect()
    ch = [r for r in rows if r["url"] in changed_urls]
    un = [r for r in rows if r["url"] not in changed_urls and r["n_obs"] == 3]
    if ch and un:
        same_staleness = [
            (c, u)
            for c in ch
            for u in un
            if c["last_ms"] == u["last_ms"] and c["n_obs"] == u["n_obs"]
        ]
        assert all(
            c["priority_e6"] > u["priority_e6"] for c, u in same_staleness
        )
    # changed pages' documents carry the new content
    docs = eng.io.read(spark, "documents")
    v2 = docs.select(
        F.explode("spans").alias("s")
    ).filter(F.col("s.text").endswith(" v2"))
    assert v2.count() > 0


def test_recrawl_index_and_records_stay_consistent(spark, crawled):
    """After recrawl generations: doc_signatures incremental == batch,
    records match a fresh crawl of the current web edition."""
    from crawler_spark.operators.textdedup import document_signatures

    eng, t, _ = crawled
    docs = eng.io.read(spark, "documents")
    inc = eng.io.read(spark, "doc_signatures").drop("round")
    batch = document_signatures(docs).drop("round")
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # every fetched page still has exactly one documents row and its
    # records exist (entity_seen reopened on recrawl)
    seen = eng.io.read(spark, "seen")
    assert docs.join(seen, docs.doc_id == seen.url_hash, "left_anti").count() == 0
    recs = eng.io.read(spark, "records")
    assert recs.select("url").distinct().join(
        docs.select("url"), "url", "left_anti"
    ).count() == 0


def test_recrawl_resume_bit_identical(spark, crawled):
    eng, t, _ = crawled
    root = eng.io.root if hasattr(eng.io, "root") else None
    if root is None:
        pytest.skip("io exposes no root")
    eng2 = CrawlEngine(
        spark, root, track_changes=True, dedup_index=True, follow_links=False
    )
    a = sorted(map(tuple, eng.io.read(spark, "fetch_fingerprints").collect()))
    b = sorted(map(tuple, eng2.io.read(spark, "fetch_fingerprints").collect()))
    assert a == b
    assert eng2.recrawl_scores().count() == eng.recrawl_scores().count()


def test_recrawl_scores_feed_schedule_recrawl_directly(spark, crawled):
    """The public chain: schedule_recrawl(recrawl_scores(budget=N))
    works without the caller touching url_hash plumbing."""
    eng, t, _ = crawled
    from crawler_spark.engine import read_frontier_view

    def pending():
        return (
            read_frontier_view(spark, eng.io)
            .filter("state = 'pending'")
            .count()
        )

    before = pending()
    scores = eng.recrawl_scores(budget=2)
    assert "url_hash" in scores.columns
    n = eng.schedule_recrawl(scores)
    assert n == scores.select("url_hash").distinct().count() > 0
    assert pending() == before + n


def test_schedule_recrawl_noop_on_unknown_keys(spark, crawled):
    eng, t, _ = crawled
    ghost = spark.createDataFrame([("nope",)], "url_hash string")
    assert eng.schedule_recrawl(ghost) == 0


def test_recrawl_with_cuckoo_filter_consistent(spark):
    """seen-filter maintenance folds into the recrawl commit: after a
    recrawl+refetch under the cuckoo prefilter, the crawl converges to
    the same seen set as the exact engine."""
    world = make_world(seed=33, n_hosts=2, n_urls=10, budget=3, burst=False)
    t = world.to_spark(spark)
    root = tempfile.mkdtemp(prefix="recrawl_ck_")
    eng = CrawlEngine(
        spark, root, track_changes=True, seen_filter="cuckoo",
        bloom_buckets=4, follow_links=False,
    )
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=10)
    seen_before = sorted(
        r["url_hash"] for r in eng.io.read(spark, "seen").collect()
    )
    targets = eng.io.read(spark, "seen").limit(3).select("url_hash")
    assert eng.schedule_recrawl(targets) == 3
    eng.run(t, max_rounds=25)
    seen_after = sorted(
        r["url_hash"] for r in eng.io.read(spark, "seen").collect()
    )
    assert seen_before == seen_after
    hist = eng.fetch_history()
    assert hist.filter("changed = 1").count() == 0
    assert hist.groupBy("url_hash").count().filter("count = 2").count() == 3
