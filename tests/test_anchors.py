"""Anchor-text recording (record_anchors=True) and anchor-field
retrieval: anchors table integrity vs the synthetic web, cascade
delete, resume, anchor_docs determinism, search_anchor/search_anchored."""

import tempfile

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.operators.retrieval import anchor_docs
from crawler_spark.world import make_world


@pytest.fixture(scope="module")
def crawled(spark):
    tmp = tempfile.mkdtemp(prefix="anchors-")
    world = make_world(seed=23, n_hosts=3, n_urls=24, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, tmp, embed_dim=0, record_anchors=True)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    eng.run(t, max_rounds=12)
    return eng, world, t, tmp


def test_anchors_match_web_truth(spark, crawled):
    """Every recorded (src, dst, anchor) must be a real link of the
    fetched source page with exactly that anchor text; every non-blank
    anchor of a fetched page's in-scope links must be recorded."""
    eng, world, t, _ = crawled
    anchors = eng.link_anchors()
    assert anchors.count() > 0

    # ground truth from the web fixture: explode (link, anchor) pairs of
    # fetched pages, canonicalized exactly like the engine
    from crawler_spark.functions.urls import with_url_keys

    docs = eng.io.read(spark, "documents").select(
        F.col("doc_id").alias("src_hash"), F.col("url").alias("src_url")
    )
    hosts = t["robots"].select("host").distinct()
    truth = (
        t["web"]
        .select(
            F.col("url").alias("src_url"),
            F.explode(F.arrays_zip("out_links", "out_anchors")).alias("z"),
        )
        .join(docs, "src_url")
        .select(
            "src_hash",
            F.col("z.out_links").alias("url"),
            F.coalesce(F.col("z.out_anchors"), F.lit("")).alias("anchor"),
        )
        .filter(F.col("anchor") != "")
        .transform(with_url_keys)
        .join(F.broadcast(hosts), "host", "left_semi")
        .select("src_hash", F.col("url_hash").alias("dst_hash"), "anchor")
        .distinct()
    )
    got = anchors.select("src_hash", "dst_hash", "anchor").distinct()
    assert got.exceptAll(truth).count() == 0
    assert truth.exceptAll(got).count() == 0


def test_anchor_cascade_delete_and_resume(spark, crawled):
    eng, world, t, tmp = crawled
    sites = [r.site for r in eng.link_anchors().select("site").distinct().collect()]
    assert len(sites) >= 2
    victim = sorted(sites)[0]
    n_before = eng.link_anchors().count()
    eng.delete_site(victim)
    after = eng.link_anchors()
    assert after.filter(F.col("site") == victim).count() == 0
    assert after.count() < n_before
    # resume: a fresh engine on the same root reads the same table
    eng2 = CrawlEngine(spark, tmp, embed_dim=0, record_anchors=True)
    assert eng2.link_anchors().count() == after.count()


def test_anchor_docs_shape_and_determinism(spark, crawled):
    eng, *_ = crawled
    ad = eng.anchor_docs()
    assert ad.columns == ["doc_id", "text", "n_anchors"]
    assert ad.groupBy("doc_id").count().filter("count > 1").count() == 0
    a = sorted(map(tuple, ad.collect()))
    b = sorted(map(tuple, anchor_docs(eng.link_anchors().repartition(7)).collect()))
    assert a == b


def test_search_anchor_finds_target_by_its_anchor_text(spark, crawled):
    eng, *_ = crawled
    # take a target with a reasonably distinctive anchor document
    row = (
        eng.anchor_docs()
        .filter(F.col("n_anchors") >= 2)
        .orderBy(F.desc(F.length("text")), "doc_id")
        .first()
    )
    queries = spark.createDataFrame(
        [(0, row["text"])], "query_id int, qtext string"
    )
    hits = eng.search_anchor(queries, k=5).collect()
    assert row["doc_id"] in {r["doc_id"] for r in hits}
    # fused search returns per-query ranked lists with the same target
    fused = eng.search_anchored(queries, k=5).collect()
    assert row["doc_id"] in {r["doc_id"] for r in fused}


def test_wire_fetch_carries_anchor_tuples(spark):
    from crawler_spark.operators.fetch import fetch_via_http

    sched = spark.createDataFrame(
        [("https://a.com/x", "a.com", 0, 1)], "url string, host string, salt int, round int"
    )

    def transport(url):
        return (
            200,
            [{"kind": "text", "text": "hi", "media_ref": "", "offset": 0}],
            ["https://a.com/y", "https://a.com/z"],
            ["anchor y", ""],
        )

    out = fetch_via_http(sched, transport=transport).collect()
    assert out[0]["out_anchors"] == ["anchor y", ""]
    assert out[0]["out_links"] == ["https://a.com/y", "https://a.com/z"]


def test_record_anchors_requires_follow_links(spark):
    with pytest.raises(ValueError):
        CrawlEngine(
            spark, tempfile.mkdtemp(), record_anchors=True, follow_links=False
        )
