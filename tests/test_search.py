"""Engine search surface: BM25 / embedding / hybrid retrieval over the
committed crawl (the Spark-side replacement for the reference's
vector-store serving path, crawler.py upload + Qdrant consumers)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("search-engine"))
    world = make_world(seed=41, n_hosts=3, n_urls=15, budget=5, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, root)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=10)
    return eng


def _pages(eng):
    return {r.doc_id: r.text for r in eng._page_corpus().collect() if r.text}


def _queries(spark, pairs):
    return spark.createDataFrame(pairs, "query_id string, qtext string")


def test_semantic_identical_text_retrieves_itself(spark, crawled):
    pages = _pages(crawled)
    # a page whose visible text is unique in the crawl
    uniq = [d for d, t in pages.items() if list(pages.values()).count(t) == 1]
    assert uniq
    doc = uniq[0]
    got = crawled.search_semantic(_queries(spark, [("q0", pages[doc])]), k=3).collect()
    top = [r for r in got if r.rank == 1]
    assert len(top) == 1 and top[0].neighbor_id == doc
    assert top[0].score == 1.0  # same stub embedder both sides


def test_lexical_own_text_ranks_page_in_topk(spark, crawled):
    pages = _pages(crawled)
    docs = sorted(pages)[:3]
    q = _queries(spark, [(f"q{i}", pages[d]) for i, d in enumerate(docs)])
    got = crawled.search_lexical(q, k=5).collect()
    assert got
    for i, d in enumerate(docs):
        hits = {r.doc_id for r in got if r.query_id == f"q{i}"}
        assert d in hits, (d, hits)
    # contract columns
    assert {"query_id", "doc_id", "score_e9", "rank"} == set(got[0].asDict())


def test_hybrid_fuses_both_lists(spark, crawled):
    pages = _pages(crawled)
    doc = sorted(pages)[0]
    q = _queries(spark, [("q0", pages[doc])])
    lex = {r.doc_id for r in crawled.search_lexical(q, k=5).collect()}
    sem = {r.neighbor_id for r in crawled.search_semantic(q, k=5).collect()}
    fused = crawled.search_hybrid(q, k=5).collect()
    assert fused
    assert {r.doc_id for r in fused} <= lex | sem
    # present in BOTH candidate lists -> must win the fusion
    if doc in lex and doc in sem:
        assert [r.doc_id for r in fused if r.rank == 1] == [doc]


def test_search_empty_queries_yields_empty(spark, crawled):
    q = _queries(spark, [])
    assert crawled.search_lexical(q, k=3).count() == 0
    assert crawled.search_hybrid(q, k=3).count() == 0
