"""Incremental inverted index (engine lexical_index=True).

Same invariant family as the signature/vector indexes: each page is
fetched exactly once, so per-round posting appends equal a batch
recompute over the committed documents; indexed BM25 search returns
EXACTLY what the ad-hoc corpus search returns (both paths end in
retrieval._rank_postings); lifecycle cascades ride SITE_TABLES."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


def _rows(df, keys=("doc_id", "tok")):
    return sorted(
        (r.asDict(recursive=True) for r in df.collect()),
        key=lambda r: tuple(str(r[k]) for k in keys),
    )


def _run_engine(spark, root, world, rounds=6, **kw):
    tables = world.to_spark(spark)
    eng = CrawlEngine(spark, root, lexical_index=True, **kw)
    eng.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng.run(tables, max_rounds=rounds)
    return eng, tables


def test_incremental_equals_batch_recompute(spark, tmp_path):
    world = make_world(seed=81, n_hosts=4, n_urls=24, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "a"), world)
    inc = eng.io.read(spark, "postings")
    docs = eng.io.read(spark, "documents")
    assert docs.count() > 0
    assert _rows(inc) == _rows(eng.rebuild_postings())
    # every committed page is represented (sentinel rows keep empty docs)
    assert inc.select("doc_id").distinct().count() == docs.count()
    # dl is consistent per doc and equals sum(tf)
    per_doc = inc.groupBy("doc_id", "dl").agg(F.sum("tf").alias("s")).collect()
    assert all(r["s"] == r["dl"] for r in per_doc)


def test_indexed_search_equals_adhoc_bm25(spark, tmp_path):
    world = make_world(seed=82, n_hosts=3, n_urls=18, budget=4, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "b"), world)
    texts = [r.text for r in eng._page_corpus().collect() if r.text]
    queries = spark.createDataFrame(
        [("q0", " ".join(texts[0].split()[:6])),
         ("q1", " ".join(texts[-1].split()[:4])),
         ("q2", "zz-token-matching-nothing")],
        "query_id string, qtext string",
    )
    adhoc = eng.search_lexical(queries, k=7)
    indexed = eng.search_lexical_indexed(queries, k=7)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    a = sorted((r.asDict() for r in adhoc.collect()), key=key)
    b = sorted((r.asDict() for r in indexed.collect()), key=key)
    assert a == b and a  # identical ranks AND identical exact-int scores


def test_delete_site_cascades_postings(spark, tmp_path):
    world = make_world(seed=83, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "c"), world)
    sites = sorted(
        r["site"]
        for r in eng.io.read(spark, "postings").select("site").distinct().collect()
    )
    assert len(sites) >= 2
    eng.delete_site(sites[0])
    left = eng.io.read(spark, "postings")
    assert left.where(F.col("site") == sites[0]).count() == 0
    assert left.count() > 0
    # still equals a batch recompute of the surviving documents
    assert _rows(left) == _rows(eng.rebuild_postings())


def test_resume_preserves_index(spark, tmp_path):
    world = make_world(seed=84, n_hosts=3, n_urls=15, budget=3, burst=False)
    root = str(tmp_path / "d")
    eng, tables = _run_engine(spark, root, world, rounds=3)
    before = _rows(eng.io.read(spark, "postings"))
    eng2 = CrawlEngine(spark, root, lexical_index=True)
    eng2.run(tables, max_rounds=8)
    after = eng2.io.read(spark, "postings")
    assert _rows(after) == _rows(eng2.rebuild_postings())
    # resumed run only appended; earlier rows are unchanged
    assert len(_rows(after)) >= len(before)


def test_operator_twin_on_flat_corpus(spark):
    """bm25_from_postings(corpus_postings(docs)) == bm25_topk(docs) on
    an arbitrary corpus incl. empty/null docs."""
    from crawler_spark.operators.retrieval import (
        bm25_from_postings,
        bm25_topk,
        corpus_postings,
    )

    docs = spark.createDataFrame(
        [(i, f"common tok{i % 5} tok{i % 3} filler words here " * (1 + i % 4))
         for i in range(30)] + [(98, ""), (99, None)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("a", "common tok1"), ("b", "tok2 filler"), ("c", "absent")],
        "query_id string, qtext string",
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    a = sorted((r.asDict() for r in bm25_topk(docs, queries, k=5).collect()), key=key)
    b = sorted(
        (r.asDict() for r in bm25_from_postings(corpus_postings(docs), queries, k=5).collect()),
        key=key,
    )
    assert a == b and a


def test_hybrid_indexed(spark, tmp_path):
    world = make_world(seed=85, n_hosts=3, n_urls=15, budget=3, burst=False)
    tables = world.to_spark(spark)
    eng = CrawlEngine(
        spark, str(tmp_path / "h"), lexical_index=True, vector_index=True, embed_dim=8
    )
    eng.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng.run(tables, max_rounds=6)
    texts = [r.text for r in eng._page_corpus().collect() if r.text]
    q = spark.createDataFrame(
        [("q0", texts[0])], "query_id string, qtext string"
    )
    fused = eng.search_hybrid_indexed(q, k=5).collect()
    assert fused and fused[0]["rank"] == 1
    # the page whose text IS the query wins both lists -> wins the fusion
    lex1 = eng.search_lexical_indexed(q, k=1).first()["doc_id"]
    sem1 = eng.search_semantic_indexed(q, k=1).first()["neighbor_id"]
    if lex1 == sem1:
        assert fused[0]["doc_id"] == lex1
