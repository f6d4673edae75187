"""Incremental page-vector ANN index (engine vector_index=True).

Same invariant family as the dedup/media signature indexes: each page
is fetched exactly once, so per-round appends of quantized page vectors
equal a batch recompute over the committed documents; lifecycle
cascades (delete_site, refresh prune) and the join-only indexed search
ride the generic SITE_TABLES machinery. Fixed-scale quantization keeps
int64 scores comparable across rounds."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


def _rows(df, key="doc_id"):
    return sorted((r.asDict(recursive=True) for r in df.collect()), key=lambda r: r[key])


def _run_engine(spark, root, world, rounds=6, **kw):
    tables = world.to_spark(spark)
    eng = CrawlEngine(spark, root, vector_index=True, embed_dim=8, **kw)
    eng.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng.run(tables, max_rounds=rounds)
    return eng, tables


def test_vector_index_requires_embed_dim(spark, tmp_path):
    with pytest.raises(ValueError, match="embed_dim"):
        CrawlEngine(spark, str(tmp_path / "x"), vector_index=True, embed_dim=0)


def test_incremental_equals_batch_recompute(spark, tmp_path):
    world = make_world(seed=71, n_hosts=4, n_urls=24, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "a"), world)
    inc = eng.io.read(spark, "page_vectors")
    docs = eng.io.read(spark, "documents")
    assert docs.count() > 0
    assert _rows(inc) == _rows(eng.rebuild_page_vectors())
    assert inc.count() == docs.count()  # one vector per committed page


def test_indexed_search_finds_identical_text(spark, tmp_path):
    world = make_world(seed=72, n_hosts=3, n_urls=18, budget=4, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "b"), world)
    pages = {r.doc_id: r.text for r in eng._page_corpus().collect() if r.text}
    uniq = [d for d, t in sorted(pages.items()) if list(pages.values()).count(t) == 1]
    assert uniq
    doc = uniq[0]
    q = spark.createDataFrame([("q0", pages[doc])], "query_id string, qtext string")
    got = eng.search_semantic_indexed(q, k=5).collect()
    assert got
    hits = {r.neighbor_id for r in got}
    assert doc in hits  # identical text -> identical qv -> same bucket, max self-dot
    # every hit shares the query's LSH bucket (the pruning contract)
    idx = {r.doc_id: r.bucket for r in eng.io.read(spark, "page_vectors").collect()}
    for r in got:
        assert idx[r.neighbor_id] == idx[doc]


def test_indexed_search_matches_brute_force_within_bucket(spark, tmp_path):
    """The index search must equal quantized brute force restricted to
    the query's bucket — exact integer scores, no approximation beyond
    the bucket pruning itself."""
    world = make_world(seed=73, n_hosts=3, n_urls=20, budget=4, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "c"), world)
    pages = {r.doc_id: r.text for r in eng._page_corpus().collect() if r.text}
    doc = sorted(pages)[0]
    q = spark.createDataFrame([("q0", pages[doc])], "query_id string, qtext string")
    got = [(r.rank, r.neighbor_id, r.iscore) for r in
           eng.search_semantic_indexed(q, k=3).orderBy("rank").collect()]

    idx = {r.doc_id: (list(r.qv), r.bucket) for r in
           eng.io.read(spark, "page_vectors").collect()}
    qv, bucket = idx[doc]  # identical text -> same qv/bucket as the page
    cand = [(d, sum(a * b for a, b in zip(v, qv)))
            for d, (v, b) in idx.items() if b == bucket]
    want = sorted(cand, key=lambda x: (-x[1], x[0]))[:3]
    assert got == [(i + 1, d, s) for i, (d, s) in enumerate(want)]


def test_delete_site_cascades_page_vectors(spark, tmp_path):
    world = make_world(seed=74, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "d"), world)
    sites = [r.site for r in
             eng.io.read(spark, "page_vectors").select("site").distinct().collect()]
    assert len(sites) >= 2
    victim = sorted(sites)[0]
    eng.delete_site(victim)
    left = eng.io.read(spark, "page_vectors")
    assert left.filter(F.col("site") == victim).count() == 0
    assert left.count() > 0
    # still equals a batch recompute over the post-cascade documents
    assert _rows(left) == _rows(eng.rebuild_page_vectors())


def test_resume_preserves_index(spark, tmp_path):
    world = make_world(seed=75, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, tables = _run_engine(spark, str(tmp_path / "e"), world, rounds=3)
    before = _rows(eng.io.read(spark, "page_vectors"))
    eng2 = CrawlEngine(spark, str(tmp_path / "e"), vector_index=True, embed_dim=8)
    eng2.run(tables, max_rounds=6)
    after = eng2.io.read(spark, "page_vectors")
    assert _rows(after.limit(0).unionByName(after)) == _rows(eng2.rebuild_page_vectors())
    assert len(_rows(after)) >= len(before)


def test_vector_near_dup_pairs_from_index(spark, tmp_path):
    """Identical page text -> identical quantized vector -> sim_e6 of
    exactly 1e6; the world's twin-spelling variant pages provide real
    planted semantic dups. Pairs never cross an LSH bucket."""
    world = make_world(seed=76, n_hosts=3, n_urls=24, budget=4, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "f"), world)
    pages = {r.doc_id: r.text for r in eng._page_corpus().collect()}
    ident = {
        tuple(sorted((a, b)))
        for a in pages for b in pages
        if a < b and pages[a] == pages[b] and pages[a]
    }
    got = {(r.doc_a, r.doc_b): r.sim_e6 for r in
           eng.near_dup_pairs("vector", min_sim_e6=1_000_000).collect()}
    # every identical-text pair is found at exactly 1e6 (same bucket by
    # construction: identical qv)
    for pair in ident:
        assert got.get(pair) == 1_000_000, pair
    # and nothing that isn't identical scores 1e6 with DIFFERENT text
    for (a, b), s in got.items():
        if s == 1_000_000 and pages[a] != pages[b]:
            # distinct text can still quantize identically at dim=8 —
            # but then the vectors must be equal component-wise
            va = {r.doc_id: list(r.qv) for r in
                  eng.io.read(spark, "page_vectors").collect()}
            assert va[a] == va[b]


def test_vector_near_dup_rejects_unknown_kwargs(spark, tmp_path):
    world = make_world(seed=77, n_hosts=2, n_urls=10, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "g"), world, rounds=3)
    with pytest.raises(TypeError):
        eng.near_dup_pairs("vector", bogus=1)
