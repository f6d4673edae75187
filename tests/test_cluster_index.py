"""Incremental dup-cluster maintenance: minhash_lsh_delta_pairs +
graph.incremental_components + engine.update_dup_clusters.

The invariant: folding pair batches one at a time through
incremental_components yields EXACTLY the assignment batch
connected_components produces over the union — contracting a component
to its root preserves connectivity, and min-root labels compose. The
engine hook pays O(|new docs|) per call instead of re-clustering the
pair history.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.graph import connected_components, incremental_components
from crawler_spark.operators.textdedup import (
    minhash_lsh_delta_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)
from crawler_spark.world import make_world

from tests.test_dedup_index import _run_engine


def _asg(df):
    return sorted((r["doc_id"], r["cluster_id"]) for r in df.collect())


def test_incremental_equals_batch_over_three_folds(spark):
    # chains that MERGE across batches: c-d arrives before b-c bridges
    # {a,b} and {c,d}; a later e-a relabels nothing but extends; plus a
    # fresh disjoint component and an intra-cluster redundant edge
    batches = [
        [("a", "b"), ("x", "y")],
        [("c", "d"), ("b", "c"), ("x", "y")],
        [("e", "a"), ("p", "q"), ("d", "e")],
    ]
    all_pairs = [p for b in batches for p in b]
    batch_df = spark.createDataFrame(all_pairs, ["doc_a", "doc_b"])
    want = _asg(connected_components(batch_df))

    asg = None
    for b in batches:
        asg = incremental_components(
            asg, spark.createDataFrame(b, ["doc_a", "doc_b"])
        )
    assert _asg(asg) == want
    # and the min-label invariant holds
    assert all(c <= d for d, c in _asg(asg))


def test_incremental_relabels_when_new_min_joins(spark):
    first = incremental_components(
        None, spark.createDataFrame([("m", "n")], ["doc_a", "doc_b"])
    )
    assert _asg(first) == [("m", "m"), ("n", "m")]
    # 'a' < 'm' joins the cluster: every member relabels to 'a'
    second = incremental_components(
        first, spark.createDataFrame([("n", "a")], ["doc_a", "doc_b"])
    )
    assert _asg(second) == [("a", "a"), ("m", "a"), ("n", "a")]


def test_delta_pairs_equal_batch_pairs_touching_the_delta(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )
    sigs = minhash_signatures(docs).cache()
    delta = sigs.filter(F.substring(F.md5("doc_id"), 1, 1).isin("0", "1", "2", "3"))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_delta_pairs(sigs, delta).collect()
    }
    d_ids = {r["doc_id"] for r in delta.collect()}
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(signatures=sigs).collect()
        if r["doc_a"] in d_ids or r["doc_b"] in d_ids
    }
    sigs.unpersist()
    assert got == want
    assert want  # the slice actually touches some pairs


@pytest.fixture()
def clustered(spark, tmp_path):
    world = make_world(seed=92, n_hosts=3, n_urls=20, budget=3, burst=False)
    tables = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path / "c"), dedup_index=True, embed_dim=0)
    from crawler_spark.operators.discovery import discover_frontier

    eng.seed(
        discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"])
    )
    # PARTIAL crawl -> first incremental fold -> finish -> second fold
    eng.run(tables, max_rounds=2)
    s1 = eng.update_dup_clusters()
    assert s1["new_docs"] > 0
    eng.run(tables, max_rounds=12)
    s2 = eng.update_dup_clusters()
    return eng, tables, s1, s2


def test_engine_incremental_clusters_equal_batch(spark, clustered):
    eng, _, s1, s2 = clustered
    asg = eng.dup_cluster_view()
    batch = connected_components(eng.near_dup_pairs("minhash"))
    # non-singleton rows match the batch clustering exactly
    assert _asg(asg.filter("doc_id <> cluster_id")) == _asg(
        batch.filter("doc_id <> cluster_id")
    )
    # every signed doc has an assignment row (singletons included)
    signed = eng.io.read(spark, "doc_signatures").filter("mh0 is not null")
    assert asg.count() == signed.count()
    # third call with nothing new is a no-op
    s3 = eng.update_dup_clusters()
    assert s3["new_docs"] == 0
    assert s3["assignment_rows"] == asg.count()


def test_fold_commits_are_delta_sized(spark, clustered):
    """The round-4 delta-state discipline: a fold APPENDS its relabel
    to dup_cluster_state; the O(n_docs) base is written only by
    compaction/rebuild. At 10^10 docs the difference is a corpus-sized
    write per maintenance call."""
    eng, _, s1, s2 = clustered
    # folds never created (let alone rewrote) the base table
    assert eng.io.table_rels("dup_clusters") == []
    state = eng.io.read(spark, "dup_cluster_state")
    # fold 1: every row is a then-new doc
    assert state.filter("fold = 1").count() == s1["new_docs"]
    # guard metrics surfaced (no degenerate buckets in this world)
    assert s2["hot_buckets_dropped"] == 0
    # fold 2: sized by the delta + its relabeling, not the corpus
    f2 = state.filter("fold = 2").count()
    assert 0 < f2 < s2["assignment_rows"]
    # a no-op fold appends nothing
    rels_before = list(eng.io.table_rels("dup_cluster_state"))
    eng.update_dup_clusters()
    assert eng.io.table_rels("dup_cluster_state") == rels_before
    # compaction folds the chain into the base and preserves the view
    want = _asg(eng.dup_cluster_view())
    eng.maintain(max_paths=0)
    assert eng.io.read(spark, "dup_cluster_state").count() == 0
    assert len(eng.io.table_rels("dup_cluster_state")) <= 1  # one empty v-dir
    assert len(eng.io.table_rels("dup_clusters")) == 1
    assert _asg(eng.dup_cluster_view()) == want
    assert _asg(eng.io.read(spark, "dup_clusters")) == want


def test_engine_prune_after_delete_and_exact_rebuild(spark, clustered):
    eng, tables, _, _ = clustered
    site = (
        eng.io.read(spark, "doc_signatures")
        .groupBy("site")
        .count()
        .orderBy("site")
        .collect()[0]["site"]
    )
    eng.delete_site(site)
    eng.run(tables, max_rounds=14)  # the cascade commit happens in a round
    stats = eng.update_dup_clusters()
    asg = eng.dup_cluster_view()
    remaining = eng.io.read(spark, "doc_signatures").filter("mh0 is not null")
    assert asg.count() == remaining.count() == stats["assignment_rows"]
    # exact rebuild agrees with batch clustering post-delete
    eng.recluster_dups()
    rebuilt = eng.dup_cluster_view()
    batch = connected_components(eng.near_dup_pairs("minhash"))
    assert _asg(rebuilt.filter("doc_id <> cluster_id")) == _asg(
        batch.filter("doc_id <> cluster_id")
    )
    assert rebuilt.count() == remaining.count()


def test_update_requires_dedup_index(spark, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "no"), dedup_index=False)
    with pytest.raises(ValueError, match="dedup_index"):
        eng.update_dup_clusters()


def test_minhash_calibration_invariants(spark):
    from crawler_spark.operators.textdedup import (
        minhash_calibration,
        minhash_lsh_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )
    cal = minhash_calibration(docs).cache()
    rows = cal.collect()
    assert rows
    # one calibration row per LSH candidate pair
    assert cal.count() == minhash_lsh_pairs(docs).count()
    for r in rows:
        assert 0 <= r["mh_agree"] <= 8
        # every LSH candidate shares >= 1 band -> >= 2 agreeing comps
        assert r["mh_agree"] >= 2
        assert r["est_e6"] == (r["mh_agree"] * 1_000_000) // 8
        assert 0 <= r["jaccard_e6"] <= 1_000_000
        assert r["err_e6"] == abs(r["est_e6"] - r["jaccard_e6"])
    cal.unpersist()
