"""Quantized ANN, SemDeDup, and hybrid RRF fusion.

These are the round-3 additions on the embedding side of the
training-data pipeline: int8-style quantization (4x scan/shuffle bytes
at 100 TB, exact-integer scoring), cluster-bounded semantic dedup
(SemDeDup, arXiv:2303.09540), and reciprocal-rank fusion of lexical +
semantic top-k lists (Cormack et al. SIGIR'09).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _emb_np(spark):
    rows = spark.read.parquet(EMB).orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return ids, V


# --- quantization ------------------------------------------------------------


def test_quantize_matches_numpy_floor(spark):
    from crawler_spark.operators.ann import quantize_embeddings

    emb = spark.read.parquet(EMB)
    ids, V = _emb_np(spark)
    mx = np.abs(V).max()
    expected = np.floor(V * 127.0 / mx).astype(np.int64)
    got = {r.vec_id: list(r.qv) for r in quantize_embeddings(emb).collect()}
    for i, vid in enumerate(ids):
        assert got[vid] == list(expected[i])


def test_quantize_zero_corpus_guard(spark):
    from crawler_spark.operators.ann import quantize_embeddings

    z = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = quantize_embeddings(z).collect()
    assert all(list(r.qv) == [0, 0] for r in got)


def test_quantized_topk_tracks_brute_force(spark):
    """Global-scale int8 ranking should largely agree with exact float
    cosine on near-unit-norm vectors: recall@5 of the integer path vs
    the float path stays high, and the integer scores equal the numpy
    integer dot products exactly."""
    from crawler_spark.operators.ann import brute_force_topk, quantized_topk

    emb = spark.read.parquet(EMB)
    qids = [0, 1, 2]
    ids, V = _emb_np(spark)
    mx = np.abs(V).max()
    Q = np.floor(V * 127.0 / mx).astype(np.int64)
    idx = {int(v): i for i, v in enumerate(ids)}

    got = quantized_topk(emb, qids, k=5).collect()
    for r in got:
        assert r.iscore == int(Q[idx[r.query_id]] @ Q[idx[r.neighbor_id]])

    bf = brute_force_topk(emb, qids, k=5).collect()
    bf_sets = {q: {r.neighbor_id for r in bf if r.query_id == q} for q in qids}
    qt_sets = {q: {r.neighbor_id for r in got if r.query_id == q} for q in qids}
    recall = np.mean([len(bf_sets[q] & qt_sets[q]) / 5 for q in qids])
    assert recall >= 0.6, recall


def test_quantized_topk_precomputed_table_path_equal(spark):
    from crawler_spark.operators.ann import quantize_embeddings, quantized_topk

    emb = spark.read.parquet(EMB)
    qt = quantize_embeddings(emb)
    a = quantized_topk(emb, [0, 1], k=4).collect()
    b = quantized_topk(emb, [0, 1], k=4, quantized=qt).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_quantized_topk_plan_is_broadcast_window_limit(spark):
    from crawler_spark.operators.ann import quantized_topk

    emb = spark.read.parquet(EMB)
    plan = (
        quantized_topk(emb, [0, 1], k=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan  # constant top-k bound pushed down
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan  # corpus never shuffles for the join


# --- semdedup ----------------------------------------------------------------


def _semdedup_reference(ids, V, n_centroids, threshold):
    """Brute-force numpy SemDeDup with the same deterministic policy:
    first-N centroids, argmax-cosine assignment (tie -> lower cid),
    drop any vector with a smaller-id in-cluster neighbor >= threshold."""
    norm = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = norm[:n_centroids]
    sims = norm @ C.T
    cid = sims.argmax(axis=1)  # np argmax ties -> first (lower cid), same policy
    dropped = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cid[i] == cid[j] and float(norm[i] @ norm[j]) >= threshold:
                dropped.add(int(ids[j]))
    return {int(ids[i]): int(cid[i]) for i in range(len(ids))}, dropped


def test_semdedup_matches_numpy_reference(spark):
    from crawler_spark.operators.ann import semdedup

    emb = spark.read.parquet(EMB)
    ids, V = _emb_np(spark)
    exp_cid, exp_drop = _semdedup_reference(ids, V, n_centroids=8, threshold=0.3)
    got = semdedup(emb, n_centroids=8, threshold=0.3).collect()
    assert len(got) == len(ids)
    for r in got:
        assert r.cid == exp_cid[r.vec_id], (r.vec_id, r.cid, exp_cid[r.vec_id])
        assert r.keep == (r.vec_id not in exp_drop), r.vec_id
    # the call must actually deduplicate something at this threshold
    assert exp_drop


def test_semdedup_pairs_only_within_cluster(spark):
    """keep=False implies a smaller-id SAME-CLUSTER neighbor above the
    threshold; a near-dup in a different cluster must NOT drop a row
    (that's the clustering/recall trade SemDeDup makes)."""
    from crawler_spark.operators.ann import semdedup

    emb = spark.read.parquet(EMB)
    ids, V = _emb_np(spark)
    _, exp_drop = _semdedup_reference(ids, V, n_centroids=8, threshold=0.3)
    norm = V / np.linalg.norm(V, axis=1, keepdims=True)
    all_pairs_drop = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if float(norm[i] @ norm[j]) >= 0.3:
                all_pairs_drop.add(int(ids[j]))
    got_drop = {
        r.vec_id for r in semdedup(emb, n_centroids=8, threshold=0.3).collect() if not r.keep
    }
    assert got_drop == exp_drop
    assert got_drop <= all_pairs_drop  # never drops more than unblocked near-dup


def test_semdedup_kmeans_codebook_path(spark):
    """A trained codebook drops in via `centroids` (production path);
    output stays a full partition of the corpus into keep/drop."""
    from crawler_spark.operators.ann import kmeans_train, semdedup

    emb = spark.read.parquet(EMB)
    cent = kmeans_train(emb, n_centroids=4, n_iters=2)
    got = semdedup(emb, threshold=0.3, centroids=cent).collect()
    assert len(got) == emb.count()
    assert {r.cid for r in got} <= set(range(4))


# --- rrf fusion --------------------------------------------------------------


def test_rrf_fuse_hand_example(spark):
    from crawler_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)], "query_id long, doc_id long, rank int"
    )
    got = {r.doc_id: (r.rrf_e9, r.rank) for r in rrf_fuse([lex, sem], k=10, k0=60).collect()}
    e = lambda r: 1000000000 // (60 + r)
    assert got[11] == (e(2) + e(1), 1)  # in both lists -> wins
    assert got[10] == (e(1) + e(3), 2)
    assert got[12] == (e(3), 4)
    assert got[13] == (e(2), 3)


def test_rrf_fuse_tie_breaks_by_doc_id(spark):
    from crawler_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 20, 1), (1, 7, 2)], "query_id long, doc_id long, rank int"
    )
    got = rrf_fuse([a, a], k=10).orderBy("rank").collect()
    assert [r.doc_id for r in got] == [20, 7]
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 7, 1)], "query_id long, doc_id long, rank int"
    )
    got = rrf_fuse([b], k=10).orderBy("rank").collect()
    assert [r.doc_id for r in got] == [7, 20]  # equal score -> id asc


def test_rrf_fuse_requires_input(spark):
    from crawler_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_fusion_end_to_end(spark):
    """BM25 + brute-force ANN fused per query: every fused hit came
    from one of the two candidate lists, and a doc ranked #1 by BOTH
    systems wins the fusion."""
    from crawler_spark.operators.ann import brute_force_topk
    from crawler_spark.operators.retrieval import bm25_topk, rrf_fuse

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet(EMB)
    words = F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != "")
    queries = (
        docs.select(F.col("doc_id").alias("query_id"), words.alias("_w"))
        .filter((F.col("query_id") % 17 == 0) & (F.size("_w") >= 7))
        .select("query_id", F.concat_ws(" ", F.slice("_w", 3, 5)).alias("qtext"))
    )
    qids = [r.query_id for r in queries.select("query_id").collect()]
    lex = bm25_topk(docs, queries, k=10).select("query_id", "doc_id", "rank")
    sem = brute_force_topk(emb, qids, k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([lex, sem], k=10).collect()
    cand = {(r.query_id, r.doc_id) for r in lex.collect()} | {
        (r.query_id, r.doc_id) for r in sem.collect()
    }
    assert fused
    assert all((r.query_id, r.doc_id) in cand for r in fused)
    lex1 = {(r.query_id, r.doc_id) for r in lex.collect() if r.rank == 1}
    sem1 = {(r.query_id, r.doc_id) for r in sem.collect() if r.rank == 1}
    for q, d in lex1 & sem1:
        top = [r.doc_id for r in fused if r.query_id == q and r.rank == 1]
        assert top == [d]
