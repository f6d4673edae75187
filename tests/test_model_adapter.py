"""Real-model adapter contract (operators/models.py): an actual numpy
model — not the hash stand-in — wired through the embed / weights=
drop-in points, with the execution shape asserted: Arrow-batched
pandas_udf (never row-at-a-time Python), broadcast weights (never a
corpus shuffle)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.models import (
    _doc_bucket_counts,
    bucketize_text,
    int_matrix_embedding,
    matrix_embedder,
    py_md5_bucket,
    train_token_logreg,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "",  # empty doc must embed to the zero vector, not crash the batch
    "the the the repeated token document",
]


def _docs(spark):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


def test_matrix_embedder_matches_local_numpy(spark):
    rng = np.random.RandomState(7)
    w = rng.randn(32, 6).astype(np.float32)
    embed = matrix_embedder(spark, w)
    got = {
        r.doc_id: np.array(r.emb, dtype=np.float32)
        for r in _docs(spark).select("doc_id", embed(F.col("text")).alias("emb")).collect()
    }
    counts = _doc_bucket_counts(pd.Series(TEXTS), 32)
    want = counts.astype(np.float32) @ w
    for i in range(len(TEXTS)):
        np.testing.assert_allclose(got[f"d{i}"], want[i], rtol=1e-6)
    assert not got["d3"].any()  # empty doc -> zero vector


def test_embedder_plan_is_arrow_batched(spark):
    embed = matrix_embedder(spark, np.zeros((8, 4), dtype=np.float32))
    plan = (
        _docs(spark)
        .select(embed(F.col("text")).alias("e"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan  # vectorized Arrow transfer
    assert "BatchEvalPython" not in plan  # the row-at-a-time marker


def test_int_embedding_matches_jvm_bucketing(spark):
    """The Python-side md5 bucketing must agree bit-for-bit with the
    JVM md5_bucket spelling — certifies the adapter against the same
    hash-parity idiom every oracle twin uses."""
    from crawler_spark.functions.text import WS_RE, md5_bucket

    n_buckets, dim = 16, 4
    w = (np.arange(n_buckets * dim, dtype=np.int64).reshape(n_buckets, dim) * 7) % 23 - 11
    embed = int_matrix_embedding(spark, w)
    got = _docs(spark).select("doc_id", embed(F.col("text")).alias("e"))

    words = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), WS_RE),
        lambda x: x != "",
    )
    rows = [
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, tok: acc
            + F.element_at(
                F.array(*[F.lit(int(w[b, j])) for b in range(n_buckets)]),
                (md5_bucket(tok) % n_buckets + 1).cast("int"),
            ),
        ).alias(f"j{j}")
        for j in range(dim)
    ]
    want = _docs(spark).select("doc_id", F.array(*rows).alias("e"))
    assert sorted((r.doc_id, tuple(r.e)) for r in got.collect()) == sorted(
        (r.doc_id, tuple(r.e)) for r in want.collect()
    )


def test_trained_logreg_through_classifier_score(spark):
    """Train a REAL numpy logistic regression, export its quantized
    bucket weights, and score the corpus through the unchanged
    classifier_score(weights=) broadcast path."""
    from crawler_spark.functions.text import classifier_score

    good_vocab = ["insight", "theorem", "careful", "evidence", "lucid"]
    bad_vocab = ["click", "spam", "buy", "winner", "free"]
    rows = []
    for i in range(40):
        g = " ".join(good_vocab[j % 5] for j in range(i, i + 6))
        b = " ".join(bad_vocab[j % 5] for j in range(i, i + 6))
        rows.append((f"g{i}", g, 1))
        rows.append((f"b{i}", b, 0))
    train_pdf = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    model, weights_pdf = train_token_logreg(train_pdf, n_buckets=64)

    # the model actually learned the separation
    X = _doc_bucket_counts(train_pdf["text"], 64)
    acc = ((X @ model > 0).astype(int) == train_pdf["label"].to_numpy()).mean()
    assert acc == 1.0

    docs = spark.createDataFrame(train_pdf[["doc_id", "text"]], ["doc_id", "text"])
    weights = spark.createDataFrame(weights_pdf)
    scored = classifier_score(bucketize_text(docs, n_buckets=64), weights=weights)
    got = {r.doc_id: r.label for r in scored.collect()}
    assert all(got[f"g{i}"] for i in range(40))
    assert not any(got[f"b{i}"] for i in range(40))

    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # vocab broadcasts
    assert "SortMergeJoin" not in plan  # the corpus never shuffles to join


def test_engine_crawls_with_real_embedder(spark, tmp_path):
    """End-to-end: CrawlEngine(embedder=...) crawls and every produced
    embedding is the real model's output (page vectors, downstream
    embeddings and semantic-search query vectors all flow through the
    same adapter — identical text must retrieve itself at rank 1)."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.world import make_world

    rng = np.random.RandomState(3)
    dim = 8
    embed = matrix_embedder(spark, rng.randn(64, dim).astype(np.float32))
    world = make_world(seed=11, n_hosts=2, n_urls=10, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(
        spark, str(tmp_path / "m"), embed_dim=dim, embedder=embed,
        vector_index=True, vector_scale=64.0,
    )
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=8)

    emb = eng.io.read(spark, "embeddings")
    assert emb.count() > 0
    assert all(len(r.embedding) == dim for r in emb.collect())
    # a non-hash embedder produces values outside hash_embedding's
    # [-0.5, 0.5) range for at least one component (proves the stand-in
    # did not silently serve the request)
    flat = [abs(v) for r in emb.collect() for v in r.embedding]
    assert max(flat) >= 0.5

    page = eng.io.read(spark, "documents").limit(1).collect()[0]
    from crawler_spark.operators.textdedup import doc_text

    text = (
        eng.io.read(spark, "documents")
        .filter(F.col("doc_id") == page.doc_id)
        .select(doc_text().alias("t"))
        .collect()[0]
        .t
    )
    q = spark.createDataFrame([("q1", text)], ["query_id", "qtext"])
    top = eng.search_semantic(q, k=1).collect()[0]
    assert top.neighbor_id == page.doc_id
