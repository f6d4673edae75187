"""Exact-integer batch perceptron (operators/classifier.py): pure-python
reference equality, partitioning invariance, convergence/early-stop,
composition with classifier_score, and the engine distillation hook."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.classifier import (
    BIAS_TOK,
    classifier_eval,
    token_counts,
    train_perceptron,
)

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog", 1),
    (1, "buy now spam spam click here buy", -1),
    (2, "a thoughtful essay about the nature of things", 1),
    (3, "click click click buy buy spam", -1),
    (4, "", -1),
    (5, None, -1),
    (6, "the fox and the dog again with more words", 1),
    (7, "spam offer now now now", -1),
]


def _py_train(corpus, n_iters):
    feats = {}
    for did, text, y in corpus:
        toks = Counter((text or "").strip().lower().split())
        toks[BIAS_TOK] += 1
        feats[did] = (toks, y)
    w = defaultdict(int)
    for _ in range(n_iters):
        mistakes = [
            did
            for did, (toks, y) in feats.items()
            if sum(c * w[t] for t, c in toks.items()) * y <= 0
        ]
        if not mistakes:
            break
        delta = defaultdict(int)
        for did in mistakes:
            toks, y = feats[did]
            for t, c in toks.items():
                delta[t] += y * c
        for t, d in delta.items():
            w[t] += d
    return {t: v for t, v in w.items() if v != 0}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string, y long")


def _weights(df):
    return {r["tok"]: r["weight"] for r in df.collect()}


def test_matches_python_reference(spark, docs):
    for t in (1, 2, 5):
        assert _weights(train_perceptron(docs, "y", n_iters=t)) == _py_train(
            CORPUS, t
        )


def test_invariant_to_partitioning(spark, docs):
    a = _weights(train_perceptron(docs, "y", n_iters=4))
    b = _weights(train_perceptron(docs.repartition(7), "y", n_iters=4))
    assert a == b and len(a) > 0


def test_converges_and_early_stops(spark, docs):
    w = train_perceptron(docs, "y", n_iters=50)
    ev = classifier_eval(docs, "y", w).first()
    assert ev["n_correct"] == ev["n_docs"] == len(CORPUS)
    assert ev["fp"] == ev["fn"] == 0
    # early stop: once converged, more iterations change nothing
    assert _weights(w) == _weights(train_perceptron(docs, "y", n_iters=60))


def test_precomputed_features_path(spark, docs):
    feats = token_counts(docs)
    a = _weights(train_perceptron(docs, "y", n_iters=3))
    b = _weights(train_perceptron(docs, "y", n_iters=3, features=feats))
    assert a == b


def test_composes_with_classifier_score(spark, docs):
    from crawler_spark.functions.text import classifier_score

    w = train_perceptron(docs, "y", n_iters=10)
    wd = _weights(w)
    bias = wd.get(BIAS_TOK, 0)
    # classifier_score tokenizes identically but has no bias feature:
    # its logit is the trained margin minus the bias weight
    scored = {
        r["doc_id"]: r["logit"]
        for r in classifier_score(docs, weights=w).collect()
    }
    for did, text, y in CORPUS:
        toks = Counter((text or "").strip().lower().split())
        margin = sum(c * wd.get(t, 0) for t, c in toks.items()) + bias
        assert scored[did] == margin - bias
        assert (margin > 0) == (y > 0)


def test_engine_distillation(spark, tmp_path):
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.world import make_world

    world = make_world(seed=31, n_hosts=3, n_urls=12, budget=4, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path / "distill"))
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=8)
    w = eng.train_quality_classifier(n_iters=12, min_words=20)
    labeled = eng._page_corpus().select(
        "doc_id",
        "text",
        F.when(
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) >= 20, 1
        )
        .otherwise(-1)
        .cast("long")
        .alias("y"),
    )
    ev = classifier_eval(labeled, "y", w).first()
    assert ev["n_docs"] > 0
    assert ev["n_correct"] >= ev["n_docs"] * 0.9  # distilled gate fits its labels
    # deterministic retrain
    assert _weights(w) == _weights(eng.train_quality_classifier(n_iters=12, min_words=20))


def _py_train_averaged(corpus, n_iters):
    feats = {}
    for did, text, y in corpus:
        toks = Counter((text or "").strip().lower().split())
        toks[BIAS_TOK] += 1
        feats[did] = (toks, y)
    w, cum, done = defaultdict(int), defaultdict(int), 0
    for _ in range(n_iters):
        mistakes = [
            did for did, (toks, y) in feats.items()
            if sum(c * w[t] for t, c in toks.items()) * y <= 0
        ]
        if not mistakes:
            break
        for did in mistakes:
            toks, y = feats[did]
            for t, c in toks.items():
                w[t] += y * c
        done += 1
        for t, v in w.items():
            cum[t] += v
    for t, v in w.items():
        cum[t] += v * (n_iters - done)
    return {t: v for t, v in cum.items() if v != 0}


def test_averaged_matches_python_reference(spark, docs):
    for t in (2, 5, 60):  # 60 exercises the early-convergence tail
        got = _weights(train_perceptron(docs, "y", n_iters=t, averaged=True))
        assert got == _py_train_averaged(CORPUS, t), f"iters={t}"


def test_averaged_still_separates(spark, docs):
    w = train_perceptron(docs, "y", n_iters=20, averaged=True)
    ev = classifier_eval(docs, "y", w).first()
    assert ev["n_correct"] == ev["n_docs"]


def test_iteration_plan_broadcasts_weights(spark, docs):
    """The per-iteration margin job must broadcast the WEIGHTS side and
    never sort-merge-join the feature table (pinning the scale shape:
    vocab is MBs, features are corpus-sized)."""
    labels = docs.select("doc_id", F.col("y"))
    feats = token_counts(docs).join(labels, "doc_id").localCheckpoint(eager=True)
    weights = spark.createDataFrame([("the", 5)], "tok string, weight long")
    margins = (
        feats.join(F.broadcast(weights), "tok", "left")
        .groupBy("doc_id", "y")
        .agg(
            F.sum(F.col("cnt") * F.coalesce("weight", F.lit(0)))
            .cast("long")
            .alias("margin")
        )
    )
    p = margins._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
