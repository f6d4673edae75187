"""DSIR importance-resampling selection (operators/dsir.py).

The bit-level engine-vs-DuckDB certification lives in
test_entry_oracle (dsir_weights / dsir_select at sf0.01); these tests
pin the SEMANTICS (target-like docs outrank off-target docs, smoothing
behavior, zero-gram docs) and the PLAN (weight table broadcasts, the
corpus never self-joins)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dsir import (
    DSIR_SCALE,
    bucket_counts,
    dsir_scores,
    dsir_select,
    dsir_weights,
)

TARGETY = [
    "the quick brown fox jumps over the lazy dog",
    "the brown dog sleeps under the quick fox",
    "quick brown animals jump over lazy dogs daily",
]
OFFY = [
    "zzz qqq www eee rrr ttt yyy uuu iii",
    "numeric 123 456 789 tokens without english words",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i, t in enumerate(TARGETY):
        rows.append((i, t, "tgt"))
    for i, t in enumerate(OFFY):
        rows.append((100 + i, t, "off"))
    rows.append((200, "", "off"))  # zero-gram doc
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_weights_favor_target_vocab(spark, corpus):
    target = corpus.filter("kind = 'tgt'")
    w = dsir_weights(target, corpus, n_buckets=256)
    rows = {r["bucket"]: r for r in w.collect()}
    # buckets that only raw (off-target) docs hit have t_cnt=0 and a
    # weight strictly below the neutral fixed-point 1.0; buckets the
    # target dominates sit strictly above it
    below = [r for r in rows.values() if r["t_cnt"] == 0]
    above = [r for r in rows.values() if r["t_cnt"] >= r["r_cnt"] > 0]
    assert below and above
    assert all(r["weight"] < DSIR_SCALE for r in below)
    assert all(r["weight"] > DSIR_SCALE for r in above)


def test_select_ranks_targety_docs_first(spark, corpus):
    target = corpus.filter("kind = 'tgt'")
    sel = dsir_select(corpus, target, k=3, n_buckets=256,
                      length_normalize=True)
    top = [r["doc_id"] for r in sel.collect()]
    assert set(top) == {0, 1, 2}, top


def test_zero_gram_doc_survives_with_zero_score(spark, corpus):
    target = corpus.filter("kind = 'tgt'")
    w = dsir_weights(target, corpus, n_buckets=256)
    s = {r["doc_id"]: r for r in dsir_scores(corpus, w, n_buckets=256).collect()}
    assert s[200]["n_grams"] == 0
    assert s[200]["score"] == 0
    assert s[200]["mean_w"] == 0.0
    assert len(s) == corpus.count()


def test_float_path_agrees_on_ranking(spark, corpus):
    target = corpus.filter("kind = 'tgt'")
    exact = dsir_select(corpus, target, k=6, n_buckets=256,
                        length_normalize=True)
    # exact=False adds Gumbel noise — compare the underlying float
    # scores' ordering instead of the resampled order
    wf = dsir_weights(target, corpus, n_buckets=256, exact=False)
    sf = dsir_scores(corpus, wf, n_buckets=256, neutral_weight=0.0)
    float_rank = [
        r["doc_id"]
        for r in sf.filter("n_grams > 0")
        .orderBy((F.col("score") / F.col("n_grams")).desc(), "doc_id")
        .collect()
    ]
    exact_rank = [r["doc_id"] for r in exact.filter("n_grams > 0").collect()]
    # both paths put every target-like doc ahead of every off-target doc
    assert [d < 100 for d in float_rank] == sorted(
        [d < 100 for d in float_rank], reverse=True
    )
    assert [d < 100 for d in exact_rank] == sorted(
        [d < 100 for d in exact_rank], reverse=True
    )


def test_gumbel_select_runs_and_is_deterministic(spark, corpus):
    target = corpus.filter("kind = 'tgt'")
    a = dsir_select(corpus, target, k=4, n_buckets=256, exact=False)
    b = dsir_select(corpus, target, k=4, n_buckets=256, exact=False)
    assert [r["doc_id"] for r in a.collect()] == [r["doc_id"] for r in b.collect()]


def test_plan_broadcasts_weights_and_never_selfjoins_corpus(spark, corpus):
    target = corpus.filter("kind = 'tgt'")
    w = dsir_weights(target, corpus, n_buckets=256)
    plan = dsir_scores(corpus, w, n_buckets=256)._jdf.queryExecution().executedPlan().toString()
    # the corpus-side weight lookup broadcasts; the only permitted
    # shuffle join is the full-outer of the two ≤n_buckets-row
    # histograms inside the weight-table build
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1
    # top-k compiles to TakeOrderedAndProject, not a global sort
    sel_plan = dsir_select(corpus, target, k=3, n_buckets=256)
    p = sel_plan._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p


def test_bucket_counts_bounded_by_n_buckets(spark, corpus):
    assert bucket_counts(corpus, n_buckets=16).count() <= 16
