"""Bigram-LM scoring (operators/lm.py) vs a pure-python reference:
train counts, add-one-smoothed mass/perplexity, quantile buckets."""

import math
from collections import Counter

import pytest

from crawler_spark.operators.lm import (
    lm_score,
    perplexity_buckets,
    train_bigram_lm,
)

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat sat"),
    ("d3", "a dog ran"),
    ("d4", "the cat sat on the mat again and again"),
    ("d5", "zx qq zx qq"),
    ("d6", "one"),  # single word -> no bigrams
    ("d7", ""),  # empty
    ("d8", None),  # null text
]


def _py_model(rows):
    c12, c1, succ = Counter(), Counter(), set()
    for _, text in rows:
        w = (text or "").lower().split()
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
            succ.add(b)
    return c12, c1, len(succ) + 1


def _py_scores(rows, model_rows=None):
    c12, c1, v = _py_model(model_rows if model_rows is not None else rows)
    out = {}
    for doc_id, text in rows:
        w = (text or "").lower().split()
        grams = list(zip(w, w[1:]))
        mass = sum(
            (1_000_000 * (c12[g] + 1)) // (c1[g[0]] + v) for g in grams
        )
        logp = sum(
            math.log((c12[g] + 1) / (c1[g[0]] + v)) for g in grams
        )
        out[doc_id] = (len(grams), mass, logp)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_train_bigram_lm_counts(spark, docs_df):
    got = {r["bg"]: r["c12"] for r in train_bigram_lm(docs_df).collect()}
    c12, _, _ = _py_model(DOCS)
    assert got == {f"{a} {b}": n for (a, b), n in c12.items()}


def test_lm_score_exact_matches_reference(spark, docs_df):
    exp = _py_scores(DOCS)
    rows = {r["doc_id"]: r for r in lm_score(docs_df).collect()}
    assert set(rows) == set(exp)  # every doc scored, incl. empty/null
    for doc_id, (n, mass, _) in exp.items():
        r = rows[doc_id]
        assert (r["n_bigrams"], r["mass_e6"]) == (n, mass), doc_id
        want_mean = mass / n if n else 0.0
        assert r["mean_mass_e6"] == want_mean, doc_id


def test_lm_score_float_path(spark, docs_df):
    exp = _py_scores(DOCS)
    rows = {r["doc_id"]: r for r in lm_score(docs_df, exact=False).collect()}
    for doc_id, (n, _, logp) in exp.items():
        r = rows[doc_id]
        assert r["n_bigrams"] == n
        assert r["logprob"] == pytest.approx(logp, rel=1e-12)
        if n:
            assert r["ppl"] == pytest.approx(math.exp(-logp / n), rel=1e-12)
        else:
            assert r["ppl"] is None


def test_pretrained_model_and_broadcast_equal_selftrain(spark, docs_df):
    base = sorted(map(tuple, lm_score(docs_df).collect()))
    model = train_bigram_lm(docs_df)
    assert sorted(map(tuple, lm_score(docs_df, model=model).collect())) == base
    bcast = lm_score(docs_df, model=model, broadcast_model=True)
    assert sorted(map(tuple, bcast.collect())) == base
    assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()


def test_reference_corpus_scoring(spark, docs_df):
    """CCNet shape: model trained on a clean slice, scores the rest."""
    ref = docs_df.filter("doc_id in ('d1','d2','d4')")
    scored = {
        r["doc_id"]: r
        for r in lm_score(docs_df, model=train_bigram_lm(ref)).collect()
    }
    exp = _py_scores(DOCS, model_rows=[d for d in DOCS if d[0] in ("d1", "d2", "d4")])
    for doc_id, (n, mass, _) in exp.items():
        assert (scored[doc_id]["n_bigrams"], scored[doc_id]["mass_e6"]) == (n, mass)
    # in-domain text must out-score the gibberish doc
    assert scored["d1"]["mean_mass_e6"] > scored["d5"]["mean_mass_e6"]


def test_perplexity_buckets(spark):
    scored = spark.createDataFrame(
        [(f"d{i}", float(i)) for i in range(1, 10)],
        "doc_id string, mean_mass_e6 double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(scored, n_buckets=3).collect()
    }
    # exact percentile cutoffs of 1..9 at (1/3, 2/3) = (3.667, 6.333):
    # head (bucket 0) = highest scores
    assert got == {
        "d1": 2, "d2": 2, "d3": 2,
        "d4": 1, "d5": 1, "d6": 1,
        "d7": 0, "d8": 0, "d9": 0,
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(scored, n_buckets=3, exact=False).collect()
    }
    assert sorted(approx.values()) == sorted(got.values())
