"""Mixture-weight / token-budget selection tests (operators/mixing.py).

Hand-computed expectations on a tiny corpus, the alpha-flattening
property, budget accounting invariants, and the plan shape (budget
side broadcast, exactly one window shuffle keyed by stratum).
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.mixing import (
    WEIGHT_SCALE,
    mixture_weights,
    stratum_token_budgets,
    token_budget_select,
)

ROWS = [
    # (doc_id, lang, text) — en: 12 tokens over 3 docs, fr: 3 tokens over 1
    (1, "en", "a b c d"),
    (2, "en", "e f g h"),
    (3, "en", "i j k l"),
    (4, "fr", "un deux trois"),
    (5, "de", ""),  # blank text: 0 tokens, stratum still present
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "lang", "text"])


def test_mixture_weights_hand_computed(docs):
    import math

    rows = {r["stratum"]: r for r in mixture_weights(docs).collect()}
    assert set(rows) == {"en", "fr", "de"}
    assert rows["en"]["tokens"] == 12 and rows["en"]["n_docs"] == 3
    assert rows["fr"]["tokens"] == 3 and rows["de"]["tokens"] == 0
    w_en = math.floor(math.sqrt(12 * WEIGHT_SCALE))
    w_fr = math.floor(math.sqrt(3 * WEIGHT_SCALE))
    assert rows["en"]["weight"] == w_en
    assert rows["fr"]["weight"] == w_fr
    assert rows["de"]["weight"] == 0
    assert rows["en"]["p"] == 12 / 15
    assert rows["en"]["share"] == w_en / (w_en + w_fr)
    # alpha=0.5 flattens: the minority stratum's share exceeds its p
    assert rows["fr"]["share"] > rows["fr"]["p"]
    assert rows["en"]["share"] < rows["en"]["p"]


def test_exact_requires_half_alpha(docs):
    with pytest.raises(ValueError):
        mixture_weights(docs, alpha=0.3)
    # float path accepts any alpha and still sums shares to ~1
    shares = [r["share"] for r in mixture_weights(docs, alpha=0.3, exact=False).collect()]
    assert abs(sum(shares) - 1.0) < 1e-9


def test_budget_split_is_exact_integer(docs):
    w = mixture_weights(docs)
    budgets = {r["stratum"]: r["token_budget"]
               for r in stratum_token_budgets(w, 10).collect()}
    rows = {r["stratum"]: r for r in w.collect()}
    tw = sum(r["weight"] for r in rows.values())
    for s, r in rows.items():
        assert budgets[s] == (r["weight"] * 10) // tw
    assert sum(budgets.values()) <= 10


def test_selection_respects_budgets_and_prefix_order(docs):
    sel = token_budget_select(docs, budget=10).collect()
    by_stratum: dict = {}
    for r in sel:
        by_stratum.setdefault(r["stratum"], []).append(r)
    for s, rows in by_stratum.items():
        rows.sort(key=lambda r: r["cum_tokens"])
        # inclusive running sum, every prefix within the stratum budget
        acc = 0
        for r in rows:
            acc += r["tokens"]
            assert r["cum_tokens"] == acc
            assert acc <= r["token_budget"]
    # en budget floor((w_en*10)//(w_en+w_fr)) = 6 tokens -> one 4-token doc
    # selected (second would overflow to 8 > 6)... verify against math
    import math

    w_en = math.floor(math.sqrt(12 * WEIGHT_SCALE))
    w_fr = math.floor(math.sqrt(3 * WEIGHT_SCALE))
    b_en = (w_en * 10) // (w_en + w_fr)
    assert sum(r["tokens"] for r in by_stratum.get("en", [])) <= b_en


def test_order_col_selects_best_first(spark):
    docs = spark.createDataFrame(
        [(i, "en", "tok " * 5, float(i)) for i in range(1, 7)],
        ["doc_id", "lang", "text", "score"],
    )
    # each doc is 5 tokens; budget 15 -> exactly the 3 best by score
    sel = token_budget_select(docs, budget=15, order_col="score")
    assert sorted(r["doc_id"] for r in sel.collect()) == [4, 5, 6]


def test_plan_shape(docs):
    plan = token_budget_select(docs, budget=100)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # the docs-side running sum is the only hashpartitioning(stratum) exchange
    assert plan.count("hashpartitioning(stratum") == 1
