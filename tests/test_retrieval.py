"""BM25 lexical retrieval + change-rate recrawl scheduling.

Oracle hash-equality for both is covered by test_entry_oracle
(bm25_topk / recrawl_schedule); these tests pin semantics and plan
shape on hand-built inputs.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.retrieval import bm25_topk
from crawler_spark.operators.scheduler import recrawl_priorities


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quantum entanglement violates local realism experiments"),
        (2, "the stock market closed higher on strong earnings"),
        (3, "brown fox sightings reported near the quiet village"),
        (4, "the the the the the common words only document"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, qtext string")


def test_bm25_planted_match_ranks_first(spark, corpus):
    q = _queries(
        spark,
        [(100, "quantum entanglement realism"), (200, "quick brown fox")],
    )
    got = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm25_topk(corpus, q, k=3).collect()
    }
    assert got[(100, 1)] == 1  # unique-vocabulary doc wins its query
    assert got[(200, 1)] == 0  # full phrase beats partial overlap (doc 3)
    assert got[(200, 2)] == 3


def test_bm25_idf_downweights_common_terms(spark, corpus):
    # "the" appears in 4/6 docs; a query of only "the" must rank the
    # short doc with max tf saturation highest but with a far lower
    # score than a rare-term match.
    # idf_e6("the") = 1e6*5//9 = 555555 vs idf_e6("entanglement") =
    # 1e6*11//3 = 3666666: the rare term wins even though the common
    # term enjoys maximal tf saturation in doc 4.
    q = _queries(spark, [(1, "the"), (2, "entanglement")])
    rows = bm25_topk(corpus, q, k=1).collect()
    s = {r["query_id"]: r["score_e9"] for r in rows}
    assert s[2] > 2 * s[1]


def test_bm25_empty_and_nonmatching_query(spark, corpus):
    q = _queries(spark, [(9, "zzz qqq unmatched"), (10, "")])
    assert bm25_topk(corpus, q, k=5).count() == 0


def test_bm25_float_path_agrees_on_winner(spark, corpus):
    q = _queries(
        spark,
        [(100, "quantum entanglement realism"), (200, "quick brown fox")],
    )
    exact = {
        r["query_id"]: r["doc_id"]
        for r in bm25_topk(corpus, q, k=1, exact=True).collect()
    }
    flt = {
        r["query_id"]: r["doc_id"]
        for r in bm25_topk(corpus, q, k=1, exact=False).collect()
    }
    assert exact == flt
    row = bm25_topk(corpus, q, k=1, exact=False).collect()[0]
    assert isinstance(row["score"], float) and row["score"] > 0


def test_bm25_plan_never_self_joins(spark, corpus):
    q = _queries(spark, [(1, "brown fox")])
    plan = (
        bm25_topk(corpus, q, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan  # corpus side only ever broadcast-joined
    assert "WindowGroupLimit" in plan  # constant-k top-k pushdown


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "host string, url string, ts_ms long, changed long"
    )


def test_recrawl_rate_and_staleness_ordering(spark):
    # a: changes every fetch; b: never changes; c: fetched at `now`.
    rows = []
    for i in range(4):
        rows.append(("h1", "u/a", 1000 * i, 1))
        rows.append(("h1", "u/b", 1000 * i, 0))
    rows.append(("h1", "u/c", 4000, 1))  # defines now_ms = 4000
    out = {r["url"]: r for r in recrawl_priorities(_hist(spark, rows)).collect()}
    # lambda_e6: a = 9*1e6//10 = 900000, b = 1*1e6//10 = 100000
    assert out["u/a"]["priority_e6"] == 900000 * 1000
    assert out["u/b"]["priority_e6"] == 100000 * 1000
    assert out["u/c"]["priority_e6"] == 0  # just fetched: zero staleness
    assert out["u/a"]["n_obs"] == 4 and out["u/a"]["n_changes"] == 4


def test_recrawl_budget_caps_per_host(spark):
    rows = [
        ("h1", f"u/{i}", 1000 + (0 if i else 5000), i % 2) for i in range(6)
    ] + [("h2", "v/0", 1000, 1), ("h1", "u/now", 6000, 0)]
    out = recrawl_priorities(_hist(spark, rows), budget=2)
    per_host = (
        out.groupBy("host").count().collect()
    )
    assert all(r["count"] <= 2 for r in per_host)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_recrawl_deterministic_across_partitionings(spark):
    rows = [
        (f"h{i % 7}", f"u/{i % 37}", 100 * (i % 11), (i * 7) % 2)
        for i in range(300)
    ]
    a = recrawl_priorities(_hist(spark, rows).repartition(1), budget=3)
    b = recrawl_priorities(_hist(spark, rows).repartition(16), budget=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_eval_topk_metrics(spark):
    from crawler_spark.operators.retrieval import eval_topk

    results = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3),   # rel at rank 2 and 3
            (2, 20, 1), (2, 21, 2),               # no rel
            (3, 31, 1),                           # rel at rank 1
        ],
        "query_id int, doc_id int, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 11), (1, 12), (3, 31), (4, 99)],  # q4 has no results -> absent
        "query_id int, doc_id int",
    )
    got = {r["query_id"]: (r["best_rank"], r["rr_e6"], r["n_rel_topk"])
           for r in eval_topk(results, qrels).collect()}
    assert got == {
        1: (2, 500000, 2),
        2: (0, 0, 0),
        3: (1, 1000000, 1),
    }


def test_eval_topk_bm25_self_retrieval(spark, corpus):
    """Queries built from a doc's own words must retrieve that doc at
    rank 1 (it contains every query term)."""
    from crawler_spark.operators.retrieval import bm25_topk, eval_topk
    from pyspark.sql import functions as F

    queries = corpus.filter((F.col("doc_id") % 2 == 0) & (F.col("text") != "")).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    res = bm25_topk(corpus, queries, k=5)
    qrels = queries.select("query_id", F.col("query_id").alias("doc_id"))
    ev = eval_topk(res, qrels)
    n = ev.count()
    assert n > 0
    assert ev.filter(F.col("best_rank") == 1).count() == n
