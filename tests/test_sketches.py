"""Exact heavy hitters: Misra-Gries candidates + exact verify.

Certification strategy: the operator must equal the brute-force
`groupBy(tok) HAVING cnt*1e6 >= phi_e6*N` under every phi and under
ADVERSARIAL partitioning (heavy tokens spread thin across partitions
— the case where a naive per-partition top-k loses them and only the
MG averaging bound keeps them in the candidate set)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from crawler_spark.operators.sketches import heavy_hitters, token_occurrences


def _brute(spark_docs, phi_e6):
    toks = token_occurrences(spark_docs)
    n = toks.count()
    return {
        (r["tok"], r["cnt"], n)
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 1_000_000 >= phi_e6 * n)
        .collect()
    }


def _result(df):
    return {(r["tok"], r["cnt"], r["total_tokens"]) for r in df.collect()}


def _corpus(spark, n_docs=400, n_parts=8):
    """Zipf-ish synthetic docs: token t{j} appears with frequency ~1/j,
    plus a long tail of unique tokens to keep the vocabulary >> m."""
    rows = []
    for i in range(n_docs):
        words = []
        for j in range(1, 40):
            if i % j == 0:
                words.append(f"t{j}")
        words.append(f"unique_{i}")  # tail
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).repartition(n_parts, "doc_id")


@pytest.mark.parametrize("phi_e6", [150_000, 50_000, 10_000, 2_000])
def test_heavy_hitters_exact_vs_brute_force(spark, phi_e6):
    docs = _corpus(spark)
    got = _result(heavy_hitters(docs, phi_e6=phi_e6))
    want = _brute(docs, phi_e6)
    assert got == want
    assert want, "fixture must produce at least one heavy hitter"


def test_heavy_hitters_adversarial_partitioning(spark):
    """Spread each heavy token's occurrences one-per-partition: no
    partition sees it as locally heavy, but the merged-summary bound
    must still keep it. Capacity pinned just above the sound minimum
    ceil(1/phi) so the MG summaries churn constantly."""
    docs = _corpus(spark, n_docs=300, n_parts=16)
    # round-robin partitioning by doc_id spreads every token thin
    docs = docs.repartition(16, F.col("doc_id") % 16)
    got = _result(heavy_hitters(docs, phi_e6=20_000, capacity=55))
    want = _brute(docs, 20_000)
    assert got == want


def test_heavy_hitters_partitioning_invariance(spark):
    docs = _corpus(spark)
    a = _result(heavy_hitters(docs.repartition(1), phi_e6=10_000))
    b = _result(heavy_hitters(docs.repartition(13), phi_e6=10_000))
    assert a == b


def test_heavy_hitters_empty_and_blank(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitters(empty, phi_e6=1000).count() == 0
    blank = spark.createDataFrame([(0, "   "), (1, "")], "doc_id long, text string")
    assert heavy_hitters(blank, phi_e6=1000).count() == 0


def test_heavy_hitters_rejects_bad_phi(spark):
    docs = _corpus(spark, n_docs=5)
    with pytest.raises(ValueError):
        heavy_hitters(docs, phi_e6=0)


def test_candidate_capacity_bound_documented(spark):
    """The default capacity keeps every true heavy hitter even at the
    exact threshold boundary: token with cnt == ceil(phi*N) must appear."""
    # 50 docs of one token 'hot' + filler such that hot is exactly at
    # the threshold for phi = 10%: N = 100, hot = 10.
    rows = [(i, "hot") for i in range(10)] + [
        (100 + i, f"f{i}a f{i}b f{i}c") for i in range(30)
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = _result(heavy_hitters(docs, phi_e6=100_000))
    n = 10 + 90
    assert ("hot", 10, n) in got


def test_stop_shingles_matches_exact_counts(spark):
    """stop_shingles == the exact HAVING over per-doc-distinct shingle
    occurrences, and jaccard_pairs(stop_list=) == the max_df guard when
    the list is derived from the same df bound."""
    import pandas as pd

    from pyspark.sql import functions as F

    from crawler_spark.operators.textdedup import (
        jaccard_pairs,
        shingles,
        stop_shingles,
    )

    rows = []
    boiler = "all rights reserved contact us now"
    for i in range(60):
        body = f"doc {i} body text number {i % 7} alpha beta gamma {i}"
        # boilerplate on most docs -> share-heavy shingles
        rows.append((i, body + (" " + boiler if i % 3 else "")))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    got = {
        (r["tok"], r["cnt"]) for r in stop_shingles(docs, phi_e6=30_000).collect()
    }
    t = shingles(docs)
    n = t.count()
    want = {
        (r["tok"], r["cnt"])
        for r in t.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 1_000_000 >= 30_000 * n)
        .collect()
    }
    assert got == want and want

    # stop_list path == max_df path when the list IS {df > max_df}
    max_df = 15
    heavy = (
        t.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("tok")
    )
    a = sorted(
        map(tuple, jaccard_pairs(docs, threshold=0.05, max_df=max_df).collect())
    )
    b = sorted(
        map(
            tuple,
            jaccard_pairs(docs, threshold=0.05, stop_list=heavy).collect(),
        )
    )
    assert a == b and a


# ------------------------------------------------------- heavy_hitters_by
def _brute_by(spark_docs, phi_e6):
    from crawler_spark.operators.sketches import token_occurrences

    toks = spark_docs.select(
        F.col("lang").alias("stratum"),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
            )
        ).alias("tok"),
    )
    tot = toks.groupBy("stratum").agg(F.count("*").alias("n"))
    return {
        (r["stratum"], r["tok"], r["cnt"], r["n"])
        for r in toks.groupBy("stratum", "tok")
        .agg(F.count("*").alias("cnt"))
        .join(tot, "stratum")
        .filter(F.col("cnt") * 1_000_000 >= phi_e6 * F.col("n"))
        .collect()
    }


def _lang_corpus(spark, n_docs=300, n_parts=8):
    rows = []
    langs = ["en", "fr", "de"]
    for i in range(n_docs):
        lang = langs[i % 3]
        words = [f"{lang}_t{j}" for j in range(1, 30) if i % j == 0]
        words.append(f"{lang}_u{i}")
        rows.append((i, " ".join(words), lang))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    ).repartition(n_parts, "doc_id")


@pytest.mark.parametrize("phi_e6", [100_000, 20_000, 5_000])
def test_heavy_hitters_by_exact_vs_brute(spark, phi_e6):
    from crawler_spark.operators.sketches import heavy_hitters_by

    docs = _lang_corpus(spark)
    got = {
        (r["stratum"], r["tok"], r["cnt"], r["total_tokens"])
        for r in heavy_hitters_by(docs, "lang", phi_e6=phi_e6).collect()
    }
    want = _brute_by(docs, phi_e6)
    assert got == want and want


def test_heavy_hitters_by_adversarial_partitioning(spark):
    from crawler_spark.operators.sketches import heavy_hitters_by

    docs = _lang_corpus(spark, n_docs=240).repartition(16, F.col("doc_id") % 16)
    got = {
        (r["stratum"], r["tok"], r["cnt"])
        for r in heavy_hitters_by(docs, "lang", phi_e6=30_000, capacity=38).collect()
    }
    want = {(s, t, c) for s, t, c, _ in _brute_by(docs, 30_000)}
    assert got == want


def test_heavy_hitters_by_disjoint_strata_thresholds(spark):
    """A token heavy in a small stratum but globally light must appear
    ONLY under that stratum (per-stratum totals, not corpus totals)."""
    from crawler_spark.operators.sketches import heavy_hitters_by

    rows = [(i, "filler" + str(i), "big") for i in range(500)]
    rows += [(1000 + i, "rare_hot", "small") for i in range(5)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    got = heavy_hitters_by(docs, "lang", phi_e6=500_000).collect()
    assert {(r["stratum"], r["tok"], r["cnt"], r["total_tokens"]) for r in got} == {
        ("small", "rare_hot", 5, 5)
    }


def test_heavy_hitters_rejects_unsound_capacity(spark):
    from crawler_spark.operators.sketches import heavy_hitters, heavy_hitters_by

    docs = _corpus(spark, n_docs=5)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(docs, phi_e6=20_000, capacity=8)
    docs_by = docs.withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_by(docs_by, "lang", phi_e6=20_000, capacity=8)
