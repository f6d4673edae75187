"""Hot-bucket guards on the LSH-family pair generators.

Failure class: a degenerate bucket key — every empty/boilerplate doc
sharing one minhash band or one simhash block value — turns the
bucketed join's |bucket|² contract into a single-task quadratic burst.
The guards drop over-cap buckets (they are exact-dup signal, not
near-dup signal) and surface the drop through pyspark.sql.Observation
metrics plus the lsh_hot_buckets audit frame (no silent caps).

Each test PLANTS the degenerate population (hundreds of identical
docs), asserts the guarded output is exactly the un-degenerate pairs,
and asserts the drop was observed."""

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from crawler_spark.operators.multimodal import media_near_dup_pairs
from crawler_spark.operators.textdedup import (
    lsh_hot_buckets,
    minhash_lsh_delta_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
    simhash_near_dup_pairs,
)

BOILER = "cookie banner accept all cookies to continue to this site"
REAL_A = "the quick brown fox jumps over the lazy dog in the morning sun"
REAL_B = "the quick brown fox jumps over the lazy dog in the morning rain"


def _docs(spark, n_degenerate=300):
    rows = [(f"dup{i:04d}", BOILER) for i in range(n_degenerate)]
    rows += [("real_a", REAL_A), ("real_b", REAL_B)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_guard_drops_degenerate_bucket(spark):
    docs = _docs(spark)
    obs = Observation("lsh_guard")
    pairs = minhash_lsh_pairs(docs, max_bucket=100, observation=obs).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    # the 300-doc boilerplate bucket (C(300,2)=44850 pairs) is gone;
    # the genuine near-dup pair survives (real_a/real_b share bands:
    # 1-word diff on a 12-word doc keeps most shingles identical)
    assert all("dup" not in a and "dup" not in b for a, b in got)
    assert ("real_a", "real_b") in got
    m = obs.get
    assert m["hot_buckets"] >= 1
    assert m["hot_bucket_docs"] >= 300


def test_minhash_guard_off_reproduces_quadratic(spark):
    docs = _docs(spark, n_degenerate=40)
    n = minhash_lsh_pairs(docs, max_bucket=None).count()
    assert n >= 40 * 39 // 2  # the |bucket|² contract, unguarded


def test_lsh_hot_buckets_audit(spark):
    docs = _docs(spark)
    hot = lsh_hot_buckets(docs, max_bucket=100).collect()
    assert len(hot) >= 1
    assert all(r.n_ids == 300 for r in hot)
    assert all(r.sample_id == "dup0000" for r in hot)
    # audit + guard partition the bucket space: nothing hot survives
    sigs = minhash_signatures(docs)
    survivors = minhash_lsh_pairs(signatures=sigs, max_bucket=100)
    assert survivors.filter(F.col("doc_a").startswith("dup")).count() == 0


def test_delta_pairs_guard(spark):
    docs = _docs(spark)
    sigs = minhash_signatures(docs).localCheckpoint()
    delta = sigs.filter(F.col("doc_id").isin("dup0000", "real_b"))
    obs = Observation("delta_guard")
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_delta_pairs(
            sigs, delta, max_bucket=100, observation=obs
        ).collect()
    }
    assert got == {("real_a", "real_b")}
    assert obs.get["hot_buckets"] >= 1
    # unguarded: dup0000 meets all 299 siblings
    n = minhash_lsh_delta_pairs(sigs, delta, max_bucket=None).count()
    assert n >= 299


def test_hot_bucket_audit_delta_bounded(spark):
    """The fold-time audit (engine.update_dup_clusters) restricts
    lsh_hot_buckets to the delta's band keys: a fold can only drop
    delta-touched keys, so auditing untouched hot buckets is wasted
    full-corpus work. Semantics: hot-but-untouched buckets disappear
    from the restricted audit; hot-and-touched buckets stay. Plan: the
    restriction is a BROADCAST semi-join feeding the aggregate (the
    full band table is filtered map-side, never shuffled whole)."""
    docs = _docs(spark)
    sigs = minhash_signatures(docs).localCheckpoint()
    untouched_delta = sigs.filter(F.col("doc_id") == "real_b")
    touched_delta = sigs.filter(F.col("doc_id").isin("dup0000", "real_b"))
    full = lsh_hot_buckets(signatures=sigs, max_bucket=100)
    assert full.count() >= 1
    assert (
        lsh_hot_buckets(
            signatures=sigs, max_bucket=100, touched_by=untouched_delta
        ).count()
        == 0
    )
    restricted = lsh_hot_buckets(
        signatures=sigs, max_bucket=100, touched_by=touched_delta
    )
    assert restricted.count() == full.count()  # boiler bucket is touched
    plan = restricted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_delta_pairs_precomputed_hot_keys(spark):
    """hot_keys= (the persisted-index / shared-fold path) must drop
    pair-for-pair what the inline guard drops, with no bucket-size
    aggregate left in the query plan."""
    docs = _docs(spark)
    sigs = minhash_signatures(docs).localCheckpoint()
    delta = sigs.filter(F.col("doc_id").isin("dup0000", "real_b"))
    hot = lsh_hot_buckets(signatures=sigs, max_bucket=100).localCheckpoint()
    inline = sorted(
        map(tuple, minhash_lsh_delta_pairs(sigs, delta, max_bucket=100).collect())
    )
    pre = minhash_lsh_delta_pairs(sigs, delta, max_bucket=100, hot_keys=hot)
    assert sorted(map(tuple, pre.collect())) == inline == [("real_a", "real_b")]

    def n_aggs(df):
        return df._jdf.queryExecution().executedPlan().toString().count("HashAggregate")

    guardless = minhash_lsh_delta_pairs(sigs, delta, max_bucket=None)
    assert n_aggs(pre) == n_aggs(guardless)


def test_simhash_guard_drops_degenerate_block(spark):
    docs = _docs(spark)
    obs = Observation("simhash_guard")
    pairs = simhash_near_dup_pairs(
        docs, max_hamming=3, max_bucket=100, observation=obs
    ).collect()
    assert all("dup" not in r.doc_a and "dup" not in r.doc_b for r in pairs)
    m = obs.get
    assert m["hot_buckets"] >= 4  # identical docs collide on all 4 blocks
    assert m["hot_bucket_docs"] >= 4 * 300


def test_simhash_precomputed_hot_blocks(spark):
    """The index-build guard split: simhash_hot_blocks persisted once
    must yield pair-for-pair the same guarded result as the in-query
    aggregate, drop the planted degenerate block, and remove the
    per-call corpus aggregate from the query plan (exactly one
    block-explode aggregate remains: none — both self-join sides are
    scans + the tiny broadcast anti-join)."""
    from crawler_spark.operators.textdedup import simhash_hot_blocks

    docs = _docs(spark)
    sigs = simhash(docs).localCheckpoint()
    hot = simhash_hot_blocks(sigs, max_bucket=100).localCheckpoint()
    assert hot.count() >= 4  # identical docs collide on all 4 blocks
    inline = sorted(
        map(tuple, simhash_near_dup_pairs(signatures=sigs, max_bucket=100).collect())
    )
    pre = simhash_near_dup_pairs(signatures=sigs, max_bucket=100, hot_blocks=hot)
    assert sorted(map(tuple, pre.collect())) == inline
    assert all("dup" not in a and "dup" not in b for a, b, _ in inline)
    # the precomputed path must not re-aggregate the corpus blocks:
    # its only aggregates are the final distinct's — the same count as
    # a guardless query — while the inline guard adds the bucket-size
    # aggregate on top
    def n_aggs(df):
        return df._jdf.queryExecution().executedPlan().toString().count("HashAggregate")

    guardless = simhash_near_dup_pairs(signatures=sigs, max_bucket=None)
    inline_df = simhash_near_dup_pairs(signatures=sigs, max_bucket=100)
    assert n_aggs(pre) == n_aggs(guardless)
    assert n_aggs(inline_df) > n_aggs(pre)


def test_media_near_dup_guard_threads_through(spark):
    # identical payloads -> identical pHash -> every block degenerate
    media = spark.createDataFrame(
        [(f"m{i:03d}", bytes([7, 7, 7, 7])) for i in range(120)]
        + [("mx", bytes([1, 2, 3, 4, 5, 6, 7, 8]))],
        ["media_ref", "payload"],
    )
    obs = Observation("media_guard")
    pairs = media_near_dup_pairs(media, max_bucket=50, observation=obs).collect()
    assert pairs == []
    assert obs.get["hot_buckets"] >= 1


def test_guard_default_leaves_fixtures_untouched(spark):
    # default caps sit far above any healthy bucket: small-corpus
    # results are bit-identical with and without the guard
    docs = _docs(spark, n_degenerate=20)
    a = sorted(map(tuple, minhash_lsh_pairs(docs).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(docs, max_bucket=None).collect()))
    assert a == b
    sa = sorted(map(tuple, simhash_near_dup_pairs(docs).collect()))
    sb = sorted(map(tuple, simhash_near_dup_pairs(docs, max_bucket=None).collect()))
    assert sa == sb
