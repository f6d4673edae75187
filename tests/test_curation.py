"""Unit tests for the round-3 curation additions: PII scan/redaction,
the full Gopher quality gate, and benchmark-contamination checking —
hand-computed expectations on crafted micro-corpora (the sf-scale
oracle equality lives in test_entry_oracle.py)."""

from pyspark.sql import functions as F

from crawler_spark.functions.pii import pii_profile, redact_pii
from crawler_spark.functions.text import gopher_gates
from crawler_spark.operators.textdedup import contamination_check


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# --- PII ---------------------------------------------------------------


def test_pii_profile_counts_each_category(spark):
    d = _docs(
        spark,
        [
            (1, "mail a.b+c@ex-ample.org and x@y.io end"),
            (2, "server 192.168.0.1 backs up 10.0.0.255"),
            (3, "call +14155550123 or 415-555-0123"),
            (4, "ssn 123-45-6789 card 4111-1111-1111-1111"),
            (5, "nothing personal here"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_profile(d).collect()}
    assert (got[1]["n_email"], got[1]["n_pii_total"]) == (2, 2)
    assert (got[2]["n_ipv4"], got[2]["n_pii_total"]) == (2, 2)
    assert (got[3]["n_phone"], got[3]["n_pii_total"]) == (2, 2)
    assert (got[4]["n_ssn"], got[4]["n_credit_card"]) == (1, 1)
    assert got[4]["n_pii_total"] == 2
    assert got[5]["n_pii_total"] == 0 and not got[5]["has_pii"]
    assert got[1]["has_pii"]


def test_redact_pii_scrubs_every_span(spark):
    d = _docs(
        spark,
        [(1, "write bob@x.com from 1.2.3.4 re 123-45-6789 at +4915112345678")],
    )
    row = redact_pii(d).collect()[0]
    assert row["text_redacted"] == (
        "write <PII:EMAIL> from <PII:IPV4> re <PII:SSN> at <PII:PHONE>"
    )
    assert row["n_redactions"] == 4


def test_redact_pii_email_wins_before_numeric_patterns(spark):
    # digits+dots inside an email must be swallowed by the email rule,
    # not partially rewritten by the ipv4 one
    d = _docs(spark, [(1, "ping 1.2.3.4@mail.example.com ok")])
    row = redact_pii(d).collect()[0]
    assert row["text_redacted"] == "ping <PII:EMAIL> ok"


# --- Gopher gate -------------------------------------------------------


def test_gopher_gates_metrics_and_verdict(spark):
    good = " ".join(
        ["the quick brown fox jumps over a lazy dog of note and to win in style"]
        * 5
    )  # 16 words x 5 = 80, all alpha, plenty of stopwords
    bullets = "- one\n- two\n- three\nplain"
    d = _docs(spark, [(1, good), (2, bullets), (3, "x " * 10 + "...")])
    got = {r["doc_id"]: r for r in gopher_gates(d).collect()}
    g = got[1]
    assert g["n_words"] == 80 and g["alpha_word_frac"] == 1.0
    assert 3.0 <= g["mean_word_len"] <= 10.0
    assert g["passes"]
    b = got[2]
    assert b["bullet_line_frac"] == 0.75 and not b["passes"]  # too few words
    e = got[3]
    # one line ending in '...', one '...' symbol over 11 words
    assert e["ellipsis_line_frac"] == 1.0
    assert not e["passes"]  # short + symbol-heavy + too few stopwords


def test_gopher_gates_blank_text_is_safe(spark):
    got = gopher_gates(_docs(spark, [(1, ""), (2, "   ")])).collect()
    for r in got:
        assert r["n_words"] == 0 and not r["passes"]
        assert r["mean_word_len"] == 0.0 and r["alpha_word_frac"] == 0.0


# --- contamination -----------------------------------------------------


def test_contamination_flags_docs_sharing_eval_ngrams(spark):
    base = "w%d " * 0  # noqa: F841  (readability anchor)
    doc_a = " ".join(f"a{i}" for i in range(20))
    doc_b = " ".join(f"b{i}" for i in range(20))
    # doc_c quotes 10 consecutive words of doc_a -> 3 shared 8-grams
    doc_c = "intro " + " ".join(f"a{i}" for i in range(5, 15)) + " outro"
    corpus = _docs(spark, [(1, doc_a), (2, doc_b), (3, doc_c)])
    eval_docs = _docs(spark, [(100, doc_a)])
    got = {r["doc_id"]: r for r in contamination_check(corpus, eval_docs, n=8).collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_shared_ngrams"] == 13  # 20-word doc: all 13 8-grams
    assert got[3]["n_shared_ngrams"] == 3  # 10-word quote: 3 8-grams
    assert got[1]["contaminated"] and got[3]["contaminated"]


def test_contamination_threshold_controls_verdict(spark):
    doc_a = " ".join(f"a{i}" for i in range(20))
    doc_c = "intro " + " ".join(f"a{i}" for i in range(5, 15)) + " outro"
    corpus = _docs(spark, [(1, doc_a), (3, doc_c)])
    eval_docs = _docs(spark, [(100, doc_a)])
    got = {
        r["doc_id"]: r
        for r in contamination_check(corpus, eval_docs, n=8, min_overlap=5).collect()
    }
    assert got[1]["contaminated"] and not got[3]["contaminated"]


def test_contamination_plan_broadcasts_eval_side(spark):
    doc_a = " ".join(f"a{i}" for i in range(20))
    corpus = _docs(spark, [(1, doc_a)])
    eval_docs = _docs(spark, [(100, doc_a)])
    plan = contamination_check(corpus, eval_docs, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --- classifier --------------------------------------------------------


def test_classifier_hash_and_broadcast_paths_agree(spark):
    from crawler_spark.functions.text import classifier_score, md5_bucket

    d = _docs(
        spark,
        [(1, "alpha beta alpha gamma"), (2, "delta"), (3, ""), (4, "beta beta")],
    )
    hash_path = {r["doc_id"]: r for r in classifier_score(d).collect()}
    # materialize the same weights as an explicit broadcast table
    vocab = spark.createDataFrame(
        [(t,) for t in ["alpha", "beta", "gamma", "delta"]], ["tok"]
    ).select("tok", (md5_bucket(F.col("tok")) % 2001 - 1000).alias("weight"))
    bcast_path = {
        r["doc_id"]: r for r in classifier_score(d, weights=vocab).collect()
    }
    assert set(hash_path) == set(bcast_path) == {1, 2, 3, 4}
    for k in hash_path:
        assert hash_path[k]["logit"] == bcast_path[k]["logit"]
        assert hash_path[k]["n_tokens"] == bcast_path[k]["n_tokens"]
        assert hash_path[k]["label"] == bcast_path[k]["label"]
    # multiplicity: doc 1 counts 'alpha' twice
    a = hash_path[1]
    assert a["n_tokens"] == 4
    # zero-token doc survives with neutral score
    z = hash_path[3]
    assert (z["n_tokens"], z["logit"], z["mean_weight"], z["label"]) == (0, 0, 0.0, False)


def test_classifier_unknown_tokens_get_zero_weight_on_broadcast_path(spark):
    from crawler_spark.functions.text import classifier_score

    d = _docs(spark, [(1, "known unknown")])
    vocab = spark.createDataFrame([("known", 7)], ["tok", "weight"])
    row = classifier_score(d, weights=vocab).collect()[0]
    assert (row["n_tokens"], row["logit"], row["label"]) == (2, 7, True)


# --- sampling + full pipeline ------------------------------------------


def test_bernoulli_sample_is_deterministic_and_rate_shaped(spark):
    from crawler_spark.functions.text import bernoulli_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(400)],
        ["doc_id", "lang"],
    )
    a = sorted(r["doc_id"] for r in bernoulli_sample(docs, {"en": 0.5}).collect())
    b = sorted(r["doc_id"] for r in bernoulli_sample(docs, {"en": 0.5}).collect())
    assert a == b  # same sample every run
    assert all(i % 2 == 0 for i in a)  # absent stratum ('de') drops
    assert 60 <= len(a) <= 140  # ~50% of 200, hash-uniform
    # rate monotonicity: a higher rate keeps a superset
    big = set(r["doc_id"] for r in bernoulli_sample(docs, {"en": 0.9}).collect())
    assert set(a) <= big


def test_full_curation_plan_has_exactly_two_exchanges(spark):
    from crawler_spark.functions.text import full_curation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = full_curation(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_full_curation_collapses_planted_duplicates(spark):
    from crawler_spark.functions.text import full_curation

    base = (
        "the quick brown fox jumps over the lazy dog and runs off to the "
        "hills in a hurry to find the rest of the pack and the den "
    ) * 2  # >30 words, english-marked, low dup-bigram? (x2 repeats!)
    # craft a corpus: one good doc twice (exact dup), one distinct good doc
    good = (
        "the quick brown fox jumps over a lazy dog of note and to win in "
        "style while the rest of the pack waits and the den stays warm in "
        "the hills to the north and the east of the old river and the lake"
    )
    other = (
        "a small table of data and the rows of the scan go to the sink in "
        "order while the query plans of the engine keep the cost low and "
        "the output of the join stays exact to the last row of the batch"
    )
    docs = spark.createDataFrame(
        [(1, good), (2, good), (3, other)], ["doc_id", "text"]
    )
    # min_logit neutralized: hash-derived weights make hand-crafting
    # positive-logit text a lottery; the gate itself is oracle-covered
    out = {
        r["pred_lang"]: r
        for r in full_curation(docs, min_logit=-(10**9)).collect()
    }
    assert set(out) == {"en"}
    en = out["en"]
    # 2 canonical docs survive; the dup pair collapsed but counted
    assert en["n_docs"] == 2 and en["n_kept_total"] == 3


def test_classifier_paths_agree_on_null_text(spark):
    from pyspark.sql import types as T

    from crawler_spark.functions.text import classifier_score

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    d = spark.createDataFrame([(1, None), (2, "alpha beta")], schema)
    vocab = spark.createDataFrame([("alpha", 3)], ["tok", "weight"])
    h = {r["doc_id"]: r for r in classifier_score(d).collect()}
    b = {r["doc_id"]: r for r in classifier_score(d, weights=vocab).collect()}
    # NULL text scores like empty text on BOTH paths
    for got in (h[1], b[1]):
        assert (got["n_tokens"], got["logit"], got["mean_weight"], got["label"]) == (
            0, 0, 0.0, False,
        )
    assert h[2]["n_tokens"] == b[2]["n_tokens"] == 2


def test_bernoulli_sample_empty_rates_returns_empty(spark):
    from crawler_spark.functions.text import bernoulli_sample

    docs = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    out = bernoulli_sample(docs, {})
    assert out.count() == 0
    assert out.columns == ["doc_id", "stratum"]


# --- media pHash -------------------------------------------------------


def test_media_phash_locality_and_near_dup_pairs(spark):
    from crawler_spark.operators.multimodal import (
        media_near_dup_pairs,
        media_phash,
    )

    base = ("span payload bytes " * 40).encode()
    near = (("span payload bytes " * 40)[:-5] + "Xtail").encode()
    far = bytes(range(256)) * 3
    media = spark.createDataFrame(
        [
            ("a", "1", "image", base, None),
            ("b", "2", "image", base, None),  # exact dup of a
            ("c", "3", "image", near, None),  # near dup of a
            ("d", "4", "image", far, None),  # unrelated
        ],
        "media_ref string, doc_id string, kind string, payload binary, "
        "meta map<string,string>",
    )
    ph = {r["media_ref"]: r["phash"] for r in media_phash(media).collect()}
    assert len(ph) == 4 and all(len(v) == 64 for v in ph.values())
    assert ph["a"] == ph["b"]  # identical payloads -> identical hash
    ham_ac = sum(x != y for x, y in zip(ph["a"], ph["c"]))
    ham_ad = sum(x != y for x, y in zip(ph["a"], ph["d"]))
    assert ham_ac < ham_ad  # locality: near payload closer than far
    pairs = {
        (r["ref_a"], r["ref_b"]): r["hamming"]
        for r in media_near_dup_pairs(media, max_hamming=max(3, ham_ac)).collect()
    }
    assert pairs[("a", "b")] == 0
    assert ("a", "c") in pairs and ("b", "c") in pairs
    assert not any("d" in p for p in pairs)


def test_media_near_dup_blocking_matches_brute_force(spark):
    from crawler_spark.operators.multimodal import (
        media_near_dup_pairs,
        media_phash,
    )

    rows = [
        (f"m{i}", str(i), "image", (f"payload {i % 4} " * 30).encode(), None)
        for i in range(24)
    ]
    media = spark.createDataFrame(
        rows,
        "media_ref string, doc_id string, kind string, payload binary, "
        "meta map<string,string>",
    )
    ph = {r["media_ref"]: r["phash"] for r in media_phash(media).collect()}
    for mh in (0, 3, 6):
        got = {
            (r["ref_a"], r["ref_b"], r["hamming"])
            for r in media_near_dup_pairs(media, max_hamming=mh).collect()
        }
        want = set()
        refs = sorted(ph)
        for i, a in enumerate(refs):
            for b in refs[i + 1:]:
                h = sum(x != y for x, y in zip(ph[a], ph[b]))
                if h <= mh:
                    want.add((a, b, h))
        assert got == want, f"max_hamming={mh}"


def test_length_quantiles_hand_values_and_approx_path(spark):
    from crawler_spark.functions.text import length_quantiles

    rows = [(i, "w " * c, "en") for i, c in enumerate([1, 2, 3, 4, 100])]
    docs = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], ["doc_id", "text", "lang"]
    )
    got = length_quantiles(docs, ps=(0.5, 0.75)).collect()[0]
    assert got["stratum"] == "en" and got["n_docs"] == 5
    assert got["p50"] == 3.0  # exact middle of [1,2,3,4,100]
    assert got["p75"] == 4.0  # idx 0.75*4 = 3.0 -> value 4
    approx = length_quantiles(docs, ps=(0.5,), exact=False).collect()[0]
    assert 1.0 <= approx["p50"] <= 100.0  # sketch path runs


def test_pack_sequences_matches_sequential_reference(spark):
    from crawler_spark.functions.text import pack_sequences

    rows = [(i, "w " * c) for i, c in enumerate([5, 0, 10, 3, 7, 260, 1])]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in pack_sequences(docs, capacity=8).collect()}
    # sequential reference: stream advances by n_tokens + 1 per doc
    pos = 0
    for i, c in enumerate([5, 0, 10, 3, 7, 260, 1]):
        g = got[i]
        assert g["n_tokens"] == c
        assert g["start_offset"] == pos
        assert g["end_offset"] == pos + c
        if c == 0:
            assert g["n_bins"] == 0
        else:
            first, last = pos // 8, (pos + c - 1) // 8
            assert (g["first_bin"], g["last_bin"]) == (first, last)
            assert g["n_bins"] == last - first + 1
        pos += c + 1


def test_pack_sequences_invariant_to_partition_count(spark):
    from crawler_spark.functions.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 13 + 1)) for i in range(300)], ["doc_id", "text"]
    )
    a = sorted(map(tuple, pack_sequences(docs, capacity=32, n_parts=1).collect()))
    b = sorted(map(tuple, pack_sequences(docs, capacity=32, n_parts=7).collect()))
    c = sorted(map(tuple, pack_sequences(docs.repartition(11), capacity=32, n_parts=16).collect()))
    assert a == b == c


def test_pack_sequences_plan_has_no_single_partition_exchange(spark):
    from crawler_spark.functions.text import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = pack_sequences(docs, capacity=256)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


# --- leakage-safe holdout splits ---------------------------------------


def test_holdout_split_partitions_every_doc(spark):
    from crawler_spark.functions.text import holdout_split

    docs = spark.createDataFrame(
        [(i, f"h{i % 7}.example") for i in range(300)], ["doc_id", "host"]
    )
    out = holdout_split(docs, {"train": 8, "val": 1, "test": 1}).collect()
    assert len(out) == 300
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    assert all(r["split"] is not None for r in out)
    # deterministic: identical on re-run
    again = holdout_split(docs, {"train": 8, "val": 1, "test": 1}).collect()
    assert sorted((r["doc_id"], r["split"]) for r in out) == sorted(
        (r["doc_id"], r["split"]) for r in again
    )


def test_holdout_split_group_atomicity(spark):
    from crawler_spark.functions.text import holdout_split

    docs = spark.createDataFrame(
        [(i, f"h{i % 23}.example") for i in range(500)], ["doc_id", "host"]
    )
    out = holdout_split(docs, {"train": 3, "val": 1}, group_col="host").collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["split_key"], set()).add(r["split"])
    # every host lands wholly in ONE split (the leakage-safety property)
    assert all(len(s) == 1 for s in by_host.values())
    # and with 23 hosts both splits are populated
    assert {r["split"] for r in out} == {"train", "val"}


def test_holdout_split_proportions_and_stability(spark):
    from crawler_spark.functions.text import holdout_split

    docs = spark.createDataFrame([(i,) for i in range(4000)], ["doc_id"])
    out = holdout_split(docs, {"train": 90, "val": 10}).collect()
    n_val = sum(1 for r in out if r["split"] == "val")
    assert 300 <= n_val <= 500  # ~10% of 4000, hash-uniform
    # hash-stability: a grown corpus never reassigns an existing key
    grown = spark.createDataFrame([(i,) for i in range(8000)], ["doc_id"])
    g = {
        r["doc_id"]: r["split"]
        for r in holdout_split(grown, {"train": 90, "val": 10}).collect()
    }
    assert all(g[r["doc_id"]] == r["split"] for r in out)


def test_holdout_split_rejects_bad_weights(spark):
    import pytest as _pytest

    from crawler_spark.functions.text import holdout_split

    docs = spark.createDataFrame([(1,)], ["doc_id"])
    for bad in ({}, {"a": 0}, {"a": -1, "b": 3}):
        with _pytest.raises(ValueError):
            holdout_split(docs, bad)


def test_cross_split_pairs_finds_exactly_the_leaks(spark):
    from crawler_spark.functions.text import cross_split_pairs, holdout_split

    docs = spark.createDataFrame(
        [(i, f"h{i % 11}.example") for i in range(200)], ["doc_id", "host"]
    )
    # near-dup pairs WITHIN hosts (i, i+11 share a host class)
    pairs = spark.createDataFrame(
        [(i, i + 11) for i in range(150)], ["doc_id_a", "doc_id_b"]
    )
    host_split = holdout_split(docs, {"train": 3, "val": 1}, group_col="host")
    # host-grouped split: intra-host pairs can never leak
    assert cross_split_pairs(pairs, host_split).count() == 0
    # per-doc split: the same pairs DO leak across splits
    doc_split = holdout_split(docs, {"train": 3, "val": 1})
    leaks = cross_split_pairs(pairs, doc_split).collect()
    assert leaks  # iid splitting leaks near-dups (that's the audit's point)
    assert all(r["split_a"] != r["split_b"] for r in leaks)
