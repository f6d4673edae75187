"""BPE trainer/encoder (operators/bpe.py) vs a pure-python reference:
merge-list equality, trainer-state == encode identity, concat
round-trip, partitioning invariance, and the broadcast encode plan."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.bpe import (
    END,
    bpe_encode,
    encode_words,
    train_bpe,
    word_freqs,
)

CORPUS = [
    (0, "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest"),
    (1, ""),
    (2, "low lower newest"),
    (3, "héllo héllo héllo wörld wörld x\U0001F600y x\U0001F600y"),
    (4, "  padded   low  "),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


# --- pure-python reference -------------------------------------------------


def _py_word_freqs(corpus):
    c = Counter()
    for _, text in corpus:
        c.update(text.split())
    return dict(c)


def _py_merge(syms, left, right):
    out = []
    for cur in syms:
        if out and out[-1] == left and cur == right:
            out[-1] = left + right
        else:
            out.append(cur)
    return out


def _py_train(corpus, n_merges, min_pair_count=2):
    wf = _py_word_freqs(corpus)
    state = {w: (list(w) + [END], f) for w, f in wf.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, f in state.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, ties -> lexicographically smallest (left, right)
        (left, right), n = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if n < min_pair_count:
            break
        merges.append(
            {"rank": rank, "left": left, "right": right,
             "merged": left + right, "pair_count": n}
        )
        state = {
            w: (_py_merge(syms, left, right), f) for w, (syms, f) in state.items()
        }
    return merges, state


def test_train_matches_python_reference(spark, docs):
    got = train_bpe(docs, n_merges=12)
    want, _ = _py_train(CORPUS, 12)
    assert got == want


def test_word_freqs(spark, docs):
    got = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert got == _py_word_freqs(CORPUS)


def test_encode_equals_trainer_final_state(spark, docs):
    merges = train_bpe(docs, n_merges=12)
    _, state = _py_train(CORPUS, 12)
    enc = {
        r["word"]: r["tokens"]
        for r in encode_words(word_freqs(docs), merges).collect()
    }
    assert enc == {w: syms for w, (syms, _) in state.items()}


def test_encode_concat_roundtrip(spark, docs):
    merges = train_bpe(docs, n_merges=12)
    for r in encode_words(word_freqs(docs), merges).collect():
        assert "".join(r["tokens"]) == r["word"] + END


def test_train_invariant_to_partitioning(spark, docs):
    a = train_bpe(docs, n_merges=8)
    b = train_bpe(docs.repartition(7), n_merges=8)
    assert a == b and len(a) > 0


def test_min_pair_count_stops_early(spark, docs):
    merges = train_bpe(docs, n_merges=500, min_pair_count=3)
    assert 0 < len(merges) < 500
    assert all(m["pair_count"] >= 3 for m in merges)
    # ranks are dense and in order
    assert [m["rank"] for m in merges] == list(range(len(merges)))


def test_bpe_encode_corpus(spark, docs):
    merges = train_bpe(docs, n_merges=12)
    out = bpe_encode(docs, merges)
    rows = out.orderBy("doc_id", "pos").collect()
    # one row per word occurrence, in document order
    words_in_order = [
        (did, i, w)
        for did, text in CORPUS
        for i, w in enumerate(text.split())
    ]
    assert [(r["doc_id"], r["pos"], r["word"]) for r in rows] == words_in_order
    assert all(r["n_tokens"] == len(r["tokens"]) for r in rows)
    # plan: vocab joins back broadcast; the corpus side never sort-merge-joins
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_unicode_symbols_are_code_points(spark):
    docs = spark.createDataFrame([(0, "x\U0001F600y x\U0001F600y")], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=1)
    assert merges[0]["left"] == "x" and merges[0]["right"] == "\U0001F600"
