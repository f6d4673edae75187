"""ExactSubstr duplicate-span detection and removal (Lee et al.
arXiv:2107.06499 at k-token granularity, suffix-array-free)."""

import re
from collections import Counter


def _ref(texts, k=8, min_count=2):
    """Pure-python reference: duplicated k-gram positions merged into
    spans (gap <= k), then covered positions stripped."""
    W = {d: [t for t in re.split(r"\s+", t_.strip().lower()) if t] for d, t_ in texts.items()}
    cnt = Counter()
    for w in W.values():
        for j in range(len(w) - k + 1):
            cnt[" ".join(w[j : j + k])] += 1
    spans, clean = {}, {}
    for d, w in W.items():
        pos = [j for j in range(len(w) - k + 1) if cnt[" ".join(w[j : j + k])] >= min_count]
        merged = []
        for p in pos:
            if merged and p - merged[-1][2] <= k:
                merged[-1] = [merged[-1][0], max(merged[-1][1], p + k - 1), p]
            else:
                merged.append([p, p + k - 1, p])
        spans[d] = [(s, e) for s, e, _ in merged]
        cov = {i for s, e in spans[d] for i in range(s, e + 1)}
        keptw = [w[i] for i in range(len(w)) if i not in cov]
        clean[d] = (" ".join(keptw), len(w) - len(keptw))
    return spans, clean


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )


PLANTED = {
    0: "alpha beta gamma delta epsilon zeta eta theta iota kappa unique tail zero",
    # shares the 10-token prefix run with doc 0 -> one merged span in both
    1: "alpha beta gamma delta epsilon zeta eta theta iota kappa other ending one",
    2: "completely different words with no repeats at all in this document here",
    3: "short doc",  # below k -> never contributes grams
}


def test_planted_duplicate_run_detected_and_merged(spark):
    from crawler_spark.operators.textdedup import exact_substr_spans

    exp_spans, _ = _ref(PLANTED, k=8)
    got = exact_substr_spans(_mkdocs(spark, PLANTED), k=8).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        assert r.n_tokens == r.span_end - r.span_start + 1
    for d in PLANTED:
        assert sorted(by_doc.get(d, [])) == sorted(exp_spans[d]), d
    # the 10-token shared run = positions 0..2 duplicated -> ONE span 0..9
    assert by_doc[0] == [(0, 9)]
    assert 2 not in by_doc and 3 not in by_doc


def test_strip_matches_reference_and_keeps_all_docs(spark):
    from crawler_spark.operators.textdedup import exact_substr_strip

    _, exp_clean = _ref(PLANTED, k=8)
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in
           exact_substr_strip(_mkdocs(spark, PLANTED), k=8).collect()}
    assert got == exp_clean
    assert got[2][1] == 0 and got[3][1] == 0  # untouched docs keep everything


def test_corpus_scale_matches_reference(spark):
    from crawler_spark.operators.textdedup import exact_substr_spans, exact_substr_strip

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.collect()}
    exp_spans, exp_clean = _ref(texts, k=8)
    got_spans = {}
    for r in exact_substr_spans(docs, k=8).collect():
        got_spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert {d: sorted(v) for d, v in got_spans.items()} == {
        d: sorted(v) for d, v in exp_spans.items() if v
    }
    got_clean = {r.doc_id: (r.clean_text, r.n_removed) for r in
                 exact_substr_strip(docs, k=8).collect()}
    assert got_clean == exp_clean


def test_precomputed_spans_path_equal(spark):
    from crawler_spark.operators.textdedup import exact_substr_spans, exact_substr_strip

    docs = _mkdocs(spark, PLANTED)
    sp = exact_substr_spans(docs, k=8)
    a = sorted(map(tuple, exact_substr_strip(docs, k=8).collect()))
    b = sorted(map(tuple, exact_substr_strip(docs, k=8, spans=sp).collect()))
    assert a == b


def test_whole_doc_removed_yields_empty_clean_text(spark):
    from crawler_spark.operators.textdedup import exact_substr_strip

    t = "one two three four five six seven eight"
    docs = _mkdocs(spark, {0: t, 1: t})
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in
           exact_substr_strip(docs, k=8).collect()}
    assert got == {0: ("", 8), 1: ("", 8)}
