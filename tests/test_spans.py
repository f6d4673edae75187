"""Interleaved-span toolkit (operators/spans.py): synthesis invariants,
caption mining vs a pure-python reference, boilerplate stripping
semantics, and the zero-exchange plan contracts."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.spans import (
    caption_pairs,
    caption_quality_gate,
    span_stats,
    strip_boilerplate_spans,
    synth_interleaved,
)


@pytest.fixture(scope="module")
def flat_docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi"),
        (1, ""),
        (2, "one two three"),
        (3, "one two three"),
        (4, "  padded   whitespace   doc  "),
        (5, "one two three"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def spans_df(spark, flat_docs):
    return synth_interleaved(flat_docs)


def _collected(df):
    return {r["doc_id"]: r["spans"] for r in df.collect()}


def test_synth_shape_and_offsets(spans_df):
    by_id = _collected(spans_df)
    assert by_id[1] == []  # blank doc -> empty span stream, row kept
    for did, spans in by_id.items():
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        for s in spans:
            if s["kind"] == "media":
                assert s["text"] == "" and s["media_ref"].startswith("m")
            else:
                assert s["media_ref"] == "" and s["kind"] == "text"
    # media insertion rule: after chunk i iff (doc_id + i) % 3 == 0
    assert [s["media_ref"] for s in by_id[0] if s["kind"] == "media"] == ["m0_0"]
    assert [s["media_ref"] for s in by_id[3] if s["kind"] == "media"] == ["m3_0"]
    assert all(s["kind"] == "text" for s in by_id[2])


def test_synth_deterministic(spark, flat_docs, spans_df):
    again = _collected(synth_interleaved(flat_docs))
    assert _collected(spans_df) == again


def test_synth_header_footer(flat_docs):
    by_id = _collected(synth_interleaved(flat_docs, header="HDR", footer="FTR"))
    for did, spans in by_id.items():
        assert spans[0]["text"] == "HDR" and spans[-1]["text"] == "FTR"
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
    assert [s["text"] for s in by_id[1]] == ["HDR", "FTR"]  # empty doc keeps both


def _py_caption_pairs(spans):
    """Pure-python reference of caption_pairs over one doc's span list."""
    out = []
    text_pos = [
        i for i, s in enumerate(spans)
        if s["kind"] == "text" and s["text"].strip() != ""
    ]
    for i, s in enumerate(spans):
        if s["kind"] != "media":
            continue
        prev = max((t for t in text_pos if t < i), default=None)
        nxt = min((t for t in text_pos if t > i), default=None)
        db = spans[i]["offset"] - spans[prev]["offset"] if prev is not None else None
        da = spans[nxt]["offset"] - spans[i]["offset"] if nxt is not None else None
        if db is None and da is None:
            side = None
        elif da is None or (db is not None and db <= da):
            side = "before"
        else:
            side = "after"
        cap = (
            spans[prev]["text"] if side == "before"
            else spans[nxt]["text"] if side == "after"
            else None
        )
        out.append((
            s["media_ref"], i,
            spans[prev]["text"] if prev is not None else None,
            spans[nxt]["text"] if nxt is not None else None,
            db, da, cap, side,
        ))
    return out


@pytest.fixture(scope="module")
def tricky_spans(spark):
    """Hand-built span streams exercising the caption edge cases: media
    first/last/only, consecutive media, empty text spans skipped,
    offset-distance (not position-distance) tie-breaking."""
    mk = lambda k, t, m, o: {"kind": k, "text": t, "media_ref": m, "offset": o}
    rows = [
        (10, [mk("media", "", "mA", 0), mk("text", "after only", "", 5)]),
        (11, [mk("text", "before only", "", 0), mk("media", "", "mB", 4)]),
        (12, [mk("media", "", "mC", 3)]),  # no text at all
        (13, [  # consecutive media sharing neighbours; empty text skipped
            mk("text", "left", "", 0),
            mk("media", "", "mD", 2),
            mk("text", "   ", "", 3),
            mk("media", "", "mE", 4),
            mk("text", "right", "", 9),
        ]),
        (14, [  # closer AFTER by offsets even though positions tie
            mk("text", "far before", "", 0),
            mk("media", "", "mF", 8),
            mk("text", "near after", "", 9),
        ]),
        (15, []),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_caption_pairs_matches_python_reference(spans_df, tricky_spans):
    for df in (spans_df, tricky_spans):
        docs = {r["doc_id"]: [s.asDict() for s in r["spans"]] for r in df.collect()}
        got = {
            (r["doc_id"], r["pos"]): (
                r["media_ref"], r["pos"], r["caption_before"], r["caption_after"],
                r["dist_before"], r["dist_after"], r["caption"], r["caption_side"],
            )
            for r in caption_pairs(df).collect()
        }
        want = {
            (did, row[1]): row
            for did, spans in docs.items()
            for row in _py_caption_pairs(spans)
        }
        assert got == want


def test_caption_edge_values(tricky_spans):
    rows = {r["media_ref"]: r for r in caption_pairs(tricky_spans).collect()}
    assert rows["mA"]["caption_side"] == "after" and rows["mA"]["caption"] == "after only"
    assert rows["mB"]["caption_side"] == "before"
    assert rows["mC"]["caption"] is None and rows["mC"]["caption_side"] is None
    # mD/mE skip the whitespace-only text span between them
    assert rows["mD"]["caption_after"] == "right"
    assert rows["mE"]["caption_before"] == "left"
    # offset distance decides, not array distance
    assert rows["mF"]["caption_side"] == "after"
    assert rows["mF"]["dist_before"] == 8 and rows["mF"]["dist_after"] == 1


def test_caption_quality_gate(spark):
    mk = lambda cap: ("d", "m", cap)
    pairs = spark.createDataFrame(
        [
            ("d", "m1", "three word caption"),
            ("d", "m2", "two words"),
            ("d", "m3", None),
            ("d", "m4", "numbers 123 456 789 000"),
            ("d", "m5", "a perfectly normal english caption here"),
        ],
        "doc_id string, media_ref string, caption string",
    )
    kept = {
        r["media_ref"]: r
        for r in caption_quality_gate(pairs, min_words=3, min_alpha_e6=600_000).collect()
    }
    assert set(kept) == {"m1", "m5"}
    assert kept["m1"]["n_caption_words"] == 3
    # alpha_e6 = 1e6 * letters / len
    cap = "three word caption"
    assert kept["m1"]["alpha_e6"] == 1_000_000 * sum(c.isalpha() for c in cap) // len(cap)


def test_strip_boilerplate_semantics(spark, flat_docs):
    planted = synth_interleaved(flat_docs, header="NAV NAV", footer="FOOT FOOT")
    out = _collected(strip_boilerplate_spans(planted, min_df=4))
    assert set(out) == {r["doc_id"] for r in flat_docs.collect()}
    for did, spans in out.items():
        texts = [s["text"] for s in spans if s["kind"] == "text"]
        assert "NAV NAV" not in texts and "FOOT FOOT" not in texts
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs)
    # "one two three" appears in 3 docs < min_df=4 -> kept
    assert any(s["text"] == "one two three" for s in out[2])
    # media spans always survive
    assert any(s["kind"] == "media" for s in out[0])
    # min_df=3 strips the tripled chunk too
    out3 = _collected(strip_boilerplate_spans(planted, min_df=3))
    assert not any(s["text"] == "one two three" for s in out3[2])
    # doc whose every span is boilerplate keeps an empty stream
    assert out3[1] == [] and out[1] == []


def test_strip_flat_matches_rebuilt(spark, flat_docs):
    planted = synth_interleaved(flat_docs, header="NAV NAV", footer="FOOT FOOT")
    flat = strip_boilerplate_spans(planted, min_df=4, flat=True)
    rebuilt = _collected(strip_boilerplate_spans(planted, min_df=4))
    from collections import defaultdict

    grouped = defaultdict(list)
    for r in flat.collect():
        grouped[r["doc_id"]].append((r["pos"], r["kind"], r["text"], r["media_ref"], r["offset"]))
    for did, spans in rebuilt.items():
        want = sorted(grouped.get(did, []))
        got = [(None, s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        assert [g[1:] for g in sorted(want)] == [x[1:] for x in got]


def test_span_stats_values(spans_df):
    rows = {r["doc_id"]: r for r in span_stats(spans_df).collect()}
    assert rows[1]["n_spans"] == 0 and rows[1]["media_density_e6"] == 0
    assert rows[0]["n_text_spans"] == 3 and rows[0]["n_media_spans"] == 1
    assert rows[0]["text_words"] == 22
    assert rows[0]["media_density_e6"] == 1_000_000 // 3
    assert rows[4]["text_words"] == 3  # whitespace-padded doc tokenizes cleanly


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_caption_and_stats_plans_are_exchange_free(spans_df):
    for df in (caption_pairs(spans_df), span_stats(spans_df)):
        p = _plan(df)
        assert "Exchange" not in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_strip_flat_plan_broadcasts_hot_set(spans_df):
    p = _plan(strip_boilerplate_spans(spans_df, min_df=2, flat=True))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_span_lang_profile(spark):
    from crawler_spark.operators.spans import span_lang_profile

    mk = lambda t, o: {"kind": "text", "text": t, "media_ref": "", "offset": o}
    rows = [
        (0, [mk("the cat and the dog of", 0),
             mk("der hund und die katze nicht", 1),
             mk("the end of the story and", 2),
             {"kind": "media", "text": "", "media_ref": "m", "offset": 3}]),
        (1, []),
        (2, [mk("xyzzy qwerty plugh", 0)]),  # classifies nothing
        (3, [mk("le chat et la maison", 0), mk("el perro de la casa que", 1)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = {r["doc_id"]: r for r in span_lang_profile(df).collect()}
    r0 = out[0]
    assert (r0["n_text_spans"], r0["n_en"], r0["n_de"]) == (3, 2, 1)
    assert r0["majority_lang"] == "en" and r0["n_langs"] == 2
    assert r0["majority_frac_e6"] == 2_000_000 // 3
    assert out[1]["majority_lang"] == "und" and out[1]["n_classified"] == 0
    assert out[2]["majority_lang"] == "und" and out[2]["n_text_spans"] == 1
    # doc 3: fr vs es one span each -> tie breaks lexicographically (es)
    assert out[3]["n_langs"] == 2 and out[3]["majority_lang"] == "es"
    # zero exchanges: one scan projection
    p = span_lang_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
