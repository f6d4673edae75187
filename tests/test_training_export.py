"""engine.training_export: crawl -> curated, deduped, PACKED
multimodal training corpus in one call (the composition of the
curation gates, exact-dup collapse and two-phase sequence packing over
the committed interleaved documents)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.functions.text import pack_sequences
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world

MEDIA_TOKENS = 16


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("texport"))
    world = make_world(seed=17, n_hosts=3, n_urls=15, budget=4, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, root)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=10)
    return eng


def _export(eng, **kw):
    args = dict(capacity=64, media_tokens=MEDIA_TOKENS, min_words=1,
                max_dup_2gram=1.0, min_logit=-(10**12), require_lang=False)
    args.update(kw)
    return eng.training_export(**args)


def test_packing_invariants(spark, crawled):
    rows = _export(crawled).orderBy("url_hash").collect()
    assert rows, "crawl produced no exportable documents"
    docs = crawled.io.read(spark, "documents").count()
    assert len(rows) <= docs
    # token budget = words + MEDIA_TOKENS per media span
    for r in rows:
        assert r["n_tokens"] == r["n_words"] + MEDIA_TOKENS * r["n_media"]
        assert r["end_offset"] == r["start_offset"] + r["n_tokens"]
        assert 0 <= r["first_bin"] <= r["last_bin"]
        assert r["n_copies"] >= 1
    # the stream is contiguous in url_hash order with sep_tokens gaps
    for a, b in zip(rows, rows[1:]):
        assert b["start_offset"] == a["end_offset"] + 1, (a, b)
    # dense window ids from 0
    assert rows[0]["start_offset"] == 0
    assert rows[0]["first_bin"] == 0


def test_media_refs_ride_through(spark, crawled):
    rows = _export(crawled).collect()
    with_media = [r for r in rows if r["n_media"] > 0]
    assert with_media, "synthetic world always embeds media spans"
    for r in with_media:
        assert len(r["media_refs"]) == r["n_media"]
        assert all(ref.startswith("img://") for ref in r["media_refs"])
    # text-only docs export empty ref arrays, not nulls
    for r in rows:
        assert r["media_refs"] is not None


def test_gates_apply(spark, crawled):
    # impossible word bound -> empty corpus, still a valid frame
    assert _export(crawled, min_words=10**9).count() == 0
    # language allowlist that matches nothing
    assert _export(crawled, langs=("zz",)).count() == 0


def test_export_is_deterministic(spark, crawled):
    a = _export(crawled).orderBy("url_hash").collect()
    b = _export(crawled).orderBy("url_hash").collect()
    assert a == b


def test_pack_sequences_tokens_col_parity(spark):
    """tokens_col=ws_token_count(text) must pack exactly like the
    default text path, and keep_cols must ride through unchanged."""
    docs = spark.createDataFrame(
        [(i, "tok " * (i % 7), f"s{i % 3}") for i in range(40)],
        "doc_id long, text string, site string",
    )
    base = pack_sequences(docs, capacity=10).orderBy("doc_id").collect()
    via_col = (
        pack_sequences(
            docs.withColumn(
                "n",
                F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                                lambda x: x != "")).cast("long"),
            ),
            capacity=10,
            tokens_col="n",
            keep_cols=("site",),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r["start_offset"] for r in base] == [
        r["start_offset"] for r in via_col
    ]
    assert [r["n_bins"] for r in base] == [r["n_bins"] for r in via_col]
    assert all(r["site"] == f"s{r['doc_id'] % 3}" for r in via_col)


def test_boilerplate_strip_option(spark, crawled):
    base = _export(crawled).orderBy("url_hash").collect()
    # nothing reaches an absurd df threshold -> byte-identical export
    same = _export(crawled, boilerplate_min_df=10**9).orderBy("url_hash").collect()
    assert base == same
    # min_df=1 marks EVERY text span hot -> zero visible words anywhere
    # -> the min_words>=1 gate empties the export (media spans survive
    # the strip but carry no words)
    assert _export(crawled, boilerplate_min_df=1).count() == 0
    # a real threshold only ever removes words, never adds
    mid = {r["url_hash"]: r["n_words"]
           for r in _export(crawled, boilerplate_min_df=2).collect()}
    base_words = {r["url_hash"]: r["n_words"] for r in base}
    assert set(mid) <= set(base_words)
    assert all(mid[k] <= base_words[k] for k in mid)


def test_mine_captions(spark, crawled):
    docs = crawled.io.read(spark, "documents")
    n_media = docs.select(
        F.explode(
            F.filter(
                F.col("spans"),
                lambda s: s["media_ref"].isNotNull() & (s["media_ref"] != ""),
            )
        )
    ).count()
    pairs = crawled.mine_captions()
    assert pairs.count() == n_media  # one row per media span, gate off
    assert pairs.where(F.col("caption").isNull()).count() < n_media
    gated = crawled.mine_captions(quality=True, min_words=2)
    assert 0 < gated.count() <= n_media
    assert {"n_caption_words", "alpha_e6"} <= set(gated.columns)


def test_train_tokenizer(spark, crawled):
    a = crawled.train_tokenizer(n_merges=6)
    b = crawled.train_tokenizer(n_merges=6)
    assert a == b and len(a) == 6
    assert all(m["pair_count"] >= 2 for m in a)


def test_tokenizer_aware_packing(spark, crawled):
    merges = crawled.train_tokenizer(n_merges=6)
    rows = _export(crawled, tokenizer_merges=merges).orderBy("url_hash").collect()
    assert rows
    # budget = real subword tokens + media placeholders; contiguous stream
    for r in rows:
        assert r["n_tokens"] == r["n_text_tokens"] + MEDIA_TOKENS * r["n_media"]
        assert r["n_text_tokens"] >= r["n_words"]  # subwords >= words
    for a, b in zip(rows, rows[1:]):
        assert b["start_offset"] == a["end_offset"] + 1
    # wiring twin: tokenize the same redacted visible text directly
    from crawler_spark.functions.pii import redact_expr
    from crawler_spark.operators.bpe import bpe_encode
    from crawler_spark.operators.textdedup import doc_text

    corpus = crawled.io.read(spark, "documents").select(
        "doc_id", redact_expr(doc_text()).alias("text")
    )
    want = {
        r["doc_id"]: r["n"]
        for r in bpe_encode(corpus, merges)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("n"))
        .collect()
    }
    assert all(r["n_text_tokens"] == want[r["url_hash"]] for r in rows)


def test_pack_segments_tiles_the_stream(spark):
    from crawler_spark.functions.text import pack_segments, pack_sequences

    docs = spark.createDataFrame(
        [(i, "tok " * (3 + 7 * (i % 5))) for i in range(40)] + [(99, "")],
        "doc_id long, text string",
    )
    cap = 16
    packed = pack_sequences(docs, capacity=cap)
    segs = pack_segments(packed, capacity=cap).collect()
    by_doc = {}
    for s in segs:
        by_doc.setdefault(s["doc_id"], []).append(s)
    pk = {r["doc_id"]: r for r in packed.collect()}
    # zero-token docs emit nothing; every other doc's segments tile its span
    assert 99 not in by_doc
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["bin_id"])
        p = pk[did]
        assert sum(r["seg_len"] for r in rows) == p["n_tokens"]
        assert len(rows) == p["n_bins"]
        assert rows[0]["is_doc_start"] and rows[-1]["is_doc_end"]
        assert all(not r["is_doc_start"] for r in rows[1:])
        assert all(not r["is_doc_end"] for r in rows[:-1])
        # global positions reconstruct contiguously
        pos = p["start_offset"]
        for r in rows:
            assert r["bin_id"] * cap + r["bin_offset"] == pos
            assert 0 <= r["bin_offset"] < cap
            assert 0 < r["seg_len"] <= cap
            pos += r["seg_len"]
        assert pos == p["end_offset"]
    # every window's segments fit its capacity
    fill = {}
    for s in segs:
        fill[s["bin_id"]] = fill.get(s["bin_id"], 0) + s["seg_len"]
    assert all(v <= cap for v in fill.values())
