"""Interleaved-span operators over the north-rule document shape
(doc_id, spans: array<struct<kind,text,media_ref,offset>>) — the
driver input_hint table (schemas.py:16-28).

The reference stores pages as flat markdown text plus side JSON
(crawler.py:1040-1120) and never operates on the media/text interleaving
itself; these operators treat the span stream as first-class:

- synth_interleaved: deterministic spans synthesis from a flat
  (doc_id, text) corpus — the SQL-portable generator the driver
  entries and tests share (real crawls produce spans natively via
  world/_page_spans and the fetch pipeline).
- span_stats: per-document interleaved profile (zero exchanges).
- caption_pairs: LAION-style caption mining — each media span paired
  with its nearest non-empty text spans (zero exchanges; one Generate).
- caption_quality_gate: Gopher-style word/alpha bounds on mined
  captions — the image-text pair filter (zero exchanges).
- strip_boilerplate_spans: cross-document repeated-span removal
  (nav bars, cookie banners, footers) by span-fingerprint document
  frequency — the jusText/trafilatura step re-expressed corpus-wide.

Scale notes (100 TB): span_stats / caption_pairs / the gate are pure
per-row array expressions — cost is scanned bytes, no shuffle anywhere.
strip_boilerplate_spans has exactly one corpus exchange (the
fingerprint df partial-agg, map-side combined) and joins the hot set
back as a BROADCAST anti-join: boilerplate is by definition the small
head of the span-frequency distribution (bounded by `max_hot`), so the
corpus never shuffles on the probe side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from crawler_spark.functions.text import WS_RE, fingerprint
from crawler_spark.schemas import SPANS  # noqa: F401 (canonical shape; casts use the nullable DDL twin)

# nullable DDL twin of schemas.SPANS (expression-built structs are nullable;
# casting to the NOT NULL schema is rejected by the analyzer)
SPANS_T = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _words(text: Column) -> Column:
    """Whitespace tokens of trimmed text; [] for blank (split('') = ['']
    which is not a token)."""
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), WS_RE))


def synth_interleaved(
    docs: DataFrame,
    chunk_words: int = 10,
    media_every: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    header: str | None = None,
    footer: str | None = None,
) -> DataFrame:
    """Deterministic interleaved spans from a flat corpus: split `text`
    into `chunk_words`-word text spans; after chunk i insert a media
    span iff (doc_id + i) % media_every == 0 with media_ref
    'm<doc_id>_<i>'. offset = 2*pos + doc_id%3 (strictly increasing,
    deliberately non-unit so offset-distance logic is exercised).
    `header`/`footer` prepend/append a constant text span to EVERY doc
    (planted boilerplate for the strip entries). Pure per-row JVM array
    ops — zero exchanges; the DuckDB twin is _SPANS_SQL in
    __spark_entry__.py.
    """
    did = F.col(id_col).cast("long")

    def text_span(txt: Column) -> Column:
        return F.struct(
            F.lit("text").alias("kind"),
            txt.alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).alias("offset"),
        )

    def chunk(i: Column) -> Column:
        ts = text_span(
            F.array_join(F.slice(F.col("_w"), i * chunk_words + 1, chunk_words), " ")
        )
        ms = F.struct(
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            F.concat(
                F.lit("m"), did.cast("string"), F.lit("_"), i.cast("string")
            ).alias("media_ref"),
            F.lit(0).alias("offset"),
        )
        return F.when((did + i) % media_every == 0, F.array(ts, ms)).otherwise(
            F.array(ts)
        )

    n_chunks = F.ceil(F.size("_w") / F.lit(chunk_words)).cast("int")
    body = F.when(
        n_chunks > 0,
        F.flatten(F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk)),
    ).otherwise(F.array().cast(SPANS_T))
    pre = body
    if header is not None:
        pre = F.concat(F.array(text_span(F.lit(header))), pre)
    if footer is not None:
        pre = F.concat(pre, F.array(text_span(F.lit(footer))))
    stamped = F.transform(
        pre,
        lambda s, j: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            (2 * j + (did % 3)).cast("int").alias("offset"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    ).select("doc_id", stamped.cast(SPANS_T).alias("spans"))


def span_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document interleaved profile: span/text/media counts, visible
    text chars and words, media density (1e6 * media / max(text,1) —
    exact integers, hash-certifiable). Zero exchanges: one scan
    projection, cost = scanned bytes at any corpus size."""
    spans = F.col("spans")
    texts = F.filter(spans, lambda s: s["kind"] == F.lit("text"))
    n_text = F.size(texts).cast("long")
    n_media = F.size(
        F.filter(spans, lambda s: s["kind"] == F.lit("media"))
    ).cast("long")
    text_chars = F.aggregate(
        texts, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s["text"])
    )
    text_words = F.aggregate(
        texts,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.size(_words(s["text"])),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(spans).cast("long").alias("n_spans"),
        n_text.alias("n_text_spans"),
        n_media.alias("n_media_spans"),
        text_chars.alias("text_chars"),
        text_words.alias("text_words"),
    ).select(
        "*",
        F.expr(
            "(1000000 * n_media_spans) div greatest(n_text_spans, 1)"
        ).alias("media_density_e6"),
    )


def caption_pairs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Caption mining over the span stream: one row per media span with
    its nearest NON-EMPTY text span before and after (by array
    position), offset distances, and the chosen caption (the closer
    side; offset-distance tie -> before). The LAION-style image-text
    pair extractor for interleaved corpora — per-row array ops plus one
    Generate, ZERO exchanges (plan-asserted in tests/test_spans.py).

    Output: (doc_id, media_ref, pos, caption_before, caption_after,
    dist_before, dist_after, caption, caption_side); dist_* are in
    offset units; side/caption NULL when no text span exists on either
    side."""
    spans = F.col("spans")
    idx = F.when(
        F.size(spans) > 0, F.sequence(F.lit(0), F.size(spans) - 1)
    ).otherwise(F.array().cast("array<int>"))

    def at(j: Column) -> Column:
        return F.element_at(spans, j + 1)

    def is_text(t: Column) -> Column:
        return (at(t)["kind"] == F.lit("text")) & (
            F.length(F.trim(at(t)["text"])) > 0
        )

    def row(j: Column) -> Column:
        prev = F.array_max(F.filter(F.col("_idx"), lambda t: (t < j) & is_text(t)))
        nxt = F.array_min(F.filter(F.col("_idx"), lambda t: (t > j) & is_text(t)))
        return F.struct(
            at(j)["media_ref"].alias("media_ref"),
            j.cast("int").alias("pos"),
            at(prev)["text"].alias("caption_before"),
            at(nxt)["text"].alias("caption_after"),
            (at(j)["offset"] - at(prev)["offset"]).cast("long").alias("dist_before"),
            (at(nxt)["offset"] - at(j)["offset"]).cast("long").alias("dist_after"),
        )

    media_rows = F.transform(
        F.filter(F.col("_idx"), lambda j: at(j)["kind"] == F.lit("media")), row
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"), spans, idx.alias("_idx"))
        .select("doc_id", F.explode(media_rows).alias("r"))
        .select("doc_id", "r.*")
    )
    side = (
        F.when(F.col("dist_before").isNull() & F.col("dist_after").isNull(), None)
        .when(F.col("dist_after").isNull(), F.lit("before"))
        .when(F.col("dist_before").isNull(), F.lit("after"))
        .when(F.col("dist_before") <= F.col("dist_after"), F.lit("before"))
        .otherwise(F.lit("after"))
    )
    return out.select(
        "*",
        F.when(side == "before", F.col("caption_before"))
        .when(side == "after", F.col("caption_after"))
        .alias("caption"),
        side.alias("caption_side"),
    )


def caption_quality_gate(
    pairs: DataFrame,
    min_words: int = 3,
    max_words: int = 256,
    min_alpha_e6: int = 500_000,
) -> DataFrame:
    """Filter mined caption pairs on caption quality: word-count bounds
    and alphabetic-character fraction (exact integers: 1e6*alpha div
    len). The standard image-text curation gate (LAION/DataComp keep
    captions that look like prose, not filenames or pixel dumps).
    Per-row filter, zero exchanges. Adds n_caption_words + alpha_e6."""
    cap = F.col("caption")
    n_words = F.size(_words(cap)).cast("long")
    alpha = F.length(F.regexp_replace(cap, "[^A-Za-z]", "")).cast("long")
    return (
        pairs.where(cap.isNotNull())
        .select(
            "*",
            n_words.alias("n_caption_words"),
            (alpha * 1000000).alias("_alpha_num"),
        )
        .select(
            "*",
            F.expr("_alpha_num div greatest(length(caption), 1)").alias("alpha_e6"),
        )
        .drop("_alpha_num")
        .where(
            (F.col("n_caption_words") >= min_words)
            & (F.col("n_caption_words") <= max_words)
            & (F.col("alpha_e6") >= min_alpha_e6)
        )
    )


def strip_boilerplate_spans(
    docs: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    flat: bool = False,
    max_hot: int = 100_000,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Remove cross-document repeated text spans (nav bars, cookie
    banners, shared footers): a text span is boilerplate iff its
    normalized fingerprint (functions/text.py::fingerprint — md5 of
    lowercased whitespace-collapsed text) appears in >= min_df DISTINCT
    documents. Media/meta spans always survive; offsets are preserved
    (the stream keeps its original positions minus the stripped spans).

    Plan: posexplode -> ONE fingerprint exchange (countDistinct doc,
    map-side partial) -> hot set BROADCAST left_anti back onto the
    exploded stream (null fp = non-text spans never match, so they
    pass) -> re-assemble per doc. `max_hot` bounds the broadcast: hot
    fingerprints beyond the most-document-frequent max_hot are NOT
    stripped (deterministic tiebreak by fp) — the same stop-set guard
    idiom as jaccard_pairs(max_df)/winnow. Cost notes for 100 TB: the
    top-k guard is a TakeOrdered whose driver merge is O(partitions x
    max_hot) rows — keep max_hot modest (default 1e5 ~ a few MB/task)
    or pre-raise min_df instead; and the corpus is scanned twice (hot
    build + probe) — persist the span table first when stripping
    repeatedly. flat=True returns the kept spans as rows (doc_id, pos,
    kind, text, media_ref, offset) and skips the re-assembly
    exchange."""
    ex = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id",
        "pos",
        "s",
        F.when(
            F.col("s")["kind"] == "text", fingerprint(F.col("s")["text"])
        ).alias("fp"),
    )
    hot = (
        ex.where(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_df)
        .orderBy(F.col("n_docs").desc(), F.col("fp"))
        .limit(max_hot)
        .select("fp")
    )
    kept = ex.join(F.broadcast(hot), "fp", "left_anti")
    if flat:
        return kept.select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            F.col("s")["kind"].alias("kind"),
            F.col("s")["text"].alias("text"),
            F.col("s")["media_ref"].alias("media_ref"),
            F.col("s")["offset"].alias("offset"),
        )
    rebuilt = kept.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda x: x["s"]
        )
        .cast(SPANS_T)
        .alias("spans")
    )
    # docs whose EVERY span was boilerplate keep an empty array (not a
    # dropped row): join back to the id projection. keep_cols ride the
    # same join (one co-keyed equi-join, no extra exchange).
    ids = docs.select(F.col(id_col).alias("doc_id"), *keep_cols)
    return ids.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("spans"), F.array().cast(SPANS_T)).alias("spans"),
        *keep_cols,
    )


def span_lang_profile(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document language MIX over the span stream: classify every
    text span independently (functions/text.py::predict_lang — the same
    marker heuristic the doc-level gates use; a real model drops in as
    the same-shaped expression) and aggregate in the array world. The
    code-switching / wrong-language-section detector for interleaved
    corpora: a doc whose spans disagree (low majority_frac) mixes
    languages even when the doc-level vote looks clean — the standard
    reason multilingual curation classifies per-SEGMENT, not per-doc.

    Zero exchanges: classification and the counts are one scan
    projection; cost = scanned bytes at any corpus size.

    Output: doc_id, n_text_spans, per-language span counts (n_de/n_en/
    n_es/n_fr), n_classified (non-'und' spans), n_langs (distinct
    languages present), majority_lang ('und' when nothing classifies;
    ties break like predict_lang: lexicographically smallest),
    majority_n, majority_frac_e6 (exact integers)."""
    from crawler_spark.functions.text import predict_lang

    spans = F.col("spans")
    texts = F.filter(spans, lambda s: s["kind"] == F.lit("text"))
    langs = F.transform(texts, lambda s: predict_lang(s["text"]))
    d = docs.select(F.col(id_col).alias("doc_id"), langs.alias("_langs"))
    lang_names = ("de", "en", "es", "fr")

    def count_lang(lang: str) -> Column:
        # NB: a one-arg lambda only — a second (defaulted) parameter
        # would make F.filter pass the element INDEX into it
        return (
            F.size(F.filter(F.col("_langs"), lambda x: x == F.lit(lang)))
            .cast("long")
            .alias(f"n_{lang}")
        )

    counts = [count_lang(L) for L in lang_names]
    d = d.select("doc_id", F.size("_langs").cast("long").alias("n_text_spans"), *counts)
    n_classified = sum((F.col(f"n_{L}") for L in lang_names), F.lit(0)).cast("long")
    n_langs = sum(
        (F.when(F.col(f"n_{L}") > 0, 1).otherwise(0) for L in lang_names), F.lit(0)
    ).cast("long")
    best = F.greatest(
        *[
            F.struct(
                F.col(f"n_{L}").alias("n"),
                F.lit(-i).alias("inv_idx"),
                F.lit(L).alias("l"),
            )
            for i, L in enumerate(lang_names)
        ]
    )
    d = d.select(
        "*",
        n_classified.alias("n_classified"),
        n_langs.alias("n_langs"),
        F.when(n_classified == 0, F.lit("und")).otherwise(best["l"]).alias(
            "majority_lang"
        ),
        F.when(n_classified == 0, F.lit(0)).otherwise(best["n"]).cast("long").alias(
            "majority_n"
        ),
    )
    return d.select(
        "*",
        F.expr("(1000000 * majority_n) div greatest(n_classified, 1)").alias(
            "majority_frac_e6"
        ),
    )
