"""Text-analysis kernels for training-data pipelines (all JVM-side).

Everything here is built-in pyspark.sql.functions only — no UDFs — so
the expressions stay inside whole-stage codegen and push down cleanly.
Each has a matching ANSI-SQL twin in __spark_entry__.oracle_sql().

Ops: token counting (whitespace + BPE-ish regex), quality scoring
(length/punct/stopword ratios), language-ID (stopword-hit heuristic),
document fingerprinting (normalized-text hash), deterministic
stratified quota sampling (training-data mixing), corpus vocabulary
top-k by document frequency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared regexes (valid in both Java regex and RE2, for DuckDB parity)
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"
WS_RE = r"\s+"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in")
# tiny per-language stopword signal for the lang-id heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "nicht"),
    "fr": ("le", "la", "et"),
    "es": ("el", "de", "que"),
}


def ws_token_count(c: Column) -> Column:
    """Whitespace token count; 0 for blank text."""
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, WS_RE))
    ).cast("long")


def bpe_token_count(c: Column) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks."""
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE)).cast("long")


def punct_ratio(c: Column) -> Column:
    return F.round(
        F.regexp_count(c, F.lit(PUNCT_RE)).cast("double")
        / F.greatest(F.length(c), F.lit(1)).cast("double"),
        6,
    )


def stopword_ratio(c: Column) -> Column:
    pat = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
    return F.round(
        F.regexp_count(F.lower(c), F.lit(pat)).cast("double")
        / F.greatest(ws_token_count(c), F.lit(1)).cast("double"),
        6,
    )


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punct-heavy,
    reasonable stopword density (the usual crawl-corpus filters)."""
    len_ok = F.least(F.length(c).cast("double") / F.lit(200.0), F.lit(1.0))
    return F.round(
        0.5 * len_ok + 0.3 * (1.0 - punct_ratio(c)) + 0.2 * F.least(
            stopword_ratio(c) * 5.0, F.lit(1.0)
        ),
        6,
    )


def lang_scores(c: Column) -> dict[str, Column]:
    low = F.lower(c)
    out = {}
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.regexp_count(low, F.lit(pat)).cast("long")
    return out


def predict_lang(c: Column) -> Column:
    """argmax over marker-hit counts, 'und' (undetermined) when all 0.

    Ties break by language code order (deterministic; mirrored in SQL).
    Built as ONE greatest() over (score, -index, lang) structs — struct
    ordering is lexicographic, so max score wins and ties fall to the
    smallest language index. The obvious chained-when tower is
    semantically identical but EXPONENTIAL in expression size (each
    comparison re-embeds every earlier struct), which blew past the
    codegen size limit once predicate pushdown inlined it into a gate
    filter (full_curation measured 122 s -> ~3 s at sf0.1 from this
    rewrite alone: small expression -> codegen succeeds -> CSE dedups
    the pushed-down copies).
    """
    scores = lang_scores(c)
    best = F.greatest(
        *[
            F.struct(
                scores[lang].alias("n"),
                F.lit(-i).alias("inv_idx"),
                F.lit(lang).alias("l"),
            )
            for i, lang in enumerate(sorted(scores))
        ]
    )
    return F.when(best["n"] == 0, F.lit("und")).otherwise(best["l"])


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(c), WS_RE, " "))


def _collapse_exact_dups(kept: DataFrame, metric_cols: list[str]) -> DataFrame:
    """Exact-dup collapse shared by the curation pipelines: keep the
    min-(doc_id, *metrics) row per fingerprint plus the copy count
    (one exchange; all group members carry identical text, so their
    metrics agree and min-by-doc_id is a pure canonical-row choice)."""
    cols = ["doc_id", *metric_cols]
    return (
        kept.groupBy("fingerprint")
        .agg(F.min(F.struct(*cols)).alias("s"), F.count("*").alias("n_copies"))
        .select(*[F.col(f"s.{c}").alias(c) for c in cols], "n_copies")
    )


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 5,
) -> DataFrame:
    """End-to-end training-corpus curation in ONE declarative plan:
    profile -> quality/language gate -> exact-dup collapse (keep the
    smallest doc_id per fingerprint) -> per-language corpus stats.

    The whole pipeline is builtin-only, so Catalyst fuses the profile
    expressions into the scan projection and the two groupBys are the
    only shuffles (fingerprint, then pred_lang) — at 100 TB this is a
    scan + two exchanges, with the gate applied map-side before either.
    `sum_quality` aggregates via DECIMAL so parallel summation order
    can't flip a digit (divide by n_docs downstream for the mean).
    """
    prof = text_profile(docs, text_col)
    kept = prof.filter(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("pred_lang") != "und")
    )
    canon = _collapse_exact_dups(kept, ["n_tokens", "quality", "pred_lang"])
    return canon.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_copies").alias("n_kept_total"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("quality").cast("decimal(27,6)")).cast("double").alias("sum_quality"),
    )


def full_curation(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 30,
    max_dup_2gram: float = 0.3,
    min_logit: int = 1,
) -> DataFrame:
    """Flagship end-to-end curation: the complete modern pre-training
    prep path composed in ONE declarative plan —

        PII redaction -> word-count gate -> repetition gate (Gopher
        dup-bigram fraction) -> linear-classifier gate -> language-ID
        -> exact-dup collapse -> per-language corpus stats.

    Every per-doc metric is computed over the REDACTED text in a single
    scan projection (the building blocks are column expressions, not
    chained DataFrames, so nothing is joined back together); gates
    apply map-side before either shuffle. The whole pipeline is
    scan -> filter -> exchange(fingerprint) -> exchange(pred_lang) —
    two exchanges at 100 TB, both over heavily reduced data. All
    aggregates are exact integers (counts, word totals, logit sums), so
    the result is hash-certifiable in any engine at any parallelism.
    """
    from crawler_spark.functions.pii import redact_expr

    # STAGE the shared intermediates as named multi-consumer columns:
    # inlining them would re-run the 5-regex redaction chain + split
    # inside every _word_ngrams element_at (quadratic per doc —
    # measured 173 s vs ~1 s at sf0.1). CollapseProject keeps aliases
    # referenced more than once materialized, so each evaluates ONCE
    # per row and the plan is still a single scan projection.
    staged = docs.select(
        "doc_id", redact_expr(F.col(text_col)).alias("red_text")
    )
    words = F.filter(
        F.split(F.trim(F.lower(F.col("red_text"))), WS_RE), lambda x: x != ""
    )
    staged = staged.select("doc_id", "red_text", words.alias("w"))
    staged = staged.select(
        "doc_id", "red_text", "w", _word_ngrams(F.col("w"), 2).alias("g2")
    )
    t2 = F.size("g2")
    dup2 = (
        F.when(
            t2 > 0,
            (t2 - F.size(F.array_distinct("g2"))).cast("double")
            / t2.cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    # explode(array(struct(...))) is a one-row-in/one-row-out GENERATE
    # barrier: the gate filter below references its output, and
    # PushDownPredicates cannot move such a predicate under a Generate.
    # Without it the filter is pushed below the projections, the staged
    # w/red_text aliases get substituted back in, and the per-element
    # n-gram lambda re-runs redaction+split PER WORD — O(words^2)
    # regex work per doc, measured 108 s vs ~2 s at sf0.1.
    metrics = F.explode(
        F.array(
            F.struct(
                F.size("w").cast("long").alias("n_words"),
                dup2.alias("dup_2gram_frac"),
                hash_logit(F.col("w")).alias("logit"),
                predict_lang(F.col("red_text")).alias("pred_lang"),
                fingerprint(F.col("red_text")).alias("fingerprint"),
            )
        )
    )
    prof = staged.select("doc_id", metrics.alias("m")).select("doc_id", "m.*")
    kept = prof.filter(
        (F.col("n_words") >= min_words)
        & (F.col("dup_2gram_frac") <= max_dup_2gram)
        & (F.col("logit") >= min_logit)
        & (F.col("pred_lang") != "und")
    )
    canon = _collapse_exact_dups(kept, ["n_words", "logit", "pred_lang"])
    return canon.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_copies").alias("n_kept_total"),
        F.sum("n_words").alias("total_words"),
        F.sum("logit").alias("total_logit"),
    )


def md5_bucket(c: Column) -> Column:
    """Deterministic 32-bit hash bucket: first 8 hex chars of md5 as a
    long. The ONE canonical spelling of the engine/oracle hash-parity
    idiom — the DuckDB twin is
    `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::UBIGINT`; both
    sides must use exactly 8 hex chars or the oracles break."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def stratified_sample(
    docs: DataFrame,
    quotas: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum quota sampling (training-data mixing).

    Every stratum (language, source, domain) contributes at most
    quotas[stratum] documents, selected in md5-hash order of the id —
    uniform-random in effect but fully reproducible, so the engine and
    the DuckDB oracle pick the SAME sample (no rand()). Strata absent
    from `quotas` contribute nothing.

    Scale shape: ONE shuffle (the per-stratum window). The rank filter
    is written `rank <= max(quotas)` (a literal) AND `rank <= quota`,
    so Catalyst's InferWindowGroupLimit turns the constant bound into a
    per-partition top-k pushdown — a giant stratum ('en' at 100 TB)
    never ranks past max-quota rows per task before the final merge.
    """
    from pyspark.sql import Window

    pairs: list = []
    for kq in sorted(quotas):
        pairs += [F.lit(kq), F.lit(int(quotas[kq]))]
    qmap = F.create_map(*pairs)
    max_q = max(quotas.values()) if quotas else 0
    w = Window.partitionBy(strata_col).orderBy(md5_bucket(F.col(id_col)), F.col(id_col))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.lit(max_q))  # constant -> WindowGroupLimit
        .filter(F.col("sample_rank") <= F.coalesce(qmap[F.col(strata_col)], F.lit(0)))
        .select(F.col(id_col), F.col(strata_col).alias("stratum"), "sample_rank")
    )


def bernoulli_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli rate sampling — the
    temperature-mixing companion to stratified_sample's quotas: keep a
    document iff md5_bucket(id) % precision < round(rate * precision)
    for its stratum's rate. Uniform-random in effect, but the SAME
    sample in every engine and on every run (no rand()), so downstream
    corpora are reproducible. Strata absent from `rates` drop.

    Scale shape: a pure per-row filter — zero exchanges, pushes into
    the scan, trivially parallel at any size (quota sampling needs a
    window; rate sampling needs nothing).
    """
    if not rates:
        # no stratum keeps anything; map()[col] would not even analyze
        return docs.filter(F.lit(False)).select(
            F.col(id_col), F.col(strata_col).alias("stratum")
        )
    pairs: list = []
    for k in sorted(rates):
        pairs += [F.lit(k), F.lit(int(round(rates[k] * precision)))]
    thresholds = F.create_map(*pairs)
    keep = md5_bucket(F.col(id_col)) % precision < F.coalesce(
        thresholds[F.col(strata_col)], F.lit(0)
    )
    return docs.filter(keep).select(
        F.col(id_col), F.col(strata_col).alias("stratum")
    )


def holdout_split(
    docs: DataFrame,
    weights: dict[str, int],
    group_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic leakage-safe train/val/test assignment.

    weights: {"train": 98, "val": 1, "test": 1} — integer parts of the
    total; each id (or group) lands in the split whose cumulative range
    covers md5_bucket(salt:key) % total. Ranges follow the dict's own
    order, so the same weights dict always reproduces the same split.

    group_col is the LEAKAGE UNIT: with group_col="host" every page of
    a host shares one hash and lands in one split — near-duplicates and
    templated pages cluster within hosts, and a random per-document
    split would leak them across train/test (the classic eval
    contamination). None splits per id (iid assumption).

    Scale shape: pure per-row hash + CASE — zero exchanges, pushes into
    the scan, trivially parallel; re-running on a grown corpus never
    reassigns an existing key (hash-stable, the feature that makes the
    split usable incrementally across crawl rounds).

    Output: docs' columns + (split_key, split).
    """
    if not weights or any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative integers with a positive sum")
    key = F.col(group_col) if group_col is not None else F.col(id_col)
    total = sum(weights.values())
    b = md5_bucket(F.concat_ws(":", F.lit(salt), key.cast("string"))) % total
    expr = None
    cum = 0
    for name, w in weights.items():
        cum += int(w)
        cond = b < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return docs.withColumn("split_key", key.cast("string")).withColumn(
        "split", expr
    )


def cross_split_pairs(
    pairs: DataFrame,
    assignment: DataFrame,
    left_col: str = "doc_id_a",
    right_col: str = "doc_id_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs whose two sides landed
    in DIFFERENT splits — exactly the pairs that contaminate evaluation
    (test answers memorized from train near-dups). Feed any pair table
    (minhash_lsh_pairs, simhash_near_dup_pairs, jaccard_pairs) plus a
    holdout_split assignment; an empty result certifies the split is
    leak-free w.r.t. that detector.

    Scale shape: two equi-joins against the (id, split) projection —
    with a host-grouped split the assignment is derivable from the
    group so both joins stay co-located on the id layout; no self-joins
    beyond what the pair table already paid.

    Output: (left id, right id, split_a, split_b).
    """
    asg = assignment.select(
        F.col(id_col).cast("string").alias("_id"), "split"
    )
    return (
        pairs.select(
            F.col(left_col).cast("string").alias("doc_id_a"),
            F.col(right_col).cast("string").alias("doc_id_b"),
        )
        .join(asg.withColumnRenamed("split", "split_a"), F.col("doc_id_a") == F.col("_id"))
        .drop("_id")
        .join(asg.withColumnRenamed("split", "split_b"), F.col("doc_id_b") == F.col("_id"))
        .drop("_id")
        .filter(F.col("split_a") != F.col("split_b"))
    )


def length_quantiles(
    docs: DataFrame,
    text_col: str = "text",
    strata_col: str = "lang",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-stratum token-length quantiles — the corpus length
    distribution every mixing/truncation decision reads (context-window
    budgeting, Gopher's length gates, per-language packing factors).

    exact=True uses percentile() (sort-based, oracle-certifiable —
    DuckDB's quantile_cont shares the same linear-interpolation
    definition). At 100 TB flip exact=False for percentile_approx
    (t-digest sketch: one pass, bounded memory, mergeable across
    partitions — the scale path, but approximate and therefore not
    hash-certified).

    Scale shape: map-side partial aggregation into one exchange on the
    stratum key; the exact form's per-group sort is the price of
    certifiability at test scale.
    """
    n = ws_token_count(F.col(text_col))
    agg = F.percentile(n, F.lit(list(ps))) if exact else F.percentile_approx(
        n, F.lit(list(ps))
    )
    out = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"), agg.alias("q")
    )
    return out.select(
        "stratum",
        "n_docs",
        *[
            F.col("q")[i].cast("double").alias(f"p{round(p * 100)}")
            for i, p in enumerate(ps)
        ],
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_tokens: int = 1,
    n_parts: int | None = None,
    tokens_col: str | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sequence packing for LM training: documents are concatenated in
    id order (sep_tokens separator tokens after each doc) into one
    token stream that is chunked into fixed `capacity`-token context
    windows. Each doc reports its [start_offset, end_offset) span in
    the stream and the window range it lands in — the map a packing
    writer needs to emit training sequences, and the exact semantics of
    GPT-style "concatenate with <eos>, chunk into blocks" packing
    (documents may span window boundaries).

    Zero-token docs occupy no window: n_bins = 0, first_bin = last_bin
    = the window their (empty) span starts in.

    Scale shape: a global prefix sum with NO single-partition window —
    the same two-phase scheme as scheduler.assign_global_seq: (1)
    repartitionByRange on the id (parallel range shuffle) + in-partition
    sort; (2) per-partition token totals (tiny, collected) become
    broadcast offsets, and a narrow Arrow pass stamps start_offset with
    a vectorized cumsum. Window math is plain JVM integer arithmetic on
    top (exact, hash-certifiable). Result is identical to the
    single-window formulation for ANY range boundaries, because ranges
    are contiguous in the id order.
    """
    import numpy as np

    from pyspark.sql import types as T

    spark = docs.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    # tokens_col: precomputed per-doc token budget (e.g. text tokens +
    # media placeholder tokens for interleaved docs) instead of
    # whitespace-counting text_col; keep_cols ride through the packing
    # unchanged so callers don't need a join to recover attributes.
    tok = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else ws_token_count(F.col(text_col))
    )
    d = docs.select(F.col(id_col), tok.alias("n_tokens"), *keep_cols)
    parted = (
        d.repartitionByRange(n_parts, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    totals = sorted(
        (r["_pid"], r["s"])
        for r in parted.groupBy("_pid")
        .agg(F.sum(F.col("n_tokens") + sep_tokens).alias("s"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid, s in totals:
        offsets[int(pid)] = acc
        acc += int(s)
    b_off = spark.sparkContext.broadcast(offsets)
    out_schema = T.StructType(
        list(parted.schema.fields)
        + [T.StructField("start_offset", T.LongType(), False)]
    )

    def stamp(batches):
        pos = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = b_off.value.get(int(pdf["_pid"].iloc[0]), 0)
            adv = (pdf["n_tokens"] + sep_tokens).to_numpy(dtype="int64")
            starts = base + pos + np.concatenate(([0], np.cumsum(adv)[:-1]))
            pdf = pdf.assign(start_offset=starts)
            pos += int(adv.sum())
            yield pdf

    stamped = parted.mapInPandas(stamp, out_schema).drop("_pid")
    cap = F.lit(int(capacity))
    first_bin = F.expr(f"start_offset DIV {int(capacity)}")
    last_pos = F.col("start_offset") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0)
    )
    last_bin = F.floor(last_pos / cap).cast("long")
    return stamped.select(
        id_col,
        "n_tokens",
        "start_offset",
        (F.col("start_offset") + F.col("n_tokens")).alias("end_offset"),
        first_bin.cast("long").alias("first_bin"),
        last_bin.alias("last_bin"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(last_bin - first_bin + 1)
        .alias("n_bins"),
        *keep_cols,
    )


def pack_segments(
    packed: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The writer side of pack_sequences: explode each packed document
    into one row per context window it occupies — exactly the records a
    training data loader materializes window-by-window. For window
    `bin_id`, its segments sorted by `bin_offset` ARE the window (plus
    the separator tokens between consecutive docs and tail padding in
    the final window).

    Output per (doc, window): bin_id, doc id, bin_offset (position of
    the segment inside the window), seg_len (tokens of this doc in this
    window), is_doc_start / is_doc_end (boundary flags a loader needs
    for attention-mask resets and loss masking). Zero-token docs occupy
    no window and emit nothing.

    Pure integer arithmetic + one Generate on top of the packing map —
    no exchange beyond what pack_sequences already did; `capacity` must
    match the pack_sequences call."""
    cap = int(capacity)
    bins = F.when(
        F.col("n_tokens") > 0,
        F.sequence(F.col("first_bin"), F.col("last_bin")),
    ).otherwise(F.array().cast("array<long>"))
    ex = packed.select(
        id_col,
        "n_tokens",
        "start_offset",
        "end_offset",
        *keep_cols,
        F.explode(bins).alias("bin_id"),
    )
    win_start = F.col("bin_id") * cap
    seg_start = F.greatest(F.col("start_offset"), win_start)
    seg_end = F.least(F.col("end_offset"), win_start + cap)
    return ex.select(
        F.col("bin_id").cast("long").alias("bin_id"),
        id_col,
        (seg_start - win_start).cast("long").alias("bin_offset"),
        (seg_end - seg_start).cast("long").alias("seg_len"),
        (seg_start == F.col("start_offset")).alias("is_doc_start"),
        (seg_end == F.col("end_offset")).alias("is_doc_end"),
        *keep_cols,
    )


def pack_fill_stats(
    segments: DataFrame, capacity: int, id_col: str = "doc_id"
) -> DataFrame:
    """Per-window packing utilization from pack_segments output: how
    many doc segments land in each context window, how many documents
    start/end there, the document-token fill and its fraction of
    capacity (exact integers — the remainder is separators, plus
    padding in the final window only). The wasted-compute accounting
    every packing recipe reports. ONE keyed agg exchange (map-side
    partial) over the segment rows."""
    return (
        segments.groupBy("bin_id")
        .agg(
            F.count("*").cast("long").alias("n_segments"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.sum(F.col("is_doc_start").cast("long")).alias("n_docs_started"),
            F.sum(F.col("is_doc_end").cast("long")).alias("n_docs_ended"),
            F.sum("seg_len").cast("long").alias("doc_tokens"),
        )
        .select(
            "*",
            F.expr(f"(1000000 * doc_tokens) div {int(capacity)}").alias(
                "util_e6"
            ),
        )
    )


def top_terms(docs: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary head: top-k terms by document frequency.

    df = number of documents containing the term (distinct per doc, via
    textdedup.tokens). Integer-only output with a total order (df desc,
    term asc) so the k-boundary is deterministic in both engines.

    Scale shape: map-side partial count -> one exchange on term ->
    TakeOrderedAndProject (global top-k never materializes the full
    vocabulary on one node); the final row_number runs on k rows only.
    """
    from pyspark.sql import Window

    from crawler_spark.operators.textdedup import tokens

    top = (
        tokens(docs, text_col)
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(k)
    )
    w = Window.orderBy(F.desc("df"), "tok")  # k rows: single partition is fine
    return top.select(
        F.row_number().over(w).alias("rank"), F.col("tok").alias("term"), "df"
    )


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per doc with all text-analysis columns."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        ws_token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        predict_lang(c).alias("pred_lang"),
        fingerprint(c).alias("fingerprint"),
    )


def _word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams of a (non-empty-token) word array as 'w1 w2 ...'
    strings; empty array when the doc has fewer than n words."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_multiplicity(grams: Column) -> Column:
    """Occurrences of the most frequent element — computed per row as
    the longest equal-run of the SORTED array (one array_sort + one
    aggregate scan; no explode, no shuffle). Empty array -> 0."""
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def hash_logit(words: Column, n_weight_levels: int = 2001) -> Column:
    """Exact-integer linear-classifier logit over a word array: each
    token's weight derives from its md5 hash, mapped to the symmetric
    range [-(n//2), +n//2]. Per-row aggregate — no explode, no shuffle."""
    half = n_weight_levels // 2
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + (md5_bucket(w) % n_weight_levels - half),
    )


def classifier_score(
    docs: DataFrame,
    text_col: str = "text",
    weights: DataFrame | None = None,
    n_weight_levels: int = 2001,
) -> DataFrame:
    """fastText-style linear document-quality classifier via the
    hashing trick (the public CCNet / GPT-3 'wiki-vs-random' filter
    shape): per-token weight lookup -> per-doc logit sum -> verdict.

    With ``weights=None`` the weight of a token is derived from its
    md5 hash, mapped to the symmetric integer range
    [-(n_weight_levels//2), +n_weight_levels//2] — a deterministic
    stand-in with the exact execution shape of a trained model, and
    (being integer arithmetic) hash-certifiable against the DuckDB
    oracle. A real trained model drops in as a ``weights`` DataFrame
    (tok, weight) — benchmarked vocabularies are tiny next to a 100 TB
    corpus, so it BROADCASTS and the corpus still never shuffles; the
    only exchange on that path is the per-doc sum re-aggregation.

    Output: (doc_id, n_tokens, logit, mean_weight, label) where logit
    is the exact integer weight sum over ALL tokens (bag-of-words with
    multiplicity), mean_weight = logit / n_tokens (single division of
    exact integers -> bit-identical double), label = logit > 0.

    Scale shape (hash path): per-row array aggregate only — ZERO
    exchanges, fuses into the scan projection.
    """
    # NULL text scores like empty text (0 tokens, neutral logit) on
    # BOTH paths — without the coalesce the hash path would propagate
    # NULL while explode_outer yields 0, and the two paths diverge.
    words = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_RE),
        lambda x: x != "",
    )
    if weights is None:
        logit = hash_logit(words, n_weight_levels)
        base = docs.select(
            "doc_id",
            F.size(words).cast("long").alias("n_tokens"),
            logit.alias("logit"),
        )
    else:
        # explode_outer keeps zero-token docs as a single null-tok row
        # (null never matches the vocab -> weight 0, count(tok) -> 0),
        # so the whole path is ONE corpus pass: scan -> explode ->
        # broadcast join -> per-doc agg. No second scan, no
        # corpus-side sort-merge join.
        toks = docs.select("doc_id", F.explode_outer(words).alias("tok"))
        base = (
            toks.join(F.broadcast(weights), "tok", "left")
            .groupBy("doc_id")
            .agg(
                F.count("tok").alias("n_tokens"),
                F.sum(F.coalesce("weight", F.lit(0))).cast("long").alias("logit"),
            )
        )
    return base.select(
        "doc_id",
        "n_tokens",
        "logit",
        F.when(
            F.col("n_tokens") > 0,
            F.col("logit").cast("double") / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_weight"),
        (F.col("logit") > 0).alias("label"),
    )


def gopher_gates(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The full Gopher/MassiveText document-quality gate (Rae et al.
    2021, public): word-count bounds, mean word length, symbol-to-word
    ratio ('#' and '...'), bullet/ellipsis line fractions, alphabetic
    word fraction, stopword presence — one row per doc with every
    metric plus the combined `passes` verdict (repetition gates live in
    repetition_profile; compose with it for the complete filter).

    Scale shape: per-row array/regexp expressions only — ZERO
    exchanges, fuses into the scan projection. Every double is a single
    division of exact integers, so values are bit-identical across
    engines and the boolean gate comparisons are hash-safe.
    """
    c = F.col(text_col)
    words = F.filter(F.split(F.trim(c), WS_RE), lambda x: x != "")
    lines = F.split(c, "\n")
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("long")
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(
        n_words > 0, total_word_chars.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"\.\.\."))
    ).cast("long")
    symbol_word_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(F.ltrim(ln), 1, 1).isin("-", "*", "•"),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).endswith("..."))
    ).cast("long")
    bullet_frac = n_bullet.cast("double") / n_lines.cast("double")
    ellipsis_frac = n_ellipsis.cast("double") / n_lines.cast("double")
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    alpha_frac = F.when(
        n_words > 0, n_alpha.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    stop_hits = F.regexp_count(
        F.lower(c), F.lit(r"\b(" + "|".join(EN_STOPWORDS) + r")\b")
    ).cast("long")
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_word_ratio <= max_symbol_word_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stopword_hits)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_word_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        passes.alias("passes"),
    )


def repetition_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition metrics — the Gopher/MassiveText
    repetition gates (Rae et al. 2021, public): heavily self-repeating
    docs (boilerplate loops, keyword stuffing, templated spam) are the
    curation signal quality/lang scoring misses.

    Per doc: n_words, dup_{2,3,4}gram_frac (fraction of word n-grams
    that are repeats of an earlier one: 1 - distinct/total; Gopher
    gates on the character-weighted variant — documented deviation),
    and top_2gram_frac (occurrences of the most frequent bigram over
    all bigrams; Gopher's 'top n-gram fraction').

    Scale shape: every metric is a per-row array expression (split ->
    transform -> array_distinct / sorted-run-scan) — ZERO exchanges,
    fuses into the scan projection, embarrassingly parallel at 100 TB.
    Fractions are single divisions of exact integers, so the doubles
    are bit-identical in any engine (the DuckDB oracle twin computes
    the same counts relationally via unnest + groupBy).
    """
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    out = [F.size(words).cast("long").alias("n_words")]
    for n in (2, 3, 4):
        g = _word_ngrams(words, n)
        total = F.size(g)
        dup = (total - F.size(F.array_distinct(g))).cast("double")
        out.append(
            F.when(total > 0, dup / total.cast("double"))
            .otherwise(F.lit(0.0))
            .alias(f"dup_{n}gram_frac")
        )
    g2 = _word_ngrams(words, 2)
    t2 = F.size(g2)
    out.append(
        F.when(t2 > 0, _max_multiplicity(g2).cast("double") / t2.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("top_2gram_frac")
    )
    return docs.select("doc_id", *out)


# --- unicode normalization (multilingual curation pass) --------------------

# zero-width / bidi-control code points that survive decoding but carry
# no text: ZWSP/ZWNJ/ZWJ, word joiner, BOM, soft hyphen, LRM/RLM and the
# directional embedding/override/isolate family (public Unicode ranges)
ZERO_WIDTH = "".join(
    chr(c)
    for c in (
        [0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD, 0x200E, 0x200F]
        + list(range(0x202A, 0x202F))
        + list(range(0x2066, 0x206A))
    )
)


def normalize_text_udf(form: str = "NFC", strip_invisible: bool = True):
    """Arrow-batched Unicode text normalizer: composes combining
    sequences to the given form (NFC default — the web-crawl curation
    standard: é as one code point, not e+U+0301, so dedup hashing and
    tokenization see one spelling) and optionally strips zero-width /
    bidi-control characters (ZERO_WIDTH — invisible in rendering,
    poison for exact-hash dedup and token counting).

    Vectorized pandas str ops over Arrow batches — never per-row Spark
    round trips; the pure-NFC path is oracle-certified against DuckDB's
    ICU nfc_normalize (two independent Unicode implementations must
    agree bit-for-bit). Returns f(text Column) -> Column."""
    import unicodedata

    from pyspark.sql import types as _T

    table = {ord(c): None for c in ZERO_WIDTH} if strip_invisible else None

    def _norm(texts):
        def one(t):
            if t is None:
                return None
            s = unicodedata.normalize(form, t)
            return s.translate(table) if table else s

        return texts.map(one)

    # legacy-style declaration: the module's postponed annotations would
    # leave 'pd.Series' hints unresolvable for a function-local UDF
    norm_udf = F.pandas_udf(_norm, _T.StringType())
    return lambda c: norm_udf(F.col(c) if isinstance(c, str) else c)
