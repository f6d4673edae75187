"""Deduplication operators for training-data pipelines.

Four families, all expressed as shuffle-conscious DataFrame jobs (no
UDFs — every hash is Spark's md5/xxhash64 so the DuckDB oracles can
reproduce them bit-for-bit):

- exact        hash-groupBy on the raw text (one shuffle on the hash)
- minhash+LSH  shingle -> K minhashes -> band keys -> bucket self-join;
               only same-band docs ever meet, so the candidate join is
               |bucket|² not |corpus|²
- simhash      64-bit sign-sum signature (Manku width); near-dups by
               blocked Hamming search
- jaccard      token inverted-index join (posting-list intersection),
               with a document-frequency cap that drops stop-tokens
               before the pair join — the classic guard against the
               hot-token pair explosion at scale
- line-level   CCNet-style first-global-occurrence line dedup
               (boilerplate stripping), plus winnowing fingerprints
               (MOSS) for substring-level overlap

Minhash trick for engine/oracle parity: a minhash is min over tokens of
md5(seed:token) — and because fixed-width lowercase hex compares
lexicographically exactly like the number it encodes, `min` over the
hex *string* needs no integer conversion in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8
BAND_SIZE = 2  # 4 bands of 2 -> candidates need 1 identical band
HEX_W = 15  # md5 prefix width used for minhash values


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tok) distinct token pairs; blank-safe."""
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, tok) distinct n-word shingles — the standard minhash
    unit: far more distinctive than single words, so LSH buckets stay
    small even over a narrow vocabulary. Built JVM-side with
    sequence+transform+element_at (no UDF). Docs shorter than n words
    are dropped (mirrored in the SQL oracle)."""
    # materialize the split ONCE as a named column: inlining it would
    # re-tokenize the document inside every element_at (quadratic/doc)
    base = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("w")
    ).filter(F.size("w") >= n)
    arr = F.col("w")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(arr, i + j) for j in range(n)]),
        )
    )
    return base.select("doc_id", F.explode(sh).alias("tok"))


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5(text) groups, keep the smallest doc_id."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text", k: int = N_MINHASH) -> DataFrame:
    """(doc_id, mh0..mh{k-1}) minhash signature over 3-word shingles."""
    t = shingles(docs, text_col)
    aggs = [
        F.min(F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("tok"))), 1, HEX_W)).alias(
            f"mh{i}"
        )
        for i in range(k)
    ]
    return t.groupBy("doc_id").agg(*aggs)


def _band_rows(sig: DataFrame, k: int, band: int) -> DataFrame:
    """(doc_id, band_idx, band_key) rows from a minhash signature table
    — the shared LSH bucketing of the batch and delta pair queries."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "|", *[F.col(f"mh{b * band + j}") for j in range(band)]
                        ).alias("band_key"),
                    )
                    for b in range(k // band)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_key")


def minhash_lsh_delta_pairs(
    signatures: DataFrame,
    delta_signatures: DataFrame,
    k: int = N_MINHASH,
    band: int = BAND_SIZE,
    max_bucket: int | None = 1000,
    observation=None,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs TOUCHING a delta only: the incremental
    companion of minhash_lsh_pairs. The delta's band rows equi-join the
    full signature table's band rows on (band_idx, band_key) — an
    O(|delta| x bucket-width) join instead of re-bucketing the entire
    corpus into |bucket|² pair arrays every round. delta-delta pairs
    come out of the same join because the delta must be a SUBSET of
    `signatures` (append the delta before querying, as the engine's
    doc_signatures table does by construction).

    Feeds graph.incremental_components: together they maintain
    dup-cluster state at O(per-round delta) cost.

    max_bucket: same hot-bucket guard as minhash_lsh_pairs — a
    degenerate band key on the FULL side turns the delta join into
    |delta ∩ key| × |bucket| rows per key. Keys whose full-side bucket
    exceeds max_bucket are anti-joined out (the over-cap key set is
    tiny, so it broadcasts); observation= reports
    (hot_buckets, hot_bucket_docs) with the action. None disables.

    hot_keys: precomputed over-cap key table (lsh_hot_buckets output
    or a persisted index artifact) — hot-key detection is a pure
    function of the signature table, so a standing index computes it
    once (at build time, or once per maintenance fold shared with the
    audit metric) and the query pays only the broadcast anti-join.
    Ignored when max_bucket is None.
    """
    d = _band_rows(delta_signatures, k, band).withColumnRenamed("doc_id", "d_id")
    a = _band_rows(signatures, k, band)
    if max_bucket is not None:
        if hot_keys is not None:
            hot = hot_keys.select(
                "band_idx",
                "band_key",
                F.coalesce(F.col("n_ids"), F.lit(0)).alias("n_ids"),
            )
        else:
            # The anti-join below only ever drops DELTA band keys, so
            # the bucket-size count is restricted to the delta's keys
            # first: a broadcast semi-join turns the guard's aggregate
            # from a full-corpus band shuffle into one bounded by the
            # delta's bucket fan-in (map-side filter on the full scan,
            # O(|delta| x bucket-width) rows into the groupBy).
            # Equivalent drop set.
            dkeys = d.select("band_idx", "band_key").distinct()
            hot = (
                a.join(F.broadcast(dkeys), ["band_idx", "band_key"], "left_semi")
                .groupBy("band_idx", "band_key")
                .agg(F.count("*").alias("n_ids"))
                .filter(F.col("n_ids") > max_bucket)
            )
        if observation is not None:
            hot = hot.observe(
                observation,
                F.count("*").alias("hot_buckets"),
                F.coalesce(F.sum("n_ids"), F.lit(0)).alias("hot_bucket_docs"),
            )
        d = d.join(
            F.broadcast(hot.select("band_idx", "band_key")),
            ["band_idx", "band_key"],
            "left_anti",
        )
    return (
        d.join(a, ["band_idx", "band_key"])
        .filter(F.col("d_id") != F.col("doc_id"))
        .select(
            F.least("d_id", "doc_id").alias("doc_a"),
            F.greatest("d_id", "doc_id").alias("doc_b"),
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame | None = None,
    text_col: str = "text",
    k: int = N_MINHASH,
    band: int = BAND_SIZE,
    signatures: DataFrame | None = None,
    max_bucket: int | None = 1000,
    observation=None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band.

    Shape: one groupBy on (band_idx, band_key) collects each bucket's
    doc ids, then i<j pairs are built INSIDE the bucket with array ops
    (transform+slice — still |bucket|², the LSH contract, but the
    expensive shingle->signature pipeline runs ONCE; the equivalent
    self-join evaluated it per join side because Spark's exchange reuse
    does not fire across the aliased branches).

    signatures=: the production pattern — pass a PRECOMPUTED signature
    table (minhash_signatures written to parquet / cached once) and the
    pairs query drops to band-explode + one groupBy, skipping the
    shingle pipeline entirely. Recompute-from-docs remains the
    single-query default.

    max_bucket: hot-bucket guard. A degenerate band key (empty or
    boilerplate docs all sharing one signature band) makes a single
    task materialize a |bucket|-element array and a |bucket|² pair
    burst that AQE cannot split (it is one row). Buckets wider than
    max_bucket are dropped — they are not near-dup SIGNAL (every
    member is a near-certain duplicate of every other; exact dedup or
    lsh_hot_buckets + per-bucket canonical election handles them at
    linear cost) — and the drop is never silent: pass a
    pyspark.sql.Observation as observation= to get
    (hot_buckets, hot_bucket_docs) metrics with the action, or audit
    the survivors' complement with lsh_hot_buckets(). None disables.

    Observation caveat: metrics are delivered only by a proper SQL
    action (count/collect/write) on the returned frame; a consumer
    whose first materialization is df.localCheckpoint() goes through
    the RDD path and never populates them — use lsh_hot_buckets()
    there (engine.update_dup_clusters does exactly this)."""
    sig = signatures if signatures is not None else minhash_signatures(docs, text_col, k)
    bands = _band_rows(sig, k, band)
    buckets = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.withColumn("_hot", F.size("ids") > max_bucket)
        if observation is not None:
            buckets = buckets.observe(
                observation,
                F.sum(F.col("_hot").cast("long")).alias("hot_buckets"),
                F.sum(
                    F.when(F.col("_hot"), F.size("ids")).otherwise(0)
                ).alias("hot_bucket_docs"),
            )
        buckets = buckets.filter(~F.col("_hot")).drop("_hot")
    ids = F.col("ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def lsh_hot_buckets(
    docs: DataFrame | None = None,
    text_col: str = "text",
    k: int = N_MINHASH,
    band: int = BAND_SIZE,
    signatures: DataFrame | None = None,
    max_bucket: int = 1000,
    touched_by: DataFrame | None = None,
) -> DataFrame:
    """The buckets minhash_lsh_pairs(max_bucket=...) drops, as data:
    (band_idx, band_key, n_ids, sample_id) — the audit complement of
    the hot-bucket guard (no-silent-caps). n_ids is exact; sample_id is
    one member (min doc_id) so an operator can spot-check what the
    degenerate band actually is (usually empty/boilerplate text).
    Constant state per bucket — no collect_list: materializing a hot
    bucket's id array in one row is the exact pathology the guard
    exists to prevent.

    touched_by: optional signature table (e.g. a fold's delta) — audit
    only buckets whose band key appears in it. A delta fold can only
    drop delta-touched keys, so this is the exact audit for
    minhash_lsh_delta_pairs at O(|delta| x bucket-width) aggregate
    cost instead of a full-corpus band shuffle per maintenance call."""
    sig = signatures if signatures is not None else minhash_signatures(docs, text_col, k)
    rows = _band_rows(sig, k, band)
    if touched_by is not None:
        tkeys = (
            _band_rows(touched_by, k, band)
            .select("band_idx", "band_key")
            .distinct()
        )
        rows = rows.join(F.broadcast(tkeys), ["band_idx", "band_key"], "left_semi")
    return (
        rows.groupBy("band_idx", "band_key")
        .agg(
            F.count("*").alias("n_ids"),
            F.min("doc_id").alias("sample_id"),
        )
        .filter(F.col("n_ids") > max_bucket)
        # constant build-param columns: see simhash_hot_blocks
        .withColumn("built_max_bucket", F.lit(max_bucket))
        .withColumn("built_k", F.lit(k))
        .withColumn("built_band", F.lit(band))
    )


def minhash_calibration(
    docs: DataFrame | None = None,
    text_col: str = "text",
    k: int = N_MINHASH,
    band: int = BAND_SIZE,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Measure the detector instead of trusting it: for every LSH
    candidate pair, the minhash-ESTIMATED similarity (agreeing
    signature components / k) next to the EXACT shingle Jaccard — both
    exact-integer ppm, so the calibration table itself is
    hash-certifiable against the SQL oracle.

    Use it to pick thresholds empirically (est_e6 >= X vs true
    jaccard) and to quantify the k=8 estimator's error (err_e6) on
    YOUR corpus rather than quoting the 1/sqrt(k) folklore bound.

    Scale shape: the exact-Jaccard join is RESTRICTED to the LSH
    candidate pairs (left_semi before the per-pair count), so the
    expensive part is bounded by the detector's own output — never
    all-pairs. Output: (doc_a, doc_b, mh_agree, est_e6, jaccard_e6,
    err_e6).
    """
    sig = signatures if signatures is not None else minhash_signatures(docs, text_col, k)
    prs = minhash_lsh_pairs(signatures=sig, k=k, band=band)
    a = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(k)]
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(k)]
    )
    agree = None
    for i in range(k):
        t = F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    est = (
        prs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", agree.cast("int").alias("mh_agree"))
    )
    toks = shingles(docs, text_col) if docs is not None else None
    if toks is None:
        raise ValueError("minhash_calibration needs docs for the exact-Jaccard side")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        toks.select(F.col("doc_id").alias("doc_a"), "tok")
        .join(toks.select(F.col("doc_id").alias("doc_b"), "tok"), "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .join(prs, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("_sa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("_sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "mh_agree",
            F.expr(f"(mh_agree * 1000000L) div {k}").alias("est_e6"),
            F.expr(
                "(coalesce(inter, 0L) * 1000000L)"
                " div (_sa + _sb - coalesce(inter, 0L))"
            ).alias("jaccard_e6"),
            F.expr(
                f"abs((mh_agree * 1000000L) div {k}"
                " - (coalesce(inter, 0L) * 1000000L)"
                " div (_sa + _sb - coalesce(inter, 0L)))"
            ).alias("err_e6"),
        )
    )


def simhash(
    docs: DataFrame | None = None,
    text_col: str = "text",
    bits: int = 64,
    token_frame: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, simhash) — bit j is the sign of sum over distinct tokens
    of ±1 according to bit j of the token's hash stream. Hex digit >=
    '8' <=> high bit set (single lowercase hex chars compare like their
    value), so every bit source is a plain substring test that DuckDB
    reproduces bit-for-bit. One md5 yields 32 independent sign bits (one
    per hex digit's high bit); wider signatures chain seeded md5s
    (md5('1:'||tok), md5('2:'||tok), ...) — 64-bit is the Manku/web-scale
    default (the round-2 16-bit width stopped discriminating at corpus
    scale: 59% of all pairs fell within Hamming<=3).

    token_frame=: pass a precomputed (doc_id, tok) frame to hash any
    unit other than words (char n-grams, media payload grams, ...)."""
    if docs is None and token_frame is None:
        raise ValueError("pass docs or token_frame")
    t = token_frame if token_frame is not None else tokens(docs, text_col)
    n_hashes = (bits + 31) // 32
    t = t.withColumn("h0", F.md5(F.col("tok")))
    for s in range(1, n_hashes):
        t = t.withColumn(f"h{s}", F.md5(F.concat_ws(":", F.lit(str(s)), F.col("tok"))))
    sums = t.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.substring(F.col(f"h{j // 32}"), j % 32 + 1, 1) >= "8", 1
                ).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    bits_cols = [F.when(F.col(f"s{j}") >= 0, "1").otherwise("0") for j in range(bits)]
    return sums.select("doc_id", F.concat(*bits_cols).alias("simhash"))


def _sim_block_array(w: int, n_blocks: int):
    """array<struct<block_idx, block_val>> over the `simhash`
    bit-string column — the ONE definition of the Manku blocking key,
    shared by the pair query and the persisted hot-block index (drift
    between the two would make the guard anti-join silently no-op)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("block_idx"),
                F.substring("simhash", i * w + 1, w).alias("block_val"),
            )
            for i in range(n_blocks)
        ]
    )


def simhash_hot_blocks(
    signatures: DataFrame,
    max_bucket: int = 100_000,
    bits: int = 64,
    n_blocks: int = 4,
) -> DataFrame:
    """Over-cap (block_idx, block_val, n_ids) keys of a simhash
    signature table — the precomputable half of the
    simhash_near_dup_pairs hot-bucket guard. Pure function of the
    signature table: persist it next to the signatures at index-build
    time and pass it to every query via hot_blocks= so the guard stops
    re-aggregating the corpus per call."""
    w = bits // n_blocks
    return (
        signatures.select(F.explode(_sim_block_array(w, n_blocks)).alias("b"))
        .select("b.block_idx", "b.block_val")
        .groupBy("block_idx", "block_val")
        .agg(F.count("*").alias("n_ids"))
        .filter(F.col("n_ids") > max_bucket)
        # build parameters ride as constant columns so a persisted
        # artifact is auditable against the query it guards: callers
        # own passing one built with the same (bits, n_blocks) and a
        # cap <= the query's max_bucket (consumers select only the key
        # columns, so the extras cost nothing)
        .withColumn("built_max_bucket", F.lit(max_bucket))
        .withColumn("built_bits", F.lit(bits))
        .withColumn("built_n_blocks", F.lit(n_blocks))
    )


def simhash_near_dup_pairs(
    docs: DataFrame | None = None,
    max_hamming: int = 3,
    text_col: str = "text",
    bits: int = 64,
    n_blocks: int = 4,
    signatures: DataFrame | None = None,
    max_bucket: int | None = 100_000,
    observation=None,
    hot_blocks: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming,
    blocked the Manku/Charikar way: split the signature into n_blocks
    contiguous blocks — any pair within Hamming <= n_blocks-1 shares at
    least one identical (block_idx, block_value) by pigeonhole, so
    candidates form only INSIDE those buckets and the exact Hamming
    check prunes the rest. Defaults: 64-bit signatures in 4 blocks of
    16 bits — lossless for Hamming <= 3.

    Block width is the selectivity lever: 8-bit blocks have only 256
    values, so at any real corpus size every bucket saturates to ~N/256
    docs and the candidate set goes quadratic (measured at sf0.1: 8-bit
    blocks put 4161 of 5000 docs in ONE bucket -> 25.3M candidate
    pairs; 16-bit blocks -> 3.8M). Candidates come from a streamed
    self-join of the exploded block table — never a per-bucket
    collect_list: one hot bucket of B docs would otherwise materialize
    B^2 structs inside a single row, and AQE's skew split can't cut a
    row. The Hamming check XORs the signature halves as 32-bit ints
    (bit_count), not per-character compares.

    signatures=: pass a precomputed simhash() table (cached/parquet) to
    skip the token pipeline; the default recomputes from docs.

    Plan shape: the bit-string signature is packed ONCE per doc into
    <=32-bit words (longs) before the block explode, so the self-join
    payload is doc_id + a tiny long array, not 64-char strings; the
    Hamming filter (XOR + bit_count per word) runs BEFORE the distinct,
    so the dedup shuffle sees only the surviving near-dup pairs instead
    of every block-bucket candidate (candidates outnumber survivors by
    ~100x at sf0.1 — the distinct was the dominant exchange).

    max_bucket: degeneracy tripwire, not a recall knob. Healthy 16-bit
    blocks spread N docs over 65536 values (~N/65536 per bucket); a
    DEGENERATE block value — the all-zeros signature every empty doc
    hashes to — concentrates millions and makes that one join key do
    B² work that even AQE's skew split pays for. Block values whose
    bucket exceeds max_bucket are anti-joined out of BOTH sides (the
    over-cap key set is tiny and broadcasts); pairs inside a dropped
    bucket are near-identical by construction and belong to exact
    dedup, not the Hamming search. Set observation= (a
    pyspark.sql.Observation) for (hot_buckets, hot_bucket_docs)
    metrics with the action; None disables. Default 100k sits well
    above any healthy bucket at 10^10 docs.

    hot_blocks: precomputed over-cap key table (simhash_hot_blocks) —
    hot-key detection is a pure function of the signature table, so a
    cached-signature deployment computes it ONCE at index-build time
    and every query skips the per-call bucket-size aggregate (the
    measured +44% guard overhead on the cached path at sf0.1).
    Ignored when max_bucket is None."""
    if docs is None and signatures is None:
        raise ValueError("pass docs or signatures")
    assert max_hamming < n_blocks, "pigeonhole guarantee needs max_hamming < n_blocks"
    assert bits // n_blocks >= 1, (
        f"n_blocks={n_blocks} > bits={bits}: zero-width blocks bucket "
        "everything together (all-pairs join)"
    )
    w = bits // n_blocks
    sig = signatures if signatures is not None else simhash(docs, text_col, bits)
    if signatures is None:
        # recompute-from-docs path: the plan references sig three ways
        # (both self-join sides + the hot-key aggregate) and Spark would
        # run the whole token->md5->sign pipeline once per reference.
        # The signature frame is tiny (doc_id + bit-string) next to that
        # pipeline — truncate it once. Production passes signatures= and
        # skips this entirely.
        sig = sig.localCheckpoint(eager=False)
    word_spans = [(i * 32 + 1, min(32, bits - i * 32)) for i in range((bits + 31) // 32)]
    sig_words = F.array(
        *[
            F.conv(F.substring("simhash", pos, n), 2, 10).cast("long")
            for pos, n in word_spans
        ]
    )
    blocks = sig.select(
        "doc_id",
        sig_words.alias("sw"),
        F.explode(_sim_block_array(w, n_blocks)).alias("b"),
    ).select("doc_id", "sw", "b.block_idx", "b.block_val")
    if max_bucket is not None:
        if hot_blocks is not None:
            hot = hot_blocks.select(
                "block_idx",
                "block_val",
                F.coalesce(F.col("n_ids"), F.lit(0)).alias("n_ids"),
            )
        else:
            hot = (
                blocks.groupBy("block_idx", "block_val")
                .agg(F.count("*").alias("n_ids"))
                .filter(F.col("n_ids") > max_bucket)
            )
        if observation is not None:
            hot = hot.observe(
                observation,
                F.count("*").alias("hot_buckets"),
                F.coalesce(F.sum("n_ids"), F.lit(0)).alias("hot_bucket_docs"),
            )
        blocks = blocks.join(
            F.broadcast(hot.select("block_idx", "block_val")),
            ["block_idx", "block_val"],
            "left_anti",
        )
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = None
    for i in range(len(word_spans)):
        term = F.bit_count(F.col("a.sw")[i].bitwiseXOR(F.col("b.sw")[i]))
        ham = term if ham is None else ham + term
    return (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
        .distinct()  # a pair may share up to n_blocks equal blocks
    )


def doc_text(spans_col: str = "spans") -> F.Column:
    """Visible text of an interleaved document: the text-kind spans,
    space-joined in span order (offsets are strictly increasing by
    construction, schemas.py:17-19). Title/meta/jsonld spans are
    structure, not prose — they go through the entity pipeline, not the
    dedup index."""
    return F.concat_ws(
        " ",
        F.transform(
            F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
    )


def document_signatures(docs: DataFrame, k: int = N_MINHASH, bits: int = 64) -> DataFrame:
    """Per-document dedup signatures for the engine's incremental index:
    (doc_id, site, round, mh0..mh{k-1}, simhash) from the text-kind
    spans. One row per INPUT doc — docs too short for a signature
    (< 3 words for minhash, zero tokens for simhash) keep NULL columns
    so the index row-count always equals the corpus row-count and
    consumers can see (and count) the unsignable tail instead of
    silently losing it.

    The engine appends this frame once per round over that round's NEW
    docs only (exactly-once by the seen anti-join), so the union of the
    per-round deltas is bit-identical to a batch recompute over the
    whole documents table — pinned by test_dedup_index."""
    base = docs.select(
        "doc_id", "site", F.col("fetched_round").alias("round"), doc_text().alias("text")
    )
    mh = minhash_signatures(base, "text", k)
    sim = simhash(base, "text", bits)
    return (
        base.drop("text")
        .join(mh, "doc_id", "left")
        .join(sim, "doc_id", "left")
    )


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int = 500,
    stop_list: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs via inverted-index join.

    (doc,shingle) postings self-join gives per-pair intersection sizes
    in one shuffle; shingles with document frequency > max_df are
    dropped first (stop-shingle guard — they contribute little to
    Jaccard but quadratic join volume).

    stop_list: an explicit stop-shingle table (a `tok` column —
    typically stop_shingles()'s output) REPLACES the max_df pass. The
    df pass here is a groupBy over the whole shingle vocabulary; at
    10^9+ docs precompute the heavy shingles with bounded-state
    stop_shingles and pass them in — the guard becomes one broadcast
    anti-join and the vocabulary never shuffles.
    """
    # the postings frame is referenced up to five ways (df guard, size
    # agg, both join sides); truncate the (doc_id, tok) frame once
    # instead of re-shingling the corpus per reference
    t = shingles(docs, text_col).localCheckpoint(eager=False)
    if stop_list is not None:
        t = t.join(F.broadcast(stop_list.select("tok")), "tok", "left_anti")
    else:
        df_cap = (
            t.groupBy("tok").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
        )
        t = t.join(df_cap.select("tok"), "tok")
    sizes = t.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = t.alias("a"), t.alias("b")
    inter = (
        a.join(b, "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def stop_shingles(
    docs: DataFrame, phi_e6: int = 1_000, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Share-heavy shingles (>= phi_e6 ppm of all distinct-per-doc
    shingle occurrences) with EXACT counts — the explicit stop-list for
    jaccard_pairs(stop_list=) / mirror guards.

    Why not jaccard_pairs' own df pass: that pass is groupBy over the
    ENTIRE shingle vocabulary — at 10^9+ docs it shuffles billions of
    distinct shingles to find the few thousand heavy ones. This runs
    sketches.heavy_hitters over the shingle arrays instead: bounded
    per-task Misra-Gries state, candidate set O(1/phi) at any corpus
    size, one exact verify pass. The quadratic-blowup shingles (df^2
    join volume) are by definition share-heavy, so a ppm threshold
    catches exactly the ones the guard exists for."""
    from crawler_spark.operators.sketches import heavy_hitters

    base = docs.select(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("w")
    ).filter(F.size("w") >= n)
    arr = F.col("w")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(arr, i + j) for j in range(n)]),
        )
    )
    return heavy_hitters(
        base.select(sh.alias("sh")), phi_e6=phi_e6, tokens_arr_col="sh"
    )


def char_ngrams(docs: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """(doc_id, gram) distinct character n-gram shingles (JVM-side:
    sequence + transform + substring, no UDF)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - n + 1, F.lit(1))),
            lambda i: norm.substr(i, F.lit(n)),
        )
    )
    return docs.select("doc_id", F.explode(grams).alias("gram")).filter(
        F.length("gram") == n
    )


# --- winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
# --- MOSS local fingerprinting scheme): hash every k-char gram of the
# --- normalized text, then keep, for each window of w consecutive gram
# --- hashes, the RIGHTMOST minimal hash. Guarantees: any shared substring
# --- of length >= k + w - 1 produces at least one shared fingerprint
# --- (detection), and at most 2/(w+1) of positions are kept (density).
# --- All JVM-side array ops; md5-hex compares like the number it encodes,
# --- so the same construction runs verbatim in the DuckDB oracle.

POS_BASE = 1_000_000_000  # lexicographic trick: key = hash || (BASE - pos)


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    max_len: int = 8192,
) -> DataFrame:
    """(doc_id, pos, fp) selected winnowing fingerprints.

    Normalization: lower + collapse whitespace + truncate to max_len
    (bounds per-row array memory; production callers chunk longer docs).
    Selection key for window j is min over i in [j, j+w-1] of
    md5(gram_i) || zeropad(POS_BASE - i): the suffix makes ties pick the
    RIGHTMOST minimal hash (standard winnowing), and one array_min per
    window does it without a UDF. Docs shorter than k+w-1 normalized
    chars are dropped (too short to own a full window; mirrored in SQL).
    """
    norm = F.substring(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), 1, max_len
    )
    base = docs.select("doc_id", norm.alias("s")).filter(
        F.length("s") >= k + w - 1
    )
    keys = F.transform(
        F.sequence(F.lit(1), F.length("s") - F.lit(k - 1)),
        lambda i: F.concat(
            F.md5(F.substring(F.col("s"), i, F.lit(k))),
            F.lpad((F.lit(POS_BASE) - i).cast("string"), 10, "0"),
        ),
    )
    with_keys = base.select("doc_id", keys.alias("ks"))
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("ks") - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(F.col("ks"), j, w)),
        )
    )
    return (
        with_keys.select("doc_id", F.explode(sel).alias("key"))
        .select(
            "doc_id",
            (F.lit(POS_BASE) - F.substring("key", 33, 10).cast("long")).alias("pos"),
            F.substring("key", 1, 32).alias("fp"),
        )
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
    text_col: str = "text",
    max_len: int = 8192,
) -> DataFrame:
    """(doc_a, doc_b, shared) pairs sharing >= min_shared distinct
    fingerprint hashes — substring-level overlap detection (plagiarism /
    boilerplate), complementary to set-similarity (jaccard/minhash).
    Inverted-index join on fp with the same stop-fp document-frequency
    guard as jaccard_pairs: hot fingerprints (shared boilerplate in more
    than max_df docs) are dropped before the self-join."""
    fp = (
        winnow_fingerprints(docs, k, w, text_col, max_len)
        .select("doc_id", "fp")
        .distinct()
        # referenced three ways (df guard + both join sides); truncate
        # the small (doc_id, fp) frame once instead of re-running the
        # per-position md5 winnowing pipeline per reference
        .localCheckpoint(eager=False)
    )
    keep = fp.groupBy("fp").agg(F.count("*").alias("df")).filter(
        F.col("df") <= max_df
    )
    fp = fp.join(keep.select("fp"), "fp")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def line_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide line-level dedup (the CCNet / RefinedWeb pass that
    strips boilerplate headers, nav bars and cookie banners repeated
    across pages): every distinct LINE is kept only at its first global
    occurrence — ordered by (doc_id, position) — and removed everywhere
    else; each document is reassembled from its surviving lines in
    original order.

    Returns (doc_id, text_dedup, n_lines_kept, n_lines); documents whose
    every line occurred earlier elsewhere come back with empty text (the
    caller drops or flags them).

    Scale shape: three exchanges, all key-parallel — row_number per line
    (the dedup itself; equivalent to a groupBy on the line), a groupBy on
    doc_id to reassemble, and the hash join back to the corpus. No
    all-pairs anything; hot lines (the same cookie banner a billion
    times) are a single window partition of which only rank 1 survives —
    skew-safe because row_number short-circuits via WindowGroupLimit's
    rank-limit pushdown when filtered to rn = 1.
    """
    from pyspark.sql import Window

    lines = docs.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    )
    w = Window.partitionBy("line").orderBy(id_col, "pos")
    kept = (
        lines.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_dedup"),
        F.count("*").alias("n_lines_kept"),
    )
    return (
        docs.select(
            F.col(id_col), F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines")
        )
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            "n_lines",
        )
    )


def contamination_check(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark-contamination scan: flag training documents that share
    word n-grams with an evaluation/benchmark set (the public GPT-3 /
    Lee et al. decontamination recipe — 8-gram overlap by default).

    Returns (doc_id, n_shared_ngrams, contaminated) for every corpus
    doc with at least one shared n-gram; n_shared_ngrams counts
    DISTINCT shared grams (shingles() already dedups per doc).

    Scale shape: benchmarks are tiny next to a 100 TB corpus, so the
    eval side's distinct gram set BROADCASTS; the corpus side explodes
    its grams map-side and hash-joins against the broadcast with no
    corpus shuffle — the only exchange is the final per-doc count agg
    (keyed by doc_id, pre-aggregated map-side). Never joins corpus
    against corpus.
    """
    eval_grams = shingles(eval_docs, text_col, n).select("tok").distinct()
    hits = shingles(docs, text_col, n).join(F.broadcast(eval_grams), "tok")
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
        .select(
            "doc_id",
            "n_shared_ngrams",
            (F.col("n_shared_ngrams") >= min_overlap).alias("contaminated"),
        )
    )


def cdc_chunks(
    docs: DataFrame,
    w: int = 16,
    mod: int = 64,
    text_col: str = "text",
    max_len: int = 8192,
) -> DataFrame:
    """Content-defined chunking: split each document at positions where
    a local w-gram hash satisfies hash % mod == 0 (expected chunk size
    ~= mod chars), fingerprint each chunk — the storage-dedup primitive
    (LBFS/rsync lineage) applied to text: because every boundary is a
    pure function of the w characters ending at it, inserting or
    deleting a prefix shifts the TEXT but not the boundaries' content
    positions, so all chunks outside the edit region keep their hashes
    (shift-resistant, unlike fixed-size blocks). Chunk-level dedup then
    finds shared SPANS (boilerplate, quoted blocks, mirrored sections)
    that document-level exact/minhash dedup cannot isolate.

    Output: (doc_id, chunk_idx, chunk_pos, chunk_len, chunk_hash) —
    chunk_idx 1-based in document order, chunk_pos the 1-based start
    offset in the normalized text.

    Implementation: the per-position gram hash reuses the winnowing
    substring+md5 idiom (one md5 per position, JVM-side, certifiable in
    SQL); production at 100 TB swaps in a Gear/Rabin rolling hash over
    bytes via a batched pandas_udf if the md5-per-position CPU cost
    bites — the boundary SEMANTICS (local-window content hash mod
    divisor) and everything downstream stay identical. max_len bounds
    per-row array memory exactly as winnow_fingerprints does. Scale
    shape: pure per-row array expressions + one explode — ZERO
    exchanges; dedup adds one groupBy(chunk_hash).

    No reference counterpart (the reference dedups whole pages by URL,
    crawler.py:92-104); this serves the chunk-dedup stage of a
    training-data pipeline.
    """
    norm = F.substring(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), 1, max_len
    )
    base = docs.select("doc_id", norm.alias("s")).filter(F.length("s") > 0)
    # cut AFTER position i (i >= w) when the w-gram ending at i hashes
    # to 0 mod `mod`; md5_bucket idiom: first 8 md5 hex chars as int
    cuts = F.filter(
        F.sequence(F.lit(w), F.length("s")),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(F.col("s"), i - F.lit(w - 1), F.lit(w))), 1, 8),
            16,
            10,
        ).cast("long")
        % mod
        == 0,
    )
    # bounds = [0, cut..., len] with a trailing duplicate dropped when
    # the last cut already equals len
    bounds = F.concat(
        F.array(F.lit(0)),
        cuts,
        F.when(
            # try_element_at: NULL (not an error) on the empty cut list
            F.coalesce(F.try_element_at(cuts, F.lit(-1)), F.lit(-1)) == F.length("s"),
            F.array().cast("array<int>"),
        ).otherwise(F.array(F.length("s"))),
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(bounds) - F.lit(1)),
        lambda j: F.struct(
            j.cast("long").alias("chunk_idx"),
            (F.element_at(bounds, j) + F.lit(1)).cast("long").alias("chunk_pos"),
            (F.element_at(bounds, j + F.lit(1)) - F.element_at(bounds, j))
            .cast("long")
            .alias("chunk_len"),
            F.md5(
                F.substring(
                    F.col("s"),
                    F.element_at(bounds, j) + F.lit(1),
                    F.element_at(bounds, j + F.lit(1)) - F.element_at(bounds, j),
                )
            ).alias("chunk_hash"),
        ),
    )
    return base.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_idx", "c.chunk_pos", "c.chunk_len", "c.chunk_hash"
    )


def cdc_dup_chunks(
    docs: DataFrame,
    w: int = 16,
    mod: int = 64,
    text_col: str = "text",
    max_len: int = 8192,
    min_chunk_len: int = 24,
) -> DataFrame:
    """Chunks whose content recurs across the corpus: group cdc_chunks
    by hash, keep hashes seen more than once with at least
    min_chunk_len chars (tiny chunks collide on common phrases and are
    not worth deduplicating). Output: (chunk_hash, chunk_len, n_docs,
    n_occurrences, dup_chars) with dup_chars = chars saved if all
    copies but one were dropped. ONE exchange (groupBy chunk_hash)."""
    ch = cdc_chunks(docs, w=w, mod=mod, text_col=text_col, max_len=max_len).filter(
        F.col("chunk_len") >= min_chunk_len
    )
    return (
        ch.groupBy("chunk_hash", "chunk_len")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") > 1)
        .withColumn(
            "dup_chars", (F.col("n_occurrences") - 1) * F.col("chunk_len")
        )
    )


def _gear_table() -> "object":
    """Fixed 256-entry uint64 Gear table, seeded deterministically
    (splitmix64 over the index) so every executor and every run agrees."""
    import numpy as np

    idx = np.arange(256, dtype=np.uint64)
    z = (idx + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def cdc_chunks_gear(
    docs: DataFrame,
    w: int = 16,
    mod: int = 64,
    text_col: str = "text",
    max_len: int = 8192,
) -> DataFrame:
    """The production CDC chunker: identical contract and output schema
    to cdc_chunks, but boundaries come from a vectorized Gear rolling
    hash (LBFS/FastCDC lineage) instead of md5-per-position.

    Why two impls: the md5 formulation is certifiable against the SQL
    oracle but pays one interpreted md5 per character (higher-order
    array lambdas break whole-stage codegen); Gear is a 64-tap
    shifted-sum over a fixed byte table — h_t = sum_{j<64}
    table[c_{t-j}] << j (mod 2^64) — computed here as 64 whole-array
    numpy adds per document inside an Arrow-batched mapInPandas:
    O(64·n) vector ops, ~100x less per-char work. Boundary positions
    differ between the impls (different hash function — immaterial to
    CDC semantics); the tiling / shift-resistance / expected-chunk-size
    properties are pinned for BOTH in tests, and the certified md5
    path stays the oracle twin.

    Positions are in CHARACTERS (the text is mapped to one table index
    per code point, so multi-byte scripts chunk identically to the md5
    path's character arithmetic); only positions >= w are boundary
    candidates, mirroring cdc_chunks' warm-up region.
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("chunk_idx", T.LongType()),
            T.StructField("chunk_pos", T.LongType()),
            T.StructField("chunk_len", T.LongType()),
            T.StructField("chunk_hash", T.StringType()),
        ]
    )
    ws = _re.compile(r"\s+")
    table = _gear_table()
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)

    def chunk_batches(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "chunk_idx", "chunk_pos", "chunk_len", "chunk_hash")}
            for doc_id, text in zip(pdf["doc_id"].to_numpy(), pdf[text_col]):
                if text is None:
                    continue
                s = ws.sub(" ", text.strip().lower())[:max_len]
                n = len(s)
                if n == 0:
                    continue
                codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
                v = table[codes & np.uint32(0xFF)]
                acc = np.zeros(n, dtype=np.uint64)
                for j in range(min(64, n)):
                    acc[j:] = (acc[j:] + (v[: n - j] << np.uint64(j))) & mask
                # 1-based positions; warm-up region < w never cuts
                cut_mask = acc % np.uint64(mod) == 0
                cut_mask[: w - 1] = False
                cuts = np.flatnonzero(cut_mask) + 1
                bounds = [0] + [int(c) for c in cuts]
                if bounds[-1] != n:
                    bounds.append(n)
                for idx in range(1, len(bounds)):
                    lo, hi = bounds[idx - 1], bounds[idx]
                    out["doc_id"].append(int(doc_id))
                    out["chunk_idx"].append(idx)
                    out["chunk_pos"].append(lo + 1)
                    out["chunk_len"].append(hi - lo)
                    out["chunk_hash"].append(
                        hashlib.md5(s[lo:hi].encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return docs.select("doc_id", text_col).mapInPandas(chunk_batches, out_schema)


def _pos_words(text_col: str) -> F.Column:
    """Positional token array: lowercase, whitespace-split, blanks out.
    MUST match the DuckDB twin list_filter(string_split_regex(...))."""
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def exact_substr_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499 —
    their ExactSubstr at k-token granularity, suffix-array-free).

    A token position is duplicated when its k-gram occurs >= min_count
    times corpus-wide; maximal runs of duplicated positions (gap <= k
    merges) become spans. Output (doc_id, span_start, span_end,
    n_tokens), positions 0-based over the normalized token stream.

    Scale shape: grams are computed per doc as ONE JVM array transform
    (no per-row Python), then exploded into the single shuffle this
    problem needs — the groupBy(gram) count, a partial-agg with uniform
    md5 keys (the suffix array's global sort, re-expressed as an
    aggregation). The join back is an equi-join on gram; hot grams
    (boilerplate) are genuine duplicates, not skew noise, and AQE
    splits them. Span merging is one window over doc_id.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), _pos_words(text_col).alias("_w")
    ).filter(F.size("_w") >= k)
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_w") - k),
                lambda j: F.md5(F.concat_ws(" ", F.slice("_w", j + 1, k))),
            )
        ).alias("pos", "gram"),
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram")
    )
    dup = grams.join(dup_grams, "gram").select("doc_id", "pos")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        dup.withColumn(
            "_brk",
            F.when(F.col("pos") - F.lag("pos").over(w) <= k, 0).otherwise(1),
        )
        .withColumn(
            "_island",
            F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        isl.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k - 1).cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def exact_substr_strip(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Remove every exact-substring duplicate span from each document.

    Output (doc_id, clean_text, n_removed) for EVERY input doc;
    clean_text is the normalized token stream minus covered positions
    (the standard form dedup pipelines feed the tokenizer). Pass a
    persisted exact_substr_spans result via `spans` to split the two
    corpus passes across jobs at scale; the rejoin is one co-keyed
    shuffle on doc_id and the coverage test is a per-doc JVM array
    lambda — span lists are tiny relative to documents.
    """
    sp = spans if spans is not None else exact_substr_spans(
        docs, k, min_count, text_col, id_col
    )
    sp_by_doc = sp.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), _pos_words(text_col).alias("_w")
    )
    joined = base.join(sp_by_doc, "doc_id", "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array())
    )
    kept = F.filter(
        F.col("_w"),
        lambda x, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size("_w") - F.size(kept)).cast("long").alias("n_removed"),
    )


def mirror_pairs(
    docs: DataFrame,
    site_col: str = "source",
    text_col: str = "text",
    min_overlap_e6: int = 400_000,
    max_sites_per_fp: int | None = None,
) -> DataFrame:
    """Mirror-site detection (Bharat & Broder, WWW'99 lineage): site
    pairs whose document-fingerprint sets overlap heavily. overlap_e6 =
    floor(1e6 * |shared fps| / min(|fps_a|, |fps_b|)) — the containment
    coefficient in exact int64, so a full mirror of a subset still
    scores 1e6 against its source.

    Scale shape: ONE shuffle keys distinct (site, fp); pairs form only
    through the fp equi-join, so work is sum over fps of
    |sites(fp)|^2 — bounded by max_sites_per_fp when set (the
    boilerplate guard: a fingerprint shared by more than that many
    sites is navigation chrome, not mirrored content, and is dropped
    exactly like jaccard_pairs' stop-shingles). Site sizes broadcast.
    """
    fp = docs.select(
        F.col(site_col).alias("site"), F.md5(F.col(text_col)).alias("fp")
    ).distinct()
    if max_sites_per_fp is not None:
        keep = (
            fp.groupBy("fp")
            .agg(F.count("*").alias("_ns"))
            .filter(F.col("_ns") <= max_sites_per_fp)
            .select("fp")
        )
        fp = fp.join(keep, "fp")
    sz = fp.groupBy("site").agg(F.count("*").alias("n_fp"))
    a = fp.select(F.col("site").alias("site_a"), "fp")
    b = fp.select(F.col("site").alias("site_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("site_a") < F.col("site_b"))
        .groupBy("site_a", "site_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(
            F.broadcast(sz.select(F.col("site").alias("site_a"), F.col("n_fp").alias("_na"))),
            "site_a",
        )
        .join(
            F.broadcast(sz.select(F.col("site").alias("site_b"), F.col("n_fp").alias("_nb"))),
            "site_b",
        )
        .withColumn(
            "overlap_e6",
            F.expr("(1000000 * shared) div least(_na, _nb)").cast("long"),
        )
        .filter(F.col("overlap_e6") >= min_overlap_e6)
        .select("site_a", "site_b", "shared", "overlap_e6")
    )
