"""Bounded-memory frequency sketches: exact heavy hitters at any scale.

Training-data pipelines need the corpus vocabulary head (stop-token
guards, tokenizer seeding, boilerplate/template detection, the max_df
stop-shingle lists used by textdedup.jaccard_pairs / mirror_pairs) —
but a plain `groupBy(tok)` shuffles the ENTIRE vocabulary: at 100 TB
that exchange carries billions of distinct keys just to keep the few
thousand heavy ones. The reference crawler aggregates per-corpus stats
in pandas on one node (reference `code/app.py` status/summary paths);
this is the Spark-first, bounded-state replacement.

`heavy_hitters` is the classic TWO-PASS EXACT algorithm (Misra-Gries
'82 candidates + exact verification — the MapReduce-era standard for
exact phi-heavy-hitters):

  pass 1 (candidates, bounded memory, NO vocabulary shuffle):
    each partition streams its token occurrences through a Misra-Gries
    summary with capacity m = ceil(2e6/phi_e6) (an Arrow-batched
    mapInPandas keeping a dict of at most m counters; each batch is
    pre-reduced with a vectorized value_counts before touching the
    dict). The MG invariant: a token with partition count >= n_p/(m+1)
    survives, and its kept weight w_p >= count_p - n_p/(m+1).
    The per-partition summaries (<= m rows each) are summed by token —
    an exchange of at most m*P tiny rows, NOT the vocabulary — and
    pruned with the standard mergeable-summaries bound
    (Agarwal et al., PODS'12):
        sum_p w_p  >=  C_t - N/(m+1)
    so every token with true count C_t >= thr := ceil(phi_e6*N/1e6)
    keeps sum_w >= thr - floor(N/(m+1)) and SURVIVES the prune
    (m >= 2/phi makes the slack <= phi*N/2, so at most ~2e6/phi_e6
    candidates survive — a bounded broadcast list at any corpus size).
  pass 2 (exact, candidate-bounded shuffle):
    one more corpus scan counts ONLY the broadcast candidates
    (map-side partial agg reduces each partition to <= |candidates|
    rows) and keeps cnt*1e6 >= phi_e6*N — the EXACT answer, so the
    result is hash-certifiable against the one-line SQL
    `GROUP BY tok HAVING cnt*1e6 >= phi_e6 * total`.

The threshold is the integer phi_e6 (parts-per-million of the total
token count): all comparisons are int64/int128-safe products, no
floats anywhere, so Spark and DuckDB agree bit-for-bit.

Scale notes (the part that must survive 100 TB):
- pass-1 state is O(m) per task regardless of partition size; the
  summary exchange is O(m*P) rows (m ~ 2e6/phi_e6, P = task count);
- the candidate list is O(1/phi) rows independent of corpus size —
  always broadcastable;
- pass 2 is one scan + one exchange bounded by |candidates| keys;
- the corpus is never self-joined, the full vocabulary never shuffles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("tok", T.StringType(), False),
        T.StructField("w", T.LongType(), False),
    ]
)

_SUMMARY_BY_SCHEMA = T.StructType(
    [
        T.StructField("stratum", T.StringType(), False),
        T.StructField("tok", T.StringType(), False),
        T.StructField("w", T.LongType(), False),
    ]
)


def _mg_partition(m: int):
    """Misra-Gries over a partition's token-array stream.

    Returns a mapInPandas function: keeps at most m counters; on
    overflow subtracts the (m+1)-th largest weight from all and drops
    the non-positive (the batched equivalent of m+1 simultaneous
    decrements — weights stay lower bounds with total slack
    <= n_p/(m+1))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            # vectorized pre-reduce: exact within-batch counts
            vc = pdf["toks"].explode().dropna().value_counts()
            for tok, c in vc.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > m:
                # subtract the (m+1)-th largest weight; keep positives.
                # Every removed unit is matched by removals from >= m
                # other counters, preserving the MG decrement bound.
                cut = sorted(counters.values(), reverse=True)[m]
                counters = {t: w - cut for t, w in counters.items() if w > cut}
        if counters:
            yield pd.DataFrame(
                {"tok": list(counters.keys()), "w": list(counters.values())}
            )

    return run


def token_occurrences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tok) with MULTIPLICITY — one row per token occurrence
    (textdedup.tokens is the distinct-per-doc variant). Tokenizer is
    the shared whitespace/lowercase convention."""
    return docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )


def heavy_hitters(
    docs: DataFrame,
    phi_e6: int = 5_000,
    text_col: str = "text",
    capacity: int | None = None,
    tokens_arr_col: str | None = None,
) -> DataFrame:
    """EXACT phi-heavy hitters: every token whose occurrence count is
    >= phi_e6/1e6 of the corpus total, with its exact count.

    phi_e6 is parts-per-million (5_000 = 0.5%). `capacity` overrides
    the per-task Misra-Gries size m (default ceil(2e6/phi_e6), the
    smallest m whose merge slack N/(m+1) <= phi*N/2).

    tokens_arr_col switches the counting unit: name an existing
    array<string> column (shingles, BPE pieces, hosts-per-doc — any
    unit) and text_col is ignored. textdedup.stop_shingles uses this
    to derive explicit stop-shingle lists for the jaccard/mirror
    max_df guards.

    Output: (tok, cnt, total_tokens) — cnt exact, ordered-by nothing
    (callers sort); total_tokens on every row so downstream ratios
    (df/N guards, stop-lists) need no second pass.
    """
    if phi_e6 <= 0:
        raise ValueError("phi_e6 must be a positive parts-per-million integer")
    min_m = -(-1_000_000 // phi_e6)  # MG survival needs m+1 >= 1/phi
    m = capacity if capacity is not None else 2 * min_m
    if m < min_m:
        raise ValueError(
            f"capacity {m} < ceil(1/phi) = {min_m}: a phi-heavy token is only "
            "guaranteed to survive a partition summary when its local share "
            "phi exceeds the decrement bound 1/(m+1) — smaller capacities can "
            "silently drop true heavy hitters"
        )

    unit = (
        F.col(tokens_arr_col)
        if tokens_arr_col is not None
        else F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
        )
    )
    toks_arr = docs.select(unit.alias("toks"))

    # total token count: partial-agg only (no explode shuffle)
    n_total = toks_arr.select(
        F.coalesce(F.sum(F.size("toks")), F.lit(0)).cast("long")
    ).first()[0]
    spark = docs.sparkSession
    out_schema = "tok string, cnt long, total_tokens long"
    if n_total == 0:
        return spark.createDataFrame([], out_schema)
    thr = -(-(phi_e6 * n_total) // 1_000_000)  # ceil(phi*N)
    slack = n_total // (m + 1)

    # ---- pass 1: bounded per-task summaries -> candidate prune ------
    summaries = toks_arr.mapInPandas(_mg_partition(m), schema=_SUMMARY_SCHEMA)
    candidates = (
        summaries.groupBy("tok")
        .agg(F.sum("w").alias("sum_w"))
        .filter(F.col("sum_w") >= F.lit(thr - slack))
        .select("tok")
    )

    # ---- pass 2: exact verification of the bounded candidate set ----
    exact = (
        docs.select(F.explode(unit).alias("tok"))
        .join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(
            # lits are int32-typed when the VALUE fits; the product is
            # what overflows (phi_e6 * N past 2^31) — force long math
            F.col("cnt") * F.lit(1_000_000).cast("long")
            >= F.lit(phi_e6).cast("long") * F.lit(n_total).cast("long")
        )
    )
    return exact.select("tok", "cnt", F.lit(n_total).cast("long").alias("total_tokens"))


def _mg_partition_by(m: int):
    """Per-STRATUM Misra-Gries over (stratum, token-array) rows: one
    independent capacity-m summary per stratum per task (state is
    m x |strata| counters — strata are languages/sources, dozens not
    millions). The survival bound holds per stratum by the same
    averaging argument, so the merged per-stratum summaries are a
    candidate superset for every stratum's own threshold."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        per: dict = {}  # stratum -> {tok: w}
        for pdf in batches:
            if pdf.empty:
                continue
            ex = (
                pdf.rename(columns={"toks": "tok"})
                .explode("tok")
                .dropna(subset=["tok"])
                .groupby(["stratum", "tok"])
                .size()
            )
            for (s, tok), c in ex.items():
                counters = per.setdefault(s, {})
                counters[tok] = counters.get(tok, 0) + int(c)
                if len(counters) > m:
                    cut = sorted(counters.values(), reverse=True)[m]
                    per[s] = {t: w - cut for t, w in counters.items() if w > cut}
        rows = [
            (s, t, w) for s, counters in per.items() for t, w in counters.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["stratum", "tok", "w"])

    return run


def heavy_hitters_by(
    docs: DataFrame,
    by_col: str,
    phi_e6: int = 5_000,
    text_col: str = "text",
    capacity: int | None = None,
    tokens_arr_col: str | None = None,
) -> DataFrame:
    """Per-stratum EXACT phi-heavy hitters: for each value of `by_col`
    (language, source, host...), every token whose count within that
    stratum is >= phi_e6 ppm of the STRATUM's token total — the
    per-language stop-list / vocabulary-head primitive (CCNet-style
    pipelines gate per language, not per corpus).

    Same two-pass shape as heavy_hitters with every stage keyed by
    stratum: per-task MG summaries (m counters per stratum), merge +
    prune against per-stratum totals (a JOIN against the tiny totals
    aggregate — nothing per-stratum is collected), then one exact
    verify pass over the broadcast (stratum, tok) candidates. The
    vocabulary never shuffles; candidates are O(1/phi) per stratum.

    Output: (stratum, tok, cnt, total_tokens) — cnt exact within the
    stratum, total_tokens = that stratum's token total.
    """
    if phi_e6 <= 0:
        raise ValueError("phi_e6 must be a positive parts-per-million integer")
    min_m = -(-1_000_000 // phi_e6)  # MG survival needs m+1 >= 1/phi
    m = capacity if capacity is not None else 2 * min_m
    if m < min_m:
        raise ValueError(
            f"capacity {m} < ceil(1/phi) = {min_m}: a phi-heavy token is only "
            "guaranteed to survive a partition summary when its local share "
            "phi exceeds the decrement bound 1/(m+1) — smaller capacities can "
            "silently drop true heavy hitters"
        )

    unit = (
        F.col(tokens_arr_col)
        if tokens_arr_col is not None
        else F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
        )
    )
    base = docs.select(F.col(by_col).alias("stratum"), unit.alias("toks"))

    # per-stratum totals: partial-agg only, |strata| rows — joined, not
    # collected, so a high-cardinality by_col still distributes
    totals = base.groupBy("stratum").agg(
        F.coalesce(F.sum(F.size("toks")), F.lit(0)).cast("long").alias("n_total")
    )

    summaries = base.mapInPandas(_mg_partition_by(m), schema=_SUMMARY_BY_SCHEMA)
    # ceil(phi*N) and the merge slack in pure int64 `div` arithmetic —
    # a double-precision floor(x/1e6) loses exactness once phi_e6*N
    # passes 2^53, which real corpus sizes reach (5e3 ppm × 2e12 tokens)
    thr = F.expr(f"({phi_e6}L * n_total + 999999L) div 1000000L")
    candidates = (
        summaries.groupBy("stratum", "tok")
        .agg(F.sum("w").alias("sum_w"))
        .join(F.broadcast(totals), "stratum")
        .filter(F.col("sum_w") >= thr - F.expr(f"n_total div {m + 1}L"))
        .select("stratum", "tok")
    )

    exact = (
        base.select("stratum", F.explode("toks").alias("tok"))
        .join(F.broadcast(candidates), ["stratum", "tok"], "left_semi")
        .groupBy("stratum", "tok")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(totals), "stratum")
        .filter(
            F.col("cnt") * F.lit(1_000_000).cast("long")
            >= F.lit(phi_e6).cast("long") * F.col("n_total")
        )
    )
    return exact.select(
        "stratum", "tok", "cnt", F.col("n_total").alias("total_tokens")
    )
