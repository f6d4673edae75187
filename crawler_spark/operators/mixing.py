"""Training-data mixture construction: temperature-based stratum
weights and token-budget corpus selection.

The reference crawls one site at a time and uploads everything it
fetches (crawler.py:1040-1120 — no notion of corpus composition); a
100 TB training-data pipeline must decide HOW MUCH of each stratum
(language, source, domain) goes into the final mix. Two standard
public recipes, both expressed as exact-integer DataFrame plans:

- **Temperature sampling** (multilingual BERT / XLM / mT5 style):
  stratum share q_i proportional to p_i^alpha where p_i is the
  stratum's token fraction — alpha < 1 up-weights the tail so small
  languages are not drowned by the head.
- **Token-budget selection**: split a global token budget across
  strata by those shares, then take documents per stratum in a
  deterministic order until each stratum's budget is spent (a greedy
  knapsack; with a quality ordering this is quality-first selection).

Scale shape: one groupBy(stratum) for the weights (strata are few:
languages x sources — the aggregate output is tiny and the partial
aggregation is map-side), one broadcast of the per-stratum budget
row set, and one window shuffle partitioned BY STRATUM for the
running token sum. Nothing else moves; the corpus never self-joins.

Exactness: alpha = 1/2 (the common default) is computed in integer
arithmetic — weight_i = floor(sqrt(tokens_i * scale)) — because IEEE
sqrt is correctly rounded, so floor(sqrt(bigint)) is deterministic
and identical across engines; shares and budgets are then single
divisions / integer floor-divisions of exact int64 sums. That makes
every output value hash-certifiable against a SQL oracle. Arbitrary
alpha uses float pow (exact=False), documented as non-certified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.text import md5_bucket, ws_token_count

#: fixed-point scale for integer sqrt weights: sqrt(tokens * SCALE)
#: keeps ~3 significant digits for single-token strata while
#: tokens * SCALE stays far below 2^53 (exact in the double sqrt)
#: for any real stratum (10^12 tokens * 10^6 = 10^18 < 2^63, and the
#: sqrt argument is exact up to 2^53 — above that the weight loses
#: low-bit precision but stays deterministic, which is what the
#: certification needs).
WEIGHT_SCALE = 1_000_000


def mixture_weights(
    docs: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.5,
    exact: bool = True,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-stratum temperature mixture weights.

    Returns one row per stratum: `stratum, n_docs, tokens, p, weight,
    share` where p = tokens/total (the natural share), weight is the
    alpha-tempered integer weight and share = weight/total_weight (the
    sampled share). alpha=0.5 + exact=True is the certified integer
    path (see module docstring); any other alpha requires exact=False
    and computes pow(p, alpha) in floats.

    `tokens_col` uses a precomputed token count column instead of
    whitespace-tokenizing `text_col` (production: real tokenizer
    counts land in the table once, weights stay a pure aggregate).
    """
    if exact and alpha != 0.5:
        raise ValueError("exact integer weights require alpha=0.5; "
                         "pass exact=False for arbitrary alpha")
    tok = F.col(tokens_col) if tokens_col else ws_token_count(F.col(text_col))
    per = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).alias("tokens"),
    )
    if exact:
        weight = F.floor(F.sqrt(F.col("tokens") * F.lit(WEIGHT_SCALE))).cast("long")
    else:
        weight = F.pow(F.col("tokens").cast("double"), F.lit(float(alpha)))
    per = per.withColumn("weight", weight)
    # totals as an empty-frame window over the ALREADY-AGGREGATED rows,
    # NOT crossJoin(per.agg(...)): the self-referencing crossJoin
    # duplicates the whole corpus-scan+groupBy subtree per total (a
    # measured 5-scan plan); the window reuses the one aggregate. The
    # single-partition exchange it implies holds only strata-count rows
    # (languages x sources — thousands at most), never corpus rows.
    wall = Window.partitionBy()
    return per.select(
        "stratum",
        "n_docs",
        "tokens",
        (F.col("tokens").cast("double") / F.sum("tokens").over(wall).cast("double")).alias("p"),
        "weight",
        (F.col("weight").cast("double") / F.sum("weight").over(wall).cast("double")).alias("share"),
    )


def stratum_token_budgets(weights: DataFrame, budget: int) -> DataFrame:
    """Split a global token budget across strata by their tempered
    weights: budget_i = (weight_i * budget) div total_weight — pure
    int64 arithmetic, so sum(budget_i) <= budget exactly (the floor
    remainder is deliberately unassigned, not redistributed: at 10^12
    tokens the dropped remainder is < one token per stratum)."""
    # same window-over-tiny-aggregate shape as mixture_weights (see
    # comment there); integer `div`, NOT float-divide-then-cast:
    # weight * budget can exceed 2^53, where the double quotient rounds
    return weights.select(
        "stratum",
        F.expr(f"(weight * {int(budget)}L)")
        .alias("_scaled"),
        F.sum("weight").over(Window.partitionBy()).alias("_total_weight"),
    ).select(
        "stratum",
        F.expr("_scaled div _total_weight").alias("token_budget"),
    )


def token_budget_select(
    docs: DataFrame,
    budget: int,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str | Column | None = None,
    weights: DataFrame | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy token-budget corpus selection.

    Each stratum receives budget_i tokens (temperature split, see
    stratum_token_budgets); documents are taken in order — `order_col`
    DESCENDING (quality-first selection when it is a quality score)
    with md5-hash tiebreak, or pure md5-hash order (uniform-random in
    effect, reproducible) when order_col is None — while the running
    inclusive token sum stays within the stratum budget. A document
    that would overflow the budget is dropped along with everything
    after it in that stratum (classic greedy prefix, not best-fit).

    Scale shape: budgets broadcast (one tiny row set), then ONE window
    shuffle partitioned by stratum for the running sum. At 100 TB the
    skew unit is the largest stratum; partition the window further by
    a salt only if a single stratum's rows exceed one task's spill
    comfort — the running sum then needs the two-phase prefix-sum
    pattern (see functions/text.py::pack_sequences, which implements
    exactly that for the global variant).

    Returns `doc_id, stratum, tokens, cum_tokens, token_budget` for
    the SELECTED documents (semi-join the corpus on doc_id to
    materialize texts).
    """
    if weights is None:
        weights = mixture_weights(
            docs, strata_col=strata_col, text_col=text_col, tokens_col=tokens_col
        )
    budgets = stratum_token_budgets(weights, budget)
    tok = F.col(tokens_col) if tokens_col else ws_token_count(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("stratum"),
        tok.alias("tokens"),
        *([F.col(order_col).alias("_ord")] if isinstance(order_col, str)
          else [order_col.alias("_ord")] if order_col is not None else []),
    )
    order = (
        [F.col("_ord").desc()] if order_col is not None else []
    ) + [md5_bucket(F.col("doc_id")), F.col("doc_id")]
    w = (
        Window.partitionBy("stratum")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(budgets), "stratum")
        .withColumn("cum_tokens", F.sum("tokens").over(w))
        .filter(F.col("cum_tokens") <= F.col("token_budget"))
        .select("doc_id", "stratum", "tokens", "cum_tokens", "token_budget")
    )
