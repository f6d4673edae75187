"""DSIR-style data selection via importance resampling.

Public recipe (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", NeurIPS): estimate a target and a raw
distribution over HASHED n-gram buckets, score every raw document by
its importance ratio under the two distributions, and resample the
top of that ranking as the training corpus. The reference crawler has
no corpus-selection stage at all (it uploads everything it fetches,
crawler.py:1040-1120); at 100 TB this operator is how a crawl becomes
a *curated* pretraining mix targeted at a domain.

Pipeline (all DataFrame ops):

1. ``hashed_gram_buckets`` — per-doc array of hashed unigram+bigram
   bucket ids (the paper's hashed n-gram feature map; md5 -> bucket so
   engine and oracle agree bit-for-bit). Pure per-row expressions.
2. ``bucket_counts`` — bucket histogram of a corpus: ONE explode +
   groupBy(bucket) whose output is at most ``n_buckets`` rows (the
   partial aggregation is map-side, so the exchange carries ≤
   n_buckets rows per task — tiny at any corpus size).
3. ``dsir_weights`` — per-bucket importance weight from the target
   and raw histograms: a full-outer join of two ≤n_buckets-row
   frames plus window-over-aggregate totals (tiny; never touches the
   corpus).
4. ``dsir_scores`` — per-doc importance score: explode the bucket
   array, broadcast-join the weight table (≤ n_buckets rows — always
   broadcastable), re-aggregate per doc. ONE corpus pass; the only
   exchange is the per-doc sum (map-side combined).
5. ``dsir_select`` — top-k resample: global orderBy(score).limit(k)
   compiles to TakeOrderedAndProject (per-partition top-k, k-row
   merge — no global sort shuffle).

Exactness: the certified path (``exact=True``) uses Laplace-smoothed
*odds-ratio* weights in fixed-point integer arithmetic,

    w_b = floor( SCALE * (t_b+1) * (R+B)  /  ((r_b+1) * (T+B)) )

(t_b/r_b = target/raw bucket counts, T/R their totals, B = n_buckets)
— the same log-free integer-ratio surrogate this repo uses for BM25
idf and the hash classifier: transcendental log is not bit-portable
across engines, so the certified variant scores each gram by its
smoothed probability RATIO instead of the log-ratio; ranking quality
is preserved per-gram (the per-bucket map is monotone in t/r) and the
whole computation is exact int128 (Spark DECIMAL(38,0) `div`, DuckDB
HUGEINT `//`), hence hash-certifiable. ``exact=False`` computes the
paper's true per-bucket log-likelihood-ratio in doubles and Gumbel
top-k resampling — same plan shape, documented as non-certified.

Scale notes: n_buckets is 10^4-10^5 in the paper — the weight table
always broadcasts. The corpus is read ONCE for its own histogram and
ONCE for scoring; at 10^10 docs both are embarrassingly parallel
scans. The intermediate (t+1)*(R+B)*SCALE stays < 10^38 for any real
corpus (R,T ≤ 10^15 grams), inside DECIMAL(38,0)/int128.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.text import WS_RE, _word_ngrams, md5_bucket

#: fixed-point scale for integer ratio weights (6 significant digits)
DSIR_SCALE = 1_000_000


def hashed_gram_buckets(
    text_col: Column, n_buckets: int = 1024
) -> Column:
    """array<long> of hashed-(unigram+bigram)-bucket ids, with
    multiplicity — the DSIR hashed n-gram feature map. Tokenization
    matches the classifier/gopher family (lower, trim, whitespace
    split, empty tokens dropped) so the oracle twins share one
    spelling."""
    words = F.filter(
        F.split(F.trim(F.lower(F.coalesce(text_col, F.lit("")))), WS_RE),
        lambda x: x != "",
    )
    grams = F.concat(words, _word_ngrams(words, 2))
    return F.transform(grams, lambda g: md5_bucket(g) % n_buckets)


def bucket_counts(
    docs: DataFrame, text_col: str = "text", n_buckets: int = 1024
) -> DataFrame:
    """(bucket, cnt) histogram of a corpus's hashed grams. Output is
    ≤ n_buckets rows; the exchange after the map-side partial agg is
    bounded by n_buckets per task regardless of corpus size."""
    b = hashed_gram_buckets(F.col(text_col), n_buckets)
    return (
        docs.select(F.explode(b).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    exact: bool = True,
) -> DataFrame:
    """Per-bucket importance weight table: (bucket, t_cnt, r_cnt,
    weight). `target`/`raw` are document frames (scored on text_col).

    exact=True: integer odds-ratio fixed-point weight (module
    docstring) — hash-certifiable. exact=False: the paper's
    log-likelihood-ratio ln(p_t[b]) - ln(p_r[b]) (Laplace-smoothed) as
    a double.

    Plan: two bounded histograms, a full-outer join of ≤n_buckets
    rows, totals via window-over-aggregate on that tiny frame (never
    crossJoin(agg(self)) — see operators/mixing.py LESSON).
    """
    tc = bucket_counts(target, text_col, n_buckets).withColumnRenamed(
        "cnt", "t_cnt"
    )
    rc = bucket_counts(raw, text_col, n_buckets).withColumnRenamed(
        "cnt", "r_cnt"
    )
    j = (
        tc.join(rc, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).cast("long").alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).cast("long").alias("r_cnt"),
        )
    )
    w = Window.partitionBy()  # ≤ n_buckets rows — tiny by construction
    j = j.withColumn("t_tot", F.sum("t_cnt").over(w)).withColumn(
        "r_tot", F.sum("r_cnt").over(w)
    )
    B = F.lit(n_buckets).cast("long")
    if exact:
        # int128-exact floor division: Spark `div` on DECIMAL(38,0)
        # operands == DuckDB HUGEINT `//` (all operands positive)
        weight = F.expr(
            f"CAST(CAST({DSIR_SCALE} AS DECIMAL(38,0))"
            " * CAST(t_cnt + 1 AS DECIMAL(38,0))"
            f" * CAST(r_tot + {n_buckets} AS DECIMAL(38,0))"
            " div (CAST(r_cnt + 1 AS DECIMAL(38,0))"
            f" * CAST(t_tot + {n_buckets} AS DECIMAL(38,0))) AS BIGINT)"
        )
    else:
        weight = F.log(
            (F.col("t_cnt") + F.lit(1)).cast("double")
            / (F.col("t_tot") + B).cast("double")
        ) - F.log(
            (F.col("r_cnt") + F.lit(1)).cast("double")
            / (F.col("r_tot") + B).cast("double")
        )
    return j.select("bucket", "t_cnt", "r_cnt", weight.alias("weight"))


def dsir_scores(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    neutral_weight: int | float = DSIR_SCALE,
) -> DataFrame:
    """Per-doc importance score: (doc_id, n_grams, score, mean_w).

    score = Σ_gram weight[bucket(gram)] (exact int64 when the weight
    table is the exact path); mean_w = score / n_grams (single
    division of exact values — bit-identical across engines).
    Grams whose bucket is absent from the weight table (impossible
    when docs ⊆ raw: raw's own histogram covers them) score
    `neutral_weight` (ratio 1.0 in fixed point).

    Plan: scan -> explode_outer (zero-gram docs survive as one null
    row) -> broadcast join (≤ n_buckets rows) -> per-doc agg. ONE
    corpus pass, no corpus-side shuffle except the map-side-combined
    per-doc sum.
    """
    b = hashed_gram_buckets(F.col(text_col), n_buckets)
    exploded = docs.select(id_col, F.explode_outer(b).alias("bucket"))
    scored = (
        exploded.join(
            F.broadcast(weights.select("bucket", "weight")), "bucket", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.sum(
                F.when(F.col("bucket").isNull(), F.lit(0)).otherwise(
                    F.coalesce(F.col("weight"), F.lit(neutral_weight))
                )
            ).alias("score"),
        )
    )
    return scored.select(
        id_col,
        "n_grams",
        F.coalesce(F.col("score"), F.lit(0)).alias("score"),
        F.when(
            F.col("n_grams") > 0,
            F.col("score").cast("double") / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_w"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    exact: bool = True,
    length_normalize: bool = False,
) -> DataFrame:
    """End-to-end DSIR selection: weight table from (target, raw),
    score every raw doc, keep the top k.

    exact=True ranks by the integer score (ties -> smallest doc_id;
    fully deterministic, hash-certifiable). exact=False implements the
    paper's Gumbel-top-k resampling: rank by logratio + Gumbel noise
    where the uniform comes from md5(doc_id) — reproducible but float,
    so documented non-certified. length_normalize ranks by mean_w
    instead of the raw sum (counters the long-doc bias of summed
    ratios).

    orderBy(...).limit(k) compiles to TakeOrderedAndProject — each
    partition keeps its local top-k and only k rows merge; no global
    sort exchange.
    """
    w = dsir_weights(target, raw, text_col, n_buckets, exact=exact)
    s = dsir_scores(raw, w, text_col, n_buckets, id_col)
    key = F.col("mean_w") if length_normalize else F.col("score")
    if not exact:
        # Gumbel(0,1) from a deterministic md5 uniform: g = -ln(-ln(u))
        u = (md5_bucket(F.col(id_col)).cast("double") + F.lit(0.5)) / F.lit(
            float(1 << 32)
        )
        key = key + (-F.log(-F.log(u)))
    return s.orderBy(key.desc(), F.col(id_col).asc()).limit(k)
