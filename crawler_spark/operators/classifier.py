"""In-engine quality-classifier TRAINING: a batch perceptron over
bag-of-words token counts, in exact 64-bit integer arithmetic.

The curation stack scores documents with a linear model
(functions/text.py::classifier_score) whose production weights are
assumed to come from an external trainer. This module closes that loop
the way FineWeb/DCLM distill their rule gates into a fastText model:
label documents with anything you already trust (the Gopher gates, a
language column, human marks), train IN Spark, and drop the learned
(tok, weight) table straight back into classifier_score(weights=...) /
engine.doc_quality / pause_low_quality_sites.

Why a perceptron and not logistic regression: the batch perceptron
update is INTEGER-EXACT — margins are integer dot products, the
mistake set is an exact integer comparison, and the gradient is an
integer sum, so training is bit-identical under any partitioning or
cluster size (the same reason pagerank/bm25/dsir use integer
arithmetic here; float GD sums are order-dependent). With integer
counts and ±1 labels the classic convergence guarantee holds on
separable data.

Scale shape: ONE corpus shuffle total to build the (doc, tok, cnt)
feature table (persisted, partitioned by doc hash); each iteration is
then (a) vocab-weights BROADCAST join + per-doc margin agg, (b) the
mistake docs joined back co-keyed, (c) per-token delta agg — the
corpus-sized feature table never re-shuffles. The model stays a
DataFrame end-to-end (never collected to the driver), so vocabulary
size is unbounded. Lineage per iteration is truncated with eager
localCheckpoint (the graph.py/bpe.py idiom).

Training is iterative, but every step is relational — the driver
entry's DuckDB oracle UNROLLS the iterations as successive CTEs (the
pagerank-oracle pattern), so the trainer is hash-certified end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crawler_spark.functions.text import WS_RE

# whitespace-split tokens can never contain a space, so this synthetic
# bias feature cannot collide with real vocabulary
BIAS_TOK = " bias "


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, tok, cnt): bag-of-words with multiplicity, EXACTLY the
    tokenization classifier_score uses (lower, trim, \\s+ split, empty
    dropped), plus one BIAS_TOK row per document (the intercept). One
    corpus exchange."""
    words = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_RE
        ),
        lambda x: x != "",
    )
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("tok"))
    bias = docs.select(
        F.col(id_col).alias("doc_id"), F.lit(BIAS_TOK).alias("tok")
    )
    return (
        toks.unionByName(bias)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def train_perceptron(
    docs: DataFrame,
    label_col: str,
    n_iters: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    features: DataFrame | None = None,
    averaged: bool = False,
) -> DataFrame:
    """Batch perceptron: for `n_iters` rounds, every document whose
    integer margin sum(cnt*weight) does not strictly agree with its ±1
    label (margin*y <= 0) contributes y*cnt to each of its tokens'
    weights. Returns the learned (tok, weight) table — plug it into
    classifier_score(weights=...). Stops early when an iteration has
    zero mistakes (converged). `label_col` must be ±1 integers;
    `features` overrides the corpus with a precomputed token_counts
    table (the production path when training repeatedly on one
    corpus).

    averaged=True returns Freund & Schapire's averaged perceptron in
    the same exact-integer arithmetic: the SUM of the weight vector
    after each of the n_iters iterations (rank/sign-equivalent to the
    average — the usual integer-scale trick). On early convergence the
    remaining iterations contribute the converged vector, exactly as
    running them would. Averaging damps the vanilla perceptron's
    last-mistake oscillation — the standard generalization fix — and
    stays bit-deterministic."""
    labels = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("long").alias("y"),
    )
    feats = (
        features
        if features is not None
        else token_counts(docs, text_col=text_col, id_col=id_col)
    )
    feats = feats.join(labels, "doc_id").persist()
    spark = feats.sparkSession
    weights = spark.createDataFrame([], "tok string, weight long")
    cum = spark.createDataFrame([], "tok string, weight long")
    done = 0

    def _add(a, b, mult=1):
        return (
            a.withColumnRenamed("weight", "wa")
            .join(b.withColumnRenamed("weight", "wb"), "tok", "full")
            .select(
                "tok",
                (
                    F.coalesce("wa", F.lit(0))
                    + F.lit(mult) * F.coalesce("wb", F.lit(0))
                )
                .cast("long")
                .alias("weight"),
            )
            .where(F.col("weight") != 0)
        )

    for _ in range(n_iters):
        margins = (
            feats.join(F.broadcast(weights), "tok", "left")
            .groupBy("doc_id", "y")
            .agg(
                F.sum(F.col("cnt") * F.coalesce("weight", F.lit(0)))
                .cast("long")
                .alias("margin")
            )
        )
        mistakes = margins.where(F.col("margin") * F.col("y") <= 0).select(
            "doc_id"
        )
        delta = (
            feats.join(mistakes, "doc_id")
            .groupBy("tok")
            .agg(F.sum(F.col("y") * F.col("cnt")).cast("long").alias("d"))
            .where(F.col("d") != 0)
        )
        if not delta.limit(1).count():
            break
        weights = _add(
            weights, delta.withColumnRenamed("d", "weight")
        ).localCheckpoint(eager=True)
        done += 1
        if averaged:
            cum = _add(cum, weights).localCheckpoint(eager=True)
    feats.unpersist()
    if averaged:
        # converged early: the untouched iterations would each add the
        # final vector
        if done < n_iters:
            cum = _add(cum, weights, mult=n_iters - done)
        return cum
    return weights


def classifier_eval(
    docs: DataFrame,
    label_col: str,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row confusion summary of a (tok, weight) model on labeled
    docs: n_docs, n_correct (strict margin agreement), true/false
    positives/negatives — all exact integers. Margin ties (0) count as
    incorrect for both classes, matching the training mistake rule."""
    feats = token_counts(docs, text_col=text_col, id_col=id_col)
    labels = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("long").alias("y"),
    )
    margins = (
        feats.join(F.broadcast(weights), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.coalesce("weight", F.lit(0)))
            .cast("long")
            .alias("margin")
        )
        .join(labels, "doc_id")
    )
    m, y = F.col("margin"), F.col("y")
    return margins.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((m * y > 0).cast("long")).alias("n_correct"),
        F.sum(((y > 0) & (m > 0)).cast("long")).alias("tp"),
        F.sum(((y < 0) & (m > 0)).cast("long")).alias("fp"),
        F.sum(((y < 0) & (m <= 0)).cast("long")).alias("tn"),
        F.sum(((y > 0) & (m <= 0)).cast("long")).alias("fn"),
    )
