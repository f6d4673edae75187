"""N-gram language-model scoring for corpus curation (CCNet-style).

CCNet (Wenzek et al., LREC 2020) buckets crawl documents by the
perplexity of a small n-gram LM trained on a clean reference corpus
(head / middle / tail) — the canonical "does this read like real
prose" curation signal, one level up from the per-row heuristics in
``functions.text`` (gopher_gates, classifier_score).

This module implements that pipeline as pure DataFrame jobs:

- ``train_bigram_lm``: bigram counts over a reference corpus — ONE
  shuffle keyed on the bigram string. The model is a plain DataFrame
  (bg, c12); ship it anywhere, persist it, or pass a pre-trained one.
- ``lm_score``: per-document add-one-smoothed bigram likelihood. The
  default integer path is hash-certifiable against the DuckDB oracle
  (all arithmetic is int64 floor division; doubles appear only as a
  single division of two exact integers). ``exact=False`` computes the
  real log-probability / perplexity (float ln) on the identical plan —
  the documented 100 TB path when genuine perplexity values matter.
- ``perplexity_buckets``: CCNet's head/middle/tail split via exact (or
  approximate, mergeable) global quantile cutoffs of the mean mass.

Scale shape: train = one explode + one groupBy (partial agg pushes
map-side). Score = one corpus explode, two lookups (bigram + context)
against the model, one per-doc re-aggregation. The model is tiny next
to a 100 TB corpus (vocab^2-bounded, Zipf-truncated in practice) —
pass ``broadcast_model=True`` to pin broadcast-hash lookups so the
exploded corpus NEVER shuffles; default leaves the choice to
AQE/statistics. No per-row Python anywhere.

Reference parity: the reference crawler has no LM scoring; this is
part of the training-data-pipeline family built on top of the crawl
corpus (interleaved documents' visible text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.text import WS_RE, _word_ngrams

# e6 fixed-point scale for the integer probability mass
_SCALE = 1_000_000


def _words(text_col: str) -> F.Column:
    # NULL text tokenizes like empty text (CCNet drops it at the gate;
    # here it scores as a 0-bigram doc) — same convention as
    # classifier_score.
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_RE),
        lambda x: x != "",
    )


def train_bigram_lm(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram counts (bg, c12) over the corpus, with multiplicity.

    ``bg`` is the two tokens joined by a single space — tokens are
    whitespace-split so the separator is unambiguous, and a single
    string join key keeps every downstream lookup one-column (one
    shuffle key, DuckDB-parity trivial). Context counts and vocabulary
    size are DERIVED from this table (see lm_score) — the corpus is
    scanned exactly once at train time.
    """
    return (
        corpus.select(F.explode(_word_ngrams(_words(text_col), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c12"))
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    exact: bool = True,
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document smoothed bigram-LM likelihood.

    P(w2|w1) is add-one-smoothed conditional MLE over the model's
    bigram counts: (c12 + 1) / (c1 + V), where c1 = total bigram
    occurrences with context w1 (derived by summing the model over its
    first token — no second corpus pass) and V = |distinct successor
    vocabulary| + 1 (the +1 is the unseen-successor mass). Unknown
    contexts/bigrams fall back to 1/V — the OOV floor.

    exact=True (default): per-bigram integer mass
        mass_e6 = (1e6 * (c12+1)) div (c1+V)
    summed per doc — all int64, hash-certifiable. Output:
    (doc_id, n_bigrams, mass_e6, mean_mass_e6) where mean_mass_e6 is
    the single exact-integer division mass_e6/n_bigrams (bit-identical
    double both engines; 0.0 for bigram-less docs). Higher mean = more
    predictable text (lower perplexity).

    exact=False: true log-likelihood sum(ln P) and
    ppl = exp(-logprob/n) on the same plan — use when calibrated
    perplexity values are needed; float ln is not hash-certified.

    model=None self-trains on ``docs`` (corpus-likelihood mode); CCNet
    proper passes a model trained on a clean reference corpus.
    """
    if model is None:
        model = train_bigram_lm(docs, text_col=text_col)
    # context totals + successor vocabulary, derived from the model
    # (aggregations over the SMALL count table, not the corpus)
    contexts = model.groupBy(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1")
    ).agg(F.sum("c12").alias("c1"))
    vocab = model.select(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2")
    ).agg((F.count_distinct("w2") + F.lit(1)).cast("long").alias("v"))
    if broadcast_model:
        model, contexts = F.broadcast(model), F.broadcast(contexts)
    # explode_outer keeps bigram-less docs as one null-bg row (never
    # joins -> c12/c1 null -> OOV floor is NOT counted because
    # count(bg) = 0) — whole path is one corpus pass
    grams = docs.select(
        "doc_id", F.explode_outer(_word_ngrams(_words(text_col), 2)).alias("bg")
    )
    joined = (
        grams.join(model, "bg", "left")
        .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(contexts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "bg",
            (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)).alias("_num"),
            (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).alias("_den"),
        )
    )
    if exact:
        per_doc = joined.groupBy("doc_id").agg(
            F.count("bg").alias("n_bigrams"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("bg").isNotNull(),
                        F.expr(f"({_SCALE} * _num) div _den"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("mass_e6"),
        )
        return per_doc.select(
            "doc_id",
            "n_bigrams",
            "mass_e6",
            F.when(
                F.col("n_bigrams") > 0,
                F.col("mass_e6").cast("double") / F.col("n_bigrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_mass_e6"),
        )
    per_doc = joined.groupBy("doc_id").agg(
        F.count("bg").alias("n_bigrams"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("bg").isNotNull(),
                    F.log(F.col("_num").cast("double") / F.col("_den").cast("double")),
                )
            ),
            F.lit(0.0),
        ).alias("logprob"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "logprob",
        F.when(
            F.col("n_bigrams") > 0,
            F.exp(-F.col("logprob") / F.col("n_bigrams").cast("double")),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("ppl"),
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    score_col: str = "mean_mass_e6",
    exact: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail tagging by global quantile cutoffs of the
    LM score (higher score = more predictable = 'head'). Cutoffs are a
    1-row aggregate broadcast back over the table — no global sort, no
    single-partition window; ``exact=False`` switches to
    percentile_approx (mergeable sketch), the 100 TB default. Bucket 0
    is the most-predictable (head) slice; a doc exactly on a cutoff
    counts it (score <= cut) and lands in the less-predictable side."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    fn = "percentile" if exact else "percentile_approx"
    cuts = scored.agg(
        F.expr(
            f"{fn}({score_col}, array({', '.join(str(q) for q in qs)}))"
        ).alias("cuts")
    )
    # bucket = number of ascending cutoffs at-or-above the score:
    # above every cut -> 0 (head) ... at-or-below all -> n-1 (tail)
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn(
            "bucket",
            F.aggregate(
                F.col("cuts"),
                F.lit(0),
                lambda acc, c: acc
                + F.when(F.col(score_col) > c, F.lit(0)).otherwise(F.lit(1)),
            ).cast("int"),
        )
        .drop("cuts")
    )
