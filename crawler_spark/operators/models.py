"""Real-model adapters: wiring actual trained models through the
engine's embed / classifier drop-in points, Arrow-batched end to end.

The engine's default embedder (downstream.hash_embedding) and default
classifier weights (functions.text.hash_logit) are deterministic
stand-ins with the right EXECUTION shape. This module certifies the
integration contract beyond the stand-ins:

- matrix_embedder: a numpy bag-of-buckets embedding model executed as
  a Scalar pandas_udf — tokens hash to buckets (the fastText hashing
  trick), bucket rows of a weight MATRIX sum per document. The matrix
  rides an explicit SparkContext.broadcast (one copy per executor, not
  one per task); each UDF invocation processes an Arrow batch of
  documents vectorized in numpy — never a per-row model call. Any
  model whose inference is "matrix lookup + reduce" (fastText,
  word2vec-CBOW, tf-idf projections) drops in as literally this shape;
  a transformer served over RPC keeps the same signature and swaps the
  numpy call for ONE batched RPC per Arrow batch.

- train_token_logreg: a REAL numpy logistic-regression trainer
  (batch gradient descent over hashed-bucket bag-of-words features)
  whose learned per-bucket weights export as the (tok, weight)
  DataFrame that functions.text.classifier_score(weights=) broadcasts
  — the corpus-side plan is unchanged from the stand-in path
  (broadcast join + per-doc sum, no corpus shuffle).

Token bucketing matches functions.text.md5_bucket (first 8 hex chars
of md5 as an integer) so a bucket computed Python-side in the UDF, a
bucket computed JVM-side in a DataFrame expression, and a bucket
computed in a DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def py_md5_bucket(tok: str) -> int:
    """Python twin of functions.text.md5_bucket — first 8 hex chars of
    md5 as an int. MUST stay bit-identical to the JVM/DuckDB spellings
    (see md5_bucket's docstring) or every adapter oracle breaks."""
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)


def _doc_bucket_counts(texts: pd.Series, n_buckets: int) -> np.ndarray:
    """(len(texts), n_buckets) int64 bag-of-buckets counts for one
    Arrow batch — the shared featurizer of both adapters. Pure
    pandas/numpy; tokenization mirrors functions.text.WS_RE splitting
    (lowercase, split on whitespace runs, drop empties)."""
    out = np.zeros((len(texts), n_buckets), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        for tok in t.lower().split():
            out[i, py_md5_bucket(tok) % n_buckets] += 1
    return out


def matrix_embedder(
    spark: SparkSession, weights: np.ndarray
) -> Callable[[Column], Column]:
    """Wrap an (n_buckets, dim) numpy weight matrix as an embedder
    drop-in: returns f(text_col) -> array<float> Column, the same
    callable contract as downstream.hash_embedding, so it plugs
    straight into CrawlEngine(embedder=...) / embed_new_records.

    Execution shape (the part this module certifies): ONE broadcast of
    the matrix at wrap time; per Arrow batch, a vectorized
    counts @ matrix matmul — zero per-row Python calls, zero shuffles
    added to the caller's plan (the UDF is a scan-side projection).
    """
    if weights.ndim != 2:
        raise ValueError(f"weights must be (n_buckets, dim), got {weights.shape}")
    n_buckets, dim = weights.shape
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(weights, dtype=np.float32))

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        w = bc.value
        counts = _doc_bucket_counts(texts, n_buckets)
        vecs = counts.astype(np.float32) @ w  # (batch, dim)
        return pd.Series(list(vecs))

    return lambda c: _embed(c)


def int_matrix_embedding(
    spark: SparkSession, weights: np.ndarray
) -> Callable[[Column], Column]:
    """Exact-integer variant of matrix_embedder for oracle
    certification: int64 weight matrix, int64 counts @ matrix, output
    array<long> — bit-reproducible by a SQL twin (explode tokens,
    md5-bucket each, sum the bucket's weight row). Same broadcast +
    Arrow-batch execution shape as the float path."""
    if weights.ndim != 2 or not np.issubdtype(weights.dtype, np.integer):
        raise ValueError(f"weights must be an integer (n_buckets, dim) matrix")
    n_buckets, dim = weights.shape
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(weights, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _embed(texts: pd.Series) -> pd.Series:
        w = bc.value
        counts = _doc_bucket_counts(texts, n_buckets)
        vecs = counts @ w  # int64 exact
        return pd.Series(list(vecs))

    return lambda c: _embed(c)


def train_token_logreg(
    docs: pd.DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 64,
    iters: int = 200,
    lr: float = 0.5,
    weight_scale: int = 1000,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Train a logistic regression over hashed-bucket bag-of-words
    features with plain numpy batch gradient descent (driver-side: the
    LABELED set is small by definition — quality-classifier training
    sets are 10^4-10^5 docs against a 10^10-doc corpus; DSIR/perceptron
    cover the in-engine distributed-training path).

    Returns (bucket_weights, weights_pdf):
    - bucket_weights: (n_buckets,) float array, the raw model
    - weights_pdf: (tok, weight) integer-quantized per-BUCKET weights
      keyed by md5-bucket id as a string, the exact frame
      classifier_score(weights=, tok_col is the bucket) broadcasts.
      Quantization: round(w * weight_scale) — at inference the integer
      logit sign equals the float sign for any margin > 1/weight_scale.

    Deterministic: zero-init weights, fixed iteration count, no RNG.
    """
    X = _doc_bucket_counts(docs[text_col], n_buckets).astype(np.float64)
    y = docs[label_col].to_numpy(dtype=np.float64)
    n = len(y)
    if n == 0:
        raise ValueError("empty training frame")
    w = np.zeros(n_buckets, dtype=np.float64)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w -= lr * (X.T @ (p - y)) / n
    weights_pdf = pd.DataFrame(
        {
            "tok": [str(b) for b in range(n_buckets)],
            "weight": np.round(w * weight_scale).astype(np.int64),
        }
    )
    return w, weights_pdf


def bucketize_text(
    docs: DataFrame, text_col: str = "text", n_buckets: int = 64
) -> DataFrame:
    """Rewrite text_col as the space-joined md5-BUCKET ids of its
    tokens — the corpus-side featurization matching
    train_token_logreg's bucket space, built JVM-side (no UDF). The
    result feeds classifier_score(weights=weights_pdf) UNCHANGED: its
    whitespace tokenizer now yields bucket ids, the broadcast vocab
    join looks each up, and the trained model scores the corpus with
    the exact same zero-corpus-shuffle plan as the hash stand-in."""
    from crawler_spark.functions.text import WS_RE, md5_bucket

    words = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_RE),
        lambda x: x != "",
    )
    bucketed = F.concat_ws(
        " ",
        F.transform(
            words, lambda x: (md5_bucket(x) % F.lit(n_buckets)).cast("string")
        ),
    )
    return docs.withColumn(text_col, bucketed)
