"""Approximate-nearest-neighbor search over embedding columns.

Two tiers (SURVEY/driver "similarity search" requirement):

- brute_force_topk: exact cosine top-k. The query side is tiny and
  broadcast; the corpus never shuffles. Dot products run JVM-side via
  zip_with + aggregate in double precision (no UDF, no Python).
- lsh_bucketed_topk: the scale path — coordinate-sign LSH buckets
  (sign bits of the first `nbits` dimensions). Neighbors are only
  searched inside the query's bucket, so the join is |bucket|-sized.
  Recall is traded for a ~2^nbits fan-in reduction; exact re-ranking
  happens within the bucket.

At 10^10-vector scale the same shape holds: bucket by LSH key
(partition pruning on the bucket column), broadcast the query batch,
re-rank per bucket. For higher recall, multi-probe = union over
neighboring bucket keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k for each query id (queries drawn from the
    corpus itself by `query_ids`, or an explicit (query_id, qv)
    DataFrame via `queries` — external query vectors, e.g. an embedded
    search string; ids equal to a corpus id are excluded as
    self-matches either way).

    Output: (query_id, rank, neighbor_id, score) — score rounded to 4
    decimals AFTER ranking so near-tie ordering stays float-exact.
    """
    if queries is not None:
        q = queries.select("query_id", "qv")
    elif query_ids is not None:
        q = (
            embeddings.filter(F.col(id_col).isin(query_ids))
            .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        )
    else:
        raise ValueError("brute_force_topk needs query_ids or queries")
    d = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("dv"))
    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_col(F.col("qv"), F.col("dv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cos", 4).alias("score"),
        )
    )


def sign_lsh_bucket(vec_col, nbits: int = 8):
    """Coordinate-sign LSH key: '1'/'0' per sign of dims 0..nbits-1."""
    bits = [
        F.when(F.element_at(vec_col, i + 1) >= 0, "1").otherwise("0")
        for i in range(nbits)
    ]
    return F.concat(*bits)


def lsh_buckets(
    embeddings: DataFrame, nbits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("vec_id"), sign_lsh_bucket(F.col(vec_col), nbits).alias("bucket")
    )


def default_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic stand-in codebook: the first n_centroids vectors.
    Keeps the oracle-checked query shape reproducible in SQL; swap in
    kmeans_train for a real codebook."""
    return embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )


def kmeans_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means as pure DataFrame jobs -> (cid, cv) codebook.

    Init: hash-spread — centroid g is the min-id vector whose id hashes
    to group g (deterministic AND spread across the corpus even when
    rows are cluster-ordered, where a first-N init would collapse into
    one cluster). The hash is Knuth's multiplicative high-bits scheme
    in pure int64 arithmetic — g = ((((id mod 2^29) * 2654435761)
    mod 2^32) * k) div 2^32 — chosen over xxhash64 so an EXTERNAL
    oracle can replay it in any language without a Spark-specific hash
    implementation. Each iteration: broadcast the k centroids, argmax-
    cosine assignment (one pass over the corpus, no shuffle of vectors
    beyond the groupBy), per-cell elementwise mean as an EXACT
    decimal(27,12) sum cast to double, divided by the member count —
    decimal sums are associative, so the trained codebook is
    bit-identical under ANY partitioning / shuffle order (a plain
    float avg is not; its value depends on partition combine order).
    Empty cells keep their previous centroid. The k×dim codebook is
    collected per iteration (tiny) to cut lineage.
    """
    spark = embeddings.sparkSession
    dim = len(embeddings.select(vec_col).first()[0])
    h32 = F.pmod(
        F.pmod(F.col(id_col).cast("long"), F.lit(2**29)) * F.lit(2654435761),
        F.lit(2**32),
    )
    # shiftright = exact int64 floor-div by 2^32 (h32*k < 2^63 for any
    # k < 2^31); a double division here would round for k >= ~2^21 and
    # break the bit-identical external-replay contract
    cand = embeddings.withColumn(
        "g", F.shiftright(h32 * F.lit(n_centroids), 32)
    )
    cent = (
        cand.groupBy("g")
        .agg(F.min_by(F.col(vec_col), F.col(id_col)).alias("cv"))
        .select(
            F.col("g").cast("long").alias("cid"),
            F.transform("cv", lambda x: x.cast("double")).alias("cv"),
        )
    )
    schema = "cid bigint, cv array<double>"
    for _ in range(n_iters):
        assigned = ivf_assign(embeddings, id_col=id_col, vec_col=vec_col, centroids=cent)
        means = assigned.groupBy("cid").agg(
            *[
                (
                    F.sum(F.element_at("v", i + 1).cast("decimal(27,12)"))
                    .cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias(f"c{i}")
                for i in range(dim)
            ]
        )
        new_cent = means.select(
            "cid", F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("cv")
        )
        kept = cent.join(new_cent.select("cid"), "cid", "left_anti")
        rows = [(int(r.cid), list(r.cv)) for r in new_cent.unionByName(kept).collect()]
        cent = spark.createDataFrame(sorted(rows), schema)
    return cent


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat cell assignment.

    Centroids default to the first-N stand-in (SQL-reproducible; see
    default_centroids) or a kmeans_train codebook. The *index
    structure* — assign every vector to its nearest centroid, search
    only probed cells — is the scale path either way. Assignment =
    broadcast centroids × corpus, argmax cosine with (score desc,
    cid asc) tie-break.
    """
    cent = centroids if centroids is not None else default_centroids(
        embeddings, n_centroids, id_col, vec_col
    )
    scored = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).crossJoin(F.broadcast(cent)).withColumn("ccos", cosine_col(F.col("v"), F.col("cv")))
    w = Window.partitionBy("vid").orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("vid", "v", "cid")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF search: probe the query's nprobe nearest cells, exact re-rank
    inside them. At scale the corpus is partitioned by cid (partition
    pruning selects only probed cells); recall/latency trades via
    nprobe. Pass a kmeans_train codebook via `centroids` for trained
    cells (the default stand-in keeps the SQL oracle reproducible)."""
    cent = centroids if centroids is not None else default_centroids(
        embeddings, n_centroids, id_col, vec_col
    )
    assigned = ivf_assign(embeddings, n_centroids, id_col, vec_col, centroids=cent)
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qprobe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("ccos", cosine_col(F.col("qv"), F.col("cv")))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
            ),
        )
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    scored = (
        assigned.join(F.broadcast(qprobe), "cid")
        .filter(F.col("vid") != F.col("query_id"))
        .withColumn("cos", cosine_col(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias("neighbor_id"), F.round("cos", 4).alias("score"))
    )


def _global_abs_max(embeddings: DataFrame, vec_col: str) -> DataFrame:
    """One-row corpus statistic: max |x| over every component.
    Stays in-plan (tiny agg, broadcast) — no driver collect."""
    return embeddings.agg(
        F.max(
            F.aggregate(
                F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))),
                F.lit(0.0),
                lambda acc, v: F.greatest(acc, v),
            )
        ).alias("mx")
    )


def quantize_vec(vec_col, mx_col, levels: int = 127):
    """Symmetric int8-style quantization with a GLOBAL scale:
    q_i = floor(x_i * levels / max_abs). Global (not per-vector) scale
    keeps integer inner products order-comparable across vectors —
    per-vector scales would need a float rescale at query time. The
    float ops are one IEEE multiply + one divide in fixed order, so a
    SQL twin computing floor((x*levels)/mx) is bit-identical."""
    return F.transform(
        vec_col,
        lambda x: F.when(mx_col == 0.0, F.lit(0).cast("long")).otherwise(
            F.floor(x.cast("double") * F.lit(float(levels)) / mx_col)
        ),
    )


def quantize_embeddings(
    embeddings: DataFrame,
    levels: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8-style quantized copy of the corpus: (vec_id, qv array<long>).

    The 100 TB story: float32x{dim} vectors dominate embedding-table
    bytes; symmetric int8 cuts scan + shuffle + cache bytes 4x with
    near-identical neighbor ranking (global-scale symmetric
    quantization preserves inner-product order up to +-1 ULP per
    component). Downstream ANN ops (quantized_topk) score in EXACT
    int64 arithmetic — no float drift anywhere, hash-certifiable."""
    mx = _global_abs_max(embeddings, vec_col)
    return (
        embeddings.crossJoin(F.broadcast(mx))
        .select(
            F.col(id_col).alias("vec_id"),
            quantize_vec(F.col(vec_col), F.col("mx"), levels).alias("qv"),
        )
    )


def quantized_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    levels: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: DataFrame | None = None,
) -> DataFrame:
    """ANN over the quantized corpus: rank by exact int64 inner product
    of the quantized vectors (query broadcast, corpus never shuffles).

    Output (query_id, rank, neighbor_id, iscore) — iscore is the raw
    integer dot product (monotone proxy for the float inner product
    under global-scale quantization). Pass `quantized` (a
    quantize_embeddings output, e.g. a persisted int8 table) to skip
    re-quantizing — the production shape at scale."""
    qt = quantized if quantized is not None else quantize_embeddings(
        embeddings, levels, id_col, vec_col
    )
    q = qt.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qa")
    )
    scored = (
        qt.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qb"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "iscore",
            F.aggregate(
                F.zip_with(F.col("qa"), F.col("qb"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("iscore"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "iscore")
    )


def semdedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    corpus, form cosine pairs ONLY within a cluster, drop every vector
    that has an epsilon-near neighbor with a smaller id in its cluster.

    Output (vec_id, cid, keep) for the whole corpus. Variant note: the
    paper keeps the member farthest from the centroid per epsilon
    group; this uses the deterministic min-id canonical (same policy as
    canonical_corpus / dup_clusters) so the result is SQL-certifiable
    without recursion. The scale contract is the clustering itself:
    pairwise work is sum(|cluster|^2), bounded by the codebook size —
    the paper runs k=50k clusters at 100 TB; pass a kmeans_train
    codebook via `centroids` for that (default first-N stand-in keeps
    the oracle reproducible). Cluster the table BY cid on disk and the
    self-join is partition-local."""
    cent = centroids if centroids is not None else default_centroids(
        embeddings, n_centroids, id_col, vec_col
    )
    assigned = ivf_assign(embeddings, n_centroids, id_col, vec_col, centroids=cent)
    a = assigned.select(
        F.col("cid").alias("_cid"), F.col("vid").alias("keep_id"), F.col("v").alias("va")
    )
    b = assigned.select(
        F.col("cid").alias("_cid"), F.col("vid").alias("drop_id"), F.col("v").alias("vb")
    )
    losers = (
        a.join(b, "_cid")
        .filter(F.col("keep_id") < F.col("drop_id"))
        .filter(cosine_col(F.col("va"), F.col("vb")) >= threshold)
        .select(F.col("drop_id").alias("vid"))
        .distinct()
    )
    return (
        assigned.join(losers.withColumn("_dup", F.lit(True)), "vid", "left")
        .select(
            F.col("vid").alias("vec_id"),
            "cid",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.2,
    nbits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked.

    Pairs are only formed inside an LSH bucket (the standard blocked
    near-dup join: |bucket|² work instead of |corpus|²), then scored
    exactly and thresholded. At 10^10 scale the bucket column is the
    table's partition key, so the self-join is partition-local.
    """
    withb = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        sign_lsh_bucket(F.col(vec_col), nbits).alias("bucket"),
    )
    a, b = withb.alias("a"), withb.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .withColumn("cos", cosine_col(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round("cos", 4).alias("score"),
        )
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nbits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: exact re-rank restricted to the query's LSH bucket."""
    withb = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        sign_lsh_bucket(F.col(vec_col), nbits).alias("bucket"),
    )
    q = withb.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    scored = (
        withb.join(F.broadcast(q), "bucket")
        .filter(F.col("vid") != F.col("query_id"))
        .withColumn("cos", cosine_col(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias("neighbor_id"), F.round("cos", 4).alias("score"))
    )
