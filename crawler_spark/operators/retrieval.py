"""Lexical retrieval: BM25 top-k search over an inverted index.

Training-data pipelines use lexical retrieval alongside embedding ANN
(`operators/ann.py`): benchmark decontamination by query, quality-seed
mining ("find docs like these wiki pages"), and targeted corpus audits
all run BM25-shaped scans over the crawled corpus. The reference stores
crawled pages and serves them to downstream search/RAG consumers
(reference `code/crawler.py` document store + Qdrant upload path); this
operator is the lexical half of that serving story, Spark-first.

Scale shape (the part that must survive 100 TB):
- the query set is SMALL (10s..1000s of rows) -> exploded to a distinct
  term vocabulary and BROADCAST; the corpus explodes its tokens map-side
  and is immediately semi-joined against that vocabulary, so tokens not
  appearing in any query NEVER reach a shuffle;
- per-(doc, term) tf is a partial-agg (map-side combine) shuffle keyed
  on (doc_id, tok) — uniform keys, no skew beyond natural term skew,
  which the broadcast semi-join has already capped to query terms;
- document frequency df is a second tiny aggregate over postings
  (|query vocabulary| rows) joined back via broadcast;
- scoring is one partial-agg shuffle keyed (query_id, doc_id); top-k is
  row_number over query_id with a constant bound -> Spark rewrites it
  to WindowGroupLimit (per-partition top-k before the final exchange).
The corpus is never self-joined and never collected.

Exact-integer scoring (default): hash-certifiable against a DuckDB
twin. idf_e6 = floor(1e6 * (N - df + 0.5)/(df + 0.5)) — the Robertson
ODDS ratio at 1e-6 resolution computed purely in int64 via
(2(N-df)+1)/(2df+1); the classic formulation takes ln() of it, which is
order-preserving, so exact-integer ranking equals odds-ratio BM25
ranking term-by-term (document-level totals can differ from the ln
variant — this is the certifiable stand-in, same contract as
`classifier_score`'s hash weights). Term saturation is real BM25:
tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) cleared of fractions with
avgdl = T/N:
    sat_e3 = 1000 * 100*T*tf*(k1_x10+10)
             // (1000*T*tf + k1_x10*((100-b_x100)*T + b_x100*dl*N))
All operands are nonnegative int64 (den > 0 since T,tf >= 1), so Spark
`div` (truncate) == DuckDB `//` (floor). Magnitude bound: with corpus
token count T, num ~ 1e5*T*tf — int64-safe through ~10^11 tokens;
beyond that use exact=False (true float BM25 with ln idf, the
production path at extreme scale — per-doc scores are single-division
per term and never aggregated across engines, so determinism within
Spark still holds; only cross-engine hash certification needs ints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(text_col: str) -> F.Column:
    """Shared tokenizer: lowercase, split on whitespace, drop empties.
    MUST match textdedup.tokens / the DuckDB twin
    list_filter(string_split_regex(trim(lower(text)), '\\s+'), ...)."""
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1_x10: int = 12,
    b_x100: int = 75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "qtext",
    query_id_col: str = "query_id",
    exact: bool = True,
) -> DataFrame:
    """BM25 top-k lexical search: for each query, the k best-matching
    documents. Returns (query_id, doc_id, score_e9|score, rank).

    queries: small DataFrame (query_id, qtext) — broadcast throughout.
    k1_x10/b_x100: BM25 constants scaled to ints (defaults k1=1.2,
    b=0.75). exact=True -> int64 scoring (see module docstring);
    exact=False -> true float BM25 (ln idf), same plan shape.
    Query term multiplicity is ignored (standard qtf=1 BM25).
    """
    words = _words(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), words.alias("_w")
    ).select("doc_id", F.size("_w").alias("dl"), "_w")

    # corpus stats stay in-plan: one tiny agg broadcast to every task
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tok")
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.array_distinct(_words(query_text_col))
            ).alias("tok"),
        )
    )
    qvocab = qterms.select("tok").distinct()

    # postings: tf per (doc, query-term); non-query tokens never shuffle
    postings = (
        base.select("doc_id", "dl", F.explode("_w").alias("tok"))
        .join(F.broadcast(qvocab), "tok")
        .groupBy("doc_id", "tok", "dl")
        .agg(F.count("*").alias("tf"))
    )
    return _rank_postings(
        postings, qterms, stats, k=k, k1_x10=k1_x10, b_x100=b_x100, exact=exact
    )


def _rank_postings(
    postings: DataFrame,
    qterms: DataFrame,
    stats: DataFrame,
    k: int,
    k1_x10: int,
    b_x100: int,
    exact: bool,
) -> DataFrame:
    """Shared BM25 scoring tail: postings (doc_id, tok, tf, dl) already
    restricted to query terms, qterms (query_id, tok), stats one row
    (n_docs, total_tok) — df + idf/saturation scoring + per-query
    WindowGroupLimit top-k. Both the ad-hoc path (bm25_topk) and the
    incremental-index path (bm25_from_postings) end here, which is what
    makes their results identical by construction."""
    dfreq = postings.groupBy("tok").agg(F.count("*").alias("df"))

    scored_terms = (
        postings.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "tok")
    )
    n, t = F.col("n_docs"), F.col("total_tok")
    tf, dfc, dl = F.col("tf"), F.col("df"), F.col("dl")
    if exact:
        idf = F.expr(
            "(1000000 * (2*(n_docs - df) + 1)) div (2*df + 1)"
        ).cast("long")
        sat_e3 = F.expr(
            f"(1000 * 100 * total_tok * tf * {k1_x10 + 10}) div "
            f"(1000 * total_tok * tf + {k1_x10} * "
            f"({100 - b_x100} * total_tok + {b_x100} * dl * n_docs))"
        ).cast("long")
        agg = F.sum(idf * sat_e3).alias("score_e9")
        score_col = "score_e9"
    else:
        k1 = k1_x10 / 10.0
        b = b_x100 / 100.0
        idf = F.log(
            (n.cast("double") - dfc + 0.5) / (dfc.cast("double") + 0.5)
            + F.lit(1.0)
        )
        sat = (tf.cast("double") * (k1 + 1.0)) / (
            tf.cast("double")
            + k1 * (1.0 - b + b * dl.cast("double") * n / t.cast("double"))
        )
        agg = F.sum(idf * sat).alias("score")
        score_col = "score"

    scores = scored_terms.groupBy("query_id", "doc_id").agg(agg)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))  # WindowGroupLimit
        .select(
            "query_id", "doc_id", score_col, F.col("rank").cast("int")
        .alias("rank"))
    )


def corpus_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Materialized inverted index rows: (doc_id, tok, tf, dl, *keep) —
    one row per distinct (doc, token), tokenized exactly like bm25_topk.
    A document with ZERO tokens still gets one sentinel row (tok NULL,
    tf 0, dl 0) so corpus stats (N, total tokens) recover from the
    index alone — the classifier_score explode_outer idiom. One corpus
    exchange; per crawl round it runs over the fetched delta only
    (engine lexical_index=True)."""
    words = _words(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), *keep_cols, words.alias("_w")
    ).select("doc_id", *keep_cols, F.size("_w").cast("long").alias("dl"), "_w")
    return (
        base.select(
            "doc_id", *keep_cols, "dl", F.explode_outer("_w").alias("tok")
        )
        .groupBy("doc_id", *keep_cols, "dl", "tok")
        .agg(F.count("tok").cast("long").alias("tf"))
    )


def bm25_from_postings(
    postings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1_x10: int = 12,
    b_x100: int = 75,
    query_text_col: str = "qtext",
    query_id_col: str = "query_id",
    exact: bool = True,
) -> DataFrame:
    """BM25 top-k over a MATERIALIZED postings table (corpus_postings /
    the engine's incremental lexical index): the expensive tokenize +
    (doc, tok) aggregation was already paid at indexing time, so query
    time is join-only — broadcast the query vocabulary into a semi-join
    on the postings (at 10^10 pages: a token-clustered index makes this
    a partition-pruned scan), one tiny df agg, one scoring exchange.
    Corpus stats (N, total tokens) recover from the index's distinct
    (doc_id, dl) pairs — O(docs), cache it in production for repeated
    querying. Results are identical to bm25_topk over the same corpus
    BY CONSTRUCTION (both end in _rank_postings; pinned in
    tests/test_lexical_index.py)."""
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(_words(query_text_col))).alias("tok"),
    )
    qvocab = qterms.select("tok").distinct()
    stats = (
        postings.select("doc_id", "dl")
        .distinct()
        .agg(F.count("*").alias("n_docs"), F.sum("dl").alias("total_tok"))
    )
    p = postings.join(F.broadcast(qvocab), "tok").select(
        "doc_id", "tok", "tf", "dl"
    )
    return _rank_postings(
        p, qterms, stats, k=k, k1_x10=k1_x10, b_x100=b_x100, exact=exact
    )


def anchor_docs(
    anchors: DataFrame,
    dst_col: str = "dst_hash",
    src_col: str = "src_hash",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target ANCHOR DOCUMENTS from an anchor-observation table:
    doc_id = target page, text = its incoming anchor texts (one per
    distinct (src, anchor) pair — repetition ACROSS sources is kept on
    purpose: many pages saying the same words about a target is the
    anchor-frequency signal BM25 should see) joined in lexicographic
    order (deterministic; BM25 is bag-of-words so order never affects
    scores, but hash certification and resumes need a canonical
    string). n_anchors counts the distinct (src, anchor) observations.

    Re-observations across rounds (recrawls re-append like edges) are
    collapsed by the distinct, so the document is stable under
    recrawling. Scale shape: one exchange keyed on dst (the distinct +
    agg share it); anchors tables are O(|links with text|), far smaller
    than the corpus, and never join it here."""
    per_target = anchors.select(
        F.col(dst_col).alias("doc_id"),
        F.col(src_col).alias("src"),
        F.col(anchor_col).alias("anchor"),
    ).distinct()
    return per_target.groupBy("doc_id").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("anchor"))).alias("text"),
        F.count("*").alias("n_anchors"),
    )


def eval_topk(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """Retrieval evaluation: per-query rank metrics of a top-k result
    list against relevance judgments.

    results: (query_id, doc_id, rank) — any search surface's output
    (bm25_topk / brute_force_topk via neighbor_id alias / rrf_fuse).
    qrels: (query_id, doc_id) relevant pairs — tiny, broadcast.

    Output per query appearing in results: best_rank (first relevant
    position, 0 = missed), rr_e6 = floor(1e6/best_rank) (the
    reciprocal-rank term — sum/avg it for MRR without floats),
    n_rel_topk = relevant docs inside the list (hits@k numerator).
    Queries with no results at all are absent — mirror that in any
    twin. All-integer, hash-certifiable; |q| x k rows in, |q| out."""
    rel = results.join(
        F.broadcast(qrels.select("query_id", "doc_id").distinct()),
        ["query_id", "doc_id"],
    )
    hits = rel.groupBy("query_id").agg(
        F.min("rank").alias("_best"), F.count("*").alias("_n")
    )
    return (
        results.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("_best", F.lit(0)).cast("int").alias("best_rank"),
            F.coalesce(
                F.expr("1000000 DIV _best"), F.lit(0)
            ).cast("long").alias("rr_e6"),
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_rel_topk"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) of N ranked
    lists -> (query_id, doc_id, rrf_e9, rank).

    The standard hybrid-retrieval combiner: fuse BM25 (lexical) and
    embedding-ANN (semantic) top-k lists per query without score
    calibration — only RANKS matter. Score is exact int64:
    rrf_e9 = sum over lists of floor(1e9 / (k0 + rank)), so the fusion
    is hash-certifiable and reproducible under any partitioning.

    Scale shape: each input list is already per-query top-k (tiny —
    |queries| x k rows), so the union + groupBy here never touches the
    corpus; fusing is O(queries x k x n_lists) regardless of corpus
    size. Candidate generation stays in the per-system operators
    (bm25_topk's broadcast-vocabulary plan, quantized_topk/ivf_topk's
    pruned search) — fusion adds no corpus pass.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            F.col(rank_col).cast("long").alias("_r"),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(f"1000000000 div ({k0} + _r)")).alias("rrf_e9")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_e9"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select("query_id", "doc_id", "rrf_e9", F.col("rank").cast("int").alias("rank"))
    )
