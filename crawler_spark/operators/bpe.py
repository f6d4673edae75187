"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016) and
encoding — train a real subword vocabulary ON the crawled corpus, the
tokenizer-fitting job every LM data pipeline runs before packing.

The reference counts whitespace tokens only (crawler.py's markdown
pipeline has no tokenizer); functions/text.py::bpe_token_count is a
regex APPROXIMATION of a trained tokenizer. This module trains the real
thing, Spark-first:

- the corpus collapses to a DISTINCT-WORD frequency table first (the
  classic scaling move: merge statistics depend only on word shapes ×
  frequencies, so 100 TB of text becomes ~10^7-10^8 weighted rows —
  ONE corpus exchange total, everything after is over the tiny table);
- each merge round is a DataFrame job: explode adjacent symbol pairs
  weighted by word frequency, map-side partial-sum, and collect exactly
  ONE row (the argmax pair — same k×dim-collect budget as the k-means
  trainer in ann.py); ties break deterministically by (pair count desc,
  left asc, right asc), so training is reproducible under any
  partitioning;
- the merge is applied to the symbol arrays as a pure JVM fold
  (F.aggregate): greedy leftmost non-overlapping replacement, provably
  identical to the index-scan formulation because a merged token x+y
  can never equal its own left half x (y is non-empty), so the fold
  never re-matches a token it just created;
- lineage is truncated per round via eager localCheckpoint (the
  connected-components idiom from graph.py) — plan size stays O(1) in
  the number of merges.

Word -> symbols convention: characters of the word plus a final '</w>'
end-of-word symbol (a separate symbol, not a suffix). Encoding applies
the trained merges IN TRAINING ORDER with the same fold semantics, so
encode(word, merges) is bit-identical to the trainer's final state —
pinned by tests/test_bpe.py.

Training is genuinely iterative (each round's argmax depends on all
previous merges), so the driver entry is rows-only by contract — the
same carve-out as ivf_kmeans_topk; correctness is certified by a
pure-python reference implementation in tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from crawler_spark.functions.text import WS_RE

END = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): whitespace-token frequency table — the ONE corpus
    exchange of BPE training (map-side combined)."""
    t = F.trim(F.col(text_col))
    words = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, WS_RE)
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _to_symbols(word: Column) -> Column:
    """word -> [c1, c2, ..., '</w>'] — a CODE-POINT split, matching
    python's list(word): Java regex '.' consumes a full code point, so
    '(?<=.)' never splits a surrogate pair; array_remove drops the
    trailing '' that split(limit=-1) keeps. Words contain no whitespace
    (they come from a \\s+ split), so '.'-excluded line terminators
    cannot appear inside one."""
    return F.concat(
        F.array_remove(F.split(word, "(?<=.)"), ""),
        F.array(F.lit(END)),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """[(s[i], s[i+1])] — empty for arrays shorter than 2."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(syms) - 2),
            lambda i: F.struct(
                F.element_at(syms, i + 1).alias("left"),
                F.element_at(syms, i + 2).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping replacement of the adjacent pair
    (left, right) with left+right, as a pure JVM fold."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, cur: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (cur == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(cur))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
    words: DataFrame | None = None,
) -> list[dict]:
    """Train `n_merges` BPE merges on the corpus. Returns the ordered
    merge list as dicts (rank, left, right, merged, pair_count).
    Stops early when the best remaining pair occurs fewer than
    `min_pair_count` times (weighted by word frequency). `words`
    overrides the corpus with a precomputed (word, freq) table —
    the production path when the frequency table is already
    materialized."""
    wf = words if words is not None else word_freqs(docs, text_col)
    state = wf.select(_to_symbols(F.col("word")).alias("syms"), "freq")
    state = state.localCheckpoint(eager=True)
    merges: list[dict] = []
    for rank in range(n_merges):
        best = (
            state.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        left, right, n = best[0]["left"], best[0]["right"], int(best[0]["n"])
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": n,
            }
        )
        state = state.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def merges_df(spark, merges: list[dict]) -> DataFrame:
    """The trained merge list as a DataFrame (the persistable artifact:
    write it once, broadcast it to every encode job)."""
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in merges],
        "rank int, left string, right string, merged string, pair_count long",
    )


def _encode_word(word: str, merge_seq: list[tuple[str, str]]) -> list[str]:
    """Python twin of the trainer's fold: apply merges in training
    order, greedy leftmost non-overlapping."""
    syms = list(word) + [END]
    for left, right in merge_seq:
        out: list[str] = []
        for cur in syms:
            if out and out[-1] == left and cur == right:
                out[-1] = left + right
            else:
                out.append(cur)
        syms = out
    return syms


def encode_words(
    words: DataFrame, merges: list[dict], word_col: str = "word"
) -> DataFrame:
    """(word, tokens): encode each DISTINCT word once with the trained
    merges — an Arrow-batched pandas UDF (applying an ordered 50-deep
    merge list per row is exactly the workload the sanctioned Python
    path exists for; a 50-deep nested JVM fold would blow up the
    expression tree — the full_curation pushdown lesson). At corpus
    scale this runs over the distinct-word table, never the corpus."""
    seq = [(m["left"], m["right"]) for m in merges]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "tokens": [_encode_word(w, seq) for w in pdf[word_col]],
                }
            )

    out_schema = f"{word_col} string, tokens array<string>"
    return words.select(word_col).mapInPandas(run, schema=out_schema)


def bpe_encode(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus: (doc_id, pos, word, tokens, n_tokens) — one
    row per word occurrence in document order. Plan: corpus explodes
    map-side; the (distinct word -> tokens) table joins back BROADCAST
    (subword vocab tables are MBs); the corpus itself never shuffles.
    Callers aggregate as needed (token counts, packing budgets)."""
    t = F.trim(F.col(text_col))
    words = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, WS_RE)
    )
    ex = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(words).alias("pos", "word")
    )
    vocab = encode_words(ex.select("word").distinct(), merges)
    return ex.join(F.broadcast(vocab), "word").select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        "word",
        "tokens",
        F.size("tokens").cast("long").alias("n_tokens"),
    )
