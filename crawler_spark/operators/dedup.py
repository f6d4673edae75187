"""URL-seen dedup (J1): exact anti-join + partitioned Bloom prefilter.

The reference's seen set is a per-site Python set of md5 filenames
(crawler.py:92-104,149-153), consulted at enqueue and again at fetch.
With a single atomic commit per round the double-check collapses to one
exact `left_anti` join on `url_hash`.

Scale path (X4, north rule): at 10^10 seen URLs the anti-join would
shuffle the full candidate set against the full seen set every round.
Instead the seen set keeps, per `bucket = pmod(h64, n_buckets)`, a Bloom
filter sized for expected_per_bucket keys. Probing splits candidates:

    definitely-new (bloom says absent)  -> pass through, NO seen-shuffle
    maybe-seen     (bloom says present) -> exact anti-join on survivors

Bloom false positives can only route a new URL into the exact confirm
path — never drop it — so the final seen set stays exactly equal to the
reference's (SURVEY.md §7.4 risk 2).

Spark 4 does not expose `bloom_filter_agg` to SQL, so the filters are
built with a numpy-vectorized `applyInPandas` per bucket (classic
double-hashing Bloom: position_i = (h1 + i*h2) mod m over the already-
computed xxhash64 keys) and probed with a *cogrouped* applyInPandas:
each bucket's bit array meets its candidate slice on one partition —
nothing is ever collected to the driver, so 1024 buckets × ~9 MB
filters (10^10 keys) stay distributed. Saturated buckets (observed fill
rate too high) are simply rebuilt from the exact seen set — the
"cuckoo-compaction" maintenance path, which also provides deletes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_bits", T.LongType(), False),
        T.StructField("n_hashes", T.IntegerType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)


def exact_anti_join(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """Correctness-mode dedup: keep candidates whose url_hash is unseen."""
    return candidates.join(seen.select("url_hash"), "url_hash", "left_anti")


def bucket_col(h64_col, n_buckets: int):
    c = F.col(h64_col) if isinstance(h64_col, str) else h64_col
    return F.pmod(c, F.lit(n_buckets)).cast("int")


def _u64(series: pd.Series) -> np.ndarray:
    return series.to_numpy(dtype=np.int64).view(np.uint64)


def _hashes(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = u
    # mix for the second hash; uint64 arithmetic wraps mod 2^64 (deterministic)
    h2 = ((u >> np.uint64(33)) | (u << np.uint64(31))) * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
    return h1, h2


def sizing(expected: int, fpp: float = 0.03) -> tuple[int, int]:
    n_bits = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
    n_hashes = max(1, round(n_bits / max(1, expected) * math.log(2)))
    return n_bits, min(n_hashes, 16)


def build_bloom(
    seen: DataFrame,
    n_buckets: int = 64,
    expected_per_bucket: int = 100_000,
    fpp: float = 0.03,
) -> DataFrame:
    """Per-bucket Bloom filters over seen.h64 -> BLOOM_SCHEMA rows."""
    n_bits, n_hashes = sizing(expected_per_bucket, fpp)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
        u = _u64(pdf["h64"])
        h1, h2 = _hashes(u)
        for i in range(n_hashes):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
                "n_keys": [len(pdf)],
                "bits": [bits.tobytes()],
            }
        )

    return (
        seen.withColumn("bucket", bucket_col("h64", n_buckets))
        .select("bucket", "h64")
        .groupBy("bucket")
        .applyInPandas(build, BLOOM_SCHEMA)
    )


def bloom_prefilter(
    candidates: DataFrame, blooms: DataFrame, seen: DataFrame, n_buckets: int
) -> DataFrame:
    """Two-phase dedup: bloom prune (cogrouped per bucket), exact confirm
    on the maybe-seen slice only."""
    cand_b = candidates.withColumn("bucket", bucket_col("h64", n_buckets))
    out_schema = T.StructType(list(cand_b.schema.fields) + [T.StructField("maybe", T.BooleanType())])

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe=pd.Series(dtype=bool))
        if right.empty:
            return left.assign(maybe=False)
        n_bits = int(right["n_bits"].iloc[0])
        n_hashes = int(right["n_hashes"].iloc[0])
        bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)
        u = _u64(left["h64"])
        h1, h2 = _hashes(u)
        maybe = np.ones(len(left), dtype=bool)
        for i in range(n_hashes):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            maybe &= (byte & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))) != 0
        return left.assign(maybe=maybe)

    probed = (
        cand_b.groupby("bucket")
        .cogroup(blooms.groupby("bucket"))
        .applyInPandas(probe, out_schema)
    )
    fresh = probed.filter(~F.col("maybe")).drop("maybe", "bucket")
    confirmed = (
        probed.filter(F.col("maybe"))
        .drop("maybe", "bucket")
        .join(seen.select("url_hash"), "url_hash", "left_anti")
    )
    return fresh.unionByName(confirmed)


def saturated_buckets(blooms: DataFrame, max_fill: float = 0.5) -> DataFrame:
    """Maintenance: buckets whose key count exceeded the sizing budget
    (fill factor ≈ n_keys/expected). Rebuild those from the exact seen
    set with a larger expected count (compaction / delete support)."""
    return blooms.filter(
        F.col("n_keys") * F.col("n_hashes") > F.col("n_bits") * F.lit(max_fill)
    ).select("bucket", "n_keys")
