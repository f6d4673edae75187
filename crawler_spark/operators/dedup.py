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


PROBE_SCHEMA = T.StructType(
    [T.StructField("h64", T.LongType()), T.StructField("maybe", T.BooleanType())]
)


def bloom_probe(keys: DataFrame, blooms: DataFrame, n_buckets: int) -> DataFrame:
    """(h64) keys -> (h64, maybe). Cogrouped per bucket so each bit
    array meets only its own key slice; the Arrow payload is 16 B/row
    (h64 + bucket), never the full candidate row."""

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame({"h64": [], "maybe": []}).astype(
                {"h64": "int64", "maybe": "bool"}
            )
        if right.empty:
            return pd.DataFrame({"h64": left["h64"], "maybe": False})
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
        return pd.DataFrame({"h64": left["h64"], "maybe": maybe})

    keyed = keys.select("h64").withColumn("bucket", bucket_col("h64", n_buckets))
    return (
        keyed.groupby("bucket")
        .cogroup(blooms.groupby("bucket"))
        .applyInPandas(probe, PROBE_SCHEMA)
    )


def broadcast_probe_col(spark, blooms: DataFrame, n_buckets: int):
    """Collect the bucket filters once, broadcast them, and return a
    pandas_udf column maybe(h64) that probes INLINE — no shuffle, no
    join-back. Right whenever the filters fit in executor memory
    (~1 GB ≈ 10^9 seen keys at 3% fpp); beyond that use the cogrouped
    `bloom_probe`, which keeps each filter on its bucket partition."""
    rows = blooms.collect()
    table = {
        int(r["bucket"]): (int(r["n_bits"]), int(r["n_hashes"]), np.frombuffer(r["bits"], dtype=np.uint8))
        for r in rows
    }
    bc = spark.sparkContext.broadcast(table)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h64: pd.Series) -> pd.Series:
        tbl = bc.value
        u = _u64(h64)
        # bucket must match Spark's pmod over the SIGNED h64 (bucket_col):
        # numpy int64 % follows Python semantics (sign of divisor), i.e. pmod.
        # An unsigned modulo here mis-buckets every negative h64 key for
        # non-power-of-two n_buckets -> bloom FALSE NEGATIVES (dropped dups).
        bucket = h64.to_numpy(dtype=np.int64) % np.int64(n_buckets)
        out = np.zeros(len(h64), dtype=bool)
        for b in np.unique(bucket):
            ent = tbl.get(int(b))
            if ent is None:
                continue
            n_bits, n_hashes, bits = ent
            mask = bucket == b
            h1, h2 = _hashes(u[mask])
            m = np.ones(mask.sum(), dtype=bool)
            for i in range(n_hashes):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
                m &= (byte & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))) != 0
            out[mask] = m
        return pd.Series(out)

    return maybe_seen


def bloom_prefilter(
    candidates: DataFrame,
    blooms: DataFrame,
    seen: DataFrame,
    n_buckets: int,
    broadcast_confirm: bool = True,
    probe_mode: str = "broadcast",
) -> DataFrame:
    """Two-phase dedup: bloom prune, exact confirm on the maybe-seen
    slice only. FP-safe: a false positive only costs an extra probe of
    the exact set, never a dropped URL.

    broadcast_confirm is the scale trick: in a crawl, most candidates
    are FRESH, so the maybe-set (true dups + ~fpp false positives) is
    small enough to broadcast. The confirm then runs as
        seen ⋉ broadcast(maybe_keys)   (stream seen, no shuffle)
        maybe ▷ broadcast(seen_hits)   (broadcast anti-join)
    — the 10^10-row seen table is scanned but NEVER shuffled. With
    broadcast_confirm=False it falls back to a shuffled anti-join
    (right when the maybe-set is genuinely huge).

    probe_mode 'broadcast' evaluates the filter inline (zero probe
    shuffle); 'cogroup' co-partitions filters and keys (for filter sets
    too big to broadcast)."""
    if probe_mode == "broadcast":
        maybe_col = broadcast_probe_col(candidates.sparkSession, blooms, n_buckets)
        cand2 = candidates.withColumn("maybe", maybe_col(F.col("h64")))
    else:
        probed = bloom_probe(candidates, blooms, n_buckets)
        cand2 = candidates.join(probed, "h64")
    fresh = cand2.filter(~F.col("maybe")).drop("maybe")
    maybe = cand2.filter(F.col("maybe")).drop("maybe")
    if broadcast_confirm:
        seen_hits = seen.join(
            F.broadcast(maybe.select("url_hash").distinct()), "url_hash", "left_semi"
        ).select("url_hash")
        confirmed = maybe.join(F.broadcast(seen_hits), "url_hash", "left_anti")
    else:
        confirmed = maybe.join(seen.select("url_hash"), "url_hash", "left_anti")
    return fresh.unionByName(confirmed)


def update_blooms(
    blooms: DataFrame,
    new_keys: DataFrame,
    n_buckets: int,
    expected_per_bucket: int = 100_000,
    fpp: float = 0.03,
) -> DataFrame:
    """Incremental maintenance: OR the new keys' bits into the existing
    per-bucket filters (bloom insertion is a bitwise union — no rebuild).
    Buckets with no new keys pass through untouched; brand-new buckets
    get default sizing. This is what makes the filter table cheap to
    keep per round: only touched buckets rewrite."""
    d_bits, d_hashes = sizing(expected_per_bucket, fpp)

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left: existing filter rows (0 or 1); right: new (bucket, h64) keys
        if right.empty:
            return left[[f.name for f in BLOOM_SCHEMA.fields]]
        if left.empty:
            n_bits, n_hashes, n_old = d_bits, d_hashes, 0
            bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
            bucket = int(right["bucket"].iloc[0])
        else:
            n_bits = int(left["n_bits"].iloc[0])
            n_hashes = int(left["n_hashes"].iloc[0])
            n_old = int(left["n_keys"].iloc[0])
            bits = np.frombuffer(left["bits"].iloc[0], dtype=np.uint8).copy()
            bucket = int(left["bucket"].iloc[0])
        u = _u64(right["h64"])
        h1, h2 = _hashes(u)
        for i in range(n_hashes):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
                "n_keys": [n_old + len(right)],
                "bits": [bits.tobytes()],
            }
        )

    keys_b = new_keys.select("h64").withColumn("bucket", bucket_col("h64", n_buckets))
    return (
        blooms.groupby("bucket")
        .cogroup(keys_b.groupby("bucket"))
        .applyInPandas(merge, BLOOM_SCHEMA)
    )


def saturated_buckets(blooms: DataFrame, max_fill: float = 0.5) -> DataFrame:
    """Maintenance: buckets whose key count exceeded the sizing budget
    (fill factor ≈ n_keys/expected). Rebuild those from the exact seen
    set with a larger expected count (compaction / delete support)."""
    return blooms.filter(
        F.col("n_keys") * F.col("n_hashes") > F.col("n_bits") * F.lit(max_fill)
    ).select("bucket", "n_keys")
