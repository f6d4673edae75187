"""Partitioned cuckoo-filter URL-seen set (X4 scale path, north rule).

The Bloom path (dedup.py) supports only insert — a cascade delete must
REBUILD affected buckets from the exact seen set (O(|bucket|) scans on a
delete round). A cuckoo filter stores 16-bit fingerprints in a 4-slot
cell table with two candidate cells per key, so membership, batch
insert AND targeted delete are all native: deleting a site removes just
that site's fingerprints — O(|site|) work, no rebuild, no 10^10-row
seen rescan. (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14 — public paper; reference crawler has no filter at
all, its seen set is an in-memory Python set, crawler.py:92-104.)

Partitioning contract matches the Bloom path exactly: one filter row
per bucket = pmod(h64, n_buckets) (SIGNED pmod — bucket_col), built /
updated / deleted / probed via cogrouped applyInPandas so each bucket's
table meets only its own key slice and nothing large ever reaches the
driver. Inserts are numpy-vectorized two-pass bulk placement (rank
within target cell vs free slots); the only per-item Python is the
rare eviction chain for cells that fill during bulk placement and the
delete slot-clear — both bounded by the DELTA size, never the corpus.

No false negatives: every inserted key is either in its table slots or
in the bucket's stash (evictions that found no home land there, spilled
as (cell, fp) codes). Deletes follow the standard cuckoo contract:
only keys previously inserted may be deleted — the engine deletes
exactly the seen-table rows it cascades, so the contract holds by
construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.operators.dedup import _u64, bucket_col

SLOTS = 4
_FP_MULT = np.uint64(0x5BD1E995)
# splitmix64-style mixer for the primary-cell derivation: the partition
# bucket is pmod(h64, n_buckets), which for power-of-two n_buckets FIXES
# the low bits of every key in a bucket — deriving c1 straight from the
# low bits collapsed n_buckets-worth of cells (measured: stash spills
# from ~0.57 load vs 0.84 for unconstrained keys, and any non-empty
# stash flags the bucket for a saturation rebuild). Multiplying first
# mixes every input bit into the output; taking bits 32.. keeps c1
# independent of both the bucket key (low bits) and fp (high 16 bits).
_CELL_MULT = np.uint64(0x9E3779B97F4A7C15)

# Version stamp of the (fp, cell) derivation. A cuckoo filter only
# guarantees no-false-negatives under a FIXED cell function: a store
# persisted under an older derivation (e.g. the pre-mixer low-bits c1)
# probed with a newer one silently misses seen keys — and the prefilter
# treats a miss as definitively-unseen, breaking exactly-once dedup.
# Bump this whenever _fp_cells/_alt_cell change; the engine rebuilds
# stamped-stale (or unstamped legacy) filters from the exact seen set
# on the next round (see CrawlEngine, cuckoo_layout_stale).
CUCKOO_LAYOUT = 2

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_cells", T.LongType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("table", T.BinaryType(), False),
        T.StructField("stash", T.BinaryType(), False),
        # nullable: legacy stores lack the column and read as NULL,
        # which counts as stale
        T.StructField("layout", T.IntegerType(), True),
    ]
)


def cuckoo_sizing(expected: int, load: float = 0.7) -> int:
    """Cells (power of two) for `expected` keys at target load factor."""
    need = max(8, int(expected / (SLOTS * load)) + 1)
    return 1 << (need - 1).bit_length()


def _fp_cells(u: np.ndarray, n_cells: int):
    """(fingerprint, cell1, cell2) for uint64 keys. fp from the high 16
    bits (0 remapped — 0 marks an empty slot); cell1 from the low bits;
    cell2 = cell1 XOR hash(fp), the partial-key cuckoo displacement rule
    (either cell is recoverable from the other plus the fp)."""
    fp = (u >> np.uint64(48)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    mask = np.uint64(n_cells - 1)
    c1 = (((u * _CELL_MULT) >> np.uint64(32)) & mask).astype(np.int64)
    alt = ((fp.astype(np.uint64) * _FP_MULT) & mask).astype(np.int64)
    c2 = c1 ^ alt
    return fp, c1, c2


def _alt_cell(cell: int, fp: int, n_cells: int) -> int:
    return cell ^ int((np.uint64(fp) * _FP_MULT) & np.uint64(n_cells - 1))


def _insert(table: np.ndarray, stash: list, u: np.ndarray) -> None:
    """Vectorized bulk insert. Two placement passes (prefer cell1), rank
    of each item within its target cell vs the cell's free-slot count;
    leftovers (both cells full) run the classic eviction chain, spilling
    to the stash after 500 kicks."""
    n_cells = table.shape[0]
    fp, c1, c2 = _fp_cells(u, n_cells)
    placed = np.zeros(len(u), dtype=bool)
    for cells in (c1, c2):
        todo = np.flatnonzero(~placed)
        if todo.size == 0:
            break
        cc = cells[todo]
        order = np.argsort(cc, kind="stable")
        scc = cc[order]
        rank = np.arange(len(scc)) - np.searchsorted(scc, scc, side="left")
        free = (table[scc] == 0).sum(axis=1)
        accept = rank < free
        acc_items = todo[order[accept]]
        if acc_items.size:
            acc_cells = scc[accept]
            acc_rank = rank[accept]
            fs = (table[acc_cells] == 0).cumsum(axis=1)
            slot = (fs == (acc_rank + 1)[:, None]).argmax(axis=1)
            table[acc_cells, slot] = fp[acc_items]
            placed[acc_items] = True
    for idx in np.flatnonzero(~placed):
        cur_fp, cell = int(fp[idx]), int(c1[idx])
        for kick in range(500):
            empties = np.flatnonzero(table[cell] == 0)
            if empties.size:
                table[cell, empties[0]] = cur_fp
                break
            # victim slot pseudo-random from the kicked fingerprint (+kick
            # so a two-cell A<->B loop cannot replay the same slot choices
            # and burn all 500 kicks before stashing)
            victim_slot = (int(cur_fp) + kick) % SLOTS
            victim = int(table[cell, victim_slot])
            table[cell, victim_slot] = cur_fp
            cur_fp = victim
            cell = _alt_cell(cell, cur_fp, n_cells)
        else:
            stash.append((np.uint64(cell) << np.uint64(16)) | np.uint64(cur_fp))


def _lookup(table: np.ndarray, stash: np.ndarray, u: np.ndarray) -> np.ndarray:
    fp, c1, c2 = _fp_cells(u, table.shape[0])
    out = (table[c1] == fp[:, None]).any(axis=1) | (table[c2] == fp[:, None]).any(axis=1)
    if stash.size:
        e1 = (c1.astype(np.uint64) << np.uint64(16)) | fp
        e2 = (c2.astype(np.uint64) << np.uint64(16)) | fp
        out |= np.isin(e1, stash) | np.isin(e2, stash)
    return out


def _delete(table: np.ndarray, stash: list, u: np.ndarray) -> int:
    """Remove ONE fingerprint occurrence per key (table cell1, then
    cell2, then stash). Per-item loop — bounded by the delete set
    (a site cascade), never the corpus."""
    n_cells = table.shape[0]
    fp, c1, c2 = _fp_cells(u, n_cells)
    removed = 0
    stash_arr = np.asarray(stash, dtype=np.uint64)
    # mark-then-sweep: collect stash victims and apply ONE np.delete at
    # the end (np.delete inside the loop is an O(|stash|) array copy per
    # deleted key)
    stash_dead: set[int] = set()
    for i in range(len(u)):
        f = fp[i]
        hit = False
        for cell in (int(c1[i]), int(c2[i])):
            slots = np.flatnonzero(table[cell] == f)
            if slots.size:
                table[cell, slots[0]] = 0
                hit = True
                break
        if not hit and stash_arr.size:
            for cell in (int(c1[i]), int(c2[i])):
                code = (np.uint64(cell) << np.uint64(16)) | np.uint64(f)
                for j in np.flatnonzero(stash_arr == code):
                    if int(j) not in stash_dead:
                        stash_dead.add(int(j))
                        hit = True
                        break
                if hit:
                    break
        removed += int(hit)
    if stash_dead:
        stash_arr = np.delete(stash_arr, sorted(stash_dead))
    stash[:] = list(stash_arr)
    return removed


def _parse(row) -> tuple[np.ndarray, list, int, int]:
    n_cells = int(row["n_cells"])
    table = np.frombuffer(row["table"], dtype=np.uint16).reshape(n_cells, SLOTS).copy()
    stash = list(np.frombuffer(row["stash"], dtype=np.uint64))
    return table, stash, n_cells, int(row["n_keys"])


def _row(bucket: int, table: np.ndarray, stash: list, n_keys: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": [bucket],
            "n_cells": [table.shape[0]],
            "n_keys": [n_keys],
            "table": [table.tobytes()],
            "stash": [np.asarray(stash, dtype=np.uint64).tobytes()],
            "layout": [CUCKOO_LAYOUT],
        }
    )


def cuckoo_layout_stale(filters: DataFrame) -> bool:
    """True when any persisted bucket was written under a different
    (fp, cell) derivation than this code's — including unstamped legacy
    rows (NULL layout). Probing such a store gives false NEGATIVES, so
    the caller must rebuild from the exact seen set before trusting it.
    Driver-side cost: one tiny aggregate over n_buckets rows."""
    n = filters.filter(
        F.coalesce(F.col("layout"), F.lit(-1)) != F.lit(CUCKOO_LAYOUT)
    ).count()
    return n > 0


def build_cuckoo(
    seen: DataFrame,
    n_buckets: int = 64,
    expected_per_bucket: int = 100_000,
    load: float = 0.7,
) -> DataFrame:
    """Per-bucket cuckoo filters over seen.h64 -> CUCKOO_SCHEMA rows."""
    n_cells = cuckoo_sizing(expected_per_bucket, load)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((n_cells, SLOTS), dtype=np.uint16)
        stash: list = []
        _insert(table, stash, _u64(pdf["h64"]))
        return _row(int(pdf["bucket"].iloc[0]), table, stash, len(pdf))

    return (
        seen.withColumn("bucket", bucket_col("h64", n_buckets))
        .select("bucket", "h64")
        .groupBy("bucket")
        .applyInPandas(build, CUCKOO_SCHEMA)
    )


def update_cuckoos(
    filters: DataFrame,
    new_keys: DataFrame,
    n_buckets: int,
    expected_per_bucket: int = 100_000,
    load: float = 0.7,
) -> DataFrame:
    """Incremental insert of this round's keys — only touched buckets
    rewrite, untouched filters pass through (same maintenance cost shape
    as dedup.update_blooms)."""
    d_cells = cuckoo_sizing(expected_per_bucket, load)

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if right.empty:
            return left[[f.name for f in CUCKOO_SCHEMA.fields]]
        if left.empty:
            table = np.zeros((d_cells, SLOTS), dtype=np.uint16)
            stash: list = []
            n_old = 0
            bucket = int(right["bucket"].iloc[0])
        else:
            table, stash, _, n_old = _parse(left.iloc[0])
            bucket = int(left["bucket"].iloc[0])
        _insert(table, stash, _u64(right["h64"]))
        return _row(bucket, table, stash, n_old + len(right))

    keys_b = new_keys.select("h64").withColumn("bucket", bucket_col("h64", n_buckets))
    return (
        filters.groupby("bucket")
        .cogroup(keys_b.groupby("bucket"))
        .applyInPandas(merge, CUCKOO_SCHEMA)
    )


def delete_from_cuckoos(
    filters: DataFrame, del_keys: DataFrame, n_buckets: int
) -> DataFrame:
    """Targeted delete (the cuckoo advantage over Bloom): remove the
    given keys' fingerprints in place — O(|del_keys|), no rebuild."""

    def erase(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame({f.name: [] for f in CUCKOO_SCHEMA.fields}).astype(
                {"bucket": "int32", "n_cells": "int64", "n_keys": "int64"}
            )
        if right.empty:
            return left[[f.name for f in CUCKOO_SCHEMA.fields]]
        table, stash, _, n_old = _parse(left.iloc[0])
        removed = _delete(table, stash, _u64(right["h64"]))
        return _row(int(left["bucket"].iloc[0]), table, stash, n_old - removed)

    keys_b = del_keys.select("h64").withColumn("bucket", bucket_col("h64", n_buckets))
    return (
        filters.groupby("bucket")
        .cogroup(keys_b.groupby("bucket"))
        .applyInPandas(erase, CUCKOO_SCHEMA)
    )


def broadcast_cuckoo_probe_col(spark, filters: DataFrame, n_buckets: int):
    """Collect+broadcast the filters, probe inline (no shuffle, no
    join-back) — mirror of dedup.broadcast_probe_col, with the same
    SIGNED-pmod bucketing (numpy int64 %% follows pmod semantics)."""
    table = {
        int(r["bucket"]): (
            np.frombuffer(r["table"], dtype=np.uint16).reshape(int(r["n_cells"]), SLOTS),
            np.frombuffer(r["stash"], dtype=np.uint64),
        )
        for r in filters.collect()
    }
    bc = spark.sparkContext.broadcast(table)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h64: pd.Series) -> pd.Series:
        tbl = bc.value
        u = _u64(h64)
        bucket = h64.to_numpy(dtype=np.int64) % np.int64(n_buckets)
        out = np.zeros(len(h64), dtype=bool)
        for b in np.unique(bucket):
            ent = tbl.get(int(b))
            if ent is None:
                continue
            mask = bucket == b
            out[mask] = _lookup(ent[0], ent[1], u[mask])
        return pd.Series(out)

    return maybe_seen


CUCKOO_PROBE_SCHEMA = T.StructType(
    [T.StructField("h64", T.LongType()), T.StructField("maybe", T.BooleanType())]
)


def cuckoo_probe(keys: DataFrame, filters: DataFrame, n_buckets: int) -> DataFrame:
    """Cogrouped probe: each bucket's table meets only its key slice —
    for filter sets too large to broadcast."""

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame({"h64": [], "maybe": []}).astype(
                {"h64": "int64", "maybe": "bool"}
            )
        if right.empty:
            return pd.DataFrame({"h64": left["h64"], "maybe": False})
        table, stash, _, _ = _parse(right.iloc[0])
        return pd.DataFrame(
            {"h64": left["h64"], "maybe": _lookup(table, np.asarray(stash, dtype=np.uint64), _u64(left["h64"]))}
        )

    keyed = keys.select("h64").withColumn("bucket", bucket_col("h64", n_buckets))
    return (
        keyed.groupby("bucket")
        .cogroup(filters.groupby("bucket"))
        .applyInPandas(probe, CUCKOO_PROBE_SCHEMA)
    )


def cuckoo_prefilter(
    candidates: DataFrame,
    filters: DataFrame,
    seen: DataFrame,
    n_buckets: int,
    broadcast_confirm: bool = True,
    probe_mode: str = "broadcast",
) -> DataFrame:
    """Two-phase dedup, same FP-safe contract as dedup.bloom_prefilter:
    filter prune, exact confirm on the maybe-seen slice only — a false
    positive costs one extra exact probe, never a dropped URL."""
    if probe_mode == "broadcast":
        maybe_col = broadcast_cuckoo_probe_col(candidates.sparkSession, filters, n_buckets)
        cand2 = candidates.withColumn("maybe", maybe_col(F.col("h64")))
    else:
        probed = cuckoo_probe(candidates, filters, n_buckets)
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


def saturated_cuckoo_buckets(filters: DataFrame, max_load: float = 0.84) -> DataFrame:
    """Buckets past the safe load factor (or with a non-empty stash) —
    rebuild those bigger from the exact seen set, exactly like the Bloom
    saturation path."""
    return filters.filter(
        (F.col("n_keys") > F.col("n_cells") * F.lit(SLOTS) * F.lit(max_load))
        | (F.length("stash") > 0)
    ).select("bucket", "n_keys")
