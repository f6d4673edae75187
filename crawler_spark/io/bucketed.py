"""Bucketed snapshot IO: the co-located hot-join layout, in the engine.

`BucketedSnapshotIO` extends the parquet snapshot store by keeping the
url_hash-keyed tables (frontier, seen) as Spark BUCKETED tables —
the sandbox analog of Iceberg `bucket(url_hash, N)` partitioning
benchmarked in BENCH/BASELINE.md:

- frontier: one bucketed table per version (overwrite semantics) —
  atomicity untouched, the manifest pointer still decides visibility;
- seen: one bucketed table per round delta (append semantics). Reading
  returns the UNION for scans; `anti_join_seen` instead CHAINS
  left_anti joins across the deltas — every link is co-located
  (HashPartitioning(url_hash, N) on both sides), so the seen side is
  never shuffled and the candidate side at most once. Compaction
  (engine.maintain) keeps the chain short.

Catalog notes: bucketed writes need saveAsTable; tables are EXTERNAL
(data under the snapshot root) and re-registered per session from the
manifest, so resume works across processes just like the parquet store.

Adaptive layout: bucketed saveAsTable pays ~18% DDL/commit overhead
that only earns out once the dedup exchange dominates, so each version
dir picks its format at write time — plain parquet while the table's
on-disk bytes are under `min_bucket_bytes`, bucketed beyond. The
manifest path prefix records the choice (v{n} plain, b{n} bucketed);
reads and the chained anti-join handle mixed chains (a small plain
delta broadcasts anyway — co-location only matters for the big links).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.io.snapshot import ParquetSnapshotIO

BUCKETED_TABLES = ("frontier", "frontier_state", "seen")


def _ddl_cols(schema) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


class BucketedSnapshotIO(ParquetSnapshotIO):
    def __init__(
        self,
        root: str,
        schemas=None,
        n_buckets: int = 16,
        table_prefix: str | None = None,
        min_bucket_bytes: int = 32 << 20,
    ):
        super().__init__(root, schemas)
        self.n_buckets = n_buckets
        self.min_bucket_bytes = min_bucket_bytes
        # unique prefix per snapshot root so parallel engines/tests don't
        # collide in the shared session catalog
        self.prefix = table_prefix or ("snap_" + hex(abs(hash(os.path.abspath(root))))[2:10])

    def _table_bytes(self, name: str) -> int:
        total = 0
        for p in self.table_paths(name):
            for r, _, fs in os.walk(p):
                total += sum(os.path.getsize(os.path.join(r, f)) for f in fs)
        return total

    # --- naming ------------------------------------------------------------
    def _tbl(self, name: str, version: int) -> str:
        return f"{self.prefix}_{name}_v{version}"

    def _loc(self, name: str, version: int) -> str:
        return os.path.join(self.root, "tables", name, f"b{version}")

    # --- write -------------------------------------------------------------
    def _write_version_dir(self, name: str, version: int, df: DataFrame) -> str:
        if name not in BUCKETED_TABLES:
            return super()._write_version_dir(name, version, df)
        if self._table_bytes(name) < self.min_bucket_bytes:
            # adaptive: small table -> plain parquet (v-prefix rel),
            # skipping the saveAsTable/DDL overhead
            return super()._write_version_dir(name, version, df)
        spark = df.sparkSession
        tbl = self._tbl(name, version)
        loc = self._loc(name, version)
        if os.path.exists(loc):
            shutil.rmtree(loc)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.bucketBy(self.n_buckets, "url_hash")
            .sortBy("url_hash")
            .option("path", loc)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        return os.path.relpath(loc, self.root)

    # --- read --------------------------------------------------------------
    def _register(self, spark: SparkSession, name: str, rel: str) -> str:
        """(Re-)attach the bucketed external table for this session."""
        version = os.path.basename(rel)[1:]
        tbl = self._tbl(name, version)
        if not spark.catalog.tableExists(tbl):
            spark.sql(
                f"CREATE TABLE {tbl} ({_ddl_cols(self.schemas[name])}) USING PARQUET "
                f"CLUSTERED BY (url_hash) SORTED BY (url_hash) INTO {self.n_buckets} BUCKETS "
                f"LOCATION '{os.path.join(self.root, rel)}'"
            )
        return tbl

    def _rels(self, name: str) -> list[str]:
        return self.manifest()["tables"].get(name, [])

    def _largest_bucketed_rel(self, rels: list[str]) -> int:
        """Index of the biggest b-prefix rel (-1 if none): the one scan
        worth keeping bucketed when a union caps bucketed leaves at one."""
        best, best_bytes = -1, -1
        for i, rel in enumerate(rels):
            if not os.path.basename(rel).startswith("b"):
                continue
            p = os.path.join(self.root, rel)
            n = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(p)
                for f in fs
            )
            if n > best_bytes:
                best, best_bytes = i, n
        return best

    def _read_rel(
        self, spark: SparkSession, name: str, rel: str, bucketed: bool = True
    ) -> DataFrame:
        """One delta scan: bucketed catalog scan for a b-prefix rel,
        plain parquet otherwise. bucketed=False reads a bucketed dir as
        a plain parquet scan (ordinary parquet files underneath) — the
        scan then carries NO partitioning claim, see the read() warning."""
        if bucketed and os.path.basename(rel).startswith("b"):
            return spark.table(self._register(spark, name, rel))
        return spark.read.schema(self.schemas[name]).parquet(os.path.join(self.root, rel))

    def read_deltas(
        self, spark: SparkSession, name: str, bucketed: bool = True
    ) -> list[DataFrame]:
        """The table as a list of delta scans (oldest first)."""
        return [self._read_rel(spark, name, rel, bucketed) for rel in self._rels(name)]

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Full-scan read. A union of >1 deltas deliberately uses PLAIN
        parquet scans, never the bucketed catalog tables: Spark 4.1
        aligns MULTIPLE same-bucketed scans under a Union and keeps the
        HashPartitioning(url_hash, N) claim even though the union
        physically concatenates partitions (k children x N partitions,
        two partitions per bucket), so a downstream url_hash groupBy/
        join SKIPS its exchange — measured: groupBy over a union of two
        same-bucketed scans returned every key TWICE (split groups), and
        a sort-merge join crashed with 'Can't zip RDDs with unequal
        numbers of partitions'. The poisoning needs >= 2 DISTINCT
        bucketed scans among the union's leaves: a single bucketed
        child, or one shared by every child (e.g. a common join side),
        is measured-safe — pinned by test_bucketed_io. Plain scans carry
        no partitioning claim, so EnsureRequirements inserts the correct
        exchange. Single-delta reads keep the bucketed scan — one
        catalog scan's claim is true. Co-located operators
        (anti_join_seen, frontier_view) join each bucketed scan SINGLY,
        never unioning two of them."""
        if name not in BUCKETED_TABLES:
            return super().read(spark, name)
        rels = self._rels(name)
        if not rels:
            return spark.createDataFrame([], self.schemas[name])
        if len(rels) == 1:
            return self._read_rel(spark, name, rels[0])
        out = self._read_rel(spark, name, rels[0], bucketed=False)
        for rel in rels[1:]:
            out = out.unionByName(self._read_rel(spark, name, rel, bucketed=False))
        return out

    # --- the exchange-free frontier merge ----------------------------------
    def _latest_state(self, deltas: DataFrame) -> DataFrame:
        """One state delta table reduced to its per-url_hash winning
        (round, prio, state) triple. On a bucketed scan this groupBy
        needs no exchange — HashPartitioning(url_hash, N) already
        satisfies the aggregation's required distribution."""
        from crawler_spark import schemas as S

        return deltas.groupBy("url_hash").agg(
            F.max(
                F.struct(
                    F.col("round"),
                    S.state_prio(F.col("state")).alias("prio"),
                    F.col("state"),
                )
            ).alias("_d")
        )

    def frontier_view(self, spark: SparkSession) -> DataFrame:
        """Effective frontier with the latest-wins state merge pushed
        BELOW the base union: ALL state deltas reduce to ONE per-key
        winning triple (`_latest_state` over their union), and each base
        delta (disjoint url_hash sets by dedup) takes a single co-located
        left join against it — plan size O(bases + states). The earlier
        design chained every base through every state delta: O(B×S)
        joins, and between compactions B and S both grow one per round,
        so round wall time grew superlinearly with crawl age (measured
        15s→60s over 8 rounds at fixed data size — pure plan/launch
        cost).

        Exchange budget: the COMPACTED base (the first, largest rel)
        never shuffles — bucketed scan ⋈ left join preserves its
        partitioning. Later base rels are the small per-round discovery
        deltas; they are read PLAIN (their join exchange is O(|delta|))
        because a union holding >= 2 distinct bucketed scans triggers
        Spark 4.1's bogus partitioning claim (see read()) — with exactly
        one bucketed leaf per side the union claims nothing and
        downstream url_hash grouping stays correct (measured; pinned by
        test_frontier_view_union_groups_correctly). The state side is
        exchange-free while there is ≤1 state delta (its bucketed scan
        is SHARED by every union child — the safe shape); with several,
        the union costs ONE hash exchange of the deltas — O(|transitions
        since compaction|), i.e. the same delta-sized quantum the commit
        path already writes, never O(|frontier|) — and exchange reuse
        (spark.sql.exchangeReuseEnabled) computes it once across all B
        joins. Small delta aggregates broadcast instead under AQE.
        maintain() keeps both chains short."""
        base_rels = self._rels("frontier")
        if not base_rels:
            return spark.createDataFrame([], self.schemas["frontier"])
        # only the LARGEST bucketed base keeps its bucketed scan when
        # several rels exist — co-location where it pays, one bucketed
        # leaf where it must (the compacted base holds ~all the bytes;
        # the rest are per-round discovery deltas)
        keep = self._largest_bucketed_rel(base_rels)
        bases = [
            self._read_rel(spark, "frontier", rel, bucketed=(i == keep))
            for i, rel in enumerate(base_rels)
        ]
        # >1 state deltas: union PLAIN scans (see read()). A single
        # bucketed delta keeps its (true) claim and aggregates
        # exchange-free.
        state_rels = self._rels("frontier_state")
        states = [
            self._read_rel(spark, "frontier_state", rel, bucketed=len(state_rels) == 1)
            for rel in state_rels
        ]
        latest = None
        if states:
            union = states[0]
            for s in states[1:]:
                union = union.unionByName(s)
            latest = self._latest_state(union)
        cols = [f.name for f in self.schemas["frontier"].fields]
        merged = []
        for b in bases:
            if latest is None:
                merged.append(b.select(*cols))
                continue
            # any state row beats the base's inserted state: an overwrite
            # of the base folds+clears frontier_state in the same commit
            # (engine invariant), so live deltas are always newer
            merged.append(
                b.join(latest, "url_hash", "left")
                .withColumn("state", F.coalesce(F.col("_d.state"), F.col("state")))
                .select(*cols)
            )
        out = merged[0]
        for m in merged[1:]:
            out = out.unionByName(m)
        return out

    # --- the exchange-free dedup path --------------------------------------
    def anti_join_seen(self, spark: SparkSession, candidates: DataFrame) -> DataFrame:
        """candidates ▷ seen as a CHAIN of co-located anti-joins over the
        bucketed deltas: cand ▷ s1 ▷ s2 ▷ ... — equivalent to the anti-
        join against the union, but each link reads a bucketed scan so
        the seen side never shuffles."""
        out = candidates
        for delta in self.read_deltas(spark, "seen"):
            out = out.join(delta.select("url_hash"), "url_hash", "left_anti")
        return out
