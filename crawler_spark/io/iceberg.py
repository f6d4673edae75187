"""Iceberg-backed TableIO (SURVEY.md M9) — the cluster snapshot store.

Semantically identical to ParquetSnapshotIO: snapshot-id ≙ manifest
version, round commit ≙ one multi-table transaction, incremental scan ≙
path-list diff. The sandbox has no iceberg-spark-runtime jar (verified),
so this impl is code-complete but import-gated; the test suite runs on
ParquetSnapshotIO (plus pure-python DDL/manifest-shape tests here).

Cluster setup (public Iceberg docs):
    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.crawl.type=hadoop \
      --conf spark.sql.catalog.crawl.warehouse=s3://bucket/warehouse

Table layout (DDL issued by ensure_table, see table_ddl):
    frontier/frontier_state/seen bucketed by `bucket(64, url_hash)` —
    the co-located anti-join/merge layout benchmarked in
    BENCH/BASELINE.md; documents partitioned by bucket(doc_id); append
    tables partitioned by round.

Atomicity model (matches the parquet manifest pointer-swap):
    every commit stages its table writes, then appends ONE row to a
    `manifest` table carrying (version, round, CUMULATIVE per-table
    snapshot ids, cumulative meta). Readers ALWAYS pin reads to the
    snapshot ids in the latest manifest row — never spark.table() on
    the live table — so a crash between table writes and the manifest
    append leaves only invisible orphan snapshots, not a torn
    multi-table state. Overwrites use truncate-then-replace semantics
    (overwrite(lit(True))), NOT dynamic partition overwrite: a
    partition with no rows in the new DataFrame must come back empty
    (e.g. a bucket fully emptied by a cascade delete).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.io.snapshot import TableIO


def iceberg_available(spark: SparkSession) -> bool:
    # NB: `spark._jvm.org.apache.iceberg.X` never raises — py4j hands
    # back a lazy JavaPackage for any dotted path — so the probe must
    # actually load the class
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Snapshot")  # type: ignore[union-attr]
        return True
    except Exception:
        return False


BUCKETED = {"frontier": "url_hash", "frontier_state": "url_hash", "seen": "url_hash"}
DOC_BUCKETED = {"documents": "doc_id"}
ROUND_PARTITIONED = {"records", "crawl_order", "metrics", "fetch_log", "lineage"}

MANIFEST_SCHEMA = "version int, round int, snapshots string, meta string"


def table_ddl(name: str, schema, ident: str, n_buckets: int = 64) -> str:
    """CREATE TABLE statement for one engine table (pure function so the
    DDL shape is unit-testable without the Iceberg jar)."""
    if name in BUCKETED:
        part = f" PARTITIONED BY (bucket({n_buckets}, {BUCKETED[name]}))"
    elif name in DOC_BUCKETED:
        part = f" PARTITIONED BY (bucket({n_buckets}, {DOC_BUCKETED[name]}))"
    elif name in ROUND_PARTITIONED:
        part = " PARTITIONED BY (round)"
    else:
        part = ""
    ddl_cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    return f"CREATE TABLE IF NOT EXISTS {ident} ({ddl_cols}) USING iceberg{part}"


class IcebergTableIO(TableIO):
    """Round-commit semantics over an Iceberg catalog (docstring above)."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: str,
        db: str = "crawl",
        n_buckets: int = 64,
        schemas: dict | None = None,
    ):
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime not on the classpath; use "
                "ParquetSnapshotIO in this environment"
            )
        self.spark = spark
        self.prefix = f"{catalog}.{db}"
        self.n_buckets = n_buckets
        self.schemas = schemas or {}
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.prefix}")
        # pre-create every declared table (CREATE IF NOT EXISTS — cheap
        # catalog no-ops after the first run): the engine reads tables
        # like `seen` before their first commit, which must come back as
        # empty DataFrames, exactly like ParquetSnapshotIO's
        # schema-backed empty reads
        for name, schema in self.schemas.items():
            self.ensure_schema(name, schema)

    def _ident(self, name: str) -> str:
        return f"{self.prefix}.{name}"

    def ensure_schema(self, name: str, schema) -> None:
        self.spark.sql(table_ddl(name, schema, self._ident(name), self.n_buckets))

    def ensure_table(self, name: str, df: DataFrame) -> None:
        self.ensure_schema(name, df.schema)

    # --- manifest ----------------------------------------------------------
    def _latest_manifest(self) -> dict:
        try:
            row = (
                self.spark.table(self._ident("manifest"))
                .orderBy(F.desc("version"))
                .first()
            )
        except Exception:
            row = None
        if row is None:
            return {"version": -1, "round": -1, "snapshots": {}, "meta": {}}
        return {
            "version": int(row.version),
            "round": int(row.round),
            "snapshots": json.loads(row.snapshots),
            "meta": json.loads(row.meta),
        }

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Pinned read: the snapshot id the latest manifest row recorded
        for this table — NEVER the live table, which may already carry
        staged-but-uncommitted writes of an in-flight (or crashed)
        round."""
        sid = self._latest_manifest()["snapshots"].get(name)
        if sid is None:
            # table never committed: declared-schema tables come back
            # empty even if a crashed round staged orphan rows into the
            # live table (pinning discipline extends to the empty case)
            schema = self.schemas.get(name)
            if schema is not None:
                return spark.createDataFrame([], schema)
            return spark.table(self._ident(name))
        return (
            spark.read.format("iceberg")
            .option("snapshot-id", str(sid))
            .load(self._ident(name))
        )

    # parquet-impl interface analogs used by the engine/drain:
    def table_rels(self, name: str) -> list[str]:
        sid = self._latest_manifest()["snapshots"].get(name)
        return [str(sid)] if sid is not None else []

    def table_paths(self, name: str) -> list[str]:
        return []  # path-count heuristics don't apply; see compact()

    def read_rels(self, spark: SparkSession, name: str, rels: list[str]) -> DataFrame:
        return (
            spark.read.format("iceberg")
            .option("snapshot-id", rels[-1])
            .load(self._ident(name))
        )

    def commit(self, round_no, appends=None, overwrites=None, meta=None, consumes=None) -> int:
        prev = self._latest_manifest()
        snap_ids: dict[str, int] = dict(prev["snapshots"])
        for name, rels in (consumes or {}).items():
            # keep only rows appended AFTER the consumed snapshot (a
            # concurrent producer's appends survive, consumed rows go)
            remaining = self.incremental_scan(name, int(rels[-1]))
            remaining.writeTo(self._ident(name)).overwrite(F.lit(True))
            snap_ids[name] = self._snapshot_id(name)
        for name, df in (appends or {}).items():
            self.ensure_table(name, df)
            df.writeTo(self._ident(name)).append()
            snap_ids[name] = self._snapshot_id(name)
        for name, df in (overwrites or {}).items():
            self.ensure_table(name, df)
            # truncate-then-replace: buckets emptied by the new state
            # must NOT retain stale rows (overwritePartitions would)
            df.writeTo(self._ident(name)).overwrite(F.lit(True))
            snap_ids[name] = self._snapshot_id(name)
        # manifest row last == the atomic commit point
        man = self.spark.createDataFrame(
            [
                (
                    prev["version"] + 1,
                    round_no,
                    json.dumps(snap_ids, sort_keys=True),
                    json.dumps({**prev["meta"], **(meta or {})}, sort_keys=True),
                )
            ],
            MANIFEST_SCHEMA,
        )
        self.ensure_table("manifest", man)
        man.writeTo(self._ident("manifest")).append()
        return prev["version"] + 1

    def _snapshot_id(self, name: str) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._ident(name)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row.snapshot_id) if row else -1

    def last_round(self) -> int:
        return self._latest_manifest()["round"]

    def rows_meta(self, key: str, default=None):
        return self._latest_manifest()["meta"].get(key, default)

    def incremental_scan(self, name: str, from_snapshot: int) -> DataFrame:
        """Snapshot-diff read (the mtime-watermark analog, SURVEY X3)."""
        return (
            self.spark.read.format("iceberg")
            .option("start-snapshot-id", str(from_snapshot))
            .load(self._ident(name))
        )

    def compact(self, spark: SparkSession, name: str, round_no: int) -> None:
        spark.sql(
            f"CALL {self.prefix.split('.')[0]}.system.rewrite_data_files"
            f"(table => '{self._ident(name)}')"
        )
