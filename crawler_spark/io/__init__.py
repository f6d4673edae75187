from crawler_spark.io.snapshot import ParquetSnapshotIO, TableIO

__all__ = ["TableIO", "ParquetSnapshotIO"]
