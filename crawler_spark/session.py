"""SparkSession factory tuned for the sandbox (local[N]) but cluster-safe.

Every knob here is also correct on a real multi-executor cluster: AQE for
runtime re-planning/skew splitting, Arrow for pandas-UDF transfer, UTC so
DuckDB oracle comparisons are stable, shuffle partitions sized to cores
locally (on a cluster AQE coalesces the default up/down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "crawler-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. In local mode the
    driver is the only JVM so ``driver_memory`` is the one memory knob.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Ship crawler_spark to Python workers (the --py-files mechanism).

    Driver-side sys.path doesn't propagate to the python worker
    processes that run pandas UDFs, so zip the package and addPyFile it
    — works identically in local mode and on a cluster.
    """
    import zipfile

    import crawler_spark

    pkg_dir = os.path.dirname(os.path.abspath(crawler_spark.__file__))
    zip_path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"), "crawler_spark_pyfiles.zip"
    )
    tmp = zip_path + f".{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.join(
                        "crawler_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
