import gc

import pytest

from crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # tiny fixtures: AQE's per-stage re-planning only adds driver latency here
    s = get_spark(
        app="crawler-spark-tests",
        cpus=8,
        shuffle_partitions=4,
        driver_memory="24g",
        extra={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.warehouse.dir": "/tmp/crawler-spark-test-warehouse",
            # The suite multiplexes ~400 tests through ONE JVM for ~1.5 h.
            # ContextCleaner frees block-manager state (localCheckpoints,
            # broadcasts, shuffles) only when JVM GC fires its weakrefs;
            # Spark's default periodic-GC escape hatch is 30min — far too
            # lazy here, the heap filled with dead blocks late in the run
            # (py4j errors from test_vector_index onward, all green in a
            # fresh JVM). 5min keeps the cleaner ahead of accumulation.
            "spark.cleaner.periodicGC.interval": "5min",
        },
    )
    yield s


@pytest.fixture(autouse=True, scope="module")
def _jvm_hygiene():
    """Per-module JVM housekeeping for the shared session: drop Python
    references so ContextCleaner can reap checkpoint/broadcast blocks,
    and clear the SQL cache (recompute is always correct; stale cached
    plans from a finished module are pure ballast)."""
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        try:
            active.catalog.clearCache()
        except Exception:
            pass  # session torn down mid-flight; nothing to clean
    gc.collect()
