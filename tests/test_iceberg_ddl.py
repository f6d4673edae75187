"""IcebergTableIO is jar-gated (no iceberg-spark-runtime in this image),
but its DDL and manifest shapes are checkable without the jar: every
generated CREATE TABLE must parse under Spark's SQL parser (DSv2
transform syntax), and the manifest row schema must round-trip."""

import json

import pytest

from crawler_spark.engine import ENGINE_SCHEMAS
from crawler_spark.io import iceberg as I


@pytest.mark.parametrize("name", sorted(ENGINE_SCHEMAS))
def test_table_ddl_parses(spark, name):
    ddl = I.table_ddl(name, ENGINE_SCHEMAS[name], f"crawl.db.{name}", 64)
    # parsePlan validates syntax (incl. bucket(...) partition transforms)
    # without executing — no catalog or jar needed
    spark._jsparkSession.sessionState().sqlParser().parsePlan(ddl)
    if name in ("frontier", "frontier_state", "seen"):
        assert "PARTITIONED BY (bucket(64, url_hash))" in ddl
    if name == "documents":
        assert "PARTITIONED BY (bucket(64, doc_id))" in ddl


def test_manifest_schema_roundtrip(spark):
    snaps = {"frontier": 12, "seen": 7}
    meta = {"seq_total": 42, "mode": "reference"}
    df = spark.createDataFrame(
        [(3, 5, json.dumps(snaps, sort_keys=True), json.dumps(meta, sort_keys=True))],
        I.MANIFEST_SCHEMA,
    )
    row = df.first()
    assert json.loads(row.snapshots) == snaps
    assert json.loads(row.meta) == meta
    assert (row.version, row.round) == (3, 5)


def test_iceberg_gate_raises_without_jar(spark):
    assert not I.iceberg_available(spark)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        I.IcebergTableIO(spark, "crawl")
