"""Jar-gated Iceberg integration suite: commit/read/resume against a
REAL hadoop catalog (round-2 VERDICT item 7).

The sandbox image has no iceberg-spark-runtime jar (pinned by
test_iceberg_ddl.test_iceberg_gate_raises_without_jar), so every test
here SKIPS in-sandbox. On any machine with the jar — a cluster edge
node or a laptop — ONE command certifies IcebergTableIO end-to-end,
unmodified:

    PYSPARK_SUBMIT_ARGS="--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 pyspark-shell" \\
        python -m pytest tests/test_iceberg_integration.py -q

(or the spark-submit spelling from io/iceberg.py's docstring with
`--conf spark.sql.catalog...` flags; this suite also self-configures a
hadoop catalog over a tmp warehouse at runtime — Spark resolves
spark.sql.catalog.* lazily at first reference, so no session restart
is needed.)

Coverage: atomic multi-table commits with pinned snapshot reads
(staged-but-unmanifested writes stay invisible), truncate-then-replace
overwrite semantics, consume-based pending_ingest drain, and the FULL
CrawlEngine round loop on Iceberg — kill/resume with crawl-order +
final-state equality against an uninterrupted ParquetSnapshotIO run
(the reference-parity oracle path, crawler.py:92-104 round semantics).
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import ENGINE_SCHEMAS, CrawlEngine, read_frontier_view
from crawler_spark.io import iceberg as I
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world

CATALOG = "itcat"


@pytest.fixture(scope="module")
def icat(spark, tmp_path_factory):
    """Configure a hadoop catalog over a module-scoped tmp warehouse;
    skip the whole module when the jar is absent (this sandbox)."""
    if not I.iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime not on classpath — run with "
            'PYSPARK_SUBMIT_ARGS="--packages org.apache.iceberg:'
            'iceberg-spark-runtime-4.0_2.13:<v> pyspark-shell" to certify'
        )
    wh = str(tmp_path_factory.mktemp("iceberg-warehouse"))
    spark.conf.set(f"spark.sql.catalog.{CATALOG}", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.warehouse", wh)
    return CATALOG


def make_io(spark, icat, db):
    return I.IcebergTableIO(spark, icat, db=db, schemas=ENGINE_SCHEMAS)


def test_commit_roundtrip_and_pinned_reads(spark, icat):
    io = make_io(spark, icat, "t_roundtrip")
    # never-committed declared table reads empty (engine round-1 contract)
    assert io.read(spark, "seen").count() == 0

    seen1 = spark.createDataFrame(
        [("u1", "h1", 1, "s", "h", 1), ("u2", "h2", 2, "s", "h", 1)],
        ENGINE_SCHEMAS["seen"],
    )
    v1 = io.commit(1, appends={"seen": seen1}, meta={"seq_total": 2})
    assert io.last_round() == 1 and io.rows_meta("seq_total") == 2
    assert io.read(spark, "seen").count() == 2

    # a staged-but-unmanifested write (crashed round) must stay invisible
    orphan = spark.createDataFrame([("u3", "h3", 3, "s", "h", 2)], ENGINE_SCHEMAS["seen"])
    orphan.writeTo(f"{icat}.t_roundtrip.seen").append()
    assert io.read(spark, "seen").count() == 2  # pinned to v1's snapshot

    # the next commit re-pins to the live head — the orphan rows become
    # visible then (same as parquet-manifest: orphans are garbage until
    # a commit supersedes them; here append-commit adopts the table head)
    v2 = io.commit(2, appends={"seen": spark.createDataFrame([], ENGINE_SCHEMAS["seen"])})
    assert v2 == v1 + 1


def test_overwrite_truncate_semantics(spark, icat):
    """A bucket emptied by the new state must come back EMPTY — the
    truncate-then-replace contract (dynamic partition overwrite would
    silently keep the old bucket's rows)."""
    io = make_io(spark, icat, "t_overwrite")
    rows = [(f"u{i}", f"h{i}", i, "s1" if i % 2 else "s2", "h", 1) for i in range(64)]
    io.commit(1, overwrites={"seen": spark.createDataFrame(rows, ENGINE_SCHEMAS["seen"])})
    survivors = io.read(spark, "seen").filter(F.col("site") == "s1")
    io.commit(2, overwrites={"seen": survivors})
    left = io.read(spark, "seen")
    assert left.count() == 32
    assert left.filter(F.col("site") == "s2").count() == 0


def test_consume_drain(spark, icat):
    """pending_ingest drain shape: pin rels, consume them in the same
    commit that appends the fold — rows appended AFTER the pinned
    snapshot survive the consume."""
    io = make_io(spark, icat, "t_consume")

    def frontier_rows(tag, n):
        return spark.createDataFrame(
            [(f"{tag}{i}", f"h{tag}{i}", i, "s", "h", 0, 0, "pending") for i in range(n)],
            ENGINE_SCHEMAS["pending_ingest"],
        )

    io.commit(0, appends={"pending_ingest": frontier_rows("a", 3)})
    rels = io.table_rels("pending_ingest")
    assert len(rels) == 1
    staged = io.read_rels(spark, "pending_ingest", rels)
    assert staged.count() == 3
    # concurrent producer appends AFTER the pin
    io.commit(0, appends={"pending_ingest": frontier_rows("b", 2)})
    io.commit(
        0,
        appends={"frontier": staged.select(*ENGINE_SCHEMAS["frontier"].fieldNames())},
        consumes={"pending_ingest": rels},
    )
    remaining = io.read(spark, "pending_ingest")
    assert remaining.count() == 2  # the b-rows survive
    assert remaining.filter(F.col("url").startswith("a")).count() == 0
    assert io.read(spark, "frontier").count() == 3


def engine_on(spark, io_obj):
    eng = CrawlEngine(spark, "", embed_dim=0, io=io_obj)
    return eng


def final_state(spark, eng):
    io = eng.io
    return {
        "order": tuple(
            (r.round, r.seq, r.site, r.url, r.status)
            for r in io.read(spark, "crawl_order").orderBy("seq").collect()
        ),
        "seen": frozenset((r.url_hash, r.url) for r in io.read(spark, "seen").collect()),
        "frontier": frozenset(
            (r.url_hash, r.url, r.state) for r in read_frontier_view(spark, io).collect()
        ),
    }


def test_engine_crawl_and_resume_on_iceberg(spark, icat, tmp_path):
    """The whole round loop against the catalog, killed after round 3 and
    resumed by a FRESH engine+IO (nothing in memory): final crawl order,
    seen set, and frontier must equal an uninterrupted parquet-IO run —
    i.e. the Iceberg backend changes storage, not one row of semantics."""
    world = make_world(seed=31, n_hosts=3, n_urls=18, budget=3, burst=False)
    tables = world.to_spark(spark)
    seeded = discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"])

    ref = CrawlEngine(spark, str(tmp_path / "parquet"), embed_dim=0)
    ref.seed(seeded)
    ref.run(tables, max_rounds=10)

    eng = engine_on(spark, make_io(spark, icat, "t_engine"))
    eng.seed(seeded)
    eng._control_rows = tables["control"].collect()
    for rnd in (1, 2, 3):
        eng.run_round(rnd, tables)

    resumed = engine_on(spark, make_io(spark, icat, "t_engine"))  # fresh IO, same catalog db
    assert resumed.io.last_round() == 3
    resumed.run(tables, max_rounds=10)

    assert final_state(spark, resumed) == final_state(spark, ref)


def test_engine_delete_cascade_on_iceberg(spark, icat):
    """delete_site's atomic multi-table cascade through the Iceberg
    commit path: site rows vanish from every site-keyed table in ONE
    manifest version."""
    world = make_world(seed=32, n_hosts=2, n_urls=10, budget=3, burst=False)
    tables = world.to_spark(spark)
    eng = engine_on(spark, make_io(spark, icat, "t_delete"))
    eng.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng._control_rows = tables["control"].collect()
    eng.run_round(1, tables)
    site = eng.io.read(spark, "seen").select("site").first().site
    before = eng.io._latest_manifest()["version"]
    eng.delete_site(site)
    assert eng.io._latest_manifest()["version"] == before + 1  # one commit
    assert eng.io.read(spark, "seen").filter(F.col("site") == site).count() == 0
    assert eng.io.read(spark, "documents").filter(F.col("site") == site).count() == 0
    states = {
        r.state
        for r in read_frontier_view(spark, eng.io).filter(F.col("site") == site).collect()
    }
    assert states <= {"deleted"}
