"""World generator determinism + snapshot IO atomicity."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark import schemas as S
from crawler_spark.io.snapshot import ParquetSnapshotIO
from crawler_spark.world import make_world


def _dir_bytes(path):
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )


def test_round_commits_are_delta_sized(spark, tmp_path):
    """Delta-state frontier: the round loop must never rewrite the
    frontier base — per-round commit IO is O(|transitions|+|links|),
    not O(|frontier|). Evidence: the seed version dir stays referenced
    untouched, every round adds only append paths, and each round's
    frontier_state delta is far smaller than the base."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier

    world = make_world(seed=33, n_hosts=3, n_urls=600, budget=2, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path), embed_dim=0)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    seed_rels = eng.io.table_rels("frontier")
    assert len(seed_rels) == 1
    eng._control_rows = t["control"].collect()
    per_round_rels = []
    for rnd in (1, 2, 3, 4):
        before = set(eng.io.table_rels("frontier")) | set(eng.io.table_rels("frontier_state"))
        eng.run_round(rnd, t)
        after = set(eng.io.table_rels("frontier")) | set(eng.io.table_rels("frontier_state"))
        assert before <= after  # pure appends: nothing rewritten/dropped
        per_round_rels.append(after - before)
    assert eng.io.table_rels("frontier")[0] == seed_rels[0]  # base untouched
    base_bytes = _dir_bytes(os.path.join(str(tmp_path), seed_rels[0]))
    for added in per_round_rels:
        state_adds = [r for r in added if "frontier_state" in r]
        assert state_adds  # every round committed its transitions as a delta
        for rel in state_adds:
            # a round's state delta carries <= budget*hosts tiny rows;
            # the base holds the whole frontier
            assert _dir_bytes(os.path.join(str(tmp_path), rel)) < base_bytes


def test_world_deterministic():
    w1 = make_world(seed=42, n_hosts=5, n_urls=50)
    w2 = make_world(seed=42, n_hosts=5, n_urls=50)
    pd.testing.assert_frame_equal(w1.web, w2.web)
    pd.testing.assert_frame_equal(w1.sitemaps, w2.sitemaps)
    w3 = make_world(seed=43, n_hosts=5, n_urls=50)
    assert not w1.web.equals(w3.web)


def test_world_shape():
    w = make_world(seed=42, n_hosts=5, n_urls=60)
    # power-law: host 0 owns ~30%
    counts = w.web.groupby("host").size()
    assert counts["h000.example.com"] == counts.max()
    # spans: offsets strictly increasing, media/text invariants
    for spans in w.web[w.web.status == 200].spans:
        offs = [s[3] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        for kind, text, media_ref, _ in spans:
            if kind == "media":
                assert text == "" and media_ref != ""
            else:
                assert media_ref == ""
    # every 4xx/timeout page has no spans
    assert all(len(s) == 0 for s in w.web[w.web.status != 200].spans)


def test_world_to_spark_schemas(spark):
    w = make_world(seed=42, n_hosts=3, n_urls=20)
    t = w.to_spark(spark)
    assert t["web"].schema == S.WEB
    assert t["web"].count() == len(w.web)
    assert t["robots"].schema == S.ROBOTS


def test_snapshot_commit_and_read(spark, tmp_path):
    io = ParquetSnapshotIO(str(tmp_path), schemas={"t": S.SEEDS})
    assert io.read(spark, "t").count() == 0  # empty-with-schema
    df1 = spark.createDataFrame([("u1", "s1")], S.SEEDS)
    io.commit(1, appends={"t": df1})
    df2 = spark.createDataFrame([("u2", "s2")], S.SEEDS)
    io.commit(2, appends={"t": df2})
    assert io.read(spark, "t").count() == 2  # appends accumulate
    io.commit(3, overwrites={"t": df1})
    assert io.read(spark, "t").count() == 1  # overwrite resets
    assert io.last_round() == 3


def test_snapshot_atomicity(spark, tmp_path):
    """A half-written version (no CURRENT swap) must be invisible."""
    io = ParquetSnapshotIO(str(tmp_path), schemas={"t": S.SEEDS})
    io.commit(1, appends={"t": spark.createDataFrame([("u1", "s1")], S.SEEDS)})
    v = io.current_version()
    # simulate a crash: stage a new version dir + manifest but no pointer swap
    io._write_version_dir("t", v + 1, spark.createDataFrame([("u2", "s2")], S.SEEDS))
    assert io.current_version() == v
    assert io.read(spark, "t").count() == 1


def test_snapshot_compact(spark, tmp_path):
    io = ParquetSnapshotIO(str(tmp_path), schemas={"t": S.SEEDS})
    for i in range(4):
        io.commit(i, appends={"t": spark.createDataFrame([(f"u{i}", "s")], S.SEEDS)})
    assert len(io.table_paths("t")) == 4
    io.compact(spark, "t", 99)
    assert len(io.table_paths("t")) == 1
    assert io.read(spark, "t").count() == 4


def test_commit_lock_across_io_instances(spark, tmp_path):
    """Two IO instances on one root (the two-driver-processes shape —
    flock excludes per open file, so two instances in one process model
    it exactly): interleaved concurrent appends must all survive the
    read-modify-swap; without the cross-process lock the loser's paths
    were silently dropped from the manifest."""
    from concurrent.futures import ThreadPoolExecutor

    a = ParquetSnapshotIO(str(tmp_path), schemas={"t": S.SEEDS})
    b = ParquetSnapshotIO(str(tmp_path), schemas={"t": S.SEEDS})

    def appender(io, tag):
        for i in range(6):
            io.commit(i, appends={"t": spark.createDataFrame([(f"{tag}{i}", "s")], S.SEEDS)})

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(lambda args: appender(*args), [(a, "a"), (b, "b")]))
    got = sorted(r.url for r in a.read(spark, "t").collect())
    assert got == sorted([f"a{i}" for i in range(6)] + [f"b{i}" for i in range(6)])
