"""Bucketed snapshot IO: equality with the oracle + exchange-free plan."""

from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.operators.scheduler import gate_candidates
from crawler_spark.oracle import Oracle
from crawler_spark.world import make_world


def _scans_under_shuffles(df) -> list[str]:
    """Full (untruncated) schema strings of leaf scans sitting beneath
    any shuffle Exchange in the executed plan (broadcasts excluded; AQE
    is off in the test session, so the static plan tree is the real
    one). Schema identifies the table — node.toString() truncates the
    file path."""
    out: list[str] = []

    def walk(node, under: bool) -> None:
        under = under or node.nodeName() == "Exchange"
        kids = node.children()
        if kids.size() == 0 and under:
            out.append(node.schema().catalogString())
        for i in range(kids.size()):
            walk(kids.apply(i), under)

    walk(df._jdf.queryExecution().executedPlan(), False)
    return out


def test_bucketed_engine_equals_oracle(spark, tmp_path):
    world = make_world(seed=19, n_hosts=3, n_urls=20, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path), embed_dim=0, bucketed_io=8, bucketed_min_bytes=0)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=10)
    ora = Oracle(world).run(max_rounds=10)
    got = [
        (r.round, r.seq, r.site, r.url, r.status)
        for r in eng.io.read(spark, "crawl_order").orderBy("seq").collect()
    ]
    assert got == ora.crawl_order
    gs = {(r.url_hash, r.url) for r in eng.io.read(spark, "seen").collect()}
    assert gs == set(ora.seen.items())


def test_bucketed_resume_reregisters(spark, tmp_path):
    world = make_world(seed=20, n_hosts=2, n_urls=12, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path), embed_dim=0, bucketed_io=8, bucketed_min_bytes=0)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    eng.run_round(1, t)
    # fresh engine object on the same root (catalog entries must
    # re-register from the manifest)
    eng2 = CrawlEngine(spark, str(tmp_path), embed_dim=0, bucketed_io=8, bucketed_min_bytes=0)
    assert eng2.io.last_round() == 1
    n_seen = eng2.io.read(spark, "seen").count()
    assert n_seen > 0
    eng2._control_rows = t["control"].collect()
    eng2.run_round(2, t)
    assert eng2.io.read(spark, "seen").count() > n_seen


def test_adaptive_layout_mixed_chain(spark, tmp_path):
    """Adaptive bucketed IO: below min_bucket_bytes versions are plain
    parquet (v-prefix, no DDL overhead); once the table crosses the
    threshold new versions are bucketed (b-prefix) — and reads over the
    MIXED chain return exactly the union."""
    import os

    from crawler_spark.engine import ENGINE_SCHEMAS
    from crawler_spark.functions.urls import with_url_keys
    from crawler_spark.io.bucketed import BucketedSnapshotIO

    io = BucketedSnapshotIO(
        str(tmp_path), schemas=ENGINE_SCHEMAS, n_buckets=4, min_bucket_bytes=4096
    )

    def seen_rows(lo, hi):
        return with_url_keys(
            spark.createDataFrame([(f"https://h.com/{i}",) for i in range(lo, hi)], ["url"])
        ).select("url", "url_hash", "h64").withColumn("site", F.lit("s")).withColumn(
            "host", F.lit("h.com")
        ).withColumn("fetched_round", F.lit(1))

    io.commit(1, appends={"seen": seen_rows(0, 5)})  # tiny -> plain
    rels1 = io.table_rels("seen")
    assert os.path.basename(rels1[0]).startswith("v")
    io.commit(2, appends={"seen": seen_rows(5, 400)})  # still under threshold at decision time
    io.commit(3, appends={"seen": seen_rows(400, 420)})  # table now past 4 KiB -> bucketed
    rels = io.table_rels("seen")
    assert os.path.basename(rels[-1]).startswith("b")
    got = sorted(r.url for r in io.read(spark, "seen").collect())
    assert got == sorted(f"https://h.com/{i}" for i in range(420))
    # chained anti-join over the mixed chain still exact
    cand = seen_rows(410, 430).select("url", "url_hash")
    fresh = sorted(r.url for r in io.anti_join_seen(spark, cand).collect())
    assert fresh == sorted(f"https://h.com/{i}" for i in range(420, 430))


def _frontier_rows(spark, lo, hi, state="pending"):
    from crawler_spark.functions.urls import with_url_keys

    return (
        with_url_keys(
            spark.createDataFrame([(f"https://h.com/{i}",) for i in range(lo, hi)], ["url"])
        )
        .withColumn("site", F.lit("s"))
        .withColumn("host", F.lit("h.com"))
        .withColumn("depth", F.lit(0))
        .withColumn("discovered_round", F.lit(0))
        .withColumn("state", F.lit(state))
    )


def test_bucketed_frontier_view_matches_generic_merge(spark, tmp_path):
    """The co-located per-delta chain must resolve latest-wins state
    (with the same-round deleted-beats-fetched tie-break) EXACTLY like
    the generic groupBy-over-all-deltas merge."""
    from crawler_spark import schemas as S
    from crawler_spark.engine import ENGINE_SCHEMAS
    from crawler_spark.io.bucketed import BucketedSnapshotIO

    io = BucketedSnapshotIO(
        str(tmp_path), schemas=ENGINE_SCHEMAS, n_buckets=4, min_bucket_bytes=0
    )
    base1 = _frontier_rows(spark, 0, 30)
    base2 = _frontier_rows(spark, 30, 50)
    io.commit(0, appends={"frontier": base1})
    io.commit(1, appends={"frontier": base2})
    keys = {
        r.url: r.url_hash for r in io.read(spark, "frontier").collect()
    }

    def delta(rows):
        return spark.createDataFrame(
            [(keys[f"https://h.com/{i}"], st, rnd) for i, st, rnd in rows],
            S.FRONTIER_STATE,
        )

    # round 1: some fetched; round 2: one errors, one re-fetched later,
    # plus a same-round deleted-vs-fetched conflict inside ONE delta
    io.commit(2, appends={"frontier_state": delta(
        [(i, "fetched", 1) for i in range(0, 10)] + [(40, "fetched", 1)]
    )})
    io.commit(3, appends={"frontier_state": delta(
        [(3, "error", 2), (11, "fetched", 2), (12, "fetched", 2),
         (12, "deleted", 2), (40, "deleted", 2)]
    )})
    got = {
        (r.url, r.state) for r in io.frontier_view(spark).collect()
    }
    # generic merge (the flat-mode formula) over the same tables
    base = io.read(spark, "frontier")
    deltas = io.read(spark, "frontier_state")
    latest = deltas.groupBy("url_hash").agg(
        F.max(
            F.struct(F.col("round"), S.state_prio(F.col("state")).alias("prio"), F.col("state"))
        ).alias("_rs")
    )
    want = {
        (r.url, r.state)
        for r in base.join(latest, "url_hash", "left")
        .withColumn("state", F.coalesce(F.col("_rs.state"), F.col("state")))
        .collect()
    }
    assert got == want
    by_url = dict(got)
    assert by_url["https://h.com/3"] == "error"
    assert by_url["https://h.com/12"] == "deleted"  # same-round tie-break
    assert by_url["https://h.com/40"] == "deleted"  # later round wins
    assert by_url["https://h.com/20"] == "pending"  # untouched base row


def _bucketed_leaves_under_shuffles(df) -> list[str]:
    """toString of bucketed leaf scans sitting beneath any shuffle
    Exchange — the compacted-base-never-shuffles invariant checker."""
    out: list[str] = []

    def walk(node, under: bool) -> None:
        under = under or node.nodeName() == "Exchange"
        kids = node.children()
        if kids.size() == 0 and under and "Bucketed: true" in node.toString():
            out.append(node.toString())
        for i in range(kids.size()):
            walk(kids.apply(i), under)

    walk(df._jdf.queryExecution().executedPlan(), False)
    return out


def test_bucketed_frontier_view_plan_no_shuffle(spark, tmp_path):
    """Compacted chain (one base rel) + one state delta: the state
    merge shuffles NEITHER side (groupBy + SMJ both reuse the bucket
    partitioning)."""
    from crawler_spark import schemas as S
    from crawler_spark.engine import ENGINE_SCHEMAS
    from crawler_spark.io.bucketed import BucketedSnapshotIO

    io = BucketedSnapshotIO(
        str(tmp_path), schemas=ENGINE_SCHEMAS, n_buckets=4, min_bucket_bytes=0
    )
    io.commit(0, appends={"frontier": _frontier_rows(spark, 0, 300)})
    ks = [r.url_hash for r in io.read(spark, "frontier").limit(50).collect()]
    st = spark.createDataFrame([(k, "fetched", 1) for k in ks], S.FRONTIER_STATE)
    io.commit(1, appends={"frontier_state": st})
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        view = io.frontier_view(spark)
        plan = view._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Exchange rangepartitioning" not in plan
        assert "Exchange SinglePartition" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert view.count() == 300


def test_frontier_view_union_groups_correctly(spark, tmp_path):
    """Spark 4.1 keeps the HashPartitioning claim on a union whose
    leaves include >= 2 DISTINCT bucketed scans, so a downstream
    url_hash groupBy/join skips its exchange and splits groups
    (measured: every key counted twice). frontier_view with several
    base rels is exactly that shape — it must cap bucketed leaves at
    one (the largest rel; co-location where it pays) and read the
    delta rels plain. Covers both the joined shape (state delta
    present) and the bare-union shape (no states), and pins that the
    compacted base still never sits under a shuffle."""
    from crawler_spark import schemas as S
    from crawler_spark.engine import ENGINE_SCHEMAS
    from crawler_spark.io.bucketed import BucketedSnapshotIO

    io = BucketedSnapshotIO(
        str(tmp_path), schemas=ENGINE_SCHEMAS, n_buckets=4, min_bucket_bytes=0
    )
    io.commit(0, appends={"frontier": _frontier_rows(spark, 0, 200)})
    io.commit(1, appends={"frontier": _frontier_rows(spark, 200, 260)})
    io.commit(2, appends={"frontier": _frontier_rows(spark, 260, 280)})
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # bare-union shape: no state deltas at all
        g = io.frontier_view(spark).groupBy("url_hash").count()
        assert g.count() == 280
        assert g.filter(F.col("count") != 1).count() == 0

        # joined shape: ONE bucketed state delta shared by every child
        ks = [r.url_hash for r in io.read(spark, "frontier").limit(90).collect()]
        st = spark.createDataFrame([(k, "fetched", 1) for k in ks], S.FRONTIER_STATE)
        io.commit(3, appends={"frontier_state": st})
        view = io.frontier_view(spark)
        g = view.groupBy("url_hash").count()
        assert g.count() == 280
        assert g.filter(F.col("count") != 1).count() == 0
        assert view.filter(F.col("state") == "fetched").count() == 90
        # a downstream url_hash SMJ over the view must also be sound
        # (this is the anti_join_seen shape run_round feeds)
        half = io.read(spark, "frontier").limit(140).select("url_hash")
        assert view.join(half, "url_hash", "left_anti").count() == 140
        # the big compacted base keeps co-location: never under a shuffle
        assert _bucketed_leaves_under_shuffles(view) == []
        plan = view._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan  # ...and it IS a bucketed scan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_frontier_view_plan_size_is_linear_in_deltas(spark, tmp_path):
    """frontier_view must stay O(bases + states): ONE join per base
    against a single reduced `latest`, however many state deltas exist.
    The earlier chain was O(bases × states) joins — between compactions
    both grow one per round, so round wall time grew superlinearly with
    crawl age (15s→60s over 8 rounds at FIXED data size in the soak)."""
    from crawler_spark import schemas as S
    from crawler_spark.engine import ENGINE_SCHEMAS
    from crawler_spark.io.bucketed import BucketedSnapshotIO

    io = BucketedSnapshotIO(
        str(tmp_path), schemas=ENGINE_SCHEMAS, n_buckets=4, min_bucket_bytes=0
    )
    n_bases, n_states = 3, 5
    v = 0
    for i in range(n_bases):
        io.commit(v, appends={"frontier": _frontier_rows(spark, 40 * i, 40 * i + 40)})
        v += 1
    ks = [r.url_hash for r in io.read(spark, "frontier").limit(60).collect()]
    for j in range(n_states):
        st = spark.createDataFrame(
            [(k, "fetched", j + 1) for k in ks[j::n_states]], S.FRONTIER_STATE
        )
        io.commit(v, appends={"frontier_state": st})
        v += 1

    def n_joins(df):
        count = 0
        stack = [df._jdf.queryExecution().executedPlan()]
        while stack:
            node = stack.pop()
            if "Join" in node.nodeName():
                count += 1
            kids = node.children()
            stack.extend(kids.apply(i) for i in range(kids.size()))
        return count

    view = io.frontier_view(spark)
    assert n_joins(view) == n_bases  # NOT n_bases * n_states
    # and the merge is still latest-wins correct
    got = {r.url: r.state for r in view.collect()}
    assert sum(1 for s in got.values() if s == "fetched") == len(ks)
    assert sum(1 for s in got.values() if s == "pending") == 40 * n_bases - len(ks)


def test_bucketed_dedup_plan_has_no_seen_exchange(spark, tmp_path):
    """The chained anti-join must not shuffle either side (both scans
    are co-bucketed on url_hash)."""
    world = make_world(seed=21, n_hosts=2, n_urls=12, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path), embed_dim=0, bucketed_io=8, bucketed_min_bytes=0)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    eng.run_round(1, t)
    eng.run_round(2, t)
    frontier = eng.io.read(spark, "frontier")
    host_state = eng.io.read(spark, "host_state")
    cand = gate_candidates(frontier, t["control"], host_state, t["robots"], 3)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        deduped = eng.io.anti_join_seen(spark, cand)
        plan = deduped._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
        assert "Bucketed: true" in plan
        assert "Exchange rangepartitioning" not in plan
        # the SEEN side must never shuffle (that's the O(|seen|)-per-
        # round killer); the candidate side may exchange ONCE —
        # O(|round delta|). (The earlier no-exchange-anywhere assertion
        # was satisfied only by Spark 4.1's bogus partitioning claim on
        # unions of bucketed scans — see BucketedSnapshotIO.read.)
        # Seen scans are identified by their fetched_round column.
        for scan in _scans_under_shuffles(deduped):
            assert "fetched_round" not in scan, scan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_default_engine_round_plan_is_exchange_free(spark, tmp_path):
    """Round-2 VERDICT's last scale-killer, closed: the DEFAULT engine
    config now uses the adaptive bucketed layout, so the default round
    loop's two hot joins — the frontier⋈state latest-wins merge and the
    candidates▷seen anti-join — run with NO exchange on the base/seen
    side. Only bucketed_min_bytes is forced to 0 here (test tables are
    tiny; at the target scale every table is past the 32 MiB adaptive
    cutover and bucketing engages on its own)."""
    from crawler_spark.engine import read_frontier_view
    from crawler_spark.io.bucketed import BucketedSnapshotIO

    world = make_world(seed=29, n_hosts=3, n_urls=16, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path), embed_dim=0, bucketed_min_bytes=0)
    assert isinstance(eng.io, BucketedSnapshotIO)  # pure-default engine is bucketed
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    eng.run_round(1, t)
    eng.run_round(2, t)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        view = read_frontier_view(spark, eng.io)  # via the engine dispatch
        vplan = view._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in vplan
        assert "Exchange rangepartitioning" not in vplan
        assert "Exchange SinglePartition" not in vplan
        # two rounds committed two frontier_state deltas: their union's
        # groupBy is allowed ONE O(|delta|)-sized hash exchange (computed
        # once via exchange reuse), and the per-round frontier DELTAS
        # (read plain — union bucketed-leaf cap, see frontier_view) may
        # exchange O(|delta|) each; the COMPACTED base — the one
        # bucketed leaf, holding ~all the bytes — must never sit under
        # a shuffle: that's the O(|frontier|)-per-round killer.
        assert _bucketed_leaves_under_shuffles(view) == []
        cand = gate_candidates(
            eng.io.read(spark, "frontier"), t["control"],
            eng.io.read(spark, "host_state"), t["robots"], 3,
        )
        deduped = eng.io.anti_join_seen(spark, cand)
        dplan = deduped._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in dplan and "Bucketed: true" in dplan
        assert "Exchange rangepartitioning" not in dplan
        # seen never shuffles; candidates may exchange once (see above)
        for scan in _scans_under_shuffles(deduped):
            assert "fetched_round" not in scan, scan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # and the default config still crawls correctly
    ora = Oracle(world).run(max_rounds=2)
    got = [
        (r.round, r.seq, r.site, r.url, r.status)
        for r in eng.io.read(spark, "crawl_order").orderBy("seq").collect()
    ]
    assert got == ora.crawl_order


def test_bucketed_io_with_cuckoo_filter_equals_oracle(spark, tmp_path):
    """Combined scale configuration — bucketed snapshot IO (co-located
    storage) + cuckoo seen-filter (probabilistic prefilter): still
    byte-equal to the oracle crawl."""
    world = make_world(seed=43, n_hosts=3, n_urls=20, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(
        spark, str(tmp_path), embed_dim=0,
        bucketed_io=8, bucketed_min_bytes=0, seen_filter="cuckoo",
    )
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=10)
    ora = Oracle(world).run(max_rounds=10)
    got = [
        (r.round, r.seq, r.site, r.url, r.status)
        for r in eng.io.read(spark, "crawl_order").orderBy("seq").collect()
    ]
    assert got == ora.crawl_order
    gs = {(r.url_hash, r.url) for r in eng.io.read(spark, "seen").collect()}
    assert gs == set(ora.seen.items())
