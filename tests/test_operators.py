"""Operator unit tests (SURVEY.md §5.3): DataFrame-in/DataFrame-out."""

import duckdb
import pytest
from pyspark.sql import functions as F

from crawler_spark import schemas as S
from crawler_spark.functions.urls import with_url_keys
from crawler_spark.operators import dedup as D
from crawler_spark.operators.discovery import discover_frontier, reconcile_tombstones
from crawler_spark.operators.extract import entity_rows_for_page
from crawler_spark.operators.scheduler import control_flags, schedule
from crawler_spark.world import make_world


def frontier_df(spark, urls, budget=2):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return with_url_keys(df).withColumn("crawl_budget", F.lit(budget))


# --- scheduler --------------------------------------------------------------


def test_budget_window_limits_per_host(spark):
    urls = [f"https://h{i}.com/p/{j}" for i in range(3) for j in range(5)]
    out = schedule(frontier_df(spark, urls, budget=2), round_no=1, seq_base=0).collect()
    per_host = {}
    for r in out:
        per_host[r.host] = per_host.get(r.host, 0) + 1
    assert all(v == 2 for v in per_host.values())
    # FIFO within host = sorted URL order
    h0 = sorted([r.url for r in out if r.host == "h0.com"])
    assert h0 == ["https://h0.com/p/0", "https://h0.com/p/1"]


def test_canonical_order_is_rank_site_url(spark):
    urls = [f"https://h{i}.com/p/{j}" for i in range(3) for j in range(3)]
    out = sorted(
        ((r.seq, r.rank_in_host, r.site, r.url) for r in
         schedule(frontier_df(spark, urls, budget=2), 1, 0).collect())
    )
    keys = [(r[1], r[2], r[3]) for r in out]
    assert keys == sorted(keys)  # seq order == (rank, site, url) order
    assert [r[0] for r in out] == list(range(1, len(out) + 1))


def test_control_flags_windows(spark):
    ctl = spark.createDataFrame(
        [("s1", 2, 4, None), ("s2", None, None, 3)], S.SITE_CONTROL
    )
    f2 = {r.site: (r.paused, r.deleted) for r in control_flags(ctl, 2).collect()}
    assert f2["s1"] == (True, False)
    assert f2["s2"] == (False, False)
    f5 = {r.site: (r.paused, r.deleted) for r in control_flags(ctl, 5).collect()}
    assert f5["s1"] == (False, False)
    assert f5["s2"] == (False, True)


# --- dedup ------------------------------------------------------------------


def test_anti_join_matches_duckdb_except(spark):
    cand = [f"https://h.com/p/{i}" for i in range(20)]
    seen = [f"https://h.com/p/{i}" for i in range(0, 20, 3)]
    c = with_url_keys(spark.createDataFrame([(u,) for u in cand], ["url"]))
    s = with_url_keys(spark.createDataFrame([(u,) for u in seen], ["url"]))
    got = sorted(r.url for r in D.exact_anti_join(c, s).collect())
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT * FROM (SELECT unnest($c) u) EXCEPT SELECT * FROM (SELECT unnest($s) u) ORDER BY 1",
            params={"c": cand, "s": seen},
        ).fetchall()
    ]
    assert got == want


def test_bloom_never_drops(spark):
    """Bloom prefilter output == exact anti-join output (FP-safe)."""
    cand = [f"https://h.com/p/{i}" for i in range(200)]
    seen = [f"https://h.com/p/{i}" for i in range(0, 200, 2)]
    c = with_url_keys(spark.createDataFrame([(u,) for u in cand], ["url"]))
    s = with_url_keys(spark.createDataFrame([(u,) for u in seen], ["url"])).withColumn(
        "fetched_round", F.lit(1)
    )
    blooms = D.build_bloom(s, n_buckets=4, expected_per_bucket=1000)
    got = sorted(r.url for r in D.bloom_prefilter(c, blooms, s, 4).collect())
    want = sorted(r.url for r in D.exact_anti_join(c, s).collect())
    assert got == want


def test_bloom_no_false_negatives_nonpow2_buckets(spark):
    """Regression (round-2 advice): broadcast probe must bucket with the
    SIGNED pmod like build_bloom, or every negative-h64 seen key probes
    the wrong bucket and passes dedup as fresh. n_buckets=10 (non-power-
    of-two) exposes it; 16 masked it."""
    cand = [f"https://h{i}.com/p/{i}" for i in range(400)]
    seen = cand[::2]
    c = with_url_keys(spark.createDataFrame([(u,) for u in cand], ["url"]))
    s = with_url_keys(spark.createDataFrame([(u,) for u in seen], ["url"]))
    assert s.filter(F.col("h64") < 0).count() > 0  # fixture exercises negatives
    blooms = D.build_bloom(s, n_buckets=10, expected_per_bucket=1000)
    # every seen key must probe maybe=True (bloom has no false negatives)
    maybe = D.broadcast_probe_col(spark, blooms, 10)
    n_missed = s.withColumn("maybe", maybe(F.col("h64"))).filter(~F.col("maybe")).count()
    assert n_missed == 0
    got = sorted(r.url for r in D.bloom_prefilter(c, blooms, s, 10).collect())
    want = sorted(r.url for r in D.exact_anti_join(c, s).collect())
    assert got == want


# --- discovery / reconcile --------------------------------------------------


def test_discover_frontier_covers_sitemap_tree(spark):
    world = make_world(seed=3, n_hosts=3, n_urls=20)
    t = world.to_spark(spark)
    got = {r.url for r in discover_frontier(t["seeds"], t["robots"], t["sitemaps"]).collect()}
    want = set(world.seeds["url"])
    for r in world.sitemaps.itertuples(index=False):
        if r.kind == "urlset":
            want |= set(r.entries)
    assert got == want


def test_reconcile_tombstones_is_except(spark):
    stored = spark.createDataFrame([(f"u{i}", "s") for i in range(10)], ["url", "site"])
    current = spark.createDataFrame([(f"u{i}",) for i in range(0, 10, 2)], ["url"])
    got = sorted(r.url for r in reconcile_tombstones(stored, current).collect())
    assert got == [f"u{i}" for i in range(1, 10, 2)]


# --- extraction (pure-python kernel; the Spark path is covered e2e) ---------


def test_entity_rows_shapes():
    spans = [
        ("title", "T", "", 0),
        ("meta", '{"p": "description", "c": "D"}', "", 1),
        ("jsonld", '{"@id": "k1", "@type": "Product", "name": "N"}', "", 2),
        ("jsonld", '[{"@id": "k2", "@type": ["A", "B"]}, {"name": "nokey"}]', "", 3),
        ("jsonld", '{"@graph": [{"@id": "k3", "@type": "C"}]}', "", 4),
        ("jsonld", "not-json{", "", 5),
    ]
    rows = entity_rows_for_page("u", "s", 1, 1, spans)
    shapes = [r[6] for r in rows]
    assert shapes == ["single", "list-item", "list-item", "graph-item", "synth"]
    keys = [r[7] for r in rows]
    assert keys == ["k1", "k2", None, "k3", "u"]
    # list-valued @type normalized to array
    assert rows[1][8] == ["A", "B"]


def test_entity_rows_synth_blogposting():
    spans = [
        ("title", "T", "", 0),
        ("meta", '{"p": "article:published_time", "c": "2024-01-01"}', "", 1),
    ]
    rows = entity_rows_for_page("u", "s", 1, 1, spans)
    assert len(rows) == 1 and rows[0][6] == "synth"
    assert rows[0][8] == ["BlogPosting"]  # schema-type heuristic (crawler.py:793-796)


def test_priority_orders(spark):
    """North-star priority scoring: same window machinery, different
    within-host order; fifo stays reference-exact."""
    rows = [
        # (url, depth, discovered_round) — one host
        ("https://h.com/z", 0, 1),
        ("https://h.com/a", 2, 1),
        ("https://h.com/m", 1, 3),
    ]
    df = with_url_keys(
        spark.createDataFrame(rows, ["url", "depth", "discovered_round"])
    ).withColumn("crawl_budget", F.lit(1))
    fifo = schedule(df, 1, 0, priority="fifo").first()
    assert fifo.url == "https://h.com/a"  # sorted-URL FIFO
    depth = schedule(df, 1, 0, priority="depth").first()
    assert depth.url == "https://h.com/z"  # shallow-first
    rec = schedule(df, 1, 0, priority="recency").first()
    assert rec.url == "https://h.com/m"  # newest discovery first


def test_bloom_incremental_update_equals_rebuild(spark):
    """update_blooms (bitwise OR of new keys) must equal a full rebuild
    over the union — the invariant that makes per-round incremental
    filter maintenance safe."""
    a = with_url_keys(
        spark.createDataFrame([(f"https://h.com/a/{i}",) for i in range(150)], ["url"])
    )
    b = with_url_keys(
        spark.createDataFrame([(f"https://h.com/b/{i}",) for i in range(70)], ["url"])
    )
    base = D.build_bloom(a, n_buckets=4, expected_per_bucket=1000)
    updated = {r.bucket: r for r in D.update_blooms(base, b, 4, 1000).collect()}
    rebuilt = {r.bucket: r for r in D.build_bloom(a.unionByName(b), 4, 1000).collect()}
    assert set(updated) == set(rebuilt)
    for k in rebuilt:
        assert updated[k].bits == rebuilt[k].bits  # bit-identical
        assert updated[k].n_keys == rebuilt[k].n_keys


def test_char_ngrams(spark):
    from crawler_spark.operators.textdedup import char_ngrams

    docs = spark.createDataFrame([(1, "Hello  World")], ["doc_id", "text"])
    grams = sorted(r.gram for r in char_ngrams(docs, n=5).collect())
    # normalized: lowercased, whitespace collapsed -> "hello world"
    assert "hello" in grams and "o wor" in grams
    assert all(len(g) == 5 for g in grams)
    assert grams == sorted(set(grams))  # distinct


def test_saturated_buckets_flags_overfull(spark):
    many = with_url_keys(
        spark.createDataFrame([(f"https://h.com/{i}",) for i in range(400)], ["url"])
    )
    blooms = D.build_bloom(many, n_buckets=2, expected_per_bucket=50)  # undersized
    sat = {r.bucket for r in D.saturated_buckets(blooms, max_fill=0.5).collect()}
    assert sat == {0, 1}  # both buckets blew their sizing budget
    roomy = D.build_bloom(many, n_buckets=2, expected_per_bucket=10000)
    assert D.saturated_buckets(roomy, max_fill=0.5).count() == 0


def test_kmeans_ivf_beats_standin_recall(spark):
    """k-means IVF trainer (Lloyd iterations as DataFrame jobs): on a
    cluster-ordered fixture — where the first-N stand-in codebook
    collapses into one cluster — trained centroids must lift
    recall@k vs brute-force ground truth."""
    import numpy as np

    from crawler_spark.operators.ann import (
        brute_force_topk,
        default_centroids,
        ivf_topk,
        kmeans_train,
    )

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 8, 30, 8
    centers = rng.normal(size=(n_clusters, dim)) * 4
    rows = []
    vid = 0
    for c in range(n_clusters):  # cluster-ordered: first N ids share cluster 0
        for _ in range(per):
            v = centers[c] + rng.normal(size=dim) * 0.3
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qids = [5, 45, 95, 130, 170, 215]
    k = 5
    truth = {
        q: {r.neighbor_id for r in grp}
        for q, grp in __import__("itertools").groupby(
            sorted(brute_force_topk(emb, qids, k=k).collect(), key=lambda r: r.query_id),
            key=lambda r: r.query_id,
        )
    }

    def recall(result_rows):
        hits = sum(r.neighbor_id in truth[r.query_id] for r in result_rows)
        return hits / (len(qids) * k)

    standin = recall(ivf_topk(emb, qids, k=k, n_centroids=n_clusters, nprobe=1).collect())
    trained_cent = kmeans_train(emb, n_centroids=n_clusters, n_iters=4)
    trained = recall(
        ivf_topk(emb, qids, k=k, n_centroids=n_clusters, nprobe=1, centroids=trained_cent).collect()
    )
    assert trained > standin
    assert trained >= 0.9  # real clusters found -> near-exact within-cell search


def test_kmeans_train_partition_order_invariant(spark):
    """The r5 oracle contract: the trained codebook must be
    BIT-IDENTICAL under any partitioning — init is a pure-int64 hash,
    per-cell means are exact decimal sums (associative), every other
    float op is a fixed-order fold. This is what lets an external
    numpy replay certify ivf_kmeans_topk hash-exactly."""
    from crawler_spark.operators.ann import kmeans_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r.cid: list(r.cv) for r in kmeans_train(emb, n_centroids=8, n_iters=2).collect()}
    b = {
        r.cid: list(r.cv)
        for r in kmeans_train(
            emb.repartition(7, "vec_id"), n_centroids=8, n_iters=2
        ).collect()
    }
    assert a == b  # exact float equality, not approx


def test_lsh_bucketed_topk_subset_of_brute_force(spark):
    from crawler_spark.operators.ann import brute_force_topk, lsh_bucketed_topk, lsh_buckets

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2]
    bf = {(r.query_id, r.neighbor_id): r.rank for r in brute_force_topk(emb, qids, k=10).collect()}
    lsh = lsh_bucketed_topk(emb, qids, k=3, nbits=4).collect()
    buckets = {r.vec_id: r.bucket for r in lsh_buckets(emb, nbits=4).collect()}
    for r in lsh:
        # every LSH hit shares the query's bucket (the blocking contract)
        assert buckets[r.neighbor_id] == buckets[r.query_id]
        assert 1 <= r.rank <= 3


# --- cuckoo filter (X4: native deletes beside the Bloom path) ---------------


def test_cuckoo_never_drops_both_probe_modes(spark):
    """Cuckoo prefilter output == exact anti-join output (FP-safe), in
    broadcast AND cogrouped probe modes, with a non-power-of-two bucket
    count and negative h64 keys (the signed-pmod regression class)."""
    from crawler_spark.operators import cuckoo as CK

    cand = [f"https://h{i}.com/p/{i}" for i in range(400)]
    seen = cand[::2]
    c = with_url_keys(spark.createDataFrame([(u,) for u in cand], ["url"]))
    s = with_url_keys(spark.createDataFrame([(u,) for u in seen], ["url"]))
    assert s.filter(F.col("h64") < 0).count() > 0
    filters = CK.build_cuckoo(s, n_buckets=10, expected_per_bucket=1000)
    want = sorted(r.url for r in D.exact_anti_join(c, s).collect())
    for mode in ("broadcast", "cogroup"):
        got = sorted(
            r.url for r in CK.cuckoo_prefilter(c, filters, s, 10, probe_mode=mode).collect()
        )
        assert got == want, mode


def test_cuckoo_update_then_delete(spark):
    """Incremental insert keeps membership exact; targeted delete
    removes ONLY the deleted keys (remaining keys keep the no-false-
    negative invariant — the critical dedup property)."""
    from crawler_spark.operators import cuckoo as CK

    a = with_url_keys(
        spark.createDataFrame([(f"https://a.com/{i}",) for i in range(300)], ["url"])
    )
    b = with_url_keys(
        spark.createDataFrame([(f"https://b.com/{i}",) for i in range(200)], ["url"])
    )
    f0 = CK.build_cuckoo(a, n_buckets=4, expected_per_bucket=1000)
    f1 = CK.update_cuckoos(f0, b, 4, 1000)
    both = a.unionByName(b)
    maybe = CK.broadcast_cuckoo_probe_col(spark, f1, 4)
    assert both.withColumn("m", maybe(F.col("h64"))).filter(~F.col("m")).count() == 0
    # delete all of a's keys
    f2 = CK.delete_from_cuckoos(f1, a, 4)
    maybe2 = CK.broadcast_cuckoo_probe_col(spark, f2, 4)
    assert b.withColumn("m", maybe2(F.col("h64"))).filter(~F.col("m")).count() == 0
    # deleted keys should (almost surely, 16-bit fp) now probe fresh;
    # the filters' key accounting reflects the removal
    n_deleted_still = a.withColumn("m", maybe2(F.col("h64"))).filter(F.col("m")).count()
    assert n_deleted_still <= 3  # fp-collision residue only
    assert sum(r.n_keys for r in f2.collect()) == 200
    # prefilter vs the post-delete seen set stays exact
    cand = a.limit(50).unionByName(b.limit(50))
    got = sorted(r.url for r in CK.cuckoo_prefilter(cand, f2, b, 4).collect())
    want = sorted(r.url for r in D.exact_anti_join(cand, b).collect())
    assert got == want


def test_cuckoo_saturation_flags(spark):
    from crawler_spark.operators import cuckoo as CK

    many = with_url_keys(
        spark.createDataFrame([(f"https://x.com/{i}",) for i in range(2000)], ["url"])
    )
    tight = CK.build_cuckoo(many, n_buckets=2, expected_per_bucket=40)  # undersized
    assert CK.saturated_cuckoo_buckets(tight).count() > 0
    roomy = CK.build_cuckoo(many, n_buckets=2, expected_per_bucket=20000)
    assert CK.saturated_cuckoo_buckets(roomy).count() == 0


def test_engine_cuckoo_equals_exact_with_delete(spark, tmp_path):
    """Engine with seen_filter='cuckoo' must produce the IDENTICAL crawl
    (order + seen set) as the exact-anti-join engine, through a cascade
    delete round (which exercises the O(|site|) fingerprint delete)."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.world import make_world

    mk = lambda: make_world(
        seed=23, n_hosts=3, n_urls=18, budget=3, burst=False,
        deletes=[("h001_example_com", 2)],
    )
    results = {}
    for tag, kw in (("exact", {}), ("cuckoo", {"seen_filter": "cuckoo"})):
        world = mk()
        t = world.to_spark(spark)
        root = str(tmp_path / tag)
        eng = CrawlEngine(spark, root, embed_dim=0, **kw)
        eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
        eng.run(t, max_rounds=8)
        results[tag] = (
            [
                (r.round, r.seq, r.site, r.url, r.status)
                for r in eng.io.read(spark, "crawl_order").orderBy("seq").collect()
            ],
            sorted(
                (r.url_hash, r.url) for r in eng.io.read(spark, "seen").collect()
            ),
        )
    assert results["cuckoo"] == results["exact"]


def test_engine_cuckoo_layout_migration(spark, tmp_path):
    """A seen_cuckoo store persisted under an OLDER (fp, cell)
    derivation must not be trusted: probing it yields false NEGATIVES
    (missed dups -> re-crawled URLs). The engine detects the stale
    layout stamp (NULL = unstamped legacy), falls back to exact dedup
    for that round, rebuilds the filters from the exact seen set in the
    same commit, and the crawl stays bit-identical to an uninterrupted
    run."""
    import pandas as pd

    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators import cuckoo as CK
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.world import make_world

    mk = lambda: make_world(seed=31, n_hosts=3, n_urls=20, budget=3, burst=False)

    def crawl(root, interrupt=False):
        world = mk()
        t = world.to_spark(spark)
        eng = CrawlEngine(spark, root, embed_dim=0, seen_filter="cuckoo")
        eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
        if not interrupt:
            eng.run(t, max_rounds=10)
            return eng
        eng.run(t, max_rounds=2)
        # forge a legacy store: zeroed tables (the worst case — every
        # probe would miss) with NO layout stamp, same sizing metadata
        rows = eng.io.read(spark, "seen_cuckoo").collect()
        assert rows
        forged = spark.createDataFrame(
            pd.DataFrame(
                {
                    "bucket": [r.bucket for r in rows],
                    "n_cells": [r.n_cells for r in rows],
                    "n_keys": [r.n_keys for r in rows],
                    "table": [b"\x00" * len(bytes(r.table)) for r in rows],
                    "stash": [b"" for r in rows],
                    "layout": [None for r in rows],
                }
            ),
            CK.CUCKOO_SCHEMA,
        )
        assert CK.cuckoo_layout_stale(forged)
        eng.io.commit(eng.io.last_round(), overwrites={"seen_cuckoo": forged})
        # resume over the forged store in a fresh engine
        eng2 = CrawlEngine(spark, root, embed_dim=0, seen_filter="cuckoo")
        eng2.run(t, max_rounds=10)
        return eng2

    ref = crawl(str(tmp_path / "ref"))
    got = crawl(str(tmp_path / "mig"), interrupt=True)
    snap = lambda eng: (
        [
            (r.round, r.seq, r.site, r.url, r.status)
            for r in eng.io.read(spark, "crawl_order").orderBy("seq").collect()
        ],
        sorted((r.url_hash, r.url) for r in eng.io.read(spark, "seen").collect()),
    )
    assert snap(got) == snap(ref)
    # the store is restamped with the current layout and trusted again
    final = got.io.read(spark, "seen_cuckoo")
    assert not CK.cuckoo_layout_stale(final)
    assert final.count() > 0


def test_engine_rebuild_saturated_cuckoos(spark, tmp_path):
    """Growth maintenance: undersized cuckoo buckets get rebuilt bigger
    from the exact seen set, and membership stays false-negative-free."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators import cuckoo as CK
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.world import make_world

    world = make_world(seed=29, n_hosts=3, n_urls=40, budget=5, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(
        spark, str(tmp_path), embed_dim=0, seen_filter="cuckoo",
        # one bucket sized for 4 keys (32-slot capacity) vs ~40 seen
        # URLs -> guaranteed past the 0.84 load threshold
        bloom_buckets=1, bloom_expected_per_bucket=4,
    )
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=8, compact_every=0)
    n_seen = eng.io.read(spark, "seen").count()
    assert n_seen > 28  # fixture sanity: enough keys to saturate 32 slots
    before = {r.bucket: r.n_cells for r in eng.io.read(spark, "seen_cuckoo").collect()}
    n_rebuilt = eng.rebuild_saturated_cuckoos()
    assert n_rebuilt > 0
    after = {r.bucket: r.n_cells for r in eng.io.read(spark, "seen_cuckoo").collect()}
    assert any(after[b] > before[b] for b in after)
    filters = eng.io.read(spark, "seen_cuckoo")
    maybe = CK.broadcast_cuckoo_probe_col(spark, filters, 1)
    seen = eng.io.read(spark, "seen")
    assert seen.withColumn("m", maybe(F.col("h64"))).filter(~F.col("m")).count() == 0
    assert CK.saturated_cuckoo_buckets(filters).count() == 0


def test_engine_priority_modes_equal_oracle(spark, tmp_path):
    """The 'depth' and 'recency' scheduling priorities (north-star
    scored generalizations) now have full oracle twins: engine crawl
    order + seen set must match the python oracle exactly, and must
    genuinely differ from fifo (link-discovered pages interleave)."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.oracle import Oracle
    from crawler_spark.world import make_world

    orders = {}
    for prio in ("depth", "recency"):
        world = make_world(seed=37, n_hosts=3, n_urls=24, budget=2, burst=False)
        t = world.to_spark(spark)
        eng = CrawlEngine(spark, str(tmp_path / prio), embed_dim=0, priority=prio)
        eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
        eng.run(t, max_rounds=14)
        ora = Oracle(world, priority=prio).run(max_rounds=14)
        got = [
            (r.round, r.seq, r.site, r.url, r.status)
            for r in eng.io.read(spark, "crawl_order").orderBy("seq").collect()
        ]
        assert got == ora.crawl_order, prio
        gs = {(r.url_hash, r.url) for r in eng.io.read(spark, "seen").collect()}
        assert gs == set(ora.seen.items()), prio
        orders[prio] = got
    fifo = Oracle(
        make_world(seed=37, n_hosts=3, n_urls=24, budget=2, burst=False)
    ).run(max_rounds=14)
    assert orders["depth"] != fifo.crawl_order  # priorities actually bite


def test_simhash_near_dup_blocking_is_exact(spark):
    """For max_hamming < n_blocks the Manku block filter is LOSSLESS
    (pigeonhole): blocked pairs == brute-force all-pairs Hamming<=k."""
    from crawler_spark.operators.textdedup import simhash, simhash_near_dup_pairs

    rows = [
        (i, f"alpha beta gamma delta {w}")
        for i, w in enumerate(
            ["x", "x", "y", "zq", "alpha", "beta beta", "gamma x", "delta y"] * 4
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ids = sorted(sigs)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if h <= 3:
                want.add((a, b, h))
    assert got == want and len(want) > 0


def test_connected_components_vs_union_find(spark):
    """CC over a seeded random graph (+ a 60-node chain, the large-star
    worst case) equals a driver-side union-find."""
    import random

    from crawler_spark.operators.graph import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges += [(1000 + i, 1000 + i + 1) for i in range(60)]  # long chain
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs).collect()
    }
    assert got == want
    # cluster ids are component minima
    assert all(got[c] == c for c in set(got.values()))


def test_canonical_corpus_keeps_min_and_singletons(spark):
    from crawler_spark.operators.graph import canonical_corpus

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(8)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(3, 1), (5, 3), (6, 7)], ["doc_a", "doc_b"])
    kept = sorted(r.doc_id for r in canonical_corpus(docs, pairs).collect())
    # {1,3,5} -> keep 1; {6,7} -> keep 6; 0,2,4 untouched singletons
    assert kept == [0, 1, 2, 4, 6]


def test_connected_components_hex_string_ids(spark):
    """The engine's ids are md5-hex STRINGS (url_hash/doc_id) — CC and
    the canonical-corpus closure must run on them natively; a cast to
    long crashes under ANSI mode on the first digit >= 'a'. Cluster
    minima are the LEXICOGRAPHIC minima (the only order the algorithm
    needs)."""
    from hashlib import md5

    from crawler_spark.operators.graph import canonical_corpus, connected_components

    h = [md5(str(i).encode()).hexdigest() for i in range(8)]
    pairs = spark.createDataFrame(
        [(h[3], h[1]), (h[5], h[3]), (h[6], h[7])], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {
        x: min(comp) for comp in ({h[1], h[3], h[5]}, {h[6], h[7]}) for x in comp
    }
    docs = spark.createDataFrame([(x, "t") for x in h], ["doc_id", "text"])
    kept = sorted(r.doc_id for r in canonical_corpus(docs, pairs).collect())
    assert kept == sorted(
        {h[0], h[2], h[4], min(h[1], h[3], h[5]), min(h[6], h[7])}
    )


def _winnow_reference(text, k, w):
    """Pure-python winnowing (SIGMOD'03 semantics: rightmost minimal
    hash per window), same normalization/keys as the operator."""
    import hashlib
    import re

    s = re.sub(r"\s+", " ", text.strip().lower())[:8192]
    if len(s) < k + w - 1:
        return set()
    keys = []
    for i in range(1, len(s) - k + 2):  # 1-based, matches SQL/Spark
        h = hashlib.md5(s[i - 1 : i - 1 + k].encode()).hexdigest()
        keys.append((h, -i))  # -i: ties pick the RIGHTMOST min
    out = set()
    for j in range(len(keys) - w + 1):
        h, negi = min(keys[j : j + w])
        out.add((-negi, h))
    return out


def test_winnow_fingerprints_match_reference(spark):
    from crawler_spark.operators.textdedup import winnow_fingerprints

    texts = [
        "The quick   Brown fox jumps over the lazy dog's tail repeatedly.",
        "aaaaaaaaaaaaaaaaaaaaaaaa",  # all-equal grams: rightmost-min tie rule
        "short",  # below k+w-1: dropped
        "  MIXED Case\twith\nwhitespace   runs and punctuation!!! ok?  ",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {}
    for r in winnow_fingerprints(docs, k=8, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {
        i: ref for i, t in enumerate(texts) if (ref := _winnow_reference(t, 8, 4))
    }
    assert got == want
    assert 2 not in got  # too-short doc owns no window


def test_winnow_detection_guarantee(spark):
    """Any shared substring of length >= k+w-1 yields a shared
    fingerprint HASH, so winnow_overlap_pairs finds the planted pair;
    the max_df guard then drops corpus-wide boilerplate."""
    from crawler_spark.operators.textdedup import winnow_overlap_pairs

    shared = "this exact sentence was lifted verbatim from document zero"
    boiler = "all rights reserved contact us terms of service apply here"
    rows = [
        (0, f"unique preamble zero. {shared}. {boiler}."),
        (1, f"totally different opening text. {shared}. {boiler}. extra tail."),
    ] + [(i, f"filler document number {i} {'x' * i}. {boiler}.") for i in range(2, 14)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnow_overlap_pairs(
            docs, k=8, w=4, min_shared=2, max_df=4
        ).collect()
    }
    assert (0, 1) in pairs
    # boilerplate appears in all 14 docs > max_df=4: its fingerprints are
    # stopped, so filler docs (whose only overlap is the boilerplate)
    # never pair with anything
    assert all(a in (0, 1) and b in (0, 1) for a, b in pairs)


def test_winnow_density_bound(spark):
    """Expected selected density is 2/(w+1); assert a loose upper bound
    on real text so w actually thins the fingerprint set."""
    from crawler_spark.operators.textdedup import winnow_fingerprints

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(30)
    )
    import pyspark.sql.functions as F

    n_fp = winnow_fingerprints(docs, k=8, w=8).count()
    n_chars = docs.select(F.sum(F.length("text"))).first()[0]
    assert n_fp <= 0.5 * n_chars  # 2/(w+1)=0.22 expected; 0.5 is lenient


# --- line dedup / stratified sample / top terms (round 3) --------------------


def _py_line_dedup(rows):
    """Pure-python reference: first global (doc_id, pos) occurrence wins."""
    seen = set()
    out = {}
    for doc_id, text in sorted(rows):
        kept = []
        for pos, line in enumerate(text.split("\n")):
            if line not in seen:
                seen.add(line)
                kept.append(line)
        out[doc_id] = ("\n".join(kept), len(kept), len(text.split("\n")))
    return out


def test_line_dedup_first_occurrence_wins(spark):
    from crawler_spark.operators.textdedup import line_dedup

    rows = [
        (1, "cookie banner\nreal content one\nfooter"),
        (2, "cookie banner\nreal content two\nfooter"),
        (3, "real content one\nfresh line"),
        (4, "cookie banner"),  # every line already seen -> empty doc
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text_dedup, r.n_lines_kept, r.n_lines)
        for r in line_dedup(docs).collect()
    }
    assert got == _py_line_dedup(rows)
    assert got[4] == ("", 0, 1)  # fully-deduped doc survives with empty text


def test_line_dedup_preserves_duplicate_lines_within_first_doc_order(spark):
    from crawler_spark.operators.textdedup import line_dedup

    # the FIRST occurrence of each line is kept in original position
    # order, even when lines sort differently lexicographically
    rows = [(7, "zebra\nalpha\nzebra\nmango")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = line_dedup(docs).collect()[0]
    assert out.text_dedup == "zebra\nalpha\nmango"
    assert (out.n_lines_kept, out.n_lines) == (3, 4)


def test_stratified_sample_quotas_and_hash_order(spark):
    import hashlib

    from crawler_spark.functions.text import stratified_sample

    rows = [(i, "en" if i % 3 else "zh") for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    quotas = {"en": 5, "fr": 7}  # fr absent from data; zh absent from quotas
    got = stratified_sample(docs, quotas, "lang").collect()
    assert len(got) == 5 and all(r.stratum == "en" for r in got)
    assert sorted(r.sample_rank for r in got) == [1, 2, 3, 4, 5]
    # the sample must be the md5-hash-order prefix of the stratum
    en_ids = [i for i, l in rows if l == "en"]
    hkey = lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16), i)
    expect = set(sorted(en_ids, key=hkey)[:5])
    assert {r.doc_id for r in got} == expect


def test_stratified_sample_plan_has_window_group_limit(spark):
    from crawler_spark.functions.text import stratified_sample

    docs = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    plan = stratified_sample(docs, {"en": 3}, "lang")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # constant rank bound pushed down


def test_top_terms_matches_counter(spark):
    from collections import Counter

    from crawler_spark.functions.text import top_terms

    rows = [
        (1, "the cat sat"),
        (2, "the dog sat sat"),  # repeated token counts once per doc
        (3, "THE   cat"),  # case/whitespace normalization
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    df = Counter()
    for _, text in rows:
        df.update(set(text.lower().split()))
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [(r.term, r.df) for r in top_terms(docs, k=3).orderBy("rank").collect()]
    assert got == want


# --- link graph: degrees + integer PageRank (round 3) ------------------------


def test_link_graph_stats_degrees(spark):
    from crawler_spark.operators.graph import link_graph_stats

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 1)], ["src", "dst"]
    )
    got = {r.node: (r.out_deg, r.in_deg) for r in link_graph_stats(edges).collect()}
    assert got == {1: (2, 1), 2: (1, 1), 3: (0, 2), 4: (1, 0)}


def test_pagerank_matches_float_reference_ranking(spark):
    """Integer fixed-point PageRank must rank like the float fixpoint
    and approximate its values (mass leak < out_deg units/node/round)."""
    import numpy as np

    from crawler_spark.operators.graph import pagerank

    rng = np.random.RandomState(7)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (150, 2)) if a != b})
    got = {
        r.node: r.score_e12
        for r in pagerank(
            spark.createDataFrame(edges, ["src", "dst"]), iters=20
        ).collect()
    }

    # float reference: same formula (score0 = 1, dangling mass dropped)
    nodes = sorted({u for e in edges for u in e})
    out = {}
    for a, b in edges:
        out.setdefault(a, []).append(b)
    score = {u: 1.0 for u in nodes}
    for _ in range(20):
        contrib = {u: 0.0 for u in nodes}
        for a, targets in out.items():
            for b in targets:
                contrib[b] += score[a] / len(targets)
        score = {u: 0.15 + 0.85 * contrib[u] for u in nodes}

    assert set(got) == set(nodes)
    for u in nodes:
        assert abs(got[u] / 1e12 - score[u]) < 1e-6, (u, got[u], score[u])


def test_pagerank_is_partitioning_invariant(spark):
    """Exact same integer scores regardless of input partitioning —
    the property float PageRank cannot give."""
    from crawler_spark.operators.graph import pagerank

    edges = [(i, (i * 7 + 3) % 23) for i in range(23) if i != (i * 7 + 3) % 23]
    a = spark.createDataFrame(edges, ["src", "dst"]).repartition(1)
    b = spark.createDataFrame(edges, ["src", "dst"]).repartition(16, "dst")
    ra = {(r.node, r.score_e12) for r in pagerank(a, iters=8).collect()}
    rb = {(r.node, r.score_e12) for r in pagerank(b, iters=8).collect()}
    assert ra == rb


def test_repetition_profile_matches_reference(spark):
    """Per-row array formulation == pure-python Gopher-style counts,
    incl. the sorted-run max-multiplicity trick and the short/empty-doc
    guards."""
    from collections import Counter

    from crawler_spark.functions.text import repetition_profile

    rows = [
        (0, "a b a b a b"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "x"),
        (3, ""),
        (4, "w w w w"),
        (5, "  spaced   out\ttokens  "),
        (6, "repeat me repeat me repeat me repeat me"),
    ]

    def ref(t):
        ws = [w for w in t.strip().lower().split() if w]
        out = {"n_words": len(ws)}
        for n in (2, 3, 4):
            g = (
                [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
                if len(ws) >= n
                else []
            )
            out[f"dup_{n}gram_frac"] = (len(g) - len(set(g))) / len(g) if g else 0.0
        g2 = (
            [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
            if len(ws) >= 2
            else []
        )
        out["top_2gram_frac"] = max(Counter(g2).values()) / len(g2) if g2 else 0.0
        return out

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.asDict() for r in repetition_profile(df).collect()}
    for i, t in rows:
        want = ref(t)
        assert {k: got[i][k] for k in want} == want, (i, t)
