"""TrustRank (personalized PageRank) and mirror-site detection."""

import numpy as np
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_trustrank_with_all_seeds_equals_pagerank(spark):
    from crawler_spark.operators.graph import pagerank, trustrank

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0)]
    e = _edges(spark, pairs)
    nodes = sorted({x for p in pairs for x in p})
    pr = {r.node: r.score_e12 for r in pagerank(e, iters=4).collect()}
    tr = {r.node: r.trust_e12 for r in trustrank(e, _seeds(spark, nodes), iters=4).collect()}
    assert pr == tr  # uniform seed set == classic PageRank, bit-exact


def test_trustrank_unreachable_nodes_score_zero(spark):
    from crawler_spark.operators.graph import trustrank

    # component {0,1} seeded; spam farm {10,11,12} has no inbound path
    pairs = [(0, 1), (1, 0), (10, 11), (11, 12), (12, 10), (12, 0)]
    tr = {r.node: r.trust_e12 for r in
          trustrank(_edges(spark, pairs), _seeds(spark, [0]), iters=5).collect()}
    assert tr[10] == tr[11] == tr[12] == 0  # no trust path -> exact zero
    assert tr[0] > 0 and tr[1] > 0


def test_trustrank_tracks_float_personalized_pagerank(spark):
    from crawler_spark.operators.graph import trustrank

    rng = np.random.RandomState(7)
    n = 40
    pairs = list({(int(rng.randint(n)), int(rng.randint(n))) for _ in range(160)})
    pairs = [(a, b) for a, b in pairs if a != b]
    seeds = [0, 5, 10]
    tr = {r.node: r.trust_e12 for r in
          trustrank(_edges(spark, pairs), _seeds(spark, seeds), iters=8).collect()}

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    out = np.zeros(len(nodes))
    for a, _ in pairs:
        out[idx[a]] += 1
    v = np.zeros(len(nodes))
    for s in seeds:
        v[idx[s]] = 1.0
    x = v.copy()
    for _ in range(8):
        nxt = 0.15 * v
        for a, b in pairs:
            if out[idx[a]]:
                nxt[idx[b]] += 0.85 * x[idx[a]] / out[idx[a]]
        x = nxt
    # integer fixed point tracks the float ranking on well-separated scores
    got = sorted(nodes, key=lambda nd: (-tr[nd], nd))
    want = sorted(nodes, key=lambda nd: (-x[idx[nd]], nd))
    agree = sum(g == w for g, w in zip(got[:10], want[:10]))
    assert agree >= 8, (got[:10], want[:10])


def test_mirror_pairs_containment_and_guard(spark):
    from crawler_spark.operators.textdedup import mirror_pairs

    rows = []
    # site A: docs a0..a9; site B mirrors a0..a4 (containment 5/5 = 1.0
    # against its own size 5); site C is disjoint
    for i in range(10):
        rows.append(("A", f"unique text a{i}"))
    for i in range(5):
        rows.append(("B", f"unique text a{i}"))
    for i in range(10):
        rows.append(("C", f"unique text c{i}"))
    # boilerplate shared by ALL sites — must be dropped by the guard
    for s in ("A", "B", "C"):
        rows.append((s, "copyright footer"))
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {(r.site_a, r.site_b): (r.shared, r.overlap_e6) for r in
           mirror_pairs(docs, min_overlap_e6=500_000, max_sites_per_fp=2).collect()}
    assert got == {("A", "B"): (5, 1_000_000)}
    # without the guard the footer joins everything: C now pairs too,
    # but below the threshold it still doesn't surface
    got2 = {(r.site_a, r.site_b): r.shared for r in
            mirror_pairs(docs, min_overlap_e6=500_000, max_sites_per_fp=None).collect()}
    assert got2 == {("A", "B"): 6}


def test_mirror_pairs_symmetric_input_order_invariant(spark):
    from crawler_spark.operators.textdedup import mirror_pairs

    rows = [("X", "t1"), ("X", "t2"), ("Y", "t1"), ("Y", "t2")]
    got = mirror_pairs(
        spark.createDataFrame(rows, "source string, text string"),
        min_overlap_e6=900_000,
    ).collect()
    assert [(r.site_a, r.site_b, r.overlap_e6) for r in got] == [("X", "Y", 1_000_000)]
