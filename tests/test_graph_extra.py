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


def _py_hits(edges, iters, unit=1_000_000):
    nodes = sorted({n for e in edges for n in e})
    es = sorted(edges)  # multiplicity counts, matching pagerank's out_deg semantics
    h = {n: unit for n in nodes}
    a = {n: 0 for n in nodes}

    def rescale(d):
        m = max(d.values()) if d else 0
        if m <= 0:
            return {n: 0 for n in d}
        return {n: (unit * v) // m for n, v in d.items()}

    for _ in range(iters):
        a = {n: 0 for n in nodes}
        for s_, d_ in es:
            a[d_] += h[s_]
        a = rescale(a)
        h = {n: 0 for n in nodes}
        for s_, d_ in es:
            h[s_] += a[d_]
        h = rescale(h)
    return {n: (h[n], a[n]) for n in nodes}


def test_hits_matches_integer_reference_exactly(spark):
    from crawler_spark.operators.graph import hits

    edges = [(i, (i * 7 + 3) % 20) for i in range(40)] + [
        (5, 13), (6, 13), (7, 13), (8, 13),
        (2, 9), (2, 11), (2, 17), (2, 19),
    ]
    edges = [(x, y) for x, y in edges if x != y]
    df = spark.createDataFrame(edges, "src long, dst long")
    for it in (1, 3, 8):
        got = {r["node"]: (r["hub_e6"], r["auth_e6"])
               for r in hits(df, iters=it).collect()}
        assert got == _py_hits(edges, it), f"iters={it}"
    # semantics at one iteration: authority ranks by in-degree, so the
    # planted 6-in-degree node 13 is the top authority
    one = {r["node"]: r["auth_e6"] for r in hits(df, iters=1).collect()}
    assert max(one, key=one.get) == 13 and one[13] == 1_000_000
    # partitioning invariance (exact)
    a = {r["node"]: (r["hub_e6"], r["auth_e6"]) for r in hits(df, iters=4).collect()}
    b = {r["node"]: (r["hub_e6"], r["auth_e6"])
         for r in hits(df.repartition(7), iters=4).collect()}
    assert a == b


def test_hits_degenerate_graphs(spark):
    from crawler_spark.operators.graph import hits

    # pure source -> pure sink: source is all hub, sink all authority
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: (r["hub_e6"], r["auth_e6"]) for r in hits(df, iters=3).collect()}
    assert got[1] == (1_000_000, 0) and got[2] == (0, 1_000_000)
    # edgeless graph -> no rows
    empty = spark.createDataFrame([], "src long, dst long")
    assert hits(empty, iters=2).count() == 0


# --------------------------------------------------------------- bfs_levels
def _py_bfs(pairs, sources, max_depth):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in pairs:
        adj[s].append(d)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        if dist[u] >= max_depth:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return {(n, d) for n, d in dist.items()}


def test_bfs_levels_matches_python_reference(spark):
    from crawler_spark.operators.graph import bfs_levels

    # deterministic graph with cycles, diamonds, and unreachable parts
    pairs = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
        (i, (i * 11 + 5) % 40) for i in range(0, 40, 2)
    ] + [(100, 101), (101, 100)]  # unreachable 2-cycle
    got = {
        (r["node"], r["dist"])
        for r in bfs_levels(
            _edges(spark, pairs), _seeds(spark, [0, 17]), max_depth=6
        ).collect()
    }
    assert got == _py_bfs(pairs, [0, 17], 6)


def test_bfs_levels_respects_max_depth_and_terminates_on_cycles(spark):
    from crawler_spark.operators.graph import bfs_levels

    chain = [(i, i + 1) for i in range(20)] + [(20, 0)]  # 21-cycle
    got = bfs_levels(_edges(spark, chain), _seeds(spark, [0]), max_depth=5)
    rows = {r["node"]: r["dist"] for r in got.collect()}
    assert rows == {i: i for i in range(6)}


def test_bfs_levels_partitioning_invariance(spark):
    from crawler_spark.operators.graph import bfs_levels

    pairs = [(i, (i * 3 + 1) % 30) for i in range(30)]
    a = sorted(
        map(tuple, bfs_levels(_edges(spark, pairs).repartition(1), _seeds(spark, [5]), 8).collect())
    )
    b = sorted(
        map(tuple, bfs_levels(_edges(spark, pairs).repartition(11), _seeds(spark, [5]), 8).collect())
    )
    assert a == b
