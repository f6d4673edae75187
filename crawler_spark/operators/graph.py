"""Distributed graph operators: connected components, link-graph
degree stats, and integer-arithmetic PageRank.

Near-dup detection (minhash-LSH / simhash / winnowing) emits PAIRS;
an actual dedup pass needs CLUSTERS — the transitive closure of those
pairs — so each group keeps exactly one canonical document. At corpus
scale the closure cannot be a driver-side union-find: it has to be a
bounded number of DataFrame jobs.

`connected_components` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — public): each iteration is two
groupBy+join rounds over the edge set, and the edge set converges in
O(log n) iterations to per-component stars rooted at the component
minimum. No step ever materializes a component in one task, so skewed
(giant) components stay distributed; `localCheckpoint` truncates the
growing lineage each round (on a real cluster, a reliable checkpoint
dir works the same way).

Reference tie-in: the reference crawler dedups entities by exact key
only (crawler.py ~1137-1170, seen-key anti-join); cluster-level near-dup
canonicalization is part of the training-data-pipeline surface this
engine adds on top (SURVEY.md LLM-data ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERS = 40  # ≥ log2(n) for any conceivable corpus; loop asserts convergence


def _canon(e: DataFrame) -> DataFrame:
    """Undirected canonical form: (min, max), no self-loops, distinct."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor to
    min(N(u) ∪ {u}). Processes the symmetric edge list, so every edge
    is re-emitted from its smaller endpoint's perspective."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    out = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return _canon(out)


def _small_star(e: DataFrame) -> DataFrame:
    """Direct each edge to its smaller endpoint; for each node u,
    connect all smaller neighbors AND u itself to min(N⁻(u))."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    members = d.union(d.select("u", F.col("u").alias("v"))).distinct()
    out = members.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    return _canon(out)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = MAX_ITERS,
) -> DataFrame:
    """(doc_id, cluster_id) for every node that appears in `pairs`,
    cluster_id = the component's minimum node id.

    Alternating star rounds until the edge set's (count, hash-sum)
    signature is stable — at the fixpoint the edges ARE the answer:
    per-component stars rooted at the minimum. Callers union in
    singleton docs themselves if they need total coverage
    (see canonical_corpus, which doesn't: absent == canonical).

    Ids keep their NATIVE type — the algorithm only needs a total
    order, which least/greatest/min give every orderable Spark type.
    The engine's ids are md5-hex STRINGS (url_hash/doc_id): a cast to
    long would crash under ANSI mode on the first hex digit ≥ 'a'
    (pinned by test_connected_components_hex_string_ids).
    """
    e = _canon(pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")))
    prev_sig = None
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # decimal sum: an order-free set signature that can't overflow
        # under ANSI mode (xxhash64 sums past +/-2^63 on big edge sets)
        sig = tuple(
            e.agg(
                F.count("*"), F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))
            ).first()
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} iters")
    return (
        e.select(F.col("v").alias("doc_id"), F.col("u").alias("cluster_id"))
        .union(e.select(F.col("u").alias("doc_id"), F.col("u").alias("cluster_id")))
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def incremental_components(
    assignment: DataFrame | None,
    new_pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = MAX_ITERS,
) -> DataFrame:
    """Fold a batch of NEW near-dup pairs into an existing
    (doc_id, cluster_id) assignment WITHOUT re-running connected
    components over the historical pair set.

    Contract-then-solve: each new edge endpoint maps to its current
    cluster root (itself when unassigned — two broadcast-or-co-located
    equi-joins against the assignment), connected_components runs on
    the CONTRACTED delta graph (O(|new pairs|) edges over roots + new
    docs, regardless of corpus size), and the resulting root relabeling
    joins back onto the assignment. Equal BY CONSTRUCTION to batch CC
    over the union of every pair ever folded (contracting a component
    to its root preserves connectivity; min-root labels compose because
    each old root is already its component's min) — and pinned by the
    3-batch equality test + the dup_clusters_incremental oracle entry.

    At 10^10 docs this is the difference between re-clustering the full
    pair history every crawl round (O(E_total log n) shuffles) and
    paying O(|delta| log |delta|) + two joins against an O(n_docs)
    assignment table.

    Limitation (standard for incremental CC): folding only ADDS edges —
    removing a doc that bridged two clusters does not split them; run
    the batch connected_components to re-canonicalize after bulk
    deletions.
    """
    deltas = incremental_component_deltas(assignment, new_pairs, a_col, b_col, max_iters)
    if assignment is None:
        return deltas
    unchanged = assignment.select("doc_id", "cluster_id").join(
        deltas, "doc_id", "left_anti"
    )
    return unchanged.unionByName(deltas)


def incremental_component_deltas(
    assignment: DataFrame | None,
    new_pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = MAX_ITERS,
) -> DataFrame:
    """The CHANGED rows of incremental_components only: docs whose
    cluster label this fold creates (new docs) or rewrites (old
    components whose root merged). The O(|affected|) core that
    delta-state cluster maintenance commits — at 10^10 docs the fold's
    WRITE must be sized by the relabeling, not the assignment, exactly
    as the frontier commits state transitions instead of the frontier.

    incremental_components == (assignment minus these doc_ids) ∪ these,
    which is how it is now defined."""
    e = _canon(new_pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")))
    if assignment is None:
        return connected_components(e, "u", "v", max_iters)
    asg = assignment.select("doc_id", "cluster_id")
    ru = asg.select(
        F.col("doc_id").alias("u"), F.col("cluster_id").alias("_ru")
    )
    rv = asg.select(
        F.col("doc_id").alias("v"), F.col("cluster_id").alias("_rv")
    )
    contracted = (
        e.join(ru, "u", "left")
        .join(rv, "v", "left")
        .select(
            F.coalesce("_ru", F.col("u")).alias("doc_a"),
            F.coalesce("_rv", F.col("v")).alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    delta_cc = connected_components(contracted, "doc_a", "doc_b", max_iters)
    # relabel old components whose ROOT merged into a new component
    remap = delta_cc.select(
        F.col("doc_id").alias("cluster_id"), F.col("cluster_id").alias("_new")
    )
    changed = (
        asg.join(remap, "cluster_id")
        .filter(F.col("_new") != F.col("cluster_id"))
        .select("doc_id", F.col("_new").alias("cluster_id"))
    )
    fresh = delta_cc.join(asg, "doc_id", "left_anti")
    return changed.unionByName(fresh)


def link_graph_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, out_deg, in_deg) for every node in the link graph.

    Two partial-aggregated exchanges (one per direction) merged by a
    full outer join on the node id — never wider than the node set.
    The crawl analog: in-degree over the engine's discovered-links
    output ranks hosts/pages for crawl prioritization (OPIC-style).
    """
    out_d = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst_col).alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


PR_UNIT = 10**12  # integer PageRank mass units per node (see pagerank)


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    unit: int = PR_UNIT,
    damping_num: int = 850,
    damping_den: int = 1000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank in pure 64-bit INTEGER arithmetic — bit-identical on any
    partitioning, any executor count, and in the DuckDB oracle.

    Floating-point PageRank cannot be value-hash-certified across
    engines: parallel double summation is order-dependent. Instead each
    node starts with `unit` integer mass units and every step is exact:
      contrib  = score div out_deg                  (floor division)
      score'   = (1-d)*unit + (850 * sum(contribs)) div 1000
    The div remainders leak a vanishing fraction of mass (< out_deg
    units per node per round) — the standard price of fixed-point
    PageRank; ranking order matches the float fixpoint (tested vs a
    numpy reference). Dangling-node mass is dropped (the common
    simplification).

    Scale shape per iteration: scores⋈edges on src (one exchange of the
    EDGE list; scores are node-sized), partial-agg groupBy dst, left
    join back to nodes; lineage truncated per round via localCheckpoint
    so the plan stays O(1) deep. Overflow is ANSI-checked, not silent:
    choose `unit` so n_nodes * unit * damping_num < 2^63 (the default
    1e12 covers ~10^7 nodes; at 10^10 pages use unit=10^5).

    Public-knowledge basis: Page et al. 1999 (the PageRank paper);
    integer/fixed-point formulation is folklore in large-scale graph
    systems.
    """
    assert damping_den > damping_num > 0
    base = unit * (damping_den - damping_num) // damping_den
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    scores = nodes.select("node", F.lit(unit).cast("long").alias("score"))
    e = edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("dst"))
    for _ in range(iters):
        contrib = (
            e.join(scores, "node")
            .join(deg, "node")
            .select(
                F.col("dst").alias("node"),
                F.expr("score div out_deg").alias("c"),
            )
        )
        agg = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        scores = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
                ).cast("long").alias("score"),
            )
            .localCheckpoint(eager=True)
        )
    return scores.select("node", F.col("score").alias(f"score_e{len(str(unit)) - 1}"))


BROADCAST_LOSERS_MAX = 20_000_000  # ~300 MB of long ids — safe executor broadcast


def canonical_corpus(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", **cc_kwargs
) -> DataFrame:
    """Drop every non-canonical near-dup: keep one doc (the min id) per
    cluster plus all unpaired docs.

    The loser set is the duplication rate times the corpus — at web
    scale that is 30-50% of ALL docs, far too big to broadcast
    unconditionally. Auto-select: count the losers (cheap — the CC
    output is already materialized via localCheckpoint) and broadcast
    only under BROADCAST_LOSERS_MAX; above it, a plain shuffled
    left_anti on the id — one exchange of the corpus, the honest cost
    of deduplicating it (same shape as the engine's J1 seen anti-join,
    which the bucketed layout removes when ids are co-located)."""
    clusters = connected_components(pairs, **cc_kwargs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    if losers.count() <= BROADCAST_LOSERS_MAX:
        losers = F.broadcast(losers)
    return docs.join(losers, id_col, "left_anti")


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    unit: int = PR_UNIT,
    damping_num: int = 850,
    damping_den: int = 1000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """TrustRank (Gyongyi et al., VLDB'04): PageRank personalized to a
    trusted seed set — teleport mass lands ONLY on seeds, so trust
    decays with link distance from them and spam farms unreachable
    from good pages score ~0. The standard web-spam demotion signal
    beside the trap detector's URL-shape heuristics.

    Same exact-int64 arithmetic and per-iteration plan as `pagerank`
    (edge-list exchange + partial-agg groupBy dst; lineage truncated
    via localCheckpoint); the only change is the teleport vector:
    seeds start with `unit` mass and receive the (1-d) restart, all
    other nodes start at 0 and receive none. Bit-identical under any
    partitioning; hash-certifiable in DuckDB.

    seeds: DataFrame with a `node` column (tiny — broadcast).
    """
    assert damping_den > damping_num > 0
    base = unit * (damping_den - damping_num) // damping_den
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .join(
            F.broadcast(
                seeds.select("node").distinct().withColumn("_s", F.lit(True))
            ),
            "node",
            "left",
        )
        .select("node", F.coalesce("_s", F.lit(False)).alias("is_seed"))
    )
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    scores = nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(unit)).otherwise(F.lit(0))
        .cast("long").alias("score"),
    )
    e = edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("dst"))
    for _ in range(iters):
        contrib = (
            e.join(scores, "node")
            .join(deg, "node")
            .select(
                F.col("dst").alias("node"),
                F.expr("score div out_deg").alias("c"),
            )
        )
        agg = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        scores = (
            nodes.join(agg, "node", "left")
            .select(
                "node",
                (
                    F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
                    + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
                ).cast("long").alias("score"),
            )
            .localCheckpoint(eager=True)
        )
    return scores.select("node", F.col("score").alias(f"trust_e{len(str(unit)) - 1}"))


def hits(
    edges: DataFrame,
    iters: int = 5,
    unit: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM'99) in exact 64-bit
    integer arithmetic — bit-identical on any partitioning and in the
    DuckDB oracle (the pagerank/trustrank recipe applied to the
    two-vector power iteration).

    Per iteration: auth(v) = sum of hub over in-edges, then rescaled to
    max `unit` by integer division; hub(u) = sum of the NEW auth over
    out-edges, rescaled the same way. Max-rescaling replaces the
    classic L2 normalization — both converge to the dominant
    eigenvectors of A^T A / A A^T up to scale, so the RANKING matches
    (only absolute values differ), and integer max-division is exact
    and order-independent where a parallel float L2 sum is not. The two
    per-iteration max() lookups are 1-row collects (the bpe/kmeans
    driver-collect budget). Nodes with no in-edges get authority 0;
    no out-edges -> hub 0; an edgeless graph returns no rows.

    Overflow bound: scores <= unit after rescale, so a sum is <=
    max_in_degree * unit — int64-safe through ~9e12-degree hubs at the
    default unit.

    Scale shape per iteration: two edge-list exchanges (join on src,
    partial-agg on dst; then the mirror), scores stay node-sized,
    lineage truncated via eager localCheckpoint.
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    hub = nodes.select("node", F.lit(unit).cast("long").alias("h"))

    def _rescale(df, col):
        m = df.agg(F.max(col)).first()[0] or 0
        if m <= 0:
            return df.select("node", F.lit(0).cast("long").alias(col))
        return df.select(
            "node", F.expr(f"({unit} * {col}) div {m}").cast("long").alias(col)
        )

    auth = nodes.select("node", F.lit(0).cast("long").alias("a"))
    for _ in range(iters):
        araw = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        auth = _rescale(
            nodes.join(araw, "node", "left").select(
                "node", F.coalesce("a", F.lit(0)).cast("long").alias("a")
            ),
            "a",
        ).localCheckpoint(eager=True)
        hraw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        hub = _rescale(
            nodes.join(hraw, "node", "left").select(
                "node", F.coalesce("h", F.lit(0)).cast("long").alias("h")
            ),
            "h",
        ).localCheckpoint(eager=True)
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0)).cast("long").alias("hub_e6"),
            F.coalesce("a", F.lit(0)).cast("long").alias("auth_e6"),
        )
    )


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Unweighted shortest-path distance from a source set, following
    edge direction: (node, dist) for every node reachable within
    max_depth hops (dist 0 = the sources themselves).

    The crawl-audit use: the frontier's `depth` is DISCOVERY depth
    (which round first found the URL under politeness budgets), not
    graph distance — bfs_levels over the recorded edges gives the true
    link distance from the seeds, and the gap between the two measures
    how much the politeness/budget machinery delays deep pages
    (engine.seed_distances wires this up).

    Scale shape: level-synchronous BFS as DataFrame joins — each round
    is frontier ⋈ edges (shuffle keyed on src; pre-partition edges by
    src to co-locate every round) followed by one anti-join against the
    visited set; lineage truncated per round via localCheckpoint, and
    the loop stops as soon as a level is empty (one scalar count per
    round — the same per-iteration driver cost as pagerank's rescale).
    Visited grows monotonically but stays (node, dist) — O(|reachable
    nodes|), never edges.

    sources: DataFrame with a `node` column. Nodes keep their native
    orderable type (md5-hex strings in the engine).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    frontier = sources.select("node").distinct().localCheckpoint(eager=True)
    visited = frontier.select("node", F.lit(0).alias("dist"))
    for d in range(1, max_depth + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt.select("node", F.lit(d).alias("dist")))
        frontier = nxt
    return visited.select("node", F.col("dist").cast("int").alias("dist"))
