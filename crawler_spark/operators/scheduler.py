"""Round scheduling: gates, politeness budgets, canonical ordering, salting.

Re-expresses the reference's imperative queue discipline (SURVEY.md §2.6)
as window functions:

- O-SCHED1 round-robin  (crawler.py:527-555): FIFO within a site is
  sorted-URL order (the URL file is written sorted, app.py:128-130, and
  queues are loaded in file order, crawler.py:336-342); round-robin
  across sites ≙ take each host's top-`budget` URLs per round and order
  the round as (rank_in_host, site, url). That tuple IS the canonical
  crawl order the oracle checks.
- O-SCHED3 politeness    (crawler.py:31,894-920): ≥1s per host ≙ one
  round per politeness quantum with `rank_in_host <= crawl_budget`
  (budget 1 reproduces 1 req/s/host).
- O-SCHED4 429 backoff   (crawler.py:987-996): uniform(3,7)s becomes a
  deterministic 3..7-round backoff keyed on md5(host:round) so engine
  and oracle agree bit-for-bit.
- O-SCHED2 / X6 skew     (crawler.py:1265-1303): the reference shuffles
  domains to spread load; we salt the fetch assignment with
  pmod(xxhash64(host, round), n_salts) — a deterministic per-round
  rotation that spreads hosts uniformly over tasks even under host-hash
  clustering. Note the division of labor: per-host row count at the
  fetch stage is already bounded by crawl_budget (politeness), so the
  unbounded power-law skew lives in the *pre-budget* stages — and is
  neutralized there by the WindowGroupLimit top-k pushdown (see
  `schedule`), not by the salt.

Scale note: the per-host row_number window shuffles only *candidate*
rows (pending ∩ not-seen). The canonical `seq` is assigned WITHOUT a
single-partition global window: `assign_global_seq` range-partitions on
the order key and adds broadcast per-partition offsets, so even when
n_hosts × budget approaches frontier size (10^7-10^8 hosts at 100 TB)
no task ever sees more than its range slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark import schemas as S


def backoff_rounds_expr(host_col, round_no: int):
    """Deterministic surrogate for reference's random.uniform(3, 7):
    3 + (md5(host:round) first-8-hex % 5) ∈ {3..7}. Python twin in
    oracle.backoff_rounds."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", host_col, F.lit(str(round_no)))), 1, 8), 16, 10)
    return (F.lit(3) + F.pmod(h.cast("long"), F.lit(5))).cast("int")


def control_flags(control: DataFrame, round_no: int) -> DataFrame:
    """site_control windows -> per-round (site, paused, deleted) flags."""
    r = F.lit(round_no)
    return control.select(
        "site",
        (
            F.col("paused_from_round").isNotNull()
            & (r >= F.col("paused_from_round"))
            & (r <= F.col("paused_to_round"))
        ).alias("paused"),
        (F.col("deleted_at_round").isNotNull() & (r >= F.col("deleted_at_round"))).alias(
            "deleted"
        ),
    )


def _longest_match_len(prefixes, url) -> F.Column:
    """Length of the longest prefix in `prefixes` that matches `url`
    (0 when none match or the list is null). Pure JVM array ops."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.filter(
                    F.coalesce(prefixes, F.array()),
                    lambda p: url.startswith(p),
                ),
                F.length,
            )
        ),
        F.lit(0),
    )


# regex metacharacters to escape when compiling a robots rule — every
# special EXCEPT '*' (the RFC wildcard, handled after escaping)
_RX_META = r"([.^$+?()\[\]{}|\\])"


def compile_robots_rules(prefixes) -> F.Column:
    """Compile a robots rule array to array<struct<plen, plain, core,
    rx>> supporting RFC 9309 §2.2.3 special characters: '*' matches any
    character sequence, a trailing '$' anchors the rule to the URL end.

    Runs ONCE per robots DIM row (the rules table is a broadcast dim),
    so the per-URL gate pays regex matching only for rules that
    actually use wildcards — plain prefixes (the overwhelming majority
    of real robots files) keep the startswith fast path. `plen` is the
    raw rule's octet length, the RFC's specificity measure ('*'/'$'
    count toward length, as in Google's reference matcher)."""

    def one(p):
        anchored = p.endswith("$")
        core = F.when(anchored, p.substr(F.lit(1), F.length(p) - 1)).otherwise(p)
        plain = (~core.contains("*")) & (~anchored)
        esc = F.regexp_replace(core, _RX_META, r"\\$1")
        rx = F.concat(
            F.lit("^"),
            F.regexp_replace(esc, r"\*", ".*"),
            F.when(anchored, F.lit("$")).otherwise(F.lit("")),
        )
        return F.struct(
            F.length(p).alias("plen"),
            plain.alias("plain"),
            core.alias("core"),
            rx.alias("rx"),
        )

    return F.transform(F.coalesce(prefixes, F.array()), one)


def _longest_rule_len(rules, url) -> F.Column:
    """Longest-matching compiled rule's length (0 when none match):
    the RFC 9309 §2.2.2 precedence key over compile_robots_rules
    output. Plain rules match via startswith; wildcard/anchored rules
    via regexp_like on the pre-built pattern."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.filter(
                    rules,
                    lambda r: F.when(
                        r["plain"], url.startswith(r["core"])
                    ).otherwise(F.regexp_like(url, r["rx"])),
                ),
                lambda r: r["plen"],
            )
        ),
        F.lit(0),
    )


def compiled_robots_dim(robots: DataFrame) -> DataFrame:
    """The robots gate's broadcast dim: per-host compiled
    disallow/allow rule arrays + crawl budget. Pure function of the
    robots table — engines cache it per world so the ~100 expression
    objects behind compile_robots_rules are built once, not per round."""
    return robots.select(
        "host",
        compile_robots_rules(F.col("disallow_prefixes")).alias("_drules"),
        compile_robots_rules(F.col("allow_prefixes")).alias("_arules"),
        "crawl_budget",
    )


def gate_candidates(
    frontier: DataFrame,
    control: DataFrame,
    host_state: DataFrame,
    robots: DataFrame,
    round_no: int,
    extra_flags: DataFrame | None = None,
    compiled_robots: DataFrame | None = None,
) -> DataFrame:
    """P5 paused / P6 deleted / backoff / robots-disallow gates.

    All three gate tables are small dims -> broadcast joins; the frontier
    side never shuffles here. Paused/backoff rows simply stay `pending`
    in the frontier (ST4: nothing is ever dropped for lateness).

    extra_flags: additional (site, paused, deleted) rows from the
    engine's lifecycle API (C3/C4), OR-merged with the fixture windows.
    compiled_robots: a precomputed compiled_robots_dim(robots) frame.
    """
    flags = control_flags(control, round_no)
    if extra_flags is not None:
        flags = (
            flags.unionByName(extra_flags.select("site", "paused", "deleted"))
            .groupBy("site")
            .agg(F.max("paused").alias("paused"), F.max("deleted").alias("deleted"))
        )
    cand = (
        frontier.filter(F.col("state") == S.PENDING)
        .join(F.broadcast(flags), "site", "left")
        .filter(~F.coalesce("paused", F.lit(False)) & ~F.coalesce("deleted", F.lit(False)))
        .drop("paused", "deleted")
        .join(
            F.broadcast(host_state.select("host", "backoff_until_round")), "host", "left"
        )
        .filter(
            F.coalesce(F.col("backoff_until_round"), F.lit(-1)) <= F.lit(round_no)
        )
        .drop("backoff_until_round")
        .join(
            # rules compile (regex pre-build for '*'/'$' wildcards)
            # on the DIM side, once per host, before the broadcast
            F.broadcast(
                compiled_robots
                if compiled_robots is not None
                else compiled_robots_dim(robots)
            ),
            "host",
            "left",
        )
        # robots precedence (RFC 9309 §2.2.2): the LONGEST matching
        # rule wins; an allow at least as specific as the best
        # disallow keeps the URL (tie -> allow). Empty allow lists
        # reduce to the plain any-disallow-blocks behavior.
        .withColumn("_dmax", _longest_rule_len(F.col("_drules"), F.col("url")))
        .withColumn("_amax", _longest_rule_len(F.col("_arules"), F.col("url")))
        .filter(F.col("_dmax") <= F.col("_amax"))
        .drop("_drules", "_arules", "_dmax", "_amax")
        .withColumn("crawl_budget", F.coalesce("crawl_budget", F.lit(1)))
    )
    return cand


PRIORITY_ORDERS = {
    # reference-equality mode: sorted-URL FIFO (K1 writes sorted files)
    "fifo": lambda: [F.asc("url")],
    # north-star scoring: shallow-first (BFS-ish), oldest-discovery
    # first, then URL — favors breadth + starved pages
    "depth": lambda: [F.asc("depth"), F.asc("discovered_round"), F.asc("url")],
    # freshness recrawl flavor: most recently discovered first
    "recency": lambda: [F.desc("discovered_round"), F.asc("depth"), F.asc("url")],
    # external-score mode (OPIC/PageRank-style): highest pr_score first,
    # url tiebreak for determinism. The caller supplies pr_score — the
    # engine joins it from set_priority_scores (e.g. engine.pagerank()
    # over the recorded link graph) before scheduling.
    "score": lambda: [F.desc("pr_score"), F.asc("url")],
}


def assign_global_seq(
    df: DataFrame,
    order_cols: list,
    seq_base: int,
    n_parts: int | None = None,
    persist_registry: list | None = None,
) -> DataFrame:
    """Distributed total-order id assignment (no single-partition window).

    `row_number().over(Window.orderBy(...))` funnels every row through ONE
    task — fine when the post-budget set is small, a scale-killer when
    n_hosts × budget IS the frontier (10^7-10^8 hosts). Two-phase instead:

      1. repartitionByRange on the order key (parallel range shuffle),
         sortWithinPartitions (narrow, in-partition);
      2. per-partition row counts (n_parts tiny rows, collected) become
         broadcast offsets; a narrow Arrow pass (mapInPandas, vectorized
         arange — no per-row Python) stamps seq = seq_base +
         offset[partition] + position. No exchange after the range
         shuffle, no window, no join.

    The result is identical to the global row_number for any range
    boundaries, because ranges are contiguous in the total order — so
    sampling nondeterminism in the range partitioner cannot change seq.

    Both the input and the range-partitioned intermediate are persisted:
    repartitionByRange SAMPLES its input to pick boundaries (an extra
    full pass over the upstream pipeline if unpersisted), and the
    partitioned set is consumed twice (counts + seq stamping). The input
    here is the post-budget set — bounded by hosts x budget — so the
    cache is small by construction. Callers pass persist_registry to
    unpersist when the round's outputs are materialized.
    """
    import numpy as np

    from pyspark.sql import types as T

    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    df = df.persist()
    parted = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if persist_registry is not None:
        persist_registry.append(df)
        persist_registry.append(parted)
    counts = sorted(
        (r["_pid"], r["n"])
        for r in parted.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[int(pid)] = acc
        acc += int(n)
    b_off = spark.sparkContext.broadcast(offsets)
    out_schema = T.StructType(
        list(parted.schema.fields) + [T.StructField("seq", T.LongType(), False)]
    )

    def stamp(batches):
        pos = 0
        start = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if start is None:
                start = seq_base + b_off.value.get(int(pdf["_pid"].iloc[0]), 0)
            pdf = pdf.assign(seq=np.arange(start + pos + 1, start + pos + 1 + len(pdf)))
            pos += len(pdf)
            yield pdf

    return parted.mapInPandas(stamp, out_schema).drop("_pid")


# post-budget sets below this bound take the one-job single-window path;
# above it, the three-job two-phase assigner (whose fixed overhead is
# noise at that size, and whose parallelism is mandatory there)
SMALL_ORDER_ROWS = 1_000_000


def schedule(
    deduped: DataFrame,
    round_no: int,
    seq_base: int,
    n_salts: int = 8,
    max_budget: int = 64,
    priority: str = "fifo",
    persist_registry: list | None = None,
    expected_rows: int | None = None,
) -> DataFrame:
    """Budget window + canonical order + skew salt.

    Output: deduped candidates limited to crawl_budget per host, with
    `seq` = seq_base + position in canonical (rank_in_host, site, url)
    order, and `salt` for the fetch-assignment repartition.

    max_budget is a LITERAL upper bound on every host's crawl_budget
    (callers pass max(robots.crawl_budget)). It matters enormously:
    `rank <= literal` triggers Spark's WindowGroupLimit pushdown — each
    input partition keeps only its per-host top-k BEFORE the window
    exchange, so a skewed host (30% of the frontier) contributes k rows
    per partition instead of forcing one task to sort its whole slice.
    The exact per-host (column) budget filter runs after.

    priority picks the within-host order (PRIORITY_ORDERS): 'fifo'
    reproduces the reference exactly (the oracle pins it); 'depth' and
    'recency' are the north-star scored generalizations — same window
    machinery, different sort key, so every scale property (group-limit
    pushdown, distributed ordering) is priority-agnostic.

    expected_rows: the caller's A-PRIORI bound on the post-budget set —
    n_hosts x max_budget, known from the dims before touching data.
    Below SMALL_ORDER_ROWS the single-window seq (one job, one small
    task) beats the two-phase assigner's three-job overhead; above it
    (10^7-10^8 hosts: the bound IS the frontier) the two-phase path is
    mandatory — no single task may see the whole round. Both produce
    identical seq values (asserted in tests/test_plans.py); None means
    no bound is known and the scale-safe path is used.
    """
    order = PRIORITY_ORDERS[priority]()
    w_host = Window.partitionBy("host").orderBy(*order)
    limited = (
        deduped.withColumn("rank_in_host", F.row_number().over(w_host))
        .filter(F.col("rank_in_host") <= F.lit(max_budget))  # WindowGroupLimit
        .filter(F.col("rank_in_host") <= F.col("crawl_budget"))
    )
    full_order = [F.asc("rank_in_host"), F.asc("site"), *order]
    if expected_rows is not None and expected_rows <= SMALL_ORDER_ROWS:
        w_all = Window.orderBy(*full_order)
        seqd = limited.withColumn(
            "seq", (F.row_number().over(w_all) + F.lit(seq_base)).cast("long")
        )
    else:
        seqd = assign_global_seq(
            limited, full_order, seq_base, persist_registry=persist_registry
        )
    return (
        seqd.withColumn(
            "salt",
            F.pmod(F.xxhash64(F.col("host"), F.lit(round_no)), F.lit(n_salts)).cast("int"),
        )
        .withColumn("round", F.lit(round_no))
    )


def recrawl_priorities(
    history: DataFrame,
    budget: int | None = None,
    url_col: str = "url",
    host_col: str = "host",
    ts_col: str = "ts_ms",
    changed_col: str = "changed",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Freshness-driven recrawl scheduling (Cho & Garcia-Molina's
    change-rate estimator, the published incremental-crawler policy):
    from a fetch-history table with one row per past observation of a
    URL — (url, host, ts_ms, changed 0/1 vs the previous content hash)
    — estimate each URL's Poisson change rate with Laplace smoothing
    and rank by expected staleness:

        lambda_e6   = (1e6 * (2*changes + 1)) div (2*obs + 2)
                    = floor(1e6 * (changes + 0.5) / (obs + 1))
        priority_e6 = lambda_e6 * (now_ms - last_ms)

    Pure int64 (hash-certifiable); `now` is the history's max ts, kept
    in-plan via a broadcast 1-row aggregate, so the operator is a
    closed function of its input (no wall clock — deterministic and
    resume-safe). Output: one row per URL with (n_obs, n_changes,
    last_ms, priority_e6); with `budget`, only each host's top-budget
    URLs (priority desc, url asc) survive, via the same constant-bound
    row_number -> WindowGroupLimit shape as `schedule`.

    Scale shape: ONE partial-agg shuffle keyed on (host, url) — the
    same key layout as the frontier, so on the bucketed layout the
    groupBy is co-located — plus the budget window keyed on host
    (group-limit pushdown caps skewed hosts at `budget` rows per input
    partition). No self-joins, no collects. Feed the result to
    `CrawlEngine.set_priority_scores` (priority='score') to drive the
    recrawl round, exactly like the PageRank loop.

    Reference parity: the reference refetches on lifecycle events only
    (restart_site / refresh_sitemaps, crawler.py:223-248) — it has no
    change-rate model; this is the north-star generalization of that
    refetch policy to scheduled freshness.
    """
    hist = history.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        *[F.col(k) for k in extra_keys],
        F.col(ts_col).cast("long").alias("_ts"),
        F.col(changed_col).cast("long").alias("_chg"),
    )
    now = hist.agg(F.max("_ts").alias("now_ms"))
    per_url = (
        # extra_keys (e.g. url_hash) are functionally dependent on url;
        # grouping by them too carries them through without a join
        hist.groupBy("host", "url", *extra_keys)
        .agg(
            F.count("*").alias("n_obs"),
            F.sum("_chg").alias("n_changes"),
            F.max("_ts").alias("last_ms"),
        )
        .crossJoin(F.broadcast(now))
        .withColumn(
            "priority_e6",
            F.expr(
                "((1000000 * (2*n_changes + 1)) div (2*n_obs + 2))"
                " * (now_ms - last_ms)"
            ).cast("long"),
        )
        .drop("now_ms")
    )
    if budget is None:
        return per_url
    w = Window.partitionBy("host").orderBy(F.desc("priority_e6"), F.asc("url"))
    return (
        per_url.withColumn("rank_in_host", F.row_number().over(w))
        .filter(F.col("rank_in_host") <= F.lit(budget))  # WindowGroupLimit
        .withColumn("rank_in_host", F.col("rank_in_host").cast("int"))
    )


# changefreq -> prior change probability in ppm-per-ms-scaled units:
# the sitemap protocol's enumerated hints mapped to the lambda_e6 scale
# recrawl_priorities estimates from observations, so bootstrap and
# observed priorities are directly comparable (priority_e6 =
# lambda_e6 x staleness_ms on both paths). Values decay roughly with
# the hinted period; 'never' -> 0; absent/unknown -> the 'weekly'-ish
# default. All integers — hash-certifiable.
CHANGEFREQ_LAMBDA_E6 = {
    "always": 500_000,
    "hourly": 200_000,
    "daily": 50_000,
    "weekly": 10_000,
    "monthly": 2_000,
    "yearly": 200,
    "never": 0,
}
DEFAULT_CHANGEFREQ_LAMBDA_E6 = 10_000


def bootstrap_recrawl_priorities(
    entries: DataFrame,
    now_ms: int,
    url_col: str = "url",
    lastmod_col: str = "lastmod",
    changefreq_col: str = "changefreq",
) -> DataFrame:
    """Recrawl priorities for NEVER-FETCHED URLs from sitemap hints —
    the cold-start companion of recrawl_priorities (which needs fetch
    history): priority_e6 = changefreq-prior lambda_e6 x staleness
    since <lastmod>.

    entries: parse_sitemap_meta output (or anything with url/lastmod/
    changefreq columns). lastmod is a W3C datetime string; rows with no
    parseable lastmod get staleness from epoch 0 (maximally stale —
    unknown age should rank, not hide). `now_ms` is an explicit
    argument (no wall clock in-plan: deterministic and resume-safe;
    pass e.g. the ingest batch's timestamp).

    Output: (url, lastmod_ms, lambda_e6, priority_e6) — feed the head
    to engine.schedule_recrawl / set_priority_scores exactly like
    recrawl_scores. Once a URL has observations the estimator's own
    lambda supersedes this prior (the caller anti-joins fetch history).

    Scale shape: pure per-row expressions + one optional dedup
    groupBy on url (a URL listed in several sitemaps keeps its max
    priority) — no self-joins, no collects.
    """
    pairs: list = []
    for k in sorted(CHANGEFREQ_LAMBDA_E6):
        pairs += [F.lit(k), F.lit(CHANGEFREQ_LAMBDA_E6[k])]
    lam_map = F.create_map(*pairs)
    lam = F.coalesce(
        lam_map[F.lower(F.trim(F.col(changefreq_col)))],
        F.lit(DEFAULT_CHANGEFREQ_LAMBDA_E6),
    ).cast("long")
    # try_to_timestamp: malformed lastmod strings -> NULL -> epoch 0
    # (ANSI-safe; plain to_timestamp would throw on garbage input)
    lastmod_ms = F.coalesce(
        (F.unix_timestamp(F.try_to_timestamp(F.col(lastmod_col))) * 1000).cast(
            "long"
        ),
        F.lit(0).cast("long"),
    )
    per_row = (
        F.col(url_col).alias("url"),
        lastmod_ms.alias("lastmod_ms"),
        lam.alias("lambda_e6"),
        (lam * F.greatest(F.lit(now_ms).cast("long") - lastmod_ms, F.lit(0)))
        .cast("long")
        .alias("priority_e6"),
    )
    return (
        entries.select(*per_row)
        .groupBy("url")
        .agg(
            F.max("lastmod_ms").alias("lastmod_ms"),
            F.max("lambda_e6").alias("lambda_e6"),
            F.max("priority_e6").alias("priority_e6"),
        )
    )


def plan_fetch_partitions(
    host_costs: DataFrame,
    n_bins: int,
    cost_col: str = "cost",
    host_col: str = "host",
    persist_registry: list | None = None,
    expected_rows: int | None = None,
) -> DataFrame:
    """Snake-LPT fetch-slot planner: spread hosts over n_bins worker
    bins so per-bin total cost (expected fetch seconds: pending URLs x
    crawl-delay, bytes, whatever the caller prices) is balanced.

    Classic LPT (sort by cost desc, give each item to the currently
    lightest bin) is a 4/3-approximation but inherently sequential; the
    snake variant keeps the sort and replaces "lightest bin" with a
    boustrophedon sweep — rank r (1-based, cost desc) goes to bin
    idx = (r-1) mod 2n, folded (idx < n ? idx : 2n-1-idx) — so each
    full sweep deals every bin exactly two hosts whose costs face
    opposite ends of the sorted window. Fully vectorized, one total
    order + a per-row expression; balance is within one max-host-cost
    of even for any cost distribution (each sweep adds the same row
    pair count per bin; imbalance never accumulates across sweeps).

    The total order reuses the scheduler's two-phase assigner above
    SMALL_ORDER_ROWS (no single-partition window at 10^7-10^8 hosts);
    below it, the one-job window. Both paths produce the identical
    rank, so the output is partition-count- and path-invariant.

    Output: host, cost, rank (1-based in cost-desc order), bin.
    Downstream: `df.repartition(n_bins, "bin")` co-locates each bin's
    hosts into one task — the fetch analog of the salt repartition,
    but cost-aware instead of hash-uniform.
    """
    base = host_costs.select(
        F.col(host_col).alias("host"), F.col(cost_col).cast("long").alias("cost")
    )
    order = [F.col("cost").desc(), F.col("host").asc()]
    n_rows = expected_rows if expected_rows is not None else base.count()
    if n_rows <= SMALL_ORDER_ROWS:
        ranked = base.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
        )
    else:
        ranked = assign_global_seq(
            base, order, seq_base=0, persist_registry=persist_registry
        ).withColumnRenamed("seq", "rank")
    two_n = 2 * int(n_bins)
    idx = (F.col("rank") - 1) % two_n
    return ranked.select(
        "host",
        "cost",
        "rank",
        F.when(idx < n_bins, idx)
        .otherwise(two_n - 1 - idx)
        .cast("int")
        .alias("bin"),
    )


def bin_loads(plan: DataFrame) -> DataFrame:
    """Per-bin load summary for a plan_fetch_partitions output:
    bin, n_hosts, total_cost, max_cost — exact int64 aggregates (one
    tiny groupBy; bins number executor-slots)."""
    return plan.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum("cost").alias("total_cost"),
        F.max("cost").alias("max_cost"),
    )


def apportion_budget(
    weights: DataFrame,
    total: int,
    key_col: str = "host",
    weight_col: str = "weight",
    persist_registry: list | None = None,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global fetch
    budget across hosts: budget_i = floor(total*w_i/W) plus one extra
    for the hosts with the largest remainders, so sum(budget) == total
    EXACTLY and every budget is within 1 of its ideal proportional
    share (the apportionment with zero quota violation).

    The crawl use: the per-host crawl_budget is a POLITENESS cap; when
    the cluster's own fetch capacity is the binding constraint, the
    operator turns per-host desirability (site quality x change rate x
    authority — any integer weight) into per-host budgets that spend
    exactly the round's capacity. Feed the result to
    engine.set_host_budgets to override the robots default.

    All-integer arithmetic (floor-div quotas, integer remainders) ->
    hash-certifiable; non-positive/absent weights get 0. If ALL
    weights are <= 0 the total stays unspent (all budgets 0) — the
    caller decides the fallback, not the operator. total * max(w) must
    fit int64 (ANSI mode errors loudly past it) — rescale huge weight
    units (e.g. pagerank's 1e6-unit scores DIV 1000) rather than
    switching to floats.

    Scale shape: one tiny agg (W, sum of floors — two scalars), then
    the remainder ranking reuses assign_global_seq, the engine's
    distributed total-order assigner — no single-partition window even
    at 10^7-10^8 hosts. Output: (key_col, budget) for every input host.
    """
    if total < 0:
        raise ValueError("total must be >= 0")
    w = weights.select(
        F.col(key_col).alias("_k"),
        F.greatest(F.coalesce(F.col(weight_col).cast("long"), F.lit(0)), F.lit(0)).alias(
            "_w"
        ),
    ).groupBy("_k").agg(F.sum("_w").alias("_w"))
    tot = w.agg(
        F.coalesce(F.sum("_w"), F.lit(0)).cast("long").alias("W"),
    ).first()
    W = int(tot["W"])
    if W == 0 or total == 0:
        return w.select(F.col("_k").alias(key_col), F.lit(0).cast("long").alias("budget"))
    # integer DIV/% on nonnegative operands: floor quota + remainder
    base = w.select(
        "_k",
        F.expr(f"CAST({total} * _w AS LONG) DIV {W}").alias("_base"),
        F.expr(f"CAST({total} * _w AS LONG) % {W}").alias("_rem"),
    )
    leftover = total - int(
        base.agg(F.coalesce(F.sum("_base"), F.lit(0)).cast("long")).first()[0]
    )
    ranked = assign_global_seq(
        base,
        [F.desc("_rem"), F.asc("_k")],
        seq_base=0,
        persist_registry=persist_registry,
    )
    return ranked.select(
        F.col("_k").alias(key_col),
        (
            F.col("_base")
            + F.when(F.col("seq") <= F.lit(leftover), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("budget"),
    )
