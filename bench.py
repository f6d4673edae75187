"""Benchmark harness (BASELINE.md target: URLs scheduled+deduped/sec).

Default run (driver contract): headline scheduling+dedup job on a
synthetic power-law frontier + representative operator queries at
$SPARK_GRAFT_SF_DIR, printing ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "urls_per_sec": ..., ...}

`python bench.py --scaling` additionally runs the SAME headline job at
local[N] and local[4N] (SPARK_GRAFT_SCALE_N, default N=4) on the SAME
input and writes BENCH/BASELINE.md with both throughputs and
efficiency = (throughput_4N / throughput_N) / 4 — the sandbox proxy
for the north rule's N->4N executor scaling requirement.

The headline job is the engine's real hot path built from the real
operators (operators.scheduler / operators.dedup): read frontier +
seen from parquet, exact-or-bloom anti-join, per-host budget window,
canonical order, salted repartition. The frontier is power-law skewed
(hash^3 host assignment) so the salting path is actually exercised.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_URLS = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "2000000"))
N_SEEN = int(os.environ.get("SPARK_GRAFT_BENCH_SEEN", "8000000"))
N_HOSTS = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "10000"))
BUDGET = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "8"))

BENCH_QUERIES = [
    "frontier_schedule_round",
    "seen_antijoin",
    "broadcast_dim_join",
    "tpch_q1",
    "sessionize",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_near_dup",
    "ann_topk",
    "lsh_buckets",
    "text_profile",
    "repetition_profile",
    # round-3 curation additions (new keys — exclude from cross-round
    # suite-wall comparisons; the pre-existing keys above are the
    # apples-to-apples set)
    "pii_profile",
    "gopher_gates",
    "classifier_score",
    "contamination",
    "full_curation",
    "bm25_topk",
    "recrawl_schedule",
    "lm_score",
    "trap_hosts",
    "mixture_weights",
    "token_budget_mix",
    "fetch_plan",
    "dsir_select",
    "quantized_topk",
    "semdedup",
    "hybrid_topk",
    "exact_substr_strip",
    "trustrank",
    "mirror_sites",
    "caption_pairs",
    "strip_boilerplate",
    "bpe_merges",
    "heavy_hitters",
    "anchor_topk",
    # round-3 continuation additions (new keys)
    "revalidate_plan",
    "holdout_split",
    "dup_clusters_incremental",
    # round-4 additions (new keys)
    "model_embed",
    "lsh_hot_buckets",
    "robots_parse",
    "robots_groups",
    "sitemap_parse",
    "url_strip_tracking",
    "text_normalize",
]


# Engine-composite entries (full multi-round crawls): dominated by
# per-round fixed overhead, not operator dataflow — reported under a
# separate "composite" section so the per-operator suite wall stays
# comparable round over round (r04 verdict Next #6).
COMPOSITE_QUERIES = [
    "crawl_multiround",
]


N_BUCKETS = 64


def get_session(cpus: int, warehouse: str | None = None, scaling: bool = False):
    from crawler_spark.session import get_spark

    extra = {"spark.sql.warehouse.dir": warehouse} if warehouse else None
    if scaling:
        # scaling runs: FIXED across parallelism levels — same plan, same
        # partition count, only executor slots change (the cluster-faithful
        # N->4N comparison) — and a heap that holds the ~50M-row/side hot
        # join without spilling (the sandbox box has 128 GiB).
        shuffle_partitions, driver_memory = N_BUCKETS, "48g"
    else:
        # per-round suite: sized to ITS input (2M candidates), not the 48M
        # scaling regime — 64 partitions/48g here cost ~25% wall on the 2M
        # jobs for nothing (diagnosed in round 2, VERDICT "What's wrong" #1)
        shuffle_partitions, driver_memory = max(cpus, 8), "16g"
    return get_spark(
        app=f"crawler-spark-bench-{cpus}",
        cpus=cpus,
        shuffle_partitions=shuffle_partitions,
        driver_memory=driver_memory,
        extra=extra,
    )


# --- bucketed storage: the sandbox stand-in for Iceberg bucket(url_hash, N)
# --- partitioning. frontier and seen cluster+sort by url_hash, so the seen
# --- anti-join runs WITHOUT any exchange (co-located sort-merge) — this is
# --- what makes the hot path scale (see BENCH/BASELINE.md).

_BUCKET_DDL = """
CREATE TABLE IF NOT EXISTS {name} ({cols}) USING PARQUET
CLUSTERED BY (url_hash) SORTED BY (url_hash) INTO {n} BUCKETS
LOCATION '{loc}'
"""
_FRONTIER_COLS = (
    "url STRING, host STRING, site STRING, url_hash STRING, h64 BIGINT, "
    "state STRING, depth INT"
)


def write_bucketed_tables(spark, wh: str, fpath: str, spath: str) -> None:
    spark.read.parquet(fpath).select(
        "url", "host", "site", "url_hash", "h64", "state", "depth"
    ).write.bucketBy(N_BUCKETS, "url_hash").sortBy("url_hash").mode("overwrite").saveAsTable(
        "frontier_b"
    )
    spark.read.parquet(spath).select("url_hash").write.bucketBy(
        N_BUCKETS, "url_hash"
    ).sortBy("url_hash").mode("overwrite").saveAsTable("seen_b")


def register_bucketed_tables(spark, wh: str) -> None:
    """Re-attach the bucketed tables in a fresh session (the in-memory
    catalog does not persist across sessions; the DDL points at the
    same bucketed files)."""
    spark.sql(
        _BUCKET_DDL.format(
            name="frontier_b", cols=_FRONTIER_COLS, n=N_BUCKETS, loc=f"{wh}/frontier_b"
        )
    )
    spark.sql(
        _BUCKET_DDL.format(name="seen_b", cols="url_hash STRING", n=N_BUCKETS, loc=f"{wh}/seen_b")
    )


def run_schedule_job_bucketed(
    spark, budget: int = BUDGET, force_two_phase: bool = False
):
    from crawler_spark.operators.scheduler import schedule

    frontier = spark.table("frontier_b").withColumn("crawl_budget", F.lit(budget))
    seen = spark.table("seen_b")
    deduped = frontier.join(seen, "url_hash", "left_anti")  # co-located, no exchange
    persists: list = []
    sched = schedule(
        deduped, round_no=1, seq_base=0, n_salts=64, max_budget=budget,
        persist_registry=persists,
        expected_rows=None if force_two_phase else N_HOSTS * budget,
    )
    n = sched.repartition("salt", "host").count()
    for df in persists:
        df.unpersist()
    return n


def _url_cols(df, path_tag: str, n_hosts: int):
    uni = F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0
    hostidx = F.least((F.pow(uni, F.lit(3.0)) * n_hosts).cast("long"), F.lit(n_hosts - 1))
    host = F.concat(
        F.lit("h"), F.lpad(hostidx.cast("string"), 5, "0"), F.lit(".bench.example.com")
    )
    url = F.concat(
        F.lit("https://"), host, F.lit(path_tag), F.lpad(F.col("id").cast("string"), 12, "0")
    )
    return df.select(
        F.col("id"),
        url.alias("url"),
        host.alias("host"),
        F.regexp_replace(host, r"\.", "_").alias("site"),
        F.md5(url).alias("url_hash"),
        F.xxhash64(url).alias("h64"),
    )


def write_bench_frontier(spark, root: str, n_urls: int, n_hosts: int) -> tuple[str, str]:
    """Materialize a power-law frontier + a much larger seen set.

    The steady-state crawl regime: seen (everything ever fetched,
    N_SEEN rows) is several× the per-round candidate set, and ~10% of
    candidates are re-discovered duplicates. host = hash-uniform³ so
    the top host owns a large frontier share (skew for the salting
    path).
    """
    fpath, spath = os.path.join(root, "frontier"), os.path.join(root, "seen")
    base = _url_cols(spark.range(n_urls), "/p/", n_hosts)
    base.withColumn("state", F.lit("pending")).withColumn("depth", F.lit(0)).drop(
        "id"
    ).write.mode("overwrite").parquet(fpath)
    dup_slice = base.filter(F.pmod("id", F.lit(10)) == 0)  # 10% already seen
    historic = _url_cols(spark.range(N_SEEN), "/old/", n_hosts)
    dup_slice.unionByName(historic).select(
        "url", "url_hash", "h64", "site", "host"
    ).withColumn("fetched_round", F.lit(0)).write.mode("overwrite").parquet(spath)
    return fpath, spath


def run_schedule_job(
    spark,
    fpath: str,
    spath: str,
    bloom_path: str | None = None,
    budget: int = BUDGET,
    force_two_phase: bool = False,
    probe_mode: str = "broadcast",
):
    """The measured hot path: candidates -> dedup -> budget -> order -> salt.

    With bloom_path set, dedup probes the PRE-BUILT persistent bucket
    filters (the engine's steady state: filters are maintained
    incrementally at commit, not rebuilt per round) and only the
    maybe-seen slice touches the exact seen set.

    force_two_phase benches the distributed seq assigner (the >1M-row
    scale path) even though this input's a-priori bound would pick the
    one-job window — so its fixed overhead is measured, not hidden.
    """
    from crawler_spark.operators import dedup as D
    from crawler_spark.operators.scheduler import schedule

    frontier = spark.read.parquet(fpath).withColumn("crawl_budget", F.lit(budget))
    seen = spark.read.parquet(spath)
    if bloom_path and bloom_path.endswith("cuckoos"):
        from crawler_spark.operators import cuckoo as CK

        filters = spark.read.schema(CK.CUCKOO_SCHEMA).parquet(bloom_path)
        deduped = CK.cuckoo_prefilter(frontier, filters, seen, 64, probe_mode=probe_mode)
    elif bloom_path:
        blooms = spark.read.schema(D.BLOOM_SCHEMA).parquet(bloom_path)
        deduped = D.bloom_prefilter(frontier, blooms, seen, 64, probe_mode=probe_mode)
    else:
        deduped = D.exact_anti_join(frontier, seen)
    persists: list = []
    sched = schedule(
        deduped, round_no=1, seq_base=0, n_salts=64, persist_registry=persists,
        expected_rows=None if force_two_phase else N_HOSTS * budget,
    )
    n = sched.repartition("salt", "host").count()
    for df in persists:
        df.unpersist()
    return n


def write_blooms(spark, root: str, spath: str) -> str:
    from crawler_spark.operators import dedup as D

    bpath = os.path.join(root, "blooms")
    # sized for the SEEN set (the filters index seen keys): ~N_SEEN/64
    # keys land in each bucket, and the engine's maintenance loop
    # (rebuild_saturated_blooms) keeps production filters at this fill —
    # under-sizing here would bench a saturated filter (fpp -> 1), i.e.
    # the exact path plus pure probe overhead
    D.build_bloom(
        spark.read.parquet(spath),
        n_buckets=N_BUCKETS,
        expected_per_bucket=max(N_SEEN // 48, 1000),
    ).write.mode("overwrite").parquet(bpath)
    return bpath


def write_cuckoos(spark, root: str, spath: str) -> str:
    from crawler_spark.operators import cuckoo as CK

    cpath = os.path.join(root, "cuckoos")
    CK.build_cuckoo(
        spark.read.parquet(spath), n_buckets=64, expected_per_bucket=max(N_SEEN // 48, 1000)
    ).write.mode("overwrite").parquet(cpath)
    return cpath


def bench_headline(spark, root: str) -> dict:
    fpath, spath = write_bench_frontier(spark, root, N_URLS, N_HOSTS)
    t0 = time.time()
    n_sched = run_schedule_job(spark, fpath, spath)
    dt = time.time() - t0
    return {
        "elapsed_sec": round(dt, 3),
        "n_urls": N_URLS,
        "n_scheduled": n_sched,
        "urls_per_sec": round(N_URLS / dt, 1),
    }


def bench_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    out = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 3)
    # production minhash shape: signature table persisted ONCE (outside
    # the timer), pairs query drops to band-explode + groupBy join cost
    from crawler_spark.operators.textdedup import minhash_lsh_pairs, minhash_signatures

    sig_dir = tempfile.mkdtemp(prefix="bench-mh-sigs-")
    try:
        minhash_signatures(entrymod._docs_wide(spark, SF_DIR)).write.mode(
            "overwrite"
        ).parquet(sig_dir)
        sig = spark.read.parquet(sig_dir)
        t0 = time.time()
        minhash_lsh_pairs(signatures=sig).count()
        out["minhash_lsh_pairs_cached"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(sig_dir, ignore_errors=True)
    # same production shape for simhash: signature table persisted once,
    # the near-dup query pays only block-join + hamming cost
    from crawler_spark.operators.textdedup import simhash, simhash_near_dup_pairs

    sig_dir = tempfile.mkdtemp(prefix="bench-sh-sigs-")
    try:
        simhash(entrymod._docs_wide(spark, SF_DIR)).write.mode("overwrite").parquet(
            sig_dir
        )
        sig = spark.read.parquet(sig_dir)
        # hot-block guard keys are part of the index build (pure
        # function of the signature table) — persisted outside the
        # timer, so the query pays no per-call corpus aggregate
        from crawler_spark.operators.textdedup import simhash_hot_blocks

        hot_dir = os.path.join(sig_dir, "_hot")
        simhash_hot_blocks(sig).write.mode("overwrite").parquet(hot_dir)
        hot = spark.read.parquet(hot_dir)
        t0 = time.time()
        simhash_near_dup_pairs(max_hamming=3, signatures=sig, hot_blocks=hot).count()
        out["simhash_near_dup_cached"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(sig_dir, ignore_errors=True)
    # CDC chunk dedup, production (Gear rolling hash) impl — the
    # certified md5 formulation is oracle-gated but pays an interpreted
    # md5 per character; this is the path a cluster would run
    from crawler_spark.operators.textdedup import cdc_chunks_gear

    t0 = time.time()
    ch = cdc_chunks_gear(entrymod._docs_wide(spark, SF_DIR)).filter(
        "chunk_len >= 24"
    )
    (
        ch.groupBy("chunk_hash", "chunk_len")
        .count()
        .filter("count > 1")
        .count()
    )
    out["cdc_dedup_gear"] = round(time.time() - t0, 3)
    # production BM25 shape: postings table persisted ONCE (the engine's
    # lexical_index=True amortizes it per crawl round); query time is
    # join-only — compare vs the ad-hoc bm25_topk key
    from crawler_spark.operators.retrieval import bm25_from_postings, corpus_postings

    post_dir = tempfile.mkdtemp(prefix="bench-postings-")
    try:
        corpus_postings(entrymod._docs_wide(spark, SF_DIR)).write.mode(
            "overwrite"
        ).parquet(post_dir)
        postings = spark.read.parquet(post_dir)
        queries = entrymod._bm25_queries(spark, SF_DIR)
        t0 = time.time()
        bm25_from_postings(postings, queries, k=10).count()
        out["bm25_topk_indexed"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(post_dir, ignore_errors=True)
    # incremental cluster maintenance, production shape: the standing
    # assignment + signature index exist (built outside the timer);
    # the timed path is ONE round's fold — delta band-join + CC over
    # the contracted delta graph — vs dup_clusters_incremental's
    # two-batch from-scratch entry above
    from pyspark.sql import functions as F

    from crawler_spark.operators.graph import incremental_components
    from crawler_spark.operators.textdedup import (
        lsh_hot_buckets,
        minhash_lsh_delta_pairs,
        minhash_lsh_pairs as _mlp,
    )

    sig_dir = tempfile.mkdtemp(prefix="bench-fold-")
    try:
        minhash_signatures(entrymod._docs_wide(spark, SF_DIR)).write.mode(
            "overwrite"
        ).parquet(sig_dir + "/sigs")
        sig = spark.read.parquet(sig_dir + "/sigs")
        # hot band keys are an index artifact (pure function of the
        # signature table, the simhash_hot_blocks pattern) — persisted
        # at build time, OUTSIDE the timer; the fold pays only the
        # broadcast anti-join
        lsh_hot_buckets(signatures=sig, max_bucket=1000).write.mode(
            "overwrite"
        ).parquet(sig_dir + "/hot")
        hot = spark.read.parquet(sig_dir + "/hot")
        is_delta = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
        base_pairs = _mlp(signatures=sig.filter(~is_delta))
        incremental_components(None, base_pairs).write.mode("overwrite").parquet(
            sig_dir + "/asg"
        )
        asg = spark.read.parquet(sig_dir + "/asg")
        delta = sig.filter(is_delta)
        t0 = time.time()
        incremental_components(
            asg, minhash_lsh_delta_pairs(sig, delta, hot_keys=hot)
        ).count()
        out["dup_clusters_fold_delta"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(sig_dir, ignore_errors=True)
    return out


def main():
    root = tempfile.mkdtemp(prefix="bench-frontier-")
    wh = os.path.join(root, "warehouse")
    try:
        spark = get_session(CPUS, wh)
        head = bench_headline(spark, root)
        fpath, spath = os.path.join(root, "frontier"), os.path.join(root, "seen")

        def best_of(fn, n=5):
            # warm to the JIT plateau first: whole-stage-codegen takes
            # several runs to reach the steady state a long-lived engine
            # session actually operates at (measured: 5.9s cold -> 2.0s
            # plateau for the identical bucketed job). Stop warming when
            # a run stops improving by >5%, cap at 6 warm passes.
            prev = _timed(fn)
            for _ in range(5):
                cur = _timed(fn)
                if cur >= prev * 0.95:
                    break
                prev = cur
            return round(min(_timed(fn) for _ in range(n)), 3)

        def _timed(fn):
            t0 = time.time()
            fn()
            return time.time() - t0

        head["elapsed_sec"] = best_of(lambda: run_schedule_job(spark, fpath, spath))
        head["urls_per_sec"] = round(N_URLS / head["elapsed_sec"], 1)
        # bloom steady state: pre-built persistent filters
        bpath = write_blooms(spark, root, spath)
        bloom_sec = best_of(lambda: run_schedule_job(spark, fpath, spath, bpath))
        # cuckoo steady state: same two-phase shape, delete-capable filters
        cpath = write_cuckoos(spark, root, spath)
        cuckoo_sec = best_of(lambda: run_schedule_job(spark, fpath, spath, cpath))
        # bucketed (Iceberg-bucket-partitioning stand-in): co-located join
        write_bucketed_tables(spark, wh, fpath, spath)
        bucketed_sec = best_of(lambda: run_schedule_job_bucketed(spark))
        two_phase_sec = best_of(
            lambda: run_schedule_job(spark, fpath, spath, force_two_phase=True)
        )
        queries = bench_queries(spark)
        composite = {}
        import __spark_entry__ as entrymod

        for name in COMPOSITE_QUERIES:
            t0 = time.time()
            entrymod.queries()[name](spark, SF_DIR).count()
            composite[name] = round(time.time() - t0, 3)
        queries["schedule_dedup_exact"] = head["elapsed_sec"]
        queries["schedule_dedup_bloom"] = bloom_sec
        queries["schedule_dedup_cuckoo"] = cuckoo_sec
        queries["schedule_dedup_bucketed"] = bucketed_sec
        queries["schedule_dedup_twophase_seq"] = two_phase_sec
        total = round(sum(queries.values()), 3)
        result = {
            "metric": "urls_scheduled_deduped_per_sec (headline) + operator suite wall",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": float(SF_DIR.rstrip("/").split("sf")[-1]),
            "urls_per_sec": round(N_URLS / bucketed_sec, 1),
            "urls_per_sec_unbucketed": head["urls_per_sec"],
            "bench_urls": head["n_urls"],
            "bench_scheduled": head["n_scheduled"],
            "cpus": CPUS,
            "composite": composite,
            "composite_sec": round(sum(composite.values()), 3),
        }
        print(json.dumps(result))
        return result
    finally:
        shutil.rmtree(root, ignore_errors=True)


SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))  # N and 4N cores
# sized so per-core compute dominates the ~2-3 s of fixed multi-job
# latency (local-mode job launches + range sampling + offset collect):
# at 8M the hot join is only ~30 core-seconds and the ratio measures
# Amdahl on job overhead, not the plan
SCALE_URLS = int(os.environ.get("SPARK_GRAFT_SCALE_URLS", "48000000"))
SCALE_SEEN = int(os.environ.get("SPARK_GRAFT_SCALE_SEEN", "48000000"))


def measure_commit_bytes(spark, parent: str, rounds: int = 5) -> dict:
    """Delta-state evidence for BASELINE.md: soak a small crawl and
    record per-round frontier commit bytes (state deltas + link
    appends) against the frontier base size — the round loop must
    never rewrite the base."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.world import make_world

    root = os.path.join(parent, "soak")
    world = make_world(seed=5, n_hosts=50, n_urls=20000, budget=4, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, root, embed_dim=0)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    base_rel = eng.io.table_rels("frontier")[0]

    def rel_bytes(rel):
        p = os.path.join(root, rel)
        return sum(
            os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(p) for f in fs
        )

    per_round = []
    for rnd in range(1, rounds + 1):
        before = set(eng.io.table_rels("frontier")) | set(eng.io.table_rels("frontier_state"))
        eng.run_round(rnd, t)
        after = set(eng.io.table_rels("frontier")) | set(eng.io.table_rels("frontier_state"))
        assert before <= after, "round rewrote frontier state"
        per_round.append(sum(rel_bytes(r) for r in after - before))
    return {
        "frontier_base_bytes": rel_bytes(base_rel),
        "per_round_frontier_commit_bytes": per_round,
    }


def scaling():
    """Same job at N and 4N cores on the same input -> BENCH/BASELINE.md.

    The input is sized so per-core compute dominates fixed job overhead
    (a few seconds of scheduling/stage setup would otherwise cap the
    measurable speed-up regardless of plan quality)."""
    global N_URLS, N_SEEN
    N_URLS, N_SEEN = SCALE_URLS, SCALE_SEEN
    root = tempfile.mkdtemp(prefix="bench-scaling-")
    wh = os.path.join(root, "warehouse")
    results: dict = {}
    flat: dict = {}
    try:
        spark = get_session(32, wh, scaling=True)  # generate the input quickly
        fpath, spath = write_bench_frontier(spark, root, N_URLS, N_HOSTS)
        write_bucketed_tables(spark, wh, fpath, spath)
        commit_bytes = measure_commit_bytes(spark, root)
        spark.stop()
        # Interleaved protocol (round-3): the levels used to run as one
        # session each, sequentially (all N runs, then all 4N runs), with
        # best-of-3 per level. Page-cache/JIT/machine drift between the
        # two blocks then lands entirely on ONE side of the ratio — a
        # single anomalously fast N run moved measured efficiency from
        # 0.90 to 0.66 with zero plan change. Now each level runs in TWO
        # sessions, in alternating order (N,4N then 4N,N), each session
        # warms to the JIT plateau and times 2 runs; the headline is the
        # MEDIAN of the 4 runs per level (min stays reported) and all raw
        # runs are written to BENCH/BASELINE.md.
        lo, hi = SCALE_N, SCALE_N * 4
        all_runs: dict = {lo: {"b": [], "f": []}, hi: {"b": [], "f": []}}
        reps = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2")))
        flat_on = os.environ.get("SPARK_GRAFT_SCALING_FLAT", "1") != "0"
        for rep in range(reps):
            for cpus in (lo, hi) if rep % 2 == 0 else (hi, lo):
                spark = get_session(cpus, wh, scaling=True)
                register_bucketed_tables(spark, wh)
                # force_two_phase: the scaling claim covers the AT-SCALE
                # configuration (distributed seq, no serial stage). The
                # small-round one-job window is a latency fast path whose
                # single serial task is exactly what the two-phase assigner
                # removes — timing it here would just measure Amdahl's law
                # on a stage that never runs at the scale being evidenced.
                # Warm to the JIT/page-cache PLATEAU (first post-generation
                # runs at low parallelism measured 3-5x the steady state),
                # so the timed runs compare steady states at both levels.
                prev = None
                for _ in range(4):
                    t0 = time.time()
                    run_schedule_job_bucketed(spark, force_two_phase=True)
                    dt = time.time() - t0
                    if prev is not None and dt > prev * 0.9:
                        break
                    prev = dt
                if flat_on:
                    run_schedule_job(spark, fpath, spath, force_two_phase=True)  # warm
                for _ in range(2):
                    t0 = time.time()
                    run_schedule_job_bucketed(spark, force_two_phase=True)
                    all_runs[cpus]["b"].append(round(time.time() - t0, 3))
                    if flat_on:
                        t0 = time.time()
                        run_schedule_job(spark, fpath, spath, force_two_phase=True)
                        all_runs[cpus]["f"].append(round(time.time() - t0, 3))
                spark.stop()

        def median(xs):
            s = sorted(xs)
            n = len(s)
            return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0

        for cpus in (lo, hi):
            dt = median(all_runs[cpus]["b"])
            results[cpus] = {
                "sec": round(dt, 3),
                "urls_per_sec": round(N_URLS / dt, 1),
                "runs": all_runs[cpus]["b"],
            }
            if flat_on:
                dtf = median(all_runs[cpus]["f"])
                flat[cpus] = {
                    "sec": round(dtf, 3),
                    "urls_per_sec": round(N_URLS / dtf, 1),
                    "runs": all_runs[cpus]["f"],
                }
            else:
                flat[cpus] = {"sec": None, "urls_per_sec": None, "runs": []}
        eff = (results[hi]["urls_per_sec"] / results[lo]["urls_per_sec"]) / 4.0
        eff_best = (min(all_runs[lo]["b"]) / min(all_runs[hi]["b"])) / 4.0
        if flat_on:
            eff_flat = (flat[hi]["urls_per_sec"] / flat[lo]["urls_per_sec"]) / 4.0
            flat_md = f"""## Comparison: flat parquet (shuffled anti-join)

| parallelism | wall median (s) | URLs/sec | raw runs (s) |
|---|---|---|---|
| local[{lo}]  (N)  | {flat[lo]['sec']} | {flat[lo]['urls_per_sec']:,} | {flat[lo]['runs']} |
| local[{hi}] (4N) | {flat[hi]['sec']} | {flat[hi]['urls_per_sec']:,} | {flat[hi]['runs']} |

efficiency = {eff_flat:.3f} — the flat layout also scales in-sandbox
(page-cached local disk absorbs the exchange; run-to-run values near
or above 1.0 reflect memory-pressure noise at low parallelism, not
super-linear scaling). The bucketed layout is {results[hi]['urls_per_sec'] / flat[hi]['urls_per_sec']:.1f}x
faster in absolute terms at 4N because the exchange work (hash,
serialize, spill, merge both sides every round) is gone entirely. On a real cluster that exchange crosses the network and
grows with the seen set; the co-located bucketed join (Iceberg
`bucket(url_hash, N)`) keeps the hot path exchange-free at any scale —
which is why frontier/seen are specified hash-bucketed (SURVEY.md §1
D1/D3).
"""
        else:
            eff_flat = None
            flat_md = (
                "## Comparison: flat parquet — skipped this run "
                "(SPARK_GRAFT_SCALING_FLAT=0); see BENCH/scaling_n4.json "
                "for the measured flat-vs-bucketed comparison.\n"
            )
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                f"""# BENCH — scaling evidence (north rule: efficiency >= 0.8 at N->4N)

Same job, same input ({N_URLS:,} candidate URLs vs {N_SEEN:,}-row seen
set, {N_HOSTS:,} power-law hosts, 10% re-discovered duplicates): the
engine's scheduling+dedup hot path — seen anti-join + per-host budget
window (WindowGroupLimit top-k pushdown) + canonical order + salted
repartition. MEDIAN of 4 runs per level from 2 interleaved sessions
(level order N,4N then 4N,N; each session warmed to its wall-time
plateau first — up to 4 untimed runs until <10% improvement), same
machine, same files — interleaving keeps page-cache/JIT drift off any
single side of the ratio. All raw runs listed; the best-of-all-runs
efficiency is reported next to the median so the spread is visible.

## Headline: bucketed tables (≙ Iceberg `bucket(url_hash, {N_BUCKETS})` partitioning)

frontier and seen are clustered+sorted by url_hash into {N_BUCKETS}
buckets, so the anti-join is co-located sort-merge with NO exchange.

| parallelism | wall median (s) | URLs scheduled+deduped / sec | raw runs (s) |
|---|---|---|---|
| local[{lo}]  (N)  | {results[lo]['sec']} | {results[lo]['urls_per_sec']:,} | {results[lo]['runs']} |
| local[{hi}] (4N) | {results[hi]['sec']} | {results[hi]['urls_per_sec']:,} | {results[hi]['runs']} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}
(median); best-of-all-runs {eff_best:.3f}**

{flat_md}
## Delta-state round commits (per-round IO is O(delta), not O(frontier))

Soak run ({len(commit_bytes['per_round_frontier_commit_bytes'])} rounds, 50 hosts x 20k URLs, budget 4): frontier base
{commit_bytes['frontier_base_bytes']:,} bytes written ONCE at seed; per-round frontier
commits (state deltas + link appends) were
{commit_bytes['per_round_frontier_commit_bytes']} bytes — bounded by that round's
transitions, independent of frontier size. The round loop never
rewrites the base (asserted while measuring, and in
tests/test_world_and_io.py::test_round_commits_are_delta_sized). At
10^10 URLs the old overwrite design would rewrite ~1 TB of state per
politeness quantum; deltas make it ~budget x hosts rows.

Caveats: single-JVM local mode shares one driver process, one memory
bus and page-cached local disk — a real 4N-executor cluster adds
network shuffle but removes the shared-memory ceiling. The job has no
driver-side loops. The scaling rows above run the AT-SCALE seq
configuration — the two-phase assigner (range partitions + broadcast
offsets, scheduler.assign_global_seq), NO single-partition exchange,
plan-asserted in tests/test_plans.py — because that is the path that
runs at 10^7-10^8 hosts, where the post-budget bound IS the frontier.
The engine additionally has a latency fast path for small rounds
(a-priori bound n_hosts x max_budget below 1M rows -> one-job window);
it is deliberately EXCLUDED from the scaling measurement since its
single serial task is exactly what the two-phase path removes — timing
it would measure Amdahl's law on a stage that never runs at the scale
being evidenced. Its fixed-overhead delta is visible in the per-round
bench as schedule_dedup_twophase_seq vs schedule_dedup_exact.
Per-partition lineage rows in the `lineage` table confirm balanced
buckets.

Bloom-vs-exact note: at sandbox scale (page-cached IO, seen only a few
x candidates) the exact anti-join beats the Bloom prefilter path; the
prefilter wins when the seen set no longer fits local page cache and
its scan dominates (>=10^9 keys on network storage) — probing
broadcast/bucketed filters (~1 byte per seen key) replaces re-reading
~100 bytes per seen key per round, and the confirm anti-join sees only
the true-dup + ~fpp false-positive slice, small enough to broadcast
(seen is then streamed, never shuffled).
"""
            )
        print(
            json.dumps(
                {
                    "scaling_bucketed": results,
                    "efficiency": round(eff, 3),
                    "efficiency_best": round(eff_best, 3),
                    "scaling_flat": flat,
                    "efficiency_flat": round(eff_flat, 3) if eff_flat else None,
                    "commit_bytes": commit_bytes,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- prefilter crossover (round-2 VERDICT item 5): where does the
# --- bloom/cuckoo prefilter actually beat the exact anti-join? ---------

CROSS_SEEN = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_CROSSOVER_SEEN", "8000000,32000000,96000000"
    ).split(",")
]
CROSS_MARK = ("<!-- CROSSOVER:BEGIN -->", "<!-- CROSSOVER:END -->")


def crossover_md(data: dict) -> str:
    lines = [
        CROSS_MARK[0],
        "",
        "## Prefilter crossover (measured, not argued)",
        "",
        f"Fixed {data['n_urls']:,}-URL candidate set (10% true duplicates), seen set",
        "swept upward; same scheduling+dedup job, best of 2 after warm-up, filters",
        "pre-built and sized to the seen set (the engine's maintained steady",
        "state — saturation rebuilds keep production filters at this fill).",
        "",
        "| seen keys | exact anti-join (s) | bloom prefilter (s) | cuckoo prefilter (s) | winner |",
        "|---|---|---|---|---|",
    ]
    for r in data["rows"]:
        best = min(("exact", r["exact"]), ("bloom", r["bloom"]), ("cuckoo", r["cuckoo"]), key=lambda t: t[1])
        lines.append(
            f"| {r['n_seen']:,} | {r['exact']} | {r['bloom']} | {r['cuckoo']} | {best[0]} |"
        )
    lines += [
        "",
        f"Filter build cost at the largest point ({data['rows'][-1]['n_seen']:,} keys):",
        f"bloom {data['rows'][-1]['bloom_build']} s, cuckoo {data['rows'][-1]['cuckoo_build']} s",
        "— a one-time cost amortized by incremental per-round maintenance",
        "(update_blooms ORs new keys in; cuckoo inserts/deletes are native).",
        "",
    ]
    last = data["rows"][-1]
    if "bloom_cogroup" in last:
        lines += [
            f"Cogroup probe at the largest point ({last['n_seen']:,} keys, forced"
            " past the broadcast budget — filters stay partitioned on their",
            "bucket, keys shuffle to them via cogrouped applyInPandas):"
            f" bloom {last['bloom_cogroup']} s, cuckoo {last['cuckoo_cogroup']} s.",
            "This is the engine's auto-selected mode when the filter set exceeds",
            "bloom_broadcast_budget_bytes (256 MiB default) — the >10^9-seen-keys",
            "regime where no executor can hold every bucket filter resident.",
            "",
        ]
    lines += [
        data["conclusion"],
        "",
        CROSS_MARK[1],
    ]
    return "\n".join(lines)


def patch_crossover_into_baseline(md: str) -> None:
    """Insert/replace the marker-delimited crossover section of
    BENCH/BASELINE.md (survives --scaling rewrites via BENCH/crossover.json)."""
    path = "BENCH/BASELINE.md"
    os.makedirs("BENCH", exist_ok=True)
    text = open(path).read() if os.path.exists(path) else "# BENCH\n"
    if CROSS_MARK[0] in text:
        pre = text.split(CROSS_MARK[0])[0]
        post = text.split(CROSS_MARK[1])[1]
        text = pre + md + post
    else:
        text = text.rstrip() + "\n\n" + md + "\n"
    with open(path, "w") as f:
        f.write(text)


def crossover():
    """Sweep the seen-set size at fixed candidates and record where the
    probabilistic prefilters overtake the exact anti-join. The exact
    path's cost grows with the seen set (scan + shuffle + sort-merge of
    every seen key, every round); the prefilter path grows only in the
    seen SCAN of its broadcast-confirm join (candidates probe ~1 byte/key
    filters, and only the true-dup + fpp slice — small enough to
    broadcast — ever meets the seen table, which therefore never
    shuffles or sorts)."""
    global N_SEEN
    root = tempfile.mkdtemp(prefix="bench-crossover-")
    rows = []
    try:
        spark = get_session(CPUS, None, scaling=True)

        def timed(fn):
            t0 = time.time()
            fn()
            return round(time.time() - t0, 3)

        def best_of(fn, n=2):
            fn()  # warm
            return round(min(timed(fn) for _ in range(n)), 3)

        for n_seen in CROSS_SEEN:
            N_SEEN = n_seen
            sub = os.path.join(root, f"s{n_seen}")
            fpath, spath = write_bench_frontier(spark, sub, N_URLS, N_HOSTS)
            exact = best_of(lambda: run_schedule_job(spark, fpath, spath))
            t0 = time.time()
            bpath = write_blooms(spark, sub, spath)
            bloom_build = round(time.time() - t0, 3)
            bloom = best_of(lambda: run_schedule_job(spark, fpath, spath, bpath))
            t0 = time.time()
            cpath = write_cuckoos(spark, sub, spath)
            cuckoo_build = round(time.time() - t0, 3)
            cuckoo = best_of(lambda: run_schedule_job(spark, fpath, spath, cpath))
            row = {
                "n_seen": n_seen,
                "exact": exact,
                "bloom": bloom,
                "cuckoo": cuckoo,
                "bloom_build": bloom_build,
                "cuckoo_build": cuckoo_build,
            }
            if n_seen == CROSS_SEEN[-1]:
                # the partitioned-filters path that engages past
                # bloom_broadcast_budget_bytes (engine auto-select):
                # forced here so its wall is ON RECORD, not argued
                row["bloom_cogroup"] = best_of(
                    lambda: run_schedule_job(
                        spark, fpath, spath, bpath, probe_mode="cogroup"
                    )
                )
                row["cuckoo_cogroup"] = best_of(
                    lambda: run_schedule_job(
                        spark, fpath, spath, cpath, probe_mode="cogroup"
                    )
                )
            rows.append(row)
            print(json.dumps({"crossover_point": rows[-1]}))
            shutil.rmtree(sub, ignore_errors=True)
        lo, hi = rows[0], rows[-1]
        pre_wins = min(hi["bloom"], hi["cuckoo"]) < hi["exact"]
        ratio_lo = round(lo["exact"] / min(lo["bloom"], lo["cuckoo"]), 2)
        ratio_hi = round(hi["exact"] / min(hi["bloom"], hi["cuckoo"]), 2)
        conclusion = (
            f"Measured: exact/prefilter wall ratio moves {ratio_lo} -> {ratio_hi} as seen "
            f"grows {lo['n_seen']:,} -> {hi['n_seen']:,} (fixed candidates). "
            + (
                "The prefilter wins outright at the largest in-sandbox point."
                if pre_wins
                else "In this regime the EXACT path wins at every point and the gap "
                "WIDENS with the seen set — the round-2 crossover hypothesis does "
                "NOT hold on page-cached local storage. Why: the probe re-ships "
                "O(filter bytes) (~1-2.5 B/key) into the Arrow probe workers every "
                "job, growing linearly in seen, while the exact anti-join's seen "
                "scan is page-cached and its shuffle is memory-speed. "
                "Consequently the ENGINE DEFAULT is the exact bucketed path "
                "(seen_filter=None); bloom/cuckoo stay opt-in for the regime they "
                "exist for — seen on cold/remote object storage, where the exact "
                "path re-reads O(seen) over the network every politeness quantum "
                "but resident per-executor filters are read once and probed in "
                "memory, with cogroup mode keeping filters partitioned past the "
                "broadcast budget. That regime is not constructible in-sandbox; "
                "deployments should measure with this same --crossover sweep "
                "before opting in."
            )
        )
        data = {"n_urls": N_URLS, "rows": rows, "conclusion": conclusion}
        with open("BENCH/crossover.json", "w") as f:
            json.dump(data, f, indent=1)
        patch_crossover_into_baseline(crossover_md(data))
        print(json.dumps({"crossover": rows, "conclusion": conclusion}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- heavy-hitter crossover: where does the bounded-state Misra-Gries
# --- two-pass beat the full-vocabulary groupBy? -------------------------

SKETCH_MARK = ("<!-- SKETCH_CROSSOVER:BEGIN -->", "<!-- SKETCH_CROSSOVER:END -->")
SKETCH_DOCS = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_SKETCH_DOCS", "1000000,4000000,12000000"
    ).split(",")
]


def _patch_marked_section(md: str, marks: tuple) -> None:
    path = "BENCH/BASELINE.md"
    os.makedirs("BENCH", exist_ok=True)
    text = open(path).read() if os.path.exists(path) else "# BENCH\n"
    if marks[0] in text:
        text = text.split(marks[0])[0] + md + text.split(marks[1])[1]
    else:
        text = text.rstrip() + "\n\n" + md + "\n"
    with open(path, "w") as f:
        f.write(text)


def sketch_crossover_md(data: dict) -> str:
    lines = [
        SKETCH_MARK[0],
        "",
        "## Heavy-hitter crossover: MG two-pass vs full-vocabulary groupBy (measured)",
        "",
        "Wide-vocabulary corpus (~12 near-unique tokens/doc + planted heavy",
        "tokens, phi = 10%): the exact `groupBy(tok) HAVING` must shuffle the",
        "ENTIRE vocabulary to keep 2 heavy tokens; sketches.heavy_hitters",
        "shuffles only per-task Misra-Gries summaries (m*P rows) + the",
        "candidate-bounded verify. Identical results asserted per point.",
        "Best of 2 after warm-up, same parquet input.",
        "",
        "| docs | ~distinct tokens | exact groupBy (s) | MG two-pass (s) | winner |",
        "|---|---|---|---|---|",
    ]
    for r in data["rows"]:
        w = "exact" if r["exact"] <= r["mg"] else "mg"
        lines.append(
            f"| {r['n_docs']:,} | {r['vocab']:,} | {r['exact']} | {r['mg']} | {w} |"
        )
    lines += ["", data["conclusion"], "", SKETCH_MARK[1]]
    return "\n".join(lines)


def sketch_crossover():
    """Synthesize corpora whose vocabulary grows ~linearly with the
    corpus (the web-text regime: most tokens are near-unique) and time
    exact-vs-MG heavy hitters at phi=10%, asserting equal output."""
    from crawler_spark.operators.sketches import heavy_hitters

    phi = 100_000
    root = tempfile.mkdtemp(prefix="bench-sketch-")
    rows = []
    try:
        spark = get_session(CPUS, None, scaling=True)
        for n in SKETCH_DOCS:
            path = os.path.join(root, f"docs{n}")
            uniq = [
                F.concat(F.lit(f"u{j}x"), F.col("id").cast("string"))
                for j in range(10)
            ]
            (
                spark.range(n)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat_ws(
                        " ",
                        *uniq,
                        F.lit("hot1"),
                        F.when(F.col("id") % 2 == 0, F.lit("hot2")).otherwise(
                            F.concat(F.lit("ux"), F.col("id").cast("string"))
                        ),
                    ).alias("text"),
                )
                .write.mode("overwrite")
                .parquet(path)
            )
            docs = spark.read.parquet(path)

            def exact():
                toks = docs.select(
                    F.explode(
                        F.filter(
                            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                            lambda t: t != "",
                        )
                    ).alias("tok")
                )
                ntot = toks.count()
                return sorted(
                    (r["tok"], r["cnt"])
                    for r in toks.groupBy("tok")
                    .agg(F.count("*").alias("cnt"))
                    .filter(F.col("cnt") * 1_000_000 >= phi * ntot)
                    .collect()
                )

            def mg():
                return sorted(
                    (r["tok"], r["cnt"])
                    for r in heavy_hitters(docs, phi_e6=phi).collect()
                )

            def best2(fn):
                fn()  # warm
                return round(min(_wall(fn) for _ in range(2)), 3)

            def _wall(fn):
                t0 = time.time()
                fn()
                return time.time() - t0

            assert exact() == mg(), "exact and MG must return identical hitters"
            t_exact, t_mg = best2(exact), best2(mg)
            rows.append(
                {"n_docs": n, "vocab": 11 * n, "exact": t_exact, "mg": t_mg}
            )
            print(json.dumps({"sketch_point": rows[-1]}))
        faster = [r for r in rows if r["mg"] < r["exact"]]
        if faster:
            conclusion = (
                f"MG overtakes the exact groupBy from ~{faster[0]['vocab']:,} "
                "distinct tokens on this box; the gap widens with vocabulary "
                "size because the exact path's exchange carries every distinct "
                "token while MG's stays O(m*P + candidates) — at 10^11+ token "
                "corpora (vocab in the billions) the exact exchange is the "
                "dominant job cost and the sketch path is the only one whose "
                "shuffle does not grow."
            )
        else:
            conclusion = (
                "At these sandbox sizes the exact groupBy's single exchange "
                "still wins — partial aggregation collapses the per-partition "
                "vocabulary before the shuffle on this synthetic shape. The "
                "MG path's advantage appears when the per-partition vocabulary "
                "no longer fits the partial-agg hash map (real web corpora at "
                "10^9+ docs), where the exact path spills and re-shuffles "
                "every distinct token; measure with this same --sketch-crossover "
                "sweep at larger SPARK_GRAFT_SKETCH_DOCS on the target cluster."
            )
        data = {"rows": rows, "phi_e6": phi, "conclusion": conclusion}
        with open("BENCH/sketch_crossover.json", "w") as f:
            json.dump(data, f, indent=1)
        _patch_marked_section(sketch_crossover_md(data), SKETCH_MARK)
        print(json.dumps({"sketch_crossover": rows, "conclusion": conclusion}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
        if os.path.exists("BENCH/crossover.json"):
            patch_crossover_into_baseline(
                crossover_md(json.load(open("BENCH/crossover.json")))
            )
        if os.path.exists("BENCH/sketch_crossover.json"):
            _patch_marked_section(
                sketch_crossover_md(json.load(open("BENCH/sketch_crossover.json"))),
                SKETCH_MARK,
            )
    elif "--crossover" in sys.argv:
        crossover()
    elif "--sketch-crossover" in sys.argv:
        sketch_crossover()
    else:
        main()
