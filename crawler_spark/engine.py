"""CrawlEngine: the round loop (SURVEY.md §3.2 "engine equivalent").

One scheduling round == one politeness quantum == ONE DataFrame job
graph committed atomically:

    candidates = frontier[pending]
        |> paused/deleted/backoff/robots gates      (broadcast joins)
        |> seen anti-join (exact, or Bloom-prefiltered at scale)
        |> per-host budget window + canonical order (rank, site, url)
        |> salt + repartition |> simulated fetch    (equi-join vs web)
    -> documents, seen, records(entity-deduped), new links, metrics
    -> ParquetSnapshotIO.commit(...)                (exactly-once, ST6)

Determinism: rounds replace wall-clock; 429 backoff is hash-derived;
sequence numbers come from the canonical order. A killed run resumes
from the last committed snapshot bit-identically (ST7) because every
piece of state lives in the snapshot and the world is a pure function
of its seed.

Shuffle budget per round: one anti-join (candidates × seen, pruned by
Bloom buckets at scale), one window exchange on host (candidate set
only), one salted repartition before fetch. Everything else is
broadcast.

Round-loop concurrency (driver-side overlap, round 5): three places
run off-thread, all joined before the commit point so failure and
commit semantics are unchanged —
  1. the status-count job (simulated fetch only) overlaps the cheap
     projection builds; wire transports stay strictly serial so each
     scheduled URL is fetched exactly once, never via a cache-lock
     race;
  2. the extract materialization (Arrow mapInPandas, the commit's
     long pole) overlaps the downstream plan construction, gated on
     the status result so idle rounds never run it;
  3. ParquetSnapshotIO.commit stages every table write concurrently
     (one pool worker per table; atomicity lives in the manifest
     pointer swap, not in write order).
Per-round driver work that is a pure function of fixed column names
or per-world dims (embed/metadata Columns, compiled robots rules) is
memoized; n_links rides the commit's own frontier write as an
Observation instead of a dedicated action (safe there — no adaptive
stage boundary between the observed node and the write; the same
trick on the idle pending count broke under AQE and was reverted,
see run_round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark import schemas as S
from crawler_spark.functions.urls import with_url_keys
from crawler_spark.io.snapshot import ParquetSnapshotIO
from crawler_spark.operators import cuckoo as CK
from crawler_spark.operators import dedup as D
from crawler_spark.operators.extract import dedup_entities, extract_entities
from crawler_spark.operators.fetch import simulate_fetch
from crawler_spark.operators.scheduler import (
    backoff_rounds_expr,
    control_flags,
    gate_candidates,
    schedule,
)

ENGINE_SCHEMAS = {
    "frontier": S.FRONTIER,  # append-only base: seed + discovered links
    "frontier_state": S.FRONTIER_STATE,  # append-only state deltas (latest wins)
    "pending_ingest": S.FRONTIER,  # streaming url-monitor staging table
    "seen": S.SEEN,
    "seen_bloom": D.BLOOM_SCHEMA,
    "seen_cuckoo": CK.CUCKOO_SCHEMA,
    "documents": S.DOCUMENTS,
    "doc_signatures": S.DOC_SIGNATURES,  # incremental near-dup index (opt-in)
    "media_signatures": S.MEDIA_SIGNATURES,  # incremental media pHash index (opt-in)
    "fetch_fingerprints": S.FETCH_FINGERPRINTS,  # per-fetch content history (opt-in)
    "page_vectors": S.PAGE_VECTORS,  # incremental ANN index (opt-in, vector_index=True)
    # incremental near-dup cluster assignment (update_dup_clusters):
    # every clustered doc, singletons as cluster_id == doc_id.
    # Delta-state pair like frontier/frontier_state: the base is only
    # rewritten at compaction; each fold APPENDS its relabeling to
    # dup_cluster_state (O(|relabel|) bytes, never O(n_docs)).
    "dup_clusters": T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("cluster_id", T.StringType(), False),
        ]
    ),
    "dup_cluster_state": T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            # NULL = tombstone: the doc cascaded out (delete_site /
            # recrawl) and its assignment row is pruned on read
            T.StructField("cluster_id", T.StringType(), True),
            T.StructField("fold", T.IntegerType(), False),  # latest wins
        ]
    ),
    "postings": S.POSTINGS,  # incremental inverted index (opt-in, lexical_index=True)
    "edges": S.EDGES,  # crawl link graph (opt-in, record_edges=True)
    "anchors": S.ANCHORS,  # anchor-text observations (opt-in, record_anchors=True)
    "records": S.RECORDS,
    "entity_seen": S.ENTITY_SEEN,
    "host_state": S.HOST_STATE,
    "crawl_order": S.CRAWL_ORDER,
    "metrics": S.METRICS,
    "fetch_log": S.FETCH_LOG,
    "lineage": S.LINEAGE,
    "embeddings": S.EMBEDDINGS,
    "uploaded": S.UPLOADED,
    # engine-side lifecycle flags (C3/C4 APIs), merged with the fixture
    # control table at gate time
    "engine_control": T.StructType(
        [
            T.StructField("site", T.StringType(), False),
            T.StructField("paused", T.BooleanType(), False),
            T.StructField("deleted", T.BooleanType(), False),
        ]
    ),
}

# cascade-delete targets (crawler.py:557-589 removes docs/json/keys/
# embeddings files per site)
SITE_TABLES = [
    "seen",
    "documents",
    "doc_signatures",
    "media_signatures",
    "page_vectors",
    "postings",
    "fetch_fingerprints",
    "edges",
    "anchors",
    "records",
    "entity_seen",
    "embeddings",
    "uploaded",
]


def _state_prio():
    # tie-break when a delete-cascade delta lands in the same round as a
    # fetch transition for the same url_hash: deleted always wins
    return S.state_prio(F.col("state"))


def read_frontier_view(spark: SparkSession, io: ParquetSnapshotIO) -> DataFrame:
    """The effective frontier: append-only base rows with the LATEST
    state delta applied (delta-state commits — per-round IO is
    O(|transitions|), never O(|frontier|); the round loop used to
    rewrite the whole frontier, a ~1 TB/round write at 10^10 URLs).

    Read-side merge = groupBy(url_hash) max(round, prio, state) over the
    deltas + one equi-join with the base; `maintain()` folds deltas into
    the base so the chain stays short. On Iceberg the same logical op is
    MERGE INTO + rewrite_data_files; with BucketedSnapshotIO both sides
    are bucketed by url_hash, so the merge join is co-located.
    """
    if hasattr(io, "frontier_view"):
        # bucketed IO: per-delta co-located chain — neither the base nor
        # the state deltas shuffle (plan-asserted in test_bucketed_io)
        return io.frontier_view(spark)
    base = io.read(spark, "frontier")
    deltas = io.read(spark, "frontier_state")
    return merge_frontier_states(base, deltas).select(
        *[f.name for f in S.FRONTIER.fields]
    )


def merge_frontier_states(base: DataFrame, deltas: DataFrame) -> DataFrame:
    """The latest-wins merge as a pure (base, deltas) -> effective-state
    function: per url_hash, the max (round, prio, state) delta wins,
    falling back to the base's inserted state. prio makes a same-round
    delete-cascade transition beat a fetch transition (schemas.state_prio).
    Driver-pinned against a DuckDB oracle (entry query
    frontier_state_merge)."""
    latest = deltas.groupBy("url_hash").agg(
        F.max(
            F.struct(F.col("round"), _state_prio().alias("prio"), F.col("state"))
        ).alias("_rs")
    )
    return (
        base.join(latest, "url_hash", "left")
        .withColumn("state", F.coalesce(F.col("_rs.state"), F.col("state")))
        .drop("_rs")
    )


def read_host_state_view(spark: SparkSession, io: ParquetSnapshotIO) -> DataFrame:
    """Effective per-host backoff state: latest append wins (same
    delta-state pattern as the frontier; the table only ever holds hosts
    that 429'd, but even that set should not be rewritten per round)."""
    hs = io.read(spark, "host_state")
    return (
        hs.groupBy("host")
        .agg(F.max(F.struct("last_round", "backoff_until_round")).alias("_s"))
        .select(
            "host",
            F.col("_s.backoff_until_round").alias("backoff_until_round"),
            F.col("_s.last_round").alias("last_round"),
        )
    )


def read_dup_clusters_view(spark: SparkSession, io: ParquetSnapshotIO) -> DataFrame:
    """Effective near-dup cluster assignment: base rows with the
    latest-fold delta applied (same delta-state pattern as the
    frontier). A NULL-cluster delta is a tombstone — the doc cascaded
    out — and drops the row. Full outer on doc_id because folds also
    INSERT rows (new docs) the base has never seen; compaction
    (engine.maintain) folds the state chain back into the base."""
    base = io.read(spark, "dup_clusters")
    deltas = io.read(spark, "dup_cluster_state")
    latest = deltas.groupBy("doc_id").agg(
        F.max(F.struct("fold", "cluster_id")).alias("_fc")
    )
    return (
        base.join(latest, "doc_id", "full")
        .select(
            "doc_id",
            F.when(F.col("_fc").isNull(), F.col("cluster_id"))
            .otherwise(F.col("_fc.cluster_id"))
            .alias("cluster_id"),
        )
        .filter(F.col("cluster_id").isNotNull())
    )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        mode: str = "reference",
        n_salts: int = 8,
        use_bloom: bool = False,
        seen_filter: str | None = None,  # 'bloom' | 'cuckoo' | None
        bloom_buckets: int = 16,
        bloom_expected_per_bucket: int = 100_000,
        bloom_broadcast_budget_bytes: int = 256 << 20,
        follow_links: bool = True,
        n_lineage_buckets: int = 8,
        coalesce_writes: int | None = 1,
        embed_dim: int = 16,  # 0 disables the downstream pipeline
        # real-model drop-in: f(text Column) -> array<float> Column of
        # width embed_dim (e.g. models.matrix_embedder wrapping a numpy
        # matrix behind an Arrow pandas_udf). None = the deterministic
        # hash_embedding stand-in. A custom embedder whose components
        # leave [-0.5, 0.5) should pass a matching vector_scale for the
        # quantized page-vector index.
        embedder=None,
        priority: str = "fifo",  # scheduler PRIORITY_ORDERS key
        # DEFAULT is the adaptive bucketed layout (round-2 VERDICT: the
        # flat frontier⋈state merge + seen anti-join shuffle O(|frontier|)
        # per politeness quantum — the last scale-killer). Adaptive means
        # tiny tables stay plain parquet (no DDL overhead); past
        # bucketed_min_bytes each delta is a bucketed table and the hot
        # round loop (frontier_view merge + anti_join_seen) runs with NO
        # exchange on the base/seen side (plan-asserted, test_plans).
        # Pass bucketed_io=None for the legacy flat parquet layout.
        bucketed_io: int | None = 64,  # n_buckets -> co-located frontier/seen
        bucketed_min_bytes: int = 32 << 20,  # adaptive: plain parquet below this
        upload_transport=None,  # K8 wire sink: transport(points)->statuses
        upload_batch_size: int = 64,
        # post-upload side-effect hook (reference: per-doc permission
        # grants after upsert, crawler.py:1173-1186); a raising hook
        # withdraws the ack so upload+grant retry together next round
        upload_post_ack=None,
        # incremental near-dup index: append per-doc minhash+simhash
        # signatures (doc_signatures table) for each round's NEW docs —
        # O(|delta|) per round, union of deltas == batch recompute
        # (exactly-once by the seen anti-join; pinned in
        # test_dedup_index). near_dup_pairs() queries it.
        dedup_index: bool = False,
        # media pHash index (media_signatures table): None follows
        # dedup_index; False opts a text-only user out of the per-round
        # hex/8-gram/simhash job over media payloads; True enables it
        # alone. near_dup_pairs('phash') / media_clusters() query it.
        media_index: bool | None = None,
        # crawl link graph: append per-round distinct (src_hash ->
        # dst_hash) edges (edges table, O(|links|)/round) for
        # link_stats()/pagerank() — crawl analytics over the REAL graph.
        # `site` = source page's site, so C4 cascade deletes ride the
        # generic SITE_TABLES path.
        record_edges: bool = False,
        # anchor-text observations (anchors table): append per-round
        # distinct (src_hash, dst_hash, anchor) rows, O(|links|)/round.
        # Anchor text is how the WEB describes a page; search_anchor()
        # ranks on it and search_anchored() fuses it with body BM25 —
        # the classic web-search signal body text alone can't give
        # (navigation pages, media targets, sparse pages).
        record_anchors: bool = False,
        # per-fetch content fingerprints (fetch_fingerprints table):
        # append-only observation history (url_hash, round, content_hash)
        # across recrawls, O(|fetched|)/round — feeds fetch_history() /
        # recrawl_scores() / schedule_recrawl(), the change-rate recrawl
        # loop (scheduler.recrawl_priorities).
        track_changes: bool = False,
        # incremental page-vector ANN index (page_vectors table): one
        # FIXED-SCALE int8-style quantized embedding of each committed
        # page's visible text + its sign-LSH bucket, O(|fetched|)/round.
        # Fixed scale (not a per-batch max) keeps int64 scores
        # comparable ACROSS rounds — the production contract for an
        # incremental index; 0.5 covers hash_embedding's [-0.5, 0.5)
        # range (set it to 1.0 for unit-normalized real models).
        # search_semantic_indexed() queries it join-only.
        vector_index: bool = False,
        lexical_index: bool = False,
        vector_scale: float = 0.5,
        # wall-seconds one politeness round represents: maps a 429's
        # Retry-After delta-seconds to backoff rounds (windows.py's
        # event-time mapping uses the same constant)
        seconds_per_round: int = 60,
        # S4 cluster path: a ConditionalTransport-style callable
        # (url -> (status, spans, out_links[, out_anchors[, retry_after]]))
        # switches run_round from the simulated web join to
        # fetch_via_http (Arrow-batched, per-host paced). world["web"]/
        # ["bursts"] are then ignored; robots/control still gate.
        fetch_transport=None,
        fetch_min_delay_s: float = 0.0,
        # pre-built TableIO overrides root/bucketed_io — the cluster entry
        # point: CrawlEngine(spark, "", io=IcebergTableIO(spark, "crawl",
        # schemas=ENGINE_SCHEMAS)) runs the identical round loop against
        # an Iceberg catalog (jar-gated integration suite:
        # tests/test_iceberg_integration.py)
        io: ParquetSnapshotIO | None = None,
    ):
        self.spark = spark
        if io is not None:
            self.io = io
        elif bucketed_io:
            from crawler_spark.io.bucketed import BucketedSnapshotIO

            self.io: ParquetSnapshotIO = BucketedSnapshotIO(
                root,
                schemas=ENGINE_SCHEMAS,
                n_buckets=bucketed_io,
                min_bucket_bytes=bucketed_min_bytes,
            )
        else:
            self.io = ParquetSnapshotIO(root, schemas=ENGINE_SCHEMAS)
        self.mode = mode
        self.n_salts = n_salts
        # probabilistic seen-set prefilter: 'bloom' (insert-only; deletes
        # rebuild affected buckets) or 'cuckoo' (native targeted deletes,
        # O(|site|) on cascade rounds). use_bloom=True is the legacy
        # spelling of seen_filter='bloom'.
        if use_bloom and seen_filter is None:
            seen_filter = "bloom"
        self.seen_filter = seen_filter
        self.use_bloom = seen_filter == "bloom"
        self.use_cuckoo = seen_filter == "cuckoo"
        self.bloom_buckets = bloom_buckets
        self.bloom_expected = bloom_expected_per_bucket
        self.bloom_broadcast_budget = bloom_broadcast_budget_bytes
        self.follow_links = follow_links
        self.n_lineage_buckets = n_lineage_buckets
        # per-round appends are tiny (≤ hosts × budget rows): coalesce to
        # 1 file so snapshot reads don't drown in small files. Set None
        # for large-scale runs where appends are wide.
        self.coalesce_writes = coalesce_writes
        self.embed_dim = embed_dim
        self.priority = priority
        # optional external vector-DB sink (K8). None keeps the snapshot
        # `uploaded` table as the sink of record with every point acked.
        self.upload_transport = upload_transport
        self.upload_batch_size = upload_batch_size
        self.upload_post_ack = upload_post_ack
        self.dedup_index = dedup_index
        self.media_index = dedup_index if media_index is None else media_index
        if record_edges and not follow_links:
            raise ValueError(
                "record_edges=True requires follow_links=True — edges are "
                "discovered by the link-follow pass; with it off the edges "
                "table would silently stay empty"
            )
        self.record_edges = record_edges
        if record_anchors and not follow_links:
            raise ValueError(
                "record_anchors=True requires follow_links=True — anchors "
                "are observed on the link-follow pass; with it off the "
                "anchors table would silently stay empty"
            )
        self.record_anchors = record_anchors
        self.track_changes = track_changes
        self.lexical_index = lexical_index
        if vector_index and not embed_dim:
            raise ValueError(
                "vector_index=True needs embed_dim > 0 — the index stores "
                "quantized page embeddings of that width"
            )
        self.vector_index = vector_index
        self.vector_scale = float(vector_scale)
        self.embedder = embedder
        self.seconds_per_round = int(seconds_per_round)
        self.fetch_transport = fetch_transport
        self.fetch_min_delay_s = float(fetch_min_delay_s)

    def _w(self, df: DataFrame) -> DataFrame:
        return df.coalesce(self.coalesce_writes) if self.coalesce_writes else df

    def _embed_col(self, text_col):
        """The engine's ONE embedding spelling: the configured real
        model (embedder=) or the deterministic hash stand-in. Every
        embedding the engine ever computes — downstream records, the
        page-vector index, semantic-search query vectors — goes through
        here, so swapping in a real model swaps ALL of them coherently
        (index vectors and query vectors must come from the same
        model)."""
        from crawler_spark.operators.downstream import hash_embedding

        if self.embedder is not None:
            return self.embedder(text_col)
        return hash_embedding(text_col, self.embed_dim)

    # ------------------------------------------------------------------ seed
    def seed(self, frontier_urls: DataFrame) -> None:
        """Round 0: (url, site) page list -> frontier snapshot.

        Dedup by url_hash keeps the lexicographically-smallest spelling
        (only relevant in scaled mode where canonical twins collide).
        """
        frontier = (
            with_url_keys(frontier_urls.select("url"), mode=self.mode)
            .groupBy("url_hash")
            .agg(
                # single struct-min so url/site/host all come from the SAME
                # lexicographically-least spelling (independent mins could
                # pair one twin's url with another twin's host casing,
                # diverging from the oracle's politeness grouping)
                F.min(F.struct("url", "site", "host")).alias("ush"),
                F.first("h64").alias("h64"),  # h64 is determined by url_hash
            )
            .select(
                F.col("ush.url").alias("url"),
                "url_hash",
                "h64",
                F.col("ush.site").alias("site"),
                F.col("ush.host").alias("host"),
                F.lit(0).alias("depth"),
                F.lit(0).alias("discovered_round"),
                F.lit(S.PENDING).alias("state"),
            )
        )
        self.io.commit(
            0,
            overwrites={
                "frontier": frontier,
                "frontier_state": self._empty("frontier_state"),
                "host_state": self._empty("host_state"),
            },
            meta={"seq_total": 0, "mode": self.mode},
        )

    def _empty(self, name: str) -> DataFrame:
        return self.spark.createDataFrame([], ENGINE_SCHEMAS[name])

    # ------------------------------------------------------------- one round
    def run_round(self, rnd: int, world: dict[str, DataFrame]) -> dict:
        """Cleanup shell around _run_round_inner: a mid-round failure
        (analysis error in a downstream build, transport fault) must
        not leave this attempt's background threads running jobs or
        its cached frames pinned — a caller that catches and retries
        would race the stray job and leak executor memory. On
        exception: wait out any started threads (their jobs are
        bounded), unpersist every frame the attempt cached, re-raise."""
        cleanup: dict = {"threads": [], "cached": [], "persist_lists": []}
        try:
            return self._run_round_inner(rnd, world, cleanup)
        except BaseException:
            for t in cleanup["threads"]:
                if t is not None and t.ident is not None:
                    t.join(timeout=600)
            frames = list(cleanup["cached"])
            for lst in cleanup["persist_lists"]:
                frames.extend(lst)
            for df in frames:
                try:
                    df.unpersist()
                except Exception:
                    pass
            raise

    def _run_round_inner(
        self, rnd: int, world: dict[str, DataFrame], _cleanup: dict
    ) -> dict:
        io, spark = self.io, self.spark
        self.drain_ingest()
        frontier_base = io.read(spark, "frontier")  # existence checks only
        frontier = read_frontier_view(spark, io)  # effective states
        seen = io.read(spark, "seen")
        entity_seen = io.read(spark, "entity_seen")
        host_state = read_host_state_view(spark, io)
        persists: list[DataFrame] = []
        _cleanup["persist_lists"].append(persists)

        eng_ctl = io.read(spark, "engine_control")
        # the robots gate dim (compiled wildcard rules) is a pure
        # function of the world's robots table — compile it once per
        # world instead of rebuilding ~100 expression objects per round
        # (part of the r04 per-round fixed-overhead ask)
        cr = getattr(self, "_compiled_robots", None)
        if cr is None or cr[0] is not world["robots"]:
            from crawler_spark.operators.scheduler import compiled_robots_dim

            cr = (world["robots"], compiled_robots_dim(world["robots"]))
            self._compiled_robots = cr
        # newly-deleted sites this round -> cascade (J5/C4, crawler.py:557-589)
        control_rows = getattr(self, "_control_rows", None)
        if control_rows is None:
            control_rows = world["control"].collect()
        newly_deleted = [
            r.site for r in control_rows if r.deleted_at_round == rnd
        ]
        all_deleted = {
            r.site
            for r in control_rows
            if r.deleted_at_round is not None and rnd >= r.deleted_at_round
        }

        cand = self._apply_host_budgets(
            gate_candidates(
                frontier, world["control"], host_state, world["robots"], rnd,
                extra_flags=eng_ctl, compiled_robots=cr[1],
            )
        )
        if self.use_bloom:
            # persistent per-bucket filters, incrementally maintained at
            # commit time — the seen table itself never shuffles here.
            # probe_mode auto-selects: broadcast while the filter set fits
            # the driver/executor budget, cogrouped (filters stay on their
            # bucket partitions) beyond it — a 10^10-key filter set must
            # never be collect()ed to the driver.
            blooms = io.read(spark, "seen_bloom")
            total_bits = blooms.agg(F.sum("n_bits")).collect()[0][0] or 0
            mode = (
                "broadcast"
                if total_bits // 8 <= self.bloom_broadcast_budget
                else "cogroup"
            )
            deduped = D.bloom_prefilter(
                cand, blooms, seen, self.bloom_buckets, probe_mode=mode
            )
        elif self.use_cuckoo:
            filters = io.read(spark, "seen_cuckoo")
            # one aggregate pays for both the broadcast-vs-cogroup probe
            # sizing AND the layout-version check (a store persisted
            # under an older (fp, cell) derivation probes with false
            # NEGATIVES — missed dups — so it must not be trusted)
            szrow = filters.agg(
                F.sum(F.length("table") + F.length("stash")),
                F.count("*"),
                F.min(F.coalesce(F.col("layout"), F.lit(-1))),
            ).collect()[0]
            total_bytes = szrow[0] or 0
            self._cuckoo_stale = bool(szrow[1]) and szrow[2] != CK.CUCKOO_LAYOUT
            if self._cuckoo_stale:
                # exact dedup this round; the commit below rebuilds the
                # filters from the full seen set (one-time migration)
                deduped = (
                    io.anti_join_seen(spark, cand)
                    if hasattr(io, "anti_join_seen")
                    else D.exact_anti_join(cand, seen)
                )
            else:
                mode = (
                    "broadcast"
                    if total_bytes <= self.bloom_broadcast_budget
                    else "cogroup"
                )
                deduped = CK.cuckoo_prefilter(
                    cand, filters, seen, self.bloom_buckets, probe_mode=mode
                )
        elif hasattr(io, "anti_join_seen"):
            # bucketed IO: chained co-located anti-joins, seen never shuffles
            deduped = io.anti_join_seen(spark, cand)
        else:
            deduped = D.exact_anti_join(cand, seen)

        if self.priority == "score":
            deduped = self._join_priority_scores(deduped)

        seq_base = int(io.rows_meta("seq_total", 0))
        max_budget = getattr(self, "_max_budget", None)
        if max_budget is None:
            row = world["robots"].agg(
                F.max("crawl_budget"), F.count("*")
            ).collect()[0]
            max_budget = row[0] or 1
            self._max_budget = max_budget
            self._n_hosts = int(row[1])
        # host-budget overrides can raise the per-host cap past the
        # robots max; the schedule window's literal bound must cover it
        max_budget = max(max_budget, getattr(self, "_budget_override_max", 0))
        scheduled = schedule(
            deduped, rnd, seq_base, self.n_salts, max_budget=max_budget,
            priority=self.priority, persist_registry=persists,
            # a-priori bound on the scheduled set: picks the one-job
            # ordering below SMALL_ORDER_ROWS, the distributed two-phase
            # assigner beyond (see scheduler.schedule)
            expected_rows=self._n_hosts * max_budget,
        )

        if self.fetch_transport is not None:
            # S4 wire path: same output columns as simulate_fetch, so
            # everything downstream (extract/commit/backoff/metrics)
            # is transport-agnostic (operator equality pinned in
            # test_wire_fetch; engine-level wire==sim equality in
            # test_wire_engine)
            from crawler_spark.operators.fetch import fetch_via_http

            fetched = fetch_via_http(
                scheduled,
                transport=self.fetch_transport,
                min_delay_s=self.fetch_min_delay_s,
            ).cache()
        else:
            fetched = simulate_fetch(
                scheduled, world["web"], world["bursts"], rnd
            ).cache()
        _cleanup["cached"].append(fetched)
        # The status-count job (which also materializes the fetched
        # cache) rides a background thread so it overlaps the ~1 s of
        # driver-side plan construction below instead of preceding it
        # serially (the r04 per-round fixed-overhead ask). The round's
        # downstream plans are built optimistically and simply dropped
        # unexecuted on an idle round — lazy frames, no side effects.
        import threading as _threading

        _status_box: list = []

        def _collect_status():
            try:
                _status_box.append(
                    {r.status: r["count"] for r in fetched.groupBy("status").count().collect()}
                )
            except Exception as e:  # surfaced at the join below
                _status_box.append(e)

        _status_t = _threading.Thread(target=_collect_status, daemon=True)
        _cleanup["threads"].append(_status_t)
        if self.fetch_transport is not None:
            # wire mode: real HTTP requests fire when this job runs —
            # keep it strictly serial so no concurrent job can race the
            # fetched-cache materialization (politeness: exactly one
            # fetch per scheduled URL, never a cache-lock retry)
            _collect_status()
        else:
            _status_t.start()

        ok = fetched.filter(F.col("status") == 200)
        errs = fetched.filter(~F.col("status").isin(200, 429))
        f429 = fetched.filter(F.col("status") == 429)

        docs = ok.select(
            F.col("url_hash").alias("doc_id"),
            "url",
            "site",
            "host",
            F.col("round").alias("fetched_round"),
            "spans",
        )
        new_seen = ok.select(
            "url", "url_hash", "h64", "site", "host", F.col("round").alias("fetched_round")
        )

        entities = extract_entities(ok)
        kept, new_keys = dedup_entities(entities, entity_seen)
        kept = kept.cache()  # consumed by records write AND the synth anti-join
        persists.append(kept)
        # materialize the extract pipeline (Arrow mapInPandas — the
        # commit's long pole) in the background while the driver keeps
        # building the rest of the round's plans; joined before commit.
        # Gated on the status result so an idle round never runs an
        # extract job over empty input.
        _kept_err: list = []

        def _force_kept():
            try:
                if _status_t.ident is not None:
                    _status_t.join()
                counts = _status_box[0]
                if isinstance(counts, Exception):
                    return  # the main thread raises it
                if sum(counts.values()) > 0:
                    kept.count()
            except Exception as e:  # surfaced at the join below
                _kept_err.append(e)

        _kept_t = _threading.Thread(target=_force_kept, daemon=True)
        _cleanup["threads"].append(_kept_t)
        _kept_t.start()

        # join the status job HERE — after the extract-side plan
        # construction (which overlapped the collect) but before the
        # heavy downstream build, so an idle round never pays for
        # plans it will drop
        if _status_t.ident is not None:  # started (simulated-fetch path)
            _status_t.join()
        if isinstance(_status_box[0], Exception):
            raise _status_box[0]
        status_counts: dict = _status_box[0]
        n_sched = sum(status_counts.values())

        if n_sched == 0:
            # idle round: drop the (never-executed) plans and write
            # only the cascade commit, exactly as before (the gated
            # kept thread exits without running a job)
            _kept_t.join()
            idle_over, idle_app = {}, {}
            if newly_deleted:
                idle_over = {
                    k: self._w(v)
                    for k, v in self._site_table_overwrites(newly_deleted).items()
                }
                idle_over.update(self._site_filter_overwrites(newly_deleted))
                idle_app["frontier_state"] = self._w(
                    self._delete_deltas(frontier, newly_deleted, rnd)
                )
            io.commit(rnd, appends=idle_app, overwrites=idle_over, meta={"seq_total": seq_base})
            fetched.unpersist()
            for df in persists:
                df.unpersist()
            # NOTE: an Observation-based pending count was tried here
            # (ride the status job, save a count action) and REVERTED:
            # under AQE — the spark-submit/CLI default — the
            # CollectMetrics node sits in runtime-replaceable territory
            # deep below the gate joins, and on the first idle round
            # obs.get returned a schema-less row (toPyRow assert,
            # caught by test_spark_submit). The n_links Observation
            # below is different: it sits directly above a cached frame
            # feeding the commit's write action, with no AQE stage
            # boundary in between, and is delivered on every tested
            # config. Idle rounds pay the explicit count.
            pending = frontier.filter(F.col("state") == S.PENDING)
            if all_deleted:
                pending = pending.filter(~F.col("site").isin(list(all_deleted)))
            return {"round": rnd, "scheduled": 0, "pending": pending.count()}
        records = kept.select(
            "url", "site", "round", "seq", "shape", "entity_key", "types", "name", "payload_json"
        )
        new_entity_rows = new_keys.select("site", "entity_key", F.lit(rnd).alias("round"))

        # --- downstream pipeline (M7): records -> embeddings -> uploads ----
        if self.embed_dim:
            from crawler_spark.operators.downstream import (
                embed_new_records,
                select_for_upload,
            )

            new_emb = embed_new_records(
                records, io.read(spark, "embeddings"), rnd, self.embed_dim,
                embed_fn=self.embedder,
            ).cache()  # consumed by the embeddings AND uploaded writes
            persists.append(new_emb)
            new_upl = select_for_upload(new_emb, io.read(spark, "uploaded"), rnd)
            if self.upload_transport is not None:
                # K8 wire sink: push this round's upload set through the
                # transport and mark ONLY acked (2xx) points uploaded —
                # failed points stay out of `uploaded` and re-enter next
                # round's J4 anti-join (reference retry-on-next-poll)
                from crawler_spark.operators.downstream import (
                    transform_for_upload,
                    upload_via_transport,
                )

                docs_up = transform_for_upload(
                    new_emb.join(
                        new_upl.select("key", "site"), ["key", "site"], "left_semi"
                    )
                )
                acked = upload_via_transport(
                    docs_up, self.upload_transport, self.upload_batch_size,
                    post_ack=self.upload_post_ack,
                ).filter((F.col("status") >= 200) & (F.col("status") < 300))
                new_upl = new_upl.join(
                    acked.select(F.col("url").alias("key"), "site"),
                    ["key", "site"],
                    "left_semi",
                )

        # --- link discovery (engine extension; scoped to known hosts) ------
        edges = None
        anchors = None
        if self.follow_links:
            hosts = world["robots"].select("host").distinct()
            if self.record_anchors:
                # zip-explode keeps each link's anchor text aligned with
                # its URL through the canonicalize/hash pass; the extra
                # column rides along (every consumer below selects
                # explicit columns). arrays_zip null-pads a short or
                # missing anchors array.
                exploded = ok.select(
                    F.col("url_hash").alias("src_hash"),
                    F.col("site").alias("src_site"),
                    F.explode(F.arrays_zip("out_links", "out_anchors")).alias("z"),
                    (F.col("depth") + 1).alias("depth"),
                ).select(
                    "src_hash",
                    "src_site",
                    F.col("z.out_links").alias("url"),
                    F.coalesce(F.col("z.out_anchors"), F.lit("")).alias("anchor"),
                    "depth",
                )
            else:
                exploded = ok.select(
                    F.col("url_hash").alias("src_hash"),
                    F.col("site").alias("src_site"),
                    F.explode("out_links").alias("url"),
                    (F.col("depth") + 1).alias("depth"),
                )
            raw_links = exploded.transform(
                lambda df: with_url_keys(df, mode=self.mode)
            ).join(F.broadcast(hosts), "host", "left_semi")
            if self.record_edges or self.record_anchors:
                # cache the exploded+keyed frame: it is consumed 2-3x
                # (edges/anchors appends at commit + links aggregate
                # below) and recomputing it would redo the
                # canonicalize/hash pass
                raw_links = raw_links.cache()
                persists.append(raw_links)
            if self.record_edges:
                edges = raw_links.select(
                    "src_hash",
                    F.col("url_hash").alias("dst_hash"),
                    F.col("src_site").alias("site"),
                    F.lit(rnd).alias("round"),
                ).distinct()
            if self.record_anchors:
                anchors = raw_links.filter(F.col("anchor") != "").select(
                    "src_hash",
                    F.col("url_hash").alias("dst_hash"),
                    "anchor",
                    F.col("src_site").alias("site"),
                    F.lit(rnd).alias("round"),
                ).distinct()
            links = (
                raw_links.groupBy("url_hash")
                .agg(
                    # ONE struct-min: site/host must come from the same
                    # (depth, url)-minimal twin, not independent column mins
                    F.min(F.struct("depth", "url", "site", "host")).alias("du"),
                    F.first("h64").alias("h64"),
                )
                .select(
                    F.col("du.url").alias("url"),
                    "url_hash",
                    "h64",
                    F.col("du.site").alias("site"),
                    F.col("du.host").alias("host"),
                    F.col("du.depth").alias("depth"),
                    F.lit(rnd).alias("discovered_round"),
                    F.lit(S.PENDING).alias("state"),
                )
                .join(frontier_base.select("url_hash"), "url_hash", "left_anti")
                .select(*[f.name for f in S.FRONTIER.fields])
            )
        else:
            links = self._empty("frontier")
        links_cached = links.cache()
        _cleanup["cached"].append(links_cached)
        # n_links rides the commit's own frontier-append job as an
        # Observation instead of paying a dedicated count() action per
        # round (the r04 per-round-overhead ask). Safe here — unlike
        # the fold path, the observed frame is always materialized by
        # a normal plan action: `frontier` is not a SITE_TABLES member,
        # so appends["frontier"] survives every cascade branch. The
        # metric is read AFTER io.commit below, when the write has run.
        from pyspark.sql import Observation

        obs_links = Observation(f"links_r{rnd}")
        links = links_cached.observe(obs_links, F.count(F.lit(1)).alias("n"))

        # --- frontier state transitions (append-only deltas; the frontier
        # base is NEVER rewritten in the round loop — O(|delta|) commit IO)
        state_deltas = ok.select(
            "url_hash", F.lit(S.FETCHED).alias("state"), F.lit(rnd).alias("round")
        ).unionByName(
            errs.select("url_hash", F.lit(S.ERROR).alias("state"), F.lit(rnd).alias("round"))
        )

        # --- host backoff state (O-SCHED4): latest-wins append -------------
        # a server-advertised Retry-After (delta seconds) overrides the
        # deterministic 3..7-round surrogate: rounds = ceil(s / quantum),
        # all-integer so engine and oracle agree bit-for-bit
        spr = self.seconds_per_round
        new_back = (
            f429.groupBy("host")
            .agg(F.max("retry_after_s").alias("_ra"))
            .withColumn(
                "backoff_until_round",
                F.lit(rnd)
                + F.coalesce(
                    F.expr(f"cast((_ra + {spr - 1}) div {spr} as int)"),
                    backoff_rounds_expr(F.col("host"), rnd),
                ),
            )
            .withColumn("last_round", F.lit(rnd))
            .select("host", "backoff_until_round", "last_round")
        )

        # --- metrics / order / log -----------------------------------------
        crawl_order = fetched.select("round", "seq", "site", "url", "status")
        fetch_log = fetched.select("round", "url", "status", "bytes")
        err_counts = (
            fetched.filter(F.col("status") != 200)
            .withColumn(
                "code",
                F.when(F.col("status") == 0, F.lit("TIMEOUT")).otherwise(
                    F.col("status").cast("string")
                ),
            )
            .groupBy("site", "code")
            .agg(F.count("*").alias("n"))
            .groupBy("site")
            .agg(F.map_from_entries(F.collect_list(F.struct("code", "n"))).alias("errors"))
        )
        link_counts = links.groupBy("site").agg(F.count("*").alias("new_links"))
        metrics = (
            fetched.groupBy("site")
            .agg(
                F.count("*").alias("scheduled"),
                F.sum((F.col("status") == 200).cast("long")).alias("fetched"),
            )
            .join(err_counts, "site", "left")
            .join(link_counts, "site", "left")
            .select(
                F.lit(rnd).alias("round"),
                "site",
                "scheduled",
                "fetched",
                "errors",
                F.coalesce("new_links", F.lit(0)).cast("long").alias("new_links"),
            )
        )
        lineage = (
            new_seen.select(F.lit("seen").alias("table"), "h64")
            .unionByName(docs.select(F.lit("documents").alias("table"), F.xxhash64("doc_id").alias("h64")))
            .withColumn("bucket", F.pmod("h64", F.lit(self.n_lineage_buckets)).cast("int"))
            .groupBy("table", "bucket")
            .agg(F.count("*").alias("rows"))
            .select(F.lit(rnd).alias("round"), "table", "bucket", "rows")
        )

        appends = {
            "frontier": links,
            "frontier_state": state_deltas,
            "host_state": new_back,
            "seen": new_seen,
            "documents": docs,
            "records": records,
            "entity_seen": new_entity_rows,
            "crawl_order": crawl_order,
            "metrics": metrics,
            "fetch_log": fetch_log,
            "lineage": lineage,
        }
        if self.embed_dim:
            appends["embeddings"] = new_emb
            appends["uploaded"] = new_upl
        if self.dedup_index:
            from crawler_spark.operators.textdedup import document_signatures

            appends["doc_signatures"] = document_signatures(docs)
        if self.media_index:
            from crawler_spark.operators.multimodal import media_signatures

            appends["media_signatures"] = media_signatures(docs)
        if self.vector_index:
            appends["page_vectors"] = self._page_vector_rows(docs)
        if self.lexical_index:
            appends["postings"] = self._posting_rows(docs)
        if self.track_changes:
            # one row per successful fetch; md5 over the JSON-rendered
            # span sequence (schema-ordered fields -> deterministic) is
            # the change detector the recrawl scheduler lags over —
            # shared with revalidate() so conditional-GET comparisons
            # agree with stored history by construction
            from crawler_spark.operators.revalidate import span_content_hash

            appends["fetch_fingerprints"] = docs.select(
                F.col("doc_id").alias("url_hash"),
                "url",
                "site",
                "host",
                F.col("fetched_round").alias("round"),
                span_content_hash(F.col("spans")).alias("content_hash"),
            )
        if edges is not None:
            appends["edges"] = edges
        if anchors is not None:
            appends["anchors"] = anchors
        overwrites: dict[str, DataFrame] = {}
        if self.use_bloom:
            # OR the new seen keys into the bucket filters (no rebuild);
            # on a deletion round the filters are rebuilt from the exact
            # set instead (delete support = rebuild-from-truth)
            if newly_deleted:
                seen_after = self._site_table_overwrites(newly_deleted)["seen"].unionByName(
                    new_seen.filter(~F.col("site").isin(newly_deleted))
                )
                overwrites["seen_bloom"] = D.build_bloom(
                    seen_after, self.bloom_buckets, self.bloom_expected
                )
            else:
                overwrites["seen_bloom"] = D.update_blooms(
                    io.read(spark, "seen_bloom"),
                    new_seen,
                    self.bloom_buckets,
                    self.bloom_expected,
                )
        elif self.use_cuckoo and getattr(self, "_cuckoo_stale", False):
            # layout migration: rebuild every bucket from the exact seen
            # set (post-cascade, plus this round's keys) under the
            # current (fp, cell) derivation — one O(|seen|) pass, once
            # per upgrade, the same cost shape as a saturation rebuild
            base = io.read(spark, "seen")
            adds = new_seen
            if newly_deleted:
                base = base.filter(~F.col("site").isin(newly_deleted))
                adds = new_seen.filter(~F.col("site").isin(newly_deleted))
            overwrites["seen_cuckoo"] = self._w(
                CK.build_cuckoo(
                    base.select("h64").unionByName(adds.select("h64")),
                    self.bloom_buckets,
                    expected_per_bucket=self.bloom_expected,
                )
            )
            self._cuckoo_stale = False
        elif self.use_cuckoo:
            filters = io.read(spark, "seen_cuckoo")
            if newly_deleted:
                # the cuckoo advantage: delete the cascaded site's
                # fingerprints in place — O(|site|), no bucket rebuild,
                # no full seen-set rescan (vs the Bloom rebuild above)
                gone = (
                    io.read(spark, "seen")
                    .filter(F.col("site").isin(newly_deleted))
                    .select("h64")
                )
                filters = CK.delete_from_cuckoos(filters, gone, self.bloom_buckets)
                adds = new_seen.filter(~F.col("site").isin(newly_deleted))
            else:
                adds = new_seen
            overwrites["seen_cuckoo"] = CK.update_cuckoos(
                filters, adds, self.bloom_buckets, self.bloom_expected
            )
        if newly_deleted:
            # cascade: for each site-keyed table, fold this round's append
            # into the filtered overwrite (an overwrite replaces the whole
            # path list, so the append must ride along or it would be lost);
            # the frontier cascade is DELTAS — deleted-state rows for the
            # site's base rows plus this round's links, O(|site|) not
            # O(|frontier|)
            cascade = self._site_table_overwrites(newly_deleted)
            for name in SITE_TABLES:
                overwrites[name] = cascade[name]
                this_round = appends.pop(name, None)
                if this_round is not None:
                    overwrites[name] = cascade[name].unionByName(
                        this_round.filter(~F.col("site").isin(newly_deleted))
                    )
            appends["frontier_state"] = state_deltas.unionByName(
                self._delete_deltas(frontier.unionByName(links), newly_deleted, rnd)
            )
        appends = {k: self._w(v) for k, v in appends.items()}
        overwrites = {k: self._w(v) for k, v in overwrites.items()}

        _kept_t.join()
        if _kept_err:
            raise _kept_err[0]
        io.commit(
            rnd,
            appends=appends,
            overwrites=overwrites,
            meta={"seq_total": seq_base + n_sched},
        )
        def _n_links():
            # the commit's frontier write delivered the metric on every
            # tested config (no AQE boundary between the observe node
            # and the write action); the cached-frame count is a cheap
            # exact fallback if a future plan shape breaks delivery
            try:
                return int(obs_links.get["n"])
            except Exception:
                return links_cached.count()

        stats = {
            "round": rnd,
            "scheduled": n_sched,
            "fetched": status_counts.get(200, 0),
            "errors": sum(v for k, v in status_counts.items() if k not in (200, 429)),
            "rate_limited": status_counts.get(429, 0),
            "new_links": _n_links(),
        }
        fetched.unpersist()
        links_cached.unpersist()
        for df in persists:
            df.unpersist()
        return stats

    def _site_table_overwrites(self, sites: list[str]) -> dict[str, DataFrame]:
        """C4 cascade: filtered overwrites of the site-keyed tables
        (rare lifecycle op — per-round state stays append-only)."""
        return {
            name: self.io.read(self.spark, name).filter(~F.col("site").isin(sites))
            for name in SITE_TABLES
        }

    def _filter_overwrites_after_removal(
        self, gone_seen: DataFrame, seen_after: DataFrame
    ) -> dict[str, DataFrame]:
        """Seen-filter maintenance for any path that REMOVES seen rows,
        folded by callers into the SAME atomic commit as the removal —
        otherwise stale fingerprints survive in seen_bloom/seen_cuckoo
        (false-positive-only, so correctness holds via the exact confirm,
        but n_keys stays inflated and saturation rebuilds re-flag the
        buckets forever). Cuckoo: native targeted delete, O(|gone|).
        Bloom: rebuild from the surviving set (insert-only structure)."""
        if self.use_bloom:
            return {
                "seen_bloom": self._w(
                    D.build_bloom(seen_after, self.bloom_buckets, self.bloom_expected)
                )
            }
        if self.use_cuckoo:
            filters = self.io.read(self.spark, "seen_cuckoo")
            return {
                "seen_cuckoo": self._w(
                    CK.delete_from_cuckoos(
                        filters, gone_seen.select("h64"), self.bloom_buckets
                    )
                )
            }
        return {}

    def _site_filter_overwrites(self, sites: list[str]) -> dict[str, DataFrame]:
        seen = self.io.read(self.spark, "seen")
        return self._filter_overwrites_after_removal(
            seen.filter(F.col("site").isin(sites)),
            seen.filter(~F.col("site").isin(sites)),
        )

    def _delete_deltas(self, frontier_view: DataFrame, sites: list[str], rnd: int) -> DataFrame:
        """Deleted-state tombstone deltas for every not-yet-deleted row of
        the given sites (the frontier half of the C4 cascade)."""
        return (
            frontier_view.filter(F.col("site").isin(sites) & (F.col("state") != S.DELETED))
            .select("url_hash", F.lit(S.DELETED).alias("state"), F.lit(rnd).alias("round"))
        )

    # ------------------------------------------------- streaming ingestion
    def drain_ingest(self) -> int:
        """Fold streamed URL rows (pending_ingest, written by
        streaming.stream_frontier_ingest) into the frontier base.

        Consumed delta paths are pinned and removed in the same atomic
        commit that appends the merged rows (see
        streaming.drain_pending_ingest) — replaces the old
        read-union-overwrite sink that raced with the round loop."""
        from crawler_spark.streaming import drain_pending_ingest

        return drain_pending_ingest(self.spark, self.io, self.coalesce_writes)

    # ---------------------------------------------------- lifecycle (C1-C5)
    def _control_df(
        self,
        site: str | list[str],
        paused: bool | None = None,
        deleted: bool | None = None,
    ) -> DataFrame:
        """Updated lifecycle-flags table for one or many sites' change
        (tiny table; collect+rewrite). Returned, not committed — callers
        fold it into the same atomic commit as any cascade."""
        rows = {
            r.site: [r.paused, r.deleted]
            for r in self.io.read(self.spark, "engine_control").collect()
        }
        for s in [site] if isinstance(site, str) else site:
            cur = rows.get(s, [False, False])
            if paused is not None:
                cur[0] = paused
            if deleted is not None:
                cur[1] = deleted
            rows[s] = cur
        return self.spark.createDataFrame(
            [(s, p, d) for s, (p, d) in sorted(rows.items())],
            ENGINE_SCHEMAS["engine_control"],
        )

    def _write_control(self, site: str | list[str], paused: bool | None = None, deleted: bool | None = None):
        self.io.commit(
            self.io.last_round(),
            overwrites={"engine_control": self._w(self._control_df(site, paused, deleted))},
        )

    def pause_site(self, site: str) -> None:
        """C3 (app.py:497-503): scheduled-out from the next round on;
        the site's frontier rows stay pending."""
        self._write_control(site, paused=True)

    def resume_site(self, site: str) -> None:
        self._write_control(site, paused=False)

    def delete_site(self, site: str) -> None:
        """C4 (app.py:505-563, crawler.py:557-589): immediate cascade
        across all site-keyed tables + a standing deleted flag — ONE
        atomic commit, so a crash can never leave the cascade applied
        without the flag (the site would be silently recrawlable)."""
        rnd = max(self.io.last_round(), 0)
        frontier = read_frontier_view(self.spark, self.io)
        overwrites = {
            k: self._w(v) for k, v in self._site_table_overwrites([site]).items()
        }
        overwrites.update(self._site_filter_overwrites([site]))
        overwrites["engine_control"] = self._w(self._control_df(site, deleted=True))
        self.io.commit(
            rnd,
            appends={"frontier_state": self._w(self._delete_deltas(frontier, [site], rnd))},
            overwrites=overwrites,
        )

    def add_sites(self, frontier_urls: DataFrame) -> None:
        """C1/C2 + U1 union-merge: page URLs (url[, site]) join the
        frontier as pending, deduped against frontier AND seen."""
        frontier = self.io.read(self.spark, "frontier")
        seen = self.io.read(self.spark, "seen")
        rnd = max(self.io.last_round(), 0)
        new = (
            with_url_keys(frontier_urls.select("url"), mode=self.mode)
            .groupBy("url_hash")
            .agg(
                F.min(F.struct("url", "site", "host")).alias("ush"),
                F.first("h64").alias("h64"),
            )
            .select(
                F.col("ush.url").alias("url"),
                "url_hash",
                "h64",
                F.col("ush.site").alias("site"),
                F.col("ush.host").alias("host"),
                F.lit(0).alias("depth"),
                F.lit(rnd).alias("discovered_round"),
                F.lit(S.PENDING).alias("state"),
            )
            .join(frontier.select("url_hash"), "url_hash", "left_anti")
            .join(seen.select("url_hash"), "url_hash", "left_anti")
            .select(*[f.name for f in S.FRONTIER.fields])
        )
        self.io.commit(rnd, appends={"frontier": self._w(new)})

    def add_raw_sites(
        self,
        raw_urls: DataFrame,
        robots: DataFrame,
        sitemaps: DataFrame,
        url_filter: str | None = None,
    ) -> DataFrame:
        """C1 from bare URLs (the reference's /process entry,
        app.py:270-344): sitemap-vs-site dispatch + robots-first with
        /sitemap.xml fallback + site-name validation (P2/F5/P4), then
        the discovered pages join the frontier. Unresolvable sitemap
        URLs are recorded in fetch_log with SITEMAP_ERROR_STATUS (the
        reference's SITEMAP error category, app.py:704-714). Returns the
        rejected (url, site) rows (invalid site names) for the caller
        to surface."""
        from crawler_spark.operators.discovery import discover_from_raw_seeds

        pages, rejected, unresolved = discover_from_raw_seeds(
            raw_urls, robots, sitemaps, url_filter
        )
        self.add_sites(pages)
        self._log_unresolved_sitemaps(unresolved)
        return rejected

    def _sitemap_error_rows(self, unresolved: DataFrame, rnd: int) -> DataFrame:
        """Unresolvable sitemap URLs as fetch_log rows with
        SITEMAP_ERROR_STATUS — the reference logs every failed sitemap
        fetch as a SITEMAP error (app.py:704-714); every discovery
        caller (raw seeds, fixture seeds, refresh) routes through this."""
        return unresolved.select(
            F.lit(rnd).alias("round"),
            F.col("sitemap_url").alias("url"),
            F.lit(S.SITEMAP_ERROR_STATUS).alias("status"),
            F.lit(0).cast("long").alias("bytes"),
        )

    def _log_unresolved_sitemaps(self, unresolved: DataFrame) -> None:
        rnd = max(self.io.last_round(), 0)
        sm_errors = self._sitemap_error_rows(unresolved, rnd)
        if not sm_errors.isEmpty():
            self.io.commit(rnd, appends={"fetch_log": self._w(sm_errors)})

    def seed_from_world(self, world: dict[str, DataFrame], url_filter: str | None = None) -> None:
        """Fixture-seeded entry: discover the frontier from the world's
        seeds/robots/sitemaps, seed it, and log unresolvable sitemap
        URLs as SITEMAP errors (parity with add_raw_sites — previously
        only the raw-seed path logged them)."""
        from crawler_spark.operators.discovery import discover_frontier

        pages, unresolved = discover_frontier(
            world["seeds"], world["robots"], world["sitemaps"], url_filter,
            with_unresolved=True,
        )
        self.seed(pages)
        self._log_unresolved_sitemaps(unresolved)

    def restart_site(self, site: str, frontier_urls: DataFrame) -> None:
        """C5 (app.py:565-600): purge the site everywhere, clear flags,
        re-seed from its original URLs. The frontier overwrite folds the
        state deltas into the base (a compaction) and clears the delta
        chain — otherwise stale fetched/deleted tombstones would apply to
        the re-seeded rows of the same url_hash."""
        keep = read_frontier_view(self.spark, self.io).filter(F.col("site") != site)
        overwrites = {
            k: self._w(v) for k, v in self._site_table_overwrites([site]).items()
        }
        overwrites.update(self._site_filter_overwrites([site]))
        overwrites["frontier"] = self._w(keep)
        overwrites["frontier_state"] = self._empty("frontier_state")
        overwrites["engine_control"] = self._w(
            self._control_df(site, paused=False, deleted=False)
        )
        self.io.commit(self.io.last_round(), overwrites=overwrites)
        self.add_sites(frontier_urls)

    def refresh_sitemaps(
        self,
        world: dict[str, DataFrame],
        url_filter: str | None = None,
        prune_embeddings: bool = False,
    ) -> None:
        """S7 + J5 (app.py:814-848, crawler.py:197-277): re-walk the
        sitemap trees; new URLs join the frontier, sitemap-owned URLs
        (depth 0) that vanished are tombstoned — their rows cascade out
        of frontier/seen/documents/records. Link-discovered pages
        (depth > 0) are not sitemap-owned and are never tombstoned.
        Unresolvable sitemap URLs land in fetch_log as SITEMAP errors
        in the SAME commit (app.py:704-714 parity).

        prune_embeddings=False (default) keeps embeddings history —
        keyed by entity, not page. prune_embeddings=True is full
        reference parity (crawler.py:223-248 cascade-deletes removed
        pages' embeddings): embedding/uploaded rows whose (site, key)
        came ONLY from removed pages are cascaded out; keys still
        present on surviving records are kept (they would be instantly
        re-embedded otherwise)."""
        from crawler_spark.operators.discovery import discover_frontier

        spark, io = self.spark, self.io
        current, unresolved = discover_frontier(
            world["seeds"], world["robots"], world["sitemaps"], url_filter,
            with_unresolved=True,
        )
        cur_keys = (
            with_url_keys(current.select("url"), mode=self.mode)
            .select("url_hash")
            .distinct()
        )
        frontier = read_frontier_view(spark, io)
        removed = frontier.filter(F.col("depth") == 0).join(
            cur_keys, "url_hash", "left_anti"
        )
        removed_keys = removed.select("url_hash")
        removed_urls = removed.select("url")
        seen = io.read(spark, "seen")
        records = io.read(spark, "records")
        overwrites = {
            # overwrite folds deltas into the base (states preserved) and
            # clears the chain — tombstoned rows vanish entirely
            "frontier": frontier.join(removed_keys, "url_hash", "left_anti"),
            "frontier_state": self._empty("frontier_state"),
            "seen": seen.join(removed_keys, "url_hash", "left_anti"),
            "documents": io.read(spark, "documents").join(
                removed_keys.withColumnRenamed("url_hash", "doc_id"), "doc_id", "left_anti"
            ),
            "doc_signatures": io.read(spark, "doc_signatures").join(
                removed_keys.withColumnRenamed("url_hash", "doc_id"), "doc_id", "left_anti"
            ),
            "media_signatures": io.read(spark, "media_signatures").join(
                removed_keys.withColumnRenamed("url_hash", "doc_id"), "doc_id", "left_anti"
            ),
            "page_vectors": io.read(spark, "page_vectors").join(
                removed_keys.withColumnRenamed("url_hash", "doc_id"), "doc_id", "left_anti"
            ),
            "postings": io.read(spark, "postings").join(
                removed_keys.withColumnRenamed("url_hash", "doc_id"), "doc_id", "left_anti"
            ),
            "fetch_fingerprints": io.read(spark, "fetch_fingerprints").join(
                removed_keys, "url_hash", "left_anti"
            ),
            "records": records.join(removed_urls, "url", "left_anti"),
        }
        if prune_embeddings:
            rec_keys = lambda df: df.select(  # noqa: E731
                "site", F.coalesce("entity_key", "url").alias("key")
            ).distinct()
            gone_keys = rec_keys(
                records.join(removed_urls, "url", "left_semi")
            ).join(
                rec_keys(records.join(removed_urls, "url", "left_anti")),
                ["site", "key"],
                "left_anti",
            )
            for name in ("embeddings", "uploaded"):
                overwrites[name] = io.read(spark, name).join(
                    gone_keys, ["site", "key"], "left_anti"
                )
        overwrites = {k: self._w(v) for k, v in overwrites.items()}
        overwrites.update(
            self._filter_overwrites_after_removal(
                seen.join(removed_keys, "url_hash", "left_semi"),
                seen.join(removed_keys, "url_hash", "left_anti"),
            )
        )
        rnd = io.last_round()
        sm_errors = self._sitemap_error_rows(unresolved, max(rnd, 0))
        appends = {} if sm_errors.isEmpty() else {"fetch_log": self._w(sm_errors)}
        io.commit(rnd, appends=appends, overwrites=overwrites)
        self.add_sites(current)

    def update_dup_clusters(self) -> dict:
        """Maintain the near-dup CLUSTER assignment incrementally (the
        dup_clusters table: one row per signed doc, cluster_id = the
        component's min doc_id, singletons as cluster_id == doc_id).

        Each call folds only the docs signed since the last call:
        delta pairs via minhash_lsh_delta_pairs (the delta's LSH bands
        join the signature index — the corpus is never re-bucketed) and
        graph.incremental_components (contract-then-solve over the
        delta-sized graph). Per-call cost is O(|new docs|) + joins
        against the O(n_docs) assignment, NOT O(all pairs) — at 10^10
        docs that is the difference between re-clustering the crawl
        history every round and paying for the round's delta.

        Docs cascaded out (delete_site / schedule_recrawl) are pruned
        from the assignment here (as tombstone deltas); note the
        standard incremental-CC caveat: a removed BRIDGE doc does not
        split the cluster it merged — run recluster_dups() for an exact
        rebuild after bulk deletions.

        Commit discipline: each fold APPENDS its relabeling to
        dup_cluster_state — changed/new/tombstoned rows only, latest
        fold wins on read (read_dup_clusters_view) — so a maintenance
        call writes O(|relabel|) bytes. The previous shape rewrote the
        whole O(n_docs) assignment per fold: a corpus-sized write per
        maintenance call at 10^10 docs. maintain() compacts the state
        chain into the base exactly like frontier/frontier_state.

        Returns {"new_docs", "assignment_rows"}; requires
        CrawlEngine(dedup_index=True).
        """
        if not self.dedup_index:
            raise ValueError(
                "update_dup_clusters() requires CrawlEngine(dedup_index=True)"
            )
        from crawler_spark.operators.graph import incremental_component_deltas
        from crawler_spark.operators.textdedup import minhash_lsh_delta_pairs

        spark, io = self.spark, self.io
        sigs = io.read(spark, "doc_signatures").filter(F.col("mh0").isNotNull())
        view = read_dup_clusters_view(spark, io)
        current = sigs.select("doc_id")
        live = view.join(current, "doc_id", "left_semi").cache()
        tombstones = view.join(current, "doc_id", "left_anti").select(
            "doc_id", F.lit(None).cast("string").alias("cluster_id")
        )
        delta_sigs = sigs.join(live, "doc_id", "left_anti").cache()
        try:
            n_delta = delta_sigs.count()
            n_live = live.count()
            if n_delta == 0:
                n_tomb = tombstones.count()
                if n_tomb > 0:
                    self._append_cluster_fold(tombstones)
                return {"new_docs": 0, "assignment_rows": n_live}
            # ONE hot-key computation per fold, restricted to the
            # delta's band keys and shared by the pair-join guard AND
            # the no-silent-caps metric below (it was previously
            # computed twice: once inside the guard, once for the
            # audit) — eagerly checkpointed because both consumers and
            # the CC loop's own checkpoints would otherwise re-run it
            from crawler_spark.operators.textdedup import lsh_hot_buckets

            hot = lsh_hot_buckets(
                signatures=sigs, max_bucket=1000, touched_by=delta_sigs
            ).localCheckpoint(eager=True)
            pairs = minhash_lsh_delta_pairs(sigs, delta_sigs, hot_keys=hot)
            rel = incremental_component_deltas(live, pairs)
            singles = (
                delta_sigs.select("doc_id")
                .join(rel, "doc_id", "left_anti")
                .select("doc_id", F.col("doc_id").alias("cluster_id"))
            )
            # rel may relabel a doc that also tombstones this fold only
            # if it were still in `live`; live is semi-joined to current,
            # so the two delta sets are disjoint by construction
            self._append_cluster_fold(
                rel.unionByName(singles).unionByName(tombstones)
            )
            # no-silent-caps: the guard's own (delta-restricted,
            # checkpointed) hot frame doubles as the audit metric — a
            # count over the tiny materialized checkpoint, no second
            # corpus pass. (Not an Observation: the fold's first
            # action is a localCheckpoint inside connected_components,
            # which materializes via the RDD path and never delivers
            # observed metrics.)
            n_hot = hot.count()
            return {
                "new_docs": n_delta,
                "assignment_rows": n_live + n_delta,
                "hot_buckets_dropped": int(n_hot),
            }
        finally:
            delta_sigs.unpersist()
            live.unpersist()

    def _append_cluster_fold(self, rows: DataFrame) -> None:
        """Append one fold's (doc_id, cluster_id|NULL) deltas with the
        next fold sequence number. One tiny scalar agg for the sequence;
        the append is the only table write."""
        io = self.io
        prev = (
            io.read(self.spark, "dup_cluster_state")
            .agg(F.max("fold"))
            .collect()[0][0]
        )
        fold_no = (prev if prev is not None else 0) + 1
        io.commit(
            io.last_round(),
            appends={
                "dup_cluster_state": self._w(
                    rows.select(
                        "doc_id",
                        "cluster_id",
                        F.lit(fold_no).cast("int").alias("fold"),
                    )
                )
            },
        )

    def dup_cluster_view(self) -> DataFrame:
        """The effective (doc_id, cluster_id) assignment — base table
        merged with the append-only fold deltas (latest fold wins,
        tombstones pruned). Consumers read THIS, not the raw
        dup_clusters table, which lags until compaction."""
        return read_dup_clusters_view(self.spark, self.io)

    def recluster_dups(self) -> dict:
        """Exact batch rebuild of dup_clusters (connected_components
        over near_dup_pairs) — the re-canonicalization companion of
        update_dup_clusters after bulk deletions."""
        if not self.dedup_index:
            raise ValueError("recluster_dups() requires CrawlEngine(dedup_index=True)")
        from crawler_spark.operators.graph import connected_components

        spark, io = self.spark, self.io
        sigs = io.read(spark, "doc_signatures").filter(F.col("mh0").isNotNull())
        cc = connected_components(self.near_dup_pairs("minhash"))
        singles = (
            sigs.select("doc_id")
            .join(cc, "doc_id", "left_anti")
            .select("doc_id", F.col("doc_id").alias("cluster_id"))
        )
        new_asg = cc.unionByName(singles).localCheckpoint(eager=True)
        io.commit(
            io.last_round(),
            overwrites={
                "dup_clusters": self._w(new_asg),
                "dup_cluster_state": self._empty("dup_cluster_state"),
            },
        )
        return {"assignment_rows": new_asg.count()}

    def near_dup_pairs(self, method: str = "minhash", **kwargs) -> DataFrame:
        """Near-dup candidate pairs over the incremental signature index
        (dedup_index=True): the expensive text->signature pipeline was
        already paid, one delta per round at fetch time, so this is
        join-only — minhash: band-explode + bucket join; simhash:
        blocked Hamming search. Unsignable docs (NULL signatures — too
        short to shingle) can't near-dup and are filtered here."""
        sigs = self.io.read(self.spark, "doc_signatures")
        if method == "minhash":
            from crawler_spark.operators.textdedup import minhash_lsh_pairs

            return minhash_lsh_pairs(signatures=sigs.filter(F.col("mh0").isNotNull()), **kwargs)
        if method == "simhash":
            from crawler_spark.operators.textdedup import simhash_near_dup_pairs

            return simhash_near_dup_pairs(
                signatures=sigs.filter(F.col("simhash").isNotNull()), **kwargs
            )
        if method == "phash":
            from crawler_spark.operators.multimodal import media_near_dup_pairs

            msigs = (
                self.io.read(self.spark, "media_signatures")
                .filter(F.col("phash").isNotNull())
                .select("media_ref", "phash")
                .distinct()  # one row per occurrence -> one per ref
            )
            return media_near_dup_pairs(phashes=msigs, **kwargs)
        if method == "vector":
            # semantic near-dups from the page-vector index
            # (vector_index=True): pairs form only inside a sign-LSH
            # bucket, similarity = exact int64 inner product of the
            # fixed-scale quantized vectors normalized to e6 against
            # the self-dot ceiling: sim_e6 = 1e6*dot(a,b) div
            # max(dot(a,a), dot(b,b)) — 1e6 iff identical text.
            min_sim_e6 = kwargs.pop("min_sim_e6", 900_000)
            if kwargs:
                raise TypeError(f"unexpected kwargs for 'vector': {sorted(kwargs)}")
            idx = self.io.read(self.spark, "page_vectors")
            dot = lambda a, b: F.aggregate(  # noqa: E731
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            a = idx.select(
                F.col("doc_id").alias("doc_a"), F.col("qv").alias("va"), "bucket"
            )
            b = idx.select(
                F.col("doc_id").alias("doc_b"), F.col("qv").alias("vb"), "bucket"
            )
            return (
                a.join(b, "bucket")
                .filter(F.col("doc_a") < F.col("doc_b"))
                .withColumn("_ab", dot(F.col("va"), F.col("vb")))
                .withColumn("_aa", dot(F.col("va"), F.col("va")))
                .withColumn("_bb", dot(F.col("vb"), F.col("vb")))
                .withColumn(
                    "sim_e6",
                    F.expr("(1000000 * _ab) div greatest(_aa, _bb)").cast("long"),
                )
                .filter(F.col("sim_e6") >= min_sim_e6)
                .select("doc_a", "doc_b", "sim_e6")
            )
        raise ValueError(f"unknown near-dup method: {method!r}")

    def media_clusters(self, max_hamming: int = 3, **kwargs) -> DataFrame:
        """Near-dup media clusters from the incremental pHash index:
        (media_ref, cluster_id) via the same large-star/small-star
        connected components that cluster text dups — decode/store ONE
        ref per cluster instead of every copy of the same image."""
        from crawler_spark.operators.graph import connected_components

        pairs = self.near_dup_pairs("phash", max_hamming=max_hamming, **kwargs)
        return connected_components(
            pairs, a_col="ref_a", b_col="ref_b"
        ).select(F.col("doc_id").alias("media_ref"), "cluster_id")

    # ---------------------------------------------------- score priority
    def set_priority_scores(
        self, scores: DataFrame, id_col: str = "node", score_col: str | None = None
    ) -> None:
        """Install the per-URL score table for priority='score' (OPIC /
        PageRank-style frontier prioritization): within each host, the
        highest-scored unseen URLs are crawled first (url tiebreak).

        `scores` is (id_col=url_hash, score_col) — typically the output
        of `engine.pagerank()` from a previous crawl's recorded link
        graph (the classic crawl-then-recrawl-by-importance loop).
        Unscored URLs rank as 0. score_col=None picks the single
        non-id column (pagerank's score_eN).

        Scale note: candidates join scores on url_hash once per round —
        an O(|candidates|+|scores|) exchange. At 10^10 URLs store the
        score table bucketed by url_hash into the engine's layout so
        the join co-locates (same bucket function as seen), or pass a
        host-level score table joined on host via broadcast.

        Integral scores keep LONG (engine.pagerank's exact integer
        units); fractional inputs keep DOUBLE — a cast to long would
        silently floor a conventional float-PageRank table to all-0s
        and degrade the mode to plain url order. Duplicate url_hash
        rows collapse to their max score at install time: a duplicated
        key would otherwise FAN OUT the candidate row in the per-round
        left join and double-schedule the URL.
        """
        if score_col is None:
            extras = [c for c in scores.columns if c != id_col]
            if len(extras) != 1:
                raise ValueError(f"ambiguous score column among {extras}")
            score_col = extras[0]
        dtype = dict(scores.dtypes).get(score_col, "")
        num_t = (
            "double"
            if dtype in ("float", "double") or dtype.startswith("decimal")
            else "long"
        )
        self._priority_scores = (
            scores.select(
                F.col(id_col).alias("url_hash"),
                F.col(score_col).cast(num_t).alias("pr_score"),
            )
            .groupBy("url_hash")
            .agg(F.max("pr_score").alias("pr_score"))
        )

    def set_host_budgets(self, budgets: DataFrame) -> None:
        """Override per-host crawl budgets for subsequent rounds —
        typically scheduler.apportion_budget's output (a global fetch
        capacity split across hosts by quality/change-rate/authority
        weights, largest-remainder exact). Hosts absent from the table
        keep their robots crawl_budget; a budget of 0 idles the host.

        The override joins the gated candidates via broadcast (one row
        per host — tiny at any scale next to the frontier). Pass None
        to clear."""
        if budgets is None:
            self._host_budgets = None
            self._budget_override_max = 0
            return
        self._host_budgets = (
            budgets.select(
                "host", F.col("budget").cast("int").alias("_budget_override")
            )
            .groupBy("host")
            .agg(F.max("_budget_override").alias("_budget_override"))
        )
        self._budget_override_max = int(
            self._host_budgets.agg(
                F.coalesce(F.max("_budget_override"), F.lit(0))
            ).first()[0]
        )

    def _apply_host_budgets(self, cand: DataFrame) -> DataFrame:
        over = getattr(self, "_host_budgets", None)
        if over is None:
            return cand
        return (
            cand.join(F.broadcast(over), "host", "left")
            .withColumn(
                "crawl_budget",
                F.coalesce("_budget_override", "crawl_budget"),
            )
            .drop("_budget_override")
        )

    def _join_priority_scores(self, deduped: DataFrame) -> DataFrame:
        scores = getattr(self, "_priority_scores", None)
        if scores is None:
            raise ValueError(
                "priority='score' requires set_priority_scores(...) before run"
            )
        return deduped.join(scores, "url_hash", "left").withColumn(
            "pr_score", F.coalesce("pr_score", F.lit(0).cast("long"))
        )

    def link_edges(self) -> DataFrame:
        """The crawl's link graph (record_edges=True): distinct
        (src_hash, dst_hash, site, round) rows, O(|links|) appended per
        round alongside the frontier links."""
        return self.io.read(self.spark, "edges")

    def link_anchors(self) -> DataFrame:
        """Anchor-text observations (record_anchors=True): distinct
        (src_hash, dst_hash, anchor, site, round) rows per round —
        re-observations on recrawls append again, like edges."""
        return self.io.read(self.spark, "anchors")

    def anchor_docs(self) -> DataFrame:
        """Per-target anchor documents: each crawled page described by
        the deduped anchor text of every link POINTING AT it (doc_id =
        dst url_hash). This is the classic web-search signal the body
        can't give — other pages' words for this page."""
        from crawler_spark.operators.retrieval import anchor_docs

        return anchor_docs(self.link_anchors())

    def search_anchor(self, queries: DataFrame, k: int = 10) -> DataFrame:
        """BM25 top-k over the anchor documents (record_anchors=True):
        rank pages by how the rest of the crawl DESCRIBES them.
        queries: (query_id, qtext). Returns (query_id, doc_id,
        score_e9, rank) with doc_id = target page url_hash."""
        from crawler_spark.operators.retrieval import bm25_topk

        return bm25_topk(self.anchor_docs(), queries, k=k, id_col="doc_id")

    def search_anchored(self, queries: DataFrame, k: int = 10, k0: int = 60) -> DataFrame:
        """Body BM25 + anchor BM25 fused with exact-int64 RRF — the
        anchor-aware lexical search (a page ranks for words the web
        uses ABOUT it, even when its own body never says them)."""
        from crawler_spark.operators.retrieval import rrf_fuse

        body = self.search_lexical(queries, k=k).select("query_id", "doc_id", "rank")
        anch = self.search_anchor(queries, k=k).select("query_id", "doc_id", "rank")
        return rrf_fuse([body, anch], k=k, k0=k0)

    def link_stats(self) -> DataFrame:
        """(node, out_deg, in_deg) over the crawled link graph — the
        OPIC-ish in-degree signal for crawl prioritization."""
        from crawler_spark.operators.graph import link_graph_stats

        return link_graph_stats(self.link_edges(), "src_hash", "dst_hash")

    def seed_distances(self, max_depth: int = 10) -> DataFrame:
        """True link distance from the SEED pages over the recorded
        edges (record_edges=True): (url_hash, dist, discovery_depth).
        discovery_depth is the frontier's crawl-order depth — the gap
        between the two measures how much politeness budgets delay
        deep pages (dist <= discovery_depth always; equality means the
        crawl found each page along a shortest path)."""
        from crawler_spark.operators.graph import bfs_levels

        frontier = self.io.read(self.spark, "frontier")
        seeds = frontier.filter(F.col("depth") == 0).select(
            F.col("url_hash").alias("node")
        )
        levels = bfs_levels(
            self.link_edges(),
            seeds,
            max_depth=max_depth,
            src_col="src_hash",
            dst_col="dst_hash",
        )
        return levels.join(
            frontier.select(
                F.col("url_hash").alias("node"), F.col("depth").alias("discovery_depth")
            ),
            "node",
            "left",
        ).select(F.col("node").alias("url_hash"), "dist", "discovery_depth")

    def host_graph(self) -> DataFrame:
        """The crawl's HOST-level link graph (record_edges=True):
        distinct (src_host, dst_host) pairs with n_links = how many
        distinct page-level edges they aggregate, self-links dropped.
        Host mapping comes from the frontier base (url_hash -> host
        covers every recorded endpoint; at 10^10 URLs both joins
        co-locate on the url_hash bucketing)."""
        hosts = self.io.read(self.spark, "frontier").select("url_hash", "host")
        e = self.link_edges().select("src_hash", "dst_hash").distinct()
        return (
            e.join(hosts.withColumnRenamed("url_hash", "src_hash"), "src_hash")
            .withColumnRenamed("host", "src_host")
            .join(
                hosts.withColumnRenamed("url_hash", "dst_hash").withColumnRenamed(
                    "host", "dst_host"
                ),
                "dst_hash",
            )
            .filter(F.col("src_host") != F.col("dst_host"))
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links"))
        )

    def host_rank(self, iters: int = 5, **kwargs) -> DataFrame:
        """Integer-arithmetic PageRank over the HOST graph — per-host
        authority. The capacity loop: feed straight into
        scheduler.apportion_budget + set_host_budgets so the next
        round's fetch capacity follows where the web points
        (`apportion_budget(eng.host_rank().withColumnRenamed('node',
        'host'), total)` — rescale score_e6 DIV 1000 first if total is
        large; see apportion_budget's int64 note)."""
        from crawler_spark.operators.graph import pagerank

        return pagerank(
            self.host_graph(),
            iters=iters,
            src_col="src_host",
            dst_col="dst_host",
            **kwargs,
        )

    def pagerank(self, iters: int = 5, **kwargs) -> DataFrame:
        """Integer-arithmetic PageRank over the crawled link graph
        (partitioning-invariant scores; see operators/graph.py)."""
        from crawler_spark.operators.graph import pagerank

        return pagerank(
            self.link_edges(), iters=iters, src_col="src_hash", dst_col="dst_hash", **kwargs
        )

    def hits(self, iters: int = 5, **kwargs) -> DataFrame:
        """Integer-arithmetic HITS hubs/authorities over the crawled
        link graph (record_edges=True): authorities feed recrawl/score
        priorities like pagerank; hubs surface index/portal pages worth
        re-visiting for link discovery (operators/graph.py::hits)."""
        from crawler_spark.operators.graph import hits

        return hits(
            self.link_edges(), iters=iters, src_col="src_hash", dst_col="dst_hash", **kwargs
        )

    # ------------------------------------------------ change-rate recrawl
    def fetch_history(self) -> DataFrame:
        """Per-URL observation history from the fetch_fingerprints table
        (track_changes=True): one row per successful fetch with
        `changed` = content hash differs from the SAME URL's previous
        fetch (first observation: 0 — seeing a page is not evidence it
        changes). Window is partitioned by url_hash (millions of small
        groups — scales), ordered by round."""
        fp = self.io.read(self.spark, "fetch_fingerprints")
        w = Window.partitionBy("url_hash").orderBy("round")
        prev = F.lag("content_hash").over(w)
        return fp.select(
            "url_hash",
            "url",
            "site",
            "host",
            "round",
            (prev.isNotNull() & (F.col("content_hash") != prev))
            .cast("long")
            .alias("changed"),
        )

    def recrawl_scores(self, budget: int | None = None) -> DataFrame:
        """Freshness priorities over the recorded fetch history: Laplace-
        smoothed Poisson change rate x staleness (rounds as the clock),
        int64-exact (scheduler.recrawl_priorities). Feed the result to
        schedule_recrawl() — or its priority_e6 column to
        set_priority_scores() — to close the incremental-crawl loop
        (Cho & Garcia-Molina recrawl policy; the reference only refetches
        on lifecycle events, crawler.py:197-277)."""
        from crawler_spark.operators.scheduler import recrawl_priorities

        return recrawl_priorities(
            self.fetch_history(),
            budget=budget,
            ts_col="round",
            extra_keys=("url_hash",),  # so the result feeds schedule_recrawl directly
        )

    def schedule_recrawl(self, targets: DataFrame) -> int:
        """Re-enqueue fetched URLs for refetch — ONE atomic commit:

        - their `seen` rows are removed (so J1 dedup admits them again)
          with filter maintenance folded in (bloom rebuild / cuckoo
          targeted delete — the seen-removal invariant);
        - their documents / doc_signatures / media_signatures rows are
          removed (the refetch rewrites them; the incremental-index ==
          batch invariant survives);
        - their records rows are removed, and entity keys that existed
          ONLY on those pages leave entity_seen, so the refetch
          re-extracts and re-records them (same only-from-removed-pages
          rule as refresh_sitemaps' embeddings prune); keys shared with
          surviving pages stay seen. Embeddings history is kept — keyed
          by entity, re-embedding only happens for genuinely new keys;
        - a PENDING state delta re-opens each URL in the frontier view
          (latest-wins merge; at equal round the lexicographic state
          tie-break 'pending' > 'fetched'/'error' resolves in the
          recrawl's favor — deleted still wins via state_prio).

        fetch_fingerprints is NOT touched: it is the append-only
        observation history the change-rate estimator lags over.

        targets: any DataFrame with a url_hash column (typically the
        head of recrawl_scores()). Returns the number of URLs
        re-enqueued. The next run_round() refetches them under the
        normal gates/politeness/priority machinery.
        """
        return self._recrawl_commit(targets.select("url_hash").distinct())

    def _recrawl_commit(
        self, keys: DataFrame, extra_appends: dict[str, DataFrame] | None = None
    ) -> int:
        """The one-commit recrawl cascade behind schedule_recrawl, with
        an extra_appends hook so revalidate() can fold its fingerprint
        observations + fetch_log lines into the SAME atomic commit (no
        crash window between 'evidence recorded' and 're-enqueued')."""
        spark, io = self.spark, self.io
        extra = {
            k: self._w(v) for k, v in (extra_appends or {}).items()
        }
        seen = io.read(spark, "seen")
        gone = seen.join(keys, "url_hash", "left_semi").cache()
        n = gone.count()
        if n == 0:
            gone.unpersist()
            if extra:
                io.commit(io.last_round(), appends=extra)
            return 0
        kept = seen.join(keys, "url_hash", "left_anti")
        doc_keys = keys.withColumnRenamed("url_hash", "doc_id")
        gone_urls = gone.select("url")
        records = io.read(spark, "records")
        rec_gone = records.join(gone_urls, "url", "left_semi")
        rec_kept = records.join(gone_urls, "url", "left_anti")
        ekey = lambda df: df.select("site", "entity_key").distinct()  # noqa: E731
        keys_gone_only = ekey(rec_gone).join(
            ekey(rec_kept), ["site", "entity_key"], "left_anti"
        )
        overwrites = {
            "seen": kept,
            "documents": io.read(spark, "documents").join(
                doc_keys, "doc_id", "left_anti"
            ),
            "doc_signatures": io.read(spark, "doc_signatures").join(
                doc_keys, "doc_id", "left_anti"
            ),
            "media_signatures": io.read(spark, "media_signatures").join(
                doc_keys, "doc_id", "left_anti"
            ),
            "page_vectors": io.read(spark, "page_vectors").join(
                doc_keys, "doc_id", "left_anti"
            ),
            "postings": io.read(spark, "postings").join(
                doc_keys, "doc_id", "left_anti"
            ),
            "records": rec_kept,
            "entity_seen": io.read(spark, "entity_seen").join(
                keys_gone_only, ["site", "entity_key"], "left_anti"
            ),
        }
        overwrites = {k: self._w(v) for k, v in overwrites.items()}
        overwrites.update(self._filter_overwrites_after_removal(gone, kept))
        rnd = max(io.last_round(), 0)
        pend = (
            io.read(spark, "frontier")
            .join(keys, "url_hash", "left_semi")
            .select(
                "url_hash",
                F.lit(S.PENDING).alias("state"),
                F.lit(rnd).cast("int").alias("round"),
            )
        )
        appends = {"frontier_state": self._w(pend)}
        appends.update(extra)
        io.commit(
            io.last_round(),
            appends=appends,
            overwrites=overwrites,
        )
        gone.unpersist()
        return n

    def revalidate(
        self,
        world: dict[str, DataFrame] | None = None,
        targets: DataFrame | None = None,
        transport=None,
        min_delay_s: float = 0.0,
    ) -> dict:
        """Conditional-GET recrawl (HTTP 304 semantics): probe the
        freshest stored fingerprint of each target URL against the
        current web and touch state ONLY where the content changed.

        For every target (default: every URL with a recorded
        fingerprint; pass `targets` — any DataFrame with url_hash,
        e.g. the head of recrawl_scores() — to bound the probe set):

        - unchanged (304, or 200 with an equal span-sequence hash):
          append ONE fetch_fingerprints observation (the changed=0
          evidence recrawl_priorities' change-rate estimator needs) and
          a fetch_log(304) line. Documents / records / indexes / seen
          are untouched — zero churn, unlike schedule_recrawl's blind
          cascade.
        - changed (200, different hash): re-enqueue through the
          one-commit recrawl cascade; the next run_round() refetches
          under the normal gates/politeness/priority machinery and
          records the new fingerprint (changed=1 via fetch_history's
          lag).
        - error (404/timeout/5xx): fetch_log line only — an error is
          not change evidence; vanishing is lifecycle's business
          (refresh_sitemaps / delete_site).

        Everything lands in ONE atomic commit (the unchanged-side
        appends ride _recrawl_commit's cascade commit), so a kill
        leaves either the full revalidation pass or none of it.

        Paused/deleted sites are skipped (P5/P6 parity at the current
        round) via the fixture control windows + the engine's lifecycle
        flags — a paused site receives no probe traffic.

        In-sandbox, pass `world` (the synthetic-web edition to probe).
        On a cluster, pass `transport(url, etag) -> (status, spans)`
        (revalidate.conditional_urllib_transport sends If-None-Match
        and maps HTTP 304; min_delay_s paces same-host probes).

        Returns {"targets", "unchanged", "changed", "errors"}.
        """
        if not self.track_changes:
            raise ValueError("revalidate() requires CrawlEngine(track_changes=True)")
        if (world is None) == (transport is None):
            raise ValueError("pass exactly one of world= or transport=")
        from crawler_spark.operators import revalidate as RV
        from crawler_spark.operators.scheduler import control_flags

        spark, io = self.spark, self.io
        rnd = max(io.last_round(), 0)
        latest = RV.latest_fingerprints(io.read(spark, "fetch_fingerprints"))
        if targets is not None:
            latest = latest.join(
                targets.select("url_hash").distinct(), "url_hash", "left_semi"
            )
        flags = io.read(spark, "engine_control").select("site", "paused", "deleted")
        if world is not None and "control" in world:
            flags = flags.unionByName(
                control_flags(world["control"], rnd).select(
                    "site", "paused", "deleted"
                )
            )
        blocked = (
            flags.groupBy("site")
            .agg(F.max("paused").alias("p"), F.max("deleted").alias("d"))
            .filter(F.col("p") | F.col("d"))
            .select("site")
        )
        latest = latest.join(F.broadcast(blocked), "site", "left_anti")

        if transport is not None:
            observed = RV.observe_via_http(latest, transport, min_delay_s=min_delay_s)
        else:
            observed = RV.observe_simulated(latest, world["web"])
        decided = RV.decide(latest, observed).cache()
        try:
            counts = {
                r["changed"]: r["n"]
                for r in decided.groupBy("changed")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            unchanged = decided.filter(F.col("changed") == 0)
            fp_rows = unchanged.select(
                "url_hash",
                "url",
                "site",
                "host",
                F.lit(rnd).cast("int").alias("round"),
                F.col("prev_hash").alias("content_hash"),
            )
            log_rows = decided.select(
                F.lit(rnd).cast("int").alias("round"),
                "url",
                F.when(F.col("changed") == 0, F.lit(RV.NOT_MODIFIED))
                .otherwise(F.col("status"))
                .cast("int")
                .alias("status"),
                F.when(F.col("changed") == 1, F.col("bytes"))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("bytes"),
            )
            changed_keys = decided.filter(F.col("changed") == 1).select("url_hash")
            n_changed = self._recrawl_commit(
                changed_keys,
                extra_appends={
                    "fetch_fingerprints": fp_rows,
                    "fetch_log": log_rows,
                },
            )
        finally:
            decided.unpersist()
        return {
            "targets": sum(counts.values()),
            "unchanged": counts.get(0, 0),
            "changed": n_changed,
            "errors": counts.get(None, 0),
        }

    # ---------------------------------------------------- quality feedback
    def doc_quality(self) -> DataFrame:
        """Per-crawled-page curation metrics from the committed
        documents table: (url_hash, site, n_words, logit) where logit
        is the exact-integer linear-classifier score of the page's
        visible text (text-kind spans, functions/text.py::hash_logit; a
        trained model swaps in via classifier_score(weights=...)).

        Feed straight into set_priority_scores for a quality-first
        recrawl loop — the classifier analog of the PageRank loop:

            q = eng.doc_quality().select("url_hash", "logit")
            eng2 = CrawlEngine(..., priority="score")
            eng2.set_priority_scores(q, id_col="url_hash", score_col="logit")

        Scale shape: per-row expressions over the documents scan — zero
        exchanges here; the consumer pays one agg or join.
        """
        from crawler_spark.functions.text import WS_RE, hash_logit
        from crawler_spark.operators.textdedup import doc_text

        words = F.filter(
            F.split(F.trim(F.lower(doc_text())), WS_RE), lambda x: x != ""
        )
        return self.io.read(self.spark, "documents").select(
            F.col("doc_id").alias("url_hash"),
            "site",
            F.size(words).cast("long").alias("n_words"),
            hash_logit(words).alias("logit"),
        )

    def pii_report(self) -> DataFrame:
        """Per-site PII exposure from the committed documents' visible
        text: one row per site with per-category match counts plus the
        number of affected pages — the signal for gating uploads or
        routing a site's pages through redact_pii before the vector
        sink. Pure per-row regexp counts + one site agg exchange.
        """
        from crawler_spark.functions.pii import PII_PATTERNS, pii_profile
        from crawler_spark.operators.textdedup import doc_text

        flat = self.io.read(self.spark, "documents").select(
            F.col("doc_id"), F.col("site"), doc_text().alias("text")
        )
        prof = pii_profile(flat, extra_cols=("site",))
        return prof.groupBy("site").agg(
            F.count("*").alias("n_docs"),
            *[F.sum(f"n_{name}").alias(f"n_{name}") for name in PII_PATTERNS],
            F.sum("n_pii_total").alias("n_pii_total"),
            F.sum(F.col("has_pii").cast("long")).alias("n_docs_with_pii"),
        )

    def site_quality(self) -> DataFrame:
        """Per-site quality aggregates (exact integers — deterministic
        under any partitioning): the feedback signal for C4/Gopher-style
        source-level curation of the crawl itself."""
        return self.doc_quality().groupBy("site").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("logit").alias("total_logit"),
            F.sum((F.col("logit") > 0).cast("long")).alias("n_pos_docs"),
        )

    def _page_vector_rows(self, docs: DataFrame) -> DataFrame:
        """documents rows -> PAGE_VECTORS rows (the ONE home of the
        page-embedding -> quantize -> bucket derivation, so the
        incremental index and a batch recompute agree by construction).
        Per-row expressions only — zero exchanges."""
        from crawler_spark.operators.ann import quantize_vec, sign_lsh_bucket
        from crawler_spark.operators.textdedup import doc_text

        emb = self._embed_col(doc_text())
        qv = quantize_vec(emb, F.lit(self.vector_scale))
        return docs.select(
            "doc_id",
            "site",
            F.col("fetched_round").alias("round"),
            qv.alias("qv"),
            sign_lsh_bucket(qv, min(8, self.embed_dim)).alias("bucket"),
        )

    def _posting_rows(self, docs: DataFrame) -> DataFrame:
        """documents rows -> POSTINGS rows: the ONE home of the
        visible-text -> inverted-index derivation (doc_id, site, round,
        tok, tf, dl) so the incremental index and a batch recompute
        agree by construction. One exchange over the round's fetched
        delta."""
        from crawler_spark.operators.retrieval import corpus_postings
        from crawler_spark.operators.textdedup import doc_text

        base = docs.select(
            "doc_id",
            "site",
            F.col("fetched_round").alias("round"),
            doc_text().alias("text"),
        )
        return corpus_postings(base, keep_cols=("site", "round")).select(
            "doc_id", "site", "round", "tok", "tf", "dl"
        )

    def rebuild_postings(self) -> DataFrame:
        """Batch recompute of the inverted index from the committed
        documents — the incremental table must equal this exactly
        (pinned in tests/test_lexical_index.py)."""
        return self._posting_rows(self.io.read(self.spark, "documents"))

    def search_lexical_indexed(
        self, queries: DataFrame, k: int = 10, exact: bool = True
    ) -> DataFrame:
        """BM25 over the incremental postings index: tokenize + (doc,
        token) aggregation were paid at fetch time, so query time is
        join-only (broadcast query vocabulary semi-join + two tiny
        aggs) — identical results to search_lexical BY CONSTRUCTION
        (both paths end in retrieval._rank_postings). At 10^10 pages
        store the index clustered by token for a partition-pruned
        probe. Returns (query_id, doc_id, score_e9|score, rank)."""
        from crawler_spark.operators.retrieval import bm25_from_postings

        return bm25_from_postings(
            self.io.read(self.spark, "postings"), queries, k=k, exact=exact
        )

    def rebuild_page_vectors(self) -> DataFrame:
        """Batch recompute of the index from the committed documents —
        the incremental table must equal this exactly (pinned in
        tests); also the migration path when embed_dim/scale change."""
        return self._page_vector_rows(self.io.read(self.spark, "documents"))

    def search_semantic_indexed(self, queries: DataFrame, k: int = 10) -> DataFrame:
        """ANN over the incremental page_vectors index: the query text
        is embedded and quantized with the SAME fixed scale, search is
        pruned to the query's sign-LSH bucket and ranked by exact int64
        inner product — join-only at query time (no corpus-wide
        embedding job, unlike search_semantic). At 10^10 pages the
        index is stored clustered by bucket, so the probe is a
        partition-pruned scan. Returns (query_id, rank, neighbor_id,
        iscore)."""
        from crawler_spark.operators.ann import quantize_vec, sign_lsh_bucket
        from pyspark.sql import Window

        qv = quantize_vec(
            self._embed_col(F.col("qtext")),
            F.lit(self.vector_scale),
        )
        q = queries.select(
            "query_id",
            qv.alias("qa"),
            sign_lsh_bucket(qv, min(8, self.embed_dim)).alias("bucket"),
        )
        idx = self.io.read(self.spark, "page_vectors")
        scored = idx.join(F.broadcast(q), "bucket").withColumn(
            "iscore",
            F.aggregate(
                F.zip_with(F.col("qa"), F.col("qv"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("iscore"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "rank",
                F.col("doc_id").alias("neighbor_id"),
                "iscore",
            )
        )

    def _page_corpus(self) -> DataFrame:
        """Committed pages as (doc_id, url, site, text): the visible
        text-kind span stream, the same unit doc_quality scores."""
        from crawler_spark.operators.textdedup import doc_text

        return self.io.read(self.spark, "documents").select(
            "doc_id", "url", "site", doc_text().alias("text")
        )

    def search_lexical(self, queries: DataFrame, k: int = 10) -> DataFrame:
        """BM25 top-k over the committed pages' visible text — the
        lexical half of the serving story the reference delegates to
        its vector-store consumers (crawler.py upload path): search the
        crawl WITHOUT leaving Spark. queries: (query_id, qtext), tiny,
        broadcast throughout (operators/retrieval.py plan: the corpus
        explodes map-side against the query vocabulary and never
        self-joins). Returns (query_id, doc_id, score_e9, rank) with
        doc_id = page url_hash."""
        from crawler_spark.operators.retrieval import bm25_topk

        return bm25_topk(self._page_corpus(), queries, k=k, id_col="doc_id")

    def search_semantic(self, queries: DataFrame, k: int = 10) -> DataFrame:
        """Embedding cosine top-k over the committed pages: page
        vectors AND query vectors come from the same embedder
        (downstream.hash_embedding stub at self.embed_dim — a real
        model drops in as the same-shaped Arrow pandas_udf), so
        identical text retrieves at cosine 1.0. queries: (query_id,
        qtext). Returns (query_id, rank, neighbor_id, score) with
        neighbor_id = page url_hash. Scale path: persist the page
        vectors and switch to lsh_bucketed_topk/ivf_topk — this method
        is the exact re-rank baseline."""
        from crawler_spark.operators.ann import brute_force_topk

        corpus = self._page_corpus().select(
            F.col("doc_id").alias("vec_id"),
            self._embed_col(F.col("text")).alias("embedding"),
        )
        qv = queries.select(
            "query_id",
            self._embed_col(F.col("qtext")).alias("qv"),
        )
        return brute_force_topk(corpus, k=k, queries=qv)

    def search_hybrid(self, queries: DataFrame, k: int = 10, k0: int = 60) -> DataFrame:
        """Hybrid search over the crawl: BM25 + embedding-cosine top-k
        fused with exact-int64 reciprocal-rank fusion (rrf_fuse). The
        fusion unions two |queries|x k lists — no extra corpus pass."""
        from crawler_spark.operators.retrieval import rrf_fuse

        lex = self.search_lexical(queries, k=k).select("query_id", "doc_id", "rank")
        sem = self.search_semantic(queries, k=k).select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
        )
        return rrf_fuse([lex, sem], k=k, k0=k0)

    def search_hybrid_indexed(
        self, queries: DataFrame, k: int = 10, k0: int = 60
    ) -> DataFrame:
        """Hybrid search entirely from the incremental indexes
        (lexical_index=True + vector_index=True): join-only BM25 over
        the postings table fused with bucket-pruned int8 ANN over
        page_vectors — serving-path latency with ZERO corpus passes at
        query time. Candidate lists differ from the ad-hoc pair only
        where the ANN bucket pruning differs (BM25 side is identical by
        construction)."""
        from crawler_spark.operators.retrieval import rrf_fuse

        lex = self.search_lexical_indexed(queries, k=k).select(
            "query_id", "doc_id", "rank"
        )
        sem = self.search_semantic_indexed(queries, k=k).select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
        )
        return rrf_fuse([lex, sem], k=k, k0=k0)

    def training_export(
        self,
        capacity: int = 2048,
        media_tokens: int = 16,
        min_words: int = 30,
        max_dup_2gram: float = 0.3,
        min_logit: int = 1,
        langs: tuple[str, ...] | None = None,
        require_lang: bool = True,
        sep_tokens: int = 1,
        boilerplate_min_df: int | None = None,
        tokenizer_merges: list[dict] | None = None,
    ) -> DataFrame:
        """Crawl -> training corpus in one call: curate the committed
        interleaved documents (PII redaction, Gopher word/repetition
        gates, linear-classifier gate, optional language allowlist,
        exact-dup collapse) and pack the survivors into fixed
        `capacity`-token context windows — the complete path from "the
        crawler fetched pages" to "a multimodal LM packing writer can
        emit sequences". The reference stops at uploading raw pages
        (crawler.py:1040-1120); this is the training-data half the
        north rule's interleaved payload exists for.

        Interleaved packing: a doc's token budget = visible-text words
        + `media_tokens` placeholder tokens per media span (the
        standard interleaved-LM recipe — each image/audio ref occupies
        a fixed patch-token budget in the stream). media_refs ride
        through so the writer can substitute real encoder tokens.

        Output: one row per KEPT document — url_hash, site, url,
        n_words, n_media, media_refs, logit, pred_lang, n_copies (how
        many exact dups it canonicalizes), n_tokens, start_offset,
        end_offset, first_bin, last_bin, n_bins. Windows are dense
        0..ceil(total/capacity)-1 in url_hash order.

        Scale shape: one documents scan with every per-doc metric in a
        single Generate-barriered projection (full_curation's pushdown
        lesson, functions/text.py:163), gates applied map-side, ONE
        fingerprint exchange for the dup collapse, then the two-phase
        prefix-sum pack (range shuffle + broadcast offsets — no
        single-partition window). No joins against the corpus.
        """
        from crawler_spark.functions.pii import redact_expr
        from crawler_spark.functions.text import (
            WS_RE,
            _collapse_exact_dups,
            _word_ngrams,
            hash_logit,
            pack_sequences,
            predict_lang,
            fingerprint,
        )
        from crawler_spark.operators.textdedup import doc_text

        d = self.io.read(self.spark, "documents")
        if boilerplate_min_df is not None:
            # cross-page repeated text spans (site nav, footers) are
            # stripped BEFORE visible text / metrics are derived, so
            # word counts, fingerprints and packing budgets all see the
            # cleaned stream (operators/spans.py; adds one fingerprint
            # exchange + a broadcast anti-join + the re-assembly join)
            from crawler_spark.operators.spans import strip_boilerplate_spans

            d = strip_boilerplate_spans(
                d.select("doc_id", "spans", "site", "url"),
                min_df=boilerplate_min_df,
                keep_cols=("site", "url"),
            )
        # media spans have media_ref set; text/meta spans carry NULL or
        # '' depending on the writer — treat both as "no ref"
        media_refs = F.transform(
            F.filter(
                F.col("spans"),
                lambda s: s["media_ref"].isNotNull()
                & (s["media_ref"] != F.lit("")),
            ),
            lambda s: s["media_ref"],
        )
        staged = d.select(
            F.col("doc_id").alias("url_hash"),
            "site",
            "url",
            redact_expr(doc_text()).alias("red_text"),
            media_refs.alias("media_refs"),
        )
        words = F.filter(
            F.split(F.trim(F.lower(F.col("red_text"))), WS_RE),
            lambda x: x != "",
        )
        staged = staged.withColumn("w", words).withColumn(
            "g2", _word_ngrams(F.col("w"), 2)
        )
        t2 = F.size("g2")
        dup2 = F.when(
            t2 > 0,
            (t2 - F.size(F.array_distinct("g2"))).cast("double")
            / t2.cast("double"),
        ).otherwise(F.lit(0.0))
        # Generate barrier: keeps the gate filter above the staged
        # projections (see full_curation's measured O(words^2) blowup)
        metrics = F.explode(
            F.array(
                F.struct(
                    F.size("w").cast("long").alias("n_words"),
                    dup2.alias("dup_2gram_frac"),
                    hash_logit(F.col("w")).alias("logit"),
                    predict_lang(F.col("red_text")).alias("pred_lang"),
                    fingerprint(F.col("red_text")).alias("fingerprint"),
                )
            )
        )
        prof = staged.select(
            "url_hash", "site", "url", "media_refs", metrics.alias("m")
        ).select(
            "url_hash",
            "site",
            "url",
            "media_refs",
            F.size("media_refs").cast("long").alias("n_media"),
            "m.*",
        )
        gate = (
            (F.col("n_words") >= min_words)
            & (F.col("dup_2gram_frac") <= max_dup_2gram)
            & (F.col("logit") >= min_logit)
        )
        if require_lang:
            # full_curation's default: drop language-undetermined docs
            # (require_lang=False keeps them — e.g. code/synthetic
            # corpora the marker lists can't identify)
            gate = gate & (F.col("pred_lang") != "und")
        if langs is not None:
            gate = gate & F.col("pred_lang").isin(*langs)
        kept = prof.filter(gate).withColumnRenamed("url_hash", "doc_id")
        canon = _collapse_exact_dups(
            kept,
            ["site", "url", "n_words", "logit", "pred_lang", "n_media",
             "media_refs"],
        ).withColumnRenamed("doc_id", "url_hash")
        if tokenizer_merges is not None:
            # pack by REAL subword token counts (train_tokenizer /
            # operators/bpe.py) instead of the whitespace-word proxy:
            # one tokenize pass over the redacted visible text (corpus
            # explodes map-side, vocab joins back broadcast), one
            # per-doc agg exchange, then a co-keyed join onto the kept
            # canon rows. Text budget becomes the exact token count the
            # packing writer will emit.
            from crawler_spark.operators.bpe import bpe_encode

            tok = (
                bpe_encode(
                    staged,
                    tokenizer_merges,
                    text_col="red_text",
                    id_col="url_hash",
                )
                .groupBy(F.col("doc_id").alias("url_hash"))
                .agg(F.sum("n_tokens").alias("n_text_tokens"))
            )
            canon = canon.join(tok, "url_hash", "left").withColumn(
                "n_text_tokens",
                F.coalesce(F.col("n_text_tokens"), F.lit(0)).cast("long"),
            )
            text_budget = F.col("n_text_tokens")
        else:
            text_budget = F.col("n_words")
        budget = (
            text_budget + F.lit(int(media_tokens)) * F.col("n_media")
        ).alias("token_budget")
        canon = canon.withColumn("token_budget", budget)
        keep = ("site", "url", "n_words", "n_media", "media_refs",
                "logit", "pred_lang", "n_copies")
        if tokenizer_merges is not None:
            keep = keep + ("n_text_tokens",)
        return pack_sequences(
            canon,
            capacity=capacity,
            id_col="url_hash",
            sep_tokens=sep_tokens,
            tokens_col="token_budget",
            keep_cols=keep,
        )

    def mine_captions(
        self,
        quality: bool = False,
        min_words: int = 3,
        max_words: int = 256,
        min_alpha_e6: int = 500_000,
        dedup_media: bool = False,
        max_hamming: int = 3,
    ) -> DataFrame:
        """Image-text pairs from the committed crawl: each media span of
        every fetched page paired with its nearest non-empty text span
        (operators/spans.py::caption_pairs — zero exchanges, one
        documents scan). quality=True applies the word-count/alpha
        caption gate. The multimodal-training counterpart of
        training_export: where that packs interleaved streams, this
        emits (page, media_ref, caption) rows for contrastive
        image-text training sets (the reference's crawl stores media
        markdown links inline and never pairs them,
        crawler.py:1040-1120).

        dedup_media=True (requires dedup_index=True at crawl time)
        drops captions whose media payload is a pHash near-dup of
        another ref, keeping only each cluster's canonical member
        (min media_ref) — one caption set per distinct image, the
        LAION-style dedup-before-pairing step. Join-only over the
        incremental index: cluster members are the small side of a
        left_anti (bounded by the duplicated-media count)."""
        from crawler_spark.operators.spans import (
            caption_pairs,
            caption_quality_gate,
        )

        pairs = caption_pairs(
            self.io.read(self.spark, "documents").select("doc_id", "spans")
        )
        if dedup_media:
            cl = self.media_clusters(max_hamming=max_hamming)
            reps = cl.groupBy("cluster_id").agg(
                F.min("media_ref").alias("media_ref")
            )
            losers = cl.join(reps, "media_ref", "left_anti").select("media_ref")
            pairs = pairs.join(losers, "media_ref", "left_anti")
        if quality:
            pairs = caption_quality_gate(
                pairs,
                min_words=min_words,
                max_words=max_words,
                min_alpha_e6=min_alpha_e6,
            )
        return pairs

    def train_tokenizer(
        self, n_merges: int = 50, min_pair_count: int = 2
    ) -> list[dict]:
        """Fit a BPE subword vocabulary ON the crawl (operators/bpe.py):
        the tokenizer-fitting job a training pipeline runs over its own
        corpus before packing. Trains on the committed pages' visible
        text; returns the ordered merge list (persist via
        bpe.merges_df, encode any table via bpe.bpe_encode)."""
        from crawler_spark.operators.bpe import train_bpe

        return train_bpe(
            self._page_corpus(),
            n_merges=n_merges,
            min_pair_count=min_pair_count,
        )

    def train_quality_classifier(
        self, n_iters: int = 10, min_words: int = 5, max_dup_2gram: float = 0.3
    ) -> DataFrame:
        """Distill the rule gates into a learned model (the
        FineWeb/DCLM recipe): label every committed page +1/-1 by the
        Gopher word-count + repetition gates, train the exact-integer
        batch perceptron on the pages' visible text, and return the
        (tok, weight) table — which drops directly into
        classifier_score(weights=...), doc_quality-style scoring, and
        pause_low_quality_sites. Training is bit-deterministic under
        any partitioning (operators/classifier.py)."""
        from crawler_spark.functions.text import WS_RE, _word_ngrams
        from crawler_spark.operators.classifier import train_perceptron

        d = self._page_corpus()
        words = F.filter(
            F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), WS_RE),
            lambda x: x != "",
        )
        g2 = _word_ngrams(words, 2)
        t2 = F.size(g2)
        dup2 = F.when(
            t2 > 0,
            (t2 - F.size(F.array_distinct(g2))).cast("double") / t2.cast("double"),
        ).otherwise(F.lit(0.0))
        labeled = d.select(
            "doc_id",
            "text",
            F.when(
                (F.size(words) >= min_words) & (dup2 <= max_dup_2gram), 1
            )
            .otherwise(-1)
            .cast("long")
            .alias("y"),
        )
        return train_perceptron(labeled, "y", n_iters=n_iters)

    def pause_low_quality_sites(self, min_mean_logit: float = 0.0) -> list[str]:
        """Quality-driven source filtering wired into the control
        plane: pause every site whose mean per-document logit is below
        the threshold (paused sites stay pending and resume_site
        reverses the decision — pausing, not deleting, is the
        reference's own soft-block semantic, app.py:497-503).

        One atomic control commit for the whole batch. Site count is a
        dim (collect is fine); returns the paused sites sorted.
        """
        bad = sorted(
            r["site"]
            for r in self.site_quality()
            .filter(
                F.col("total_logit").cast("double")
                / F.col("n_docs").cast("double")
                < F.lit(float(min_mean_logit))
            )
            .select("site")
            .collect()
        )
        if bad:
            self._write_control(bad, paused=True)
        return bad

    def trap_report(self, exact: bool = True, **thresholds) -> DataFrame:
        """Crawler-trap verdicts per (host, site) over the FULL frontier
        base (pending + fetched: the URL SPACE a host exposed, which is
        exactly what a trap inflates). One groupBy(host, site) shuffle;
        see operators/traps.py for signals and thresholds."""
        from crawler_spark.operators.traps import host_trap_profile, trap_hosts

        prof = host_trap_profile(
            self.io.read(self.spark, "frontier"),
            exact=exact,
            extra_keys=("site",),
        )
        return trap_hosts(prof, **thresholds)

    def pause_trap_sites(self, exact: bool = True, **thresholds) -> list[str]:
        """Pause every site at least one of whose hosts trips the trap
        verdict — the frontier-shape analog of quality-driven pausing
        (same soft-block semantic: pending URLs stay, resume_site
        reverses). One atomic control commit; returns sites sorted."""
        bad = sorted(
            r["site"]
            for r in self.trap_report(exact=exact, **thresholds)
            .filter("is_trap")
            .select("site")
            .distinct()
            .collect()
        )
        if bad:
            self._write_control(bad, paused=True)
        return bad

    def maintain(self, max_paths: int = 32) -> None:
        """Snapshot maintenance (Iceberg rewrite_data_files analog):
        compact append tables whose delta-path lists grew past
        max_paths, so reads stay O(files) instead of O(rounds).

        The frontier pair compacts together: fold the state deltas into
        the base (one MERGE-shaped rewrite, amortized over max_paths
        rounds) and clear the delta chain. host_state collapses to its
        latest-wins view."""
        for name in (
            "seen",
            "documents",
            "doc_signatures",
            "media_signatures",
            "page_vectors",
            "postings",
            "fetch_fingerprints",
            "edges",
            "anchors",
            "records",
            "entity_seen",
            "fetch_log",
        ):
            if len(self.io.table_paths(name)) > max_paths:
                self.io.compact(self.spark, name, self.io.last_round())
        if len(self.io.table_rels("frontier_state")) + len(
            self.io.table_rels("frontier")
        ) > max_paths:
            self.io.commit(
                self.io.last_round(),
                overwrites={
                    "frontier": self._w(read_frontier_view(self.spark, self.io)),
                    "frontier_state": self._empty("frontier_state"),
                },
            )
        if len(self.io.table_rels("host_state")) > max_paths:
            self.io.commit(
                self.io.last_round(),
                overwrites={
                    "host_state": self._w(read_host_state_view(self.spark, self.io))
                },
            )
        if len(self.io.table_rels("dup_cluster_state")) + len(
            self.io.table_rels("dup_clusters")
        ) > max_paths:
            self.io.commit(
                self.io.last_round(),
                overwrites={
                    "dup_clusters": self._w(
                        read_dup_clusters_view(self.spark, self.io)
                    ),
                    "dup_cluster_state": self._empty("dup_cluster_state"),
                },
            )
        if self.use_bloom:
            self.rebuild_saturated_blooms()
        elif self.use_cuckoo:
            self.rebuild_saturated_cuckoos()

    def rebuild_saturated_cuckoos(self, max_load: float = 0.84) -> int:
        """Cuckoo growth path: buckets past the safe load factor (or
        spilling to stash) are rebuilt from the exact seen set at double
        the observed capacity — the same maintenance shape as the Bloom
        saturation rebuild, needed only for GROWTH (deletes are native,
        see delete_from_cuckoos)."""
        spark, io = self.spark, self.io
        filters = io.read(spark, "seen_cuckoo")
        sat = {
            int(r.bucket): int(r.n_keys)
            for r in CK.saturated_cuckoo_buckets(filters, max_load).collect()
        }
        if not sat:
            return 0
        flagged = list(sat)
        seen_flagged = (
            io.read(spark, "seen")
            .withColumn("bucket", D.bucket_col("h64", self.bloom_buckets))
            .filter(F.col("bucket").isin(flagged))
            .drop("bucket")
        )
        rebuilt = CK.build_cuckoo(
            seen_flagged, self.bloom_buckets, expected_per_bucket=2 * max(sat.values())
        )
        keep = filters.filter(~F.col("bucket").isin(flagged))
        io.commit(
            io.last_round(),
            overwrites={"seen_cuckoo": self._w(keep.unionByName(rebuilt))},
        )
        return len(flagged)

    def rebuild_saturated_blooms(self, max_fill: float = 0.5) -> int:
        """Cuckoo-compaction analog (SURVEY.md §4 X4): buckets whose key
        count outgrew their sizing budget are rebuilt from the exact
        seen set at double the observed capacity, bounding fpp for the
        rest of the crawl (a saturated filter never returns wrong
        results — it only degrades the prefilter toward 'probe
        everything'). Returns the number of rebuilt buckets."""
        spark, io = self.spark, self.io
        blooms = io.read(spark, "seen_bloom")
        sat = {
            int(r.bucket): int(r.n_keys)
            for r in D.saturated_buckets(blooms, max_fill=max_fill).collect()
        }
        if not sat:
            return 0
        flagged = list(sat)
        seen_flagged = (
            io.read(spark, "seen")
            .withColumn("bucket", D.bucket_col("h64", self.bloom_buckets))
            .filter(F.col("bucket").isin(flagged))
            .drop("bucket")
        )
        rebuilt = D.build_bloom(
            seen_flagged,
            self.bloom_buckets,
            expected_per_bucket=2 * max(sat.values()),
        )
        keep = blooms.filter(~F.col("bucket").isin(flagged))
        io.commit(
            io.last_round(),
            overwrites={"seen_bloom": self._w(keep.unionByName(rebuilt))},
        )
        return len(flagged)

    # ------------------------------------------------------------- run loop
    def run(
        self,
        world: dict[str, DataFrame],
        max_rounds: int = 100,
        max_idle: int = 8,
        compact_every: int = 32,
    ) -> list[dict]:
        """Run rounds until the frontier drains (or goes idle past the
        longest possible backoff). Resume-safe: starts after the last
        committed round."""
        start = self.io.last_round() + 1
        history: list[dict] = []
        idle = 0
        # small dims: collect control once, keep the big web table hot
        self._control_rows = world["control"].collect()
        if self.fetch_transport is None:
            world["web"].cache()
        for rnd in range(max(1, start), max_rounds + 1):
            stats = self.run_round(rnd, world)
            history.append(stats)
            if compact_every and rnd % compact_every == 0:
                self.maintain()
            if stats["scheduled"] == 0:
                idle += 1
                if stats.get("pending", 0) == 0 or idle >= max_idle:
                    break
            else:
                idle = 0
        return history
