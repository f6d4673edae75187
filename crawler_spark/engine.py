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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark import schemas as S
from crawler_spark.functions.urls import with_url_keys
from crawler_spark.io.snapshot import ParquetSnapshotIO
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
    "frontier": S.FRONTIER,
    "seen": S.SEEN,
    "seen_bloom": D.BLOOM_SCHEMA,
    "documents": S.DOCUMENTS,
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
SITE_TABLES = ["seen", "documents", "records", "entity_seen", "embeddings", "uploaded"]


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        mode: str = "reference",
        n_salts: int = 8,
        use_bloom: bool = False,
        bloom_buckets: int = 16,
        bloom_expected_per_bucket: int = 100_000,
        follow_links: bool = True,
        n_lineage_buckets: int = 8,
        coalesce_writes: int | None = 1,
        embed_dim: int = 16,  # 0 disables the downstream pipeline
        priority: str = "fifo",  # scheduler PRIORITY_ORDERS key
        bucketed_io: int | None = None,  # n_buckets -> co-located frontier/seen
    ):
        self.spark = spark
        if bucketed_io:
            from crawler_spark.io.bucketed import BucketedSnapshotIO

            self.io: ParquetSnapshotIO = BucketedSnapshotIO(
                root, schemas=ENGINE_SCHEMAS, n_buckets=bucketed_io
            )
        else:
            self.io = ParquetSnapshotIO(root, schemas=ENGINE_SCHEMAS)
        self.mode = mode
        self.n_salts = n_salts
        self.use_bloom = use_bloom
        self.bloom_buckets = bloom_buckets
        self.bloom_expected = bloom_expected_per_bucket
        self.follow_links = follow_links
        self.n_lineage_buckets = n_lineage_buckets
        # per-round appends are tiny (≤ hosts × budget rows): coalesce to
        # 1 file so snapshot reads don't drown in small files. Set None
        # for large-scale runs where appends are wide.
        self.coalesce_writes = coalesce_writes
        self.embed_dim = embed_dim
        self.priority = priority

    def _w(self, df: DataFrame) -> DataFrame:
        return df.coalesce(self.coalesce_writes) if self.coalesce_writes else df

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
                F.min("url").alias("url"),
                F.first("h64").alias("h64"),
                F.min("site").alias("site"),
                F.min("host").alias("host"),
            )
            .select(
                "url",
                "url_hash",
                "h64",
                "site",
                "host",
                F.lit(0).alias("depth"),
                F.lit(0).alias("discovered_round"),
                F.lit(S.PENDING).alias("state"),
            )
        )
        self.io.commit(
            0,
            overwrites={
                "frontier": frontier,
                "host_state": self._empty("host_state"),
            },
            meta={"seq_total": 0, "mode": self.mode},
        )

    def _empty(self, name: str) -> DataFrame:
        return self.spark.createDataFrame([], ENGINE_SCHEMAS[name])

    # ------------------------------------------------------------- one round
    def run_round(self, rnd: int, world: dict[str, DataFrame]) -> dict:
        io, spark = self.io, self.spark
        frontier = io.read(spark, "frontier")
        seen = io.read(spark, "seen")
        entity_seen = io.read(spark, "entity_seen")
        host_state = io.read(spark, "host_state")

        eng_ctl = io.read(spark, "engine_control")
        cand = gate_candidates(
            frontier, world["control"], host_state, world["robots"], rnd,
            extra_flags=eng_ctl,
        )
        if self.use_bloom:
            # persistent per-bucket filters, incrementally maintained at
            # commit time — the seen table itself never shuffles here
            blooms = io.read(spark, "seen_bloom")
            deduped = D.bloom_prefilter(cand, blooms, seen, self.bloom_buckets)
        elif hasattr(io, "anti_join_seen"):
            # bucketed IO: chained co-located anti-joins, seen never shuffles
            deduped = io.anti_join_seen(spark, cand)
        else:
            deduped = D.exact_anti_join(cand, seen)

        seq_base = int(io.rows_meta("seq_total", 0))
        max_budget = getattr(self, "_max_budget", None)
        if max_budget is None:
            max_budget = (
                world["robots"].agg(F.max("crawl_budget")).collect()[0][0] or 1
            )
            self._max_budget = max_budget
        scheduled = schedule(
            deduped, rnd, seq_base, self.n_salts, max_budget=max_budget,
            priority=self.priority,
        )

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

        fetched = simulate_fetch(scheduled, world["web"], world["bursts"], rnd).cache()
        status_counts = {
            r.status: r["count"] for r in fetched.groupBy("status").count().collect()
        }
        n_sched = sum(status_counts.values())

        if n_sched == 0:
            overwrites = {}
            if newly_deleted:
                overwrites = {
                    k: self._w(v) for k, v in self._cascade_delete(newly_deleted, frontier).items()
                }
            io.commit(rnd, overwrites=overwrites, meta={"seq_total": seq_base})
            fetched.unpersist()
            pending = frontier.filter(F.col("state") == S.PENDING)
            if all_deleted:
                pending = pending.filter(~F.col("site").isin(list(all_deleted)))
            return {"round": rnd, "scheduled": 0, "pending": pending.count()}

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
                records, io.read(spark, "embeddings"), rnd, self.embed_dim
            )
            new_upl = select_for_upload(new_emb, io.read(spark, "uploaded"), rnd)

        # --- link discovery (engine extension; scoped to known hosts) ------
        if self.follow_links:
            hosts = world["robots"].select("host").distinct()
            links = (
                ok.select(F.explode("out_links").alias("url"), (F.col("depth") + 1).alias("depth"))
                .transform(lambda df: with_url_keys(df, mode=self.mode))
                .join(F.broadcast(hosts), "host", "left_semi")
                .groupBy("url_hash")
                .agg(
                    F.min(F.struct("depth", "url")).alias("du"),
                    F.first("h64").alias("h64"),
                    F.min("site").alias("site"),
                    F.min("host").alias("host"),
                )
                .select(
                    F.col("du.url").alias("url"),
                    "url_hash",
                    "h64",
                    "site",
                    "host",
                    F.col("du.depth").alias("depth"),
                    F.lit(rnd).alias("discovered_round"),
                    F.lit(S.PENDING).alias("state"),
                )
                .join(frontier.select("url_hash"), "url_hash", "left_anti")
                .select(*[f.name for f in S.FRONTIER.fields])
            )
        else:
            links = self._empty("frontier")
        links = links.cache()
        n_links = links.count()

        # --- frontier state transitions ------------------------------------
        updates = ok.select("url_hash", F.lit(S.FETCHED).alias("new_state")).unionByName(
            errs.select("url_hash", F.lit(S.ERROR).alias("new_state"))
        )
        frontier2 = (
            frontier.join(updates, "url_hash", "left")
            .withColumn("state", F.coalesce("new_state", "state"))
            .drop("new_state")
            .unionByName(links)
        )

        # --- host backoff state (O-SCHED4) ---------------------------------
        new_back = (
            f429.select("host")
            .distinct()
            .withColumn(
                "backoff_until_round",
                F.lit(rnd) + backoff_rounds_expr(F.col("host"), rnd),
            )
            .withColumn("last_round", F.lit(rnd))
        )
        host_state2 = host_state.join(new_back, "host", "left_anti").unionByName(new_back)

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
        overwrites = {"frontier": frontier2, "host_state": host_state2}
        if self.use_bloom:
            # OR the new seen keys into the bucket filters (no rebuild);
            # on a deletion round the filters are rebuilt from the exact
            # set instead (delete support = rebuild-from-truth)
            if newly_deleted:
                seen_after = self._cascade_delete(newly_deleted, frontier2)["seen"].unionByName(
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
        if newly_deleted:
            # cascade: for each site-keyed table, fold this round's append
            # into the filtered overwrite (an overwrite replaces the whole
            # path list, so the append must ride along or it would be lost)
            cascade = self._cascade_delete(newly_deleted, frontier2)
            for name in SITE_TABLES:
                overwrites[name] = cascade[name]
                this_round = appends.pop(name, None)
                if this_round is not None:
                    overwrites[name] = cascade[name].unionByName(
                        this_round.filter(~F.col("site").isin(newly_deleted))
                    )
            overwrites["frontier"] = cascade["frontier"]
        appends = {k: self._w(v) for k, v in appends.items()}
        overwrites = {k: self._w(v) for k, v in overwrites.items()}

        io.commit(
            rnd,
            appends=appends,
            overwrites=overwrites,
            meta={"seq_total": seq_base + n_sched},
        )
        stats = {
            "round": rnd,
            "scheduled": n_sched,
            "fetched": status_counts.get(200, 0),
            "errors": sum(v for k, v in status_counts.items() if k not in (200, 429)),
            "rate_limited": status_counts.get(429, 0),
            "new_links": n_links,
        }
        fetched.unpersist()
        links.unpersist()
        return stats

    def _cascade_delete(self, sites: list[str], frontier2: DataFrame) -> dict[str, DataFrame]:
        """C4: delete a site everywhere (read-filter-overwrite of the
        site-keyed tables; frontier rows flip to state='deleted')."""
        out: dict[str, DataFrame] = {}
        for name in SITE_TABLES:
            out[name] = self.io.read(self.spark, name).filter(~F.col("site").isin(sites))
        out["frontier"] = frontier2.withColumn(
            "state",
            F.when(F.col("site").isin(sites), F.lit(S.DELETED)).otherwise(F.col("state")),
        )
        return out

    # ---------------------------------------------------- lifecycle (C1-C5)
    def _write_control(self, site: str, paused: bool | None = None, deleted: bool | None = None):
        """Upsert one site's lifecycle flags (tiny table; collect+rewrite)."""
        rows = {
            r.site: [r.paused, r.deleted]
            for r in self.io.read(self.spark, "engine_control").collect()
        }
        cur = rows.get(site, [False, False])
        if paused is not None:
            cur[0] = paused
        if deleted is not None:
            cur[1] = deleted
        rows[site] = cur
        df = self.spark.createDataFrame(
            [(s, p, d) for s, (p, d) in sorted(rows.items())],
            ENGINE_SCHEMAS["engine_control"],
        )
        self.io.commit(
            self.io.last_round(), overwrites={"engine_control": self._w(df)}
        )

    def pause_site(self, site: str) -> None:
        """C3 (app.py:497-503): scheduled-out from the next round on;
        the site's frontier rows stay pending."""
        self._write_control(site, paused=True)

    def resume_site(self, site: str) -> None:
        self._write_control(site, paused=False)

    def delete_site(self, site: str) -> None:
        """C4 (app.py:505-563, crawler.py:557-589): immediate cascade
        across all site-keyed tables + a standing deleted flag."""
        frontier = self.io.read(self.spark, "frontier")
        cascade = self._cascade_delete([site], frontier)
        self.io.commit(
            self.io.last_round(), overwrites={k: self._w(v) for k, v in cascade.items()}
        )
        self._write_control(site, deleted=True)

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
                F.min("url").alias("url"),
                F.first("h64").alias("h64"),
                F.min("site").alias("site"),
                F.min("host").alias("host"),
            )
            .select(
                "url", "url_hash", "h64", "site", "host",
                F.lit(0).alias("depth"),
                F.lit(rnd).alias("discovered_round"),
                F.lit(S.PENDING).alias("state"),
            )
            .join(frontier.select("url_hash"), "url_hash", "left_anti")
            .join(seen.select("url_hash"), "url_hash", "left_anti")
            .select(*[f.name for f in S.FRONTIER.fields])
        )
        self.io.commit(
            rnd,
            overwrites={"frontier": self._w(frontier.unionByName(new))},
        )

    def restart_site(self, site: str, frontier_urls: DataFrame) -> None:
        """C5 (app.py:565-600): purge the site everywhere, clear flags,
        re-seed from its original URLs."""
        frontier = self.io.read(self.spark, "frontier").filter(F.col("site") != site)
        cascade = self._cascade_delete([site], frontier)
        cascade["frontier"] = frontier
        self.io.commit(
            self.io.last_round(), overwrites={k: self._w(v) for k, v in cascade.items()}
        )
        self._write_control(site, paused=False, deleted=False)
        self.add_sites(frontier_urls)

    def refresh_sitemaps(self, world: dict[str, DataFrame], url_filter: str | None = None) -> None:
        """S7 + J5 (app.py:814-848, crawler.py:197-277): re-walk the
        sitemap trees; new URLs join the frontier, sitemap-owned URLs
        (depth 0) that vanished are tombstoned — their rows cascade out
        of frontier/seen/documents/records. Link-discovered pages
        (depth > 0) are not sitemap-owned and are never tombstoned.
        (The reference also prunes the per-site embeddings file; our
        embeddings keep history — keyed by entity, not page.)"""
        from crawler_spark.operators.discovery import discover_frontier

        spark, io = self.spark, self.io
        current = discover_frontier(
            world["seeds"], world["robots"], world["sitemaps"], url_filter
        )
        cur_keys = (
            with_url_keys(current.select("url"), mode=self.mode)
            .select("url_hash")
            .distinct()
        )
        frontier = io.read(spark, "frontier")
        removed = frontier.filter(F.col("depth") == 0).join(
            cur_keys, "url_hash", "left_anti"
        )
        removed_keys = removed.select("url_hash")
        removed_urls = removed.select("url")
        overwrites = {
            "frontier": frontier.join(removed_keys, "url_hash", "left_anti"),
            "seen": io.read(spark, "seen").join(removed_keys, "url_hash", "left_anti"),
            "documents": io.read(spark, "documents").join(
                removed_keys.withColumnRenamed("url_hash", "doc_id"), "doc_id", "left_anti"
            ),
            "records": io.read(spark, "records").join(removed_urls, "url", "left_anti"),
        }
        io.commit(io.last_round(), overwrites={k: self._w(v) for k, v in overwrites.items()})
        self.add_sites(current)

    def maintain(self, max_paths: int = 32) -> None:
        """Snapshot maintenance (Iceberg rewrite_data_files analog):
        compact append tables whose delta-path lists grew past
        max_paths, so reads stay O(files) instead of O(rounds)."""
        for name in ("seen", "documents", "records", "entity_seen", "fetch_log"):
            if len(self.io.table_paths(name)) > max_paths:
                self.io.compact(self.spark, name, self.io.last_round())

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
