"""Pure-Python reference-semantics oracle (SURVEY.md §5.1).

The reference ships zero tests, so the oracle IS the spec: a ~200-line
deterministic re-implementation of its queue discipline —

- sorted-URL FIFO per site     (app.py:128-130 + crawler.py:336-342)
- round-robin across sites     (crawler.py:527-555) canonicalized as
  (rank_in_host, site, url) per round
- md5 URL-seen set             (crawler.py:92-94,149-153)
- 1 req/s/host politeness      (crawler.py:31,894-920) ≙ budget/round
- 429 backoff                  (crawler.py:987-996) with the same
  deterministic md5-derived 3..7-round surrogate as the engine
- entity-key dedup             (crawler.py:630-742) via the SAME
  `entity_rows_for_page` helper the Spark UDF uses
- pause / delete lifecycle     (crawler.py:925-937, 557-589)

It runs in-memory over a `World` fixture and emits (a) the crawl-order
sequence, (b) the final URL-seen set, (c) documents span sequences,
(d) the extracted record multiset and type counts — the engine must
match all of them exactly (tests/test_engine_oracle.py).
"""

from __future__ import annotations

import hashlib
from collections import Counter
from dataclasses import dataclass, field

from crawler_spark.functions.urls import canonicalize_url, host_of_py, md5_hex, site_of_py
from crawler_spark.operators.extract import entity_rows_for_page
from crawler_spark.world import World


def backoff_rounds(host: str, rnd: int) -> int:
    """Python twin of operators.scheduler.backoff_rounds_expr."""
    return 3 + int(hashlib.md5(f"{host}:{rnd}".encode()).hexdigest()[:8], 16) % 5


def robots_rule_matches(p: str, url: str) -> bool:
    """Python twin of scheduler.compile_robots_rules + _longest_rule_len
    matching: RFC 9309 §2.2.3 — '*' matches any sequence, trailing '$'
    anchors to the URL end, everything else is literal."""
    import re as _re

    anchored = p.endswith("$")
    core = p[:-1] if anchored else p
    if "*" not in core and not anchored:
        return url.startswith(core)
    rx = "^" + ".*".join(_re.escape(seg) for seg in core.split("*"))
    if anchored:
        rx += "$"
    return _re.search(rx, url) is not None


@dataclass
class OracleResult:
    crawl_order: list[tuple]  # (round, seq, site, url, status)
    seen: dict[str, str]  # url_hash -> url
    documents: dict[str, list[tuple]]  # doc_id -> [(kind,text,media_ref,offset)]
    records: Counter  # (url, site, round, seq, shape, key, types, name, payload)
    type_counts: Counter  # (site, type) -> n
    entity_keys: set = field(default_factory=set)
    metrics: list[dict] = field(default_factory=list)


class Oracle:
    def __init__(
        self,
        world: World,
        mode: str = "reference",
        follow_links: bool = True,
        priority: str = "fifo",
        scores: dict[str, int] | None = None,
        seconds_per_round: int = 60,
    ):
        self.world = world
        self.mode = mode
        self.seconds_per_round = int(seconds_per_round)
        self.follow_links = follow_links
        # python twin of scheduler.PRIORITY_ORDERS: the within-host order
        # AND the canonical cross-host tiebreak (rank, site, *order)
        self.priority = priority
        # priority='score' twin: url_hash -> integer score (the engine's
        # set_priority_scores table collected); unscored urls rank 0
        self.scores = scores or {}
        self.web = world.web_by_url()
        self.robots = {
            r.host: r for r in world.robots.itertuples(index=False)
        }
        self.bursts = list(world.bursts.itertuples(index=False))
        self.control = list(world.control.itertuples(index=False))

    # --- shared key/derivation helpers ------------------------------------
    def dedup_key(self, url: str) -> str:
        return url if self.mode == "reference" else canonicalize_url(url)

    def url_hash(self, url: str) -> str:
        return md5_hex(self.dedup_key(url))

    def _prio_key(self, row: dict) -> tuple:
        """Sort key twin of scheduler.PRIORITY_ORDERS[self.priority]."""
        if self.priority == "fifo":
            return (row["url"],)
        if self.priority == "depth":
            return (row["depth"], row["disc"], row["url"])
        if self.priority == "recency":
            return (-row["disc"], row["depth"], row["url"])
        if self.priority == "score":
            return (-self.scores.get(self.url_hash(row["url"]), 0), row["url"])
        raise ValueError(f"unknown priority: {self.priority}")

    # --- discovery (mirrors operators.discovery.discover_frontier) --------
    def discover(self, url_filter: str | None = None) -> list[tuple[str, str]]:
        sm = {r.sitemap_url: r for r in self.world.sitemaps.itertuples(index=False)}
        seed_hosts = {host_of_py(u) for u in self.world.seeds["url"]}
        worklist = []
        for h in seed_hosts:
            if h in self.robots:
                worklist.extend(self.robots[h].sitemap_urls)
        pages = [(r.url, r.site) for r in self.world.seeds.itertuples(index=False)]
        processed: set[str] = set()
        for _ in range(8):
            worklist = [u for u in dict.fromkeys(worklist) if u not in processed]
            if not worklist:
                break
            nxt = []
            for su in worklist:
                processed.add(su)
                r = sm.get(su)
                if r is None:
                    continue
                if r.kind == "urlset":
                    for u in r.entries:
                        if url_filter and url_filter not in u:
                            continue
                        pages.append((u, r.site))
                else:
                    nxt.extend(r.entries)
            worklist = nxt
        out, seen_urls = [], set()
        for u, s in pages:
            if u not in seen_urls:
                seen_urls.add(u)
                out.append((u, s))
        return out

    # --- control helpers ---------------------------------------------------
    def _paused(self, site: str, rnd: int) -> bool:
        return any(
            c.site == site
            and c.paused_from_round is not None
            and c.paused_from_round <= rnd <= c.paused_to_round
            for c in self.control
        )

    def _deleted(self, site: str, rnd: int) -> bool:
        return any(
            c.site == site and c.deleted_at_round is not None and rnd >= c.deleted_at_round
            for c in self.control
        )

    def _bursting(self, host: str, rnd: int) -> bool:
        return any(b.host == host and b.from_round <= rnd <= b.to_round for b in self.bursts)

    def _retry_after(self, host: str, rnd: int) -> int | None:
        """Max Retry-After seconds among the host's active burst windows
        (engine twin: simulate_fetch's groupBy(host).max), None when no
        active window advertises one."""
        ras = [
            int(ra)
            for b in self.bursts
            if b.host == host and b.from_round <= rnd <= b.to_round
            for ra in [getattr(b, "retry_after_s", None)]
            if ra is not None
        ]
        return max(ras) if ras else None

    # --- the crawl ----------------------------------------------------------
    def run(
        self, url_filter: str | None = None, max_rounds: int = 100, max_idle: int = 8
    ) -> OracleResult:
        # frontier: url_hash -> dict(url, site, host, depth, state)
        # seed: collapse canonical twins keeping the min url, exactly like
        # engine.seed()'s groupBy(url_hash).agg(min(url))
        by_hash: dict[str, list] = {}
        for u, s in self.discover(url_filter):
            by_hash.setdefault(self.url_hash(u), []).append((u, s))
        frontier: dict[str, dict] = {}
        for h, urls in by_hash.items():
            u, s = min(urls)
            frontier[h] = {
                "url": u, "site": s, "host": host_of_py(u), "depth": 0,
                "disc": 0, "state": "pending",
            }

        res = OracleResult(
            crawl_order=[], seen={}, documents={}, records=Counter(), type_counts=Counter()
        )
        backoff_until: dict[str, int] = {}
        seq_total = 0
        idle = 0
        for rnd in range(1, max_rounds + 1):
            # deleted-site cascade: the engine filters the site-keyed tables
            # at the delete round; since the site is gated forever after,
            # that equals filtering once at the end (done below).

            # gate + dedup + budget
            per_host: dict[str, list[str]] = {}
            for h, row in frontier.items():
                if row["state"] != "pending":
                    continue
                if self._paused(row["site"], rnd) or self._deleted(row["site"], rnd):
                    continue
                if backoff_until.get(row["host"], -1) > rnd:
                    continue
                rb = self.robots.get(row["host"])
                if rb is not None:
                    # longest-match precedence, tie -> allow (RFC 9309);
                    # rule length counts '*'/'$' (specificity measure)
                    dmax = max(
                        (len(p) for p in rb.disallow_prefixes
                         if robots_rule_matches(p, row["url"])), default=0,
                    )
                    amax = max(
                        (len(p) for p in getattr(rb, "allow_prefixes", ())
                         if robots_rule_matches(p, row["url"])), default=0,
                    )
                    if dmax > amax:
                        continue
                if h in res.seen:
                    continue
                per_host.setdefault(row["host"], []).append(row)
            sched: list[tuple] = []  # (rank, site, prio_key, url)
            for host, rows in per_host.items():
                budget = self.robots[host].crawl_budget if host in self.robots else 1
                ordered = sorted(rows, key=self._prio_key)[:budget]
                for rank, r in enumerate(ordered, start=1):
                    sched.append((rank, site_of_py(host), self._prio_key(r), r["url"]))
            sched.sort()  # canonical (rank_in_host, site, *priority order)

            if not sched:
                idle += 1
                n_pending = sum(
                    1 for r in frontier.values()
                    if r["state"] == "pending" and not self._deleted(r["site"], rnd)
                )
                if n_pending == 0 or idle >= max_idle:
                    break
                continue
            idle = 0

            new_links: dict[str, tuple[int, str, str, str]] = {}  # hash -> (depth,url,site,host)
            for rank, site, _k, url in sched:
                seq_total += 1
                seq = seq_total
                host = host_of_py(url)
                h = self.url_hash(url)
                page = self.web.get(url)
                status = page.status if page is not None else 404
                if self._bursting(host, rnd):
                    status = 429
                res.crawl_order.append((rnd, seq, site, url, status))
                row = frontier[h]
                if status == 200:
                    row["state"] = "fetched"
                    res.seen[h] = url
                    spans = sorted(page.spans, key=lambda t: t[3])
                    res.documents[h] = list(spans)
                    # extraction + entity dedup (sequential first-wins)
                    ents = entity_rows_for_page(url, site, seq, rnd, spans)
                    kept_jsonld = 0
                    synth_row = None
                    for e in ents:
                        (_u, _s, _r, _q, _off, _i, shape, key, types, name, payload) = e
                        rec = (
                            _u, _s, _r, _q, shape, key,
                            tuple(types) if types is not None else None, name, payload,
                        )
                        if shape == "synth":
                            synth_row = rec
                            continue
                        if shape == "single":
                            res.records[rec] += 1
                            kept_jsonld += 1
                            if key is not None and (site, key) not in res.entity_keys:
                                res.entity_keys.add((site, key))
                            for t in types or []:
                                res.type_counts[(site, t)] += 1
                        else:  # list-item / graph-item
                            if key is None or (site, key) not in res.entity_keys:
                                res.records[rec] += 1
                                kept_jsonld += 1
                                if key is not None:
                                    res.entity_keys.add((site, key))
                                for t in types or []:
                                    res.type_counts[(site, t)] += 1
                    if kept_jsonld == 0 and synth_row is not None:
                        res.records[synth_row] += 1
                    # links
                    if self.follow_links:
                        for link in page.out_links:
                            lh = host_of_py(link)
                            if lh not in self.robots:
                                continue
                            lhash = self.url_hash(link)
                            if lhash in frontier:
                                continue
                            cand = (row["depth"] + 1, link, site_of_py(lh), lh)
                            prev = new_links.get(lhash)
                            if prev is None or cand < prev:
                                new_links[lhash] = cand
                elif status == 429:
                    # Retry-After overrides the surrogate (engine twin:
                    # run_round's ceil(retry_after_s / seconds_per_round))
                    ra = self._retry_after(host, rnd)
                    k = (
                        -(-ra // self.seconds_per_round)
                        if ra is not None
                        else backoff_rounds(host, rnd)
                    )
                    backoff_until[host] = rnd + k
                    # stays pending
                else:
                    row["state"] = "error"
            for lhash, (depth, url, site, host) in new_links.items():
                frontier[lhash] = {
                    "url": url, "site": site, "host": host, "depth": depth,
                    "disc": rnd, "state": "pending",
                }

        # final cascade of deleted sites over accumulated outputs
        deleted_sites = {
            c.site for c in self.control if c.deleted_at_round is not None
        }
        if deleted_sites:
            res.seen = {
                h: u for h, u in res.seen.items() if site_of_py(host_of_py(u)) not in deleted_sites
            }
            res.documents = {
                h: v
                for h, v in res.documents.items()
                if h in res.seen
            }
            res.records = Counter(
                {k: v for k, v in res.records.items() if k[1] not in deleted_sites}
            )
            res.type_counts = Counter(
                {k: v for k, v in res.type_counts.items() if k[0] not in deleted_sites}
            )
            res.entity_keys = {
                (s, k) for (s, k) in res.entity_keys if s not in deleted_sites
            }
        return res
