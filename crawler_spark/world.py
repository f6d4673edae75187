"""Deterministic synthetic web generator (FIXTURES.md; SURVEY.md M0).

`make_world(seed, n_hosts, n_urls)` builds the simulated internet the
engine crawls in the sandbox (no network): pages as interleaved
text+media span arrays, out-links, sitemap trees, robots rules, and
scenario knobs (429 bursts, pauses, deletes, canonicalization twins).

Everything derives from blake2b hashes of (seed, tag, ...) — no `random`
module, no wall clock — so the same seed always yields the same world,
the oracle can re-derive it, and resume tests are bit-identical.

Skew: host 0 owns ~30% of all URLs (power-law) to exercise salting.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

import pandas as pd

JSONLD_KINDS = ("single_id", "single_url", "graph", "list", "nokey", "badjson")

_WORDS = (
    "frontier crawl spark shuffle parquet bloom filter host budget round "
    "schema entity graph sitemap robots politeness backoff queue window "
    "vector token span media text offset snapshot manifest lineage salt"
).split()


def _h(*parts) -> int:
    """64-bit deterministic hash of the parts."""
    s = "|".join(str(p) for p in parts)
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _pick(seq, *parts):
    return seq[_h(*parts) % len(seq)]


def _sentence(seed: int, *parts, n: int = 8) -> str:
    base = _h(seed, "sent", *parts)
    return " ".join(_WORDS[(base >> (i * 3)) % len(_WORDS)] for i in range(n))


@dataclass
class World:
    """All fixture tables as pandas frames + fast lookups for the oracle."""

    seed: int
    web: pd.DataFrame
    seeds: pd.DataFrame
    sitemaps: pd.DataFrame
    robots: pd.DataFrame
    bursts: pd.DataFrame
    control: pd.DataFrame
    hosts: list[str] = field(default_factory=list)

    def web_by_url(self) -> dict:
        return {r.url: r for r in self.web.itertuples(index=False)}

    def to_spark(self, spark):
        """Materialize as Spark DataFrames with the fixed schemas."""
        from crawler_spark import schemas as S

        def mk(pdf, schema):
            return spark.createDataFrame(list(pdf.itertuples(index=False)), schema)

        return {
            "web": mk(self.web, S.WEB),
            "seeds": mk(self.seeds, S.SEEDS),
            "sitemaps": mk(self.sitemaps, S.SITEMAPS),
            "robots": mk(self.robots, S.ROBOTS),
            "bursts": mk(self.bursts, S.BURSTS),
            "control": mk(self.control, S.SITE_CONTROL),
        }


def _host_name(i: int) -> str:
    return f"h{i:03d}.example.com"


def _site_name(host: str) -> str:
    return host.replace(".", "_")


def _url_counts(n_hosts: int, n_urls: int) -> list[int]:
    """Power-law: host 0 gets ~30%, the rest Zipf-ish, min 3 each."""
    if n_hosts == 1:
        return [n_urls]
    top = max(3, int(round(0.3 * n_urls)))
    rest = n_urls - top
    weights = [1.0 / (i + 1) for i in range(1, n_hosts)]
    tot = sum(weights)
    counts = [max(3, int(rest * w / tot)) for w in weights]
    return [top] + counts


def _entity(seed: int, site: str, eid: int, keyed: bool, list_type: bool) -> dict:
    t = _pick(["Product", "Article", "Recipe", "Event"], seed, site, eid, "t")
    obj = {
        "@type": [t, "Thing"] if list_type else t,
        "name": f"{t} {eid} {_sentence(seed, site, eid, n=3)}",
        "description": _sentence(seed, site, eid, "d", n=6),
    }
    if keyed:
        obj["@id"] = f"https://{site.replace('_', '.')}/entity/{eid}"
    return obj


def _jsonld_span_text(seed: int, site: str, page: int, n_entities_pool: int) -> str:
    """One JSON-LD script payload; shape chosen by hash (all reference
    branches represented: single dict w/ @id, dict w/ url key +
    list-valued @type, @graph, top-level list, keyless, malformed)."""
    kind = _pick(JSONLD_KINDS, seed, site, page, "jk")
    eid = _h(seed, site, page, "eid") % max(3, n_entities_pool)
    if kind == "badjson":
        return '{"@type": "Broken", not-json'
    if kind == "single_id":
        return json.dumps(_entity(seed, site, eid, True, False), sort_keys=True)
    if kind == "single_url":
        o = _entity(seed, site, eid, False, True)
        o["url"] = f"https://{site.replace('_', '.')}/entity/{eid}"
        return json.dumps(o, sort_keys=True)
    if kind == "nokey":
        o = _entity(seed, site, eid, False, False)
        o["recipeIngredient"] = [_sentence(seed, site, page, i, n=2) for i in range(3)]
        return json.dumps(o, sort_keys=True)
    if kind == "graph":
        items = [
            _entity(seed, site, (eid + k) % max(3, n_entities_pool), k % 3 != 2, k % 2 == 1)
            for k in range(2 + _h(seed, site, page, "gn") % 2)
        ]
        return json.dumps({"@context": "https://schema.org", "@graph": items}, sort_keys=True)
    # list
    items = [
        _entity(seed, site, (eid + k) % max(3, n_entities_pool), k % 2 == 0, False)
        for k in range(2)
    ]
    return json.dumps(items, sort_keys=True)


def _page_spans(seed: int, host: str, site: str, page: int, n_pool: int) -> list[tuple]:
    """Interleaved spans (kind, text, media_ref, offset); offsets strictly
    increasing. Some pages have no jsonld span → synthesize fallback."""
    spans: list[tuple] = []
    off = 0

    def add(kind, text="", media_ref=""):
        nonlocal off
        spans.append((kind, text, media_ref, off))
        off += 1 + _h(seed, site, page, "gap", len(spans)) % 7

    add("title", f"Title {site} {page} {_sentence(seed, site, page, 'ti', n=2)}")
    add("meta", json.dumps({"p": "description", "c": _sentence(seed, site, page, "de", n=5)}))
    if _h(seed, site, page, "ogi") % 3 == 0:
        add("meta", json.dumps({"p": "og:image", "c": f"https://{host}/img/{page}.jpg"}))
        add("meta", json.dumps({"p": "og:image:width", "c": str(400 + page % 800)}))
    if _h(seed, site, page, "blog") % 4 == 0:
        add("meta", json.dumps({"p": "article:published_time", "c": f"2024-01-{1 + page % 28:02d}"}))
    n_jsonld = _h(seed, site, page, "nj") % 3  # 0, 1 or 2 jsonld spans
    n_text = 1 + _h(seed, site, page, "nt") % 3
    n_media = _h(seed, site, page, "nm") % 3
    for i in range(n_text):
        add("text", _sentence(seed, site, page, "tx", i, n=10))
        if i < n_media:
            add("media", "", f"img://{host}/{page}/{i}")
        if i < n_jsonld:
            add("jsonld", _jsonld_span_text(seed, site, page * 10 + i, n_pool))
    return spans


def _variant_url(base_host: str, page: int, v: int) -> str:
    """Canonicalization twins: same page under a non-canonical spelling."""
    forms = [
        f"https://{base_host.upper()}/p/{page:05d}",
        f"https://{base_host}:443/p/{page:05d}",
        f"https://{base_host}/p/{page:05d}#section",
    ]
    return forms[v % len(forms)]


def make_world(
    seed: int = 42,
    n_hosts: int = 10,
    n_urls: int = 100,
    budget: int = 1,
    burst: bool = True,
    pauses: list[tuple[str, int, int]] | None = None,
    deletes: list[tuple[str, int]] | None = None,
    disallow: dict[str, list[str]] | None = None,
    allow: dict[str, list[str]] | None = None,
    variants: bool = True,
    sitemap_coverage: float = 0.6,
    retry_after_s: int | None = None,
) -> World:
    counts = _url_counts(n_hosts, n_urls)
    hosts = [_host_name(i) for i in range(n_hosts)]

    web_rows, seed_rows, sm_rows, robot_rows = [], [], [], []
    for hi, (host, cnt) in enumerate(zip(hosts, counts)):
        site = _site_name(host)
        pages = list(range(cnt))
        urls = {p: f"https://{host}/p/{p:05d}" for p in pages}
        n_pool = max(3, cnt // 3)  # entity pool smaller than pages → key collisions

        for p in pages:
            hv = _h(seed, site, p, "status") % 100
            status = 200 if hv < 90 else (404 if hv < 94 else (429 if hv < 97 else 0))
            spans = _page_spans(seed, host, site, p, n_pool) if status == 200 else []
            # out-links: same-host mostly, occasional cross-host / variant form
            links, anchors = [], []
            for li in range(2 + _h(seed, site, p, "nl") % 4):
                tgt = _h(seed, site, p, "lnk", li) % cnt
                if variants and _h(seed, site, p, "lv", li) % 20 == 0:
                    links.append(_variant_url(host, tgt, li))
                else:
                    links.append(urls[tgt])
                # index-aligned anchor text; ~1 in 5 links is bare
                # (image link / empty <a> body) -> ""
                anchors.append(
                    ""
                    if _h(seed, site, p, "anc0", li) % 5 == 0
                    else f"page {tgt} {_sentence(seed, site, p, 'anc', li, n=3)}"
                )
            if n_hosts > 1 and _h(seed, site, p, "x") % 10 == 0:
                oh = hosts[_h(seed, site, p, "xh") % n_hosts]
                links.append(f"https://{oh}/p/{_h(seed, site, p, 'xp') % 3:05d}")
                anchors.append(_sentence(seed, site, p, "ancx", n=3))
            web_rows.append((urls[p], host, status, spans, links, anchors))
            if variants and _h(seed, site, p, "var") % 12 == 0:
                # twin spelling of the same page: identical content & status
                web_rows.append(
                    (_variant_url(host, p, p), host, status, spans, links, anchors)
                )

        seed_rows.append((urls[0], site))
        # sitemap tree: index -> [a.xml, b.xml.gz]; covers a hash-chosen subset
        covered = [urls[p] for p in pages if _h(seed, site, p, "sm") % 100 < sitemap_coverage * 100]
        half = len(covered) // 2
        idx_url = f"https://{host}/sitemap_index.xml"
        a_url = f"https://{host}/sitemap_a.xml"
        b_url = f"https://{host}/sitemap_b.xml.gz"
        sm_rows.append((idx_url, site, "index", [a_url, b_url]))
        sm_rows.append((a_url, site, "urlset", sorted(covered[:half])))
        sm_rows.append((b_url, site, "urlset", sorted(covered[half:])))
        robot_rows.append(
            (host, [idx_url], (disallow or {}).get(host, []),
             (allow or {}).get(host, []), budget)
        )

    burst_rows = (
        [(hosts[min(1, n_hosts - 1)], 2, 3, retry_after_s)] if burst else []
    )
    control_rows = []
    sites_with_control = set()
    for site, fr, to in pauses or []:
        control_rows.append((site, fr, to, None))
        sites_with_control.add(site)
    for site, at in deletes or []:
        control_rows.append((site, None, None, at))
        sites_with_control.add(site)

    return World(
        seed=seed,
        web=pd.DataFrame(
            web_rows,
            columns=["url", "host", "status", "spans", "out_links", "out_anchors"],
        ),
        seeds=pd.DataFrame(seed_rows, columns=["url", "site"]),
        sitemaps=pd.DataFrame(sm_rows, columns=["sitemap_url", "site", "kind", "entries"]),
        robots=pd.DataFrame(
            robot_rows,
            columns=["host", "sitemap_urls", "disallow_prefixes",
                     "allow_prefixes", "crawl_budget"],
        ),
        bursts=pd.DataFrame(
            burst_rows,
            columns=["host", "from_round", "to_round", "retry_after_s"],
            dtype=object,  # keep ints as ints and None as None (no NaN floats)
        ),
        control=pd.DataFrame(
            control_rows,
            columns=["site", "paused_from_round", "paused_to_round", "deleted_at_round"],
            dtype=object,  # keep ints as ints and None as None (no NaN floats)
        ),
        hosts=hosts,
    )
