"""XML sitemap source: parse real sitemap bodies (SURVEY.md S2/F9/F10).

The fixture `sitemaps` table abstracts sitemap content as entry lists;
this module is the wire-format layer the cluster deployment uses: raw
(possibly gzipped, app.py:81-83) XML bytes -> kind + entries, matching
the reference's parse exactly (app.py:72-110):

- `<sitemapindex>` root -> kind='index', entries = child sitemap <loc>s
- `<urlset>` root      -> kind='urlset', entries = page <loc>s
- substring url_filter applied to page URLs only (app.py:100-102)
- malformed XML -> zero rows (the reference logs and skips)

Parsing runs in mapInPandas over Arrow batches (lxml/ElementTree is
per-document by nature; there are no per-row Spark round trips), with
gzip sniffed from the magic bytes rather than trusting the .gz suffix.

`render_sitemap_xml` is the inverse (used by tests to round-trip the
fixture world through real bytes, and by the world generator to emit
wire-format fixtures).
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PARSED = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("entries", T.ArrayType(T.StringType()), False),
    ]
)

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def parse_sitemap_bytes(url: str, body: bytes, url_filter: str | None = None):
    """One sitemap body -> (kind, entries) or None if unparseable."""
    if body[:2] == b"\x1f\x8b":  # gzip magic (reference trusts the .gz name)
        try:
            body = gzip.decompress(body)
        except OSError:
            return None
    try:
        root = ET.parse(io.BytesIO(body)).getroot()
    except ET.ParseError:
        return None
    tag = root.tag.rsplit("}", 1)[-1]
    locs = [
        el.text.strip()
        for el in root.iter(f"{{{_NS}}}loc")
        if el.text and el.text.strip()
    ] or [el.text.strip() for el in root.iter("loc") if el.text and el.text.strip()]
    if tag == "sitemapindex":
        return "index", locs
    if tag == "urlset":
        if url_filter:
            locs = [u for u in locs if url_filter in u]  # P1, pages only
        return "urlset", locs
    return None


def parse_sitemaps(raw: DataFrame, url_filter: str | None = None) -> DataFrame:
    """(sitemap_url, body binary) -> PARSED rows via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, body in zip(pdf["sitemap_url"], pdf["body"]):
                parsed = parse_sitemap_bytes(url, bytes(body or b""), url_filter)
                if parsed is not None:
                    rows.append((url, parsed[0], parsed[1]))
            yield pd.DataFrame(rows, columns=["sitemap_url", "kind", "entries"])

    return raw.select("sitemap_url", "body").mapInPandas(run, PARSED)


LASTMOD = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("lastmod", T.StringType(), True),
    ]
)

META = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.StringType(), True),
    ]
)


def parse_sitemap_meta(raw: DataFrame, url_filter: str | None = None) -> DataFrame:
    """(sitemap_url, body) -> one row per <url> entry with its
    <lastmod> / <changefreq> / <priority> children (strings or null).

    The sitemap protocol\'s full freshness/importance hints: production
    crawlers seed recrawl scheduling with them for never-fetched URLs,
    where the engine\'s observed change rates (`recrawl_scores`, Cho &
    Garcia-Molina) don\'t exist yet. Wiring:
    scheduler.bootstrap_recrawl_priorities(meta, now_ms) -> priority_e6
    -> `engine.set_priority_scores` / `schedule_recrawl`; once a URL
    has fetch history the observed rate supersedes the hint. Same
    mapInPandas shape as parse_sitemaps (per-document XML work, Arrow
    batches, no per-row Spark round trips); index sitemaps yield no
    rows (their lastmod describes child FILES, not pages)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for smu, body in zip(pdf["sitemap_url"], pdf["body"]):
                b = bytes(body or b"")
                if b[:2] == b"\x1f\x8b":
                    try:
                        b = gzip.decompress(b)
                    except OSError:
                        continue
                try:
                    root = ET.parse(io.BytesIO(b)).getroot()
                except ET.ParseError:
                    continue
                if root.tag.rsplit("}", 1)[-1] != "urlset":
                    continue

                def child(el, tag):
                    c = el.find(f"{{{_NS}}}{tag}")
                    if c is None:
                        c = el.find(tag)
                    return c.text.strip() if c is not None and c.text else None

                for el in list(root.iter(f"{{{_NS}}}url")) or list(root.iter("url")):
                    u = child(el, "loc")
                    if not u:
                        continue
                    if url_filter and url_filter not in u:
                        continue
                    rows.append(
                        (smu, u, child(el, "lastmod"),
                         child(el, "changefreq"), child(el, "priority"))
                    )
            yield pd.DataFrame(
                rows,
                columns=["sitemap_url", "url", "lastmod", "changefreq", "priority"],
            )

    return raw.select("sitemap_url", "body").mapInPandas(run, META)


def parse_sitemap_lastmod(raw: DataFrame, url_filter: str | None = None) -> DataFrame:
    """(sitemap_url, url, lastmod) — the freshness-only projection of
    parse_sitemap_meta (kept as the stable narrow API)."""
    return parse_sitemap_meta(raw, url_filter).select(
        "sitemap_url", "url", "lastmod"
    )


def render_sitemap_xml(
    kind: str,
    entries: list[str],
    gz: bool = False,
    lastmod: dict[str, str] | None = None,
    changefreq: dict[str, str] | None = None,
    priority: dict[str, str] | None = None,
) -> bytes:
    """Inverse of parse: build wire-format bytes for tests/fixtures.
    lastmod/changefreq/priority: optional url -> value maps rendered
    per entry."""
    if kind == "index":
        root_tag, child_tag = "sitemapindex", "sitemap"
    else:
        root_tag, child_tag = "urlset", "url"
    parts = [f'<?xml version="1.0" encoding="UTF-8"?><{root_tag} xmlns="{_NS}">']
    for e in entries:
        extra = ""
        for tag, vals in (
            ("lastmod", lastmod),
            ("changefreq", changefreq),
            ("priority", priority),
        ):
            v = (vals or {}).get(e)
            if v:
                extra += f"<{tag}>{v}</{tag}>"
        parts.append(f"<{child_tag}><loc>{e}</loc>{extra}</{child_tag}>")
    parts.append(f"</{root_tag}>")
    body = "".join(parts).encode()
    return gzip.compress(body) if gz else body
