"""Wire-format sitemap parsing (S2): XML + gzip + index recursion input."""

from pyspark.sql import types as T

from crawler_spark.sources.sitemap_xml import (
    parse_sitemap_bytes,
    parse_sitemaps,
    render_sitemap_xml,
)
from crawler_spark.world import make_world

RAW = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def test_roundtrip_world_sitemaps(spark):
    """Render every fixture sitemap to real bytes (gz for .gz names),
    parse back through the Spark operator, compare exactly."""
    world = make_world(seed=17, n_hosts=3, n_urls=24)
    rows = [
        (r.sitemap_url, render_sitemap_xml(r.kind, list(r.entries),
                                           gz=r.sitemap_url.endswith(".gz")))
        for r in world.sitemaps.itertuples(index=False)
    ]
    parsed = parse_sitemaps(spark.createDataFrame(rows, RAW))
    got = {r.sitemap_url: (r.kind, list(r.entries)) for r in parsed.collect()}
    want = {
        r.sitemap_url: (r.kind, list(r.entries))
        for r in world.sitemaps.itertuples(index=False)
    }
    assert got == want


def test_parse_gzip_magic_not_suffix():
    # gzipped body under a non-.gz name still parses (magic sniffing)
    body = render_sitemap_xml("urlset", ["https://a.com/1"], gz=True)
    assert parse_sitemap_bytes("https://a.com/sitemap.xml", body) == (
        "urlset", ["https://a.com/1"]
    )


def test_parse_malformed_and_filter():
    assert parse_sitemap_bytes("u", b"<html>not a sitemap") is None
    assert parse_sitemap_bytes("u", b"\x1f\x8btruncated-gzip") is None
    body = render_sitemap_xml("urlset", ["https://a.com/keep/1", "https://a.com/drop/2"])
    assert parse_sitemap_bytes("u", body, url_filter="/keep/") == (
        "urlset", ["https://a.com/keep/1"]
    )
    # filter applies to page urls only, never to index entries (app.py:100-102)
    idx = render_sitemap_xml("index", ["https://a.com/sm1.xml"])
    assert parse_sitemap_bytes("u", idx, url_filter="/keep/") == (
        "index", ["https://a.com/sm1.xml"]
    )
