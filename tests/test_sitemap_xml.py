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


def test_parse_sitemap_lastmod(spark):
    from crawler_spark.sources.sitemap_xml import (
        parse_sitemap_lastmod,
        render_sitemap_xml,
    )

    urls = ["https://a.com/p/1", "https://a.com/p/2", "https://a.com/p/3"]
    lm = {urls[0]: "2026-01-05", urls[2]: "2026-03-01T10:00:00+00:00"}
    rows = [
        ("https://a.com/s.xml", render_sitemap_xml("urlset", urls, lastmod=lm)),
        ("https://a.com/s.gz", render_sitemap_xml("urlset", [urls[1]], gz=True,
                                                  lastmod={urls[1]: "2026-02-02"})),
        ("https://a.com/idx.xml", render_sitemap_xml("index", ["https://a.com/s.xml"],
                                                     lastmod={"https://a.com/s.xml": "2026-01-01"})),
        ("https://a.com/bad.xml", b"<not xml"),
    ]
    raw = spark.createDataFrame(rows, "sitemap_url string, body binary")
    got = {r.url: (r.sitemap_url, r.lastmod) for r in parse_sitemap_lastmod(raw).collect()}
    assert got == {
        urls[0]: ("https://a.com/s.xml", "2026-01-05"),
        urls[1]: ("https://a.com/s.gz", "2026-02-02"),
        urls[2]: ("https://a.com/s.xml", "2026-03-01T10:00:00+00:00"),
    }
    # index sitemaps and malformed bodies contribute nothing


def test_parse_sitemap_lastmod_filter_and_missing(spark):
    from crawler_spark.sources.sitemap_xml import (
        parse_sitemap_lastmod,
        render_sitemap_xml,
    )

    urls = ["https://b.com/p/1", "https://b.com/q/2"]
    raw = spark.createDataFrame(
        [("https://b.com/s.xml", render_sitemap_xml("urlset", urls))],
        "sitemap_url string, body binary",
    )
    got = parse_sitemap_lastmod(raw, url_filter="/p/").collect()
    assert [(r.url, r.lastmod) for r in got] == [("https://b.com/p/1", None)]


def test_parse_sitemap_meta_roundtrip(spark):
    from crawler_spark.sources.sitemap_xml import (
        parse_sitemap_meta,
        render_sitemap_xml,
    )

    urls = [f"https://h/p/{i}" for i in range(4)]
    body = render_sitemap_xml(
        "urlset",
        urls,
        lastmod={urls[0]: "2024-01-05T00:00:00Z", urls[1]: "2024-02-01"},
        changefreq={urls[0]: "daily", urls[2]: "NEVER"},
        priority={urls[0]: "0.8"},
    )
    raw = spark.createDataFrame([("https://h/sm.xml", body)], ["sitemap_url", "body"])
    got = {r.url: r for r in parse_sitemap_meta(raw).collect()}
    assert set(got) == set(urls)
    assert got[urls[0]].lastmod == "2024-01-05T00:00:00Z"
    assert got[urls[0]].changefreq == "daily"
    assert got[urls[0]].priority == "0.8"
    assert got[urls[1]].lastmod == "2024-02-01"
    assert got[urls[1]].changefreq is None
    assert got[urls[2]].changefreq == "NEVER"
    assert got[urls[3]].lastmod is None and got[urls[3]].priority is None


def test_bootstrap_recrawl_priorities(spark):
    from crawler_spark.operators.scheduler import (
        CHANGEFREQ_LAMBDA_E6,
        DEFAULT_CHANGEFREQ_LAMBDA_E6,
        bootstrap_recrawl_priorities,
    )

    day_ms = 86_400_000
    now = 20 * day_ms  # 1970-01-21, explicit -> deterministic
    rows = [
        ("https://h/a", "1970-01-11T00:00:00Z", "daily"),     # 10 days stale
        ("https://h/a", "1970-01-16T00:00:00Z", "monthly"),   # dup url, fresher
        ("https://h/b", "1970-01-11T00:00:00Z", "NEVER"),     # case-insensitive, 0
        ("https://h/c", None, "hourly"),                      # no lastmod -> epoch 0
        ("https://h/d", "not a date", None),                  # malformed + no freq
    ]
    ent = spark.createDataFrame(rows, ["url", "lastmod", "changefreq"])
    got = {r.url: r for r in bootstrap_recrawl_priorities(ent, now).collect()}
    # dup url keeps max of each column independently (doc'd semantics)
    a = got["https://h/a"]
    assert a.lastmod_ms == 15 * day_ms
    assert a.lambda_e6 == CHANGEFREQ_LAMBDA_E6["daily"]
    assert a.priority_e6 == max(
        CHANGEFREQ_LAMBDA_E6["daily"] * 10 * day_ms,
        CHANGEFREQ_LAMBDA_E6["monthly"] * 5 * day_ms,
    )
    assert got["https://h/b"].priority_e6 == 0
    assert got["https://h/c"].lambda_e6 == CHANGEFREQ_LAMBDA_E6["hourly"]
    assert got["https://h/c"].priority_e6 == CHANGEFREQ_LAMBDA_E6["hourly"] * now
    d = got["https://h/d"]
    assert d.lastmod_ms == 0 and d.lambda_e6 == DEFAULT_CHANGEFREQ_LAMBDA_E6
    assert d.priority_e6 == DEFAULT_CHANGEFREQ_LAMBDA_E6 * now
