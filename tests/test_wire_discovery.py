"""Wire-format discovery path (S1+S2 end-to-end) must equal the
fixture path on the same world, plus multimodal plumbing tests."""

from pyspark.sql import types as T

from crawler_spark.operators.discovery import discover_frontier, discover_frontier_wire
from crawler_spark.sources.robots_txt import render_robots_txt
from crawler_spark.sources.sitemap_xml import render_sitemap_xml
from crawler_spark.world import make_world

RAW_SM = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType()),
        T.StructField("site", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def test_wire_equals_fixture_discovery(spark):
    world = make_world(seed=23, n_hosts=3, n_urls=24)
    t = world.to_spark(spark)
    robots_raw = spark.createDataFrame(
        [
            (r.host, render_robots_txt(list(r.sitemap_urls)))
            for r in world.robots.itertuples(index=False)
        ],
        ["host", "body"],
    )
    sm_raw = spark.createDataFrame(
        [
            (r.sitemap_url, r.site,
             render_sitemap_xml(r.kind, list(r.entries), gz=r.sitemap_url.endswith(".gz")))
            for r in world.sitemaps.itertuples(index=False)
        ],
        RAW_SM,
    )
    got = {
        (r.url, r.site)
        for r in discover_frontier_wire(spark, t["seeds"], robots_raw, sm_raw).collect()
    }
    want = {
        (r.url, r.site)
        for r in discover_frontier(t["seeds"], t["robots"], t["sitemaps"]).collect()
    }
    assert got == want


def test_multimodal_media_from_engine_documents(spark, tmp_path):
    from pyspark.sql import functions as F

    from crawler_spark.operators.multimodal import (
        decode_media,
        frame_sample_plan,
        media_from_documents,
    )
    from crawler_spark import schemas as S

    spans = [
        ("text", "hello", "", 0),
        ("media", "", "img://h/1/0", 3),
        ("media", "", "img://h/1/1", 7),
    ]
    docs = spark.createDataFrame([("d1", "u1", "s1", "h1", 1, spans)], S.DOCUMENTS)
    media = media_from_documents(docs)
    rows = media.collect()
    assert {r.media_ref for r in rows} == {"img://h/1/0", "img://h/1/1"}
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)
    feats = decode_media(media, dim=8).collect()
    assert all(len(f.feature) == 8 and f.width >= 64 for f in feats)
    # determinism: same payload -> same features
    feats2 = decode_media(media, dim=8).collect()
    assert {tuple(f.feature) for f in feats} == {tuple(f.feature) for f in feats2}
    plan = frame_sample_plan(media, every_ms=700)
    assert plan.groupBy("media_ref").count().count() == 2
    assert plan.filter(F.col("frame_at_ms") % 700 != 0).count() == 0


def test_multimodal_resize(spark):
    from crawler_spark.operators.multimodal import MEDIA, resize_media

    media = spark.createDataFrame(
        [
            ("m1", "d1", "image", b"x" * 100, {}),
            ("m2", "d1", "image", b"y" * 50, {}),
        ],
        MEDIA,
    )
    out = {r.media_ref: r for r in resize_media(media, 128, 96).collect()}
    assert set(out) == {"m1", "m2"}
    for r in out.values():
        assert (r.width, r.height) == (128, 96)
        assert r.n_bytes_out == len(r.payload) >= 1
        # output scales with target/source pixel ratio, never empty
        assert isinstance(r.payload, (bytes, bytearray))
    # deterministic: same input + target -> identical bytes
    again = {r.media_ref: r for r in resize_media(media, 128, 96).collect()}
    assert all(bytes(out[k].payload) == bytes(again[k].payload) for k in out)
    # different target -> different plumbing output
    other = {r.media_ref: r for r in resize_media(media, 32, 32).collect()}
    assert any(bytes(other[k].payload) != bytes(out[k].payload) for k in out)


def test_multimodal_strict_stub_raises(spark):
    import pytest
    from crawler_spark.operators.multimodal import MEDIA, decode_media

    media = spark.createDataFrame(
        [("m1", "d1", "image", b"bytes", {"k": "v"})], MEDIA
    )
    with pytest.raises(Exception) as exc:
        decode_media(media, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "real media decode" in str(exc.value)
