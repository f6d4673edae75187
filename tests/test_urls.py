"""Unit tests for the URL kernel (SURVEY.md F1-F4)."""

import hashlib

from pyspark.sql import functions as F

from crawler_spark.functions.urls import (
    canonicalize_url,
    md5_hex,
    with_url_keys,
)


def test_canonicalize_cases():
    # lowercase host+scheme
    assert canonicalize_url("HTTPS://WWW.Ex.COM/Path") == "https://www.ex.com/Path"
    # strip fragment
    assert canonicalize_url("https://a.com/p#frag") == "https://a.com/p"
    # strip default port (http 80 / https 443), keep others
    assert canonicalize_url("https://a.com:443/p") == "https://a.com/p"
    assert canonicalize_url("http://a.com:80/p") == "http://a.com/p"
    assert canonicalize_url("https://a.com:8443/p") == "https://a.com:8443/p"
    # sort query params
    assert canonicalize_url("https://a.com/p?b=2&a=1") == "https://a.com/p?a=1&b=2"
    # empty path -> /
    assert canonicalize_url("https://a.com") == "https://a.com/"
    # idempotent
    u = "https://A.com:443/x?z=1&y=2#f"
    assert canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)


def test_md5_matches_reference_rule():
    # reference: hashlib.md5(url.encode()).hexdigest() (crawler.py:92-94)
    u = "https://h000.example.com/p/00001"
    assert md5_hex(u) == hashlib.md5(u.encode()).hexdigest()


def test_with_url_keys_reference_mode(spark):
    df = spark.createDataFrame(
        [("https://H0.Example.com/p#f",), ("https://h0.example.com/p",)], ["url"]
    )
    out = with_url_keys(df, mode="reference").collect()
    # reference mode hashes the RAW url -> the two spellings differ
    assert out[0].url_hash != out[1].url_hash
    by_url = {r.url: r for r in out}
    r = by_url["https://h0.example.com/p"]
    assert r.url_hash == md5_hex("https://h0.example.com/p")
    assert r.host == "h0.example.com"
    assert r.site == "h0_example_com"


def test_with_url_keys_scaled_mode(spark):
    df = spark.createDataFrame(
        [("https://H0.example.com/p#f",), ("https://h0.example.com:443/p",)], ["url"]
    )
    out = with_url_keys(df, mode="scaled").collect()
    # canonical twins collide in scaled mode
    assert out[0].url_hash == out[1].url_hash
    assert out[0].url_hash == md5_hex("https://h0.example.com/p")


def test_spark_md5_equals_python(spark):
    urls = [f"https://h{i}.example.com/p/{i}" for i in range(20)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).select(
        "url", F.md5("url").alias("h")
    )
    for r in df.collect():
        assert r.h == md5_hex(r.url)


def test_canonicalize_strip_tracking():
    from crawler_spark.functions.urls import canonicalize_url

    u = "https://Ex.com/p?utm_source=a&id=7&fbclid=x&b=2"
    assert canonicalize_url(u) == "https://ex.com/p?b=2&fbclid=x&id=7&utm_source=a"
    assert canonicalize_url(u, strip_tracking=True) == "https://ex.com/p?b=2&id=7"
    # all params tracked -> bare path; no query stays identity
    assert (
        canonicalize_url("https://ex.com/p?utm_a=1&gclid=2", strip_tracking=True)
        == "https://ex.com/p"
    )
    assert canonicalize_url("https://ex.com/p", strip_tracking=True) == "https://ex.com/p"


def test_strip_tracking_col_matches_python(spark):
    from crawler_spark.functions.urls import strip_tracking_col

    urls = [
        "https://ex.com/p?id=1&utm_campaign=x&b=2",
        "https://ex.com/p?UTM_SOURCE=caps&GCLID=z",  # case-insensitive keys
        "https://ex.com/p?b=2&a=1",  # untouched, order preserved
        "https://ex.com/plain",
        "https://ex.com/p?",  # empty query -> base
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r.url: r.s for r in df.select("url", strip_tracking_col("url").alias("s")).collect()}
    assert got[urls[0]] == "https://ex.com/p?id=1&b=2"
    assert got[urls[1]] == "https://ex.com/p"
    assert got[urls[2]] == "https://ex.com/p?b=2&a=1"
    assert got[urls[3]] == "https://ex.com/plain"
    assert got[urls[4]] == "https://ex.com/p"


def test_canonicalize_strip_udf_collapses_campaign_twins(spark):
    from crawler_spark.functions.urls import canonicalize_strip_udf

    df = spark.createDataFrame(
        [
            ("https://Ex.com/p?id=7&utm_source=mail",),
            ("https://ex.com/p?utm_source=ads&id=7&gclid=z",),
        ],
        ["url"],
    )
    out = [r.c for r in df.select(canonicalize_strip_udf("url").alias("c")).collect()]
    assert out[0] == out[1] == "https://ex.com/p?id=7"


def test_normalize_text_strips_invisibles(spark):
    from crawler_spark.functions.text import ZERO_WIDTH, normalize_text_udf

    rows = [
        ("a", "café x"),          # decomposed é
        ("b", "zero​width‍ joined﻿"),
        ("c", "bidi‪override‬ end"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    norm = normalize_text_udf("NFC", strip_invisible=True)
    got = {r.id: r.n for r in df.select("id", norm("t").alias("n")).collect()}
    assert got["a"] == "café x"
    assert got["b"] == "zerowidth joined"
    assert got["c"] == "bidioverride end"
    assert got["d"] is None
    assert all(c not in (got["b"] + got["c"]) for c in ZERO_WIDTH)
    # NFKC folds compatibility forms (ligature fi, fullwidth digits)
    nfkc = normalize_text_udf("NFKC", strip_invisible=False)
    out = (
        spark.createDataFrame([("x", "ﬁle １２")], ["id", "t"])
        .select(nfkc("t").alias("n"))
        .collect()[0]
        .n
    )
    assert out == "file 12"
