"""Retry-After-driven 429 backoff (RFC 9110 §10.2.3).

A rate-limiting server that advertises Retry-After knows its own
recovery time better than the crawler's deterministic 3..7-round
surrogate. The hint rides the burst fixture (bursts.retry_after_s), the
wire transport's 5-tuple, and simulate_fetch's output column; the
engine maps it to rounds with all-integer ceil(s / seconds_per_round)
so the Python oracle agrees bit-for-bit.
"""

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark import schemas as S
from crawler_spark.oracle import backoff_rounds
from crawler_spark.world import make_world

from tests.test_engine_oracle import crawl_both, read_all


def test_engine_oracle_equal_with_retry_after(spark, tmp_path):
    # 300 s at 60 s/round -> 5 backoff rounds, NOT the md5 surrogate
    world = make_world(
        seed=43, n_hosts=3, n_urls=12, budget=2, burst=True, retry_after_s=300
    )
    eng, ora = crawl_both(spark, tmp_path, world, "reference", max_rounds=20)
    got = read_all(spark, eng)
    assert got["order"] == ora.crawl_order
    assert {u for _, u in got["seen"]} == set(ora.seen.values())


def test_backoff_until_follows_the_hint(spark, tmp_path):
    world = make_world(
        seed=43, n_hosts=3, n_urls=12, budget=2, burst=True, retry_after_s=300
    )
    eng, _ = crawl_both(spark, tmp_path, world, "reference", max_rounds=20)
    hs = eng.io.read(spark, "host_state").collect()
    assert hs  # the burst produced backoff state
    for r in hs:
        # every 429 window round recorded hint-based backoff: +ceil(300/60)
        assert r["backoff_until_round"] == r["last_round"] + 5


def test_backoff_surrogate_without_hint(spark, tmp_path):
    world = make_world(seed=43, n_hosts=3, n_urls=12, budget=2, burst=True)
    eng, ora = crawl_both(spark, tmp_path, world, "reference", max_rounds=20)
    got = read_all(spark, eng)
    assert got["order"] == ora.crawl_order
    hs = eng.io.read(spark, "host_state").collect()
    assert hs
    for r in hs:
        k = backoff_rounds(r["host"], r["last_round"])
        assert r["backoff_until_round"] == r["last_round"] + k
        assert 3 <= k <= 7


def test_wire_transport_five_tuple_carries_retry_after(spark):
    from crawler_spark.operators.fetch import fetch_via_http

    sched = spark.createDataFrame(
        [(0, "a.example", "https://a.example/x"), (0, "b.example", "https://b.example/y")],
        "salt int, host string, url string",
    )

    def transport(url):
        if "a.example" in url:
            return 429, None, None, None, 120
        return 200, [{"kind": "text", "text": "hi", "media_ref": "", "offset": 0}], []

    rows = {r["host"]: r for r in fetch_via_http(sched, transport=transport).collect()}
    assert rows["a.example"]["status"] == 429
    assert rows["a.example"]["retry_after_s"] == 120
    assert rows["b.example"]["status"] == 200
    assert rows["b.example"]["retry_after_s"] is None


def test_simulate_fetch_hint_only_on_429_rows(spark):
    from crawler_spark.operators.fetch import simulate_fetch

    sched = spark.createDataFrame(
        [(0, "a.example", "https://a.example/x", 1, 1),
         (0, "b.example", "https://b.example/y", 2, 1)],
        "salt int, host string, url string, seq long, round int",
    )
    web = spark.createDataFrame(
        [("https://a.example/x", "a.example", 200, [], []),
         ("https://b.example/y", "b.example", 200, [], [])],
        T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("status", T.IntegerType()),
            T.StructField("spans", S.SPANS),
            T.StructField("out_links", T.ArrayType(T.StringType())),
        ]),
    )
    bursts = spark.createDataFrame([("a.example", 1, 2, 90)], S.BURSTS)
    rows = {r["host"]: r for r in simulate_fetch(sched, web, bursts, 1).collect()}
    assert rows["a.example"]["status"] == 429
    assert rows["a.example"]["retry_after_s"] == 90
    assert rows["b.example"]["retry_after_s"] is None
    # legacy 3-column bursts still work (column synthesized as NULL)
    legacy = spark.createDataFrame(
        [("a.example", 1, 2)], "host string, from_round int, to_round int"
    )
    rows = {r["host"]: r for r in simulate_fetch(sched, web, legacy, 1).collect()}
    assert rows["a.example"]["status"] == 429
    assert rows["a.example"]["retry_after_s"] is None
