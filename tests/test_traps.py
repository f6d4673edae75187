"""Crawler-trap detection (operators/traps.py) — feature extraction vs
hand-computed expectations, host profiles vs a python reference, and
the engine's pause_trap_sites control wiring."""

import tempfile

from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.operators.traps import (
    host_trap_profile,
    trap_hosts,
    url_shape_features,
)
from crawler_spark.world import make_world

URLS = [
    # (host, url, depth, n_params, repeat, date)
    ("a.com", "https://a.com/", 0, 0, 0, 0),
    ("a.com", "https://a.com/about", 1, 0, 0, 0),
    ("a.com", "https://a.com/blog/post-1?utm=x", 2, 1, 0, 0),
    ("a.com", "https://a.com/blog/2024-03-01/hello", 3, 0, 0, 1),
    ("t.com", "https://t.com/cal/2020/05/cal/2020/05?p=1&q=2&r=3", 6, 3, 1, 1),
    ("t.com", "https://t.com/item/123/item/456", 4, 0, 1, 0),
    ("t.com", "https://t.com/item/124/item/457", 4, 0, 1, 0),
]


def _df(spark):
    return spark.createDataFrame(
        [(h, u) for h, u, *_ in URLS], "host string, url string"
    )


def test_url_shape_features(spark):
    rows = {
        r["url"]: r for r in url_shape_features(_df(spark)).collect()
    }
    for host, url, depth, n_params, repeat, date in URLS:
        r = rows[url]
        got = (r["depth"], r["n_params"], r["has_repeat_seg"], r["has_date_seg"])
        assert got == (depth, n_params, repeat, date), url
    # digit normalization: both /item/NNN urls share one template
    t = {r["template"] for u, r in rows.items() if "/item/" in u}
    assert t == {"/item/N/item/N"}


def test_host_trap_profile_exact(spark):
    prof = {r["host"]: r for r in host_trap_profile(_df(spark)).collect()}
    a, t = prof["a.com"], prof["t.com"]
    assert a["n_urls"] == 4 and t["n_urls"] == 3
    assert a["mean_depth"] == (0 + 1 + 2 + 3) / 4
    assert t["mean_depth"] == (6 + 4 + 4) / 3
    assert t["repeat_frac"] == 1.0 and a["repeat_frac"] == 0.0
    assert t["mean_params"] == 1.0
    # t.com: 3 distinct paths but only 2 templates -> explosion 1.5
    assert (t["n_paths"], t["n_templates"]) == (3, 2)
    assert t["explosion"] == 1.5
    assert a["explosion"] == 1.0
    # approx path returns the same shape (HLL exact at this cardinality)
    approx = {
        r["host"]: r for r in host_trap_profile(_df(spark), exact=False).collect()
    }
    assert set(approx) == {"a.com", "t.com"}


def test_trap_hosts_thresholds(spark):
    prof = host_trap_profile(_df(spark))
    # min_urls below host sizes, thresholds that only t.com trips
    v = {
        r["host"]: r
        for r in trap_hosts(
            prof,
            min_urls=3,
            max_repeat_frac=0.5,
            max_mean_depth=4.0,
            max_mean_params=2.0,
            max_explosion=1.2,
        ).collect()
    }
    assert v["t.com"]["is_trap"] and not v["a.com"]["is_trap"]
    assert v["t.com"]["repetitive"] and v["t.com"]["exploding"]
    # below min_urls nothing is flagged however bad the shape
    safe = trap_hosts(prof, min_urls=100, max_repeat_frac=0.0)
    assert safe.filter("is_trap").count() == 0


def test_engine_trap_report_and_pause(spark):
    world = make_world(seed=7, n_hosts=3, n_urls=12, budget=4, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="traps_"))
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=8)
    rep = eng.trap_report()
    assert rep.count() == 3  # one row per (host, site)
    assert {f.name for f in rep.schema.fields} >= {"host", "site", "is_trap"}
    # sane synthetic world: nothing flagged at default thresholds
    assert rep.filter("is_trap").count() == 0
    # absurd thresholds -> every site pauses in one control commit,
    # and a subsequent round schedules nothing
    bad = eng.pause_trap_sites(min_urls=1, max_mean_depth=-1.0)
    assert len(bad) == 3
    ctl = eng.io.read(spark, "engine_control")
    assert ctl.filter("paused").count() == 3
    res = eng.run_round(eng.io.last_round() + 1, t)
    assert res["scheduled"] == 0
    # reversible: resume one site and it crawls again
    eng.resume_site(bad[0])
    assert eng.io.read(spark, "engine_control").filter("paused").count() == 2
