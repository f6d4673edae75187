"""Largest-remainder budget apportionment + engine host-budget overrides."""

import tempfile

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.operators.scheduler import apportion_budget
from crawler_spark.world import make_world


def _py_apportion(weights: dict, total: int) -> dict:
    W = sum(max(w, 0) for w in weights.values())
    if W == 0 or total == 0:
        return {k: 0 for k in weights}
    base = {k: total * max(w, 0) // W for k, w in weights.items()}
    rem = {k: total * max(w, 0) % W for k, w in weights.items()}
    leftover = total - sum(base.values())
    for k in sorted(weights, key=lambda k: (-rem[k], k))[:leftover]:
        base[k] += 1
    return base


@pytest.mark.parametrize(
    "weights,total",
    [
        ({"a": 5, "b": 3, "c": 2}, 10),
        ({"a": 1, "b": 1, "c": 1}, 2),  # tie remainders -> key order
        ({"a": 7, "b": 0, "c": -4, "d": 13}, 97),  # zero/negative weights
        ({f"h{i:03d}": (i * 37) % 11 for i in range(50)}, 101),
    ],
)
def test_apportion_matches_python_reference(spark, weights, total):
    df = spark.createDataFrame(list(weights.items()), "host string, weight long")
    got = {r["host"]: r["budget"] for r in apportion_budget(df, total).collect()}
    assert got == _py_apportion(weights, total)
    assert sum(got.values()) == (total if any(w > 0 for w in weights.values()) else 0)


def test_apportion_quota_property(spark):
    """Hamilton's method: every budget within 1 of the ideal share."""
    weights = {f"h{i}": i + 1 for i in range(20)}
    total, W = 57, sum(weights.values())
    df = spark.createDataFrame(list(weights.items()), "host string, weight long")
    got = {r["host"]: r["budget"] for r in apportion_budget(df, total).collect()}
    for k, w in weights.items():
        ideal = total * w / W
        assert ideal - 1 < got[k] < ideal + 1


def test_apportion_partitioning_invariance(spark):
    weights = [(f"h{i:04d}", (i * 131) % 17) for i in range(300)]
    df = spark.createDataFrame(weights, "host string, weight long")
    a = sorted(map(tuple, apportion_budget(df.repartition(1), 211).collect()))
    b = sorted(map(tuple, apportion_budget(df.repartition(13), 211).collect()))
    assert a == b


def test_apportion_degenerate(spark):
    df = spark.createDataFrame([("a", 0), ("b", 0)], "host string, weight long")
    assert {r["budget"] for r in apportion_budget(df, 10).collect()} == {0}
    df2 = spark.createDataFrame([("a", 5)], "host string, weight long")
    assert apportion_budget(df2, 0).collect()[0]["budget"] == 0
    with pytest.raises(ValueError):
        apportion_budget(df2, -1)


def test_engine_host_budget_override_focuses_crawl(spark):
    """set_host_budgets: granting budget to ONE host idles the others;
    raising a host's budget past the robots cap schedules more per
    round (the window bound follows the override max)."""
    world = make_world(seed=41, n_hosts=3, n_urls=30, budget=1, burst=False)
    t = world.to_spark(spark)
    hosts = sorted(world.hosts)
    fav = hosts[0]

    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="apportion-"))
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng._control_rows = t["control"].collect()
    eng.set_host_budgets(
        spark.createDataFrame([(fav, 4)], "host string, budget long")
        .unionByName(
            spark.createDataFrame(
                [(h, 0) for h in hosts[1:]], "host string, budget long"
            )
        )
    )
    eng.run(t, max_rounds=3)
    order = eng.io.read(spark, "crawl_order")
    by_host = {
        r["h"]: r["n"]
        for r in order.join(
            t["web"].select("url", F.col("host").alias("h")).distinct(), "url"
        )
        .groupBy("h")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(by_host) == {fav}
    # 4 per round despite robots budget 1 (until the host runs dry)
    first_round = order.filter(F.col("round") == 1).count()
    assert first_round == 4
