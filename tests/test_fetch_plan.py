"""Snake-LPT fetch planner tests (scheduler.plan_fetch_partitions)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.scheduler import bin_loads, plan_fetch_partitions


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: one huge host, a hot head, a long uniform tail
    rows = [("big.example", 1000)]
    rows += [(f"head{i}.example", 200 - i) for i in range(20)]
    rows += [(f"tail{i:03d}.example", 3) for i in range(200)]
    return spark.createDataFrame(rows, ["host", "cost"])


def test_rank_is_cost_desc_and_snake_formula(spark):
    df = spark.createDataFrame(
        [(f"h{i}", 10 - i) for i in range(8)], ["host", "cost"]
    )
    out = {r["host"]: r for r in plan_fetch_partitions(df, n_bins=2).collect()}
    # ranks follow cost desc; snake over 2 bins: 0,1,1,0,0,1,1,0
    assert [out[f"h{i}"]["rank"] for i in range(8)] == list(range(1, 9))
    assert [out[f"h{i}"]["bin"] for i in range(8)] == [0, 1, 1, 0, 0, 1, 1, 0]


def test_balance_within_one_max_cost(skewed):
    plan = plan_fetch_partitions(skewed, n_bins=8)
    loads = [r["total_cost"] for r in bin_loads(plan).collect()]
    assert len(loads) == 8
    max_cost = 1000
    assert max(loads) - min(loads) <= max_cost
    # and the tail sweeps are genuinely even: drop the giant's bin and
    # the rest must sit within one head-host cost of each other
    rest = sorted(loads)[:-1]
    assert max(rest) - min(rest) <= 200


def test_snake_beats_modulo_on_monotone_costs(spark):
    # geometric costs: modulo assignment piles the big items on low
    # bins; snake pairs each big rank with a small one
    from pyspark.sql import Window

    rows = [(f"h{i:02d}", 2 ** (12 - i)) for i in range(13)]
    df = spark.createDataFrame(rows, ["host", "cost"])
    loads = [
        r["total_cost"]
        for r in bin_loads(plan_fetch_partitions(df, n_bins=4)).collect()
    ]
    snake_spread = max(loads) - min(loads)
    naive = df.withColumn(
        "bin",
        (F.row_number().over(Window.orderBy(F.desc("cost"), "host")) - 1) % 4,
    )
    loads_naive = [
        r["t"] for r in naive.groupBy("bin").agg(F.sum("cost").alias("t")).collect()
    ]
    assert snake_spread < max(loads_naive) - min(loads_naive)


def test_large_path_equals_window_path(skewed, monkeypatch):
    import crawler_spark.operators.scheduler as sched

    small = plan_fetch_partitions(skewed, n_bins=8).collect()
    monkeypatch.setattr(sched, "SMALL_ORDER_ROWS", 0)
    reg: list = []
    large = plan_fetch_partitions(skewed, n_bins=8, persist_registry=reg).collect()
    for df in reg:
        df.unpersist()
    key = lambda rows: sorted((r["host"], r["cost"], r["rank"], r["bin"]) for r in rows)
    assert key(small) == key(large)


def test_small_path_plan_has_single_partition_window_only_here(skewed):
    # the small path IS a single window; the large path must not be —
    # pinned by test_large_path equality + the assigner's own plan test
    plan = plan_fetch_partitions(skewed, n_bins=4)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "Window" in s
