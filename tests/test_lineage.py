"""Per-partition lineage (north rule): every round's commit records
bucketed row counts that must reconcile with the tables themselves."""

from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


def test_lineage_reconciles(spark, tmp_path):
    world = make_world(seed=61, n_hosts=3, n_urls=18, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path), embed_dim=0)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=6)
    lineage = eng.io.read(spark, "lineage")
    seen = eng.io.read(spark, "seen")
    docs = eng.io.read(spark, "documents")
    # totals reconcile
    ln = {r.table: r.s for r in lineage.groupBy("table").agg(F.sum("rows").alias("s")).collect()}
    assert ln["seen"] == seen.count()
    assert ln["documents"] == docs.count()
    # per-(round, bucket) seen lineage matches recomputation from the table
    got = {
        (r.round, r.bucket): r.s
        for r in lineage.filter(F.col("table") == "seen")
        .groupBy("round", "bucket")
        .agg(F.sum("rows").alias("s"))
        .collect()
    }
    want = {
        (r.fetched_round, r.bucket): r.s
        for r in seen.withColumn("bucket", F.pmod("h64", F.lit(eng.n_lineage_buckets)).cast("int"))
        .groupBy("fetched_round", "bucket")
        .agg(F.count("*").alias("s"))
        .collect()
    }
    assert got == want
    # buckets are reasonably balanced (hash-uniform)
    per_bucket = [r.s for r in lineage.filter(F.col("table") == "seen")
                  .groupBy("bucket").agg(F.sum("rows").alias("s")).collect()]
    assert len(per_bucket) > 1
