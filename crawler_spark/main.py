"""spark-submit entry point (north rule: ships via --py-files).

Cluster:
    zip -r crawler_spark.zip crawler_spark
    spark-submit --py-files crawler_spark.zip crawler_spark/main.py \
        --data-dir /data/crawl --rounds 50 --mode scaled --bloom \
        [--iceberg-catalog my_catalog]   # snapshot store -> Iceberg

Sandbox (local[N]):
    python -m crawler_spark.main --hosts 10 --urls 100 --rounds 20

With no real web to fetch, the job crawls the deterministic synthetic
world (world.make_world); on a cluster the fetch step is swapped for
the HTTP mapInPandas operator (operators.fetch.fetch_via_http).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def build_args(argv=None):
    p = argparse.ArgumentParser(description="crawler_spark round-loop driver")
    p.add_argument("--data-dir", default=None, help="snapshot root (default: temp dir)")
    p.add_argument("--rounds", type=int, default=20)
    p.add_argument("--mode", choices=["reference", "scaled"], default="scaled")
    p.add_argument("--bloom", action="store_true", help="bloom-prefiltered dedup")
    p.add_argument("--hosts", type=int, default=10)
    p.add_argument("--urls", type=int, default=200)
    p.add_argument("--budget", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--url-filter", default=None)
    p.add_argument("--indexes", action="store_true",
                   help="maintain the incremental indexes in the round loop "
                        "(near-dup signatures, media pHash, page vectors, "
                        "inverted postings, link graph)")
    p.add_argument("--revalidate", action="store_true",
                   help="after the crawl, run a conditional-GET revalidation "
                        "pass over every fetched URL (implies change "
                        "tracking); changed pages re-enter the frontier and "
                        "are refetched by a follow-up round loop")
    p.add_argument("--dup-clusters", action="store_true",
                   help="fold newly signed docs into the incremental "
                        "dup_clusters assignment after the run "
                        "(implies --indexes)")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = build_args(argv)
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.session import get_spark
    from crawler_spark.world import make_world

    spark = get_spark(app="crawler-spark", cpus=args.cpus)
    world = make_world(
        seed=args.seed, n_hosts=args.hosts, n_urls=args.urls, budget=args.budget
    )
    tables = world.to_spark(spark)
    root = args.data_dir or tempfile.mkdtemp(prefix="crawler-spark-")
    idx = (
        dict(dedup_index=True, vector_index=True, embed_dim=16,
             lexical_index=True, record_edges=True)
        if args.indexes or args.dup_clusters
        else {}
    )
    if args.revalidate:
        idx["track_changes"] = True
    eng = CrawlEngine(spark, root, mode=args.mode, use_bloom=args.bloom, **idx)
    if eng.io.current_version() < 0:
        eng.seed(
            discover_frontier(
                tables["seeds"], tables["robots"], tables["sitemaps"], args.url_filter
            )
        )
    history = eng.run(tables, max_rounds=args.rounds)
    fetched = sum(h.get("fetched", 0) for h in history)
    summary = {
        "root": root,
        "rounds": len(history),
        "fetched": fetched,
        "seen": eng.io.read(spark, "seen").count(),
        "records": eng.io.read(spark, "records").count(),
        "resumable_from": eng.io.last_round(),
    }
    if args.revalidate:
        summary["revalidate"] = eng.revalidate(world=tables)
        if summary["revalidate"]["changed"]:
            eng.run(tables, max_rounds=eng.io.last_round() + args.rounds)
    if args.dup_clusters:
        summary["dup_clusters"] = eng.update_dup_clusters()
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
