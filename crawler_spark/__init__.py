"""crawler_spark — a from-scratch PySpark-native URL-frontier + fetch-scheduler engine.

Re-imagines the crawl/extract semantics of the reference crawler
(oidebrett/crawler, see SURVEY.md) as pure DataFrame jobs:

- every piece of state (frontier, URL-seen set, documents, extracted
  records, entity keys, metrics, host backoff) is a snapshot table;
- one scheduling "round" == one politeness quantum == one atomic
  multi-table commit;
- all randomness is replaced by seeded hashes so runs are deterministic,
  resumable bit-identically, and checkable against a pure-Python oracle.

Layout:
    session.py        SparkSession factory (local[N] tuned)
    schemas.py        fixed StructTypes for every engine table
    functions/        vectorized URL/text/JSON-LD kernels (Arrow UDFs + builtins)
    world.py          deterministic synthetic web generator (fixtures)
    io/               snapshot table IO (parquet manifest now, Iceberg on cluster)
    operators/        scheduling, dedup (exact + Bloom), fetch sim, extraction,
                      discovery, reconcile, text-dedup, ANN, multimodal
    engine.py         the round loop (CrawlEngine)
    oracle.py         pure-Python reference-semantics oracle for equality tests
"""

__version__ = "0.1.0"
