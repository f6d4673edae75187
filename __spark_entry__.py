"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every SQL-expressible operator family from
SURVEY.md §2 (scheduling windows, seen anti-joins, broadcast dim joins,
aggregations, top-k, CASE dispatch, JSON access, set ops) plus the
training-data pipeline ops (exact/minhash-LSH/simhash/jaccard dedup,
ANN cosine search, LSH bucketing, text quality/lang-id/fingerprint)
over the driver testdata tables. `oracle_sql()` carries the DuckDB twin
of each.

Engine/oracle parity rules used throughout:
- double aggregates route through DECIMAL (exact) and cast back to
  double, so parallel FP summation order can't flip a rounded digit;
- timestamps compare as epoch seconds (UTC session pinned);
- every ordering has an explicit unique tie-break;
- md5 hex (lowercase in both engines) is the shared hash primitive —
  fixed-width hex compares like the integer it encodes, so minhash
  needs no int conversion.

Non-SQL-expressible entries (full crawl round on the synthetic world,
multimodal decode) return rows-only checks per the driver contract.
"""

from __future__ import annotations

import functools
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"
# The driver contract runs queries-vs-oracles at sf=0.01. The
# generated replay oracles (bpe_merges, ivf_kmeans_topk) read their
# input at BUILD time, before any sf_dir is known, so they pin this
# dir explicitly; tests/test_entry_oracle.py asserts its own SF_DIR
# equals this constant so a contract change fails loudly instead of
# silently certifying against the wrong scale factor.
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread across cores: the sandbox SF files are single
    parquet files (1 input partition), which would serialize the heavy
    per-document ops (shingling, hashing). At real scale the table has
    many files and this repartition is a no-op cost-wise."""
    n = spark.sparkContext.defaultParallelism
    return _t(spark, sf_dir, "documents").repartition(n, "doc_id")


def _events_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events, spread across cores — same rationale as _docs_wide for
    entries with heavy per-row projections (URL synthesis + regexes)."""
    n = spark.sparkContext.defaultParallelism
    return _t(spark, sf_dir, "events").repartition(n, "event_id")


def _dec(c, scale: int = 6):
    """Exact-sum trick: aggregate in DECIMAL, emit double."""
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double")


# --------------------------------------------------------------------------
# crawl-engine operator queries (SURVEY.md §2) over the events/orders tables
# --------------------------------------------------------------------------


def _frontier_view(spark, sf_dir):
    """events -> a synthetic frontier: url/host derived from ids.
    Mirrors the engine's frontier shape so the scheduling operators run
    on driver data with a SQL oracle."""
    e = _t(spark, sf_dir, "events")
    host = F.concat(
        F.lit("h"), F.lpad(F.pmod(F.col("user_id"), F.lit(50)).cast("string"), 3, "0"),
        F.lit(".example.com"),
    )
    url = F.concat(
        F.lit("https://"), host, F.lit("/e/"),
        F.lpad(F.col("event_id").cast("string"), 8, "0"),
    )
    return e.select("event_id", "user_id", host.alias("host"), url.alias("url"))


_FRONTIER_SQL = """
    SELECT event_id, user_id,
           'h' || lpad((user_id % 50)::VARCHAR, 3, '0') || '.example.com' AS host,
           'https://' || 'h' || lpad((user_id % 50)::VARCHAR, 3, '0') || '.example.com'
               || '/e/' || lpad(event_id::VARCHAR, 8, '0') AS url
    FROM events
"""


def q_frontier_schedule_round(spark, sf_dir):
    """Flagship: one scheduling round — J1 seen anti-join + O-SCHED3
    host-budget window + O-SCHED1 canonical (rank, host, url) order.

    Post-budget bound here is 50 hosts x rank<=2 = 100 rows, so the
    one-job window orders it (the engine's small-bound path). The
    >1M-row scale path is scheduler.assign_global_seq (range partitions
    + broadcast offsets, no single-partition exchange) — identical seq
    values, plan-asserted in tests/test_plans.py."""
    fr = _frontier_view(spark, sf_dir)
    seen = _t(spark, sf_dir, "orders").filter(F.pmod("o_custkey", F.lit(3)) == 0).select(
        F.col("o_custkey").alias("user_id")
    ).distinct()
    cand = fr.join(seen, "user_id", "left_anti")
    w_host = Window.partitionBy("host").orderBy("url")
    lim = cand.withColumn("rank_in_host", F.row_number().over(w_host)).filter(
        F.col("rank_in_host") <= 2
    )
    w_all = Window.orderBy("rank_in_host", "host", "url")
    return lim.withColumn("seq", F.row_number().over(w_all).cast("long")).select(
        "seq", F.col("rank_in_host").cast("long").alias("rank_in_host"), "host", "url"
    )


_Q_FRONTIER_SCHEDULE_SQL = f"""
    WITH frontier AS ({_FRONTIER_SQL}),
    cand AS (
        SELECT * FROM frontier f
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey % 3 = 0 AND o.o_custkey = f.user_id)
    ),
    lim AS (
        SELECT *, row_number() OVER (PARTITION BY host ORDER BY url) AS rank_in_host
        FROM cand QUALIFY rank_in_host <= 2
    )
    SELECT row_number() OVER (ORDER BY rank_in_host, host, url) AS seq,
           rank_in_host, host, url
    FROM lim
"""


def q_seen_antijoin(spark, sf_dir):
    """J1: candidates minus seen set (left_anti ≡ NOT EXISTS)."""
    e = _t(spark, sf_dir, "events")
    seen = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    return e.join(
        seen.select(F.col("o_custkey").alias("user_id")).distinct(), "user_id", "left_anti"
    ).select("event_id", "user_id")


_Q_SEEN_ANTIJOIN_SQL = """
    SELECT event_id, user_id FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey < 100 AND o.o_custkey = e.user_id)
"""


def q_host_budget_window(spark, sf_dir):
    """O-SCHED3: per-key budget via row_number window (first 3 events
    per user by time)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("user_id", "rk", "event_id")
    )


_Q_HOST_BUDGET_SQL = """
    SELECT user_id, rk, event_id FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        FROM events) WHERE rk <= 3
"""


def q_tombstone_except(spark, sf_dir):
    """J5/U2: stored − current (customers whose key vanished from the
    current set — here: no high-value order), EXCEPT via left_anti."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")).distinct(), "c_custkey", "left_anti"
    ).select("c_custkey")


_Q_TOMBSTONE_SQL = """
    SELECT c_custkey FROM customer
    EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
"""


def q_broadcast_dim_join(spark, sf_dir):
    """J7: fact × broadcast dims (orders → customer → nation rollup)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(_dec(F.col("o_totalprice"), 2), 2).alias("revenue"),
        )
    )


_Q_BROADCAST_DIM_SQL = """
    SELECT n_name, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


def q_type_counts(spark, sf_dir):
    """A1 analog: per-(lang, source) document counts."""
    return _t(spark, sf_dir, "documents").groupBy("lang", "source").agg(
        F.count("*").alias("n")
    )


_Q_TYPE_COUNTS_SQL = "SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source"


def q_error_counts(spark, sf_dir):
    """A2 analog: per-code counts."""
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("n"))


_Q_ERROR_COUNTS_SQL = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"


def q_global_summary(spark, sf_dir):
    """A6/A7: global rollup with derived percentages."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars") / F.count("*"), 4).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


_Q_GLOBAL_SUMMARY_SQL = """
    SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(sum(n_chars) / count(*), 4) AS avg_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents
"""


def q_top_k_recent(spark, sf_dir):
    """T2/T3: newest-first top-k with explicit tie-break."""
    e = _t(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts_str"),
            "event_type",
            "value",
        )
    )


_Q_TOP_K_SQL = """
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS ts_str, event_type, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 100
"""


def q_error_categorize(spark, sf_dir):
    """P8: CASE WHEN dispatch chain."""
    e = _t(spark, sf_dir, "events")
    cat = (
        F.when(F.col("event_type") == "error", "failure")
        .when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type") == "purchase", "conversion")
        .otherwise("lifecycle")
    )
    return e.groupBy(cat.alias("category")).agg(F.count("*").alias("n"))


_Q_ERROR_CATEGORIZE_SQL = """
    SELECT CASE WHEN event_type = 'error' THEN 'failure'
                WHEN event_type IN ('click', 'view') THEN 'engagement'
                WHEN event_type = 'purchase' THEN 'conversion'
                ELSE 'lifecycle' END AS category,
           count(*) AS n
    FROM events GROUP BY 1
"""


def q_json_extract(spark, sf_dir):
    """F6: schema-on-read JSON access (props payload column)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


_Q_JSON_EXTRACT_SQL = """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS n
    FROM events GROUP BY 1
"""


def q_sessionize(spark, sf_dir):
    """Sessionization: lag-gap window (>1h starts a new session)."""
    e = _t(spark, sf_dir, "events").withColumn("ts_ms", F.unix_millis(F.to_utc_timestamp(F.col("ts"), "UTC")))
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    return (
        e.withColumn("new_sess", F.when(gap > 3600000, 1).otherwise(0))
        .groupBy("user_id")
        .agg(
            (F.sum(F.col("new_sess")) + 1).cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


_Q_SESSIONIZE_SQL = """
    SELECT user_id, CAST(sum(new_sess) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM (
        SELECT user_id,
               CASE WHEN epoch_ms(ts)
                         - lag(epoch_ms(ts)) OVER
                           (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                         > 3600000 THEN 1 ELSE 0 END AS new_sess
        FROM events)
    GROUP BY user_id
"""


def q_event_windows(spark, sf_dir):
    """Event-time tumbling-window aggregation (ST5 extension): the batch
    twin of the watermarked streaming fetch-rate windows."""
    from crawler_spark.operators.windows import event_tumbling_agg

    return event_tumbling_agg(_t(spark, sf_dir, "events"), "10 minutes")


_Q_EVENT_WINDOWS_SQL = """
    SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT) AS w_start,
           event_type, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: the classic pricing summary (decimal-exact)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(_dec(F.col("l_quantity")), 2).alias("sum_qty"),
            F.round(_dec(F.col("l_extendedprice")), 2).alias("sum_base_price"),
            F.round(_dec(disc), 2).alias("sum_disc_price"),
            F.round(_dec(charge), 2).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


_Q_TPCH_Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 2)
           AS sum_disc_price,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6)))
           AS DOUBLE), 2) AS sum_charge,
       count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


def q_rollup_summary(spark, sf_dir):
    """Grouping-set rollup over lineitem flags."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(_dec(F.col("l_quantity")), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


_Q_ROLLUP_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# training-data pipeline queries (documents/embeddings tables)
# --------------------------------------------------------------------------

_TOKENS_SQL = """
    tokens AS (
        SELECT doc_id, unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS tok
        FROM documents WHERE length(trim(text)) > 0
    )
"""

# 3-word shingles (minhash/LSH/jaccard unit; mirrors textdedup.shingles)
_SHINGLES_SQL = """
    words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
        WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3
    ),
    tokens AS (
        SELECT doc_id,
               unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     for i in generate_series(1, len(w) - 2)])) AS tok
        FROM words
    )
"""


def q_dedup_exact(spark, sf_dir):
    from crawler_spark.operators.textdedup import dedup_exact

    return dedup_exact(_docs_wide(spark, sf_dir))


_Q_DEDUP_EXACT_SQL = """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text)
"""


def q_minhash_signatures(spark, sf_dir):
    from crawler_spark.operators.textdedup import minhash_signatures

    return minhash_signatures(_docs_wide(spark, sf_dir))


_MH_COLS = ",\n".join(
    f"           min(substr(md5('{i}' || ':' || tok), 1, 15)) AS mh{i}" for i in range(8)
)
_Q_MINHASH_SQL = f"""
    WITH {_SHINGLES_SQL}
    SELECT doc_id,
{_MH_COLS}
    FROM tokens GROUP BY doc_id
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    from crawler_spark.operators.textdedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs_wide(spark, sf_dir))


_Q_LSH_PAIRS_SQL = f"""
    WITH {_SHINGLES_SQL},
    sig AS (
        SELECT doc_id,
{_MH_COLS}
        FROM tokens GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, mh0 || '|' || mh1 AS band_key FROM sig
        UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
        UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
        UNION ALL SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig
    )
    SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
    FROM bands a JOIN bands c
      ON a.band_idx = c.band_idx AND a.band_key = c.band_key AND a.doc_id < c.doc_id
"""


def q_lsh_hot_buckets(spark, sf_dir):
    """The hot-bucket guard's audit complement (no-silent-caps): band
    buckets wider than max_bucket, with exact width and one sample
    member — constant state per bucket, no pair expansion. max_bucket=1
    here so the small-SF corpus yields real rows (every multi-doc
    bucket); production uses the guard default far above healthy
    widths."""
    from crawler_spark.operators.textdedup import lsh_hot_buckets

    return lsh_hot_buckets(_docs_wide(spark, sf_dir), max_bucket=1).select(
        "band_idx", "band_key", "n_ids", "sample_id"
    )


_Q_LSH_HOT_BUCKETS_SQL = f"""
    WITH {_SHINGLES_SQL},
    sig AS (
        SELECT doc_id,
{_MH_COLS}
        FROM tokens GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, mh0 || '|' || mh1 AS band_key FROM sig
        UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
        UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
        UNION ALL SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig
    )
    SELECT band_idx, band_key, CAST(COUNT(*) AS BIGINT) AS n_ids,
           MIN(doc_id) AS sample_id
    FROM bands GROUP BY band_idx, band_key HAVING COUNT(*) > 1
"""


def q_minhash_calibration(spark, sf_dir):
    """Detector calibration, measured not guessed: per LSH candidate
    pair, the k=8 minhash similarity ESTIMATE next to the EXACT shingle
    Jaccard, both exact-integer ppm (textdedup.minhash_calibration).
    The exact side is restricted to the detector's own candidates, so
    cost is bounded by LSH output — never all-pairs."""
    from crawler_spark.operators.textdedup import minhash_calibration

    return minhash_calibration(_docs_wide(spark, sf_dir))


_MH_AGREE_SQL = " + ".join(
    f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(8)
)
_Q_MINHASH_CALIBRATION_SQL = f"""
    WITH {_SHINGLES_SQL},
    sig AS (
        SELECT doc_id,
{_MH_COLS}
        FROM tokens GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, mh0 || '|' || mh1 AS band_key FROM sig
        UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
        UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
        UNION ALL SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        FROM bands a JOIN bands c
          ON a.band_idx = c.band_idx AND a.band_key = c.band_key
         AND a.doc_id < c.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM tokens GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM tokens a
        JOIN tokens b ON a.tok = b.tok AND a.doc_id < b.doc_id
        JOIN pairs p ON p.doc_a = a.doc_id AND p.doc_b = b.doc_id
        GROUP BY 1, 2
    ),
    est AS (
        SELECT p.doc_a, p.doc_b,
               CAST({_MH_AGREE_SQL} AS INTEGER) AS mh_agree
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b
    )
    SELECT e.doc_a, e.doc_b, e.mh_agree,
           CAST((e.mh_agree * 1000000) // 8 AS BIGINT) AS est_e6,
           CAST((COALESCE(i.inter, 0) * 1000000)
                // (za.sz + zb.sz - COALESCE(i.inter, 0)) AS BIGINT) AS jaccard_e6,
           CAST(abs((e.mh_agree * 1000000) // 8
                - (COALESCE(i.inter, 0) * 1000000)
                  // (za.sz + zb.sz - COALESCE(i.inter, 0))) AS BIGINT) AS err_e6
    FROM est e
    LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    JOIN sizes za ON za.doc_id = e.doc_a
    JOIN sizes zb ON zb.doc_id = e.doc_b
"""


def q_minhash_lsh_pairs_cached(spark, sf_dir):
    """The production two-step shape (round-2 NOTES item 5): the
    signature table is computed ONCE and persisted (here: parquet temp),
    and the pairs query consumes it — band-explode + one groupBy, no
    shingle pipeline. Same oracle as minhash_lsh_pairs: caching must not
    change a single pair."""
    from crawler_spark.operators.textdedup import minhash_lsh_pairs, minhash_signatures

    sig_dir = _sig_cache_dir("mh-sigs", sf_dir)
    minhash_signatures(_docs_wide(spark, sf_dir)).write.mode("overwrite").parquet(sig_dir)
    return minhash_lsh_pairs(signatures=spark.read.parquet(sig_dir))


def _sig_cache_dir(tag: str, sf_dir: str) -> str:
    """Deterministic signature-cache location: one dir per (kind,
    sf_dir), overwritten on each run — repeated certification runs
    reuse it instead of leaking a fresh mkdtemp every invocation."""
    import hashlib
    import os
    import tempfile

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{tag}-{key}")


def q_simhash(spark, sf_dir):
    from crawler_spark.operators.textdedup import simhash

    return simhash(_docs_wide(spark, sf_dir))


# 64-bit signature: bits 0-31 from md5(tok)'s hex digits, 32-63 from the
# seeded md5('1:'||tok) — mirrors textdedup.simhash exactly
_SIMHASH_SRC = {0: "md5(tok)", 1: "md5('1' || ':' || tok)"}
_SIMHASH_BITS_SQL = " || ".join(
    f"(CASE WHEN sum(CASE WHEN substr({_SIMHASH_SRC[j // 32]}, {j % 32 + 1}, 1) >= '8'"
    f" THEN 1 ELSE -1 END) >= 0 THEN '1' ELSE '0' END)"
    for j in range(64)
)
_Q_SIMHASH_SQL = f"""
    WITH {_TOKENS_SQL}
    SELECT doc_id, {_SIMHASH_BITS_SQL} AS simhash
    FROM tokens GROUP BY doc_id
"""


def q_simhash_near_dup(spark, sf_dir):
    """Simhash near-dup PAIRS (Hamming <= 3), Manku-blocked: 4 blocks
    of 16 bits bucket the candidates (pigeonhole: any pair within
    Hamming 3 shares a block — lossless; 16-bit values keep buckets
    selective where 8-bit ones saturated at 256 values), streamed
    block self-join + exact bit_count Hamming prune — never all-pairs."""
    from crawler_spark.operators.textdedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_docs_wide(spark, sf_dir), max_hamming=3)


def q_simhash_near_dup_cached(spark, sf_dir):
    """Production two-step shape (mirrors minhash_lsh_pairs_cached):
    the simhash signature table AND its hot-block guard keys persist
    once at index-build time (hot keys are a pure function of the
    signature table — the stop-shingle pattern), so the near-dup query
    pays only block-join + Hamming cost, no per-call bucket-size
    aggregate. Same oracle as simhash_near_dup: caching must not
    change a single pair."""
    from crawler_spark.operators.textdedup import (
        simhash,
        simhash_hot_blocks,
        simhash_near_dup_pairs,
    )

    sig_dir = _sig_cache_dir("sh-sigs", sf_dir)
    hot_dir = _sig_cache_dir("sh-hot", sf_dir)
    simhash(_docs_wide(spark, sf_dir)).write.mode("overwrite").parquet(sig_dir)
    sigs = spark.read.parquet(sig_dir)
    simhash_hot_blocks(sigs).write.mode("overwrite").parquet(hot_dir)
    return simhash_near_dup_pairs(
        max_hamming=3,
        signatures=sigs,
        hot_blocks=spark.read.parquet(hot_dir),
    )


_Q_SIMHASH_NEAR_DUP_SQL = f"""
    WITH {_TOKENS_SQL},
    sig AS (SELECT doc_id, {_SIMHASH_BITS_SQL} AS s FROM tokens GROUP BY doc_id),
    blocks AS (
        SELECT doc_id, s, i AS block_idx, substr(s, i*8 + 1, 8) AS block_val
        FROM sig, (SELECT unnest(generate_series(0, 7)) AS i)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
        FROM blocks a JOIN blocks b
          ON a.block_idx = b.block_idx AND a.block_val = b.block_val
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM (
        SELECT doc_a, doc_b,
               CAST(list_sum([CASE WHEN sa[i] <> sb[i] THEN 1 ELSE 0 END
                              for i in generate_series(1, 64)]) AS INT) AS hamming
        FROM cand
    ) WHERE hamming <= 3
"""


def _media_rows(spark, sf_dir):
    """Synthetic media table for the pHash entries: one image row per
    document, payload = utf8 bytes of the text (deterministic stand-in;
    the engine's real media rows come from crawl span media_refs)."""
    return _docs_wide(spark, sf_dir).select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


# hex-payload char-8-gram token stream (mirrors multimodal.media_phash:
# hex -> char_ngrams(n=8) -> distinct), shared by both media oracles
_MEDIA_TOKENS_SQL = """
    media AS (
        SELECT 'm' || CAST(doc_id AS VARCHAR) AS doc_id,
               regexp_replace(lower(hex(encode(text))), '\\s+', ' ', 'g') AS t
        FROM documents
    ),
    tokens AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(list_distinct([substr(t, i, 8)
                       for i in generate_series(1, greatest(length(t) - 7, 1))])) AS tok
            FROM media
        ) WHERE length(tok) = 8
    )
"""


def q_media_phash(spark, sf_dir):
    """Content-defined media fingerprint: 64-bit Charikar simhash over
    char 8-grams of the hex payload — dedup crawled media WITHOUT
    decoding it; locality-sensitive on payload bytes. All JVM-side."""
    from crawler_spark.operators.multimodal import media_phash

    return media_phash(_media_rows(spark, sf_dir))


_Q_MEDIA_PHASH_SQL = f"""
    WITH {_MEDIA_TOKENS_SQL}
    SELECT doc_id AS media_ref, {_SIMHASH_BITS_SQL} AS phash
    FROM tokens GROUP BY doc_id
"""


def q_media_near_dup(spark, sf_dir):
    """Near-duplicate media pairs by payload pHash Hamming <= 6 —
    the media twin of simhash_near_dup, same Manku block-bucketed
    join (8 blocks for Hamming<=7 losslessness), never all-pairs."""
    from crawler_spark.operators.multimodal import media_near_dup_pairs

    return media_near_dup_pairs(
        _media_rows(spark, sf_dir), max_hamming=6
    )


_Q_MEDIA_NEAR_DUP_SQL = f"""
    WITH {_MEDIA_TOKENS_SQL},
    sig AS (SELECT doc_id, {_SIMHASH_BITS_SQL} AS s FROM tokens GROUP BY doc_id),
    blocks AS (
        SELECT doc_id, s, i AS block_idx, substr(s, i*8 + 1, 8) AS block_val
        FROM sig, (SELECT unnest(generate_series(0, 7)) AS i)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS ref_a, b.doc_id AS ref_b, a.s AS sa, b.s AS sb
        FROM blocks a JOIN blocks b
          ON a.block_idx = b.block_idx AND a.block_val = b.block_val
         AND a.doc_id < b.doc_id
    )
    SELECT ref_a, ref_b, hamming FROM (
        SELECT ref_a, ref_b,
               CAST(list_sum([CASE WHEN sa[i] <> sb[i] THEN 1 ELSE 0 END
                              for i in generate_series(1, 64)]) AS INT) AS hamming
        FROM cand
    ) WHERE hamming <= 6
"""


def q_jaccard_pairs(spark, sf_dir):
    from crawler_spark.operators.textdedup import jaccard_pairs

    docs = _docs_wide(spark, sf_dir).filter(F.col("doc_id") < 300)
    return jaccard_pairs(docs, threshold=0.01, max_df=10**9)


_Q_JACCARD_SQL = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
        WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3 AND doc_id < 300
    ),
    tokens AS (
        SELECT doc_id,
               unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     for i in generate_series(1, len(w) - 2)])) AS tok
        FROM words
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM tokens GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM tokens a JOIN tokens b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.01
"""


def q_stop_shingles(spark, sf_dir):
    """Share-heavy shingles with exact counts via the bounded-state
    Misra-Gries two-pass (sketches.heavy_hitters over shingle arrays) —
    the stop-list jaccard_pairs(stop_list=) consumes so the guard
    needs NO full-vocabulary df shuffle at 10^9+ docs. phi = 200 ppm
    (the synthetic corpus is diverse; production uses smaller phi over
    vastly larger totals)."""
    from crawler_spark.operators.textdedup import stop_shingles

    return stop_shingles(_docs_wide(spark, sf_dir), phi_e6=200)


_Q_STOP_SHINGLES_SQL = r"""
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents
        WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 3
    ),
    tokens AS (
        SELECT doc_id,
               unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     for i in generate_series(1, len(w) - 2)])) AS tok
        FROM words
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tokens)
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
           CAST(max(tot.n) AS BIGINT) AS total_tokens
    FROM tokens, tot
    GROUP BY tok
    HAVING count(*) * 1000000 >= 200 * max(tot.n)
"""


def q_jaccard_pairs_guarded(spark, sf_dir):
    """The scale-safe Jaccard shape: stop-shingle guard ACTIVE (shingles
    with document frequency > max_df are dropped before the posting-list
    self-join — the quadratic-blowup protection). q_jaccard_pairs
    certifies exactness with the guard off; THIS entry certifies the
    guarded plan that the 100 TB path actually runs."""
    from crawler_spark.operators.textdedup import jaccard_pairs

    docs = _docs_wide(spark, sf_dir).filter(F.col("doc_id") < 300)
    return jaccard_pairs(docs, threshold=0.01, max_df=25)


_Q_JACCARD_GUARDED_SQL = """
    WITH words AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
        WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3 AND doc_id < 300
    ),
    raw_tokens AS (
        SELECT doc_id,
               unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     for i in generate_series(1, len(w) - 2)])) AS tok
        FROM words
    ),
    df_cap AS (SELECT tok FROM raw_tokens GROUP BY tok HAVING count(*) <= 25),
    tokens AS (SELECT t.doc_id, t.tok FROM raw_tokens t JOIN df_cap USING (tok)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM tokens GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM tokens a JOIN tokens b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.01
"""


def q_lsh_buckets(spark, sf_dir):
    from crawler_spark.operators.ann import lsh_buckets

    return lsh_buckets(_t(spark, sf_dir, "embeddings"), nbits=8)


_Q_LSH_BUCKETS_SQL = (
    "SELECT vec_id, "
    + " || ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8)
    )
    + " AS bucket FROM embeddings"
)


def q_ann_topk(spark, sf_dir):
    from crawler_spark.operators.ann import brute_force_topk

    return brute_force_topk(_t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5)


_Q_ANN_TOPK_SQL = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_dot_product(q.qv, e.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, rank, neighbor_id, round(cos, 4) AS score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5
"""


def q_stub_embedding(spark, sf_dir):
    """Deterministic hash-stub embedding components (downstream M7
    model stand-in), exploded to rows for engine-exact comparison."""
    from crawler_spark.operators.downstream import hash_embedding

    d = _docs_wide(spark, sf_dir)
    return d.select(
        "doc_id", F.posexplode(hash_embedding(F.col("text"), 4))
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("dim_i"),
        F.round(F.col("col").cast("double"), 6).alias("val"),
    )


_Q_STUB_EMBEDDING_SQL = """
    SELECT doc_id, i AS dim_i,
           round(round((('0x' || substr(md5(text || ':' || i), 1, 8))::BIGINT % 100000)
                 / 100000.0 - 0.5, 6)::FLOAT::DOUBLE, 6) AS val
    FROM documents, (SELECT unnest(generate_series(0, 3)) AS i)
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, LSH-blocked (the scale path:
    pairs only form inside a sign-LSH bucket)."""
    from crawler_spark.operators.ann import embedding_near_dup_pairs

    return embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.2, nbits=6)


_NEARDUP_BUCKET = " || ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(6)
)
_Q_EMBEDDING_NEAR_DUP_SQL = f"""
    WITH b AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v,
                      {_NEARDUP_BUCKET} AS bucket
               FROM embeddings),
    pairs AS (
        SELECT a.vid AS vec_a, c.vid AS vec_b,
               list_dot_product(a.v, c.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vid < c.vid
    )
    SELECT vec_a, vec_b, round(cos, 4) AS score FROM pairs WHERE cos >= 0.2
"""


def q_ivf_topk(spark, sf_dir):
    """IVF-flat ANN: probe the 2 nearest of 16 cells, exact re-rank
    inside them (the partition-pruned scale path beside LSH)."""
    from crawler_spark.operators.ann import ivf_topk

    return ivf_topk(_t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4],
                    k=5, n_centroids=16, nprobe=2)


_Q_IVF_TOPK_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    assign AS (
        SELECT vid, v, cid FROM (
            SELECT e.vec_id AS vid, e.v, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.cv)
                                / (sqrt(list_dot_product(e.v, e.v))
                                   * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.cid
                   ) AS crank
            FROM e CROSS JOIN cent c) WHERE crank = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
    qprobe AS (
        SELECT query_id, qv, cid FROM (
            SELECT q.query_id, q.qv, c.cid,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_dot_product(q.qv, c.cv)
                                / (sqrt(list_dot_product(q.qv, q.qv))
                                   * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.cid
                   ) AS crank
            FROM q CROSS JOIN cent c) WHERE crank <= 2
    ),
    scored AS (
        SELECT p.query_id, a.vid AS neighbor_id,
               list_dot_product(p.qv, a.v)
                 / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS cos
        FROM qprobe p JOIN assign a ON p.cid = a.cid AND a.vid <> p.query_id
    )
    SELECT query_id, rank, neighbor_id, round(cos, 4) AS score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5
"""


def q_text_profile(spark, sf_dir):
    from crawler_spark.functions.text import text_profile

    return text_profile(_docs_wide(spark, sf_dir))


_LANG_SCORE_SQL = {
    "de": r"len(regexp_extract_all(lower(text), '\b(der|und|nicht)\b'))",
    "en": r"len(regexp_extract_all(lower(text), '\b(the|and|of)\b'))",
    "es": r"len(regexp_extract_all(lower(text), '\b(el|de|que)\b'))",
    "fr": r"len(regexp_extract_all(lower(text), '\b(le|la|et)\b'))",
}
_Q_TEXT_PROFILE_SQL = f"""
    WITH base AS (
        SELECT doc_id, text,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
            len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
            round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                  / greatest(length(text), 1), 6) AS punct_ratio,
            {_LANG_SCORE_SQL['de']} AS s_de, {_LANG_SCORE_SQL['en']} AS s_en,
            {_LANG_SCORE_SQL['es']} AS s_es, {_LANG_SCORE_SQL['fr']} AS s_fr,
            len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to|in)\\b')) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_tokens, n_bpe_tokens, punct_ratio,
        round(n_stop / greatest(n_tokens, 1), 6) AS stopword_ratio,
        round(0.5 * least(length(text) / 200.0, 1.0)
              + 0.3 * (1.0 - punct_ratio)
              + 0.2 * least(round(n_stop / greatest(n_tokens, 1), 6) * 5.0, 1.0), 6) AS quality,
        CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr' END AS pred_lang,
        md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint
    FROM base
"""


def q_corpus_curation(spark, sf_dir):
    """End-to-end corpus curation in one plan: profile -> quality/lang
    gate -> exact-dup collapse -> per-language stats (the full
    training-data prep path over the documents table)."""
    from crawler_spark.functions.text import curate_corpus

    return curate_corpus(_docs_wide(spark, sf_dir))


_Q_CORPUS_CURATION_SQL = f"""
    WITH prof AS (SELECT * FROM ({_Q_TEXT_PROFILE_SQL}) p),
    kept AS (
        SELECT * FROM prof
        WHERE quality >= 0.5 AND n_tokens >= 5 AND pred_lang <> 'und'
    ),
    canon AS (
        SELECT * FROM (
            SELECT *,
                   row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn,
                   count(*) OVER (PARTITION BY fingerprint) AS n_copies
            FROM kept) WHERE rn = 1
    )
    SELECT pred_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_copies) AS BIGINT) AS n_kept_total,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CAST(quality AS DECIMAL(27,6))) AS DOUBLE) AS sum_quality
    FROM canon GROUP BY pred_lang
"""


def q_line_dedup(spark, sf_dir):
    """CCNet-style corpus-wide line dedup: each distinct line survives
    only at its first global (doc_id, pos) occurrence; docs reassembled
    from surviving lines."""
    from crawler_spark.operators.textdedup import line_dedup

    return line_dedup(_docs_wide(spark, sf_dir))


_Q_LINE_DEDUP_SQL = """
    WITH l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
    lines AS (SELECT doc_id, unnest(ls) AS line,
                     unnest(generate_series(1, len(ls))) AS pos FROM l0),
    kept AS (SELECT * FROM (
                SELECT doc_id, line, pos,
                       row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
                FROM lines) WHERE rn = 1),
    reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
                   CAST(count(*) AS BIGINT) AS n_lines_kept
            FROM kept GROUP BY doc_id)
    SELECT d.doc_id, coalesce(r.text_dedup, '') AS text_dedup,
           coalesce(r.n_lines_kept, 0) AS n_lines_kept,
           CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines
    FROM documents d LEFT JOIN reb r USING (doc_id)
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language quota sampling (training-data mixing):
    md5-hash order stands in for rand() so both engines pick the same
    sample. zh has no quota -> contributes nothing (the ELSE-0 path)."""
    from crawler_spark.functions.text import stratified_sample

    return stratified_sample(
        _docs_wide(spark, sf_dir), {"en": 40, "fr": 30, "de": 20, "es": 10}, "lang"
    )


_Q_STRATIFIED_SAMPLE_SQL = """
    WITH h AS (SELECT doc_id, lang,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS hb
               FROM documents),
    r AS (SELECT doc_id, lang,
                 CAST(row_number() OVER (PARTITION BY lang ORDER BY hb, doc_id) AS INT)
                   AS sample_rank
          FROM h)
    SELECT doc_id, lang AS stratum, sample_rank FROM r
    WHERE sample_rank <= CASE lang WHEN 'en' THEN 40 WHEN 'fr' THEN 30
                                   WHEN 'de' THEN 20 WHEN 'es' THEN 10 ELSE 0 END
"""


def q_top_terms(spark, sf_dir):
    """Corpus vocabulary head: top-50 terms by document frequency with a
    deterministic total order (df desc, term asc)."""
    from crawler_spark.functions.text import top_terms

    return top_terms(_docs_wide(spark, sf_dir), k=50)


def q_heavy_hitters(spark, sf_dir):
    """EXACT phi-heavy hitters (phi = 0.2% of all token occurrences)
    via the two-pass Misra-Gries candidates + exact-verify algorithm:
    per-task bounded-memory summaries -> pruned candidate broadcast ->
    exact counts of candidates only. The full vocabulary NEVER
    shuffles; the result is exactly `HAVING cnt*1e6 >= phi_e6*N`."""
    from crawler_spark.operators.sketches import heavy_hitters

    return heavy_hitters(_docs_wide(spark, sf_dir), phi_e6=2_000)


_Q_HEAVY_HITTERS_SQL = r"""
    WITH toks AS (SELECT unnest(list_filter(
                           string_split_regex(trim(lower(text)), '\s+'),
                           t -> t <> '')) AS tok
                  FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks)
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
           CAST(max(tot.n) AS BIGINT) AS total_tokens
    FROM toks, tot
    GROUP BY tok
    HAVING count(*) * 1000000 >= 2000 * max(tot.n)
"""


def q_lang_heavy_hitters(spark, sf_dir):
    """Per-LANGUAGE exact heavy hitters (heavy_hitters_by): every token
    >= 0.3% of its language's token total — the per-language stop-list
    primitive (CCNet-style pipelines gate per language). Same bounded
    Misra-Gries two-pass with every stage keyed by stratum; totals are
    joined, never collected."""
    from crawler_spark.operators.sketches import heavy_hitters_by

    return heavy_hitters_by(_docs_wide(spark, sf_dir), "lang", phi_e6=3_000)


_Q_LANG_HEAVY_HITTERS_SQL = r"""
    WITH toks AS (SELECT lang AS stratum,
                         unnest(list_filter(
                             string_split_regex(trim(lower(text)), '\s+'),
                             t -> t <> '')) AS tok
                  FROM documents),
    tot AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n
            FROM toks GROUP BY stratum)
    SELECT t.stratum, t.tok, CAST(count(*) AS BIGINT) AS cnt,
           CAST(max(tot.n) AS BIGINT) AS total_tokens
    FROM toks t JOIN tot ON tot.stratum = t.stratum
    GROUP BY t.stratum, t.tok
    HAVING count(*) * 1000000 >= 3000 * max(tot.n)
"""


def q_revalidate_plan(spark, sf_dir):
    """Conditional-GET revalidation decision (revalidate.decide, the
    engine's HTTP-304 recrawl path): a deterministic two-edition view
    of the documents table — md5(doc_id) buckets pages into vanished
    (404), server-validated (304), mutated (200 + new hash) and
    unchanged (200 + equal hash) slices — probed through the SAME
    operator CrawlEngine.revalidate uses. changed = 0 for 304/equal,
    1 for a differing 200 hash, NULL for errors (no change evidence)."""
    from crawler_spark.operators.revalidate import decide

    d = _t(spark, sf_dir, "documents")
    uh = F.col("doc_id").cast("string")
    b = F.substring(F.md5(uh), 1, 1)
    latest = d.select(
        uh.alias("url_hash"),
        uh.alias("url"),
        F.lit("s").alias("site"),
        F.lit("h").alias("host"),
        F.lit(1).cast("int").alias("last_round"),
        F.md5(F.col("text")).alias("content_hash"),
    )
    new_text = F.when(
        b.isin("3", "4", "5"), F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    status = (
        F.when(b.isin("0", "1"), F.lit(404))
        .when(b == "2", F.lit(304))
        .otherwise(F.lit(200))
        .cast("int")
    )
    observed = d.select(
        uh.alias("url_hash"),
        status.alias("status"),
        F.when(status == 200, F.md5(new_text)).alias("new_hash"),
        F.when(status == 200, F.length(new_text))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bytes"),
    )
    return decide(latest, observed)


_Q_REVALIDATE_PLAN_SQL = r"""
    WITH base AS (
        SELECT CAST(doc_id AS VARCHAR) AS uh, text,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS b
        FROM documents
    )
    SELECT uh AS url_hash, uh AS url, 's' AS site, 'h' AS host,
           CAST(1 AS INTEGER) AS last_round,
           md5(text) AS prev_hash,
           CAST(CASE WHEN b IN ('0','1') THEN 404
                     WHEN b = '2' THEN 304
                     ELSE 200 END AS INTEGER) AS status,
           CASE WHEN b IN ('0','1','2') THEN NULL
                WHEN b IN ('3','4','5') THEN md5(text || ' v2')
                ELSE md5(text) END AS new_hash,
           CAST(CASE WHEN b IN ('0','1','2') THEN 0
                     WHEN b IN ('3','4','5') THEN length(text || ' v2')
                     ELSE length(text) END AS BIGINT) AS bytes,
           CAST(CASE WHEN b = '2' THEN 0
                     WHEN b IN ('3','4','5') THEN 1
                     WHEN b IN ('0','1') THEN NULL
                     ELSE 0 END AS INTEGER) AS changed
    FROM base
"""


def q_sitemap_bootstrap(spark, sf_dir):
    """Cold-start recrawl priorities from sitemap hints
    (scheduler.bootstrap_recrawl_priorities): synthetic <lastmod>/
    <changefreq> per document (md5-free arithmetic slices so both
    engines derive identical hints), priority_e6 = changefreq-prior
    lambda_e6 x staleness vs a FIXED now (no wall clock — the operator
    takes now_ms explicitly, resume-safe). Certifies the exact-integer
    scoring + W3C timestamp handling end to end."""
    from crawler_spark.operators.scheduler import bootstrap_recrawl_priorities

    d = _t(spark, sf_dir, "documents")
    freqs = F.array(
        *[
            F.lit(x)
            for x in (
                "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
            )
        ],
        F.lit(None).cast("string"),
    )
    entries = d.select(
        F.col("doc_id").cast("string").alias("url"),
        F.concat(
            F.lit("2024-01-"),
            F.lpad((F.pmod("doc_id", F.lit(28)) + 1).cast("string"), 2, "0"),
            F.lit("T00:00:00Z"),
        ).alias("lastmod"),
        F.element_at(freqs, (F.pmod("doc_id", F.lit(8)) + 1).cast("int")).alias(
            "changefreq"
        ),
    )
    return bootstrap_recrawl_priorities(entries, now_ms=1_767_225_600_000)


_Q_SITEMAP_BOOTSTRAP_SQL = r"""
    WITH e AS (
        SELECT CAST(doc_id AS VARCHAR) AS url,
               '2024-01-' || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
                          || 'T00:00:00Z' AS lastmod,
               list_extract(
                   ['always','hourly','daily','weekly','monthly','yearly','never',NULL],
                   CAST((doc_id % 8) + 1 AS INTEGER)
               ) AS changefreq
        FROM documents
    ),
    scored AS (
        SELECT url,
               CAST(epoch(CAST(lastmod AS TIMESTAMPTZ)) * 1000 AS BIGINT) AS lastmod_ms,
               CAST(CASE lower(trim(changefreq))
                    WHEN 'always' THEN 500000 WHEN 'hourly' THEN 200000
                    WHEN 'daily' THEN 50000 WHEN 'weekly' THEN 10000
                    WHEN 'monthly' THEN 2000 WHEN 'yearly' THEN 200
                    WHEN 'never' THEN 0 ELSE 10000 END AS BIGINT) AS lambda_e6
        FROM e
    )
    SELECT url, max(lastmod_ms) AS lastmod_ms, max(lambda_e6) AS lambda_e6,
           max(CAST(lambda_e6 * greatest(1767225600000 - lastmod_ms, 0) AS BIGINT))
               AS priority_e6
    FROM scored GROUP BY url
"""


def q_holdout_split(spark, sf_dir):
    """Leakage-safe train/val/test assignment (functions.text.
    holdout_split): every document of a SOURCE lands in one split —
    near-dups/templates cluster within a leakage unit, so iid per-doc
    splitting would leak them across train/test. Pure per-row hash +
    CASE, zero exchanges, hash-stable under corpus growth."""
    from crawler_spark.functions.text import holdout_split

    d = _t(spark, sf_dir, "documents")
    return holdout_split(
        d, {"train": 8, "val": 1, "test": 1}, group_col="source"
    ).select("doc_id", "split_key", "split")


_Q_HOLDOUT_SPLIT_SQL = r"""
    SELECT doc_id, CAST(source AS VARCHAR) AS split_key,
           CASE WHEN b < 8 THEN 'train'
                WHEN b < 9 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, source,
                 ('0x' || substr(md5('split' || ':' || CAST(source AS VARCHAR)), 1, 8))::UBIGINT % 10 AS b
          FROM documents) t
"""


def q_split_leakage(spark, sf_dir):
    """Split-leakage audit (functions.text.cross_split_pairs): feed a
    deterministic synthetic near-dup pair table through an iid per-doc
    holdout_split — the pairs straddling splits are exactly the eval
    contamination a host-grouped split prevents (the companion
    holdout_split entry). Two equi-joins, no self-joins beyond the pair
    table itself."""
    from crawler_spark.functions.text import cross_split_pairs, holdout_split

    d = _t(spark, sf_dir, "documents")
    n = d.agg(F.count("*").alias("n"))
    pairs = (
        d.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("doc_id_a"),
            F.pmod(F.col("doc_id") * 7 + 3, F.col("n")).alias("doc_id_b"),
        )
        .filter(F.col("doc_id_a") != F.col("doc_id_b"))
    )
    asg = holdout_split(d, {"train": 4, "val": 1})
    return cross_split_pairs(pairs, asg)


_Q_SPLIT_LEAKAGE_SQL = r"""
    WITH n AS (SELECT count(*) AS c FROM documents),
    asg AS (
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5('split' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 5 < 4
                    THEN 'train' ELSE 'val' END AS split
        FROM documents
    ),
    pairs AS (
        SELECT d.doc_id AS a, (d.doc_id * 7 + 3) % n.c AS b
        FROM documents d, n
        WHERE d.doc_id <> (d.doc_id * 7 + 3) % n.c
    )
    SELECT CAST(p.a AS VARCHAR) AS doc_id_a, CAST(p.b AS VARCHAR) AS doc_id_b,
           sa.split AS split_a, sb.split AS split_b
    FROM pairs p
    JOIN asg sa ON sa.doc_id = p.a
    JOIN asg sb ON sb.doc_id = p.b
    WHERE sa.split <> sb.split
"""


_Q_TOP_TERMS_SQL = r"""
    WITH toks AS (SELECT DISTINCT doc_id,
                         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
                  FROM documents),
    agg AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
            FROM toks WHERE tok <> '' GROUP BY tok),
    top AS (SELECT * FROM agg ORDER BY df DESC, tok LIMIT 50)
    SELECT CAST(row_number() OVER (ORDER BY df DESC, tok) AS INT) AS rank,
           tok AS term, df
    FROM top
"""


def _link_edges(spark, sf_dir):
    """Deterministic synthetic link graph over the documents table:
    each doc links to 3 md5-derived targets (mod n_docs; doc_ids are
    contiguous 0..n-1 in the test data), self-loops dropped, distinct.
    Both engines derive the SAME edge list from md5 parity."""
    from crawler_spark.functions.text import md5_bucket

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    cnt = docs.agg(F.count("*").alias("n"))
    tgt = F.pmod(
        md5_bucket(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("j").cast("string"))
        ),
        F.col("n"),
    )
    return (
        docs.crossJoin(F.broadcast(cnt))
        .select(
            "doc_id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"), "n"
        )
        .select(F.col("doc_id").alias("src"), tgt.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


_EDGES_SQL = """
    edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT d.doc_id AS src,
                   CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                        || CAST(js.j AS VARCHAR)), 1, 8))::UBIGINT
                        % nn.n AS BIGINT) AS dst
            FROM documents d
            CROSS JOIN (SELECT count(*) AS n FROM documents) nn
            CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) js
        ) WHERE src <> dst
    )
"""


def q_bfs_levels(spark, sf_dir):
    """Level-synchronous BFS over the deterministic link graph:
    shortest link distance (<= 6 hops) from the seed set (every 17th
    doc, the trustrank seed rule). The crawl-audit twin of the
    frontier's discovery depth — frontier ⋈ edges per level, visited
    anti-join, early stop on an empty level."""
    from crawler_spark.operators.graph import bfs_levels

    docs = _t(spark, sf_dir, "documents")
    sources = docs.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("node")
    )
    return bfs_levels(_link_edges(spark, sf_dir), sources, max_depth=6)


_Q_BFS_LEVELS_SQL = (
    "WITH RECURSIVE "
    + _EDGES_SQL.strip()
    + r""",
    src AS (SELECT DISTINCT doc_id AS node FROM documents WHERE doc_id % 17 = 0),
    r AS (
        SELECT node, 0 AS dist FROM src
        UNION ALL
        SELECT e.dst AS node, r.dist + 1 AS dist
        FROM r JOIN edges e ON e.src = r.node
        WHERE r.dist < 6
    )
    SELECT node, CAST(min(dist) AS INT) AS dist FROM r GROUP BY node
"""
)


def q_link_graph_stats(spark, sf_dir):
    """Per-node in/out degree over the deterministic link graph (crawl
    analytics: in-degree ranks pages for OPIC-style prioritization)."""
    from crawler_spark.operators.graph import link_graph_stats

    return link_graph_stats(_link_edges(spark, sf_dir))


_Q_LINK_STATS_SQL = f"""
    WITH {_EDGES_SQL.strip()},
    o AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS out_deg FROM edges GROUP BY src),
    i AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_deg FROM edges GROUP BY dst)
    SELECT coalesce(o.node, i.node) AS node,
           coalesce(o.out_deg, 0) AS out_deg,
           coalesce(i.in_deg, 0) AS in_deg
    FROM o FULL OUTER JOIN i ON o.node = i.node
"""

_PR_ITERS = 4


def q_pagerank(spark, sf_dir):
    """Integer-arithmetic PageRank (bit-identical on any partitioning
    and in DuckDB — floor-div contributions, exact integer sums) over
    the deterministic link graph."""
    from crawler_spark.operators.graph import pagerank

    return pagerank(_link_edges(spark, sf_dir), iters=_PR_ITERS)


def _pagerank_sql(iters: int) -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (DuckDB's
    recursive CTEs disallow aggregation in the recursive term)."""
    parts = [
        f"WITH {_EDGES_SQL.strip()}",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src AS node, count(*) AS out_deg FROM edges GROUP BY src)",
        "pr0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS score FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(p.score // d.out_deg) AS s\n"
            f"          FROM edges e JOIN pr{i} p ON e.src = p.node\n"
            f"          JOIN deg d ON e.src = d.node GROUP BY e.dst)"
        )
        parts.append(
            f"pr{i + 1} AS (SELECT n.node,\n"
            f"            CAST(150000000000 + (850 * coalesce(c.s, 0)) // 1000 AS BIGINT) AS score\n"
            f"            FROM nodes n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT node, score AS score_e12 FROM pr{iters}"
    )


_Q_PAGERANK_SQL = _pagerank_sql(_PR_ITERS)


def q_hits(spark, sf_dir):
    """HITS hubs/authorities in exact integer arithmetic (max-rescaled
    power iteration — same certifiability recipe as pagerank/trustrank)
    over the deterministic link graph."""
    from crawler_spark.operators.graph import hits

    return hits(_link_edges(spark, sf_dir), iters=3)


def _hits_sql(iters: int, unit: int = 1_000_000) -> str:
    # every iteration CTE is MATERIALIZED: DuckDB inlines plain CTEs,
    # and each step here is referenced more than once — un-materialized
    # the expansion is exponential in `iters`
    parts = [
        f"WITH {_EDGES_SQL.strip()}",
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"h0 AS MATERIALIZED (SELECT node, CAST({unit} AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"af{i} AS MATERIALIZED (SELECT n.node, CAST(coalesce(c.a, 0) AS BIGINT) AS a\n"
            f"           FROM nodes n LEFT JOIN (SELECT e.dst AS node, SUM(p.h) AS a FROM edges e\n"
            f"           JOIN h{i} p ON e.src = p.node GROUP BY e.dst) c ON n.node = c.node)"
        )
        parts.append(
            f"amx{i} AS MATERIALIZED (SELECT max(a) AS m FROM af{i})"
        )
        parts.append(
            f"a{i + 1} AS MATERIALIZED (SELECT node, CAST(CASE WHEN m <= 0 THEN 0\n"
            f"           ELSE ({unit} * a) // m END AS BIGINT) AS a FROM af{i}, amx{i})"
        )
        parts.append(
            f"hf{i} AS MATERIALIZED (SELECT n.node, CAST(coalesce(c.h, 0) AS BIGINT) AS h\n"
            f"           FROM nodes n LEFT JOIN (SELECT e.src AS node, SUM(p.a) AS h FROM edges e\n"
            f"           JOIN a{i + 1} p ON e.dst = p.node GROUP BY e.src) c ON n.node = c.node)"
        )
        parts.append(
            f"hmx{i} AS MATERIALIZED (SELECT max(h) AS m FROM hf{i})"
        )
        parts.append(
            f"h{i + 1} AS MATERIALIZED (SELECT node, CAST(CASE WHEN m <= 0 THEN 0\n"
            f"           ELSE ({unit} * h) // m END AS BIGINT) AS h FROM hf{i}, hmx{i})"
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT n.node, CAST(coalesce(h.h, 0) AS BIGINT) AS hub_e6,
           CAST(coalesce(a.a, 0) AS BIGINT) AS auth_e6
    FROM nodes n
    LEFT JOIN h{iters} h ON n.node = h.node
    LEFT JOIN a{iters} a ON n.node = a.node
"""
    )


_Q_HITS_SQL = _hits_sql(3)


# --------------------------------------------------------------------------
# non-SQL-expressible: full engine round + multimodal decode (rows-only)
# --------------------------------------------------------------------------


def q_crawl_round(spark, sf_dir):
    """One real engine scheduling round on the deterministic synthetic
    world (gates -> dedup -> budget window -> fetch -> commit).
    Oracled via the crawl_multiround VALUES pattern: the independent
    pure-Python reference (crawler_spark/oracle.py) replays the same
    deterministic world for one round at oracle-build time and its
    crawl_order is inlined as VALUES."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.session import ship_package
    from crawler_spark.world import make_world

    ship_package(spark)  # mapInPandas workers must import crawler_spark

    world = make_world(seed=42, n_hosts=3, n_urls=18, budget=2, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="entry-crawl-"))
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run_round(1, t)
    return (
        eng.io.read(spark, "crawl_order")
        .select("round", "seq", "site", "url", "status")
        .orderBy("seq")
    )


def _crawl_values_sql(max_rounds: int) -> str:
    """Shared builder for the crawl replay oracles: run the pure-Python
    reference (crawler_spark/oracle.py) over THE deterministic world —
    one definition, so the 1-round and 3-round entries can never drift
    onto different world parameters — and inline crawl_order as
    VALUES."""
    from crawler_spark.oracle import Oracle
    from crawler_spark.world import make_world

    world = make_world(seed=42, n_hosts=3, n_urls=18, budget=2, burst=False)
    res = Oracle(world).run(max_rounds=max_rounds)
    rows = ",\n".join(
        f"({rnd}, {seq}, '{site}', '{url}', {status})"
        for rnd, seq, site, url, status in res.crawl_order
    )
    return (
        "SELECT CAST(round AS INT) AS round, CAST(seq AS INT) AS seq,"
        " site, url, CAST(status AS INT) AS status\n"
        f"FROM (VALUES\n{rows}\n) AS t(round, seq, site, url, status)\n"
        "ORDER BY seq"
    )


@functools.lru_cache(maxsize=1)
def _crawl_round_sql() -> str:
    """One-round crawl replay oracle (see _crawl_values_sql)."""
    return _crawl_values_sql(max_rounds=1)


def q_ivf_kmeans_topk(spark, sf_dir):
    """IVF top-k over a kmeans_train codebook (Lloyd iterations as
    DataFrame jobs, crawler_spark/operators/ann.py). Oracled via the
    crawl_multiround VALUES pattern: kmeans_train is deliberately
    partition-order-invariant (integer init hash + exact decimal-sum
    means), so an independent numpy Lloyd's replay at oracle-build
    time reproduces the trained codebook — and hence the search
    result — bit-for-bit (see _ivf_kmeans_topk_sql)."""
    from crawler_spark.operators.ann import ivf_topk, kmeans_train

    emb = _t(spark, sf_dir, "embeddings")
    cent = kmeans_train(emb, n_centroids=16, n_iters=3)
    return ivf_topk(emb, [0, 1, 2, 3, 4], k=5, n_centroids=16, nprobe=2, centroids=cent)


@functools.lru_cache(maxsize=1)
def _ivf_kmeans_topk_sql() -> str:
    """Generated, not hand-written: an independent numpy/decimal
    replay of kmeans_train + ivf_topk over the same sf0.01 embeddings,
    inlined as VALUES. Exactness contract (each piece verified against
    Spark semantics):
    - float->double widening is exact; dot/norm folds replicate
      F.aggregate's sequential left-to-right order (vectorized across
      rows, looped across dims);
    - per-cell means replicate the decimal(27,12) sum: each element
      rounds HALF_UP at 12dp on its SHORTEST double repr (Spark's
      BigDecimal.valueOf path), sums exactly as integers, converts via
      correctly-rounded Fraction->float, then one IEEE divide by count;
    - init groups replicate the pure-int64 Knuth multiplicative hash;
    - final scores replicate F.round(x, 4) = HALF_UP on shortest repr.
    """
    from decimal import ROUND_HALF_UP, Decimal
    from fractions import Fraction

    import numpy as np
    import pyarrow.parquet as pq

    N_CENT, N_ITERS, NPROBE, K = 16, 3, 2, 5
    QIDS = [0, 1, 2, 3, 4]
    tab = pq.read_table(f"{ORACLE_SF_DIR}/embeddings.parquet")
    ids = tab.column("vec_id").to_numpy()
    E = np.asarray(tab.column("embedding").to_pylist(), dtype=np.float32).astype(
        np.float64
    )
    n, dim = E.shape

    def fold_sum(P):
        """Sequential left-fold sum along axis 1 (F.aggregate order)."""
        acc = np.zeros(P.shape[0])
        for j in range(P.shape[1]):
            acc = acc + P[:, j]
        return acc

    norms = np.sqrt(fold_sum(E * E))

    def assign(cent):
        """(cid sorted asc) argmax-cosine assignment, ties -> min cid.
        NaN sorts greatest under Spark desc — guarded by assertion."""
        best_cos = np.full(n, -np.inf)
        best_cid = np.full(n, -1, dtype=np.int64)
        for cid in sorted(cent):
            cv = cent[cid]
            ncv = np.sqrt(fold_sum((cv * cv)[None, :]))[0]
            cos = fold_sum(E * cv[None, :]) / (norms * ncv)
            assert not np.isnan(cos).any(), "NaN cosine in oracle replay"
            take = cos > best_cos  # later cid wins only on strictly greater
            best_cos = np.where(take, cos, best_cos)
            best_cid = np.where(take, cid, best_cid)
        return best_cid

    def dec12(x: float) -> int:
        return int(
            Decimal(repr(float(x)))
            .quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)
            .scaleb(12)
        )

    # init: min-id vector per Knuth-hash group
    g = ((((ids.astype(object) % 2**29) * 2654435761) % 2**32) * N_CENT) // 2**32
    cent: dict[int, np.ndarray] = {}
    for i in np.argsort(ids):
        gi = int(g[i])
        if gi not in cent:
            cent[gi] = E[i].copy()
    for _ in range(N_ITERS):
        cid = assign(cent)
        new_cent = dict(cent)  # empty cells keep previous centroid
        for c in set(cid.tolist()):
            members = E[cid == c]
            cnt = float(len(members))
            mean = np.array(
                [
                    float(Fraction(sum(dec12(x) for x in members[:, j]), 10**12))
                    / cnt
                    for j in range(dim)
                ]
            )
            new_cent[int(c)] = mean
        cent = new_cent

    final_cid = assign(cent)
    out_rows = []
    for q in QIDS:
        qi = int(np.where(ids == q)[0][0])
        qv, qn = E[qi], norms[qi]
        # probe the NPROBE nearest cells (ccos desc, cid asc)
        probes = []
        for c in sorted(cent):
            cv = cent[c]
            ncv = np.sqrt(fold_sum((cv * cv)[None, :]))[0]
            ccos = fold_sum((qv * cv)[None, :])[0] / (qn * ncv)
            probes.append((-ccos, c))
        probe_cells = {c for _, c in sorted(probes)[:NPROBE]}
        cand = [
            i
            for i in range(n)
            if int(final_cid[i]) in probe_cells and int(ids[i]) != q
        ]
        scored = []
        for i in cand:
            cos = fold_sum((qv * E[i])[None, :])[0] / (qn * norms[i])
            scored.append((-cos, int(ids[i]), cos))
        for rank, (_, nid, cos) in enumerate(sorted(scored)[:K], start=1):
            # + 0.0 normalizes python Decimal's signed zero to +0.0
            # (java BigDecimal has no signed zero)
            score = (
                float(
                    Decimal(repr(float(cos))).quantize(
                        Decimal("0.0001"), rounding=ROUND_HALF_UP
                    )
                )
                + 0.0
            )
            out_rows.append((q, rank, nid, score))

    rows = ",\n".join(
        f"({q}, {rank}, {nid}, {score!r})" for q, rank, nid, score in out_rows
    )
    return (
        "SELECT CAST(query_id AS BIGINT) AS query_id,"
        " CAST(rank AS INT) AS rank,"
        " CAST(neighbor_id AS BIGINT) AS neighbor_id,"
        " CAST(score AS DOUBLE) AS score\n"
        f"FROM (VALUES\n{rows}\n) AS t(query_id, rank, neighbor_id, score)\n"
        "ORDER BY query_id, rank"
    )


_Q_MULTIMODAL_SQL = """
WITH h AS (
  SELECT 'img://doc/' || CAST(doc_id AS VARCHAR) AS media_ref,
         CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
         sha256(coalesce(text, '')) AS hx
  FROM documents
)
SELECT media_ref, doc_id, n_bytes,
  CAST(64 + (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS INTEGER) AS width,
  CAST(64 + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS INTEGER) AS height,
  CAST(1000 + ((strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1)) * 16
       AS INTEGER) AS duration_ms
FROM h
"""


def q_multimodal_features(spark, sf_dir):
    """Binary media decode plumbing (stubbed decoder): documents ->
    fake media payloads -> mapInPandas feature extraction. The stub
    digest is sha256, so the scalar features ARE SQL-expressible: the
    DuckDB oracle recomputes width/height/duration from the same hex
    digest (the float feature vector stays Python-side, exercised by
    tests/test_wire_discovery.py)."""
    from crawler_spark.operators.multimodal import decode_media
    from crawler_spark.session import ship_package

    ship_package(spark)
    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.concat(F.lit("img://doc/"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
    return decode_media(media).select(
        "media_ref", "doc_id", "n_bytes", "width", "height", "duration_ms"
    )


_Q_MULTIMODAL_RESIZE_SQL = """
WITH h AS (
  SELECT 'img://doc/' || CAST(doc_id AS VARCHAR) AS media_ref,
         CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes_in,
         sha256(coalesce(text, '')) AS hx
  FROM documents
), dims AS (
  SELECT media_ref, doc_id, n_bytes_in,
         64 + (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS w0,
         64 + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS h0
  FROM h
)
SELECT media_ref, doc_id,
       CAST(128 AS INTEGER) AS width, CAST(96 AS INTEGER) AS height,
       n_bytes_in,
       CAST(greatest(1, trunc(n_bytes_in * ((128.0 * 96.0) / (w0 * h0)))) AS BIGINT)
           AS n_bytes_out
FROM dims
"""


def q_multimodal_resize(spark, sf_dir):
    """Binary media resize plumbing (stubbed kernel): the output byte
    size scales with the target/source pixel ratio, and the source
    dims come from the same sha256 digest as `multimodal_features`, so
    every scalar column is SQL-reproducible; the resized bytes stream
    stays Python-side (exercised by tests/test_wire_discovery.py)."""
    from crawler_spark.operators.multimodal import resize_media
    from crawler_spark.session import ship_package

    ship_package(spark)
    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.concat(F.lit("img://doc/"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
    return resize_media(media, width=128, height=96).select(
        "media_ref", "doc_id", "width", "height", "n_bytes_in", "n_bytes_out"
    )


def q_frontier_state_merge(spark, sf_dir):
    """Delta-state frontier merge (the engine's read-side core,
    engine.merge_frontier_states): append-only base + state deltas ->
    effective states; latest (round, prio, state) wins and a same-round
    'deleted' beats 'fetched' (the cascade tie-break). orders rows play
    the base, lineitem rows the deltas, with synthesized same-round
    conflicts so the prio rule is actually exercised."""
    from crawler_spark.engine import merge_frontier_states

    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 5000)
        .select(
            F.col("o_orderkey").cast("string").alias("url_hash"),
            F.lit("pending").alias("state"),
        )
    )
    d0 = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 5000)
        .select(
            F.col("l_orderkey").cast("string").alias("url_hash"),
            F.when(F.col("l_returnflag") == "R", "deleted")
            .when(F.col("l_returnflag") == "A", "fetched")
            .otherwise("error")
            .alias("state"),
            F.col("l_linenumber").cast("int").alias("round"),
        )
    )
    deltas = d0.unionByName(
        d0.filter(F.pmod("round", F.lit(3)) == 0).withColumn("state", F.lit("deleted"))
    )
    return merge_frontier_states(base, deltas).select("url_hash", "state")


_Q_FRONTIER_STATE_MERGE_SQL = """
    WITH base AS (SELECT CAST(o_orderkey AS VARCHAR) AS url_hash, 'pending' AS state
                  FROM orders WHERE o_orderkey < 5000),
    d0 AS (SELECT CAST(l_orderkey AS VARCHAR) AS url_hash,
                  CASE WHEN l_returnflag='R' THEN 'deleted'
                       WHEN l_returnflag='A' THEN 'fetched' ELSE 'error' END AS state,
                  CAST(l_linenumber AS INT) AS round
           FROM lineitem WHERE l_orderkey < 5000),
    d AS (SELECT * FROM d0
          UNION ALL
          SELECT url_hash, 'deleted' AS state, round FROM d0 WHERE round % 3 = 0),
    latest AS (
        SELECT url_hash, state FROM (
            SELECT url_hash, state,
                   row_number() OVER (PARTITION BY url_hash
                       ORDER BY round DESC,
                                (CASE WHEN state='deleted' THEN 2 ELSE 1 END) DESC,
                                state DESC) AS rn
            FROM d) WHERE rn = 1)
    SELECT b.url_hash, coalesce(l.state, b.state) AS state
    FROM base b LEFT JOIN latest l USING (url_hash)
"""


def q_char_ngrams(spark, sf_dir):
    """Character 5-gram shingles (near-dup unit beside the word-shingle
    family), JVM-side sequence/transform/substring — no UDF
    (crawler_spark/operators/textdedup.py)."""
    from crawler_spark.operators.textdedup import char_ngrams

    return char_ngrams(_docs_wide(spark, sf_dir).filter(F.col("doc_id") < 100), n=5)


_Q_CHAR_NGRAMS_SQL = """
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_distinct([substr(t, i, 5)
                     for i in generate_series(1, greatest(length(t) - 4, 1))])) AS gram
        FROM norm
    ) WHERE length(gram) = 5
"""


def q_lsh_bucketed_topk(spark, sf_dir):
    """ANN top-k restricted to the query's sign-LSH bucket — the
    bucket-pruned scale path beside IVF (recall-vs-exact property in
    tests/test_operators.py)."""
    from crawler_spark.operators.ann import lsh_bucketed_topk

    return lsh_bucketed_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5, nbits=6
    )


_Q_LSH_TOPK_SQL = f"""
    WITH b AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v,
                      {_NEARDUP_BUCKET} AS bucket
               FROM embeddings),
    q AS (SELECT vid AS query_id, v AS qv, bucket FROM b WHERE vid IN (0, 1, 2, 3, 4)),
    scored AS (
        SELECT q.query_id, b.vid AS neighbor_id,
               list_dot_product(q.qv, b.v)
                 / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        FROM b JOIN q ON b.bucket = q.bucket AND b.vid <> q.query_id
    )
    SELECT query_id, rank, neighbor_id, round(cos, 4) AS score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5
"""


def q_backoff_rounds(spark, sf_dir):
    """Deterministic 429 backoff (O-SCHED4/F14): md5-derived 3..7
    rounds per (host, round) — the SQL twin of
    scheduler.backoff_rounds_expr (reference random.uniform(3,7),
    crawler.py:1019-1023, made deterministic)."""
    from crawler_spark.operators.scheduler import backoff_rounds_expr

    hosts = (
        _t(spark, sf_dir, "documents").select(F.col("source").alias("host")).distinct()
    )
    return hosts.select("host", backoff_rounds_expr(F.col("host"), 4).alias("backoff"))


_Q_BACKOFF_SQL = """
    SELECT host,
           CAST(3 + (('0x' || substr(md5(host || ':' || '4'), 1, 8))::BIGINT % 5) AS INT) AS backoff
    FROM (SELECT DISTINCT source AS host FROM documents)
"""


def q_retry_backoff(spark, sf_dir):
    """Retry-After-aware 429 backoff (run_round's arithmetic): a
    server-advertised delta-seconds hint overrides the md5 surrogate
    via all-integer ceil(s / 60); hosts without a hint (md5 slice ->
    NULL) keep the deterministic 3..7 surrogate. Certifies the exact
    coalesce + ceil-div the engine and oracle share."""
    from crawler_spark.operators.scheduler import backoff_rounds_expr

    hosts = (
        _t(spark, sf_dir, "documents").select(F.col("source").alias("host")).distinct()
    )
    # hint for ~half the hosts: 30..330s derived from the host hash
    b = F.conv(F.substring(F.md5("host"), 1, 2), 16, 10).cast("long")
    hint = F.when(b % 2 == 0, (b % 300 + 30).cast("int"))
    return hosts.select(
        "host",
        hint.alias("retry_after_s"),
        (
            F.lit(4)
            + F.coalesce(
                F.expr("cast((retry_after_s + 59) div 60 as int)"),
                backoff_rounds_expr(F.col("host"), 4),
            )
        ).alias("backoff_until_round"),
    )


_Q_RETRY_BACKOFF_SQL = """
    WITH h AS (SELECT DISTINCT source AS host FROM documents),
    hinted AS (
        SELECT host,
               ('0x' || substr(md5(host), 1, 2))::BIGINT AS b
        FROM h
    )
    SELECT host,
           CAST(CASE WHEN b % 2 = 0 THEN b % 300 + 30 END AS INT) AS retry_after_s,
           CAST(4 + COALESCE(
               (CASE WHEN b % 2 = 0 THEN b % 300 + 30 END + 59) // 60,
               3 + (('0x' || substr(md5(host || ':' || '4'), 1, 8))::BIGINT % 5)
           ) AS INT) AS backoff_until_round
    FROM hinted
"""


def q_seed_dispatch(spark, sf_dir):
    """P2+F5+P4 raw-seed dispatch (app.py:281-291,370): sitemap-vs-site
    URL dispatch, robots-first with /sitemap.xml fallback, site-name
    regex validation — over a deterministic URL mix derived from
    documents ids (every branch exercised: direct sitemap URLs, .xml
    suffix, robots-listed hosts, fallback hosts, invalid names)."""
    from crawler_spark.operators.discovery import dispatch_seed_urls

    ids = _t(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 200)
    host = F.concat(
        F.lit("h"), (F.col("doc_id") % 20).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("-bad")).otherwise(F.lit("")),
        F.lit(".example.com"),
    )
    url = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("https://"), host, F.lit("/sitemap.xml")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("https://"), host, F.lit("/news-sitemap")))
        .otherwise(F.concat(F.lit("https://"), host, F.lit("/index.html")))
    )
    raw = ids.select(url.alias("url"))
    rid = spark.range(0, 20)
    robots = rid.select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example.com")).alias("host"),
        F.when(
            F.col("id") % 2 == 0,
            F.array(
                F.concat(F.lit("https://h"), F.col("id").cast("string"), F.lit(".example.com/sm1.xml")),
                F.concat(F.lit("https://h"), F.col("id").cast("string"), F.lit(".example.com/sm2.xml")),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("sitemap_urls"),
    )
    worklist, _rejected = dispatch_seed_urls(raw, robots)
    return worklist.select("sitemap_url", "site", "host")


_Q_SEED_DISPATCH_SQL = """
    WITH raw AS (
        SELECT 'https://h' || (doc_id % 20)
               || (CASE WHEN doc_id % 7 = 0 THEN '-bad' ELSE '' END)
               || '.example.com'
               || (CASE WHEN doc_id % 3 = 0 THEN '/sitemap.xml'
                        WHEN doc_id % 3 = 1 THEN '/news-sitemap'
                        ELSE '/index.html' END) AS url
        FROM documents WHERE doc_id < 200
    ),
    u AS (
        SELECT url,
               regexp_extract(url, '^https?://([^/:]+)', 1) AS host,
               replace(regexp_extract(url, '^https?://([^/:]+)', 1), '.', '_') AS site
        FROM raw
    ),
    ok AS (SELECT * FROM u WHERE regexp_matches(site, '^[a-zA-Z0-9_]+$')),
    robots AS (
        SELECT 'h' || i || '.example.com' AS host,
               CASE WHEN i % 2 = 0
                    THEN ['https://h' || i || '.example.com/sm1.xml',
                          'https://h' || i || '.example.com/sm2.xml']
                    ELSE [] END AS sitemap_urls
        FROM generate_series(0, 19) t(i)
    ),
    direct AS (
        SELECT url AS sitemap_url, site, host FROM ok
        WHERE contains(lower(url), 'sitemap') OR url LIKE '%.xml'
    ),
    via AS (
        SELECT unnest(CASE WHEN len(coalesce(r.sitemap_urls, [])) > 0 THEN r.sitemap_urls
                           ELSE [regexp_extract(o.url, '^(https?://[^/]+)', 1) || '/sitemap.xml'] END) AS sitemap_url,
               o.site, o.host
        FROM ok o LEFT JOIN robots r USING (host)
        WHERE NOT (contains(lower(o.url), 'sitemap') OR o.url LIKE '%.xml')
    )
    SELECT DISTINCT sitemap_url, site, host FROM (
        SELECT * FROM direct UNION ALL SELECT * FROM via)
"""


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): k-gram hash + rightmost-min window selection, all
    JVM-side array ops. Substring-level fingerprinting for the
    training-data pipeline (boilerplate / plagiarism detection),
    complementary to set-similarity (minhash/jaccard)."""
    from crawler_spark.operators.textdedup import winnow_fingerprints

    return winnow_fingerprints(_docs_wide(spark, sf_dir), k=8, w=4)


_Q_WINNOW_FP_SQL = r"""
    WITH base AS (
        SELECT doc_id,
               substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 8192) AS s
        FROM documents
    ),
    base2 AS (SELECT * FROM base WHERE length(s) >= 11),
    grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS i,
               md5(substr(s, CAST(i AS INT), 8))
                   || lpad(CAST(1000000000 - i AS VARCHAR), 10, '0') AS key
        FROM base2, unnest(generate_series(1, length(s) - 7)) AS t(i)
    ),
    wins AS (
        SELECT doc_id, i,
               min(key) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM grams
    ),
    selected AS (SELECT DISTINCT doc_id, sel FROM wins WHERE i <= n - 3)
    SELECT doc_id,
           1000000000 - CAST(substr(sel, 33, 10) AS BIGINT) AS pos,
           substr(sel, 1, 32) AS fp
    FROM selected
"""


def q_winnow_overlap(spark, sf_dir):
    """Substring-overlap pairs via shared winnowing fingerprints:
    inverted-index equi-join on fp with the stop-fingerprint max_df
    guard active (boilerplate fingerprints shared by >10 docs are
    dropped before the self-join — the scale-safe shape). k=16/w=8
    keeps the pair set selective (146 of 124,750 at sf0.01)."""
    from crawler_spark.operators.textdedup import winnow_overlap_pairs

    return winnow_overlap_pairs(
        _docs_wide(spark, sf_dir), k=16, w=8, min_shared=3, max_df=10
    )


_Q_WINNOW_OVERLAP_SQL = r"""
    WITH base AS (
        SELECT doc_id,
               substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 8192) AS s
        FROM documents
    ),
    base2 AS (SELECT * FROM base WHERE length(s) >= 23),
    grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS i,
               md5(substr(s, CAST(i AS INT), 16))
                   || lpad(CAST(1000000000 - i AS VARCHAR), 10, '0') AS key
        FROM base2, unnest(generate_series(1, length(s) - 15)) AS t(i)
    ),
    wins AS (
        SELECT doc_id, i,
               min(key) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS sel,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM grams
    ),
    fp AS (
        SELECT DISTINCT doc_id, substr(sel, 1, 32) AS fp
        FROM wins WHERE i <= n - 7
    ),
    keep AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 10),
    fpk AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
    FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 3
"""


def q_dup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: transitive closure of the minhash-LSH pairs
    via alternating large-star/small-star connected components
    (Kiveris et al., SoCC'14) — O(log n) DataFrame rounds, no
    driver-side union-find, giant components stay distributed. Oracle:
    DuckDB recursive-CTE reachability over the same pair set."""
    from crawler_spark.operators.graph import connected_components
    from crawler_spark.operators.textdedup import minhash_lsh_pairs

    return connected_components(minhash_lsh_pairs(_docs_wide(spark, sf_dir)))


_Q_CC_CORE_SQL = f"""
    pairs AS ({_Q_LSH_PAIRS_SQL}),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
    ),
    clusters AS (
        SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
    )
"""

_Q_DUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_Q_CC_CORE_SQL}
    SELECT doc_id, cluster_id FROM clusters
"""


def q_dup_clusters_incremental(spark, sf_dir):
    """Incremental cluster maintenance (graph.incremental_components):
    the SAME LSH pair set as dup_clusters, split deterministically into
    two arrival batches and folded one at a time — contract-then-solve
    over each delta. Certified against the IDENTICAL batch
    reachability oracle: incremental folding must reproduce batch CC
    exactly (what engine.update_dup_clusters relies on per round)."""
    from crawler_spark.operators.graph import incremental_components
    from crawler_spark.operators.textdedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs_wide(spark, sf_dir)).cache()
    early = F.substring(F.md5(F.concat_ws("|", "doc_a", "doc_b")), 1, 1).isin(
        *list("01234567")
    )
    asg = incremental_components(None, pairs.filter(early))
    return incremental_components(asg, pairs.filter(~early))


# incremental folding must equal batch CC — same oracle by design
_Q_DUP_CLUSTERS_INCR_SQL = _Q_DUP_CLUSTERS_SQL


def q_canonical_corpus(spark, sf_dir):
    """End-to-end dedup pass: documents minus every non-canonical
    near-dup (one doc — the min id — survives per LSH cluster). The
    loser set is the duplication rate of the corpus, so it broadcasts;
    the corpus side never shuffles (left_anti on a broadcast)."""
    from crawler_spark.operators.graph import canonical_corpus
    from crawler_spark.operators.textdedup import minhash_lsh_pairs

    docs = _docs_wide(spark, sf_dir)
    return canonical_corpus(
        docs.select("doc_id", "lang", "source", "n_chars"), minhash_lsh_pairs(docs)
    )


_Q_CANONICAL_CORPUS_SQL = f"""
    WITH RECURSIVE {_Q_CC_CORE_SQL}
    SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
"""


def q_repetition_profile(spark, sf_dir):
    """Gopher/MassiveText within-document repetition gates: per-doc
    duplicate word-n-gram fractions + top-bigram fraction. The Spark
    side is pure per-row array expressions (zero exchanges); the oracle
    computes the same counts relationally (unnest + groupBy) — value
    equality certifies the array formulation."""
    from crawler_spark.functions.text import repetition_profile

    return repetition_profile(_docs_wide(spark, sf_dir))


_Q_REPETITION_SQL = r"""
    WITH words AS (
        SELECT doc_id,
               [x for x in string_split_regex(trim(lower(text)), '\s+')
                if x <> ''] AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id, len(w) AS n_words,
            CASE WHEN len(w) >= 2 THEN
                [w[i] || ' ' || w[i+1] for i in generate_series(1, len(w)-1)]
            ELSE []::VARCHAR[] END AS g2,
            CASE WHEN len(w) >= 3 THEN
                [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in generate_series(1, len(w)-2)]
            ELSE []::VARCHAR[] END AS g3,
            CASE WHEN len(w) >= 4 THEN
                [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                 for i in generate_series(1, len(w)-3)]
            ELSE []::VARCHAR[] END AS g4
        FROM words
    ),
    top2 AS (
        SELECT doc_id, max(c) AS m FROM (
            SELECT doc_id, gram, count(*) AS c
            FROM (SELECT doc_id, unnest(g2) AS gram FROM g)
            GROUP BY doc_id, gram
        ) GROUP BY doc_id
    )
    SELECT g.doc_id,
        CAST(n_words AS BIGINT) AS n_words,
        CASE WHEN len(g2) > 0
             THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                  / CAST(len(g2) AS DOUBLE)
             ELSE 0.0 END AS dup_2gram_frac,
        CASE WHEN len(g3) > 0
             THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
                  / CAST(len(g3) AS DOUBLE)
             ELSE 0.0 END AS dup_3gram_frac,
        CASE WHEN len(g4) > 0
             THEN CAST(len(g4) - len(list_distinct(g4)) AS DOUBLE)
                  / CAST(len(g4) AS DOUBLE)
             ELSE 0.0 END AS dup_4gram_frac,
        CASE WHEN len(g2) > 0
             THEN CAST(coalesce(t.m, 0) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
             ELSE 0.0 END AS top_2gram_frac
    FROM g LEFT JOIN top2 t USING (doc_id)
"""


def _docs_pii_augmented(spark, sf_dir):
    """documents with deterministic synthetic PII planted from doc_id
    (the synthetic corpus has none) — CASE-mirrored in _PII_AUG_SQL so
    both engines scan byte-identical text."""
    d = _docs_wide(spark, sf_dir)
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 200).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" ssn 123-45-6789 tel +14155550"),
                    (100 + F.col("doc_id") % 900).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" card 4111-1111-1111-1111 desk 415-555-0"),
                    (100 + F.col("doc_id") % 900).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def q_pii_profile(spark, sf_dir):
    """PII scan (emails / IPs / phones / SSNs / card numbers): per-doc
    per-category counts — pure JVM regexp_count expressions, zero
    exchanges; regexes written to the Java-regex ∩ RE2 common subset so
    the DuckDB twin counts identically."""
    from crawler_spark.functions.pii import pii_profile

    return pii_profile(_docs_pii_augmented(spark, sf_dir))


def q_redact_pii(spark, sf_dir):
    """PII scrub: typed-placeholder redaction via a fixed
    regexp_replace chain; byte-identical output certified against the
    same chain in DuckDB ('g' flag)."""
    from crawler_spark.functions.pii import redact_pii

    return redact_pii(_docs_pii_augmented(spark, sf_dir))


def _redact_chain_sql(col: str) -> str:
    """DuckDB redaction chain for a text column (PII_PATTERNS order —
    shared with the engine so both sides rewrite identically)."""
    from crawler_spark.functions.pii import PII_PATTERNS

    chain = col
    for name, pat in PII_PATTERNS.items():
        chain = f"regexp_replace({chain}, '{pat}', '<PII:{name.upper()}>', 'g')"
    return chain


def _pii_sql() -> tuple[str, str]:
    """Build the two PII oracle twins from PII_PATTERNS (one source of
    truth for the regexes across engine and oracle)."""
    from crawler_spark.functions.pii import PII_PATTERNS

    aug = """
        SELECT doc_id, text
            || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                 || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
            || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.'
                 || CAST(doc_id % 200 AS VARCHAR) || '.7' ELSE '' END
            || CASE WHEN doc_id % 7 = 0 THEN ' ssn 123-45-6789 tel +14155550'
                 || CAST(100 + doc_id % 900 AS VARCHAR) ELSE '' END
            || CASE WHEN doc_id % 11 = 0
                 THEN ' card 4111-1111-1111-1111 desk 415-555-0'
                 || CAST(100 + doc_id % 900 AS VARCHAR) ELSE '' END
            AS text
        FROM documents
    """
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    total = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    profile = f"""
        WITH aug AS ({aug}),
        c AS (SELECT doc_id, {counts} FROM aug)
        SELECT doc_id, {", ".join("n_" + n for n in PII_PATTERNS)},
               {total} AS n_pii_total, ({total}) > 0 AS has_pii
        FROM c
    """
    chain = _redact_chain_sql("text")
    redact = f"""
        WITH aug AS ({aug})
        SELECT doc_id, {chain} AS text_redacted, {total} AS n_redactions
        FROM (SELECT doc_id, text, {counts} FROM aug)
    """
    return profile, redact


_Q_PII_PROFILE_SQL, _Q_REDACT_PII_SQL = _pii_sql()

# the ONE spelling of the hash-derived classifier weight (DuckDB side of
# functions/text.py::hash_logit) — shared by every classifier oracle
_SQL_HASH_WEIGHT = (
    "CAST(('0x' || substr(md5(x), 1, 8))::UBIGINT % 2001 AS BIGINT) - 1000"
)


def q_gopher_gates(spark, sf_dir):
    """Full Gopher/MassiveText quality gate (word bounds, mean word
    length, symbol/bullet/ellipsis ratios, alpha-word fraction,
    stopword presence + combined verdict). Text is augmented with
    deterministic bullet lines and ellipsis endings (the synthetic
    corpus is single-line) — CASE/replace-mirrored in the oracle."""
    from crawler_spark.functions.text import gopher_gates

    d = _docs_wide(spark, sf_dir)
    aug = d.select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.col("text"), " slow ", "\n- slow "),
            F.when(
                F.col("doc_id") % 4 == 0, F.lit("\nread more...")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return gopher_gates(aug)


_Q_GOPHER_SQL = r"""
    WITH aug AS (
        SELECT doc_id,
            regexp_replace(text, ' slow ', chr(10) || '- slow ', 'g')
            || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'read more...'
                    ELSE '' END AS text
        FROM documents
    ),
    base AS (
        SELECT doc_id, text,
            [x for x in string_split_regex(trim(text), '\s+')
             if x <> ''] AS w,
            string_split(text, chr(10)) AS lines
        FROM aug
    ),
    m AS (
        SELECT doc_id,
            CAST(len(w) AS BIGINT) AS n_words,
            CASE WHEN len(w) > 0 THEN
                CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) ELSE 0.0 END AS mean_word_len,
            CASE WHEN len(w) > 0 THEN
                CAST(len(regexp_extract_all(text, '#'))
                     + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) ELSE 0.0 END AS symbol_word_ratio,
            CAST(len(list_filter(lines, x ->
                substr(ltrim(x), 1, 1) = '-' OR substr(ltrim(x), 1, 1) = '*'
                OR substr(ltrim(x), 1, 1) = '•')) AS DOUBLE)
            / CAST(len(lines) AS DOUBLE) AS bullet_line_frac,
            CAST(len(list_filter(lines, x ->
                ends_with(rtrim(x), '...'))) AS DOUBLE)
            / CAST(len(lines) AS DOUBLE) AS ellipsis_line_frac,
            CASE WHEN len(w) > 0 THEN
                CAST(len(list_filter(w, x ->
                    regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                / CAST(len(w) AS DOUBLE) ELSE 0.0 END AS alpha_word_frac,
            CAST(len(regexp_extract_all(lower(text),
                '\b(the|a|of|and|to|in)\b')) AS BIGINT) AS stopword_hits
        FROM base
    )
    SELECT doc_id, n_words,
        round(mean_word_len, 6) AS mean_word_len,
        round(symbol_word_ratio, 6) AS symbol_word_ratio,
        round(bullet_line_frac, 6) AS bullet_line_frac,
        round(ellipsis_line_frac, 6) AS ellipsis_line_frac,
        round(alpha_word_frac, 6) AS alpha_word_frac,
        stopword_hits,
        (n_words >= 50 AND n_words <= 100000
         AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         AND symbol_word_ratio <= 0.1
         AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
         AND alpha_word_frac >= 0.8 AND stopword_hits >= 2) AS passes
    FROM m
"""


def q_pack_sequences(spark, sf_dir):
    """GPT-style sequence packing: concatenate docs in id order
    (1-token separator), chunk into 256-token context windows; per doc:
    stream span + window range. Distributed two-phase prefix sum — no
    single-partition window (plan-asserted)."""
    from crawler_spark.functions.text import pack_sequences

    return pack_sequences(_docs_wide(spark, sf_dir), capacity=256)


_Q_PACK_SEQUENCES_SQL = r"""
    WITH n AS (
        SELECT doc_id,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END
                 AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
            CAST(coalesce(sum(n_tokens + 1) OVER (
                ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_offset
        FROM n
    )
    SELECT doc_id, n_tokens, start_offset,
        start_offset + n_tokens AS end_offset,
        start_offset // 256 AS first_bin,
        (start_offset + greatest(n_tokens - 1, 0)) // 256 AS last_bin,
        CASE WHEN n_tokens = 0 THEN 0
             ELSE (start_offset + n_tokens - 1) // 256
                  - start_offset // 256 + 1 END AS n_bins
    FROM c
"""


def q_length_quantiles(spark, sf_dir):
    """Per-language exact token-length quantiles (p50/p90/p99):
    percentile() and DuckDB's quantile_cont share the same
    linear-interpolation definition, so values hash-match; the
    documented 100 TB path is percentile_approx (t-digest, one pass)."""
    from crawler_spark.functions.text import length_quantiles

    return length_quantiles(_docs_wide(spark, sf_dir))


_Q_LENGTH_QUANTILES_SQL = r"""
    WITH n AS (
        SELECT lang AS stratum,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
        FROM documents
    )
    SELECT stratum, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(quantile_cont(nt, 0.5) AS DOUBLE) AS p50,
        CAST(quantile_cont(nt, 0.9) AS DOUBLE) AS p90,
        CAST(quantile_cont(nt, 0.99) AS DOUBLE) AS p99
    FROM n GROUP BY stratum
"""


def q_bernoulli_sample(spark, sf_dir):
    """Deterministic per-stratum Bernoulli rate sampling (temperature
    mixing): keep iff md5_bucket(doc_id) %% 1e6 < rate*1e6 — a pure
    per-row filter, zero exchanges; 'es' deliberately absent from the
    rates (absent strata drop)."""
    from crawler_spark.functions.text import bernoulli_sample

    return bernoulli_sample(
        _docs_wide(spark, sf_dir),
        rates={"en": 0.5, "de": 0.3, "zh": 0.1, "fr": 0.05},
    )


_Q_BERNOULLI_SQL = """
    SELECT doc_id, lang AS stratum FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
          % 1000000
        < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 300000
                    WHEN 'zh' THEN 100000 WHEN 'fr' THEN 50000
                    ELSE 0 END
"""


def q_full_curation(spark, sf_dir):
    """Flagship end-to-end curation in ONE plan: PII redaction ->
    word-count + repetition (dup-bigram) + classifier + language gates
    -> exact-dup collapse -> per-language corpus stats. All metrics
    computed over the redacted text in a single scan projection; only
    two exchanges (fingerprint, pred_lang), both post-gate. Exact
    integer aggregates -> hash-certifiable."""
    from crawler_spark.functions.text import full_curation

    return full_curation(_docs_wide(spark, sf_dir))


_Q_FULL_CURATION_SQL = f"""
    WITH red AS (
        SELECT doc_id, {_redact_chain_sql("text")} AS text FROM documents
    ),
    base AS (
        SELECT doc_id, text,
            [x for x in string_split_regex(trim(lower(text)), '\\s+')
             if x <> ''] AS w,
            {_LANG_SCORE_SQL['de']} AS s_de, {_LANG_SCORE_SQL['en']} AS s_en,
            {_LANG_SCORE_SQL['es']} AS s_es, {_LANG_SCORE_SQL['fr']} AS s_fr
        FROM red
    ),
    m AS (
        SELECT doc_id,
            CAST(len(w) AS BIGINT) AS n_words,
            CASE WHEN len(w) >= 2 THEN
                [w[i] || ' ' || w[i+1] for i in generate_series(1, len(w)-1)]
            ELSE []::VARCHAR[] END AS g2,
            CAST(coalesce(list_sum(list_transform(w, x ->
                {_SQL_HASH_WEIGHT})), 0) AS BIGINT) AS logit,
            CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                 WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                 WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                 WHEN s_es >= s_fr THEN 'es'
                 ELSE 'fr' END AS pred_lang,
            md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint
        FROM base
    ),
    kept AS (
        SELECT doc_id, n_words, logit, pred_lang, fingerprint,
            CASE WHEN len(g2) > 0
                 THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                      / CAST(len(g2) AS DOUBLE)
                 ELSE 0.0 END AS dup_2gram_frac
        FROM m
        WHERE n_words >= 30 AND logit > 0 AND pred_lang <> 'und'
          AND (CASE WHEN len(g2) > 0
                    THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                         / CAST(len(g2) AS DOUBLE)
                    ELSE 0.0 END) <= 0.3
    ),
    canon AS (
        SELECT * FROM (
            SELECT *,
                row_number() OVER (PARTITION BY fingerprint
                                   ORDER BY doc_id) AS rn,
                count(*) OVER (PARTITION BY fingerprint) AS n_copies
            FROM kept) WHERE rn = 1
    )
    SELECT pred_lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_copies) AS BIGINT) AS n_kept_total,
        CAST(sum(n_words) AS BIGINT) AS total_words,
        CAST(sum(logit) AS BIGINT) AS total_logit
    FROM canon GROUP BY pred_lang
"""


def q_classifier_score(spark, sf_dir):
    """fastText-style linear quality classifier (hashing trick): exact
    integer logits from md5-derived token weights — the execution shape
    of the CCNet/GPT-3 wiki-vs-random filter with a deterministic
    stand-in weight function (a trained model broadcasts instead).
    Pure per-row array aggregate, zero exchanges."""
    from crawler_spark.functions.text import classifier_score

    return classifier_score(_docs_wide(spark, sf_dir))


_Q_CLASSIFIER_SQL = f"""
    WITH base AS (
        SELECT doc_id,
            [x for x in string_split_regex(trim(lower(coalesce(text, ''))),
                                           '\\s+')
             if x <> ''] AS w
        FROM documents
    ),
    m AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
            CAST(coalesce(list_sum(list_transform(w, x ->
                {_SQL_HASH_WEIGHT})), 0) AS BIGINT) AS logit
        FROM base
    )
    SELECT doc_id, n_tokens, logit,
        CASE WHEN n_tokens > 0
             THEN CAST(logit AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             ELSE 0.0 END AS mean_weight,
        logit > 0 AS label
    FROM m
"""


def q_contamination(spark, sf_dir):
    """Benchmark-contamination scan (8-gram overlap, the public GPT-3 /
    Lee et al. decontamination recipe). The eval set is synthesized as
    15-word snippets quoted from every 20th document (simulated
    benchmark leakage), so the source docs — and their planted
    near-dups — are genuinely contaminated. The eval gram set
    BROADCASTS; the corpus never self-joins."""
    from crawler_spark.operators.textdedup import contamination_check

    d = _docs_wide(spark, sf_dir)
    eval_docs = d.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id",
        F.array_join(
            F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 10, 15),
            " ",
        ).alias("text"),
    )
    return contamination_check(d, eval_docs, n=8)


_Q_CONTAMINATION_SQL = (
    r"""
    WITH words AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents
    ),
    eval_docs AS (
        SELECT doc_id, array_to_string(w[10:24], ' ') AS text
        FROM words WHERE doc_id % 20 = 0
    ),
    ew AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM eval_docs
        WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 8
    ),
    eg AS (SELECT DISTINCT unnest(list_distinct([__G8__
                for i in generate_series(1, len(w) - 7)])) AS tok FROM ew),
    dg AS (SELECT doc_id, unnest(list_distinct([__G8__
                for i in generate_series(1, len(w) - 7)])) AS tok
           FROM words WHERE len(w) >= 8)
    SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams,
           count(*) >= 1 AS contaminated
    FROM dg JOIN eg USING (tok) GROUP BY dg.doc_id
"""
).replace(
    "__G8__",
    " || ' ' || ".join("w[i]" if j == 0 else f"w[i+{j}]" for j in range(8)),
)


def q_score_schedule(spark, sf_dir):
    """Score-priority scheduling (O-SCHED1 'score' mode, the OPIC /
    PageRank-prioritized frontier): within each host, highest pr_score
    first, url tiebreak — through the REAL scheduler.schedule() path
    (WindowGroupLimit budget + canonical seq), not an inline rebuild.
    pr_score is derived deterministically from event_id (a Knuth
    multiplicative hash mod 1000) so DuckDB computes the same scores.
    salt/round are engine-side (xxhash64) and excluded from the compare.
    """
    from crawler_spark.operators.scheduler import schedule

    fr = _frontier_view(spark, sf_dir).select(
        "event_id",
        "host",
        "url",
        F.substring("host", 1, 4).alias("site"),
        F.lit(2).alias("crawl_budget"),
        F.pmod(F.col("event_id").cast("long") * F.lit(2654435761), F.lit(1000)).alias(
            "pr_score"
        ),
    )
    out = schedule(
        fr, round_no=1, seq_base=0, max_budget=2, priority="score",
        expected_rows=100,
    )
    return out.select(
        "seq",
        F.col("rank_in_host").cast("long").alias("rank_in_host"),
        "host",
        "url",
        F.col("pr_score").cast("long").alias("pr_score"),
    )


_Q_SCORE_SCHEDULE_SQL = f"""
    WITH frontier AS ({_FRONTIER_SQL}),
    scored AS (
        SELECT *, substr(host, 1, 4) AS site,
               (event_id::BIGINT * 2654435761) % 1000 AS pr_score
        FROM frontier
    ),
    lim AS (
        SELECT *, row_number() OVER (
            PARTITION BY host ORDER BY pr_score DESC, url
        ) AS rank_in_host
        FROM scored QUALIFY rank_in_host <= 2
    )
    SELECT row_number() OVER (
               ORDER BY rank_in_host, site, pr_score DESC, url
           ) AS seq,
           rank_in_host, host, url, pr_score
    FROM lim
"""


def _bm25_queries(spark, sf_dir):
    """Deterministic query set: tokens 3..7 of every 29th document, so
    each query has a planted best match. Shared by the bm25 entries and
    bench.py's indexed-BM25 key."""
    words = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    return (
        _t(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("query_id"), words.alias("_w"))
        .filter((F.col("query_id") % 29 == 0) & (F.size("_w") >= 7))
        .select(
            "query_id", F.concat_ws(" ", F.slice("_w", 3, 5)).alias("qtext")
        )
    )


def q_bm25_topk(spark, sf_dir):
    """BM25 lexical retrieval top-10 (exact-integer scoring, see
    operators/retrieval.py): broadcast query vocabulary -> map-side
    semi-join -> postings -> WindowGroupLimit top-k; the corpus never
    self-joins."""
    from crawler_spark.operators.retrieval import bm25_topk

    return bm25_topk(_docs_wide(spark, sf_dir), _bm25_queries(spark, sf_dir), k=10)


def q_bm25_indexed(spark, sf_dir):
    """BM25 through the MATERIALIZED-postings path (the engine's
    incremental lexical index at query time): bm25_from_postings(
    corpus_postings(docs)) must return exactly what the ad-hoc path
    returns — both end in retrieval._rank_postings — so it is certified
    against the SAME DuckDB oracle as bm25_topk."""
    from crawler_spark.operators.retrieval import bm25_from_postings, corpus_postings

    return bm25_from_postings(
        corpus_postings(_docs_wide(spark, sf_dir)),
        _bm25_queries(spark, sf_dir),
        k=10,
    )


def q_search_eval(spark, sf_dir):
    """Retrieval evaluation of the bm25_topk surface against planted
    relevance: each query is tokens 3..7 of a source doc, so that doc
    is THE relevant answer — eval_topk reports best_rank / exact-int
    reciprocal rank / hits. Evaluation is |q| x k rows end-to-end."""
    from crawler_spark.operators.retrieval import eval_topk

    res = q_bm25_topk(spark, sf_dir).select("query_id", "doc_id", "rank")
    qrels = _bm25_queries(spark, sf_dir).select(
        "query_id", F.col("query_id").alias("doc_id")
    )
    return eval_topk(res, qrels)


_Q_BM25_SQL = r"""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dl) AS BIGINT) AS t FROM dd),
    q AS (SELECT doc_id AS query_id, toks[3:7] AS qtoks
          FROM dd WHERE doc_id % 29 = 0 AND len(toks) >= 7),
    qterms AS (SELECT DISTINCT query_id, unnest(qtoks) AS tok FROM q),
    qvocab AS (SELECT DISTINCT tok FROM qterms),
    p0 AS (SELECT doc_id, dl, unnest(toks) AS tok FROM dd),
    p AS (SELECT doc_id, tok, dl, CAST(count(*) AS BIGINT) AS tf
          FROM p0 WHERE tok IN (SELECT tok FROM qvocab)
          GROUP BY doc_id, tok, dl),
    f AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY tok),
    scored AS (
        SELECT qt.query_id, p.doc_id,
               CAST(SUM(
                   ((1000000 * (2*(s.n - f.df) + 1)) // (2*f.df + 1)) *
                   ((1000 * 100 * s.t * p.tf * 22) //
                    (1000 * s.t * p.tf + 12 * (25 * s.t + 75 * p.dl * s.n)))
               ) AS BIGINT) AS score_e9
        FROM qterms qt
        JOIN p ON qt.tok = p.tok
        JOIN f ON p.tok = f.tok
        CROSS JOIN stats s
        GROUP BY qt.query_id, p.doc_id
    )
    SELECT query_id, doc_id, score_e9, CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY score_e9 DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= 10
"""


def _anchor_obs(spark, sf_dir):
    """Deterministic synthetic anchor observations over the link graph:
    the anchor text of edge (src -> dst) is the DST doc's first 3
    tokens — how a real page would be linked to (title words). Both
    engines derive identical rows from _link_edges + the shared
    tokenizer."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("dst"),
        F.concat_ws(
            " ",
            F.slice(
                F.filter(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                    lambda t: t != "",
                ),
                1,
                3,
            ),
        ).alias("anchor"),
    )
    return (
        _link_edges(spark, sf_dir)
        .join(docs, "dst")
        .filter(F.col("anchor") != "")
        .select(
            F.col("src").alias("src_hash"),
            F.col("dst").alias("dst_hash"),
            "anchor",
        )
    )


def q_anchor_texts(spark, sf_dir):
    """Per-target anchor documents (retrieval.anchor_docs): each page
    described by the deduped anchor text of links POINTING AT it —
    the web-search signal a page's own body can't give. One exchange
    keyed on dst; the corpus never self-joins."""
    from crawler_spark.operators.retrieval import anchor_docs

    return anchor_docs(_anchor_obs(spark, sf_dir))


_ANCHOR_SQL_CTES = r"""
    a0 AS (SELECT e.src AS src_hash, e.dst AS dst_hash,
                  array_to_string(list_filter(
                      string_split_regex(trim(lower(d.text)), '\s+'),
                      x -> x <> '')[1:3], ' ') AS anchor
           FROM edges e JOIN documents d ON d.doc_id = e.dst),
    obs AS (SELECT DISTINCT dst_hash AS doc_id, src_hash, anchor
            FROM a0 WHERE anchor <> ''),
    ad AS (SELECT doc_id,
                  array_to_string(list_sort(list(anchor)), ' ') AS text,
                  CAST(count(*) AS BIGINT) AS n_anchors
           FROM obs GROUP BY doc_id)
"""


_Q_ANCHOR_TEXTS_SQL = (
    "WITH "
    + _EDGES_SQL.strip()
    + ",\n"
    + _ANCHOR_SQL_CTES.strip()
    + "\n    SELECT doc_id, text, n_anchors FROM ad"
)


def q_anchor_topk(spark, sf_dir):
    """Anchor-field BM25: rank pages by how OTHER pages describe them
    (queries = first-3-token titles of every 31st doc, i.e. exactly the
    anchor text its in-links carry). Same exact-integer BM25 plan as
    bm25_topk, run over the anchor documents instead of bodies."""
    from crawler_spark.operators.retrieval import anchor_docs, bm25_topk

    queries = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 31 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(
                " ",
                F.slice(
                    F.filter(
                        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                        lambda t: t != "",
                    ),
                    1,
                    3,
                ),
            ).alias("qtext"),
        )
    )
    return bm25_topk(anchor_docs(_anchor_obs(spark, sf_dir)), queries, k=10)


_Q_ANCHOR_TOPK_SQL = (
    "WITH "
    + _EDGES_SQL.strip()
    + ",\n"
    + _ANCHOR_SQL_CTES.strip()
    + r""",
    d2 AS (SELECT doc_id,
                  list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x <> '') AS toks
           FROM ad),
    dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d2),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dl) AS BIGINT) AS t FROM dd),
    q AS (SELECT doc_id AS query_id,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             x -> x <> '')[1:3] AS qtoks
          FROM documents WHERE doc_id % 31 = 0),
    qterms AS (SELECT DISTINCT query_id, unnest(qtoks) AS tok FROM q),
    qvocab AS (SELECT DISTINCT tok FROM qterms),
    p0 AS (SELECT doc_id, dl, unnest(toks) AS tok FROM dd),
    p AS (SELECT doc_id, tok, dl, CAST(count(*) AS BIGINT) AS tf
          FROM p0 WHERE tok IN (SELECT tok FROM qvocab)
          GROUP BY doc_id, tok, dl),
    f AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY tok),
    scored AS (
        SELECT qt.query_id, p.doc_id,
               CAST(SUM(
                   ((1000000 * (2*(s.n - f.df) + 1)) // (2*f.df + 1)) *
                   ((1000 * 100 * s.t * p.tf * 22) //
                    (1000 * s.t * p.tf + 12 * (25 * s.t + 75 * p.dl * s.n)))
               ) AS BIGINT) AS score_e9
        FROM qterms qt
        JOIN p ON qt.tok = p.tok
        JOIN f ON p.tok = f.tok
        CROSS JOIN stats s
        GROUP BY qt.query_id, p.doc_id
    )
    SELECT query_id, doc_id, score_e9, CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY score_e9 DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= 10
"""
)


def q_host_graph(spark, sf_dir):
    """HOST-level link graph: page edges mapped to 50 hosts (doc_id %
    50), self-links dropped, n_links = distinct page edges aggregated
    per host pair — the graph engine.host_rank runs PageRank over for
    authority-weighted capacity apportionment."""
    edges = _link_edges(spark, sf_dir)

    def host(c):
        return F.concat(
            F.lit("h"), F.lpad(F.pmod(c, F.lit(50)).cast("string"), 3, "0")
        )

    return (
        edges.select(
            host(F.col("src")).alias("src_host"), host(F.col("dst")).alias("dst_host")
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


_Q_HOST_GRAPH_SQL = (
    "WITH "
    + _EDGES_SQL.strip()
    + r"""
    SELECT 'h' || lpad(CAST(src % 50 AS VARCHAR), 3, '0') AS src_host,
           'h' || lpad(CAST(dst % 50 AS VARCHAR), 3, '0') AS dst_host,
           CAST(count(*) AS BIGINT) AS n_links
    FROM edges
    WHERE src % 50 <> dst % 50
    GROUP BY 1, 2
"""
)


def q_budget_apportion(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment of a 997-fetch round
    budget across 200 hosts weighted by their document counts: exact
    integer quotas + remainders, extras to the largest remainders via
    the DISTRIBUTED global-rank assigner (no single-partition window).
    sum(budget) == 997 exactly."""
    from crawler_spark.operators.scheduler import apportion_budget

    weights = (
        _t(spark, sf_dir, "documents")
        .select(
            F.concat(
                F.lit("h"),
                F.lpad(F.pmod(F.col("doc_id"), F.lit(200)).cast("string"), 3, "0"),
            ).alias("host")
        )
        .groupBy("host")
        .agg(F.count("*").alias("weight"))
    )
    return apportion_budget(weights, 997)


_Q_BUDGET_APPORTION_SQL = r"""
    WITH w AS (
        SELECT 'h' || lpad(CAST(doc_id % 200 AS VARCHAR), 3, '0') AS host,
               CAST(count(*) AS BIGINT) AS wgt
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(wgt) AS BIGINT) AS W FROM w),
    b AS (SELECT host, (997 * wgt) // t.W AS base, (997 * wgt) % t.W AS rem
          FROM w, tot t),
    l AS (SELECT 997 - CAST(sum(base) AS BIGINT) AS leftover FROM b),
    r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rk FROM b)
    SELECT host,
           CAST(base + CASE WHEN rk <= (SELECT leftover FROM l)
                            THEN 1 ELSE 0 END AS BIGINT) AS budget
    FROM r
"""


_Q_SEARCH_EVAL_SQL = (
    "WITH res AS MATERIALIZED ("
    + _Q_BM25_SQL
    + r"""),
    rel AS (SELECT doc_id AS query_id, doc_id
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                     x -> x <> '') AS toks
                  FROM documents)
            WHERE doc_id % 29 = 0 AND len(toks) >= 7),
    hits AS (SELECT r.query_id, CAST(min(r.rank) AS BIGINT) AS best,
                    CAST(count(*) AS BIGINT) AS n
             FROM res r JOIN rel ON rel.query_id = r.query_id
                               AND rel.doc_id = r.doc_id
             GROUP BY 1),
    qs AS (SELECT DISTINCT query_id FROM res)
    SELECT q.query_id,
           CAST(coalesce(h.best, 0) AS INT) AS best_rank,
           CAST(CASE WHEN h.best IS NULL THEN 0
                     ELSE 1000000 // h.best END AS BIGINT) AS rr_e6,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_rel_topk
    FROM qs q LEFT JOIN hits h ON h.query_id = q.query_id
"""
)


def q_recrawl_schedule(spark, sf_dir):
    """Change-rate recrawl scheduling (scheduler.recrawl_priorities):
    events replay as a fetch history — 500 URLs over 50 hosts, each
    observed ~|events|/500 times; `changed` is md5 parity of
    (url_id, ts_ms) so both engines derive the same history. Laplace-
    smoothed Poisson change rate x staleness, int64-exact, per-host
    top-5 via WindowGroupLimit."""
    from crawler_spark.operators.scheduler import recrawl_priorities

    from crawler_spark.functions.text import md5_bucket

    e = _t(spark, sf_dir, "events")
    url_id = F.pmod(F.col("event_id"), F.lit(500))
    host = F.concat(
        F.lit("h"),
        F.lpad(F.pmod(url_id, F.lit(50)).cast("string"), 3, "0"),
        F.lit(".example.com"),
    )
    ts_ms = F.unix_millis(F.to_utc_timestamp(F.col("ts"), "UTC"))
    hist = e.select(
        host.alias("host"),
        F.concat(
            F.lit("https://"), host, F.lit("/p/"),
            F.lpad(url_id.cast("string"), 6, "0"),
        ).alias("url"),
        ts_ms.alias("ts_ms"),
        F.pmod(
            md5_bucket(
                F.concat_ws(":", url_id.cast("string"), ts_ms.cast("string"))
            ),
            F.lit(2),
        ).alias("changed"),
    )
    return recrawl_priorities(hist, budget=5)


_Q_RECRAWL_SQL = """
    WITH hist AS (
        SELECT 'h' || lpad(((event_id % 500) % 50)::VARCHAR, 3, '0')
                   || '.example.com' AS host,
               'https://h' || lpad(((event_id % 500) % 50)::VARCHAR, 3, '0')
                   || '.example.com/p/'
                   || lpad((event_id % 500)::VARCHAR, 6, '0') AS url,
               epoch_ms(ts) AS ts_ms,
               CAST(('0x' || substr(md5((event_id % 500)::VARCHAR || ':'
                                        || epoch_ms(ts)::VARCHAR), 1, 8)
                    )::UBIGINT % 2 AS BIGINT) AS changed
        FROM events
    ),
    now_t AS (SELECT max(ts_ms) AS now_ms FROM hist),
    per_url AS (
        SELECT host, url,
               CAST(count(*) AS BIGINT) AS n_obs,
               CAST(sum(changed) AS BIGINT) AS n_changes,
               max(ts_ms) AS last_ms,
               CAST(((1000000 * (2*sum(changed) + 1)) // (2*count(*) + 2))
                    * (any_value(n.now_ms) - max(ts_ms)) AS BIGINT
               ) AS priority_e6
        FROM hist CROSS JOIN now_t n
        GROUP BY host, url
    )
    SELECT host, url, n_obs, n_changes, last_ms, priority_e6,
           CAST(rnk AS INT) AS rank_in_host
    FROM (SELECT *, row_number() OVER (
              PARTITION BY host ORDER BY priority_e6 DESC, url) AS rnk
          FROM per_url)
    WHERE rnk <= 5
"""


def q_lm_score(spark, sf_dir):
    """CCNet-style bigram-LM likelihood (operators/lm.py): the model is
    trained on the even-md5-bucket HALF of the corpus and scores ALL
    docs, so the held-out half exercises the OOV smoothing floor
    (coalesce-to-0 lookup misses). Add-one-smoothed mass in e6 fixed
    point — pure int64; the one double is a single exact-integer
    division. The oracle recomputes train + score relationally."""
    from crawler_spark.functions.text import md5_bucket
    from crawler_spark.operators.lm import lm_score, train_bigram_lm

    d = _docs_wide(spark, sf_dir)
    ref = d.filter(md5_bucket(F.col("doc_id")) % 2 == 0)
    return lm_score(d, model=train_bigram_lm(ref))


# train+score shared by lm_score / lm_buckets (model = even-md5 half)
_LM_SCORED_SQL = r"""
    words AS (
        SELECT doc_id,
               [x for x in string_split_regex(trim(lower(coalesce(text, ''))), '\s+')
                if x <> ''] AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest(
            CASE WHEN len(w) >= 2
                 THEN [w[i] || ' ' || w[i+1] for i in generate_series(1, len(w)-1)]
                 ELSE []::VARCHAR[] END) AS bg
        FROM words
    ),
    model AS (
        SELECT bg, CAST(count(*) AS BIGINT) AS c12
        FROM grams
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 2 = 0
        GROUP BY bg
    ),
    ctx AS (
        SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c12) AS BIGINT) AS c1
        FROM model GROUP BY 1
    ),
    voc AS (
        SELECT CAST(count(DISTINCT split_part(bg, ' ', 2)) + 1 AS BIGINT) AS v
        FROM model
    ),
    mass AS (
        SELECT g.doc_id,
               (CAST(1000000 AS BIGINT) * (coalesce(m.c12, 0) + 1))
                   // (coalesce(c.c1, 0) + voc.v) AS mass
        FROM grams g
        LEFT JOIN model m USING (bg)
        LEFT JOIN ctx c ON split_part(g.bg, ' ', 1) = c.w1
        CROSS JOIN voc
    ),
    perdoc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(mass) AS BIGINT) AS mass_e6
        FROM mass GROUP BY doc_id
    ),
    scored AS (
        SELECT w.doc_id,
               coalesce(p.n, 0) AS n_bigrams,
               coalesce(p.mass_e6, 0) AS mass_e6,
               CASE WHEN coalesce(p.n, 0) > 0
                    THEN CAST(p.mass_e6 AS DOUBLE) / CAST(p.n AS DOUBLE)
                    ELSE 0.0 END AS mean_mass_e6
        FROM words w LEFT JOIN perdoc p USING (doc_id)
    )
"""

_Q_LM_SCORE_SQL = "WITH " + _LM_SCORED_SQL + "\n    SELECT * FROM scored"


def q_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity buckets: exact global quantile
    cutoffs of the mean LM mass (1-row agg broadcast — no global sort),
    bucket 0 = most predictable. percentile == quantile_cont is the
    same cross-engine definition length_quantiles certified."""
    from crawler_spark.functions.text import md5_bucket
    from crawler_spark.operators.lm import (
        lm_score,
        perplexity_buckets,
        train_bigram_lm,
    )

    d = _docs_wide(spark, sf_dir)
    ref = d.filter(md5_bucket(F.col("doc_id")) % 2 == 0)
    return perplexity_buckets(lm_score(d, model=train_bigram_lm(ref)))


_Q_LM_BUCKETS_SQL = (
    "WITH "
    + _LM_SCORED_SQL
    + """,
    cuts AS (
        SELECT quantile_cont(mean_mass_e6, CAST(0.3333333333333333 AS DOUBLE)) AS c1,
               quantile_cont(mean_mass_e6, CAST(0.6666666666666666 AS DOUBLE)) AS c2
        FROM scored
    )
    SELECT s.*,
           CAST((CASE WHEN s.mean_mass_e6 <= c.c1 THEN 1 ELSE 0 END)
              + (CASE WHEN s.mean_mass_e6 <= c.c2 THEN 1 ELSE 0 END) AS INT) AS bucket
    FROM scored s CROSS JOIN cuts c
"""
)


def q_trap_hosts(spark, sf_dir):
    """Crawler-trap detection (operators/traps.py): events replay as a
    40-host frontier where hosts 0-9 expose a machine-generated URL
    space (repeated segments, digit-churned ids, calendar segments,
    param spam) and hosts 10-39 an editorial one. The oracle recomputes
    the FEATURES from the URL string with SQL regex/list ops, then the
    per-host profile and verdicts — full-pipeline certification. All
    ratios are single divisions of exact int64 aggregates."""
    from crawler_spark.operators.traps import host_trap_profile, trap_hosts

    e = _events_wide(spark, sf_dir)
    hid = F.pmod(F.col("event_id"), F.lit(40))
    host = F.concat(
        F.lit("h"), F.lpad(hid.cast("string"), 3, "0"), F.lit(".example.com")
    )
    seg = F.concat(F.lit("c"), F.pmod(F.col("event_id"), F.lit(7)).cast("string"))
    trap = hid < 10
    path = F.when(
        trap,
        F.concat(
            F.lit("/"), seg, F.lit("/"), seg,
            F.when(
                F.pmod(F.col("event_id"), F.lit(2)) == 0, F.lit("/2021-05")
            ).otherwise(F.lit("")),
            F.lit("/p"), F.pmod(F.col("event_id"), F.lit(100000)).cast("string"),
        ),
    ).otherwise(
        # editorial space: digit-free segments (translate digits to
        # letters) so the path IS its own template — explosion 1
        F.concat(
            F.lit("/"),
            F.translate(seg, "0123456789", "abcdefghij"),
            F.lit("/p"),
            F.translate(
                F.pmod(F.col("event_id"), F.lit(50)).cast("string"),
                "0123456789",
                "abcdefghij",
            ),
        )
    )
    query = F.when(
        trap,
        F.concat(
            F.lit("?s="), F.pmod(F.col("event_id"), F.lit(9999)).cast("string"),
            F.lit("&t=1&u=2&v=3"),
        ),
    ).otherwise(
        F.when(F.pmod(F.col("event_id"), F.lit(3)) == 0, F.lit("?ref=1")).otherwise(
            F.lit("")
        )
    )
    urls = e.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path, query).alias("url"),
    )
    return trap_hosts(
        host_trap_profile(urls),
        min_urls=20,
        max_mean_params=2.0,
        max_repeat_frac=0.5,
        max_explosion=10.0,
    )


_Q_TRAP_HOSTS_SQL = r"""
    WITH urls AS (
        SELECT 'h' || lpad((event_id % 40)::VARCHAR, 3, '0')
                   || '.example.com' AS host,
               'https://h' || lpad((event_id % 40)::VARCHAR, 3, '0')
                   || '.example.com'
                   || (CASE WHEN event_id % 40 < 10
                       THEN '/c' || (event_id % 7)::VARCHAR
                            || '/c' || (event_id % 7)::VARCHAR
                            || (CASE WHEN event_id % 2 = 0
                                THEN '/2021-05' ELSE '' END)
                            || '/p' || (event_id % 100000)::VARCHAR
                       ELSE '/' || translate(('c' || (event_id % 7)::VARCHAR),
                                             '0123456789', 'abcdefghij')
                            || '/p' || translate((event_id % 50)::VARCHAR,
                                                 '0123456789', 'abcdefghij') END)
                   || (CASE WHEN event_id % 40 < 10
                       THEN '?s=' || (event_id % 9999)::VARCHAR || '&t=1&u=2&v=3'
                       WHEN event_id % 3 = 0 THEN '?ref=1'
                       ELSE '' END) AS url
        FROM events
    ),
    feats AS (
        SELECT host, url,
               regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?', 1) AS path,
               regexp_extract(url, '\?([^#]*)', 1) AS q
        FROM urls
    ),
    f2 AS (
        SELECT host, url, path,
               [x for x in string_split(path, '/') if x <> ''] AS segs,
               CASE WHEN q = '' THEN 0 ELSE len(string_split(q, '&')) END AS n_params,
               regexp_matches(path,
                   '/(19|20)[0-9]{2}[-/](0?[1-9]|1[0-2])([-/](0?[1-9]|[12][0-9]|3[01]))?'
               ) AS has_date,
               regexp_replace(path, '[0-9]+', 'N', 'g') AS template
        FROM feats
    ),
    prof AS (
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(max(len(segs)) AS BIGINT) AS max_depth,
               CAST(sum(len(segs)) AS BIGINT) AS sum_depth,
               CAST(sum(n_params) AS BIGINT) AS sum_params,
               CAST(sum(CASE WHEN len(segs) > len(list_distinct(segs))
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
               CAST(sum(CASE WHEN has_date THEN 1 ELSE 0 END) AS BIGINT) AS n_date,
               CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
               CAST(count(DISTINCT template) AS BIGINT) AS n_templates
        FROM f2 GROUP BY host
    ),
    ratios AS (
        SELECT host, n_urls, max_depth,
               CAST(sum_depth AS DOUBLE) / CAST(n_urls AS DOUBLE) AS mean_depth,
               CAST(sum_params AS DOUBLE) / CAST(n_urls AS DOUBLE) AS mean_params,
               CAST(n_repeat AS DOUBLE) / CAST(n_urls AS DOUBLE) AS repeat_frac,
               CAST(n_date AS DOUBLE) / CAST(n_urls AS DOUBLE) AS date_frac,
               n_paths, n_templates,
               CAST(n_paths AS DOUBLE)
                   / CAST(greatest(n_templates, 1) AS DOUBLE) AS explosion
        FROM prof
    )
    SELECT *,
           (n_urls >= 20 AND mean_depth > 8.0) AS deep,
           (n_urls >= 20 AND mean_params > 2.0) AS param_heavy,
           (n_urls >= 20 AND repeat_frac > 0.5) AS repetitive,
           (n_urls >= 20 AND date_frac > 0.5) AS calendar,
           (n_urls >= 20 AND explosion > 10.0) AS exploding,
           (n_urls >= 20 AND (mean_depth > 8.0 OR mean_params > 2.0
               OR repeat_frac > 0.5 OR date_frac > 0.5 OR explosion > 10.0)
           ) AS is_trap
    FROM ratios
"""


def q_mixture_weights(spark, sf_dir):
    """Temperature mixture weights per language (operators/mixing.py):
    exact int64 token counts, alpha=0.5 tempered integer weights
    (floor(sqrt(tokens*10^6)) — IEEE sqrt is correctly rounded, so the
    floor is deterministic in both engines), shares as single
    divisions of exact sums. The multilingual-sampling recipe
    (p^alpha) the reference has no notion of."""
    from crawler_spark.operators.mixing import mixture_weights

    return mixture_weights(_t(spark, sf_dir, "documents"))


_Q_MIXTURE_WEIGHTS_SQL = r"""
    WITH toks AS (
        SELECT lang AS stratum,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        FROM documents
    ),
    per AS (
        SELECT stratum, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS tokens
        FROM toks GROUP BY stratum
    ),
    w AS (
        SELECT *,
               CAST(floor(sqrt(CAST(tokens * 1000000 AS DOUBLE))) AS BIGINT)
                   AS weight
        FROM per
    )
    SELECT stratum, n_docs, tokens,
           CAST(tokens AS DOUBLE)
               / CAST((SELECT CAST(sum(tokens) AS BIGINT) FROM w) AS DOUBLE) AS p,
           weight,
           CAST(weight AS DOUBLE)
               / CAST((SELECT CAST(sum(weight) AS BIGINT) FROM w) AS DOUBLE) AS share
    FROM w
"""


def q_token_budget_mix(spark, sf_dir):
    """Token-budget corpus selection (operators/mixing.py): a 15k-token
    global budget split across languages by the tempered weights, then
    longest-documents-first greedy selection per language (n_chars as
    the ordering score; md5-hash + doc_id tiebreak). Budgets are pure
    integer floor-divisions; the running token sum is one
    stratum-partitioned window."""
    from crawler_spark.operators.mixing import token_budget_select

    return token_budget_select(
        _t(spark, sf_dir, "documents"), budget=15_000, order_col="n_chars"
    )


_Q_TOKEN_BUDGET_MIX_SQL = r"""
    WITH toks AS (
        SELECT doc_id, lang AS stratum, n_chars,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS tokens
        FROM documents
    ),
    per AS (
        SELECT stratum, CAST(sum(tokens) AS BIGINT) AS tokens
        FROM toks GROUP BY stratum
    ),
    w AS (
        SELECT stratum,
               CAST(floor(sqrt(CAST(tokens * 1000000 AS DOUBLE))) AS BIGINT)
                   AS weight
        FROM per
    ),
    b AS (
        SELECT stratum,
               (weight * 15000)
                   // (SELECT CAST(sum(weight) AS BIGINT) FROM w) AS token_budget
        FROM w
    ),
    ranked AS (
        SELECT t.doc_id, t.stratum, CAST(t.tokens AS BIGINT) AS tokens,
               b.token_budget,
               CAST(sum(t.tokens) OVER (
                   PARTITION BY t.stratum
                   ORDER BY t.n_chars DESC,
                            ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::UBIGINT,
                            t.doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM toks t JOIN b USING (stratum)
    )
    SELECT doc_id, stratum, tokens, cum_tokens, token_budget
    FROM ranked WHERE cum_tokens <= token_budget
"""


def q_fetch_plan(spark, sf_dir):
    """Snake-LPT fetch-slot planning (scheduler.plan_fetch_partitions):
    events roll up to 500 hosts with exact-integer costs (pending-URL
    count + event_id-derived weight), then hosts spread over 16 worker
    bins by descending cost with the boustrophedon fold. Rank and bin
    are pure integer functions of the total order, so the oracle
    recomputes them with row_number + the same mod-fold arithmetic."""
    from crawler_spark.operators.scheduler import plan_fetch_partitions

    e = _t(spark, sf_dir, "events")
    hosts = (
        e.groupBy(
            F.concat(
                F.lit("h"),
                F.lpad(F.pmod(F.col("event_id"), F.lit(500)).cast("string"), 3, "0"),
                F.lit(".example.com"),
            ).alias("host")
        )
        .agg(
            (F.count(F.lit(1)) + F.sum(F.pmod(F.col("event_id"), F.lit(97))))
            .alias("cost")
        )
    )
    return plan_fetch_partitions(hosts, n_bins=16)


_Q_FETCH_PLAN_SQL = r"""
    WITH hosts AS (
        SELECT 'h' || lpad((event_id % 500)::VARCHAR, 3, '0')
                   || '.example.com' AS host,
               CAST(count(*) + sum(event_id % 97) AS BIGINT) AS cost
        FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT host, cost,
               CAST(row_number() OVER (ORDER BY cost DESC, host) AS BIGINT) AS rank
        FROM hosts
    )
    SELECT host, cost, rank,
           CAST(CASE WHEN (rank - 1) % 32 < 16 THEN (rank - 1) % 32
                ELSE 31 - ((rank - 1) % 32) END AS INTEGER) AS bin
    FROM ranked
"""


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (textdedup.cdc_chunks): split every
    document at local-hash boundaries (w=16 gram, mod 64 -> ~64-char
    chunks) and fingerprint each chunk. The oracle re-derives cuts,
    bounds and chunk hashes with DuckDB list comprehensions over the
    same md5-bucket arithmetic — boundary-exact certification."""
    from crawler_spark.operators.textdedup import cdc_chunks

    return cdc_chunks(_docs_wide(spark, sf_dir))


_CDC_BASE_SQL = r"""
    WITH base AS (
        SELECT doc_id,
               substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                         1, 8192) AS s
        FROM documents
        WHERE length(substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                               1, 8192)) > 0
    ),
    cutz AS (
        SELECT doc_id, s,
               list_filter(generate_series(16, length(s)),
                   i -> ('0x' || substr(md5(substring(s, i - 15, 16)), 1, 8))::UBIGINT
                        % 64 = 0
               ) AS cuts
        FROM base
    ),
    bnd AS (
        SELECT doc_id, s,
               list_concat(
                   list_concat([0], cuts),
                   CASE WHEN coalesce(cuts[-1], -1) = length(s)
                        THEN [] ELSE [length(s)] END) AS bounds
        FROM cutz
    ),
    ch AS (
        SELECT doc_id,
               unnest(generate_series(1, len(bounds) - 1)) AS chunk_idx,
               s, bounds
        FROM bnd
    ),
    chunks AS (
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(bounds[chunk_idx] + 1 AS BIGINT) AS chunk_pos,
               CAST(bounds[chunk_idx + 1] - bounds[chunk_idx] AS BIGINT) AS chunk_len,
               md5(substring(s, bounds[chunk_idx] + 1,
                             bounds[chunk_idx + 1] - bounds[chunk_idx])) AS chunk_hash
        FROM ch
    )
"""

_Q_CDC_CHUNKS_SQL = _CDC_BASE_SQL + "    SELECT * FROM chunks"


def q_cdc_dedup(spark, sf_dir):
    """Recurring CDC chunks (textdedup.cdc_dup_chunks): chunk hashes
    seen more than once with >= 24 chars — the shared-span (boilerplate
    / quoted-block) report document-level dedup cannot produce. One
    groupBy(chunk_hash) exchange on top of the zero-exchange chunker."""
    from crawler_spark.operators.textdedup import cdc_dup_chunks

    return cdc_dup_chunks(_docs_wide(spark, sf_dir))


_Q_CDC_DEDUP_SQL = _CDC_BASE_SQL + r"""
    SELECT chunk_hash, chunk_len,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST((count(*) - 1) * chunk_len AS BIGINT) AS dup_chars
    FROM chunks
    WHERE chunk_len >= 24
    GROUP BY chunk_hash, chunk_len
    HAVING count(*) > 1
"""


def q_dsir_weights(spark, sf_dir):
    """DSIR importance-weight table (Xie et al. 2023): hashed
    unigram+bigram bucket histograms of the target (lang='en' — select
    raw web data that looks like the target domain) and the raw corpus,
    Laplace-smoothed odds-ratio weight per bucket in exact int128
    fixed-point (DECIMAL(38,0) div == DuckDB HUGEINT //). Two bounded
    histograms + one tiny full-outer join; the corpus never self-joins."""
    from crawler_spark.operators.dsir import dsir_weights

    d = _docs_wide(spark, sf_dir)
    return dsir_weights(d.filter(F.col("lang") == "en"), d, n_buckets=1024)


# shared DuckDB spelling of the DSIR weight table (twin of
# operators/dsir.py::dsir_weights at n_buckets=1024, target lang='en')
_DSIR_WEIGHTS_SQL = r"""
    WITH toks AS (
        SELECT doc_id, lang,
            [x for x in string_split_regex(trim(lower(coalesce(text, ''))),
                                           '\s+')
             if x <> ''] AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id, lang,
            w || CASE WHEN len(w) >= 2
                 THEN list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i + 1])
                 ELSE CAST([] AS VARCHAR[]) END AS g
        FROM toks
    ),
    gb AS (
        SELECT doc_id, lang,
            CAST(('0x' || substr(md5(x), 1, 8))::UBIGINT % 1024
                 AS BIGINT) AS bucket
        FROM grams, unnest(g) AS t(x)
    ),
    tc AS (SELECT bucket, count(*) AS t_cnt FROM gb
           WHERE lang = 'en' GROUP BY bucket),
    rc AS (SELECT bucket, count(*) AS r_cnt FROM gb GROUP BY bucket),
    j AS (
        SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
               CAST(coalesce(t_cnt, 0) AS BIGINT) AS t_cnt,
               CAST(coalesce(r_cnt, 0) AS BIGINT) AS r_cnt
        FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket
    ),
    tot AS (SELECT CAST(sum(t_cnt) AS BIGINT) AS t_tot,
                   CAST(sum(r_cnt) AS BIGINT) AS r_tot FROM j),
    dsir_w AS (
        SELECT bucket, t_cnt, r_cnt,
            CAST((1000000::HUGEINT * (t_cnt + 1) * (r_tot + 1024))
                 // ((r_cnt + 1)::HUGEINT * (t_tot + 1024))
                 AS BIGINT) AS weight
        FROM j, tot
    )
"""

_Q_DSIR_WEIGHTS_SQL = _DSIR_WEIGHTS_SQL + "    SELECT * FROM dsir_w"


def q_dsir_select(spark, sf_dir):
    """End-to-end DSIR selection: score every raw doc by the summed
    bucket weight of its hashed grams (one corpus pass, weight table
    broadcast) and keep the top 100 (TakeOrderedAndProject — no global
    sort exchange). score is an exact int64 sum; mean_w a single
    division. Deterministic ties on doc_id."""
    from crawler_spark.operators.dsir import dsir_select

    d = _docs_wide(spark, sf_dir)
    return dsir_select(d, d.filter(F.col("lang") == "en"), k=100,
                       n_buckets=1024)


_Q_DSIR_SELECT_SQL = _DSIR_WEIGHTS_SQL + r"""
    , s AS (
        SELECT t.doc_id,
            CAST(count(gb.bucket) AS BIGINT) AS n_grams,
            CAST(coalesce(sum(w.weight), 0) AS BIGINT) AS score
        FROM toks t
        LEFT JOIN gb ON gb.doc_id = t.doc_id
        LEFT JOIN dsir_w w ON w.bucket = gb.bucket
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_grams, score,
        CASE WHEN n_grams > 0
             THEN CAST(score AS DOUBLE) / CAST(n_grams AS DOUBLE)
             ELSE 0.0 END AS mean_w
    FROM s ORDER BY score DESC, doc_id ASC LIMIT 100
"""


def q_quantize_embeddings(spark, sf_dir):
    """Int8-style global-scale quantization of the embedding corpus —
    the 4x-bytes scale lever for every downstream ANN op. floor of one
    IEEE multiply + one divide per component: bit-identical in SQL.
    Entry output is EXPLODED to scalar rows (vec_id, idx, q) — gate
    results must never carry array/map columns (the driver
    canonicalizer sorts raw pandas values, where a list cell throws
    `unhashable type`)."""
    from crawler_spark.operators.ann import quantize_embeddings

    return quantize_embeddings(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.posexplode("qv").alias("idx", "q")
    )


_QUANT_CTE = """
    m AS (SELECT max(list_max(list_transform(embedding::DOUBLE[],
                                              x -> abs(x)))) AS mx
          FROM embeddings),
    q8 AS (
        SELECT vec_id,
               [CASE WHEN mx = 0 THEN 0
                     ELSE floor((x * 127.0) / mx)::BIGINT END
                for x in embedding::DOUBLE[]] AS qv
        FROM embeddings, m
    )
"""
_Q_QUANTIZE_SQL = f"""WITH {_QUANT_CTE}
    SELECT vec_id, CAST(UNNEST(range(len(qv))) AS INT) AS idx,
           UNNEST(qv) AS q
    FROM q8"""


def q_quantized_topk(spark, sf_dir):
    """ANN over the int8-quantized corpus: EXACT int64 inner-product
    ranking (query batch broadcast; corpus never shuffles)."""
    from crawler_spark.operators.ann import quantized_topk

    return quantized_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5
    )


_Q_QUANTIZED_TOPK_SQL = f"""
    WITH {_QUANT_CTE},
    q AS (SELECT vec_id AS query_id, qv AS qa FROM q8
          WHERE vec_id IN (0, 1, 2, 3, 4)),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               CAST(list_dot_product(e.qv::DOUBLE[], q.qa::DOUBLE[])
                    AS BIGINT) AS iscore
        FROM q8 e CROSS JOIN q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, rank, neighbor_id, iscore FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY iscore DESC, neighbor_id
        ) AS rank FROM scored
    ) WHERE rank <= 5
"""


def q_semdedup(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540): cluster-bounded semantic dedup —
    cosine pairs form only inside a cluster, min-id canonical kept.
    Deterministic first-16 centroids keep the SQL twin exact; a
    kmeans_train codebook drops in via `centroids` at scale."""
    from crawler_spark.operators.ann import semdedup

    return semdedup(
        _t(spark, sf_dir, "embeddings"), n_centroids=16, threshold=0.4
    )


_Q_SEMDEDUP_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    assign AS (
        SELECT vid, v, cid FROM (
            SELECT e.vec_id AS vid, e.v, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.cv)
                                / (sqrt(list_dot_product(e.v, e.v))
                                   * sqrt(list_dot_product(c.cv, c.cv)))
                                DESC, c.cid
                   ) AS crank
            FROM e CROSS JOIN cent c) WHERE crank = 1
    ),
    losers AS (
        SELECT DISTINCT b.vid
        FROM assign a JOIN assign b ON a.cid = b.cid AND a.vid < b.vid
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= 0.4
    )
    SELECT a.vid AS vec_id, a.cid, (l.vid IS NULL) AS keep
    FROM assign a LEFT JOIN losers l ON a.vid = l.vid
"""


def q_hybrid_topk(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical + brute-force-cosine semantic
    top-10 per query, fused with exact-int64 reciprocal-rank fusion
    (rrf_fuse). Queries = tokens 3..7 of every 29th document (same
    planted-match protocol as bm25_topk); the semantic side queries the
    same ids' embeddings. Fusion never touches the corpus — it only
    unions the two |queries|x10 lists."""
    from crawler_spark.operators.ann import brute_force_topk
    from crawler_spark.operators.retrieval import bm25_topk, rrf_fuse

    words = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    queries = (
        _t(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("query_id"), words.alias("_w"))
        .filter((F.col("query_id") % 29 == 0) & (F.size("_w") >= 7))
        .select(
            "query_id", F.concat_ws(" ", F.slice("_w", 3, 5)).alias("qtext")
        )
    )
    qids = [r.query_id for r in queries.select("query_id").collect()]
    lex = bm25_topk(_docs_wide(spark, sf_dir), queries, k=10).select(
        "query_id", "doc_id", "rank"
    )
    sem = brute_force_topk(
        _t(spark, sf_dir, "embeddings"), qids, k=10
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, sem], k=10)


_Q_HYBRID_TOPK_SQL = r"""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dl) AS BIGINT) AS t FROM dd),
    q AS (SELECT doc_id AS query_id, toks[3:7] AS qtoks
          FROM dd WHERE doc_id % 29 = 0 AND len(toks) >= 7),
    qterms AS (SELECT DISTINCT query_id, unnest(qtoks) AS tok FROM q),
    qvocab AS (SELECT DISTINCT tok FROM qterms),
    p0 AS (SELECT doc_id, dl, unnest(toks) AS tok FROM dd),
    p AS (SELECT doc_id, tok, dl, CAST(count(*) AS BIGINT) AS tf
          FROM p0 WHERE tok IN (SELECT tok FROM qvocab)
          GROUP BY doc_id, tok, dl),
    f AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY tok),
    bscored AS (
        SELECT qt.query_id, p.doc_id,
               CAST(SUM(
                   ((1000000 * (2*(s.n - f.df) + 1)) // (2*f.df + 1)) *
                   ((1000 * 100 * s.t * p.tf * 22) //
                    (1000 * s.t * p.tf + 12 * (25 * s.t + 75 * p.dl * s.n)))
               ) AS BIGINT) AS score_e9
        FROM qterms qt
        JOIN p ON qt.tok = p.tok
        JOIN f ON p.tok = f.tok
        CROSS JOIN stats s
        GROUP BY qt.query_id, p.doc_id
    ),
    lex AS (
        SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY score_e9 DESC, doc_id
              ) AS rnk FROM bscored)
        WHERE rnk <= 10
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qe AS (SELECT qq.query_id, e.v AS qv
           FROM (SELECT DISTINCT query_id FROM q) qq
           JOIN e ON e.vec_id = qq.query_id),
    sscored AS (
        SELECT qe.query_id, e.vec_id AS doc_id,
               list_dot_product(qe.qv, e.v)
                 / (sqrt(list_dot_product(qe.qv, qe.qv))
                    * sqrt(list_dot_product(e.v, e.v))) AS cos
        FROM e CROSS JOIN qe WHERE e.vec_id <> qe.query_id
    ),
    sem AS (
        SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY cos DESC, doc_id
              ) AS rnk FROM sscored)
        WHERE rnk <= 10
    ),
    un AS (SELECT * FROM lex UNION ALL SELECT * FROM sem),
    fs AS (SELECT query_id, doc_id,
                  CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS rrf_e9
           FROM un GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, rrf_e9, CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY rrf_e9 DESC, doc_id
          ) AS rnk FROM fs)
    WHERE rnk <= 10
"""


def q_exact_substr_spans(spark, sf_dir):
    """ExactSubstr duplicate spans (Lee et al., arXiv:2107.06499):
    token positions whose 8-gram repeats corpus-wide, merged into
    maximal spans. Grams are one JVM array transform per doc; the only
    corpus shuffle is the gram-count partial agg (the suffix array's
    global sort re-expressed as an aggregation)."""
    from crawler_spark.operators.textdedup import exact_substr_spans

    return exact_substr_spans(_docs_wide(spark, sf_dir), k=8)


_EXACT_SUBSTR_CTE = r"""
    d AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    g0 AS (
        SELECT doc_id,
               [{'pos': i - 1,
                 'gram': md5(array_to_string(w[i:i+7], ' '))}
                for i in generate_series(1, len(w) - 7)] AS gs
        FROM d WHERE len(w) >= 8
    ),
    g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram
          FROM (SELECT doc_id, unnest(gs) AS u FROM g0)),
    c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    dup AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (gram)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos) <= 8
                    THEN 0 ELSE 1 END AS brk
        FROM dup
    ),
    isl2 AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM isl
    ),
    spans AS (
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + 7 AS BIGINT) AS span_end
        FROM isl2 GROUP BY doc_id, island
    )
"""
_Q_EXACT_SUBSTR_SPANS_SQL = (
    f"WITH {_EXACT_SUBSTR_CTE} "
    "SELECT doc_id, span_start, span_end, "
    "span_end - span_start + 1 AS n_tokens FROM spans"
)


def q_exact_substr_strip(spark, sf_dir):
    """ExactSubstr removal: every duplicate span cut from the
    normalized token stream; (doc_id, clean_text, n_removed) for every
    input document. Coverage test is a per-doc JVM array lambda after
    one co-keyed doc_id join of the (tiny) span lists."""
    from crawler_spark.operators.textdedup import exact_substr_strip

    return exact_substr_strip(_docs_wide(spark, sf_dir), k=8)


_Q_EXACT_SUBSTR_STRIP_SQL = f"""
    WITH {_EXACT_SUBSTR_CTE},
    toks0 AS (
        SELECT doc_id,
               [{{'pos': i - 1, 'tok': w[i]}}
                for i in generate_series(1, len(w))] AS ts,
               len(w) AS nw
        FROM d
    ),
    toks AS (SELECT doc_id, u.pos AS pos, u.tok AS tok
             FROM (SELECT doc_id, unnest(ts) AS u FROM toks0)),
    covered AS (
        SELECT DISTINCT t.doc_id, t.pos
        FROM toks t JOIN spans s
          ON t.doc_id = s.doc_id
         AND t.pos BETWEEN s.span_start AND s.span_end
    ),
    kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t
             ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos),
    keptagg AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT d2.doc_id,
           coalesce(k.clean_text, '') AS clean_text,
           CAST(d2.nw - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
    FROM (SELECT doc_id, nw FROM toks0) d2
    LEFT JOIN keptagg k USING (doc_id)
"""


def q_trustrank(spark, sf_dir):
    """TrustRank (Gyongyi VLDB'04): PageRank personalized to a trusted
    seed set (every 17th doc) over the deterministic link graph —
    exact-int64 teleport-to-seeds arithmetic, bit-identical in DuckDB.
    The web-spam demotion signal beside trap_hosts' URL heuristics."""
    from crawler_spark.operators.graph import trustrank

    edges = _link_edges(spark, sf_dir)
    seeds = edges.select(F.col("src").alias("node")).filter(
        F.col("node") % 17 == 0
    )
    return trustrank(edges, seeds, iters=_PR_ITERS)


def _trustrank_sql(iters: int) -> str:
    """Unrolled fixed-iteration TrustRank: pagerank's CTE chain with
    the teleport vector restricted to seed nodes (node % 17 = 0)."""
    parts = [
        f"WITH {_EDGES_SQL.strip()}",
        "nodes AS (SELECT node, (node % 17 = 0) AS is_seed FROM ("
        "SELECT src AS node FROM edges UNION SELECT dst FROM edges))",
        "deg AS (SELECT src AS node, count(*) AS out_deg FROM edges GROUP BY src)",
        "tr0 AS (SELECT node, CAST(CASE WHEN is_seed THEN 1000000000000 "
        "ELSE 0 END AS BIGINT) AS score FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(p.score // d.out_deg) AS s\n"
            f"          FROM edges e JOIN tr{i} p ON e.src = p.node\n"
            f"          JOIN deg d ON e.src = d.node GROUP BY e.dst)"
        )
        parts.append(
            f"tr{i + 1} AS (SELECT n.node,\n"
            f"            CAST(CASE WHEN n.is_seed THEN 150000000000 ELSE 0 END\n"
            f"                 + (850 * coalesce(c.s, 0)) // 1000 AS BIGINT) AS score\n"
            f"            FROM nodes n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT node, score AS trust_e12 FROM tr{iters}"
    )


_Q_TRUSTRANK_SQL = _trustrank_sql(_PR_ITERS)


def q_mirror_sites(spark, sf_dir):
    """Mirror-site detection over a corpus with a PLANTED mirror (the
    contamination-entry protocol): 'mirror_even' re-hosts every 2nd
    document, so each source overlaps it at ~half its fingerprints.
    Containment coefficient in exact int64; stop-fingerprint guard
    active (max_sites_per_fp=5) so the gate certifies the skew-safe
    shape."""
    from crawler_spark.operators.textdedup import mirror_pairs

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("source", "text").unionByName(
        d.filter(F.col("doc_id") % 2 == 0).select(
            F.lit("mirror_even").alias("source"), "text"
        )
    )
    return mirror_pairs(
        corpus, min_overlap_e6=400_000, max_sites_per_fp=5
    )


_Q_MIRROR_SITES_SQL = """
    WITH corpus AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT 'mirror_even' AS source, text FROM documents WHERE doc_id % 2 = 0
    ),
    fp0 AS (SELECT DISTINCT source AS site, md5(text) AS fp FROM corpus),
    keep AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(*) <= 5),
    fp AS (SELECT f.site, f.fp FROM fp0 f JOIN keep USING (fp)),
    sz AS (SELECT site, CAST(count(*) AS BIGINT) AS n_fp FROM fp GROUP BY site),
    sh AS (
        SELECT a.site AS site_a, b.site AS site_b, CAST(count(*) AS BIGINT) AS shared
        FROM fp a JOIN fp b ON a.fp = b.fp AND a.site < b.site
        GROUP BY 1, 2
    )
    SELECT site_a, site_b, shared,
           (1000000 * shared) // least(x.n_fp, y.n_fp) AS overlap_e6
    FROM sh
    JOIN sz x ON x.site = site_a
    JOIN sz y ON y.site = site_b
    WHERE (1000000 * shared) // least(x.n_fp, y.n_fp) >= 400000
"""


# --------------------------------------------------------------------------
# interleaved-span family (operators/spans.py) over the synthetic span table
# --------------------------------------------------------------------------

# DuckDB twin of spans.synth_interleaved(chunk_words=10, media_every=3):
# 10-word text chunks; a media span after chunk i iff (doc_id+i)%3==0;
# pos = span index, offset = 2*pos + doc_id%3.
_SPANS_SQL = r"""
    w AS (
        SELECT doc_id,
            CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                 ELSE string_split_regex(trim(text), '\s+') END AS words
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, words, i
        FROM w, UNNEST(generate_series(0, CAST(ceil(len(words)/10.0) AS BIGINT) - 1)) AS t(i)
    ),
    raw_spans AS (
        SELECT doc_id, i AS chunk, 0 AS sub, 'text' AS kind,
               array_to_string(words[i*10+1 : i*10+10], ' ') AS text,
               '' AS media_ref
        FROM chunks
        UNION ALL
        SELECT doc_id, i, 1, 'media', '',
               'm' || CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR)
        FROM chunks WHERE (doc_id + i) % 3 = 0
    ),
    spans_flat AS (
        SELECT doc_id, kind, text, media_ref,
            CAST(row_number() OVER (PARTITION BY doc_id ORDER BY chunk, sub) - 1 AS INT) AS pos
        FROM raw_spans
    ),
    spans_off AS (
        SELECT *, CAST(2*pos + doc_id % 3 AS INT) AS offs FROM spans_flat
    )
"""


def _docs_spans(spark, sf_dir, **kw):
    from crawler_spark.operators.spans import synth_interleaved

    return synth_interleaved(_docs_wide(spark, sf_dir), **kw)


def q_interleaved_stats(spark, sf_dir):
    """Per-document interleaved profile over the north-rule span shape:
    span/text/media counts, visible chars/words, media density — ONE
    scan projection, zero exchanges (plan-asserted)."""
    from crawler_spark.operators.spans import span_stats

    return span_stats(_docs_spans(spark, sf_dir))


_Q_INTERLEAVED_STATS_SQL = rf"""
    WITH {_SPANS_SQL},
    agg AS (
        SELECT doc_id,
            count(*) AS n_spans,
            sum(CASE WHEN kind='text' THEN 1 ELSE 0 END) AS n_text_spans,
            sum(CASE WHEN kind='media' THEN 1 ELSE 0 END) AS n_media_spans,
            sum(CASE WHEN kind='text' THEN length(text) ELSE 0 END) AS text_chars,
            sum(CASE WHEN kind='text' AND length(trim(text)) > 0
                     THEN len(string_split_regex(trim(text), '\s+')) ELSE 0 END) AS text_words
        FROM spans_flat GROUP BY doc_id
    )
    SELECT d.doc_id,
        CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
        CAST(coalesce(a.n_text_spans, 0) AS BIGINT) AS n_text_spans,
        CAST(coalesce(a.n_media_spans, 0) AS BIGINT) AS n_media_spans,
        CAST(coalesce(a.text_chars, 0) AS BIGINT) AS text_chars,
        CAST(coalesce(a.text_words, 0) AS BIGINT) AS text_words,
        CAST((1000000 * coalesce(a.n_media_spans, 0))
             // greatest(coalesce(a.n_text_spans, 0), 1) AS BIGINT) AS media_density_e6
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_caption_pairs(spark, sf_dir):
    """LAION-style caption mining from the interleaved span stream: one
    row per media span with its nearest non-empty text span before and
    after, offset distances, and the chosen caption (closer side, tie
    -> before). Pure per-row array ops + one Generate — ZERO exchanges;
    the oracle recomputes it relationally (windows + self-joins), so
    value equality certifies the array formulation."""
    from crawler_spark.operators.spans import caption_pairs

    return caption_pairs(_docs_spans(spark, sf_dir))


_Q_CAPTION_PAIRS_SQL = rf"""
    WITH {_SPANS_SQL},
    win AS (
        SELECT doc_id, kind, media_ref, pos, offs,
            max(CASE WHEN kind='text' AND trim(text) <> '' THEN pos END) OVER
                (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_pos,
            min(CASE WHEN kind='text' AND trim(text) <> '' THEN pos END) OVER
                (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_pos
        FROM spans_off
    ),
    j AS (
        SELECT m.doc_id, m.media_ref, m.pos,
            tb.text AS caption_before, ta.text AS caption_after,
            CAST(m.offs - tb.offs AS BIGINT) AS dist_before,
            CAST(ta.offs - m.offs AS BIGINT) AS dist_after
        FROM win m
        LEFT JOIN spans_off tb ON tb.doc_id = m.doc_id AND tb.pos = m.prev_pos
        LEFT JOIN spans_off ta ON ta.doc_id = m.doc_id AND ta.pos = m.next_pos
        WHERE m.kind = 'media'
    ),
    sided AS (
        SELECT *,
            CASE WHEN dist_before IS NULL AND dist_after IS NULL THEN NULL
                 WHEN dist_after IS NULL THEN 'before'
                 WHEN dist_before IS NULL THEN 'after'
                 WHEN dist_before <= dist_after THEN 'before'
                 ELSE 'after' END AS caption_side
        FROM j
    )
    SELECT doc_id, media_ref, pos, caption_before, caption_after,
        dist_before, dist_after,
        CASE caption_side WHEN 'before' THEN caption_before
                          WHEN 'after' THEN caption_after END AS caption,
        caption_side
    FROM sided
"""


def q_caption_quality(spark, sf_dir):
    """Image-text pair curation: the mined captions gated on word-count
    bounds and alphabetic fraction (exact integers) — the DataComp/LAION
    caption filter. Gate is a per-row filter on the zero-exchange
    mining plan."""
    from crawler_spark.operators.spans import caption_pairs, caption_quality_gate

    return caption_quality_gate(
        caption_pairs(_docs_spans(spark, sf_dir)),
        min_words=8,
        max_words=256,
        min_alpha_e6=700_000,
    ).select("doc_id", "media_ref", "caption", "n_caption_words", "alpha_e6")


_Q_CAPTION_QUALITY_SQL = rf"""
    WITH c AS ({_Q_CAPTION_PAIRS_SQL}),
    g AS (
        SELECT doc_id, media_ref, caption,
            CAST(CASE WHEN length(trim(caption)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(caption), '\s+')) END AS BIGINT)
                AS n_caption_words,
            CAST((1000000 * length(regexp_replace(caption, '[^A-Za-z]', '', 'g')))
                 // greatest(length(caption), 1) AS BIGINT) AS alpha_e6
        FROM c WHERE caption IS NOT NULL
    )
    SELECT * FROM g
    WHERE n_caption_words BETWEEN 8 AND 256 AND alpha_e6 >= 700000
"""

_BOILER_HEADER = "Site Nav Home About Contact"
_BOILER_FOOTER = "Copyright 2026 Example Corp All rights reserved"


def q_strip_boilerplate(spark, sf_dir):
    """Cross-document repeated-span removal with PLANTED boilerplate
    (contamination-entry protocol): every doc gets a shared nav header
    + footer span; spans whose normalized fingerprint appears in >= 4
    distinct docs are stripped (media spans always survive). One
    fingerprint exchange + broadcast anti-join — the corpus never
    shuffles on the probe side. Flat output (kept spans as rows)."""
    from crawler_spark.operators.spans import (
        strip_boilerplate_spans,
        synth_interleaved,
    )

    planted = synth_interleaved(
        _docs_wide(spark, sf_dir), header=_BOILER_HEADER, footer=_BOILER_FOOTER
    )
    return strip_boilerplate_spans(planted, min_df=4, flat=True)


_Q_STRIP_BOILERPLATE_SQL = rf"""
    WITH {_SPANS_SQL},
    raw2 AS (
        SELECT doc_id, chunk, sub, kind, text, media_ref FROM raw_spans
        UNION ALL
        SELECT doc_id, -1, 0, 'text', '{_BOILER_HEADER}', '' FROM w
        UNION ALL
        SELECT doc_id, CAST(9223372036854775807 AS BIGINT), 0, 'text',
               '{_BOILER_FOOTER}', '' FROM w
    ),
    flat2 AS (
        SELECT doc_id, kind, text, media_ref,
            CAST(row_number() OVER (PARTITION BY doc_id ORDER BY chunk, sub) - 1 AS INT) AS pos
        FROM raw2
    ),
    off2 AS (
        SELECT doc_id, kind, text, media_ref, pos,
               CAST(2*pos + doc_id % 3 AS INT) AS offs,
               CASE WHEN kind = 'text'
                    THEN md5(regexp_replace(lower(text), '\s+', ' ', 'g')) END AS f
        FROM flat2
    ),
    hot AS (
        SELECT f FROM (SELECT DISTINCT doc_id, f FROM off2 WHERE f IS NOT NULL)
        GROUP BY f HAVING count(*) >= 4
    )
    SELECT doc_id, pos, kind, text, media_ref, offs AS offset
    FROM off2
    WHERE f IS NULL OR f NOT IN (SELECT f FROM hot)
"""


def q_pack_segments(spark, sf_dir):
    """Writer side of sequence packing: each packed doc exploded into
    its per-window segments (bin_id, bin_offset, seg_len, boundary
    flags) — the records a training data loader materializes
    window-by-window. Integer arithmetic + one Generate on top of the
    two-phase packing map."""
    from crawler_spark.functions.text import pack_segments, pack_sequences

    packed = pack_sequences(_docs_wide(spark, sf_dir), capacity=256)
    return pack_segments(packed, capacity=256)


_Q_PACK_SEGMENTS_SQL = rf"""
    WITH packed AS ({_Q_PACK_SEQUENCES_SQL}),
    ex AS (
        SELECT doc_id, n_tokens, start_offset, end_offset, b.bin_id
        FROM packed, UNNEST(generate_series(first_bin, last_bin)) AS b(bin_id)
        WHERE n_tokens > 0
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id, doc_id,
        CAST(greatest(start_offset, bin_id*256) - bin_id*256 AS BIGINT) AS bin_offset,
        CAST(least(end_offset, (bin_id+1)*256)
             - greatest(start_offset, bin_id*256) AS BIGINT) AS seg_len,
        greatest(start_offset, bin_id*256) = start_offset AS is_doc_start,
        least(end_offset, (bin_id+1)*256) = end_offset AS is_doc_end
    FROM ex
"""


def q_pack_fill(spark, sf_dir):
    """Per-window packing utilization (segments, doc starts/ends,
    token fill vs capacity) — the wasted-compute accounting every
    packing recipe reports; one keyed agg over the segment rows."""
    from crawler_spark.functions.text import (
        pack_fill_stats,
        pack_segments,
        pack_sequences,
    )

    packed = pack_sequences(_docs_wide(spark, sf_dir), capacity=256)
    return pack_fill_stats(pack_segments(packed, capacity=256), capacity=256)


_Q_PACK_FILL_SQL = rf"""
    WITH segs AS ({_Q_PACK_SEGMENTS_SQL})
    SELECT bin_id,
        CAST(count(*) AS BIGINT) AS n_segments,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN is_doc_start THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_started,
        CAST(sum(CASE WHEN is_doc_end THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_ended,
        CAST(sum(seg_len) AS BIGINT) AS doc_tokens,
        CAST((1000000 * sum(seg_len)) // 256 AS BIGINT) AS util_e6
    FROM segs GROUP BY bin_id
"""


def q_span_langs(spark, sf_dir):
    """Per-document language MIX over the span stream (code-switching
    detector): every text span classified independently, counts and the
    majority vote aggregated in the array world — zero exchanges; the
    oracle recomputes it relationally (per-span CASE + groupBy)."""
    from crawler_spark.operators.spans import span_lang_profile

    return span_lang_profile(_docs_spans(spark, sf_dir))


_Q_SPAN_LANGS_SQL = rf"""
    WITH {_SPANS_SQL},
    cls AS (
        SELECT doc_id,
            CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                 WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                 WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                 WHEN s_es >= s_fr THEN 'es'
                 ELSE 'fr' END AS lang
        FROM (
            SELECT doc_id,
                {_LANG_SCORE_SQL['de']} AS s_de, {_LANG_SCORE_SQL['en']} AS s_en,
                {_LANG_SCORE_SQL['es']} AS s_es, {_LANG_SCORE_SQL['fr']} AS s_fr
            FROM spans_flat WHERE kind = 'text'
        )
    ),
    agg AS (
        SELECT doc_id,
            CAST(count(*) AS BIGINT) AS n_text_spans,
            CAST(sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
            CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
            CAST(sum(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
            CAST(sum(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr
        FROM cls GROUP BY doc_id
    ),
    full_rows AS (
        SELECT d.doc_id,
            coalesce(a.n_text_spans, 0) AS n_text_spans,
            coalesce(a.n_de, 0) AS n_de, coalesce(a.n_en, 0) AS n_en,
            coalesce(a.n_es, 0) AS n_es, coalesce(a.n_fr, 0) AS n_fr
        FROM documents d LEFT JOIN agg a USING (doc_id)
    ),
    scored AS (
        SELECT *,
            n_de + n_en + n_es + n_fr AS n_classified,
            (CASE WHEN n_de > 0 THEN 1 ELSE 0 END + CASE WHEN n_en > 0 THEN 1 ELSE 0 END
             + CASE WHEN n_es > 0 THEN 1 ELSE 0 END + CASE WHEN n_fr > 0 THEN 1 ELSE 0 END)
                AS n_langs,
            CASE WHEN n_de + n_en + n_es + n_fr = 0 THEN 'und'
                 WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr THEN 'de'
                 WHEN n_en >= n_es AND n_en >= n_fr THEN 'en'
                 WHEN n_es >= n_fr THEN 'es'
                 ELSE 'fr' END AS majority_lang,
            CASE WHEN n_de + n_en + n_es + n_fr = 0 THEN 0
                 ELSE greatest(n_de, n_en, n_es, n_fr) END AS majority_n
        FROM full_rows
    )
    SELECT doc_id, n_text_spans, n_de, n_en, n_es, n_fr,
        CAST(n_classified AS BIGINT) AS n_classified,
        CAST(n_langs AS BIGINT) AS n_langs,
        majority_lang,
        CAST(majority_n AS BIGINT) AS majority_n,
        CAST((1000000 * majority_n) // greatest(n_classified, 1) AS BIGINT)
            AS majority_frac_e6
    FROM scored
"""


def q_perceptron_weights(spark, sf_dir):
    """In-engine classifier TRAINING: 3 batch-perceptron iterations on
    a lang=='en' label (learn an English detector), exact 64-bit
    integer arithmetic throughout — margins, mistake sets and weight
    updates are integer sums, so training is bit-identical under any
    partitioning AND hash-certifiable: the oracle UNROLLS the three
    iterations as successive CTEs (the pagerank-oracle pattern)."""
    from crawler_spark.operators.classifier import train_perceptron

    d = _docs_wide(spark, sf_dir).withColumn(
        "y", F.when(F.col("lang") == "en", 1).otherwise(-1).cast("long")
    )
    return train_perceptron(d, "y", n_iters=3)


_PERC_ITER_SQL = """
    m{k} AS (
        SELECT doc_id, y, sum(cnt * coalesce(weight, 0)) AS margin
        FROM f LEFT JOIN w{p} USING (tok) GROUP BY doc_id, y
    ),
    mk{k} AS (SELECT doc_id FROM m{k} WHERE margin * y <= 0),
    d{k} AS (
        SELECT tok, CAST(sum(y * cnt) AS BIGINT) AS d
        FROM f JOIN mk{k} USING (doc_id)
        GROUP BY tok HAVING sum(y * cnt) <> 0
    ),
    w{k} AS (
        SELECT coalesce(w{p}.tok, d{k}.tok) AS tok,
               CAST(coalesce(weight, 0) + coalesce(d, 0) AS BIGINT) AS weight
        FROM w{p} FULL JOIN d{k} ON w{p}.tok = d{k}.tok
        WHERE coalesce(weight, 0) + coalesce(d, 0) <> 0
    )
"""

_Q_PERCEPTRON_SQL = rf"""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                unnest(string_split_regex(trim(lower(coalesce(text, ''))), '\s+')) AS tok
            FROM documents
        ) WHERE tok <> ''
        UNION ALL
        SELECT doc_id, ' bias ' FROM documents
    ),
    feats AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
        FROM toks GROUP BY doc_id, tok
    ),
    lab AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
        FROM documents
    ),
    f AS (SELECT feats.*, y FROM feats JOIN lab USING (doc_id)),
    -- iteration 1: empty weights -> every margin 0 -> every doc a mistake
    w1 AS (
        SELECT tok, CAST(sum(y * cnt) AS BIGINT) AS weight
        FROM f GROUP BY tok HAVING sum(y * cnt) <> 0
    ),
    {_PERC_ITER_SQL.format(k=2, p=1)},
    {_PERC_ITER_SQL.format(k=3, p=2)}
    SELECT tok, weight FROM w3
"""


def q_bpe_merges(spark, sf_dir):
    """BPE tokenizer training ON the corpus (operators/bpe.py): the
    ordered merge list after 16 rounds. Training is genuinely
    iterative (each round's argmax depends on all previous merges), so
    the oracle uses the crawl_multiround VALUES pattern: an
    independent pure-python trainer (the same reference
    tests/test_bpe.py pins) replayed over the sf0.01 documents at
    oracle-build time, inlined as literal VALUES. Training is pinned
    invariant to partitioning (deterministic count-desc/UTF8-byte
    lexicographic tie-break), so the replay is exact."""
    from crawler_spark.operators.bpe import merges_df, train_bpe

    return merges_df(spark, train_bpe(_docs_wide(spark, sf_dir), n_merges=16))


@functools.lru_cache(maxsize=1)
def _bpe_merges_sql() -> str:
    """Generated, not hand-written: replay BPE training in pure python
    (list(word)+['</w>'] symbols, greedy leftmost merge, ties by
    count desc then UTF-8 byte order of (left, right) — binary string
    order, matching Spark's orderBy on strings) over the same sf0.01
    documents the Spark entry trains on, and inline the merge list as
    VALUES. Word extraction mirrors operators/bpe.py::word_freqs
    bit-for-bit: trim = 0x20 only (Spark's trim), split on Java
    \\s+ = [ \\t\\n\\x0b\\f\\r]+ (NOT python's unicode \\s)."""
    import re
    from collections import Counter

    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{ORACLE_SF_DIR}/documents.parquet')"
        ).fetchall()
    ]
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    wf: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        t = t.strip(" ")
        if not t:
            continue
        for w in ws.split(t):
            if w:
                wf[w] += 1
    state = {w: (list(w) + ["</w>"], f) for w, f in wf.items()}
    merges = []
    for rank in range(16):
        pairs: Counter = Counter()
        for syms, f in state.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(),
            key=lambda kv: (-kv[1], kv[0][0].encode(), kv[0][1].encode()),
        )
        if n < 2:
            break
        merges.append((rank, left, right, left + right, n))
        new_state = {}
        for w, (syms, f) in state.items():
            out: list = []
            for cur in syms:
                if out and out[-1] == left and cur == right:
                    out[-1] = left + right
                else:
                    out.append(cur)
            new_state[w] = (out, f)
        state = new_state

    def esc(s: str) -> str:
        return s.replace("'", "''")

    if not merges:
        return (
            "SELECT CAST(NULL AS INT) AS rank, CAST(NULL AS VARCHAR) AS left,"
            " CAST(NULL AS VARCHAR) AS right, CAST(NULL AS VARCHAR) AS merged,"
            " CAST(NULL AS BIGINT) AS pair_count WHERE 1 = 0"
        )
    rows = ",\n".join(
        f"({rk}, '{esc(l)}', '{esc(r)}', '{esc(m)}', {n})"
        for rk, l, r, m, n in merges
    )
    return (
        'SELECT CAST(rank AS INT) AS rank, "left", "right", merged,\n'
        "       CAST(pair_count AS BIGINT) AS pair_count\n"
        f'FROM (VALUES\n{rows}\n) AS t(rank, "left", "right", merged, pair_count)\n'
        "ORDER BY rank"
    )


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------


def q_crawl_multiround(spark, sf_dir):
    """THREE real engine rounds end-to-end — seed discovery, politeness
    budget window, seen anti-join, link follow, snapshot commits — with
    the full crawl_order (round, seq, site, url, status) as the result.
    The driver-gated composite of the north rule's ordering guarantee:
    the SQL twin is the independent pure-Python reference oracle
    (crawler_spark/oracle.py — the same one every engine-vs-oracle
    pytest dimension pins, reimplementing the reference crawler's loop
    semantics from app.py/crawler.py) replayed over the identical
    deterministic world and materialized as literal VALUES, so DuckDB
    certifies the multi-round crawl state externally."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.session import ship_package
    from crawler_spark.world import make_world

    ship_package(spark)
    world = make_world(seed=42, n_hosts=3, n_urls=18, budget=2, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="entry-crawl3-"))
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=3)
    return (
        eng.io.read(spark, "crawl_order")
        .select("round", "seq", "site", "url", "status")
        .orderBy("seq")
    )


@functools.lru_cache(maxsize=1)
def _crawl_multiround_sql() -> str:
    """Three-round crawl replay oracle (everything derives from
    blake2b(seed), no RNG/clock) — see _crawl_values_sql."""
    return _crawl_values_sql(max_rounds=3)


def q_model_embed(spark, sf_dir):
    """The real-model adapter path under the external gate: an integer
    weight MATRIX executed by operators.models.int_matrix_embedding —
    an Arrow-batched pandas_udf over a SparkContext broadcast, i.e. the
    exact execution shape a real fastText/word2vec model ships in —
    certified bit-for-bit against a pure-SQL twin (explode tokens,
    md5-bucket each, sum the bucket's weight row). The matrix is a
    closed-form integer formula so BOTH sides derive it independently:
    W[b, j] = ((7b + 13j) mod 23) - 11, 16 buckets x 4 dims."""
    import numpy as np

    from crawler_spark.operators.models import int_matrix_embedding
    from crawler_spark.session import ship_package

    ship_package(spark)
    b = np.arange(16).reshape(-1, 1)
    j = np.arange(4).reshape(1, -1)
    w = ((7 * b + 13 * j) % 23) - 11
    embed = int_matrix_embedding(spark, w)
    docs = _docs_wide(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    e = embed(F.col("text"))
    return docs.select(
        "doc_id", *[e[i].alias(f"e{i}") for i in range(4)]
    )


_Q_MODEL_EMBED_SQL = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, tok
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
), bt AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 16 AS BIGINT) AS b
  FROM toks
), sums AS (
  SELECT doc_id,
         SUM((7 * b + 13 * 0) % 23 - 11) AS e0,
         SUM((7 * b + 13 * 1) % 23 - 11) AS e1,
         SUM((7 * b + 13 * 2) % 23 - 11) AS e2,
         SUM((7 * b + 13 * 3) % 23 - 11) AS e3
  FROM bt GROUP BY doc_id
)
SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
       CAST(coalesce(s.e0, 0) AS BIGINT) AS e0,
       CAST(coalesce(s.e1, 0) AS BIGINT) AS e1,
       CAST(coalesce(s.e2, 0) AS BIGINT) AS e2,
       CAST(coalesce(s.e3, 0) AS BIGINT) AS e3
FROM documents d LEFT JOIN sums s ON CAST(d.doc_id AS VARCHAR) = s.doc_id
"""


def q_robots_parse(spark, sf_dir):
    """S1 under the external gate: REAL robots.txt text — synthesized
    deterministically per nation row (sitemap + disallow + allow +
    crawl-delay lines, some hosts with a blank/comment-only body) — run
    through sources.robots_txt.parse_robots, the same parser the wire
    crawl uses. The oracle derives the expected rules from the
    generation formula in pure SQL, so the parser's line handling
    (case-insensitive keys, first-colon split, trim, file order,
    delay->budget) is certified against an independent spelling.
    Arrays are flattened to '|'-joined strings for the hash compare."""
    from crawler_spark.sources.robots_txt import parse_robots

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("k")
    )
    host = F.concat(F.lit("h"), F.col("k").cast("string"), F.lit(".example.com"))
    body = F.when(
        F.col("k") % 5 == 4,
        F.lit("# mirrors disabled\n\n"),  # no rules at all
    ).otherwise(
        F.concat(
            F.lit("# synthetic robots\n"),
            F.lit("SiteMap: https://"), host, F.lit("/sm_a.xml\n"),
            F.lit("Disallow: /private"), F.col("k").cast("string"), F.lit("\n"),
            F.lit("sitemap: https://"), host, F.lit("/sm_b.xml.gz\n"),
            F.lit("Allow: /private"), F.col("k").cast("string"), F.lit("/ok\n"),
            F.lit("Crawl-Delay: 0."), (F.col("k") % 4 + 1).cast("string"), F.lit("\n"),
            F.lit("Disallow: /tmp\n"),
        )
    )
    raw = n.select(host.alias("host"), body.alias("body"))
    parsed = parse_robots(raw, default_budget=1)
    return parsed.select(
        "host",
        # sitemap collection order is not file-pinned (RFC: group-
        # independent set); sort for a stable compare
        F.concat_ws("|", F.array_sort("sitemap_urls")).alias("sitemaps"),
        F.concat_ws("|", "disallow_prefixes").alias("disallows"),
        F.concat_ws("|", "allow_prefixes").alias("allows"),
        F.col("crawl_budget").cast("int").alias("crawl_budget"),
    )


_Q_ROBOTS_PARSE_SQL = """
WITH n AS (
  SELECT CAST(n_nationkey AS INT) AS k,
         'h' || CAST(n_nationkey AS INT) || '.example.com' AS host
  FROM nation
)
SELECT host,
  CASE WHEN k % 5 = 4 THEN ''
       ELSE 'https://' || host || '/sm_a.xml|https://' || host || '/sm_b.xml.gz'
  END AS sitemaps,
  CASE WHEN k % 5 = 4 THEN ''
       ELSE '/private' || CAST(k AS VARCHAR) || '|/tmp'
  END AS disallows,
  CASE WHEN k % 5 = 4 THEN ''
       ELSE '/private' || CAST(k AS VARCHAR) || '/ok'
  END AS allows,
  -- floor(1/delay) with delay = (k%4+1)/10: 0.1->10, 0.2->5, 0.3->3, 0.4->2
  CAST(CASE WHEN k % 5 = 4 THEN 1
            ELSE CAST(10 / (k % 4 + 1) AS INT)
  END AS INT) AS crawl_budget
FROM n
"""


def q_robots_groups(spark, sf_dir):
    """RFC 9309 §2.2.1 user-agent GROUP SELECTION under the external
    gate: per nation row the robots body gets (by k mod 3) only OUR
    token's group, only the '*' group, or both — plus a pre-group
    global rule that applies unconditionally. Expected precedence: a
    group naming our product token (case-insensitive) wins; '*' is the
    fallback only when no group names us; pre-group rules always apply.
    The oracle derives the expected disallow list from the same mod-3
    formula in pure SQL."""
    from crawler_spark.sources.robots_txt import parse_robots

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("k")
    )
    host = F.concat(F.lit("h"), F.col("k").cast("string"), F.lit(".example.com"))
    ks = F.col("k").cast("string")
    mine = F.concat(
        F.lit("User-Agent: CRAWLER-SPARK\nDisallow: /mine"), ks, F.lit("\n")
    )
    star = F.concat(F.lit("User-agent: *\nDisallow: /star"), ks, F.lit("\n"))
    body = F.concat(
        F.lit("Disallow: /global\n"),  # pre-group: applies to everyone
        F.when(F.col("k") % 3 == 0, mine)
        .when(F.col("k") % 3 == 1, star)
        .otherwise(F.concat(mine, star)),
    )
    raw = n.select(host.alias("host"), body.alias("body"))
    return parse_robots(raw).select(
        "host", F.concat_ws("|", "disallow_prefixes").alias("disallows")
    )


_Q_ROBOTS_GROUPS_SQL = """
SELECT 'h' || CAST(CAST(n_nationkey AS INT) AS VARCHAR) || '.example.com' AS host,
  CASE WHEN CAST(n_nationkey AS INT) % 3 = 1
       THEN '/global|/star' || CAST(CAST(n_nationkey AS INT) AS VARCHAR)
       ELSE '/global|/mine' || CAST(CAST(n_nationkey AS INT) AS VARCHAR)
  END AS disallows
FROM nation
"""


def q_sitemap_parse(spark, sf_dir):
    """S2 under the external gate: REAL sitemap XML — three <url>
    entries per nation row with lastmod/changefreq/priority children,
    every third sitemap gzip-compressed (deterministic mtime=0) — run
    through sources.sitemap_xml.parse_sitemap_meta, the Arrow
    mapInPandas parser the wire crawl uses (gzip sniff + namespace-
    tolerant ElementTree walk). The oracle regenerates the expected
    rows from the same formula in pure SQL. The 25-row fixture dim is
    built driver-side (world synthesis, not corpus data)."""
    import gzip as _gz

    from crawler_spark.session import ship_package
    from crawler_spark.sources.sitemap_xml import parse_sitemap_meta

    ship_package(spark)
    ks = sorted(
        r.k for r in _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").cast("int").alias("k"))
        .collect()
    )
    rows = []
    for k in ks:
        host = f"h{k}.example.com"
        urls = "".join(
            f"<url><loc>https://{host}/p{i}</loc>"
            f"<lastmod>2024-0{i % 9 + 1}-01</lastmod>"
            f"<changefreq>daily</changefreq>"
            f"<priority>0.{(k + i) % 10}</priority></url>"
            for i in range(3)
        )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{urls}</urlset>"
        )
        gz = k % 3 == 0
        body = _gz.compress(xml.encode(), mtime=0) if gz else xml.encode()
        rows.append(
            (f"https://{host}/sitemap.xml" + (".gz" if gz else ""), bytearray(body))
        )
    raw = spark.createDataFrame(rows, "sitemap_url string, body binary")
    return parse_sitemap_meta(raw)


_Q_SITEMAP_PARSE_SQL = """
WITH n AS (
  SELECT CAST(n_nationkey AS INT) AS k FROM nation
), u AS (
  SELECT k, CAST(i AS INT) AS i FROM n, range(0, 3) t(i)
)
SELECT
  'https://h' || CAST(k AS VARCHAR) || '.example.com/sitemap.xml'
    || CASE WHEN k % 3 = 0 THEN '.gz' ELSE '' END AS sitemap_url,
  'https://h' || CAST(k AS VARCHAR) || '.example.com/p' || CAST(i AS VARCHAR) AS url,
  '2024-0' || CAST(i % 9 + 1 AS VARCHAR) || '-01' AS lastmod,
  'daily' AS changefreq,
  '0.' || CAST((k + i) % 10 AS VARCHAR) AS priority
FROM u
"""


def q_url_strip_tracking(spark, sf_dir):
    """Tracking-param removal (functions.urls.strip_tracking_col): the
    campaign-link dedup collapse — utm_*/click-id query params dropped
    JVM-side with higher-order array ops, everything else (param order
    included) preserved byte-for-byte. URLs synthesized per nation row
    with a mix of tracked and legitimate params (some URLs all-tracked,
    some param-free)."""
    from crawler_spark.functions.urls import strip_tracking_col

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("k")
    )
    ks = F.col("k").cast("string")
    url = F.when(
        F.col("k") % 4 == 3,
        F.concat(F.lit("https://h"), ks, F.lit(".example.com/plain")),
    ).when(
        F.col("k") % 4 == 2,
        F.concat(
            F.lit("https://h"), ks,
            F.lit(".example.com/p?utm_source=news&GCLID=zz"), ks,
        ),
    ).otherwise(
        F.concat(
            F.lit("https://h"), ks, F.lit(".example.com/p?id="), ks,
            F.lit("&utm_campaign=x&b="), (F.col("k") % 3).cast("string"),
            F.lit("&fbclid=abc"), ks,
        )
    )
    return n.select(
        "k", url.alias("url"), strip_tracking_col(url).alias("stripped")
    )


_Q_URL_STRIP_TRACKING_SQL = """
WITH n AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation)
SELECT k,
  CASE WHEN k % 4 = 3 THEN 'https://h' || CAST(k AS VARCHAR) || '.example.com/plain'
       WHEN k % 4 = 2 THEN 'https://h' || CAST(k AS VARCHAR)
            || '.example.com/p?utm_source=news&GCLID=zz' || CAST(k AS VARCHAR)
       ELSE 'https://h' || CAST(k AS VARCHAR) || '.example.com/p?id=' || CAST(k AS VARCHAR)
            || '&utm_campaign=x&b=' || CAST(k % 3 AS VARCHAR)
            || '&fbclid=abc' || CAST(k AS VARCHAR)
  END AS url,
  CASE WHEN k % 4 = 3 THEN 'https://h' || CAST(k AS VARCHAR) || '.example.com/plain'
       WHEN k % 4 = 2 THEN 'https://h' || CAST(k AS VARCHAR) || '.example.com/p'
       ELSE 'https://h' || CAST(k AS VARCHAR) || '.example.com/p?id=' || CAST(k AS VARCHAR)
            || '&b=' || CAST(k % 3 AS VARCHAR)
  END AS stripped
FROM n
"""


def q_text_normalize(spark, sf_dir):
    """Unicode NFC normalization (functions.text.normalize_text_udf):
    decomposed combining sequences (e+U+0301, n+U+0303) synthesized per
    nation row, composed by the Arrow pandas_udf (Python unicodedata)
    and certified against DuckDB's ICU nfc_normalize — two independent
    Unicode implementations must agree bit-for-bit. raw_len vs norm_len
    shows the composition actually happened (5→3 code points in the
    'café-ñ' fragment)."""
    from crawler_spark.functions.text import normalize_text_udf

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("k")
    )
    # literal code points: Spark's chr() is ASCII-mod-256 (chr(769) ->
    # \x01), so the combining marks ride in as Python literals; the
    # DuckDB twin uses its code-point chr() to build the same string
    raw = F.concat(
        F.lit("caf"), F.lit("e"), F.lit("\u0301"),
        F.lit(" n"), F.lit("\u0303"),
        F.lit(" k="), F.col("k").cast("string"),
    )
    norm = normalize_text_udf("NFC", strip_invisible=False)(raw)
    return n.select(
        "k",
        norm.alias("norm"),
        F.length(raw).cast("int").alias("raw_len"),
        F.length(norm).cast("int").alias("norm_len"),
    )


_Q_TEXT_NORMALIZE_SQL = """
WITH n AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation),
s AS (
  SELECT k,
         'caf' || chr(101) || chr(769) || ' n' || chr(771)
           || ' k=' || CAST(k AS VARCHAR) AS raw
  FROM n
)
SELECT k,
       nfc_normalize(raw) AS norm,
       CAST(length(raw) AS INT) AS raw_len,
       CAST(length(nfc_normalize(raw)) AS INT) AS norm_len
FROM s
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_frontier_schedule_round(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Round-5 rotation (r04 verdict Next #2): slots 1-11 are the six
    # never-driver-sampled entries, the two fixed r04 reds, and the
    # three formerly-no-oracle entries; slots 12-50 refresh the cohort
    # whose newest driver rows date from r01-r03. With this sample,
    # every registered entry has at least one driver correctness row.
    return {
        "lsh_hot_buckets": q_lsh_hot_buckets,
        "robots_parse": q_robots_parse,
        "robots_groups": q_robots_groups,
        "sitemap_parse": q_sitemap_parse,
        "url_strip_tracking": q_url_strip_tracking,
        "text_normalize": q_text_normalize,
        "quantize_embeddings": q_quantize_embeddings,
        "bpe_merges": q_bpe_merges,
        "multimodal_features": q_multimodal_features,
        "crawl_round": q_crawl_round,
        "ivf_kmeans_topk": q_ivf_kmeans_topk,
        "frontier_schedule_round": q_frontier_schedule_round,
        "score_schedule": q_score_schedule,
        "seen_antijoin": q_seen_antijoin,
        "host_budget_window": q_host_budget_window,
        "tombstone_except": q_tombstone_except,
        "broadcast_dim_join": q_broadcast_dim_join,
        "type_counts": q_type_counts,
        "error_counts": q_error_counts,
        "global_summary": q_global_summary,
        "top_k_recent": q_top_k_recent,
        "error_categorize": q_error_categorize,
        "json_extract": q_json_extract,
        "sessionize": q_sessionize,
        "event_windows": q_event_windows,
        "tpch_q1": q_tpch_q1,
        "rollup_summary": q_rollup_summary,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "minhash_lsh_pairs_cached": q_minhash_lsh_pairs_cached,
        "simhash": q_simhash,
        "simhash_near_dup": q_simhash_near_dup,
        "simhash_near_dup_cached": q_simhash_near_dup_cached,
        "jaccard_pairs": q_jaccard_pairs,
        "jaccard_pairs_guarded": q_jaccard_pairs_guarded,
        "lsh_buckets": q_lsh_buckets,
        "ann_topk": q_ann_topk,
        "text_profile": q_text_profile,
        "repetition_profile": q_repetition_profile,
        "pii_profile": q_pii_profile,
        "redact_pii": q_redact_pii,
        "gopher_gates": q_gopher_gates,
        "contamination": q_contamination,
        "classifier_score": q_classifier_score,
        "bernoulli_sample": q_bernoulli_sample,
        "length_quantiles": q_length_quantiles,
        "pack_sequences": q_pack_sequences,
        "full_curation": q_full_curation,
        "corpus_curation": q_corpus_curation,
        "crawl_multiround": q_crawl_multiround,
        "model_embed": q_model_embed,
        "retry_backoff": q_retry_backoff,
        "anchor_texts": q_anchor_texts,
        "anchor_topk": q_anchor_topk,
        "bfs_levels": q_bfs_levels,
        "budget_apportion": q_budget_apportion,
        "host_graph": q_host_graph,
        "stop_shingles": q_stop_shingles,
        "search_eval": q_search_eval,
        "link_graph_stats": q_link_graph_stats,
        "pagerank": q_pagerank,
        "multimodal_resize": q_multimodal_resize,
        "media_phash": q_media_phash,
        "media_near_dup": q_media_near_dup,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_overlap": q_winnow_overlap,
        "dup_clusters": q_dup_clusters,
        "canonical_corpus": q_canonical_corpus,
        "bm25_topk": q_bm25_topk,
        "recrawl_schedule": q_recrawl_schedule,
        "lm_score": q_lm_score,
        "trap_hosts": q_trap_hosts,
        "lm_buckets": q_lm_buckets,
        "mixture_weights": q_mixture_weights,
        "token_budget_mix": q_token_budget_mix,
        "fetch_plan": q_fetch_plan,
        "cdc_chunks": q_cdc_chunks,
        "cdc_dedup": q_cdc_dedup,
        "dsir_weights": q_dsir_weights,
        "dsir_select": q_dsir_select,
        "quantized_topk": q_quantized_topk,
        "semdedup": q_semdedup,
        "hybrid_topk": q_hybrid_topk,
        "exact_substr_spans": q_exact_substr_spans,
        "exact_substr_strip": q_exact_substr_strip,
        "trustrank": q_trustrank,
        "mirror_sites": q_mirror_sites,
        "interleaved_stats": q_interleaved_stats,
        "caption_pairs": q_caption_pairs,
        "caption_quality": q_caption_quality,
        "strip_boilerplate": q_strip_boilerplate,
        "span_langs": q_span_langs,
        "pack_segments": q_pack_segments,
        "pack_fill": q_pack_fill,
        "perceptron_weights": q_perceptron_weights,
        "hits": q_hits,
        "bm25_indexed": q_bm25_indexed,
        "line_dedup": q_line_dedup,
        "stratified_sample": q_stratified_sample,
        "top_terms": q_top_terms,
        "heavy_hitters": q_heavy_hitters,
        "lang_heavy_hitters": q_lang_heavy_hitters,
        "revalidate_plan": q_revalidate_plan,
        "holdout_split": q_holdout_split,
        "split_leakage": q_split_leakage,
        "dup_clusters_incremental": q_dup_clusters_incremental,
        "sitemap_bootstrap": q_sitemap_bootstrap,
        "minhash_calibration": q_minhash_calibration,
        "stub_embedding": q_stub_embedding,
        "embedding_near_dup": q_embedding_near_dup,
        "ivf_topk": q_ivf_topk,
        "frontier_state_merge": q_frontier_state_merge,
        "char_ngrams": q_char_ngrams,
        "lsh_bucketed_topk": q_lsh_bucketed_topk,
        "backoff_rounds": q_backoff_rounds,
        "seed_dispatch": q_seed_dispatch,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "crawl_multiround": _crawl_multiround_sql(),
        "model_embed": _Q_MODEL_EMBED_SQL,
        "retry_backoff": _Q_RETRY_BACKOFF_SQL,
        "anchor_texts": _Q_ANCHOR_TEXTS_SQL,
        "anchor_topk": _Q_ANCHOR_TOPK_SQL,
        "bfs_levels": _Q_BFS_LEVELS_SQL,
        "budget_apportion": _Q_BUDGET_APPORTION_SQL,
        "host_graph": _Q_HOST_GRAPH_SQL,
        "stop_shingles": _Q_STOP_SHINGLES_SQL,
        "search_eval": _Q_SEARCH_EVAL_SQL,
        "link_graph_stats": _Q_LINK_STATS_SQL,
        "pagerank": _Q_PAGERANK_SQL,
        "multimodal_resize": _Q_MULTIMODAL_RESIZE_SQL,
        "media_phash": _Q_MEDIA_PHASH_SQL,
        "media_near_dup": _Q_MEDIA_NEAR_DUP_SQL,
        "winnow_fingerprints": _Q_WINNOW_FP_SQL,
        "winnow_overlap": _Q_WINNOW_OVERLAP_SQL,
        "dup_clusters": _Q_DUP_CLUSTERS_SQL,
        "canonical_corpus": _Q_CANONICAL_CORPUS_SQL,
        "bm25_topk": _Q_BM25_SQL,
        "recrawl_schedule": _Q_RECRAWL_SQL,
        "lm_score": _Q_LM_SCORE_SQL,
        "trap_hosts": _Q_TRAP_HOSTS_SQL,
        "lm_buckets": _Q_LM_BUCKETS_SQL,
        "mixture_weights": _Q_MIXTURE_WEIGHTS_SQL,
        "token_budget_mix": _Q_TOKEN_BUDGET_MIX_SQL,
        "fetch_plan": _Q_FETCH_PLAN_SQL,
        "cdc_chunks": _Q_CDC_CHUNKS_SQL,
        "cdc_dedup": _Q_CDC_DEDUP_SQL,
        "dsir_weights": _Q_DSIR_WEIGHTS_SQL,
        "dsir_select": _Q_DSIR_SELECT_SQL,
        "quantize_embeddings": _Q_QUANTIZE_SQL,
        "quantized_topk": _Q_QUANTIZED_TOPK_SQL,
        "semdedup": _Q_SEMDEDUP_SQL,
        "hybrid_topk": _Q_HYBRID_TOPK_SQL,
        "exact_substr_spans": _Q_EXACT_SUBSTR_SPANS_SQL,
        "exact_substr_strip": _Q_EXACT_SUBSTR_STRIP_SQL,
        "trustrank": _Q_TRUSTRANK_SQL,
        "mirror_sites": _Q_MIRROR_SITES_SQL,
        "interleaved_stats": _Q_INTERLEAVED_STATS_SQL,
        "caption_pairs": _Q_CAPTION_PAIRS_SQL,
        "caption_quality": _Q_CAPTION_QUALITY_SQL,
        "strip_boilerplate": _Q_STRIP_BOILERPLATE_SQL,
        "span_langs": _Q_SPAN_LANGS_SQL,
        "pack_segments": _Q_PACK_SEGMENTS_SQL,
        "pack_fill": _Q_PACK_FILL_SQL,
        "perceptron_weights": _Q_PERCEPTRON_SQL,
        "hits": _Q_HITS_SQL,
        "bm25_indexed": _Q_BM25_SQL,
        "bpe_merges": _bpe_merges_sql(),
        "lsh_hot_buckets": _Q_LSH_HOT_BUCKETS_SQL,
        "robots_parse": _Q_ROBOTS_PARSE_SQL,
        "robots_groups": _Q_ROBOTS_GROUPS_SQL,
        "sitemap_parse": _Q_SITEMAP_PARSE_SQL,
        "url_strip_tracking": _Q_URL_STRIP_TRACKING_SQL,
        "text_normalize": _Q_TEXT_NORMALIZE_SQL,
        "frontier_schedule_round": _Q_FRONTIER_SCHEDULE_SQL,
        "score_schedule": _Q_SCORE_SCHEDULE_SQL,
        "seen_antijoin": _Q_SEEN_ANTIJOIN_SQL,
        "host_budget_window": _Q_HOST_BUDGET_SQL,
        "tombstone_except": _Q_TOMBSTONE_SQL,
        "broadcast_dim_join": _Q_BROADCAST_DIM_SQL,
        "type_counts": _Q_TYPE_COUNTS_SQL,
        "error_counts": _Q_ERROR_COUNTS_SQL,
        "global_summary": _Q_GLOBAL_SUMMARY_SQL,
        "top_k_recent": _Q_TOP_K_SQL,
        "error_categorize": _Q_ERROR_CATEGORIZE_SQL,
        "json_extract": _Q_JSON_EXTRACT_SQL,
        "sessionize": _Q_SESSIONIZE_SQL,
        "event_windows": _Q_EVENT_WINDOWS_SQL,
        "tpch_q1": _Q_TPCH_Q1_SQL,
        "rollup_summary": _Q_ROLLUP_SQL,
        "dedup_exact": _Q_DEDUP_EXACT_SQL,
        "minhash_signatures": _Q_MINHASH_SQL,
        "minhash_lsh_pairs": _Q_LSH_PAIRS_SQL,
        "minhash_lsh_pairs_cached": _Q_LSH_PAIRS_SQL,
        "simhash": _Q_SIMHASH_SQL,
        "simhash_near_dup": _Q_SIMHASH_NEAR_DUP_SQL,
        "simhash_near_dup_cached": _Q_SIMHASH_NEAR_DUP_SQL,
        "jaccard_pairs": _Q_JACCARD_SQL,
        "jaccard_pairs_guarded": _Q_JACCARD_GUARDED_SQL,
        "lsh_buckets": _Q_LSH_BUCKETS_SQL,
        "ann_topk": _Q_ANN_TOPK_SQL,
        "text_profile": _Q_TEXT_PROFILE_SQL,
        "repetition_profile": _Q_REPETITION_SQL,
        "pii_profile": _Q_PII_PROFILE_SQL,
        "redact_pii": _Q_REDACT_PII_SQL,
        "gopher_gates": _Q_GOPHER_SQL,
        "contamination": _Q_CONTAMINATION_SQL,
        "classifier_score": _Q_CLASSIFIER_SQL,
        "bernoulli_sample": _Q_BERNOULLI_SQL,
        "length_quantiles": _Q_LENGTH_QUANTILES_SQL,
        "pack_sequences": _Q_PACK_SEQUENCES_SQL,
        "full_curation": _Q_FULL_CURATION_SQL,
        "corpus_curation": _Q_CORPUS_CURATION_SQL,
        "line_dedup": _Q_LINE_DEDUP_SQL,
        "stratified_sample": _Q_STRATIFIED_SAMPLE_SQL,
        "top_terms": _Q_TOP_TERMS_SQL,
        "heavy_hitters": _Q_HEAVY_HITTERS_SQL,
        "lang_heavy_hitters": _Q_LANG_HEAVY_HITTERS_SQL,
        "revalidate_plan": _Q_REVALIDATE_PLAN_SQL,
        "holdout_split": _Q_HOLDOUT_SPLIT_SQL,
        "split_leakage": _Q_SPLIT_LEAKAGE_SQL,
        "dup_clusters_incremental": _Q_DUP_CLUSTERS_INCR_SQL,
        "sitemap_bootstrap": _Q_SITEMAP_BOOTSTRAP_SQL,
        "minhash_calibration": _Q_MINHASH_CALIBRATION_SQL,
        "stub_embedding": _Q_STUB_EMBEDDING_SQL,
        "embedding_near_dup": _Q_EMBEDDING_NEAR_DUP_SQL,
        "ivf_topk": _Q_IVF_TOPK_SQL,
        "frontier_state_merge": _Q_FRONTIER_STATE_MERGE_SQL,
        "char_ngrams": _Q_CHAR_NGRAMS_SQL,
        "lsh_bucketed_topk": _Q_LSH_TOPK_SQL,
        "backoff_rounds": _Q_BACKOFF_SQL,
        "seed_dispatch": _Q_SEED_DISPATCH_SQL,
        "multimodal_features": _Q_MULTIMODAL_SQL,
        "crawl_round": _crawl_round_sql(),
        # ivf_kmeans_topk: VALUES oracle built by the numpy Lloyd's
        # replay below
        "ivf_kmeans_topk": _ivf_kmeans_topk_sql(),
    }
