"""Fixed StructType schemas for every engine table (SURVEY.md §1).

The reference keeps all of this as JSON files + in-memory dicts
(crawler.py:23-44, app.py:112-135); here every abstraction is a snapshot
table with a declared schema. Dynamism is confined to `payload_json`
string columns (parsed on demand with from_json / get_json_object).

Determinism rule: no wall-clock timestamps in keyed data — rounds are the
time quantum (SURVEY.md §7.0); timestamps appear only in metrics.
"""

from __future__ import annotations

from pyspark.sql import types as T

# interleaved text+media span — the driver `input_hint` shape:
#   spans: array<struct<kind,text,media_ref,offset>>
# kind ∈ {text, media, jsonld, meta, title}; media spans have text='' and
# media_ref set, text spans the reverse; offsets strictly increasing.
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)
SPANS = T.ArrayType(SPAN)

# --- fixture / world tables (FIXTURES.md) ---------------------------------

# the simulated internet; only read inside the fetch step
WEB = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),  # 200/404/429/0(timeout)
        T.StructField("spans", SPANS, True),
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
        # anchor text per out_link, index-aligned (the <a ...>TEXT</a>
        # body); "" where the link had no usable anchor
        T.StructField("out_anchors", T.ArrayType(T.StringType()), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
    ]
)

SITEMAPS = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # index | urlset
        T.StructField("entries", T.ArrayType(T.StringType()), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("sitemap_urls", T.ArrayType(T.StringType()), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_budget", T.IntegerType(), False),  # URLs/host/round
    ]
)

# 429 burst scenario: host returns 429 within [from_round, to_round]
BURSTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("from_round", T.IntegerType(), False),
        T.StructField("to_round", T.IntegerType(), False),
        # Retry-After seconds advertised with the 429 (RFC 9110 §10.2.3);
        # NULL -> the deterministic 3..7-round surrogate (O-SCHED4)
        T.StructField("retry_after_s", T.IntegerType(), True),
    ]
)

SITE_CONTROL = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("paused_from_round", T.IntegerType(), True),
        T.StructField("paused_to_round", T.IntegerType(), True),
        T.StructField("deleted_at_round", T.IntegerType(), True),
    ]
)

# --- engine state tables ---------------------------------------------------

# synthetic status codes in fetch_log beyond real HTTP statuses:
#   0   timeout (reference TIMEOUT, crawler.py:998-1002)
#   597 sitemap discovery failure (reference SITEMAP category, app.py:704-714)
#   599 transport error (reference ERROR, crawler.py:1004-1006)
SITEMAP_ERROR_STATUS = 597

# frontier states
PENDING = "pending"
FETCHED = "fetched"
ERROR = "error"
DELETED = "deleted"


def state_prio(state_col):
    """Same-round delta tie-break: a delete-cascade transition beats a
    fetch transition landing in the same round for the same url_hash.
    Shared by every frontier_state merge (engine.read_frontier_view and
    the bucketed co-located chain) so they resolve identically."""
    from pyspark.sql import functions as F

    return F.when(state_col == DELETED, F.lit(2)).otherwise(F.lit(1))

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),  # md5 (reference mode) of dedup key
        T.StructField("h64", T.LongType(), False),  # xxhash64 of dedup key (bloom/bucketing)
        T.StructField("site", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),
    ]
)

# crawl link graph (opt-in, CrawlEngine(record_edges=True)): one row per
# distinct (src_page -> dst_page) link discovered this round, scoped to
# known hosts like the frontier links. `site` is the SOURCE page's site
# (cascade-delete key). Feeds graph.link_graph_stats / graph.pagerank.
EDGES = T.StructType(
    [
        T.StructField("src_hash", T.StringType(), False),
        T.StructField("dst_hash", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# anchor-text observations (opt-in, CrawlEngine(record_anchors=True)):
# one row per distinct (src_page, dst_page, anchor text) link seen this
# round. Anchor text is how the WEB describes a page — classic web
# search ranks on it alongside body text (retrieval.anchor_docs turns
# this table into per-target anchor documents for BM25). `site` is the
# SOURCE page's site so C4 cascade deletes ride the SITE_TABLES path.
ANCHORS = T.StructType(
    [
        T.StructField("src_hash", T.StringType(), False),
        T.StructField("dst_hash", T.StringType(), False),
        T.StructField("anchor", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# append-only frontier state transitions (delta-state commits): a base
# frontier row's effective state = latest delta by (round, prio), falling
# back to the state it was inserted with. Rewriting the whole frontier per
# round is O(|frontier|) IO — the one scale-killer at 10^10 URLs — so the
# round commit appends O(|delta|) rows here instead; maintain() compacts
# (on Iceberg this is the MERGE INTO + rewrite_data_files pair).
FRONTIER_STATE = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("h64", T.LongType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("fetched_round", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # = url_hash of the page
        T.StructField("url", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("fetched_round", T.IntegerType(), False),
        T.StructField("spans", SPANS, True),
    ]
)

RECORDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),  # canonical crawl seq of source page
        T.StructField("shape", T.StringType(), False),  # single|list-item|graph-item|synth
        T.StructField("entity_key", T.StringType(), True),
        T.StructField("types", T.ArrayType(T.StringType()), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("payload_json", T.StringType(), True),
    ]
)

ENTITY_SEEN = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("entity_key", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("schema_json", T.StringType(), True),
    ]
)

UPLOADED = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

HOST_STATE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("backoff_until_round", T.IntegerType(), False),
        T.StructField("last_round", T.IntegerType(), False),
    ]
)

# canonical crawl order — the equality target vs the oracle
CRAWL_ORDER = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),  # global, monotonically increasing
        T.StructField("site", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("errors", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("new_links", T.LongType(), False),
    ]
)

FETCH_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

# per-partition lineage of each snapshot commit (north rule)
LINEAGE = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("rows", T.LongType(), False),
    ]
)

# incremental near-dup index (engine dedup_index=True): one row per
# document, appended per round over that round's NEW docs only; NULL
# signature columns mark docs too short to sign (see
# textdedup.document_signatures)
DOC_SIGNATURES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        *[T.StructField(f"mh{i}", T.StringType(), True) for i in range(8)],
        T.StructField("simhash", T.StringType(), True),
    ]
)

# incremental page-vector ANN index (engine vector_index=True): one row
# per committed page — FIXED-SCALE int8-style quantized embedding of the
# visible text (exact int64 scoring, cross-round comparable because the
# scale never moves) plus its sign-LSH bucket for pruned search.
# O(|fetched|) per round; rides the SITE_TABLES cascade/prune/compaction.
PAGE_VECTORS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("qv", T.ArrayType(T.LongType()), False),
        T.StructField("bucket", T.StringType(), False),
    ]
)

# incremental inverted index (engine lexical_index=True): one row per
# distinct (page, token) of the visible text — tf + doc length, so BM25
# is join-only at query time (retrieval.bm25_from_postings); zero-token
# pages keep a NULL-token sentinel row so corpus stats (N, total tokens)
# recover from the index alone. O(|fetched| tokens) per round; rides the
# SITE_TABLES cascade/prune/compaction.
POSTINGS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("tok", T.StringType(), True),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
    ]
)

# per-fetch content fingerprints (engine track_changes=True): one row
# per successful fetch, APPEND-ONLY ACROSS RECRAWLS — the observation
# history behind the change-rate recrawl scheduler
# (scheduler.recrawl_priorities). O(|fetched|) per round.
FETCH_FINGERPRINTS = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
    ]
)

# incremental MEDIA near-dup index (dedup_index=True): one row per media
# span occurrence; phash NULL when the payload yields no grams
MEDIA_SIGNATURES = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("phash", T.StringType(), True),
    ]
)
