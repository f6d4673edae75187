"""End-to-end equality: Spark engine vs the pure-Python reference oracle.

The north-rule gate: crawl ordering, final URL-seen set, per-row span
sequences, extracted record multiset, type counts and entity keys must
ALL match the oracle exactly (SURVEY.md §5.2), with 429-burst,
pause and delete scenarios active, in both dedup modes, and with the
Bloom prefilter on.

Expensive crawls run once per module (fixtures); assertions are split
per dimension.
"""

from collections import Counter

import pytest

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.operators.extract import type_counts
from crawler_spark.oracle import Oracle
from crawler_spark.world import make_world


def crawl_both(spark, tmpdir, world, mode, max_rounds, use_bloom=False, url_filter=None, **kw):
    tables = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmpdir), mode=mode, use_bloom=use_bloom, **kw)
    eng.seed(
        discover_frontier(
            tables["seeds"], tables["robots"], tables["sitemaps"], url_filter=url_filter
        )
    )
    eng.run(tables, max_rounds=max_rounds)
    ora = Oracle(world, mode=mode).run(url_filter=url_filter, max_rounds=max_rounds)
    return eng, ora


def read_all(spark, eng):
    io = eng.io
    out = {}
    out["order"] = [
        (r.round, r.seq, r.site, r.url, r.status)
        for r in io.read(spark, "crawl_order").orderBy("seq").collect()
    ]
    out["seen"] = {(r.url_hash, r.url) for r in io.read(spark, "seen").collect()}
    out["docs"] = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in io.read(spark, "documents").collect()
    }
    out["records"] = Counter(
        (
            r.url, r.site, r.round, r.seq, r.shape, r.entity_key,
            tuple(r.types) if r.types is not None else None, r.name, r.payload_json,
        )
        for r in io.read(spark, "records").collect()
    )
    out["types"] = Counter(
        {(r.site, r.type): r["count"] for r in type_counts(io.read(spark, "records")).collect()}
    )
    out["keys"] = {(r.site, r.entity_key) for r in io.read(spark, "entity_seen").collect()}
    return out


@pytest.fixture(scope="module")
def ref_run(spark, tmp_path_factory):
    """Reference mode, all scenarios on: burst + pause + delete."""
    world = make_world(
        seed=42, n_hosts=5, n_urls=40, budget=2,
        pauses=[("h002_example_com", 2, 4)],
        deletes=[("h003_example_com", 3)],
    )
    eng, ora = crawl_both(
        spark, tmp_path_factory.mktemp("ref"), world, "reference", max_rounds=25
    )
    return world, read_all(spark, eng), ora


@pytest.fixture(scope="module")
def scaled_run(spark, tmp_path_factory):
    # bucketed_io=None: the engine DEFAULT is now the adaptive bucketed
    # layout, so this run pins the legacy flat-parquet path (generic
    # merge_frontier_states + exact_anti_join) to the oracle — both IO
    # layouts stay end-to-end covered.
    world = make_world(seed=7, n_hosts=3, n_urls=24, budget=3)
    eng, ora = crawl_both(
        spark, tmp_path_factory.mktemp("scaled"), world, "scaled", max_rounds=15,
        bucketed_io=None,
    )
    return world, read_all(spark, eng), ora


# --- reference mode ---------------------------------------------------------


def test_ref_crawl_order(ref_run):
    _, got, ora = ref_run
    assert len(ora.crawl_order) > 20
    assert any(s == 429 for *_x, s in ora.crawl_order)  # burst fired
    assert got["order"] == ora.crawl_order


def test_ref_seen_set(ref_run):
    _, got, ora = ref_run
    assert got["seen"] == set(ora.seen.items())


def test_ref_span_sequences(ref_run):
    """Per-row span-sequence equality (kind, text, media_ref, order) —
    the driver input_hint invariant."""
    _, got, ora = ref_run
    assert set(got["docs"]) == set(ora.documents)
    for d, spans in ora.documents.items():
        assert got["docs"][d] == [tuple(s) for s in spans], d


def test_ref_records_and_types(ref_run):
    _, got, ora = ref_run
    assert got["records"] == ora.records
    assert got["types"] == ora.type_counts
    assert got["keys"] == ora.entity_keys


def test_ref_pause_and_delete_respected(ref_run):
    _, got, ora = ref_run
    # deleted site leaves no trace in seen/documents/records
    assert not any("h003" in u for _h, u in got["seen"])
    assert not any("h003" in r[0] for r in got["records"])
    # paused site has no fetches during the pause window
    for rnd, _seq, site, _url, _st in got["order"]:
        if site == "h002_example_com":
            assert not (2 <= rnd <= 4)


# --- scaled (canonicalizing) mode -------------------------------------------


def test_scaled_equality(scaled_run):
    _, got, ora = scaled_run
    assert got["order"] == ora.crawl_order
    assert got["seen"] == set(ora.seen.items())
    assert got["records"] == ora.records


def test_scaled_no_canonical_duplicates(scaled_run):
    from crawler_spark.functions.urls import canonicalize_url

    _, got, _ora = scaled_run
    canon = [canonicalize_url(u) for _h, u in got["seen"]]
    assert len(canon) == len(set(canon))


# --- bloom prefilter / url_filter (small worlds) ----------------------------


def test_bloom_prefilter_equals_exact(spark, tmp_path):
    """Bloom prefilter must never change results (FP-safe two-phase)."""
    world = make_world(seed=11, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, ora = crawl_both(spark, tmp_path, world, "reference", max_rounds=10, use_bloom=True)
    got = read_all(spark, eng)
    assert got["order"] == ora.crawl_order
    assert got["seen"] == set(ora.seen.items())


def test_bloom_saturation_rebuild_bounds_fpp(spark, tmp_path):
    """Long-crawl maintenance: undersized bucket filters saturate; the
    maintain() rebuild resizes them from the exact seen set so the fill
    bound holds again — and the prefilter stays exactly equal to the
    exact anti-join throughout (saturation only costs extra confirms)."""
    from pyspark.sql import functions as F

    from crawler_spark.engine import read_frontier_view
    from crawler_spark.operators import dedup as D

    world = make_world(seed=23, n_hosts=3, n_urls=120, budget=8, burst=False)
    tables = world.to_spark(spark)
    eng = CrawlEngine(
        spark, str(tmp_path), embed_dim=0,
        use_bloom=True, bloom_buckets=4, bloom_expected_per_bucket=4,  # undersized
    )
    eng.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng._control_rows = tables["control"].collect()
    for rnd in range(1, 6):
        eng.run_round(rnd, tables)
    blooms = eng.io.read(spark, "seen_bloom")
    assert D.saturated_buckets(blooms).count() > 0
    assert eng.rebuild_saturated_blooms() > 0
    blooms2 = eng.io.read(spark, "seen_bloom")
    assert D.saturated_buckets(blooms2).count() == 0  # fill bound restored
    cand = read_frontier_view(spark, eng.io).filter(F.col("state") == "pending")
    seen = eng.io.read(spark, "seen")
    got = sorted(r.url for r in D.bloom_prefilter(cand, blooms2, seen, 4).collect())
    want = sorted(r.url for r in D.exact_anti_join(cand, seen).collect())
    assert got == want
    # the crawl continues correctly on the rebuilt filters
    s = eng.run_round(6, tables)
    assert s.get("fetched", 0) >= 0


def test_url_filter(spark, tmp_path):
    """P1 substring filter limits sitemap discovery in both paths."""
    world = make_world(seed=13, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, ora = crawl_both(
        spark, tmp_path, world, "reference", max_rounds=10, url_filter="/p/0000"
    )
    got = read_all(spark, eng)
    assert got["order"] == ora.crawl_order
    assert got["seen"] == set(ora.seen.items())


def test_robots_allow_longest_match(spark, tmp_path):
    """RFC 9309 precedence: a Disallow prefix blocks the host's /p/
    space except the MORE SPECIFIC Allow carve-outs; engine and oracle
    agree on ordering and the final seen set, and the carve-out pages
    really are the only /p/ pages of that host that got crawled."""
    host = "h000.example.com"
    dis = {host: [f"https://{host}/p/"]}
    allow = {host: [f"https://{host}/p/00000", f"https://{host}/p/00002"]}
    world = make_world(
        seed=31, n_hosts=3, n_urls=24, budget=4, burst=False,
        disallow=dis, allow=allow,
    )
    eng, ora = crawl_both(spark, tmp_path, world, "reference", max_rounds=10)
    got = read_all(spark, eng)
    assert got["order"] == ora.crawl_order
    assert got["seen"] == set(ora.seen.items())
    crawled_p = {
        u for _, _, _, u, _ in got["order"]
        if u.startswith(f"https://{host}/p/")
    }
    assert crawled_p  # the carve-outs were reachable and crawled
    assert all(
        u.startswith(allow[host][0]) or u.startswith(allow[host][1])
        for u in crawled_p
    )


def test_robots_wildcard_rules_match_like_the_python_twin(spark):
    """RFC 9309 §2.2.3 special characters: the JVM compiled matcher
    (compile_robots_rules + _longest_rule_len) and the oracle's Python
    twin agree on every tricky shape — wildcards, end anchors, regex
    metacharacters taken literally, empty/universal patterns."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.scheduler import (
        _longest_rule_len,
        compile_robots_rules,
    )
    from crawler_spark.oracle import robots_rule_matches

    cases = [
        ("https://h/p/x.php", "*.php$", True),
        ("https://h/p/x.php?q=1", "*.php$", False),
        ("https://h/p/x.php?q=1", "*.php", True),
        ("https://h/fish", "https://h/fish*", True),
        ("https://h/fi", "https://h/fish*", False),
        ("https://h/a+b(c).d", "https://h/a+b(c).d", True),
        ("https://h/aXb", "https://h/a+b", False),  # '+' is literal
        ("https://h/p/1", "*", True),
        ("https://h/", "$", False),  # anchors the EMPTY string only
        ("https://h/a", "https://h/a$", True),
        ("https://h/ab", "https://h/a$", False),
        ("https://h/x/deep/y", "https://h/*/y$", True),
        ("https://h/x/deep/y/z", "https://h/*/y$", False),
    ]
    df = spark.createDataFrame(
        [(u, [p]) for u, p, _ in cases], "url string, rules array<string>"
    )
    got = df.select(
        "url",
        "rules",
        (
            _longest_rule_len(compile_robots_rules(F.col("rules")), F.col("url")) > 0
        ).alias("m"),
    ).collect()
    for (u, p, want), r in zip(cases, got):
        assert r["m"] == want, (u, p, want)
        assert robots_rule_matches(p, u) == want, (u, p, want)


def test_robots_wildcard_crawl_equality(spark, tmp_path):
    """Wildcard disallow with a MORE SPECIFIC anchored allow carve-out:
    engine and oracle agree end-to-end, and only the carve-out pages
    of the gated host's /p/ space are crawled."""
    host = "h000.example.com"
    dis = {host: [f"https://{host}/p/*"]}
    allow = {host: [f"https://{host}/p/*2$"]}
    world = make_world(
        seed=31, n_hosts=3, n_urls=24, budget=4, burst=False,
        disallow=dis, allow=allow,
    )
    eng, ora = crawl_both(spark, tmp_path, world, "reference", max_rounds=10)
    got = read_all(spark, eng)
    assert got["order"] == ora.crawl_order
    assert got["seen"] == set(ora.seen.items())
    crawled_p = {
        u for _, _, _, u, _ in got["order"]
        if u.startswith(f"https://{host}/p/")
    }
    assert crawled_p  # the anchored carve-out was reachable
    assert all(u.endswith("2") for u in crawled_p)
