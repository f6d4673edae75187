"""Resume/idempotence (ST6/ST7): kill after round k, resume, and the
final tables must be bit-identical to an uninterrupted run."""

from collections import Counter

from crawler_spark.engine import CrawlEngine, read_frontier_view
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


def snapshot_state(spark, eng):
    io = eng.io
    return {
        "order": tuple(
            (r.round, r.seq, r.site, r.url, r.status)
            for r in io.read(spark, "crawl_order").orderBy("seq").collect()
        ),
        "seen": frozenset((r.url_hash, r.url) for r in io.read(spark, "seen").collect()),
        "records": Counter(
            (r.url, r.seq, r.shape, r.entity_key, r.payload_json)
            for r in io.read(spark, "records").collect()
        ),
        "frontier": frozenset(
            (r.url_hash, r.url, r.state)
            for r in read_frontier_view(spark, io).collect()
        ),
    }


def test_resume_bit_identical(spark, tmp_path):
    world = make_world(seed=21, n_hosts=3, n_urls=20, budget=3, burst=False)
    tables = world.to_spark(spark)

    # uninterrupted run
    eng_a = CrawlEngine(spark, str(tmp_path / "a"))
    eng_a.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng_a.run(tables, max_rounds=12)

    # interrupted run: rounds 1-3, then a NEW engine instance resumes from
    # the committed snapshot (nothing carried over in memory)
    eng_b = CrawlEngine(spark, str(tmp_path / "b"))
    eng_b.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng_b._control_rows = tables["control"].collect()
    for rnd in (1, 2, 3):
        eng_b.run_round(rnd, tables)
    eng_c = CrawlEngine(spark, str(tmp_path / "b"))  # resume
    assert eng_c.io.last_round() == 3
    eng_c.run(tables, max_rounds=12)

    assert snapshot_state(spark, eng_a) == snapshot_state(spark, eng_c)


def test_resume_noop_when_complete(spark, tmp_path):
    world = make_world(seed=22, n_hosts=2, n_urls=10, budget=3, burst=False)
    tables = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path / "x"))
    eng.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng.run(tables, max_rounds=10)
    before = snapshot_state(spark, eng)
    eng2 = CrawlEngine(spark, str(tmp_path / "x"))
    eng2.run(tables, max_rounds=10)  # already past; should do ~nothing
    assert snapshot_state(spark, eng2) == before


def test_failed_round_attempt_is_retryable(spark, tmp_path):
    """The r5 cleanup shell: a mid-round failure (here an analysis
    error from a malformed world) must leave no committed state, no
    stray background jobs, and no pinned caches — the SAME round then
    retries cleanly against the good world and the final state equals
    a never-failed run's."""
    world = make_world(seed=31, n_hosts=2, n_urls=10, budget=3, burst=False)
    tables = world.to_spark(spark)

    eng = CrawlEngine(spark, str(tmp_path / "f"))
    eng.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    eng._control_rows = tables["control"].collect()
    bad = dict(tables)
    bad["web"] = tables["web"].select("url")  # missing fetch columns
    try:
        eng.run_round(1, bad)
        raise AssertionError("malformed world must raise")
    except AssertionError:
        raise
    except Exception:
        pass
    assert eng.io.last_round() == 0  # nothing committed by the failure
    eng.run(tables, max_rounds=10)

    ref = CrawlEngine(spark, str(tmp_path / "g"))
    ref.seed(discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"]))
    ref.run(tables, max_rounds=10)
    assert snapshot_state(spark, eng) == snapshot_state(spark, ref)
