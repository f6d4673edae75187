"""Conditional-GET revalidation (HTTP 304 semantics): the O(|changed|)
recrawl path.

The reference refetches blindly on lifecycle events (crawler.py:197-277)
— every refetch pays full fetch + extract + index churn. revalidate()
probes fingerprints first and touches state only for changed pages:
unchanged pages cost ONE appended observation + a fetch_log(304) line.

Key efficiency witness: after revalidating T pages of which C changed,
the T-C unchanged documents keep their ORIGINAL fetched_round — they
were never refetched — while schedule_recrawl would have cascaded and
refetched all T.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators import revalidate as RV
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world


def _mutate_web(web, urls: list[str]):
    """A new edition: the named pages' text spans change."""
    changed = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "text", F.concat(s["text"], F.lit(" v2")))
            .otherwise(s["text"])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return web.withColumn(
        "spans",
        F.when(F.col("url").isin(urls), changed).otherwise(F.col("spans")),
    )


@pytest.fixture()
def crawled(spark):
    world = make_world(seed=37, n_hosts=3, n_urls=15, budget=3, burst=False)
    t = world.to_spark(spark)
    root = tempfile.mkdtemp(prefix="revalidate_")
    eng = CrawlEngine(
        spark, root, track_changes=True, lexical_index=True, follow_links=False
    )
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=12)
    return eng, t


def _table_rows(eng, spark, name, keys):
    return sorted(
        map(tuple, eng.io.read(spark, name).select(*keys).collect())
    )


def test_unchanged_web_zero_churn(spark, crawled):
    eng, t = crawled
    before_docs = _table_rows(eng, spark, "documents", ["doc_id", "fetched_round"])
    before_seen = _table_rows(eng, spark, "seen", ["url_hash"])
    before_postings = eng.io.read(spark, "postings").count()
    n_pages = len(before_seen)

    stats = eng.revalidate(world=t)
    assert stats == {
        "targets": n_pages,
        "unchanged": n_pages,
        "changed": 0,
        "errors": 0,
    }
    # zero churn: documents (incl. fetched_round), seen, postings identical
    assert _table_rows(eng, spark, "documents", ["doc_id", "fetched_round"]) == before_docs
    assert _table_rows(eng, spark, "seen", ["url_hash"]) == before_seen
    assert eng.io.read(spark, "postings").count() == before_postings
    # evidence recorded: each URL now has 2 observations, all unchanged
    hist = eng.fetch_history()
    assert hist.groupBy("url_hash").count().filter("count = 2").count() == n_pages
    assert hist.agg(F.sum("changed")).collect()[0][0] == 0
    # fetch_log carries one 304 line per probed URL at the current round
    log = eng.io.read(spark, "fetch_log").filter(F.col("status") == 304)
    assert log.count() == n_pages


def test_changed_subset_only_that_subset_refetches(spark, crawled):
    eng, t = crawled
    docs_before = {
        r["doc_id"]: r["fetched_round"]
        for r in eng.io.read(spark, "documents").collect()
    }
    victims = [
        (r["doc_id"], r["url"])
        for r in eng.io.read(spark, "documents").orderBy("url").limit(4).collect()
    ]
    t2 = dict(t)
    t2["web"] = _mutate_web(t["web"], [u for _, u in victims])
    expected_changed = {d for d, _ in victims}
    assert expected_changed

    stats = eng.revalidate(world=t2)
    assert stats["changed"] == len(expected_changed)
    assert stats["unchanged"] == len(docs_before) - len(expected_changed)
    assert stats["errors"] == 0

    # changed docs were cascaded out and re-enqueued; refetch them
    eng.run(t2, max_rounds=40)
    docs_after = {
        r["doc_id"]: (r["fetched_round"], r["spans"])
        for r in eng.io.read(spark, "documents").collect()
    }
    assert set(docs_after) == set(docs_before)
    for did, (rnd, spans) in docs_after.items():
        if did in expected_changed:
            assert rnd > docs_before[did]  # actually refetched
            assert any("v2" in (s["text"] or "") for s in spans)
        else:
            assert rnd == docs_before[did]  # never refetched
            assert not any("v2" in (s["text"] or "") for s in spans)
    # change-rate evidence: changed=1 exactly once per mutated URL
    hist = eng.fetch_history()
    changed_hashes = {
        r["url_hash"] for r in hist.filter("changed = 1").collect()
    }
    assert changed_hashes == expected_changed
    # incremental lexical index stayed consistent through the cascade
    inc = sorted(map(tuple, eng.io.read(spark, "postings").collect()))
    assert inc == sorted(map(tuple, eng.rebuild_postings().collect()))


def test_vanished_page_logs_error_without_state_change(spark, crawled):
    eng, t = crawled
    victim = eng.io.read(spark, "seen").orderBy("url").limit(1).collect()[0]
    t2 = dict(t)
    t2["web"] = t["web"].filter(F.col("url") != victim["url"])
    stats = eng.revalidate(world=t2)
    assert stats["errors"] == 1
    assert stats["changed"] == 0
    # the vanished page's document and seen row survive (lifecycle owns
    # vanishing); the probe is logged as a 404
    assert (
        eng.io.read(spark, "documents")
        .filter(F.col("doc_id") == victim["url_hash"])
        .count()
        == 1
    )
    log = eng.io.read(spark, "fetch_log").filter(
        (F.col("url") == victim["url"]) & (F.col("status") == 404)
    )
    assert log.count() == 1
    # no fingerprint observation for the error row
    hist = eng.fetch_history()
    assert (
        hist.filter(F.col("url_hash") == victim["url_hash"]).count() == 1
    )


def test_paused_site_receives_no_probe_traffic(spark, crawled):
    eng, t = crawled
    sites = [r["site"] for r in eng.io.read(spark, "seen").select("site").distinct().collect()]
    paused = sorted(sites)[0]
    eng.pause_site(paused)
    n_paused = eng.io.read(spark, "seen").filter(F.col("site") == paused).count()
    n_all = eng.io.read(spark, "seen").count()
    stats = eng.revalidate(world=t)
    assert stats["targets"] == n_all - n_paused
    assert (
        eng.io.read(spark, "fetch_log")
        .filter((F.col("status") == 304) & F.col("url").contains(paused))
        .count()
        == 0
    )


def test_targets_bound_the_probe_set(spark, crawled):
    eng, t = crawled
    targets = eng.io.read(spark, "seen").orderBy("url").limit(3).select("url_hash")
    stats = eng.revalidate(world=t, targets=targets)
    assert stats["targets"] == 3
    assert stats["unchanged"] == 3


def test_wire_transport_conditional_get(spark, crawled):
    eng, t = crawled
    # build an in-driver edition: url -> (etag, spans); /p/00002 changes
    pages = {
        r["url"]: (r["content_hash"], r["spans"])
        for r in eng.io.read(spark, "fetch_fingerprints")
        .join(
            eng.io.read(spark, "documents").select(
                F.col("url").alias("u"), "spans"
            ),
            F.col("url") == F.col("u"),
        )
        .collect()
    }
    mutated = set(sorted(pages)[:3])
    assert mutated

    def fake_transport(url, etag):
        stored_etag, spans = pages[url]
        if url in mutated:
            new_spans = [
                dict(
                    kind=s["kind"],
                    text=(s["text"] + " v2") if s["kind"] == "text" else s["text"],
                    media_ref=s["media_ref"],
                    offset=s["offset"],
                )
                for s in spans
            ]
            return 200, new_spans
        assert etag == stored_etag  # the validator must ride the request
        return RV.NOT_MODIFIED, None
    stats = eng.revalidate(transport=fake_transport)
    assert stats["changed"] == len(mutated)
    assert stats["unchanged"] == len(pages) - len(mutated)
    assert stats["errors"] == 0


def test_revalidate_requires_track_changes(spark):
    root = tempfile.mkdtemp(prefix="revalidate_req_")
    eng = CrawlEngine(spark, root, track_changes=False)
    with pytest.raises(ValueError, match="track_changes"):
        eng.revalidate(world={})
    eng2 = CrawlEngine(spark, tempfile.mkdtemp(prefix="revalidate_req2_"), track_changes=True)
    with pytest.raises(ValueError, match="exactly one"):
        eng2.revalidate()
