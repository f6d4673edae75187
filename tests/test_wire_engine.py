"""Engine-level wire fetch (CrawlEngine(fetch_transport=...)): the full
round loop over a real transport instead of the simulated web join.

The gold test: a wire engine whose transport replays the synthetic web
must produce EXACTLY the tables the simulated engine commits on the
same world — crawl order, seen set, span sequences, records, keys.
Plus: a rate-limiting wire transport's Retry-After must drive the
hint-based backoff through the same run_round arithmetic.
"""

from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.world import make_world

from tests.test_engine_oracle import read_all


def _replay_transport(world, rate_limit_host=None, retry_after=None):
    """A transport that replays the synthetic web: unknown -> 404,
    non-200 statuses surface bodiless, anchors ride the 4-tuple."""
    pages = world.web_by_url()

    def transport(url):
        p = pages.get(url)
        if p is None:
            return 404, None, None, None
        host = p.host
        if rate_limit_host is not None and host == rate_limit_host:
            return 429, None, None, None, retry_after
        if p.status != 200:
            return int(p.status), None, None, None
        spans = [
            dict(kind=k, text=t, media_ref=m, offset=o) for (k, t, m, o) in p.spans
        ]
        return 200, spans, list(p.out_links), list(p.out_anchors)

    return transport


def _crawl(spark, root, world, transport=None, **kw):
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(root), fetch_transport=transport, **kw)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=15)
    return eng


def test_wire_engine_equals_simulated_engine(spark, tmp_path):
    world = make_world(seed=44, n_hosts=3, n_urls=18, budget=3, burst=False)
    sim = _crawl(spark, tmp_path / "sim", world)
    wire = _crawl(spark, tmp_path / "wire", world, transport=_replay_transport(world))
    a, b = read_all(spark, sim), read_all(spark, wire)
    assert b["order"] == a["order"]
    assert b["seen"] == a["seen"]
    assert b["docs"] == a["docs"]
    assert b["records"] == a["records"]
    assert b["keys"] == a["keys"]


def test_wire_engine_retry_after_drives_backoff(spark, tmp_path):
    world = make_world(seed=44, n_hosts=3, n_urls=18, budget=3, burst=False)
    limited = "h001.example.com"
    eng = _crawl(
        spark,
        tmp_path / "ra",
        world,
        transport=_replay_transport(world, rate_limit_host=limited, retry_after=240),
    )
    hs = eng.io.read(spark, "host_state").filter(F.col("host") == limited).collect()
    assert hs  # the 429s produced backoff state
    # 240 s at the default 60 s/round -> +4 rounds, not the surrogate
    assert all(r["backoff_until_round"] == r["last_round"] + 4 for r in hs)
    # the limited host's pages were never committed
    assert (
        eng.io.read(spark, "seen").filter(F.col("host") == limited).count() == 0
    )
    # everyone else's crawl completed normally
    assert eng.io.read(spark, "seen").count() > 0


def test_wire_engine_with_anchor_recording(spark, tmp_path):
    """The 4-tuple transport's anchors flow into the anchors table the
    same way the simulated join's do."""
    world = make_world(seed=44, n_hosts=3, n_urls=18, budget=3, burst=False)
    sim = _crawl(spark, tmp_path / "sa", world, record_anchors=True)
    wire = _crawl(
        spark,
        tmp_path / "wa",
        world,
        transport=_replay_transport(world),
        record_anchors=True,
    )
    key = ["src_hash", "dst_hash", "anchor"]
    a = sorted(map(tuple, sim.io.read(spark, "anchors").select(*key).collect()))
    b = sorted(map(tuple, wire.io.read(spark, "anchors").select(*key).collect()))
    assert a == b and a
