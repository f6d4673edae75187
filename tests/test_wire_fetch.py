"""Wire fetch operator (S4 cluster path): fetch_via_http with an
injectable transport must reproduce simulate_fetch exactly on the
synthetic web, honor per-host pacing inside a partition, and map
transport failures to the reference's TIMEOUT/ERROR statuses
(crawler.py:951-958, 998-1006)."""

import time

import pytest
from pyspark.sql import functions as F

from crawler_spark import schemas as S
from crawler_spark.operators.fetch import (
    TIMEOUT_STATUS,
    TRANSPORT_ERROR_STATUS,
    fetch_via_http,
    simulate_fetch,
)
from crawler_spark.world import make_world


@pytest.fixture(scope="module")
def world_tables(spark):
    world = make_world(seed=17, n_hosts=3, n_urls=15, burst=False)
    return world, world.to_spark(spark)


def scheduled_from_web(spark, t, n=20):
    return (
        t["web"]
        .select("url", "host")
        .orderBy("url")
        .limit(n)
        .withColumn("salt", F.pmod(F.xxhash64("host"), F.lit(4)).cast("int"))
        .withColumn("round", F.lit(1))
    )


def web_transport(web_rows):
    """Fake transport reproducing the synthetic web (the sandbox twin of
    a real HTTP client)."""
    table = {
        r.url: (
            r.status,
            [s.asDict() for s in r.spans] if r.spans is not None else None,
            list(r.out_links) if r.out_links is not None else None,
        )
        for r in web_rows
    }

    def get(url):
        return table.get(url, (404, None, None))

    return get


def test_wire_fetch_equals_simulate(spark, world_tables):
    world, t = world_tables
    sched = scheduled_from_web(spark, t)
    transport = web_transport(t["web"].collect())
    empty_bursts = spark.createDataFrame([], S.BURSTS)

    def key(rows):
        return sorted(
            (r.url, r.status, r.bytes, tuple(r.spans or []), tuple(r.out_links or []))
            for r in rows
        )

    wire = fetch_via_http(sched, transport=transport)
    sim = simulate_fetch(sched, t["web"], empty_bursts, 1)
    assert key(wire.collect()) == key(
        sim.select(*[f.name for f in wire.schema.fields]).collect()
    )


def test_wire_fetch_unknown_url_is_404(spark, world_tables):
    _, t = world_tables
    sched = (
        spark.createDataFrame([("https://nowhere.example.com/x", "nowhere.example.com")], ["url", "host"])
        .withColumn("salt", F.lit(0))
    )
    out = fetch_via_http(sched, transport=web_transport([])).collect()
    assert [(r.status, r.bytes) for r in out] == [(404, 0)]


def test_wire_fetch_error_mapping(spark):
    sched = spark.createDataFrame(
        [("https://a.com/slow", "a.com"), ("https://a.com/broken", "a.com")],
        ["url", "host"],
    ).withColumn("salt", F.lit(0))

    def flaky(url):
        if url.endswith("slow"):
            raise TimeoutError("30s")
        raise ValueError("connection reset")

    got = {r.url: r.status for r in fetch_via_http(sched, transport=flaky).collect()}
    assert got["https://a.com/slow"] == TIMEOUT_STATUS
    assert got["https://a.com/broken"] == TRANSPORT_ERROR_STATUS


def test_wire_fetch_paces_same_host(spark):
    """Same-host requests within a partition are >= min_delay apart; the
    transport stamps its call time into the span so the worker-side
    clock comes back with the rows."""
    urls = [(f"https://h{i % 2}.com/p/{j}", f"h{i % 2}.com") for i in range(2) for j in range(3)]
    sched = spark.createDataFrame(urls, ["url", "host"]).withColumn("salt", F.lit(0))

    def stamping(url):
        return 200, [{"kind": "text", "text": repr(time.monotonic()), "media_ref": "", "offset": 0}], []

    rows = fetch_via_http(sched, transport=stamping, min_delay_s=0.05).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(float(r.spans[0].text))
    for host, stamps in by_host.items():
        stamps.sort()
        gaps = [b - a for a, b in zip(stamps, stamps[1:])]
        assert all(g >= 0.045 for g in gaps), (host, gaps)


def test_default_transport_maps_http_statuses(monkeypatch):
    """Round-2 ADVICE: urlopen raises HTTPError for EVERY non-2xx — the
    transport must return the real status (429 drives O-SCHED4 backoff,
    404/500 land in the reference's error categories, crawler.py:978-995),
    and a connect timeout wrapped in URLError must surface as
    TimeoutError so fetch_via_http maps it to TIMEOUT(0), not ERROR(599)."""
    import io
    import socket
    import urllib.error
    import urllib.request

    from crawler_spark.operators.fetch import default_urllib_transport

    behaviors = {
        "https://h/429": urllib.error.HTTPError("https://h/429", 429, "rate", {}, io.BytesIO(b"")),
        "https://h/429ra": urllib.error.HTTPError(
            "https://h/429ra", 429, "rate", {"Retry-After": "120"}, io.BytesIO(b"")
        ),
        "https://h/404": urllib.error.HTTPError("https://h/404", 404, "nf", {}, io.BytesIO(b"")),
        "https://h/500": urllib.error.HTTPError("https://h/500", 500, "ise", {}, io.BytesIO(b"")),
        "https://h/timeout": urllib.error.URLError(socket.timeout("timed out")),
        "https://h/conn": urllib.error.URLError(OSError("connection refused")),
    }

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        url = req.full_url
        if url in behaviors:
            raise behaviors[url]
        return FakeResp(b'ok <a href="https://h/next">n</a>')

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    get = default_urllib_transport()
    assert get("https://h/ok")[0] == 200
    assert get("https://h/ok")[2] == ["https://h/next"]
    assert get("https://h/ok")[3] == ["n"]  # index-aligned anchor bodies
    # 429s return the 5-tuple form: Retry-After rides as the 5th element
    assert get("https://h/429") == (429, None, None, None, None)
    assert get("https://h/429ra") == (429, None, None, None, 120)
    assert get("https://h/404") == (404, None, None, None)
    assert get("https://h/500") == (500, None, None, None)
    with pytest.raises(TimeoutError):
        get("https://h/timeout")  # -> fetch_via_http maps to TIMEOUT(0)
    with pytest.raises(urllib.error.URLError):
        get("https://h/conn")  # generic failure -> ERROR(599) via except Exception
