"""Property-based tests (SURVEY.md §5.6, hypothesis)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.functions.urls import canonicalize_url, md5_hex
from crawler_spark.oracle import Oracle
from crawler_spark.world import make_world

host_st = st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9.\-]{0,20}", fullmatch=True)
path_st = st.text(string.ascii_letters + string.digits + "/._-~%", max_size=25)
query_st = st.lists(
    st.tuples(st.text(string.ascii_lowercase, min_size=1, max_size=4),
              st.text(string.ascii_lowercase + string.digits, max_size=4)),
    max_size=4,
)
frag_st = st.text(string.ascii_letters, max_size=6)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(host_st)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(path_st)
    q = "&".join(f"{k}={v}" for k, v in draw(query_st))
    frag = draw(frag_st)
    u = f"{scheme}://{host}{port}/{path}"
    if q:
        u += f"?{q}"
    if frag:
        u += f"#{frag}"
    return u


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize_url(u)
    assert canonicalize_url(c) == c


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_invariants(u):
    c = canonicalize_url(u)
    assert "#" not in c  # fragment stripped
    scheme, _, rest = c.partition("://")
    assert scheme == scheme.lower()
    netloc = rest.split("/", 1)[0]
    assert netloc == netloc.lower()
    # only the scheme's OWN default port is stripped
    if scheme == "http":
        assert not netloc.endswith(":80")
    if scheme == "https":
        assert not netloc.endswith(":443")


@given(urls(), st.sampled_from(["", ":80", ":443"]), st.text(string.ascii_letters, max_size=5))
@settings(max_examples=200, deadline=None)
def test_canonical_twins_collide(u, port, frag):
    """Case/port/fragment variants must map to the same dedup key."""
    c = canonicalize_url(u)
    scheme, _, rest = u.partition("://")
    host, slash, tail = rest.partition("/")
    if ":" in host or not host:
        return  # port already present / degenerate
    variant = f"{scheme.upper()}://{host.upper()}{port}/{tail}"
    if port == ":80" and c.startswith("https"):
        return
    if port == ":443" and c.startswith("http:"):
        return
    assert canonicalize_url(variant) == c


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=50, deadline=None)
def test_oracle_politeness_invariant(seed):
    """≤ budget fetch attempts per host per round, for any world."""
    world = make_world(seed=seed % 1000, n_hosts=3, n_urls=15, budget=2, burst=(seed % 2 == 0))
    res = Oracle(world).run(max_rounds=12)
    per = {}
    for rnd, _seq, site, _url, _status in res.crawl_order:
        per[(rnd, site)] = per.get((rnd, site), 0) + 1
    assert all(v <= 2 for v in per.values())
    # seen set only ever contains 200-fetched URLs, hashed per reference
    for h, u in res.seen.items():
        assert h == md5_hex(u)


@given(st.integers(min_value=0, max_value=500))
@settings(max_examples=30, deadline=None)
def test_oracle_seq_dense_and_ordered(seed):
    world = make_world(seed=seed, n_hosts=2, n_urls=10, budget=2, burst=False)
    res = Oracle(world).run(max_rounds=10)
    seqs = [s for _r, s, *_x in res.crawl_order]
    assert seqs == list(range(1, len(seqs) + 1))  # dense, monotone
    rounds = [r for r, *_x in res.crawl_order]
    assert rounds == sorted(rounds)


# --- cuckoo-filter invariants (pure numpy core, no Spark) -------------------


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=400, unique=True),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_cuckoo_core_invariants(keys, data):
    """For ANY key set and ANY delete subset: (1) inserted keys always
    probe maybe=True (no false negatives — the dedup-correctness
    invariant); (2) after deleting a subset, every REMAINING key still
    probes True; (3) key accounting is exact."""
    import numpy as np

    from crawler_spark.operators.cuckoo import (
        SLOTS,
        _delete,
        _insert,
        _lookup,
        cuckoo_sizing,
    )

    u = np.array(keys, dtype=np.int64).view(np.uint64)
    n_cells = cuckoo_sizing(len(u), 0.7)
    table = np.zeros((n_cells, SLOTS), dtype=np.uint16)
    stash: list = []
    _insert(table, stash, u)
    assert _lookup(table, np.asarray(stash, np.uint64), u).all()
    n_del = data.draw(st.integers(min_value=0, max_value=len(keys)))
    dele, keep = u[:n_del], u[n_del:]
    removed = _delete(table, stash, dele)
    assert removed == n_del
    if len(keep):
        assert _lookup(table, np.asarray(stash, np.uint64), keep).all()


def test_cuckoo_bucket_constrained_keys_no_stash_spill():
    """Regression (round-2 ADVICE): the engine hands each filter ONLY
    keys with pmod(h64, n_buckets) == bucket — for power-of-two
    n_buckets that fixes the low bits of every key, and a primary cell
    derived from those bits collapsed n_buckets-worth of cells (stash
    spills from ~0.57 load; any non-empty stash re-flags the bucket for
    an O(bucket) saturation rebuild forever). With the mixed-hash cell
    derivation, bucket-constrained keys must behave like unconstrained
    ones: zero stash at the 0.7 design load."""
    import numpy as np

    from crawler_spark.operators.cuckoo import SLOTS, _insert, _lookup, cuckoo_sizing

    rng = np.random.default_rng(7)
    for n_buckets in (16, 64):
        n_keys = 4000
        n_cells = cuckoo_sizing(n_keys, 0.7)
        # uniform u64 keys, then constrain to bucket 3: pmod semantics on
        # int64 == numpy int64 % for the engine's signed h64
        raw = rng.integers(0, 2**63 - 1, size=2 * n_buckets * n_keys, dtype=np.int64)
        u = raw[raw % n_buckets == 3][:n_keys].view(np.uint64)
        assert len(u) == n_keys
        table = np.zeros((n_cells, SLOTS), dtype=np.uint16)
        stash: list = []
        _insert(table, stash, u)
        assert stash == [], f"stash spill at design load (n_buckets={n_buckets})"
        assert _lookup(table, np.asarray(stash, np.uint64), u).all()
