"""Property test: BucketedSnapshotIO.frontier_view must equal the
generic latest-wins merge (engine.merge_frontier_states) for ANY
interleaving of base appends and state-delta commits — overlapping
keys, repeated transitions, same-round conflicts resolved by
schemas.state_prio, keys untouched by any delta, and keys touched by
several deltas in different commits.

The bucketed view is an optimized rewrite (per-base co-located joins
against a single reduced delta aggregate); this guards the rewrite's
equivalence the way test_plans guards its exchange budget.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark import schemas as S
from crawler_spark.engine import ENGINE_SCHEMAS, merge_frontier_states
from crawler_spark.io.bucketed import BucketedSnapshotIO

STATES = ["fetched", "error", "deleted", "pending"]

# a scenario: 1-3 base appends (disjoint key ranges, like the engine's
# dedup guarantee) and 0-4 state-delta commits, each touching arbitrary
# already-inserted keys at arbitrary rounds
scenarios = st.fixed_dictionaries(
    {
        "base_sizes": st.lists(st.integers(1, 12), min_size=1, max_size=3),
        "deltas": st.lists(
            st.lists(
                st.tuples(
                    st.integers(0, 35),  # key index (mod inserted count)
                    st.sampled_from(STATES),
                    st.integers(1, 5),  # round
                ),
                min_size=1,
                max_size=8,
            ),
            max_size=4,
        ),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sc=scenarios)
def test_frontier_view_equals_generic_merge(spark, tmp_path_factory, sc):
    tmp = tmp_path_factory.mktemp("fvprop")
    io = BucketedSnapshotIO(
        str(tmp), schemas=ENGINE_SCHEMAS, n_buckets=4, min_bucket_bytes=0
    )
    v, start = 0, 0
    for size in sc["base_sizes"]:
        rows = spark.createDataFrame(
            [
                (
                    f"https://h.com/{i}",
                    f"{i:032x}",
                    i,
                    "s",
                    "h.com",
                    0,
                    0,
                    "pending",
                )
                for i in range(start, start + size)
            ],
            S.FRONTIER,
        )
        io.commit(v, appends={"frontier": rows})
        v, start = v + 1, start + size
    n_keys = start
    for delta in sc["deltas"]:
        rows = spark.createDataFrame(
            [(f"{k % n_keys:032x}", state, rnd) for k, state, rnd in delta],
            S.FRONTIER_STATE,
        )
        io.commit(v, appends={"frontier_state": rows})
        v += 1

    got = {
        (r.url_hash, r.state) for r in io.frontier_view(spark).collect()
    }
    want = {
        (r.url_hash, r.state)
        for r in merge_frontier_states(
            io.read(spark, "frontier"), io.read(spark, "frontier_state")
        ).collect()
    }
    assert got == want
    assert len(got) == n_keys  # one effective row per inserted key
