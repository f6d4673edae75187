"""Mirror of the driver's correctness gate: run every __spark_entry__
query AND its DuckDB oracle at sf0.01, compare row-multisets exactly
(columns sorted by name, rows sorted by all columns) — same shape as
CORRECTNESS_r{N}.json."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """EXACTLY the driver's canonicalization: columns sorted by name,
    rows sorted by all columns on RAW values (no str-casting — a
    str-cast here masked the r04 `quantize_embeddings` crash, where a
    list-valued cell makes pandas sort_values throw `unhashable
    type`). If an entry emits an array/map column, this mirror must
    crash the same way the driver does."""
    pdf = pdf[sorted(pdf.columns)].copy()
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


# Keys come from queries() — a cheap dict of function refs — NOT from
# oracle_sql(), whose generated replay oracles (pure-python crawls,
# BPE training, numpy Lloyd's) cost seconds and would otherwise run at
# pytest COLLECTION time for every test selection touching this
# module. test_oracle_covers_every_query pins the two key sets equal
# at run time.
ORACLE_KEYS = sorted(entrymod.queries().keys())
ROWS_ONLY: list[str] = []  # every entry is oracle-backed since r5


def test_oracle_covers_every_query():
    assert sorted(entrymod.oracle_sql().keys()) == ORACLE_KEYS


def test_oracle_sf_pin_matches_mirror():
    """The generated replay oracles read their input at build time from
    entrymod.ORACLE_SF_DIR; this mirror (and the driver contract) run
    at the same sf. If either moves, fail loudly here instead of
    silently certifying entries against a different scale factor."""
    assert SF_DIR == entrymod.ORACLE_SF_DIR


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    want = ddb.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    g, w = normalize(got), normalize(want)
    assert len(g) == len(w), f"row count {len(g)} vs {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


# Entries whose construction runs the full engine (minutes each); their
# scalar-only output shape is pinned by their own gate tests above.
_COMPOSITE = {"crawl_multiround", "crawl_round"}


@pytest.mark.parametrize(
    "name", sorted(set(entrymod.queries()) - _COMPOSITE)
)
def test_entry_output_is_scalar_only(spark, name):
    """No entry may emit array/map/struct-typed result columns: the
    driver canonicalizer sorts raw pandas values, and any non-hashable
    cell (list/dict) crashes it — the r04 `quantize_embeddings`
    failure class. Only the schema is inspected, but note some entries
    run real jobs at CONSTRUCTION time (cached-signature writes, the
    kmeans trainer), so a construction failure surfaces here too."""
    from pyspark.sql import types as T

    df = entrymod.queries()[name](spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: non-scalar output columns {bad}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
