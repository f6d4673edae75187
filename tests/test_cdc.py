"""Content-defined chunking tests (textdedup.cdc_chunks / _gear).

Both implementations must tile the normalized text exactly, resist
shifts (a prefix edit leaves downstream chunk hashes intact), and
surface planted cross-document duplicate spans; the md5 path is
additionally oracle-certified via the driver entries.
"""

import re

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.textdedup import (
    cdc_chunks,
    cdc_chunks_gear,
    cdc_dup_chunks,
)

BODY = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua " * 12
)


def _norm(t):
    return re.sub(r"\s+", " ", t.strip().lower())[:8192]


@pytest.mark.parametrize("chunker", [cdc_chunks, cdc_chunks_gear])
def test_chunks_tile_exactly(spark, chunker):
    docs = spark.createDataFrame([(1, BODY)], ["doc_id", "text"])
    rows = sorted(chunker(docs, w=16, mod=32).collect(), key=lambda r: r["chunk_idx"])
    norm = _norm(BODY)
    rec = "".join(
        norm[r["chunk_pos"] - 1 : r["chunk_pos"] - 1 + r["chunk_len"]] for r in rows
    )
    assert rec == norm
    assert [r["chunk_idx"] for r in rows] == list(range(1, len(rows) + 1))
    assert sum(r["chunk_len"] for r in rows) == len(norm)


@pytest.mark.parametrize("chunker", [cdc_chunks, cdc_chunks_gear])
def test_shift_resistance(spark, chunker):
    docs = spark.createDataFrame(
        [(1, BODY), (2, "AN INSERTED PREFIX EDIT " + BODY)], ["doc_id", "text"]
    )
    by_doc: dict = {}
    for r in chunker(docs, w=16, mod=32).collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["chunk_hash"])
    shared = by_doc[1] & by_doc[2]
    # everything past the edit realigns: at most the first chunk differs
    assert len(shared) >= len(by_doc[1]) - 1
    assert len(shared) >= 1


@pytest.mark.parametrize("chunker", [cdc_chunks, cdc_chunks_gear])
def test_expected_chunk_size_tracks_mod(spark, chunker):
    docs = spark.createDataFrame([(1, BODY * 4)], ["doc_id", "text"])
    rows = chunker(docs, w=16, mod=64).collect()
    mean = sum(r["chunk_len"] for r in rows) / len(rows)
    # geometric with p=1/64 over a repeating corpus: loose envelope
    assert 8 <= mean <= 512


@pytest.mark.parametrize("chunker", [cdc_chunks, cdc_chunks_gear])
def test_unicode_positions_are_characters(spark, chunker):
    text = "中文 文本 去重 分块 测试 " * 40
    docs = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    rows = sorted(chunker(docs, w=8, mod=16).collect(), key=lambda r: r["chunk_idx"])
    norm = _norm(text)
    rec = "".join(
        norm[r["chunk_pos"] - 1 : r["chunk_pos"] - 1 + r["chunk_len"]] for r in rows
    )
    assert rec == norm


def test_dup_chunks_find_planted_span(spark):
    span = "this exact shared paragraph is replicated across documents " * 4
    docs = spark.createDataFrame(
        [
            (1, "unique preamble one " + span + "unique tail alpha"),
            (2, "a different opening here " + span + "other ending text"),
            (3, "completely unrelated document with its own words only"),
        ],
        ["doc_id", "text"],
    )
    # mod=8: the repeating span holds only ~60 DISTINCT 16-grams, so a
    # large divisor can miss every one of them ((31/32)^60 ~ 15%);
    # smaller expected chunks make an in-span boundary near-certain
    dups = cdc_dup_chunks(docs, w=16, mod=8, min_chunk_len=8).collect()
    assert dups, "planted duplicate span not detected"
    assert all(r["n_docs"] >= 2 for r in dups)
    assert all(r["dup_chars"] == (r["n_occurrences"] - 1) * r["chunk_len"] for r in dups)


def test_gear_matches_md5_schema_and_coverage(spark):
    docs = spark.createDataFrame([(1, BODY), (2, BODY[7:])], ["doc_id", "text"])
    a = cdc_chunks(docs, w=16, mod=32)
    b = cdc_chunks_gear(docs, w=16, mod=32)
    # same columns and types (nullability flags differ between
    # expression-derived and mapInPandas schemas — immaterial)
    assert [(f.name, f.dataType) for f in a.schema] == [
        (f.name, f.dataType) for f in b.schema
    ]
    # different hash functions -> different boundaries, but both must
    # cover every character of every doc exactly once
    for df in (a, b):
        cov = df.groupBy("doc_id").agg(F.sum("chunk_len").alias("n")).collect()
        assert {r["doc_id"]: r["n"] for r in cov} == {
            1: len(_norm(BODY)),
            2: len(_norm(BODY[7:])),
        }


def test_empty_and_blank_docs_drop(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "actual words here")],
        ["doc_id", "text"],
    )
    for chunker in (cdc_chunks, cdc_chunks_gear):
        got = {r["doc_id"] for r in chunker(docs).collect()}
        assert got == {4}
