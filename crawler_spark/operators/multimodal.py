"""Multimodal columns: binary media handling for training pipelines.

Media (image/audio/video) are opaque `binary` columns with typed
metadata, exactly as they would land from a crawl (the engine's span
arrays carry `media_ref`s; a fetch-media stage resolves them to bytes).

The Spark-side plumbing — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested; the actual decode step is
STUBBED (this container has no image/audio libraries): by default a
deterministic fake "decoder" derives features from the bytes' digest,
and `decode_stub(strict=True)` raises NotImplementedError to mark where
a real decoder (PIL/torchaudio/ffmpeg) plugs in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Engine documents (span arrays) -> media rows with fake payloads.

    Real pipeline: a fetch-media stage GETs media_ref; here payload =
    utf8 bytes of the ref (deterministic stand-in with realistic
    plumbing: binary column, one row per media span).
    """
    return (
        docs.select(
            "doc_id", F.explode("spans").alias("s")
        )
        .filter(F.col("s.kind") == "media")
        .select(
            F.col("s.media_ref").alias("media_ref"),
            "doc_id",
            F.lit("image").alias("kind"),
            F.encode(F.col("s.media_ref"), "utf-8").alias("payload"),
            F.create_map(F.lit("source"), F.lit("span")).alias("meta"),
        )
    )


def _fake_decode(payload: bytes, dim: int) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real decoder: digest-derived dims
    and a unit-norm-ish feature vector. sha256 (not an arbitrary hash)
    so the scalar outputs are reproducible in plain SQL — the driver's
    DuckDB oracle recomputes width/height/duration from the same digest
    (see __spark_entry__ `multimodal_features`)."""
    d = hashlib.sha256(payload or b"").digest()
    width = 64 + d[0]
    height = 64 + d[1]
    duration = 1000 + d[2] * 16
    feat = [((d[i % 32] / 255.0) - 0.5) for i in range(dim)]
    return width, height, duration, feat


def decode_media(media: DataFrame, dim: int = 16, strict: bool = False) -> DataFrame:
    """mapInPandas decode/feature-extract over Arrow batches.

    strict=True raises NotImplementedError where a real decoder would
    run — the marked integration point for PIL/ffmpeg on a cluster.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg; "
                    "not available in this environment"
                )
            rows = []
            for ref, doc, kind, payload in zip(
                pdf["media_ref"], pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                w, h, dur, feat = _fake_decode(bytes(payload or b""), dim)
                rows.append(
                    (ref, doc, kind, len(payload or b""), w, h, dur, feat)
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURES.fields],
            )

    return media.mapInPandas(run, FEATURES)


RESIZED = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes_in", T.LongType(), False),
        T.StructField("n_bytes_out", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_media(
    media: DataFrame, width: int = 224, height: int = 224, strict: bool = False
) -> DataFrame:
    """mapInPandas resize over Arrow batches: binary in, binary out.

    Output byte size scales with the (fake-decoded) source dimensions,
    so the plumbing exercises the real shape — variable-length binary
    both directions, one output row per input row, deterministic
    bytes. strict=True raises NotImplementedError at the point where a
    real PIL/ffmpeg resample plugs in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media resize requires PIL/ffmpeg; "
                    "not available in this environment"
                )
            rows = []
            for ref, doc, kind, payload in zip(
                pdf["media_ref"], pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload or b"")
                w0, h0, _, _ = _fake_decode(raw, dim=1)
                scale = (width * height) / float(w0 * h0)
                n_out = max(1, int(len(raw) * scale))
                seed = hashlib.sha256(raw + f"{width}x{height}".encode()).digest()
                out = (seed * (n_out // len(seed) + 1))[:n_out]
                rows.append(
                    (ref, doc, kind, width, height, len(raw), n_out, out)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return media.mapInPandas(run, RESIZED)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame grab,
    derived from (stub) duration metadata — demonstrates the explode
    shape a real sampler would feed to the decoder."""
    decoded = decode_media(media)
    return decoded.select(
        "media_ref",
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_at_ms"),
    )


def media_phash(media: DataFrame, n: int = 8, bits: int = 64) -> DataFrame:
    """Perceptual-hash analog for raw media payloads: a Charikar simhash
    over character n-grams of the hex-encoded bytes — genuinely
    locality-sensitive on payload CONTENT (shared byte runs -> shared
    grams -> nearby signatures), so exact and near-identical payloads
    land within small Hamming distance. This is the content-defined
    fingerprint used before any decode (dedup crawled media without
    decoding 100 TB of it); a true DCT pHash plugs into the same
    (media_ref, phash) contract once a real decoder exists
    (decode_media strict=True marks the spot).

    All JVM-side (hex -> char_ngrams -> simhash); zero Python. Scale
    shape: one exchange (the per-ref bit-sum groupBy).
    """
    from crawler_spark.operators.textdedup import char_ngrams, simhash

    grams = char_ngrams(
        media.select(
            F.col("media_ref").alias("doc_id"),
            F.hex(F.col("payload")).alias("text"),
        ),
        n=n,
    )
    sig = simhash(
        token_frame=grams.select("doc_id", F.col("gram").alias("tok")),
        bits=bits,
    )
    return sig.select(
        F.col("doc_id").alias("media_ref"), F.col("simhash").alias("phash")
    )


def media_near_dup_pairs(
    media: DataFrame | None = None,
    max_hamming: int = 3,
    phashes: DataFrame | None = None,
    n_blocks: int | None = None,
    max_bucket: int | None = 100_000,
    observation=None,
) -> DataFrame:
    """Near-duplicate media pairs by payload pHash Hamming distance —
    the media twin of text simhash near-dup, reusing the same Manku
    block-bucketed join (never all-pairs; one hot payload value cannot
    quadratically blow up a single row). phashes=: pass a persisted
    media_phash() table to pay only the join. n_blocks defaults to
    max_hamming + 1 — the pigeonhole minimum for lossless blocking
    (wider thresholds need more blocks than text simhash's 4).
    max_bucket/observation: the degenerate-block guard, threaded to
    simhash_near_dup_pairs — a corpus of identical tracking pixels
    would otherwise make one block value do B² join work."""
    from crawler_spark.operators.textdedup import simhash_near_dup_pairs

    if media is None and phashes is None:
        raise ValueError("pass media or phashes")
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if n_blocks > 64:
        raise ValueError(
            f"n_blocks={n_blocks} > signature width 64: zero-width blocks "
            "would bucket everything together (all-pairs join). Thresholds "
            "past Hamming 63 mean 'any pair' — that is a cross join, not a "
            "near-dup query."
        )

    if phashes is not None:
        sig = phashes.select(
            F.col("media_ref").alias("doc_id"), F.col("phash").alias("simhash")
        )
    else:
        # recompute-from-payloads: the downstream block join references
        # the signatures three ways (both sides + hot-key agg); truncate
        # the tiny pHash frame once instead of re-hashing payload grams
        # per reference (same rationale as simhash_near_dup_pairs)
        sig = (
            media_phash(media)
            .select(F.col("media_ref").alias("doc_id"), F.col("phash").alias("simhash"))
            .localCheckpoint(eager=False)
        )
    pairs = simhash_near_dup_pairs(
        signatures=sig,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        max_bucket=max_bucket,
        observation=observation,
    )
    return pairs.select(
        F.col("doc_a").alias("ref_a"), F.col("doc_b").alias("ref_b"), "hamming"
    )


def media_signatures(docs: DataFrame) -> DataFrame:
    """Per-round MEDIA signature rows for the engine's incremental
    dedup index (schemas.MEDIA_SIGNATURES): one row per media-span
    OCCURRENCE of the round's new documents, carrying the payload
    pHash. Shared refs hash once (media_phash groups by ref) and join
    back to every occurrence; refs whose payload yields no grams keep
    a NULL phash (can't near-dup, filtered at query time — mirrors
    doc_signatures' NULL convention)."""
    occ = (
        docs.select(
            "doc_id",
            "site",
            F.col("fetched_round").alias("round"),
            F.explode("spans").alias("s"),
        )
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"), "doc_id", "site", "round")
    )
    # payload derivation lives ONLY in media_from_documents — the batch
    # operator and this index must hash the same bytes or the
    # incremental==batch invariant breaks when the real fetch-media
    # stage replaces the stand-in
    media = media_from_documents(docs).dropDuplicates(["media_ref"])
    ph = media_phash(media)
    return occ.join(ph, "media_ref", "left").select(
        "media_ref", "doc_id", "site", "round", "phash"
    )
