"""PII detection and redaction for training-data pipelines.

A standard pre-training curation stage the reference pipeline would
need before uploading documents to a shared vector store: find and
scrub personally identifiable information (emails, IPs, phone numbers,
SSNs, card numbers) from document text. Public-pattern approach (the
same regex families used by CCNet/BigScience-style PII scrubbing).

Everything is built-in pyspark.sql.functions — regexp_count /
regexp_replace run JVM-side inside whole-stage codegen, so at 100 TB
this stage is a pure map over the scan with ZERO exchanges.

The regexes are written to the common subset of Java regex (Spark) and
RE2 (DuckDB): character classes, bounded quantifiers, ``\\b`` word
boundaries, alternation with position-disjoint branches — no
lookaround, no backreferences — so the DuckDB oracle twin computes
byte-identical matches and replacements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies these in sequence; categories are counted
# independently on the ORIGINAL text (an SSN that also looks like a
# phone number counts in both — documented, mirrored in the oracle).
# Alternation branches are position-disjoint (distinct first chars /
# digit-group shapes), so leftmost-first (Java) and leftmost-longest
# (RE2) semantics agree on every match.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+\d{7,15}\b|\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-category match counts on the raw text."""
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def _total(counts: dict[str, Column]) -> Column:
    """Sum of the per-category count columns."""
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return total


def pii_profile(
    docs: DataFrame, text_col: str = "text", extra_cols: tuple = ()
) -> DataFrame:
    """One row per doc: per-category PII counts + total + has_pii flag.
    extra_cols pass through untouched (e.g. 'site' for a per-site
    rollup — see engine.pii_report).

    Scale shape: per-row regexp_count expressions only — fuses into the
    scan projection, embarrassingly parallel, no shuffle.
    """
    counts = pii_counts(F.col(text_col))
    total = _total(counts)
    return docs.select(
        "doc_id",
        *extra_cols,
        *[col.alias(f"n_{name}") for name, col in counts.items()],
        total.alias("n_pii_total"),
        (total > 0).alias("has_pii"),
    )


def redact_expr(c: Column) -> Column:
    """The redaction chain as a reusable column expression (each PII
    match replaced by its typed placeholder, PII_PATTERNS order)."""
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<PII:{name.upper()}>")
    return c


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with a typed placeholder token.

    Replacement is a fixed chain in PII_PATTERNS order (email first so
    its digits/dots aren't pre-mangled by the numeric patterns); the
    DuckDB twin chains regexp_replace(..., 'g') in the same order, so
    redacted text is byte-identical across engines. n_redactions is the
    sum of per-category counts on the original text (overlaps count
    once per category — the scrub itself only rewrites each span once,
    in chain order).
    """
    redacted = redact_expr(F.col(text_col))
    total = _total(pii_counts(F.col(text_col)))
    return docs.select(
        "doc_id",
        redacted.alias("text_redacted"),
        total.alias("n_redactions"),
    )
