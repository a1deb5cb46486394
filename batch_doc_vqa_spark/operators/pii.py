"""PII detection + redaction as pure column expressions.

The reference scrubs PII from run artifacts before they reach the published
archive (/root/reference/src/batch_doc_vqa/benchmarks/published_runs.py:
759-833 — structural checks + scrub list). The engine's publish gate
(plans/publish.py) DETECTS and quarantines; this module REDACTS so the row
can still ship: each category rewrites to a typed placeholder and the per-doc
counts land in a report column, the way a training-data pipeline keeps the
document but not the identifier.

Engine shape: a fixed cascade of ``regexp_replace`` column expressions —
zero Python, fully pushdown-friendly, and value-checkable against a DuckDB
oracle because every pattern sticks to the regex subset Java and RE2 agree
on (char classes, bounded quantifiers, ``\\b``). The cascade ORDER is pinned
(email → ipv4 → ssn → card → phone) so overlapping digit runs redact
deterministically; apply the same order in any SQL reimplementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# category → (pattern, placeholder); dict order IS the cascade order
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "card": (r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    "phone": (r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
}


def _count(col: Column, pattern: str) -> Column:
    # NULL text must count 0, not NULL: avg(n_pii)/`n_pii = 0` filters over a
    # corpus with null-text rows would silently misclassify them otherwise
    return F.coalesce(F.size(F.regexp_extract_all(col, F.lit(pattern), 0)), F.lit(0))


def pii_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_<category>..., n_pii): per-doc match counts per category.

    Counts run on the RAW text (before any redaction), each category
    independently — a corpus-health dashboard input, one projection, no
    shuffle."""
    col = F.col(text_col)
    counts = {f"n_{cat}": _count(col, pat) for cat, (pat, _) in PII_PATTERNS.items()}
    out = df.select(F.col(id_col), *[c.alias(name) for name, c in counts.items()])
    total = None
    for name in counts:
        total = F.col(name) if total is None else total + F.col(name)
    return out.withColumn("n_pii", total)


def redact_columns(text_col) -> tuple[Column, Column]:
    """(redacted_text, n_redactions) column pair — the cascade in pinned
    order as reusable expressions (shared by ``redact_pii`` and the publish
    sink's scrub mode; one definition, no drift). n_redactions counts
    matches the cascade actually rewrote: each category's count is measured
    on the text as it stands when that category's turn comes (an email's
    digits can no longer match the phone pattern once the email is already
    ``[EMAIL]``)."""
    col = text_col if not isinstance(text_col, str) else F.col(text_col)
    total = F.lit(0)
    for pat, placeholder in PII_PATTERNS.values():
        total = total + _count(col, pat)
        col = F.regexp_replace(col, pat, placeholder)
    return col, total


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text, n_redactions): the cascade applied in pinned order."""
    col, total = redact_columns(text_col)
    return df.select(
        F.col(id_col),
        col.alias(text_col),
        total.alias("n_redactions"),
    )
