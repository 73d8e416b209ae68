"""PII detection and redaction for training-data pipelines.

Scan-time PII hygiene: count pattern hits per document and replace
them with typed placeholder tokens before text ever reaches a training
shard. All pure JVM regex built-ins (whole-stage codegen) — at 100 TB
this must run at scan speed, no Python in the path.

Patterns are RE2-compatible (no lookarounds), so the same strings run
on Spark (java.util.regex) and any RE2-based oracle engine; redaction
applies the types in a FIXED order (dict order below) so engines agree
bit-for-bit even where patterns could overlap.

This is the regex tier of PII removal: it catches structured
identifiers (emails, phones, SSNs, IPs), not free-text names. An
NER-model tier would slot in behind the same API as an Arrow-batched
``mapInPandas`` (see operators/multimodal.py for the pattern), with
this tier as its cheap pre-filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: type -> (RE2-compatible pattern, placeholder). Redaction order is
#: this dict's order: most specific first.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "phone": (r"\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b", "<PHONE>"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IPV4>"),
}


def pii_counts(c: Column | str) -> dict[str, Column]:
    """Per-type match counts for one text column (long columns)."""
    c = F.col(c) if isinstance(c, str) else c
    return {
        t: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for t, (pat, _) in PII_PATTERNS.items()
    }


def redact(c: Column | str) -> Column:
    """Replace every PII match with its typed placeholder, applying
    types in PII_PATTERNS order."""
    c = F.col(c) if isinstance(c, str) else c
    out = c
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_profile(
    df: DataFrame, id_col: str, text_col: str, redacted_col: str = "redacted"
) -> DataFrame:
    """Per-doc PII report: one count column per type plus the redacted
    text. Narrow select over the scan — no shuffle, no UDFs."""
    counts = pii_counts(text_col)
    return df.select(
        F.col(id_col),
        *[cnt.alias(f"n_{t}") for t, cnt in counts.items()],
        redact(text_col).alias(redacted_col),
    )
