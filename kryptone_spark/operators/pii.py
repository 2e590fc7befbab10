"""PII detection + redaction for training-data pipelines.

A 100 TB corpus headed for model training needs a scrub pass: find and
mask emails, phone numbers, and IP addresses before anything else sees
the text. The reference's email extractor (seo.py:587-643) is the seed
idea; this generalizes it to a columnar scan-and-replace that stays
inside whole-stage codegen — counts via ``regexp_count`` and masking
via chained ``regexp_replace``, one projection, zero shuffles, zero
Python. At scale this is scan-bound: it reads the text column once.

Pattern notes: every pattern is deliberately restricted to syntax that
Java regex (Spark) and RE2 (DuckDB oracle) interpret identically — no
lookarounds, no backrefs; ``\\b`` and bounded repetition only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: emails first (their local parts may contain digits/dots that
# the later patterns could nibble at), then phones (dash-separated, no
# dots — disjoint from IPv4), then IPv4.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # TPC-H-style international numbers (25-989-741-2988) plus the
    # common 3-3-4 national shape, dash or space separated
    ("phone", r"\b\d{2,3}[- ]\d{3}[- ]\d{3}[- ]\d{4}\b|\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add an ``n_<kind>`` match-count column per PII pattern.

    Counts are taken on the progressively-redacted text exactly as
    `pii_redact` would rewrite it, so overlapping matches are never
    double-counted across kinds (an email's digits can't also count as
    a phone fragment).
    """
    cur: Column = F.col(text_col)
    out = df
    for kind, pat, token in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, token)
    return out


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Mask every PII match with its placeholder token, in one chained
    ``regexp_replace`` projection (global replace is Spark's default)."""
    cur: Column = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, token)
    return df.withColumn(out_col, cur)
