"""PII scrubbing for training-data pipelines: redact emails, URLs and
IPv4 addresses, reporting per-document counts.

Pure JVM column expressions (``regexp_count`` + ``regexp_replace``) —
no Python in the hot path, narrow plan, whole-stage codegen; at 100 TB
this is a map over the corpus scan, zero shuffle.

Pattern dialect is deliberately restricted to the intersection of
Java regex (Spark) and RE2 (DuckDB/the oracle): character classes,
bounded quantifiers, non-capturing groups, ``\\b`` — no backrefs or
lookaround — so the exact same pattern strings run on both sides and
the op is value-checkable row-for-row.

Redaction order matters and is part of the contract: URLs first (an
email-shaped userinfo inside a URL belongs to the URL), then emails,
then bare IPv4s; each count is taken on the text as it stands when
that stage runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# order = redaction order (see module docstring)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("urls", r"https?://[^\s]+", "<URL>"),
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4s", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text, n_urls, n_emails, n_ipv4s) — ``text`` fully redacted,
    counts per category (each taken immediately before its own
    redaction stage, i.e. on text already stripped of the previous
    categories)."""
    text = F.col(text_col)
    counts = {}
    for name, pat, token in PII_PATTERNS:
        counts[name] = F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        text = F.regexp_replace(text, pat, token)
    return df.select(
        F.col(id_col).alias("id"),
        text.alias("text"),
        counts["urls"],
        counts["emails"],
        counts["ipv4s"],
    )
