"""PII / boilerplate scrubbing for training-data curation.

Regex redaction of the classic PII shapes (URLs, emails, IPv4
addresses, phone numbers) plus per-type match counts — the standard
pre-training scrub pass (C4/RefinedWeb-style). Pure Column
expressions: the redaction chain is a fixed sequence of
``regexp_replace`` calls that runs JVM-side inside whole-stage codegen
— map-only, zero shuffle, scan-speed at 100 TB.

Engine-portability: the patterns are written in the common subset of
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
repetition, ``\\b`` word boundaries; no backreferences or lookaround —
so the DuckDB oracle can run the literally identical pattern strings.
Match counts are taken on the ORIGINAL text (order-independent);
replacements apply in a fixed order (URL -> email -> IP -> phone) so
overlapping matches resolve identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_counts"]

# Ordered: URLs first (they may contain '@' or dotted hosts that the
# later patterns would otherwise chew on), then emails, IPs, phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ ]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d-]{6,}\d", "<PHONE>"),
]


def redact_pii(col) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(col) -> dict[str, Column]:
    """Per-type match counts on the original text, as named Columns."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast(
            "int"
        )
        for name, pat, _ in PII_PATTERNS
    }
