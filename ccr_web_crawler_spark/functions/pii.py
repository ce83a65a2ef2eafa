"""PII detection + scrubbing for web-text curation — emails, IPv4
addresses, US-style phone numbers redacted to typed placeholders
before a crawl corpus becomes training data.

All pure JVM Column expressions (``regexp_extract_all`` /
``regexp_replace``), so the operator fuses into the parquet scan stage
with zero Python in the hot path at any corpus size, and the identical
RE2-compatible patterns run in the DuckDB oracle. The reference has no
PII pass (its corpus is a single public statute site —
``crawler/extraction.py`` stores text verbatim); this is one of the
curation operators a Common-Crawl-scale pipeline adds on top.

Pattern notes: every regex below restricts itself to syntax shared by
Java's regex engine (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b`` word boundaries; no lookarounds or
backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: emails first (their local part can contain digits that the
# phone pattern would otherwise nibble), then IPs (dotted digits that
# look phone-ish), then phones.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

PII_PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(pattern), 0))


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts: {'email': Column, 'ip': ..., 'phone': ...}.

    Counted on the RAW text independently per kind (the scrub applies
    the same patterns sequentially, so counts here == placeholders
    inserted as long as the synthetic kinds don't overlap — emails are
    excluded from the later patterns by the word-boundary anchors)."""
    return {kind: _count(text, pat) for kind, pat, _ in PII_PATTERNS}


def scrub_pii(text: Column) -> Column:
    """Redact all PII kinds to typed placeholders, in the fixed kind
    order of ``PII_PATTERNS`` (email → ip → phone)."""
    out = F.coalesce(text, F.lit(""))
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
