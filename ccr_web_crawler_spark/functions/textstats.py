"""Text analysis for large-scale corpus pipelines — language-ID,
quality scoring, token counting, fingerprinting. All pure JVM Column
expressions (whole-stage-codegen friendly; zero Python in the hot
path), so every one of them is also expressible as oracle SQL.

These are the scale-up text operators a 100TB training-data pipeline
needs on top of the reference's extraction (which only produces text:
``crawler/extraction.py:126-134``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "for")
ES_STOPWORDS = ("el", "la", "de", "que", "los", "las", "una", "por")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty → empty array)."""
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_match_count(text: Column, words: tuple[str, ...]) -> Column:
    """Count of whole-word occurrences of any of *words* (case-insens.)."""
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.coalesce(
        F.size(F.split(F.lower(text), pat)) - 1, F.lit(0)
    )


def lang_id(text: Column) -> Column:
    """n-gram-free stopword-vote language ID: 'en' | 'es' | 'und'."""
    en = word_match_count(text, EN_STOPWORDS)
    es = word_match_count(text, ES_STOPWORDS)
    return (
        F.when((en == 0) & (es == 0), F.lit("und"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(text)
    )


def stopword_ratio(text: Column) -> Column:
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        word_match_count(text, EN_STOPWORDS) / n
    )


def quality_score(text: Column) -> Column:
    """[0,1] heuristic doc-quality: length band + stopword presence −
    punctuation excess. Deliberately simple & fully SQL-expressible."""
    n_tok = token_count(text)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.05, F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    return F.round(length_ok + stop_ok + punct_ok, 2)


def normalize_ws(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def fingerprint(text: Column) -> Column:
    """Stable 128-bit content fingerprint of whitespace/case-normalized
    text (md5 hex — portable to any engine)."""
    return F.md5(normalize_ws(text))


def hash64_portable(s: Column) -> Column:
    """60-bit deterministic hash computable identically in Spark and
    DuckDB (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), for
    cross-engine-checkable hashing (simhash, salting oracles)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


# BPE-style pre-tokenizer pieces: letter runs, digit runs, single
# non-space symbols. \p{L}/\p{N} parse identically in Java regex and
# DuckDB's RE2, so the oracle splits the same way.
_BPE_PIECE_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish subword token count — the LLM-budget estimator the
    whitespace count undercounts. Splits into letter runs, digit runs
    and single symbols, then charges subword granularity the way a
    trained BPE does on rare words: a letter run of length L counts
    ceil(L/4) tokens (≈4 chars/subword, the usual English BPE rate),
    a digit run of length D counts ceil(D/3) (GPT-style 1-3-digit
    groups), every other symbol 1. Pure JVM expression; identical
    algebra runs in the DuckDB oracle."""
    # NULL text counts 0 tokens (matches the oracle's COALESCE(...,0))
    pieces = F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(_BPE_PIECE_RE), 0
    )
    return F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(p.rlike(r"^\p{L}"), F.ceil(F.length(p) / 4.0).cast("long"))
        .when(p.rlike(r"^\p{N}"), F.ceil(F.length(p) / 3.0).cast("long"))
        .otherwise(F.lit(1).cast("long")),
    )


def _winnow_of(tt: Column, k: int, w: int) -> Column:
    """Winnowed fingerprint set over an already-bound text value (a
    lambda variable — NOT a composite expression; see
    winnow_fingerprints for why that matters)."""
    n = F.length(tt) - (k - 1)  # number of character k-grams
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: hash64_portable(tt.substr(i, F.lit(k))),
    )
    # bind the gram-hash array once, then take window minima; a doc
    # shorter than k+w-1 chars yields its single best window (or empty
    # below k chars) — degenerate but deterministic
    return F.when(n < 1, F.array().cast("array<long>")).otherwise(
        F.element_at(
            F.transform(
                F.array(grams),
                lambda hs: F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.greatest(F.size(hs) - (w - 1), F.lit(1))
                        ),
                        lambda j: F.array_min(F.slice(hs, j, w)),
                    )
                ),
            ),
            1,
        )
    )


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): rolling hashes of character ``k``-grams over the
    normalized text, keeping the minimum of each ``w``-window — the
    standard near-copy detector whose fingerprint sets overlap iff
    documents share runs of ≥ k+w-1 chars. Returns the distinct
    fingerprint set as ``array<long>``.

    Hashes are ``hash64_portable`` so the DuckDB oracle computes
    byte-identical sets. The normalized text is bound as a
    higher-order-function lambda variable so normalize_ws evaluates
    once per row, not once per k-gram position (the codegen-CSE trap
    measured in operators/dedup.word_shingles). NULL text fingerprints
    as empty (a NULL would otherwise slip past the n<1 guard — NULL
    comparisons are not true — and emit a [NULL] fingerprint set)."""
    tt0 = F.coalesce(normalize_ws(text), F.lit(""))
    return F.element_at(
        F.transform(F.array(tt0), lambda tt: _winnow_of(tt, k, w)), 1
    )
