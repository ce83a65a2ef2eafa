"""Curation operators: URL blocklist filter, CDC substring-dup spans,
benchmark decontamination (operators/curation.py). The DuckDB parity
of the registered queries runs in test_entry_oracle.py; these pin the
operator semantics directly on hand-built rows."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ccr_web_crawler_spark.operators import curation


def test_url_blocklist_suffix_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "https://ads.bad.example/x"),      # blocked: label suffix
            (2, "https://bad.example/y"),          # blocked: exact domain
            (3, "https://notbad.example/z"),       # NOT blocked (no dot boundary)
            (4, "https://ok.example/w"),           # kept
        ],
        "id int, url string",
    )
    bl = spark.createDataFrame([("bad.example",)], "domain string")
    kept = curation.url_blocklist_filter(df, bl, url_col="url")
    assert sorted(r.id for r in kept.collect()) == [3, 4]


def test_url_blocklist_word_score(spark):
    df = spark.createDataFrame(
        [(1, "https://a.example/spam-spam"), (2, "https://a.example/clean")],
        "id int, url string",
    )
    bl = spark.createDataFrame([], "domain string")
    out = curation.url_blocklist_filter(
        df, bl, url_col="url", bad_words={"spam": 0.5}, threshold=0.75
    )
    rows = {r.id: r.url_score for r in out.collect()}
    # doc 1 scores 2*0.5 = 1.0 ≥ 0.75 → dropped; doc 2 scores 0.0
    assert rows == {2: 0.0}


def test_cdc_spans_alignment_robust(spark):
    """A long span copied at a DIFFERENT offset still matches: CDC cut
    points depend only on content, so interior chunks are identical."""
    body = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles hang on the wall and the rain in spain stays "
        "mainly on the plain as every good sentence should demonstrate"
    )
    df = spark.createDataFrame(
        [(1, body), (2, "PREFIX OF DIFFERENT LENGTH :: " + body)],
        "doc_id int, text string",
    )
    spans = curation.substring_dup_spans(df, k=8, mod_p=8, min_len=20)
    cross = [r for r in spans.collect() if r.id_a == 1 and r.id_b == 2]
    assert cross, "no cross-doc span found despite verbatim copy at offset"
    # every matched pair is the SAME text at shifted positions
    offset = len("prefix of different length :: ")
    for r in cross:
        assert r.pos_b - r.pos_a == offset


def test_cdc_chunks_degenerate_inputs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "tiny"), (4, "x" * 7)],
        "doc_id int, text string",
    )
    # no chunk reaches min_len; no crash on empty/NULL/short docs
    assert curation.cdc_chunks(df, min_len=10).count() == 0


def test_cdc_chunks_cover_text(spark):
    """Chunks (with min_len=1) partition the normalized text exactly."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        curation.cdc_chunks(df, min_len=1).collect(), key=lambda r: r.pos
    )
    assert rows[0].pos == 1
    end = 1
    for r in rows:
        assert r.pos == end
        end += r.chunk_len
    assert end == len(text) + 1


def test_decontaminate_flags_planted_overlap(spark):
    bench_text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, "padding words here then " + bench_text + " trailing tail"),
            (2, "completely unrelated content with no shared gram at all "
                "and some more filler to pass the length floor"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(99, bench_text)], "doc_id int, text string")
    out = {r.doc_id: r for r in curation.decontaminate(docs, bench, n=8).collect()}
    assert out[1].contaminated and out[1].n_contaminated >= 1
    assert not out[2].contaminated and out[2].n_contaminated == 0
    assert out[2].contaminated_frac == 0.0


def test_decontaminate_short_doc_zero_grams(spark):
    docs = spark.createDataFrame([(1, "too short")], "doc_id int, text string")
    bench = spark.createDataFrame([(9, "also short")], "doc_id int, text string")
    row = curation.decontaminate(docs, bench, n=8).collect()[0]
    assert row.n_grams == 0 and not row.contaminated
