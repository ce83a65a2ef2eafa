"""Synthetic web generator: determinism, skew shape, and the end-to-end
golden invariant — extractor(text) must be byte-identical to the
table's embedded golden ``text`` column for EVERY page."""

from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.htmlx.udfs import extract_sections
from ccr_web_crawler_spark.sources.synth import synth_pages


def test_deterministic(spark):
    a = synth_pages(spark, 120, 3).orderBy("url").collect()
    b = synth_pages(spark, 120, 3).orderBy("url").collect()
    assert [(r.url, bytes(r.html), r.text) for r in a] == [
        (r.url, bytes(r.html), r.text) for r in b
    ]


def test_hot_host_skew(spark):
    pages = synth_pages(spark, 400, 5)
    counts = {r.host: r.cnt for r in pages.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    assert counts["host0.example"] >= 0.45 * sum(counts.values())
    assert len(counts) == 5


def test_extraction_matches_golden_text_byte_identical(spark):
    """The input_hint invariant: byte-identical extracted text per url."""
    pages = synth_pages(spark, 300, 4).filter(F.col("kind") == "doc").cache()
    extracted = extract_sections(pages, "url", "html")
    joined = (
        extracted.alias("e")
        .join(pages.select("url", "text").alias("p"), "url")
        .select(
            "url",
            "e.extraction_status",
            F.coalesce(F.col("e.text_plain"), F.lit("")).alias("got"),
            F.col("p.text").alias("want"),
        )
    )
    mismatches = joined.filter(F.col("got") != F.col("want"))
    assert mismatches.count() == 0, mismatches.limit(5).collect()
    # all three statuses occur in the corpus
    statuses = {r.extraction_status for r in extracted.select("extraction_status").distinct().collect()}
    assert statuses == {"success", "parse_failure", "external_redirect"}
