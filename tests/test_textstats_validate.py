"""Text stats + validation report."""

from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from ccr_web_crawler_spark.operators.validate import validation_report


def test_token_count(spark):
    df = spark.createDataFrame([(" a  b   c ",), ("",), ("one",)], "t string")
    got = [r.n for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 0, 1]


def test_lang_id(spark):
    rows = [
        ("the cat and the dog sat in the yard for hours",),
        ("la casa de los gatos que viven por una calle",),
        ("zzz qqq www",),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [r.l for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "es", "und"]


def test_quality_score_bands(spark):
    good = "the quality of this document is high and the text flows for " + "word " * 20
    bad = "!!! ??? ,,, ..."
    df = spark.createDataFrame([(good,), (bad,)], "t string")
    got = [r.q for r in df.select(quality_score(F.col("t")).alias("q")).collect()]
    assert got[0] >= 0.8 and got[1] <= 0.2


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("A  b\tC",), ("a b c",), ("abc",)], "t string")
    fps = [r.f for r in df.select(fingerprint(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[1] and fps[0] != fps[2]


def test_validation_report_counters(spark):
    """Planted fixture reproducing scripts/validate_data.py:6-68 counters."""
    rows = [
        ("u1", "T", "<p>long enough text</p>", "success"),     # valid
        ("u1", "T", "<p>long enough text</p>", "success"),     # dup url, valid
        ("u2", None, "<p>also long enough</p>", "success"),    # missing title, valid
        ("u3", "T", None, "success"),                          # missing text
        ("u4", "T", "  <b>x</b>", "success"),                  # empty (<10 stripped)
        ("u5", "T", None, "external_redirect"),                # redirect
    ]
    df = spark.createDataFrame(rows, "url string, section_title string, text_html string, extraction_status string")
    r = validation_report(df).collect()[0]
    assert (r.total, r.unique_urls, r.duplicates) == (6, 5, 1)
    assert (r.valid, r.redirects) == (3, 1)
    assert (r.missing_title, r.missing_text, r.empty_text) == (1, 1, 1)
    assert r.healthy is False  # 3/6 < 0.99


def test_health_gate_boundary(spark):
    rows = [(f"u{i}", "T", "<p>plenty of text here</p>", "success") for i in range(200)]
    rows.append(("x", "T", None, "success"))
    df = spark.createDataFrame(rows, "url string, section_title string, text_html string, extraction_status string")
    r = validation_report(df).collect()[0]
    assert r.valid == 200 and r.total == 201 and r.healthy is True  # 200/201 > .99


def test_bpe_token_count_pieces(spark):
    from ccr_web_crawler_spark.functions.textstats import bpe_token_count

    rows = [
        ("hello world",),        # 2 runs of <=4? hello=5->2, world=5->2 => 4
        ("don't say 42!",),      # don(1)+'(1)+t(1)+say(1)+42(1)+!(1) = 6
        ("",),                   # empty -> 0
        ("internationalization",),  # 20 letters -> ceil(20/4)=5
        ("1234567",),            # 7 digits -> ceil(7/3)=3
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [r.n for r in df.select(bpe_token_count(F.col("t")).alias("n")).collect()]
    assert got == [4, 6, 0, 5, 3]


def test_winnow_identical_docs_share_all_fingerprints(spark):
    from ccr_web_crawler_spark.functions.textstats import winnow_fingerprints

    text = "the quick brown fox jumps over the lazy dog repeatedly today"
    df = spark.createDataFrame([(1, text), (2, text), (3, "completely different words arranged here")],
                               "id int, t string")
    out = {r.id: set(r.fps) for r in df.select(
        "id", winnow_fingerprints(F.col("t")).alias("fps")).collect()}
    assert out[1] == out[2] and len(out[1]) > 0
    # unrelated docs share (essentially) nothing
    assert len(out[1] & out[3]) == 0


def test_winnow_substring_containment(spark):
    from ccr_web_crawler_spark.functions.textstats import winnow_fingerprints

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    sub = base[:90]  # a long verbatim prefix
    df = spark.createDataFrame([(1, base), (2, sub)], "id int, t string")
    out = {r.id: set(r.fps) for r in df.select(
        "id", winnow_fingerprints(F.col("t")).alias("fps")).collect()}
    # winnowing guarantee: shared runs >= k+w-1 chars surface as shared
    # fingerprints — most of the substring's prints appear in the base
    inter = len(out[1] & out[2])
    assert inter / len(out[2]) >= 0.8


def test_winnow_short_and_empty_docs(spark):
    from ccr_web_crawler_spark.functions.textstats import winnow_fingerprints

    df = spark.createDataFrame([(1, ""), (2, "tiny"), (3, "exactly8"), (4, "just over k+w-1")],
                               "id int, t string")
    got = {r.id: r.fps for r in df.select(
        "id", winnow_fingerprints(F.col("t")).alias("fps")).collect()}
    assert got[1] == [] and got[2] == []      # below k chars -> empty
    assert len(got[3]) == 1                    # one k-gram -> one window
    assert len(got[4]) >= 1
