"""PII scrubbing (functions/pii.py) + CCNet line-level dedup
(operators/dedup.dedup_lines)."""

from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.pii import pii_counts, scrub_pii
from ccr_web_crawler_spark.operators.dedup import dedup_lines


def test_pii_scrub_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a.b+c@ex-ample.org or x@y.io, ip 10.0.0.7, call 555-123-4567"),
            (1, "no pii here at all"),
            (2, None),
            (3, "dots 1.2.3.4.5 and phone 555.123.4567"),
        ],
        "doc_id long, text string",
    )
    c = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            c["email"].alias("e"),
            c["ip"].alias("i"),
            c["phone"].alias("p"),
            scrub_pii(F.col("text")).alias("s"),
        ).collect()
    }
    assert (out[0]["e"], out[0]["i"], out[0]["p"]) == (2, 1, 1)
    assert out[0]["s"] == "mail <EMAIL> or <EMAIL>, ip <IP>, call <PHONE>"
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (0, 0, 0)
    assert out[1]["s"] == "no pii here at all"
    assert out[2]["s"] == ""  # NULL text scrubs to empty
    # leftmost-first: the IP pattern eats '1.2.3.4' out of '1.2.3.4.5'
    assert out[3]["i"] == 1 and out[3]["p"] == 1
    assert out[3]["s"] == "dots <IP>.5 and phone <PHONE>"


def test_dedup_lines_drops_boilerplate_keeps_order(spark):
    boiler = "Subscribe NOW!"
    rows = [(i, f"{boiler}\nunique line {i}\nsecond part {i}") for i in range(6)]
    rows.append((100, "solo doc\n" + boiler))  # boiler as footer
    rows.append((101, boiler))  # doc that is ONLY boilerplate
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, max_doc_freq=4).collect()}
    assert len(out) == 8  # every doc survives, even the emptied one
    assert out[0]["text"] == "unique line 0\nsecond part 0"
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 2)
    assert out[100]["text"] == "solo doc"
    assert out[101]["text"] == "" and out[101]["n_kept"] == 0


def test_dedup_lines_low_df_lines_survive(spark):
    # a line shared by only 3 docs stays below max_doc_freq=4
    df = spark.createDataFrame(
        [(i, "shared but rare\nbody {}".format(i)) for i in range(3)],
        "doc_id long, text string",
    )
    out = dedup_lines(df, max_doc_freq=4).collect()
    assert all(r["text"].startswith("shared but rare\n") for r in out)


def test_dedup_lines_normalizes_before_counting(spark):
    # case/whitespace variants of the same boilerplate count as one line
    variants = ["Buy now!", "  buy   NOW! ", "BUY NOW!", "buy now!", "Buy  Now!"]
    df = spark.createDataFrame(
        [(i, f"{v}\nkeep {i}") for i, v in enumerate(variants)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, max_doc_freq=4).collect()}
    assert all(out[i]["text"] == f"keep {i}" for i in range(5))
