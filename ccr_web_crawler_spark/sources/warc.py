"""WARC/WET ingest — the Common-Crawl archive formats a web-text
pipeline actually starts from.

The reference ingests its corpus as gzip JSONL (``indexer/ingest.py:
45-50``); at web scale the corpus arrives as WARC (raw captures) or WET
(extracted-text conversions) — ``WARC/1.0`` records: a header block of
``Name: value`` lines, a blank line (CRLF CRLF), the payload, and a
CRLF CRLF record terminator. This module reads the text-payload (WET)
flavor straight into a DataFrame with zero Python in the parse path.

Scale shape:
* the file is split into records by Spark's text reader with
  ``lineSep = "WARC/1.0\\r\\n"`` — Hadoop's delimited text input is
  SPLITTABLE, so one 1 GB WET file parses across tasks, and a 100 TB
  corpus of ~50k files adds file-level parallelism on top (gzip members
  fall back to file-at-a-time, the standard Common-Crawl trade);
* header fields and the payload come out of pure JVM expressions
  (``regexp_extract`` + ``locate``/``substr``) that fuse into the scan
  — no shuffle, no UDF;
* delimiter-splitting is the approximation every Hadoop WARC splitter
  makes for splittability (the spec's authoritative framing is
  Content-Length): a payload containing the literal record delimiter
  would over-split. WET payloads are extracted text, where this is the
  same trade production CC readers (e.g. archive-team's hadoop
  ingesters) make. Raw-WARC binary payloads need the
  Content-Length-driven reader over ``binaryFile`` — out of scope here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_DELIM = "WARC/1.0\r\n"

# header values run to end-of-line; URI/date/type are single tokens
_URI_RE = r"WARC-Target-URI:\s*(\S+)"
_DATE_RE = r"WARC-Date:\s*(\S+)"
_TYPE_RE = r"WARC-Type:\s*(\S+)"
_CLEN_RE = r"Content-Length:\s*([0-9]+)"


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WET records at ``path`` into
    ``(url, warc_ts timestamp, rec_type, content_length long,
    payload string)``.

    Records whose header block lacks a ``WARC-Target-URI`` (the
    ``warcinfo`` file preamble) are dropped — they describe the file,
    not a page. The payload is everything between the header block's
    blank line and the record terminator; a trailing CRLF CRLF (plus
    any writer-added line end) is stripped, interior blank lines are
    preserved byte-for-byte."""
    raw = spark.read.option("lineSep", RECORD_DELIM).text(path)
    v = F.col("value")
    # header block ends at the first blank line
    sep = F.locate("\r\n\r\n", v)
    # strip exactly the record terminator (plus the one optional
    # writer-added line end) — an anchored \s* would also eat interior
    # trailing blank lines that belong to the payload
    payload = F.regexp_replace(
        F.substr(v, sep + F.lit(4), F.length(v)), "\r\n\r\n\n?$", ""
    )
    url = F.regexp_extract(v, _URI_RE, 1)
    return (
        raw.filter(F.length(F.trim(v)) > 0)
        .filter(sep > 0)
        .select(
            url.alias("url"),
            F.regexp_extract(v, _DATE_RE, 1).cast("timestamp").alias("warc_ts"),
            F.regexp_extract(v, _TYPE_RE, 1).alias("rec_type"),
            F.regexp_extract(v, _CLEN_RE, 1).cast("long").alias("content_length"),
            payload.alias("payload"),
        )
        .filter(F.col("url") != "")
    )


def write_wet(df: DataFrame, path: str, url_col: str = "url",
              text_col: str = "text", ts_col: str | None = None,
              partitions: int = 4) -> None:
    """Render ``df`` as WARC/WET conversion records (the inverse of
    ``read_wet`` — used for fixture synthesis and for exporting a
    cleaned corpus back to the interchange format). One record per row;
    rows range-partitioned and sorted on ``url_col`` so the file layout
    is deterministic. The text writer terminates each row with ``\\n``,
    which ``read_wet`` strips with the record terminator."""
    ts = (
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if ts_col
        else F.lit("2026-01-01T00:00:00Z")
    )
    body = F.coalesce(F.col(text_col), F.lit(""))
    rec = F.concat(
        F.lit(RECORD_DELIM),
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit("\r\n"),
        F.lit("WARC-Date: "), ts, F.lit("\r\n"),
        F.lit("Content-Length: "), F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n\r\n"),
    )
    # each row carries its own leading "WARC/1.0\r\n" (byte-authentic
    # record framing); the writer's default "\n" row terminator is the
    # one extra byte read_wet's terminator strip accounts for
    (
        df.select(rec.alias("value"))
        .repartitionByRange(partitions, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .text(path)
    )
