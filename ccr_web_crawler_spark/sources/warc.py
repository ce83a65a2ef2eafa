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
  ingesters) make. Raw-WARC binary payloads (which may contain the
  delimiter bytes) use the Content-Length-driven streaming reader
  below (``read_warc``) — file-level parallelism, bounded memory.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterator

import pandas as pd

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


_WARC_SCHEMA = (
    "url string, warc_ts timestamp, rec_type string, "
    "content_type string, content_length long, payload binary"
)

# flush a parsed batch to Arrow once it holds this many payload bytes
# (or records) — bounds task memory to ~one batch regardless of file
# size, so a 1 GB WARC streams through a task instead of materializing
_BATCH_BYTES = 16 << 20
_BATCH_RECORDS = 512


def warc_record_bytes(url: str, payload: bytes,
                      rec_type: str = "response",
                      content_type: str = "application/http",
                      ts: str = "2026-01-01T00:00:00Z") -> bytes:
    """One spec-framed raw WARC record: version line, header block,
    CRLF CRLF, exactly ``Content-Length`` payload bytes, CRLF CRLF
    terminator. The payload is arbitrary binary — it may legally
    contain ``WARC/1.0\\r\\n`` or ``\\r\\n\\r\\n``; only Content-Length
    framing (not delimiter splitting) reads it back correctly. Fixture
    writer for tests and the driver's ``warc_ingest`` query."""
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def _parse_warc_stream(f, src: str) -> Iterator[dict]:
    """Content-Length-framed record walk over one open binary stream.
    O(1) memory per record: headers are read line-wise, the payload as
    one bounded ``read(content_length)``. Malformed framing raises —
    a truncated archive must fail loudly, not yield silent partials."""
    while True:
        # skip inter-record padding / leading blank lines
        line = f.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"{src}: expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{src}: EOF inside header block")
            if line in (b"\r\n", b"\n"):
                break
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"{src}: record missing Content-Length") from None
        payload = f.read(clen)
        if len(payload) != clen:
            raise ValueError(f"{src}: truncated payload ({len(payload)}/{clen})")
        term = f.read(4)
        if term not in (b"\r\n\r\n", b""):
            raise ValueError(f"{src}: bad record terminator {term!r}")
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "rec_type": headers.get("warc-type"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": payload,
        }


def read_warc(spark: SparkSession, path: str,
              from_content: bool = False) -> DataFrame:
    """Raw-WARC reader: spec-authoritative Content-Length framing over
    binary payloads — the input format the multimodal path consumes at
    production scale (image/audio bytes inside ``response`` records
    cannot be delimiter-split the way ``read_wet`` splits text).

    Scale shape (100 TB = ~100k x 1 GB ``.warc(.gz)`` files):

    * files are listed (not read) via the ``binaryFile`` source with
      only ``path``/``length`` selected — the format prunes the
      ``content`` column, so listing is metadata-only;
    * one task per file (``repartition`` on path): Common-Crawl gzip
      WARCs are per-record gzip members, readable only sequentially,
      so file-level parallelism IS the parallelism — at 100k files it
      saturates any executor count this engine targets;
    * inside the task the file STREAMS through ``mapInPandas``: one
      record in memory at a time, flushed to Arrow every 16 MB / 512
      records — task memory is bounded by one batch, never file size;
    * records without ``WARC-Target-URI`` (the ``warcinfo`` preamble)
      are dropped, mirroring ``read_wet``.

    Two IO modes:

    * default (``from_content=False``): the task opens the file path
      directly and STREAMS it — O(batch) memory regardless of file
      size. Local/``file:`` URIs open natively (gzip-transparent for
      ``.gz``); remote stores mount through the same path via a
      FUSE/fsspec shim in production deployments.
    * ``from_content=True``: parse the ``binaryFile`` source's
      ``content`` column instead — works on ANY Hadoop-supported
      filesystem (s3a/hdfs/abfs) with no shim, at the cost of
      materializing one whole file per row (binaryFile's own framing;
      cap file size via ``spark.sql.files.maxPartitionBytes``-style
      ingest hygiene). Record parsing and output are identical.
    """
    cols = ["url", "warc_ts", "rec_type", "content_type",
            "content_length", "payload"]

    def _flush(rows: list[dict]) -> pd.DataFrame:
        out = pd.DataFrame(rows, columns=cols)
        out["warc_ts"] = pd.to_datetime(
            out["warc_ts"], utc=True).dt.tz_localize(None)
        return out

    def _emit(stream, src: str) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        nbytes = 0
        for rec in _parse_warc_stream(stream, src):
            if not rec["url"]:
                continue
            rows.append(rec)
            nbytes += rec["content_length"]
            if len(rows) >= _BATCH_RECORDS or nbytes >= _BATCH_BYTES:
                yield _flush(rows)
                rows, nbytes = [], 0
        if rows:
            yield _flush(rows)

    if from_content:
        files = spark.read.format("binaryFile").load(path)

        def parse_content(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for p, blob in zip(pdf["path"], pdf["content"]):
                    raw = bytes(blob)
                    if p.endswith(".gz"):
                        raw = gzip.decompress(raw)
                    yield from _emit(io.BufferedReader(io.BytesIO(raw)),
                                     os.path.basename(p))

        return files.select("path", "content").mapInPandas(
            parse_content, _WARC_SCHEMA
        )

    files = spark.read.format("binaryFile").load(path).select("path")
    n_files = files.count()

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                opener = gzip.open if local.endswith(".gz") else open
                with opener(local, "rb") as fh:
                    stream = fh if isinstance(fh, io.BufferedReader) \
                        else io.BufferedReader(fh)
                    yield from _emit(stream, os.path.basename(local))

    return files.repartition(max(n_files, 1)).mapInPandas(parse, _WARC_SCHEMA)


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
