"""WARC/WET ingest (sources/warc.py): round-trip byte fidelity, header
field extraction, preamble handling, and hand-written real-format
bytes (reader must not depend on our own writer's quirks)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ccr_web_crawler_spark.sources.warc import read_wet, write_wet


@pytest.fixture()
def corpus(spark):
    rows = [
        ("https://a.example/1", "plain text body"),
        ("https://a.example/2", "multi\nline\n\nwith interior blank line"),
        ("https://b.example/3", ""),  # empty payload
        ("https://b.example/4", None),  # null text -> empty payload
        ("https://b.example/5", "unicode: §über — émojis ok"),
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_roundtrip_byte_exact(spark, corpus, tmp_path):
    path = os.path.join(tmp_path, "rt.warc.wet")
    write_wet(corpus, path)
    got = {r["url"]: r for r in read_wet(spark, path).collect()}
    want = {r["url"]: (r["text"] or "") for r in corpus.collect()}
    assert set(got) == set(want)
    for url, text in want.items():
        assert got[url]["payload"] == text, url
        assert got[url]["content_length"] == len(text.encode("utf-8"))
        assert got[url]["rec_type"] == "conversion"
        assert got[url]["warc_ts"] is not None


def test_reads_handwritten_wet_bytes(spark, tmp_path):
    # real-format bytes, including a warcinfo preamble record (no
    # Target-URI) that must be dropped, written WITHOUT our writer
    raw = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "WARC-Date: 2026-02-01T00:00:00Z\r\n"
        "Content-Length: 9\r\n"
        "\r\n"
        "file info\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://x.example/p\r\n"
        "WARC-Date: 2026-02-01T12:34:56Z\r\n"
        "Content-Length: 11\r\n"
        "\r\n"
        "hello\n\nwet\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://x.example/q\r\n"
        "WARC-Date: 2026-02-01T12:34:57Z\r\n"
        "Content-Length: 3\r\n"
        "\r\n"
        "end\r\n"
        "\r\n"
    )
    p = tmp_path / "hand.warc.wet"
    p.write_bytes(raw.encode("utf-8"))
    rows = {r["url"]: r for r in read_wet(spark, str(p)).collect()}
    assert set(rows) == {"https://x.example/p", "https://x.example/q"}
    assert rows["https://x.example/p"]["payload"] == "hello\n\nwet"
    assert rows["https://x.example/p"]["content_length"] == 11
    assert rows["https://x.example/q"]["payload"] == "end"
    assert str(rows["https://x.example/q"]["warc_ts"]).startswith("2026-02-01 12:34:57")


def test_multifile_parallel_read(spark, tmp_path):
    # writer range-partitions into several files; the reader must see
    # every record exactly once across files
    rows = [(f"https://h{i % 3}.example/d/{i}", f"doc {i} body") for i in range(200)]
    df = spark.createDataFrame(rows, "url string, text string")
    path = os.path.join(tmp_path, "many.warc.wet")
    write_wet(df, path, partitions=6)
    files = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(files) > 1
    got = read_wet(spark, path)
    assert got.count() == 200
    assert got.select("url").distinct().count() == 200


# ---------------------------------------------------------------- raw WARC


class TestRawWarc:
    """Content-Length-framed binary reader (read_warc) — the payloads
    here deliberately contain the record delimiter bytes that would
    break any delimiter-split reader."""

    HOSTILE = [
        ("https://c.example/bin1",
         b"binary \x00\xff\x01 bytes WARC/1.0\r\n embedded version line"),
        ("https://c.example/bin2",
         b"payload with \r\n\r\n interior terminator and trailing CRLF\r\n"),
        ("https://c.example/bin3", b""),
        ("https://c.example/bin4", bytes(range(256)) * 3),
    ]

    def _write(self, path, records, preamble=True, gz=False):
        from ccr_web_crawler_spark.sources.warc import warc_record_bytes
        import gzip as _gzip

        blob = b""
        if preamble:
            blob += warc_record_bytes("", b"software: test", rec_type="warcinfo")
            # warcinfo has no Target-URI at all — strip the empty header
            blob = blob.replace(b"WARC-Target-URI: \r\n", b"")
        for url, payload in records:
            blob += warc_record_bytes(url, payload)
        opener = _gzip.open if gz else open
        with opener(path, "wb") as f:
            f.write(blob)

    def test_roundtrip_binary_byte_exact(self, spark, tmp_path):
        from ccr_web_crawler_spark.sources.warc import read_warc

        p = os.path.join(tmp_path, "raw.warc")
        self._write(p, self.HOSTILE)
        got = {r["url"]: r for r in read_warc(spark, p).collect()}
        assert set(got) == {u for u, _ in self.HOSTILE}
        for url, payload in self.HOSTILE:
            assert bytes(got[url]["payload"]) == payload, url
            assert got[url]["content_length"] == len(payload)
            assert got[url]["rec_type"] == "response"
            assert got[url]["content_type"] == "application/http"
            assert got[url]["warc_ts"] is not None

    def test_gzip_transparent(self, spark, tmp_path):
        from ccr_web_crawler_spark.sources.warc import read_warc

        p = os.path.join(tmp_path, "raw.warc.gz")
        self._write(p, self.HOSTILE, gz=True)
        got = {r["url"]: bytes(r["payload"])
               for r in read_warc(spark, p).collect()}
        assert got == dict(self.HOSTILE)

    def test_multifile_one_task_per_file(self, spark, tmp_path):
        from ccr_web_crawler_spark.sources.warc import read_warc

        for i in range(3):
            self._write(
                os.path.join(tmp_path, f"part{i}.warc"),
                [(f"https://m.example/{i}/{j}", f"doc {i}/{j}".encode())
                 for j in range(4)],
                preamble=(i == 0),
            )
        df = read_warc(spark, str(tmp_path))
        assert df.count() == 12
        assert df.rdd.getNumPartitions() == 3

    def test_truncated_payload_fails_loudly(self, spark, tmp_path):
        from ccr_web_crawler_spark.sources.warc import warc_record_bytes, read_warc

        p = os.path.join(tmp_path, "trunc.warc")
        with open(p, "wb") as f:
            f.write(warc_record_bytes("https://t.example/x", b"full payload")[:-10])
        with pytest.raises(Exception, match="truncated|terminator"):
            read_warc(spark, p).collect()


def test_raw_warc_feeds_multimodal_features(spark, tmp_path):
    """End-to-end production ingest shape: binary media payloads inside
    raw WARC `response` records → read_warc (Content-Length framing) →
    image_features (mapInPandas decode). Pins that the WARC payload
    column is binary-compatible with the multimodal path and that
    features are computed over the EXACT archived bytes (same sha-seeded
    fake decode ⇒ same features as feeding the original payloads)."""
    from ccr_web_crawler_spark.multimodal import image_features, synth_media
    from ccr_web_crawler_spark.sources.warc import read_warc, warc_record_bytes

    media = synth_media(spark, n=12).collect()
    p = os.path.join(tmp_path, "media.warc.gz")
    import gzip as _gzip

    with _gzip.open(p, "wb") as f:
        for r in media:
            f.write(warc_record_bytes(
                f"https://img.example/{r['media_id']}", bytes(r["payload"]),
                content_type="image/png",
            ))

    ingested = read_warc(spark, p).select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long").alias("media_id"),
        "payload",
    )
    got = {r["media_id"]: r["features"]
           for r in image_features(ingested).collect()}
    direct_df = spark.createDataFrame(
        [(r["media_id"], r["payload"]) for r in media],
        "media_id long, payload binary",
    )
    want = {r["media_id"]: r["features"]
            for r in image_features(direct_df).collect()}
    assert got == want and len(got) == 12


def test_raw_warc_from_content_mode_parity(spark, tmp_path):
    """from_content=True (any-Hadoop-FS path) must produce exactly the
    rows of the streaming default, gzip included."""
    from ccr_web_crawler_spark.sources.warc import read_warc, warc_record_bytes
    import gzip as _gzip

    recs = [(f"https://p.example/{i}",
             (f"doc {i} ".encode() + bytes([i]) * 5)) for i in range(6)]
    for name, gz in (("a.warc", False), ("b.warc.gz", True)):
        blob = b"".join(warc_record_bytes(u, p) for u, p in recs)
        opener = _gzip.open if gz else open
        with opener(os.path.join(tmp_path, name), "wb") as f:
            f.write(blob)

    def snap(df):
        return sorted(
            (r["url"], bytes(r["payload"]), r["content_length"], r["rec_type"])
            for r in df.collect()
        )

    stream = snap(read_warc(spark, str(tmp_path)))
    content = snap(read_warc(spark, str(tmp_path), from_content=True))
    assert stream == content and len(stream) == 12
