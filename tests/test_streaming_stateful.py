"""Stateful streaming admission (``streaming/stateful.py``): the
per-host politeness quota must hold ACROSS micro-batches — host state
(cumulative admitted count) persists from trigger to trigger."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from ccr_web_crawler_spark.streaming.stateful import admit_stream

FRONTIER_SCHEMA = "host string, url_canon string, depth int, seq long"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, FRONTIER_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_admit_stream_quota_spans_microbatches(spark, tmp_path):
    src = str(tmp_path / "frontier_stream")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: h0 offers 5 urls (cap 8) → all admitted, state = 5
    _write_batch(
        spark,
        src,
        [("h0", f"u{i}", 0, i) for i in range(5)]
        + [("h1", "v0", 0, 0)],
    )

    stream = spark.readStream.schema(FRONTIER_SCHEMA).parquet(src)
    out = admit_stream(stream, max_per_host=8)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("admits")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("select * from admits").collect()
        assert sum(r.host == "h0" for r in got1) == 5

        # batch 2: h0 offers 6 more → only 3 admitted (8 - 5 carried in
        # state), chosen in (depth, seq) order; h1 keeps its own quota
        _write_batch(
            spark,
            src,
            [("h0", f"w{i}", 1, 100 + i) for i in range(6)]
            + [("h1", "v1", 1, 1)],
        )
        q.processAllAvailable()
        rows = spark.sql("select * from admits").collect()
    finally:
        q.stop()

    h0 = sorted(
        ((r.depth, r.seq, r.url_canon, r.admit_no) for r in rows if r.host == "h0")
    )
    assert len(h0) == 8  # lifetime cap enforced across batches
    # batch-2 admits resume the cumulative index and take the 3 lowest seqs
    assert [t[2] for t in h0[5:]] == ["w0", "w1", "w2"]
    assert [t[3] for t in h0] == list(range(1, 9))
    assert sum(r.host == "h1" for r in rows) == 2  # independent per-host state


def test_admit_stream_orders_within_batch(spark, tmp_path):
    """Within one micro-batch the admitted set is the best-by-(depth,
    seq) prefix, even when the group spans multiple Arrow chunks."""
    src = str(tmp_path / "s2")
    rows = [("h0", f"u{i}", i % 3, 1000 - i) for i in range(50)]
    _write_batch(spark, src, rows)
    stream = spark.readStream.schema(FRONTIER_SCHEMA).parquet(src)
    out = admit_stream(stream, max_per_host=7)
    q = (
        out.writeStream.format("memory")
        .queryName("admits2")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from admits2").collect()
    finally:
        q.stop()
    want = sorted(rows, key=lambda r: (r[2], r[3]))[:7]
    assert sorted((r.depth, r.seq) for r in got) == sorted(
        (d, s) for _, _, d, s in want
    )
