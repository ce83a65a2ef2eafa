"""Multimodal plumbing (stubbed codecs) + event-stream operators."""

from pyspark.sql import functions as F

from ccr_web_crawler_spark.multimodal import image_features, sample_frames, synth_media
from ccr_web_crawler_spark.streaming.events import (
    session_stats,
    sessionize,
    tumbling_counts,
)


def test_image_features_shape_and_determinism(spark):
    media = synth_media(spark, 12)
    a = image_features(media).orderBy("media_id").collect()
    b = image_features(media).orderBy("media_id").collect()
    assert len(a) == 12
    assert all(len(r.features) == 12 for r in a)  # 2*2 pooled * 3 channels
    assert [r.features for r in a] == [r.features for r in b]
    assert all(r.n_bytes > 0 for r in a)


def test_sample_frames(spark):
    media = synth_media(spark, 6)
    frames = sample_frames(media, n_frames=4)
    per = {r.media_id: r.cnt for r in frames.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()}
    assert all(v == 4 for v in per.values())
    assert frames.filter(F.length("frame") == 0).count() == 0


def _events(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10.0, "click"),
        (2, "2024-01-01 00:10:00", 5.0, "click"),
        (3, "2024-01-01 01:10:00", 1.0, "view"),   # 60min gap → new session
        (4, "2024-01-01 01:15:00", 2.0, "click"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, value double, event_type string")
    return df.withColumn("ts", F.to_timestamp("ts")).withColumn("user_id", F.lit(7))


def test_sessionize_gap(spark):
    out = sessionize(_events(spark), gap_minutes=30).orderBy("event_id").collect()
    assert [r.session_no for r in out] == [1, 1, 2, 2]


def test_session_stats(spark):
    r = session_stats(_events(spark), 30).collect()[0]
    assert (r.n_sessions, r.n_events) == (2, 4)
    assert r.avg_span_s == (600.0 + 300.0) / 2


def test_tumbling_counts_batch(spark):
    out = tumbling_counts(_events(spark), minutes=60).orderBy("window_start", "event_type").collect()
    assert [(r.event_type, r.n, r.total_value) for r in out] == [
        ("click", 2, 15.0),
        ("click", 1, 2.0),
        ("view", 1, 1.0),
    ]


def test_tumbling_counts_streaming_plan(spark):
    """The same transform must be a valid streaming plan (watermark +
    append-mode windowed agg) — assembled via an in-memory stream."""
    src = _events(spark)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .withColumn("ts", F.col("timestamp"))
        .withColumn("event_type", F.lit("tick"))
        .withColumn("value", F.lit(1.0))
    )
    q = tumbling_counts(stream, minutes=1, with_watermark=True)
    assert q.isStreaming
    run = q.writeStream.format("memory").queryName("t_counts").outputMode("append").start()
    try:
        run.processAllAvailable()
    finally:
        run.stop()
