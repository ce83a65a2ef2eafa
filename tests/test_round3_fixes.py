"""Round-3 hardening fixes: task.cpus clamp, real-PIL decode path,
IVF centroid clamping, metrics-schema resume guard, and the lazy
(un-pinned) corpus-URL probe relation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ccr_web_crawler_spark import multimodal
from ccr_web_crawler_spark.operators.ivf import train_centroids
from ccr_web_crawler_spark.plans.driver import (
    METRICS_SCHEMA,
    _check_metrics_schema,
    _corpus_urls,
    crawl,
)
from ccr_web_crawler_spark.plans.round import RoundConfig
from ccr_web_crawler_spark.session import _master_task_slot_cores
from ccr_web_crawler_spark.sources.synth import synth_pages, synth_seeds
from ccr_web_crawler_spark.sources.tableio import APPEND, SnapshotStore


# ------------------------------------------------------- session clamp
@pytest.mark.parametrize(
    ("master", "cores"),
    [
        ("local[1]", 1),
        ("local[8]", 8),
        ("local-cluster[4,2,8192]", 2),
        ("local-cluster[ 2, 3, 1024]", 3),
    ],
)
def test_master_task_slot_cores(master, cores):
    assert _master_task_slot_cores(master) == cores


def test_master_task_slot_cores_unknown_master_is_unclamped():
    # the cluster manager owns slot sizing on yarn/standalone
    assert _master_task_slot_cores("spark://head:7077") >= 1 << 16


# --------------------------------------------------------- PIL decode
class _FakePILImage:
    """Minimal PIL.Image.open stand-in: any payload starting with b'IMG'
    parses; everything else raises like Pillow does on garbage."""

    def __init__(self, h=3, w=5):
        self._hw = (h, w)

    @staticmethod
    def open(buf):
        if not buf.getvalue().startswith(b"IMG"):
            raise OSError("cannot identify image file")
        return _FakePILImage()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def convert(self, mode):
        assert mode == "RGB"
        return self

    def resize(self, wh):
        self._hw = (wh[1], wh[0])
        return self

    def __array__(self, dtype=None):
        h, w = self._hw
        return np.full((h, w, 3), 7, dtype=dtype or np.uint8)


def test_decode_one_uses_pil_when_available(monkeypatch):
    monkeypatch.setattr(multimodal, "HAVE_PIL", True)
    monkeypatch.setattr(multimodal, "Image", _FakePILImage)
    out = multimodal._decode_one(b"IMGxxxx", (8, 8))
    assert out.shape == (8, 8, 3)
    assert (out == 7).all()  # came from the (fake) real decoder
    # undecodable bytes fall back to the deterministic fake decode
    fb = multimodal._decode_one(b"garbage", (8, 8))
    assert fb.shape == (8, 8, 3)
    assert (fb == multimodal._fake_decode(b"garbage", (8, 8))).all()


def test_decode_one_without_pil(monkeypatch):
    monkeypatch.setattr(multimodal, "HAVE_PIL", False)
    out = multimodal._decode_one(b"IMGxxxx", (4, 4))
    assert (out == multimodal._fake_decode(b"IMGxxxx", (4, 4))).all()


# ----------------------------------------------------------- IVF clamp
def test_train_centroids_clamps_to_sample_size(spark):
    few = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)], "vec_id long, embedding array<float>"
    )
    cents = train_centroids(few, n_centroids=16)
    assert cents.shape == (3, 2)


def test_train_centroids_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        train_centroids(empty, n_centroids=4)


# ------------------------------------------------- metrics schema guard
def test_resume_rejects_renamed_metrics_schema(spark, tmp_path):
    store = SnapshotStore(tmp_path / "db")
    old = spark.createDataFrame(
        [(0, 1, 2, 3, 0, 10)],
        "round int, pages_fetched long, links_extracted long, "
        "sections_discovered long, failures long, wall_ms long",
    )
    store.commit(0, {"metrics": (old, APPEND)}, {"phase": "metrics"})
    with pytest.raises(ValueError, match="metrics schema"):
        _check_metrics_schema(store)
    with pytest.raises(ValueError, match="metrics schema"):
        crawl(
            spark,
            synth_pages(spark, 30, 2),
            synth_seeds(spark),
            store,
            RoundConfig(extract=False),
        )


def test_current_metrics_schema_accepted(spark, tmp_path):
    store = SnapshotStore(tmp_path / "db")
    cur = spark.createDataFrame([(0, 1, 2, 3, 0, 10)], METRICS_SCHEMA)
    store.commit(0, {"metrics": (cur, APPEND)}, {"phase": "metrics"})
    _check_metrics_schema(store)  # no raise


# -------------------------------------------------- corpus-URL de-pin
def test_corpus_urls_lazy_for_file_backed(spark, tmp_path):
    synth_pages(spark, 40, 2).write.parquet(str(tmp_path / "pages"))
    pages = spark.read.parquet(str(tmp_path / "pages"))
    rel = _corpus_urls(pages)
    plan = rel._jdf.queryExecution().executedPlan().toString()
    # a lazy pruned file scan, NOT a pinned checkpoint of the corpus
    assert "Scan ExistingRDD" not in plan and "LogicalRDD" not in plan
    assert "ReadSchema: struct<url:string>" in plan
    assert rel.count() == 40


def test_corpus_urls_checkpointed_for_in_memory(spark):
    pages = synth_pages(spark, 30, 2)
    rel = _corpus_urls(pages)
    plan = rel._jdf.queryExecution().executedPlan().toString()
    # in-memory synthesis would re-render per use — must be pinned
    assert "Scan ExistingRDD" in plan
    assert rel.count() == 30


def test_recovery_pass_keeps_corpus_lazy(spark, tmp_path):
    """The recovery wave checkpoints ONLY the failure-sized retry list;
    the corpus side of its fetch must remain a lazy (pruned, pushdown-
    capable) file scan — a corpus-sized checkpoint in the retry path
    would reintroduce the exact de-pinned-in-round-2 scale bug."""
    from ccr_web_crawler_spark.plans.round import RoundConfig, recovery_pass

    synth_pages(spark, 40, 2).write.parquet(str(tmp_path / "rp_pages"))
    pages = spark.read.parquet(str(tmp_path / "rp_pages"))
    retry = spark.createDataFrame(
        [("https://host0.example/calregs/Index",)], "url_canon string"
    ).localCheckpoint(eager=True)
    out = recovery_pass(retry, pages, RoundConfig(), _corpus_urls(pages))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan  # corpus stays a file scan
    assert out.count() == 1
