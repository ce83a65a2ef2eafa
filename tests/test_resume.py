"""Resume: kill after round k, restart, final state identical to an
uninterrupted run (reference ``load_checkpoint``,
``crawler/discovery.py:158-188``; ours is strictly stronger — atomic)."""

import pytest

from ccr_web_crawler_spark.plans.driver import crawl
from ccr_web_crawler_spark.plans.round import RoundConfig
from ccr_web_crawler_spark.sources.synth import synth_pages, synth_seeds
from ccr_web_crawler_spark.sources.tableio import SnapshotStore


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, n_pages=200, n_hosts=3).cache()


def _state(spark, store):
    seen = {r.url_canon for r in store.read(spark, "seen").collect()}
    disc = [r.url_canon for r in store.read(spark, "discovered").orderBy("seq").collect()]
    ext = store.read(spark, "extracted")
    n_ext = ext.count() if ext is not None else 0
    return seen, disc, n_ext


def test_kill_and_resume_identical(spark, pages, tmp_path):
    cfg = RoundConfig(extract=True)
    # uninterrupted run
    full_store = SnapshotStore(tmp_path / "full")
    crawl(spark, pages, synth_seeds(spark), full_store, cfg)

    # interrupted: stop after 2 rounds ("kill"), new driver resumes
    part_store = SnapshotStore(tmp_path / "part")
    crawl(spark, pages, synth_seeds(spark), part_store, cfg, max_rounds=2)
    resumed = SnapshotStore(tmp_path / "part")  # fresh handle = restart
    crawl(spark, pages, synth_seeds(spark), resumed, cfg)

    assert _state(spark, full_store) == _state(spark, resumed)


def test_extraction_not_duplicated_on_resume(spark, pages, tmp_path):
    store = SnapshotStore(tmp_path / "db")
    cfg = RoundConfig(extract=True)
    crawl(spark, pages, synth_seeds(spark), store, cfg, max_rounds=2)
    crawl(spark, pages, synth_seeds(spark), store, cfg)
    ext = store.read(spark, "extracted")
    assert ext.count() == ext.select("url").distinct().count()
