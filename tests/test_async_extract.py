"""Async extraction commit (plans/driver.py): the frontier loop commits
fast tables first and lands extracted/failures in an overlapped
background commit. These tests pin the three invariants that make the
overlap safe:

* async and sync produce the same final store state;
* a crash BETWEEN the frontier commit and its extraction commit is
  healed by the lineage-driven catch-up on resume (no lost documents,
  no duplicate extraction, original round numbers preserved);
* the two-phase mode (crawl with extract=False, re-open with
  extract=True) extracts every discovered document via the same
  catch-up, mirroring the reference's separate extraction phase
  (crawler/extraction.py:215-267 running off the discovered list).
"""

import dataclasses

import pytest

from ccr_web_crawler_spark.plans.driver import crawl
from ccr_web_crawler_spark.plans.round import RoundConfig
from ccr_web_crawler_spark.sources.synth import synth_pages, synth_seeds
from ccr_web_crawler_spark.sources.tableio import SnapshotStore


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, n_pages=200, n_hosts=3).localCheckpoint(eager=True)


def _state(spark, store):
    seen = {r.url_canon for r in store.read(spark, "seen").collect()}
    disc = [r.url_canon for r in store.read(spark, "discovered").orderBy("seq").collect()]
    ext = store.read(spark, "extracted")
    ext_rows = sorted(
        (r.url, r.section_number, r.extraction_status, r.text_plain)
        for r in ext.select("url", "section_number", "extraction_status", "text_plain").collect()
    ) if ext is not None else []
    fails = store.read(spark, "failures")
    fail_rows = sorted(
        (r.url, r.status, r["round"]) for r in fails.collect()
    ) if fails is not None else []
    return seen, disc, ext_rows, fail_rows


def test_async_equals_sync_final_state(spark, pages, tmp_path):
    a = SnapshotStore(tmp_path / "async")
    crawl(spark, pages, synth_seeds(spark), a, RoundConfig(async_extract=True))
    s = SnapshotStore(tmp_path / "sync")
    crawl(spark, pages, synth_seeds(spark), s, RoundConfig(async_extract=False))
    assert _state(spark, a) == _state(spark, s)


def test_crash_between_frontier_and_extract_commit_heals(spark, pages, tmp_path):
    """Kill the extraction commit of round k; resume must extract
    exactly the missing round (original round tag) and converge to the
    uninterrupted final state."""
    store = SnapshotStore(tmp_path / "crash")
    orig_commit = SnapshotStore.commit

    class Boom(RuntimeError):
        pass

    def failing_commit(self, round_no, tables, metrics=None, **kw):
        if (metrics or {}).get("phase") == "extract":
            raise Boom("simulated crash before extraction commit")
        return orig_commit(self, round_no, tables, metrics, **kw)

    SnapshotStore.commit = failing_commit
    try:
        with pytest.raises(Boom):
            crawl(spark, pages, synth_seeds(spark), store, RoundConfig())
    finally:
        SnapshotStore.commit = orig_commit

    m = store.manifest()
    d_rounds = {
        v["round"]
        for v in m["tables"]["discovered"].get("lineage", {}).values()
    }
    e_rounds = {
        v["round"]
        for v in (m["tables"].get("extracted") or {}).get("lineage", {}).values()
    }
    assert d_rounds - e_rounds, "crash must leave an unextracted round"

    # resume heals via catch-up, then finishes the crawl
    crawl(spark, pages, synth_seeds(spark), store, RoundConfig())

    ref = SnapshotStore(tmp_path / "ref")
    crawl(spark, pages, synth_seeds(spark), ref, RoundConfig())
    assert _state(spark, store) == _state(spark, ref)
    # catch-up tagged rows with the ORIGINAL round numbers
    m2 = store.manifest()
    e2 = {
        v["round"]
        for v in m2["tables"]["extracted"].get("lineage", {}).values()
    }
    assert d_rounds <= e2


def test_two_phase_crawl_then_extract(spark, pages, tmp_path):
    store = SnapshotStore(tmp_path / "twophase")
    cfg_nx = RoundConfig(extract=False)
    crawl(spark, pages, synth_seeds(spark), store, cfg_nx)
    assert store.read(spark, "extracted") is None
    # re-open with extraction on: catch-up extracts every discovered doc
    crawl(spark, pages, synth_seeds(spark), store, RoundConfig(extract=True))
    ref = SnapshotStore(tmp_path / "ref2")
    crawl(spark, pages, synth_seeds(spark), ref, RoundConfig(extract=True))
    sa, sb = _state(spark, store), _state(spark, ref)
    assert sa[0] == sb[0] and sa[1] == sb[1]
    # same extracted documents; failure ROUND tags equal too because
    # catch-up preserves the discovering round
    assert sa[2] == sb[2]
    assert sa[3] == sb[3]


def test_async_config_replace_keeps_other_fields():
    cfg = RoundConfig(round_seconds=6.0, backlog_hot_rows=2, async_extract=True)
    run_cfg = dataclasses.replace(cfg, extract=False)
    assert run_cfg.round_seconds == 6.0 and run_cfg.backlog_hot_rows == 2
    assert not run_cfg.extract and cfg.extract
