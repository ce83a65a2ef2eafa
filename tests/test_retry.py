"""Retry/recovery rounds (reference 3-stage recovery,
``crawler/extraction.py:215-267``, ``README.md:62-64``): failed URLs
re-enter the extraction worklist with attempt+1 and are dropped once
attempts reach ``max_attempts``; a transiently-missing page (fetch
failure in the crawl, present at recovery time) is extracted on a later
pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccr_web_crawler_spark.plans.driver import crawl, recover
from ccr_web_crawler_spark.plans.round import RoundConfig, retry_candidates
from ccr_web_crawler_spark.sources.synth import synth_pages, synth_seeds
from ccr_web_crawler_spark.sources.tableio import SnapshotStore


def test_retry_candidates_semantics(spark):
    failures = spark.createDataFrame(
        [
            ("u1", "parse_failure", "x", 0),   # 1 attempt, retryable
            ("u2", "parse_failure", "x", 0),   # 2 attempts, retryable
            ("u2", "parse_failure", "x", 1),
            ("u3", "parse_failure", "x", 0),   # 3 attempts = cap, retired
            ("u3", "parse_failure", "x", 1),
            ("u3", "parse_failure", "x", 2),
            ("u4", "parse_failure", "x", 0),   # failed then succeeded
        ],
        "url string, status string, note string, round int",
    )
    succeeded = spark.createDataFrame([("u4",)], "url_canon string")
    got = {
        (r["url_canon"], r["attempt"])
        for r in retry_candidates(failures, succeeded, max_attempts=3).collect()
    }
    assert got == {("u1", 1), ("u2", 2)}


def test_transient_failure_recovered(spark, tmp_path):
    """Kill a page out of the corpus for the crawl (fetch failure →
    failures row), restore it, run recover(): the page must come back
    as a success row, and the retry list must drain."""
    cfg = RoundConfig(seq_partitions=4, max_attempts=3)
    pages_full = synth_pages(spark, n_pages=200, n_hosts=3).localCheckpoint(eager=True)

    # pick one document page to hide: any /calregs/Document/ url
    victim = (
        pages_full.filter(F.col("url").contains("/calregs/Document/"))
        .select("url").limit(1).collect()[0]["url"]
    )
    pages_broken = pages_full.filter(F.col("url") != victim).localCheckpoint(eager=True)

    store = SnapshotStore(str(tmp_path / "c"))
    crawl(spark, pages_broken, synth_seeds(spark), store, cfg)

    failed_urls = {
        r["url"] for r in store.read(spark, "failures").select("url").collect()
    }
    assert victim in failed_urls

    # corpus healed → recovery extracts the victim
    waves = recover(spark, pages_full, store, cfg)
    assert waves >= 1
    ext = store.read(spark, "extracted")
    victim_rows = ext.filter(F.col("url") == victim).collect()
    statuses = sorted(r["extraction_status"] for r in victim_rows)
    assert "success" in statuses  # recovered
    # the original failed attempt is still on record (append-only lineage)
    assert "parse_failure" in statuses

    # recovered url no longer eligible
    succeeded = ext.filter(F.col("extraction_status") == "success").select(
        F.col("url").alias("url_canon")
    )
    retry = retry_candidates(store.read(spark, "failures"), succeeded, cfg.max_attempts)
    assert victim not in {r["url_canon"] for r in retry.collect()}


def test_deterministic_failure_exhausts_attempts(spark, tmp_path):
    """A page that stays broken retries up to max_attempts total
    failures, then recover() stops touching it."""
    cfg = RoundConfig(seq_partitions=4, max_attempts=3)
    pages_full = synth_pages(spark, n_pages=200, n_hosts=3).localCheckpoint(eager=True)
    victim = (
        pages_full.filter(F.col("url").contains("/calregs/Document/"))
        .select("url").limit(1).collect()[0]["url"]
    )
    pages_broken = pages_full.filter(F.col("url") != victim).localCheckpoint(eager=True)

    store = SnapshotStore(str(tmp_path / "c"))
    crawl(spark, pages_broken, synth_seeds(spark), store, cfg)
    waves = recover(spark, pages_broken, store, cfg)  # corpus stays broken
    assert waves == 2  # attempts 2 and 3; cap reached, loop stops early

    n_attempts = (
        store.read(spark, "failures").filter(F.col("url") == victim).count()
    )
    assert n_attempts == cfg.max_attempts
    # nothing left to retry
    ext = store.read(spark, "extracted")
    succeeded = ext.filter(F.col("extraction_status") == "success").select(
        F.col("url").alias("url_canon")
    )
    retry = retry_candidates(store.read(spark, "failures"), succeeded, cfg.max_attempts)
    assert victim not in {r["url_canon"] for r in retry.collect()}
