"""Bucketed-corpus fetch join (sources/tableio.write_bucketed_pages):
the production answer for rounds too large to broadcast — the corpus
is bucketed on url, so the fetch join shuffles ONLY the round-sized
candidate side into the corpus's layout and never exchanges or sorts
the corpus itself. Results must be identical to the broadcast strategy
(incl. miss rows), and the physical plan must show exactly one
Exchange, on the candidate side, with no Sort above the bucketed scan.
"""

import pytest
from pyspark.sql import functions as F

from ccr_web_crawler_spark.plans.round import RoundConfig, fetch_join
from ccr_web_crawler_spark.sources.synth import synth_pages
from ccr_web_crawler_spark.sources.tableio import write_bucketed_pages


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    pages = synth_pages(spark, n_pages=120, n_hosts=3)
    path = tmp_path_factory.mktemp("bkt") / "pages_bucketed"
    return write_bucketed_pages(pages, "pages_bucketed_test", 4, str(path))


def _candidates(spark, bucketed, n=25):
    urls = [r["url"] for r in bucketed.select("url").limit(n).collect()]
    rows = [(u,) for u in urls] + [("https://nowhere.example/missing",)]
    return spark.createDataFrame(rows, "url_canon string")


def test_bucketed_fetch_matches_broadcast(spark, bucketed):
    cand = _candidates(spark, bucketed)
    cfg_b = RoundConfig(fetch_strategy="broadcast", fetch_pushdown_limit=None)
    cfg_s = RoundConfig(fetch_strategy="shuffle")
    got_b = {
        (r.url_canon, r.html is None)
        for r in fetch_join(cand, bucketed, cfg_b).collect()
    }
    got_s = {
        (r.url_canon, r.html is None)
        for r in fetch_join(cand, bucketed, cfg_s).collect()
    }
    assert got_b == got_s
    assert ("https://nowhere.example/missing", True) in got_s


def test_bucketed_fetch_plan_no_corpus_exchange(spark, bucketed):
    """The corpus side must ride its bucketing: exactly one Exchange in
    the whole plan (candidates shuffling into the corpus layout), zero
    exchanges or sorts between the bucketed scan and the join."""
    cand = _candidates(spark, bucketed)
    cfg = RoundConfig(fetch_strategy="shuffle")
    # AQE re-plans per stage and hides the final shape; the static plan
    # is the contract here
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            fetch_join(cand, bucketed, cfg)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("Exchange") == 1, plan
    # the single exchange must hash-partition the candidate relation,
    # not the corpus scan: on the corpus branch the scan reports its
    # bucketing (SelectedBucketsCount) and no Exchange sits above it
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_bucketed_scan_prunes_buckets_for_point_lookup(spark, bucketed):
    """A single-url predicate on a bucketed table scans only that url's
    bucket (bucket pruning) — the fetch-pushdown story composes with
    bucketing rather than fighting it. autoBucketedScan must be off for
    a bare filter: the planner otherwise drops the bucketed layout for
    scans with no join/agg to feed (and with it the pruning)."""
    one = bucketed.select("url").limit(1).collect()[0]["url"]
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            bucketed.filter(F.col("url") == one)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    assert "SelectedBucketsCount: 1 out of 4" in plan, plan
