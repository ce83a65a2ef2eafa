"""Plan-shape guards for the 100TB scale killers fixed in round 2:

* ``fetch_join`` must never broadcast anything corpus-sized — the miss
  anti-join's build side has to be the round-bounded intersection
  (candidates ⋂ corpus urls), not the raw corpus URL set;
* ``admit_per_host`` must keep exact single-window semantics while its
  first-level window partitions stay ~frontier/n_salts even when one
  host owns most of the frontier (north_rule hot-domain salting).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.politeness import admit_per_host
from ccr_web_crawler_spark.plans.round import RoundConfig, fetch_join


def _tree(plan_str: str):
    """Parse Spark's indented plan text into (depth, text) nodes."""
    nodes = []
    for line in plan_str.splitlines():
        stripped = line.lstrip(": +-")
        if not stripped:
            continue
        depth = (len(line) - len(stripped)) // 3
        nodes.append((depth, stripped))
    return nodes


def _subtree(nodes, idx):
    d = nodes[idx][0]
    out = [nodes[idx]]
    for j in range(idx + 1, len(nodes)):
        if nodes[j][0] <= d:
            break
        out.append(nodes[j])
    return out


def test_fetch_join_never_broadcasts_corpus(spark, tmp_path):
    pages_path = os.path.join(str(tmp_path), "pages")
    spark.createDataFrame(
        [(f"https://h/{i}", bytearray(b"<html></html>")) for i in range(200)],
        "url string, html binary",
    ).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    cand = spark.createDataFrame(
        [(f"https://h/{i}",) for i in range(0, 260, 2)], "url_canon string"
    )

    out = fetch_join(cand, pages, RoundConfig())
    nodes = _tree(out._jdf.queryExecution().optimizedPlan().toString())

    # every broadcast-hinted join: walk its build (right-child) subtree;
    # if it reads the parquet corpus it must ALSO contain an inner join
    # (the candidates intersection) bounding its size to the round
    anti_checked = 0
    for i, (_, text) in enumerate(nodes):
        if "strategy=broadcast" not in text:
            continue
        sub = _subtree(nodes, i)
        # right child = last direct child subtree of the join node
        d = nodes[i][0]
        child_idx = [j for j in range(1, len(sub)) if sub[j][0] == d + 1]
        assert child_idx, text
        build = sub[child_idx[-1] :]
        build_txt = "\n".join(t for _, t in build)
        if "parquet" in build_txt:
            assert "Join Inner" in build_txt, (
                "broadcast build side scans the corpus without a "
                "candidate-bounding join:\n" + build_txt
            )
            anti_checked += 1
    assert anti_checked >= 1  # the miss-branch build side was exercised

    # semantics: hits carry html, misses carry null html
    rows = {r["url_canon"]: r["html"] for r in out.collect()}
    assert len(rows) == 130
    assert rows["https://h/0"] is not None
    assert rows["https://h/250"] is None


@pytest.mark.parametrize("n_salts", [4, 16])
def test_admit_per_host_salted_matches_single_window(spark, n_salts):
    # hot host h0 holds ~90% of the frontier (synth plants 50%; go worse)
    rows = [(f"https://h0/{i}", "h0", 0, i, 1.0) for i in range(900)]
    rows += [(f"https://h{1 + i % 3}/{i}", f"h{1 + i % 3}", 0, 1000 + i, 2.0) for i in range(100)]
    frontier = spark.createDataFrame(
        rows, "url_canon string, host string, depth int, seq long, crawl_delay double"
    )

    admitted, deferred = admit_per_host(frontier, 20.0, n_salts=n_salts)

    # oracle: the plain single-window form
    w = Window.partitionBy("host").orderBy("depth", "seq")
    budget = F.greatest(F.lit(1), F.floor(F.lit(20.0) / F.col("crawl_delay")))
    ranked = frontier.withColumn("__rk", F.row_number().over(w))
    want_admit = {r["url_canon"] for r in ranked.filter(F.col("__rk") <= budget).collect()}

    got_admit = {r["url_canon"] for r in admitted.collect()}
    got_defer = {r["url_canon"] for r in deferred.collect()}
    assert got_admit == want_admit
    assert got_defer == {r["url_canon"] for r in frontier.collect()} - want_admit
    assert admitted.columns == frontier.columns  # no helper cols leak


def test_admit_salt_bounds_window_partitions(spark):
    n_salts = 16
    rows = [(f"https://h0/{i}", "h0", 0, i, 1.0) for i in range(2000)]
    frontier = spark.createDataFrame(
        rows, "url_canon string, host string, depth int, seq long, crawl_delay double"
    )
    # the level-1 window partitions by (host, salt): with the same salt
    # expression, no group may hold more than ~2x the fair 1/n_salts share
    salt = F.pmod(F.xxhash64(F.col("url_canon")), F.lit(n_salts))
    sizes = [
        r["n"]
        for r in frontier.groupBy(F.col("host"), salt.alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == n_salts
    assert max(sizes) < 2 * (2000 / n_salts)
    # and the operator still admits exactly budget rows for the hot host
    admitted, _ = admit_per_host(frontier, 20.0, n_salts=n_salts)
    assert admitted.count() == 20


def test_fetch_pushdown_point_lookup(spark, tmp_path):
    """Small rounds must push their url set INTO the parquet scan
    (PushedFilters: In) so a sorted corpus serves the fetch as a
    point lookup instead of a full fat-column scan; results must be
    identical to the streamed form, misses included."""
    pages_path = os.path.join(str(tmp_path), "pages_sorted")
    spark.createDataFrame(
        [(f"https://h/{i:05d}", bytearray(b"<html>%d</html>" % i)) for i in range(500)],
        "url string, html binary",
    ).repartitionByRange(4, "url").sortWithinPartitions("url").write.mode(
        "overwrite"
    ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    cand = spark.createDataFrame(
        [(f"https://h/{i:05d}",) for i in range(0, 40)]
        + [("https://h/miss",)],
        "url_canon string",
    ).localCheckpoint(eager=True)

    pushed = fetch_join(cand, pages, RoundConfig(fetch_pushdown_limit=1024))
    streamed = fetch_join(cand, pages, RoundConfig(fetch_pushdown_limit=None))

    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(url" in plan, plan
    assert "PushedFilters: [In(url" not in streamed._jdf.queryExecution().executedPlan().toString()

    a = sorted((r["url_canon"], bytes(r["html"]) if r["html"] else None) for r in pushed.collect())
    b = sorted((r["url_canon"], bytes(r["html"]) if r["html"] else None) for r in streamed.collect())
    assert a == b
    assert len(a) == 41 and a[-1][1] is None  # miss kept with null html


def test_fetch_pushdown_skipped_above_limit(spark, tmp_path):
    """Rounds larger than the limit must NOT build a giant In filter
    (Or-chain cost grows past the scan cost; >1.5k overflows the JVM
    thread stack) — they keep the streamed-corpus form."""
    pages_path = os.path.join(str(tmp_path), "pages2")
    spark.createDataFrame(
        [(f"https://h/{i}", bytearray(b"<x>")) for i in range(50)],
        "url string, html binary",
    ).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    cand = spark.createDataFrame(
        [(f"https://h/{i}",) for i in range(30)], "url_canon string"
    )
    out = fetch_join(cand, pages, RoundConfig(fetch_pushdown_limit=10))
    assert "PushedFilters: [In(url" not in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 30
