"""Token-budget sampling (operators/sampling.py): the distributed
prefix-sum form must equal the single-window oracle exactly, and the
budget cut must be an exact integer prefix."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.sampling import sample_to_token_budget


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 50 + 1) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long").withColumn(
        "ok", F.md5(F.col("doc_id").cast("string"))
    )


def _oracle(docs, budget):
    w = Window.orderBy("ok", "doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        docs.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_tokens", "cum_tokens")
    )


@pytest.mark.parametrize("budget", [1, 500, 3000, 10**9])
def test_matches_single_window_oracle(spark, docs, budget):
    got = sorted(
        sample_to_token_budget(
            docs, "n_tokens", ["ok", "doc_id"], budget, num_partitions=7
        )
        .select("doc_id", "n_tokens", "cum_tokens")
        .collect()
    )
    want = sorted(_oracle(docs, budget).collect())
    assert got == want


def test_exact_prefix_cut(spark, docs):
    out = sample_to_token_budget(
        docs, "n_tokens", ["ok", "doc_id"], 3000, num_partitions=7
    ).collect()
    total = max(r["cum_tokens"] for r in out)
    assert total <= 3000
    # the NEXT doc would overflow: the kept prefix is maximal
    all_sorted = docs.orderBy("ok", "doc_id").collect()
    kept_ids = {r["doc_id"] for r in out}
    nxt = next(r for r in all_sorted if r["doc_id"] not in kept_ids)
    assert total + nxt["n_tokens"] > 3000


def test_zero_budget_empty(spark, docs):
    assert (
        sample_to_token_budget(docs, "n_tokens", ["ok", "doc_id"], 0).count() == 0
    )
