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


# ---------------------------------------------------------- weighted_sample


def _ws_oracle(rows, k, seed="ws1"):
    """Local replay of the exact A-Res draw weighted_sample makes —
    pins the portable-hash + key formula independent of Spark."""
    import hashlib
    import math

    keyed = []
    for doc_id, w in rows:
        if w is None or w <= 0:
            continue
        h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float(1 << 60)
        keyed.append((math.log(u) / w, -doc_id))
    keyed.sort(reverse=True)
    return sorted(-d for _, d in keyed[:k])


def test_weighted_sample_matches_local_replay(spark):
    from ccr_web_crawler_spark.operators.sampling import weighted_sample

    rows = [(i, (i * 13) % 40 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(df, "w", 50, "doc_id").select("doc_id").collect()
    )
    assert got == _ws_oracle(rows, 50)


def test_weighted_sample_huge_weight_always_in(spark):
    rows = [(i, 1) for i in range(200)] + [(999, 10**9)]
    from ccr_web_crawler_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r["doc_id"] for r in weighted_sample(df, "w", 10, "doc_id").collect()}
    assert 999 in got and len(got) == 10


def test_weighted_sample_nonpositive_excluded_k_overflow(spark):
    from ccr_web_crawler_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -2), (4, None), (5, 3)], "doc_id long, w int"
    )
    got = sorted(r["doc_id"] for r in weighted_sample(df, "w", 100, "doc_id").collect())
    assert got == [1, 5]  # zero/negative/null weights never sampled


def test_weighted_sample_deterministic(spark):
    from ccr_web_crawler_spark.operators.sampling import weighted_sample

    rows = [(i, (i % 7) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long").repartition(11)
    a = sorted(r["doc_id"] for r in weighted_sample(df, "w", 40, "doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(df.repartition(3), "w", 40, "doc_id").collect()
    )
    assert a == b


# --------------------------------------------------------- revisit_schedule


def test_revisit_schedule_slots_and_cutoff(spark):
    from ccr_web_crawler_spark.operators.revisit import revisit_schedule

    rows = [(f"u{i}", f"h{i % 3}", i % 10) for i in range(60)]
    df = spark.createDataFrame(rows, "url_canon string, host string, last_round long")
    out = revisit_schedule(df, current_round=12, min_age=5, slots_per_host=4).collect()
    # cutoff: age = 12 - last_round >= 5 → last_round <= 7
    assert all(r["age"] >= 5 for r in out)
    # per-host slot cap and 1-based contiguous slots
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        slots = sorted(r["slot"] for r in rs)
        assert slots == list(range(1, len(rs) + 1)) and len(rs) <= 4
        # oldest-first: slot order == (age desc, url asc)
        ordered = sorted(rs, key=lambda r: (-r["age"], r["url_canon"]))
        assert [r["slot"] for r in ordered] == slots


def test_revisit_schedule_nothing_due(spark):
    from ccr_web_crawler_spark.operators.revisit import revisit_schedule

    df = spark.createDataFrame(
        [("u1", "h1", 10)], "url_canon string, host string, last_round long"
    )
    assert revisit_schedule(df, current_round=12, min_age=5, slots_per_host=4).count() == 0


# --- stratified_sample -------------------------------------------------

from ccr_web_crawler_spark.operators.sampling import stratified_sample  # noqa: E402


@pytest.fixture(scope="module")
def strat_docs(spark):
    # 3 strata with heavy skew: 'en' holds 400 of 460 rows (the hot
    # stratum the salted two-phase exists for)
    rows = [(i, "en" if i < 400 else ("de" if i < 440 else "fr")) for i in range(460)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _strat_oracle(docs, k, seed="strat1"):
    from ccr_web_crawler_spark.functions.textstats import hash64_portable

    h = hash64_portable(F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


@pytest.mark.parametrize("k,n_salts", [(1, 4), (20, 8), (20, 1), (1000, 16)])
def test_stratified_matches_single_window_oracle(spark, strat_docs, k, n_salts):
    got = sorted(
        stratified_sample(
            strat_docs, strata_col="lang", k=k, id_col="doc_id", n_salts=n_salts
        )
        .select("lang", "doc_id", "sample_rank")
        .collect()
    )
    want = sorted(
        _strat_oracle(strat_docs, k).select("lang", "doc_id", "sample_rank").collect()
    )
    assert got == want
    # every stratum fills min(k, stratum size)
    sizes = {r["lang"]: r["n"] for r in
             strat_docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per = {}
    for r in got:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert per == {lang: min(k, n) for lang, n in sizes.items()}


def test_stratified_deterministic_across_layouts(spark, strat_docs):
    a = stratified_sample(strat_docs.repartition(13), "lang", 10, "doc_id")
    b = stratified_sample(strat_docs.coalesce(1), "lang", 10, "doc_id")
    assert sorted(a.collect()) == sorted(b.collect())
