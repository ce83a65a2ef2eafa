"""Per-host politeness budget + robots + lag-window invariant."""

from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.politeness import (
    admit_per_host,
    apply_robots,
    assign_fetch_slots,
    politeness_violations,
)

FRONTIER = "url_canon string, host string, depth int, seq long"


def _frontier(spark, n_per_host=10, hosts=("a.example", "b.example")):
    rows = [
        (f"https://{h}/calregs/Browse/N{i}", h, 1, i + j * 1000)
        for j, h in enumerate(hosts)
        for i in range(n_per_host)
    ]
    return spark.createDataFrame(rows, FRONTIER)


def test_admit_respects_per_host_budget(spark):
    f = _frontier(spark).withColumn("crawl_delay", F.lit(2.0))
    admitted, deferred = admit_per_host(f, round_seconds=10.0)  # budget 5/host
    per_host = {r.host: r.cnt for r in admitted.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    assert per_host == {"a.example": 5, "b.example": 5}
    assert deferred.count() == 10
    # BFS priority: lowest seq admitted first
    a_seqs = sorted(r.seq for r in admitted.filter(F.col("host") == "a.example").collect())
    assert a_seqs == [0, 1, 2, 3, 4]


def test_admit_none_admits_all(spark):
    f = _frontier(spark).withColumn("crawl_delay", F.lit(1.0))
    admitted, deferred = admit_per_host(f, None)
    assert admitted.count() == 20 and deferred.count() == 0


def test_robots_disallow_and_delay(spark):
    f = _frontier(spark, 4)
    robots = spark.createDataFrame(
        [("a.example", ["/calregs/Browse/N1"], 2.5)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    out = apply_robots(f, robots)
    urls = {r.url_canon for r in out.collect()}
    assert "https://a.example/calregs/Browse/N1" not in urls
    assert len(urls) == 7
    delays = {r.host: r.crawl_delay for r in out.select("host", "crawl_delay").distinct().collect()}
    assert delays == {"a.example": 2.5, "b.example": 1.5}  # default 1.5 = ref delay


def test_fetch_slots_satisfy_lag_invariant(spark):
    f = _frontier(spark, 20).withColumn("crawl_delay", F.lit(1.5))
    scheduled = assign_fetch_slots(f, round_start=100.0)
    assert politeness_violations(scheduled).count() == 0
    # two hosts proceed in parallel: same fetch_ts allowed across hosts
    t0 = scheduled.filter(F.col("fetch_ts") == 100.0).count()
    assert t0 == 2


def test_violation_detected(spark):
    rows = [("u1", "h", 0.0, 1.5), ("u2", "h", 1.0, 1.5)]  # gap 1.0 < 1.5
    df = spark.createDataFrame(rows, "url_canon string, host string, fetch_ts double, crawl_delay double")
    assert politeness_violations(df).count() == 1
