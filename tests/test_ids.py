"""Global sequence assignment (operators/ids.py)."""

from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.ids import assign_global_seq


def test_assign_global_seq_matches_sort_order(spark):
    rows = [(d, p, i) for d in range(3) for p in range(5) for i in range(7)]
    # shuffle input order deterministically
    rows = rows[::-1]
    df = spark.createDataFrame(rows, "depth int, parent_seq int, link_pos int")
    out = assign_global_seq(df, ["depth", "parent_seq", "link_pos"], "seq", offset=10)
    got = [tuple(r) for r in out.orderBy("seq").collect()]
    expected_keys = sorted(rows)
    assert [g[:3] for g in got] == expected_keys
    assert [g[3] for g in got] == list(range(10, 10 + len(rows)))


def test_assign_global_seq_empty(spark):
    df = spark.createDataFrame([], "a int")
    out = assign_global_seq(df, ["a"], "seq")
    assert out.count() == 0


def test_seq_unique_across_partitions(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = assign_global_seq(df.repartition(7), ["k"], "seq")
    assert out.select("seq").distinct().count() == 1000
    assert out.agg(F.min("seq"), F.max("seq")).collect()[0][:] == (0, 999)
