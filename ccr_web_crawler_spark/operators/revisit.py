"""Recrawl (freshness) scheduling — pick which already-seen URLs are
due for a revisit and rank them into per-host fetch slots.

The reference crawls each URL exactly once (``crawler/discovery.py``
marks visited and never returns); any production crawl over a living
web needs the complementary operator: a deterministic, politeness-
bounded revisit schedule. Semantics here are the subset every
incremental crawler agrees on:

* a url is DUE when ``current_round - last_round >= min_age`` (age in
  rounds since its last fetch);
* due urls compete per host for ``slots_per_host`` revisit slots
  (politeness: a refresh sweep must not hammer one host), oldest
  first — ties broken by url for a total order.

Scale shape: one filter (fused into the scan) + one window partitioned
by host — the same single-shuffle shape as the admission window
(operators/politeness.admit_per_host); slots_per_host bounds the output
per key, so a hot host costs sort-of-its-rows, never a cross-host
skew. Fully SQL-expressible, so the driver oracle checks it end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def revisit_schedule(
    seen: DataFrame,
    current_round: int,
    min_age: int,
    slots_per_host: int,
    url_col: str = "url_canon",
    host_col: str = "host",
    last_round_col: str = "last_round",
) -> DataFrame:
    """→ (host, url_canon, age, slot): the per-host oldest ``slots_per_host``
    urls whose age ≥ ``min_age``, slot = 1-based rank within host."""
    age = (F.lit(current_round) - F.col(last_round_col)).alias("age")
    due = seen.select(F.col(host_col).alias("host"), F.col(url_col).alias("url_canon"), age).filter(
        F.col("age") >= min_age
    )
    w = Window.partitionBy("host").orderBy(F.col("age").desc(), F.col("url_canon"))
    return (
        due.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= slots_per_host)
        .select("host", "url_canon", "age", "slot")
    )
