"""Crawl-trap detection — frontier hygiene at 10^10-URL scale.

Spider traps (calendar pages, session-id parameter explosions,
self-similar path loops like ``/a/b/a/b/a/b``) generate unbounded URL
spaces under a single host; at a 10^10-URL frontier an undetected trap
can eat a whole politeness budget fetching garbage. The reference has
no defense at all (its BFS follows every ``/calregs/`` link,
`crawler/discovery.py:108-115`); production crawlers gate frontier
admission on per-host URL-shape statistics, which is exactly what this
operator computes.

Per-host signals (all from URL text only — no fetches):

* ``n_urls``, ``n_paths``, ``n_queries`` — URL / distinct-path /
  distinct-nonempty-query counts;
* ``urls_per_path`` — parameter-explosion ratio (thousands of URLs on
  one path = session-id / tracking-param trap);
* ``max_depth`` — deepest path segment count;
* ``max_seg_repeat`` — worst per-URL repeated-path-segment excess
  (``/a/b/a/b/a/b`` has 6 segments, 2 distinct → excess 4): the
  self-similar loop signal.

Flags are simple thresholds; the output feeds the frontier as an
anti-join side (block flagged hosts) or a politeness-budget downweight.

Scale shape: one map-side URL parse (pure JVM regexp + array algebra
fused into the scan) and ONE partial-aggregated shuffle on host —
``approx`` nothing, the distinct counts ride the same hash aggregate.
Hot hosts are fine: the reduce state per host is O(distinct paths),
and the two distinct-aggregations use Spark's standard expand-rewrite
(the skew ceiling is the same as any per-host rollup in this repo).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["url_parts", "crawl_trap_report"]


def url_parts(url: Column) -> tuple[Column, Column, Column]:
    """(host, path, query) of a URL — RE2-portable regexps so the
    DuckDB oracle extracts identical values. The fragment is dropped;
    a missing path comes back '' (treated as '/', depth 0)."""
    u = F.coalesce(url, F.lit(""))
    host = F.regexp_extract(F.lower(u), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    return host, path, query


def crawl_trap_report(
    df: DataFrame,
    url_col: str = "url",
    max_urls_per_path: float = 20.0,
    max_path_depth: int = 12,
    max_segment_repeat: int = 3,
) -> DataFrame:
    """Per-host URL-shape statistics + trap flag (see module doc).

    Output: (host, n_urls, n_paths, n_queries, urls_per_path,
    max_depth, max_seg_repeat, is_trap) — one row per host, all
    integer/6-dp-rounded so the DuckDB oracle reproduces it exactly.
    """
    host, path, query = url_parts(F.col(url_col))
    # path segments: split on '/', drop empties ('' from leading '/')
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    per_url = df.select(
        host.alias("host"),
        path.alias("__path"),
        query.alias("__query"),
        F.size(segs).alias("__depth"),
        (F.size(segs) - F.size(F.array_distinct(segs))).alias("__seg_repeat"),
    )
    agg = per_url.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("__path").cast("long").alias("n_paths"),
        F.countDistinct(
            F.when(F.col("__query") != "", F.col("__query"))
        ).cast("long").alias("n_queries"),
        F.max("__depth").cast("long").alias("max_depth"),
        F.max("__seg_repeat").cast("long").alias("max_seg_repeat"),
    )
    upp = F.round(F.col("n_urls") / F.greatest(F.col("n_paths"), F.lit(1)), 6)
    return agg.select(
        "host",
        "n_urls",
        "n_paths",
        "n_queries",
        upp.alias("urls_per_path"),
        "max_depth",
        "max_seg_repeat",
        (
            (upp >= max_urls_per_path)
            | (F.col("max_depth") >= max_path_depth)
            | (F.col("max_seg_repeat") >= max_segment_repeat)
        ).alias("is_trap"),
    )
