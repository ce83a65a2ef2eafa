"""Per-host politeness, robots filtering and crawl budgets.

The reference rate-limits with a flat ``await asyncio.sleep(delay)``
before every fetch (``crawler/discovery.py:34,203`` = 1.5s,
``crawler/extraction.py:28,199`` = 1.0s) — at its single host that is
exactly "crawl-delay = delay seconds". Distributed, a global sleep
over-serializes distinct hosts, so the engine instead:

* admits at most ``floor(round_seconds / crawl_delay(host))`` URLs per
  host per round (same per-host rate guarantee, parallel across hosts);
* assigns each admitted row a virtual fetch slot
  ``fetch_ts = round_start + slot * crawl_delay`` and asserts the
  north_star's window-over-host invariant:
  ``fetch_ts - lag(fetch_ts) OVER (PARTITION BY host ORDER BY fetch_ts)
  >= crawl_delay``.

robots.txt has no reference analog (north_rule scale-up): a broadcast
join on host + array-prefix disallow filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.urlnorm import url_path

DEFAULT_CRAWL_DELAY = 1.5  # reference discovery delay (crawler/discovery.py:34)


def apply_robots(frontier: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop frontier rows disallowed by robots; attach ``crawl_delay``.

    ``robots(host, disallow_prefixes array<string>, crawl_delay double)``
    is a small per-host dim — broadcast. Unlisted hosts are allowed with
    the default delay (the reference crawls with only a UA string,
    ``crawler/discovery.py:37``).
    """
    if robots is None:
        return frontier.withColumn("crawl_delay", F.lit(DEFAULT_CRAWL_DELAY))
    joined = frontier.join(F.broadcast(robots), "host", "left")
    path = url_path(F.col("url_canon"))
    disallowed = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    return (
        joined.filter(~disallowed)
        .withColumn("crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY)))
        .drop("disallow_prefixes")
    )


def admit_per_host(
    frontier: DataFrame,
    round_seconds: float | None,
    order_cols: tuple[str, ...] = ("depth", "seq"),
    n_salts: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (admitted, deferred) by per-host budget.

    Budget = floor(round_seconds / crawl_delay) per host; ``None`` admits
    everything (level-synchronous BFS — the equivalence-test shape).
    Priority within a host is BFS order (reference pop order,
    ``crawler/discovery.py:279``).

    Hot-host skew (north_rule salting clause): a naive
    ``row_number() OVER (PARTITION BY host)`` sorts a hot host's entire
    frontier slice in ONE task — with one host holding 50% of a 10^10-row
    frontier that task never finishes. Only the first ``budget`` rows per
    host can ever be admitted, so admission runs in two levels:

    1. salt every row by ``pmod(xxhash64(url_canon), n_salts)`` and rank
       within ``(host, salt)`` — n_salts parallel windows per host, each
       ~1/n_salts of the host's rows; rows ranked past the budget in
       their own salt cannot be in the host's overall top-budget →
       deferred immediately;
    2. a second ``row_number`` over the survivors (≤ n_salts·budget per
       host — tiny) picks the exact per-host top-budget.

    Semantics are EXACTLY the single-window form: a row in the host's
    global top-budget is necessarily in its salt's top-budget, so level 1
    never drops an admit.
    """
    if round_seconds is None:
        return frontier, frontier.limit(0)
    return split_top_k_per_host(
        frontier, host_budget(round_seconds), order_cols, n_salts
    )


def host_budget(round_seconds: float):
    """Per-host admission budget for one round: how many fetches fit in
    ``round_seconds`` at the row's ``crawl_delay`` (always >= 1 so no
    host starves). THE one budget definition — admission here and the
    backlog refill's shortfall test (plans/round.py) must agree, or a
    host could refill to fewer rows than admission would take."""
    return F.greatest(
        F.lit(1), F.floor(F.lit(round_seconds) / F.col("crawl_delay"))
    )


def split_top_k_per_host(
    frontier: DataFrame,
    k,
    order_cols: tuple[str, ...] = ("depth", "seq"),
    n_salts: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """(top-k rows per host by ``order_cols``, the rest) via the salted
    two-level window described in ``admit_per_host`` — no host's full
    slice ever sorts in one task. ``k`` is an int or a Column (may
    reference the row's own columns, e.g. a per-host budget)."""
    k = F.lit(k) if isinstance(k, int) else k
    order = [F.col(c) for c in order_cols]
    salt = (
        F.pmod(F.xxhash64(F.col("url_canon")), F.lit(n_salts))
        if "url_canon" in frontier.columns
        else F.pmod(F.xxhash64(*order), F.lit(n_salts))
    )
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    pre = frontier.withColumn("__salt", salt).withColumn(
        "__rk1", F.row_number().over(w1)
    )
    survivors = pre.filter(F.col("__rk1") <= k)
    rest1 = pre.filter(F.col("__rk1") > k).drop("__salt", "__rk1")
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = survivors.withColumn("__rk", F.row_number().over(w2))
    top = ranked.filter(F.col("__rk") <= k).drop("__salt", "__rk1", "__rk")
    rest2 = ranked.filter(F.col("__rk") > k).drop("__salt", "__rk1", "__rk")
    return top, rest2.unionByName(rest1)


def assign_fetch_slots(admitted: DataFrame, round_start: float = 0.0) -> DataFrame:
    """Virtual per-host fetch schedule honoring crawl_delay."""
    w = Window.partitionBy("host").orderBy("depth", "seq")
    slot = F.row_number().over(w) - F.lit(1)
    return admitted.withColumn(
        "fetch_ts", F.lit(round_start) + slot * F.col("crawl_delay")
    )


def politeness_violations(scheduled: DataFrame) -> DataFrame:
    """Rows violating the lag-window invariant (must be empty).

    north_star: "crawl-delay enforced via window-over-host lag".
    """
    w = Window.partitionBy("host").orderBy("fetch_ts")
    prev = F.lag("fetch_ts").over(w)
    return scheduled.withColumn("__prev", prev).filter(
        F.col("__prev").isNotNull()
        & (F.col("fetch_ts") - F.col("__prev") < F.col("crawl_delay"))
    )
