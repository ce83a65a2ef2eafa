"""As-of (temporal) join — match every left row to the most recent
right row at or before its timestamp, per key. The workhorse of
crawl-metadata reconciliation (which robots snapshot / politeness
budget / host reputation was in force when this page was fetched?) and
of feature backfills in training pipelines.

Scale shape: the naive formulation (range join + per-row max) explodes
into an O(n·m) range join. This implementation is the union-scan
trick: tag both sides, sort each key's timeline once, and carry the
latest right-side payload forward with ``last(..., ignorenulls)`` over
an unbounded-preceding window — ONE shuffle on the key, O(n+m) rows,
no range explosion, no skew beyond the key's own timeline. The same
plan shape Flink/kdb temporal joins lower to; DuckDB's native ASOF
JOIN verifies it independently in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_ts: str | None = None,
    how: str = "left",
) -> DataFrame:
    """For each row of ``left``, attach the columns of the latest
    ``right`` row with the same ``on`` key and right timestamp ≤ the
    left timestamp (inclusive — a right row AT the left row's instant
    matches, the standard ASOF convention). Right's value columns come
    back prefixed ``r_``; its timestamp as ``r_{right_ts}``. With
    ``how='inner'``, left rows with no prior right row are dropped;
    ``'left'`` keeps them with nulls.

    Ties: when several right rows share the same (key, timestamp), the
    matched payload is deterministic — the row with the greatest
    ``xxhash64`` of its payload struct wins (arbitrary but stable
    across runs and partitionings; identical payloads tie harmlessly).
    Callers needing a semantic tiebreak should pre-aggregate the right
    side to one row per (key, ts)."""
    rts = right_ts or ts
    rvals = [c for c in right.columns if c not in (on, rts)]
    r = right.select(
        F.col(on),
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(rts).alias(f"r_{rts}"), *[F.col(c).alias(f"r_{c}") for c in rvals]
        ).alias("__r"),
    )
    lcols = left.columns
    l = left.select(  # noqa: E741
        F.col(on),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*lcols).alias("__l"),
    )
    # __side orders a right row BEFORE a left row at the same instant,
    # making the match inclusive. __tb breaks ties among MULTIPLE right
    # rows at the same (key, ts): without it the carried payload would
    # be whichever row the shuffle happened to order last — i.e.
    # nondeterministic across runs/partitionings. xxhash64 of the
    # payload struct is a stable content-derived total order (ties in
    # it mean identical payloads, where the choice is immaterial), so
    # the winner is deterministic: the max-hash payload at that instant.
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType)))
        .withColumn("__tb", F.xxhash64("__r"))
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    out_cols = [F.col("__l")[c].alias(c) for c in lcols]
    out_cols.append(F.col("__m")[f"r_{rts}"].alias(f"r_{rts}"))
    out_cols.extend(F.col("__m")[f"r_{c}"].alias(f"r_{c}") for c in rvals)
    return matched.select(*out_cols)
