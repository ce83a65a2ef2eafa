"""Deterministic, scalable global sequence assignment.

The reference's crawl ordering is insertion order into a single deque
(``crawler/discovery.py:243,279``). Reproducing it distributed needs a
total order WITHOUT a single-partition window (which would serialize a
10^10-row frontier through one task). Standard two-phase id assignment:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order key —
   partitions are globally range-ordered, rows ordered within.
2. Count rows per partition (tiny driver collect, one row per
   partition), prefix-sum to per-partition offsets.
3. ``mapInPandas`` adds offset + running index within each partition.

Cost: one range shuffle + one count job — same shape Spark uses for
``zipWithIndex``; no skew (range partitioner balances), no 1-partition
bottleneck.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_global_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``seq_col`` = ``offset + rank`` by ``order_cols`` (dense,
    0-based rank; ``order_cols`` must be duplicate-free row keys)."""
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *order_cols)
    else:
        ranged = df.repartitionByRange(*order_cols)
    ranged = ranged.sortWithinPartitions(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # eager checkpoint: under AQE a lazy checkpoint can re-plan per
    # action, so the counted offsets could disagree with the partitions
    # mapInPandas later sees — pin the physical layout NOW.
    ranged = ranged.localCheckpoint(eager=True)
    counts = {r["__pid"]: r["cnt"] for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    running = offset
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]

    schema = ranged.drop("__pid").schema.add(seq_col, "long")
    out_cols = [f.name for f in schema.fields]

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if local < 0:
                local = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=["__pid"])
            pdf[seq_col] = range(local, local + len(pdf))
            local += len(pdf)
            yield pdf[out_cols]

    return ranged.mapInPandas(_assign, schema=schema)
