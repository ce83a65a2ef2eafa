"""Deterministic token-budget sampling — distributed prefix sum.

A training-data pipeline rarely trains on the whole corpus: it draws a
deterministic sample that fills an exact token budget ("give me the
first 50B tokens in shuffle-hash order"). The naive form is a global
window cumsum (single-partition — serializes the corpus through one
task); the scalable form is the same two-phase shape as
``operators/ids.assign_global_seq``:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the (portable,
   deterministic) order key — partitions globally range-ordered.
2. Per-partition token SUMS (one tiny agg: a row per partition) →
   prefix offsets on the driver.
3. Partitions whose offset already exceeds the budget are pruned
   outright — at a 100 TB corpus with a 1% budget, 99% of partitions
   never run phase 3.
4. ``mapInPandas`` adds offset + within-partition running sum and cuts
   at the budget.

All arithmetic is integer — the cut is exact and engine-portable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_to_token_budget(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    budget: int,
    cum_col: str = "cum_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Keep the prefix of ``df`` (ordered by ``order_cols``) whose
    running ``token_col`` total stays ≤ ``budget``; adds ``cum_col``
    (the running total INCLUDING the row). ``order_cols`` must be a
    duplicate-free total order or the prefix is nondeterministic."""
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *order_cols)
    else:
        ranged = df.repartitionByRange(*order_cols)
    ranged = ranged.sortWithinPartitions(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # eager checkpoint: pin the physical layout so the offsets computed
    # below cannot disagree with the partitions mapInPandas sees under
    # AQE re-planning (same reasoning as assign_global_seq).
    ranged = ranged.localCheckpoint(eager=True)
    sums = {
        r["__pid"]: r["tok"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(token_col).alias("tok"))
        .collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(sums):
        offsets[pid] = running
        running += int(sums[pid])
    # budget partition pruning: only partitions that start inside the
    # budget can contribute rows
    live = [pid for pid, off in offsets.items() if off < budget]
    pruned = ranged.filter(F.col("__pid").isin(live) if live else F.lit(False))

    schema = ranged.drop("__pid").schema.add(cum_col, "long")
    out_cols = [f.name for f in schema.fields]

    def _cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if local < 0:
                local = offsets[int(pdf["__pid"].iloc[0])]
            cum = pdf[token_col].astype("int64").cumsum() + local
            local = int(cum.iloc[-1])
            pdf = pdf.drop(columns=["__pid"])
            pdf[cum_col] = cum.to_numpy()
            keep = pdf[pdf[cum_col] <= budget]
            if len(keep):
                yield keep[out_cols]

    return pruned.mapInPandas(_cut, schema=schema)
