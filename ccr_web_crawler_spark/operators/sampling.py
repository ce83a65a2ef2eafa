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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    seed: str = "strat1",
    n_salts: int = 16,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic stratified sampling: keep ``k`` rows per stratum
    (language, domain, quality bin — the corpus-mixing primitive every
    LLM data recipe needs), chosen uniformly-by-hash and reproducibly.
    Rows rank within their stratum by the portable 60-bit md5 hash of
    (seed, id) — tie-broken on ``id_col`` for a total order — and rank
    ≤ k survive; ``rank_col`` carries the rank (long).

    Scale shape — skew-proof two-phase top-k: the naive
    ``row_number() over (partition by stratum)`` funnels a hot stratum
    through ONE task (at 100 TB a majority-language stratum is most of
    the corpus). Phase 1 ranks within (stratum, salt) where
    salt = hash % n_salts — every window partition holds ~1/n_salts of
    its stratum — and keeps ≤ k candidates per salt; phase 2 re-ranks
    the ≤ k·n_salts survivors per stratum. Exact, not approximate: the
    per-stratum top-k by hash order is contained in the union of the
    per-salt top-ks (each salt group's members rank no better globally
    than within their salt). Both windows are bounded: phase 1 by the
    salt fan-out, phase 2 by k·n_salts rows per stratum."""
    from ccr_web_crawler_spark.functions.textstats import hash64_portable

    from pyspark.sql.window import Window

    h = hash64_portable(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    tagged = df.withColumn("__h", h).withColumn(
        "__salt", (F.col("__h") % n_salts).cast("int")
    )
    w1 = Window.partitionBy(strata_col, "__salt").orderBy("__h", id_col)
    cand = (
        tagged.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1")
    )
    w2 = Window.partitionBy(strata_col).orderBy("__h", id_col)
    return (
        cand.withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .filter(F.col(rank_col) <= k)
        .drop("__h", "__salt")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    seed: str = "ws1",
    key_col: str = "ws_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-Res): every row draws priority ``ln(u)/w`` with
    ``u ∈ (0,1]`` uniform and the global top-k priorities win —
    inclusion probability is proportional-to-weight without
    replacement. The training-data use: sample a corpus slice biased
    toward high quality-score docs, reproducibly (DSIR-style importance
    resampling reduces to exactly this with w = importance weight).

    Determinism/portability: ``u`` derives from the 60-bit portable
    md5 hash of (seed, id) — the same expression DuckDB evaluates
    bit-identically (functions/textstats.hash64_portable), so the
    oracle replays the draw; ties (hash collisions) break on ``id_col``
    for a total order.

    Scale shape: priorities are one map-side JVM expression; the
    global top-k is ``orderBy(...).limit(k)``, which Spark executes as
    TakeOrdered — per-partition heaps of size k + a k-row driver merge,
    never a full sort/shuffle of the corpus. Rows with ``w <= 0`` or
    null are excluded (zero weight = never sampled)."""
    from ccr_web_crawler_spark.functions.textstats import hash64_portable

    w = F.col(weight_col).cast("double")
    h = hash64_portable(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    # h ∈ [0, 2^60): map to (0,1] — +1 keeps u strictly positive so
    # ln(u) is finite; ln(u) ≤ 0 and /w preserves order within ties
    u = (h + F.lit(1).cast("double")) / F.lit(float(1 << 60))
    key = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), F.col(id_col))
        .limit(k)
    )
