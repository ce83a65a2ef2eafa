"""Training-example preparation: per-document context chunking and
cross-document sequence packing.

The last mile of a web-corpus → LLM pipeline turns variable-length
documents into fixed-length training examples. Two standard shapes:

* **Per-document chunking** (eval/RAG context prep): slide a
  ``win``-token window with ``stride`` over each document — every chunk
  comes from one document, overlap allowed. Reference analogue: the
  indexer chops extracted sections into retrieval units
  (reference `indexer/ingest.py:60-78` builds one embedding row per
  section); this generalizes that to token windows.
* **Sequence packing** (GPT-2/3-style "concat and chunk",
  arXiv:2005.14165 §2.1): concatenate the whole corpus in a
  deterministic order and chop it into exact ``seq_len``-token
  sequences; documents cross sequence boundaries, no padding waste.

Both are deterministic and engine-portable (whitespace tokens over the
corpus-standard normalization), so a DuckDB oracle can replay them
byte-for-byte.

Scale shapes:

* ``chunk_documents`` is a pure JVM map — higher-order functions over
  the token array, fused into the scan stage; zero shuffles.
* ``pack_sequences`` needs a GLOBAL token offset per document — the
  same distributed prefix sum as ``operators/sampling`` (range
  repartition → per-partition sums → driver offsets → per-partition
  window cumsum), never a single-partition global window. Each doc
  then explodes into the 1 + ⌊n/seq_len⌋-ish sequence segments it
  overlaps (bounded fan-out), and one shuffle on ``seq_id`` reassembles
  sequences. Per-sequence state is bounded by ``seq_len`` tokens, so no
  task ever holds more than one training sequence of text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["normalized_tokens", "chunk_documents", "pack_sequences"]


def normalized_tokens(text: Column) -> Column:
    """Whitespace tokens of the corpus-standard normalization (lower,
    collapse whitespace, trim) — [] for null/empty text. Identical
    algebra to the DuckDB oracle's ``str_split(lower(trim(...)), ' ')``."""
    tt = F.lower(F.trim(F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " ")))
    return F.when(F.length(tt) == 0, F.array().cast("array<string>")).otherwise(
        F.split(tt, " ")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    win: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window token chunks per document: starts at token
    1, 1+stride, 2·stride+1, … up to the FIRST start whose window
    reaches the document end — i.e. 1 + ceil(max(0, n−win)/stride)
    chunks, so every token is covered even when the stride doesn't land
    on n−win+1 exactly (the tail chunk may be shorter than ``win``).
    ``stride < win`` gives overlap (RAG-style context units).
    Output: (id, chunk_idx, start_tok, n_tokens, chunk).

    Scale shape: one ``transform`` over ``sequence`` per row — pure JVM
    expression fused into the scan; the fan-out is ≤ n_tokens/stride
    rows per doc and no shuffle happens at all. The token array is
    bound once as a lambda-free column reference (chunks slice the SAME
    array value, not a re-evaluated expression).
    """
    if win <= 0 or stride <= 0:
        raise ValueError("win and stride must be positive")
    # bind the token array ONCE as a projected column before any lambda
    # slices it — an unbound composite inside transform() is re-evaluated
    # per element (the O(n²) trap operators/curation.cdc_chunks documents)
    bound = (
        df.select(
            F.col(id_col), normalized_tokens(F.col(text_col)).alias("__toks")
        )
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
    )
    n = F.col("__n")
    # last start = 1 + ceil(max(0, n-win)/stride)·stride — the first
    # start whose window reaches the end; docs ≤ win get exactly start=1
    # (floor over double is exact here: token counts are far below 2^52)
    last = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - F.lit(win), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        )
        * F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), last, F.lit(stride)),
        lambda s, i: F.struct(
            i.alias("idx"),
            s.alias("start"),
            F.least(F.lit(win), n - s + 1).alias("len"),
            F.array_join(F.slice(F.col("__toks"), s, F.lit(win)), " ").alias("txt"),
        ),
    )
    return (
        bound.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            F.col(id_col),
            F.col("c.idx").alias("chunk_idx"),
            F.col("c.start").alias("start_tok"),
            F.col("c.len").cast("long").alias("n_tokens"),
            F.col("c.txt").alias("chunk"),
        )
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 128,
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style sequence packing: concatenate all documents' tokens in
    ``id_col`` order and cut into consecutive ``seq_len``-token
    sequences. Returns one row per sequence: (seq_id, n_docs, n_tokens,
    doc_ids, text) — every sequence holds exactly ``seq_len`` tokens
    except the last, documents span boundaries, nothing is padded or
    dropped. ``doc_ids`` is the comma-joined contributor list in order.

    Scale shape (three bounded stages, no global window):
      1. distributed prefix sum for each doc's global token offset —
         range-repartition on ``id_col``, per-partition token sums
         (one row per partition to the driver), exclusive offsets back
         via a broadcast join, within-partition cumsum as a
         per-partition window (parallel; partition-bounded);
      2. each doc explodes into the sequences it overlaps —
         fan-out 1 + ⌊(n-1)/seq_len⌋ segments, each segment a
         ``slice`` of the already-materialized token array;
      3. one shuffle on ``seq_id``; ``sort_array(collect_list(...))``
         reassembles each sequence from its ≤ seq_len tokens of pieces.
    The layout is pinned with an eager localCheckpoint before the
    per-partition sums are collected, so the offsets cannot disagree
    with the partitions the window sees under AQE re-planning (same
    invariant as operators/sampling.sample_to_token_budget; bounded:
    one (id, n_tok, tokens) projection of the corpus).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    toks = normalized_tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("__id"), toks.alias("__toks")
    ).filter(F.size(F.col("__toks")) > 0)
    ranged = (
        base.repartitionByRange(num_partitions, "__id")
        if num_partitions
        else base.repartitionByRange("__id")
    )
    ranged = (
        ranged.sortWithinPartitions("__id")
        .withColumn("__n", F.size("__toks").cast("long"))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = {
        r["__pid"]: int(r["tok"])
        for r in ranged.groupBy("__pid").agg(F.sum("__n").alias("tok")).collect()
    }
    offsets, running = [], 0
    for pid in sorted(sums):
        offsets.append((pid, running))
        running += sums[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __poff long")
    w = Window.partitionBy("__pid").orderBy("__id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    placed = (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn("__off", F.col("__poff") + F.coalesce(F.sum("__n").over(w), F.lit(0)))
        .drop("__pid", "__poff")
    )
    # stage 2: the sequences this doc overlaps: floor(off/L) ..
    # floor((off+n-1)/L); per sequence, the doc contributes tokens
    # [max(b·L, off), min((b+1)·L, off+n)) — slice indices are relative
    # to the doc's own token array (1-based)
    L = F.lit(int(seq_len)).cast("long")
    b0 = F.floor(F.col("__off") / L)
    b1 = F.floor((F.col("__off") + F.col("__n") - 1) / L)
    seg = placed.select(
        "__id",
        "__toks",
        "__off",
        "__n",
        F.explode(F.sequence(b0, b1)).alias("seq_id"),
    ).select(
        "__id",
        F.col("seq_id"),
        F.greatest(F.col("seq_id") * L, F.col("__off")).alias("__s"),
        F.least((F.col("seq_id") + 1) * L, F.col("__off") + F.col("__n")).alias("__e"),
        F.col("__toks"),
        F.col("__off"),
    )
    piece = seg.select(
        "seq_id",
        F.struct(
            F.col("__s").alias("s"),
            F.col("__id").alias("id"),
            (F.col("__e") - F.col("__s")).alias("len"),
            F.array_join(
                F.slice(
                    F.col("__toks"),
                    (F.col("__s") - F.col("__off") + 1).cast("int"),
                    (F.col("__e") - F.col("__s")).cast("int"),
                ),
                " ",
            ).alias("txt"),
        ).alias("p"),
    )
    assembled = (
        piece.groupBy("seq_id")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
        .select(
            "seq_id",
            F.size("ps").cast("long").alias("n_docs"),
            F.aggregate(
                "ps", F.lit(0).cast("long"), lambda acc, x: acc + x["len"]
            ).alias("n_tokens"),
            F.array_join(
                F.transform("ps", lambda x: x["id"].cast("string")), ","
            ).alias("doc_ids"),
            F.array_join(F.transform("ps", lambda x: x["txt"]), " ").alias("text"),
        )
    )
    return assembled
