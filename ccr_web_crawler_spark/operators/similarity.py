"""Similarity search over embedding columns.

The reference's retrieval path is a remote Pinecone cosine top-k
(``agent/retrieve.py:15-45``, index built ``indexer/ingest.py:22-34``:
384-d, metric=cosine, k=8). Re-expressed Spark-native:

* ``cosine_topk`` — brute-force scan + TakeOrdered (``orderBy+limit``
  compiles to a per-partition top-k + driver merge: no global sort
  shuffle — the right baseline even at scale when k is small);
* ``knn_join`` — batch of queries vs corpus via broadcast + per-query
  window rank;
* ``lsh_ann`` — random-hyperplane LSH: deterministic signature planes,
  multi-band bucket join, re-rank only within candidate buckets — the
  10^10-row scale path (candidates ≪ corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from ccr_web_crawler_spark.functions.embed import cosine


def cosine_topk(
    items: DataFrame, query_vec: list[float], k: int = 8, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine against one literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = items.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame, items: DataFrame, k: int = 8,
    q_id: str = "q_id", q_vec: str = "q_vec",
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """For each query row: its k nearest items (broadcast the queries —
    the small side — so the corpus never shuffles)."""
    from pyspark.sql import Window

    joined = items.crossJoin(F.broadcast(queries)).select(
        F.col(q_id),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(q_vec)), 4).alias("score"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)  # deterministic, version-stable
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def make_signature_udf(dim: int | None = None, n_bits: int = 16, n_bands: int = 4, seed: int = 7):
    """vec → array<int> of band signatures (random hyperplane sign bits,
    split into bands; same-band match → candidate). ``dim`` is inferred
    from the first vector when None (planes are a pure function of
    (seed, n_bits, dim) → identical on every executor)."""
    assert n_bits % n_bands == 0
    bits_per_band = n_bits // n_bands

    weights = (1 << np.arange(bits_per_band)).astype(np.int64)

    @pandas_udf(ArrayType(IntegerType()))
    def _sig(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        planes = None
        for vecs in batches:
            if len(vecs) == 0:
                continue
            m = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
            if planes is None:
                planes = _planes(dim or m.shape[1], n_bits, seed)
            bits = ((m @ planes.T) > 0).astype(np.int64)  # (n, n_bits)
            bands = bits.reshape(len(m), n_bands, bits_per_band) @ weights
            # band id in high bits so different bands never collide
            sigs = bands + (np.arange(n_bands, dtype=np.int64) << 20)[None, :]
            yield pd.Series(list(sigs.astype(np.int32)))

    return _sig


def lsh_ann(
    queries: DataFrame, items: DataFrame, k: int = 8,
    q_id: str = "q_id", q_vec: str = "q_vec",
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 384, n_bits: int = 16, n_bands: int = 4, seed: int = 7,
) -> DataFrame:
    """Approximate k-NN: bucket-join on any shared LSH band, then exact
    cosine re-rank within candidates only."""
    from pyspark.sql import Window

    sig = make_signature_udf(dim, n_bits, n_bands, seed)
    items_b = items.withColumn("band", F.explode(sig(F.col(vec_col))))
    queries_b = queries.withColumn("band", F.explode(sig(F.col(q_vec))))
    cands = items_b.join(F.broadcast(queries_b), "band").dropDuplicates([q_id, id_col])
    scored = cands.select(
        F.col(q_id),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(q_vec)), 4).alias("score"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
