"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for ANN next to ``operators/similarity.lsh_ann``
(reference retrieval is a remote cosine top-k, ``agent/retrieve.py:30-34``;
at 10^10 vectors a serving index partitions the corpus by coarse
centroid — IVF — so a query touches only ``nprobe``/``n_centroids`` of
the data).

Spark shape:
* centroids are trained ONCE with deterministic seeded sampling + a few
  Lloyd iterations, all in DataFrame algebra (assignment via a
  numpy-vectorized pandas UDF: one (batch x dim) @ (dim x k) matmul per
  Arrow batch — never per-row python);
* the index is just the corpus with a ``centroid_id`` column — written
  out partitioned by it, searches become partition-pruned scans;
* search assigns each query its ``nprobe`` nearest centroids, explodes,
  joins on ``centroid_id`` (queries broadcast — the corpus never
  shuffles), exact cosine re-rank inside probed cells only.

Recall: a query identical to a corpus vector shares its centroid by
construction, so self-queries have guaranteed recall at any nprobe >= 1
(the oracle-checkable invariant; general recall is pinned in
tests/test_ivf.py against brute force).
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


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_centroids(
    items: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
    seed: int = 11,
    sample_cap: int = 4096,
) -> np.ndarray:
    """Deterministic (seed, data)-pure centroid training: seed centroids
    from a hash-ordered sample (no RNG on executors), then
    ``lloyd_iters`` k-means steps over the SAMPLE (driver-side numpy on
    <= ``sample_cap`` rows — training reads the corpus once for the
    sample; assignment of the full corpus stays distributed in
    :func:`assign_centroids`). Cosine metric → centroids live on the
    unit sphere."""
    ordered = items.select(vec_col).withColumn(
        "__h", F.xxhash64(F.col(vec_col).cast("array<double>").cast("string"), F.lit(seed))
    )
    sample = [r[0] for r in ordered.orderBy("__h").limit(sample_cap).collect()]
    if not sample:
        raise ValueError("train_centroids: input corpus is empty — nothing to train on")
    # fewer sample rows than requested centroids → train what the data
    # supports instead of silently padding or crashing downstream
    n_centroids = min(n_centroids, len(sample))
    m = _normalize(np.asarray(sample, dtype=np.float64))
    cents = m[:n_centroids].copy()
    for _ in range(lloyd_iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def make_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """vec → array of the ``nprobe`` nearest centroid ids (cosine).
    One matmul per Arrow batch; centroids ride the closure (k x d —
    tiny, an implicit broadcast)."""
    cents = _normalize(np.asarray(centroids, dtype=np.float64))

    @pandas_udf(ArrayType(IntegerType()))
    def _assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in batches:
            if len(vecs) == 0:
                yield pd.Series([], dtype=object)
                continue
            m = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in vecs]))
            sims = m @ cents.T  # (n, k)
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            yield pd.Series([row.astype(np.int32) for row in top])

    return _assign


def build_ivf_index(
    items: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus + ``centroid_id`` (its single nearest centroid). Persist
    with ``.write.partitionBy("centroid_id")`` and probe scans become
    partition-pruned file reads."""
    assign = make_assign_udf(centroids, nprobe=1)
    return items.withColumn(
        "centroid_id", assign(F.col(vec_col).cast("array<double>"))[0]
    )


def ivf_search(
    queries: DataFrame,
    index: DataFrame,
    centroids: np.ndarray,
    k: int = 8,
    nprobe: int = 2,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query: exact cosine top-k within its ``nprobe`` nearest
    cells. Queries (small side) broadcast; the corpus is touched only in
    the probed cells and never shuffles."""
    from pyspark.sql import Window

    assign = make_assign_udf(centroids, nprobe=nprobe)
    q = queries.withColumn(
        "centroid_id", F.explode(assign(F.col(q_vec).cast("array<double>")))
    )
    cand = index.join(F.broadcast(q), "centroid_id")
    scored = cand.select(
        F.col(q_id),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(q_vec)), 4).alias("score"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
