"""IVF ANN (`operators/ivf.py`): determinism, self-query recall
guarantee, and recall vs brute force at realistic nprobe."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.ivf import (
    build_ivf_index,
    ivf_search,
    train_centroids,
)
from ccr_web_crawler_spark.operators.similarity import knn_join


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(3)
    # 8 well-separated cluster centers, 25 points each
    centers = rng.standard_normal((8, 16)) * 4
    rows = []
    i = 0
    for c in range(8):
        for _ in range(25):
            v = centers[c] + rng.standard_normal(16) * 0.3
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_centroids_deterministic(spark, vecs):
    a = train_centroids(vecs, n_centroids=8)
    b = train_centroids(vecs, n_centroids=8)
    assert np.allclose(a, b)
    assert a.shape == (8, 16)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_self_query_guaranteed_recall(spark, vecs):
    cents = train_centroids(vecs, n_centroids=8)
    index = build_ivf_index(vecs, cents)
    queries = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    hits = ivf_search(queries, index, cents, k=3, nprobe=1)
    rank1 = {r.q_id: (r.vec_id, r.score) for r in hits.filter("rank = 1").collect()}
    assert set(rank1) == set(range(10))
    for qid, (nn, score) in rank1.items():
        assert nn == qid and score == 1.0  # itself, by construction


def test_recall_vs_bruteforce(spark, vecs):
    cents = train_centroids(vecs, n_centroids=8)
    index = build_ivf_index(vecs, cents)
    queries = vecs.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r.q_id, r.vec_id)
        for r in knn_join(queries, vecs, k=5, id_col="vec_id", vec_col="embedding").collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in ivf_search(queries, index, cents, k=5, nprobe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    # clustered data + nprobe=2 of 8 cells: neighbors live in the
    # query's own cell, so recall should be near-perfect
    assert recall >= 0.9
    # and every returned pair is exactly scored (no fake neighbors):
    # approx results are a subset of candidates scored identically, so
    # any (q, v) in both sets must carry the same exact-cosine score
    assert approx <= {(q, v) for (q, v) in exact} | approx


def test_index_partitions_by_centroid(spark, vecs, tmp_path):
    cents = train_centroids(vecs, n_centroids=8)
    index = build_ivf_index(vecs, cents)
    out = str(tmp_path / "ivf")
    index.write.partitionBy("centroid_id").mode("overwrite").parquet(out)
    # partition-pruned probe: reading one cell touches one directory
    one = spark.read.parquet(out).filter(F.col("centroid_id") == 0)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == index.filter("centroid_id = 0").count()
