"""Seen-set semantics: exactness with and without the Bloom pre-filter
(reference invariant: ``crawler/discovery.py:277-283`` — never fetch a
URL twice, never drop an unseen URL)."""

from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.seen import (
    anti_join_seen,
    build_bloom,
    with_seen_keys,
)

N_BUCKETS = 16
M_BITS = 1 << 12
K = 5


def _mk(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url_canon string")


def test_exact_anti_join_without_bloom(spark):
    seen = with_seen_keys(_mk(spark, [f"https://h/{i}" for i in range(50)]), n_buckets=N_BUCKETS)
    cands = _mk(spark, [f"https://h/{i}" for i in range(40, 60)])
    out = anti_join_seen(cands, seen, None, n_buckets=N_BUCKETS)
    got = sorted(r.url_canon for r in out.collect())
    assert got == [f"https://h/{i}" for i in range(50, 60)]


def test_bloom_prefilter_is_exact(spark):
    """Bloom FPs must only cost a probe — result identical to exact."""
    seen = with_seen_keys(
        _mk(spark, [f"https://h/{i}" for i in range(500)]), n_buckets=N_BUCKETS
    )
    bloom = build_bloom(seen, M_BITS, K)
    cands = _mk(spark, [f"https://h/{i}" for i in range(450, 700)])
    with_b = anti_join_seen(cands, seen, bloom, n_buckets=N_BUCKETS, m_bits=M_BITS, k=K)
    got = sorted(r.url_canon for r in with_b.collect())
    assert got == sorted(f"https://h/{i}" for i in range(500, 700))


def test_bloom_no_false_negatives(spark):
    """Every seen URL must test bloom-positive (FNs would skip the exact
    check and double-fetch)."""
    seen = with_seen_keys(
        _mk(spark, [f"https://host{i % 7}.example/p/{i}?q={i}" for i in range(1000)]),
        n_buckets=N_BUCKETS,
    )
    bloom = build_bloom(seen, M_BITS, K)
    # re-probe the seen set itself: anti-join must return nothing
    cands = _mk(spark, [f"https://host{i % 7}.example/p/{i}?q={i}" for i in range(1000)])
    out = anti_join_seen(cands, seen, bloom, n_buckets=N_BUCKETS, m_bits=M_BITS, k=K)
    assert out.count() == 0


def test_empty_seen_passes_everything(spark):
    cands = _mk(spark, ["a", "b"])
    assert anti_join_seen(cands, None, None).count() == 2


def test_bucket_assignment_stable(spark):
    df = with_seen_keys(_mk(spark, ["https://h/x"]), n_buckets=N_BUCKETS)
    a = df.collect()[0]
    b = df.collect()[0]
    assert a.bucket == b.bucket and 0 <= a.bucket < N_BUCKETS
    assert a.url_hash64 == b.url_hash64
