"""Seen-set semantics: exactness with and without the Bloom pre-filter
(reference invariant: ``crawler/discovery.py:277-283`` — never fetch a
URL twice, never drop an unseen URL)."""

from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.seen import (
    anti_join_seen,
    build_bloom,
    merge_blooms,
    updated_bloom,
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


def test_updated_bloom_equals_build_then_merge(spark):
    """The fused per-round maintenance pass (updated_bloom) must be
    bit-identical to the two-pass build_bloom → merge_blooms it
    replaced — including hashes in the top half of the int64 range
    (the Arrow null→float64 rounding hazard updated_bloom's null
    discipline exists to avoid)."""
    old_seen = with_seen_keys(
        _mk(spark, [f"https://h{i % 5}.example/old/{i}" for i in range(300)]),
        n_buckets=N_BUCKETS,
    )
    new_seen = with_seen_keys(
        _mk(spark, [f"https://h{i % 5}.example/new/{i}" for i in range(120)]),
        n_buckets=N_BUCKETS,
    )
    old = build_bloom(old_seen, M_BITS, K)
    want = {
        r.bucket: bytes(r.bits)
        for r in merge_blooms(old, build_bloom(new_seen, M_BITS, K)).collect()
    }
    got = {
        r.bucket: bytes(r.bits)
        for r in updated_bloom(old, new_seen.select("bucket", "url_hash64"), M_BITS, K).collect()
    }
    assert got == want
    # no-old path = plain build
    base = {r.bucket: bytes(r.bits) for r in build_bloom(new_seen, M_BITS, K).collect()}
    got0 = {
        r.bucket: bytes(r.bits)
        for r in updated_bloom(None, new_seen.select("bucket", "url_hash64"), M_BITS, K).collect()
    }
    assert got0 == base


def test_empty_seen_passes_everything(spark):
    cands = _mk(spark, ["a", "b"])
    assert anti_join_seen(cands, None, None).count() == 2


def test_bucket_assignment_stable(spark):
    df = with_seen_keys(_mk(spark, ["https://h/x"]), n_buckets=N_BUCKETS)
    a = df.collect()[0]
    b = df.collect()[0]
    assert a.bucket == b.bucket and 0 <= a.bucket < N_BUCKETS
    assert a.url_hash64 == b.url_hash64
