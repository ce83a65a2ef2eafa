"""Partitioned URL-seen set with per-bucket Bloom pre-filter.

Semantics contract (reference ``crawler/discovery.py:277-283``): the
seen-set is EXACT — a URL is fetched iff it has never been fetched.
The Bloom filter is only a pre-filter (north_rule "bloom/cuckoo
URL-seen" at 10^10 scale):

* Bloom-NEGATIVE candidates are *definitely new* — they skip the
  expensive exact anti-join entirely (the common case on a growing
  frontier, and the whole point at 10^10 URLs: the big shuffle join
  runs only over the small bloom-positive slice).
* Bloom-POSITIVE candidates go through the exact per-bucket anti-join;
  false positives cost one probe, never a dropped URL.

Buckets are ``pmod(xxhash64(url_canon), n_buckets)`` so the Bloom table
(one row of packed bits per bucket) stays small and broadcastable while
each bucket's filter stays dense. Probes use double hashing on the two
32-bit halves of the same xxhash64 the JVM computes (no Python hashing
of URLs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

SEEN_COLS = ["bucket", "url_canon", "url_hash64", "first_round"]


def with_seen_keys(df: DataFrame, url_col: str = "url_canon", n_buckets: int = 64) -> DataFrame:
    h = F.xxhash64(F.col(url_col))
    return df.withColumn("url_hash64", h).withColumn(
        "bucket", F.pmod(h, F.lit(n_buckets)).cast("int")
    )


def _probe_positions(hash64: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k probe positions per hash via double hashing of the 64-bit value."""
    h = hash64.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.int64)  # odd step
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m_bits


def build_bloom(seen: DataFrame, m_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """→ ``bloom(bucket int, bits binary)``; one packed bitset per bucket,
    built distributed with ``applyInPandas`` over the bucket groups."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = _probe_positions(pdf["url_hash64"].to_numpy(), m_bits, k)
        np.bitwise_or.at(bits, pos.ravel() // 8, np.uint8(1) << (pos.ravel() % 8).astype(np.uint8))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bits": [bits.tobytes()]})

    return (
        seen.select("bucket", "url_hash64")
        .groupBy("bucket")
        .applyInPandas(_build, schema="bucket int, bits binary")
    )


def merge_blooms(old: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Bitwise-OR two bloom tables per bucket — the incremental path:
    each round builds a bloom only over its NEW urls and ORs it into the
    running filter (O(new + n_buckets) instead of re-hashing the whole
    10^10-row seen set every round)."""
    if old is None:
        return delta

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in pdf["bits"]:
            arr = np.frombuffer(b, dtype=np.uint8)
            acc = arr.copy() if acc is None else (acc | arr)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bits": [acc.tobytes()]})

    return (
        old.unionByName(delta)
        .groupBy("bucket")
        .applyInPandas(_merge, schema="bucket int, bits binary")
    )


def updated_bloom(
    old: DataFrame | None,
    new_seen: DataFrame,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """``merge_blooms(old, build_bloom(new_seen))`` fused into ONE
    distributed pass — the per-round bloom maintenance previously paid
    two chained python-worker shuffles (build's groupBy + merge's
    groupBy) of pure fixed floor per crawl round; here old bits rows
    and new url rows union once and fold in a single ``applyInPandas``.

    Null discipline: ``url_hash64`` is never null (old rows carry 0) —
    a nullable int64 crossing Arrow into pandas becomes float64 and
    silently rounds 64-bit hashes, corrupting probe positions. The
    nullable column is ``bits`` (binary → object dtype, lossless), and
    row kind is decided by ``bits`` nullity alone."""
    new_rows = new_seen.select(
        "bucket", "url_hash64", F.lit(None).cast("binary").alias("bits")
    )
    rows = new_rows
    if old is not None:
        rows = old.select(
            "bucket", F.lit(0).cast("long").alias("url_hash64"), "bits"
        ).unionByName(new_rows)

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        have = pdf["bits"].notna()
        for b in pdf["bits"][have]:
            bits |= np.frombuffer(b, dtype=np.uint8)
        h = pdf["url_hash64"][~have].to_numpy(dtype=np.int64)
        if len(h):
            pos = _probe_positions(h, m_bits, k)
            np.bitwise_or.at(
                bits, pos.ravel() // 8, np.uint8(1) << (pos.ravel() % 8).astype(np.uint8)
            )
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bits": [bits.tobytes()]}
        )

    return rows.groupBy("bucket").applyInPandas(_fold, schema="bucket int, bits binary")


def bloom_maybe_contains(m_bits: int = 1 << 17, k: int = 5):
    """Pandas UDF ``(url_hash64, bits) -> bool`` (null bits → False:
    an absent bucket has seen nothing)."""

    @pandas_udf(BooleanType())
    def _maybe(hash64: pd.Series, bits: pd.Series) -> pd.Series:
        out = np.zeros(len(hash64), dtype=bool)
        present = bits.notna().to_numpy()
        if present.any():
            idx = np.nonzero(present)[0]
            pos = _probe_positions(hash64.to_numpy()[idx].astype(np.int64), m_bits, k)
            for j, row in zip(idx, range(len(idx))):
                arr = np.frombuffer(bits.iloc[j], dtype=np.uint8)
                p = pos[row]
                out[j] = bool(np.all(arr[p // 8] & (np.uint8(1) << (p % 8).astype(np.uint8))))
        return pd.Series(out)

    return _maybe


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: DataFrame | None = None,
    url_col: str = "url_canon",
    n_buckets: int = 64,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Rows of *candidates* whose ``url_col`` is NOT in *seen* — exact.

    With a Bloom table: bloom-negative rows bypass the anti-join;
    bloom-positive rows are verified exactly (per-bucket join keys:
    bucket + url, so the join is co-partitioned with the seen layout).
    """
    if seen is None:
        return candidates
    keyed = with_seen_keys(candidates, url_col, n_buckets)
    extra = ["url_hash64", "bucket"]
    if bloom is not None:
        probed = keyed.join(F.broadcast(bloom), "bucket", "left").withColumn(
            "__maybe", bloom_maybe_contains(m_bits, k)(F.col("url_hash64"), F.col("bits"))
        )
        definitely_new = probed.filter(~F.col("__maybe")).drop("bits", "__maybe", *extra)
        suspects = probed.filter(F.col("__maybe")).drop("bits", "__maybe")
        verified = suspects.join(
            seen.select("bucket", F.col("url_canon").alias(url_col)),
            ["bucket", url_col],
            "left_anti",
        ).drop(*extra)
        return definitely_new.unionByName(verified)
    return keyed.join(
        seen.select("bucket", F.col("url_canon").alias(url_col)),
        ["bucket", url_col],
        "left_anti",
    ).drop(*extra)
