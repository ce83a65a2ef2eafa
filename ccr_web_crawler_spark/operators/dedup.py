"""Deduplication for web-scale corpora — exact, MinHash+LSH, SimHash,
n-gram Jaccard, and embedding-cosine near-dup.

The reference dedupes only exact URLs (``crawler/discovery.py:277-283``)
and validates duplicate URLs (``scripts/validate_data.py:26-30``);
content-level dedup is the standard scale-up for a training-data
pipeline over the crawl output.

Design rules at 10^10 rows:
* candidate generation NEVER compares all pairs — LSH banding (MinHash)
  or Hamming-bucket joins (SimHash) produce candidates, then exact
  verification runs only inside buckets;
* everything hash-based uses deterministic, engine-portable hashes so
  results are reproducible and oracle-checkable;
* JVM-native expressions wherever the semantics allow (tokenize,
  shingle, group, join); numpy-vectorized pandas UDFs only for the
  signature math.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pandas.util import hash_array
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ccr_web_crawler_spark.functions.textstats import fingerprint, normalize_ws

# segmented-reduction chunk bound: ≤2^14 flattened tokens per numpy
# slab keeps the (tokens × 64) intermediate ≈8MB — large enough to
# amortize ufunc dispatch, small enough that the slab is reusable and
# never triggers fresh large-page mappings per batch (this host's
# memory subsystem shows multi-second first-touch stalls on ~100MB+
# allocations; a preallocated 8MB buffer sidesteps them entirely)
_CHUNK_TOKENS = 1 << 14


def _hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Vectorized deterministic 64-bit string hash (pandas' siphash —
    Cython loop, ~20× a python-level per-string hash; fixed key, stable
    across processes). Input: object array of str."""
    return hash_array(tokens, categorize=False)


def _doc_chunks(token_lists: "pd.Series") -> Iterator[tuple[np.ndarray, np.ndarray, int]]:
    """Split a batch of per-doc token lists into slabs of whole docs
    with ≤ _CHUNK_TOKENS flattened tokens (single oversized docs go
    alone). Yields (flat_hashed uint64, doc_starts, doc_lens)."""
    lists = [
        np.asarray(t, dtype=object) if t is not None else np.empty(0, dtype=object)
        for t in token_lists
    ]
    i = 0
    while i < len(lists):
        j, total = i, 0
        while j < len(lists) and (j == i or total + len(lists[j]) <= _CHUNK_TOKENS):
            total += len(lists[j])
            j += 1
        chunk = lists[i:j]
        lens = np.array([len(c) for c in chunk])
        flat = (
            np.concatenate(chunk)
            if total
            else np.empty(0, dtype=object)
        )
        starts = np.zeros(len(chunk), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        yield _hash_tokens(flat) if total else np.empty(0, dtype=np.uint64), starts, lens
        i = j

# ---------------------------------------------------------------- exact


def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-equal (after ws/case normalization) docs:
    fingerprint → members + count. One shuffle on the fingerprint."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each fingerprint group."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(id_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 4,
) -> DataFrame:
    """CCNet-style line-level dedup (Wenzek et al. 2020, arXiv:1911.00359
    §3.1): a line whose normalized form appears in more than
    ``max_doc_freq`` distinct documents is boilerplate (cookie banners,
    nav bars, copyright footers) and is removed from every document;
    remaining lines are reassembled in original order.

    Output: (id_col, n_lines, n_kept, text) — the cleaned text plus
    per-doc line accounting. Documents whose every line is boilerplate
    survive with ``text=''`` (the caller's quality filter drops them).

    Scale shape: posexplode (narrow) → one groupBy shuffle on the line
    fingerprint to compute document frequency → broadcast-or-shuffle
    hash join of lines against the boilerplate set (AQE decides from
    the measured build-side size — the set is usually the tiny HIGH-df
    tail, but it is not bounded by construction, so no broadcast hint
    is forced) → one groupBy shuffle on the doc id to reassemble. No
    all-pairs work anywhere. Blank lines are never counted or dropped
    (they carry no content and would otherwise all collide)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    ).withColumn("line_fp", F.md5(normalize_ws(F.col("line"))))
    nonblank = F.length(F.trim(F.col("line"))) > 0
    boiler = (
        lines.filter(nonblank)
        .groupBy("line_fp")
        .agg(F.countDistinct(id_col).alias("line_df"))
        .filter(F.col("line_df") > max_doc_freq)
        .select("line_fp")
    )
    # no forced broadcast: the boilerplate set is USUALLY tiny (high-df
    # tail) but is unbounded in principle — let AQE pick broadcast vs
    # shuffle from the measured build-side size at runtime rather than
    # pinning an OOM-able hint
    flagged = lines.join(boiler.withColumn("__drop", F.lit(True)), "line_fp", "left").withColumn(
        "keep", F.coalesce(~F.col("__drop"), F.lit(True)) | ~nonblank
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s.line,
            ),
            "\n",
        ).alias(text_col),
    )


# ------------------------------------------------------------- shingles


def tokenize(text_col):
    """Whitespace words of the ws/case-normalized text, as a Column."""
    return F.filter(F.split(normalize_ws(text_col), " "), lambda w: w != "")


def _shingles_of(words, n: int):
    """Shingle set over an already-bound words array (a lambda variable
    or attribute reference — NOT a composite expression; see
    word_shingles)."""
    k = F.size(words) - (n - 1)
    return F.when(k < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(k, F.lit(1)) - 1),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, i + j + 1) for j in range(n)]
                ),
            )
        )
    )


def word_shingles(text_col, n: int = 3):
    """n-word shingles as a native Column (distinct, order-free set).

    The tokenized words array is bound as a higher-order-function lambda
    variable (``transform(array(words), w -> ...)``), NOT referenced as
    a subexpression inside the per-position lambda: codegen does not
    CSE a composite expression across lambda iterations, so the
    reference form re-ran the full split+filter once per shingle
    POSITION — O(doc_len * n_shingles) per doc, measured 21s vs 1.2s
    for the sf0.1 corpus. The lambda binding evaluates tokenize exactly
    once per row in any calling context."""
    words = tokenize(text_col)
    if n == 1:
        return F.array_distinct(words)
    return F.element_at(
        F.transform(F.array(words), lambda w: _shingles_of(w, n)), 1
    )


# --------------------------------------------------------------- minhash


def _minhash_params(n_hashes: int, seed: int = 1):
    rng = np.random.RandomState(seed)
    p = (1 << 61) - 1  # Mersenne prime
    a = rng.randint(1, p, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, p, size=n_hashes, dtype=np.int64)
    return a, b, p


_POLY = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def make_minhash_udf(n_hashes: int = 64, shingle_n: int = 3, seed: int = 1):
    """array<string> WORDS → array<long> minhash signature over the
    doc's n-word shingle set — without ever materializing a shingle
    string anywhere (building k ``concat_ws(slice(words))`` strings per
    doc JVM-side was the measured bottleneck of the whole minhash
    query, ~6.5s of 7s at sf0.1).

    Fully vectorized per Arrow batch:
    * ONE ``hash_array`` call hashes every word in the batch;
    * shingle hashes are a rolling degree-(n-1) polynomial over the
      flat word-hash array (n-1 fused multiply-adds over shifted
      views, uint64 wraparound); positions whose window crosses a doc
      boundary are masked to u64-max;
    * the ``n_hashes`` derived hashes are a (shingles × n_hashes)
      multiply-shift, and the per-doc min is one segmented
      ``np.minimum.reduceat``.

    Shingle MULTIplicity doesn't matter under min-aggregation, so the
    missing ``array_distinct`` changes nothing; docs with < n words get
    the all-zeros signature (same convention as the empty shingle set
    before)."""
    a, b, _ = _minhash_params(n_hashes, seed)
    A, B = a.astype(np.uint64), b.astype(np.uint64)
    U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

    @pandas_udf(ArrayType(LongType()))
    def _minhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        buf = np.empty((_CHUNK_TOKENS, n_hashes), dtype=np.uint64)
        with np.errstate(over="ignore"):  # wraparound mod 2^64 is intended
            for word_lists in batches:
                out: list = []
                for flat, starts, lens in _doc_chunks(word_lists):
                    sigs = np.zeros((len(lens), n_hashes), dtype=np.uint64)
                    n_sh = np.maximum(lens - (shingle_n - 1), 0)
                    L = flat.size
                    n_pos = max(L - (shingle_n - 1), 0)
                    if n_pos and n_sh.sum():
                        # rolling polynomial over shifted views
                        sh = flat[:n_pos] * _POLY
                        for j in range(1, shingle_n):
                            sh += flat[j : n_pos + j]
                            if j < shingle_n - 1:
                                sh *= _POLY
                        # mask windows that cross doc boundaries
                        docidx = np.repeat(np.arange(len(lens)), lens)
                        sh[docidx[:n_pos] != docidx[shingle_n - 1 :]] = U64MAX
                        if n_pos > buf.shape[0]:  # single oversized doc
                            buf = np.empty((n_pos, n_hashes), dtype=np.uint64)
                        derived = buf[:n_pos]
                        np.multiply(sh[:, None], A[None, :], out=derived)
                        np.add(derived, B[None, :], out=derived)
                        derived[sh == U64MAX] = U64MAX
                        has = n_sh > 0
                        # starts of shingled docs are strictly increasing
                        # and < n_pos → reduceat segments cover each doc's
                        # windows (masked cross-boundary rows are u64-max,
                        # invisible to min)
                        sigs[has] = np.minimum.reduceat(
                            derived, starts[has], axis=0
                        )
                    out.extend(s.astype(np.int64).tolist() for s in sigs)
                yield pd.Series(out)

    return _minhash


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 1,
    est_margin: float | None = 0.25,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard, jaccard).

    tokenize → minhash (rolling shingle hashes inside the UDF — no
    shingle strings materialize for the corpus) → band → bucket-join
    (candidates only) → exact shingle-set Jaccard verification computed
    ONLY for docs that appear in a candidate pair. ``n_bands`` bands of
    ``n_hashes/n_bands`` rows ⇒ S-curve threshold ≈ (1/b)^(1/r).

    Cost shape at 10^10 docs: the corpus-wide pass is split+hash only;
    string shingles — the expensive construction — are rebuilt for the
    candidate-sized doc subset alone. Candidates are FIRST screened on
    signature-estimated Jaccard (signatures are n_hashes longs — tiny):
    pairs with ``est < threshold - est_margin`` are dropped before any
    shingle join. With 64 hashes the estimator's sd is
    ~sqrt(t(1-t)/64) ≈ 0.05, so the default 0.25 margin is a 5-sigma
    band — a true-positive slips past it with probability ~3e-7. Set
    ``est_margin=None`` for the screen-free exact path."""
    rows_per_band = n_hashes // n_bands
    minhash = make_minhash_udf(n_hashes, shingle_n, seed)
    docs = (
        df.select(
            F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("words")
        )
        # docs below shingle_n words have an EMPTY shingle set: Jaccard
        # is 0/0 (undefined, treated as not-duplicate) and their
        # identical all-zeros signatures would otherwise collide in
        # every band — m short docs => m^2 guaranteed candidate pairs
        # plus a divide-by-zero in the exact verify under ANSI mode.
        # Excluding them up front is both the semantics and the scale
        # guard.
        .filter(F.size("words") >= shingle_n)
        .select("id", minhash(F.col("words")).alias("sig"))
    )
    docs = docs.localCheckpoint(eager=False)

    bands = docs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.hash(F.concat_ws("_", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band))),
            )
        ).alias("band", "bucket"),
    )
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "bucket"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sigs = docs.select("id", "sig")
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = matches / F.lit(n_hashes)
    cand_est = (
        cand.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
    )
    if est_margin is not None:
        cand_est = cand_est.filter(
            F.col("est_jaccard") >= jaccard_threshold - est_margin
        )
    # three consumers below (two id projections + the pair join) — pin
    # the screened candidate set once or the whole band self-join +
    # signature pipeline recomputes per consumer. Pair-bounded => tiny.
    cand_est = cand_est.localCheckpoint(eager=False)
    # exact string-shingle sets ONLY for docs surviving into a candidate
    # pair (semi-join: candidate ids are pair-bounded, broadcastable)
    cand_ids = (
        cand_est.select(F.col("id_a").alias("id"))
        .unionByName(cand_est.select(F.col("id_b").alias("id")))
        .distinct()
    )
    shs = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .join(cand_ids, "id", "left_semi")  # BEFORE the shingle projection
        .select("id", word_shingles(F.col("__t"), shingle_n).alias("shingles"))
    )
    pairs = (
        cand_est.join(shs.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(shs.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.select(
            "id_a",
            "id_b",
            "est_jaccard",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


# --------------------------------------------------------------- simhash


def make_simhash_udf(n_bits: int = 64):
    """array<string> tokens → simhash long (Charikar sign-of-votes).

    Vectorized per Arrow batch: one ``hash_array`` over every token in
    the batch, bit extraction as a (tokens × n_bits) matrix, per-doc
    vote counting via segmented ``np.add.reduceat``, and bit packing as
    a weights dot-product — no per-doc or per-bit python loops. A bit
    is set when strictly more than half the tokens vote 1 (ties → 0,
    matching the previous ±1-sum-positive rule)."""

    @pandas_udf(LongType())
    def _simhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bit_idx = np.arange(n_bits, dtype=np.uint64)
        weights = np.uint64(1) << bit_idx
        shift_buf = np.empty((_CHUNK_TOKENS, n_bits), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for token_lists in batches:
                out: list = []
                for flat, starts, lens in _doc_chunks(token_lists):
                    vals = np.zeros(len(lens), dtype=np.uint64)
                    if flat.size:
                        if flat.size > shift_buf.shape[0]:  # oversized doc
                            shift_buf = np.empty(
                                (flat.size, n_bits), dtype=np.uint64
                            )
                        shifted = shift_buf[: flat.size]
                        np.right_shift(flat[:, None], bit_idx[None, :], out=shifted)
                        np.bitwise_and(shifted, np.uint64(1), out=shifted)
                        bits = shifted.astype(np.int32)
                        nonempty = lens > 0
                        ones = np.add.reduceat(bits, starts[nonempty], axis=0)
                        majority = (
                            2 * ones.astype(np.int64)
                        ) > lens[nonempty][:, None]
                        packed = np.multiply(
                            majority.astype(np.uint64),
                            weights[None, :],
                            dtype=np.uint64,
                        )
                        vals[nonempty] = packed.sum(axis=1, dtype=np.uint64)
                    out.extend(vals.astype(np.int64).tolist())
                yield pd.Series(out, dtype="int64")

    return _simhash


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs via the Charikar block trick: split the
    64-bit hash into ``n_blocks``; any pair within ``max_hamming <
    n_blocks`` shares ≥1 exact block → bucket-join on (block_idx,
    block_value), verify Hamming distance exactly."""
    simhash = make_simhash_udf()
    toks = F.split(normalize_ws(F.col(text_col)), " ")
    docs = df.select(F.col(id_col).alias("id"), simhash(toks).alias("sh")).localCheckpoint(
        eager=False
    )
    bits_per_block = 64 // n_blocks
    mask = (1 << bits_per_block) - 1
    blocks = docs.select(
        "id",
        "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftright("sh", i * bits_per_block).bitwiseAND(F.lit(mask)).alias("val"),
                )
                for i in range(n_blocks)
            ])
        ).alias("b"),
    ).select("id", "sh", "b.blk", "b.val")
    cand = (
        blocks.alias("l")
        .join(blocks.alias("r"), ["blk", "val"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a", "id_b", hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------ n-gram jaccard


def jaccard_similar_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-set Jaccard over all pairs sharing ≥1 shingle —
    JVM-native end to end (explode → self-join on shingle → count),
    fully SQL-expressible (the DuckDB oracle runs the same algebra).

    Scale guard: a stop-shingle shared by k docs emits k² join rows, so
    at corpus scale pass ``max_df`` to drop shingles whose document
    frequency exceeds it BEFORE the self-join (one extra groupBy on the
    exploded shingles — cheap next to the k² it prevents). The cap makes
    the result approximate (pairs connected only via capped shingles
    lose intersection mass), so it is opt-in and logged; leave ``None``
    for the exact, oracle-checkable form, or route truly web-scale
    inputs to ``minhash_near_duplicates``."""
    docs = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    )
    sizes = docs.select("id", F.size("sh").alias("n_sh"))
    ex = docs.select("id", F.explode("sh").alias("s"))
    if max_df is not None:
        import logging
        import threading

        from pyspark.sql import Observation

        log = logging.getLogger(__name__)
        # no-silent-caps: say the policy up front, then report the
        # MEASURED tally. The tally rides the caller's own action via
        # an Observation on the df-count aggregate already in the plan
        # (zero extra jobs); a daemon thread logs it when it lands.
        log.warning(
            "jaccard_similar_pairs: dropping shingles with document "
            "frequency > %d — result is approximate (intersections lose "
            "mass from capped shingles)", max_df,
        )
        obs = Observation()
        stats = ex.groupBy("s").agg(F.count("*").alias("__df")).observe(
            obs,
            F.sum(F.when(F.col("__df") > max_df, 1).otherwise(0)).alias(
                "capped_shingles"
            ),
            F.sum(F.when(F.col("__df") > max_df, F.col("__df")).otherwise(0)).alias(
                "capped_occurrences"
            ),
            F.count("*").alias("distinct_shingles"),
        )

        def _report() -> None:
            try:
                got = obs.get  # blocks until the caller's first action
            except Exception:
                # the caller never ran an action before its session
                # closed — nothing to report; a best-effort telemetry
                # thread must never surface an unhandled exception
                return
            log.warning(
                "jaccard_similar_pairs(max_df=%d): dropped %s/%s distinct "
                "shingles (%s doc-occurrences of intersection mass)",
                max_df, got["capped_shingles"], got["distinct_shingles"],
                got["capped_occurrences"],
            )

        threading.Thread(target=_report, daemon=True).start()
        keep = stats.filter(F.col("__df") <= max_df).select("s")
        ex = ex.join(keep, "s")
    inter = (
        ex.alias("l")
        .join(ex.alias("r"), "s")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


# ------------------------------------------------- embedding near-dup


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dim: int = 384,
    use_lsh: bool = True,
    n_bits: int = 16,
    n_bands: int = 8,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. LSH band-join candidates at scale;
    set ``use_lsh=False`` for the exact (quadratic) small-N check."""
    from ccr_web_crawler_spark.functions.embed import cosine
    from ccr_web_crawler_spark.operators.similarity import make_signature_udf

    docs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if use_lsh:
        sig = make_signature_udf(dim, n_bits, n_bands)
        banded = docs.withColumn("band", F.explode(sig(F.col("v"))))
        cand = (
            banded.alias("l")
            .join(banded.alias("r"), "band")
            .filter(F.col("l.id") < F.col("r.id"))
            .select(
                F.col("l.id").alias("id_a"),
                F.col("r.id").alias("id_b"),
                F.col("l.v").alias("va"),
                F.col("r.v").alias("vb"),
            )
            .distinct()
        )
    else:
        cand = (
            docs.alias("l")
            .join(docs.alias("r"), F.col("l.id") < F.col("r.id"))
            .select(
                F.col("l.id").alias("id_a"),
                F.col("r.id").alias("id_b"),
                F.col("l.v").alias("va"),
                F.col("r.v").alias("vb"),
            )
        )
    return cand.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos")
    ).filter(F.col("cos") >= threshold)
