"""Corpus-curation operators beyond near-dup: URL blocklist filtering,
exact-substring duplicate spans, and benchmark decontamination.

These extend the crawl→training-data pipeline (SURVEY §2.11) with the
three curation passes the public web-corpus recipes run between crawling
and training:

* **URL filtering** (RefinedWeb, arXiv:2306.01116 §3.1): drop documents
  whose registered domain is on a blocklist, plus a soft score over
  flagged substrings in the full URL.
* **Exact substring deduplication** (Lee et al., arXiv:2107.06499):
  find verbatim character spans shared across (or repeated within)
  documents. Implemented with **content-defined chunking** (LBFS,
  SOSP'01): split each document at positions where the rolling k-gram
  hash ≡ 0 (mod p). Split points depend only on the local bytes, so two
  copies of a long span produce identical chunks regardless of where
  the span sits in each document — alignment-robust where stride
  sampling is not, and embarrassingly parallel where suffix arrays are
  not.
* **Decontamination** (GPT-3, arXiv:2005.14165 appendix C): flag
  training documents sharing any word n-gram with a benchmark/eval set.

Every hash is ``hash64_portable`` / full md5 so a DuckDB oracle can
recompute byte-identical results (`__spark_entry__.py` registers one
per operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ccr_web_crawler_spark.functions.textstats import hash64_portable

__all__ = [
    "url_host",
    "url_blocklist_filter",
    "cdc_chunks",
    "substring_dup_spans",
    "decontaminate",
]


def url_host(url: Column) -> Column:
    """Lower-cased host of a URL — one RE2-portable regexp so the
    DuckDB oracle extracts the identical value."""
    return F.regexp_extract(F.lower(url), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host: a.b.c → [a.b.c, b.c, c]. Bounded by
    the label count (≤ ~10), this turns registered-domain matching into
    an equi-join instead of a LIKE theta-join."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def url_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    bad_words: dict[str, float] | None = None,
    threshold: float = 1.0,
) -> DataFrame:
    """RefinedWeb-style URL filter (arXiv:2306.01116 §3.1): drop rows
    whose host matches a blocked registered domain (exact label-suffix
    match — `ads.bad.example` is blocked by domain `bad.example`, but
    `notbad.example` is not), then drop rows whose soft URL score — the
    weighted count of flagged substrings in the lowercased URL — meets
    ``threshold``. Survivors keep their columns plus ``url_score``.

    Scale shape: the suffix explosion is bounded by host label count;
    the blocklist join is an equi-join on suffix (blocklists are
    ~100k domains — AQE broadcasts; no hint forced so an adversarially
    large list degrades to a shuffle join instead of an OOM). The word
    score is a pure JVM expression fused into the scan.
    """
    host = url_host(F.col(url_col))
    # anti-join keys on the URL column alone — document payloads never
    # enter the blocklist shuffle
    blocked_urls = (
        df.select(F.col(url_col), F.explode(_host_suffixes(host)).alias("__suffix"))
        .join(blocklist.select(F.col("domain").alias("__suffix")), "__suffix")
        .select(url_col)
        .distinct()
    )
    kept = df.join(blocked_urls, url_col, "left_anti")
    lurl = F.lower(F.col(url_col))
    score = F.lit(0.0)
    for word, weight in (bad_words or {}).items():
        occurrences = (
            F.length(lurl) - F.length(F.replace(lurl, F.lit(word.lower())))
        ) / len(word)
        score = score + occurrences * float(weight)
    return (
        kept.withColumn("url_score", F.round(score, 6))
        .filter(F.col("url_score") < threshold)
    )


def _normalize(text: Column) -> Column:
    """The corpus-standard normalization every curation hash runs over
    (same algebra as the winnowing fingerprints' ``tt``)."""
    return F.lower(
        F.trim(F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " "))
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    mod_p: int = 16,
    min_len: int = 40,
) -> DataFrame:
    """Content-defined chunking (LBFS, SOSP'01): split the normalized
    text before each position whose k-gram rolling hash ≡ 0 (mod p),
    emitting one row per chunk of length ≥ ``min_len``:
    ``(id, pos, chunk_len, chunk_fp)`` with ``chunk_fp`` the full md5
    of the chunk text. Expected chunk length is ~``mod_p`` chars plus
    the minimum-length floor.

    Entirely JVM higher-order functions over one bound text value — no
    shuffle, no UDF; the chunk explosion is the only row multiplier
    (O(n_chars / mod_p) rows per doc).
    """
    tt = _normalize(F.col(text_col))
    chunks = F.element_at(
        F.transform(
            F.array(tt),  # bind the normalized text once
            lambda t: _chunks_of(t, k, mod_p),
        ),
        1,
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(chunks).alias("c"))
        .select(
            "id",
            F.col("c.pos").alias("pos"),
            F.length("c.txt").alias("chunk_len"),
            F.md5("c.txt").alias("chunk_fp"),
        )
        .filter(F.col("chunk_len") >= min_len)
    )


def _chunks_of(t: Column, k: int, mod_p: int) -> Column:
    """Chunk structs ``(pos, txt)`` of an already-bound text value.

    Every intermediate array (``hs``, ``bounds``) is re-bound as a
    higher-order-function lambda variable via the ``element_at(
    transform(array(x), ...), 1)`` idiom before any lambda indexes into
    it. An unbound composite referenced inside a lambda body is
    re-evaluated PER ELEMENT by Catalyst's HOF interpreter — indexing
    the raw ``hs`` expression from the cut filter turns the O(n) k-gram
    hashing into O(n²) md5 calls per document (measured: a hang at even
    sf0.001). Same discipline as ``textstats._winnow_of``.
    """
    n_grams = F.length(t) - (k - 1)
    hs_expr = F.when(n_grams < 1, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: hash64_portable(t.substr(i, F.lit(k))),
        )
    )

    def chunk_list(bounds: Column) -> Column:
        # sequence(1, 0) yields a DESCENDING [1, 0] in Spark, not empty
        # — guard the one-bound case (empty text) to an empty index list
        idx = F.when(F.size(bounds) < 2, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), F.greatest(F.size(bounds) - 1, F.lit(1)))
        )
        return F.transform(
            idx,
            lambda j: F.struct(
                F.element_at(bounds, j).alias("pos"),
                t.substr(
                    F.element_at(bounds, j),
                    F.element_at(bounds, j + 1) - F.element_at(bounds, j),
                ).alias("txt"),
            ),
        )

    def with_bounds(hs: Column) -> Column:
        cuts = F.when(F.size(hs) < 1, F.array().cast("array<int>")).otherwise(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.size(hs), F.lit(1))),
                lambda i: F.element_at(hs, i) % mod_p == 0,
            ).cast("array<int>")
        )
        bounds_expr = F.array_sort(
            F.array_distinct(
                F.concat(F.array(F.lit(1)), cuts, F.array(F.length(t) + 1))
            )
        )
        return F.element_at(F.transform(F.array(bounds_expr), chunk_list), 1)

    return F.element_at(F.transform(F.array(hs_expr), with_bounds), 1)


def substring_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    mod_p: int = 16,
    min_len: int = 40,
) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al., arXiv:2107.06499,
    via CDC): every pair of positions — across documents or within one —
    holding the same ≥``min_len``-char chunk verbatim. Returns
    ``(id_a, pos_a, id_b, pos_b, chunk_len, chunk_fp)`` with the pair
    ordered ``(id_a, pos_a) < (id_b, pos_b)``.

    Scale shape: candidate generation is the chunk-fp equi-join (128-bit
    md5 keys — the match is exact at any realistic corpus size, and the
    chunk *text* never crosses a shuffle); output is bounded by true
    duplication, never all-pairs. Identical-alignment independence comes
    from CDC: a shared span yields identical cut points in both copies.
    """
    chunks = cdc_chunks(df, text_col, id_col, k, mod_p, min_len)
    left = chunks.select(
        F.col("chunk_fp"),
        F.col("chunk_len"),
        F.col("id").alias("id_a"),
        F.col("pos").alias("pos_a"),
    )
    right = chunks.select(
        F.col("chunk_fp"),
        F.col("id").alias("id_b"),
        F.col("pos").alias("pos_b"),
    )
    return left.join(right, "chunk_fp").filter(
        (F.col("id_a") < F.col("id_b"))
        | ((F.col("id_a") == F.col("id_b")) & (F.col("pos_a") < F.col("pos_b")))
    ).select("id_a", "pos_a", "id_b", "pos_b", "chunk_len", "chunk_fp")


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination (GPT-3, arXiv:2005.14165 appendix C):
    per training document, the count and fraction of its word
    ``n``-grams that appear anywhere in the benchmark set, plus the
    resulting ``contaminated`` flag (≥1 collision — the conservative
    published rule). Tokenization is whitespace over the normalized
    text; gram keys are ``hash64_portable`` of the space-joined gram.

    Scale shape: the benchmark gram set is eval-suite-sized (orders of
    magnitude below the corpus) — the distinct + equi-join lets AQE
    broadcast it; per-doc counts are one partial-agg shuffle on doc id.
    Documents with fewer than ``n`` tokens have no grams and report 0.
    """
    def grams(colname: str) -> Column:
        # bind the token array once (see _chunks_of: an unbound array
        # sliced inside the lambda re-splits the text per gram)
        toks_expr = F.split(_normalize(F.col(colname)), " ")

        def of(toks: Column) -> Column:
            m = F.size(toks) - (n - 1)
            return F.when(m < 1, F.array().cast("array<long>")).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                    lambda i: hash64_portable(
                        F.array_join(F.slice(toks, i, n), " ")
                    ),
                )
            )

        return F.element_at(F.transform(F.array(toks_expr), of), 1)

    bench_grams = (
        benchmark.select(F.explode(grams(text_col)).alias("gram_h")).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams(text_col)).alias("gram_pos", "gram_h"),
    )
    hits = (
        doc_grams.join(bench_grams, "gram_h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"), F.size(grams(text_col)).alias("n_grams")
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
        F.round(
            F.when(
                F.col("n_grams") > 0,
                F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contaminated_frac"),
        (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias("contaminated"),
    )
