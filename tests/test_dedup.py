"""Dedup family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup."""

import pytest
from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_dedup,
    exact_duplicate_groups,
    jaccard_similar_pairs,
    minhash_near_duplicates,
    simhash_near_duplicates,
    word_shingles,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = BASE.replace("today", "tonight")  # 1-word change
FAR = "completely different content about regulatory filings and permit schedules"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, "  THE quick   brown fox jumps over the lazy dog near the river bank today "),  # ws/case dup of 0
        (3, NEAR),  # near dup of 0
        (4, FAR),
        (5, "the quick brown fox jumps over the lazy dog near the river bank today extra tail words here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicate_groups(spark, docs):
    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [0, 1, 2]  # ws/case-normalized equality


def test_exact_dedup_keeps_lowest_id(spark, docs):
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert kept == [0, 3, 4, 5]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "text string")
    got = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()
    assert got[0].s == ["a b c", "b c d"]
    assert got[1].s == []
    assert got[2].s == []


def test_minhash_near_duplicates(spark, docs):
    pairs = minhash_near_duplicates(docs, jaccard_threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got  # exact dups
    assert (0, 3) in got  # near dup survives banding + threshold
    assert all(4 not in p for p in got)  # unrelated doc never pairs
    byid = {(r.id_a, r.id_b): r for r in pairs}
    assert byid[(0, 1)].jaccard == 1.0
    assert 0.5 <= byid[(0, 3)].jaccard < 1.0
    # estimator sanity: minhash estimate within 0.3 of exact
    for r in pairs:
        assert abs(r.est_jaccard - r.jaccard) < 0.3


def test_simhash_near_duplicates(spark, docs):
    pairs = simhash_near_duplicates(docs, max_hamming=6)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(0, 1)] == 0 and got[(0, 2)] == 0
    assert (0, 4) not in got and (1, 4) not in got


def test_jaccard_similar_pairs(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in jaccard_similar_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_embedding_near_duplicates_lsh_vs_exact(spark):
    from ccr_web_crawler_spark.functions.embed import encode_texts

    texts = [BASE, BASE, NEAR, FAR, FAR + " tail", "permit filings"]
    vecs = encode_texts(texts)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(df, threshold=0.9, use_lsh=False).collect()
    }
    assert (0, 1) in exact and (0, 2) in exact
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(df, threshold=0.9, use_lsh=True).collect()
    }
    # identical vectors always share every band; near vectors should too
    assert (0, 1) in lsh
    assert lsh <= exact  # LSH candidates verified exactly: no false pairs


def test_minhash_est_prefilter_same_pairs(spark, docs):
    """The signature-estimate screen must not change the emitted set."""
    with_screen = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_near_duplicates(docs, jaccard_threshold=0.5).collect()
    }
    no_screen = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_near_duplicates(
            docs, jaccard_threshold=0.5, est_margin=None
        ).collect()
    }
    assert with_screen == no_screen


def test_jaccard_max_df_caps_stop_shingles(spark):
    # 'x' appears in every doc (df=4 > cap) and is each pair's only
    # overlap: with max_df=1 no pair shares a kept shingle
    rows = [(i, f"x w{i} y{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = jaccard_similar_pairs(df, n=1, threshold=0.1).collect()
    assert len(uncapped) == 6  # all pairs share 'x'
    capped = jaccard_similar_pairs(df, n=1, threshold=0.1, max_df=1).collect()
    assert capped == []


def test_minhash_short_docs_never_pair_or_crash(spark):
    """Docs with fewer than shingle_n words have EMPTY shingle sets:
    Jaccard is 0/0 — they are excluded up front instead of colliding in
    every band via identical all-zeros signatures and dividing by zero
    in the exact verify (ANSI mode)."""
    rows = [
        (1, "tiny doc"),
        (2, "also small"),
        (3, "x"),
        (4, "the quick brown fox jumps over the lazy dog again and again today"),
        (5, "the quick brown fox jumps over the lazy dog again and again today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(df, jaccard_threshold=0.5).collect()
    }
    assert got == {(4, 5)}
