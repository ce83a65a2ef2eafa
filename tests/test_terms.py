"""TF-IDF keyword extraction (operators/terms.py)."""

import math

from ccr_web_crawler_spark.operators.terms import tfidf_topk


def test_tfidf_prefers_rare_terms(spark):
    # 'common' appears in all 4 docs (idf = 0); each doc's unique word
    # appears only there (idf = ln 4) and must rank first
    docs = [(i, f"common common unique{i}") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_topk(df, k=2).collect()}
    for i in range(4):
        top = out[(i, 1)]
        assert top["term"] == f"unique{i}"
        assert math.isclose(top["score"], math.log(4.0), rel_tol=1e-12)
        # ln(N/df)=ln(1)=0 for the ubiquitous term
        assert out[(i, 2)]["term"] == "common" and out[(i, 2)]["score"] == 0.0


def test_tfidf_tf_weighting_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["rank"]): r for r in tfidf_topk(df, k=3).collect()}
    # doc0: apple tf=2 idf=ln(3) beats banana tf=1 idf=ln(3/2)
    assert rows[(0, 1)]["term"] == "apple"
    assert math.isclose(rows[(0, 1)]["score"], 2 * math.log(3.0), rel_tol=1e-12)
    assert rows[(0, 2)]["term"] == "banana"
    # doc1: banana and cherry tf=1; cherry idf=ln(3) > banana ln(3/2)
    assert rows[(1, 1)]["term"] == "cherry"
    # empty doc emits nothing
    assert not any(k[0] == 2 for k in rows)


def test_tfidf_exact_tie_breaks_on_term(spark):
    df = spark.createDataFrame(
        [(0, "zeta alpha"), (1, "other words")], "doc_id long, text string"
    )
    rows = [r for r in tfidf_topk(df, k=2).collect() if r["doc_id"] == 0]
    # both doc-0 terms score identically (tf=1, df=1) → alphabetical
    assert [r["term"] for r in sorted(rows, key=lambda r: r["rank"])] == ["alpha", "zeta"]
