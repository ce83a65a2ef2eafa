"""Corpus term statistics — TF-IDF keyword extraction.

The standard "what is this document about" signal a training-data
pipeline derives corpus-wide (topic balancing, keyword-based filtering,
retrieval-index enrichment). The reference has nothing comparable (its
retrieval relies on dense embeddings only, ``agent/retrieve.py``).

Scale shape: explode to (doc, term) → two hash aggregations (term
frequency per doc, document frequency per term — partial map-side
combines on both) → broadcast-or-shuffle join of the per-term df back
onto the per-doc tf rows → per-doc top-k window. No all-pairs work; the
df relation has vocabulary cardinality (≪ corpus), so at 10^10 docs the
join's build side is the bounded vocabulary, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.textstats import normalize_ws


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF:

        score(d, t) = tf(d, t) · ln(N / df(t))

    with raw term counts, natural log, and N = corpus size. Ties break
    on the term string ascending (total order → reproducible and
    oracle-checkable). Terms are whitespace tokens of the case/ws
    normalized text; empty docs contribute nothing. Output:
    (id_col, term, score, rank), rank 1..k."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(normalize_ws(F.col(text_col)), " "), lambda w: w != "")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n1 = df.agg(F.count("*").cast("double").alias("n"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(n1)
        .select(
            id_col,
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )
