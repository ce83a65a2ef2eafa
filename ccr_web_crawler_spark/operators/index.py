"""Vector-index build + retrieval — the reference ingest/query path
(``indexer/ingest.py:15-110``, ``agent/retrieve.py:15-45``) as Spark
dataflow over an ``embeddings`` table instead of a remote Pinecone
index.

Field semantics byte-matched:
* hierarchy flatten joins non-null [title, division, chapter, article]
  with ' > ' — note it SKIPS subchapter (``ingest.py:59-65``);
* embed text = f"{title}\\n{citation}\\n{hier}\\n{content[:2000]}"
  (``ingest.py:68``);
* metadata truncation title[:500] ('Unknown' default), section[:100],
  citation[:200], content[:1000] (``ingest.py:79-83``);
* upsert idempotent on url (``ingest.py:74,89-91``);
* retrieval = cosine top-k=8 with metadata (``retrieve.py:15,30-43``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.embed import cosine, embed_text_udf


def hierarchy_flat(hier) -> F.Column:
    """' > '-joined non-null levels, subchapter intentionally skipped."""
    return F.concat_ws(
        " > ", hier.getField("title"), hier.getField("division"),
        hier.getField("chapter"), hier.getField("article"),
    )


def embed_text_expr(title, citation, hier, content) -> F.Column:
    t = F.coalesce(title, F.lit(""))
    c = F.coalesce(citation, F.lit(""))
    body = F.substring(F.coalesce(content, F.lit("")), 1, 2000)
    return F.concat_ws("\n", t, c, hierarchy_flat(hier), body)


def build_index(extracted: DataFrame) -> DataFrame:
    """extracted records → embeddings(url, vec, meta). Idempotent on
    url (last write wins ≙ Pinecone upsert)."""
    src = extracted.select(
        "url",
        embed_text_expr(
            F.col("section_title"), F.col("citation_short"),
            F.col("hierarchy"), F.col("text_plain"),
        ).alias("embed_text"),
        F.struct(
            F.coalesce(F.substring("section_title", 1, 500), F.lit("Unknown")).alias("title"),
            F.coalesce(F.substring("section_number", 1, 100), F.lit("")).alias("section"),
            F.coalesce(F.substring("citation_short", 1, 200), F.lit("")).alias("citation"),
            F.coalesce(F.substring("text_plain", 1, 1000), F.lit("")).alias("content"),
        ).alias("meta"),
    )
    return src.dropDuplicates(["url"]).select(
        "url", embed_text_udf(F.col("embed_text")).alias("vec"), "meta"
    )


def merge_upsert(existing: DataFrame | None, batch: DataFrame, key: str = "url") -> DataFrame:
    """MERGE-INTO semantics on plain tables: new rows replace matching
    keys (Iceberg `MERGE INTO ... ON url` in production)."""
    if existing is None:
        return batch
    return existing.join(batch.select(key), key, "left_anti").unionByName(batch)


def assemble_context(
    topk: DataFrame,
    query_col: str = "q_id",
    rank_col: str = "rank",
    citation_col: str = "citation",
    content_col: str = "content",
) -> DataFrame:
    """Top-k retrieval rows → one prompt-context string per query
    (reference ``agent/app.py:45-52``:
    ``"SECTION: {citation}\\nCONTENT: {content}\\n\\n"`` concatenated in
    rank order). ``collect_list`` has no ordering guarantee, so pieces
    are gathered as (rank, piece) structs and ``sort_array``-ed — one
    shuffle on the query key, k-bounded groups, pure JVM."""
    piece = F.format_string(
        "SECTION: %s\nCONTENT: %s\n\n", F.col(citation_col), F.col(content_col)
    )
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col(rank_col).alias("r"), piece.alias("p")))
        ),
        lambda s: s.p,
    )
    return topk.groupBy(query_col).agg(F.array_join(ordered, "").alias("context"))


def search(index: DataFrame, query_text: str, top_k: int = 8) -> DataFrame:
    """Reference search (``agent/retrieve.py:15-45``): embed the query,
    cosine top-k with metadata + score."""
    from ccr_web_crawler_spark.functions.embed import encode_texts

    qvec = [float(x) for x in encode_texts([query_text])[0]]
    q = F.array(*[F.lit(x) for x in qvec])
    return (
        index.select("url", "meta", F.round(cosine(F.col("vec"), q), 4).alias("score"))
        .orderBy(F.desc("score"), "url")
        .limit(top_k)
    )
