"""Dataset validation report — the reference's ``scripts/validate_data.py``
single-pass counter scan (``:6-68``) as ONE Spark aggregation (no
driver-side loop, map-side partial aggregation, scales linearly).

Counter semantics preserved exactly, including the quirky ones:
* ``duplicates`` counts re-occurrences (total - distinct), ``:26-30``;
* a record is ``valid`` iff it is not an external redirect, has
  ``text_html``, and ``len(text_html.strip()) >= 10``, ``:37-44``;
* health gate: ``valid / total > 0.99``, ``:65``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validation_report(
    records: DataFrame,
    url_col: str = "url",
    title_col: str = "section_title",
    text_col: str = "text_html",
    status_col: str = "extraction_status",
) -> DataFrame:
    """→ one row: total, unique_urls, duplicates, valid, redirects,
    missing_title, missing_text, empty_text, healthy."""
    url, title, text, status = (F.col(c) for c in (url_col, title_col, text_col, status_col))
    is_redirect = status == "external_redirect"
    missing_title = title.isNull() | (title == "")
    missing_text = ~is_redirect & (text.isNull() | (text == ""))
    empty_text = ~is_redirect & text.isNotNull() & (text != "") & (
        F.length(F.trim(text)) < 10
    )
    valid = ~is_redirect & text.isNotNull() & (text != "") & (F.length(F.trim(text)) >= 10)

    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    out = records.agg(
        F.count("*").alias("total"),
        F.countDistinct(url).alias("unique_urls"),
        (F.count("*") - F.countDistinct(url)).alias("duplicates"),
        cnt(valid).alias("valid"),
        cnt(is_redirect).alias("redirects"),
        cnt(missing_title).alias("missing_title"),
        cnt(missing_text).alias("missing_text"),
        cnt(empty_text).alias("empty_text"),
    )
    return out.withColumn(
        "healthy", (F.col("valid") / F.col("total")) > F.lit(0.99)
    )
