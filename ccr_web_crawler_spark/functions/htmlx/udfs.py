"""Arrow-batched Spark wrappers for htmlx.

Per BASELINE.json input_hint: "vectorized pandas/Arrow UDFs (no per-row
Python)" — every wrapper here is a pandas UDF or ``mapInPandas`` stage;
none is a row-at-a-time Spark UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ccr_web_crawler_spark.functions.htmlx.links import SCOPE_SUBSTRING, extract_links
from ccr_web_crawler_spark.functions.htmlx.sections import (
    extract_record,
    failure_record,
)

HIERARCHY_SCHEMA = StructType(
    [StructField(k, StringType()) for k in ("title", "division", "chapter", "subchapter", "article")]
)

# The 14-field extraction record (FIXTURES.md §4; reference
# ``crawler/extraction.py:169-176``). ``extracted_at`` is appended by
# ``extract_sections`` via ``current_timestamp()``.
EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("guid", StringType()),
        StructField("section_number", StringType()),
        StructField("section_title", StringType()),
        StructField("citation_short", StringType()),
        StructField("citation_canonical", StringType()),
        StructField("hierarchy", HIERARCHY_SCHEMA),
        StructField("text_html", StringType()),
        StructField("text_plain", StringType()),
        StructField("currency_notice", StringType()),
        StructField("extraction_status", StringType()),
        StructField("extraction_note", StringType()),
        StructField("external_url", StringType()),
    ]
)

EXTRACTED_FULL_SCHEMA = StructType(
    EXTRACTED_SCHEMA.fields + [StructField("extracted_at", TimestampType())]
)

_RECORD_COLS = [f.name for f in EXTRACTED_SCHEMA.fields]


def _to_text(html) -> str:
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode("utf-8", errors="replace")
    return html


def make_extract_links_udf(scope_substring: str = SCOPE_SUBSTRING, mode: str = "compat"):
    """Returns a pandas UDF ``(html, base_url) -> array<string>``
    (reference ``crawler/discovery.py:92-120``). ``html`` may be binary
    or string."""

    @pandas_udf(ArrayType(StringType()))
    def _extract(html: pd.Series, base: pd.Series) -> pd.Series:
        out = []
        for h, b in zip(html, base):
            if h is None:
                out.append([])
            else:
                out.append(extract_links(_to_text(h), b, scope_substring, mode))
        return pd.Series(out)

    return _extract


extract_links_udf = make_extract_links_udf()


def extract_sections(df: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """``mapInPandas`` section extractor (reference
    ``crawler/extraction.py:198-213``): each input row's HTML becomes one
    14-field record; rows with null HTML (fetch failures) or extractor
    exceptions become failure records (``crawler/extraction.py:178-185``,
    ``:206,213``). ``extracted_at`` is stamped with ``current_timestamp()``.
    """
    src = df.select(F.col(url_col).alias("url"), F.col(html_col).alias("html"))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records = []
            for url, html in zip(pdf["url"], pdf["html"]):
                if html is None:
                    records.append(failure_record(url, "fetch failed: no page content"))
                    continue
                try:
                    records.append(extract_record(_to_text(html), url))
                except Exception as exc:  # mirror reference catch-all :211-213
                    records.append(failure_record(url, str(exc)))
            yield pd.DataFrame(records, columns=_RECORD_COLS)

    return src.mapInPandas(_run, schema=EXTRACTED_SCHEMA).withColumn(
        "extracted_at", F.current_timestamp()
    )
