"""ccr_web_crawler_spark — a PySpark-native crawl/extract/index engine.

A from-scratch re-expression of the capabilities of the reference crawler
(`rizwan2004cs/ccr_web_crawler`, a single-process asyncio crawler) as a
batch-iterative DataFrame engine designed for a 10^10-URL frontier:

- ``functions.urlnorm``   URL canonicalization (vectorized Arrow UDFs)
- ``functions.htmlx``     stdlib-parser HTML link/section extraction
- ``functions.embed``     deterministic embedder + cosine expressions
- ``functions.textstats`` language-ID / quality / token stats
- ``operators.seen``      partitioned Bloom-prefiltered URL-seen set
- ``operators.politeness``per-host crawl budgets + lag-window checks
- ``operators.dedup``     exact / MinHash-LSH / SimHash / Jaccard dedup
- ``operators.similarity``cosine top-k and LSH-bucketed ANN
- ``operators.validate``  dataset validation report
- ``sources.tableio``     snapshot-manifest Parquet tables (Iceberg-style)
- ``sources.synth``       deterministic synthetic web generator
- ``plans.round``         one crawl round as a pure DataFrame function
- ``plans.driver``        multi-round loop with atomic resume

All heavy per-row work (HTML parse, URL parse, embedding) runs in
Arrow-batched pandas UDFs; everything relational is built-in Spark SQL.
"""

__version__ = "0.1.0"
