"""Web-metadata ingestion: robots.txt parsing and sitemap extraction.

The reference ships no robots/sitemap handling at all (its politeness
is a fixed ``asyncio.sleep`` per fetch, ``crawler/discovery.py:203``);
the politeness operator (operators/politeness.py) consumes a parsed
``robots(host, disallow_prefixes, crawl_delay)`` table, and these are
the operators that PRODUCE that table from raw fetched artifacts at
corpus scale.

Both are pure per-row JVM Column algebra — the robots per-line state
machine becomes "position vs block boundaries" over a split-lines
array with higher-order functions, sitemap extraction is one
``regexp_extract_all`` — so a 10^8-host metadata corpus parses
map-only (zero shuffles) and both stay fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# group 1 = the <loc> payload; RE2/Java-portable (no lookarounds)
_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"


def sitemap_urls(df: DataFrame, host_col: str = "host", xml_col: str = "xml") -> DataFrame:
    """(host, xml) → one row per ``<loc>`` entry: (host, pos, url).

    Extraction is a single ``regexp_extract_all`` per sitemap —
    tolerant of the XML-ish reality of live sitemaps (no namespace or
    well-formedness requirement), the same trade every production
    crawler makes. ``pos`` is the 1-based position within the sitemap
    (crawl ordering is significant)."""
    locs = F.regexp_extract_all(F.coalesce(F.col(xml_col), F.lit("")), F.lit(_LOC_RE), 1)
    return df.select(F.col(host_col), F.posexplode(locs).alias("pos0", "url")).select(
        F.col(host_col), (F.col("pos0") + 1).alias("pos"), "url"
    )


def _directive_value(raw: Column) -> Column:
    # strip the directive name case-insensitively but KEEP the value's
    # original case: robots path prefixes are case-sensitive (RFC 9309
    # §2.2.2) and the politeness filter matches them with a
    # case-sensitive startswith — lowercasing here would let
    # 'Disallow: /Admin' pages through.
    return F.trim(F.regexp_replace(raw, r"(?i)^[a-z-]+\s*:\s*", ""))


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Parse the ``User-agent: *`` block of robots.txt into the
    politeness table shape: (host, disallow_prefixes array<string>,
    crawl_delay double).

    Semantics (the subset every crawler agrees on): directives from the
    first ``User-agent: *`` line up to the next ``User-agent:`` line
    (or EOF) apply; ``Disallow:`` with a non-empty value adds a path
    prefix (kept in file order); ``Crawl-delay:`` sets the delay (first
    in-block wins); hosts with no ``*`` block come back with an empty
    prefix list and NULL delay (unrestricted). Matching is
    case-insensitive with arbitrary whitespace around the colon.

    The sequential parser becomes array algebra over the split lines:
    block start = position of the first ``user-agent: *`` line, block
    end = first later ``user-agent:`` line, directives = filter of the
    (pos, line) structs between them. Out-of-range probes use ``get``
    (NULL, never an ANSI index error). Robots files are KB-sized, so
    re-evaluating the split per sub-expression costs less than one
    shuffle would; the whole operator fuses into the scan."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    # ln = lowercased for case-insensitive directive MATCHING;
    # raw = original case for VALUE extraction (path prefixes are
    # case-sensitive)
    items = F.transform(
        F.split(txt, "\n"),
        lambda x, i: F.struct(
            (i + 1).alias("pos"),
            F.lower(F.trim(x)).alias("ln"),
            F.trim(x).alias("raw"),
        ),
    )
    b_start = F.get(
        F.filter(items, lambda s: s.ln.rlike(r"^user-agent\s*:\s*\*$")), 0
    ).pos
    b_end = F.coalesce(
        F.get(
            F.filter(
                items,
                lambda s: s.ln.rlike(r"^user-agent\s*:") & (s.pos > b_start),
            ),
            0,
        ).pos,
        F.size(items) + 1,
    )
    # a NULL b_start (no "*" block) nulls the comparison → empty block
    block = F.filter(items, lambda s: (s.pos > b_start) & (s.pos < b_end))
    disallows = F.filter(
        F.transform(
            F.filter(block, lambda s: s.ln.rlike(r"^disallow\s*:")),
            lambda s: _directive_value(s.raw),
        ),
        lambda v: v != "",
    )
    delay = F.get(
        F.transform(
            F.filter(block, lambda s: s.ln.rlike(r"^crawl-delay\s*:")),
            lambda s: _directive_value(s.raw),
        ),
        0,
    ).cast("double")
    return df.select(
        F.col(host_col),
        disallows.alias("disallow_prefixes"),
        delay.alias("crawl_delay"),
    )


def anchor_topk(
    edges: DataFrame,
    k: int = 3,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    n_salts: int = 16,
) -> DataFrame:
    """Inbound anchor-text aggregation: for every link target, the top-k
    anchor strings by inbound-link count — the classic web-corpus signal
    (link text describes the TARGET page better than the page itself;
    used for page titling, retrieval keys, and ranking). The reference
    extracts (href, link-text) pairs per page
    (`crawler/discovery.py:92-120` keeps only the href); this keeps the
    text and aggregates it corpus-wide.

    Output: (dst, anchor, n_links, rank), rank 1..k per dst by
    (n_links DESC, anchor ASC) — a deterministic total order.

    Scale shape: the heavy reduction is ``groupBy(dst, anchor)`` —
    partial-aggregated map-side, ONE shuffle of (dst, anchor, n) rows
    (never raw edges with payloads). The per-dst top-k then runs
    skew-proof in two phases, same argument as
    operators/sampling.stratified_sample: phase 1 ranks within
    (dst, salt = anchor-hash % n_salts) so a hot target (a popular
    page has millions of DISTINCT anchors) never funnels through one
    window task, phase 2 re-ranks the ≤ k·n_salts survivors per dst.
    Exact: a global top-k member ranks ≥ as well within its own salt
    group, so phase 1 cannot drop it."""
    from ccr_web_crawler_spark.functions.textstats import hash64_portable

    counts = edges.groupBy(dst_col, anchor_col).agg(
        F.count("*").cast("long").alias("n_links")
    )
    salted = counts.withColumn(
        "__salt", (hash64_portable(F.col(anchor_col)) % n_salts).cast("int")
    )
    order = [F.col("n_links").desc(), F.col(anchor_col).asc()]
    w1 = Window.partitionBy(dst_col, "__salt").orderBy(*order)
    cand = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(dst_col).orderBy(*order)
    return cand.withColumn("rank", F.row_number().over(w2).cast("long")).filter(
        F.col("rank") <= k
    )
