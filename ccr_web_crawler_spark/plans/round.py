"""One crawl round as a pure DataFrame → DataFrames function.

The Spark re-expression of the reference's while-loop body
(``crawler/discovery.py:275-299``) fused with the extraction phase
(``crawler/extraction.py:215-267``):

    frontier ──dedupe──► anti-join seen ──admit (robots+politeness)──►
    fetch (join pages) ──extract_links UDF──► classify ──►
       nav   → next frontier (deterministic seq)
       doc   → discovered (anti-join, crawl-ordered seq) → fetch →
               extract_sections → extracted / failures

Scale notes (the 1000-executor story):
* the only shuffles are: seen anti-join (bucket-keyed, Bloom-prefiltered
  so only suspects shuffle), the per-host admit window (partitioned by
  host — salted hosts would split here), the fetch join (keyed on
  url_canon; `pages` bucketed by the same key in production makes it
  co-located), and the two global seq sorts (range-partitioned,
  no single-task window);
* with ``backlog_hot_rows`` set, every one of those shuffles runs over
  the HOT working set (≤ hosts × H rows), never the full deferred
  backlog: the cold table is append-only, consumed by a per-host
  watermark (`frontier_bound`), read only on refill rounds, and
  rewritten only by an explicit compaction — per-round cost is
  O(hot + new links), not O(frontier);
* `pages.html` is only read in the fetch projections — column pruning
  keeps the binary column out of every other scan;
* per-page link dedup happens inside the UDF before explode (shrink
  early, reference ``crawler/discovery.py:120``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.htmlx.udfs import (
    extract_sections,
    make_extract_links_udf,
)
from ccr_web_crawler_spark.functions.urlnorm import (
    is_navigation_url,
    is_section_url,
    url_host_udf,
)
from ccr_web_crawler_spark.operators.ids import assign_global_seq
from ccr_web_crawler_spark.operators.politeness import (
    DEFAULT_CRAWL_DELAY,
    admit_per_host,
    apply_robots,
    host_budget,
    split_top_k_per_host,
)
from ccr_web_crawler_spark.operators.seen import anti_join_seen, build_bloom, with_seen_keys
from ccr_web_crawler_spark.plans.phaselog import phase

FRONTIER_COLS = ["url_canon", "host", "depth", "parent", "seq", "attempt", "round"]
FRONTIER_SCHEMA = (
    "url_canon string, host string, depth int, parent string, "
    "seq long, attempt int, round int"
)
DISCOVERED_COLS = ["url_canon", "depth", "seq"]


@dataclass
class RoundConfig:
    scope_substring: str = "/calregs/"
    mode: str = "compat"  # canonicalization mode
    round_seconds: float | None = None  # None → admit whole frontier
    n_buckets: int = 64
    bloom_bits: int = 1 << 17
    bloom_k: int = 5
    use_bloom: bool = True
    max_attempts: int = 3
    extract: bool = True  # run the extraction stage on new discoveries
    seq_partitions: int | None = None
    # fetch-join strategy. 'broadcast' (default): broadcast the
    # admitted-frontier/worklist side and STREAM the pages corpus — the
    # corpus is never shuffled (at 100TB you never sort-shuffle the web
    # to fetch a round). 'shuffle': plain shuffled join, for when a
    # single round's frontier outgrows broadcast size — in production
    # pair it with pages bucketed by url_canon so the join co-locates.
    fetch_strategy: str = "broadcast"
    # dynamic fetch pushdown: when a round's candidate set is at most
    # this many urls, collect them (one tiny job over the round-sized,
    # usually checkpointed candidate relation) and push an In(url)
    # filter INTO the pages parquet scan. On a url-sorted corpus
    # (standard table layout — Iceberg sort order / Z-order exists for
    # exactly this) row-group min/max + page-index stats then prune the
    # scan to the handful of row groups that contain the round's urls,
    # so fetching K pages costs O(K · row-group), not O(corpus): the
    # measured at 60k fat pages: 13.5s streamed → ~1.4s pushed for a
    # 1-url round. The limit is deliberately modest: parquet evaluates
    # a pushed In as an Or-chain, whose cost grows linearly with the
    # set (measured: 1000 urls 1.7s, 4096 urls 6.6s, 8192 urls 24s vs
    # a 4.7s full scan — and >1024 risks StackOverflow at the default
    # JVM thread stack). Rounds bigger than the limit stream the scan,
    # which they amortize anyway. None disables.
    fetch_pushdown_limit: int | None = 1024
    # run the extraction stage as an ASYNC side-commit: the driver
    # commits the frontier-loop tables first (fast), then writes
    # extracted+failures in a background commit that overlaps the NEXT
    # round's dedupe/admit/link stages (a separate FAIR-scheduler pool,
    # so both get task slots). Extraction is embarrassingly parallel
    # per-document work with no effect on crawl ordering — serializing
    # the frontier loop behind it idles the cluster for the whole
    # fetch+extract+write of every round. Crash between the two commits
    # is self-healing: crawl() runs a lineage-driven catch-up pass
    # (discovered rounds with no extracted files) before looping.
    async_extract: bool = True
    # run the crawl loop with AQE disabled (restored on exit). AQE's
    # per-shuffle query-stage barriers + re-planning are pure fixed
    # latency for the round's frontier-sized shuffles (measured at 20k
    # pages, local[8]: 219 -> 270 pages/s with AQE off; the lo level is
    # insensitive), and the loop already handles its one skew risk —
    # hot hosts in the admit window — by explicit salting
    # (operators/politeness.py). Analytics queries outside the loop
    # keep AQE: their big scans/joins are where coalescing and
    # skew-splitting pay. On a real cluster with a 10^10-row frontier
    # the per-stage latency amortizes — set aqe_in_loop=True there.
    aqe_in_loop: bool = False
    # hot/cold frontier split. None = monolithic frontier (every round
    # re-shuffles and rewrites the full backlog — fine at test scale).
    # An int H bounds the per-round working set: the `frontier` table
    # holds at most H rows per host (the per-host BEST by (depth, seq));
    # overflow demotes to an append-only `frontier_cold` backlog that
    # ordinary rounds neither read, shuffle, nor rewrite. Consumption
    # from cold is a per-host (depth, seq) watermark in the tiny
    # `frontier_bound` table — a logical delete, never a rewrite. Set
    # H >= the largest per-host admission budget (refill clamps to the
    # budget anyway, so a too-small H costs refill frequency, not
    # correctness). Only meaningful with round_seconds politeness caps.
    backlog_hot_rows: int | None = None


@dataclass
class RoundResult:
    next_frontier: DataFrame
    new_seen: DataFrame
    new_discovered: DataFrame
    extracted: DataFrame | None
    failures: DataFrame | None
    stats: dict
    # backlog mode only: rows demoted to the cold table this round
    # (APPEND) and the updated per-host consumption watermark (REPLACE)
    demoted: DataFrame | None = None
    bound: DataFrame | None = None


BOUND_COLS = ["host", "b_depth", "b_seq"]


def _key(prefix: str = ""):
    return F.struct(F.col(f"{prefix}depth"), F.col(f"{prefix}seq"))


def live_cold_rows(cold: DataFrame, bound: DataFrame | None) -> DataFrame:
    """Cold-backlog rows still live under the per-host consumption
    watermark: key (depth, seq) at/past the host's ``frontier_bound``
    entry (hosts without an entry are fully live). THE one definition
    of cold liveness — refill (here) and ``driver.compact_cold`` must
    agree or compaction would physically delete rows refill still
    considers live."""
    if bound is None:
        return cold
    return (
        cold.join(F.broadcast(bound), "host", "left")
        .filter(
            F.col("b_depth").isNull()
            | (_key() >= F.struct(F.col("b_depth"), F.col("b_seq")))
        )
        .drop("b_depth", "b_seq")
    )


def _refill_from_cold(
    unseen: DataFrame,
    cold: DataFrame | None,
    bound: DataFrame | None,
    seen: DataFrame | None,
    bloom: DataFrame | None,
    robots: DataFrame | None,
    cfg: RoundConfig,
) -> tuple[DataFrame, DataFrame | None]:
    """Promote cold-backlog rows for hosts whose hot working set can't
    fill this round's admission budget. Returns (pool for admission,
    per-host successor watermarks for the promoted prefix | None).

    Ordinary rounds pay only a tiny aggregate over the hot-bounded
    ``unseen`` (per-host counts vs budget) and never touch cold; the
    cold scan runs only when a shortfall exists, filtered to shortfall
    hosts and to rows at/past the consumption watermark. Promotion
    ranks AFTER dedupe/seen/robots so stale resurrected rows (consumed
    ranges re-exposed by a later watermark lowering — see run_round)
    can't crowd live rows out of the top-k; everything below the
    promoted prefix's max key is therefore either promoted or
    provably dead, which is what makes the successor watermark a safe
    logical delete."""
    if bound is None or cold is None:
        return unseen, None
    spark = unseen.sparkSession
    budget = host_budget(cfg.round_seconds)
    counts = unseen.groupBy("host").agg(F.count("*").alias("__cnt"))
    # the TRUE per-host delay must come from robots, not from the hot
    # rows: a shortfall host may have 0 hot rows (nothing to read the
    # delay off), and coalescing to the default mis-sizes the budget
    # whenever robots grants a faster-than-default delay — the host
    # then refills at <budget hot rows "often enough" but not always
    # (cnt in [default_budget, true_budget) skips a refill the
    # monolithic engine's admission would have used)
    short = bound.select("host")
    if robots is not None:
        short = short.join(robots.select("host", "crawl_delay"), "host", "left")
    else:
        short = short.withColumn("crawl_delay", F.lit(None).cast("double"))
    shortfall = (
        short.withColumn(
            "crawl_delay",
            F.coalesce(F.col("crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY)),
        )
        .join(counts, "host", "left")
        .filter(F.coalesce(F.col("__cnt"), F.lit(0)) < budget)
        .select("host")
    )
    # hot-bounded aggregate — the only per-round cost when no host is short
    shortfall = shortfall.localCheckpoint(eager=True)
    if shortfall.isEmpty():
        return unseen, None
    live = live_cold_rows(
        cold.join(F.broadcast(shortfall), "host", "left_semi"), bound
    )
    live = _dedupe_frontier(live)
    # a url present in hot always carries the better (depth, seq) key
    # (demotion keeps the per-host best in hot), so the hot copy wins
    live = live.join(unseen.select("url_canon"), "url_canon", "left_anti")
    live = anti_join_seen(
        live, seen, bloom, "url_canon", cfg.n_buckets, cfg.bloom_bits, cfg.bloom_k
    )
    live = apply_robots(live, robots)
    promoted, _ = split_top_k_per_host(
        live, F.greatest(F.lit(cfg.backlog_hot_rows), budget)
    )
    # the promoted set drives BOTH admission and the consumption
    # watermark — it must be one stable materialization
    promoted = promoted.localCheckpoint(eager=True)
    if promoted.isEmpty():
        return unseen, spark.createDataFrame([], "host string, b_depth int, b_seq long")
    succ = promoted.groupBy("host").agg(F.max(_key()).alias("k")).select(
        "host",
        F.col("k.depth").alias("b_depth"),
        (F.col("k.seq") + 1).alias("b_seq"),
    )
    return unseen.unionByName(promoted), succ


def failures_projection(extracted: DataFrame, round_no: int) -> DataFrame:
    """Failed-URL sink rows (reference TSV, ``crawler/extraction.py:249-250``)
    — a 3-column projection, so deriving it from written parquet is a
    column-pruned scan that never touches the big text columns."""
    return extracted.filter(F.col("extraction_status") != "success").select(
        F.col("url"),
        F.col("extraction_status").alias("status"),
        F.col("extraction_note").alias("note"),
        F.lit(round_no).alias("round"),
    )


def retry_candidates(
    failures: DataFrame,
    succeeded_urls: DataFrame | None,
    max_attempts: int = 3,
) -> DataFrame:
    """URLs eligible for a recovery attempt (reference 3-stage recovery:
    every non-success lands in FAILED_FILE and is re-processed from a
    recovery list, ``crawler/extraction.py:219,247-250``,
    ``README.md:64``).

    ``failures(url, status, note, round)`` holds ONE row per failed
    attempt, so the attempt count is a groupBy — no mutable counters.
    Eligible = attempts < max_attempts AND never succeeded since (a url
    re-discovered and extracted successfully between passes must not be
    re-fetched). Output: (url_canon, attempt) with attempt = failures so
    far. One small shuffle over the failures table — bounded by failure
    volume (~1% of the corpus per the reference's success rate), never
    corpus-sized."""
    agg = failures.groupBy(F.col("url").alias("url_canon")).agg(
        F.count("*").alias("attempt")
    )
    out = agg.filter(F.col("attempt") < max_attempts)
    if succeeded_urls is not None:
        out = out.join(
            succeeded_urls.select("url_canon"), "url_canon", "left_anti"
        )
    return out


def extract_pass(
    worklist: DataFrame,
    pages: DataFrame,
    cfg: RoundConfig,
    page_urls: DataFrame | None = None,
) -> DataFrame:
    """Fetch-join a url worklist and run the section extractor — the
    one extraction pipeline shared by the in-round stage, the driver's
    async extraction commit, the resume catch-up, and recovery."""
    doc_pages = fetch_join(worklist.select("url_canon"), pages, cfg, page_urls)
    return extract_sections(doc_pages, "url_canon", "html")


def recovery_pass(
    retry_urls: DataFrame,
    pages: DataFrame,
    cfg: RoundConfig,
    page_urls: DataFrame | None = None,
) -> DataFrame:
    """One extraction-only recovery wave over previously-failed URLs —
    the reference's repair run (``crawler/extraction.py:215-267``) as a
    batch: fetch-join the retry worklist, re-run the section extractor.
    Returns the full extracted records (success AND repeated failures —
    a repeated failure appends another attempt row via the derived
    failures sink, which is what advances the attempt counter)."""
    return extract_pass(retry_urls, pages, cfg, page_urls)


def fetch_join(
    candidates: DataFrame,
    pages: DataFrame,
    cfg: RoundConfig,
    page_urls: DataFrame | None = None,
) -> DataFrame:
    """Sandbox 'fetch': candidate urls ⟕ pages html (the pages table IS
    the web; reference network fetch ``crawler/discovery.py:191-220``).

    Left-outer semantics (missing page → null html → failure record)
    WITHOUT shuffling the corpus AND without ever broadcasting anything
    corpus-sized: inner-join with the candidate side broadcast (pages
    streams, no exchange/sort of html), then re-attach the misses via an
    anti-join whose build side is ``hit_urls`` — the *round-sized*
    intersection of candidates with the corpus URL column, never the
    corpus itself (a 10^10-URL frontier's corpus URL set cannot
    broadcast; both sides here are bounded by the round).

    Pass a pre-materialized ``page_urls`` (the driver checkpoints it
    once per crawl): probing the url-only relation avoids deserializing
    the fat html column for miss detection; on parquet-backed pages the
    projection is a pruned scan anyway."""
    pages_proj = pages.select(F.col("url").alias("url_canon"), "html")
    if cfg.fetch_strategy == "broadcast":
        if page_urls is None:
            page_urls = pages.select(F.col("url").alias("url_canon"))
        # dynamic pushdown: for a small round, turn the fetch into a
        # point-lookup scan — an In(url) predicate reaches the parquet
        # reader (PushedFilters), so on a url-sorted corpus row-group
        # stats skip everything but the row groups holding this round's
        # urls. The collect is bounded by fetch_pushdown_limit and runs
        # over the round-sized candidate relation, never the corpus.
        #
        # Determinism: when pushdown triggers, the collected probe rows
        # THEMSELVES become the candidate side of both joins below
        # (a ≤limit-row local relation), so a nondeterministic upstream
        # candidates plan can never disagree with the pushed pages
        # filter — which would silently record real hits as misses.
        # Rounds above the limit keep the original (lazy) relation;
        # both engine callers checkpoint it first (run_round's `unseen`,
        # recover's `retry`).
        limit = cfg.fetch_pushdown_limit
        if limit:
            with phase("fetch.pushdown_probe"):
                probe = candidates.limit(limit + 1).collect()
            if len(probe) <= limit:
                candidates = pages.sparkSession.createDataFrame(
                    probe, candidates.schema
                )
                urls = [r["url_canon"] for r in probe]
                pushed = F.col("url_canon").isin(urls) if urls else F.lit(False)
                pages_proj = pages_proj.filter(pushed)
                page_urls = page_urls.filter(pushed)
        hit = pages_proj.join(F.broadcast(candidates), "url_canon", "inner").select(
            *candidates.columns, "html"
        )
        # round-sized: |hit_urls| <= |candidates|, so it is always
        # broadcastable even when the corpus is not
        hit_urls = page_urls.select("url_canon").join(
            F.broadcast(candidates.select("url_canon")), "url_canon", "inner"
        )
        miss = candidates.join(
            F.broadcast(hit_urls), "url_canon", "left_anti"
        ).withColumn("html", F.lit(None).cast("binary"))
        return hit.unionByName(miss)
    # 'shuffle' strategy = the round outgrew broadcast. Pin a merge
    # join so the planner can never "helpfully" broadcast the corpus
    # off a stats misestimate (fatal at 10^10 pages), and so a corpus
    # BUCKETED on url (sources/tableio.write_bucketed_pages — the
    # production layout) is consumed in place: only the round-sized
    # candidate side exchanges into the corpus's bucketing
    # (plan pinned by tests/test_bucketed_fetch.py).
    return candidates.join(pages_proj.hint("merge"), "url_canon", "left")


def _dedupe_frontier(frontier: DataFrame) -> DataFrame:
    """Pop-time duplicate drop (reference ``crawler/discovery.py:277-283``):
    first-queued copy — min (depth, seq) — wins."""
    s = F.min(F.struct("depth", "seq", "host", "parent", "attempt", "round")).alias("s")
    return (
        frontier.groupBy("url_canon")
        .agg(s)
        .select("url_canon", "s.host", "s.depth", "s.parent", "s.seq", "s.attempt", "s.round")
    )


def run_round(
    spark,
    round_no: int,
    frontier: DataFrame,
    seen: DataFrame | None,
    discovered: DataFrame | None,
    extracted_urls: DataFrame | None,
    pages: DataFrame,
    robots: DataFrame | None,
    cfg: RoundConfig,
    seen_count: int | None = None,
    max_seq: dict | None = None,
    bloom: DataFrame | None = None,
    page_urls: DataFrame | None = None,
    cold: DataFrame | None = None,
    bound: DataFrame | None = None,
) -> RoundResult:
    max_seq = max_seq or {}
    backlog = cfg.backlog_hot_rows is not None and cfg.round_seconds is not None
    extract_links_udf = make_extract_links_udf(cfg.scope_substring, cfg.mode)

    # 1. dedupe queued copies, drop already-visited (Bloom-prefiltered
    #    exact anti-join), admit per-host politeness budget. The driver
    #    passes the incrementally-maintained bloom; standalone callers
    #    fall back to building one from the full seen set.
    candidates = _dedupe_frontier(frontier)
    if bloom is None and seen is not None and cfg.use_bloom:
        bloom = build_bloom(seen, cfg.bloom_bits, cfg.bloom_k)
    unseen = anti_join_seen(
        candidates, seen, bloom, "url_canon", cfg.n_buckets, cfg.bloom_bits, cfg.bloom_k
    )
    unseen = apply_robots(unseen, robots)
    # eager checkpoint: unseen feeds admitted (→ seen/fetch) AND deferred
    # (→ next frontier); under AQE only an eager checkpoint guarantees
    # the dedupe/anti-join work runs once across those actions.
    with phase("round.unseen_ckpt"):
        unseen = unseen.localCheckpoint(eager=True)
    refill_bound = None
    if backlog:
        with phase("round.refill"):
            unseen, refill_bound = _refill_from_cold(
                unseen, cold, bound, seen, bloom, robots, cfg
            )
    admitted, deferred = admit_per_host(unseen, cfg.round_seconds)

    # 2. mark visited-at-pop (reference marks BEFORE fetch outcome,
    #    ``crawler/discovery.py:281``)
    new_seen = with_seen_keys(
        admitted.select("url_canon"), "url_canon", cfg.n_buckets
    ).withColumn("first_round", F.lit(round_no))

    # 3. fetch = join against the pages table (the sandbox "web");
    #    broadcast-streamed so the corpus never shuffles (see fetch_join)
    fetched = fetch_join(admitted, pages, cfg, page_urls)

    # 4. link extraction (document order preserved via posexplode)
    links = (
        fetched.filter(F.col("html").isNotNull())
        .select(
            F.col("url_canon").alias("parent"),
            F.col("depth"),
            F.col("seq").alias("parent_seq"),
            F.posexplode(extract_links_udf(F.col("html"), F.col("url_canon"))).alias(
                "link_pos", "link"
            ),
        )
        # eager: the fetch join + link-extraction UDF is the round's
        # heaviest stage and feeds both nav and doc branches
    )
    with phase("round.fetch_links_ckpt"):
        links = links.localCheckpoint(eager=True)

    # 5/6. classify + sequence nav and doc links in ONE global-seq pass
    #    (kind is the leading order key, so within-kind ordering equals
    #    the reference's per-list insertion order; seq values carry gaps
    #    across kinds, which is fine — only the (depth, seq) ORDER is
    #    semantic, watermarks in the snapshot manifest stay monotone).
    #    First-queued copy wins (reference ``crawler/discovery.py:246-248``).
    classified = links.withColumn(
        "kind",
        F.when(is_navigation_url(F.col("link")), F.lit(0))
        .when(is_section_url(F.col("link")), F.lit(1)),
    ).filter(F.col("kind").isNotNull())
    link_candidates = (
        classified.groupBy("kind", "link")
        .agg(F.min(F.struct("depth", "parent_seq", "link_pos", "parent")).alias("s"))
        .select(
            "kind",
            F.col("link").alias("url_canon"),
            (F.col("s.depth") + 1).alias("depth"),
            F.col("s.parent_seq").alias("parent_seq"),
            F.col("s.link_pos").alias("link_pos"),
            F.col("s.parent").alias("parent"),
        )
    )
    if discovered is not None:
        seen_docs = discovered.select(F.lit(1).alias("kind"), "url_canon")
        link_candidates = link_candidates.join(
            seen_docs, ["kind", "url_canon"], "left_anti"
        )
    base = max(max_seq.get("frontier", 0), max_seq.get("discovered", 0))
    with phase("round.assign_seq"):
        sequenced = assign_global_seq(
            link_candidates,
            ["kind", "depth", "parent_seq", "link_pos"],
            "seq",
            offset=base,
            num_partitions=cfg.seq_partitions,
        )
        # eager: sequenced feeds up to four committed tables (frontier,
        # discovered, and in backlog mode demoted + bound). Without this
        # pin each commit write re-runs the sequencing mapInPandas (an
        # Arrow python stage) plus everything above it per consumer; the
        # relation is round-sized, so the one materialization is cheap
        # at any scale and the driver's per-round fixed floor drops.
        sequenced = sequenced.localCheckpoint(eager=True)

    nav_new = sequenced.filter(F.col("kind") == 0).select(
        "url_canon",
        url_host_udf(F.col("url_canon")).alias("host"),
        "depth",
        "parent",
        "seq",
        F.lit(0).alias("attempt"),
        F.lit(round_no + 1).alias("round"),
    )
    next_frontier = deferred.select(*FRONTIER_COLS).unionByName(nav_new)
    demoted = new_bound = None
    if backlog:
        # the effective consumption watermark going into this round's
        # routing: the stored bound, raised to the refill's successor
        # for hosts the refill consumed from
        base = bound
        if refill_bound is not None:
            # both sides are O(hosts) watermark tables — broadcast the
            # anti-join probe so the merge never sorts/shuffles
            base = refill_bound if base is None else (
                base.join(
                    F.broadcast(refill_bound.select("host")), "host", "left_anti"
                ).unionByName(refill_bound)
            )
        # INVARIANT (what makes hot-only admission exact): every hot
        # row sorts strictly before every live cold row of its host.
        # New links at/past the watermark therefore may NOT compete for
        # hot slots — they go straight to cold, where (key >= base >=
        # final bound) keeps them live. Sub-watermark links + deferred
        # rows compete for the per-host best-H; overflow demotes, and
        # the watermark drops to the demotion min so demoted rows stay
        # live. Lowering the watermark re-exposes consumed cold ranges
        # — safe (resurrected rows are dupes of visited/pending urls
        # and die in the dedupe/seen filters at the next refill), just
        # a bounded re-read, never a correctness issue.
        nav_hot = nav_new
        nav_cold = nav_new.limit(0)
        if base is not None:
            # deterministic by construction (parquet-backed bound +
            # aggregation over the checkpointed promoted set) — no
            # pinning needed across its two uses
            routed = nav_new.join(F.broadcast(base), "host", "left")
            past = F.col("b_depth").isNotNull() & (
                _key() >= F.struct(F.col("b_depth"), F.col("b_seq"))
            )
            nav_hot = routed.filter(~past).select(*FRONTIER_COLS)
            nav_cold = routed.filter(past).select(*FRONTIER_COLS)
        next_frontier, overflow = split_top_k_per_host(
            deferred.select(*FRONTIER_COLS).unionByName(nav_hot),
            cfg.backlog_hot_rows,
        )
        demoted = overflow.unionByName(nav_cold)
        demote_min = demoted.groupBy("host").agg(
            F.min(_key()).alias("k")
        ).select(
            "host",
            F.col("k.depth").alias("b_depth"),
            F.col("k.seq").alias("b_seq"),
        )
        if base is None:
            new_bound = demote_min
        else:
            new_bound = (
                base.unionByName(demote_min)
                .groupBy("host")
                .agg(F.min(F.struct("b_depth", "b_seq")).alias("b"))
                .select("host", F.col("b.b_depth"), F.col("b.b_seq"))
            )
    new_discovered = sequenced.filter(F.col("kind") == 1).select(*DISCOVERED_COLS)

    # 7. extraction stage over this round's new discoveries
    #    (reference phase 2, ``crawler/extraction.py:215-267``; resume
    #    semantics = anti-join on url, strictly safer than the
    #    reference's positional line-count skip ``:193-196``)
    extracted_df = failures_df = None
    if cfg.extract:
        worklist = new_discovered.select("url_canon")
        if extracted_urls is not None:
            worklist = worklist.join(extracted_urls, "url_canon", "left_anti")
        doc_pages = fetch_join(worklist, pages, cfg, page_urls)
        # NOT checkpointed: the extraction UDF output (big text columns)
        # materializes exactly once — at the commit's parquet write; the
        # failures sink is then derived from a column-pruned scan of the
        # just-written files (SnapshotStore.commit(derived=...)). The
        # failures_df here is for standalone callers only.
        extracted_df = extract_sections(doc_pages, "url_canon", "html")
        failures_df = failures_projection(extracted_df, round_no)

    return RoundResult(
        next_frontier=next_frontier,
        new_seen=new_seen,
        new_discovered=new_discovered,
        extracted=extracted_df,
        failures=failures_df,
        stats={"round": round_no},
        demoted=demoted,
        bound=new_bound,
    )
