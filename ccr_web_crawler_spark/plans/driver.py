"""Multi-round crawl driver — the Spark shape of the reference's
``crawl_async`` loop (``crawler/discovery.py:253-319``): the ONLY
driver-resident state is the round counter; sequence watermarks, row
counts and per-partition lineage live in the snapshot manifest, and all
data lives in snapshot-committed tables.

Each round lands as TWO atomic commits (replacing the reference's
torn-write three-file checkpoint, ``crawler/discovery.py:123-155``):
the frontier-loop tables (frontier/seen/discovered/bloom) commit
first, then extracted+failures commit from a background thread that
OVERLAPS the next round's dedupe/admit/link stages — extraction is
embarrassingly parallel side-work that must not serialize the frontier
loop (own FAIR scheduler pool; ``RoundConfig.async_extract=False``
restores the single-commit round). A killed run resumes from the last
committed snapshot (``load_checkpoint`` analog,
``crawler/discovery.py:158-188``) and converges to the same final
state as an uninterrupted run (tests/test_resume.py,
tests/test_async_extract.py) — a crash between the two commits is
healed by a lineage-driven catch-up pass before the loop.

Per-round driver overhead is kept off the cluster:
* empty-frontier / metrics / summary checks read manifest lineage row
  counts (parquet footers captured at commit) — zero Spark jobs;
* seq watermarks ride in the manifest (monotone; gaps are fine — only
  the (depth, seq) ORDER is semantic) — no ``max(seq)`` collect jobs;
* the Bloom URL-seen pre-filter is maintained incrementally: each round
  hashes only its new urls and ORs them into the stored filter, instead
  of re-hashing the whole seen set (``operators.seen.updated_bloom``,
  a single fused applyInPandas pass per round).
"""

from __future__ import annotations

import dataclasses
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.urlnorm import canonicalize_col, url_host_udf
from ccr_web_crawler_spark.operators.ids import assign_global_seq
from ccr_web_crawler_spark.operators.seen import updated_bloom
from ccr_web_crawler_spark.plans.phaselog import phase
from ccr_web_crawler_spark.plans.round import (
    FRONTIER_COLS,
    FRONTIER_SCHEMA,
    RoundConfig,
    extract_pass,
    failures_projection,
    live_cold_rows,
    recovery_pass,
    retry_candidates,
    run_round,
)
from ccr_web_crawler_spark.sources.tableio import APPEND, REPLACE, SnapshotStore


@dataclass
class CrawlSummary:
    rounds: int
    visited: int
    discovered: int
    extracted: int
    failures: int
    queue_remaining: int
    # physical rows in the cold backlog (backlog mode only) — an UPPER
    # bound on live deferred urls: consumed ranges stay on disk until
    # compact_cold() rewrites them away
    cold_backlog: int = 0
    metrics: list = field(default_factory=list)


def init_frontier(spark: SparkSession, seeds: DataFrame, cfg: RoundConfig) -> DataFrame:
    """Seed list → frontier rows (reference START_URL enqueue,
    ``crawler/discovery.py:166``); seed order = seq order."""
    seeded = seeds.select(
        canonicalize_col(F.col("url"), cfg.mode).alias("url_canon"),
        F.coalesce(F.col("priority"), F.lit(0)).alias("priority"),
    )
    seeded = assign_global_seq(seeded, ["priority", "url_canon"], "seq")
    return seeded.select(
        "url_canon",
        url_host_udf(F.col("url_canon")).alias("host"),
        F.lit(0).alias("depth"),
        F.lit(None).cast("string").alias("parent"),
        "seq",
        F.lit(0).alias("attempt"),
        F.lit(0).alias("round"),
    )


METRICS_SCHEMA = (
    "round int, pages_fetched long, frontier_size long, sections_discovered long, "
    "failures long, wall_ms long"
)


def _check_metrics_schema(store: SnapshotStore) -> None:
    """Fail fast when resuming a store whose metrics table was written
    by a different engine version. The metrics table is APPEND-mode;
    parquet happily mixes files with different column sets and
    spark.read then fills the disagreement with nulls SILENTLY — a
    schema rename (e.g. links_extracted → frontier_size) must be an
    error, not a corrupted report."""
    m = store.manifest()
    if m is None:
        return
    files = (m["tables"].get("metrics") or {}).get("files") or []
    if not files:
        return
    import pyarrow.parquet as pq

    existing = pq.ParquetFile(str(store.root / files[0])).schema_arrow.names
    expected = [c.split()[0] for c in METRICS_SCHEMA.split(", ")]
    if existing != expected:
        raise ValueError(
            "resuming a store with an incompatible metrics schema: "
            f"stored columns {existing} != engine columns {expected}; "
            "migrate or recreate the store before appending"
        )


def _seq_watermarks(spark: SparkSession, store: SnapshotStore) -> dict:
    """Fallback when the manifest carries no watermarks (e.g. a store
    written by an external tool): one max(seq) job per seq-carrying
    table. Row counts are NOT a safe stand-in — seq spaces carry gaps
    by design, so count() can undershoot the real high-water mark and a
    resume would mint colliding seqs."""
    wm = {}
    for t, key in (
        ("frontier", "frontier"),
        ("frontier_cold", "frontier"),  # demoted rows carry live seqs too
        ("discovered", "discovered"),
    ):
        df = store.read(spark, t)
        mx = None if df is None else df.agg(F.max("seq")).first()[0]
        wm[key] = max(wm.get(key, 0), 0 if mx is None else int(mx) + 1)
    return wm


def crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    store: SnapshotStore,
    cfg: RoundConfig | None = None,
    robots: DataFrame | None = None,
    max_rounds: int | None = None,
) -> CrawlSummary:
    """Run (or resume) the crawl until the frontier drains or
    ``max_rounds`` more rounds complete."""
    cfg = cfg or RoundConfig()
    with _loop_aqe(spark, cfg):
        return _crawl(spark, pages, seeds, store, cfg, robots, max_rounds)


class _loop_aqe:
    """Disable AQE for the crawl loop (RoundConfig.aqe_in_loop) and
    restore the caller's setting on exit — the loop's frontier-sized
    shuffles pay AQE's query-stage barriers without using its
    coalescing/skew re-planning (rationale at the config field)."""

    def __init__(self, spark: SparkSession, cfg: RoundConfig):
        self.spark, self.off = spark, not cfg.aqe_in_loop

    def __enter__(self):
        if self.off:
            self.prev = self.spark.conf.get("spark.sql.adaptive.enabled")
            self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        return self

    def __exit__(self, *exc):
        if self.off:
            self.spark.conf.set("spark.sql.adaptive.enabled", self.prev)
        return False


def _crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    store: SnapshotStore,
    cfg: RoundConfig,
    robots: DataFrame | None = None,
    max_rounds: int | None = None,
) -> CrawlSummary:
    _check_metrics_schema(store)
    manifest = store.manifest()
    if manifest is None:
        frontier = init_frontier(spark, seeds, cfg)
        # seeds get seq 0..n-1 → watermark starts past them
        store.commit(
            -1,
            {"frontier": (frontier, REPLACE)},
            {"phase": "seeded"},
            metrics_fn=lambda d: {
                "watermarks": {"frontier": d.get("frontier", 0), "discovered": 0}
            },
        )
        manifest = store.manifest()
    wm = dict(manifest.get("metrics", {}).get("watermarks") or {})
    if "frontier" not in wm or "discovered" not in wm:
        wm = {**_seq_watermarks(spark, store), **wm}
    round_no = manifest["round"] + 1

    page_urls = _corpus_urls(pages)

    if cfg.extract:
        # self-healing resume: a crash between a round's frontier commit
        # and its async extraction commit leaves discovered rounds with
        # no extracted files — finish them before looping (also gives
        # the reference's two-phase mode: crawl with extract=False, then
        # re-open with extract=True and this pass extracts everything,
        # cf. crawler/extraction.py:215-267 running off discovered).
        _extract_catchup(spark, store, cfg, pages, page_urls)

    metrics_rows = []
    try:
        _rounds(
            spark, pages, store, cfg, robots, max_rounds, wm, round_no,
            page_urls, metrics_rows,
        )
    finally:
        # graceful interrupt: each round already committed atomically;
        # flush the per-round metrics rows gathered so far so a killed
        # run still reports what it did (reference prints progress per
        # checkpoint, crawler/discovery.py:296-299). The flush itself
        # runs Spark + store machinery — if _rounds died because THOSE
        # are broken, a second exception here would mask the original
        # failure, so the cleanup commit never raises past a log line.
        if metrics_rows:
            try:
                store.commit(
                    metrics_rows[-1][0],
                    {"metrics": (spark.createDataFrame(metrics_rows, METRICS_SCHEMA), APPEND)},
                    {"phase": "metrics", "watermarks": store.manifest()["metrics"].get("watermarks", wm)},
                )
            except Exception as flush_err:  # noqa: BLE001
                import sys

                print(
                    f"metrics flush failed during cleanup: {flush_err!r}",
                    file=sys.stderr,
                )
    return _summary(store, metrics_rows)


def _corpus_urls(pages: DataFrame) -> DataFrame:
    """The corpus-URL probe relation for fetch miss-detection.

    For a file-backed corpus (the production shape — parquet/Iceberg)
    this stays LAZY: each use is a footer-pruned single-column scan,
    cheap and fault-tolerant. ``localCheckpoint`` here would pin a
    corpus-sized relation (~1 TB of urls at 10^10 pages) in
    non-replicated executor block storage for the whole crawl — one
    lost executor kills the run. Only a non-file corpus (in-memory test
    frames, where every re-use would re-run the synthesis UDF) is
    checkpointed, and that path is test-scale by construction."""
    proj = pages.select(F.col("url").alias("url_canon"))
    try:
        file_backed = bool(pages.inputFiles())
    except Exception:  # noqa: BLE001 — conservatively treat as in-memory
        file_backed = False
    return proj if file_backed else proj.localCheckpoint(eager=True)


def _extract_catchup(
    spark: SparkSession,
    store: SnapshotStore,
    cfg: RoundConfig,
    pages: DataFrame,
    page_urls: DataFrame,
) -> int:
    """Extract every discovered round that has no extracted files yet
    (manifest lineage carries per-file round tags — no Spark jobs to
    find the gap). One atomic commit per missing round, tagged with the
    ORIGINAL round number, so a resumed run converges to the same store
    a never-interrupted run produces. Returns rounds caught up."""
    m = store.manifest()
    if m is None:
        return 0
    d_line = (m["tables"].get("discovered") or {}).get("lineage", {})
    e_line = (m["tables"].get("extracted") or {}).get("lineage", {})
    d_rounds = {v.get("round") for v in d_line.values()}
    e_rounds = {v.get("round") for v in e_line.values()}
    missing = sorted(r for r in d_rounds - e_rounds if r is not None)
    if not missing:
        return 0
    wm = (m.get("metrics") or {}).get("watermarks") or {}
    ext = store.read(spark, "extracted")
    for r in missing:
        files = [
            str(store.root / f) for f, v in d_line.items() if v.get("round") == r
        ]
        wl = spark.read.parquet(*files).select("url_canon")
        if ext is not None:
            # defensive for externally-assembled stores; disjoint by
            # construction on engine-written ones (extracted ⊆ discovered
            # of earlier rounds, recovery re-extracts only failed urls)
            wl = wl.join(
                ext.select(F.col("url").alias("url_canon")), "url_canon", "left_anti"
            )
        store.commit(
            r,
            {"extracted": (extract_pass(wl, pages, cfg, page_urls), APPEND)},
            {"phase": "extract-catchup", "watermarks": wm},
            derived={
                "failures": (
                    "extracted",
                    lambda df, rr=r: failures_projection(df, rr),
                    APPEND,
                )
            },
        )
    return len(missing)


def _rounds(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore,
    cfg: RoundConfig,
    robots: DataFrame | None,
    max_rounds: int | None,
    wm: dict,
    round_no: int,
    page_urls: DataFrame,
    metrics_rows: list,
) -> None:
    backlog = cfg.backlog_hot_rows is not None and cfg.round_seconds is not None
    if not backlog and store.count("frontier_cold") > 0:
        # a non-backlog resume would silently strand the cold URLs (and
        # crash once hot drains: run_round would see frontier=None with
        # work still pending) — refuse loudly instead
        raise ValueError(
            "store has a frontier_cold backlog (written by a backlog-mode "
            "crawl) but RoundConfig.backlog_hot_rows/round_seconds are not "
            "set — resume with backlog mode enabled, or compact the store"
        )
    async_extract = cfg.extract and cfg.async_extract
    run_cfg = dataclasses.replace(cfg, extract=False) if async_extract else cfg
    # one worker: extraction commits are serialized among themselves and
    # against the next frontier commit (SnapshotStore commits must not
    # interleave); the PARALLELISM is between this thread's Spark jobs
    # and the main thread's next-round stages, which share executor
    # slots via separate FAIR scheduler pools (session.py)
    pool = ThreadPoolExecutor(max_workers=1) if async_extract else None
    pending: tuple | None = None  # (future, metrics_row, t0)

    def _await_pending() -> None:
        nonlocal pending
        if pending is None:
            return
        fut, row, t0 = pending
        pending = None
        b_version = fut.result()
        row[4] = store.rows_in_round("failures", row[0], b_version)
        # durable wall: frontier commit + extraction commit (the latter
        # overlaps the NEXT round's compute, so per-round walls may sum
        # past the crawl wall — they measure durability latency)
        row[5] = int((time.time() - t0) * 1000)

    def _submit_extract(version: int, row: list, t0: float, wm_now: dict) -> None:
        nonlocal pending
        rnd = row[0]
        delta = store.manifest(version)["tables"]["discovered"]["lineage"]
        files = [
            str(store.root / f)
            for f, v in delta.items()
            if v.get("round") == rnd
        ]

        def _b() -> int:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", "extract"
            )
            with phase(f"driver.extract_commit[{rnd}]"):
                # worklist = the discovered delta just committed: a
                # pinned column-pruned read of round-sized files — no
                # recompute of the in-memory plan, trivially
                # deterministic for the fetch pushdown probe
                wl = spark.read.parquet(*files).select("url_canon")
                return store.commit(
                    rnd,
                    {"extracted": (extract_pass(wl, pages, cfg, page_urls), APPEND)},
                    {"phase": "extract", "watermarks": wm_now},
                    derived={
                        "failures": (
                            "extracted",
                            lambda df, rr=rnd: failures_projection(df, rr),
                            APPEND,
                        )
                    },
                )

        pending = (pool.submit(_b), row, t0)

    rounds_done = 0
    try:
        while max_rounds is None or rounds_done < max_rounds:
            # cold's physical count includes logically-consumed rows, so a
            # nonzero count only means "worth running a round to find out" —
            # the post-round check below breaks when a round proves sterile
            if store.count("frontier") == 0 and store.count("frontier_cold") == 0:
                break
            frontier = store.read(spark, "frontier")
            seen = store.read(spark, "seen")
            bloom = store.read(spark, "bloom") if cfg.use_bloom else None
            discovered = store.read(spark, "discovered")
            extracted_urls = None
            if not async_extract:
                ext = store.read(spark, "extracted")
                if ext is not None:
                    extracted_urls = ext.select(F.col("url").alias("url_canon"))
            cold = bound = None
            if backlog:
                cold = store.read(spark, "frontier_cold")
                bound = store.read(spark, "frontier_bound")
                if frontier is None:
                    frontier = spark.createDataFrame([], FRONTIER_SCHEMA)

            # NOTE: the previous round's extraction commit may still be in
            # flight here — by design. It only appends extracted/failures,
            # which this round's inputs (frontier/seen/bloom/discovered)
            # never read, so the manifest view above is consistent either
            # way, and the dedupe/admit/link stages below get the executor
            # slots the old serial loop left idle during extraction.
            t0 = time.time()
            with phase(f"driver.run_round[{round_no}]"):
                result = run_round(
                    spark, round_no, frontier, seen, discovered, extracted_urls,
                    pages, robots, run_cfg, max_seq=wm, bloom=bloom,
                    page_urls=page_urls, cold=cold, bound=bound,
                )
            _await_pending()
            tables: dict[str, tuple[DataFrame, str]] = {
                "frontier": (result.next_frontier, REPLACE),
                # sorted within partitions like the reference's sorted
                # visited_urls.txt (crawler/discovery.py:147) — also gives
                # parquet min/max url stats for later point-lookup pruning
                "seen": (result.new_seen.sortWithinPartitions("url_canon"), APPEND),
                "discovered": (result.new_discovered, APPEND),
            }
            if result.demoted is not None:
                tables["frontier_cold"] = (result.demoted, APPEND)
            if result.bound is not None:
                tables["frontier_bound"] = (result.bound, REPLACE)
            if cfg.use_bloom:
                new_urls = result.new_seen.select("bucket", "url_hash64")
                if bloom is None and seen is not None:
                    # store has seen rows but no bloom table (use_bloom
                    # toggled on mid-crawl / pre-bloom store): a delta-only
                    # filter would claim the old urls are unseen and bypass
                    # the exact anti-join — rebuild over the FULL seen set
                    # once, then incremental OR-merge resumes next round.
                    new_urls = seen.select("bucket", "url_hash64").unionByName(new_urls)
                # fused build+merge: ONE applyInPandas pass per round
                # (operators/seen.updated_bloom) instead of build_bloom →
                # merge_blooms — halves the per-round bloom fixed cost
                tables["bloom"] = (
                    updated_bloom(bloom, new_urls, cfg.bloom_bits, cfg.bloom_k),
                    REPLACE,
                )
            derived = None
            if not async_extract and result.extracted is not None:
                tables["extracted"] = (result.extracted, APPEND)
                # failures derive from the extracted files written by this
                # same commit — a column-pruned scan, not a recompute
                derived = {
                    "failures": (
                        "extracted",
                        lambda df, r=round_no: failures_projection(df, r),
                        APPEND,
                    )
                }

            base_wm = wm

            def _wm(deltas, _base=base_wm, _t0=t0):
                # runs after the data writes, before the manifest lands, so
                # wall covers the real round incl. the writes. nav + doc
                # links share one sequence space per round (fused assignment
                # in run_round, offset = max of both marks), so advance both
                # watermarks past everything sequenced; the frontier delta
                # over-counts deferred rows — gaps are fine (only the
                # (depth, seq) ORDER is semantic). frontier_cold MUST count:
                # in backlog mode the hot delta alone is capped at hosts x H,
                # which can be SMALLER than the links sequenced this round —
                # the next base would collide with seqs already minted on
                # cold rows and corrupt the global (depth, seq) order.
                nxt = (
                    max(_base["frontier"], _base["discovered"])
                    + deltas.get("frontier", 0)
                    + deltas.get("frontier_cold", 0)
                    + deltas.get("discovered", 0)
                )
                return {
                    "watermarks": {"frontier": nxt, "discovered": nxt},
                    "wall_s": round(time.time() - _t0, 3),
                }

            with phase(f"driver.commit[{round_no}]"):
                version = store.commit(
                    round_no, tables, {"phase": "round"}, metrics_fn=_wm, derived=derived
                )
            committed = store.manifest(version)["metrics"]
            wm = committed["watermarks"]
            row = [
                round_no,
                store.rows_in_round("seen", round_no, version),
                store.rows_in_round("frontier", round_no, version),
                store.rows_in_round("discovered", round_no, version),
                store.rows_in_round("failures", round_no, version),
                int(committed["wall_s"] * 1000),
            ]
            metrics_rows.append(row)
            if async_extract and store.rows_in_round("discovered", round_no, version) > 0:
                _submit_extract(version, row, t0, wm)
            round_no += 1
            rounds_done += 1
            if (
                backlog
                and store.count("frontier") == 0
                and store.rows_in_round("seen", round_no - 1, version) == 0
            ):
                # sterile round: hot drained AND the refill (which definitely
                # ran — hot was empty) promoted nothing admissible, so every
                # physical cold row is consumed or dead. Without this check
                # the nonzero physical cold count would loop forever.
                break
    finally:
        # every exit path (drain, max_rounds, sterile break, error)
        # must land the in-flight extraction commit — otherwise the
        # summary undercounts and the executor pool leaks threads.
        try:
            _await_pending()
        finally:
            if pool is not None:
                pool.shutdown(wait=True)


def recover(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore,
    cfg: RoundConfig | None = None,
    max_passes: int | None = None,
) -> int:
    """Recovery stage (reference 3-stage recovery,
    ``crawler/extraction.py:215-267``, ``README.md:64``): re-fetch and
    re-extract every failed URL with attempts remaining, in waves, until
    the retry list drains or every url exhausts ``cfg.max_attempts``.

    Each wave is one atomic commit appending to extracted (+ the derived
    failures sink — a repeated failure adds the attempt row that
    eventually retires the url), so a killed recovery resumes exactly
    like the crawl does. Returns the number of waves run. Transient
    fetch failures (a page missing one round, present later — the
    network-flake analog in the table-fetch sandbox) are recovered here;
    deterministic failures self-terminate at the attempt cap."""
    cfg = cfg or RoundConfig()
    with _loop_aqe(spark, cfg):
        return _recover(spark, pages, store, cfg, max_passes)


def _recover(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore,
    cfg: RoundConfig,
    max_passes: int | None,
) -> int:
    page_urls = _corpus_urls(pages)
    passes = 0
    # attempt counts grow by 1 per repeated failure, so max_attempts
    # bounds the loop even without the isEmpty check
    limit = max_passes if max_passes is not None else cfg.max_attempts
    for _ in range(limit):
        failures = store.read(spark, "failures")
        if failures is None:
            break
        ext = store.read(spark, "extracted")
        succeeded = None
        if ext is not None:
            succeeded = ext.filter(
                F.col("extraction_status") == "success"
            ).select(F.col("url").alias("url_canon"))
        retry = retry_candidates(failures, succeeded, cfg.max_attempts)
        # BOUNDED localCheckpoint — the invariant that keeps this safe
        # where a corpus checkpoint is not (_corpus_urls): |retry| <=
        # |distinct failed urls| <= one crawl's failure row count, i.e.
        # round-sized, never corpus-sized. Materializing once lets the
        # emptiness probe, the pushdown probe and the fetch share the
        # work AND pins the row set, which the fetch pushdown's
        # probe/join consistency relies on (plans/round.fetch_join).
        # An executor loss during a wave costs only that wave's retry
        # list — recomputed from the durable failures table on rerun.
        retry = retry.localCheckpoint(eager=True)
        if retry.isEmpty():
            break
        round_no = store.manifest()["round"] + 1
        extracted = recovery_pass(retry, pages, cfg, page_urls)
        store.commit(
            round_no,
            {"extracted": (extracted, APPEND)},
            {"phase": "recovery"},
            derived={
                "failures": (
                    "extracted",
                    lambda df, r=round_no: failures_projection(df, r),
                    APPEND,
                )
            },
        )
        passes += 1
    return passes


def _summary(store: SnapshotStore, metrics_rows) -> CrawlSummary:
    return CrawlSummary(
        rounds=len(metrics_rows),
        visited=store.count("seen"),
        discovered=store.count("discovered"),
        extracted=store.count("extracted"),
        failures=store.count("failures"),
        queue_remaining=store.count("frontier"),
        cold_backlog=store.count("frontier_cold"),
        metrics=metrics_rows,
    )


def compact_cold(spark: SparkSession, store: SnapshotStore) -> int:
    """Physically drop consumed cold-backlog rows (those below the
    per-host ``frontier_bound`` watermark). Consumption during the crawl
    is a logical delete — the watermark — so ordinary rounds never
    rewrite the backlog; this optional maintenance rewrite reclaims the
    space, like an Iceberg compaction. Returns rows kept."""
    cold = store.read(spark, "frontier_cold")
    if cold is None:
        return 0
    bound = store.read(spark, "frontier_bound")
    live = live_cold_rows(cold, bound)
    round_no = store.manifest()["round"]
    store.commit(
        round_no, {"frontier_cold": (live, REPLACE)}, {"phase": "compact"}
    )
    return store.count("frontier_cold")
