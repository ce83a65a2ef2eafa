"""Multi-round crawl driver — the Spark shape of the reference's
``crawl_async`` loop (``crawler/discovery.py:253-319``): the ONLY
driver-resident state is the round counter and per-table max-seq
watermarks; everything else lives in snapshot-committed tables.

Each round is one batch job committed atomically via
``SnapshotStore.commit`` (replacing the reference's torn-write
three-file checkpoint, ``crawler/discovery.py:123-155``). A killed run
resumes from the last committed snapshot (``load_checkpoint`` analog,
``crawler/discovery.py:158-188``) and is bit-identical to an
uninterrupted run (tests/test_resume.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccr_web_crawler_spark.functions.urlnorm import canonicalize_col, url_host_udf
from ccr_web_crawler_spark.operators.ids import assign_global_seq
from ccr_web_crawler_spark.plans.round import FRONTIER_COLS, RoundConfig, run_round
from ccr_web_crawler_spark.sources.tableio import APPEND, REPLACE, SnapshotStore


@dataclass
class CrawlSummary:
    rounds: int
    visited: int
    discovered: int
    extracted: int
    failures: int
    queue_remaining: int
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
    manifest = store.manifest()
    if manifest is None:
        frontier = init_frontier(spark, seeds, cfg)
        store.commit(-1, {"frontier": (frontier, REPLACE)}, {"phase": "seeded"})
        manifest = store.manifest()
    round_no = manifest["round"] + 1

    metrics_rows = []
    rounds_done = 0
    while max_rounds is None or rounds_done < max_rounds:
        frontier = store.read(spark, "frontier")
        if frontier is None or frontier.isEmpty():
            break
        seen = store.read(spark, "seen")
        discovered = store.read(spark, "discovered")
        extracted_urls = None
        ext = store.read(spark, "extracted")
        if ext is not None:
            extracted_urls = ext.select(F.col("url").alias("url_canon"))
        max_seq = {
            "frontier": _max_seq(frontier),
            "discovered": _max_seq(discovered),
        }
        t0 = time.time()
        result = run_round(
            spark,
            round_no,
            frontier,
            seen,
            discovered,
            extracted_urls,
            pages,
            robots,
            cfg,
            max_seq=max_seq,
        )
        tables: dict[str, tuple[DataFrame, str]] = {
            "frontier": (result.next_frontier, REPLACE),
            "seen": (result.new_seen, APPEND),
            "discovered": (result.new_discovered, APPEND),
        }
        if result.extracted is not None:
            tables["extracted"] = (result.extracted, APPEND)
            tables["failures"] = (result.failures, APPEND)
        # one action per table happens inside commit's parquet writes —
        # counts come back from the committed files (no extra jobs)
        version = store.commit(round_no, tables, {"phase": "round"})
        m = store.manifest(version)
        wall = time.time() - t0
        row = _round_metrics(spark, store, round_no, wall)
        metrics_rows.append(row)
        store.commit(
            round_no,
            {"metrics": (spark.createDataFrame([row], METRICS_SCHEMA), APPEND)},
            {"phase": "metrics", "wall_s": wall},
        )
        round_no += 1
        rounds_done += 1

    return _summary(spark, store, metrics_rows)


METRICS_SCHEMA = (
    "round int, pages_fetched long, links_extracted long, sections_discovered long, "
    "failures long, wall_ms long"
)


def _max_seq(df: DataFrame | None) -> int:
    if df is None:
        return 0
    row = df.agg(F.max("seq").alias("m")).collect()[0]
    return (row["m"] if row["m"] is not None else -1) + 1


def _count(spark, store, table) -> int:
    df = store.read(spark, table)
    return df.count() if df is not None else 0


def _round_metrics(spark, store, round_no, wall) -> tuple:
    seen = store.read(spark, "seen")
    fetched = (
        seen.filter(F.col("first_round") == round_no).count() if seen is not None else 0
    )
    disc = store.read(spark, "discovered")
    new_disc = 0
    if disc is not None:
        new_disc = disc.count()  # cumulative; per-round delta derivable
    fails = _count(spark, store, "failures")
    return (round_no, fetched, 0, new_disc, fails, int(wall * 1000))


def _summary(spark, store, metrics_rows) -> CrawlSummary:
    frontier = store.read(spark, "frontier")
    return CrawlSummary(
        rounds=len(metrics_rows),
        visited=_count(spark, store, "seen"),
        discovered=_count(spark, store, "discovered"),
        extracted=_count(spark, store, "extracted"),
        failures=_count(spark, store, "failures"),
        queue_remaining=frontier.count() if frontier is not None else 0,
        metrics=metrics_rows,
    )
