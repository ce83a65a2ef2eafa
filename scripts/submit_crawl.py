"""spark-submit entry point for the crawl engine (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Package the library, then submit — the script takes the session the
cluster manager hands it (no master override here; ``--master`` /
executor sizing belong to spark-submit):

    cd /root/repo && zip -qr /tmp/ccr_spark.zip ccr_web_crawler_spark
    spark-submit --master local[8] --py-files /tmp/ccr_spark.zip \
        scripts/submit_crawl.py --pages-parquet /path/to/pages \
        --store /tmp/crawlstore --max-rounds 10

With ``--synth N`` it generates the deterministic synthetic corpus
instead of reading parquet (sandbox mode; on a cluster, point
``--pages-parquet`` at the Iceberg/parquet pages table). Prints one
JSON summary line; optional ``--recover`` runs the repair stage after
the frontier drains (reference 3-stage recovery).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages-parquet", help="parquet/Iceberg pages table path")
    src.add_argument("--synth", type=int, help="generate N synthetic pages")
    ap.add_argument("--store", required=True, help="snapshot store root")
    ap.add_argument("--max-rounds", type=int, default=None)
    ap.add_argument("--n-hosts", type=int, default=8)
    ap.add_argument("--recover", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("ccr_web_crawler_spark.crawl")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from ccr_web_crawler_spark.plans.driver import crawl, recover
    from ccr_web_crawler_spark.plans.round import RoundConfig
    from ccr_web_crawler_spark.sources.synth import (
        synth_pages,
        synth_robots,
        synth_seeds,
    )
    from ccr_web_crawler_spark.sources.tableio import SnapshotStore

    if args.synth:
        pages = synth_pages(spark, n_pages=args.synth, n_hosts=args.n_hosts)
        pages = pages.localCheckpoint(eager=True)
        seeds = synth_seeds(spark)
        robots = synth_robots(spark, n_hosts=args.n_hosts)
    else:
        pages = spark.read.parquet(args.pages_parquet)
        seeds = spark.createDataFrame(
            [(r["url"], 0) for r in pages.select("url").limit(1).collect()],
            "url string, priority int",
        )
        robots = None

    store = SnapshotStore(args.store)
    t0 = time.time()
    summary = crawl(
        spark, pages, seeds, store, RoundConfig(), robots=robots,
        max_rounds=args.max_rounds,
    )
    waves = recover(spark, pages, store) if args.recover else 0
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "rounds": summary.rounds,
                "visited": summary.visited,
                "discovered": summary.discovered,
                "extracted": summary.extracted,
                "failures": summary.failures,
                "queue_remaining": summary.queue_remaining,
                "recovery_waves": waves,
                "wall_s": round(wall, 2),
                "pages_per_sec": round(summary.visited / wall, 2) if wall else None,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
