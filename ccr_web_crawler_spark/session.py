"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the 100TB design point (AQE on, skew-join splitting,
Arrow for pandas UDFs) but sized down via env for local[<n>] testing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _master_task_slot_cores(master: str) -> int:
    """Cores available to a single task under this master: total cores
    for local[N], per-executor cores for local-cluster[n,C,mem].
    Unknown masters (yarn, spark://) return a large number — the
    cluster manager, not this clamp, owns slot sizing there."""
    import re

    m = re.match(r"local\[(\d+|\*)\]", master)
    if m:
        return os.cpu_count() or 1 if m.group(1) == "*" else int(m.group(1))
    m = re.match(r"local-cluster\[\s*\d+\s*,\s*(\d+)", master)
    if m:
        return int(m.group(1))
    return 1 << 16


def get_spark(
    app_name: str = "ccr_web_crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    task_cpus: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(8, int(cpus) if cpus.isdigit() else 32)
    if task_cpus is None:
        task_cpus = int(os.environ.get("SPARK_GRAFT_TASK_CPUS", "2"))
    # spark.task.cpus greater than the scheduler's per-slot core count
    # means no task can EVER be scheduled — local[1] with task.cpus=2
    # hangs silently. Clamp to what the master actually offers.
    task_cpus = max(1, min(task_cpus, _master_task_slot_cores(master)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Every hot stage in this engine pairs a JVM Arrow feeder thread
        # with a python worker process that compute CONCURRENTLY, so one
        # task really occupies two cores. Advertising that (task.cpus=2)
        # keeps concurrent tasks at cores/2 and the machine exactly
        # subscribed. Measured on the 20k-page crawl at local[32]:
        # task.cpus=1 → 64 active threads on 32 vCPUs, futex-storm
        # convoys, 2677 CPU-s, 97 pages/s; task.cpus=2 → 1087 CPU-s,
        # 215 pages/s. Same rule on a real cluster: size
        # executor-cores/task slots to leave one core per python worker.
        .config("spark.task.cpus", str(task_cpus))
        # the crawl driver overlaps each round's extraction commit with
        # the next round's dedupe/admit/link stages (plans/driver.py).
        # Under FIFO the earlier extraction job's task backlog starves
        # the next round's small stages; FAIR with the extraction thread
        # in its own pool ("extract", set via thread-local property)
        # gives both an equal share of slots — work-conserving: a lone
        # job still gets every slot.
        .config("spark.scheduler.mode", "FAIR")
        .config(
            "spark.sql.adaptive.enabled",
            os.environ.get("SPARK_GRAFT_AQE", "true"),
        )
        .config(
            "spark.sql.adaptive.coalescePartitions.enabled",
            os.environ.get("SPARK_GRAFT_AQE_COALESCE", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # rows through the extract UDFs carry ~100KB html/text blobs; the
        # 10k-row default Arrow batch becomes ~1GB of humongous G1
        # allocations per batch and destabilizes the JVM — cap ≈200MB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config("spark.sql.session.timeZone", "UTC")
        # -Xmx is a cap, not a reservation; the bench page corpora plus
        # per-round checkpoints overflow a small heap into GC churn
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # only meaningful off local[*] (local-cluster / real clusters);
        # local-cluster's worker-capacity arg does NOT size the executor
        # heap — without this executors run at the 1g default and OOM on
        # html-bearing Arrow batches
        .config("spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fetch pushdown (plans/round.fetch_join): a round's candidate
        # urls are pushed as an In(url) predicate into the pages scan.
        # Above this threshold Spark degrades parquet In-pushdown to a
        # min/max RANGE filter, which is useless for a url set spanning
        # many hosts on a sorted corpus — keep the precise In form for
        # any set fetch_pushdown_limit (1024) allows. Not higher: the
        # Or-chain parquet builds for a pushed In overflows the default
        # thread stack around ~1.5k terms and its evaluation cost grows
        # linearly past the full-scan cost by ~4k.
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "2048")
    )
    return builder.getOrCreate()
