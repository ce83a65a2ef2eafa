"""Scaling-efficiency evidence (BASELINE.json north_rule): run the SAME
crawl job on the SAME input at two parallelism levels — local[8] vs
local[32] on this 32-core host, the sandbox stand-in for N vs 4N
executors — and report both throughputs plus
``efficiency = (throughput_32 / throughput_8) / 4``.

Methodology for this sandbox (documented in BASELINE.md):

* each level is PINNED to exactly its core count (``taskset -c 0-N-1``)
  — unconfined, a local[8] job's python workers borrow the host's idle
  24 cores and the small level is overstated;
* the engine advertises ``spark.task.cpus=2`` (session.py): every hot
  stage pairs a JVM Arrow feeder thread with a python worker, so a task
  truly occupies two cores — without this, local[32] runs 64 active
  threads on 32 vCPUs and collapses into futex-convoy scheduling
  (measured: 2677 CPU-s / 97 p/s → 1087 CPU-s / 215 p/s at 20k pages);
* the host shows bursty multi-minute noise windows (kernel "sched: DL
  replenish lagged" periods where sys-time inflates 3-4x), so each
  level runs ``repeats`` times interleaved (8, 32, 8, 32, ...) and the
  MIN wall per level is used — min is the standard estimator under
  external contention. Each run also records process-tree CPU seconds:
  the CPU ratio between levels shows work inflation from parallelism,
  separating engine scalability from host throttling.

Each level runs in its own subprocess (a JVM's master is fixed at
startup). Prints one JSON line; paste the numbers into BASELINE.md.

Usage: python scripts/scaling_bench.py [n_pages] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, json, os, time, tempfile, resource
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
from ccr_web_crawler_spark.session import get_spark
from ccr_web_crawler_spark.sources.tableio import SnapshotStore
from ccr_web_crawler_spark.sources.synth import synth_pages, synth_seeds
from ccr_web_crawler_spark.plans.driver import crawl
from ccr_web_crawler_spark.plans.round import RoundConfig

cpus = {cpus}
mode = {mode!r}
if mode == "executors":
    # N real executor JVMs x 2 cores each — the faithful sandbox
    # rendition of "N vs 4N executors": independent heaps/GC/python
    # workers per executor, scheduler does real cross-executor work.
    # The package ships to executors as a --py-files-style zip.
    master = f"local-cluster[{{cpus}},2,4096]"
    spark = get_spark(app_name="scaling", master=master, shuffle_partitions=2 * cpus)
    import shutil
    zip_base = os.path.join(tempfile.mkdtemp(prefix="pyfiles_"), "ccr_web_crawler_spark")
    shutil.make_archive(zip_base, "zip", {repo!r}, "ccr_web_crawler_spark")
    spark.sparkContext.addPyFile(zip_base + ".zip")
else:
    spark = get_spark(app_name="scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
kw = dict(doc_paras=(120, 200), para_words=40, branching=16, nav_fraction=0.08)
# pages live on parquet like the production Iceberg table → every scan
# is column-pruned instead of deserializing fat in-memory rows
pages_dir = tempfile.mkdtemp(prefix="bench_pages_")
synth_pages(spark, n_pages={n_pages}, n_hosts=8, partitions=cpus, **kw) \
    .write.mode("overwrite").parquet(pages_dir)
pages = spark.read.parquet(pages_dir)
with tempfile.TemporaryDirectory() as tmp:  # JIT/codegen warmup
    crawl(spark, synth_pages(spark, 100, 2).localCheckpoint(eager=True), synth_seeds(spark),
          SnapshotStore(os.path.join(tmp, "w")), RoundConfig(seq_partitions=4), max_rounds=3)
def _cpustat():
    f = open("/proc/stat").readline().split()
    return [int(x) for x in f[1:]]

with tempfile.TemporaryDirectory() as tmp:
    store = SnapshotStore(os.path.join(tmp, "c"))
    st0 = _cpustat()
    t0 = time.time()
    s = crawl(spark, pages, synth_seeds(spark), store,
              RoundConfig(seq_partitions=max(4, cpus // 2)), max_rounds=32)
    wall = time.time() - t0
    st1 = _cpustat()
d = [b - a for a, b in zip(st0, st1)]
busy = d[0] + d[1] + d[2]          # user+nice+system
steal = d[7] if len(d) > 7 else 0  # hypervisor steal during the run
# JVM + python-worker CPU from /proc (the JVM is a py4j child that is
# not reaped by us, so getrusage(RUSAGE_CHILDREN) misses it)
import glob
tick = os.sysconf("SC_CLK_TCK")
proc_cpu = 0.0
for stat in glob.glob("/proc/[0-9]*/stat"):
    try:
        parts = open(stat).read().rsplit(") ", 1)[1].split()
        comm = open(stat).read().split("(", 1)[1].rsplit(")", 1)[0]
        if comm in ("java",) or "pyspark.daemon" in comm or comm.startswith("python"):
            proc_cpu += (int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])) / tick
    except (OSError, IndexError, ValueError):
        pass
spark.stop()
ru_s = resource.getrusage(resource.RUSAGE_SELF)
ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
cpu_s = max(proc_cpu, ru_s.ru_utime + ru_s.ru_stime + ru_c.ru_utime + ru_c.ru_stime)
done = s.visited + s.extracted
tickc = os.sysconf("SC_CLK_TCK")
print("RESULT " + json.dumps({{
    "cpus": cpus, "wall_s": round(wall, 1), "pages_per_sec": round(done / wall, 1),
    "pages": done, "rounds": s.rounds, "cpu_s": round(cpu_s, 1),
    "busy_cores": round(busy / tickc / wall, 2),
    "steal_cores": round(steal / tickc / wall, 2)}}))
"""


def run_level(cpus: int, n_pages: int, mode: str = "threads") -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, n_pages=n_pages, mode=mode)
    # pin the level to exactly `cpus` physical CPUs: without confinement
    # a local[8] job's python workers silently borrow the host's other
    # 24 cores, overstating the small level and understating scaling
    # efficiency — the cpuset is the sandbox rendition of "an N-executor
    # cluster owns N executors' worth of cores".
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi_n = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    mode = sys.argv[5] if len(sys.argv) > 5 else "threads"
    runs: dict[int, list[dict]] = {lo_n: [], hi_n: []}
    for i in range(repeats):
        for cpus in (lo_n, hi_n):
            r = run_level(cpus, n_pages, mode)
            runs[cpus].append(r)
            print(f"[scaling] round {i} local[{cpus}]: {r['pages_per_sec']} p/s "
                  f"(wall {r['wall_s']}s, cpu {r['cpu_s']}s)", file=sys.stderr, flush=True)
    best_lo = max(runs[lo_n], key=lambda r: r["pages_per_sec"])
    best_hi = max(runs[hi_n], key=lambda r: r["pages_per_sec"])
    factor = hi_n / lo_n
    eff = (best_hi["pages_per_sec"] / best_lo["pages_per_sec"]) / factor
    result = {
        "n_pages": n_pages,
        "repeats": repeats,
        "levels": [lo_n, hi_n],
        "mode": mode,
        f"local{lo_n}": runs[lo_n],
        f"local{hi_n}": runs[hi_n],
        "best_lo_pps": best_lo["pages_per_sec"],
        "best_hi_pps": best_hi["pages_per_sec"],
        "speedup": round(best_hi["pages_per_sec"] / best_lo["pages_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    # persist next to bench.py so per-round BENCH records embed it
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
