"""Scaling-efficiency evidence (BASELINE.json north_rule): run the SAME
crawl job on the SAME input at two parallelism levels — local[8] vs
local[32] on this 32-core host, the sandbox stand-in for N vs 4N
executors — and report both throughputs plus
``efficiency = (throughput_32 / throughput_8) / 4``.

Methodology for this sandbox (documented in BASELINE.md): the VM runs
under heavy, bursty hypervisor CPU steal (cumulative steal ≈ 40-50% of
busy time in /proc/stat), so each level runs ``repeats`` times
interleaved (8, 32, 8, 32, ...) and the MIN wall time per level is
used — min is the standard estimator under external contention. Each
run also records the process-tree CPU seconds (steal-insensitive): the
ratio of CPU-seconds between levels shows work inflation from extra
parallelism, separating engine scalability from hypervisor throttling.

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
spark = get_spark(app_name="scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
kw = dict(doc_paras=(120, 200), para_words=40, branching=16, nav_fraction=0.08)
pages = synth_pages(spark, n_pages={n_pages}, n_hosts=8, partitions=cpus, **kw)
pages = pages.localCheckpoint(eager=True)
with tempfile.TemporaryDirectory() as tmp:  # JIT/codegen warmup
    crawl(spark, synth_pages(spark, 100, 2).localCheckpoint(eager=True), synth_seeds(spark),
          SnapshotStore(os.path.join(tmp, "w")), RoundConfig(seq_partitions=4), max_rounds=3)
with tempfile.TemporaryDirectory() as tmp:
    store = SnapshotStore(os.path.join(tmp, "c"))
    t0 = time.time()
    s = crawl(spark, pages, synth_seeds(spark), store,
              RoundConfig(seq_partitions=max(4, cpus // 2)), max_rounds=32)
    wall = time.time() - t0
spark.stop()
ru_s = resource.getrusage(resource.RUSAGE_SELF)
ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
cpu_s = ru_s.ru_utime + ru_s.ru_stime + ru_c.ru_utime + ru_c.ru_stime
done = s.visited + s.extracted
print("RESULT " + json.dumps({{
    "cpus": cpus, "wall_s": round(wall, 1), "pages_per_sec": round(done / wall, 1),
    "pages": done, "rounds": s.rounds, "cpu_s": round(cpu_s, 1)}}))
"""


def run_level(cpus: int, n_pages: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, n_pages=n_pages)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs: dict[int, list[dict]] = {8: [], 32: []}
    for i in range(repeats):
        for cpus in (8, 32):
            r = run_level(cpus, n_pages)
            runs[cpus].append(r)
            print(f"[scaling] round {i} local[{cpus}]: {r['pages_per_sec']} p/s "
                  f"(wall {r['wall_s']}s, cpu {r['cpu_s']}s)", file=sys.stderr, flush=True)
    best8 = max(runs[8], key=lambda r: r["pages_per_sec"])
    best32 = max(runs[32], key=lambda r: r["pages_per_sec"])
    eff = (best32["pages_per_sec"] / best8["pages_per_sec"]) / 4.0
    print(json.dumps({
        "n_pages": n_pages,
        "repeats": repeats,
        "local8": runs[8],
        "local32": runs[32],
        "best_local8_pps": best8["pages_per_sec"],
        "best_local32_pps": best32["pages_per_sec"],
        "speedup_8_to_32": round(best32["pages_per_sec"] / best8["pages_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "cpu_s_ratio_32_over_8": round(best32["cpu_s"] / best8["cpu_s"], 3),
    }))


if __name__ == "__main__":
    main()
