"""Scaling-efficiency evidence (BASELINE.json north_rule): run the SAME
crawl job on the SAME input at two cluster sizes — N vs 4N executors —
and report both throughputs plus
``efficiency = (throughput_hi / throughput_lo) / 4``.

Headline configuration: ``executors`` mode, 1 vs 4 executors
(``local-cluster[N,2,8192]`` — N real executor JVMs x 2 cores each,
independent heaps/GC/python workers, the package shipped to executors
as a --py-files-style zip), each level pinned to its own cpuset
(2N+2 cores: 2 per executor + 2 for the driver at both levels).

Why 1-vs-4 and not 8-vs-32 threads — measured host characterization
(all at 20k pages; details in BASELINE.md):

* ``busy_cores`` (from /proc/stat over the run) PLATEAUS at ~10 in
  every wide run: this "32-vCPU" VM delivers only ~10 cores of
  simultaneous physical compute, so no experiment above that ceiling
  can express a 4x speedup — wide levels measure the hypervisor, not
  the engine;
* process-tree CPU-seconds for the identical job: ~530-700 at <=4
  concurrent tasks (local[4], local[8], local[16]+task.cpus=4) vs
  ~1570-2230 at 8 concurrent tasks and ~2230-5010 at 16 — a 3-4x
  work inflation that switches on with >4 concurrent python-paired
  tasks regardless of core count, the signature of vCPU
  co-scheduling/bandwidth throttling, not engine overhead (same
  shuffle/plan shape at every level);
* the host also shows bursty multi-minute noise windows (kernel
  "sched: DL replenish lagged", sys-time inflates 3-4x; identical
  runs measured 72.9s vs 304.0s), so each level runs ``repeats``
  times interleaved (lo, hi, lo, hi, ...) and the MIN wall per level
  is used — min is the standard estimator under external contention.

Each run records its own process-subtree CPU seconds (descendants of
this run only — a blanket per-comm glob would count unrelated
sessions): the CPU ratio between levels separates engine scalability
from host throttling. Each level runs in its own subprocess (a JVM's
master is fixed at startup). Prints one JSON line and writes
SCALING.json; BASELINE.md carries the narrative.

Usage: python scripts/scaling_bench.py [n_pages] [repeats] [lo] [hi] [mode]
  mode: "executors" (local-cluster, default for evidence) | "threads"
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
    master = f"local-cluster[{{cpus}},2,8192]"
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
# sorted by url (production corpus layout) so fetch pushdown can prune
synth_pages(spark, n_pages={n_pages}, n_hosts=8, partitions=cpus, **kw) \
    .repartitionByRange(max(cpus, 8), "url").sortWithinPartitions("url") \
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
# JVM + python-worker CPU from /proc, restricted to THIS process's
# descendant tree (a blanket java/python glob would count unrelated
# sessions on the host and poison the work-inflation signal); includes
# each process's reaped-children counters so dead pyspark workers are
# still accounted via their daemon parent. Taken BEFORE spark.stop()
# while the JVM is alive; getrusage(CHILDREN) then catches the reaped
# JVM as a cross-check.
import glob
tick = os.sysconf("SC_CLK_TCK")
me = os.getpid()
ppids, cpus_by_pid = dict(), dict()  # noqa: C408 — CHILD is a .format template; literal braces would need escaping
for stat in glob.glob("/proc/[0-9]*/stat"):
    try:
        raw = open(stat).read()
        parts = raw.rsplit(") ", 1)[1].split()
        pid = int(raw.split(" ", 1)[0])
        ppids[pid] = int(parts[1])
        cpus_by_pid[pid] = (
            int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])
        ) / tick
    except (OSError, IndexError, ValueError):
        pass
def _mine(pid):
    seen = set()
    while pid not in seen and pid > 1:
        if pid == me:
            return True
        seen.add(pid)
        pid = ppids.get(pid, 0)
    return False
proc_cpu = sum(c for pid, c in cpus_by_pid.items() if _mine(pid))
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
    "steal_cores": round(steal / tickc / wall, 2),
    # per-round (pages_fetched, wall_s): exposes the fixed per-round
    # serial term (driver commit + plan compile) vs row-proportional
    # compute — the Amdahl decomposition BASELINE.md reports
    "round_walls": [[m[1], round(m[5] / 1000, 1)] for m in s.metrics]}}))
# the synthesized corpus is ~1.7GB per 120k pages; leaked dirs filled
# the disk once — always reclaim
import shutil as _sh
_sh.rmtree(pages_dir, ignore_errors=True)
"""


def run_level(cpus: int, n_pages: int, mode: str = "threads") -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, n_pages=n_pages, mode=mode)
    # pin the level to exactly `cpus` physical CPUs: without confinement
    # a local[8] job's python workers silently borrow the host's other
    # 24 cores, overstating the small level and understating scaling
    # efficiency — the cpuset is the sandbox rendition of "an N-executor
    # cluster owns N executors' worth of cores".
    # threads mode: `cpus` = thread count = executor cores. executors
    # mode: `cpus` = executor count, each local-cluster executor owns 2
    # cores. BOTH modes get +2 cores for the driver (a real cluster's
    # driver node is not carved out of executor cores) — the SAME +2 at
    # both levels, so the core RATIO between levels stays exactly 4 on
    # the executor side. Without it the lo level thrashes (driver JVM +
    # GC + python daemon time-slice against the single task pair), which
    # DEGRADES lo and therefore OVERSTATES efficiency — the round-2
    # 2v8-without-headroom run measured a nonsense 1.88 for exactly this
    # reason. Headroom at both levels is the conservative direction.
    n_cores = cpus + 2 if mode == "threads" else 2 * cpus + 2
    cmd = ["taskset", "-c", f"0-{n_cores - 1}", sys.executable, "-c", code]
    last_log = None
    for attempt in range(2):  # local-cluster startup is occasionally flaky
        # generous: the child synthesizes the corpus on the LEVEL's own
        # cores before the timed crawl — at 120k pages on a 2-core lo
        # level that prelude alone runs ~15 min
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=9000)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        last_log = f"/tmp/scaling_child_{mode}{cpus}_try{attempt}.log"
        with open(last_log, "w") as f:
            f.write("==== STDOUT ====\n" + out.stdout + "\n==== STDERR ====\n" + out.stderr)
        print(f"[scaling] cpus={cpus} attempt {attempt} produced no RESULT; "
              f"full child log: {last_log}", flush=True)
    raise RuntimeError(f"no RESULT from cpus={cpus}; see {last_log}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo_n = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    hi_n = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    mode = sys.argv[5] if len(sys.argv) > 5 else "executors"
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
    # carry forward analysis keys a raw re-run doesn't produce (the
    # zero-coupling host-capacity control and history) so a fresh
    # measurement can't silently erase the normalization evidence;
    # recompute the normalized number against the preserved control
    # when the input sizes match (the control is width-specific).
    path = os.path.join(REPO, "SCALING.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        for k in ("host_capacity_control", "capacity_normalized_note",
                  "history_20k", "estimator_note", "analysis",
                  "samewindow", "samewindow_points", "curve"):
            if k in prev and k not in result:
                result[k] = prev[k]
        ctl = result.get("host_capacity_control") or {}
        # the control is specific to the experiment SHAPE, not just the
        # input size: n_copies disjoint lo-width cpusets. Only normalize
        # when input size, mode and levels all match the run the control
        # was measured for.
        if (
            ctl.get("host_capacity_factor")
            and prev.get("n_pages") == n_pages
            and prev.get("mode") == mode
            and prev.get("levels") == [lo_n, hi_n]
        ):
            result["capacity_normalized_efficiency"] = round(
                eff / ctl["host_capacity_factor"], 2
            )
    print(json.dumps(result))
    # persist next to bench.py so per-round BENCH records embed it
    with open(path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
