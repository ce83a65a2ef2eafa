"""Host-capacity probe: N fully INDEPENDENT copies of the scaling
bench's lo-level job (local[4], task.cpus=4, own SparkSession, own synth
input, own snapshot store), each pinned to its own disjoint 4-core
cpuset, running concurrently.

The copies share NOTHING engine-side — no shuffle, no driver, no store,
no JVM — so any per-copy slowdown vs the solo lo measurement is pure
host behavior (vCPU co-scheduling / memory-bandwidth throttling), not
engine scaling. This bounds what ANY engine could show on this VM:

    host_capacity_factor = aggregate_pages_per_sec / (n_copies * solo_pps)

and decomposes the N->4N scaling number into host-delivered capacity vs
engine efficiency at using it.

Usage: python scripts/host_capacity_probe.py [n_pages] [n_copies] [solo_pps]
Writes HOST_CAPACITY.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from scaling_bench import CHILD  # noqa: E402  (same job, byte-identical)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    solo_pps = float(sys.argv[3]) if len(sys.argv) > 3 else None
    code = CHILD.format(repo=REPO, cpus=4, n_pages=n_pages, mode="threads")
    procs = []
    t0 = time.time()
    for i in range(n_copies):
        cpuset = f"{4 * i}-{4 * i + 3}"
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", cpuset, sys.executable, "-c", code],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
        )
    results = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=7200)
        got = [
            json.loads(line[len("RESULT "):])
            for line in out.splitlines()
            if line.startswith("RESULT ")
        ]
        # a dead/silent copy must abort the probe: dividing a 3-copy
        # aggregate by n_copies*solo would understate host capacity and
        # present it as a 4-copy measurement
        if p.returncode != 0 or not got:
            raise RuntimeError(
                f"probe copy {i} failed (rc={p.returncode}, "
                f"{len(got)} RESULT lines) — aggregate would be invalid"
            )
        results.extend(got)
    wall = time.time() - t0
    agg = sum(r["pages_per_sec"] for r in results)
    doc = {
        "n_pages": n_pages,
        "n_copies": n_copies,
        "copies": results,
        "aggregate_pps": round(agg, 1),
        "probe_wall_s": round(wall, 1),
        "solo_lo_pps": solo_pps,
        "host_capacity_factor": (
            round(agg / (n_copies * solo_pps), 3) if solo_pps else None
        ),
        "note": (
            "independent jobs, disjoint cpusets, zero engine coupling — "
            "per-copy slowdown vs solo is pure host throttling"
        ),
    }
    print(json.dumps(doc))
    with open(os.path.join(REPO, "HOST_CAPACITY.json"), "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
