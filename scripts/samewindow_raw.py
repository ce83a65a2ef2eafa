"""Same-window RAW N→4N efficiency, without the host-capacity probe:
interleave [lo, hi] cycles back-to-back so both levels see the same
host weather, and take the best pair by the MIN-wall estimator. This
is the cheap companion to samewindow_scaling.py (which adds the
zero-coupling capacity control) — used for extra curve points where
the full protocol's ~45 min window is not warranted.

Usage: python scripts/samewindow_raw.py [n_pages] [cycles] [lo] [hi]
``lo``/``hi`` are thread counts (default 2 and 8 — the documented
N→4N protocol levels; the host's crawl parallelism ceiling at this
input size is ~15 busy cores, so hi levels past 8 measure the job's
own Amdahl floor, not executor scaling). Appends the result under
``curve`` in SCALING.json (tagged ``same_window: true``).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from scaling_bench import run_level  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    n_cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi_cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    factor = hi_cpus / lo_cpus
    log = lambda m: print(f"[swraw] {m}", file=sys.stderr, flush=True)  # noqa: E731
    t0 = time.time()

    cycles = []
    for i in range(n_cycles):
        lo = run_level(lo_cpus, n_pages, "threads")
        log(f"cycle {i} lo local[{lo_cpus}]: {lo['pages_per_sec']} p/s (wall {lo['wall_s']}s)")
        hi = run_level(hi_cpus, n_pages, "threads")
        log(f"cycle {i} hi local[{hi_cpus}]: {hi['pages_per_sec']} p/s (wall {hi['wall_s']}s)")
        cycles.append({
            "lo": lo,
            "hi": hi,
            "raw_efficiency": round(
                hi["pages_per_sec"] / lo["pages_per_sec"] / factor, 3
            ),
        })

    best_lo = max(c["lo"]["pages_per_sec"] for c in cycles)
    best_hi = max(c["hi"]["pages_per_sec"] for c in cycles)
    point = {
        "n_pages": n_pages,
        "levels": [lo_cpus, hi_cpus],
        "same_window": True,
        "cycles": cycles,
        "best_lo_pps": best_lo,
        "best_hi_pps": best_hi,
        "raw_efficiency": round(best_hi / best_lo / factor, 3),
        "per_cycle_raw": [c["raw_efficiency"] for c in cycles],
        "window_wall_s": round(time.time() - t0, 1),
        "note": (
            "lo and hi interleaved per cycle in one session; best level "
            "values by the MIN-wall estimator across cycles"
        ),
    }
    print(json.dumps(point))
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        scaling = json.load(f)
    scaling.setdefault("curve", []).append(point)
    with open(path, "w") as f:
        json.dump(scaling, f, indent=1)


if __name__ == "__main__":
    main()
