"""Hardware parallelism ceiling: raw CPU throughput vs process count.

The north-rule scaling criterion is evidenced at two parallelism
levels on this single VM. This microbenchmark measures what the VM's
hardware itself delivers — pure-python integer work, one process per
parallel slot, NO Spark — so Spark-level scaling numbers can be read
against the actual CPU ceiling instead of the advertised core count.

On the sandbox host, 32 advertised vCPUs deliver only ~2x the
throughput of 8 processes (oversubscribed/steal-throttled beyond ~8-16
runnable threads), which bounds ANY engine's 8->32 efficiency at
~0.5 regardless of its shuffle/partition design. The 2->8 range is
where the hardware scales honestly, hence the headline N-vs-4N
measurement uses 2 vs 8 cores (BENCH/scaling.json).

Usage: python scripts/bench_cpu_ceiling.py [out_json]
Writes BENCH/cpu_ceiling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N = 20_000_000
REPS = 3


def burn(args) -> float:
    (n,) = args
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i
    return time.time() - t0


def throughput(procs: int) -> float:
    """Best-of-REPS tasks/sec with ``procs`` concurrent processes."""
    best = 0.0
    with mp.Pool(procs) as pool:
        for _ in range(REPS):
            t0 = time.time()
            pool.map(burn, [(N,)] * procs)
            wall = time.time() - t0
            best = max(best, procs / wall)
    return best


def main() -> int:
    out = (
        sys.argv[1] if len(sys.argv) > 1 else "BENCH/cpu_ceiling.json"
    )
    levels = [1, 2, 8, 32]
    tput = {p: round(throughput(p), 3) for p in levels}
    result = {
        "advertised_cpus": os.cpu_count(),
        "task": f"sum(i*i) over {N} ints, best of {REPS}",
        "tasks_per_sec": {str(p): tput[p] for p in levels},
        "hw_efficiency_2v8": round(tput[8] / (4 * tput[2]), 3),
        "hw_efficiency_8v32": round(tput[32] / (4 * tput[8]), 3),
        "loadavg_before": os.getloadavg()[0],
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
