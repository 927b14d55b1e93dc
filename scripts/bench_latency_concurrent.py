"""Concurrent query serving: p50/p99 latency at 1/4/8 clients.

The 100-TB story is a serving cluster, and sequential latency numbers
(scripts/bench_latency.py) can't show whether queries serialize on the
driver. This harness runs N client threads against ONE engine, each
thread tagged with its own FAIR scheduler pool (the same
``spark.scheduler.pool`` local-property plumbing the build
orchestrator uses, jobs/orchestrate.py:98-101), so concurrent queries
interleave stage-fairly instead of queueing FIFO behind each other.

Each client issues the full query mix REPS times; latencies are
per-call wall seconds across ALL clients (no min-of: under load the
distribution IS the result). Throughput = total queries / wall.

Usage: python scripts/bench_latency_concurrent.py [sf_dir] [out_json]
Writes BENCH/latency_concurrent.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util  # noqa: E402

from gxdindexer_spark.operators.index_build import IndexBuilder  # noqa: E402
from gxdindexer_spark.operators.query import IndexQueryEngine  # noqa: E402
from gxdindexer_spark.session import get_spark  # noqa: E402

REPS = 2
CONCURRENCY = (1, 4, 8)

# the serving mix: common singles, multi-term ANDs, boolean, wildcard
QUERIES = [
    ("taat", "spark join table group"),
    ("taat", "window stream batch"),
    ("wand", "customer query filter merge"),
    ("wand", "hash merge sort"),
    ("taat", "scan order key"),
    ("auto", "vector data agg"),
    ("taat", "st* join"),
    ("taat", "+table -merge spark"),
]


def pctl(vals: list[float], p: float) -> float:
    vals = sorted(vals)
    i = min(len(vals) - 1, int(round(p / 100 * (len(vals) - 1))))
    return vals[i]


def run_level(spark, eng: IndexQueryEngine, n_clients: int) -> dict:
    lat: list[float] = []
    lock = threading.Lock()
    errors: list[BaseException] = []

    def client(cid: int) -> None:
        # own FAIR pool per client: stages from different clients
        # interleave fairly (local property is thread-scoped)
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"client-{cid}"
        )
        try:
            mine: list[float] = []
            for rep in range(REPS):
                # offset the mix per client so clients aren't in
                # lockstep on the same term's postings
                for j in range(len(QUERIES)):
                    mode, q = QUERIES[(j + cid) % len(QUERIES)]
                    t0 = time.monotonic()
                    eng.topk(q, k=20, mode=mode).collect()
                    mine.append(time.monotonic() - t0)
            with lock:
                lat.extend(mine)
        except BaseException as e:  # noqa: BLE001
            with lock:
                errors.append(e)
        finally:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", None
            )

    t0 = time.monotonic()
    threads = [
        threading.Thread(target=client, args=(i,), name=f"client-{i}")
        for i in range(n_clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    if errors:
        raise RuntimeError("concurrent client failed") from errors[0]
    n = len(lat)
    return {
        "clients": n_clients,
        "n_queries": n,
        "wall_sec": round(wall, 3),
        "qps": round(n / wall, 2),
        "p50": round(pctl(lat, 50), 3),
        "p95": round(pctl(lat, 95), 3),
        "p99": round(pctl(lat, 99), 3),
        "max": round(max(lat), 3),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/latency_concurrent.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="latency-concurrent",
        master=f"local[{cpus}]",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )

    spec = importlib.util.spec_from_file_location(
        "entrymod",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)

    base = f"/tmp/gxdidx_bench_{os.path.basename(os.path.normpath(sf_dir))}"
    IndexBuilder(
        fields={"content": "simple"},
        docs_per_shard=1000,
        salt_range=512,
        block_size=128,
    ).build(entrymod._docs_for_index(spark, sf_dir), base, resume=True)
    eng = IndexQueryEngine(spark, base)
    eng.topk(QUERIES[0][1], k=20).collect()  # warmup: codegen + footers

    levels = [run_level(spark, eng, c) for c in CONCURRENCY]
    seq_p99 = levels[0]["p99"]
    result = {
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "reps_per_client": REPS,
        "scheduler": "FAIR (one pool per client)",
        "loadavg_at_start": round(os.getloadavg()[0], 2),
        "levels": levels,
        "p99_ratio_8_vs_1": round(levels[-1]["p99"] / seq_p99, 2)
        if seq_p99
        else None,
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result["levels"] and {
        "levels": levels, "p99_ratio_8_vs_1": result["p99_ratio_8_vs_1"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
