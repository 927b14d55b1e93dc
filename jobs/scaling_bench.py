"""Two-parallelism scaling evidence (north_rule: >= 0.8 throughput
scaling efficiency between N and 4N executors).

No real cluster exists in this sandbox, so per the driver instruction
the SAME job and input run at two local parallelism levels (default
local[8] vs local[32]) with IDENTICAL partition counts — only
executor-thread parallelism varies. Efficiency:

    eff = throughput_4N / (4 * throughput_N)  = T_N / (4 * T_4N)

where throughput = docs indexed / build wall sec (docs table already
materialized; the timed region is the index build itself).

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gxdindexer_spark.operators.index_build import IndexBuilder  # noqa: E402
from gxdindexer_spark.operators.query import IndexQueryEngine  # noqa: E402
from gxdindexer_spark.session import get_spark  # noqa: E402
from gxdindexer_spark.sources.synth import generate_corpus  # noqa: E402
from gxdindexer_spark.sources.tables import prepare_docs  # noqa: E402

QUERIES = ["parseIndexList if", "mergeShardStats byte_offset", "the import scan"]


def run_once(master: str, n_docs: int, partitions: int, seed: int) -> dict:
    import shutil

    cores = int(master.split("[")[1].rstrip("]"))
    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=master,
        shuffle_partitions=partitions,
    )
    idx = f"/tmp/gxdidx_scale_{cores}"
    shutil.rmtree(idx, ignore_errors=True)
    corpus = generate_corpus(spark, n_docs, seed=seed, partitions=partitions)
    docs = prepare_docs(
        corpus, docs_per_shard=max(n_docs // 16, 1000), partitions=partitions
    ).persist()
    docs.count()  # materialize BEFORE the timed build
    # warm the Python workers so worker spin-up isn't charged to one run
    spark.range(10000).selectExpr("sum(id)").collect()
    builder = IndexBuilder(
        docs_per_shard=max(n_docs // 16, 1000), salt_range=8192
    )
    t0 = time.monotonic()
    m = builder.build(docs, idx, resume=False)
    wall = time.monotonic() - t0
    eng = IndexQueryEngine(spark, idx)
    lats = []
    for q in QUERIES:
        tq = time.monotonic()
        eng.topk(q, k=10, mode="wand").collect()
        lats.append(round(time.monotonic() - tq, 3))
    spark.stop()
    return {
        "master": master,
        "cores": cores,
        "partitions": partitions,
        "n_docs": m["n_docs"],
        "n_postings": m["n_postings"],
        "bytes_compressed": m["bytes_compressed"],
        "build_wall_sec": round(wall, 3),
        "docs_per_sec": round(m["n_docs"] / wall, 2),
        "postings_per_sec": round(m["n_postings"] / wall, 1),
        "query_lat_sec": lats,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=100_000)
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--low", default="local[8]")
    p.add_argument("--high", default="local[32]")
    p.add_argument("--repeat", type=int, default=1,
                   help="reps per level; min wall wins (least-interference "
                        "sample — the sandbox host has noisy neighbors)")
    p.add_argument("--max-load", type=float, default=0.0,
                   help="loadavg gate: wait (up to --gate-timeout sec) "
                        "until 1-min loadavg drops below this before each "
                        "rep; 0 disables. Makes the measurement honest on "
                        "a shared host instead of silently contended.")
    p.add_argument("--gate-timeout", type=float, default=900.0)
    p.add_argument("--out", default="BENCH/BASELINE.md")
    p.add_argument("--json-out", default="BENCH/scaling.json")
    p.add_argument(
        "--single",
        help="subprocess mode: run ONE parallelism level, print JSON",
    )
    args = p.parse_args()

    if args.single:
        print(
            "RESULT:"
            + json.dumps(
                run_once(args.single, args.docs, args.partitions, args.seed)
            )
        )
        return 0

    # each parallelism level runs in its OWN subprocess: a fresh JVM and
    # fresh python workers per measurement, no cross-session residue.
    import subprocess

    def spawn(master: str) -> dict:
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--single", master,
            "--docs", str(args.docs),
            "--partitions", str(args.partitions),
            "--seed", str(args.seed),
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, check=True
        ).stdout
        for line in out.splitlines():
            if line.startswith("RESULT:"):
                return json.loads(line[len("RESULT:"):])
        raise RuntimeError(f"no RESULT line from {master}")

    def gate() -> float:
        """Block until the host is quiet enough to measure (or the
        gate times out — recorded either way, never silent)."""
        t0 = time.monotonic()
        load = os.getloadavg()[0]
        while (
            args.max_load > 0
            and load > args.max_load
            and time.monotonic() - t0 < args.gate_timeout
        ):
            time.sleep(10)
            load = os.getloadavg()[0]
        return load

    def best_of(master: str) -> dict:
        """min-wall of N reps: the sandbox host carries noisy-neighbor
        load (loadavg >10 while idle), so the fastest rep is the
        least-interfered sample of the engine's true cost."""
        reps = []
        for _ in range(max(args.repeat, 1)):
            load = gate()
            r = spawn(master)
            r["loadavg_before"] = load
            reps.append(r)
        best = min(reps, key=lambda r: r["build_wall_sec"])
        best["rep_walls"] = [r["build_wall_sec"] for r in reps]
        best["loadavg_all_reps"] = [r["loadavg_before"] for r in reps]
        return best

    lo = best_of(args.low)
    hi = best_of(args.high)
    ratio = hi["cores"] / lo["cores"]
    eff = hi["docs_per_sec"] / (ratio * lo["docs_per_sec"])
    result = {
        "n_docs": args.docs,
        "partitions": args.partitions,
        "low": lo,
        "high": hi,
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "meets_0.8": eff >= 0.8,
    }
    print(json.dumps(result))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(args.out, "w") as fh:
        fh.write(
            f"""# BENCH/BASELINE — scaling evidence ({stamp})

North rule requires >= 0.8 throughput scaling efficiency between N and
4N executors. No real cluster exists in this sandbox, so the identical
job + input (deterministic synthetic corpus, seed={args.seed},
{args.docs} docs, {args.partitions} partitions fixed across both runs)
ran at two parallelism levels; only executor-thread count varies.

| run | cores | build wall (s) | docs/sec | postings/sec | query p50 (s) |
|---|---|---|---|---|---|
| N  | {lo['cores']} | {lo['build_wall_sec']} | {lo['docs_per_sec']} | {lo['postings_per_sec']} | {sorted(lo['query_lat_sec'])[1]} |
| 4N | {hi['cores']} | {hi['build_wall_sec']} | {hi['docs_per_sec']} | {hi['postings_per_sec']} | {sorted(hi['query_lat_sec'])[1]} |

- corpus: {lo['n_docs']} docs, {lo['n_postings']} postings,
  {lo['bytes_compressed']} bytes compressed (identical in both runs)
- **scaling efficiency = throughput_4N / (4 x throughput_N) =
  {result['scaling_efficiency']}** ({'meets' if result['meets_0.8'] else 'BELOW'} the 0.8 bar)

Method notes: docs table materialized (persisted + counted) before the
timed region; Python workers pre-warmed; timed region = full index
build (tokenize -> salted SPIMI encode -> merge -> parquet write +
stats finalize). Raw JSON: {args.json_out}.
"""
        )
    with open(args.json_out, "w") as fh:
        json.dump(result, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
