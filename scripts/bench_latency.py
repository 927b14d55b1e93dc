"""Query-latency percentiles over a 20-query reference set (north
star: "p50/p99 query latency").

Reuses the sf0.1 bench indexes (builder params match bench.py, so
``resume=True`` skips the rebuild) and measures every query under
every retrieval mode (taat / wand / auto), plus the wildcard, boolean
and phrase surfaces. Per (query, mode): min of REPS (drops
noisy-neighbor interference); percentiles are over the per-query mins
— the engine's repeatable cost, not the host's jitter.

Usage: python scripts/bench_latency.py [sf_dir] [out_json]
Writes BENCH/latency.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util  # noqa: E402

from gxdindexer_spark.operators.index_build import IndexBuilder  # noqa: E402
from gxdindexer_spark.operators.query import IndexQueryEngine  # noqa: E402
from gxdindexer_spark.session import get_spark  # noqa: E402

REPS = 3
MODES = ("taat", "wand", "auto")

# mixes: common singles, the one rare term, 2-4 term ANDs of common
# terms, stopword-heavy, must/must-not boolean, and a miss
QUERIES = [
    "spark",
    "dup",
    "stream value",
    "spark join table group",
    "window stream batch",
    "customer query filter merge",
    "the a",
    "big small fast slow",
    "hash merge sort",
    "scan order key",
    "column row line part",
    "vector data agg",
    "dup spark",
    "+table -merge spark",
    "+dup filter",
    "query batch sort group table",
    "zzznotaterm spark",
]
WILDCARDS = ["st* join", "*ble join", "s* t*", "t*e join"]
FUZZIES = ["sow~2 join", "tabl~1 merge"]
PHRASES = [("table part", 0), ("table part", 2), ("spark join", 1)]
# serving surfaces: stored-field paging (offset AND cursor — the
# cursor predicate keeps deep pages at constant shards x k cost,
# offset pages pay offset+k per shard), MLT, spell-suggest, rendered
# highlighting
SORT_OFFSETS = [0, 100, 1000, 5000]
SORT_QUERY = "st* join"


def pctl(vals: list[float], p: float) -> float:
    vals = sorted(vals)
    i = min(len(vals) - 1, int(round(p / 100 * (len(vals) - 1))))
    return vals[i]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/latency.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="latency", master=f"local[{cpus}]")

    spec = importlib.util.spec_from_file_location(
        "entrymod",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)

    base = f"/tmp/gxdidx_bench_{os.path.basename(os.path.normpath(sf_dir))}"
    docs = entrymod._docs_for_index(spark, sf_dir)
    params = dict(
        fields={"content": "simple"},
        docs_per_shard=1000,
        salt_range=512,
        block_size=128,
    )
    IndexBuilder(**params).build(docs, base, resume=True)
    IndexBuilder(**params, with_positions=True).build(
        docs, base + "_pos", resume=True
    )
    eng = IndexQueryEngine(spark, base)
    peng = IndexQueryEngine(spark, base + "_pos")
    eng.topk(QUERIES[0], k=20).collect()  # warmup: codegen + footers
    # cursor for the deep-page probe: resume AFTER the 1000th result
    # (untimed setup — a real client carries the cursor from its last
    # page); measures that search_after depth costs page-1 latency
    cur_rows = eng.sorted_matches(
        SORT_QUERY, by="n_chars", k=1, offset=1000, ascending=False
    ).collect()
    cursor_after = (
        (cur_rows[0]["n_chars"], int(cur_rows[0]["doc_id"]))
        if cur_rows
        else None
    )

    lat: dict[str, dict[str, float]] = {}

    def probe(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        lat.setdefault(name, {})
        lat[name]["min"] = min(lat[name].get("min", dt), dt)

    for rep in range(REPS):
        for q in QUERIES:
            for m in MODES if rep % 2 == 0 else reversed(MODES):
                probe(f"{m}:{q}", lambda q=q, m=m: eng.topk(
                    q, k=20, mode=m).collect())
        for w in WILDCARDS:
            probe(f"wild:{w}", lambda w=w: eng.topk(
                w, k=20, mode="taat").collect())
        for fz in FUZZIES:
            probe(f"fuzzy:{fz}", lambda fz=fz: eng.topk(
                fz, k=20, mode="taat").collect())
        for ph, slop in PHRASES:
            probe(f"phrase{slop}:{ph}", lambda ph=ph, slop=slop:
                  peng.phrase_topk(ph, k=20, slop=slop).collect())
        for off in SORT_OFFSETS:
            probe(f"sorted:off{off}", lambda off=off: eng.sorted_matches(
                SORT_QUERY, by="n_chars", k=20, offset=off,
                ascending=False).collect())
        if cursor_after is not None:
            probe("sorted:cursor_deep", lambda: eng.sorted_matches(
                SORT_QUERY, by="n_chars", k=20, ascending=False,
                after=cursor_after).collect())
        probe("mlt:doc42", lambda: eng.more_like_this(
            42, k=20, mode="auto").collect())
        probe("suggest:sor", lambda: eng.suggest("sor", k=10).collect())
        probe("hl:render", lambda: peng.highlight_topk(
            "spark join table group", k=10, window=16, mode="taat",
            render=True).collect())

    per_mode = {}
    for m in MODES:
        vals = [v["min"] for k, v in lat.items() if k.startswith(f"{m}:")]
        per_mode[m] = {
            "n": len(vals),
            "p50": round(pctl(vals, 50), 3),
            "p95": round(pctl(vals, 95), 3),
            "p99": round(pctl(vals, 99), 3),
            "max": round(max(vals), 3),
        }
    allv = [v["min"] for v in lat.values()]
    result = {
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "reps": REPS,
        "n_probes": len(lat),
        "per_mode": per_mode,
        "all_surfaces": {
            "p50": round(pctl(allv, 50), 3),
            "p95": round(pctl(allv, 95), 3),
            "p99": round(pctl(allv, 99), 3),
            "max": round(max(allv), 3),
        },
        "per_query_min_sec": {
            k: round(v["min"], 3) for k, v in sorted(lat.items())
        },
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: result[k] for k in (
        "n_probes", "per_mode", "all_surfaces")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
