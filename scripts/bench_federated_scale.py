"""Federated retrieval at scale: N docs as ONE index vs TWO disjoint
half-corpus member indexes queried through FederatedQueryEngine.

Evidence for the federation design point: the exact-global-stats
scatter-gather costs ~one extra member merge over a single index
(latency ratio), while ranking stays bit-identical (exactness flag).
Writes BENCH/federated_scale.json.

Usage: python scripts/bench_federated_scale.py [n_docs] [out_json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gxdindexer_spark.operators.federated import (  # noqa: E402
    FederatedQueryEngine,
)
from gxdindexer_spark.operators.index_build import IndexBuilder  # noqa: E402
from gxdindexer_spark.operators.query import IndexQueryEngine  # noqa: E402
from gxdindexer_spark.session import get_spark  # noqa: E402
from gxdindexer_spark.sources.synth import generate_corpus  # noqa: E402
from gxdindexer_spark.sources.tables import prepare_docs  # noqa: E402

QUERIES = [
    "parseIndexList if",
    "mergeShardStats byte_offset",
    "getIndexList return value",
]
REPS = 5


def _p50(lats: list[float]) -> float:
    return sorted(lats)[len(lats) // 2]


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/federated_scale.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    partitions = 128
    spark = get_spark(
        app_name="fed-scale", master=f"local[{cpus}]",
        shuffle_partitions=partitions,
    )
    dps = 32_768
    corpus = generate_corpus(spark, n_docs, seed=42, partitions=partitions)
    docs = prepare_docs(
        corpus, docs_per_shard=dps, partitions=partitions
    ).persist()
    docs.count()
    spark.range(10000).selectExpr("sum(id)").collect()
    builder = IndexBuilder(docs_per_shard=dps, salt_range=2048)
    dirs = {}
    builds = {}
    for name, df in (
        ("single", docs),
        ("memberA", docs.filter(F.col("doc_id") % 2 == 0)),
        ("memberB", docs.filter(F.col("doc_id") % 2 == 1)),
    ):
        d = f"/tmp/gxdidx_fedscale_{n_docs}_{name}"
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.monotonic()
        builder.build(df, d, resume=False)
        builds[name] = round(time.monotonic() - t0, 1)
        dirs[name] = d
    single = IndexQueryEngine(spark, dirs["single"])
    fed = FederatedQueryEngine(spark, [dirs["memberA"], dirs["memberB"]])

    # exactness: federated top-20 == single-index top-20, every query
    exact = True
    for q in QUERIES:
        w = single.topk(q, k=20, mode="taat").collect()
        g = fed.topk(q, k=20).collect()
        exact &= [r["doc_id"] for r in w] == [r["doc_id"] for r in g]
        exact &= all(
            math.isclose(a["score"], b["score"], rel_tol=1e-9)
            for a, b in zip(w, g)
        )

    def measure(fn) -> float:
        lats = []
        for _ in range(REPS):
            for q in QUERIES:
                t0 = time.monotonic()
                fn(q)
                lats.append(time.monotonic() - t0)
        return round(_p50(lats), 3)

    single.topk(QUERIES[0], k=20).collect()  # warm
    p50_single = measure(lambda q: single.topk(q, k=20, mode="taat").collect())
    p50_fed = measure(lambda q: fed.topk(q, k=20).collect())
    rec = {
        "n_docs": n_docs,
        "members": 2,
        "build_sec": builds,
        "topk_p50_single_sec": p50_single,
        "topk_p50_federated_sec": p50_fed,
        "federated_overhead_ratio": round(p50_fed / p50_single, 3),
        "rank_and_score_exact_vs_single": bool(exact),
        "loadavg": round(os.getloadavg()[0], 2),
        "cpus": int(cpus),
    }
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=2)
    print(json.dumps(rec))
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
