"""ANN scale point: materialized index vs brute force at 1M vectors.

Generates n deterministic 64-d vectors, builds the persisted LSH/IVF
index once, then compares per-query latency of the exact brute-force
cosine top-k (full scan) against the partition-pruned LSH and IVF
paths, with recall@10 vs the exact result. Writes
BENCH/ann_scale.json.

Usage: python scripts/bench_ann_scale.py [n_vectors] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gxdindexer_spark.operators import ann, similarity  # noqa: E402
from gxdindexer_spark.session import get_spark  # noqa: E402

DIM = 64
REPS = 3
N_PLANES = 8
N_CENTROIDS = 64
NPROBE = 8


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/ann_scale.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ann-scale", master=f"local[{cpus}]",
                      shuffle_partitions=64)
    # deterministic synthetic vectors: per-dim seeded rand, clustered a
    # little (bucket offset) so ANN recall is non-trivial
    # 16 clusters: cluster c bumps the 4 dims with i % 16 == c, so
    # near neighbors share a distinctive direction (recall non-trivial)
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.rand(seed=1000 + i)
                    + F.when(
                        F.col("id") % 16 == i % 16, F.lit(2.0)
                    ).otherwise(F.lit(0.0))
                ).cast("float")
                for i in range(DIM)
            ]
        ).alias("embedding"),
    ).repartition(64)
    # materialize to parquet so brute force and the ANN index read the
    # same storage (a cached-DataFrame brute scan would be unfair)
    src = f"/tmp/gxdann_scale_src_{n}"
    shutil.rmtree(src, ignore_errors=True)
    emb.write.parquet(src)
    emb = spark.read.parquet(src)
    d = f"/tmp/gxdann_scale_{n}"
    shutil.rmtree(d, ignore_errors=True)
    t0 = time.monotonic()
    ann.build_ann_index(
        emb, d, n_planes=N_PLANES, n_centroids=N_CENTROIDS, resume=False
    )
    build_sec = round(time.monotonic() - t0, 3)
    idx = ann.AnnIndex(spark, d)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0)
        .select("embedding").first()[0]
    ]

    def timed(fn):
        lats, rows = [], None
        for _ in range(REPS):
            t0 = time.monotonic()
            rows = fn()
            lats.append(time.monotonic() - t0)
        return round(min(lats), 3), rows

    brute_sec, brute_rows = timed(
        lambda: similarity.cosine_topk(emb, qvec, k=10).collect()
    )
    lsh_sec, lsh_rows = timed(
        lambda: idx.lsh_topk(qvec, k=10, probes=3).collect()
    )
    lsh8_sec, lsh8_rows = timed(
        lambda: idx.lsh_topk(qvec, k=10, probes=8).collect()
    )
    ivf_sec, ivf_rows = timed(
        lambda: idx.ivf_topk(qvec, k=10, nprobe=NPROBE).collect()
    )
    exact = {r["vec_id"] for r in brute_rows}
    result = {
        "n_vectors": n,
        "dim": DIM,
        "cpus": int(cpus),
        "multiprobe": "perturbation sets by total margin (Lv et al.)",
        "ann_build_sec": build_sec,
        "brute_topk_sec": brute_sec,
        "lsh_topk_sec": lsh_sec,
        "lsh8_topk_sec": lsh8_sec,
        "ivf_topk_sec": ivf_sec,
        "lsh_recall_at10": len(exact & {r["vec_id"] for r in lsh_rows}) / 10,
        "lsh8_recall_at10": len(exact & {r["vec_id"] for r in lsh8_rows})
        / 10,
        "ivf_recall_at10": len(exact & {r["vec_id"] for r in ivf_rows}) / 10,
        "lsh_speedup": round(brute_sec / max(lsh_sec, 1e-9), 2),
        "lsh8_speedup": round(brute_sec / max(lsh8_sec, 1e-9), 2),
        "ivf_speedup": round(brute_sec / max(ivf_sec, 1e-9), 2),
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
