"""Materialized ANN index over an embedding column.

Round-1's ANN operators (operators/similarity.py) compute bucket
signatures inline per query — logically bucketed but physically a full
corpus scan. This module is the scale path: assignments are computed
ONCE and persisted ``partitionBy(bucket)``, so a query is a
partition-pruned parquet scan of only the probed buckets — the
reference's "materialize for the query you must serve fast" pattern
(GxdResultHasImageIndexer.java:25-32 materializes a whole clone index
to make one slow count fast).

At 100 TB: the build is one scan + one shuffle on the bucket key
(the signature/assignment itself is a map-side expression; the
repartition buys one-large-file-per-bucket layout instead of
tasks x buckets tiny files); each query then reads
~n_vectors/2^n_planes rows per probed LSH bucket (or ~n/n_centroids
per IVF probe) instead of the whole corpus. Partition pruning happens
in the parquet source (``bucket`` is a directory column), verified by
a plan test asserting only probed ``bucket=`` directories are read.

Determinism: hyperplanes are md5-seeded (similarity._hyperplane) and
the IVF centroid sample is an evenly-strided id pick, so the whole
candidate-set logic is reproducible in ANSI SQL — the DuckDB oracles
in __spark_entry__.py inline the same planes/centroid rule and
hash-match end to end.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gxdindexer_spark.operators.similarity import (
    _hyperplane,
    cosine,
    cosine_topk,
    ivf_assign,
    lsh_signature,
    sample_centroids,
)


def build_ann_index(
    emb: DataFrame,
    index_dir: str,
    n_planes: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    resume: bool = True,
    kmeans_iters: int = 0,
) -> dict:
    """Build (or resume) the persisted ANN artifacts for ``emb``.

    Artifacts:
      * ``lsh/``  — (vec_id, embedding) partitioned by ``bucket`` (the
        random-hyperplane sign signature);
      * ``ivf/``  — (vec_id, embedding) partitioned by ``ivf_bucket``
        (nearest-centroid coarse quantization, numpy matmul per Arrow
        batch);
      * ``meta.json`` — planes, centroids, input fingerprint.

    ``resume=True`` skips the build when the input fingerprint
    (count + id-sum) and params match the existing meta — the ANN
    analog of the index builder's ledger check.
    """
    row = emb.agg(
        F.count("*").alias("n"),
        F.sum(F.col(id_col)).alias("s"),
        F.max(F.size(F.col(vec_col))).alias("dim"),
    ).first()
    n_vectors, dim = int(row["n"]), int(row["dim"])
    fingerprint = f"{row['n']}:{row['s']}"
    meta_path = f"{index_dir}/meta.json"
    if resume and os.path.isfile(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if (
            meta.get("fingerprint") == fingerprint
            and meta.get("n_planes") == n_planes
            and meta.get("n_centroids") == n_centroids
            and meta.get("kmeans_iters", 0) == kmeans_iters
        ):
            return meta

    planes = [_hyperplane(dim, s) for s in range(n_planes)]
    # repartition ON the partition column before the partitioned write:
    # without it every input task writes a file into every bucket dir
    # (tasks x 2^n_planes tiny files); with it each bucket is one
    # task's worth of large files — the layout queries want.
    (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/lsh")
    )
    if kmeans_iters > 0:
        from gxdindexer_spark.operators.similarity import (
            train_centroids_kmeans,
        )

        centroids = train_centroids_kmeans(
            emb, n_centroids, kmeans_iters, id_col, vec_col
        )
    else:
        centroids = sample_centroids(emb, n_centroids, id_col, vec_col)
    (
        ivf_assign(emb, centroids, id_col, vec_col)
        .repartition("ivf_bucket")
        .write.mode("overwrite")
        .partitionBy("ivf_bucket")
        .parquet(f"{index_dir}/ivf")
    )
    meta = {
        "fingerprint": fingerprint,
        "n_vectors": n_vectors,
        "dim": dim,
        "n_planes": n_planes,
        "n_centroids": n_centroids,
        "kmeans_iters": kmeans_iters,
        "planes": planes,
        "centroids": centroids,
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)  # meta commits LAST: its presence
    # guarantees both artifacts are fully written
    return meta


def append_ann_index(
    emb_delta: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incrementally add vectors to an existing ANN index.

    The delta is quantized with the index's EXISTING planes/centroids
    (from meta.json) and appended to the bucket partitions — one delta
    scan + partitioned append, no rebuild of prior data. LSH buckets
    are exact forever (planes are input-independent); IVF cells drift
    from the training distribution as the corpus grows — retrain
    centroids (rebuild with kmeans_iters>0) periodically, like any IVF
    system. meta.json's fingerprint/count update LAST (commit point).
    """
    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    planes = meta["planes"]
    centroids = meta["centroids"]
    row = emb_delta.agg(
        F.count("*").alias("n"), F.sum(F.col(id_col)).alias("s")
    ).first()
    (
        emb_delta.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/lsh")
    )
    (
        ivf_assign(emb_delta, centroids, id_col, vec_col)
        .write.mode("append")
        .partitionBy("ivf_bucket")
        .parquet(f"{index_dir}/ivf")
    )
    old_n, old_s = meta["fingerprint"].split(":")
    meta["n_vectors"] = int(meta["n_vectors"]) + int(row["n"])
    meta["fingerprint"] = f"{int(old_n) + int(row['n'])}:{int(old_s) + int(row['s'])}"
    tmp = f"{index_dir}/meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, f"{index_dir}/meta.json")
    return meta


class AnnIndex:
    """Query engine over the persisted ANN artifacts.

    Probe selection (which buckets to read) is pure driver-side python
    over the tiny meta (planes/centroids) — no Spark job; the scan
    itself is partition-pruned to the probed buckets only.
    """

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(f"{index_dir}/meta.json") as fh:
            self.meta = json.load(fh)
        self.planes: list[list[float]] = self.meta["planes"]
        self.centroids: list[list[float]] = self.meta["centroids"]
        # build each relation once: the parquet file index lists every
        # bucket directory (2^n_planes dirs) — pay that per engine,
        # not per query
        self._lsh = spark.read.parquet(f"{index_dir}/lsh")
        self._ivf = spark.read.parquet(f"{index_dir}/ivf")

    # ------------------------------------------------------------- LSH

    def lsh_buckets(self, query_vec: list[float], probes: int = 1) -> list[int]:
        """Query signature bucket + Hamming-1 probe ring."""
        qsig = 0
        for i, p in enumerate(self.planes):
            if sum(a * b for a, b in zip(query_vec, p)) > 0:
                qsig += 2**i
        buckets = [qsig]
        if probes > 1:
            buckets += [
                qsig ^ (1 << i)
                for i in range(min(len(self.planes), probes - 1))
            ]
        return buckets

    def lsh_candidates(self, query_vec: list[float], probes: int = 1) -> DataFrame:
        buckets = self.lsh_buckets(query_vec, probes)
        return self._lsh.filter(F.col("bucket").isin(buckets))

    def lsh_topk(
        self, query_vec: list[float], k: int = 10, probes: int = 1
    ) -> DataFrame:
        """ANN top-k: exact cosine inside the probed buckets only.
        -> (vec_id, cos) desc, id asc."""
        return cosine_topk(
            self.lsh_candidates(query_vec, probes), query_vec, k
        )

    def lsh_neardup_pairs(self, threshold: float = 0.95) -> DataFrame:
        """Near-dup pairs by cosine >= threshold, blocked per persisted
        bucket: the self-join key is the partition column, so Spark
        co-partitions both sides on ``bucket`` and never compares
        across buckets — O(sum of bucket^2), not O(n^2), with zero
        signature recompute. -> (id_a, id_b, cos)."""
        t = self._lsh.select(
            F.col("vec_id").alias("vid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
            "bucket",
        )
        a, b = t.alias("a"), t.alias("b")
        pairs = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        return pairs.select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        ).filter(F.col("cos") >= threshold)

    # ------------------------------------------------------------- IVF

    def ivf_probes(self, query_vec: list[float], nprobe: int = 4) -> list[int]:
        """nprobe nearest centroids by cosine (stable: ties -> lower
        centroid id, matching the build-side numpy argmax)."""
        C = np.asarray(self.centroids, dtype=np.float64)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        q = np.asarray(query_vec, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        return [int(p) for p in np.argsort(-(Cn @ qn), kind="stable")[:nprobe]]

    def ivf_candidates(self, query_vec: list[float], nprobe: int = 4) -> DataFrame:
        probes = self.ivf_probes(query_vec, nprobe)
        return self._ivf.filter(F.col("ivf_bucket").isin(probes))

    def ivf_topk(
        self, query_vec: list[float], k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        """IVF ANN top-k: exact cosine inside the probed coarse cells.
        -> (vec_id, cos) desc, id asc."""
        return cosine_topk(
            self.ivf_candidates(query_vec, nprobe), query_vec, k
        )
