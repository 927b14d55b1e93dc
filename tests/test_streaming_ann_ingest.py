"""Streaming ANN ingestion: micro-batches of embedding files append
into the persisted LSH/IVF index; queries match a one-shot full
build (planes are input-independent), replayed input is a no-op
(fingerprint exactly-once), compact_every folds deltas, and the
per-batch drift hook reports."""

import shutil

import pytest
from pyspark.sql import functions as F

from gxdindexer_spark.operators import ann, similarity
from gxdindexer_spark.streaming import ann_ingest

SF_DIR = "/root/testdata/sf0.001"
N_PLANES = 5
N_CENTROIDS = 6


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding").cast("array<float>").alias("embedding"),
        )
        .cache()
    )


def test_streaming_ann_ingest_matches_full_build(spark, emb, tmp_path):
    emb_dir = str(tmp_path / "incoming")
    idx = str(tmp_path / "sann")
    ckpt = str(tmp_path / "ckpt")
    base = emb.filter(F.col("vec_id") % 3 == 0)
    d1 = emb.filter(F.col("vec_id") % 3 == 1)
    d2 = emb.filter(F.col("vec_id") % 3 == 2)
    # initial build freezes planes/centroids
    ann.build_ann_index(
        base, idx, n_planes=N_PLANES, n_centroids=N_CENTROIDS, resume=False
    )
    drift_log: list = []

    def drain():
        q = ann_ingest.ann_ingest_stream(
            spark, emb_dir, idx, ckpt,
            compact_every=2, drift_log=drift_log,
        )
        q.awaitTermination(120)
        assert not q.isActive

    d1.write.mode("append").parquet(emb_dir)
    drain()
    meta = ann.AnnIndex(spark, idx).meta
    assert len(meta["applied_deltas"]) == 1
    assert len(drift_log) == 1 and "drifted" in drift_log[0]

    d2.write.mode("append").parquet(emb_dir)
    drain()
    # delta log reached compact_every=2: deltas folded
    meta = ann.AnnIndex(spark, idx).meta
    assert meta["applied_deltas"] == []
    assert len(meta["compacted_deltas"]) == 2
    assert int(meta["n_vectors"]) == emb.count()

    # LSH query over the streamed index == inline operator over the
    # FULL corpus (planes are input-independent)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0)
        .select("embedding").first()[0]
    ]
    idx_eng = ann.AnnIndex(spark, idx)
    got = idx_eng.lsh_topk(qvec, k=10, probes=3).collect()
    expect = similarity.lsh_bucket_topk(
        emb, qvec, k=10, n_planes=N_PLANES, probes=3
    ).collect()
    assert got == expect

    # replay: wiping the checkpoint re-delivers every file; the
    # compacted-delta fingerprint log makes each a no-op
    shutil.rmtree(ckpt)
    n_before = idx_eng._lsh.count()
    drain()
    idx2 = ann.AnnIndex(spark, idx)
    assert idx2._lsh.count() == n_before
    assert idx2.meta["applied_deltas"] == []
    assert len(idx2.meta["compacted_deltas"]) == 2
