"""Materialized ANN index: partition pruning, parity with the inline
operators, and resume semantics."""

import os

import pytest
from pyspark.sql import functions as F

from gxdindexer_spark.operators import ann, similarity

SF_DIR = "/root/testdata/sf0.001"
N_PLANES = 5
N_CENTROIDS = 6


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]


@pytest.fixture(scope="module")
def built(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann"))
    meta = ann.build_ann_index(
        emb, d, n_planes=N_PLANES, n_centroids=N_CENTROIDS, resume=False
    )
    return d, meta


def _partition_filters(df) -> str:
    """The scan node's PartitionFilters line from the formatted plan."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    lines = [
        ln.strip()
        for ln in buf.getvalue().splitlines()
        if "PartitionFilters" in ln
    ]
    assert lines, "no FileSourceScan PartitionFilters in plan"
    return lines[0]


def _observed_buckets(df, part_col: str) -> set[int]:
    """Partition values of files that actually produced rows."""
    rows = (
        df.select(F.input_file_name().alias("f")).distinct().collect()
    )
    return {
        int(part.split("=")[1])
        for r in rows
        for part in r["f"].split("/")
        if part.startswith(f"{part_col}=")
    }


def test_lsh_query_scans_only_probed_partitions(spark, built, qvec):
    """The whole point of materializing: the candidate scan must be
    partition-pruned to the probed bucket= directories — the bucket
    IN-list must appear as a scan PartitionFilter (pruned at file
    listing, before any I/O), and runtime rows come only from probed
    partitions."""
    d, _meta = built
    idx = ann.AnnIndex(spark, d)
    cand = idx.lsh_candidates(qvec, probes=3)
    buckets = set(idx.lsh_buckets(qvec, probes=3))
    pf = _partition_filters(cand)
    assert "bucket" in pf and " IN " in pf
    for b in buckets:
        assert str(b) in pf
    assert _observed_buckets(cand, "bucket") <= buckets
    # and pruning is real: the index holds more buckets than probed
    all_buckets = {
        int(n.split("=")[1])
        for n in os.listdir(f"{d}/lsh")
        if n.startswith("bucket=")
    }
    assert len(all_buckets) > len(buckets)


def test_ivf_query_scans_only_probed_partitions(spark, built, qvec):
    d, _meta = built
    idx = ann.AnnIndex(spark, d)
    cand = idx.ivf_candidates(qvec, nprobe=2)
    probes = set(idx.ivf_probes(qvec, nprobe=2))
    pf = _partition_filters(cand)
    assert "ivf_bucket" in pf and " IN " in pf
    assert _observed_buckets(cand, "ivf_bucket") <= probes
    all_buckets = {
        int(n.split("=")[1])
        for n in os.listdir(f"{d}/ivf")
        if n.startswith("ivf_bucket=")
    }
    assert len(all_buckets) > len(probes)


def test_lsh_topk_matches_inline_operator(spark, built, emb, qvec):
    """Same planes/probes -> the persisted path returns exactly what
    the inline full-scan operator returns."""
    d, _meta = built
    idx = ann.AnnIndex(spark, d)
    got = idx.lsh_topk(qvec, k=10, probes=3).collect()
    expect = similarity.lsh_bucket_topk(
        emb, qvec, k=10, n_planes=N_PLANES, probes=3
    ).collect()
    assert got == expect


def test_ivf_topk_matches_inline_operator(spark, built, emb, qvec):
    d, meta = built
    idx = ann.AnnIndex(spark, d)
    got = idx.ivf_topk(qvec, k=10, nprobe=2).collect()
    expect = similarity.ivf_topk(
        emb, qvec, k=10, nprobe=2, centroids=meta["centroids"]
    ).collect()
    assert got == expect


def test_neardup_matches_inline_operator(spark, built, emb):
    d, _meta = built
    idx = ann.AnnIndex(spark, d)
    got = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in idx.lsh_neardup_pairs(threshold=0.3).collect()
    )
    expect = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in similarity.embedding_neardup_pairs(
            emb, threshold=0.3, n_planes=N_PLANES
        ).collect()
    )
    assert got == expect and got


def test_build_resume_skips_unchanged_input(spark, built, emb):
    d, meta = built
    mtime = os.path.getmtime(f"{d}/meta.json")
    again = ann.build_ann_index(
        emb, d, n_planes=N_PLANES, n_centroids=N_CENTROIDS, resume=True
    )
    assert again == meta
    assert os.path.getmtime(f"{d}/meta.json") == mtime
    # param change -> rebuild
    rebuilt = ann.build_ann_index(
        emb, d, n_planes=N_PLANES - 1, n_centroids=N_CENTROIDS, resume=True
    )
    assert rebuilt["n_planes"] == N_PLANES - 1
    assert len(ann.AnnIndex(spark, d).planes) == N_PLANES - 1


def test_kmeans_training_reduces_quantization_distortion(spark, emb):
    """Spherical k-means: cosine distortion (1 - cos to the assigned
    centroid) is non-increasing vs the strided init, and recall@10 of
    the trained IVF stays useful."""
    import numpy as np

    V = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.select("embedding").collect()
        ]
    )
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    def distortion(cents):
        C = np.asarray(cents, dtype=np.float64)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        return float(np.mean(1.0 - (Vn @ Cn.T).max(axis=1)))

    c0 = similarity.sample_centroids(emb, N_CENTROIDS)
    c4 = similarity.train_centroids_kmeans(emb, N_CENTROIDS, iters=4)
    assert distortion(c4) <= distortion(c0) + 1e-12

    # trained IVF end-to-end: recall@10 vs exact brute force
    qvec = [float(x) for x in V[0]]
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(emb, qvec, k=10).collect()
    }
    approx = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, qvec, k=10, nprobe=3, centroids=c4
        ).collect()
    }
    assert len(exact & approx) / 10 >= 0.5


def test_build_ann_index_with_kmeans(spark, emb, tmp_path):
    d = str(tmp_path / "annk")
    meta = ann.build_ann_index(
        emb, d, n_planes=N_PLANES, n_centroids=N_CENTROIDS,
        kmeans_iters=3, resume=False,
    )
    assert meta["kmeans_iters"] == 3
    idx = ann.AnnIndex(spark, d)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0)
        .select("embedding").first()[0]
    ]
    got = idx.ivf_topk(qvec, k=10, nprobe=2).collect()
    assert len(got) == 10
    # resume honors the kmeans param
    again = ann.build_ann_index(
        emb, d, n_planes=N_PLANES, n_centroids=N_CENTROIDS,
        kmeans_iters=3, resume=True,
    )
    assert again == meta


def test_append_ann_index_matches_full_build(spark, emb, tmp_path):
    """Build on half the vectors, append the rest: LSH queries equal a
    full build (planes are input-independent); IVF candidates equal
    inline assignment with the index's centroids; the combined
    fingerprint now matches a full-input resume probe."""
    d = str(tmp_path / "annapp")
    half1 = emb.filter(F.col("vec_id") % 2 == 0)
    half2 = emb.filter(F.col("vec_id") % 2 == 1)
    meta1 = ann.build_ann_index(
        half1, d, n_planes=N_PLANES, n_centroids=N_CENTROIDS, resume=False
    )
    meta2 = ann.append_ann_index(half2, d)
    assert meta2["n_vectors"] == emb.count()
    idx = ann.AnnIndex(spark, d)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0)
        .select("embedding").first()[0]
    ]
    # LSH: identical to the inline operator over the FULL corpus
    got = idx.lsh_topk(qvec, k=10, probes=3).collect()
    expect = similarity.lsh_bucket_topk(
        emb, qvec, k=10, n_planes=N_PLANES, probes=3
    ).collect()
    assert got == expect
    # IVF: identical to inline assignment with the index's centroids
    got_ivf = idx.ivf_topk(qvec, k=10, nprobe=3).collect()
    expect_ivf = similarity.ivf_topk(
        emb, qvec, k=10, nprobe=3, centroids=meta1["centroids"]
    ).collect()
    assert got_ivf == expect_ivf
    # a full-input resume probe sees the combined fingerprint as done
    again = ann.build_ann_index(
        emb, d, n_planes=N_PLANES, n_centroids=N_CENTROIDS, resume=True
    )
    assert again["fingerprint"] == meta2["fingerprint"]
