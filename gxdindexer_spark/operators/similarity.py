"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k against one query vector:
  `F.zip_with`/`F.aggregate` dot products, JVM-side, fully
  Catalyst-planned. At 100 TB this is a single scan + top-k merge
  (orderBy(...).limit(k) compiles to per-partition TakeOrdered + a
  tiny driver merge — no global sort).
* ``lsh_bucket_topk`` — random-hyperplane signs (a deterministic
  md5-seeded projection) bucket vectors; the query only scores its
  own bucket ring. Approximate; recall grows with probes.
* ``embedding_neardup_pairs`` — pairwise cosine >= threshold within
  LSH buckets (near-duplicate detection over embeddings).

These one-shot forms compute the signature/assignment inline — a full
scan per call. They are the REFERENCE SEMANTICS and the per-call
baseline; the serving path is operators/ann.py, which persists the
same assignments ``partitionBy(bucket)`` once and answers queries
with partition-pruned scans (results are identical — parity-tested
in tests/test_ann.py).
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k. -> (vec_id, cos) desc, id asc.

    Stays a JVM-side expression: an Arrow UDF variant was measured
    SLOWER on full scans (the JVM->Arrow transfer of 1M embeddings
    dominates any python-side vectorization win), while the HOF moves
    zero data. The one genuine waste in the naive HOF form — the
    QUERY's own norm, an aggregate over a dim-literal array that
    Catalyst does not constant-fold, re-evaluated per row — is
    precomputed driver-side instead: the python loop accumulates
    left-to-right exactly like ``F.aggregate`` (and DuckDB's
    list_dot_product), so scores stay bit-identical to the oracles.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qn = 0.0
    for x in query_vec:
        qn += float(x) * float(x)
    qnorm = math.sqrt(qn)
    # order by the UNROUNDED cosine (rank truth), round only for output
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            (_dot(v, q) / (_norm(v) * F.lit(qnorm))).alias("_c"),
        )
        .orderBy(F.desc("_c"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("_c", 6).alias("cos"))
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane from a seed (pure
    python, driver-side, tiny)."""
    import hashlib

    vals = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        u = int(h[:15], 16) / float(1 << 60)
        vals.append(2.0 * u - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign bits of projections onto fixed hyperplanes -> int bucket."""
    sig = F.lit(0)
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(float(x)) for x in p])
        sig = sig + F.when(_dot(F.transform(vec_col, lambda x: x.cast("double")), pc) > 0, 2**i).otherwise(0)
    return sig


def lsh_probe_buckets(
    query_vec: list[float],
    planes: list[list[float]],
    probes: int = 1,
    max_flips: int = 3,
) -> list[int]:
    """Query bucket + perturbation-SET probe ring (Lv et al. VLDB'07):
    candidate perturbations are every subset of <= ``max_flips``
    hyperplanes, ordered by the SUM of their margins |q . plane|
    (ascending; plane-index tiebreak) — the planes the query is
    closest to flip first, and a pair of near-zero margins outranks
    one distant single. Single-bit flipping alone plateaus (only
    n_planes reachable neighbors); subsets keep recall climbing while
    each extra probe still scans only 1/2^n_planes of the corpus.

    Determinism contract with the DuckDB oracle
    (``__spark_entry__._ann_lsh_sql``): dot products accumulate
    left-to-right in pure python (= ``list_dot_product``), subset
    totals add margins in ascending plane order (= SQL ``a.m + b.m +
    c.m``), and ties break on the padded index tuple — so the probe
    ORDER, hence the candidate set, is bit-identical both sides."""
    dots = []
    for p in planes:
        acc = 0.0
        for a, b in zip(query_vec, p):
            acc += a * b
        dots.append(acc)
    qsig = sum(2**i for i, d in enumerate(dots) if d > 0)
    buckets = [qsig]
    if probes > 1:
        n = len(planes)
        margins = [abs(d) for d in dots]
        cands: list[tuple[float, tuple[int, ...], int]] = []
        for r in range(1, min(max_flips, n) + 1):
            for comb in itertools.combinations(range(n), r):
                total = margins[comb[0]]
                for i in comb[1:]:
                    total = total + margins[i]
                mask = 0
                for i in comb:
                    mask |= 1 << i
                pad = comb + (n,) * (max_flips - len(comb))
                cands.append((total, pad, mask))
        cands.sort(key=lambda t: (t[0], t[1]))
        buckets += [qsig ^ m for _, _, m in cands[: probes - 1]]
    return buckets


def lsh_bucket_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
) -> DataFrame:
    """ANN: scan only the query's LSH bucket (plus margin-ordered
    probe buckets when ``probes`` > 1). Approximate — the candidate
    set is pruned BEFORE the exact cosine, so the scan touches
    ~1/2^n_planes of the corpus per probe."""
    dim = len(query_vec)
    planes = [_hyperplane(dim, s) for s in range(n_planes)]
    buckets = lsh_probe_buckets(query_vec, planes, probes)
    tagged = emb.withColumn("_bucket", lsh_signature(F.col(vec_col), planes))
    cand = tagged.filter(F.col("_bucket").isin(buckets))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    attr_cols: tuple[str, ...] = (),
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (cosine) via one numpy matmul per Arrow batch —
    -> (vec_id, embedding[, *attr_cols], ivf_bucket). At 100 TB the
    output is written partitioned by ivf_bucket so queries scan only
    probed buckets; ``attr_cols`` ride through untouched (stored-attr
    filtered ANN)."""
    import numpy as np
    from collections.abc import Iterator
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    in_types = {f.name: f.dataType for f in emb.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
        + [T.StructField(c, in_types[c], True) for c in attr_cols]
        + [T.StructField("ivf_bucket", T.IntegerType(), False)]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12
            )
            bucket = np.argmax(Vn @ Cn.T, axis=1).astype("int32")
            out = {
                "vec_id": pdf[id_col].to_numpy(),
                "embedding": pdf[vec_col],
            }
            for c in attr_cols:
                out[c] = pdf[c]
            out["ivf_bucket"] = bucket
            yield pd.DataFrame(out)

    return emb.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).alias(vec_col),
        *[F.col(c) for c in attr_cols],
    ).mapInPandas(run, schema=out_schema)


def sample_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_total: int | None = None,
) -> list[list[float]]:
    """Deterministic coarse centroids: an evenly-strided id sample
    (IVF-flat demo; swap for k-means at scale — assignment is the same).
    ``n_total``: the corpus row count when the caller already knows it
    (e.g. from the build fingerprint) — skips a count job."""
    n = emb.count() if n_total is None else int(n_total)
    stride = max(n // n_centroids, 1)
    rows = (
        emb.filter((F.col(id_col) % stride == 0))
        .orderBy(id_col)
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def train_centroids_kmeans(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means (Lloyd) training for the IVF coarse quantizer.

    init = deterministic strided sample; assign = nearest centroid by
    cosine (``ivf_assign``: numpy matmul per Arrow batch); update =
    per-cluster mean renormalized to unit length (spherical k-means —
    cosine distortion is non-increasing per round). The update is a
    JVM-side posexplode + two-level sum/count agg whose result is
    k x dim rows (tiny driver collect); empty clusters keep their
    previous centroid. Scales: every pass is one corpus scan, driver
    state is k x dim floats.
    """
    import numpy as np

    cents = [list(c) for c in sample_centroids(emb, n_centroids, id_col, vec_col)]
    base = emb.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    )
    for _ in range(max(iters, 0)):
        assigned = ivf_assign(base, cents, id_col, vec_col)
        rows = (
            assigned.select(
                "ivf_bucket",
                F.posexplode(
                    F.transform("embedding", lambda x: x.cast("double"))
                ).alias("pos", "v"),
            )
            .groupBy("ivf_bucket", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        dim = len(cents[0])
        sums = {}
        for r in rows:
            sums.setdefault(int(r["ivf_bucket"]), np.zeros(dim))[
                int(r["pos"])
            ] = float(r["s"]) / float(r["n"])
        new = []
        for ci, old in enumerate(cents):
            m = sums.get(ci)
            if m is None:
                new.append(old)  # empty cluster keeps its centroid
                continue
            norm = float(np.linalg.norm(m))
            new.append((m / norm).tolist() if norm > 0 else old)
        cents = new
    return cents


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: exact cosine only inside the query's ``nprobe`` nearest
    centroid buckets (~nprobe/n_centroids of the corpus scanned)."""
    import numpy as np

    centroids = centroids or sample_centroids(emb, n_centroids, id_col, vec_col)
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(Cn @ qn))[:nprobe].tolist()
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("ivf_bucket").isin([int(p) for p in probes]))
    return cosine_topk(cand, query_vec, k, "vec_id", vec_col)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by cosine >= threshold, blocked by LSH bucket so
    the self-join is per-bucket instead of global O(n^2).
    -> (id_a, id_b, cos)."""
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    planes = [_hyperplane(int(dim_row["d"]), s) for s in range(n_planes)]
    tagged = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vid") < F.col("b.vid")),
    )
    return (
        pairs.select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
