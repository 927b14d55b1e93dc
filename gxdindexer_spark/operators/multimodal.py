"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video are carried as `binary` columns with a typed meta
struct. The image/audio decode libraries are NOT in this container, so
the decode step is STUBBED (deterministic fake or NotImplementedError)
— but the Spark-side plumbing is real and tested: schema, partitioning,
Arrow batch shapes, and the mapInPandas UDF signatures are exactly what
a real decoder would plug into.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def media_from_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in media: utf-8 bytes of the text as the
    binary payload + typed meta derived natively (no Python)."""
    media = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        media.alias("media"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.octet_length(media) % 640 + 1).cast("int").alias("width"),
            (F.octet_length(media) % 480 + 1).cast("int").alias("height"),
            F.octet_length(media).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(media: bytes, fmt: str):
    """REAL decode entry point — stubbed: PIL/ffmpeg are not available
    in this container. A deployment wires the actual decoder here."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this "
        "container; use extract_features (deterministic fake) instead"
    )


def extract_features(media_df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature extractor with REAL plumbing: Arrow
    batches in, unit-norm double vectors out via mapInPandas. Swap
    ``_featurize`` for a model call in a real deployment — the batch
    shape, schema, and partitioning are exactly what it would use.

    The fake is md5-seeded from the media BYTES (the same technique as
    the ANN hyperplane oracle, similarity._hyperplane), computed in
    float64 with left-to-right accumulation, so a DuckDB oracle
    reproduces every value bit-for-bit: u_i = int(md5(seed:i)[:15],
    16) / 2^60, f = u / ||u||. Empty/NULL media -> the zero vector
    (a real decoder would reject it before the model)."""

    def _featurize(b) -> list[float]:
        if b is None or not len(b):
            return [0.0] * dim
        import math

        seed = hashlib.md5(bytes(b)).hexdigest()
        u = [
            int(
                hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16
            )
            / float(1 << 60)
            for i in range(dim)
        ]
        acc = 0.0
        for v in u:  # left-to-right: the SQL twin sums the same order
            acc += v * v
        n = math.sqrt(acc)
        return [v / n for v in u]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [_featurize(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "features": feats}
            )

    return media_df.select("doc_id", "media").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def frame_sample(media_df: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """'Video frame sampling' stand-in: deterministic fixed-stride
    chunking of the binary payload (one output row per frame) — the
    real version would seek keyframes; batch/explode shape is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame": []}
            for did, b in zip(pdf["doc_id"], pdf["media"]):
                b = b or b""
                for i in range(0, max(len(b), 1), every_n_bytes):
                    rows["doc_id"].append(did)
                    rows["frame_no"].append(i // every_n_bytes)
                    rows["frame"].append(bytes(b[i : i + every_n_bytes]))
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return media_df.select("doc_id", "media").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def media_fingerprint(media_df: DataFrame) -> DataFrame:
    """Exact media dedup key: sha2 over the binary payload (native)."""
    return media_df.select(
        "doc_id",
        F.sha2(F.col("media"), 256).alias("media_sha256"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
