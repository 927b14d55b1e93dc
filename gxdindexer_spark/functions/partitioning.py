"""Scan fan-out for expression-heavy operators.

A parquet scan can never be split below row-group granularity, so a
table that lives in one small file (the bench/test corpora here: one
file, ONE row group each) plans as a SINGLE task no matter how many
cores the session has — and every expression-heavy operator downstream
(tokenize/shingle explodes, hash signatures, per-row HOF folds) runs
serialized on one core. ``spread`` inserts one cheap round-robin
exchange of the raw rows to restore parallelism, guarded so it is a
no-op whenever the input is already at least as parallel as the
session (a real cluster scan with thousands of splits is never
re-shuffled — optimization guide §2.4's "repartition someone added
for parallelism" anti-pattern only applies when the data already HAS
parallelism).

The target count follows ``sparkContext.defaultParallelism`` (total
cores), not a constant tuned for local[32] — scale-adaptive per the
driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin ``df`` to ``factor x defaultParallelism`` partitions
    iff it currently has fewer — otherwise return it unchanged. Use
    immediately before expression-heavy per-row work on potentially
    narrow scans; never changes results (row order is not part of any
    operator's contract here)."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning quirk: skip the guard
        return df
    if current >= target:
        return df
    return df.repartition(target)
