"""Structured Streaming operators.

The reference is a pure batch rebuild (SURVEY.md §2.11) — these are the
forward-looking streaming surface a training-data pipeline needs:

* ``windowed_counts`` — readStream -> watermark -> tumbling-window agg
  (late data handled by the watermark);
* ``sessionize`` — custom stateful operator via
  ``applyInPandasWithState`` (session windows with a gap timeout),
  the Spark-native replacement for hand-rolled sessionizers;
* each has a batch-equivalent twin (same transformations on a static
  DataFrame) used by the DuckDB oracle checks, so the streaming logic
  is verified against SQL semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 1800

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_us", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    static = spark.read.parquet(events_dir)
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts with a watermark for late data. Works on
    both streaming and static DataFrames (same plan both ways)."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if ev.isStreaming:
        ev = ev.withWatermark("ts", "2 hours")
    return (
        ev.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def _sessionize_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful session assembly for one user: events arrive in batch
    order; close a session when the gap exceeds SESSION_GAP_SEC or the
    state times out."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start],
                    "n_events": [n],
                    "duration_us": [last - start],
                }
            )
        return
    gap_us = SESSION_GAP_SEC * 1_000_000
    us_all = []
    for pdf in pdfs:
        us_all.append(
            (pdf["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
        )
    import numpy as np

    us = np.sort(np.concatenate(us_all)) if us_all else np.array([], "int64")
    out = []
    if state.exists:
        start, last, n = state.get
    else:
        start = last = -1
        n = 0
    for t in us:
        t = int(t)
        if start < 0:
            start, last, n = t, t, 1
        elif t - last > gap_us:
            out.append((user_id, start, n, last - start))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    if start >= 0:
        state.update((start, last, n))
        state.setTimeoutDuration(gap_us // 1000)
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start_us", "n_events", "duration_us"],
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming session windows via applyInPandasWithState (the custom
    stateful operator path; emits CLOSED sessions)."""
    ev = events.select(
        F.col("user_id"), F.col("ts").cast("timestamp").alias("ts")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the sessionizer (gaps-and-islands with window
    functions) — ALL sessions, including the still-open tail ones."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_SEC * 1_000_000), 1).otherwise(0)
    sess = events.withColumn(
        "session_no",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("us", us)
    return sess.groupBy("user_id", "session_no").agg(
        F.min("us").alias("session_start_us"),
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


def run_stream_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "append"
):
    """Drain a stream with availableNow into an in-memory table; returns
    the StreamingQuery (caller awaits + reads spark.table(name))."""
    return (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
