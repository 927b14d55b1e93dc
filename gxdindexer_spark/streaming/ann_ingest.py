"""Streaming ANN index maintenance: continuous ingestion of new
embedding files into the persisted LSH/IVF index.

The text-index analog is ``streaming/ingest.py`` (file stream ->
foreachBatch -> the SAME batch builder); here each micro-batch feeds
``ann.append_ann_index``, whose commit protocol was built for exactly
this delivery model:

  * exactly-once over at-least-once micro-batch redelivery — the
    delta's content fingerprint is the commit record
    (``meta.applied_deltas`` + ``meta.compacted_deltas``), so a
    replayed batch is a no-op even after a compaction folded it;
  * crash-safe — a batch that staged but did not commit is invisible
    to readers and the retry overwrites it;
  * single-writer — appends, compactions and rebuilds serialize on
    the index writer lock (a compaction cannot erase a batch that is
    committing concurrently).

Operational knobs mirror a real serving deployment: ``compact_every``
bounds the number of delta relations a reader unions (fold deltas back
into the base every N batches), and the per-batch ``ivf_drift`` check
surfaces when appends have drifted off the frozen-centroid
distribution and the documented retrain
(``ann.retrain_if_drifted``) should run — drift state is returned,
not auto-acted on, because retraining wants the FULL corpus which the
stream does not hold.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from gxdindexer_spark.operators import ann

#: minimal ingest schema: vector identity + embedding
INGEST_EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def ann_ingest_stream(
    spark: SparkSession,
    emb_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = True,
    compact_every: int = 0,
    drift_log: list | None = None,
):
    """Start (and return) the streaming query that maintains the ANN
    index at ``index_dir`` from parquet embedding files arriving in
    ``emb_dir``. The index must already exist (``ann.build_ann_index``
    over the initial corpus — planes/centroids are frozen there).

    ``available_now=True`` drains everything currently available and
    stops (cron-style incremental maintenance); ``False`` runs
    continuously. ``compact_every=N`` folds applied deltas into the
    base whenever the PERSISTED delta log reaches N — state lives in
    meta.json, not process memory, so the policy survives restarts
    and cron-style one-batch drains. ``drift_log`` (optional list)
    receives the ``ann.ivf_drift`` dict after each batch — the
    caller's hook for alerting / scheduling a retrain.
    """
    schema = schema or INGEST_EMBEDDINGS
    stream = spark.readStream.schema(schema).parquet(emb_dir)

    def handle(batch_df, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Belt-and-braces exactly-once: the delta fingerprint makes a
        # REPLAYED batch a no-op, but a lost/wiped checkpoint
        # re-delivers old files RE-BATCHED (several files in one
        # micro-batch), whose combined fingerprint is new — the text
        # index is immune because its dedup unit is the content-stable
        # shard, so the ANN stream dedups at the stable unit it has:
        # vec_id. ``dedup_ids=True`` runs that id anti-join INSIDE the
        # append's writer lock (a concurrent writer can't stale the
        # snapshot it checks) and prunes the existing side to the
        # batch's own LSH bucket partitions, so the guard reads
        # O(collision buckets), not the whole index
        # (ann._existing_ids_for_buckets).
        meta = ann.append_ann_index(batch_df, index_dir, dedup_ids=True)
        if drift_log is not None:
            drift_log.append(ann.ivf_drift(meta))
        if compact_every and len(
            meta.get("applied_deltas") or []
        ) >= compact_every:
            ann.compact_ann_index(batch_df.sparkSession, index_dir)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
