"""Streaming index maintenance: continuous ingestion of new document
files into the persisted inverted index.

The reference is a scheduled full rebuild (bin/buildIndexes cron); the
Spark-native upgrade is a file-source stream feeding the SAME batch
builder through ``foreachBatch``:

  readStream(parquet docs dir)
    -> foreachBatch: IndexBuilder.build(batch, append=True, resume=True)

Exactly-once index commits over at-least-once micro-batch delivery
come for free from the builder's shard fingerprints: a replayed batch
re-fingerprints to identical values and every shard skips. ``append``
mode treats each micro-batch as a delta (untouched shards stay; shards
present in the batch are upserted whole), so producers must emit docs
in complete docID-range (shard) units — the natural contract when an
upstream job writes one parquet file per shard. Global stats
(dictionary df, avgdl) commit INCREMENTALLY in O(delta): the finalize
merges only the changed shards' dictionary partials (subtracting the
replaced shards' old contributions) and derives corpus stats from the
ledger's per-shard field_stats — ``metrics["finalize_mode"] ==
"incremental"`` on every append batch (index_build._finalize_index;
asserted stream-vs-batch-identical in tests/test_streaming_ingest.py).
Queries opening the index between batches see a consistent committed
snapshot (manifest/ledger are replaced atomically, and the engine
falls back to exact TAAT while stored block-max bounds are stale).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from gxdindexer_spark.operators.index_build import IndexBuilder

#: minimal ingest schema: identity + text + per-row invariant + shard
INGEST_DOCS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
    ]
)


def ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    builder: IndexBuilder,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    available_now: bool = True,
):
    """Start (and return) the streaming query that maintains
    ``index_dir`` from parquet files arriving in ``docs_dir``.

    ``available_now=True`` drains everything currently available and
    stops — the incremental-batch trigger (run it from cron and it
    only pays for NEW files); ``False`` runs continuously.
    """
    schema = schema or INGEST_DOCS
    stream = spark.readStream.schema(schema).parquet(docs_dir)

    def handle(batch_df, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        builder.build(batch_df, index_dir, resume=True, append=True)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
