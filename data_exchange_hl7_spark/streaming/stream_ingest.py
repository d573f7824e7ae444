"""Structured Streaming ingestion: directory tail -> exactly-once apply (S1/S2).

The reference's production trigger is a blob-created event per file
(fn-receiver-debatcher Function.kt:46-54); its Spark POC uses an autoloader
stream with Trigger.Once (fn_load_hl7.scala:20,37-43, fn_lake.scala:49-60).
OSS equivalent: ``spark.readStream.format("parquet"/"text")`` over a
directory + ``foreachBatch`` into Engine.apply_epoch with
``trigger(availableNow=True)``.

Exactly-once composition: Structured Streaming's checkpoint guarantees each
file is delivered in exactly one micro-batch; the engine's epoch manifest
(keyed by Spark's batch_id) makes the apply idempotent — so a crash between
sink commit and checkpoint write re-runs the batch as a NO-OP instead of
double-applying (the classic foreachBatch at-least-once hole, closed the same
way the reference closes it with Cosmos bulk upsert, K3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from data_exchange_hl7_spark.engine import Engine
from data_exchange_hl7_spark.lake.table import LakeTable


def stream_apply(
    spark: SparkSession,
    engine: Engine,
    source_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    schema: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Tail ``source_dir`` for new WAL parquet files and apply each
    micro-batch exactly once. Returns the StreamingQuery."""
    reader = spark.readStream
    if schema:
        reader = reader.schema(schema)
    else:
        # parquet streams need an explicit schema; infer from existing files
        static = spark.read.parquet(source_dir)
        reader = reader.schema(static.schema)
    stream = reader.parquet(source_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        engine.apply_epoch(batch_df, table, epoch=batch_id)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", os.path.join(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
