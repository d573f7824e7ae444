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
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
    expire_keep_last: int | None = None,
    compact_opts: dict | None = None,
    atomic: bool = False,
):
    """Tail ``source_dir`` for new WAL parquet files and apply each
    micro-batch exactly once. Returns the StreamingQuery.

    Epoch ids are ``base + batch_id``. The base is fixed at the stream's
    FIRST start as one past the table's highest committed epoch and persisted
    in the checkpoint dir — it must be a constant of the stream identity, not
    recomputed per start, or a re-delivered batch could renumber and break
    exactly-once. For a table created empty the base is 0 (epoch ==
    batch_id, the original contract); for a BRANCH fork the inherited ledger
    is non-empty, and without the offset the stream's batches 0..k would
    collide with the parent's committed epochs 0..k and no-op silently — the
    WAL window would be lost on the audit branch. A pre-existing checkpoint
    without a recorded base keeps base 0 (upgrade compatibility)."""
    reader = spark.readStream
    if schema:
        reader = reader.schema(schema)
    else:
        # parquet streams need an explicit schema; infer from existing files
        static = spark.read.parquet(source_dir)
        reader = reader.schema(static.schema)
    if max_files_per_trigger:
        # source rate limit: availableNow drains the backlog in MULTIPLE
        # micro-batches of <= N files each (epoch sizing for a large
        # catch-up, instead of one giant batch)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    import json

    base_path = os.path.join(checkpoint_dir, "epoch_base.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            epoch_base = json.load(f)["epoch_base"]
    elif os.path.exists(os.path.join(checkpoint_dir, "offsets")):
        epoch_base = 0  # checkpoint predates the base file: epoch == batch_id
    else:
        ledger = table.committed_epochs()
        epoch_base = 1 + max((int(e) for e in ledger), default=-1)
        os.makedirs(checkpoint_dir, exist_ok=True)
        tmp = f"{base_path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch_base": epoch_base}, f)
        os.replace(tmp, base_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # atomic=True: each micro-batch's main + derived merges publish from
        # one multi-table transaction (Engine.apply_epoch atomic semantics)
        engine.apply_epoch(
            batch_df, table, epoch=epoch_base + batch_id, atomic=atomic
        )
        # maintenance cadence (MicroBatchRunner.compact_every analogue): a
        # long-lived stream otherwise accretes one delta layer per batch
        # without bound. MUST be consolidate_deltas, not compact: file
        # delivery order is not lsn order, so a later batch can carry an
        # OLDER event — full compaction drops delete tombstones and such an
        # event would resurrect the deleted key (measured, see
        # test_stream_apply_maintenance_cadence); consolidation folds the
        # layers but keeps the tombstones, correct under any arrival order.
        # Keyed on batch_id, so a crash-redelivered batch re-runs the same
        # (state-preserving, idempotent) maintenance.
        if compact_every and (batch_id + 1) % compact_every == 0:
            from data_exchange_hl7_spark.engine import table_name

            tables = [table] + [
                dt for dt, *_ in engine._derived.get(table_name(table), [])
            ]
            for t in tables:
                t.consolidate_deltas(**(compact_opts or {}))
                if expire_keep_last:
                    t.expire_snapshots(expire_keep_last)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", os.path.join(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
