"""Event-time streaming analytics: watermarked windows + stateful dedup.

The engine's core apply path resolves ordering at rest (runner.py module
doc — the reference's design, spikes/cbs-pipeline/common/fn_lake.scala:49-60),
so no correctness-critical state lives in streaming operators. These are the
*observability / curation* streaming stages layered on top of the WAL tail:

  - ``windowed_counts``: event-time tumbling/sliding windows with a
    watermark, so late events update the right window and state is bounded
    (the reference's processing-status rollups, svc-hl7-replay /
    processing-status report family, re-expressed as a Structured Streaming
    aggregation).
  - ``streaming_exact_dedup``: exactly-one-survivor dedup ACROSS
    micro-batches via ``applyInPandasWithState`` — the one custom stateful
    operator Spark's built-ins cannot express (dropDuplicates state never
    picks a deterministic representative row). Arrow-batched; this and the
    multimodal decoder are the repo's only Python-visible stages
    (SURVEY.md section 2.10 discipline).

Both work on batch DataFrames too (watermark/state degrade to a plain agg /
window dedup), which is how the oracle gate certifies the window semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, keys) event counts with event-time semantics.

    Streaming: ``withWatermark`` bounds state and finalizes windows once the
    watermark passes their end — late rows inside the watermark still land in
    their true window; older ones are dropped (append mode). Batch: the same
    expression is a plain hash aggregation.
    """
    if df.isStreaming and watermark:
        from pyspark.sql import types as T

        # watermarks require TIMESTAMP (ltz); parquet WALs often carry ntz
        if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
    gap: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(keys, session) event counts via the native mergeable session
    window (``F.session_window``): every event opens the interval
    ``[ts, ts + gap)`` and strictly-overlapping intervals merge, so a
    session ends ``gap`` after its LAST event and an exact-boundary event
    starts a new session.

    This is the third event-time window family next to ``windowed_counts``'s
    tumbling/sliding shapes, and the bounded-state complement of the
    ordering-at-rest ``sessionize`` query (which numbers sessions with a
    per-key prefix-sum window — a per-key sort). Streaming: session state is
    merged across micro-batches and finalized once the watermark passes a
    session's end, so state stays bounded no matter how long the stream
    runs (the reference's processing-status rollups never re-open closed
    reporting windows either — svc-hl7-replay report family). Batch: the
    same expression plans as an aggregation whose per-key session merge runs
    inside the keyed exchange — no driver state, no unbounded buffering.
    """
    if df.isStreaming and watermark:
        from pyspark.sql import types as T

        if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sess"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def streaming_exact_dedup(
    df: DataFrame,
    hash_col: str = "message_hash",
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Keep exactly one row per ``hash_col`` value across ALL micro-batches.

    State per hash group is a single flag; once a representative row has been
    emitted, every later duplicate — in this batch or any future one — is
    dropped. The representative is deterministic: minimum ``tiebreak_cols``.
    Checkpointed state makes the choice stable across restarts, which is what
    ``dropDuplicates`` cannot give a replay-deterministic pipeline.

    Batch DataFrames take the equivalent single-shuffle window plan instead
    (no state needed within one bounded input).
    """
    if not df.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(hash_col).orderBy(*[F.col(c).asc() for c in tiebreak_cols])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = df.schema
    order_cols = list(tiebreak_cols)

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            # already emitted a survivor in an earlier epoch: drain + drop
            for _ in pdfs:
                pass
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        allp = pd.concat(parts, ignore_index=True)
        state.update((1,))
        yield allp.sort_values(order_cols, kind="mergesort").head(1)

    return df.groupBy(hash_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen INT",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
