"""Sinks: deterministic file layout + report/summary tables (K4, K5, A3, A4).

K4 blob file sink (fns-sidecars/hl7-file-sink Function.kt:28-214): path
{folder}/{data_stream_id}/{yyyy/MM/dd/HH}/{message_uuid}.txt derived from the
ingest timestamp — idempotent because the path is deterministic. Here:
parquet partitioned by (stream, date folder) — same pruning/idempotence
properties, columnar instead of one-blob-per-message.

A3 batch summary (svc-hl7-validation ValidationController.kt:367-434): totals
+ error groupings by type/category/path/message.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def file_sink(
    df: DataFrame,
    base_dir: str,
    stream_col: str = "repo",
    ts_col: str = "ts",
    drop_content: bool = True,
) -> str:
    """K4: write records partitioned by (stream, yyyy/MM/dd) — deterministic
    layout, partition-pruned reads. The reference drops ``content`` except
    for validation reports (Function.kt:126-137); we keep the hash."""
    out = df.withColumn("date_folder", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    if drop_content and "content" in out.columns:
        out = out.drop("content")
    (
        out.repartition(F.col(stream_col), F.col("date_folder"))
        .write.partitionBy(stream_col, "date_folder")
        .mode("overwrite")
        .parquet(base_dir)
    )
    return base_dir


def batch_summary(validated: DataFrame) -> DataFrame:
    """A3: one-row summary — totals + counts by classification/type."""
    entries = F.explode_outer("report_entries")
    flat = validated.select(F.col("event_id"), F.col("status"), entries.alias("e"))
    return flat.agg(
        F.countDistinct("event_id").alias("total_messages"),
        F.countDistinct(F.when(F.col("status") == "VALID_MESSAGE", F.col("event_id"))).alias("valid_messages"),
        F.countDistinct(F.when(F.col("status") != "VALID_MESSAGE", F.col("event_id"))).alias("invalid_messages"),
        F.sum(F.when(F.col("e.classification") == "Error", 1).otherwise(0)).alias("total_errors"),
        F.sum(F.when(F.col("e.classification") == "Warning", 1).otherwise(0)).alias("total_warnings"),
    )


def errors_by(validated: DataFrame, dim: str) -> DataFrame:
    """A3 groupings: ``dim`` in {category, path, classification} — the
    groupingBy{}.eachCount() analogue (ValidationController.kt:415-416)."""
    return (
        validated.select(F.explode("report_entries").alias("e"))
        .groupBy(F.col(f"e.{dim}").alias(dim))
        .agg(F.count("*").alias("n"))
        .orderBy(dim)
    )


def errors_by_message(validated: DataFrame) -> DataFrame:
    """A3 by-message error counts (only messages with entries)."""
    return (
        validated.select("event_id", F.explode("report_entries").alias("e"))
        .groupBy("event_id")
        .agg(F.count("*").alias("n_entries"))
        .orderBy("event_id")
    )
