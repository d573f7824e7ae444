"""Debatch: explode batch files into per-message records (reference D1-D4).

Reference algorithm (fn-receiver-debatcher Function.kt:104-170; Spark POC
spikes/cbs-pipeline/bronze/hl7/fn_debatch_hl7.scala:38-73): split a file's
text at MSH lines, drop FHS/BHS/BTS/FTS batch-wrapper lines, capture the
batch headers, tag SINGLE vs BATCH, assign a 1-based message_index, reject
files with zero messages.

Spark-first: the whole operator is posexplode over a split — a narrow
transform, no shuffle, fully whole-stage-codegen'd. Identity columns are
content-derived (sha256), never uuid(), so replay is byte-stable (the POC's
uuid() at fn_debatch_hl7.scala:68 breaks that — SURVEY.md section 4e).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# batch wrapper prefixes dropped during debatch (Function.kt:117-128)
WRAPPER_PREFIXES = ("FHS", "BHS", "BTS", "FTS")

BOM_WS = r"^[﻿\s]+|[﻿\s]+$"


def clean_lines(col):
    """D1 line cleanup: strip UTF-8 BOM + surrounding whitespace
    (Function.kt:106-107, ValidationController.kt:447)."""
    return F.regexp_replace(col, BOM_WS, "")


def debatch(
    df: DataFrame,
    content_col: str = "content",
    file_col: str = "file_id",
    msg_start: str = "MSH",
) -> DataFrame:
    """Explode one row per batch file into one row per message.

    Output adds: ``message_index`` (1-based, Function.kt:94,131),
    ``single_or_batch`` (MessageMetadata.kt:8), ``batch_header`` (first
    FHS/BHS line if any, fn_debatch_hl7.scala:16-36), ``message_content``,
    ``message_hash`` = sha256(message) (Function.kt:257 uses MD5; our
    invariant is sha256 per BASELINE.json input_hint), ``message_id``
    content-derived.  Files with zero messages survive as one REJECTED row
    (message_index 0) so the error path is observable (Function.kt:150-170).
    """
    lines = F.split(F.col(content_col), "\r?\n")
    headers = F.filter(
        lines,
        lambda x: F.substring(F.trim(x), 1, 3).isin(*WRAPPER_PREFIXES),
    )
    # strip wrapper lines, then split the remaining text at message starts
    body_lines = F.filter(
        F.transform(lines, clean_lines),
        lambda x: ~F.substring(x, 1, 3).isin(*WRAPPER_PREFIXES) & (x != ""),
    )
    body = F.array_join(body_lines, "\n")
    msgs = F.filter(F.split(body, f"(?={msg_start}\\|)"), lambda m: F.trim(m) != "")

    df = (
        df.withColumn("__batch_header", F.try_element_at(headers, F.lit(1)))
        .withColumn("__msgs", msgs)
        .withColumn(
            "single_or_batch",
            F.when(F.size("__msgs") > 1, F.lit("BATCH")).otherwise(F.lit("SINGLE")),
        )
    )
    exploded = df.select(
        "*",
        F.posexplode_outer("__msgs").alias("__pos", "message_content"),
    ).drop("__msgs")
    out = (
        exploded.withColumn(
            "message_index",
            F.when(F.col("__pos").isNull(), F.lit(0)).otherwise(F.col("__pos") + 1).cast("int"),
        )
        # btrim with an explicit set: F.trim strips spaces ONLY, which left a
        # trailing '\n' on every non-final message of a batch — the same
        # message would then hash differently debatched mid-file vs last
        .withColumn(
            "message_content",
            F.btrim(F.col("message_content"), F.lit(" \t\n\r\x0b\f")),
        )
        .withColumn(
            "message_hash", F.sha2(F.coalesce("message_content", F.lit("")), 256)
        )
        .withColumn(
            "message_id",
            F.sha2(
                F.concat_ws(
                    "|", F.col(file_col), F.col("message_index").cast("string"),
                    F.col("message_hash"),
                ),
                256,
            ),
        )
        .withColumn(
            "debatch_status",
            F.when(F.col("message_index") == 0, F.lit("REJECTED")).otherwise(
                F.lit("RECEIVED")
            ),
        )
        .withColumnRenamed("__batch_header", "batch_header")
        .drop("__pos")
    )
    return out


def coalesce_metadata(*cols, default: str = "UNKNOWN"):
    """S5 metadata defaulting: first non-empty of the given columns, else
    ``default`` (Function.kt:345-352 upload_id <- tus_tguid fallback)."""
    cleaned = [F.when(F.trim(c) != "", F.trim(c)) for c in (F.col(c) if isinstance(c, str) else c for c in cols)]
    return F.coalesce(*cleaned, F.lit(default))
