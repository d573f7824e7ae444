"""Validation verdicts + accept/reject branch (reference V1-V3, K2).

The reference validates each record against a profile and attaches a report
(lib-nist-validator ProfileManager.kt:135-172) with entries
{line, column, path, description, category, classification}, per-category
error counts, and a status derived with structure-errors-take-precedence
(ProfileManager.kt:158-163). A sidecar branches records to OK vs ERR
destinations on summary.problem == null (fns-sidecars/fn-sc-branch
Function.kt:35-69).

Here the record domain is source-code change events; the checks are the
structural analogues, all pure column expressions (no Python in the hot
path):

  structure checks (reject -> not applied):
    - required metadata present: commit non-empty (Function.kt:218-220)
    - op in the known set (delimiter sanity analogue, D8
      fn-structure-validator Function.kt:193-205)
    - RENAME carries new_path
    - non-DELETE carries content
  content checks (warn, still applied):
    - BOM/whitespace pollution (CovidELRWithBlanks fixture analogue)
    - oversized content
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VALID = "VALID_MESSAGE"
STRUCTURE_ERRORS = "STRUCTURE_ERRORS"
CONTENT_ERRORS = "CONTENT_ERRORS"

KNOWN_OPS = ["INSERT", "UPDATE", "DELETE", "RENAME", "SCHEMA_ADD", "SCHEMA_RENAME", "SCHEMA_WIDEN"]

ENTRY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("category", T.StringType()),
            T.StructField("classification", T.StringType()),
        ]
    )
)


def _entry(path: str, description: str, category: str, classification: str):
    return F.struct(
        F.lit(path).alias("path"),
        F.lit(description).alias("description"),
        F.lit(category).alias("category"),
        F.lit(classification).alias("classification"),
    )


def validate(df: DataFrame, max_content_bytes: int = 1_000_000) -> DataFrame:
    """Attach NistReport-shaped verdict columns.

    Adds ``report_entries`` (array<struct>), ``error_count`` /
    ``warning_count`` structs {structure, content}, and ``status`` with the
    reference's precedence rule (structure errors win,
    ProfileManager.kt:158-163).
    """
    checks = [
        (
            # schema-change events are metadata-only: exempt from the
            # required-provenance check (a real WAL's DDL records carry no
            # per-file commit)
            (F.coalesce(F.trim("commit"), F.lit("")) == "")
            & ~F.col("op").startswith("SCHEMA"),
            _entry("commit", "required metadata 'commit' missing", "Usage", "Error"),
            "structure",
        ),
        (
            ~F.col("op").isin(*KNOWN_OPS),
            _entry("op", "unknown operation", "Format", "Error"),
            "structure",
        ),
        (
            (F.col("op") == "RENAME") & F.col("new_path").isNull(),
            _entry("new_path", "RENAME without new_path", "Usage", "Error"),
            "structure",
        ),
        (
            (~F.col("op").isin("DELETE", "SCHEMA_ADD", "SCHEMA_RENAME", "SCHEMA_WIDEN"))
            & (F.coalesce(F.col("content"), F.lit("")) == ""),
            _entry("content", "missing content for upsert", "Usage", "Error"),
            "structure",
        ),
        (
            # equivalent to rlike("^[BOM\s]+|[BOM\s]+$") but without the regex
            # engine: polluted iff trimming the char set changes the string
            F.coalesce(F.col("content"), F.lit(""))
            != F.btrim(F.coalesce(F.col("content"), F.lit("")), F.lit("﻿ \t\n\x0b\f\r")),
            _entry("content", "leading/trailing whitespace or BOM", "Format", "Warning"),
            "content",
        ),
        (
            F.length(F.coalesce(F.col("content"), F.lit(""))) > max_content_bytes,
            _entry("content", "content exceeds size budget", "Constraint Failure", "Error"),
            "content",
        ),
    ]

    entries = F.filter(
        F.array(
            *[F.when(cond, e).otherwise(F.lit(None)) for cond, e, _ in checks]
        ),
        lambda x: x.isNotNull(),
    ).cast(ENTRY_TYPE)

    # counts derive from the materialized entries (exact by construction)
    entries_col = F.col("report_entries")
    out = df.withColumn("report_entries", entries)
    struct_errors = F.size(
        F.filter(
            entries_col,
            lambda x: (x["classification"] == "Error")
            & x["path"].isin("commit", "op", "new_path")
            | ((x["path"] == "content") & (x["description"] == "missing content for upsert") & (x["classification"] == "Error")),
        )
    )
    content_errors = F.size(
        F.filter(
            entries_col,
            lambda x: (x["classification"] == "Error")
            & (x["path"] == "content")
            & (x["description"] != "missing content for upsert"),
        )
    )
    warnings = F.size(F.filter(entries_col, lambda x: x["classification"] == "Warning"))
    out = (
        out.withColumn(
            "error_count",
            F.struct(
                struct_errors.alias("structure"), content_errors.alias("content")
            ),
        )
        .withColumn("warning_count", F.struct(warnings.alias("content")))
        .withColumn(
            "status",
            F.when(struct_errors > 0, F.lit(STRUCTURE_ERRORS))
            .when(content_errors > 0, F.lit(CONTENT_ERRORS))
            .otherwise(F.lit(VALID)),
        )
    )
    return out


def branch(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """K2 ok/err router: (accepted, rejected).

    The reference branches on summary.problem == null
    (fn-sc-branch Function.kt:35-69); here on structure errors. CONTENT_ERRORS
    records are accepted-with-warnings (they continue down the pipeline, as
    the reference's content-warning path does).
    """
    ok = df.filter(F.col("status") != STRUCTURE_ERRORS)
    err = df.filter(F.col("status") == STRUCTURE_ERRORS)
    return ok, err
