"""MMG-style content validation: cardinality, dates, MMWR, sub-id (V4).

The reference's content validator walks each MMG element and checks
(deprecated/fn-mmg-validator/.../MmgValidator.kt:36-97 driver):

  - cardinality min/max, regex-parsed from "[m..n]" (MmgValidator.kt:209-272,
    parse at 211-214)
  - date format + MMWR week/year (MmgValidator.kt:311-357, DateUtil)
  - OBX-4 sub-id presence/uniqueness within repeating blocks
    (MmgValidator.kt:100-165; uniqueness via groupingBy{}.eachCount()
    .filter{v>=2} at line 128)
  - vocabulary membership (MmgValidator.kt:289-310 — operators/vocab.py)

Severity comes from the element usage ("R" -> Error else Warning,
getCategory). The vectorized Scala variant folds the same checks over
columns (spikes/cbs-pipeline/ADFEntryPoints/runHL7GoldContentValidation.scala:
136-347).

Spark-first: each rule compiles to pure column expressions over
``hl7_get_all`` (value arrays per message) — per-message counting needs no
shuffle at all, unlike the reference's groupBy variant; at 100 TB this stage
stays narrow.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_exchange_hl7_spark.functions.hl7path import hl7_get_all
from data_exchange_hl7_spark.operators.validate import ENTRY_TYPE

_CARD_RE = re.compile(r"^\[(\d+)\.\.(\d+|\*)\]$")  # MmgValidator.kt:211-214


def parse_cardinality(card: str) -> tuple[int, int | None]:
    m = _CARD_RE.match(card.strip())
    if not m:
        raise ValueError(f"unsupported cardinality: {card!r}")
    lo = int(m.group(1))
    hi = None if m.group(2) == "*" else int(m.group(2))
    return lo, hi


@dataclass(frozen=True)
class ContentRule:
    """One element to content-validate.

    ``path`` is an HL7 path whose values are collected across ALL matching
    segments (getValue semantics). ``usage`` "R" -> Error else Warning.
    """

    name: str
    path: str
    cardinality: str = "[0..*]"
    date_check: bool = False
    mmwr_week_check: bool = False
    usage: str = "R"

    @property
    def classification(self) -> str:
        return "Error" if self.usage == "R" else "Warning"


def _rule_entry(description: Column, rule: ContentRule, category: str) -> Column:
    return F.struct(
        F.lit(rule.path).alias("path"),
        description.alias("description"),
        F.lit(category).alias("category"),
        F.lit(rule.classification).alias("classification"),
    )


def check_content(
    df: DataFrame,
    rules: list[ContentRule],
    content_col: str = "content",
    out_col: str = "content_entries",
) -> DataFrame:
    """Attach ``out_col``: array of content report entries across all rules.

    Per rule: cardinality count vs parsed [m..n]; optional HL7 date check
    (yyyyMMdd or yyyyMMddHHmmss with a real calendar date — DateUtil
    semantics); optional MMWR week check (integer 1..53,
    MmgValidator.kt:311-357)."""
    # Two projections, not one: stage 1 binds each rule's extracted value
    # array to a column, stage 2 builds the entry structs from those columns.
    # A single projection would inline the split/filter tree at every use
    # site (lambda-bearing expressions are excluded from codegen
    # subexpression elimination, and CollapseProject only keeps an alias
    # shared when it is non-cheap AND multiply referenced — which is exactly
    # what this split guarantees).
    val_cols: dict[int, str] = {}
    stage1 = df
    for i, r in enumerate(rules):
        c = f"__cc{i}_vals"
        val_cols[i] = c
        stage1 = stage1.withColumn(
            c,
            F.filter(
                hl7_get_all(content_col, r.path),
                lambda v: v.isNotNull() & (v != ""),
            ),
        )

    entries: list[Column] = []
    for i, r in enumerate(rules):
        vals = F.col(val_cols[i])
        n = F.size(vals)
        lo, hi = parse_cardinality(r.cardinality)
        too_few = n < lo
        too_many = F.lit(False) if hi is None else n > hi
        entries.append(
            F.when(
                too_few | too_many,
                _rule_entry(
                    F.concat(
                        F.lit(f"Cardinality violation for {r.name}: expected "),
                        F.lit(r.cardinality),
                        F.lit(", found "),
                        n.cast("string"),
                    ),
                    r,
                    "CARDINALITY",
                ),
            )
        )
        if r.date_check:
            # valid: 8 or 14 digits AND the date part parses on the calendar
            bad_date = lambda v: ~(  # noqa: E731
                v.rlike(r"^\d{8}(\d{6})?$")
                & F.try_to_timestamp(F.substring(v, 1, 8), F.lit("yyyyMMdd")).isNotNull()
            )
            first_bad = F.try_element_at(F.filter(vals, bad_date), F.lit(1))
            entries.append(
                F.when(
                    first_bad.isNotNull(),
                    _rule_entry(
                        F.concat(
                            F.lit(f"Invalid date for {r.name}: '"),
                            first_bad,
                            F.lit("'"),
                        ),
                        r,
                        "DATE_CONTENT",
                    ),
                )
            )
        if r.mmwr_week_check:
            bad_week = lambda v: (  # noqa: E731
                v.try_cast("int").isNull()
                | (v.try_cast("int") < 1)
                | (v.try_cast("int") > 53)
            )
            first_bad = F.try_element_at(F.filter(vals, bad_week), F.lit(1))
            entries.append(
                F.when(
                    first_bad.isNotNull(),
                    _rule_entry(
                        F.concat(
                            F.lit(f"Invalid MMWR week for {r.name}: '"),
                            first_bad,
                            F.lit("'"),
                        ),
                        r,
                        "MMWR_WEEK",
                    ),
                )
            )
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull()).cast(ENTRY_TYPE)
    return stage1.withColumn(out_col, arr).drop(*val_cols.values())


def check_subid_uniqueness(
    df: DataFrame,
    path: str = "OBX-4",
    content_col: str = "content",
    out_col: str = "subid_entries",
    usage: str = "R",
) -> DataFrame:
    """OBX-4 sub-id presence + uniqueness within the message
    (MmgValidator.kt:100-165; the reference counts duplicates with
    groupingBy{}.eachCount().filter{v>=2} — here the whole check is one
    array expression per row, no aggregation)."""
    classification = "Error" if usage == "R" else "Warning"
    # same two-projection trick as check_content: bind the extracted arrays
    # once so the path-extraction tree is evaluated once per row, not per use
    df = df.withColumn("__sid_vals", hl7_get_all(content_col, path)).withColumn(
        "__sid_present",
        F.filter(F.col("__sid_vals"), lambda v: v.isNotNull() & (v != "")),
    )
    vals = F.col("__sid_vals")
    present = F.col("__sid_present")
    missing = F.size(vals) > F.size(present)
    dups = F.size(present) > F.size(F.array_distinct(present))
    entries = [
        F.when(
            missing,
            F.struct(
                F.lit(path).alias("path"),
                F.lit("OBX segment missing sub-id in repeating block").alias(
                    "description"
                ),
                F.lit("OBSERVATION_SUB_ID").alias("category"),
                F.lit(classification).alias("classification"),
            ),
        ),
        F.when(
            dups,
            F.struct(
                F.lit(path).alias("path"),
                F.lit("Duplicate OBX sub-id within repeating block").alias(
                    "description"
                ),
                F.lit("OBSERVATION_SUB_ID").alias("category"),
                F.lit(classification).alias("classification"),
            ),
        ),
    ]
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull()).cast(ENTRY_TYPE)
    return df.withColumn(out_col, arr).drop("__sid_vals", "__sid_present")
