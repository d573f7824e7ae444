"""Vocabulary / value-set membership validation (reference V4/V6).

The reference checks each coded value against a PHIN VADS value set and emits
a VOCAB issue when the concept is missing:

  - per-element check loop: deprecated/fn-mmg-validator/.../MmgValidator.kt:289-310
    (``checkVocab`` -> ``isConceptValid`` = membership probe, issue text
    "Unable to find '<value>' on '<valueSetCode>'")
  - vectorized Spark variant: spikes/cbs-pipeline/ADFEntryPoints/
    runHL7GoldContentValidation.scala:107-136 (vocab map joined onto rows)
  - vocab table load per code system: spikes/cbs-pipeline/vocab/
    content_vocab_lookup.scala:2-26 (SELECT concept_code, concept_name ...
    WHERE code_system_oid = ...)
  - issue severity from element usage: MmgValidator.kt getCategory
    ("R" -> ERROR else WARNING)

Spark-first: the vocab table is a (value_set_code, concept_code[, concept_name])
DataFrame, broadcast left-joined against each checked column; a missing match
becomes a ``value-set`` report entry. No driver-side collect of data, no
Python in the hot path — at 100 TB the vocab side stays a broadcast dim
(value sets are config-sized) while the fact side streams through.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SCHEMA = (
    "value_set_code string, concept_code string, concept_name string, "
    "preferred_name string"
)


@dataclass(frozen=True)
class VocabCheck:
    """One coded column to validate against one value set.

    ``usage`` follows the MMG element usage semantics (MmgValidator.kt
    getCategory): "R" (required) -> Error, anything else -> Warning.
    """

    value_col: str
    value_set_code: str
    path: str = ""
    usage: str = "R"

    @property
    def classification(self) -> str:
        return "Error" if self.usage == "R" else "Warning"


def vocab_table(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Build a vocab dim from (value_set_code, concept_code[, concept_name
    [, preferred_name]]) tuples — the content_vocab_lookup.scala load shape
    (concept_name = code-system designation, preferred_name = the CDC
    preferred designation the reference's SQL model denormalizes in)."""
    full = [(tuple(r) + (None,) * (4 - len(r)))[:4] for r in rows]
    return spark.createDataFrame(full, VOCAB_SCHEMA)


def check_vocab(
    df: DataFrame,
    vocab: DataFrame,
    checks: list[VocabCheck],
    out_col: str = "value_set_entries",
) -> DataFrame:
    """Attach ``out_col``: array of value-set report entries, one per checked
    column whose (non-empty) value is absent from its value set.

    Entry shape matches operators.validate.ENTRY_TYPE; description text
    mirrors MmgValidator.kt VOCAB_ISSUE ("Unable to find 'X' on 'SET'").
    Null/empty values are skipped (the reference only checks populated
    elements — empties are cardinality's job, not vocab's).
    """
    out = df
    probes = []
    for i, c in enumerate(checks):
        marker = f"__vocab_hit_{i}"
        dim = (
            vocab.filter(F.col("value_set_code") == c.value_set_code)
            .select(F.col("concept_code").alias(marker))
            .distinct()
        )
        out = out.join(
            F.broadcast(dim), out[c.value_col] == dim[marker], "left"
        )
        probes.append((c, marker))

    entries = []
    for c, marker in probes:
        val = F.col(c.value_col)
        miss = val.isNotNull() & (val != "") & F.col(marker).isNull()
        entries.append(
            F.when(
                miss,
                F.struct(
                    F.lit(c.path or c.value_col).alias("path"),
                    F.concat(
                        F.lit("Unable to find '"),
                        val,
                        F.lit(f"' on '{c.value_set_code}'"),
                    ).alias("description"),
                    F.lit("VOCAB").alias("category"),
                    F.lit(c.classification).alias("classification"),
                ),
            )
        )
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
    return out.withColumn(out_col, arr).drop(*[m for _, m in probes])


def enrich_coded(
    df: DataFrame,
    vocab: DataFrame,
    code_col,
    value_set_code: str,
    out_prefix: str,
) -> DataFrame:
    """CE/CWE coded-type enrichment (reference T5 SQL model,
    deprecated/fn-mmg-sql-transformer TransformerSql.kt:68-74): for a coded
    element, denormalize two vocab designations onto the row —
    ``{prefix}_code_system_concept_name`` (the concept's name in its code
    system) and ``{prefix}_cdc_preferred_designation`` (the CDC preferred
    name) — by looking the code up in the value set.

    Spark-first: one broadcast left join per coded element (value sets are
    config-sized dims; the fact side streams through, same scale shape as
    check_vocab). ``code_col`` may be any Column (e.g. a coded struct's
    ``.code`` field); unmatched or null codes leave both columns null, which
    is the reference's behavior for unknown concepts.
    """
    code_col = F.col(code_col) if isinstance(code_col, str) else code_col
    marker = f"__enrich_{out_prefix}"
    dim = (
        vocab.filter(F.col("value_set_code") == value_set_code)
        .select(
            F.col("concept_code").alias(marker),
            F.col("concept_name").alias(f"{out_prefix}_code_system_concept_name"),
            F.col("preferred_name").alias(f"{out_prefix}_cdc_preferred_designation"),
        )
    )
    return df.join(F.broadcast(dim), code_col == dim[marker], "left").drop(marker)
