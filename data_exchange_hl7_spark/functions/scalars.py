"""Scalar function surface (reference section 2.8 of SURVEY.md).

Every ad-hoc helper in the reference maps to a built-in PySpark expression;
this module pins the exact semantics so they are identical everywhere they
are used (and in the DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_hash(col) -> Column:
    """Per-row content identity: sha256 hex (BASELINE.json invariant).
    Reference uses MD5 (lib-dex-commons StringUtils.kt:27-31)."""
    return F.sha2(F.coalesce(col, F.lit("")), 256)


def normalize_name(col) -> Column:
    """Column-name normalization (StringUtils.kt:8-22): lowercase;
    space/dash/dot/slash -> '_'; '&' -> '_and_'; '#' -> '_nbr'; strip other
    non-alnum; collapse repeated '_'."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[ \-./]", "_")
    c = F.regexp_replace(c, r"&", "_and_")
    c = F.regexp_replace(c, r"#", "_nbr")
    c = F.regexp_replace(c, r"[^a-z0-9_]", "")
    c = F.regexp_replace(c, r"_+", "_")
    return c


def truncate_name(col, max_len: int = 30) -> Column:
    """Short-name truncation with '_rg' marker (StringUtils.kt:33-62)."""
    return F.when(
        F.length(col) > max_len,
        F.concat(F.substring(col, 1, max_len - 3), F.lit("_rg")),
    ).otherwise(col)


def iso_ts(col) -> Column:
    """ISO-8601 formatting (DateHelper.kt:10-29)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")


def compact_ts_to_epoch(col, fmt: str = "yyyyMMddHHmmss") -> Column:
    """HL7 compact timestamp -> epoch seconds
    (latest_flag_and_sequencing.scala:42-43)."""
    return F.unix_timestamp(col, fmt)


def date_folder(ts_col) -> Column:
    """Sink date-folder path yyyy/MM/dd/HH (hl7-file-sink Function.kt:209-214)."""
    return F.date_format(ts_col, "yyyy/MM/dd/HH")


def field(col, sep: str, index: int) -> Column:
    """1-based delimited field access — the HL7 split idiom
    (HL7JsonTransformer.kt:61,78,99,108). index may be negative (from end);
    out-of-range yields null (ANSI-safe)."""
    return F.try_element_at(F.split(col, sep), F.lit(index))


def path_get(col, dotted: str) -> Column:
    """JSON dotted-path get (JsonHelper.kt:17-28)."""
    return F.get_json_object(col, "$." + dotted)


def filename_of(path_col) -> Column:
    """Basename of a path (fn_load_hl7.scala:7)."""
    return F.try_element_at(F.split(path_col, "/"), F.lit(-1))


def first_line_with_prefix(content_col, prefix: str) -> Column:
    """First line starting with prefix (fn_debatch_hl7.scala:16-20)."""
    return F.try_element_at(
        F.filter(F.split(content_col, "\r?\n"), lambda x: x.startswith(prefix)),
        F.lit(1),
    )


def deterministic_key(*cols) -> Column:
    """Content-derived surrogate key replacing the reference's uuid()
    (fn_debatch_hl7.scala:68, TransformerSql.kt:179) — replay-deterministic."""
    return F.sha2(F.concat_ws("|", *cols), 256)


def mmwr_week(ts_col) -> Column:
    """MMWR epidemiological week approximation used for validation checks
    (deprecated/fn-mmg-validator MmgValidator.kt:311-357): week-of-year with
    Sunday start. Expressed with built-ins (no UDF)."""
    # MMWR weeks start Sunday; ISO weekofyear starts Monday. Shift by 1 day.
    return F.weekofyear(F.date_add(ts_col, 1))
