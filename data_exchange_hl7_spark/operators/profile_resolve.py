"""Message-driven validation-profile resolution (reference V1).

The reference picks the validation profile per record from the message
content itself (fn-structure-validator Function.kt:133-158
``getProfileNameAndPaths``):

  1. uppercase+trim the record's data_stream_id;
  2. look it up in config (resources/profiles/profile_config.json — entries
     {data_stream_id, identifier_paths}, model
     lib-dex-commons ProfileConfiguration.kt:9-16);
  3. paths = the entry's identifier_paths, or [MSH-12] when the stream is
     not configured (DEFAULT_SPEC_PROFILE);
  4. extract each path's first value from the message, uppercase;
  5. profile name = "{STREAM}-{v1}-{v2}-..." (prefix omitted when the stream
     id is empty); any missing value -> InvalidMessageException
     ("Unable to load validation profile ...").

Spark-first: the config is compiled into one CASE chain of pure column
expressions over ``hl7_get`` (no UDF, no driver lookup per row); a failed
resolution yields a null profile plus a ``profile_error`` message instead of
an exception, so the row can flow to the reject branch (K2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_exchange_hl7_spark.functions.hl7path import hl7_get

# Function.kt DEFAULT_SPEC_PROFILE: HL7 version id
DEFAULT_SPEC_PROFILE = "MSH-12"


@dataclass(frozen=True)
class ProfileIdentifier:
    data_stream_id: str
    identifier_paths: tuple[str, ...]


def load_profile_config(config: dict) -> list[ProfileIdentifier]:
    """Parse the profile_config.json shape
    ({"profile_identifiers": [{"data_stream_id", "identifier_paths"}]})."""
    return [
        ProfileIdentifier(e["data_stream_id"], tuple(e["identifier_paths"]))
        for e in config["profile_identifiers"]
    ]


def _name_expr(stream_uc: Column, paths: tuple[str, ...], content_col: str) -> Column:
    """Profile name from identifier-path values, null when any is missing."""
    vals = [F.upper(hl7_get(content_col, p)) for p in paths]
    complete = vals[0].isNotNull() & (vals[0] != "")
    for v in vals[1:]:
        complete = complete & v.isNotNull() & (v != "")
    joined = F.concat_ws("-", *vals)
    # prefix = "$stream-" only when the stream id is non-empty (Function.kt:144)
    full = F.when(stream_uc != "", F.concat_ws("-", stream_uc, joined)).otherwise(joined)
    return F.when(complete, full)


def resolve_profile(
    df: DataFrame,
    config: list[ProfileIdentifier],
    data_stream_col: str = "data_stream_id",
    content_col: str = "content",
    out_col: str = "profile_name",
) -> DataFrame:
    """Attach ``out_col`` (resolved profile name or null) and
    ``profile_error`` (the reference's InvalidMessageException text on
    failure, else null)."""
    stream_uc = F.upper(F.trim(F.coalesce(F.col(data_stream_col), F.lit(""))))
    expr = None
    paths_expr = None
    for entry in config:
        sid = entry.data_stream_id.upper().strip()
        cond = stream_uc == sid
        val = _name_expr(stream_uc, entry.identifier_paths, content_col)
        plist = F.array(*[F.lit(p) for p in entry.identifier_paths])
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        paths_expr = (
            F.when(cond, plist) if paths_expr is None else paths_expr.when(cond, plist)
        )
    dflt = _name_expr(stream_uc, (DEFAULT_SPEC_PROFILE,), content_col)
    dflt_paths = F.array(F.lit(DEFAULT_SPEC_PROFILE))
    expr = dflt if expr is None else expr.otherwise(dflt)
    paths_expr = dflt_paths if paths_expr is None else paths_expr.otherwise(dflt_paths)

    out = df.withColumn(out_col, expr).withColumn("profile_paths", paths_expr)
    return out.withColumn(
        "profile_error",
        F.when(
            F.col(out_col).isNull(),
            F.concat(
                F.lit(
                    "Unable to load validation profile: One or more values in "
                    "the profile path(s) "
                ),
                F.array_join(F.col("profile_paths"), ", "),
                F.lit(" are missing."),
            ),
        ),
    )
