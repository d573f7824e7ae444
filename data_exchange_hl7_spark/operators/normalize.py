"""Content normalization / redaction (reference D5, D6).

The reference redactor replaces configured HL7-path values per data-stream
rule file and emits a report of what it touched (fn-redactor
Function.kt:46-100, Helper.kt:12-39, rules at
fn-redactor/src/main/resources/profiles/DEFAULT-config.txt), with a DEFAULT
profile fallback. The receiver also strips embedded base64 binaries out of
content, replacing them with a reference (HL7Transformer.kt:17-112).

Here: rules are (profile, pattern, replacement) rows broadcast into a chained
``regexp_replace`` — one JVM-side pass, no Python. The report column counts
matches per rule before replacement (array<struct<rule, n>>), mirroring the
RedactorReport entry list (RedactorReport.kt:5-8).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RedactRule:
    name: str
    pattern: str  # Java regex
    replacement: str


# default profile (DEFAULT-config.txt fallback semantics, Helper.kt:29-39)
DEFAULT_RULES = [
    RedactRule("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<redacted:email>"),
    RedactRule("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<redacted:ip>"),
    RedactRule("aws_key", r"AKIA[0-9A-Z]{16}", "<redacted:aws-key>"),
    RedactRule(
        "secret_assign",
        r"(?i)(password|secret|api_key|token)\s*[:=]\s*\S+",
        "$1=<redacted>",
    ),
]

BOM_WS = r"^[﻿\s]+|[﻿\s]+$"
# the regex above is a pure character-class trim; btrim over the same set
# (BOM + Java-regex \s = [ \t\n\x0B\f\r]) computes it without the regex
# engine — ~2x cheaper on the hot path, identical output (tested)
TRIM_SET = "﻿ \t\n\x0b\f\r"


def clean_content(df: DataFrame, content_col: str = "content") -> DataFrame:
    """D1/D5 cleanup: strip BOM + outer whitespace. Null-safe (DELETE rows:
    btrim propagates null)."""
    return df.withColumn(content_col, F.btrim(F.col(content_col), F.lit(TRIM_SET)))


def redact(
    df: DataFrame,
    rules: list[RedactRule] | None = None,
    content_col: str = "content",
    profiles: dict[str, list[RedactRule]] | None = None,
    profile_col: str | None = None,
    with_report: bool = True,
) -> DataFrame:
    """Apply redaction rules; emit ``redaction_report`` array<struct<rule,n>>.

    With ``profiles`` + ``profile_col`` set, each row uses its profile's rule
    list with DEFAULT fallback (Helper.kt:29-39); rule lists are tiny config,
    compiled into the plan (the Catalyst equivalent of a broadcast).
    ``with_report=False`` skips the per-rule match counting — half the regex
    passes — when only the redacted content is needed.
    """
    rules = rules or DEFAULT_RULES

    def apply_rules(col, rule_list):
        if with_report:
            report = F.array(
                *[
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.coalesce(
                            F.size(F.regexp_extract_all(col, F.lit(r.pattern), F.lit(0))),
                            F.lit(0),
                        ).alias("n"),
                    )
                    for r in rule_list
                ]
            )
            report = F.filter(report, lambda x: x["n"] > 0)
        else:
            report = F.array().cast(
                "array<struct<rule string, n int>>"
            )
        out = col
        for r in rule_list:
            out = F.regexp_replace(out, r.pattern, r.replacement)
        return out, report

    col = F.coalesce(F.col(content_col), F.lit(""))
    if profiles and profile_col:
        new_col = None
        new_rep = None
        for pname, plist in profiles.items():
            c, rep = apply_rules(col, plist)
            cond = F.col(profile_col) == pname
            new_col = F.when(cond, c) if new_col is None else new_col.when(cond, c)
            new_rep = F.when(cond, rep) if new_rep is None else new_rep.when(cond, rep)
        dflt_c, dflt_r = apply_rules(col, rules)
        new_col = new_col.otherwise(dflt_c)
        new_rep = new_rep.otherwise(dflt_r)
    else:
        new_col, new_rep = apply_rules(col, rules)

    # report FIRST: both expressions reference content_col by name, and
    # withColumn re-resolves names against the updated frame — writing the
    # redacted content first would make the report count the redacted text
    return df.withColumn("redaction_report", new_rep).withColumn(
        content_col, F.when(F.col(content_col).isNotNull(), new_col)
    )


# ---------------------------------------------------------------- D5 strip

# ED-typed OBX payload marker (HL7Transformer.kt:92 "^Base64^"); payload runs
# from after the marker to the end of the field/segment line
_ED_PAYLOAD_RE = r"(\^Base64\^)[^|\r\n]*"


def _obx_field(line, n: int):
    """OBX field n, first ~-repeat (HL7 numbering: split index n)."""
    v = F.try_element_at(F.split(line, r"\|"), F.lit(n + 1))
    return F.try_element_at(F.split(v, "~"), F.lit(1))


def _obx_comp(line, field: int, comp: int):
    return F.try_element_at(F.split(_obx_field(line, field), r"\^"), F.lit(comp))


def strip_embedded_binary(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "message_id",
    uri_prefix: str = "attachment://",
) -> tuple[DataFrame, DataFrame]:
    """D5 embedded-binary strip (fn-receiver-debatcher HL7Transformer.kt:17-112).

    Detects base64 payloads at the reference's BINARY_PATH
    ``OBX[@2='ED']-5[1].5`` (marker component 4 == 'Base64'), replaces each
    inline payload with a deterministic reference URI
    ``{prefix}{id}/{line_no}[.ext]`` (extension from FILE_TYPE_PATH
    ``OBX[@2='ED']-5[1].3``; the reference uploads to
    "$dirPath/$lineNumber$extension", HL7Transformer.kt:80-82 — its random
    UUID dirPath becomes the content-derived id here, replay-deterministic),
    and side-outputs the payloads.

    Returns ``(stripped_df, attachments_df)``; attachments has one row per
    embedded payload (the reference handles only the first ED segment —
    this generalizes to all of them) with the decoded payload's sha256 and
    byte size. All pure column expressions; payload bytes never cross into
    Python. Messages with embedded data get their line endings normalized to
    '\\n' by the rebuild (the reference joins on '\\n' too,
    HL7Transformer.kt:46); untouched messages pass through byte-identical.
    """
    lines = F.split(F.col(content_col), "\r?\n")
    pairs = F.transform(
        lines, lambda x, i: F.struct(x.alias("line"), (i + 1).alias("n"))
    )

    def is_ed(line):
        payload = _obx_comp(line, 5, 5)
        return (
            line.startswith("OBX|")
            & (_obx_field(line, 2) == "ED")
            & (_obx_comp(line, 5, 4) == "Base64")
            & payload.isNotNull()
            & (payload != "")
        )

    def uri(p):
        ext = _obx_comp(p["line"], 5, 3)
        dot_ext = F.when(
            ext.isNotNull() & (ext != ""), F.concat(F.lit("."), ext)
        ).otherwise(F.lit(""))
        return F.concat(
            F.lit(uri_prefix), F.col(id_col), F.lit("/"), p["n"].cast("string"), dot_ext
        )

    eds = F.filter(pairs, lambda p: is_ed(p["line"]))
    attachments = (
        df.select(F.col(id_col), F.explode(eds).alias("p"))
        .select(
            F.col(id_col),
            F.col("p")["n"].cast("int").alias("line_no"),
            _obx_comp(F.col("p")["line"], 5, 3).alias("extension"),
            _obx_comp(F.col("p")["line"], 5, 5).alias("payload_b64"),
            F.sha2(F.unbase64(_obx_comp(F.col("p")["line"], 5, 5)), 256).alias(
                "payload_sha256"
            ),
            F.octet_length(F.unbase64(_obx_comp(F.col("p")["line"], 5, 5)))
            .cast("bigint")
            .alias("n_bytes"),
            uri(F.col("p")).alias("ref_uri"),
        )
    )

    new_lines = F.transform(
        pairs,
        lambda p: F.when(
            is_ed(p["line"]),
            F.regexp_replace(
                p["line"], F.lit(_ED_PAYLOAD_RE), F.concat(F.lit("$1"), uri(p))
            ),
        ).otherwise(p["line"]),
    )
    stripped = df.withColumn(
        content_col,
        F.when(F.size(eds) > 0, F.array_join(new_lines, "\n")).otherwise(
            F.col(content_col)
        ),
    ).withColumn("n_embedded", F.size(eds))
    return stripped, attachments
