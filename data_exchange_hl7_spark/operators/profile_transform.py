"""Profile-driven structural transform (reference T1/T2): config -> columns.

The reference's HL7JsonTransformer (lib-bumblebee HL7JsonTransformer.kt:30-146)
walks a two-level profile (segment cardinality + per-segment field list,
Profile.kt:3-24, instance PhinGuideProfile_v2.json) and emits nested JSON:
cardinality [0..1] -> object, [0..*] -> array; fields split on | ^ & with
repeats on ~.

Spark-first re-expression: the profile is compiled ONCE into a nested
named_struct / transform() column expression — config-driven schema
generation with zero Python in the hot path (SURVEY.md section 7.4 item 5).

Also here: the T2 lake-of-segments flatten (TransformerSegments.kt:19-90) and
the T3 nearest-preceding-anchor attach (fn_hl7_to_obxs_and_segm.scala:26-34).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_exchange_hl7_spark.functions.hl7path import _field_from_line, segments_of

# Profile shape:
# {
#   "SEG": {
#     "cardinality": "[0..1]" | "[0..*]",
#     "fields": [
#        {"name": "patient_id", "field": 3},
#        {"name": "name_family", "field": 5, "component": 1},
#        {"name": "ts", "field": 7, "repeats": True},   # keep all ~ repeats
#     ],
#   }, ...
# }

EXAMPLE_PROFILE = {
    "MSH": {
        "cardinality": "[0..1]",
        "fields": [
            {"name": "sending_app", "field": 3, "component": 1},
            {"name": "message_type", "field": 9, "component": 1},
            {"name": "message_ts", "field": 7},
        ],
    },
    "PID": {
        "cardinality": "[0..1]",
        "fields": [
            {"name": "patient_id", "field": 3, "component": 1},
            {"name": "family_name", "field": 5, "component": 1},
            {"name": "given_name", "field": 5, "component": 2},
        ],
    },
    "OBX": {
        "cardinality": "[0..*]",
        "fields": [
            {"name": "set_id", "field": 1},
            {"name": "value_type", "field": 2},
            {"name": "observation_id", "field": 3, "component": 1},
            {"name": "value", "field": 5},
        ],
    },
}


# coded HL7 datatypes whose value splits into (code, text, coding system)
CODED_TYPES = ("CE", "CWE", "CNE")


def _field_expr(line: Column, seg: str, spec: dict) -> Column:
    if "dynamic_type_from" in spec:
        # dynamic typing (HL7JsonTransformer.kt:76): the field's datatype is
        # read from ANOTHER field of the same segment at runtime — the
        # reference's OBX-5-typed-by-OBX-2 case. Emitted as a struct carrying
        # the resolved type, the raw value, and the coded components when the
        # type is CE/CWE/CNE; non-coded types leave them null (to_json then
        # drops them — the reference's null-strip, Function.kt:62-64).
        t = F.try_element_at(
            F.split(_field_from_line(line, seg, spec["dynamic_type_from"]), "~"),
            F.lit(1),
        )
        v = F.try_element_at(
            F.split(_field_from_line(line, seg, spec["field"]), "~"), F.lit(1)
        )

        def comp(n):
            return F.try_element_at(F.split(v, r"\^"), F.lit(n))

        coded = t.isin(*CODED_TYPES)
        return F.struct(
            t.alias("type"),
            v.alias("value"),
            F.when(coded, comp(1)).alias("code"),
            F.when(coded, comp(2)).alias("text"),
            F.when(coded, comp(3)).alias("coding_system"),
        ).alias(spec["name"])
    v = _field_from_line(line, seg, spec["field"])
    if spec.get("repeats"):
        reps = F.split(v, "~")
        if "component" in spec:
            return F.transform(
                reps, lambda r: F.try_element_at(F.split(r, r"\^"), F.lit(spec["component"]))
            ).alias(spec["name"])
        return reps.alias(spec["name"])
    v = F.try_element_at(F.split(v, "~"), F.lit(1))
    if "component" in spec:
        v = F.try_element_at(F.split(v, r"\^"), F.lit(spec["component"]))
        if "subcomponent" in spec:
            v = F.try_element_at(F.split(v, "&"), F.lit(spec["subcomponent"]))
    return v.alias(spec["name"])


def _seg_struct(line: Column, seg: str, fields: list[dict]) -> Column:
    return F.struct(*[_field_expr(line, seg, f) for f in fields])


def profile_column(content, profile: dict) -> Column:
    """Compile a profile into ONE nested struct column.

    [0..1] segments become a struct (first occurrence, like the reference's
    object case, HL7JsonTransformer.kt:65-69); [0..*] become array<struct>
    over every occurrence."""
    content = F.col(content) if isinstance(content, str) else content
    def _mk(seg_name, fields):
        return lambda line: _seg_struct(line, seg_name, fields)

    members = []
    for seg, spec in profile.items():
        segs = segments_of(content, seg)
        if spec.get("cardinality", "[0..1]") == "[0..*]":
            col = F.transform(segs, _mk(seg, spec["fields"]))
        else:
            line = F.try_element_at(segs, F.lit(1))
            col = F.when(line.isNotNull(), _seg_struct(line, seg, spec["fields"]))
        members.append(col.alias(seg.lower()))
    return F.struct(*members)


def _attach_parsed(
    df: DataFrame, profile: dict, content_col: str, out_col: str
) -> DataFrame:
    """``profile_column`` with the projection-CSE discipline (BENCH.md):
    higher-order-function expressions are excluded from codegen
    subexpression elimination, so the single-expression struct re-splits
    ``content`` and re-filters the line array once PER FIELD (~5x wall on
    the 100k-message json-lake flatten). Bind the line array and each
    segment's line (or line array) in their OWN projections — a
    multiply-referenced non-cheap alias survives CollapseProject — then
    build the struct from the bound columns: content splits once, each
    segment filters once, fields extract from an already-materialized
    string."""
    df = df.withColumn("__hl7_lines", F.split(F.col(content_col), "\r?\n"))
    tmp = ["__hl7_lines"]
    members = []

    # single-parameter lambda factories: pyspark's higher-order functions
    # infer arity from the Python signature, so defaulted captures would be
    # bound to the (element, index) Columns
    def _pred(seg):
        return lambda x: x.startswith(seg + "|") | (F.trim(x) == seg)

    def _mk(seg, fields):
        return lambda line: _seg_struct(line, seg, fields)

    for seg, spec in profile.items():
        segs = F.filter(F.col("__hl7_lines"), _pred(seg))
        if spec.get("cardinality", "[0..1]") == "[0..*]":
            c = f"__segs_{seg}"
            df = df.withColumn(c, segs)
            col = F.transform(F.col(c), _mk(seg, spec["fields"]))
        else:
            c = f"__seg_{seg}"
            df = df.withColumn(c, F.try_element_at(segs, F.lit(1)))
            line = F.col(c)
            col = F.when(line.isNotNull(), _seg_struct(line, seg, spec["fields"]))
        tmp.append(c)
        members.append(col.alias(seg.lower()))
    return df.withColumn(out_col, F.struct(*members)).drop(*tmp)


def to_json_lake(df: DataFrame, profile: dict, content_col: str = "content") -> DataFrame:
    """T1 json-lake stage: add the parsed struct + its JSON rendering, drop
    raw content (fn-hl7-json-lake Function.kt:169 removes content after
    transform)."""
    out = _attach_parsed(df, profile, content_col, "parsed")
    return out.withColumn("json_lake", F.to_json("parsed")).drop(content_col)


def segment_lake(df: DataFrame, content_col: str = "content", id_cols: list[str] | None = None) -> DataFrame:
    """T2 lake-of-segments: one row per segment with per-type running counter
    segment_id 'OBX[3]' (TransformerSegments.kt:19-90, SegIdBuilder.kt:6-15)."""
    id_cols = id_cols or ["message_id"]
    lines = F.filter(
        F.split(F.col(content_col), "\r?\n"), lambda x: F.length(F.trim(x)) > 0
    )
    ex = df.select(*id_cols, F.posexplode(lines).alias("line_no0", "segment_line"))
    seg_type = F.substring("segment_line", 1, 3)
    w = Window.partitionBy(*id_cols, "segment_type").orderBy("line_no0")
    return (
        ex.withColumn("segment_type", seg_type)
        .withColumn("segment_number", F.row_number().over(w))
        .withColumn(
            "segment_id",
            F.concat(F.col("segment_type"), F.lit("["), F.col("segment_number"), F.lit("]")),
        )
        .withColumn("line_no", (F.col("line_no0") + 1).cast("int"))
        .drop("line_no0")
    )


def _sql_name(name: str, max_len: int = 30) -> str:
    """Driver-side mirror of functions.scalars normalize_name + truncate_name
    (lib-dex-commons StringUtils.kt:8-22 normalizeString, 33-62
    getNormalizedShortName) for column/table names generated from config."""
    import re

    s = name.lower()
    s = re.sub(r"[ \-./]", "_", s)
    s = s.replace("&", "_and_").replace("#", "_nbr")
    s = re.sub(r"[^a-z0-9_]", "", s)
    s = re.sub(r"_+", "_", s)
    if len(s) > max_len:
        s = s[: max_len - 3] + "_rg"
    return s


def to_sql_model(
    df: DataFrame,
    profile: dict,
    parent_key_col: str = "message_id",
    content_col: str = "content",
) -> dict[str, DataFrame]:
    """T5 MMG SQL normalization (deprecated/fn-mmg-sql-transformer
    TransformerSql.kt:137-214): singles -> one wide parent table; each
    repeating block -> a child table named '{seg} repeating group'
    (normalized, TransformerSql.kt:128-135) whose rows carry a surrogate id
    column '{table}_id' (TransformerSql.kt:157,179-180) linking back to the
    parent. Column names go through normalize/truncate
    (StringUtils.kt:8-22,33-62).

    The reference keys child rows with UUID.randomUUID (TransformerSql.kt:179)
    which breaks replay byte-equality (SURVEY.md section 4e); here the id is
    content-derived: sha256(parent_key | segment | position).

    Returns {"singles": wide_df, child_table_name: child_df, ...}. All tables
    derive from ONE parse of the content column; each child is a narrow
    posexplode — no shuffle anywhere in the model build.
    """
    from data_exchange_hl7_spark.functions.scalars import deterministic_key

    parsed_df = _attach_parsed(df, profile, content_col, "__parsed")
    singles_sel = [F.col(parent_key_col)]
    tables: dict[str, DataFrame] = {}
    for seg, spec in profile.items():
        fields = spec["fields"]
        if spec.get("cardinality", "[0..1]") != "[0..*]":
            for f in fields:
                singles_sel.append(
                    F.col("__parsed")[seg.lower()][f["name"]].alias(
                        _sql_name(f"{seg}_{f['name']}")
                    )
                )
        else:
            tbl = _sql_name(f"{seg} repeating group")
            idc = _sql_name(f"{tbl}_id")
            ex = parsed_df.select(
                F.col(parent_key_col),
                F.posexplode(F.col("__parsed")[seg.lower()]).alias("__pos", "__row"),
            )
            tables[tbl] = ex.select(
                F.col(parent_key_col),
                deterministic_key(
                    F.col(parent_key_col), F.lit(seg), F.col("__pos").cast("string")
                ).alias(idc),
                (F.col("__pos") + 1).cast("int").alias("seq"),
                *[
                    F.col("__row")[f["name"]].alias(_sql_name(f["name"]))
                    for f in fields
                ],
            )
    tables["singles"] = parsed_df.select(*singles_sel)
    return tables


def gold_wide(
    df: DataFrame,
    profile: dict,
    mmg_elements: list[dict],
    parent_key_col: str = "message_id",
    content_col: str = "content",
) -> DataFrame:
    """T4 MMG-driven wide gold projection + T6 canonical column order.

    The reference folds one column per MMG element over the extracted value
    map (ADFEntryPoints/runHL7GoldPipelineFull.scala:115-156 singles fold)
    and then canonicalizes the layout — meta columns first, payload columns
    sorted lexically (runHL7GoldPipelineFull.scala:250-256). Here the MMG
    config generates ONE ``select`` over the T5 SQL-model singles frame:
    each element spec ``{"name": <MMG element name>, "segment": <SEG>,
    "field_name": <profile field name>}`` becomes a column whose name is the
    element name run through the same normalize/truncate rules the reference
    applies (StringUtils.kt:8-22,33-62) — config-driven schema generation
    with zero Python in the hot path, one narrow projection, no shuffle.
    """
    singles = to_sql_model(df, profile, parent_key_col, content_col)["singles"]
    cols = []
    for el in mmg_elements:
        src = _sql_name(f"{el['segment']}_{el['field_name']}")
        cols.append(F.col(src).alias(_sql_name(el["name"])))
    named = singles.select(parent_key_col, *cols)
    meta = [parent_key_col]
    payload = sorted(c for c in named.columns if c not in meta)
    return named.select(*meta, *payload)


def attach_nearest_preceding(
    df: DataFrame,
    anchor_type: str = "OBR",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """T3/J4: attach each segment row to the nearest PRECEDING anchor segment
    within the message (OBX -> parent OBR, fn_hl7_to_obxs_and_segm.scala:26-34)
    — as-of join expressed as last(ignorenulls) over an ordered window."""
    id_cols = id_cols or ["message_id"]
    w = (
        Window.partitionBy(*id_cols)
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    anchor = F.last(
        F.when(F.col("segment_type") == anchor_type, F.col("segment_id")),
        ignorenulls=True,
    ).over(w)
    return df.withColumn("parent_anchor", anchor)


# The reference's epi-section marker: OBR-4.1 of the anchor observation
# request (spikes/cbs-pipeline/silver/hl7/fn_hl7_to_obxs_and_segm.scala:36-68)
EPI_OBR_CODE = "68991-9"


def split_obx_epi(
    seg_rows: DataFrame,
    id_cols: list[str] | None = None,
    epi_code: str = EPI_OBR_CODE,
) -> DataFrame:
    """T3 completion — the reference silver stage's 3-way segment bucket
    (fn_hl7_to_obxs_and_segm.scala:36-68): every OBX is classified by its
    nearest PRECEDING OBR's OBR-4.1 code — ``epi_obx`` when the anchor is
    the epi section (68991-9), ``non_epi_obx`` otherwise — and every other
    segment type lands in ``other``.

    Input is ``segment_lake`` output (one row per segment, ordered by
    line_no within the message). One window pass per message computes the
    carried-forward anchor code (same as-of shape as
    attach_nearest_preceding); the bucket is then a narrow CASE — no second
    shuffle, and downstream 3-output writes are ``partitionBy(obx_bucket)``
    on the same frame. Adds ``anchor_obr_code`` and ``obx_bucket``.
    """
    id_cols = id_cols or ["message_id"]
    w = (
        Window.partitionBy(*id_cols)
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obr4_1 = F.try_element_at(
        F.split(_field_from_line(F.col("segment_line"), "OBR", 4), r"\^"), F.lit(1)
    )
    anchor_code = F.last(
        F.when(F.col("segment_type") == "OBR", obr4_1), ignorenulls=True
    ).over(w)
    bucket = (
        F.when(
            (F.col("segment_type") == "OBX") & (anchor_code == F.lit(epi_code)),
            F.lit("epi_obx"),
        )
        .when(F.col("segment_type") == "OBX", F.lit("non_epi_obx"))
        .otherwise(F.lit("other"))
    )
    return seg_rows.withColumn("anchor_obr_code", anchor_code).withColumn(
        "obx_bucket", bucket
    )
