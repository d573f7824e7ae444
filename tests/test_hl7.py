"""Tests for the HL7-path extractor (D7) and profile transform (T1/T2/T3),
with fixtures shaped like the reference's test corpus."""

from pyspark.sql import functions as F

from data_exchange_hl7_spark.functions.hl7path import (
    delimiter_check,
    hl7_get,
    hl7_get_all,
)
from data_exchange_hl7_spark.operators.profile_transform import (
    EXAMPLE_PROFILE,
    attach_nearest_preceding,
    profile_column,
    segment_lake,
    to_json_lake,
)

MSG = "\n".join(
    [
        "MSH|^~\\&|LabApp^1.2|Fac|Recv|RFac|20240301102030||ORU^R01|MSG001|P|2.5.1",
        "PID|1||PAT-7^^^MRN~ALT-9^^^ALT||Doe^Jane^Q",
        "OBR|1|||68991-9^Epi^LN",
        "OBX|1|ST|77968-6^Code^LN||influenza A",
        "OBX|2|NM|30525-0^Age^LN||42",
        "OBR|2|||12345-0^Other^LN",
        "OBX|3|ST|77968-6^Code^LN||influenza B",
    ]
)


def _df(spark):
    return spark.createDataFrame([("m1", MSG)], "message_id string, content string")


def test_hl7_get_basic(spark):
    df = _df(spark)
    row = df.select(
        hl7_get("content", "MSH-9.1").alias("mt"),
        hl7_get("content", "MSH-7").alias("ts"),
        hl7_get("content", "MSH-3.2").alias("app_ver"),
        hl7_get("content", "PID-5.1").alias("family"),
        hl7_get("content", "PID-5.2").alias("given"),
        hl7_get("content", "PID-3.1").alias("first_repeat_id"),
        hl7_get("content", "OBX-5").alias("first_obx_value"),
        hl7_get("content", "OBX[2]-5").alias("second_obx_value"),
        hl7_get("content", "ZZZ-1").alias("missing_seg"),
        hl7_get("content", "PID-99").alias("missing_field"),
    ).collect()[0]
    assert row["mt"] == "ORU"
    assert row["ts"] == "20240301102030"
    assert row["app_ver"] == "1.2"
    assert row["family"] == "Doe"
    assert row["given"] == "Jane"
    assert row["first_repeat_id"] == "PAT-7"  # repeats resolve to first
    assert row["first_obx_value"] == "influenza A"
    assert row["second_obx_value"] == "42"
    assert row["missing_seg"] is None
    assert row["missing_field"] is None


def test_hl7_get_predicate(spark):
    """The reference's defining lookup: OBX[@3.1='77968-6']-5.1
    (fn_validate_hl7.scala:63-74 uses exactly this shape)."""
    df = _df(spark)
    row = df.select(
        hl7_get("content", "OBX[@3.1='77968-6']-5.1").alias("flu"),
        hl7_get("content", "OBR[@4.1='68991-9']-1").alias("epi_obr"),
        hl7_get("content", "OBX[@3.1='nope']-5").alias("nomatch"),
        hl7_get_all("content", "OBX[@3.1='77968-6']-5").alias("all_flu"),
        hl7_get_all("content", "OBX-1").alias("all_ids"),
    ).collect()[0]
    assert row["flu"] == "influenza A"
    assert row["epi_obr"] == "1"
    assert row["nomatch"] is None
    assert row["all_flu"] == ["influenza A", "influenza B"]
    assert row["all_ids"] == ["1", "2", "3"]


def test_delimiter_check(spark):
    df = spark.createDataFrame(
        [("MSH|^~\\&|ok",), ("MSH|bad|x",), ("NOT|a|msg",)], "content string"
    )
    out = [r[0] for r in df.select(delimiter_check("content")).collect()]
    assert out == [True, False, False]


def test_profile_column_nested(spark):
    df = _df(spark)
    row = df.select(profile_column("content", EXAMPLE_PROFILE).alias("p")).collect()[0]["p"]
    assert row["msh"]["sending_app"] == "LabApp"
    assert row["msh"]["message_type"] == "ORU"
    assert row["pid"]["patient_id"] == "PAT-7"
    assert row["pid"]["family_name"] == "Doe"
    # [0..*] -> array of structs, in message order
    assert [o["value"] for o in row["obx"]] == ["influenza A", "42", "influenza B"]
    assert [o["value_type"] for o in row["obx"]] == ["ST", "NM", "ST"]


def test_profile_missing_segment_is_null(spark):
    df = spark.createDataFrame(
        [("m2", "MSH|^~\\&|App\nOBX|1|ST|x||v")], "message_id string, content string"
    )
    row = df.select(profile_column("content", EXAMPLE_PROFILE).alias("p")).collect()[0]["p"]
    assert row["pid"] is None
    assert len(row["obx"]) == 1


def test_to_json_lake_drops_content(spark):
    out = to_json_lake(_df(spark), EXAMPLE_PROFILE)
    assert "content" not in out.columns
    j = out.select("json_lake").collect()[0][0]
    assert '"sending_app":"LabApp"' in j.replace(" ", "")


def test_segment_lake_and_anchor(spark):
    segs = segment_lake(_df(spark))
    rows = {r["line_no"]: r for r in segs.collect()}
    assert rows[1]["segment_id"] == "MSH[1]"
    assert rows[4]["segment_id"] == "OBX[1]"
    assert rows[7]["segment_id"] == "OBX[3]"  # per-type running counter
    anchored = attach_nearest_preceding(segs).collect()
    by_line = {r["line_no"]: r["parent_anchor"] for r in anchored}
    assert by_line[4] == "OBR[1]"  # OBX 1 under first OBR
    assert by_line[5] == "OBR[1]"
    assert by_line[7] == "OBR[2]"  # OBX 3 under second OBR
    assert by_line[1] is None  # MSH precedes any OBR


# --------------------------------------------------- profile resolution (V1)


def test_hl7_get_field_repeat_index(spark):
    """SEG-F[r].C grammar: explicit ~-repeat of a field
    (profile_config.json path shape 'MSH-21[1].1')."""
    df = _df(spark)
    row = df.select(
        hl7_get("content", "PID-3[1].1").alias("rep1"),
        hl7_get("content", "PID-3[2].1").alias("rep2"),
        hl7_get("content", "PID-3[3].1").alias("rep3"),
    ).collect()[0]
    assert row["rep1"] == "PAT-7"
    assert row["rep2"] == "ALT-9"
    assert row["rep3"] is None


# MSH-21 carries the profile identifier (two ~-repeats); MSH-6 the receiving
# facility — the two paths profile_config.json names for NNDSS / DAART
PROFILE_MSG = (
    "MSH|^~\\&|App|Fac|Recv|RFAC6|20240301||ORU^R01|X1|P|2.5.1||||||||"
    "|Gen_Case_Map_v1.0^^x~NotThis^^y\nPID|1||P1"
)

REFERENCE_CONFIG = {
    "profile_identifiers": [
        {"data_stream_id": "NNDSS", "identifier_paths": ["MSH-21[1].1"]},
        {"data_stream_id": "DAART", "identifier_paths": ["MSH-21[1].1", "MSH-6.1"]},
    ]
}


def _resolve(spark, data_stream, content=PROFILE_MSG):
    from data_exchange_hl7_spark.operators.profile_resolve import (
        load_profile_config,
        resolve_profile,
    )

    df = spark.createDataFrame(
        [(data_stream, content)], "data_stream_id string, content string"
    )
    return resolve_profile(df, load_profile_config(REFERENCE_CONFIG)).collect()[0]


def test_resolve_profile_single_path(spark):
    """NNDSS -> MSH-21[1].1 (Function.kt:133-158): stream prefix + uppercased
    first-repeat component."""
    row = _resolve(spark, "NNDSS")
    assert row["profile_name"] == "NNDSS-GEN_CASE_MAP_V1.0"
    assert row["profile_error"] is None


def test_resolve_profile_two_paths_and_case_trim(spark):
    """DAART joins both path values; stream id matching is uppercase+trim."""
    row = _resolve(spark, "  daart ")
    assert row["profile_name"] == "DAART-GEN_CASE_MAP_V1.0-RFAC6"


def test_resolve_profile_default_msh12(spark):
    """Unconfigured stream falls back to MSH-12 (DEFAULT_SPEC_PROFILE)."""
    row = _resolve(spark, "OTHER")
    assert row["profile_name"] == "OTHER-2.5.1"
    assert list(row["profile_paths"]) == ["MSH-12"]


def test_resolve_profile_empty_stream_no_prefix(spark):
    row = _resolve(spark, "")
    assert row["profile_name"] == "2.5.1"


def test_resolve_profile_missing_value_errors(spark):
    """Missing identifier value -> null profile + InvalidMessageException
    text (the reject-branch analogue of Function.kt's throw)."""
    no_msh21 = "MSH|^~\\&|App|Fac|Recv|RFAC6|20240301||ORU^R01|X1|P|2.5.1"
    row = _resolve(spark, "NNDSS", content=no_msh21)
    assert row["profile_name"] is None
    assert "Unable to load validation profile" in row["profile_error"]
    assert "MSH-21[1].1" in row["profile_error"]


# ------------------------------------------------- SQL model (T5)


def test_to_sql_model_two_blocks_golden(spark):
    """TransformerSql.kt:137-214 semantics on a 2-block profile: singles
    wide table + one child table per repeating block, deterministic
    surrogate ids, normalized/truncated column names."""
    import hashlib

    from data_exchange_hl7_spark.operators.profile_transform import to_sql_model

    profile = {
        "MSH": {
            "cardinality": "[0..1]",
            "fields": [{"name": "sending_app", "field": 3, "component": 1}],
        },
        "OBX": {
            "cardinality": "[0..*]",
            "fields": [
                {"name": "set_id", "field": 1},
                {"name": "Observation Value & Result-Of Long Name", "field": 5},
            ],
        },
        "NTE": {
            "cardinality": "[0..*]",
            "fields": [{"name": "comment", "field": 3}],
        },
    }
    msg = "\n".join(
        ["MSH|^~\\&|LabApp", "OBX|1|ST|a||v1", "NTE|1||note-a", "OBX|2|NM|b||v2"]
    )
    df = spark.createDataFrame([("m1", msg)], "message_id string, content string")
    model = to_sql_model(df, profile)

    assert set(model) == {"singles", "obx_repeating_group", "nte_repeating_group"}
    singles = model["singles"].collect()[0]
    assert singles["msh_sending_app"] == "LabApp"

    obx = sorted(model["obx_repeating_group"].collect(), key=lambda r: r["seq"])
    # long element name normalized then truncated at 30 with _rg marker
    # (StringUtils.kt:33-62)
    long_col = "observation_value_and_resul_rg"
    assert long_col in model["obx_repeating_group"].columns
    assert len(long_col) == 30
    assert [r["set_id"] for r in obx] == ["1", "2"]
    assert [r[long_col] for r in obx] == ["v1", "v2"]
    # deterministic surrogate key replaces TransformerSql.kt:179's uuid()
    expected_id = hashlib.sha256(b"m1|OBX|0").hexdigest()
    assert obx[0]["obx_repeating_group_id"] == expected_id

    nte = model["nte_repeating_group"].collect()
    assert len(nte) == 1 and nte[0]["comment"] == "note-a"
    assert nte[0]["nte_repeating_group_id"] == hashlib.sha256(b"m1|NTE|0").hexdigest()


def test_to_sql_model_deterministic_across_partitions(spark):
    from data_exchange_hl7_spark.operators.profile_transform import to_sql_model

    profile = {
        "OBX": {"cardinality": "[0..*]", "fields": [{"name": "set_id", "field": 1}]}
    }
    msg = "OBX|1\nOBX|2"
    df = spark.createDataFrame(
        [(f"m{i}", msg) for i in range(10)], "message_id string, content string"
    )
    a = sorted(map(tuple, to_sql_model(df, profile)["obx_repeating_group"].collect()))
    b = sorted(
        map(
            tuple,
            to_sql_model(df.repartition(5), profile)["obx_repeating_group"].collect(),
        )
    )
    assert a == b


# --------------------------------------------- dynamic typing (T1) + nulls


def test_dynamic_type_from_obx2(spark):
    """HL7JsonTransformer.kt:76: OBX-5's datatype comes from OBX-2 at
    runtime. Coded types split into (code, text, coding_system); scalar
    types carry only the raw value."""
    profile = {
        "OBX": {
            "cardinality": "[0..*]",
            "fields": [
                {"name": "value_type", "field": 2},
                {"name": "value", "field": 5, "dynamic_type_from": 2},
            ],
        }
    }
    msg = "\n".join(
        [
            "MSH|^~\\&|App",
            "OBX|1|CWE|x||11061-0^Influenza^LN",
            "OBX|2|NM|y||42",
        ]
    )
    df = spark.createDataFrame([("m", msg)], "message_id string, content string")
    row = df.select(profile_column("content", profile).alias("p")).collect()[0]["p"]
    cwe, nm = row["obx"]
    assert cwe["value"]["type"] == "CWE"
    assert cwe["value"]["code"] == "11061-0"
    assert cwe["value"]["text"] == "Influenza"
    assert cwe["value"]["coding_system"] == "LN"
    assert nm["value"]["type"] == "NM"
    assert nm["value"]["value"] == "42"
    assert nm["value"]["code"] is None  # non-coded: components stay null


def test_json_lake_null_backfill_strips_nulls(spark):
    """fn-hl7-json-lake Function.kt:62-64 serializes nulls then strips them;
    Spark's to_json omits null struct fields natively — assert the rendered
    JSON carries no null members for absent segments/fields."""
    df = spark.createDataFrame(
        [("m", "MSH|^~\\&|App\nOBX|1|NM|y||42")],
        "message_id string, content string",
    )
    out = to_json_lake(df, EXAMPLE_PROFILE)
    j = out.select("json_lake").collect()[0][0]
    assert "null" not in j  # PID missing entirely, no "pid":null emitted
    assert '"pid"' not in j


def test_gold_wide_canonical_order(spark):
    """T4+T6: gold_wide folds one column per MMG element over the SQL-model
    singles (runHL7GoldPipelineFull.scala:115-156), names run through the
    normalize/truncate rules (StringUtils.kt:8-22,33-62), and the layout is
    canonical — meta key first, payload lexically sorted
    (runHL7GoldPipelineFull.scala:250-256). The oracle-parity hash gate is
    column-order insensitive, so this test pins the ordering itself."""
    from data_exchange_hl7_spark.operators.profile_transform import gold_wide

    df = _df(spark)
    profile = {
        "MSH": {
            "cardinality": "[0..1]",
            "fields": [
                {"name": "sending_app", "field": 3, "component": 1},
                {"name": "message_ts", "field": 7},
            ],
        },
        "PID": {
            "cardinality": "[0..1]",
            "fields": [
                {"name": "patient_id", "field": 3, "component": 1},
                {"name": "family_name", "field": 5, "component": 1},
            ],
        },
    }
    elements = [
        # deliberately NOT alphabetical, with chars the normalizer must fold
        {"name": "Sending Application", "segment": "MSH", "field_name": "sending_app"},
        {"name": "Patient ID #", "segment": "PID", "field_name": "patient_id"},
        {"name": "Family-Name", "segment": "PID", "field_name": "family_name"},
        {"name": "Message Date/Time", "segment": "MSH", "field_name": "message_ts"},
    ]
    wide = gold_wide(df, profile, elements)
    assert wide.columns == [
        "message_id",          # meta first
        "family_name",         # then payload, lexically sorted
        "message_date_time",   # '/' -> '_'
        "patient_id_nbr",      # '#' -> '_nbr'
        "sending_application",
    ]
    row = wide.collect()[0]
    assert row["sending_application"] == "LabApp"
    assert row["patient_id_nbr"] == "PAT-7"
    assert row["family_name"] == "Doe"
    assert row["message_date_time"] == "20240301102030"
