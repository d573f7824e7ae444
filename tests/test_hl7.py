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
