"""Physical-plan inspection helpers: make plan properties testable.

The scale contract of each operator ("filter reaches the scan", "dim join is
broadcast", "dedup is one shuffle", "no Python in the hot path") is asserted
in tests with these helpers rather than trusted — the plan regressing to a
slow shape fails CI, the same way a wrong result would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle exchanges in the physical plan (reused exchanges count
    once — they execute once)."""
    plan = explain_str(df)
    return len(re.findall(r"\bExchange hashpartitioning", plan)) + len(
        re.findall(r"\bExchange rangepartitioning", plan)
    )


def assert_single_shuffle(df: DataFrame) -> None:
    n = n_exchanges(df)
    assert n <= 1, f"expected <=1 shuffle, plan has {n}:\n{explain_str(df)}"


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the parquet scan carries PushedFilters mentioning every
    fragment (predicate pushdown reached the source)."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = " ; ".join(m)
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; pushed={pushed!r}"


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = explain_str(df)
    n = len(re.findall(r"BroadcastHashJoin", plan))
    assert n >= at_least, f"expected >= {at_least} broadcast joins:\n{plan}"


def assert_no_python_udf(df: DataFrame) -> None:
    """The no-per-row-Python discipline (input_hint): plans must not contain
    BatchEvalPython (row-at-a-time UDF). ArrowEvalPython / MapInPandas are
    allowed where declared."""
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan, f"row-at-a-time Python UDF in plan:\n{plan}"


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the source (column pruning evidence)."""
    plan = explain_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]
