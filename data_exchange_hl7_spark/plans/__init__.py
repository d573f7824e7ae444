from data_exchange_hl7_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_python_udf,
    assert_pushed_filters,
    assert_single_shuffle,
    explain_str,
    n_exchanges,
    read_schema_columns,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_python_udf",
    "assert_pushed_filters",
    "assert_single_shuffle",
    "explain_str",
    "n_exchanges",
    "read_schema_columns",
]
