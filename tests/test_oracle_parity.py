"""Replicates the driver's correctness gate locally: every ``queries()``
entry vs its DuckDB ``oracle_sql()`` at sf0.01 — row count, column names,
and order-insensitive stringified values must match exactly."""

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], mat


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    assert name in ORACLES, f"{name} has no oracle (expected here)"
    con = _duck()
    res = con.execute(ORACLES[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    sc, sm = _canon(s_cols, s_rows)
    dc, dm = _canon(d_cols, d_rows)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sm) == len(dm), f"{name}: row count {len(sm)} vs {len(dm)}"
    for i, (a, b) in enumerate(zip(sm, dm)):
        assert a == b, f"{name}: first diff at sorted row {i}:\n spark={a}\n duck ={b}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
