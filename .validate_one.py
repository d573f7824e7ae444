"""Fast single-query oracle validation at sf0.01 (local[8]), mirroring the
driver gate. Usage: python .validate_one.py name1 name2 ...

Names resolve against __spark_entry__.queries()/oracle_sql() first, then
against an EXTRA dict below for not-yet-wired queries.
"""
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from data_exchange_hl7_spark import queries as q
from data_exchange_hl7_spark import queries_text as qt

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EXTRA = {
    "json_lake_flat": (q.json_lake_flat, q.ORACLE_JSON_LAKE_FLAT),
    "gold_wide_projection": (q.gold_wide_projection, q.ORACLE_GOLD_WIDE),
}


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


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    QUERIES = entrymod.queries()
    ORACLES = entrymod.oracle_sql()
    fails = 0
    for name in sys.argv[1:]:
        if name in EXTRA:
            fn, osql = EXTRA[name]
        else:
            fn, osql = QUERIES[name], ORACLES.get(name)
        sdf = fn(spark, SF_DIR)
        s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
        if osql is None:
            print(f"{name}: rows-only check — {len(s_rows)} rows")
            continue
        res = con.execute(osql)
        d_cols = [c[0] for c in res.description]
        d_rows = res.fetchall()
        sc, sm = _canon(s_cols, s_rows)
        dc, dm = _canon(d_cols, d_rows)
        ok = sc == dc and len(sm) == len(dm) and sm == dm
        print(f"{name}: cols={'OK' if sc == dc else (sc, dc)} "
              f"rows={len(sm)}/{len(dm)} hash={'OK' if sm == dm else 'FAIL'}")
        if not ok:
            fails += 1
            if sc != dc:
                print("  spark cols:", sc, "\n  duck cols :", dc)
            for i, (a, b) in enumerate(zip(sm, dm)):
                if a != b:
                    print(f"  first diff row {i}:\n   spark={a}\n   duck ={b}")
                    break
            if len(sm) != len(dm):
                print("  spark extra:", sm[:2], "\n  duck extra:", dm[:2])
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
