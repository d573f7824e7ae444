"""LakeTable unit tests: schema evolution, commit protocol, MoR/compaction."""

import pytest
from pyspark.sql import functions as F

from data_exchange_hl7_spark.lake.table import ConcurrentCommitError, LakeTable

SCHEMA = [("k", "string"), ("v", "string"), ("n", "int"), ("lsn", "bigint")]


def _changes(spark, rows):
    df = spark.createDataFrame(rows, "k string, v string, n int, lsn long, __op string")
    return df


def _mk(spark, tmp_path, name="t", mode="cow"):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["k"], n_buckets=4,
        mode=mode, order_col="lsn" if mode == "mor" else None,
    )


def test_merge_upsert_delete(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("a", "1", 1, 1, "U"), ("b", "2", 2, 2, "U")]), epoch=0)
    t.merge(_changes(spark, [("a", "9", 9, 3, "U"), ("b", None, None, 4, "D")]), epoch=1)
    rows = {r["k"]: r for r in t.snapshot().collect()}
    assert set(rows) == {"a"}
    assert rows["a"]["v"] == "9"


def test_epoch_idempotence_and_empty_epoch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    r1 = t.merge(_changes(spark, [("a", "1", 1, 1, "U")]), epoch=0)
    r2 = t.merge(_changes(spark, [("a", "XXX", 0, 99, "U")]), epoch=0)  # same epoch
    assert r1["applied"] and not r2["applied"]
    assert t.snapshot().collect()[0]["v"] == "1"
    r3 = t.merge(_changes(spark, []), epoch=1)  # empty epoch still advances
    assert r3["applied"] and "1" in t.committed_epochs()


def test_schema_evolution_add_rename_widen(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("a", "1", 7, 1, "U")]), epoch=0)
    t.add_column("extra", "string")
    t.rename_column("v", "v2")
    t.widen_column("n", "bigint")
    # old files still readable: field-id mapping renames, widen casts, add nulls
    row = t.snapshot().collect()[0]
    assert row["v2"] == "1" and row["extra"] is None and row["n"] == 7
    assert dict((f["name"], f["type"]) for f in t.schema_fields())["n"] == "bigint"
    # new write at current schema coexists with the old file
    new = spark.createDataFrame(
        [("b", "2", 2**40, 2, "x", "U")],
        "k string, v2 string, n long, lsn long, extra string, __op string",
    )
    t.merge(new, epoch=1)
    rows = {r["k"]: r for r in t.snapshot().collect()}
    assert rows["b"]["n"] == 2**40 and rows["b"]["extra"] == "x"
    assert rows["a"]["v2"] == "1"


def test_illegal_widen_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path, "t2")
    with pytest.raises(ValueError, match="illegal widen"):
        t.widen_column("v", "bigint")  # string -> bigint is not a widening


def test_concurrent_commit_detected(spark, tmp_path):
    t = _mk(spark, tmp_path, "t3")
    snap = t.current_snapshot()
    stale = dict(snap)
    stale["snapshot_id"] = snap["snapshot_id"] + 1
    t._write_snapshot(dict(stale), expected_parent=snap["snapshot_id"])  # winner
    with pytest.raises(ConcurrentCommitError):
        t._write_snapshot(dict(stale), expected_parent=snap["snapshot_id"])  # loser


def test_mor_resolution_and_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path, "t4", mode="mor")
    t.merge(_changes(spark, [("a", "1", 1, 1, "U"), ("b", "2", 2, 2, "U")]), epoch=0)
    t.merge(_changes(spark, [("a", "3", 3, 3, "U"), ("b", None, None, 4, "D")]), epoch=1)
    before = sorted(tuple(r) for r in t.snapshot().collect())
    assert [r[0] for r in before] == ["a"] and before[0][1] == "3"
    res = t.compact()
    assert res["compacted"]
    after = sorted(tuple(r) for r in t.snapshot().collect())
    assert after == before  # compaction preserves the resolved state
    assert t.current_snapshot()["deltas"] == []
    # manifest survives compaction
    assert set(t.committed_epochs()) == {"0", "1"}
    # deletes are physically gone after compaction (no tombstones)
    t2 = LakeTable(spark, t.location)
    assert t2.snapshot().count() == 1


def test_mor_order_col_decides(spark, tmp_path):
    t = _mk(spark, tmp_path, "t5", mode="mor")
    # later delta with LOWER lsn must NOT win
    t.merge(_changes(spark, [("a", "new", 1, 10, "U")]), epoch=0)
    t.merge(_changes(spark, [("a", "stale", 1, 5, "U")]), epoch=1)
    assert t.snapshot().collect()[0]["v"] == "new"


def test_bucket_pruned_read(spark, tmp_path):
    t = _mk(spark, tmp_path, "t6")
    rows = [(f"k{i}", str(i), i, i, "U") for i in range(50)]
    t.merge(_changes(spark, rows), epoch=0)
    snap = t.current_snapshot()
    some_bucket = int(list(snap["buckets"].keys())[0])
    part = t.snapshot(buckets=[some_bucket])
    assert 0 < part.count() < 50  # reads only the selected bucket's files


def test_expire_snapshots_removes_orphans(spark, tmp_path):
    t = _mk(spark, tmp_path, "t7", mode="mor")
    t.merge(_changes(spark, [("a", "1", 1, 1, "U"), ("b", "2", 2, 2, "U")]), epoch=0)
    t.merge(_changes(spark, [("a", "3", 3, 3, "U")]), epoch=1)
    t.compact()
    before = sorted(tuple(r) for r in t.snapshot().collect())
    import os

    def parquet_count():
        n = 0
        for root, _d, files in os.walk(t.data_dir):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    n_before = parquet_count()
    res = t.expire_snapshots(keep_last=1)
    assert res["removed_files"] > 0 and parquet_count() < n_before
    # current state unaffected; manifest + epochs survive
    assert sorted(tuple(r) for r in t.snapshot().collect()) == before
    assert set(t.committed_epochs()) == {"0", "1"}
    # expired metadata gone, current still loadable by a fresh handle
    t2 = LakeTable(spark, t.location)
    assert sorted(tuple(r) for r in t2.snapshot().collect()) == before


def test_expire_snapshots_keep_last_preserves_ancestor(spark, tmp_path):
    t = _mk(spark, tmp_path, "t8")
    t.merge(_changes(spark, [("a", "1", 1, 1, "U")]), epoch=0)
    t.merge(_changes(spark, [("a", "2", 2, 2, "U")]), epoch=1)
    res = t.expire_snapshots(keep_last=2)
    assert len(res["kept_snapshots"]) == 2
    assert t.snapshot().collect()[0]["v"] == "2"
