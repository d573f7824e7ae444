"""Deterministic synthetic repo-CDC stream generator + single-threaded oracle.

Mirrors the reference's synthetic-batch tooling (tools/makelargehl7batch) and
its debatcher fixture corpus (fn-receiver-debatcher/src/test/resources/):
batches, duplicates, out-of-order rows, missing metadata, BOM pollution, a hot
key holding ~30% of traffic, and interleaved schema-change events.

Every generated column is a pure function of the event id (via xxhash64), so
the SAME rows are produced at any parallelism / partitioning — a requirement
for the replay byte-equality goal (SURVEY.md section 7.4 item 2; the reference
violates this with uuid() at fn_debatch_hl7.scala:68).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# op mix out of 32 (pure function of event id)
_OP_TABLE = (
    ["INSERT"] * 10
    + ["UPDATE"] * 14
    + ["DELETE"] * 3
    + ["RENAME"] * 3
    + ["SCHEMA_ADD", "SCHEMA_RENAME"]
)
assert len(_OP_TABLE) == 32

LANGS = ["py", "kt", "scala", "go", "java", "md", "json", "txt"]

N_BASE_REPOS = 50
HOT_REPO_PCT = 30  # one repo holds ~30% of events (FIXTURES.md hot-repo knob)
PATHS_PER_REPO = 200


def _h(col, salt: int):
    """Deterministic 64-bit hash of an id column + salt (never rand())."""
    return F.xxhash64(col, F.lit(salt))


def _pm(col, salt: int, mod: int):
    return F.pmod(_h(col, salt), F.lit(mod))


def change_events(spark: SparkSession, n_events: int, seed: int = 42) -> DataFrame:
    """Generate the binlog/WAL tail: one row per change event, lsn == id.

    Envelope columns follow FIXTURES.md section 2 (the DexHL7Metadata
    analogue, lib-dex-commons DexHL7Metadata.kt:5-13): event identity,
    provenance, op, payload, and a dynamic supporting_metadata map
    (fn-receiver-debatcher Function.kt:83-84).
    """
    df = spark.range(0, n_events).withColumn("seed", F.lit(seed))
    id_ = F.col("id")

    # --- key assignment: hot repo 0 takes HOT_REPO_PCT% of events ---------
    hot = _pm(id_, 1, 100) < HOT_REPO_PCT
    repo_id = F.when(hot, F.lit(0)).otherwise(1 + _pm(id_, 2, N_BASE_REPOS - 1))
    path_id = _pm(id_, 3, PATHS_PER_REPO)
    dir_id = _pm(id_, 4, 8)

    op = F.element_at(
        F.array(*[F.lit(o) for o in _OP_TABLE]),
        (_pm(id_, 5, 32) + 1).cast("int"),
    )
    # schema events are rare: demote most to UPDATE so they appear every
    # few thousand events rather than 1/16 of the stream
    op = F.when(
        op.startswith("SCHEMA") & (_pm(id_, 6, 100) != 0), F.lit("UPDATE")
    ).otherwise(op)

    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (_pm(id_, 7, len(LANGS)) + 1).cast("int")
    )

    repo = F.concat(F.lit("org-"), F.format_string("%04d", repo_id), F.lit("/proj"))
    path = F.concat(
        F.lit("src/d"),
        dir_id.cast("string"),
        F.lit("/mod_"),
        F.format_string("%03d", path_id),
        F.lit("."),
        lang,
    )

    # --- content: deterministic pseudo-source, variable size --------------
    line = F.concat_ws(
        " ",
        F.lit("def"),
        F.concat(F.lit("fn_"), F.conv(F.abs(_h(id_, 8)).cast("string"), 10, 16)),
        F.lit("(x):"),
        F.sha2(F.concat(id_.cast("string"), F.lit(":"), F.col("seed").cast("string")), 256),
    )
    n_rep = (1 + _pm(id_, 9, 40)).cast("int")
    content = F.concat_ws("\n", F.array_repeat(line, n_rep))
    # BOM / whitespace pollution on ~2% of rows (CovidELRWithBlanks analogue)
    content = F.when(
        _pm(id_, 10, 50) == 0, F.concat(F.lit("﻿  "), content, F.lit("  \n"))
    ).otherwise(content)
    content = F.when(op == "DELETE", F.lit(None).cast("string")).otherwise(content)

    # missing required metadata on ~1% of rows -> reject path
    # (fn-receiver-debatcher Function.kt:218-220 semantics)
    commit = F.when(_pm(id_, 11, 100) == 0, F.lit("")).otherwise(
        F.sha2(F.concat_ws("|", repo, path, id_.cast("string")), 256).substr(1, 40)
    )

    new_path = F.when(
        op == "RENAME",
        F.concat(
            F.lit("src/d"),
            dir_id.cast("string"),
            F.lit("/mod_"),
            F.format_string("%03d", _pm(id_, 12, PATHS_PER_REPO)),
            F.lit("."),
            lang,
        ),
    )

    schema_col = F.when(
        op == "SCHEMA_ADD", F.concat(F.lit("attr_"), _pm(id_, 13, 3).cast("string"))
    ).when(op == "SCHEMA_RENAME", F.lit("attr_0"))

    batch_sz = 16
    df = (
        df.withColumn("op", op)
        .withColumn("lsn", id_)
        .withColumn(
            "ts",
            F.timestamp_seconds(F.lit(1704067200) + id_ * 7),  # 2024-01-01 + 7s/event
        )
        .withColumn("repo", repo)
        .withColumn("path", path)
        .withColumn("new_path", new_path)
        .withColumn("commit", commit)
        .withColumn("lang", lang)
        .withColumn("content", content)
        .withColumn("schema_field", schema_col)
        .withColumn(
            "supporting_metadata",
            F.create_map(
                F.lit("producer"), F.concat(F.lit("src"), _pm(id_, 14, 20).cast("string")),
                F.lit("attr_0"), F.conv(F.abs(_h(id_, 15)).cast("string"), 10, 16),
                F.lit("attr_1"), F.conv(F.abs(_h(id_, 16)).cast("string"), 10, 16),
            ),
        )
        .withColumn("batch_id", F.concat(F.lit("b"), F.floor(id_ / batch_sz).cast("string")))
        .withColumn("message_index", (F.pmod(id_, F.lit(batch_sz)) + 1).cast("int"))
        .withColumn(
            "event_id",
            F.sha2(F.concat_ws("|", F.col("repo"), F.col("path"), F.col("lsn").cast("string")), 256),
        )
        .withColumn("content_sha256", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256))
        .drop("id", "seed")
    )
    return df


# ---------------------------------------------------------------------------
# Single-threaded Python oracle (golden replay, FIXTURES.md section 6)
# ---------------------------------------------------------------------------


@dataclass
class OracleState:
    """Final table state per (repo, path) + applied schema changes."""

    rows: dict = field(default_factory=dict)  # (repo, path) -> row dict
    schema_fields: list = field(default_factory=list)  # added columns, in order
    renames: dict = field(default_factory=dict)  # old -> new field name


def replay_oracle(events: list[dict]) -> OracleState:
    """Apply events in strict lsn order, one at a time.

    Semantics contract (what the Spark engine must reproduce):
      - required metadata: empty ``commit`` -> REJECTED, not applied
        (reference Function.kt:218-220)
      - content cleanup: strip BOM + trim (Function.kt:106-107)
      - INSERT/UPDATE upsert (repo, path); DELETE removes; RENAME is
        DELETE(path) + upsert(new_path) carrying the event's content
      - SCHEMA_ADD adds a string column whose value comes from
        supporting_metadata[field] on subsequent upserts; SCHEMA_RENAME
        renames attr_0 -> attr_0_renamed (id-based, value-preserving)
    """
    st = OracleState()
    for ev in sorted(events, key=lambda e: e["lsn"]):
        op = ev["op"]
        if op == "SCHEMA_ADD":
            f = ev["schema_field"]
            if f not in st.schema_fields and st.renames.get(f) is None:
                st.schema_fields.append(f)
            continue
        if op == "SCHEMA_RENAME":
            old = ev["schema_field"]
            new = old + "_renamed"
            if old in st.schema_fields and new not in st.schema_fields:
                st.schema_fields[st.schema_fields.index(old)] = new
                st.renames[old] = new
                for row in st.rows.values():
                    if old in row["extra"]:
                        row["extra"][new] = row["extra"].pop(old)
            continue
        if not ev["commit"]:  # reject: missing required metadata
            continue
        key = (ev["repo"], ev["path"])
        if op == "DELETE":
            st.rows.pop(key, None)
            continue
        content = (ev["content"] or "").strip("﻿ \t\n\r")
        extra = {}
        for f in st.schema_fields:
            src = {v: k for k, v in st.renames.items()}.get(f, f)
            if ev["supporting_metadata"] and src in ev["supporting_metadata"]:
                extra[f] = ev["supporting_metadata"][src]
        row = {
            "commit": ev["commit"],
            "lang": ev["lang"],
            "content": content,
            "sha": hashlib.sha256(content.encode()).hexdigest(),
            "extra": extra,
        }
        if op == "RENAME":
            st.rows.pop(key, None)
            st.rows[(ev["repo"], ev["new_path"])] = row
        else:  # INSERT / UPDATE
            st.rows[key] = row
    return st
