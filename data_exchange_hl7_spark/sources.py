"""WAL source readers: one canonical change-event schema, many wire formats.

The reference ingests the same event envelope from several transports (blob
text via Event Grid, Event Hub JSON, Delta tables — SURVEY.md section 2.1
S1-S3); here the engine consumes any WAL laid down as parquet, JSONL, or CSV
and always emits the SAME typed schema, so the apply pipeline is
format-agnostic. Batch and streaming (``readStream``) variants share the
schema and the post-read normalization.

Type discipline: JSON/CSV carry no map type portably, so
``supporting_metadata`` rides as a JSON string on those wires and is parsed
back with ``from_json`` (the reference does exactly this with its metadata
maps through Event Hub). Timestamps are ISO-8601 strings on text wires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical WAL envelope (datagen.change_events; FIXTURES.md section 2)
WAL_FIELDS: list[tuple[str, str]] = [
    ("op", "string"),
    ("lsn", "long"),
    ("ts", "timestamp"),
    ("repo", "string"),
    ("path", "string"),
    ("new_path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
    ("schema_field", "string"),
    ("supporting_metadata", "map<string,string>"),
    ("batch_id", "string"),
    ("message_index", "int"),
    ("event_id", "string"),
    ("content_sha256", "string"),
]

_MAP_COL = "supporting_metadata"


def wal_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField(n, _parse(t), True)
            for n, t in WAL_FIELDS
        ]
    )


def _parse(t: str) -> T.DataType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(t)


def _text_wire_schema() -> T.StructType:
    """Schema for JSON/CSV wires: map carried as a JSON string, ts as string."""
    out = []
    for n, t in WAL_FIELDS:
        if n == _MAP_COL:
            out.append(T.StructField(n, T.StringType(), True))
        elif t == "timestamp":
            out.append(T.StructField(n, T.StringType(), True))
        else:
            out.append(T.StructField(n, _parse(t), True))
    return T.StructType(out)


def _normalize(df: DataFrame) -> DataFrame:
    """Coerce a text-wire frame to the canonical typed schema."""
    cols = []
    for n, t in WAL_FIELDS:
        c = F.col(n)
        if n == _MAP_COL and dict(df.dtypes).get(n) == "string":
            c = F.from_json(c, "map<string,string>")
        elif t == "timestamp" and dict(df.dtypes).get(n) == "string":
            c = F.to_timestamp(c)
        cols.append(c.cast(t).alias(n))
    return df.select(*cols)


def write_wal(events: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Lay a WAL down in the given wire format (test/bench fixture helper)."""
    if fmt == "parquet":
        events.write.mode("overwrite").parquet(path)
        return
    out = events.withColumn(_MAP_COL, F.to_json(F.col(_MAP_COL))).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    )
    if fmt == "jsonl":
        out.write.mode("overwrite").json(path)
    elif fmt == "csv":
        # explicit null sentinel (CSV cannot otherwise distinguish null from
        # ""), RFC-4180 quote doubling, and quoted newlines in content
        (
            out.write.mode("overwrite")
            .option("header", True)
            .option("nullValue", "\\N")
            .option("escape", '"')
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported WAL format: {fmt}")


def read_wal(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    streaming: bool = False,
) -> DataFrame:
    """Read a WAL directory in any supported wire format into the canonical
    typed change-event schema. ``streaming=True`` returns a ``readStream``
    directory tail with the same schema (S1/S2)."""
    if fmt == "parquet":
        if streaming:
            return spark.readStream.schema(wal_schema()).parquet(path)
        return spark.read.schema(wal_schema()).parquet(path)
    reader = spark.readStream if streaming else spark.read
    reader = reader.schema(_text_wire_schema())
    if fmt == "jsonl":
        raw = reader.json(path)
    elif fmt == "csv":
        raw = (
            reader.option("header", True)
            .option("nullValue", "\\N")
            .option("escape", '"')
            .option("multiLine", True)
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported WAL format: {fmt}")
    return _normalize(raw)
