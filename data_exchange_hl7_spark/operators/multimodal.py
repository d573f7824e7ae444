"""Multimodal columns: opaque binary payloads + Arrow-batched feature stages.

Design for image/audio/video at 100 TB: payloads are ``binary`` columns with
typed metadata (mime, width/height, sample rate); decode / resize /
frame-sample run as ``mapInPandas`` stages — per-partition Arrow batches, no
per-row Python. The decode libraries are NOT in this container, so the codec
call itself is stubbed behind ``decoder=`` (a deterministic fake by default,
``NotImplementedError`` if ``strict=True``); everything Spark-side — schema,
batch iteration, partitioning, output shape — is real and tested.

Reference analogue: the receiver's embedded-binary strip (D5,
fn-receiver-debatcher HL7Transformer.kt:17-112) also treats binary payloads
as opaque side content addressed by metadata.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, payload_sha256 string, "
    "width int, height int, feature_norm double"
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives fake dimensions
    and a feature from the payload hash. Replace with a real codec via the
    ``decoder`` argument of extract_features."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "feature_norm": int.from_bytes(h[2:6], "big") / 2**32,
    }


def strict_decode(payload: bytes) -> dict:
    raise NotImplementedError(
        "real image/audio decode requires codec libraries not present in this "
        "environment; pass decoder=<your codec fn>"
    )


def with_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Promote a column to the multimodal envelope: (id, payload binary, mime,
    n_bytes, payload_sha256)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def extract_features(df: DataFrame, decoder=fake_decode, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow streams each partition as pandas batches; the decoder runs once per
    payload inside the batch loop (vectorize further inside your codec). The
    output schema is fixed so downstream stages stay columnar."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "mime": pdf["mime"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "payload_sha256": pdf["payload_sha256"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "feature_norm": [f["feature_norm"] for f in feats],
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling plumbing: explode each payload into chunk descriptors
    (offset, length) WITHOUT shipping bytes through Python — pure column
    expressions; the decode of individual frames is the stub above."""
    n_chunks = F.ceil(F.col("n_bytes") / every_n_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    return (
        df.select("doc_id", "n_bytes", F.explode(idx).alias("frame_no"))
        .withColumn("offset", F.col("frame_no") * every_n_bytes)
        .withColumn(
            "length",
            F.least(F.lit(every_n_bytes), F.col("n_bytes") - F.col("offset")).cast("int"),
        )
    )
