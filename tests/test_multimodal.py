import pytest
from pyspark.sql import functions as F

from data_exchange_hl7_spark.operators import multimodal as M


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)


def test_with_payload_envelope(spark, docs):
    env = M.with_payload(docs)
    assert set(env.columns) == {"doc_id", "payload", "mime", "n_bytes", "payload_sha256"}
    r = env.collect()[0]
    assert isinstance(r["payload"], (bytes, bytearray))
    assert r["n_bytes"] == len(r["payload"])


def test_extract_features_arrow(spark, docs):
    env = M.with_payload(docs)
    out = M.extract_features(env)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert 0.0 <= r["feature_norm"] < 1.0
    # deterministic: same payload -> same features regardless of partitioning
    again = {r["doc_id"]: (r["width"], r["feature_norm"]) for r in M.extract_features(env.repartition(7)).collect()}
    first = {r["doc_id"]: (r["width"], r["feature_norm"]) for r in rows}
    assert again == first


def test_strict_decoder_raises(spark, docs):
    env = M.with_payload(docs).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        M.extract_features(env, decoder=M.strict_decode).collect()


def test_frame_sample_chunks(spark, docs):
    env = M.with_payload(docs)
    frames = M.frame_sample(env, every_n_bytes=100)
    r = frames.groupBy("doc_id").agg(
        F.sum("length").alias("total"), F.count("*").alias("n")
    )
    joined = r.join(env.select("doc_id", "n_bytes"), "doc_id")
    bad = joined.filter(F.col("total") != F.col("n_bytes")).count()
    assert bad == 0  # chunk lengths tile the payload exactly
