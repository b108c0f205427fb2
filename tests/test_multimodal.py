"""Multimodal plumbing tests: schema, roundtrip, batch shapes, and
integration of binary-derived features with the similarity operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.multimodal import (
    MEDIA_SCHEMA,
    byte_histogram_features,
    decode_media,
    frame_sample,
    resize_images,
    synthesize_media,
)
from web3_flight_rpc_server_spark.operators.similarity import cosine_topk


def test_synthesize_schema_and_determinism(spark):
    media = synthesize_media(spark, n=30)
    assert media.schema == MEDIA_SCHEMA
    a = {r.media_id: bytes(r.content) for r in media.collect()}
    b = {r.media_id: bytes(r.content) for r in synthesize_media(spark, n=30).collect()}
    assert a == b, "generation must be deterministic per media_id"
    kinds = {r.media_id % 3: r.kind for r in media.select("media_id", "kind").collect()}
    assert kinds == {0: "image", 1: "audio", 2: "video"}


def test_decode_roundtrip(spark):
    decoded = decode_media(synthesize_media(spark, n=30)).collect()
    for r in decoded:
        assert r.decoded_kind == r.kind
        assert r.decoded_width == r.meta.width
        assert r.decoded_height == r.meta.height
        assert r.payload_len == r.meta.n_bytes - 11  # header is 11 bytes


def test_metadata_only_query_prunes_payload(spark, tmp_path):
    """The point of the typed meta struct: a metadata query over the
    parquet-backed table must not read the content column."""
    path = str(tmp_path / "media")
    synthesize_media(spark, n=30).write.parquet(path)
    q = spark.read.parquet(path).where(F.col("kind") == "image").select(
        "media_id", "meta.width", "meta.height"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan, "payload column must be pruned"


def test_byte_histogram_features_feed_similarity(spark):
    feats = byte_histogram_features(synthesize_media(spark, n=30))
    rows = feats.collect()
    assert all(len(r.features) == 64 for r in rows)
    assert all(abs(sum(r.features) - 1.0) < 1e-3 for r in rows)
    # binary-derived features flow straight into the vector operators
    renamed = feats.select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    top = cosine_topk(
        renamed.where(F.col("vec_id") != 0), renamed.where(F.col("vec_id") == 0), k=5
    ).collect()
    assert len(top) == 5
    assert all(-1.0 <= r.cos <= 1.0 + 1e-9 for r in top)


def test_resize_updates_payload_and_meta(spark):
    resized = resize_images(synthesize_media(spark, n=12), 8, 8)
    for r in resized.where(F.col("kind") == "image").collect():
        assert (r.meta.width, r.meta.height) == (8, 8)
        assert len(bytes(r.content)) == 11 + 64
    # non-images pass through untouched
    audio = resized.where(F.col("kind") == "audio").collect()
    assert all(r.meta.width != 8 or r.meta.n_bytes != 75 for r in audio)


def test_frame_sampling(spark):
    frames = frame_sample(synthesize_media(spark, n=30), every_n=2).collect()
    assert frames, "video rows must produce frames"
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for media_id, idxs in by_media.items():
        assert media_id % 3 == 2, "only videos produce frames"
        assert sorted(idxs) == list(range(0, 4 + media_id % 4, 2))


def test_real_media_bytes_raise_cleanly(spark):
    fake_jpeg = spark.createDataFrame(
        [(1, "image", b"\xff\xd8\xff\xe0fakejpeg", None)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="PIL|SYNM|NotImplementedError"):
        decode_media(fake_jpeg).collect()
