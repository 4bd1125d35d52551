"""Streaming ingest + multimodal plumbing tests."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.operators import multimodal as M
from cyborgdb_encrypted_vector_search_spark.sources.registry import load
from cyborgdb_encrypted_vector_search_spark.streaming import ingest as S


def test_stream_counts_equal_batch(spark, sf_dir):
    stream = S.read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    got = S.run_stream_to_batch(spark, S.hourly_event_counts(stream))
    batch = S.hourly_event_counts(load(spark, "events", sf_dir))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_stream_append_to_collection(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        dest = os.path.join(tmp, "ingested")
        ckpt = os.path.join(tmp, "ckpt")
        S.stream_append_to_collection(
            spark, os.path.join(sf_dir, "events.parquet"), dest, ckpt
        )
        n = spark.read.parquet(dest).count()
        assert n == load(spark, "events", sf_dir).count()


def test_sessionize_gap_semantics(spark):
    # 3 events: two 10 min apart (one session), third 40 min later (new)
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 00:50:00"),
        (2, "2024-01-01 01:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = S.sessionize(ev, "30 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        M.sample_frames(b"\x00")


def test_multimodal_feature_extraction(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "text", bytearray(b"abc"), None), (2, "text", None, None)],
        M.MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in M.extract_features(df).collect()}
    assert feats[1]["n_bytes"] == 3
    assert feats[1]["digest"] == hashlib.md5(b"abc").hexdigest()
    assert feats[1]["mean_byte"] == pytest.approx((97 + 98 + 99) / 3)
    assert feats[2]["n_bytes"] == 0 and feats[2]["mean_byte"] == 0.0


def test_media_schema_roundtrip(spark, sf_dir):
    docs = load(spark, "documents", sf_dir).limit(20)
    media = M.documents_as_media(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "meta",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    assert M.extract_features(media).count() == 20
