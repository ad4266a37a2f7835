"""Multimodal pipeline plumbing: binary columns through mapInPandas with
deterministic fake codecs (real codec libs absent per environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doris_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    encode_fake_media,
    extract_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(30):
        kind = kinds[i % 3]
        body = bytes((i * 7 + j) % 256 for j in range(200 + i))
        rows.append((i, kind, encode_fake_media(i, kind, body)))
    rows.append((999, "image", b"not-a-valid-payload"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode(media_df):
    out = decode_media(media_df).collect()
    assert len(out) == 30  # invalid payload dropped
    by_id = {r["media_id"]: r for r in out}
    assert by_id[0]["kind"] == "image" and by_id[0]["channels"] == 3
    assert by_id[1]["kind"] == "audio" and by_id[1]["channels"] == 1
    assert by_id[0]["width"] == 64 and by_id[0]["n_bytes"] == 200
    # deterministic digest across runs
    out2 = {r["media_id"]: r["content_digest"] for r in decode_media(media_df).collect()}
    assert out2 == {r["media_id"]: r["content_digest"] for r in out}


def test_features(media_df):
    out = extract_features(media_df).collect()
    assert len(out) == 31
    for r in out:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(-1.0 <= v <= 1.0 for v in r["feature"])
    # determinism
    a = {r["media_id"]: tuple(r["feature"]) for r in out}
    b = {r["media_id"]: tuple(r["feature"]) for r in extract_features(media_df).collect()}
    assert a == b


def test_frame_sampling(media_df):
    out = sample_frames(media_df, every_n=2).collect()
    assert out, "expected sampled frames from video rows"
    vids = {r["media_id"] for r in out}
    assert all(mid % 3 == 2 for mid in vids)  # only 'video' kind rows
    for r in out:
        assert r["frame_idx"] % 2 == 0


def test_resize_is_gated(media_df):
    with pytest.raises(NotImplementedError):
        resize_images(media_df, 224, 224)


def test_feature_join_with_embeddings_shape(spark, media_df):
    """Features are array<float> — joinable/comparable with the embeddings
    table machinery (cosine over doris_spark.operators.vector)."""
    from doris_spark.operators.vector import cosine_similarity

    f = extract_features(media_df)
    a = f.select(F.col("media_id").alias("ida"), F.col("feature").alias("fa"))
    b = f.select(F.col("media_id").alias("idb"), F.col("feature").alias("fb"))
    pairs = a.join(b, F.col("ida") < F.col("idb")).limit(50)
    out = pairs.select(cosine_similarity("fa", "fb").alias("sim")).collect()
    assert all(r["sim"] is not None and -1.001 <= r["sim"] <= 1.001 for r in out)


def test_real_ppm_codec_roundtrip(spark):
    import numpy as np

    from doris_spark.operators import multimodal as MM

    w, h = 6, 4
    rgb = bytes(range(w * h * 3))
    payload = MM.encode_ppm(w, h, rgb)
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    dec = MM.decode_images_ppm(df).collect()[0]
    assert (dec["width"], dec["height"]) == (w, h)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    assert abs(dec["mean_r"] - a[:, 0].mean()) < 1e-4

    small = MM.resize_images_ppm(df, 3, 2).collect()[0]
    parsed = MM._parse_ppm(bytes(small["payload"]))
    assert parsed is not None and parsed[0] == 3 and parsed[1] == 2
    # nearest-neighbor: top-left pixel survives
    assert parsed[2][:3] == rgb[:3]


def test_real_wav_codec(spark):
    import math

    from doris_spark.operators import multimodal as MM

    samples = bytes((128 + (i % 4) * 10) % 256 for i in range(1000))
    payload = MM.encode_wav(8000, samples)
    df = spark.createDataFrame([(7, bytearray(payload))], "media_id long, payload binary")
    dec = MM.decode_audio_wav(df).collect()[0]
    assert dec["sample_rate"] == 8000 and dec["n_frames"] == 1000
    exp = math.sqrt(sum(((s - 128) / 128.0) ** 2 for s in samples) / 1000)
    assert abs(dec["rms"] - exp) < 1e-4
    assert abs(dec["duration_s"] - 0.125) < 1e-6
