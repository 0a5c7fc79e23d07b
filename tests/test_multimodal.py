"""Multimodal pipeline tests: the Spark plumbing (schemas, Arrow batch
shapes, row expansion, determinism) is real; codecs are the
deterministic fake formats."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    from promi_spark.operators.multimodal import synth_media

    return synth_media(spark, n=60).cache()


def test_media_table_shape(media):
    assert media.count() == 60
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_images(media):
    from promi_spark.operators.multimodal import decode_images

    out = decode_images(media)
    rows = out.collect()
    assert len(rows) == 20
    meta = {
        r["media_id"]: r["meta"]
        for r in media.filter(F.col("kind") == "image").collect()
    }
    for r in rows:
        assert r["height"] == int(meta[r["media_id"]]["height"])
        assert r["width"] == int(meta[r["media_id"]]["width"])
        assert r["channels"] == 3
        assert 0 <= r["mean_px"] <= 255
        assert r["std_px"] > 0


def test_decode_determinism(media):
    from promi_spark.operators.multimodal import decode_images

    a = sorted(map(tuple, decode_images(media).collect()))
    b = sorted(map(tuple, decode_images(media).collect()))
    assert a == b


def test_resize_round_trip(media):
    from promi_spark.operators.multimodal import decode_images, resize_images

    resized = resize_images(media, 4, 6)
    dec = decode_images(
        resized.withColumn("kind", F.lit("image"))
    )
    rows = dec.collect()
    assert len(rows) == 20
    assert all(r["height"] == 4 and r["width"] == 6 for r in rows)


def test_frame_sampling_counts(media):
    from promi_spark.operators.multimodal import decode_images, sample_frames

    frames = sample_frames(media, every_n=2)
    got = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r["media_id"]: (int(r["meta"]["n_frames"]) + 1) // 2
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert got == want
    # sampled frames are themselves decodable images
    dec = decode_images(frames.withColumn("kind", F.lit("image")))
    assert dec.count() == sum(want.values())
    assert dec.filter(F.col("channels") != 1).count() == 0


def test_audio_features(media):
    from promi_spark.operators.multimodal import audio_features

    rows = audio_features(media).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["sample_rate"] == 16000
        assert 0.09 < r["duration_s"] < 0.2
        assert r["rms"] > 0
        assert 0 < r["zcr"] <= 1


def test_content_embeddings(media):
    from promi_spark.operators.multimodal import content_embeddings

    out = content_embeddings(media, dim=16)
    rows = out.collect()
    assert len(rows) == 60
    assert all(len(r["embedding"]) == 16 for r in rows)
    # deterministic across runs
    again = content_embeddings(media, dim=16).collect()
    assert {r["media_id"]: r["embedding"] for r in rows} == {
        r["media_id"]: r["embedding"] for r in again
    }


def test_unknown_format_raises(spark):
    from promi_spark.operators.multimodal import MEDIA_SCHEMA, decode_images

    df = spark.createDataFrame(
        [(0, "image", "jpeg", b"\xff\xd8\xff\xe0fakejpeg", {})], MEDIA_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        decode_images(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
