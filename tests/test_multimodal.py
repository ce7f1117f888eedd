"""Multimodal plumbing: schema, Arrow batch contract, determinism, and
the explicit stub boundary (SURVEY.md beyond-reference scope)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import multimodal
from lakehouse_adventureworks2022_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    return multimodal.attach_fake_assets(docs).cache()


def test_asset_schema(assets):
    got = {f.name: f.dataType.simpleString() for f in assets.schema.fields}
    assert got == {
        "asset_id": "bigint",
        "content": "binary",
        "mime": "string",
        "width": "int",
        "height": "int",
        "duration_ms": "int",
    }


def test_feature_extraction_shape_and_determinism(assets):
    feats = multimodal.extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in rows)
    assert all(-1.0 <= v < 1.0 for r in rows for v in r["features"])
    # deterministic: second run bit-identical
    rows2 = multimodal.extract_features(assets).collect()
    assert {r["asset_id"]: r["features"] for r in rows} == {
        r["asset_id"]: r["features"] for r in rows2
    }
    # md5 agrees with the JVM-side md5 of the same bytes
    jvm = {
        r["asset_id"]: r["m"]
        for r in assets.select("asset_id", F.md5("content").alias("m")).collect()
    }
    assert all(jvm[r["asset_id"]] == r["content_md5"] for r in rows)


def test_feature_extraction_preserves_partitioning(assets):
    reparted = assets.repartition(7)
    feats = multimodal.extract_features(reparted)
    assert feats.rdd.getNumPartitions() == 7  # mapInPandas is per-partition


def test_real_decode_of_unknown_format_is_explicit_stub(assets):
    # the fake assets carry utf-8 text bytes — no PPM/WAV magic — so the
    # real path must refuse them with the named-format error
    with pytest.raises(Exception, match="PIL|codec|ffmpeg|NotImplemented"):
        multimodal.extract_features(assets, fake=False).collect()


@pytest.fixture(scope="module")
def media_assets(spark):
    rows = [
        (1, bytearray(multimodal.synth_ppm(64, 48, seed=1)),
         "image/x-portable-pixmap", 64, 48, None),
        (2, bytearray(multimodal.synth_ppm(800, 600, seed=2)),
         "image/x-portable-pixmap", 800, 600, None),
        (3, bytearray(multimodal.synth_wav(250, rate=8000, freq=440.0)),
         "audio/wav", None, None, 250),
        (4, bytearray(multimodal.synth_wav(100, rate=16000, freq=1000.0)),
         "audio/wav", None, None, 100),
    ]
    return spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA).cache()


def test_real_ppm_and_wav_features(media_assets):
    rows = {r["asset_id"]: r for r in
            multimodal.extract_features(media_assets, fake=False).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert all(-1.0 <= v < 1.0 for v in r["features"])
    # Spark-side features equal the driver-side reference implementation
    img = multimodal.decode_ppm(multimodal.synth_ppm(64, 48, seed=1))
    want = multimodal.image_features(img)
    got = rows[1]["features"]
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, want))
    x, rate, nch, dur = multimodal.decode_wav(
        multimodal.synth_wav(250, rate=8000, freq=440.0)
    )
    assert dur == 250
    want_a = multimodal.audio_features(x, rate, nch)
    got_a = rows[3]["features"]
    assert all(abs(a - b) < 1e-6 for a, b in zip(got_a, want_a))
    # image and audio features are distinguishable (not degenerate)
    assert rows[1]["features"] != rows[3]["features"]


def test_real_ppm_resize_reencodes_content(media_assets):
    out = {r["asset_id"]: r for r in
           multimodal.resize_images(
               media_assets.filter("mime like 'image%'"), max_px=100, fake=False
           ).collect()}
    # large image scaled down, small untouched
    assert (out[2]["width"], out[2]["height"]) == (100, 75)
    assert (out[1]["width"], out[1]["height"]) == (64, 48)
    # content is real PPM at the new dimensions
    arr = multimodal.decode_ppm(bytes(out[2]["content"]))
    assert arr.shape == (75, 100, 3)
    # resize is idempotent on already-small output
    again = multimodal.decode_ppm(
        bytes(
            multimodal.encode_ppm(
                multimodal.resize_nearest(arr, 100)
            )
        )
    )
    assert (again == arr).all()


def test_ppm_roundtrip_and_resize_determinism():
    import numpy as np

    src = multimodal.synth_ppm(33, 17, seed=7)
    arr = multimodal.decode_ppm(src)
    assert arr.shape == (17, 33, 3)
    assert multimodal.encode_ppm(arr) == src  # lossless roundtrip
    small = multimodal.resize_nearest(arr, 8)
    assert small.shape == (4, 8, 3)
    assert (small == multimodal.resize_nearest(arr, 8)).all()
    assert np.all(small <= 255)


def test_resize_metadata_math(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x"), "image/fake", 1920, 1080, None),
         (2, bytearray(b"y"), "image/fake", 100, 50, None)],
        schema=multimodal.ASSET_SCHEMA,
    )
    out = {r["asset_id"]: (r["width"], r["height"]) for r in
           multimodal.resize_images(df, max_px=512).collect()}
    assert out[1] == (512, 288)  # downscaled, aspect preserved
    assert out[2] == (100, 50)  # small image untouched


def test_frame_sampling_explosion(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"v"), "video/fake", None, None, 3500),
         (2, bytearray(b"i"), "image/fake", 10, 10, None)],
        schema=multimodal.ASSET_SCHEMA,
    )
    rows = multimodal.sample_frames(df, every_ms=1000).collect()
    offsets = sorted(r["frame_offset_ms"] for r in rows)
    assert offsets == [0, 1000, 2000, 3000]  # 3.5 s → 4 frames
    assert all(r["asset_id"] == 1 for r in rows)  # images filtered out
