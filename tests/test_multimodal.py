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


def test_real_decode_is_explicit_stub(assets):
    with pytest.raises(Exception, match="PIL|codec|ffmpeg|NotImplemented"):
        multimodal.extract_features(assets, fake=False).collect()


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
