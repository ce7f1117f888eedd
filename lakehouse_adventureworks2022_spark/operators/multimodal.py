"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages (beyond-reference scope, BASELINE.json north star).

What is REAL here (and tested): the Spark-side architecture — the typed
asset schema, the mapInPandas batch contract (iterator of pandas frames,
bounded batch memory), partition-count preservation, and deterministic
feature extraction used as the stand-in "model". What is STUBBED: the
actual image/audio codecs (PIL/ffmpeg/torchvision are not in this
container) — each decode function dispatches to a clearly-marked
``NotImplementedError`` unless ``fake=True``, which produces
deterministic bytes/features derived from md5 so tests and oracles are
stable.

Scale notes: binary payloads never pass through the driver; each Arrow
batch holds ``spark.sql.execution.arrow.maxRecordsPerBatch`` assets, so
executor memory is bounded by batch_size × max_asset_size — set
``maxRecordsPerBatch`` down (e.g. 64) for video-sized payloads. Feature
extraction emits fixed-width ``array<float>`` ready for
``operators/similarity`` ANN.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed multimodal asset schema: content + mime + media metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def attach_fake_assets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary asset column from a text column —
    the fixture generator for the multimodal path (no binary fixture
    exists). Content = utf-8 bytes; metadata from md5-derived ints."""
    h = F.md5(F.col(text_col))
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image/fake").alias("mime"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1920).alias("width"),
        (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1080).alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


FEATURE_DIM = 16

_FEATURE_SCHEMA = "asset_id long, n_bytes int, content_md5 string, features array<float>"


def _fake_features(content: bytes) -> list[float]:
    """Deterministic pseudo-embedding: FEATURE_DIM floats in [-1, 1) from
    the md5 stream of the content (stands in for a CNN/CLIP encoder).

    Driver-side reference implementation; ``extract_features`` carries an
    identical nested copy because worker-shipped closures must not
    reference module globals (pickled by reference)."""
    out: list[float] = []
    seed = content
    while len(out) < FEATURE_DIM:
        seed = hashlib.md5(seed).digest()
        for i in range(0, 16, 4):
            if len(out) >= FEATURE_DIM:
                break
            v = int.from_bytes(seed[i : i + 4], "big")
            out.append((v / 2**31) - 1.0)
    return out


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract each asset in Arrow batches.

    ``fake=False`` is the seam for a real encoder (PIL + model forward
    per batch) — unavailable in this container, so it raises with a
    clear message; the plumbing (batching, schema, memory shape) is
    identical either way.
    """

    feature_dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: no references to module-level helpers.
        # cloudpickle serializes those BY REFERENCE, which breaks on
        # Python workers whose cwd/path can't import this package (e.g.
        # a driver running from another directory) — see
        # tests/test_worker_portability.py.
        import hashlib as _hl

        def feats(content: bytes) -> list[float]:
            out: list[float] = []
            seed = content
            while len(out) < feature_dim:
                seed = _hl.md5(seed).digest()
                for i in range(0, 16, 4):
                    if len(out) >= feature_dim:
                        break
                    v = int.from_bytes(seed[i : i + 4], "big")
                    out.append((v / 2**31) - 1.0)
            return out

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/torch (not in container); "
                    "use fake=True for the deterministic stand-in encoder"
                )
            contents = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": contents.map(len).astype("int32"),
                    "content_md5": contents.map(
                        lambda b: _hl.md5(bytes(b)).hexdigest()
                    ),
                    "features": contents.map(lambda b: feats(bytes(b))),
                }
            )

    return assets.mapInPandas(run, schema=_FEATURE_SCHEMA)


def resize_images(assets: DataFrame, max_px: int = 512, fake: bool = True) -> DataFrame:
    """Resize stage: metadata-only transform in fake mode (the real stage
    would re-encode content; the metadata math and plumbing are real)."""
    if not fake:
        raise NotImplementedError("real resize requires an image codec")
    scale = F.when(
        F.greatest("width", "height") > max_px,
        max_px / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    # one projection: chaining withColumn would re-derive the scale from
    # the already-resized width
    return assets.select(
        *[c for c in assets.columns if c not in ("width", "height")],
        (F.col("width") * scale).cast("int").alias("width"),
        (F.col("height") * scale).cast("int").alias("height"),
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame-sampling stage for video assets: one output row per sampled
    frame offset (explode over the duration spine). Decode is stubbed;
    the row-explosion shape — the part that matters for partition sizing
    at scale — is real."""
    if not fake:
        raise NotImplementedError("real frame extraction requires ffmpeg")
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return assets.filter(F.col("duration_ms").isNotNull()).select(
        "asset_id",
        "mime",
        F.explode(offsets).alias("frame_offset_ms"),
    )
