"""Python-worker portability: every Python-UDF (mapInPandas) query must
run when the DRIVER's cwd is not the repo root — i.e. the shipped
closures must be self-contained, never referencing package module globals
(cloudpickle serializes those by reference, and the Spark Python workers
may not have the package on their import path)."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
# the two Python-UDF paths: numpy ANN + multimodal feature extraction
n = e.queries()["ann_cosine_topk_np"](spark, "/root/testdata/sf0.001").count()
assert n == 50, n
from lakehouse_adventureworks2022_spark.operators import multimodal
from lakehouse_adventureworks2022_spark.sources.readers import read_table
assets = multimodal.attach_fake_assets(
    read_table(spark, "/root/testdata/sf0.001", "documents").limit(5))
rows = multimodal.extract_features(assets).collect()
assert len(rows) == 5 and len(rows[0]["features"]) == multimodal.FEATURE_DIM
# real-codec path (PPM/PNG/WAV decode closures — PNG regressed once in
# r6 when its decoder was a module-level function, pickled by reference)
arr = multimodal.decode_ppm(multimodal.synth_ppm(32, 16, seed=1))
media = spark.createDataFrame(
    [(1, bytearray(multimodal.synth_ppm(32, 16, seed=1)),
      "image/x-portable-pixmap", 32, 16, None),
     (2, bytearray(multimodal.synth_wav(50)), "audio/wav", None, None, 50),
     (3, bytearray(multimodal.encode_png(arr)), "image/png", 32, 16, None),
     (4, bytearray(multimodal.encode_jpeg(arr, quality=95)),
      "image/jpeg", 32, 16, None)],
    schema=multimodal.ASSET_SCHEMA)
real = multimodal.extract_features(media, fake=False).collect()
assert len(real) == 4 and all(len(r["features"]) == 16 for r in real)
hashes = multimodal.image_hashes(
    media.filter("asset_id != 2"), fake=False).collect()
# PPM and PNG hash identically (lossless); JPEG within near-dup range
assert len(hashes) == 3
hs = {r["asset_id"]: r["dhash"] for r in hashes}
assert hs[1] == hs[3]
assert bin((hs[1] ^ hs[4]) & (2**64 - 1)).count("1") <= 6
# unigram Viterbi encode closure (by-value piece table)
from lakehouse_adventureworks2022_spark.operators import unigram
useg = unigram.unigram_segment(
    read_table(spark, "/root/testdata/sf0.001", "documents").limit(5),
    {"a": -1.0, "b": -1.5, "ab": -1.2}).collect()
assert len(useg) == 5
# applyInPandas packing closure
from lakehouse_adventureworks2022_spark.operators import curation
docs = read_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
packed = curation.pack_documents(docs, budget=300).collect()
assert len(packed) == 20
print("PORTABLE-OK")
spark.stop()
"""


def test_python_udf_queries_run_with_foreign_cwd():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd="/tmp",
        capture_output=True,
        text=True,
        # generous: the subprocess cold-starts its own JVM and competes
        # with the rest of the suite for cores on a loaded host
        timeout=600,
    )
    assert "PORTABLE-OK" in proc.stdout, proc.stderr[-2000:]
