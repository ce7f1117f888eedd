"""Crash-safety of the streaming state commit protocol
(streaming/state_commit.py): the two r6 ADVICE windows — committed
state deleted before its replacement lands, and state/meta diverging
across two separate durable writes — must both be closed. Each test
simulates the exact on-disk residue a crash at that point leaves, then
drives the normal code path over it."""

from __future__ import annotations

import pytest

import json
import os
import shutil
from collections import Counter
from pathlib import Path

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.streaming import state_commit
from lakehouse_adventureworks2022_spark.streaming.frequent import (
    apply_frequent_batch,
    frequent_values,
)

SF = "/root/testdata/sf0.001"


def _weights(spark, state_dir):
    return {
        r["value"]: r["weight"]
        for r in frequent_values(spark, state_dir, k=100).collect()
    }


def _exact(events):
    return Counter(r["event_type"] for r in events.select("event_type").collect())


def test_meta_commits_inside_state_dir(spark, tmp_path):
    """State and applied-batch meta must be ONE durable object: the
    meta file lives inside the committed state directory (with a
    Spark-ignored underscore name), and no external meta exists whose
    truth could diverge from the state's."""
    events = read_table(spark, SF, "events")
    state_dir = str(tmp_path / "state")
    apply_frequent_batch(events, 0, state_dir, "event_type", m=64)
    assert (Path(state_dir) / "summary" / "_meta.json").exists()
    assert not (Path(state_dir) / "meta.json").exists()
    meta = json.loads((Path(state_dir) / "summary" / "_meta.json").read_text())
    assert meta["applied"] == [0]
    # the underscore prefix keeps Spark from reading it as data
    assert "_meta" not in {
        f.name for f in spark.read.parquet(f"{state_dir}/summary").schema.fields
    }


@pytest.mark.slow
def test_crash_between_renames_restores_old_state(spark, tmp_path):
    """Residue of a crash AFTER rename(final → trash) but BEFORE
    rename(staging → final): final missing, trash = old committed gen,
    staging = uncommitted new gen. recover() must restore the old gen —
    the interrupted batch's id was never committed, so its replay
    re-merges exactly once. The old rmtree-first swap lost the state
    here (empty summary, n_total intact)."""
    events = read_table(spark, SF, "events")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    state_dir = str(tmp_path / "state")
    apply_frequent_batch(half_a, 0, state_dir, "event_type", m=64)
    committed = _weights(spark, state_dir)

    # simulate the crash window while batch 1 was committing
    final = f"{state_dir}/summary"
    os.rename(final, f"{state_dir}/summary__trash")
    os.makedirs(f"{state_dir}/summary__staging", exist_ok=True)
    Path(f"{state_dir}/summary__staging/garbage.parquet").write_bytes(b"xx")

    # the committed gen is back, nothing lost
    assert _weights(spark, state_dir) == committed
    assert state_commit.read_meta(state_dir, "summary")["applied"] == [0]

    # the at-least-once replay of batch 1 now merges exactly once
    apply_frequent_batch(half_b, 1, state_dir, "event_type", m=64)
    exact = _exact(events)
    got = _weights(spark, state_dir)
    for v, true in exact.items():
        assert got.get(v, 0) <= true  # MG never overcounts ⇒ no double-merge


def test_crash_after_commit_skips_replay(spark, tmp_path):
    """Residue of a crash AFTER rename(staging → final) but BEFORE the
    trash delete: final = new gen WITH the batch id recorded, trash =
    old gen. The replayed batch must be skipped (its id is in the
    committed meta) and the stale trash cleared — the old two-write
    protocol double-counted here."""
    events = read_table(spark, SF, "events")
    state_dir = str(tmp_path / "state")
    apply_frequent_batch(events, 0, state_dir, "event_type", m=64)
    committed = _weights(spark, state_dir)
    n_total = state_commit.read_meta(state_dir, "summary")["n_total"]

    # simulate: the previous gen still sits in trash
    shutil.copytree(f"{state_dir}/summary", f"{state_dir}/summary__trash")

    apply_frequent_batch(events, 0, state_dir, "event_type", m=64)  # replay
    assert _weights(spark, state_dir) == committed
    meta = state_commit.read_meta(state_dir, "summary")
    assert meta["applied"] == [0] and meta["n_total"] == n_total
    assert not os.path.exists(f"{state_dir}/summary__trash")


def test_orphan_staging_is_harmless(spark, tmp_path):
    """A crash BEFORE any rename leaves only a staged orphan; the next
    batch's overwrite replaces it and the committed lineage is exactly
    the applied batches."""
    events = read_table(spark, SF, "events")
    state_dir = str(tmp_path / "state")
    os.makedirs(f"{state_dir}/summary__staging")
    Path(f"{state_dir}/summary__staging/part-junk.parquet").write_bytes(b"xx")
    apply_frequent_batch(events, 0, state_dir, "event_type", m=64)
    exact = _exact(events)
    got = _weights(spark, state_dir)
    # m=64 >> distinct event types ⇒ MG weights are exact
    assert got == dict(exact)
