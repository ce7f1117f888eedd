"""Crash-safe commit protocol for the tiny streaming state directories
(frequent-items MG summaries, KLL quantile sketches).

Two failure windows the naive ``rmtree(final); rename(staging, final)``
+ separate ``meta.json`` write left open (r6 ADVICE):

1. a crash between ``rmtree`` and ``rename`` deleted the committed
   state while the external meta still listed every applied batch id —
   the stream resumed from an EMPTY summary with ``n_total`` intact;
2. state and meta were two separate durable writes — a crash after the
   state rename but before the meta write left the batch merged with
   its id unrecorded, so the at-least-once replay merged it AGAIN.

Fix, in one protocol:

- the applied-batch-id meta is written INTO the staged state directory
  (as ``_meta.json`` — the underscore prefix keeps Spark's parquet
  reader from treating it as data, same as ``_SUCCESS``), so state and
  idempotence marker become durable in the SAME ``os.rename``;
- the swap never deletes the committed state first: rename final →
  trash, rename staging → final, then delete trash. ``recover()``
  (called on every read) renames trash back if a crash left final
  missing, and drops a stale trash if final exists.

Crash matrix (state root ``S``, committed dir ``S/<name>``):
- before any rename: final intact, staging is an orphan the next
  batch's ``mode("overwrite")`` replaces — old state, batch replays.
- between rename(final→trash) and rename(staging→final): final
  missing, trash holds the old COMMITTED state — ``recover()`` restores
  it; the staged merge is discarded and the batch replays (its id was
  never committed). No loss, no double-count.
- between rename(staging→final) and rmtree(trash): final holds the new
  state WITH the batch id recorded — replay is skipped; ``recover()``
  clears the trash. Exactly-once effect.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_META = "_meta.json"


def _final(state_dir: str, name: str) -> str:
    return f"{state_dir}/{name}"


def _trash(state_dir: str, name: str) -> str:
    return f"{state_dir}/{name}__trash"


def _staging(state_dir: str, name: str) -> str:
    return f"{state_dir}/{name}__staging"


def recover(state_dir: str, name: str) -> None:
    """Restore the committed state if a crash interrupted a swap."""
    final, trash = _final(state_dir, name), _trash(state_dir, name)
    if os.path.exists(trash):
        if os.path.exists(final):
            shutil.rmtree(trash)  # swap completed; trash is the old gen
        else:
            os.rename(trash, final)  # swap died mid-way; old gen is truth


def read_meta(state_dir: str, name: str) -> dict:
    recover(state_dir, name)
    p = Path(_final(state_dir, name)) / _META
    if p.exists():
        return json.loads(p.read_text())
    return {"applied": [], "n_total": 0}


def load_frame(spark: SparkSession, state_dir: str, name: str):
    """Committed state frame, or None before the first commit."""
    recover(state_dir, name)
    final = _final(state_dir, name)
    if os.path.exists(f"{final}/_SUCCESS"):
        return spark.read.parquet(final)
    return None


def commit(state: DataFrame, state_dir: str, name: str, meta: dict) -> None:
    """Durably replace the state with ``state`` + ``meta`` in ONE rename."""
    staging = _staging(state_dir, name)
    state.coalesce(1).write.mode("overwrite").parquet(staging)
    (Path(staging) / _META).write_text(json.dumps(meta))
    final, trash = _final(state_dir, name), _trash(state_dir, name)
    recover(state_dir, name)  # clear any stale trash before we reuse it
    if os.path.exists(final):
        os.rename(final, trash)
    os.rename(staging, final)
    shutil.rmtree(trash, ignore_errors=True)
