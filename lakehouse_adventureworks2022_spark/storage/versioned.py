"""Versioned path tables: a snapshot/time-travel analog for plain
parquet (Delta keeps this in its transaction log — reference
``spark-defaults.conf:9-10``; here each overwrite lands in a new
snapshot directory and an atomic pointer file names the current one).

What this honestly provides: read-your-history (``read(version=...)``),
atomic publish (readers never see a half-written snapshot — the pointer
moves only after the write completes), rollback (re-point), and bounded
retention. What it does NOT provide (Delta does): row-level change
feeds, concurrent-writer conflict detection, or snapshot isolation
ACROSS tables. Single-writer-per-table is the assumed discipline, same
as every path-table write in this engine.

Layout::

    <root>/<name>/_v00001/...parquet
    <root>/<name>/_v00002/...parquet
    <root>/<name>/_CURRENT        # text file: "2"
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str, name: str, fmt: str = "parquet"):
        self.spark = spark
        self.dir = Path(root) / name
        self.fmt = fmt

    def _pointer(self) -> Path:
        return self.dir / "_CURRENT"

    def current_version(self) -> int:
        """0 when the table does not exist yet."""
        p = self._pointer()
        return int(p.read_text().strip()) if p.exists() else 0

    def versions(self) -> list[int]:
        if not self.dir.exists():
            return []
        return sorted(
            int(d.name[2:]) for d in self.dir.glob("_v*") if d.is_dir()
        )

    def _snapshot_dir(self, version: int) -> Path:
        return self.dir / f"_v{version:05d}"

    def write(self, df: DataFrame, keep: int = 3) -> int:
        """Publish a new snapshot atomically; returns its version.

        The snapshot is fully written before the pointer moves (pointer
        update = write-temp + ``os.replace``, atomic on POSIX), so a
        crash mid-write leaves the previous version current and a
        garbage ``_v`` dir that the next retention pass removes.
        """
        # Never reuse a snapshot directory: after rollback() the pointer
        # is behind the highest on-disk version, and current+1 would
        # overwrite a historical snapshot in place (non-atomic). Allocate
        # past everything that exists instead.
        version = max(self.versions() + [self.current_version()]) + 1
        snap = self._snapshot_dir(version)
        df.write.format(self.fmt).mode("overwrite").save(str(snap))
        tmp = self.dir / "_CURRENT.tmp"
        tmp.write_text(str(version))
        os.replace(tmp, self._pointer())
        # retention: drop snapshots older than the kept window (never the
        # current one, even if keep=0 is passed)
        for v in self.versions():
            if v <= version - max(keep, 1):
                shutil.rmtree(self._snapshot_dir(v), ignore_errors=True)
        return version

    def read(self, version: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to an explicit version."""
        v = version if version is not None else self.current_version()
        snap = self._snapshot_dir(v)
        if not snap.exists():
            raise FileNotFoundError(
                f"version {v} of {self.dir.name} does not exist "
                f"(have {self.versions()}; retention may have pruned it)"
            )
        return self.spark.read.format(self.fmt).load(str(snap))

    def rollback(self, version: int, prune_newer: bool = True) -> None:
        """Re-point current to an existing older snapshot.

        Unlike Delta ``RESTORE`` (which appends a new version whose
        content equals the old one), this re-points and — by default —
        prunes the now-abandoned newer snapshots, so ``versions()`` and
        ``read(version=...)`` only ever expose the single live timeline.
        Pass ``prune_newer=False`` to keep the abandoned snapshots
        readable for forensics; the next ``write()`` still never reuses
        their directories (it allocates past the on-disk maximum).
        """
        if version not in self.versions():
            raise FileNotFoundError(
                f"cannot roll back to missing version {version} "
                f"(have {self.versions()})"
            )
        tmp = self.dir / "_CURRENT.tmp"
        tmp.write_text(str(version))
        os.replace(tmp, self._pointer())
        if prune_newer:
            for v in self.versions():
                if v > version:
                    shutil.rmtree(self._snapshot_dir(v), ignore_errors=True)
