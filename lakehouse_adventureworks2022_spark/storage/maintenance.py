"""Table maintenance job: the operational composite SCALE.md prescribes
(the reference never compacts or analyzes — SURVEY.md §4 small-file
note) — run per table on a schedule, after heavy append cycles.

Each step is the already-tested primitive from ``TableManager``:

1. **compact** — rewrite to size-balanced files (incremental appends
   leave one small file per trigger/batch; scan cost at 100 TB is
   dominated by file count once files drop under ~100 MB);
2. **cluster** — range-cluster on the table's dominant filter key so
   parquet min/max footer stats prune whole files
   (``write_clustered``);
3. **analyze** — table + column stats into the session catalog for
   CBO join reordering (catalog tables only; path tables rely on
   footer stats + AQE).

Idempotent by construction: every step is a full rewrite or a stats
refresh; re-running is safe.
"""

from __future__ import annotations

from dataclasses import dataclass

from lakehouse_adventureworks2022_spark.storage.tables import TableManager


@dataclass
class MaintenancePlan:
    """Per-table maintenance directive."""

    table: str
    target_files: int | None = None  # compact to N files
    cluster_by: str | list[str] | None = None  # range-cluster key(s)
    analyze_table: str | None = None  # catalog name for ANALYZE
    analyze_columns: list[str] | None = None


def run_maintenance(tm: TableManager, plans: list[MaintenancePlan]) -> dict[str, list[str]]:
    """Execute each plan; returns {table: [steps run]} for observability."""
    done: dict[str, list[str]] = {}
    for p in plans:
        steps: list[str] = []
        if p.cluster_by is not None:
            # clustering IS a compaction (full rewrite) — run instead of
            # plain compact when both are requested
            tm.write_clustered(
                tm.read(p.table), p.table, p.cluster_by, n_files=p.target_files
            )
            steps.append("cluster")
        elif p.target_files is not None:
            tm.compact(p.table, p.target_files)
            steps.append("compact")
        if p.analyze_table is not None:
            tm.analyze(p.analyze_table, p.analyze_columns)
            steps.append("analyze")
        done[p.table] = steps
    return done
