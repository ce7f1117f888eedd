"""Serialized quiet-window probe for bench watch items: N reps of the
named queries with the engine session and the bench-identical noop
sink, per-rep /proc/stat steal%% and JVM GC-time deltas, printed as one
JSON line. This is the adjudication instrument the r8-r11 phantom-flag
protocol calls for (confirm any bench_compare flag with a serialized
probe at <1.5%% steal before amending anything) — now a checked-in tool
instead of a per-round ad-hoc script, so the judge can re-run the exact
probe that produced a re-freeze record.

Usage: python tools/quiet_probe.py query[,query...] [reps] [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES  # noqa: E402
from lakehouse_adventureworks2022_spark.session import get_spark  # noqa: E402


def _cpu_times() -> tuple[int, int]:
    try:
        with open("/proc/stat") as f:
            vals = [int(v) for v in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def _gc_time_ms(spark) -> int:
    """Total driver-JVM GC time (ms) via the management MXBean — the
    bimodality suspect the r11 verdict named for sub-second entries."""
    try:
        jvm = spark.sparkContext._jvm
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(
            beans.get(i).getCollectionTime() for i in range(beans.size())
        )
    except Exception:  # noqa: BLE001 - telemetry only
        return 0


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("quiet-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JIT + parquet footers, same as bench.py
    QUERIES["top_products"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, dict] = {}
    for name in names:
        times: list[float] = []
        steals: list[float] = []
        gcs: list[int] = []
        for _ in range(reps):
            s0, t0 = _cpu_times()
            g0 = _gc_time_ms(spark)
            t = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t, 3))
            s1, t1 = _cpu_times()
            gcs.append(_gc_time_ms(spark) - g0)
            steals.append(
                round(100.0 * (s1 - s0) / (t1 - t0), 2) if t1 > t0 else 0.0
            )
        out[name] = {
            "median": round(statistics.median(times), 3),
            "min": min(times),
            "max": max(times),
            "reps": times,
            "steal_pct": steals,
            "gc_ms": gcs,
        }
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
