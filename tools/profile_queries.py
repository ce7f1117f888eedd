"""Per-query time breakdown: DataFrame construction (Python-side plan
building + any eager jobs the query fn runs), driver-side planning
(analysis → optimization → physical planning, forced via
``queryExecution().executedPlan()``), and execution (noop write, which
re-plans under AQE and runs the job).

Usage: python tools/profile_queries.py [reps] <query> [query ...]
       (reps defaults to 3; query '-' means the full bench HEADLINE)

Prints one line per query: construct_s, plan_s, exec_s (median of reps
for exec; construct/plan timed once on the warm session — they are
driver-side and rep-stable). Timing methodology matches bench.py (warm
JVM via a throwaway first query, noop sink).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import HEADLINE  # noqa: E402
from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES  # noqa: E402
from lakehouse_adventureworks2022_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0].isdigit():
        reps = int(args[0])
        args = args[1:]
    names = HEADLINE if args == ["-"] else args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm up JVM/codegen/parquet footers
    QUERIES["top_products"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    print(
        f"{'query':35s} {'total_med':>9s} {'constr_med':>10s} "
        f"{'exec_med':>8s} {'plan':>7s} per-rep (construct, exec)"
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        plan_s = time.perf_counter() - t1
        del df
        cons, execs, totals = [], [], []
        for _ in range(reps):
            # bench-equivalent rep = construct (query fn, incl. any eager
            # driver work) + noop write; the split shows where it goes
            s0 = time.perf_counter()
            d = QUERIES[name](spark, sf_dir)
            s1 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            s2 = time.perf_counter()
            cons.append(s1 - s0)
            execs.append(s2 - s1)
            totals.append(s2 - s0)
        print(
            f"{name:35s} {statistics.median(totals):9.3f} "
            f"{statistics.median(cons):10.3f} "
            f"{statistics.median(execs):8.3f} {plan_s:7.3f} "
            f"{[(round(c, 3), round(e, 3)) for c, e in zip(cons, execs)]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
