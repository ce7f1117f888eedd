"""Compare two bench JSON lines (e.g. BENCH_r02.json vs a fresh run):
per-query delta, ratio, and a regression flag at the >2× budget the
round verdicts grade against.

Usage: python tools/bench_compare.py BASE.json NEW.json [--budget 2.0]
Exit code 1 if any query regresses past the budget (CI-able).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def load(path: str) -> dict:
    # bench output may be a bare JSON object or a file whose last line is
    # the JSON (driver logs sometimes prepend noise)
    text = Path(path).read_text().strip()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = json.loads(text.splitlines()[-1])
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
    # ({n, rc, cpus, sf, tail, parsed}); unwrap so both formats compare
    # (r6 verdict #3: the judge's invocation compared zero queries and
    # exited 0)
    if "queries" not in obj and isinstance(obj.get("parsed"), dict):
        obj = obj["parsed"]
    # r11 compact line: the medians map lives in the sidecar the
    # "detail" field points at — follow the pointer (tolerating a moved
    # repo by also trying the basename beside this checkout's bench.py)
    if "queries" not in obj and obj.get("detail"):
        detail = Path(obj["detail"])
        if not detail.exists():
            local = Path(__file__).resolve().parent.parent / detail.name
            detail = local if local.exists() else detail
        try:
            side = json.loads(detail.read_text())
            obj = {**obj, **{k: side[k] for k in
                             ("queries", "errors", "steal") if k in side}}
        except (OSError, json.JSONDecodeError) as e:
            print(f"WARNING: could not read bench detail sidecar "
                  f"{obj['detail']}: {e}")
    return obj


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    budget = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--budget"):
            budget = float(a.split("=", 1)[1])
    base, new = load(args[0]), load(args[1])
    bq, nq = base.get("queries", {}), new.get("queries", {})
    regressed = []
    compared = len(set(bq) & set(nq))
    print(f"{'query':32} {'base':>8} {'new':>8} {'delta':>8} {'ratio':>6}")
    for name in nq:
        b, n = bq.get(name), nq[name]
        if b is None:
            print(f"{name:32} {'—':>8} {n:8.3f} {'new':>8}")
            continue
        ratio = n / b if b else float("inf")
        flag = " <-- REGRESSION" if ratio > budget else ""
        if ratio > budget:
            regressed.append(name)
        print(f"{name:32} {b:8.3f} {n:8.3f} {n - b:+8.3f} {ratio:5.2f}x{flag}")
    dropped = sorted(set(bq) - set(nq))
    if dropped:
        print(f"dropped from headline: {', '.join(dropped)}")
    print(
        f"{'TOTAL':32} {base.get('value', 0):8.3f} {new.get('value', 0):8.3f}"
    )
    # surface the r8 contention telemetry when present: a comparison
    # against a contaminated artifact is not evidence of a regression
    for label, obj in (("base", base), ("new", new)):
        st = obj.get("steal")
        if isinstance(st, dict):
            note = ""
            if st.get("dirty_reps") or st.get("all_dirty_queries"):
                note = (
                    f" — {st.get('dirty_reps', 0)} stolen reps excluded"
                    + (
                        f"; ALL reps stolen for: {', '.join(st['all_dirty_queries'])}"
                        if st.get("all_dirty_queries")
                        else ""
                    )
                )
            print(
                f"steal[{label}]: run {st.get('run_pct', '?')}% "
                f"(threshold {st.get('threshold_pct', '?')}%){note}"
            )
    # an empty (or mostly-empty) comparison must fail loudly: a format
    # mismatch that drops every query would otherwise green-light
    # unmeasured regressions (r6 verdict #3)
    floor = max(1, len(bq) // 2)
    if compared < floor:
        print(
            f"ERROR: only {compared} of {len(bq)} baseline queries were "
            f"compared (floor {floor}) — format mismatch or gutted bench"
        )
        return 2
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
