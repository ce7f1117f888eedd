"""bench.py robustness contract (round-4 lesson: one broken query
aborted the run and erased the round's bench evidence — the JSON line
must ALWAYS be emitted, with failures in ``errors``)."""

from __future__ import annotations

import json

import bench


class _NoStop:
    """Session proxy whose stop() is a no-op, so bench.main() cannot
    tear down the shared test session."""

    def __init__(self, spark):
        self._spark = spark

    def __getattr__(self, name):
        return getattr(self._spark, name)

    def stop(self):
        pass


def test_bench_emits_json_even_with_broken_query(spark, monkeypatch, capsys):
    def ok(s, sf_dir):
        return spark.range(5)

    def boom(s, sf_dir):
        raise RuntimeError("kaboom: simulated plan failure\nplan dump line 2")

    monkeypatch.setattr(bench, "QUERIES", {"top_products": ok, "boom": boom})
    monkeypatch.setattr(bench, "HEADLINE", ["top_products", "boom"])
    monkeypatch.setattr(bench, "get_spark", lambda name: _NoStop(spark))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPS", "2")

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)  # exactly one parseable JSON line
    assert d["unit"] == "sec" and d["reps"] == 2
    assert d["queries"]["top_products"] > 0
    assert "boom" not in d["queries"]
    # exception class + FIRST line only (plan dumps stay out)
    assert d["errors"]["boom"].startswith("RuntimeError: kaboom")
    assert "line 2" not in d["errors"]["boom"]
    assert d["value"] == d["queries"]["top_products"]


def test_bench_survives_broken_warmup(spark, monkeypatch, capsys):
    def boom(s, sf_dir):
        raise RuntimeError("warm-up broken")

    monkeypatch.setattr(bench, "QUERIES", {"top_products": boom})
    monkeypatch.setattr(bench, "HEADLINE", ["top_products"])
    monkeypatch.setattr(bench, "get_spark", lambda name: _NoStop(spark))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPS", "1")

    bench.main()
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] == 0 and "top_products" in d["errors"]


def test_frozen_per_query_baseline_covers_headline_set():
    """BASELINE_QUERIES.json (the r5-frozen per-query 2x budget) must
    track the headline set: a renamed/removed bench query would silently
    lose its baseline without this guard. New queries are allowed (they
    get a baseline at the next deliberate re-freeze)."""
    import json
    from pathlib import Path

    import bench

    frozen = json.loads(
        (Path(bench.__file__).parent / "BASELINE_QUERIES.json").read_text()
    )
    assert frozen["sf"] == 0.1 and frozen["queries"]
    orphaned = set(frozen["queries"]) - set(bench.HEADLINE)
    assert not orphaned, (
        f"baselined queries no longer in bench.HEADLINE: {sorted(orphaned)} "
        f"— rename the baseline keys or record why they were dropped"
    )
