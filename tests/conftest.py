from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lakehouse_adventureworks2022_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

#: r14 (r13 verdict ask #2): the driver's verify step has a wall budget
#: the full suite outgrew (~37 min; the driver's pytest tail cut off at
#: 93% with zero failures — "tests_ok: false" on green code). Tests
#: carrying @pytest.mark.slow are the multi-minute SPEC SWEEPS (JPEG
#: precision×predictor×restart matrices, WARC end-to-end chains …) whose
#: per-case coverage is already represented by faster siblings; they
#: SKIP by default and run when SPARK_GRAFT_SLOW_TESTS=1 (the
#: round-close serialized verification sets it).
RUN_SLOW = os.environ.get("SPARK_GRAFT_SLOW_TESTS", "0") == "1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute spec sweep; skipped unless "
        "SPARK_GRAFT_SLOW_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_SLOW:
        return
    skip = pytest.mark.skip(
        reason="slow spec sweep (set SPARK_GRAFT_SLOW_TESTS=1 to run)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
