"""Spark Connect compatibility guards (r9 audit, docs/MIGRATION.md):
`is_connect` / `default_parallelism` / the stateful-streaming guard.

The container has no grpcio, so a REAL Connect session cannot be built
here; the guards are probed with a minimal stand-in whose class lives
under a `pyspark.sql.connect` module name — exactly the property the
string-based check keys on (chosen so the probe itself never imports
the connect package)."""

from __future__ import annotations

import pytest

from lakehouse_adventureworks2022_spark.session import (
    DEFAULT_SHUFFLE_PARTITIONS,
    default_parallelism,
    is_connect,
)


class _FakeConf:
    def __init__(self, value):
        self._value = value

    def get(self, key):
        if self._value is None:
            raise RuntimeError("conf service unreachable")
        return self._value


class _FakeConnectSession:
    def __init__(self, shuffle_partitions):
        self.conf = _FakeConf(shuffle_partitions)


# the string-module check must see this as a Connect class
_FakeConnectSession.__module__ = "pyspark.sql.connect.session"


def test_classic_session_is_not_connect(spark):
    assert not is_connect(spark)
    # classic path reads sparkContext.defaultParallelism
    assert default_parallelism(spark) == spark.sparkContext.defaultParallelism


def test_connect_detection_by_module_name():
    assert is_connect(_FakeConnectSession("8"))


def test_connect_parallelism_falls_back_to_shuffle_conf():
    assert default_parallelism(_FakeConnectSession("12")) == 12
    # conf unreachable -> engine CPU default, never an exception
    assert (
        default_parallelism(_FakeConnectSession(None))
        == DEFAULT_SHUFFLE_PARTITIONS
    )


def test_stateful_streaming_guards_connect_sessions(spark):
    """user_running_totals must refuse a Connect session with a clear
    error instead of failing inside plan construction."""
    from lakehouse_adventureworks2022_spark.streaming.stateful import (
        user_running_totals,
    )

    class _FakeDF:
        sparkSession = _FakeConnectSession("8")

    with pytest.raises(RuntimeError, match="Spark Connect"):
        user_running_totals(_FakeDF())
