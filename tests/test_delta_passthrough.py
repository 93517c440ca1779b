"""Delta passthrough: ParquetTable(use_delta=True) must delegate MERGE and
keyed DELETE to DeltaTable (reference behavior: silver_orders.py:72-79 —
``DeltaTable.merge.whenMatchedUpdateAll.whenNotMatchedInsertAll``).

delta-spark is not bundled in this sandbox, so the delegation is exercised
with a recording fake patched over ``lake.DeltaTable``; a second test runs
the real thing and is skipped wherever delta-spark is absent. Together they
keep the production path from being dead code."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark import lake as lake_mod
from ecommerce_data_pipeline_spark.lake import ParquetTable


class _Recorder:
    """Chainable stand-in for DeltaTable: records every call."""

    def __init__(self, log, name="DeltaTable"):
        self.log = log
        self.name = name

    def __getattr__(self, attr):
        def call(*args, **kwargs):
            self.log.append((attr, args))
            return _Recorder(self.log, attr)

        return call


@pytest.fixture()
def fake_delta(monkeypatch, tmp_path):
    calls: list[tuple] = []

    class FakeDeltaTable:
        @staticmethod
        def forPath(spark, path):
            calls.append(("forPath", (path,)))
            return _Recorder(calls)

    monkeypatch.setattr(lake_mod, "DeltaTable", FakeDeltaTable)
    monkeypatch.setattr(lake_mod, "_HAS_DELTA", True)
    return calls


def _fake_existing_delta_dir(path: str) -> None:
    os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)
    with open(os.path.join(path, "_delta_log", "00000000.json"), "w") as f:
        f.write("{}")


def test_merge_delegates_to_delta(spark, tmp_path, fake_delta):
    path = str(tmp_path / "t")
    _fake_existing_delta_dir(path)
    t = ParquetTable(path, partition_by=["day"], use_delta=True)
    upd = spark.createDataFrame([("a", "2024-01-01", 1)], "k string, day string, v int")
    assert t.merge(spark, upd, keys=["k", "day"]) is None
    names = [c[0] for c in fake_delta]
    assert names == [
        "forPath",
        "alias",
        "merge",
        "whenMatchedUpdateAll",
        "whenNotMatchedInsertAll",
        "execute",
    ]
    assert fake_delta[0][1] == (path,)
    merge_args = dict(zip(names, fake_delta))["merge"][1]
    assert merge_args[1] == "t.k <=> u.k AND t.day <=> u.day"


def test_delete_delegates_to_delta(spark, tmp_path, fake_delta):
    path = str(tmp_path / "t")
    _fake_existing_delta_dir(path)
    t = ParquetTable(path, use_delta=True)
    # read() would need the real connector; route it to a plain frame so
    # the pre-mutation semi-join count works against known rows.
    base = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    t.read = lambda _spark: base  # noqa: E731 - instance stub
    doomed = spark.createDataFrame([("a",)], "k string")
    assert t.delete_keys(spark, doomed, keys=["k"]) == 1
    names = [c[0] for c in fake_delta]
    assert names == ["forPath", "alias", "merge", "whenMatchedDelete", "execute"]


def test_use_delta_requires_delta_spark():
    if lake_mod._HAS_DELTA:  # pragma: no cover - other environments
        pytest.skip("delta-spark installed: constructor guard not applicable")
    with pytest.raises(ImportError, match="delta-spark"):
        ParquetTable("/tmp/x", use_delta=True)


@pytest.mark.skipif(not lake_mod._HAS_DELTA, reason="delta-spark not installed")
def test_merge_delta_end_to_end(spark, tmp_path):  # pragma: no cover - needs delta
    """Real Delta MERGE round-trip wherever delta-spark IS installed."""
    t = ParquetTable(str(tmp_path / "t"), use_delta=True)
    base = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    t.merge(spark, base, keys=["k"])  # bootstrap
    upd = spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int")
    t.merge(spark, upd, keys=["k"])
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == {("a", 1), ("b", 20), ("c", 3)}
    assert t.delete_keys(
        spark, spark.createDataFrame([("a",)], "k string"), keys=["k"]
    ) == 1
    assert {r["k"] for r in t.read(spark).collect()} == {"b", "c"}
