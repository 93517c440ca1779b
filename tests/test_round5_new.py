"""Round-5 late additions: streaming session windows, SCD2 point-in-time,
VARIANT extraction, RocksDB state backend."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import ts


def test_scd2_point_in_time_toy(spark):
    """As-of against SCD2 change points returns the state valid at the
    probe instant, not the state at the event itself."""
    from ecommerce_data_pipeline_spark.operators.asof import asof_join
    from ecommerce_data_pipeline_spark.operators.state import scd2_collapse

    ev = spark.createDataFrame(
        [
            (1, 10, "view", ts("2024-01-01T10:00:00")),
            (2, 10, "cart", ts("2024-01-01T11:00:00")),
            (3, 10, "purchase", ts("2024-01-01T11:30:00")),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    history = scd2_collapse(
        ev, key_col="user_id", state_col="event_type", ts_col="ts"
    ).select("user_id", "state", "valid_from")
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.timestamp_add("HOUR", F.lit(-1), F.col("ts")).alias("pts"),
    )
    out = asof_join(
        probes, history, on=["user_id"], left_ts="pts",
        right_ts="valid_from", value_cols=["state"], prefix="m_",
    ).collect()
    # Probe instant 10:30 falls inside the 'view' interval [10:00, 11:00).
    assert len(out) == 1 and out[0]["m_state"] == "view"


def test_variant_get_missing_key_is_null(spark):
    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"other": 1}',), (None,)], "props string"
    )
    out = df.select(
        F.variant_get(F.parse_json(F.col("props")), "$.k", "int").alias("k")
    ).collect()
    assert [r["k"] for r in out] == [7, None, None]


def test_streaming_session_windows_merges_across_files(spark, tmp_path):
    """Events for one user split across files in REVERSE time order must
    still merge into the correct sessions (mergeable session state), and
    append mode must flush them once the sentinel advances the watermark."""
    from ecommerce_data_pipeline_spark.streaming.statestore import rocksdb_state

    src, out, ck = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    rows_late = [(10, ts("2024-01-01T10:40:00"), 2.0)]   # extends session 1
    rows_early = [
        (10, ts("2024-01-01T10:20:00"), 1.0),            # session 1 start
        (10, ts("2024-01-01T13:00:00"), 4.0),            # session 2
    ]
    sentinel = [(-1, ts("2024-06-01T00:00:00"), 0.0)]
    schema = "user_id long, ts timestamp, value double"
    import time

    # Three single-file writes; mtimes force file order: early, late, sentinel
    for rows in [rows_early, rows_late, sentinel]:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.05)
    sessions = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 second")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("v"))
    )
    with rocksdb_state(spark):
        q = (
            sessions.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    got = {
        (r["user_id"], r["n_events"], r["v"])
        for r in spark.read.parquet(out).filter(F.col("user_id") >= 0).collect()
    }
    # 10:20 and 10:40 merge into one 2-event session; 13:00 is its own.
    assert got == {(10, 2, 3.0), (10, 1, 4.0)}


def test_observe_quality_batch(spark):
    from ecommerce_data_pipeline_spark.quality import observe_quality

    df = spark.createDataFrame(
        [(1, 5.0), (None, -2.0), (3, 1.0)], "order_id long, total_amount double"
    )
    observed, obs = observe_quality(df)
    assert observed.count() == 3  # the action the metrics ride on
    got = obs.get
    assert got == {"n_rows": 3, "null_keys": 1, "negative_amounts": 1}


def test_observe_quality_streaming_progress(spark, tmp_path):
    from ecommerce_data_pipeline_spark.quality import observe_quality

    src, out, ck = str(tmp_path / "s"), str(tmp_path / "o"), str(tmp_path / "c")
    spark.createDataFrame(
        [(1, 5.0), (None, -2.0)], "order_id long, total_amount double"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    observed, obs = observe_quality(stream)
    assert obs is None
    q = (
        observed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [
        p.observedMetrics["quality"]
        for p in q.recentProgress
        if "quality" in p.observedMetrics
    ]
    total = {
        "n_rows": sum(r["n_rows"] for r in batches),
        "null_keys": sum(r["null_keys"] for r in batches),
        "negative_amounts": sum(r["negative_amounts"] for r in batches),
    }
    assert total == {"n_rows": 2, "null_keys": 1, "negative_amounts": 1}
