"""Physical-plan assertions: the scale claims in docstrings, made testable
(predicate pushdown reaches the parquet scan, columns are pruned, operator
chains stay in whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark import plans
from ecommerce_data_pipeline_spark.operators.enrich import enrich_orders
from ecommerce_data_pipeline_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def test_filter_pushdown_reaches_scan(spark):
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type") == "purchase"
    )
    plans.assert_pushed(ev, "EqualTo(event_type,purchase)")


def test_column_pruning(spark):
    part = load_table(spark, SF_DIR, "part").select("p_partkey", "p_name")
    [scan] = plans.scan_report(part)
    assert "p_partkey" in scan["read_schema"]
    assert "p_retailprice" not in scan["read_schema"]


def test_partition_pruning_predicate_pushed(spark):
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderkey") == 42
    )
    plans.assert_pushed(orders, "EqualTo(o_orderkey,42)")


def test_codegen_covers_parse_chain(spark):
    from ecommerce_data_pipeline_spark.operators.dedup import kafka_identity_dedup
    from ecommerce_data_pipeline_spark.operators.parse import (
        bronze_projection,
        parse_orders,
    )
    from ecommerce_data_pipeline_spark.sources.events import orders_events

    df = parse_orders(
        kafka_identity_dedup(bronze_projection(orders_events(spark, SF_DIR)))
    )
    assert plans.codegen_spans(df) > 0


def test_enrich_join_is_broadcast_at_test_scale(spark):
    """At small SF the payments aggregate broadcasts (AQE/threshold); the
    plan must not contain a cartesian/nested-loop join."""
    orders = spark.createDataFrame(
        [("1", "u", 1.0, "USD", None)],
        "order_id string, user_id string, total_amount double, currency string, event_ts timestamp",
    )
    pays = spark.createDataFrame(
        [("1", 1.0, None)], "order_id string, amount double, event_ts timestamp"
    )
    text = plans.explain_string(enrich_orders(orders, pays))
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
