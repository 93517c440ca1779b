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


def test_pricing_summary_pushdown_and_pruning(spark):
    from ecommerce_data_pipeline_spark.queries import QUERIES

    df = QUERIES["lineitem_pricing_summary"](spark, SF_DIR)
    [scan] = plans.scan_report(df)
    # The shipdate filter reaches the scan; unused columns are pruned.
    assert any("l_shipdate" in f for f in scan["pushed_filters"]), scan
    assert "l_partkey" not in scan["read_schema"]
    assert "l_suppkey" not in scan["read_schema"]


def test_asof_join_is_single_shuffle_no_blowup(spark):
    from ecommerce_data_pipeline_spark.queries import QUERIES

    df = QUERIES["asof_view_before_purchase"](spark, SF_DIR)
    text = plans.explain_string(df, "formatted")
    # Union-sort plan: no join operator at all — a window over one
    # exchange. A naive asof would show BroadcastNestedLoopJoin.
    assert "NestedLoopJoin" not in text
    assert "SortMergeJoin" not in text
    assert "Window" in text


def test_interval_overlap_join_is_equi_not_nested_loop(spark):
    from ecommerce_data_pipeline_spark.queries import QUERIES

    df = QUERIES["session_overlap_pairs"](spark, SF_DIR)
    text = plans.explain_string(df, "formatted")
    # Binned plan: the pair generation is an equi-join on the bucket id
    # (hash or sort-merge), never a nested-loop over all session pairs.
    assert "NestedLoopJoin" not in text


def test_rollup_is_single_expand_aggregate(spark):
    from ecommerce_data_pipeline_spark.queries import QUERIES

    df = QUERIES["revenue_rollup"](spark, SF_DIR)
    text = plans.explain_string(df, "formatted")
    # One Expand feeding one aggregation chain — not a UNION of scans.
    assert text.count("Expand") >= 1
    assert "Union" not in text


def test_hive_partition_pruning_lists_one_partition(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    text = plans.explain_string(pruned, "formatted")
    # The predicate must land in PartitionFilters (directory-level pruning:
    # non-matching partitions are never listed), not in the data filters.
    assert "PartitionFilters" in text
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
    assert m and "event_type" in m.group(1)
    assert pruned.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_correlated_subquery_is_decorrelated(spark):
    from ecommerce_data_pipeline_spark.queries import QUERIES

    df = QUERIES["above_avg_orders"](spark, SF_DIR)
    text = plans.explain_string(df, "formatted")
    # Catalyst must rewrite the correlated scalar subquery into an
    # aggregate + join — no per-row subquery execution nodes survive.
    assert "Subquery" not in text
    assert "HashAggregate" in text
    assert df.count() > 0


def test_q5_broadcasts_dims_and_pushes_dates(spark):
    from ecommerce_data_pipeline_spark.queries import QUERIES

    df = QUERIES["local_supplier_revenue"](spark, SF_DIR)
    text = plans.explain_string(df, "formatted")
    # The region-pruned nation dim broadcasts into the fact chain; the
    # date bounds reach the orders scan; no accidental cartesian.
    assert "BroadcastHashJoin" in text
    assert "CartesianProduct" not in text
    scans = plans.scan_report(df)
    orders_scans = [s for s in scans if "orders" in s["location"]]
    assert any(
        any("o_orderdate" in f for f in s["pushed_filters"]) for s in orders_scans
    ), orders_scans


def test_salted_join_spreads_key_without_nested_loop(spark):
    from ecommerce_data_pipeline_spark.queries import QUERIES

    df = QUERIES["salted_user_enrich"](spark, SF_DIR)
    text = plans.explain_string(df, "formatted")
    # The salt must be part of the join key (an equi-join on
    # [user_id, __salt]) and never degrade to a nested loop; the salt
    # column itself is dropped from the output.
    assert "__salt" in text
    assert "NestedLoopJoin" not in text and "CartesianProduct" not in text
    assert "__salt" not in df.columns
