"""Skew toolbox: salted join equivalence, bucketed co-located join plan
(operators/skew.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark import plans
from ecommerce_data_pipeline_spark.operators.skew import (
    salted_join,
    skew_profile,
    write_bucketed,
)


def test_salted_join_equals_plain_join(spark):
    # 90% of fact rows hit one hot key.
    fact = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1] * 900 + list(range(2, 102)),
                "row_id": range(1000),
                "amount": [float(i % 7) for i in range(1000)],
            }
        )
    )
    dim = spark.createDataFrame(
        [Row(k=i, label=f"d{i}") for i in range(1, 102)]
    )
    plain = fact.join(dim, "k").select("k", "row_id", "amount", "label")
    salted = salted_join(fact, dim, on="k", spread_col="row_id", n_salts=8)
    assert salted.count() == plain.count() == 1000
    assert (
        salted.select("k", "row_id", "amount", "label")
        .subtract(plain)
        .count()
        == 0
    )
    assert plain.subtract(salted.select("k", "row_id", "amount", "label")).count() == 0


def test_salted_join_left_preserves_unmatched(spark):
    fact = spark.createDataFrame([Row(k=1, row_id=1), Row(k=99, row_id=2)])
    dim = spark.createDataFrame([Row(k=1, label="a")])
    out = salted_join(fact, dim, on="k", spread_col="row_id", n_salts=4, how="left")
    rows = {r["row_id"]: r["label"] for r in out.collect()}
    assert rows == {1: "a", 2: None}


def test_skew_profile_flags_hot_key(spark):
    fact = spark.createDataFrame(
        [Row(k=1)] * 98 + [Row(k=2)] + [Row(k=3)]
    )
    top = skew_profile(fact, "k", top=1).collect()[0]
    assert top["k"] == 1
    assert top["share"] == 0.98


def test_bucketed_join_has_no_exchange(spark):
    a = spark.createDataFrame(
        [Row(id=i, a_val=float(i)) for i in range(500)]
    )
    b = spark.createDataFrame(
        [Row(id=i, b_val=float(i * 2)) for i in range(500)]
    )
    write_bucketed(a, "bkt_a", ["id"], n_buckets=8, sort_cols=["id"])
    write_bucketed(b, "bkt_b", ["id"], n_buckets=8, sort_cols=["id"])
    try:
        # Force the sort-merge path so the assertion is about bucketing,
        # not about broadcast sizes. Save/restore (NOT unset): unset
        # falls back to the built-in 10MB default, not the session's 64m.
        prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        text = plans.explain_string(joined, "formatted")
        assert "SortMergeJoin" in text
        assert "Exchange" not in text  # co-located: bucket files ARE the shuffle
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_query_restores_broadcast_threshold(spark):
    """Review r13 regression guard: the registry query must leave the
    session's broadcast threshold exactly as it found it (conf.unset
    would fall back to the built-in 10MB default, silently changing
    plans for every query that runs after it in a long session)."""
    from ecommerce_data_pipeline_spark.queries import QUERIES

    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key)
    QUERIES["bucketed_colocated_join"](spark, "/root/testdata/sf0.001")
    assert spark.conf.get(key) == before
