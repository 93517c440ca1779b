"""Round-13: join-strategy advisor (operators/advisor.py) — each verdict
reproduced on data constructed to demand it, plus the measured numbers
that justify it."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.advisor import advise_join


def _probe(spark, n=10_000, hot_share=0.0):
    """Probe side with an optional hot key 0 owning ~hot_share of rows."""
    base = spark.range(0, n).select(
        F.when(F.rand(7) < F.lit(hot_share), F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") % 9).alias("x"),
    )
    return base


def test_advise_broadcast_for_small_build(spark):
    probe = _probe(spark)
    build = spark.range(0, 50).select(F.col("id").alias("k"))
    a = advise_join(probe, build, "k", broadcast_rows=1000)
    assert a.strategy == "broadcast"
    assert a.build_rows == 50 and a.probe_rows == 10_000


def test_advise_salted_for_hot_key(spark):
    probe = _probe(spark, hot_share=0.3)
    build = spark.range(0, 5_000).select(F.col("id").alias("k"))
    a = advise_join(probe, build, "k", broadcast_rows=100, skew_share=0.05)
    assert a.strategy == "salted"
    assert a.top_key_share >= 0.2
    assert a.suggested_n_salts and a.suggested_n_salts >= 2


def test_advise_bloom_for_filtered_dimension(spark):
    probe = _probe(spark)  # ~10k distinct keys
    build = spark.range(0, 2_000).select((F.col("id") * 3).alias("k"))
    a = advise_join(probe, build, "k", broadcast_rows=100, bloom_ndv_ratio=0.5)
    assert a.strategy == "bloom_prune"
    assert a.build_key_ndv < a.probe_key_ndv


def test_advise_shuffle_and_bucketed_for_comparable_sides(spark):
    probe = _probe(spark)
    build = spark.range(0, 10_000).select(F.col("id").alias("k"))
    a = advise_join(probe, build, "k", broadcast_rows=100)
    assert a.strategy == "shuffle"
    b = advise_join(probe, build, "k", broadcast_rows=100, recurring=True)
    assert b.strategy == "bucketed"


def test_advice_is_deterministic(spark):
    probe = _probe(spark, hot_share=0.3)
    build = spark.range(0, 5_000).select(F.col("id").alias("k"))
    first = advise_join(probe, build, "k", broadcast_rows=100)
    second = advise_join(
        probe.repartition(13), build.repartition(7), "k", broadcast_rows=100
    )
    assert (first.strategy, first.probe_key_ndv, first.build_key_ndv) == (
        second.strategy,
        second.probe_key_ndv,
        second.build_key_ndv,
    )


def test_advisor_survives_non_numeric_shuffle_partitions(spark, monkeypatch):
    """ADVICE r13 low: 'spark.sql.shuffle.partitions' can be 'auto' on
    some runtimes; the salted path must fall back to defaultParallelism
    instead of crashing on exactly the skewed join it diagnoses."""
    from ecommerce_data_pipeline_spark.operators.advisor import advise_join

    probe = spark.createDataFrame(
        [(1, i) for i in range(400)] + [(k, 0) for k in range(2, 52)],
        "k long, v long",
    )
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    # OSS Spark's typed conf rejects a literal set('...', 'auto'), so
    # emulate the Databricks-style runtime by faking the getter.
    real_get = spark.conf.get

    def fake_get(key, *a, **kw):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(key, *a, **kw)

    monkeypatch.setattr(spark.conf, "get", fake_get)
    a = advise_join(probe, build, "k", broadcast_rows=10, skew_share=0.05)
    assert a.strategy == "salted"
    assert a.suggested_n_salts and a.suggested_n_salts >= 2


def test_execute_advice_matches_plain_join_per_strategy(spark):
    """execute_advice is row-for-row the plain join for every strategy it
    can execute locally (broadcast, salted, bloom_prune, shuffle) — the
    bloom leg also exercises the NDV-sized filter path."""
    from ecommerce_data_pipeline_spark.operators.advisor import (
        JoinAdvice,
        advise_join,
        execute_advice,
    )

    probe = spark.range(0, 2_000).select(
        (F.col("id") % 400).alias("k"), F.col("id").alias("rid")
    )
    build = spark.range(0, 120).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    want = sorted(
        (r["k"], r["rid"], r["b"]) for r in probe.join(build, "k").collect()
    )
    for strategy in ("broadcast", "salted", "bloom_prune", "shuffle"):
        advice = JoinAdvice(
            strategy,
            "forced for test",
            probe_rows=2_000,
            build_rows=120,
            probe_key_ndv=400,
            build_key_ndv=120,
            top_key_share=0.0,
            suggested_n_salts=4,
        )
        got = sorted(
            (r["k"], r["rid"], r["b"])
            for r in execute_advice(
                advice, probe, build, on="k", spread_col="rid"
            ).collect()
        )
        assert got == want, strategy
