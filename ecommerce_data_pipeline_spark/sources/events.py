"""Derived Kafka-shaped event streams (FIXTURES.md §§1-3).

The reference's input is two Kafka topics of JSON envelopes
(docs/events.md:5-12). The driver test data has no raw event topic, so this
module *derives* the two streams deterministically from the TPC-H-ish
``orders`` table: every column is a pure function of (o_orderkey, o_custkey,
o_orderdate, o_totalprice), which makes the full medallion pipeline
oracle-checkable end to end.

Edge cases are injected by orderkey residue so every §2 operator is exercised
(FIXTURES.md §3):

- ``o_orderkey % 10 == 0``  → unpaid order (no payment row)
- ``o_orderkey % 10 == 1``  → partial payment (50% of total)
- ``o_orderkey % 10 == 2``  → split payments (60% + 40%, two rows)
- ``o_orderkey % 10 == 3``  → overpayment (110%)
- otherwise                  → one exact payment
- ``o_orderkey % 20 == 0``  → Kafka redelivery duplicate of the order event
  (same topic/partition/offset appears twice → W1 dedup must keep one)
- orphan payments: synthetic order_ids beyond the orders keyspace.

All amounts are integer cents on the wire (payment.succeeded carries
``amount_cents``; services/payment/app/api/routes.py:87-93) and dollars in
order.created (routes.py:205) — matching the reference's asymmetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_data_pipeline_spark.sources.parquet import load_table

N_KAFKA_PARTITIONS = 6  # deploy/kafka/init-topics.sh:8-10

# Per-session memo of the derived streams. The fixture derivation
# (row_number over 6 Kafka partitions) is test-rig-only work; bench and the
# driver's multi-query correctness run would otherwise pay it once per query.
# On by default (the derivation is deterministic and small — ~100 MB cached
# at sf0.1); disable via enable_stream_cache(False) to measure cold paths.
_STREAM_CACHE: dict[tuple[str, str, str], "DataFrame"] = {}
_CACHE_ENABLED = True


def enable_stream_cache(enabled: bool = True) -> None:
    global _CACHE_ENABLED
    _CACHE_ENABLED = enabled
    if not enabled:
        for df in _STREAM_CACHE.values():
            try:
                df.unpersist()
            except Exception:  # pragma: no cover - session already stopped
                pass
        _STREAM_CACHE.clear()


def _memo(spark: SparkSession, sf_dir: str, which: str, build):
    if not _CACHE_ENABLED:
        return build()
    key = (spark.sparkContext.applicationId, sf_dir, which)
    if key not in _STREAM_CACHE:
        _STREAM_CACHE[key] = build().cache()
    return _STREAM_CACHE[key]


def silver_orders_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized bronze→silver orders chain (parse_orders ∘ W1 dedup ∘
    bronze_projection ∘ orders_events), shared by every registry query that
    needs clean orders. Without this, a multi-branch plan like
    fct_sales_minute (orders feed both the enrich join and the fact agg)
    re-scans the raw fixture and re-runs the dedup window shuffle once per
    branch — the cache pays both exactly once per session/sf."""
    from ecommerce_data_pipeline_spark.operators.dedup import kafka_identity_dedup
    from ecommerce_data_pipeline_spark.operators.parse import (
        bronze_projection,
        parse_orders,
    )

    return _memo(
        spark,
        sf_dir,
        "silver_orders",
        lambda: parse_orders(
            kafka_identity_dedup(bronze_projection(orders_events(spark, sf_dir)))
        ),
    )


def silver_payments_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized bronze→silver payments chain (see silver_orders_frame)."""
    from ecommerce_data_pipeline_spark.operators.dedup import kafka_identity_dedup
    from ecommerce_data_pipeline_spark.operators.parse import (
        bronze_projection,
        parse_payments,
    )

    return _memo(
        spark,
        sf_dir,
        "silver_payments",
        lambda: parse_payments(
            kafka_identity_dedup(bronze_projection(payments_events(spark, sf_dir)))
        ),
    )


def _with_kafka_metadata(df: DataFrame, topic: str) -> DataFrame:
    """Attach topic/partition/offset/timestampType. Partition = key % 6
    mirrors the producer's hash(order_id) keying (docs/events.md:11-12);
    offset is a per-partition row_number in kafka_timestamp order."""
    w = Window.partitionBy("partition").orderBy("kafka_timestamp", "raw_key")
    return (
        df.withColumn("topic", F.lit(topic))
        .withColumn(
            "partition", F.pmod(F.col("order_key"), F.lit(N_KAFKA_PARTITIONS)).cast("int")
        )
        .withColumn("offset", F.row_number().over(w).cast("long") - F.lit(1))
        .withColumn("timestampType", F.lit(0))
    )


def orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order.created stream: one JSON envelope per order (+ redelivery dups).

    raw_value is built with to_json over a struct — the exact inverse of the
    silver from_json parse, so silver output can be oracle-checked against
    the orders table directly.
    """
    return _memo(spark, sf_dir, "orders", lambda: _orders_events(spark, sf_dir))


def _orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    items = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_partkey").cast("int").alias("product_id"),
                        F.col("l_quantity").cast("int").alias("qty"),
                        # Cents recipe (scale -> round -> int -> /100), NOT
                        # round(x, 2): two-decimal double rounding takes
                        # different scaling paths in Spark (BigDecimal
                        # HALF_UP) vs DuckDB (scaled std::round) and
                        # disagrees on ~8% of prices; the single scaled
                        # round is bit-identical across engines.
                        (
                            F.round(
                                F.col("l_extendedprice")
                                / F.col("l_quantity")
                                * 100
                            ).cast("long")
                            / 100.0
                        ).alias("price"),
                    )
                )
            ).alias("items")
        )
    )
    base = (
        orders.join(items, orders.o_orderkey == items.l_orderkey, "left")
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderkey").cast("string").alias("raw_key"),
            (F.col("o_orderdate") + F.expr("INTERVAL 1 SECOND")).alias(
                "kafka_timestamp"
            ),
            F.to_json(
                F.struct(
                    F.lit("order.created").alias("event_type"),
                    F.lit("1.0").alias("event_version"),
                    F.sha2(F.concat_ws(":", F.lit("trace"), F.col("o_orderkey")), 256).alias(
                        "trace_id"
                    ),
                    F.col("o_orderkey").cast("string").alias("order_id"),
                    F.concat(
                        F.lit("user"),
                        F.col("o_custkey").cast("string"),
                        F.lit("@example.com"),
                    ).alias("user_id"),
                    F.col("items"),
                    F.lit("USD").alias("currency"),
                    F.round(F.col("o_totalprice"), 2).alias("total_amount"),
                    F.lit("CREATED").alias("status"),
                    F.date_format(
                        F.col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
                    ).alias("event_time"),
                    F.sha2(
                        F.concat_ws(":", F.lit("evt"), F.col("o_orderkey")), 256
                    ).alias("event_id"),
                )
            ).alias("raw_value"),
        )
    )
    base = _with_kafka_metadata(base, "orders.events")
    dups = base.filter(F.col("order_key") % 20 == 0)  # redelivery duplicates
    return base.unionByName(dups).drop("order_key")


def payments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """payment.succeeded stream: flat JSON payloads with amount_cents."""
    return _memo(spark, sf_dir, "payments", lambda: _payments_events(spark, sf_dir))


def _payments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    r = F.pmod(F.col("o_orderkey"), F.lit(10))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    # Integer-exact splits (floor arithmetic) so split legs reconstruct the
    # total exactly and fully_paid derivations are fp-stable.
    paid = orders.filter(r != 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").alias("order_ts"),
        F.when(r == 1, F.floor(cents / 2))
        .when(r == 2, F.floor(cents * 6 / 10))
        .when(r == 3, cents + F.floor(cents / 10))
        .otherwise(cents)
        .cast("long")
        .alias("amount_cents"),
        F.lit(1).alias("seq"),
    )
    second_leg = orders.filter(r == 2).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").alias("order_ts"),
        (cents - F.floor(cents * 6 / 10)).cast("long").alias("amount_cents"),
        F.lit(2).alias("seq"),
    )
    orphans = orders.filter(F.pmod(F.col("o_orderkey"), F.lit(997)) == 0).select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("order_key"),
        F.col("o_orderdate").alias("order_ts"),
        F.lit(999).alias("amount_cents"),
        F.lit(1).alias("seq"),
    )
    all_pay = paid.unionByName(second_leg).unionByName(orphans)
    base = all_pay.select(
        F.col("order_key"),
        F.col("order_key").cast("string").alias("raw_key"),
        F.timestamp_add(
            "SECOND",
            (F.lit(30) + F.pmod(F.col("order_key"), F.lit(570)) + F.col("seq") * 60).cast(
                "int"
            ),
            F.col("order_ts"),
        ).alias("kafka_timestamp"),
        F.to_json(
            F.struct(
                F.lit("payment.succeeded").alias("type"),
                F.col("order_key").alias("order_id"),
                F.col("amount_cents"),
                F.lit("USD").alias("currency"),
                F.concat(
                    F.lit("user"),
                    F.col("order_key").cast("string"),
                    F.lit("@example.com"),
                ).alias("user_email"),
            )
        ).alias("raw_value"),
    )
    return _with_kafka_metadata(base, "payments.events").drop("order_key")
