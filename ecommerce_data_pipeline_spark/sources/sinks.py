"""Output encodings + catalog surface (operators S4/S10/S11/S12).

- ``to_kafka_shape``: the producer-side encoding (S11) — key by order_id,
  value = compact JSON envelope (services/order/app/kafka/producer.py:79-80).
  Point ``df.write.format("kafka")`` at the result on a real cluster; here
  the encoded frame itself is the oracle-checkable artifact.
- ``register_catalog``: idempotent database/table DDL (S12,
  bronze_orders_raw.py:26-35 shape) registering the lakehouse tables under
  bronze_raw/silver/gold namespaces, plus the reference's SQL views (S10:
  vw_sales_last_60min, order_payments_enriched view twin) — the same
  multi-namespace SQL surface Trino serves in the reference (S4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def to_kafka_shape(df: DataFrame, key_col: str, value_cols: list[str]) -> DataFrame:
    """S11: (key STRING, value STRING<json>) rows ready for a Kafka writer.

    Compact JSON (no spaces — the producer uses compact separators); field
    order follows ``value_cols``. At scale this is a pure map stage.
    """
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("value"),
    )


def register_catalog(spark: SparkSession, lake) -> None:
    """S12/S4: idempotent DDL registering lakehouse tables by namespace and
    the S10 views.

    Persistence follows the session's catalog implementation: with the
    in-memory catalog (default) the registrations last for the session;
    with ``get_spark(metastore_dir=...)`` — the Derby-backed HMS standing
    in for the reference's shared thrift metastore
    (analytics/spark/conf/spark-defaults.conf:18) — the same statements
    persist and ``gold.fct_sales_minute`` is queryable by name from a
    fresh session (tests/test_catalog.py exercises the restart)."""
    for db in ("bronze_raw", "silver", "gold"):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    tables = {
        "bronze_raw.orders_raw": lake.bronze_orders,
        "bronze_raw.payments_raw": lake.bronze_payments,
        "silver.orders_clean": lake.silver_orders,
        "silver.payments_clean": lake.silver_payments,
        "silver.order_payments_enriched": lake.enriched,
        "gold.fct_sales_minute": lake.fct_sales_minute,
    }
    for name, table in tables.items():
        if table.exists():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            spark.sql(
                f"CREATE TABLE {name} USING parquet LOCATION '{table.path}'"
            )
            if table.partition_by:
                # Hive-layout partition dirs aren't discovered by CREATE
                # TABLE alone (bronze_orders_raw.py's tables are unpartitioned
                # so the reference never hits this).
                spark.sql(f"MSCK REPAIR TABLE {name}")
    if lake.fct_sales_minute.exists():
        # S10 view sink: the last-60-minutes BI view, anchored at the data
        # head like the registry query (deterministic; the reference anchors
        # at current_timestamp, vw_sales_last_60min.sql:5).
        spark.sql(
            """
            CREATE OR REPLACE VIEW gold.vw_sales_last_60min AS
            SELECT minute_bucket, gmv, paid_orders
            FROM gold.fct_sales_minute
            WHERE minute_bucket >= (
                SELECT max(minute_bucket) FROM gold.fct_sales_minute
            ) - INTERVAL 60 MINUTES
            """
        )
