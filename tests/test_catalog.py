"""S4/S10/S12: namespace DDL, path-registered tables, and SQL views over a
built lakehouse."""

from __future__ import annotations

import pytest

from ecommerce_data_pipeline_spark import pipeline
from ecommerce_data_pipeline_spark.sources.events import orders_events, payments_events
from ecommerce_data_pipeline_spark.sources.sinks import register_catalog
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def cataloged(spark, tmp_path_factory):
    lake = pipeline.Lakehouse(str(tmp_path_factory.mktemp("cat")))
    pipeline.run_all(
        spark, lake, orders_events(spark, SF_DIR), payments_events(spark, SF_DIR)
    )
    register_catalog(spark, lake)
    return lake


def test_namespaced_tables_queryable(spark, cataloged):
    n = spark.sql("SELECT count(*) AS n FROM silver.orders_clean").first()["n"]
    assert n == cataloged.silver_orders.read(spark).count()
    joined = spark.sql(
        """
        SELECT count(*) AS n
        FROM silver.order_payments_enriched e
        JOIN gold.fct_sales_minute f
          ON date_trunc('minute', e.order_ts) = f.minute_bucket
        WHERE e.fully_paid
        """
    ).first()["n"]
    assert joined > 0


def test_view_sink(spark, cataloged):
    rows = spark.sql("SELECT * FROM gold.vw_sales_last_60min").collect()
    fact_head = spark.sql(
        "SELECT max(minute_bucket) AS m FROM gold.fct_sales_minute"
    ).first()["m"]
    assert rows  # non-empty: the head bucket is always within its own hour
    assert all((fact_head - r["minute_bucket"]).total_seconds() <= 3600 for r in rows)


def test_ddl_idempotent(spark, cataloged):
    register_catalog(spark, cataloged)  # second run must not raise
    assert spark.sql("SELECT count(*) FROM bronze_raw.orders_raw").first()[0] > 0


def test_metastore_survives_session_restart(tmp_path):
    """Persistent-catalog parity (spark-defaults.conf:18: shared HMS): a
    table registered under a Derby-backed metastore is queryable by name
    from a brand-new session in a separate process — the restart the
    in-memory catalog cannot survive."""
    import subprocess
    import sys
    import textwrap

    meta = str(tmp_path / "meta")
    data = str(tmp_path / "data")
    common = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from ecommerce_data_pipeline_spark.session import get_spark
        spark = get_spark("metastore-test", cpus=2, metastore_dir={meta!r})
        spark.sparkContext.setLogLevel("ERROR")
        """
    )
    write = common + textwrap.dedent(
        f"""
        from ecommerce_data_pipeline_spark.lake import ParquetTable
        from ecommerce_data_pipeline_spark.pipeline import Lakehouse
        from ecommerce_data_pipeline_spark.sources.sinks import register_catalog
        lake = Lakehouse({data!r}, partition_silver=False)
        df = spark.createDataFrame(
            [("2024-01-01 00:01:00", 10.0, 2)],
            "minute_bucket string, gmv double, paid_orders long",
        ).selectExpr("CAST(minute_bucket AS TIMESTAMP) minute_bucket", "gmv", "paid_orders")
        lake.fct_sales_minute.overwrite(df)
        register_catalog(spark, lake)
        print("WROTE", spark.sql("SELECT count(*) c FROM gold.fct_sales_minute").first()["c"])
        """
    )
    read = common + textwrap.dedent(
        """
        print("READ", spark.sql("SELECT sum(paid_orders) s FROM gold.fct_sales_minute").first()["s"])
        """
    )
    r1 = subprocess.run(
        [sys.executable, "-c", write], capture_output=True, text=True, timeout=300
    )
    assert "WROTE 1" in r1.stdout, r1.stdout + r1.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-c", read], capture_output=True, text=True, timeout=300
    )
    assert "READ 2" in r2.stdout, r2.stdout + r2.stderr[-2000:]
