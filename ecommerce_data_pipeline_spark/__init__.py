"""ecommerce_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference `hydramod/ecommerce-data-pipeline` (FastAPI -> Kafka -> Spark ->
dbt/Trino medallion pipeline), re-expressed end-to-end as a single Spark
application: DataFrame/SQL transforms, Structured Streaming ingestion, and
transactional MERGE upserts on the lakehouse layer.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, tuned shuffles).
- ``schemas``    StructType contracts for event envelopes + medallion tables
                 (reference: analytics/spark/jobs/silver_*.py).
- ``sources``    Parquet/test-data loaders, JSON event-stream derivation,
                 Kafka source (gated: jars not bundled here).
- ``lake``       Parquet-backed managed tables with atomic overwrite and
                 MERGE upsert semantics (Delta-compatible API; uses
                 delta-spark when importable).
- ``operators``  The §2 operator inventory: dedup, parse, enrich, fact,
                 windows, text analysis, similarity search, multimodal.
- ``functions``  Column-expression helpers shared across operators.
- ``plans``      Physical-plan introspection helpers (pushdown assertions).
- ``streaming``  Structured Streaming wiring: bronze append, foreachBatch
                 silver MERGE, keyed state machines.
- ``quality``    Data-quality assertions (dbt-test parity: not_null, unique,
                 freshness, non-negativity).
- ``queries``    The registry consumed by ``__spark_entry__.py``: every
                 implemented operator exposed as (spark, sf_dir) -> DataFrame
                 plus its DuckDB oracle SQL.
"""

__version__ = "0.1.0"
