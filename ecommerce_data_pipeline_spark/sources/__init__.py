"""Sources: test-data parquet loaders, derived event streams, Kafka (gated)."""

from ecommerce_data_pipeline_spark.sources.parquet import (  # noqa: F401
    TABLES,
    load_table,
    register_views,
)
