"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``ecommerce_data_pipeline_spark.queries``
(the QUERIES/ORACLES registry); this file is pure wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ecommerce_data_pipeline_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the gold minute fact, end-to-end through the
    medallion chain (events → bronze → W1 dedup → from_json silver →
    enrich → paid-only minute agg) on sf0.001."""
    return QUERIES["fct_sales_minute"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-training-data extensions). Column names are aligned with
    ``oracle_sql`` on both sides."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins of every SQL-expressible query. Keys missing here
    (relative to ``queries()``) are non-SQL-expressible operators the
    driver checks rows-only."""
    return dict(ORACLES)
