"""Parquet scan source (operator S3/S4 in SURVEY.md §2.1).

The reference reads Delta tables by name through a Hive metastore
(silver_orders.py:44); here tables are path-addressed parquet under an
``sf_dir``. Reads are plain ``spark.read.parquet`` so Catalyst keeps full
pushdown: filters and column pruning reach the scan (check with
``plans.scan_report``), and partition-pruning applies automatically to any
directory-partitioned table written by ``lake.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as TIMESTAMP(NANOS) in the driver test data. Spark rejects
# nanos parquet outright (PARQUET_TYPE_ILLEGAL) unless read as long via
# spark.sql.legacy.parquet.nanosAsLong; we then convert ns→µs with *integer*
# division (double division corrupts microseconds at ~1.7e18 ns).
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test-data table. Single parquet file per table at small SF;
    at 100 TB the same call reads a multi-thousand-file dataset and the
    parallelism comes from spark.sql.files.maxPartitionBytes splits.

    The resolved scan plan is memoized PER SESSION (r16 optimization):
    every ``spark.read.parquet`` pays a driver-side footer schema
    inference + file listing (~130 ms measured at sf0.1 — guide §5's
    "the driver should do almost no data work" applies to metadata too),
    and the source tables are immutable inputs, so re-inferring their
    schema on every one of the registry's ~600 per-bench calls is pure
    waste. On a cluster this metadata lives in the metastore and is
    fetched once per query *from a catalog*, not re-derived from file
    footers — the memo reproduces exactly that behavior. The cache holds
    lazy DataFrames (unresolved scans), never rows: every action still
    reads the parquet files in full, and the cache dict lives on the
    session object so it dies with the session and cannot bleed between
    sessions or alter what any query computes."""
    cache: dict = spark.__dict__.setdefault("_sg_table_plan_cache", {})
    key = (os.path.abspath(sf_dir), name)
    hit = cache.get(key)
    if hit is not None:
        return hit
    # Set here (runtime SQL conf), not only in session.py: the driver's
    # verify harness passes its own SparkSession that did not go through
    # our factory. UTC likewise — functions.epoch_seconds/epoch_micros
    # reinterpret NTZ under the session zone, and oracle parity (DuckDB
    # naive timestamps) requires that zone to be UTC regardless of the
    # host default.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every table as a temp view so spark.sql() serves the same
    surface Trino serves in the reference (README.md:154-190)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
