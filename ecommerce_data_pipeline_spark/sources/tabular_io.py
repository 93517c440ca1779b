"""Pipe-delimited ``.tbl`` interchange — TPC-H dbgen's native format.

Relational benchmark data ships as headerless pipe-delimited text (dbgen
emits ``orders.tbl`` etc.), and plenty of warehouse landing zones still
speak delimited text; an engine claiming drop-in coverage must ingest it
with the same discipline as the JSONL corpus path (sources/corpus_io.py):
schema PINNED (no inferSchema scan), PERMISSIVE parse, malformed lines
quarantined instead of failing the job.

Timestamps travel as ``yyyy-MM-dd HH:mm:ss`` on both directions — the
fixture's timestamps are second-aligned, and the certified round-trip
query (``orders_tbl_roundtrip``) would hash-mismatch its parquet oracle
if the format ever lost a component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"


def write_tbl(df: DataFrame, path: str, n_shards: int = 32) -> None:
    """Write ``df`` as ``n_shards`` headerless pipe-delimited files."""
    (
        df.repartition(n_shards)
        .write.mode("overwrite")
        .option("sep", "|")
        .option("header", "false")
        .option("timestampFormat", TS_FORMAT)
        .csv(path)
    )


def read_tbl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): schema-pinned pipe-delimited read.

    Same contract as read_corpus_jsonl — PERMISSIVE + corrupt-record
    capture, parsed frame cached (Spark rejects plans projecting ONLY the
    internal corrupt column), good carries exactly ``schema``'s columns.
    """
    raw = (
        spark.read.schema(
            StructType(
                schema.fields + [StructField("_corrupt_record", StringType())]
            )
        )
        .option("sep", "|")
        .option("header", "false")
        .option("timestampFormat", TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine
