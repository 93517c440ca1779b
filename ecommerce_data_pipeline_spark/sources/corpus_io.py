"""JSONL corpus interchange: sharded writer + schema-enforced reader.

JSON-lines is the de-facto interchange format for LLM training corpora
(one document object per line, gzip-sharded in the wild — C4, The Pile,
RedPajama, Dolma all ship this shape), so an engine that curates training
data must read and write it losslessly, not just parquet. Spark's native
json source does the heavy lifting; this module pins the contract:

- **Writer**: explicit shard count (one task → one ``part-*.json`` file,
  the unit downstream loaders parallelize over), optional gzip codec.
- **Reader**: explicit schema (NEVER inferSchema on a 100 TB corpus — a
  schema-inference pass is a full extra scan), PERMISSIVE mode with a
  ``_corrupt_record`` column so malformed lines quarantine instead of
  killing the job (the same quarantine discipline as events_quarantine).

Reference analogue: the consumers' JSON envelope contract
(docs/events.md:5-12) — tolerate-and-quarantine, never crash on a bad
payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def write_corpus_jsonl(
    df: DataFrame, path: str, n_shards: int = 32, compression: str | None = None
) -> None:
    """Write ``df`` as ``n_shards`` JSON-lines files (optionally gzipped).

    Round-robin repartition so shards are size-balanced regardless of the
    upstream partitioning — shard count, not input layout, is the knob a
    downstream loader's parallelism keys off.
    """
    writer = df.repartition(n_shards).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_corpus_jsonl(
    spark: SparkSession, path: str, schema: StructType = DOCUMENTS_JSONL_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): schema-enforced JSONL read with corrupt-line
    capture. ``good`` carries exactly ``schema``'s columns; ``quarantine``
    is (raw_line) for every unparseable input line.

    PERMISSIVE + columnNameOfCorruptRecord is the scale-safe posture: one
    syntactically broken line in shard 48k of a crawl dump must cost one
    quarantine row, not the job. Spark refuses plans whose only referenced
    column is the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the parsed
    frame is cached here — Spark's own documented workaround, and the
    right call anyway when both splits get consumed (one json parse, not
    two).
    """
    raw = (
        spark.read.schema(
            StructType(
                schema.fields + [StructField("_corrupt_record", StringType())]
            )
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine
