"""Kafka connector wiring (operators S1/S2/S11).

The reference consumes two topics with the Spark Kafka source
(bronze_orders_raw.py:37-43: ``format("kafka")``, ``subscribe``,
``startingOffsets=earliest``, ``failOnDataLoss=false``) and produces with a
keyed JSON envelope (services/order/app/kafka/producer.py:60-125). The
spark-sql-kafka connector jar is not bundled in this sandbox, so the
pipeline runs against file-stream stand-ins — but the REAL wiring lives
here, is plan-constructed (never silently skipped) by tests, and swaps in by
passing these builders where ``_read_stream``/``to_kafka_shape`` run today.

Everything is option-dict driven so tests can assert the exact contract the
reference sets, independent of whether the connector can actually ``load()``
in the current environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader

# Column contract of Spark's Kafka source (what ``load()`` yields) — the
# bronze projection accepts exactly this shape (operators/parse.py:33-66
# handles binary key/value + the broker timestamp columns).
KAFKA_SOURCE_COLUMNS = [
    "key",  # binary
    "value",  # binary
    "topic",  # string
    "partition",  # int
    "offset",  # long
    "timestamp",  # timestamp
    "timestampType",  # int
]


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The consumer option set the reference pins (bronze_orders_raw.py:37-43)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> DataStreamReader:
    """S1/S2: build the Kafka streaming source reader.

    Plan construction only — ``.load()`` additionally needs the
    spark-sql-kafka-0-10 connector jar on the classpath. The result feeds
    ``operators.parse.bronze_projection`` unchanged (it casts the binary
    key/value and renames ``timestamp`` → ``kafka_timestamp``).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topic, starting_offsets, fail_on_data_loss
    ).items():
        reader = reader.option(k, v)
    return reader


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def kafka_batch_writer(
    encoded: DataFrame, bootstrap_servers: str, topic: str
):
    """S11 producer sink: point an already Kafka-shaped frame (the
    ``to_kafka_shape`` output: key STRING, value STRING) at a topic.
    Returns the configured DataFrameWriter; ``.save()`` needs the jar."""
    writer = encoded.write.format("kafka")
    for k, v in kafka_sink_options(bootstrap_servers, topic).items():
        writer = writer.option(k, v)
    return writer


def kafka_stream_writer(
    encoded: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str
):
    """Streaming S11: checkpointed exactly-once-ish produce of a streaming
    frame. Returns the configured DataStreamWriter; ``.start()`` needs the
    jar."""
    writer = (
        encoded.writeStream.format("kafka")
        .option("checkpointLocation", checkpoint)
    )
    for k, v in kafka_sink_options(bootstrap_servers, topic).items():
        writer = writer.option(k, v)
    return writer


def kafka_source_fixture(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """A static frame with the EXACT Kafka source schema (binary key/value),
    for proving downstream operators accept connector output unmodified.
    ``rows`` are (key str, value str, topic, partition, offset, ts)."""
    df = spark.createDataFrame(
        rows,
        "key string, value string, topic string, partition int, offset long, "
        "timestamp timestamp",
    )
    return df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.lit(0).alias("timestampType"),
    )
