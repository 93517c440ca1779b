from __future__ import annotations

import datetime as dt

import pytest

from ecommerce_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def sf_dir_factory(spark, tmp_path):
    """Build a throwaway sf_dir with the given tables (documents rows are
    (doc_id, text, lang, source, n_chars) tuples) so registry query
    callables can run on toy fixtures."""

    def make(**tables):
        schemas = {
            "documents": (
                "doc_id long, text string, lang string, source string, "
                "n_chars long"
            ),
            "embeddings": "vec_id long, embedding array<float>, label int",
            "events": (
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ),
        }
        for name, rows in tables.items():
            spark.createDataFrame(rows, schemas[name]).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{tmp_path}/{name}.parquet")
        return str(tmp_path)

    return make


@pytest.fixture()
def kafka_rows(spark):
    """Literal bronze-shaped rows: builder for operator goldens."""

    def make(rows):
        return spark.createDataFrame(
            rows,
            "raw_key string, raw_value string, topic string, partition int, "
            "offset long, kafka_timestamp timestamp, timestampType int",
        )

    return make
