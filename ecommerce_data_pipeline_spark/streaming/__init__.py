"""Structured Streaming layer (SURVEY.md §2.7, operators S1/S2/S5, ST1-ST5).

Batch and streaming share the exact same transform functions; this package
only adds sources, sinks, triggers, checkpoints and watermarks."""

from ecommerce_data_pipeline_spark.streaming.medallion import (
    run_streaming_pipeline,
    stage_event_files,
    stream_bronze,
    streaming_minute_fact,
)
from ecommerce_data_pipeline_spark.streaming.stateful import stream_fold_states

__all__ = [
    "run_streaming_pipeline",
    "stage_event_files",
    "stream_bronze",
    "stream_fold_states",
    "streaming_minute_fact",
]
