"""Window / sort / limit operators (SURVEY.md §2.5) + event sessionization.

- O1 recency top-k: ORDER BY ts DESC LIMIT k → Spark plans
  TakeOrderedAndProject (per-partition heap + driver merge of k rows), never
  a full sort — the right physical shape at any scale.
- O2 keyset paging: offset/limit over a deterministic sort.
- ST7-as-batch: current state per key = last event by time (row_number).
- Sessionization: gap-based sessions via lag + running sum — the standard
  two-window formulation; one shuffle on the session key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_data_pipeline_spark.functions import epoch_seconds, money_sum


def top_k_recent(df: DataFrame, ts_col: str, k: int = 10) -> DataFrame:
    return df.orderBy(F.col(ts_col).desc()).limit(k)


def paged(df: DataFrame, sort_cols: list[str], offset: int, limit: int) -> DataFrame:
    """Keyset paging (services/catalog/app/api/products.py:20-34). Offset is
    a row_number filter — at scale prefer a WHERE key > last_seen cursor."""
    w = Window.orderBy(*[F.col(c) for c in sort_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )


def current_state(
    df: DataFrame, key_col: str, ts_col: str, tiebreak_col: str
) -> DataFrame:
    """Last event per key — the batch view of the ST7 state machines
    (services/order/app/kafka/consumer.py:52-77): the current status of each
    order/shipment is the latest legal event applied to it."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the user's inter-event
    gap exceeds ``gap_minutes``.

    Output: (user_id, session_id, n_events, session_start, session_end,
    total_value) — session_id is 1-based per user.
    """
    w_user = Window.partitionBy(user_col).orderBy(ts_col)
    gap_sec = gap_minutes * 60
    with_breaks = events.withColumn(
        "__new_session",
        F.when(
            epoch_seconds(F.col(ts_col))
            - epoch_seconds(F.lag(F.col(ts_col)).over(w_user))
            > gap_sec,
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    with_ids = with_breaks.withColumn(
        "session_id",
        F.sum("__new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1,
    )
    return (
        with_ids.groupBy(F.col(user_col).alias("user_id"), "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            money_sum("value").alias("total_value"),
        )
    )
