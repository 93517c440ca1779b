"""Keyed event-state machines (operator ST7, SURVEY.md §2.7).

The reference folds events into per-key state row-at-a-time in Python
consumers with legal-transition guards:

- order: CREATED → PAID on ``payment.succeeded``, idempotent skip if already
  PAID (services/order/app/kafka/consumer.py:52-77);
- shipment: PENDING_PAYMENT → READY_TO_SHIP → DISPATCHED, illegal
  transitions rejected (services/shipping/app/kafka/consumer.py:100-141).

Both machines are *monotone*: states form a total order and legal
transitions only move forward. A monotone fold needs no sequential replay —
the final state is simply the maximum state rank observed per key, and the
transition timestamp is the earliest event that reached that rank (the
consumer's idempotent-skip means later same-state events don't update).
That turns per-key state into ONE hash aggregation — embarrassingly
scalable, no Python state loop, no ordering shuffle.

For streaming, ``conditional_state_merge`` applies the same guard as a
MERGE: an update wins only if it advances the rank (Delta
``whenMatchedUpdate(condition=...)`` shape) — replayed/duplicate micro-
batches are naturally idempotent (ST3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions import epoch_micros
from ecommerce_data_pipeline_spark.lake import ParquetTable

ORDER_STATE_RANKS = {"CREATED": 0, "PAID": 1}
SHIPMENT_STATE_RANKS = {"PENDING_PAYMENT": 0, "READY_TO_SHIP": 1, "DISPATCHED": 2}


def _rank_col(state_col, ranks: dict[str, int]):
    expr = F.lit(None).cast("int")
    for name, rank in ranks.items():
        expr = F.when(state_col == name, F.lit(rank)).otherwise(expr)
    return expr


def fold_state_events(
    events: DataFrame,
    ranks: dict[str, int] = ORDER_STATE_RANKS,
    key_col: str = "order_id",
    state_col: str = "state",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Batch fold of a (key, state, ts) event stream into current state.

    Unknown states (not in ``ranks``) are illegal and ignored — the
    consumer's guard. Output: (key, state, state_ts, n_events) where
    state_ts is the FIRST event that reached the final rank.
    """
    ranked = events.select(
        F.col(key_col),
        _rank_col(F.col(state_col), ranks).alias("__rank"),
        F.col(ts_col).alias("__ts"),
    ).filter(F.col("__rank").isNotNull())
    # Single-pass fold: lexicographic max of (rank, -ts) selects the
    # highest rank and, within it, the EARLIEST event — one hash
    # aggregation with map-side partials, one shuffle, no second pass or
    # self-join. -unix_micros keeps the struct-max exact to the microsecond.
    agg = ranked.groupBy(key_col).agg(
        F.max(
            F.struct(
                F.col("__rank").alias("r"),
                (-epoch_micros("__ts")).alias("neg_us"),
            )
        ).alias("__m"),
        F.count(F.lit(1)).alias("n_events"),
    )
    inv = {v: k for k, v in ranks.items()}
    state_expr = F.lit(None).cast("string")
    for rank, name in inv.items():
        state_expr = F.when(F.col("__m.r") == rank, F.lit(name)).otherwise(state_expr)
    return agg.select(
        F.col(key_col),
        state_expr.alias("state"),
        F.timestamp_micros(-F.col("__m.neg_us")).alias("state_ts"),
        "n_events",
    )


def conditional_state_merge(
    spark: SparkSession,
    table: ParquetTable,
    updates: DataFrame,
    ranks: dict[str, int] = ORDER_STATE_RANKS,
    key_col: str = "order_id",
) -> None:
    """Streaming-side ST7: MERGE state updates with the legal-transition
    guard — an update applies only when it advances the state rank
    (whenMatchedUpdate(condition="new.rank > old.rank") shape). New keys
    insert; regressions and replays are no-ops (ST3 replay tolerance).

    ``updates`` must be pre-folded to one row per key (fold_state_events).
    """
    if not table.exists():
        table.overwrite(updates)
        return
    current = table.read(spark).select(
        F.col(key_col).alias("__k"),
        _rank_col(F.col("state"), ranks).alias("__cur_rank"),
    )
    advancing = (
        updates.join(current, updates[key_col] == current["__k"], "left")
        .filter(
            F.col("__cur_rank").isNull()
            | (_rank_col(F.col("state"), ranks) > F.col("__cur_rank"))
        )
        .drop("__k", "__cur_rank")
    )
    table.merge(spark, advancing, keys=[key_col])


def scd2_collapse(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "state",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """SCD Type-2 history from a state-event stream (`dbt snapshot`
    semantics): consecutive duplicate states collapse; each state CHANGE
    opens an interval [valid_from, valid_to); the open interval is
    flagged current. One shuffle on the key; the change-detect lag and
    interval-close lead share one sort.
    Output: (key, state, valid_from, valid_to, is_current)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    changes = (
        events.select(
            F.col(key_col),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            F.col(order_col).alias("__ord"),
            F.lag(state_col).over(w).alias("__prev"),
        )
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("state")))
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from", "__ord")
    return (
        changes.select(
            key_col,
            "state",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_apply(
    history: DataFrame,
    new_events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "state",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Incrementally fold a batch of new state events into an existing
    SCD2 history, touching ONLY the affected keys — the write-side twin
    of :func:`scd2_collapse` (a dbt-snapshot run against a batch).

    Per affected key: its open (is_current) row is re-expressed as a
    pseudo-event at its own valid_from and re-collapsed together with the
    batch (so a batch state equal to the open state merges into the open
    interval instead of opening a duplicate one); its closed rows pass
    through untouched, as do entire unaffected keys.

    Invariant (tested): apply(batch₂, apply(batch₁, ∅)) ≡ collapse(batch₁∪batch₂).

    Scale: the batch and the open-row slice are both O(affected keys) —
    the closed history (the bulk at 100 TB) moves through an untouched
    pass-through branch; with the lake's partition-pruned MERGE this is
    an O(batch) write, never a history rewrite.
    """
    affected = new_events.select(F.col(key_col)).distinct()
    open_rows = history.filter(F.col("is_current")).join(affected, key_col)
    closed_rows = history.filter(~F.col("is_current"))
    untouched_open = history.filter(F.col("is_current")).join(
        affected, key_col, "left_anti"
    )

    # Open rows become pseudo-events ordered BEFORE any batch event at the
    # same timestamp (order key -1: a real stream's order ids are
    # non-negative), so the existing interval anchors the re-collapse.
    pseudo = open_rows.select(
        F.col(key_col),
        F.col("state").alias(state_col),
        F.col("valid_from").alias(ts_col),
        F.lit(-1).cast("long").alias(order_col),
    )
    batch = new_events.select(
        F.col(key_col),
        F.col(state_col),
        F.col(ts_col),
        F.col(order_col).cast("long"),
    )
    recollapsed = scd2_collapse(
        pseudo.unionByName(batch),
        key_col=key_col,
        state_col=state_col,
        ts_col=ts_col,
        order_col=order_col,
    )
    return closed_rows.unionByName(untouched_open).unionByName(recollapsed)
