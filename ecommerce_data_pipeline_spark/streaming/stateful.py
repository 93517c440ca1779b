"""Custom stateful streaming operator: keyed state machines on the state
store (``applyInPandasWithState``).

The batch formulation of ST7 (operators/state.py:fold_state_events) folds
the FULL history per key every run. On an unbounded stream that recompute
grows without bound; the streaming-native shape keeps (rank, first_ts,
n_events) per key in Spark's checkpointed state store and folds each
micro-batch's Arrow batches into it — O(batch) work per trigger, exactly
the consumer loop the reference runs row-at-a-time
(services/order/app/kafka/consumer.py:52-77), but vectorized per group
and with fault-tolerant state.

Semantics are identical to fold_state_events (monotone ranks, earliest
event at the final rank wins, illegal states ignored) — asserted by the
streaming==batch test. Output mode is ``update``: each key emits its
refreshed state once per micro-batch it appears in; n_events is monotone
per key, so downstream consumers can keep the max-n_events row per key.

Scale: state is a fixed-width tuple per key, hash-partitioned by the
group key across executors (RocksDB-backed at real deployments); no
per-key Python loop crosses micro-batch boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from ecommerce_data_pipeline_spark.operators.state import ORDER_STATE_RANKS


def stream_fold_states(
    events: DataFrame,
    ranks: dict[str, int] = ORDER_STATE_RANKS,
    key_col: str = "order_id",
    state_col: str = "state",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Streaming ST7: fold a (key, state, ts) event stream into current
    state via the state store. ``events`` must be a streaming DataFrame.

    Output per update: (key, state, state_ts, n_events).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    rank_of = dict(ranks)
    name_of = {v: k for k, v in ranks.items()}
    key_type = dict(events.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, state string, state_ts timestamp, n_events long"
    )
    state_schema = "rank int, ts_us long, n_events long"

    def fold(key, pdfs, state: GroupState) -> Iterator:
        import pandas as pd

        if state.exists:
            rank, ts_us, n = state.get
        else:
            rank, ts_us, n = -1, None, 0
        for pdf in pdfs:
            legal = pdf[pdf[state_col].isin(rank_of)]
            for s, t in zip(legal[state_col], legal[ts_col]):
                r = rank_of[s]
                t_us = int(t.value // 1000)  # pandas ns ticks -> micros
                n += 1
                if r > rank:
                    rank, ts_us = r, t_us
                elif r == rank and (ts_us is None or t_us < ts_us):
                    ts_us = t_us  # idempotent-skip: earliest event at rank
        state.update((rank, ts_us, n))
        if rank < 0:
            return iter(())  # only illegal events so far: emit nothing
        row = pd.DataFrame(
            {
                key_col: [key[0]],
                "state": [name_of[rank]],
                "state_ts": [pd.Timestamp(ts_us * 1000)],
                "n_events": [n],
            }
        )
        return iter([row])

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
