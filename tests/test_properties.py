"""Property-based tests (hypothesis): invariants that goldens can't sweep —
money-sum exactness over arbitrary 2dp amounts, dedup idempotency/uniqueness
over arbitrary redelivery patterns."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from ecommerce_data_pipeline_spark.functions import money_sum
from ecommerce_data_pipeline_spark.operators.dedup import kafka_identity_dedup

# 2dp dollar amounts as the reference carries them (double dollars from
# integer cents).
amounts = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0),
    min_size=1,
    max_size=30,
)


@settings(max_examples=20, deadline=None)
@given(amounts)
def test_money_sum_matches_decimal_arithmetic(spark, vals):
    """money_sum == exact Decimal sum for any 2dp inputs in any order —
    the property that makes gmv bit-stable across partial-agg orders."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(money_sum("v").alias("s")).first()["s"]
    want = float(sum(Decimal(str(v)) for v in vals))
    assert got == want


identities = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # partition
        st.integers(min_value=0, max_value=5),   # offset
        st.integers(min_value=0, max_value=3),   # redelivery tiebreak (ts sec)
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(identities)
def test_kafka_dedup_unique_and_idempotent(spark, rows):
    """For any redelivery pattern: output identities are unique, the kept
    row is the max-timestamp one, and dedup(dedup(x)) == dedup(x)."""
    import datetime as dt

    data = [
        (
            str(i),
            f"v{p}-{o}-{s}",
            "t",
            p,
            o,
            dt.datetime(2024, 1, 1, 0, 0, s),
            0,
        )
        for i, (p, o, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "raw_key string, raw_value string, topic string, partition int, "
        "offset long, kafka_timestamp timestamp, timestampType int",
    )
    out = kafka_identity_dedup(df)
    collected = out.collect()
    idents = [(r["topic"], r["partition"], r["offset"]) for r in collected]
    assert len(idents) == len(set(idents)) == len({(p, o) for p, o, _ in rows})
    # max-timestamp row wins per identity
    best = {}
    for p, o, s in rows:
        best[(p, o)] = max(best.get((p, o), -1), s)
    for r in collected:
        assert r["kafka_timestamp"].second == best[(r["partition"], r["offset"])]
    # idempotent
    assert kafka_identity_dedup(out).count() == len(collected)
