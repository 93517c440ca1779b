"""Round-9 additions: the oracle tz-discipline guards (the r8
``streaming_trending_topk`` red's bug class), plus tests for the new
operators registered this round.
"""

from __future__ import annotations

import os
import re
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_correctness import dtype_mismatches  # noqa: E402


# ---------------------------------------------------------------------------
# Oracle tz discipline: DuckDB to_timestamp() returns TIMESTAMP WITH TIME
# ZONE while every Spark query here collects naive timestamps, so a bare
# to_timestamp( in any oracle is a driver schema failure waiting to happen
# (CORRECTNESS_r08.json: streaming_trending_topk). Windowed oracles must use
# naive make_timestamp(); a legit epoch-seconds use must be wrapped in
# CAST(... AS TIMESTAMP) and added to the allowlist below with a comment.
# ---------------------------------------------------------------------------

_TO_TIMESTAMP_ALLOWLIST: set[str] = set()


def test_no_bare_to_timestamp_in_any_oracle():
    from ecommerce_data_pipeline_spark.queries import ORACLES

    offenders = []
    for name, sql in ORACLES.items():
        if name in _TO_TIMESTAMP_ALLOWLIST:
            continue
        # Strip CAST(to_timestamp(...) AS TIMESTAMP)-wrapped uses: the CAST
        # back to naive TIMESTAMP is exactly the discipline we require.
        stripped = re.sub(
            r"CAST\s*\(\s*to_timestamp\b.*?AS\s+TIMESTAMP\s*\)",
            "",
            sql,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if re.search(r"\bto_timestamp\s*\(", stripped, re.IGNORECASE):
            offenders.append(name)
    assert not offenders, (
        f"oracles using bare to_timestamp() (returns TIMESTAMPTZ; driver "
        f"schema check fails vs Spark's naive timestamps): {offenders} — "
        f"use make_timestamp(epoch_micros) or CAST(... AS TIMESTAMP)"
    )


def test_verifier_fails_tz_aware_vs_naive():
    naive = pd.DataFrame(
        {"w": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:15:00"])}
    )
    aware = pd.DataFrame({"w": naive["w"].dt.tz_localize("UTC")})
    kind_bad, tz_bad = dtype_mismatches(naive, aware)
    assert tz_bad == ["w"] and not kind_bad
    # symmetric
    assert dtype_mismatches(aware, naive)[1] == ["w"]
    # both naive / both aware: fine
    assert dtype_mismatches(naive, naive.copy()) == ([], [])
    assert dtype_mismatches(aware, aware.copy()) == ([], [])


def test_verifier_fails_int_vs_float():
    a = pd.DataFrame({"n": [1, 2]})
    b = pd.DataFrame({"n": [1.0, 2.0]})
    kind_bad, tz_bad = dtype_mismatches(a, b)
    assert kind_bad == ["n"] and not tz_bad
