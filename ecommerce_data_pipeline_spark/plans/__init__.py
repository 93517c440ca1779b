"""Physical-plan inspection helpers (the "check the plan" tooling promised
by parse.py / sources/parquet.py docstrings).

These make scale claims testable: a query that is supposed to push its
filter into the parquet scan, prune columns, or stay inside whole-stage
codegen can assert it — in tests and in ad-hoc tuning sessions — instead of
hoping Catalyst did the right thing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain(mode) prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def scan_report(df: DataFrame) -> list[dict]:
    """One dict per file scan in the plan (parquet/orc/csv/json/text):
    pushed filters + read schema.

    Lets callers assert predicate pushdown ('PushedFilters: [...IsNotNull...]')
    and column pruning (ReadSchema contains only needed fields).
    """
    text = explain_string(df, "formatted")
    scans = []
    blocks = re.split(r"\n\n", text)
    for block in blocks:
        # Only the per-node detail blocks (the header tree also mentions
        # "Scan <format>" but carries no scan metadata).
        if (
            not re.search(r"Scan (parquet|orc|csv|json|text)", block)
            or "ReadSchema" not in block
        ):
            continue
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: (.+)", block)
        location = re.search(r"Location: .*?\[([^\]]*)\]", block)
        scans.append(
            {
                "pushed_filters": (
                    re.findall(r"\w+\([^()]*\)", pushed.group(1)) if pushed else []
                ),
                "read_schema": schema.group(1).strip() if schema else "",
                "location": location.group(1) if location else "",
            }
        )
    return scans


def codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans in the FINAL plan.

    An AdaptiveSparkPlan only settles codegen after execution, and a
    ``df.write`` spawns a SEPARATE execution — so this executes the frame's
    own plan (rdd.count) and then reads its finalized executedPlan.
    Plan-inspection helper for tests/tuning, not a production path (the
    rdd hop serializes rows to Python)."""
    df.rdd.count()
    final = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # Codegen spans appear as '*(N)' operator prefixes in the final plan.
    ids = set(re.findall(r"\*\((\d+)\)", final))
    return len(ids)


def assert_pushed(df: DataFrame, fragment: str) -> None:
    """Assert some file scan pushed a filter containing ``fragment``."""
    scans = scan_report(df)
    for s in scans:
        if any(fragment in f for f in s["pushed_filters"]):
            return
    raise AssertionError(
        f"no scan pushed a filter containing {fragment!r}; scans: {scans}"
    )
