"""Local stand-in for the driver's correctness gate.

Runs every registered query at a given sf_dir on Spark AND its DuckDB
oracle, compares row count + order-insensitive values, prints a table.

Usage: python tools/verify_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

# Make the repo importable no matter where the tool is launched from
# (python tools/verify_correctness.py puts tools/ on sys.path, not the root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo else v
    if type(v).__name__ == "date":  # datetime.date → midnight Timestamp
        return pd.Timestamp(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def dtype_mismatches(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    """Columns whose dtypes would fail the DRIVER's schema/hash check even
    though the order-insensitive value comparison here would pass.

    Two classes, both hard failures:
    - int-vs-float (DuckDB HUGEINT/DOUBLE vs Spark int64 serializes
      differently even when values are numerically equal);
    - tz-aware vs naive timestamp (DuckDB TIMESTAMPTZ, e.g. from
      ``to_timestamp()``, vs Spark's naive collection — the r8
      ``streaming_trending_topk`` red). _norm_cell's ``tz_localize(None)``
      would mask this, so it must be caught at the dtype level.
    """
    kind_bad = [
        c
        for c in spark_pdf.columns
        if {spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind} == {"i", "f"}
        or {spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind} == {"u", "f"}
    ]
    tz_bad = [
        c
        for c in spark_pdf.columns
        if spark_pdf[c].dtype.kind == "M"
        and oracle_pdf[c].dtype.kind == "M"
        and (getattr(spark_pdf[c].dtype, "tz", None) is None)
        != (getattr(oracle_pdf[c].dtype, "tz", None) is None)
    ]
    return kind_bad, tz_bad


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from ecommerce_data_pipeline_spark.queries import ORACLES, QUERIES
    from ecommerce_data_pipeline_spark.session import get_spark
    from ecommerce_data_pipeline_spark.sources.parquet import TABLES

    if os.environ.get("SPARK_GRAFT_PLAIN_SESSION"):
        # Driver simulation: a bare session that did NOT go through our
        # factory — catches any query that silently relies on a
        # session.py-only conf (the driver's harness builds its own).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("verify-plain")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        sql = ORACLES.get(name)
        if sql is None:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        try:
            oracle_pdf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if len(spark_pdf) != len(oracle_pdf):
            print(
                f"FAIL  {name}: rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
            )
            failures += 1
            continue
        if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
            print(
                f"FAIL  {name}: columns spark={sorted(spark_pdf.columns)} "
                f"oracle={sorted(oracle_pdf.columns)}"
            )
            failures += 1
            continue
        kind_bad, tz_bad = dtype_mismatches(spark_pdf, oracle_pdf)
        if kind_bad:
            print(
                f"FAIL  {name}: int-vs-float dtype mismatch on {kind_bad} "
                f"(driver hash would differ — CAST the oracle column)"
            )
            failures += 1
            continue
        if tz_bad:
            print(
                f"FAIL  {name}: tz-aware vs naive timestamp on {tz_bad} "
                f"(driver schema check would fail — use naive "
                f"make_timestamp()/CAST ... AS TIMESTAMP in the oracle)"
            )
            failures += 1
            continue
        a, b = normalize(spark_pdf), normalize(oracle_pdf)
        if a != b:
            bad = next(
                (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
            )
            print(f"FAIL  {name}: values differ at sorted row {bad[0]}:")
            print(f"      spark : {bad[1]}")
            print(f"      oracle: {bad[2]}")
            failures += 1
            continue
        print(f"PASS  {name}: {len(spark_pdf)} rows [{t_spark:.1f}s]")

    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
