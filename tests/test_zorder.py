"""Z-order layout: files must be range-compact in EVERY clustered
dimension (the property that makes multi-column data skipping work),
where a single-column sort is compact in one dimension only."""

from __future__ import annotations

import glob
import os

from ecommerce_data_pipeline_spark.operators.zorder import zorder
from ecommerce_data_pipeline_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def _avg_span(path: str, column: str) -> float:
    import pyarrow.parquet as pq

    spans, lo, hi = [], None, None
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None:
            continue
        spans.append(float(fmax - fmin))
        lo = fmin if lo is None else min(lo, fmin)
        hi = fmax if hi is None else max(hi, fmax)
    assert spans, f"no stats for {column}"
    global_span = float(hi - lo) or 1.0
    return (sum(spans) / len(spans)) / global_span


def test_zorder_files_compact_in_both_dims(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "single_sort")
    zorder(orders, ["o_orderkey", "o_custkey"], bits=5, n_files=16).write.mode(
        "overwrite"
    ).parquet(z_path)
    orders.repartitionByRange(16, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.mode("overwrite").parquet(s_path)

    # Single-column sort: perfect on the sort key, useless on the other.
    assert _avg_span(s_path, "o_orderkey") < 0.15
    assert _avg_span(s_path, "o_custkey") > 0.8

    # Z-order: BOTH dimensions well under the global span — each file is a
    # small rectangle, so predicates on either column skip most files.
    assert _avg_span(z_path, "o_orderkey") < 0.5
    assert _avg_span(z_path, "o_custkey") < 0.5


def test_zorder_preserves_rows(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    out = zorder(orders, ["o_orderkey", "o_custkey"], bits=4, n_files=4)
    assert out.count() == orders.count()
    assert set(out.columns) == set(orders.columns)
