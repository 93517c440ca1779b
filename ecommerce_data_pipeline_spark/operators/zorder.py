"""Z-order (Morton-curve) clustering — OPTIMIZE ZORDER BY parity.

Parquet scans skip row groups whose column min/max stats exclude the
pushed predicate. A table sorted on ONE column skips beautifully for that
column and not at all for others; Z-ordering interleaves the bits of
several columns' rank positions so that files are simultaneously
range-clustered on ALL of them — multi-dimensional data skipping, the
same layout Delta's ``OPTIMIZE ... ZORDER BY`` produces.

Implementation (one sampling pass per column + one range shuffle):

1. Per column, sample 2^bits - 1 quantile boundaries (``approxQuantile`` —
   the same sampled-range-boundary scheme Delta's range_partition_id
   uses). Rank-based, so skew and outliers cannot collapse the curve.
2. Bucket id = number of boundaries <= value (a size(filter(...)) over
   the broadcast boundary array literal — ~2^bits comparisons per row,
   fine for a maintenance-window layout job).
3. Interleave the bucket ids' bits into a single Morton key (closed-form
   bit expression — no UDF).
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the key: each
   output file covers a compact Morton range, hence a small min/max
   rectangle in every clustered dimension.

Scale: the driver holds n_cols * 2^bits boundary values (KBs); everything
else is executor-side. Default 6 bits/dim (64 buckets) separates 128 MB
files well into the multi-PB range; raise bits for very wide tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.functions import epoch_seconds


def _bucket_expr(col: Column, boundaries: list[float]) -> Column:
    """Bucket id in [0, len(boundaries)]: count of boundaries <= value."""
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= col))


def morton_key(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each bucket-id column (values in
    [0, 2^bits)) into one long: bit b of column i lands at position
    b * n_cols + i."""
    n = len(bucket_cols)
    key = F.lit(0).cast("long")
    for i, c in enumerate(bucket_cols):
        for b in range(bits):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 6,
    n_files: int | None = None,
) -> DataFrame:
    """Return ``df`` re-clustered on the Morton curve of ``cols``; write
    the result to get Z-ordered files. ``n_files`` sizes the layout
    (default: current shuffle parallelism). Numeric/timestamp columns."""
    n_buckets = 1 << bits

    # Numerics cast straight to double; timestamps go through the NTZ-safe
    # epoch helper (Spark 4 forbids TIMESTAMP_NTZ -> DOUBLE casts).
    def _as_double(c: str) -> Column:
        if df.schema[c].dataType.typeName().startswith("timestamp"):
            return epoch_seconds(F.col(c))
        return F.col(c).cast("double")

    probe = df.select(
        *[_as_double(c).alias(f"__q_{i}") for i, c in enumerate(cols)]
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = probe.stat.approxQuantile(
        [f"__q_{i}" for i in range(len(cols))], probs, 1.0 / (4 * n_buckets)
    )
    buckets = [
        _bucket_expr(_as_double(c), bounds[i])
        for i, c in enumerate(cols)
    ]
    keyed = df.withColumn("__zkey", morton_key(buckets, bits))
    parts = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return (
        keyed.repartitionByRange(int(parts), "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
