"""Skew mitigation and co-located joins — the 100 TB join toolbox.

Two techniques Catalyst does not apply by itself in every case:

1. **Salted join** for a skewed build key that is too big to broadcast:
   AQE's skew-join splitting only kicks in for sort-merge joins whose
   skewed partitions it can subdivide at runtime; salting handles the
   harder shape — a hot key whose rows must all meet the SAME dimension
   row. The probe side scatters each hot key over ``n_salts`` sub-keys
   (deterministic hash of a caller-chosen spread column); the dimension
   side replicates each row ``n_salts`` times (explode over a literal
   sequence — |dim| x n_salts rows, cheap for dimension tables). Join
   output is row-for-row identical to the unsalted join.

2. **Bucketed co-located join**: pre-hash-partition both tables into the
   same bucket count on the join key at WRITE time (`bucketBy` +
   `saveAsTable`); subsequent joins read bucket files as pre-shuffled
   inputs — Spark plans a sort-merge join with NO Exchange on either
   side. At 100 TB this converts every recurring fact-to-fact join on the
   bucket key from a full network shuffle into a local merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    spread_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ dim`` on ``on`` with the hot-key pressure
    spread over ``n_salts`` sub-partitions.

    ``spread_col`` is any probe-side column with per-row variety (an event
    id, offset, ts); the salt is a deterministic hash of it, so the plan —
    and at fixed inputs the row routing — is reproducible. Dimension rows
    are exploded once per salt. Result columns = skewed's + dim's non-key
    columns (same as ``skewed.join(dim, on, how)``).

    Only ``inner`` and ``left`` are supported: the replicated dimension
    side means a right/full outer join would emit one null-padded row per
    UNMATCHED salt replica instead of one per dimension row.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(outer joins would duplicate unmatched dim rows per salt)"
        )
    n = int(n_salts)
    s = skewed.withColumn("__salt", F.pmod(F.hash(F.col(spread_col)), F.lit(n)))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    out = s.join(d, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on the join
    key. Joins between tables bucketed with the SAME column set and bucket
    count skip their exchanges entirely (see plan test). ``path`` makes
    the table external (bucket FILES land there; only metadata stays in
    the catalog) — callers that clean up with DROP TABLE + rmtree."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def skew_profile(df: DataFrame, key: str | Column, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of the total for the ``top``
    heaviest keys — the number you look at before choosing n_salts."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__t"), 4).alias("share"),
        )
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )
