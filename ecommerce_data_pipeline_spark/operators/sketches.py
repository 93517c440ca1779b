"""Mergeable-sketch rollups — incremental distinct counting at 100 TB.

Exact COUNT(DISTINCT) over an incrementally-maintained table forces a
full rescan per refresh (distinct does not decompose over increments).
The production pattern is a SKETCH TABLE: store a fixed-width mergeable
sketch (HyperLogLog here, via Spark's Apache DataSketches bindings) per
partition grain; refreshing a day touches one row, and any rollup window
is a cheap union of sketches — no base-table rescan, shuffle volume
independent of key cardinality.

`daily_user_sketches` is the incremental build (one row per day,
`hll_sketch_agg` binary); `merge_sketches` is the read path
(`hll_union_agg` + estimate). The union is associative/commutative —
asserted by the half-vs-full test — which is exactly the property that
makes the sketch table mergeable across increments, partitions and
clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 14  # ~0.8% relative standard error


def daily_user_sketches(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One row per day: (day, user_sketch binary, n_events). The
    incremental-build side: a new day's data produces one new row; MERGE
    it by day key and history never gets rescanned."""
    return (
        events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(
            F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("user_sketch"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def merge_sketches(
    sketches: DataFrame,
    sketch_col: str = "user_sketch",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Roll any set of sketch rows up to one distinct-count estimate.
    Filter the sketch table to a window first for windowed rollups."""
    return sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("approx_distinct"),
        F.sum("n_events").alias("n_events"),
    )


def cms_table(
    items: DataFrame,
    item_col: str = "token",
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Count-Min sketch materialized AS A DATAFRAME: (i, bucket, n) —
    depth×width counters, engine-portable (md5-derived hash rows rather
    than an opaque binary), and mergeable by construction: union two
    sketch tables and re-sum the buckets.

    The frequency twin of the HLL sketch table above: heavy-hitter
    queries over an unbounded token stream keep O(depth×width) state
    (32k rows at the defaults — FIXED, regardless of vocabulary size)
    where an exact count table keeps O(vocab). Build is one map-side-
    combinable groupBy over the exploded hash rows; estimates
    overcount only (min over depth rows bounds the collision error by
    εN with ε ≈ e/width).
    """
    from ecommerce_data_pipeline_spark.operators.dedup import _md5_long

    buckets = F.array(
        *[
            (
                _md5_long(
                    F.concat(F.col(item_col), F.lit(f":{i}"))
                )
                % width
            )
            for i in range(depth)
        ]
    )
    return (
        items.select(F.posexplode(buckets).alias("i", "bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_lookup(
    cms: DataFrame,
    probes: DataFrame,
    item_col: str = "token",
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Point-estimate probe items against a cms_table: min over the
    depth counters. The sketch table is depth×width rows — broadcast it;
    the probe side never shuffles."""
    from ecommerce_data_pipeline_spark.operators.dedup import _md5_long

    buckets = F.array(
        *[
            (
                _md5_long(
                    F.concat(F.col(item_col), F.lit(f":{i}"))
                )
                % width
            )
            for i in range(depth)
        ]
    )
    exploded = probes.select(
        "*", F.posexplode(buckets).alias("i", "bucket")
    )
    others = [c for c in probes.columns]
    return (
        exploded.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy(*others)
        .agg(F.min("n").alias("cms_est"))
    )
