"""Join-strategy advisor — the measure-then-prescribe layer over the
join toolbox.

The repo carries four join tools beyond the planner's default shuffle
join, each certified by its own registry query: broadcast (AQE picks it
when it can SEE the size), salting (`operators/skew.py:salted_join`),
bucketed co-location (`skew.py:write_bucketed`), and Bloom pruning
(`operators/bloom.py`). Choosing between them is a statistics question —
exactly the numbers `column_profile`/`skew_profile` measure. This module
runs the bounded measurement (counts, key NDVs, hottest-key share — one
aggregate per side plus one top-1 skew probe; never a data scan beyond
that) and prescribes:

1. ``broadcast``  — build side small enough to ship to every executor.
2. ``salted``     — hottest probe key exceeds the skew threshold, so one
                    reducer would own share×|probe| rows; AQE's skew
                    split can't fix it when every hot row must meet the
                    SAME dim row.
3. ``bloom_prune``— build side too big to broadcast but its key set is
                    far smaller than the probe's (a filtered dimension):
                    prune the probe before its shuffle.
4. ``shuffle``    — comparable sides, no skew: the planner's sort-merge
                    join is already right. With ``recurring=True`` the
                    verdict upgrades to ``bucketed`` — pay the shuffle
                    once at write time (`write_bucketed`).

This is what a cost-based optimizer does with ANALYZE statistics
(Spark's CBO + `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`); the
explicit operator exists because at 100 TB the stats are a deliberate,
incremental artifact (see fileindex/profile) rather than an implicit
planner cache — and because salting/Bloom aren't strategies Catalyst
will ever pick on its own.

Determinism: counts are exact; NDVs use HyperLogLog++
(`approx_count_distinct`) whose register-max merge is order-insensitive,
so the verdict is stable for fixed inputs regardless of partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class JoinAdvice:
    strategy: str  # broadcast | salted | bloom_prune | bucketed | shuffle
    reason: str
    probe_rows: int
    build_rows: int
    probe_key_ndv: int
    build_key_ndv: int
    top_key_share: float
    suggested_n_salts: int | None = None


def advise_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    broadcast_rows: int = 1_000_000,
    skew_share: float = 0.05,
    bloom_ndv_ratio: float = 0.5,
    recurring: bool = False,
    how: str = "inner",
) -> JoinAdvice:
    """Measure both sides and prescribe a join strategy.

    Thresholds (all overridable): ``broadcast_rows`` approximates the
    10 MB-class autoBroadcast budget in rows; ``skew_share`` is the
    hottest-key fraction above which one reducer owns the join;
    ``bloom_ndv_ratio`` is the build/probe key-NDV ratio below which
    Bloom pruning pays (the filtered-dimension shape). The measurement
    is two single-pass aggregates + one top-1 key probe — bounded work,
    run it once and cache the advice next to the table like any other
    statistic.

    ``how`` is the INTENDED join type and changes what "skewed" means
    (ADVICE r14): for inner/semi joins an equi-join's isnotnull pushdown
    drops NULL-key probe rows before the shuffle, so the skew probe
    excludes them and the share denominator is the NON-NULL row count.
    For outer joins (the salted path supports LEFT) null-key rows DO
    reach the shuffle and all hash to ONE reducer — the NULL group is
    counted as a skew candidate and the denominator is all rows. Advice
    is therefore per (tables, join type); re-advise if the type changes."""
    # Inner-like = the PROBE side is not preserved, so its null-key rows
    # can be (and are) filtered before the shuffle. That includes RIGHT
    # outer joins — they preserve the build side only. NOT inner-like:
    # left/full outer (probe rows preserved, nulls reach the shuffle)
    # and anti joins (a left_anti must keep null-key probe rows — they
    # never match — so no isnotnull pushdown protects the shuffle).
    inner_like = how.lower().replace("_", "") in (
        "inner",
        "semi",
        "leftsemi",
        "cross",
        "right",
        "rightouter",
    )
    p = probe.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(key).alias("n_notnull"),
        F.approx_count_distinct(key, 0.02).alias("ndv"),
    ).first()
    b = build.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(key, 0.02).alias("ndv"),
    ).first()
    probe_rows, probe_ndv = int(p["n"]), int(p["ndv"])
    probe_notnull = int(p["n_notnull"])
    build_rows, build_ndv = int(b["n"]), int(b["ndv"])
    skew_src = probe.where(F.col(key).isNotNull()) if inner_like else probe
    denom = probe_notnull if inner_like else probe_rows
    top = (
        skew_src.groupBy(key)
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc())
        .limit(1)
        .first()
    )
    top_share = (top["c"] / denom) if (top and denom) else 0.0

    common = dict(
        probe_rows=probe_rows,
        build_rows=build_rows,
        probe_key_ndv=probe_ndv,
        build_key_ndv=build_ndv,
        top_key_share=round(top_share, 4),
    )
    if build_rows <= broadcast_rows:
        return JoinAdvice(
            "broadcast",
            f"build side {build_rows} rows fits the broadcast budget "
            f"({broadcast_rows}); ship it, no probe shuffle at all",
            **common,
        )
    if top_share >= skew_share:
        # 'spark.sql.shuffle.partitions' can be non-numeric ('auto' on
        # some runtimes) — the advisor must not crash on exactly the
        # skewed path it exists to diagnose.
        try:
            parallelism = int(
                probe.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            parallelism = (
                probe.sparkSession.sparkContext.defaultParallelism or 200
            )
        n_salts = max(2, min(parallelism, int(top_share * parallelism * 2)))
        return JoinAdvice(
            "salted",
            f"hottest probe key owns {top_share:.1%} of rows (>= "
            f"{skew_share:.0%}): one reducer would take the join — spread "
            f"it over {n_salts} salts (operators/skew.py:salted_join)",
            suggested_n_salts=n_salts,
            **common,
        )
    if probe_ndv and build_ndv / probe_ndv <= bloom_ndv_ratio:
        return JoinAdvice(
            "bloom_prune",
            f"build key NDV {build_ndv} is <= {bloom_ndv_ratio:.0%} of probe "
            f"key NDV {probe_ndv} (filtered-dimension shape): Bloom-prune "
            f"the probe before its shuffle (operators/bloom.py)",
            **common,
        )
    if recurring:
        return JoinAdvice(
            "bucketed",
            "comparable sides, no skew, and the join recurs: pay the "
            "shuffle once at write time (operators/skew.py:write_bucketed)",
            **common,
        )
    return JoinAdvice(
        "shuffle",
        "comparable sides, no skew, one-off join: the planner's "
        "sort-merge join is already the right plan",
        **common,
    )


def execute_advice(
    advice: JoinAdvice,
    probe: DataFrame,
    build: DataFrame,
    on: str,
    spread_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Run the join THE WAY the advice prescribes — the executable half
    of the advisor, so "measure → prescribe → execute" is one certified
    path rather than advice a caller may misread. Every strategy is
    row-for-row identical to ``probe.join(build, on, how)`` (the
    certification oracle): broadcast/salted/bloom change only the
    physical plan. ``bucketed`` is a WRITE-time decision
    (skew.py:write_bucketed) — executing it here would hide the layout
    cost, so it falls through to the planner's join with the advice left
    to the table owner.

    ``spread_col`` is required for the salted path (any probe column
    with per-row variety — an event id, offset, ts)."""
    from ecommerce_data_pipeline_spark.operators.bloom import bloom_pruned_join
    from ecommerce_data_pipeline_spark.operators.skew import salted_join

    # Each strategy's operator supports only the join types where its
    # rewrite is sound (salting: inner/left; bloom pruning: inner/semi).
    # Advice is computed per table pair, not per join type, so a cached
    # prescription executed with an unsupported `how` falls back to the
    # planner's plain join — same contract as `bucketed` — instead of
    # crashing on a join the docstring promises to answer.
    if advice.strategy == "broadcast":
        return probe.join(F.broadcast(build), on, how)
    if advice.strategy == "salted" and how in (
        "inner",
        "left",
        "left_outer",
        "leftouter",
    ):
        if spread_col is None:
            raise ValueError("salted execution needs a spread_col")
        return salted_join(
            probe,
            build,
            on=on,
            spread_col=spread_col,
            n_salts=advice.suggested_n_salts or 16,
            how=how,
        )
    if advice.strategy == "bloom_prune" and how in (
        "inner",
        "semi",
        "left_semi",
        "leftsemi",
    ):
        from ecommerce_data_pipeline_spark.operators.bloom import suggest_n_bits

        # The advice already measured the build key NDV — size the filter
        # from it instead of trusting the fixed default (which saturates
        # once the build side outgrows ~100k keys; ADVICE r13 low).
        return bloom_pruned_join(
            probe, build, on, how, n_bits=suggest_n_bits(advice.build_key_ndv)
        )
    return probe.join(build, on, how)
