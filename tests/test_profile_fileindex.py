"""Round-13 additions, part 3: single-pass column profiling
(operators/profile.py) and the file-level stats-skipping index
(operators/fileindex.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.fileindex import (
    build_file_stats,
    prune_file_stats,
    skipping_scan,
    update_file_stats,
)
from ecommerce_data_pipeline_spark.operators.profile import column_profile


def test_column_profile_values(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (2, 30.0, None), (3, 20.5, "b")],
        "k int, v double, s string",
    )
    prof = {r["col_name"]: r for r in column_profile(df).collect()}
    assert set(prof) == {"k", "v", "s"}
    assert prof["k"]["n_rows"] == 4 and prof["k"]["n_nulls"] == 0
    assert prof["k"]["ndv"] == 3
    assert prof["k"]["min_num"] == 1.0 and prof["k"]["max_num"] == 3.0
    assert prof["k"]["avg_num"] == 2.0
    assert prof["v"]["n_nulls"] == 1 and prof["v"]["ndv"] == 3
    # cents-exact mean over non-null values: (10 + 30 + 20.5) / 3
    assert prof["v"]["avg_num"] == round(60.5 / 3, 6)
    assert prof["v"]["min_str"] is None
    assert prof["s"]["ndv"] == 2 and prof["s"]["n_nulls"] == 1
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None and prof["s"]["avg_num"] is None


def test_column_profile_one_scan(spark):
    """The whole profile is ONE job over one Aggregate: the physical plan
    contains exactly one scan of the source (Catalyst's multi-distinct
    rewrite uses Expand, not re-reads)."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("a"), (F.col("id") % 10).alias("b")
    )
    prof = column_profile(df)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 1000") == 1
    assert "Expand" in plan  # the multi-count-distinct single-pass shape
    with pytest.raises(ValueError, match="not in frame"):
        column_profile(df, ["a", "missing"])


def test_file_stats_index_and_skipping(spark, tmp_path):
    path = str(tmp_path / "t")
    # 4 files with disjoint k ranges: [0,25), [25,50), ...
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df.repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(path)

    index = build_file_stats(spark, path, ["k"])
    rows = index.collect()
    assert len(rows) == 4
    assert sum(r["n_rows"] for r in rows) == 100
    # Every file's stats are tight: max-min spans 1/4 of the domain.
    assert all(r["max_k"] - r["min_k"] < 30 for r in rows)

    scanned, stats = skipping_scan(spark, index, "k", 30, 40)
    assert stats["n_files_total"] == 4 and stats["n_files_scanned"] == 1
    got = sorted(r["k"] for r in scanned.collect())
    assert got == list(range(30, 41))

    # Band straddling two files.
    scanned2, stats2 = skipping_scan(spark, index, "k", 20, 30)
    assert stats2["n_files_scanned"] == 2
    assert sorted(r["k"] for r in scanned2.collect()) == list(range(20, 31))

    # Band outside the domain: zero files, schema preserved, zero rows.
    empty, stats3 = skipping_scan(spark, index, "k", 1000, 2000)
    assert stats3["n_files_scanned"] == 0
    assert empty.columns == ["k", "v"] and empty.count() == 0


def test_skipping_scan_keeps_pushdown(spark, tmp_path):
    """Below the file pruning, the range predicate still reaches the
    parquet scan of the surviving files (row-group skipping stays on)."""
    path = str(tmp_path / "t2")
    spark.range(0, 50).select(F.col("id").alias("k")).coalesce(1).write.parquet(
        path
    )
    index = build_file_stats(spark, path, ["k"])
    scanned, _ = skipping_scan(spark, index, "k", 10, 20)
    plan = scanned._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(k,10" in plan and "LessThanOrEqual(k,20" in plan


def test_column_profile_approx_ndv_bound(spark):
    """approx_ndv mode: HLL estimate within the documented rsd of the
    exact NDV, with no Expand in the plan (the 100 TB scan shape)."""
    df = spark.range(0, 20_000).select(
        (F.col("id") % 5_000).alias("k"), (F.col("id") % 7).alias("b")
    )
    prof = column_profile(df, ["k", "b"], approx_ndv=True, rsd=0.02)
    got = {r["col_name"]: r["ndv"] for r in prof.collect()}
    assert abs(got["k"] - 5_000) <= 5_000 * 0.06  # 3x rsd margin
    assert got["b"] == 7  # tiny cardinalities are exact in HLL++
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_update_file_stats_incremental(spark, tmp_path):
    """Appending files refreshes the index by scanning ONLY the new
    files; existing entries are reused verbatim and skipping still
    works over the union."""
    path = str(tmp_path / "t3")
    spark.range(0, 50).select(F.col("id").alias("k")).repartitionByRange(
        2, "k"
    ).sortWithinPartitions("k").write.parquet(path)
    index0 = build_file_stats(spark, path, ["k"]).localCheckpoint(eager=True)
    assert index0.count() == 2

    # Append a new range as new files.
    spark.range(100, 150).select(F.col("id").alias("k")).repartitionByRange(
        2, "k"
    ).sortWithinPartitions("k").write.mode("append").parquet(path)

    index1 = update_file_stats(spark, path, index0, ["k"])
    assert index1.count() == 4
    # Old entries survive untouched (same 2 rows), new cover [100,150).
    old = {r["file_path"] for r in index0.collect()}
    new_rows = [r for r in index1.collect() if r["file_path"] not in old]
    assert len(new_rows) == 2
    assert min(r["min_k"] for r in new_rows) == 100
    assert max(r["max_k"] for r in new_rows) == 149

    # No-op refresh returns the index unchanged.
    index2 = update_file_stats(spark, path, index1, ["k"])
    assert index2.count() == 4

    scanned, stats = skipping_scan(spark, index1, "k", 120, 130)
    # The appended files split [100,150) at a sampled range boundary; the
    # band hits 1 or 2 of them but never the two original [0,50) files.
    assert stats["n_files_total"] == 4 and stats["n_files_scanned"] <= 2
    assert sorted(r["k"] for r in scanned.collect()) == list(range(120, 131))


def test_skipping_scan_multi_column_bands(spark, tmp_path):
    """Conjunctive bands over a two-column-clustered layout: file
    selection is the AND of per-column stats intersections, and the
    result equals the plain double filter."""
    path = str(tmp_path / "t4")
    df = spark.range(0, 400).select(
        F.col("id").alias("a"), (399 - F.col("id")).alias("b")
    )
    df.repartitionByRange(4, "a").sortWithinPartitions("a").write.parquet(path)
    index = build_file_stats(spark, path, ["a", "b"])
    scanned, stats = skipping_scan(spark, index, {"a": (50, 80), "b": (0, 400)})
    assert stats["n_files_scanned"] == 1
    got = sorted(r["a"] for r in scanned.collect())
    assert got == list(range(50, 81))
    # Contradictory bands: a in [50,80] forces b in [319,349]; demanding
    # b <= 100 selects zero files and zero rows.
    empty, stats2 = skipping_scan(spark, index, {"a": (50, 80), "b": (0, 100)})
    assert stats2["n_files_scanned"] == 0 and empty.count() == 0


def test_prune_then_update_after_rewrite(spark, tmp_path):
    """The post-layout-job index maintenance sequence: a rewrite replaces
    every file; prune drops the dead entries, update indexes the new
    ones, and the result equals a full rebuild."""
    import shutil

    path = str(tmp_path / "t5")
    spark.range(0, 100).select(F.col("id").alias("k")).repartition(
        4
    ).write.parquet(path)
    index = build_file_stats(spark, path, ["k"]).localCheckpoint(eager=True)
    assert index.count() == 4

    # Layout job: rewrite the table range-clustered into 2 new files.
    tmp2 = str(tmp_path / "t5_new")
    spark.read.parquet(path).repartitionByRange(2, "k").sortWithinPartitions(
        "k"
    ).write.parquet(tmp2)
    shutil.rmtree(path)
    shutil.move(tmp2, path)

    pruned = prune_file_stats(spark, path, index)
    assert pruned.count() == 0  # every old file replaced
    refreshed = update_file_stats(spark, path, pruned, ["k"])
    full = build_file_stats(spark, path, ["k"])
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, full.collect())
    )
    scanned, stats = skipping_scan(spark, refreshed, "k", 10, 20)
    assert stats["n_files_total"] == 2 and stats["n_files_scanned"] == 1
    assert sorted(r["k"] for r in scanned.collect()) == list(range(10, 21))


def test_skipping_scan_refuses_open_band_and_empty_index(spark, tmp_path):
    """Review r13: a None bound would propagate as SQL NULL and silently
    select ZERO files; an empty index has no schema to serve — both now
    refuse loudly instead of returning wrong-empty results."""
    path = str(tmp_path / "t6")
    spark.range(0, 10).select(F.col("id").alias("k")).write.parquet(path)
    index = build_file_stats(spark, path, ["k"])
    with pytest.raises(ValueError, match="closed on both sides"):
        skipping_scan(spark, index, "k", 5)
    with pytest.raises(ValueError, match="closed on both sides"):
        skipping_scan(spark, index, {"k": (None, 7)})
    empty_index = index.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty index"):
        skipping_scan(spark, empty_index, "k", 0, 5)


def test_column_profile_avg_scale_for_subcent_domains(spark):
    """Review r13: the default cents quantum collapses sub-cent means to
    0.0; avg_scale=10^6 profiles a rate column exactly."""
    df = spark.createDataFrame(
        [(0.003,), (0.001,), (0.002,)], "rate double"
    )
    cents = {r["col_name"]: r for r in column_profile(df).collect()}
    assert cents["rate"]["avg_num"] == 0.0  # documented cents behavior
    fine = {
        r["col_name"]: r
        for r in column_profile(df, avg_scale=1_000_000).collect()
    }
    assert fine["rate"]["avg_num"] == 0.002
    assert fine["rate"]["min_num"] == 0.001 and fine["rate"]["max_num"] == 0.003
