"""File-level min/max statistics index — Delta data-skipping parity.

Parquet row-group stats already skip WITHIN a file once a predicate is
pushed; what a plain directory of parquet lacks is the layer ABOVE: a
per-file stats index that prunes whole files before the scan is even
planned (Delta's per-file ``stats`` in the transaction log, Iceberg's
manifest min/max). Combined with a clustered layout (operators/zorder.py)
this is the difference between "open 100k footers" and "open 40" on a
100 TB table.

- ``build_file_stats``: ONE scan grouped by the hidden
  ``_metadata.file_path`` column → per-file row count + min/max of the
  indexed columns. The index is itself a DataFrame — persist it next to
  the table and refresh incrementally on append (new files only), the
  way Delta appends stats to its log.
- ``skipping_scan``: prune the index by a range predicate, collect ONLY
  the surviving file paths (driver-side metadata, O(files) like every
  log/manifest read in Delta/Iceberg — never data), and plan the scan
  over that file list with the predicate still pushed (row-group skipping
  stays on below the file skipping).

A file whose [min,max] interval intersects the predicate range may still
contain no matching rows (stats are necessary, not sufficient), so the
pushed predicate re-applies exactly — same contract as the Bloom pruning
in operators/bloom.py: skipping is invisible in the result, which is how
the certified query's oracle (the plain filtered scan) proves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_file_stats(
    spark: SparkSession, path: str, stat_cols: list[str]
) -> DataFrame:
    """Per-file stats index: ``(file_path, n_rows, min_<c>, max_<c> ...)``
    in one scan of ``path``."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.select(F.col("_metadata.file_path").alias("file_path"), *stat_cols)
        .groupBy("file_path")
        .agg(*aggs)
    )


def update_file_stats(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    stat_cols: list[str],
    pin_fresh: bool = False,
) -> DataFrame:
    """Incremental index refresh on append: scan ONLY files not yet in
    ``index`` (an anti-join of the listing against the index's
    ``file_path`` column — the listing is driver metadata, the stats scan
    touches new files' data only) and union their stats in. This is how
    the index stays O(new files) per refresh instead of re-profiling
    100 TB on every append — the exact shape of Delta appending per-file
    stats to its log at commit time.

    Immutable-file assumption (same as Delta/Iceberg): a file's stats
    never change once written; rewrites produce NEW paths (our layout
    jobs — zorder, compaction — always do), so anti-join by path is
    sufficient and a vanished file simply stops matching at scan time.

    ``pin_fresh`` materializes the NEW files' stats rows (O(new files)
    metadata) before the union, so a caller that keeps the returned
    lazy union across many refreshes (streaming ingest) never re-scans
    an already-statted file's DATA when the union is later evaluated —
    the per-refresh cost stays O(new files) with only the union's
    lineage depth growing, which the caller bounds by folding
    (full localCheckpoint) every N refreshes. Without it the returned
    frame is fully lazy (one-shot callers that evaluate once anyway).
    """
    listing = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("file_path"))
        .distinct()
    )
    fresh_paths = [
        r["file_path"]
        for r in listing.join(
            index.select("file_path"), "file_path", "left_anti"
        ).collect()
    ]
    if not fresh_paths:
        return index
    fresh = spark.read.parquet(*fresh_paths)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    fresh_stats = (
        fresh.select(F.col("_metadata.file_path").alias("file_path"), *stat_cols)
        .groupBy("file_path")
        .agg(*aggs)
    )
    if pin_fresh:
        fresh_stats = fresh_stats.localCheckpoint(eager=True)
    return index.unionByName(fresh_stats)


def skipping_scan(
    spark: SparkSession,
    index: DataFrame,
    col: str | dict,
    lo=None,
    hi=None,
) -> tuple[DataFrame, dict]:
    """Scan only files whose stats intersect the predicate band(s), with
    the range predicate still applied (and pushed) on the survivors.

    ``col`` is either one column name with ``lo``/``hi``, or a dict
    ``{col: (lo, hi), ...}`` of ANDed bands — the multi-column case is
    what the Z-order layout exists for: every clustered dimension's
    per-file span is tight, so conjunctive bands multiply their
    selectivities at the FILE level (Delta stats-skipping over
    OPTIMIZE ZORDER, same math).

    Returns ``(df, stats)`` where stats records the skipping rate —
    callers assert on it so a degenerate layout (every file overlapping
    every range) can't silently pass as "skipping". The collect is the
    index's surviving file list: metadata bounded by file count, the same
    driver-side work as a Delta log read."""
    bands = col if isinstance(col, dict) else {col: (lo, hi)}
    for c, (blo, bhi) in bands.items():
        # A None bound would propagate as SQL NULL through the interval
        # test and silently select ZERO files (NULL comparisons are never
        # true) — refuse instead of returning a wrong-empty result.
        if blo is None or bhi is None:
            raise ValueError(
                f"skipping_scan band for {c!r} must be closed on both "
                f"sides, got ({blo!r}, {bhi!r}) — use the column's "
                "profiled min/max for an open end"
            )
    keep = None
    for c, (blo, bhi) in bands.items():
        cond = ~(
            (F.col(f"max_{c}") < F.lit(blo)) | (F.col(f"min_{c}") > F.lit(bhi))
        )
        keep = cond if keep is None else (keep & cond)
    # ONE action over the index: collect (path, keep) pairs and derive
    # both the survivor list and the total from it — the index may be a
    # lazy union (update_file_stats), where separate filter/count actions
    # would each re-scan the freshly appended files' data.
    flagged = index.select("file_path", keep.alias("__keep")).collect()
    files = [r["file_path"] for r in flagged if r["__keep"]]
    stats = {"n_files_total": len(flagged), "n_files_scanned": len(files)}
    if not flagged:
        raise ValueError(
            "skipping_scan on an empty index: build_file_stats / "
            "update_file_stats it first (prune_file_stats after a full "
            "rewrite legitimately empties it)"
        )
    pred = None
    for c, (blo, bhi) in bands.items():
        cond = (F.col(c) >= F.lit(blo)) & (F.col(c) <= F.lit(bhi))
        pred = cond if pred is None else (pred & cond)
    if not files:
        # Empty selection: preserve schema via a 0-row read of the index's
        # first file (stats said nothing matches; the filter re-proves it) —
        # reusing the one collected listing, no extra index action.
        base = spark.read.parquet(flagged[0]["file_path"]).limit(0)
        return base, stats
    scanned = spark.read.parquet(*files).filter(pred)
    return scanned, stats


def prune_file_stats(
    spark: SparkSession, path: str, index: DataFrame
) -> DataFrame:
    """Index vacuum: drop entries whose files no longer exist under
    ``path`` (after a compaction/zorder rewrite replaced them). A
    semi-join of the index against the current listing — both sides
    file-count-bounded metadata. Rewrites produce NEW paths, so the
    sequence after a layout job is prune (drop old entries) +
    ``update_file_stats`` (index the rewritten files): the same
    log-compaction step Delta performs at checkpoint time."""
    listing = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("file_path"))
        .distinct()
    )
    return index.join(F.broadcast(listing), "file_path", "left_semi")
