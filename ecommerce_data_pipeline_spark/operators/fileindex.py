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

import re

from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Manual scheme/authority split for _canon. urlsplit would stop the path at
# the first '#'/'?' — but a DECODED Hadoop path (one of the two
# representations this function exists to absorb) carries those characters
# literally in a filename, so urlsplit silently truncates exactly the drifted
# form and the file gets re-statted/mis-pruned under a wrong path
# (ADVICE r15). File paths here are never queries/fragments, so the whole
# remainder after scheme[://authority] is the path.
_URI_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):(//[^/]*)?(?=/)")


def _canon(p: str) -> str:
    """Canonical DECODED uri-string form for file-path comparison.

    ``_metadata.file_path`` is percent-ENCODED (``a%20b``) while Hadoop
    ``Path.toString()`` is decoded (``a b``) — verified empirically; the
    exact representation also varies by Spark version (ADVICE r14) — so
    every comparison between index entries and FS listings goes through
    this one function: scheme + authority + percent-decoded path. Both
    forms of the same file map to the same string. The split is manual
    (``_URI_RE``), never ``urlsplit``: a literal ``#``/``?`` in a decoded
    filename must stay in the path, not become a fragment/query
    (ADVICE r15). Residual assumption (documented, not checked): a file
    whose NAME contains a literal ``%``-hex sequence on a Spark build
    that does NOT encode ``_metadata.file_path`` would decode wrongly;
    Spark 4.x encodes."""
    m = _URI_RE.match(p)
    if not m:
        return p
    host = m.group(2) or ""
    if host == "//":
        # Empty authority: file:///x and file:/x are the same file —
        # collapse to the authority-less spelling (matches the previous
        # urlsplit behavior, where an empty netloc dropped the slashes).
        host = ""
    return f"{m.group(1)}:{host}{unquote(p[m.end():])}"


def _file_stats(df: DataFrame, stat_cols: list[str]) -> DataFrame:
    """The one stats-aggregate shape both the full build and the
    incremental refresh use — a single definition so a future stats
    schema change cannot silently diverge the two."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.select(F.col("_metadata.file_path").alias("file_path"), *stat_cols)
        .groupBy("file_path")
        .agg(*aggs)
    )


def list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Driver-side recursive listing of the parquet data files under
    ``path`` — a Hadoop FileSystem call, ZERO Spark jobs, O(files)
    metadata (the exact cost class of a Delta log read). Paths come back
    in the canonical ``_canon`` form, so they compare directly against
    canonicalized index entries. Hidden/commit artifacts (``_SUCCESS``,
    ``.tmp*``) are excluded, the same way Spark's own file listing skips
    ``_``/``.``-prefixed names — and, matching Spark's semantics, the
    hidden-segment rule applies only to path segments BELOW the input
    root: a table legitimately rooted under a hidden directory (e.g.
    ``/home/u/.data/tables/t``) lists normally (ADVICE r14).

    DRIVER-MEMORY BOUND: the returned list (and the ``known``-paths set
    its callers build) holds every live file path of the table in driver
    memory — O(total files), the same class as a Delta transaction-log
    read, comfortable to ~10M files (~1 GB of path strings). Past that,
    shard the table or spill the anti-join to executors (the index frame
    itself is already distributed); SCALE.md §10 records the policy."""
    from ecommerce_data_pipeline_spark.operators.layout import _fs

    fs, jpath = _fs(spark, path)
    # Qualified root → its decoded URI path is the prefix we strip so
    # hidden-segment checks see only the RELATIVE part below the root.
    root_uri = fs.makeQualified(jpath).toUri()
    root_path = root_uri.getPath().rstrip("/")
    out: list[str] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        p = it.next().getPath()
        u = p.toUri()
        fpath = u.getPath()
        rel = fpath[len(root_path):] if fpath.startswith(root_path) else fpath
        if any(seg.startswith(("_", ".")) for seg in rel.split("/") if seg):
            continue
        host = f"//{u.getAuthority()}" if u.getAuthority() else ""
        out.append(f"{u.getScheme()}:{host}{fpath}")
    return sorted(out)


def build_file_stats(
    spark: SparkSession, path: str, stat_cols: list[str]
) -> DataFrame:
    """Per-file stats index: ``(file_path, n_rows, min_<c>, max_<c> ...)``
    in one scan of ``path``."""
    return _file_stats(spark.read.parquet(path), stat_cols)


def update_file_stats(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    stat_cols: list[str],
    pin_fresh: bool = False,
) -> DataFrame:
    """Incremental index refresh on append: stat ONLY files not yet in
    ``index``. The new-file discovery is ``list_data_files`` — a
    driver-side Hadoop FS listing, zero Spark jobs — minus the index's
    recorded paths (one file-count-bounded metadata collect); only the
    genuinely new files' DATA is then scanned. This is how the index
    stays O(new files) per refresh instead of re-profiling 100 TB on
    every append — the exact shape of Delta appending per-file stats to
    its log at commit time. (Earlier rounds derived the listing from a
    ``_metadata.file_path`` DISTINCT over the whole table — one row per
    DATA row plus a shuffle per refresh, contradicting the O(new files)
    contract; the FS listing replaces that.)

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
    # Canonicalize BOTH sides: index entries carry _metadata's (possibly
    # percent-encoded) form, the listing the decoded form — a raw string
    # compare would re-stat already-indexed files on any path with
    # URL-encodable characters (duplicate index rows → wrong skipping
    # stats; ADVICE r14). O(total files) driver memory — see
    # list_data_files' documented bound.
    known = {
        _canon(r["file_path"])
        for r in index.select("file_path").collect()
    }
    fresh_paths = [p for p in list_data_files(spark, path) if p not in known]
    if not fresh_paths:
        return index
    # basePath keeps hive partition columns visible when the table is
    # partitioned (leaf-path reads would silently drop them, diverging
    # from the full-table scan build_file_stats profiles).
    fresh = spark.read.option("basePath", path).parquet(*fresh_paths)
    fresh_stats = _file_stats(fresh, stat_cols)
    if pin_fresh:
        fresh_stats = fresh_stats.localCheckpoint(eager=True)
    return index.unionByName(fresh_stats)


def skipping_scan(
    spark: SparkSession,
    index: DataFrame | str,
    col: str | dict,
    lo=None,
    hi=None,
    base_path: str | None = None,
) -> tuple[DataFrame, dict]:
    """Scan only files whose stats intersect the predicate band(s), with
    the range predicate still applied (and pushed) on the survivors.
    For a HIVE-PARTITIONED layout pass ``base_path`` (the table root) so
    the survivor read keeps the partition columns.

    ``index`` is the PERSISTED index's path (a string — the production
    default per SCALE.md §10: the index is its own on-disk append table,
    maintained by ``append_file_stats`` / ``compact_file_stats``,
    restart-safe, O(index) metadata to read) or an index DataFrame (the
    in-memory ``build_file_stats``/``update_file_stats`` union — the
    process-local twin for tests and one-shot jobs; it dies with the
    process).

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
    if isinstance(index, str):
        index = spark.read.parquet(index)
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
    # Canonical (decoded) form for the reader: Hadoop Path treats the
    # string literally, so a percent-encoded _metadata path would fail
    # to resolve on a filename with URL-encodable characters. Dedup in
    # canonical form, order-preserving: an index that ever held BOTH
    # encoded and decoded rows for one file (built before the _canon
    # discipline, refreshed after) must not hand the reader the same
    # path twice — the scan would double-count its rows (ADVICE r15).
    # A file is scanned if ANY of its index rows survives the band test.
    all_canon = list(dict.fromkeys(_canon(r["file_path"]) for r in flagged))
    files = list(
        dict.fromkeys(_canon(r["file_path"]) for r in flagged if r["__keep"])
    )
    stats = {"n_files_total": len(all_canon), "n_files_scanned": len(files)}
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
    reader = spark.read
    if base_path is not None:
        # Keeps hive partition columns visible on a partitioned layout —
        # a bare leaf-path read would silently drop them and the result
        # schema would diverge from the plain full-table scan the
        # certified queries compare against.
        reader = reader.option("basePath", base_path)
    if not files:
        # Empty selection: preserve schema via a 0-row read of the index's
        # first file (stats said nothing matches; the filter re-proves it) —
        # reusing the one collected listing, no extra index action.
        base = reader.parquet(all_canon[0]).limit(0)
        return base, stats
    scanned = reader.parquet(*files).filter(pred)
    return scanned, stats


def append_file_stats(
    spark: SparkSession, table_path: str, index_path: str,
    stat_cols: list[str],
) -> int:
    """One refresh of a PERSISTED stats index: stat only the table files
    not yet recorded in the parquet table at ``index_path`` and APPEND
    their rows. This is the production shape SCALE.md §10 names for
    ``streaming_file_index`` — the index is its own append table (the
    way Delta appends per-file stats to its log at commit time), so a
    refresh survives process restarts and its cost is O(new files) data
    + one O(index) metadata read, never a table re-profile. Small index
    files accumulate one-per-refresh; ``compact_file_stats`` is the fold
    (ordinary compaction via operators/layout.py). Returns the number of
    newly indexed files. Path comparison is canonical (``_canon``)."""
    # Explicit existence probe (not try/read-except): the first refresh
    # legitimately finds no index, and letting the reader throw logs a
    # full WARN stack trace per stream start. Existence is "has data
    # files", not "dir exists": a crash inside compact_file_stats'
    # delete-then-write overwrite can leave the dir present but empty
    # (or _SUCCESS-only), and reading THAT dies on schema inference
    # instead of taking the rebuild path (ADVICE r15) — an empty index
    # and a missing index mean the same thing here: stat everything.
    from ecommerce_data_pipeline_spark.operators.layout import _fs

    ifs, jidx = _fs(spark, index_path)
    if ifs.exists(jidx) and list_data_files(spark, index_path):
        known = {
            _canon(r["file_path"])
            for r in spark.read.parquet(index_path)
            .select("file_path")
            .collect()
        }
    else:
        known = set()
    fresh = [p for p in list_data_files(spark, table_path) if p not in known]
    if not fresh:
        return 0
    stats = _file_stats(
        spark.read.option("basePath", table_path).parquet(*fresh), stat_cols
    )
    stats.write.mode("append").parquet(index_path)
    return len(fresh)


def compact_file_stats(
    spark: SparkSession, index_path: str, target_bytes: int = 64 << 20
) -> dict:
    """The persisted index's fold: per-refresh appends leave one small
    parquet file each, so the index itself accumulates exactly the
    small-file problem it helps solve — and the answer is exactly the
    ordinary compaction operator (operators/layout.py): plan from the
    size listing, rewrite as ONE repartition to the planned file count.
    The index is O(table files) rows of metadata, so the snapshot-then-
    overwrite here is Delta-checkpoint-class work, not a data job.
    Returns the compaction plan dict (``n_input_files`` →
    ``n_output_files``).

    Crash recovery: the overwrite is Spark's delete-then-write — a crash
    mid-fold can leave a partial index dir. Unlike the DATA tables the
    manifest tier protects, the index is a pure DERIVED artifact: the
    recovery is ``build_file_stats`` over the table (one scan), so the
    fold needs no swap machinery of its own."""
    from ecommerce_data_pipeline_spark.operators.layout import (
        compact,
        file_sizes,
        plan_compaction,
    )

    plan = plan_compaction(file_sizes(spark, index_path), target_bytes)
    # Materialize the snapshot BEFORE overwriting the path it reads from.
    snap = spark.read.parquet(index_path).localCheckpoint(eager=True)
    compact(snap, plan).write.mode("overwrite").parquet(index_path)
    return plan


def prune_file_stats(
    spark: SparkSession, path: str, index: DataFrame
) -> DataFrame:
    """Index vacuum: drop entries whose files no longer exist under
    ``path`` (after a compaction/zorder rewrite replaced them). A
    semi-join of the index against its own surviving entries — both
    sides file-count-bounded metadata. Survival is decided driver-side
    in CANONICAL path form (``_canon``: the index may hold percent-
    encoded ``_metadata`` paths, the listing decoded ones; raw-string
    comparison would silently drop valid entries — ADVICE r14), then
    re-expressed as the index's OWN raw strings so the semi-join's
    exact-string equality is sound. Rewrites produce NEW paths, so the
    sequence after a layout job is prune (drop old entries) +
    ``update_file_stats`` (index the rewritten files): the same
    log-compaction step Delta performs at checkpoint time. The listing
    is the driver-side FS walk (``list_data_files`` — zero Spark jobs),
    not a data scan; driver memory is O(total files), the documented
    ``list_data_files`` bound."""
    live = set(list_data_files(spark, path))
    idx_paths = [
        r["file_path"]
        for r in index.select("file_path").distinct().collect()
    ]
    keep = [(p,) for p in idx_paths if _canon(p) in live]
    keep_df = spark.createDataFrame(keep, "file_path string")
    return index.join(F.broadcast(keep_df), "file_path", "left_semi")
