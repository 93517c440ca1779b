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

import math

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
