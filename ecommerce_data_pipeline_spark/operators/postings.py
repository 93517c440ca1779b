"""Cell-partitioned posting layout: idempotent micro-batch writes +
small-files compaction (the OPTIMIZE analogue for the streaming ANN index).

The streaming index-maintenance path (queries/retrieval.py
``streaming_ann_assign``) absorbs new vectors by appending postings per
micro-batch. Two classic lakehouse problems follow, both solved here:

1. **Replay duplication**: a blind ``mode("append")`` duplicates rows when
   a micro-batch retries after a partial write (foreachBatch is
   at-least-once). ``write_posting_batch`` writes each batch to its OWN
   ``batch=b<id>`` partition directory with ``mode("overwrite")`` — a
   reprocessed batch overwrites exactly its own output, the same
   idempotency-by-key discipline as the silver MERGE (reference:
   analytics/spark/jobs/silver_orders_clean.py merge-on-offset).

2. **Small files**: one parquet file per (batch × cell) means a day of
   10 s triggers leaves ~8640 × n_cells tiny files — the layout a 100 TB
   probe would spend its time opening, not scanning. ``compact_postings``
   rewrites a SNAPSHOT of batch directories into one consolidated
   ``batch=compact-*`` directory (one file per cell), then removes exactly
   the inputs it read — concurrent appends that land mid-compaction are
   untouched and survive for the next pass. This is what Delta's OPTIMIZE
   does (the reference README recommends exactly that at README.md:295);
   without a transaction log the rename-then-delete window is
   non-transactional: a crash between the two can leave BOTH the compacted
   and input dirs (duplicate rows until a re-run removes the stale inputs
   — detectable because the compacted dir name records nothing newer than
   its inputs). With delta-spark present, prefer OPTIMIZE.

All filesystem operations go through the Hadoop FileSystem API (via the
JVM gateway), so the operator works identically on HDFS/S3/local — never
``os.listdir``, which only sees the driver's local disk.

Layout contract: ``root/batch=<id>/cell=<c>/part-*.parquet`` — uniform
two-level partitioning, so ``spark.read.parquet(root)`` discovery works
before, during, and after compaction.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def write_batch_output(
    df: DataFrame, root: str, batch_id: int, partition_by: tuple[str, ...] = ()
) -> None:
    """Generic idempotent foreachBatch parquet sink: each micro-batch owns
    ``root/batch=b<id>``, written with overwrite semantics, so an
    at-least-once retry rewrites its own directory instead of appending a
    duplicate copy. Readers take ``spark.read.parquet(root)`` and drop (or
    use) the discovered ``batch`` partition column."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{root}/batch=b{batch_id}")


def write_posting_batch(df: DataFrame, root: str, batch_id: int) -> None:
    """Idempotently write one micro-batch of (.., cell) postings.

    Each batch owns ``root/batch=b<id>``; overwrite semantics make a
    foreachBatch retry rewrite the same directory instead of appending a
    duplicate copy."""
    write_batch_output(df, root, batch_id, partition_by=("cell",))


def _fs(spark: SparkSession, root: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    return jvm, path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _list_batch_dirs(spark: SparkSession, root: str) -> list[str]:
    jvm, fs, path = _fs(spark, root)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            out.append(name)
    return sorted(out)


def _count_files(spark: SparkSession, root: str) -> int:
    jvm, fs, path = _fs(spark, root)
    if not fs.exists(path):
        return 0
    n = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
    return n


def compact_postings(
    spark: SparkSession,
    root: str,
    file_threshold: int = 8,
    min_input_dirs: int = 2,
) -> dict:
    """Consolidate a snapshot of ``batch=*`` posting directories into one
    ``batch=compact-*`` directory with one parquet file per cell.

    No-op (returns ``compacted=False``) unless the snapshot spans at least
    ``min_input_dirs`` directories AND more than ``file_threshold`` data
    files — compaction that rewrites one big file into another is pure
    write amplification. Inputs are pruned by partition value, so the read
    never touches batches that arrive mid-compaction; those are left in
    place for the next pass. Returns stats:
    ``{compacted, n_input_dirs, n_files_before, n_files_after, output_dir}``.
    """
    inputs = _list_batch_dirs(spark, root)
    n_before = _count_files(spark, root)
    stats = {
        "compacted": False,
        "n_input_dirs": len(inputs),
        "n_files_before": n_before,
        "n_files_after": n_before,
        "output_dir": None,
    }
    if len(inputs) < min_input_dirs or n_before <= file_threshold:
        return stats

    input_values = [d.split("=", 1)[1] for d in inputs]
    everything = spark.read.parquet(root)
    snapshot = everything.where(everything["batch"].isin(input_values))
    data_cols = [c for c in snapshot.columns if c not in ("batch", "cell")]
    out_name = f"batch=compact-{uuid.uuid4().hex[:12]}"
    tmp_name = f".compact-tmp-{uuid.uuid4().hex[:12]}"
    # repartition BY cell → every cell's rows land in one task → exactly
    # one output file per cell directory.
    (
        snapshot.select(*data_cols, "cell")
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{root}/{tmp_name}")
    )
    jvm, fs, path = _fs(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    if not fs.rename(Path(f"{root}/{tmp_name}"), Path(f"{root}/{out_name}")):
        raise IOError(f"compact_postings: rename to {out_name} failed")
    for d in inputs:
        fs.delete(Path(f"{root}/{d}"), True)
    stats.update(
        compacted=True,
        n_files_after=_count_files(spark, root),
        output_dir=out_name,
    )
    return stats
