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
   with delta-spark present, prefer OPTIMIZE.

   **Crash safety (round 12)**: without a transaction log the
   rename-then-delete commit is non-transactional — a crash between the
   two leaves BOTH the compacted dir and (some of) its inputs, i.e.
   duplicated postings. The compactor therefore writes a
   ``_consumed_inputs`` manifest (JSON list of the input ``batch=`` dir
   names) INTO the output before the rename, so the rename atomically
   publishes the compacted data together with the record of what it
   replaced. ``repair_postings`` — run automatically as a
   ``compact_postings`` pre-pass — deletes any ``batch=`` dir named in a
   surviving manifest (stale inputs a crash failed to remove) plus any
   orphaned ``.compact-tmp-*`` dir (a crash before the rename; invisible
   to readers either way). Net effect: the duplicate window self-heals on
   the next compaction instead of being re-compacted into the new
   snapshot, and a crash before the rename costs nothing. Single-writer
   assumption: at most one compactor/repairer runs at a time (appends may
   be concurrent — they are untouched). Concurrent READERS racing the
   input deletion can hit FileNotFoundException on a file listed before
   the delete — no data is at risk (the compacted dir already contains
   every row), so probe jobs that may race a compactor should set
   ``spark.sql.files.ignoreMissingFiles=true`` or simply retry; a
   transactional log (Delta) is the real fix where available.

All filesystem operations go through the Hadoop FileSystem API (via the
JVM gateway), so the operator works identically on HDFS/S3/local — never
``os.listdir``, which only sees the driver's local disk.

Layout contract: ``root/batch=<id>/cell=<c>/part-*.parquet`` — uniform
two-level partitioning, so ``spark.read.parquet(root)`` discovery works
before, during, and after compaction.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_consumed_inputs"


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


def _write_manifest(spark: SparkSession, dir_path: str, inputs: list[str]) -> None:
    jvm, fs, _ = _fs(spark, dir_path)
    Path = jvm.org.apache.hadoop.fs.Path
    out = fs.create(Path(f"{dir_path}/{_MANIFEST}"), True)
    try:
        out.write(bytearray(json.dumps(sorted(inputs)).encode("utf-8")))
    finally:
        out.close()


def _read_manifest(spark: SparkSession, dir_path: str) -> list[str] | None:
    jvm, fs, _ = _fs(spark, dir_path)
    Path = jvm.org.apache.hadoop.fs.Path
    p = Path(f"{dir_path}/{_MANIFEST}")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    baos = jvm.java.io.ByteArrayOutputStream()
    try:
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, False)
    finally:
        stream.close()
    return json.loads(bytes(baos.toByteArray()).decode("utf-8"))


def _delete_dirs(spark: SparkSession, root: str, names: list[str]) -> None:
    jvm, fs, _ = _fs(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    for d in names:
        fs.delete(Path(f"{root}/{d}"), True)


def repair_postings(spark: SparkSession, root: str) -> dict:
    """Self-heal the compactor's crash window (see module docstring).

    Deletes (a) every ``batch=`` dir named in a surviving compacted dir's
    ``_consumed_inputs`` manifest — stale inputs a crash between the
    rename and the input deletion failed to remove, whose rows are
    duplicates of the compacted output — and (b) orphaned
    ``.compact-tmp-*`` dirs from a crash before the rename (never visible
    to readers; pure garbage). Idempotent; assumes no compactor is
    running concurrently. Returns
    ``{removed_stale_inputs, removed_tmp_dirs}``.
    """
    jvm, fs, path = _fs(spark, root)
    removed_inputs: list[str] = []
    removed_tmps: list[str] = []
    if not fs.exists(path):
        return {"removed_stale_inputs": [], "removed_tmp_dirs": []}
    names = [st.getPath().getName() for st in fs.listStatus(path)]
    compacted = sorted(n for n in names if n.startswith("batch=compact-"))
    live = set(names)
    for c in compacted:
        consumed = _read_manifest(spark, f"{root}/{c}")
        if not consumed:
            continue  # pre-manifest dir (or unreadable): nothing to act on
        stale = [d for d in consumed if d in live and d != c]
        _delete_dirs(spark, root, stale)
        removed_inputs.extend(stale)
        live -= set(stale)
    tmps = [n for n in names if n.startswith(".compact-tmp-") and n in live]
    _delete_dirs(spark, root, tmps)
    removed_tmps.extend(tmps)
    return {
        "removed_stale_inputs": sorted(removed_inputs),
        "removed_tmp_dirs": sorted(removed_tmps),
    }


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
    place for the next pass. Runs ``repair_postings`` first, so a previous
    run's crash window self-heals before the new snapshot is taken (never
    re-compacting duplicated rows). Returns stats:
    ``{compacted, n_input_dirs, n_files_before, n_files_after, output_dir,
    repair}``.
    """
    repair = repair_postings(spark, root)
    inputs = _list_batch_dirs(spark, root)
    n_before = _count_files(spark, root)
    stats = {
        "compacted": False,
        "n_input_dirs": len(inputs),
        "n_files_before": n_before,
        "n_files_after": n_before,
        "output_dir": None,
        "repair": repair,
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
    # Commit protocol: manifest INTO the tmp dir first, then one rename
    # publishes data + manifest atomically, then delete the inputs. A
    # crash after the rename leaves the manifest in place for
    # repair_postings to finish the deletes on the next run.
    _write_manifest(spark, f"{root}/{tmp_name}", inputs)
    jvm, fs, path = _fs(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    if not fs.rename(Path(f"{root}/{tmp_name}"), Path(f"{root}/{out_name}")):
        raise IOError(f"compact_postings: rename to {out_name} failed")
    _delete_dirs(spark, root, inputs)
    stats.update(
        compacted=True,
        n_files_after=_count_files(spark, root),
        output_dir=out_name,
    )
    return stats
