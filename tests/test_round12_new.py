"""Round-12 additions: projection-independent interchange good splits,
compaction crash-window repair (consumed-inputs manifest), compaction-
aware streaming-read lifecycle, multiline .tbl certified round-trip."""

from __future__ import annotations

import os

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F


def test_interchange_good_split_is_projection_independent(spark, tmp_path):
    """ADVICE r11 (high): the native readers detect malformedness AFTER
    column pruning, so a row broken only in an UNPROJECTED column was kept
    by narrow projections while vanishing from full-row reads — the same
    DataFrame yielding different row sets per projection, and the bad row
    appearing in BOTH good and quarantine. The full-struct reparse must
    give one row set for every projection, in both storage modes."""
    from ecommerce_data_pipeline_spark.sources.corpus_io import (
        read_corpus_jsonl,
    )
    from ecommerce_data_pipeline_spark.sources.tabular_io import read_tbl

    # CSV: row 2 is malformed ONLY in price (the column a select("id")
    # projection prunes away).
    tdir = str(tmp_path / "t")
    os.makedirs(tdir)
    with open(f"{tdir}/part-0.tbl", "w") as fh:
        fh.write("1|alpha|1.5\n2|beta|notanum\n3|gamma|2.5\n")
    schema = spark.createDataFrame(
        [(1, "a", 1.5)], "id long, s string, price double"
    ).schema
    for kwargs in ({}, {"storage_level": StorageLevel.MEMORY_AND_DISK,
                        "return_raw": True}):
        res = read_tbl(spark, tdir, schema, **kwargs)
        good, quar = res[0], res[1]
        try:
            assert good.count() == 2 == len(good.collect())
            assert sorted(r["id"] for r in good.select("id").collect()) == [1, 3]
            qlines = [r["raw_line"] for r in quar.collect()]
            assert qlines == ["2|beta|notanum"]  # true raw line, no placeholder
            # disjointness under the narrowest projection
            assert not {2} & {r["id"] for r in good.select("id").collect()}
        finally:
            if len(res) == 3:
                res[2].unpersist(blocking=True)

    # JSON: row 2 is malformed ONLY in n_chars (long field fed a string).
    jdir = str(tmp_path / "j")
    os.makedirs(jdir)
    with open(f"{jdir}/part-0.json", "w") as fh:
        fh.write('{"doc_id":1,"text":"a","lang":"en","source":"s","n_chars":1}\n')
        fh.write('{"doc_id":2,"text":"b","lang":"en","source":"s","n_chars":"XX"}\n')
        fh.write('{"doc_id":3,"text":"c","lang":"en","source":"s","n_chars":3}\n')
    for kwargs in ({}, {"storage_level": StorageLevel.MEMORY_AND_DISK,
                        "return_raw": True}):
        res = read_corpus_jsonl(spark, jdir, **kwargs)
        good, quar = res[0], res[1]
        try:
            assert good.count() == 2 == len(good.collect())
            assert sorted(
                r["doc_id"] for r in good.select("doc_id").collect()
            ) == [1, 3]
            assert quar.count() == 1
            assert '"XX"' in quar.collect()[0]["raw_line"]
        finally:
            if len(res) == 3:
                res[2].unpersist(blocking=True)


def test_tbl_trailing_junk_quarantines_raw_line_in_persisted_mode(
    spark, tmp_path
):
    """ADVICE r11 (low): persisted mode used to quarantine trailing-junk
    lines as the literal placeholder '<junk-after-trailing-|>', losing the
    data needed to triage. Both line-oriented modes must now preserve the
    raw line."""
    from ecommerce_data_pipeline_spark.sources.tabular_io import read_tbl

    src = str(tmp_path / "dbgen")
    os.makedirs(src)
    with open(f"{src}/orders.tbl", "w") as fh:
        fh.write("1|alpha|1.5|\n2|junky|3.5|EXTRA\n")
    schema = spark.createDataFrame(
        [(1, "a", 1.5)], "id long, s string, v double"
    ).schema
    good, quar, raw = read_tbl(
        spark, src, schema,
        storage_level=StorageLevel.MEMORY_AND_DISK, return_raw=True,
        dbgen_trailing_delimiter=True,
    )
    try:
        assert [r["id"] for r in good.collect()] == [1]
        assert [r["raw_line"] for r in quar.collect()] == ["2|junky|3.5|EXTRA"]
    finally:
        raw.unpersist(blocking=True)

def _posting_df(spark, ids_cells):
    return spark.createDataFrame(ids_cells, "vec_id long, cell int")


def test_compact_postings_crash_window_self_heals(spark, tmp_path, monkeypatch):
    """ADVICE r11 (medium) / VERDICT r11 weak mark: a crash between the
    compactor's rename and its input deletion used to leave duplicated
    postings that a re-run would BAKE IN (re-compacting compacted + stale
    rows). The consumed-inputs manifest + repair pre-pass must make the
    next run converge to exactly the no-crash row set."""
    from ecommerce_data_pipeline_spark.operators import postings

    rows = [(i, i % 3) for i in range(30)]

    def ingest(root):
        for b in range(3):
            postings.write_posting_batch(
                _posting_df(spark, [r for r in rows if r[0] % 3 == b])
                .repartition(2),
                root, b,
            )

    # Control: the no-crash run.
    ctrl = str(tmp_path / "ctrl")
    ingest(ctrl)
    postings.compact_postings(spark, ctrl, file_threshold=2)
    expected = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(ctrl).select("vec_id", "cell").collect()
    )
    assert expected == sorted(rows)

    # Crashed run: die mid-delete, after the rename published the
    # compacted dir (the real _delete_dirs removes one input, then the
    # "process" dies).
    root = str(tmp_path / "crash")
    ingest(root)
    real_delete = postings._delete_dirs

    def crashing_delete(spark_, root_, names):
        if names:
            real_delete(spark_, root_, names[:1])
            raise IOError("simulated crash between rename and delete")
        real_delete(spark_, root_, names)

    monkeypatch.setattr(postings, "_delete_dirs", crashing_delete)
    with pytest.raises(IOError, match="simulated crash"):
        postings.compact_postings(spark, root, file_threshold=2)
    monkeypatch.undo()

    # The crash window is observable: stale inputs duplicate their rows.
    dup = [
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(root).select("vec_id", "cell").collect()
    ]
    assert len(dup) > len(rows)

    # Re-run: the repair pre-pass removes the stale inputs named in the
    # published manifest BEFORE snapshotting, so nothing is re-compacted.
    stats = postings.compact_postings(spark, root, file_threshold=2)
    assert stats["repair"]["removed_stale_inputs"]  # healed something
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(root).select("vec_id", "cell").collect()
    )
    assert got == expected


def test_repair_postings_removes_orphan_tmp_and_is_idempotent(
    spark, tmp_path
):
    """A crash BEFORE the rename leaves only a dot-prefixed tmp dir —
    invisible to readers, pure garbage. repair_postings must remove it,
    leave healthy batch dirs alone, and be a no-op when re-run."""
    from ecommerce_data_pipeline_spark.operators import postings

    root = str(tmp_path / "p")
    postings.write_posting_batch(
        _posting_df(spark, [(1, 0), (2, 1)]), root, 0
    )
    orphan = os.path.join(root, ".compact-tmp-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as fh:
        fh.write("junk")
    r1 = postings.repair_postings(spark, root)
    assert r1["removed_tmp_dirs"] == [".compact-tmp-deadbeef"]
    assert not os.path.exists(orphan)
    assert postings._list_batch_dirs(spark, root) == ["batch=b0"]
    r2 = postings.repair_postings(spark, root)
    assert r2 == {"removed_stale_inputs": [], "removed_tmp_dirs": []}
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(root).collect()
    ) == [1, 2]


def test_table_overwrite_swap_crash_self_heals(spark, tmp_path, monkeypatch):
    """Class sweep of the round-12 crash-window fix: Table.overwrite's
    rename-aside → rename-into-place swap has the same
    non-transactional-commit shape as the posting compactor. A crash
    between the two renames used to leave the table path MISSING (readers
    fail) with the old data stranded in a __old_* sibling. repair_swap —
    run automatically by the next overwrite — must roll back to the last
    committed state, and clean uncommitted stages/leftovers."""
    from ecommerce_data_pipeline_spark import lake

    path = str(tmp_path / "t")
    t = lake.ParquetTable(path)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    df2 = spark.createDataFrame([(3, "c")], "id long, s string")
    t.overwrite(df1)

    # Crash between rename(path, old) and rename(tmp, path).
    real_rename = os.rename
    state = {"n": 0}

    def crashing_rename(src, dst):
        real_rename(src, dst)
        state["n"] += 1
        if state["n"] == 1 and dst.startswith(f"{path}__old_"):
            raise OSError("simulated crash between swap renames")

    monkeypatch.setattr(lake.os, "rename", crashing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        t.overwrite(df2)
    monkeypatch.undo()
    assert not os.path.exists(path)  # the observable outage

    # Explicit repair restores the last committed state (rollback: the
    # staged tmp never reached the commit point).
    stats = lake.ParquetTable(path).repair_swap()
    assert stats["restored"] and stats["removed_tmp"]
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == [1, 2]

    # And the automatic pre-pass: crash again, then just overwrite —
    # the new write must land cleanly with no strays left behind.
    state["n"] = 0
    monkeypatch.setattr(lake.os, "rename", crashing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        t.overwrite(df2)
    monkeypatch.undo()
    t.overwrite(df2)
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == [3]
    parent = str(tmp_path)
    strays = [d for d in os.listdir(parent) if "__old_" in d or "__tmp_" in d]
    assert strays == []


def test_table_repair_swap_noop_on_healthy_table(spark, tmp_path):
    """repair_swap on a healthy table (and a crash AFTER the commit point,
    which leaves only a stray __old_ dir) must never touch the live data."""
    from ecommerce_data_pipeline_spark import lake

    path = str(tmp_path / "t")
    t = lake.ParquetTable(path)
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    t.overwrite(df)
    assert t.repair_swap() == {
        "restored": None, "removed_old": [], "removed_tmp": []
    }
    os.makedirs(f"{path}__old_deadbeef")
    stats = t.repair_swap()
    assert stats["removed_old"] == [f"{os.path.basename(path)}__old_deadbeef"]
    assert [r["id"] for r in spark.read.parquet(path).collect()] == [1]


def test_postings_probe_scan_is_partition_pruned(spark, tmp_path):
    """The layout's reason to exist: a probe restricted to its routed
    cells must PRUNE the scan to those cells' directories (static
    partition pruning on the discovered `cell` column), not read the
    whole layout and filter rows. Pinned on the physical plan's
    PartitionFilters."""
    from ecommerce_data_pipeline_spark.operators.postings import (
        write_posting_batch,
    )

    root = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "vec_id long, cell int"
    )
    write_posting_batch(df, root, 0)
    pruned = spark.read.parquet(root).where(F.col("cell").isin([1, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the isin lands in PartitionFilters (directory pruning), leaving no
    # row-level data filter on cell
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "cell" in pf
    got = sorted(
        (r["vec_id"], int(r["cell"])) for r in pruned.collect()
    )
    assert got == sorted((i, i % 4) for i in range(40) if i % 4 in (1, 3))


def test_compact_postings_multigeneration_crash(spark, tmp_path, monkeypatch):
    """Generation 2 compaction consumes generation 1's compacted dir as an
    input; a crash in gen-2's delete phase must still self-heal (the gen-2
    manifest names the gen-1 compact dir AND the fresh batch dirs)."""
    from ecommerce_data_pipeline_spark.operators import postings

    root = str(tmp_path / "p")
    gen1 = [(i, i % 2) for i in range(10)]
    gen2 = [(100 + i, i % 2) for i in range(10)]
    for b in range(2):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in gen1 if r[0] % 2 == b])
            .repartition(2), root, b,
        )
    s1 = postings.compact_postings(spark, root, file_threshold=2)
    assert s1["compacted"]
    for b in range(2, 4):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in gen2 if r[0] % 2 == b % 2])
            .repartition(2), root, b,
        )

    real_delete = postings._delete_dirs

    def crashing_delete(spark_, root_, names):
        if names:
            real_delete(spark_, root_, names[:1])
            raise IOError("simulated gen-2 crash")
        real_delete(spark_, root_, names)

    monkeypatch.setattr(postings, "_delete_dirs", crashing_delete)
    with pytest.raises(IOError, match="simulated gen-2 crash"):
        postings.compact_postings(spark, root, file_threshold=2)
    monkeypatch.undo()

    stats = postings.compact_postings(spark, root, file_threshold=0,
                                      min_input_dirs=1)
    assert stats["repair"]["removed_stale_inputs"]
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(root).select("vec_id", "cell").collect()
    )
    assert got == sorted(gen1 + gen2)


def test_retained_compaction_read_postings_and_vacuum(spark, tmp_path):
    """OPTIMIZE/VACUUM split: retain_inputs=True tombstones the consumed
    dirs instead of deleting them (raw root reads double-count during the
    retention window — that's why readers go through read_postings), the
    manifest-aware read_postings stays exact throughout, repair_postings
    leaves the tombstones alone, and vacuum_postings reclaims them only
    past the retention age."""
    from ecommerce_data_pipeline_spark.operators import postings

    rows = [(i, i % 4) for i in range(40)]
    root = str(tmp_path / "p")
    for b in range(4):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in rows if r[0] % 4 == b]), root, b
        )
    expected = sorted(rows)

    stats = postings.compact_postings(
        spark, root, file_threshold=2, retain_inputs=True
    )
    assert stats["compacted"]
    # Tombstoned inputs are still on disk: a raw read double-counts...
    raw = spark.read.parquet(root).count()
    assert raw == 2 * len(rows)
    # ...while the manifest-aware snapshot read is exact,
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in postings.read_postings(spark, root)
        .select("vec_id", "cell")
        .collect()
    )
    assert got == expected
    # live-file stats ignore the tombstoned dirs (one file per cell).
    assert stats["n_files_after"] < stats["n_files_before"]

    # repair treats retained tombstones as deliberate, not crash debris.
    rep = postings.repair_postings(spark, root)
    assert rep["removed_stale_inputs"] == []
    assert spark.read.parquet(root).count() == raw

    # Young tombstones survive a retention-bounded vacuum...
    vac = postings.vacuum_postings(spark, root, min_age_sec=3600)
    assert vac["removed"] == [] and len(vac["kept_young"]) == 4
    # ...and a zero-retention vacuum reclaims them; raw reads are exact
    # again and read_postings is unchanged.
    vac = postings.vacuum_postings(spark, root, min_age_sec=0)
    assert len(vac["removed"]) == 4
    assert spark.read.parquet(root).count() == len(rows)
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in postings.read_postings(spark, root)
        .select("vec_id", "cell")
        .collect()
    )
    assert got == expected
    # Idempotent once reclaimed.
    assert postings.vacuum_postings(spark, root, 0) == {
        "removed": [], "kept_young": []
    }


def test_read_postings_exact_inside_crash_window(spark, tmp_path, monkeypatch):
    """Even in delete-at-commit mode, read_postings dedups the
    rename-to-delete crash window (compacted dir + stale inputs both
    live) BEFORE any repair runs — the manifest exclusion is the reader's
    own consistency, not just the repairer's."""
    from ecommerce_data_pipeline_spark.operators import postings

    rows = [(i, i % 3) for i in range(30)]
    root = str(tmp_path / "p")
    for b in range(3):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in rows if r[0] % 3 == b]), root, b
        )

    def no_delete(spark_, root_, names):
        if names:
            raise IOError("simulated crash before any delete")

    monkeypatch.setattr(postings, "_delete_dirs", no_delete)
    with pytest.raises(IOError, match="simulated crash"):
        postings.compact_postings(spark, root, file_threshold=2)
    monkeypatch.undo()

    assert spark.read.parquet(root).count() == 2 * len(rows)  # the window
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in postings.read_postings(spark, root)
        .select("vec_id", "cell")
        .collect()
    )
    assert got == sorted(rows)


def test_second_generation_compaction_skips_tombstoned_inputs(
    spark, tmp_path
):
    """A gen-2 compaction while gen-1's tombstoned inputs still linger
    must snapshot only the LIVE dirs (gen-1's compact dir + fresh
    batches) — re-compacting a tombstoned dir would bake its duplicates
    into the new snapshot permanently."""
    from ecommerce_data_pipeline_spark.operators import postings

    gen1 = [(i, i % 3) for i in range(0, 30)]
    gen2 = [(i, i % 3) for i in range(30, 48)]
    root = str(tmp_path / "p")
    for b in range(3):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in gen1 if r[0] % 3 == b]), root, b
        )
    postings.compact_postings(spark, root, file_threshold=2,
                              retain_inputs=True)
    for b in range(3, 6):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in gen2 if r[0] % 3 == b - 3]),
            root, b,
        )
    stats = postings.compact_postings(
        spark, root, file_threshold=0, min_input_dirs=1, retain_inputs=True
    )
    # gen-1 compact + 3 fresh batches; gen-1's 3 tombstoned inputs excluded.
    assert stats["compacted"] and stats["n_input_dirs"] == 4
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in postings.read_postings(spark, root)
        .select("vec_id", "cell")
        .collect()
    )
    assert got == sorted(gen1 + gen2)
    # Vacuum reclaims both generations' tombstones; content unchanged.
    vac = postings.vacuum_postings(spark, root, min_age_sec=0)
    assert len(vac["removed"]) == 7  # 3 gen-1 inputs + gen-1 compact + 3
    assert spark.read.parquet(root).count() == len(gen1) + len(gen2)


def test_legacy_plain_list_manifest_still_repairs(spark, tmp_path):
    """Pre-retention manifests were a bare JSON list (implicitly
    delete-at-commit); repair must still honor them."""
    import json as _json

    from ecommerce_data_pipeline_spark.operators import postings

    rows = [(i, i % 2) for i in range(20)]
    root = str(tmp_path / "p")
    for b in range(2):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in rows if r[0] % 2 == b]), root, b
        )
    postings.compact_postings(spark, root, file_threshold=1,
                              retain_inputs=True)
    # Rewrite the manifest in the legacy format.
    compact = [
        d for d in os.listdir(root) if d.startswith("batch=compact-")
    ][0]
    manifest = os.path.join(root, compact, "_consumed_inputs")
    with open(manifest) as f:
        inputs = _json.load(f)["inputs"]
    with open(manifest, "w") as f:
        _json.dump(inputs, f)
    # Drop the Hadoop local-FS sidecar checksum invalidated by the
    # out-of-band rewrite (real legacy manifests carry a matching crc).
    crc = os.path.join(root, compact, "._consumed_inputs.crc")
    if os.path.exists(crc):
        os.remove(crc)
    rep = postings.repair_postings(spark, root)
    assert sorted(rep["removed_stale_inputs"]) == sorted(inputs)
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(root).select("vec_id", "cell").collect()
    )
    assert got == sorted(rows)


def test_read_postings_cell_filter_stays_partition_pruned(spark, tmp_path):
    """The manifest-aware snapshot read (explicit dir paths + basePath)
    must not cost the layout its point: a cell filter still lands in the
    scan's PartitionFilters, pruning whole cell directories."""
    from ecommerce_data_pipeline_spark.operators import postings

    rows = [(i, (i // 4) % 8) for i in range(80)]
    root = str(tmp_path / "p")
    for b in range(4):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in rows if r[0] % 4 == b]), root, b
        )
    postings.compact_postings(spark, root, file_threshold=2,
                              retain_inputs=True)
    probe = postings.read_postings(spark, root).where(F.col("cell") == 3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "cell" in pf[0].split("PartitionFilters")[1].split("]")[0]
    assert probe.count() == sum(1 for _, c in rows if c == 3)


from hypothesis import given, settings
from hypothesis import strategies as st

_OPS = st.lists(
    st.sampled_from(
        ["append", "compact_retain", "compact_delete", "crash_compact",
         "vacuum0", "vacuum_inf", "repair"]
    ),
    min_size=3,
    max_size=7,
)


@settings(max_examples=8, deadline=None)
@given(_OPS)
def test_read_postings_exact_under_any_lifecycle(spark, tmp_path_factory, ops):
    """Property: read_postings returns EXACTLY the appended rows after
    every prefix of any append/compact/crash/vacuum/repair sequence —
    snapshot consistency can't depend on which maintenance ops ran, in
    what order, or whether one of them crashed mid-delete."""
    from ecommerce_data_pipeline_spark.operators import postings

    root = str(tmp_path_factory.mktemp("prop") / "p")
    expected: set[tuple[int, int]] = set()
    next_batch = 0

    def append():
        nonlocal next_batch
        rows = [
            (100 * next_batch + i, ((100 * next_batch + i) // 2) % 3)
            for i in range(8)
        ]
        postings.write_posting_batch(_posting_df(spark, rows), root,
                                     next_batch)
        expected.update(rows)
        next_batch += 1

    def crash_compact():
        real = postings._delete_dirs

        def boom(spark_, root_, names):
            if names:
                raise IOError("prop-sim crash")
            real(spark_, root_, names)

        postings._delete_dirs = boom
        try:
            postings.compact_postings(spark, root, file_threshold=0,
                                      min_input_dirs=1)
        except IOError:
            pass
        finally:
            postings._delete_dirs = real

    for op in ["append"] + ops:  # guarantee at least one live dir
        if op == "append":
            append()
        elif op == "compact_retain":
            postings.compact_postings(spark, root, file_threshold=0,
                                      min_input_dirs=1, retain_inputs=True)
        elif op == "compact_delete":
            postings.compact_postings(spark, root, file_threshold=0,
                                      min_input_dirs=1)
        elif op == "crash_compact":
            crash_compact()
        elif op == "vacuum0":
            postings.vacuum_postings(spark, root, min_age_sec=0)
        elif op == "vacuum_inf":
            postings.vacuum_postings(spark, root, min_age_sec=1e9)
        elif op == "repair":
            postings.repair_postings(spark, root)
        # Multiset, not set: a set compare is blind to duplicated rows —
        # exactly the failure mode of a tombstoner deleted while its
        # tombstoned inputs survive (the r12 delete-after-retain bug).
        got = sorted(
            (r["vec_id"], int(r["cell"]))
            for r in postings.read_postings(spark, root)
            .select("vec_id", "cell")
            .collect()
        )
        assert got == sorted(expected), (
            f"after {op}: {len(got)} vs {len(expected)}"
        )


def test_vacuum_crash_mid_delete_finishes_on_next_run(
    spark, tmp_path, monkeypatch
):
    """vacuum_postings' crash contract: a kill mid-delete leaves the
    manifest in place, so the next vacuum finishes the reclaim — no state
    where a tombstoned dir becomes unreachable, and snapshot reads stay
    exact throughout."""
    from ecommerce_data_pipeline_spark.operators import postings

    rows = [(i, (i // 4) % 4) for i in range(40)]
    root = str(tmp_path / "p")
    for b in range(4):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in rows if r[0] % 4 == b]), root, b
        )
    postings.compact_postings(spark, root, file_threshold=2,
                              retain_inputs=True)
    real = postings._delete_dirs

    def crashing_delete(spark_, root_, names):
        if names:
            real(spark_, root_, names[:1])
            raise IOError("simulated vacuum crash")
        real(spark_, root_, names)

    monkeypatch.setattr(postings, "_delete_dirs", crashing_delete)
    with pytest.raises(IOError, match="simulated vacuum crash"):
        postings.vacuum_postings(spark, root, min_age_sec=0)
    monkeypatch.undo()

    # Partially reclaimed: some tombstones gone, some linger; snapshot
    # reads are exact either way.
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in postings.read_postings(spark, root)
        .select("vec_id", "cell")
        .collect()
    )
    assert got == sorted(rows)
    vac = postings.vacuum_postings(spark, root, min_age_sec=0)
    assert len(vac["removed"]) == 3  # the crashed run removed 1 of 4
    assert spark.read.parquet(root).count() == len(rows)
    assert postings.vacuum_postings(spark, root, 0)["removed"] == []
