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
