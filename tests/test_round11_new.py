"""Round-11 additions: interchange-reader storage contract (cache opt-in,
null/empty wire pinning, multiline mode), ANN postings idempotency +
compaction, IVF-routed contamination audit."""

from __future__ import annotations

import os

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_interchange_readers_do_not_cache_by_default(spark, tmp_path):
    """Round-10's readers cached the full parsed corpus unconditionally —
    an anti-pattern at 100 TB. Default reads must leave the block manager
    untouched even after BOTH splits are consumed."""
    from ecommerce_data_pipeline_spark.sources.corpus_io import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )
    from ecommerce_data_pipeline_spark.sources.tabular_io import (
        read_tbl,
        write_tbl,
    )

    docs = spark.createDataFrame(
        [(1, "alpha", "en", "a", 5), (2, "beta", "en", "b", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    jpath = str(tmp_path / "j")
    write_corpus_jsonl(docs, jpath, n_shards=1)
    tdf = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    tpath = str(tmp_path / "t")
    write_tbl(tdf, tpath, n_shards=1)

    before = _n_persistent_rdds(spark)
    good_j, quar_j = read_corpus_jsonl(spark, jpath)
    good_t, quar_t = read_tbl(spark, tpath, tdf.schema)
    assert good_j.count() == 2 and quar_j.count() == 0
    assert good_t.count() == 2 and quar_t.count() == 0
    assert _n_persistent_rdds(spark) == before


def test_interchange_persisted_mode_returns_unpersist_handle(spark, tmp_path):
    """Opt-in persisted mode: one shared parse at the declared level,
    and return_raw=True hands back the frame so the caller can unpersist
    (round-10 leaked cached blocks across the 200-query bench session)."""
    from ecommerce_data_pipeline_spark.sources.corpus_io import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}", "en", "s", 2) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "p")
    write_corpus_jsonl(docs, path, n_shards=1)
    good, quar, raw = read_corpus_jsonl(
        spark, path, storage_level=StorageLevel.MEMORY_AND_DISK, return_raw=True
    )
    assert good.count() == 10 and quar.count() == 0
    assert raw.storageLevel.useMemory or raw.storageLevel.useDisk
    raw.unpersist(blocking=True)
    assert not (raw.storageLevel.useMemory or raw.storageLevel.useDisk)


def test_tbl_null_vs_empty_string_roundtrip(spark, tmp_path):
    """Wire pinning (\\N for NULL, quoted "" for empty): null and empty
    string must survive the round trip as DISTINCT values — Spark's CSV
    defaults collapse both to null on read."""
    from ecommerce_data_pipeline_spark.sources.tabular_io import (
        read_tbl,
        write_tbl,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, None), (4, "has|pipe")],
        "id long, s string",
    )
    path = str(tmp_path / "ne")
    write_tbl(df, path, n_shards=1)
    good, quar = read_tbl(spark, path, df.schema)
    assert quar.count() == 0
    got = {r["id"]: r["s"] for r in good.collect()}
    assert got == {1: "hello", 2: "", 3: None, 4: "has|pipe"}


def test_tbl_multiline_strings_mode(spark, tmp_path):
    """Embedded newlines are out of the default line-oriented contract;
    multiline_strings=True (whole-file parse, explicit storage_level
    required because the line-reparse quarantine would be wrong) must
    round-trip them exactly."""
    from ecommerce_data_pipeline_spark.sources.tabular_io import (
        read_tbl,
        write_tbl,
    )

    df = spark.createDataFrame(
        [(1, "line1\nline2"), (2, "plain")], "id long, s string"
    )
    path = str(tmp_path / "ml")
    write_tbl(df, path, n_shards=1)
    with pytest.raises(ValueError, match="storage_level"):
        read_tbl(spark, path, df.schema, multiline_strings=True)
    good, quar, raw = read_tbl(
        spark,
        path,
        df.schema,
        storage_level=StorageLevel.MEMORY_AND_DISK,
        return_raw=True,
        multiline_strings=True,
    )
    try:
        assert quar.count() == 0
        got = {r["id"]: r["s"] for r in good.collect()}
        assert got == {1: "line1\nline2", 2: "plain"}
    finally:
        raw.unpersist(blocking=True)


def _posting_df(spark, ids_cells):
    return spark.createDataFrame(ids_cells, "vec_id long, cell int")


def test_write_posting_batch_retry_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the same batch id must
    overwrite its own batch directory, not append a duplicate copy."""
    from ecommerce_data_pipeline_spark.operators.postings import (
        write_posting_batch,
    )

    root = str(tmp_path / "p")
    df = _posting_df(spark, [(1, 0), (2, 1), (3, 0)])
    write_posting_batch(df, root, 7)
    write_posting_batch(df, root, 7)  # simulated retry
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(root).select("vec_id", "cell").collect()
    )
    assert got == [(1, 0), (2, 1), (3, 0)]


def test_compact_postings_preserves_rows_and_shrinks_files(spark, tmp_path):
    """Compaction must be content-neutral (same multiset of rows), must
    actually shrink the file count, and must leave a layout the plain
    partition-discovery read still understands."""
    from ecommerce_data_pipeline_spark.operators.postings import (
        _count_files,
        _list_batch_dirs,
        compact_postings,
        write_posting_batch,
    )

    root = str(tmp_path / "p")
    rows = [(i, i % 3) for i in range(60)]
    for b in range(5):
        write_posting_batch(
            _posting_df(spark, [r for r in rows if r[0] % 5 == b]).repartition(4),
            root,
            b,
        )
    before_files = _count_files(spark, root)
    stats = compact_postings(spark, root, file_threshold=4)
    assert stats["compacted"] is True
    assert stats["n_input_dirs"] == 5
    assert stats["n_files_after"] < before_files
    dirs = _list_batch_dirs(spark, root)
    assert len(dirs) == 1 and dirs[0].startswith("batch=compact-")
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(root).select("vec_id", "cell").collect()
    )
    assert got == sorted(rows)
    # one file per cell in the compacted dir (3 cells)
    assert stats["n_files_after"] == 3


def test_compact_postings_noop_below_thresholds(spark, tmp_path):
    """Rewriting one big file into another is write amplification — below
    min_input_dirs / file_threshold the operator must not touch the
    layout."""
    from ecommerce_data_pipeline_spark.operators.postings import (
        _list_batch_dirs,
        compact_postings,
        write_posting_batch,
    )

    root = str(tmp_path / "p")
    write_posting_batch(_posting_df(spark, [(1, 0), (2, 1)]).coalesce(1), root, 0)
    stats = compact_postings(spark, root, file_threshold=4)
    assert stats["compacted"] is False
    assert _list_batch_dirs(spark, root) == ["batch=b0"]


def test_dup_span_runs_template_block_vs_scattered(spark, sf_dir_factory):
    """A 15-word template block shared by two docs must surface as ONE
    contiguous run of 8 duplicated 8-word spans (15-8+1); the same
    material scattered as two isolated 8-word blocks must cap the run at
    1 — the distinction is exactly what the trim/keep decision needs."""
    from ecommerce_data_pipeline_spark.queries import QUERIES

    s = [f"s{i}" for i in range(1, 16)]  # the shared 15-word block
    doc_a = " ".join([f"a{i}" for i in range(1, 6)] + s + [f"y{i}" for i in range(1, 6)])
    doc_b = " ".join(s + [f"z{i}" for i in range(1, 11)])
    doc_c = " ".join(s[:8] + [f"c{i}" for i in range(1, 11)] + s[7:])
    doc_d = " ".join(f"d{i}" for i in range(1, 20))  # fully unique
    sf = sf_dir_factory(
        documents=[
            (1, doc_a, "en", "t", len(doc_a)),
            (2, doc_b, "en", "t", len(doc_b)),
            (3, doc_c, "en", "t", len(doc_c)),
            (4, doc_d, "en", "t", len(doc_d)),
        ]
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["max_dup_run"])
        for r in QUERIES["dup_span_runs"](spark, sf).collect()
    }
    # doc A: 25 words -> 18 spans; spans fully inside the block: run of 8
    assert got[1] == (18, 8)
    # doc B: 25 words, block at the start: same 8-span run
    assert got[2] == (18, 8)
    # doc C: two isolated 8-word shared windows -> runs of length 1
    assert got[3][1] == 1
    # doc D: nothing shared
    assert got[4] == (12, 0)


from hypothesis import given, settings
from hypothesis import strategies as st

# Line-oriented .tbl wire contract: any single-line printable string (the
# whole-field NULL token \N is the documented out-of-contract exception),
# plus nulls and empties, in any mix.
_tbl_values = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                blacklist_characters="\n\r", blacklist_categories=("Cs",)
            ),
            max_size=20,
        ).filter(lambda s: s != "\\N"),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(_tbl_values)
def test_tbl_wire_roundtrip_property(spark, tmp_path_factory, vals):
    """PROPERTY: every in-contract value multiset survives the .tbl
    write→read round trip exactly — nulls stay null, empties stay empty,
    padding/pipes/quotes/unicode survive, nothing quarantines."""
    from ecommerce_data_pipeline_spark.sources.tabular_io import (
        read_tbl,
        write_tbl,
    )

    path = str(tmp_path_factory.mktemp("tblprop") / "t")
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, s string"
    )
    write_tbl(df, path, n_shards=1)
    good, quar = read_tbl(spark, path, df.schema)
    assert quar.count() == 0
    got = {r["id"]: r["s"] for r in good.collect()}
    assert got == {i: v for i, v in enumerate(vals)}


def test_recursive_cte_semantics_agree_with_duckdb(spark):
    """Engine-to-engine pin for part_reachability_rcte: Spark 4's
    WITH RECURSIVE (UNION ALL + per-level DISTINCT frontier) must produce
    the same BFS min-hop set as DuckDB on a known graph — a square with a
    chord plus a disconnected pair (unreachable nodes excluded by both)."""
    import duckdb

    sql = """
WITH RECURSIVE
sym(u, v) AS (
  SELECT * FROM (VALUES (1,2),(2,1),(2,3),(3,2),(3,4),(4,3),(4,1),(1,4),
                        (5,6),(6,5)) AS t(u,v)
),
walk(node, hop) AS (
  SELECT 1, 0
  UNION ALL
  SELECT DISTINCT sym.v, walk.hop + 1
  FROM walk JOIN sym ON sym.u = walk.node
  WHERE walk.hop < 3
)
SELECT node, min(hop) AS min_hops FROM walk GROUP BY node ORDER BY node
"""
    got_spark = [(r["node"], r["min_hops"]) for r in spark.sql(sql).collect()]
    got_duck = duckdb.sql(sql).fetchall()
    assert got_spark == [(1, 0), (2, 1), (3, 2), (4, 1)]
    assert [tuple(r) for r in got_duck] == got_spark


def test_linear_quality_classifier_empty_and_known_doc(spark, sf_dir_factory):
    """Edge pinning for the linear classifier: an empty document scores
    exactly the bias (no tokens → fold identity), and a known one-token
    doc scores bias + that token's hashed weight."""
    import hashlib

    from ecommerce_data_pipeline_spark.queries import QUERIES
    from ecommerce_data_pipeline_spark.queries.llm_text import (
        _CLF_BIAS,
        _CLF_DIM,
        _clf_weights,
    )

    sf = sf_dir_factory(
        documents=[
            (1, "", "en", "t", 0),
            (2, "hello", "en", "t", 5),
            (3, "...!!!", "en", "t", 6),  # strips to zero tokens
        ]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["quality_logit"], r["keep"])
        for r in QUERIES["linear_quality_classifier"](spark, sf).collect()
    }
    assert got[1] == (0, round(_CLF_BIAS, 4), _CLF_BIAS >= 0)
    assert got[3] == (0, round(_CLF_BIAS, 4), _CLF_BIAS >= 0)
    h = int(hashlib.md5(b"hello").hexdigest()[:15], 16) % _CLF_DIM
    expected = round(_CLF_BIAS + _clf_weights()[h], 4)
    assert got[2] == (1, expected, expected >= 0)


def test_compact_postings_concurrent_append_survives(spark, tmp_path, monkeypatch):
    """The documented compaction guarantee: batches that land AFTER the
    snapshot listing are untouched — simulated by pinning the listing to a
    stale snapshot, then writing a late batch before the compactor reads,
    rewrites, and deletes. The late batch's rows must survive alongside
    the compacted output."""
    from ecommerce_data_pipeline_spark.operators import postings

    root = str(tmp_path / "p")
    early = [(i, i % 2) for i in range(20)]
    late = [(100 + i, i % 2) for i in range(5)]
    for b in range(2):
        postings.write_posting_batch(
            _posting_df(spark, [r for r in early if r[0] % 2 == b]).repartition(3),
            root,
            b,
        )
    snapshot = postings._list_batch_dirs(spark, root)  # pre-append listing
    postings.write_posting_batch(_posting_df(spark, late), root, 99)
    monkeypatch.setattr(
        postings, "_list_batch_dirs", lambda _spark, _root: snapshot
    )
    stats = postings.compact_postings(spark, root, file_threshold=2)
    assert stats["compacted"] is True and stats["n_input_dirs"] == 2
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(root).select("vec_id", "cell").collect()
    )
    assert got == sorted(early + late)
    monkeypatch.undo()
    dirs = postings._list_batch_dirs(spark, root)
    assert "batch=b99" in dirs and len(dirs) == 2  # late batch + compacted


from hypothesis import HealthCheck


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=2, max_value=4),
)
def test_compact_postings_content_neutral_property(
    spark, tmp_path_factory, rows, n_batches
):
    """PROPERTY: for any posting multiset split across any number of
    batches, compaction preserves exactly the rows (no loss, no dup, no
    re-celling) and leaves one file per populated cell."""
    from ecommerce_data_pipeline_spark.operators.postings import (
        _count_files,
        compact_postings,
        write_posting_batch,
    )

    root = str(tmp_path_factory.mktemp("cprop") / "p")
    for b in range(n_batches):
        part = [r for i, r in enumerate(rows) if i % n_batches == b]
        if part:
            write_posting_batch(_posting_df(spark, part).repartition(2), root, b)
    stats = compact_postings(spark, root, file_threshold=0, min_input_dirs=1)
    got = sorted(
        (r["vec_id"], int(r["cell"]))
        for r in spark.read.parquet(root).select("vec_id", "cell").collect()
    )
    assert got == sorted(rows)
    if stats["compacted"]:
        assert _count_files(spark, root) == len({c for _, c in rows})


def test_interchange_good_split_parity_cached_vs_uncached(spark, tmp_path):
    """The uncached good split and the persisted-mode good split (both a
    full-struct reparse since round 12) must select EXACTLY the same
    rows in the presence of corrupt, ragged, and type-broken lines — the
    two formulations are interchangeable by contract."""
    from pyspark import StorageLevel

    from ecommerce_data_pipeline_spark.sources.corpus_io import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )
    from ecommerce_data_pipeline_spark.sources.tabular_io import (
        read_tbl,
        write_tbl,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}", "en", "s", 2) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    jpath = str(tmp_path / "j")
    write_corpus_jsonl(docs, jpath, n_shards=1)
    with open(f"{jpath}/part-bad.json", "w") as fh:
        fh.write('NOT JSON\n{"doc_id": "notanint", "text": 5}\n{"doc_id": 99}\n')
    g_un, q_un = read_corpus_jsonl(spark, jpath)
    g_ca, q_ca, raw = read_corpus_jsonl(
        spark, jpath, storage_level=StorageLevel.MEMORY_AND_DISK, return_raw=True
    )
    try:
        key = lambda df: sorted(  # noqa: E731
            (r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()
        )
        assert key(g_un) == key(g_ca)
        assert q_un.count() == q_ca.count()
    finally:
        raw.unpersist(blocking=True)

    tdf = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double")
    tpath = str(tmp_path / "t")
    write_tbl(tdf, tpath, n_shards=1)
    with open(f"{tpath}/part-bad.csv", "w") as fh:
        fh.write("notanint|x|1.0\n3|short\n4|ok|9.5|extra\n5|fine|7.25\n")
    g_un, q_un = read_tbl(spark, tpath, tdf.schema)
    g_ca, q_ca, raw = read_tbl(
        spark, tpath, tdf.schema,
        storage_level=StorageLevel.MEMORY_AND_DISK, return_raw=True,
    )
    try:
        keyt = lambda df: sorted(  # noqa: E731
            (r["id"], r["s"], r["v"]) for r in df.collect()
        )
        assert keyt(g_un) == keyt(g_ca)
        assert q_un.count() == q_ca.count()
    finally:
        raw.unpersist(blocking=True)


def test_tbl_dbgen_trailing_delimiter(spark, tmp_path):
    """Drop-in dbgen compat: genuine dbgen files terminate every line
    with the separator — dbgen_trailing_delimiter=True must parse them
    cleanly (both storage modes), junk after the final pipe must
    quarantine not silently drop, and write_tbl(trailing_delimiter=True)
    must emit the canonical byte shape and round-trip."""
    import os

    from pyspark import StorageLevel

    from ecommerce_data_pipeline_spark.sources.tabular_io import (
        read_tbl,
        write_tbl,
    )

    schema = spark.createDataFrame(
        [(1, "a", 1.5)], "id long, s string, v double"
    ).schema
    # Hand-written dbgen-style file (the real-world ingest case).
    src = str(tmp_path / "dbgen")
    os.makedirs(src)
    with open(f"{src}/orders.tbl", "w") as fh:
        fh.write("1|alpha|1.5|\n2|beta|2.5|\n3|junky|3.5|EXTRA\n")
    good, quar = read_tbl(spark, src, schema, dbgen_trailing_delimiter=True)
    assert sorted((r["id"], r["s"], r["v"]) for r in good.collect()) == [
        (1, "alpha", 1.5),
        (2, "beta", 2.5),
    ]
    assert quar.count() == 1 and "EXTRA" in quar.collect()[0]["raw_line"]
    # Persisted mode selects the same split.
    g2, q2, raw = read_tbl(
        spark, src, schema,
        storage_level=StorageLevel.MEMORY_AND_DISK, return_raw=True,
        dbgen_trailing_delimiter=True,
    )
    try:
        assert sorted((r["id"], r["s"], r["v"]) for r in g2.collect()) == [
            (1, "alpha", 1.5),
            (2, "beta", 2.5),
        ]
        assert q2.count() == 1
    finally:
        raw.unpersist(blocking=True)
    # Canonical write: every emitted line ends with a bare pipe.
    df = spark.createDataFrame([(1, "x", 9.25), (2, "y", 0.5)], schema)
    out = str(tmp_path / "w")
    write_tbl(df, out, n_shards=1, trailing_delimiter=True)
    lines = []
    for f in os.listdir(out):
        if f.startswith("part"):
            lines += open(os.path.join(out, f)).read().splitlines()
    assert lines and all(ln.endswith("|") and not ln.endswith('""|') for ln in lines)
    back, bq = read_tbl(spark, out, schema, dbgen_trailing_delimiter=True)
    assert bq.count() == 0
    assert sorted((r["id"], r["s"], r["v"]) for r in back.collect()) == [
        (1, "x", 9.25),
        (2, "y", 0.5),
    ]
