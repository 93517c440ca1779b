"""Round-10 additions: bag-semantics set ops, shingle novelty, and the
embedding contamination audit — toy-fixture goldens for each new query.
"""

from __future__ import annotations

import datetime as dt

from ecommerce_data_pipeline_spark.queries import QUERIES


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 12, minute)


def _event(eid, minute, uid, etype):
    return (eid, _ts(minute), uid, etype, 1.0, "{}")


def test_bag_set_ops_multiplicity(spark, sf_dir_factory):
    # user 1, one day: 3 views vs 1 purchase -> EXCEPT ALL keeps 2 copies,
    # INTERSECT ALL keeps 1 (set semantics would say 0 and 1).
    # user 2: 1 view, 2 purchases -> 0 unconverted, 1 converted.
    # user 3: 2 views, no purchase -> 2 unconverted, 0 converted.
    sf = sf_dir_factory(
        events=[
            _event(1, 0, 1, "view"),
            _event(2, 1, 1, "view"),
            _event(3, 2, 1, "view"),
            _event(4, 3, 1, "purchase"),
            _event(5, 0, 2, "view"),
            _event(6, 1, 2, "purchase"),
            _event(7, 2, 2, "purchase"),
            _event(8, 0, 3, "view"),
            _event(9, 1, 3, "view"),
        ]
    )
    rows = {
        r["user_id"]: (r["unconverted_views"], r["converted_views"])
        for r in QUERIES["bag_set_ops"](spark, sf).collect()
    }
    assert rows == {1: (2, 1), 2: (0, 1), 3: (2, 0)}


def test_bag_set_ops_day_boundary(spark, sf_dir_factory):
    # A purchase on a DIFFERENT day must not absorb a view token: the bag
    # element is (user, day), not user.
    sf = sf_dir_factory(
        events=[
            (1, dt.datetime(2024, 3, 1, 23, 59), 7, "view", 1.0, "{}"),
            (2, dt.datetime(2024, 3, 2, 0, 1), 7, "purchase", 1.0, "{}"),
        ]
    )
    rows = QUERIES["bag_set_ops"](spark, sf).collect()
    assert {(r["user_id"], r["unconverted_views"], r["converted_views"]) for r in rows} == {
        (7, 1, 0)
    }


def test_shingle_novelty_first_owner(spark, sf_dir_factory):
    # doc 1 (source a) introduces every shingle of TEXT; doc 2 (source b)
    # is an exact copy, so source b introduces nothing; doc 3 (source b)
    # is disjoint content and introduces all of its own shingles.
    text = "abcdefghijklmnop"  # 16 chars -> 5 distinct 12-shingles
    other = "zyxwvutsrqponmlk"
    sf = sf_dir_factory(
        documents=[
            (1, text, "en", "a", len(text)),
            (2, text, "en", "b", len(text)),
            (3, other, "en", "b", len(other)),
        ]
    )
    rows = {
        r["source"]: (
            r["shingle_occurrences"],
            r["novel_shingles"],
            r["novelty_rate"],
        )
        for r in QUERIES["shingle_novelty_curve"](spark, sf).collect()
    }
    assert rows["a"] == (5, 5, 1.0)
    # source b: 10 occurrences (5 copied + 5 fresh), only the fresh 5 novel
    assert rows["b"] == (10, 5, 0.5)


def test_eval_contamination_flags_near_dup_train_vector(spark, sf_dir_factory):
    # vec 0 is the eval probe (0 % 20 == 0); vec 1 duplicates it (cosine
    # 1.0 -> contaminated), vec 2 is orthogonal. Nearest train id must be
    # the duplicate, not the orthogonal vector.
    sf = sf_dir_factory(
        embeddings=[
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [1.0, 0.0, 0.0, 0.0], 1),
            (2, [0.0, 1.0, 0.0, 0.0], 2),
        ]
    )
    rows = QUERIES["eval_contamination_embedding"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["eval_id"], r["nearest_train_id"]) == (0, 1)
    assert r["max_cosine"] == 1.0 and r["contaminated"] is True


def test_eval_contamination_below_threshold(spark, sf_dir_factory):
    sf = sf_dir_factory(
        embeddings=[
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [0.1, 1.0, 0.0, 0.0], 1),
        ]
    )
    r = QUERIES["eval_contamination_embedding"](spark, sf).collect()[0]
    assert r["contaminated"] is False and r["nearest_train_id"] == 1


def test_stream_fold_states_tws_equals_batch_fold(spark, tmp_path):
    """Spark 4 transformWithStateInPandas twin of the ST7 state machine:
    micro-batched fold over named ValueState must land on the same per-key
    states as the batch fold. Auto-skips where the TWS protobuf protocol
    dependency is absent (this sandbox); the applyInPandasWithState twin
    is the always-runnable path (test_streaming.py)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    from ecommerce_data_pipeline_spark.operators.state import fold_state_events
    from ecommerce_data_pipeline_spark.streaming.stateful import (
        stream_fold_states_tws,
    )
    from ecommerce_data_pipeline_spark.streaming.statestore import rocksdb_state

    events = spark.createDataFrame(
        [
            ("o1", "CREATED", dt.datetime(2024, 1, 1, 10, 0)),
            ("o1", "PAID", dt.datetime(2024, 1, 1, 10, 5)),
            ("o1", "PAID", dt.datetime(2024, 1, 1, 10, 3)),
            ("o2", "CREATED", dt.datetime(2024, 1, 1, 11, 0)),
            ("o2", "BOGUS", dt.datetime(2024, 1, 1, 11, 1)),
            ("o3", "PAID", dt.datetime(2024, 1, 1, 12, 0)),
            ("o3", "CREATED", dt.datetime(2024, 1, 1, 11, 59)),
        ],
        "order_id string, state string, event_ts timestamp",
    )
    src = str(tmp_path / "src")
    events.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    with rocksdb_state(spark):
        q = (
            stream_fold_states_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_folded")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.sql(
        """SELECT order_id, state, state_ts, n_events FROM (
             SELECT *, row_number() OVER (PARTITION BY order_id
                 ORDER BY n_events DESC) rn FROM tws_folded) WHERE rn=1"""
    )
    got = {r["order_id"]: r for r in out.collect()}
    batch = {r["order_id"]: r for r in fold_state_events(events).collect()}
    assert set(got) == set(batch) == {"o1", "o2", "o3"}
    for k in batch:
        assert got[k]["state"] == batch[k]["state"], k
        assert got[k]["state_ts"] == batch[k]["state_ts"], k
        assert got[k]["n_events"] == batch[k]["n_events"], k


def test_fact_view_operators_match_inline_forms(spark):
    # Pin the two gold-view operators (fact.vw_sales_last_n_minutes,
    # fact.recent_sales_top_k) to the semantics the certified registry
    # queries implement inline — the view DDL (sources/sinks.py) and the
    # dashboard query must stay interchangeable with these helpers.
    from ecommerce_data_pipeline_spark.operators import fact as fc

    rows = [
        (dt.datetime(2024, 3, 1, 10, 0) + dt.timedelta(minutes=m), float(m), m)
        for m in range(0, 180, 7)
    ]
    fct = spark.createDataFrame(
        rows, "minute_bucket timestamp, gmv double, paid_orders int"
    )
    anchor = max(r[0] for r in rows)
    got_view = {
        r["minute_bucket"]
        for r in fc.vw_sales_last_n_minutes(fct, 60, anchor=anchor).collect()
    }
    want_view = {t for t, _g, _p in rows if t >= anchor - dt.timedelta(minutes=60)}
    assert got_view == want_view
    got_top = [r["minute_bucket"] for r in fc.recent_sales_top_k(fct, 10).collect()]
    assert got_top == sorted((t for t, _g, _p in rows), reverse=True)[:10]


def test_jsonl_reader_quarantines_corrupt_lines(spark, tmp_path):
    """One malformed line in a JSONL shard must land in the quarantine
    frame as its raw text — never kill the read, never leak into good."""
    from ecommerce_data_pipeline_spark.sources.corpus_io import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )

    docs = spark.createDataFrame(
        [(1, "alpha", "en", "a", 5), (2, "beta", "en", "b", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "corpus")
    write_corpus_jsonl(docs, path, n_shards=1)
    with open(f"{tmp_path}/corpus/part-badline.json", "w") as fh:
        fh.write('{"doc_id": 3, "text": "gamma", BROKEN\n')
    good, quarantine = read_corpus_jsonl(spark, path)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    bad = quarantine.collect()
    assert len(bad) == 1 and "BROKEN" in bad[0]["raw_line"]


def test_jsonl_roundtrip_lossless_on_hostile_text(spark, tmp_path):
    """Escaping-hostile text (newlines, quotes, backslashes, unicode,
    tabs) must survive the JSONL write→read round trip byte-identically."""
    from ecommerce_data_pipeline_spark.sources.corpus_io import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )

    hostile = [
        'he said "quote" then \\ backslash',
        "line1\nline2\r\nline3",
        "tab\there — ünïcødé ✓ 中文",
        "",
        "trailing space ",
    ]
    docs = spark.createDataFrame(
        [(i, t, "xx", "s", len(t)) for i, t in enumerate(hostile)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "hostile")
    write_corpus_jsonl(docs, path, n_shards=1)
    good, quarantine = read_corpus_jsonl(spark, path)
    assert quarantine.count() == 0
    got = {r["doc_id"]: r["text"] for r in good.collect()}
    assert got == {i: t for i, t in enumerate(hostile)}


def test_tbl_reader_quarantines_corrupt_lines(spark, tmp_path):
    """A ragged pipe-delimited line (wrong column count / unparseable
    types) must quarantine, not fail the read or pollute good rows."""
    from ecommerce_data_pipeline_spark.sources.tabular_io import (
        read_tbl,
        write_tbl,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, v double"
    )
    path = str(tmp_path / "tbl")
    write_tbl(df, path, n_shards=1)
    with open(f"{tmp_path}/tbl/part-badline.csv", "w") as fh:
        fh.write("notanint|x|y|extra|cols\n")
    good, quarantine = read_tbl(spark, path, df.schema)
    assert {r["id"] for r in good.collect()} == {1, 2}
    bad = quarantine.collect()
    assert len(bad) == 1 and "notanint" in bad[0]["raw_line"]


def test_jsonl_gzip_shards_roundtrip(spark, tmp_path):
    """Gzipped shards (how corpora actually ship) must round-trip
    identically: .json.gz part files on disk, lossless content back."""
    import os

    from ecommerce_data_pipeline_spark.sources.corpus_io import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} body\nline2", "en", "s", 15) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "gz")
    write_corpus_jsonl(docs, path, n_shards=4, compression="gzip")
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert parts and all(f.endswith(".json.gz") for f in parts)
    good, quarantine = read_corpus_jsonl(spark, path)
    assert quarantine.count() == 0
    assert {r["doc_id"] for r in good.collect()} == set(range(20))


def test_restart_from_checkpoint_no_dup_no_loss(spark, tmp_path):
    """ST2's recovery contract, tested as an actual RESTART: a first
    availableNow drain consumes the staged files, the source grows, and a
    brand-new query object started against the SAME checkpoint must pick
    up exactly the new files — no reprocessing of committed offsets, no
    gaps. (The replay-idempotency test covers at-least-once tolerance in
    the MERGE; this covers the checkpoint's own offset tracking.)"""
    src, out, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )

    def stage(ids):
        spark.createDataFrame([(i,) for i in ids], "id long").coalesce(
            1
        ).write.mode("append").parquet(src)

    def drain():
        schema = spark.read.parquet(src).schema
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    stage([0, 1, 2])
    drain()
    first = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert first == [0, 1, 2]
    stage([3, 4, 5])
    drain()  # NEW query object, same checkpoint
    final = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert final == [0, 1, 2, 3, 4, 5]  # no dups, no loss


def test_minhash_signatures_equal_numpy_band_kernel(spark):
    """minhash_signatures (pure SQL aggregates) is the cross-implementation
    verifier of the Arrow/numpy band kernel (_profile_buckets): identical
    affine permutations must produce identical per-doc mins, and therefore
    the identical band co-bucketing — the LSH recall math both paths share.
    """
    import numpy as np

    from ecommerce_data_pipeline_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en", "a", 44),
            (2, "the quick brown fox jumps over the lazy dog", "en", "a", 44),
            (3, "pack my box with five dozen liquor jugs", "en", "b", 40),
            (4, "sphinx of black quartz judge my vow", "en", "b", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    n_hashes, n_bands = 32, 8
    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in dd.minhash_signatures(docs, n_hashes=n_hashes).collect()
    }
    # Recompute the mins numpy-side from the shared shingle-hash profile,
    # with the same affine maps the band kernel uses.
    prof = {
        r["doc_id"]: np.asarray(r["shingles"], dtype=np.int64)
        for r in dd._minhash_profile(docs, 12, "text", "doc_id").collect()
    }
    a = np.array(
        [(i * dd._A_MULT) % dd.MINHASH_PRIME for i in range(1, n_hashes + 1)],
        dtype=np.int64,
    )[:, None]
    b = np.array(
        [(i * dd._B_MULT) % dd.MINHASH_PRIME for i in range(1, n_hashes + 1)],
        dtype=np.int64,
    )[:, None]
    for doc_id, h in prof.items():
        mins = ((a * (h[None, :] % dd.MINHASH_PRIME) + b) % dd.MINHASH_PRIME).min(
            axis=1
        )
        assert sigs[doc_id] == mins.tolist(), doc_id
    # Same mins => same band co-bucketing: the exact-duplicate pair (1,2)
    # collides in EVERY band on both paths; disjoint docs collide in none.
    def cobucketed(bucket_df):
        rows = bucket_df.collect()
        by_bb = {}
        for r in rows:
            by_bb.setdefault((r["band"], r["bucket"]), set()).add(r["doc_id"])
        pairs = set()
        for docs_in in by_bb.values():
            for x in docs_in:
                for y in docs_in:
                    if x < y:
                        pairs.add((x, y))
        return pairs

    sig_df = dd.minhash_signatures(docs, n_hashes=n_hashes)
    p1 = cobucketed(dd._lsh_buckets(sig_df, n_hashes, n_bands))
    p2 = cobucketed(
        dd._profile_buckets(
            dd._minhash_profile(docs, 12, "text", "doc_id"), n_hashes, n_bands
        )
    )
    assert p1 == p2 == {(1, 2)}


# ---------------------------------------------------------------------------
# Property tests: the new queries against pure-Python models
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# (user, day, n_views, n_purchases) — one slot per (user, day)
_slots = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=4),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: (t[0], t[1]),
)


def _write_sf(spark, tables):
    import tempfile

    root = tempfile.mkdtemp(prefix="r10prop_")
    schemas = {
        "events": (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ),
        "documents": (
            "doc_id long, text string, lang string, source string, n_chars long"
        ),
    }
    for name, rows in tables.items():
        spark.createDataFrame(rows, schemas[name]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/{name}.parquet")
    return root


@settings(max_examples=8, deadline=None)
@given(_slots)
def test_bag_set_ops_matches_multiset_model(spark, slots):
    """For ANY (user, day, views, purchases) multiset: per-user
    unconverted == sum max(v-p, 0), converted == sum min(v, p), and a row
    exists iff the user has at least one view token."""
    import shutil

    rows, eid = [], 0
    for u, d, nv, np_ in slots:
        for kind, n in (("view", nv), ("purchase", np_)):
            for j in range(n):
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 3, 1 + d, 8, j), u, kind, 1.0, "{}")
                )
    if not rows:
        rows = [(1, dt.datetime(2024, 3, 1), 0, "click", 1.0, "{}")]
    root = _write_sf(spark, {"events": rows})
    try:
        got = {
            r["user_id"]: (r["unconverted_views"], r["converted_views"])
            for r in QUERIES["bag_set_ops"](spark, root).collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    want = {}
    for u, _d, nv, np_ in slots:
        uc, cv = want.get(u, (0, 0))
        want[u] = (uc + max(nv - np_, 0), cv + min(nv, np_))
    want = {u: t for u, t in want.items() if sum(
        nv for uu, _dd, nv, _pp in slots if uu == u) > 0}
    assert got == want


_docs = st.lists(
    st.tuples(st.text(alphabet="abc", max_size=25), st.sampled_from(["s1", "s2"])),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None)
@given(_docs)
def test_shingle_novelty_matches_set_model(spark, docs):
    """For ANY corpus: per-source occurrence and first-owner novelty counts
    equal the brute-force shingle-set model (k=12; short/empty docs yield
    the whole string as their single shingle, matching char_shingles)."""
    import shutil

    rows = [
        (i + 1, text, "en", src, len(text)) for i, (text, src) in enumerate(docs)
    ]
    root = _write_sf(spark, {"documents": rows})
    try:
        got = {
            r["source"]: (r["shingle_occurrences"], r["novel_shingles"])
            for r in QUERIES["shingle_novelty_curve"](spark, root).collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    def shingles(t: str) -> set:
        t = t.lower()
        n = max(len(t) - 11, 1)
        return {t[i : i + 12] for i in range(n)}

    owner: dict = {}
    occ: dict = {}
    for doc_id, text, _lang, src, _n in rows:
        sh = shingles(text)
        occ[src] = occ.get(src, 0) + len(sh)
        for s in sh:
            owner[s] = min(owner.get(s, doc_id), doc_id)
    novel: dict = {}
    src_of = {doc_id: src for doc_id, _t, _l, src, _n in rows}
    for s, d in owner.items():
        novel[src_of[d]] = novel.get(src_of[d], 0) + 1
    want = {s: (occ[s], novel.get(s, 0)) for s in occ}
    assert got == want


def test_revenue_trend_accumulates_in_decimal():
    # ADVICE r9: the OLS sufficient statistics must accumulate AS
    # decimal(38,0), not sum in int64 and cast after — assert the plan's
    # aggregate expressions carry decimal sums for sxx/sxy.
    import inspect

    from ecommerce_data_pipeline_spark.queries import analytics

    src = inspect.getsource(analytics.q_revenue_trend_by_type)
    assert 'F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))' in src
    assert 'F.sum(F.col("x").cast(dec) * F.col("y").cast(dec))' in src


def test_key_skew_gini_accumulates_in_decimal():
    # Same bug class, swept proactively: sum(rn*c) and n_keys*total are
    # bounded by keys x events (~1e21 at scale) — must accumulate as
    # decimal(38,0), never int64.
    import inspect

    from ecommerce_data_pipeline_spark.queries import analytics

    src = inspect.getsource(analytics.q_key_skew_report)
    assert 'F.sum(F.col("rn").cast(dec) * F.col("c").cast(dec))' in src
    assert "nk_d * total_d" in src
