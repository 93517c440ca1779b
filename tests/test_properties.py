"""Property-based tests (hypothesis): invariants that goldens can't sweep —
money-sum exactness over arbitrary 2dp amounts, dedup idempotency/uniqueness
over arbitrary redelivery patterns."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from ecommerce_data_pipeline_spark.functions import money_sum
from ecommerce_data_pipeline_spark.operators.dedup import kafka_identity_dedup

# 2dp dollar amounts as the reference carries them (double dollars from
# integer cents).
amounts = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0),
    min_size=1,
    max_size=30,
)


@settings(max_examples=20, deadline=None)
@given(amounts)
def test_money_sum_matches_decimal_arithmetic(spark, vals):
    """money_sum == exact Decimal sum for any 2dp inputs in any order —
    the property that makes gmv bit-stable across partial-agg orders."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(money_sum("v").alias("s")).first()["s"]
    want = float(sum(Decimal(str(v)) for v in vals))
    assert got == want


identities = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # partition
        st.integers(min_value=0, max_value=5),   # offset
        st.integers(min_value=0, max_value=3),   # redelivery tiebreak (ts sec)
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(identities)
def test_kafka_dedup_unique_and_idempotent(spark, rows):
    """For any redelivery pattern: output identities are unique, the kept
    row is the max-timestamp one, and dedup(dedup(x)) == dedup(x)."""
    import datetime as dt

    data = [
        (
            str(i),
            f"v{p}-{o}-{s}",
            "t",
            p,
            o,
            dt.datetime(2024, 1, 1, 0, 0, s),
            0,
        )
        for i, (p, o, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "raw_key string, raw_value string, topic string, partition int, "
        "offset long, kafka_timestamp timestamp, timestampType int",
    )
    out = kafka_identity_dedup(df)
    collected = out.collect()
    idents = [(r["topic"], r["partition"], r["offset"]) for r in collected]
    assert len(idents) == len(set(idents)) == len({(p, o) for p, o, _ in rows})
    # max-timestamp row wins per identity
    best = {}
    for p, o, s in rows:
        best[(p, o)] = max(best.get((p, o), -1), s)
    for r in collected:
        assert r["kafka_timestamp"].second == best[(r["partition"], r["offset"])]
    # idempotent
    assert kafka_identity_dedup(out).count() == len(collected)


asof_data = st.tuples(
    # left probes: (key, ts_sec)
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1, max_size=15,
    ),
    # right events: (key, ts_sec) — unique per key to avoid tie ambiguity
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1, max_size=15, unique=True,
    ),
)


@settings(max_examples=10, deadline=None)
@given(asof_data)
def test_asof_join_matches_bruteforce(spark, data):
    """asof_join == per-left-row argmax(right_ts <= left_ts) for any key
    distribution and any interleaving of probe/event times."""
    import datetime as dt

    from ecommerce_data_pipeline_spark.operators.asof import asof_join

    lrows, rrows = data
    base = dt.datetime(2024, 1, 1)
    mk = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    left = spark.createDataFrame(
        [(k, mk(s), i) for i, (k, s) in enumerate(lrows)],
        "k int, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(k, mk(s), 10.0 + k + s) for (k, s) in rrows],
        "k int, ts timestamp, val double",
    )
    got = {
        (r["k"], r["lid"]): (r["matched_ts"], r["matched_val"])
        for r in asof_join(
            left, right, on=["k"], value_cols=["val"], prefix="matched_"
        ).collect()
    }
    want = {}
    for i, (k, s) in enumerate(lrows):
        cands = [(ks, vs) for (kk, ks), vs in
                 [((kk, ks), 10.0 + kk + ks) for (kk, ks) in rrows if kk == k]
                 if ks <= s]
        if cands:
            bs, bv = max(cands)
            want[(k, i)] = (mk(bs), bv)
    assert got == want


doc_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(doc_texts)
def test_pack_sequences_tiles_contiguously(spark, texts):
    """Per shard: docs tile the token stream with no gaps or overlaps, and
    end_seq is exactly the sequence holding the doc's last token."""
    from ecommerce_data_pipeline_spark.operators.packing import pack_sequences

    budget = 7
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = sorted(
        (
            (r["shard"], r["doc_id"], r["n_tokens"], r["start_seq"],
             r["start_offset"], r["end_seq"])
            for r in pack_sequences(docs, budget=budget, n_shards=3).collect()
        )
    )
    offsets: dict[int, int] = {}
    for shard, _doc, n, sseq, soff, eseq in out:
        cursor = offsets.get(shard, 0)
        assert sseq == cursor // budget and soff == cursor % budget
        assert eseq == (cursor + n - 1) // budget
        offsets[shard] = cursor + n
    n_nonempty = sum(1 for t in texts if t.split())
    assert len(out) == n_nonempty  # zero-token docs dropped, others kept


# ---------------------------------------------------------------------------
# Real-codec round trips (no Spark: pure kernel properties)
# ---------------------------------------------------------------------------

import numpy as np

from ecommerce_data_pipeline_spark.operators import codecs

img_arrays = st.tuples(
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=1, max_value=23),
    st.integers(min_value=0, max_value=2**32 - 1),
).map(
    lambda t: np.random.default_rng(t[2]).integers(
        0, 256, (t[0], t[1]), dtype=np.uint8
    )
)


@settings(max_examples=50, deadline=None)
@given(img_arrays)
def test_pgm_round_trip_any_shape(px):
    assert np.array_equal(codecs.pgm_decode(codecs.pgm_encode(px)), px)


@settings(max_examples=50, deadline=None)
@given(img_arrays)
def test_bmp_round_trip_any_shape(px):
    """Any width exercises every row-padding residue (w*3 mod 4)."""
    assert np.array_equal(codecs.bmp_decode(codecs.bmp_encode(px)), px)


wav_samples = st.tuples(
    st.integers(min_value=0, max_value=5000),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([8000, 16000, 44100]),
).map(
    lambda t: (
        np.random.default_rng(t[1]).integers(
            -32768, 32768, t[0], dtype=np.int16
        ),
        t[2],
    )
)


@settings(max_examples=50, deadline=None)
@given(wav_samples)
def test_wav_round_trip_any_length(sr):
    s, rate = sr
    dec, got_rate = codecs.wav_decode(codecs.wav_encode(s, rate=rate))
    assert got_rate == rate and np.array_equal(dec, s)


@settings(max_examples=30, deadline=None)
@given(img_arrays, st.integers(min_value=1, max_value=8))
def test_nearest_resize_matches_grid_formula(px, out):
    th = codecs.nearest_resize(px, out)
    h, w = px.shape
    assert th.shape == (out, out)
    for i in range(out):
        for j in range(out):
            assert th[i, j] == px[(i * h) // out, (j * w) // out]


# ---------------------------------------------------------------------------
# Round 7: BPE trainer vs pure-Python reference; banded Hamming vs brute force
# ---------------------------------------------------------------------------

def _bpe_reference(words: list[str], rounds: int):
    """Greedy BPE (Sennrich 2016) in plain Python: per round, the most
    frequent adjacent symbol pair over the frequency-weighted vocab
    (ties: count desc, then (a, b) lexicographic), applied leftmost-first
    non-overlapping."""
    from collections import Counter

    vocab = Counter(words)
    segs = {w: list(w) for w in vocab}
    merges = []
    for r in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, cnt))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


corpora = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(corpora)
def test_bpe_merge_vocab_matches_reference(spark, words):
    """The distributed trainer's full merge trajectory equals greedy BPE
    for arbitrary small corpora — tie-breaks, overlap handling and
    cross-round dependence included."""
    from ecommerce_data_pipeline_spark.operators.text import bpe_merge_vocab

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    got = [
        (r["merge_round"], r["sym_a"], r["sym_b"], r["merged"], r["pair_count"])
        for r in bpe_merge_vocab(docs, rounds=4).collect()
    ]
    assert got == _bpe_reference(words, 4)


sig_sets = st.lists(
    st.integers(min_value=0, max_value=(1 << 63) - 1),
    min_size=2,
    max_size=12,
    unique=True,
)


@settings(max_examples=15, deadline=None)
@given(sig_sets)
def test_banded_hamming_pairs_matches_bruteforce(spark, sigs):
    """Band-blocked pairs == exact all-pairs popcount filter for any
    signatures at max_hamming=3 (pigeonhole losslessness, randomized)."""
    from ecommerce_data_pipeline_spark.operators.dedup import banded_hamming_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, sig long"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"], r["hamming"])
        for r in banded_hamming_pairs(df, "sig", max_hamming=3).collect()
    }
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in range(len(sigs))
        for b in range(a + 1, len(sigs))
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert got == want


# ---------------------------------------------------------------------------
# Round-13: Bloom pruning, file-stats skipping, profiler invariants
# ---------------------------------------------------------------------------

bloom_keys = st.tuples(
    st.sets(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
    st.sets(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60),
)


@settings(max_examples=10, deadline=None)
@given(bloom_keys)
def test_bloom_pruned_join_equivalence_property(spark, keysets):
    """For ANY build/probe key sets: the Bloom-pruned join equals the
    plain join row-for-row (no false negatives; false positives removed
    by the exact join), and pruning never keeps a row the filter was not
    built for unless it is a hash collision — checked implicitly by the
    equality."""
    from ecommerce_data_pipeline_spark.operators.bloom import bloom_pruned_join

    build_keys, probe_keys = keysets
    build = spark.createDataFrame([(k, f"d{k}") for k in build_keys], "k long, v string")
    probe = spark.createDataFrame([(k, k % 5) for k in probe_keys], "k long, x long")
    plain = sorted(map(tuple, probe.join(build, "k").select("k", "x", "v").collect()))
    pruned = sorted(
        map(
            tuple,
            bloom_pruned_join(probe, build, "k", n_bits=1 << 12)
            .select("k", "x", "v")
            .collect(),
        )
    )
    assert pruned == plain


skip_layout = st.tuples(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=500),
)


@settings(max_examples=10, deadline=None)
@given(skip_layout)
def test_file_skipping_equals_plain_filter_property(spark, args):
    """For ANY data and ANY [lo,hi] band: the stats-skipped scan returns
    exactly the plain filtered scan (stats are necessary-not-sufficient;
    the re-applied predicate closes the gap)."""
    import tempfile
    import shutil

    from ecommerce_data_pipeline_spark.operators.fileindex import (
        build_file_stats,
        skipping_scan,
    )

    vals, a, b = args
    lo, hi = min(a, b), max(a, b)
    root = tempfile.mkdtemp(prefix="prop_skip_")
    try:
        path = f"{root}/t"
        spark.createDataFrame([(v,) for v in vals], "k long").repartition(
            3
        ).write.parquet(path)
        index = build_file_stats(spark, path, ["k"])
        scanned, stats = skipping_scan(spark, index, "k", lo, hi)
        got = sorted(r["k"] for r in scanned.collect())
        want = sorted(v for v in vals if lo <= v <= hi)
        assert got == want
        assert stats["n_files_scanned"] <= stats["n_files_total"]
    finally:
        shutil.rmtree(root, ignore_errors=True)


profile_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-10_000_00, max_value=10_000_00)),
        st.one_of(st.none(), st.text(alphabet="abcdef", max_size=4)),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(profile_rows)
def test_column_profile_matches_python_property(spark, rows):
    """For ANY (nullable int cents, nullable short string) rows: the
    one-pass profile equals the straightforward Python computation —
    counts, nulls, exact NDV, min/max, cents-exact mean."""
    from ecommerce_data_pipeline_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(None if c is None else c / 100.0, s) for c, s in rows],
        "v double, s string",
    )
    prof = {r["col_name"]: r for r in column_profile(df).collect()}
    nums = [c for c, _ in rows if c is not None]
    strs = [s for _, s in rows if s is not None]
    assert prof["v"]["n_rows"] == len(rows)
    assert prof["v"]["n_nulls"] == sum(1 for c, _ in rows if c is None)
    assert prof["v"]["ndv"] == len({c for c, _ in rows if c is not None})
    assert prof["s"]["ndv"] == len(set(strs))
    if nums:
        assert prof["v"]["min_num"] == min(nums) / 100.0
        assert prof["v"]["max_num"] == max(nums) / 100.0
        assert prof["v"]["avg_num"] == round(
            sum(nums) / 100.0 / len(nums), 6
        )
    if strs:
        assert prof["s"]["min_str"] == min(strs)
        assert prof["s"]["max_str"] == max(strs)


# ---------------------------------------------------------------------------
# Round-14: lake-maintenance kernels (operators/layout.py)
# ---------------------------------------------------------------------------

retention_case = st.tuples(
    # (month, day) per row — months 1..5, days 1..27
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=1, max_value=27),
        ),
        min_size=5,
        max_size=60,
    ),
    # cutoff month/day
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=27),
)


@settings(max_examples=8, deadline=None)
@given(retention_case)
def test_retention_delete_equals_row_filter_property(spark, tmp_path_factory, case):
    """For ANY row distribution over months and ANY cutoff (including
    cutoffs landing in empty months, the first month, or past the last):
    the partition-level delete keeps exactly the rows a row-level
    ``ts >= cutoff`` filter keeps, and the three partition classes are a
    disjoint cover of the table's months."""
    from pyspark.sql import functions as F

    from ecommerce_data_pipeline_spark.operators.layout import retention_delete

    rows, cm, cd = case
    path = str(tmp_path_factory.mktemp("ret") / "t")
    df = spark.createDataFrame(
        [(i, f"2024-{m:02d}-{d:02d} 06:00:00") for i, (m, d) in enumerate(rows)],
        "id long, ts_s string",
    ).select("id", F.to_timestamp("ts_s").alias("ts"))
    df.withColumn("p", F.date_format("ts", "yyyy-MM")).write.partitionBy(
        "p"
    ).parquet(path)
    cutoff = f"2024-{cm:02d}-{cd:02d} 00:00:00"
    stats = retention_delete(spark, path, "ts", cutoff, "p")
    months = {f"2024-{m:02d}" for m, _ in rows}
    assert set(stats["dropped"] + stats["rewritten"] + stats["untouched"]) == months
    assert not (set(stats["dropped"]) & set(stats["untouched"]))
    got = sorted(r["id"] for r in spark.read.parquet(path).collect()) if (
        stats["rewritten"] or stats["untouched"]
    ) else []
    want = sorted(
        r["id"] for r in df.filter(F.col("ts") >= F.lit(cutoff)).collect()
    )
    assert got == want


compaction_case = st.tuples(
    st.integers(min_value=1, max_value=40),  # input files
    st.integers(min_value=1, max_value=12),  # target divisor
)


@settings(max_examples=8, deadline=None)
@given(compaction_case)
def test_compaction_content_neutral_property(spark, tmp_path_factory, case):
    """For ANY input file count and target size: compact() writes exactly
    plan['n_output_files'] files and the row multiset is unchanged."""
    import math

    from pyspark.sql import functions as F

    from ecommerce_data_pipeline_spark.operators.layout import (
        compact,
        file_sizes,
        plan_compaction,
    )

    n_files, divisor = case
    base = tmp_path_factory.mktemp("cmp")
    src, out = str(base / "src"), str(base / "out")
    spark.range(0, 2_000).select(
        F.col("id"), (F.col("id") % 13).alias("g")
    ).repartition(n_files).write.parquet(src)
    sizes = file_sizes(spark, src)
    total = sizes.agg(F.sum("file_bytes").alias("t")).first()["t"]
    plan = plan_compaction(sizes, target_bytes=max(1, math.ceil(total / divisor)))
    compact(spark.read.parquet(src), plan).write.parquet(out)
    assert file_sizes(spark, out).count() == plan["n_output_files"]
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, spark.read.parquet(src).collect()))
    assert got == want
