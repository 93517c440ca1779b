"""Round-13 additions, part 2: distributed Bloom-filter join pruning
(operators/bloom.py) and the Spark-4 State Data Source reader query
(streaming_state_inspect)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators import bloom as B


def _pair_df(spark, pairs, schema="k long, v string"):
    return spark.createDataFrame(pairs, schema)


def test_bloom_no_false_negatives_and_some_pruning(spark):
    """Every build-side key passes the filter (no false negatives — the
    correctness half of the contract), and with a filter sized 2^20 bits
    for 100 keys, the 10k non-members are almost all pruned (the
    usefulness half)."""
    members = _pair_df(spark, [(i, f"m{i}") for i in range(100)])
    bloom_df = B.build_bloom(members, "k")
    probe = spark.range(0, 10_000).select(F.col("id").alias("k"))

    kept = B.bloom_prune(probe, "k", bloom_df)
    kept_keys = {r["k"] for r in kept.collect()}
    assert set(range(100)) <= kept_keys  # no false negatives
    # fpp at m=2^20, k=3, n=100 is ~1e-10; allow a generous margin.
    assert len(kept_keys) <= 120


def test_bloom_pruned_join_equals_plain_join(spark):
    """The pruned join is row-for-row the plain join — false positives
    are removed by the exact join, false negatives don't exist."""
    build = _pair_df(spark, [(i * 3, f"d{i}") for i in range(50)])
    probe = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("x")
    )
    plain = sorted(
        tuple(r) for r in probe.join(build, "k").select("k", "x", "v").collect()
    )
    pruned = sorted(
        tuple(r)
        for r in B.bloom_pruned_join(probe, build, "k")
        .select("k", "x", "v")
        .collect()
    )
    assert pruned == plain


def test_bloom_null_keys_and_outer_refusal(spark):
    """Null build keys are skipped (a null never equi-joins, so it has no
    business setting bits); outer joins are refused — pruning would drop
    probe rows an outer join must keep."""
    build = spark.createDataFrame([(1, "a"), (None, "n")], "k int, v string")
    bloom_df = B.build_bloom(build, "k")
    probe = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    kept = {r["k"] for r in B.bloom_prune(probe, "k", bloom_df).collect()}
    assert 1 in kept and 2 not in kept and None not in kept

    with pytest.raises(ValueError, match="inner/semi"):
        B.bloom_pruned_join(probe, build, "k", how="left")
    with pytest.raises(ValueError, match="one key"):
        B.bloom_pruned_join(probe, build, ["k", "v"])


def test_bloom_build_is_distributed_and_bounded(spark):
    """The filter is a 1-row dense array of exactly n_bits/64 words
    regardless of data size, and the build plan contains no driver-side
    collect (it is a plain agg the caller can broadcast)."""
    n_bits = 1 << 12  # 64 words
    many = spark.range(0, 5_000).select(F.col("id").alias("k"))
    bloom_df = B.build_bloom(many, "k", n_bits=n_bits)
    row = bloom_df.collect()[0]
    assert len(row["__bloom"]) == n_bits // 64
    # Oversaturated filter (5k keys × 3 hashes into 4096 bits): false
    # positives abound but MEMBERS still always pass — degraded
    # usefulness, never wrong.
    probe = spark.range(0, 5_000).select(F.col("id").alias("k"))
    assert B.bloom_prune(probe, "k", bloom_df, n_bits=n_bits).count() == 5_000


def test_statestore_reader_matches_batch_distinct(spark, tmp_path):
    """spark.read.format('statestore') over a dropDuplicates checkpoint
    returns exactly the distinct key set of the drained input."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows = [(i % 6, f"t{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    df.repartition(3).write.parquet(src)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .dropDuplicates(["event_type", "event_id"])
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    state = spark.read.format("statestore").load(ck)
    got = sorted(
        (r["key"]["event_type"], r["key"]["event_id"]) for r in state.collect()
    )
    assert got == sorted({(t, i) for i, t in rows})


def test_bloom_prune_survives_probe_column_named_bloom(spark):
    """Review r13: the broadcast filter column is __-prefixed so a probe
    that already carries a 'bloom' column neither collides nor is
    dropped."""
    build = _pair_df(spark, [(1, "a"), (2, "b")])
    probe = spark.createDataFrame(
        [(1, "keep"), (5, "x")], "k long, bloom string"
    )
    kept = B.bloom_prune(probe, "k", B.build_bloom(build, "k"))
    rows = kept.collect()
    assert [(r["k"], r["bloom"]) for r in rows] == [(1, "keep")]


# ---------------------------------------------------------------------------
# Round-14 ADVICE fixes: type canonicalization + self-describing filters
# ---------------------------------------------------------------------------


def test_bloom_int_build_bigint_probe_no_false_negatives(spark):
    """ADVICE r13 medium: xxhash64 is type-sensitive, so an int build key
    probed with a bigint column used to yield silent false negatives.
    Canonicalization (integral -> long on BOTH sides) makes the mixed
    pair exact."""
    build = spark.createDataFrame([(i,) for i in range(50)], "k int")
    probe = spark.range(0, 1_000).select(F.col("id").alias("k"))  # bigint
    joined = B.bloom_pruned_join(probe, build, "k")
    assert {r["k"] for r in joined.collect()} == set(range(50))


def test_bloom_param_mismatch_raises_instead_of_dropping_rows(spark):
    """A filter built with non-default n_bits probed with a different
    n_bits raises (the filter row records its own parameters) instead of
    silently false-negating."""
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    bloom_df = B.build_bloom(build, "k", n_bits=1 << 12)
    with pytest.raises(ValueError, match="n_bits"):
        B.bloom_prune(probe, "k", bloom_df, n_bits=1 << 20)
    with pytest.raises(ValueError, match="n_hashes"):
        B.bloom_prune(probe, "k", bloom_df, n_bits=1 << 12, n_hashes=5)
    # Omitting the params reads them from the filter row — the safe path.
    assert B.bloom_prune(probe, "k", bloom_df).count() == 100


def test_bloom_incompatible_key_types_refused(spark):
    """string build vs bigint probe cannot canonicalize to one hash type;
    the join refuses rather than silently returning an empty result."""
    build = spark.createDataFrame([("a",), ("b",)], "k string")
    probe = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(TypeError, match="hash-incompatible"):
        B.bloom_pruned_join(probe, build, "k")


def test_suggest_n_bits_scales_with_build_side():
    """ADVICE r13 low: the filter is sized from the build-side key count
    (next pow2 >= 10x keys, floored) so pruning never saturates at high
    scale factors."""
    assert B.suggest_n_bits(0) == 1 << 14
    assert B.suggest_n_bits(100) == 1 << 14
    assert B.suggest_n_bits(100_000) == 1 << 20
    # Broadcast-budget cap (SCALE.md §10): 2^27 bits = 16 MB; an uncapped
    # 30M-key suggestion would be a 64 MB broadcast, 1e9 keys a 2 GiB one.
    assert B.suggest_n_bits(30_000_000) == 1 << 27
    assert B.suggest_n_bits(1_000_000_000) == 1 << 27
    for n in (1, 1_000, 123_456):
        m = B.suggest_n_bits(n)
        assert m >= 10 * n and (m & (m - 1)) == 0


def test_bloom_key_type_mismatch_between_build_and_prune_raises(spark):
    """Review fix: the filter row records its canonical key type, so the
    two-step build/prune API (persisted or broadcast filters) refuses a
    hash-incompatible probe instead of silently pruning to empty."""
    build = spark.createDataFrame([("a",), ("b",)], "k string")
    bloom_df = B.build_bloom(build, "k")
    probe = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(TypeError, match="hash-incompatible"):
        B.bloom_prune(probe, "k", bloom_df)
