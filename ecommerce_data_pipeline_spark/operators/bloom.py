"""Distributed Bloom-filter join pruning — the runtime-filter pattern.

At 100 TB the dominant join cost is shuffling probe-side rows that can
never match: a fact table joined to a filtered dimension ships every fact
row to the exchange even though only the filtered keys' rows survive.
Engines answer with runtime filters (Spark's
``spark.sql.optimizer.runtime.bloomFilter.enabled``, Trino dynamic
filtering); this module is the same idea as an explicit, plan-visible
operator, built from pure JVM expressions so it composes with whole-stage
codegen and never leaves the executors in the hot path:

1. **Build** (``build_bloom``): distinct build-side keys → ``n_hashes``
   bit positions each (``xxhash64(key, seed)`` per seed — independent
   hashes from the seed column participating in the hash) → per-64-bit-word
   ``bit_or`` aggregate → ONE row holding the filter as a dense
   ``array<bigint>``. Fully distributed; the reduction is bounded by
   ``n_bits``, never by the data.
2. **Prune** (``bloom_prune``): densify the filter into ONE row holding
   a flat ``array<bigint>`` of ``n_bits/64`` words (a filter-sized range
   join — still fully distributed, zero driver collect) and broadcast
   that row onto the probe; rows whose ``n_hashes`` bits are not ALL set
   are dropped BEFORE any exchange. The probe is O(1) per hash —
   ``element_at`` on an indexed array — inside whole-stage codegen.
   (Two slower variants were measured and rejected in round 13: a
   broadcast MAP value — ``element_at`` on a map is a LINEAR scan of
   16 Ki entries per row, 13 s on the bench query — and a driver-side
   dense LITERAL — PySpark expands a 16 Ki-element ``lit`` into a 16 Ki-
   node expression tree that Catalyst re-walks per analysis, 50 s.)
   False positives pass
   (removed by the exact join that follows); false negatives are
   impossible, so the pruned join is row-for-row identical to the
   unpruned join — which is exactly how it is certified
   (`bloom_pruned_order_revenue`'s oracle is the PLAIN join).
3. **Join** (``bloom_pruned_join``): prune, then the exact equi-join.

Sizing: fpp ≈ (1 - e^(-kn/m))^k; the default m=2^20 bits / k=3 holds ~5%
fpp at n≈100k distinct keys. At 100 TB you size m to the distinct-key
count of the FILTERED dimension (the whole point is that it is small) and
the probe-side scan + shuffle shrinks by (1 - selectivity·(1+fpp)).

Reference parity: the reference joins orders×payments and lineitem×orders
unfiltered (analytics/spark/jobs/silver_order_payments.py,
analytics/dbt/models/marts/fct_sales_minute.sql); this operator is the
scale tier those joins need once the probe side is 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DoubleType, FloatType, IntegralType

DEFAULT_N_BITS = 1 << 20
DEFAULT_N_HASHES = 3


def _bit_positions(key: Column, seed: Column | int, n_bits: int) -> Column:
    """Bit position for one (key, seed) pair: xxhash64 with the seed as a
    participating column makes the ``n_hashes`` probes independent."""
    s = F.lit(seed) if isinstance(seed, int) else seed
    return F.pmod(F.xxhash64(key, s), F.lit(n_bits))


def _canonical_key(col: Column, dtype: DataType) -> Column:
    """xxhash64 is TYPE-sensitive: ``xxhash64(5::int) !=
    xxhash64(5::bigint)``, so an int build key probed with a bigint
    column (or vice versa) would produce silent FALSE NEGATIVES — rows
    missing from a join documented as row-for-row identical to the plain
    join. Canonicalize before hashing: every integral type hashes as
    ``long``, ``float`` as ``double``; other types pass through and must
    match exactly (``bloom_pruned_join`` asserts that)."""
    if isinstance(dtype, IntegralType):
        return col.cast("long")
    if isinstance(dtype, FloatType):
        return col.cast("double")
    return col


def _canon_name(dtype: DataType) -> str:
    """Type keys hash AS after ``_canonical_key``; two key columns are
    hash-compatible iff these names are equal."""
    if isinstance(dtype, IntegralType):
        return "bigint"
    if isinstance(dtype, (FloatType, DoubleType)):
        return "double"
    return dtype.simpleString()


def _key_dtype(df: DataFrame, key: str) -> DataType:
    for f in df.schema.fields:
        if f.name == key:
            return f.dataType
    raise ValueError(f"key column {key!r} not found in {df.columns}")


def suggest_n_bits(
    n_keys: int, min_bits: int = 1 << 14, max_bits: int = 1 << 27
) -> int:
    """Filter size for ``n_keys`` distinct build keys: next power of two
    >= 10 * n_keys (fpp ~5% at k=3), floored at ``min_bits`` so tiny
    builds still get a word array worth broadcasting, CAPPED at
    ``max_bits`` (2^27 = 16 MB — the broadcast budget per SCALE.md §10;
    an uncapped suggestion at ~1e9 keys would prescribe a 2 GiB
    broadcast). At the cap the filter degrades gracefully — higher fpp,
    never false negatives; past ~13M keys prefer Spark's own
    ``runtime.bloomFilter`` or a semi-join pre-pass. Callers that
    already pay a count on the (small, filtered) build side should feed
    it here instead of trusting the 2^20 default — at sf>=100 the
    default saturates and pruning silently approaches zero."""
    target = max(int(min_bits), 10 * max(1, int(n_keys)))
    return min(int(max_bits), 1 << (target - 1).bit_length())


def build_bloom(
    df: DataFrame,
    key: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """1-row DataFrame ``(__bloom: array<bigint>, __n_bits: int,
    __n_hashes: int)`` — the Bloom filter of ``df[key]``'s distinct
    values as a DENSE n_bits/64-word array, SELF-DESCRIBING so the probe
    side can never be evaluated with mismatched parameters.

    Fully distributed: distinct → explode seeds → word/bit split →
    ``bit_or`` per word → gap-fill against ``range(n_words)`` (a
    broadcast join of two filter-sized frames) → one ordered
    ``collect_list`` into the single array row. Every stage is bounded
    by n_bits/64 (16 Ki words at the default) — a filter-sized, never
    data-sized, reduction, and the dense ARRAY makes the probe-side
    ``element_at`` an O(1) indexed access. Null keys set no bits (a null
    never equi-joins). Keys hash in CANONICAL type (integral → long,
    float → double): xxhash64 is type-sensitive and an int-vs-bigint
    build/probe pair would otherwise yield silent false negatives.
    """
    key_dtype = _key_dtype(df, key)
    pos = _bit_positions(F.col("__k"), F.col("__seed"), n_bits)
    words = (
        df.select(_canonical_key(F.col(key), key_dtype).alias("__k"))
        .where(F.col("__k").isNotNull())
        .distinct()
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("__seed"),
            "__k",
        )
        .select(pos.alias("__pos"))
        .select(
            (F.col("__pos") / F.lit(64)).cast("int").alias("__w"),
            # call_function: the shiftleft PYTHON wrapper wants a literal
            # numBits; the SQL function itself takes a column.
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("__pos") % 64).cast("int"),
            ).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__word"))
    )
    n_words = (n_bits + 63) // 64
    slots = df.sparkSession.range(n_words).select(F.col("id").cast("int"))
    dense = slots.join(F.broadcast(words), slots["id"] == words["__w"], "left")
    return (
        dense.select(
            F.struct(
                F.col("id").alias("i"),
                F.coalesce(F.col("__word"), F.lit(0).cast("long")).alias("w"),
            ).alias("__e")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list("__e")), lambda e: e["w"]
            ).alias("__bloom")
        )
        .select(
            "__bloom",
            F.lit(n_bits).alias("__n_bits"),
            F.lit(n_hashes).alias("__n_hashes"),
            F.lit(_canon_name(key_dtype)).alias("__key_type"),
        )
    )


def might_contain(
    key: Column, words: Column, n_bits: int, n_hashes: int
) -> Column:
    """True iff all ``n_hashes`` bits for ``key`` are set in ``words``
    (a dense ``array<bigint>`` word column, 1-indexed lookups). Pure
    JVM, O(1) per hash — stays inside whole-stage codegen."""

    def one(seed: int) -> Column:
        pos = _bit_positions(key, seed, n_bits)
        word = F.element_at(words, (pos / F.lit(64)).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        return word.bitwiseAND(bit) != F.lit(0).cast("long")

    return reduce(lambda a, b: a & b, (one(s) for s in range(n_hashes)))


def bloom_prune(
    probe: DataFrame,
    key: str,
    bloom_df: DataFrame,
    n_bits: int | None = None,
    n_hashes: int | None = None,
) -> DataFrame:
    """Filter ``probe`` down to rows whose ``key`` might be in the filter.

    ``n_bits``/``n_hashes`` default to the values RECORDED IN the filter
    row by ``build_bloom`` (read via a 1-row ``first()`` — metadata, not
    data); passing them explicitly is only an assertion, and the probe
    key's canonical type is checked against the recorded ``__key_type``.
    A filter built with non-default parameters (or over a different key
    type) therefore can never be probed inconsistently — the mismatch
    that would silently produce false negatives raises instead.

    The metadata ``first()`` EVALUATES the filter frame: pass a pinned
    filter (``build_bloom(...).localCheckpoint(eager=True)``, as
    ``bloom_pruned_join`` does) when the prune feeds more than one
    action, or the lazy build re-runs per action.

    The 1-row dense-array filter rides a broadcast nested-loop join
    (filter bytes per executor, zero driver collect); the probe then
    filters BEFORE any exchange, which is the entire point — pruned rows
    never reach the shuffle. No false negatives: every actual match
    survives.
    """
    probe_dtype = _key_dtype(probe, key)
    if {"__n_bits", "__n_hashes"} <= set(bloom_df.columns):
        meta_cols = ["__n_bits", "__n_hashes"] + (
            ["__key_type"] if "__key_type" in bloom_df.columns else []
        )
        meta = bloom_df.select(*meta_cols).first()
        built_bits, built_hashes = int(meta["__n_bits"]), int(meta["__n_hashes"])
        if "__key_type" in meta_cols and meta["__key_type"] != _canon_name(
            probe_dtype
        ):
            # Same silent-false-negative channel as mismatched n_bits: a
            # filter built from (say) string hashes probed with a bigint
            # column matches essentially no bits and empties the join.
            raise TypeError(
                f"bloom filter was built over {meta['__key_type']} keys; "
                f"probe column {key!r} canonicalizes to "
                f"{_canon_name(probe_dtype)} — hash-incompatible "
                "(cast the probe key first)"
            )
        if n_bits is not None and n_bits != built_bits:
            raise ValueError(
                f"bloom filter was built with n_bits={built_bits}, "
                f"probe requested {n_bits} — mismatched parameters would "
                "silently drop matching rows"
            )
        if n_hashes is not None and n_hashes != built_hashes:
            raise ValueError(
                f"bloom filter was built with n_hashes={built_hashes}, "
                f"probe requested {n_hashes}"
            )
        n_bits, n_hashes = built_bits, built_hashes
    elif n_bits is None or n_hashes is None:
        raise ValueError(
            "bloom_df carries no __n_bits/__n_hashes metadata (pre-r14 "
            "filter?); pass n_bits and n_hashes explicitly"
        )
    probe_key = _canonical_key(F.col(key), probe_dtype)
    # Collision-proof internal name: a probe frame that itself carries a
    # __bloom column (e.g. a persisted filter stored next to its data)
    # would otherwise make the broadcast column ambiguous AND be dropped.
    wcol = "__bloom"
    while wcol in probe.columns:
        wcol += "_x"
    tagged = probe.crossJoin(
        F.broadcast(bloom_df.select(F.col("__bloom").alias(wcol)))
    )
    kept = tagged.where(
        might_contain(probe_key, F.col(wcol), n_bits, n_hashes)
    )
    return kept.drop(wcol)


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """``probe ⋈ build`` with the probe side Bloom-pruned first.

    Semantics identical to ``probe.join(build, on, how)`` for inner and
    left-semi joins (the only shapes where dropping non-matching probe
    rows is sound — an outer probe side must keep its non-matches, so
    pruning is refused there).
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_pruned_join supports inner/semi joins only, got {how!r} "
            "(pruning drops probe rows an outer join must keep)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if len(keys) != 1:
        raise ValueError("bloom_pruned_join prunes on exactly one key column")
    # Both sides must canonicalize to the same hash type, else xxhash64's
    # type sensitivity turns a type mismatch into silent false negatives.
    p_dt, b_dt = _key_dtype(probe, keys[0]), _key_dtype(build, keys[0])
    if _canon_name(p_dt) != _canon_name(b_dt):
        raise TypeError(
            f"bloom_pruned_join key dtypes are hash-incompatible: "
            f"probe {p_dt.simpleString()} vs build {b_dt.simpleString()} "
            "(cast one side first; xxhash64 is type-sensitive)"
        )
    # Pin the 1-row filter: bloom_prune's metadata read plus every
    # downstream action would otherwise each re-run the whole build-side
    # aggregation (a lazy build executed once per action).
    bloom_df = build_bloom(build, keys[0], n_bits, n_hashes).localCheckpoint(
        eager=True
    )
    pruned = bloom_prune(probe, keys[0], bloom_df, n_bits, n_hashes)
    return pruned.join(build, keys[0], how)
