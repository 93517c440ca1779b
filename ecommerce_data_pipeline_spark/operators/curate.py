"""Training-data curation operators (engine extension, SURVEY.md §7.1
step 9 family): PII redaction, deterministic sampling, benchmark
contamination checks, intra-document repetition stats, and deterministic
shard assignment for training-order shuffles.

All pure built-in column expressions (regexp / split / arrays / window),
so every operator is either a shuffle-free map stage or one well-keyed
shuffle — the shapes that survive a 100 TB corpus:

- redact_pii / repetition_stats: per-row map, no shuffle, stays in
  whole-stage codegen; scales with input splits.
- stratified_sample: map-side deterministic hash filter — no sampling
  state, no driver RNG, reproducible across runs/retries (critical for
  exactly-once semantics when a stage is re-executed).
- ngram_contamination: the eval set is tiny by construction → its
  exploded n-gram set broadcasts; the corpus side is an exploded map +
  broadcast semi-join + per-doc count. One shuffle (the groupBy doc_id),
  volume bounded by matched n-grams only.
- shard_assign: one hash repartition by shard + per-shard sort — the
  canonical "global shuffle" for training-data ordering, expressed so
  each shard sorts independently (no global total order bottleneck).

Regexes are restricted to constructs with identical semantics in Java
regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
repeats, no backrefs/lookaround.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_data_pipeline_spark.operators.dedup import (
    _md5_long,
    _spread,
    char_shingles,
)

# NULL-group sentinel shared by both boilerplate operators (and mirrored
# as chr(0) || '__null_group__' in their DuckDB oracles — a test pins the
# two representations equal): NULL group_col docs form their OWN group;
# a plain equality join on NULL matches nothing and the doc's text would
# silently vanish (ADVICE r14).
NULL_GROUP_SENTINEL = "\x00__null_group__"

# PII patterns (Java+RE2-portable). Order of application matters: emails
# first (an email contains no phone/ip match but keeps counts stable),
# then IPv4, then phone numbers.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PHONE_RE = "[+][0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"


def redact_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scrub emails / IPv4 addresses / phone numbers, keeping counts.

    Output: (doc_id, n_emails, n_ips, n_phones, redacted_text).
    Pure map stage — no shuffle; regexp_count/replace are codegen
    expressions evaluated once per row.
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), IPV4_RE, "[IP]"
            ),
            PHONE_RE,
            "[PHONE]",
        ).alias("redacted_text"),
    )


def deterministic_keep(key: Column, rate_bp: Column | int, salt: str = "v1") -> Column:
    """True iff md5(key:salt) falls in the first ``rate_bp`` of 10,000
    basis-point buckets. Deterministic (same row → same verdict on every
    run/retry/executor), uniform, and oracle-replicable — the correct
    sampling primitive for distributed pipelines, unlike rand()-based
    df.sample which resamples per stage retry."""
    bucket = _md5_long(F.concat_ws(":", key.cast("string"), F.lit(salt))) % 10000
    return bucket < rate_bp


def stratified_sample(
    docs: DataFrame,
    rates_bp: dict[str, int],
    default_bp: int = 0,
    stratum_col: str = "stratum",
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Deterministic stratified Bernoulli sample: per-stratum keep-rates in
    basis points (en→5000 keeps ~50% of English docs). Map-side filter,
    no shuffle, no RNG state.

    Output: input rows that survive, plus their stratum and hash bucket.
    """
    rate = F.lit(default_bp)
    for stratum, bp in rates_bp.items():
        rate = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(rate)
    bucket = _md5_long(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    ) % 10000
    return (
        docs.withColumn("__bucket", bucket)
        .filter(F.col("__bucket") < rate)
        .withColumnRenamed("__bucket", "sample_bucket")
    )


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination check: for each corpus document, how many of
    its distinct character n-grams appear in ANY eval-set document
    (the n-gram-overlap decontamination rule used for LLM training sets;
    n=13 chars ≈ the classic 13-token variant scaled to char shingles).

    Plan: the eval set's distinct n-grams are tiny → broadcast inner
    join against the corpus's exploded n-grams, then count per doc. Docs
    with zero overlap are kept via left join so the output has one row
    per corpus doc. Join keys are the raw n-gram strings (13 bytes,
    broadcast side only holds the eval set) — collision-free and
    oracle-identical; xxhash64 keys would shave broadcast bytes at the
    cost of an engine-specific hash.
    Output: (doc_id, n_contaminated, contaminated).
    """
    doc_grams = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_shingles(F.col(text_col), n)).alias("g"),
    )
    eval_grams = (
        eval_docs.select(
            F.explode(char_shingles(F.col(text_col), n)).alias("g")
        )
        .distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def repetition_stats(
    docs: DataFrame, sep: str = ". ", text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition (the Gopher 'repetitious content' family):
    split into units on ``sep``, measure how much of the document is
    duplicated units. Pure map stage.

    Output: (doc_id, n_units, n_distinct_units, dup_unit_ratio).
    """
    # Spark split() takes a regex; escape so ``sep`` is treated literally
    # (DuckDB's string_split is literal already — oracle parity).
    units = F.filter(F.split(F.col(text_col), re.escape(sep), -1), lambda u: u != "")
    n_units = F.size(units)
    n_distinct = F.size(F.array_distinct(units))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_units.alias("n_units"),
        n_distinct.alias("n_distinct_units"),
        F.round(
            (n_units - n_distinct) / F.greatest(n_units, F.lit(1)).cast("double"), 4
        ).alias("dup_unit_ratio"),
    )


def shard_assign(
    docs: DataFrame, n_shards: int = 8, id_col: str = "doc_id", salt: str = "v1"
) -> DataFrame:
    """Deterministic global shuffle into training shards: shard by
    md5(doc_id:salt), position within shard by the same hash (ties by
    doc_id). The canonical pre-training data-order shuffle, expressed as
    one hash repartition + independent per-shard sorts — no global total
    order, so it scales linearly with shard count.

    Output: (doc_id, shard, pos).
    """
    h = _md5_long(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        docs.select(F.col(id_col).alias(id_col), h.alias("h"))
        .withColumn("shard", (F.col("h") % n_shards).cast("int"))
        .repartition(F.col("shard"))
        .select(
            F.col(id_col).alias("doc_id"),
            "shard",
            (F.row_number().over(w) - 1).alias("pos"),
        )
    )


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.7,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "temp-v1",
) -> DataFrame:
    """Multilingual temperature sampling (the exponent-smoothed language
    balancing of mBERT/XLM-R: sample languages ∝ (N_l/N)^alpha, alpha<1
    up-weights low-resource languages). Keep-rate per language
    r_l = (N_l / N_min)^(alpha-1), normalized so the SMALLEST language is
    kept fully; membership is the deterministic md5 coin (see
    ``deterministic_keep``) so retries/executors agree row-for-row.

    Scale shape: one map-side-combined count per language (the per-language
    frame is |languages| rows — broadcast back), then a pure map filter over
    the corpus. No shuffle of document payloads at any point.
    """
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n_l"))
    floor_ = counts.agg(F.min("__n_l").alias("__n_min"))
    rates = counts.crossJoin(F.broadcast(floor_)).select(
        stratum_col,
        F.floor(
            F.lit(10000.0)
            * F.pow(F.col("__n_l") / F.col("__n_min"), F.lit(alpha - 1.0))
        )
        .cast("long")
        .alias("rate_bp"),
    )
    h = _md5_long(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    return (
        docs.join(F.broadcast(rates), stratum_col)
        .withColumn("__bucket", h % 10000)
        .filter(F.col("__bucket") < F.col("rate_bp"))
        .drop("__bucket")
    )


def source_capped_sample(
    docs: DataFrame,
    cap: int = 50,
    stratum_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source cap: keep at most ``cap`` docs per source, preferring
    larger ``order_col`` (id tiebreak) — the anti-domination rule that
    stops one crawl domain from flooding the training mixture.

    The rank<=cap filter over the window is recognized by Spark >= 3.5's
    WindowGroupLimit: every scan partition pre-prunes to its local best
    ``cap`` per source BEFORE the shuffle, so a 10-billion-doc domain
    moves at most cap x n_partitions rows — not the domain — through the
    exchange.
    Output: (doc_id, source, order_col, rank).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        docs.select(id_col, stratum_col, order_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(cap))
    )


def leakage_safe_split(
    clusters: DataFrame,
    train_bp: int = 9000,
    val_bp: int = 500,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: the deterministic md5 coin is tossed per CLUSTER (the
    ``cluster_id`` from dedup_clusters), so every member of a near-dup
    cluster — not just the canonical doc — lands in the same split. A
    doc-keyed split would put a 0.95-Jaccard copy of a training document
    into the eval set, the classic train/test contamination failure
    (Dodge et al. 2021, C4 analysis; Lee et al. 2022 §6 measure the
    resulting eval inflation).

    Basis points: ``train_bp``/``val_bp`` of 10000 (defaults 90/5/5).
    Pure map stage over the cluster assignment — the split coin adds no
    shuffle on top of dedup_clusters; membership is reproducible across
    retries, executors and engines (same md5 bucket rule as
    ``deterministic_keep``).
    Output: (doc_id, cluster_id, split).
    """
    h = _md5_long(
        F.concat_ws(":", F.col("cluster_id").cast("string"), F.lit(salt))
    )
    bucket = h % 10000
    return clusters.select(
        id_col,
        "cluster_id",
        F.when(bucket < train_bp, F.lit("train"))
        .when(bucket < train_bp + val_bp, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR (Xie et al. 2023, arXiv:2302.03169): data selection via
    importance resampling on hashed n-gram features. Every token hashes
    into one of ``n_buckets`` feature buckets; the target subset (rows
    where ``target`` is true — e.g. the high-quality domain you want more
    of) and the full corpus each induce a Laplace-smoothed bucket
    distribution, and a document's log importance weight is the
    log-likelihood ratio of its bag of buckets:

        log w(d) = sum_b tf_d[b] * ( ln p_target[b] - ln p_raw[b] )

    Resampling by these weights shifts the corpus mixture toward the
    target domain without a trained classifier — the published cheap
    alternative to quality-classifier selection.

    Plan: the corpus tokenizes+hashes ONCE (lazy localCheckpoint — the
    doc-level, target and raw aggregates all derive from that frame); the
    two distribution tables are n_buckets rows, broadcast into the scoring
    join; one (doc,bucket) shuffle total. Hashing is the cross-engine
    md5-long (DuckDB oracle replays it bit-for-bit).

    Output: (doc_id, n_tokens, log_weight 4dp), every input doc (docs with
    zero tokens score 0.0).
    """
    from ecommerce_data_pipeline_spark.operators.text import _words

    tok = docs.select(
        F.col(id_col),
        target.alias("__is_target"),
        F.explode(_words(F.col(text_col))).alias("w"),
    ).select(
        id_col,
        "__is_target",
        (_md5_long(F.col("w")) % n_buckets).alias("b"),
    ).localCheckpoint(eager=False)
    dtf = tok.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("tf"))
    raw = tok.groupBy("b").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        tok.filter(F.col("__is_target"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    n_raw = raw.agg(F.sum("c_raw").alias("n_raw"))
    n_tgt = tgt.agg(F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("n_tgt"))
    lw = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(n_raw))
        .crossJoin(F.broadcast(n_tgt))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_tgt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("c_raw") + F.lit(1.0))
                    / (F.col("n_raw") + F.lit(float(n_buckets)))
                )
            ).alias("lw"),
        )
    )
    scored = (
        dtf.join(F.broadcast(lw), "b")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * F.col("lw")), 4).alias("log_weight"),
        )
    )
    base = docs.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )


# ---------------------------------------------------------------------------
# Markup-to-text extraction (boilerplate stripping before quality scoring)
# ---------------------------------------------------------------------------

# Extraction regexes, Java-regex + RE2 portable (non-greedy .*? has the
# same leftmost-shortest semantics in both; no lookaround/backrefs, which
# RE2 lacks). '.' excludes newlines in both engines — script/style blocks
# that span lines must be pre-normalized by the caller (the corpus texts
# are single-line).
SCRIPT_RE = "<script[^>]*>.*?</script>"
STYLE_RE = "<style[^>]*>.*?</style>"
TAG_RE = "<[^>]+>"

# Entity decode table. Order matters: '&amp;' decodes LAST so that the
# decode never manufactures new entities ('&amp;lt;' is the ESCAPED
# rendering of the literal text '&lt;' and must become '&lt;', not '<').
ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def markup_extract(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """HTML-ish markup → clean text, with per-rule removal counts.

    The pre-quality-scoring extraction step every pretraining pipeline
    runs (trafilatura/jusText's core loop, reduced to its portable
    deterministic skeleton): drop <script>/<style> blocks wholesale,
    strip remaining tags (replaced by a space so adjacent words don't
    fuse), decode the six standard entities, collapse runs of spaces,
    trim. Counts are taken per rule BEFORE that rule rewrites the
    string, so the output doubles as an audit record (how much chrome
    each rule removed) that a SQL oracle can recompute exactly.

    Output: (doc_id, n_script, n_style, n_tags, n_entities, text).
    Pure map stage — chained regexp_count/regexp_replace/replace are
    all codegen expressions; no shuffle, scales with input splits.
    """
    raw = F.col(text_col)
    no_script = F.regexp_replace(raw, SCRIPT_RE, "")
    no_style = F.regexp_replace(no_script, STYLE_RE, "")
    no_tags = F.regexp_replace(no_style, TAG_RE, " ")
    n_entities = None
    decoded = no_tags
    for ent, repl in ENTITIES:
        cnt = F.regexp_count(no_tags, F.lit(re.escape(ent)))
        n_entities = cnt if n_entities is None else n_entities + cnt
        decoded = F.replace(decoded, F.lit(ent), F.lit(repl))
    clean = F.trim(F.regexp_replace(decoded, "[ ]+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(raw, F.lit(SCRIPT_RE)).alias("n_script"),
        F.regexp_count(no_script, F.lit(STYLE_RE)).alias("n_style"),
        F.regexp_count(no_style, F.lit(TAG_RE)).alias("n_tags"),
        n_entities.cast("int").alias("n_entities"),
        clean.alias("text"),
    )


# ---------------------------------------------------------------------------
# Line/segment-level boilerplate dedup (the CCNet/RefinedWeb per-line hash
# dedup, on fixed word segments since the corpus texts are single-line)
# ---------------------------------------------------------------------------


def boilerplate_segment_report(
    docs: DataFrame,
    seg_words: int = 4,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-doc boilerplate audit via cross-document segment frequency:
    split each doc into fixed ``seg_words``-word segments, count how many
    DISTINCT docs of the same ``group_col`` each segment appears in, and
    flag segments shared by >= ``min_docs`` docs as boilerplate (nav
    chrome / licence footers / template text in a real crawl; here the
    shared runs of the corpus's near-duplicate docs).

    Plan: one tokenize+posexplode map stage, one (group, segment) count
    shuffle (map-side combined; segment strings are bounded at
    seg_words words), one join back keyed on the same (group, segment),
    one per-doc agg. No window over the corpus, nothing quadratic — the
    same shape CCNet runs per shard at crawl scale.

    Output: (doc_id, n_segments, n_boilerplate, boiler_ratio).

    NULL ``group_col`` docs form their OWN group via a sentinel coalesce
    (same discipline as ``boilerplate_strip``): a plain equality join on
    a NULL group matches nothing, so such docs' segments would read
    nd=NULL and never flag — diverging from any oracle that groups
    null-safely (ADVICE r14, applied to both boilerplate operators).

    The word array is materialized as a COLUMN in a projection BELOW the
    segment Generate (r16 optimization, guide §1.2/§4.1): inlined, the
    tokenize chain (regexp_replace+split+filter) sat inside the
    per-segment slice lambda and was re-evaluated once per SEGMENT —
    O(n_words × n_segments) per doc; as a Generate-child column it
    evaluates once per doc (no optimizer rule inlines a Project into a
    generator expression, so the split stays put).
    """
    from ecommerce_data_pipeline_spark.operators.text import _words

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(group_col), F.lit(NULL_GROUP_SENTINEL)).alias("grp"),
        _words(F.coalesce(F.col(text_col), F.lit(""))).alias("__ws"),
    )
    words = F.col("__ws")
    n_seg = F.ceil(F.size(words) / F.lit(float(seg_words))).cast("int")
    idx = F.when(n_seg > 0, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    segs = base.select(
        "doc_id",
        "grp",
        F.explode_outer(
            F.transform(
                idx,
                lambda i: F.array_join(
                    F.slice(words, i * seg_words + 1, seg_words), " "
                ),
            )
        ).alias("seg"),
    )
    freq = (
        segs.filter(F.col("seg").isNotNull())
        .groupBy("grp", "seg")
        .agg(F.countDistinct("doc_id").alias("nd"))
    )
    flagged = segs.join(freq, ["grp", "seg"], "left").select(
        "doc_id",
        F.when(F.col("seg").isNotNull(), 1).otherwise(0).alias("is_seg"),
        F.when(
            F.col("seg").isNotNull() & (F.col("nd") >= min_docs), 1
        ).otherwise(0).alias("is_boiler"),
    )
    return flagged.groupBy("doc_id").agg(
        F.sum("is_seg").cast("int").alias("n_segments"),
        F.sum("is_boiler").cast("int").alias("n_boilerplate"),
        F.coalesce(
            F.round(F.sum("is_boiler") / F.nullif(F.sum("is_seg"), F.lit(0)), 4),
            F.lit(0.0),
        ).alias("boiler_ratio"),
    )


def corpus_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-run data versioning: what changed between corpus snapshot N
    and N+1, per source — the audit every production corpus refresh runs
    before training sees the data (did a source vanish? did a re-crawl
    rewrite half its docs?).

    Each doc is classified by ONE full-outer equi-join on the id: ``added``
    (id only in new), ``removed`` (id only in old), ``changed`` (both
    sides, text md5 differs), ``unchanged`` — then rolled up per source
    (the new snapshot's source wins for surviving docs; removed docs report
    under their old source).

    Scale shape: the join carries (id, source, md5) — 3 narrow columns,
    never the text (hashed before the join, so the shuffle is ~50 B/doc
    regardless of doc size) — and the rollup is an integer count
    aggregation. Nothing quadratic, no window over the corpus.

    Output: (source, n_added, n_removed, n_changed, n_unchanged).
    """
    o = old.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("src_old"),
        F.md5(F.col(text_col)).alias("h_old"),
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("src_new"),
        F.md5(F.col(text_col)).alias("h_new"),
        F.lit(True).alias("in_new"),
    )
    # Presence comes from explicit flags, not hash nullability, so NULL-text
    # docs classify correctly; the hash compare is null-safe for the same
    # reason (NULL text on both sides = unchanged).
    j = o.join(n, "id", "full_outer").select(
        F.coalesce("src_new", "src_old").alias("source"),
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        .when(~F.col("h_old").eqNullSafe(F.col("h_new")), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return j.groupBy("source").agg(
        F.count(F.when(F.col("status") == "added", 1)).alias("n_added"),
        F.count(F.when(F.col("status") == "removed", 1)).alias("n_removed"),
        F.count(F.when(F.col("status") == "changed", 1)).alias("n_changed"),
        F.count(F.when(F.col("status") == "unchanged", 1)).alias(
            "n_unchanged"
        ),
    )


def boilerplate_strip(
    docs: DataFrame,
    seg_words: int = 4,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """The REMOVAL stage over ``boilerplate_segment_report``'s audit —
    the CCNet/RefinedWeb line-dedup rewrite that actually produces
    training text: segments shared by >= ``min_docs`` distinct docs of
    the same ``group_col`` are dropped and each doc's text is rebuilt
    from its surviving segments IN ORDER. Output: (doc_id, n_segments,
    n_removed, clean_text).

    ``clean_text`` is the normalized token stream (the same
    lowercase/alpha tokenization the frequency counting uses — text._words),
    re-joined with single spaces; a production crawl pipeline would map
    flagged segments back to raw-byte offsets instead, but the
    keep/drop DECISION — the part that needs the corpus-wide shuffle —
    is exactly this.

    Plan: the report's tokenize+posexplode map stage and one
    (group, segment) count shuffle, plus ONE ordered re-aggregation per
    doc (array_sort over (pos, seg) structs — no window). Nothing
    quadratic; segment strings are bounded at ``seg_words`` words.

    NULL ``group_col`` docs form their OWN group (the group key is
    coalesced to a sentinel before the count shuffle and the join back):
    a plain equality join on a NULL group matches nothing, so such docs'
    segments would get nd=NULL, fail BOTH keep and drop conditions, and
    the text would silently vanish while n_removed stayed 0 (ADVICE
    r14). The oracle mirrors the same sentinel.

    The word array is materialized as a Generate-child column so the
    tokenize chain runs once per doc, not once per segment (r16
    optimization — see boilerplate_segment_report for the rationale).
    """
    from ecommerce_data_pipeline_spark.operators.text import _words

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(group_col), F.lit(NULL_GROUP_SENTINEL)).alias("grp"),
        _words(F.coalesce(F.col(text_col), F.lit(""))).alias("__ws"),
    )
    words = F.col("__ws")
    n_seg = F.ceil(F.size(words) / F.lit(float(seg_words))).cast("int")
    idx = F.when(n_seg > 0, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    segs = base.select(
        "doc_id",
        "grp",
        F.posexplode_outer(
            F.transform(
                idx,
                lambda i: F.array_join(
                    F.slice(words, i * seg_words + 1, seg_words), " "
                ),
            )
        ).alias("pos", "seg"),
    )
    freq = (
        segs.filter(F.col("seg").isNotNull())
        .groupBy("grp", "seg")
        .agg(F.countDistinct("doc_id").alias("nd"))
    )
    flagged = segs.join(freq, ["grp", "seg"], "left")
    rebuilt = flagged.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("seg").isNotNull(), 1).otherwise(0)
        ).cast("int").alias("n_segments"),
        F.sum(
            F.when(
                F.col("seg").isNotNull() & (F.col("nd") >= min_docs), 1
            ).otherwise(0)
        ).cast("int").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("seg").isNotNull()
                            & (F.col("nd") < min_docs),
                            F.struct(F.col("pos").alias("p"), F.col("seg").alias("s")),
                        )
                    )
                ),
                lambda e: e["s"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return rebuilt
