"""Text-analysis operators for training-data pipelines (engine extension,
SURVEY.md §7.1 step 9).

All built-in column expressions — regexp/split/transform/aggregate — so the
hot path stays in whole-stage codegen and scales as a pure map stage (no
shuffle). Regex patterns are restricted to constructs with identical
semantics in Java regex (Spark) and RE2 (DuckDB oracle): literal classes,
no backrefs, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for n-gram-free language ID. Heuristic:
# score = fraction of tokens that are stopwords of language L; argmax wins.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des"],
}


def _words(text: Column) -> Column:
    """Lowercased alpha tokens. Identical split semantics across engines:
    strip non-[a-z ], split on single space, drop empties."""
    cleaned = F.regexp_replace(F.lower(text), "[^a-z ]", "")
    return F.filter(F.split(cleaned, " "), lambda w: w != "")


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language ID.

    Output: (doc_id, n_tokens, en_ratio, predicted_lang). predicted_lang is
    the argmax stopword-hit-ratio, 'und' (undetermined) when every score is 0.
    """
    words = _words(F.col(text_col))
    ratios = {
        lang: F.round(
            F.size(F.filter(words, lambda w: w.isin(sw)))
            / F.greatest(F.size(words), F.lit(1)),
            4,
        )
        for lang, sw in STOPWORDS.items()
    }
    best = F.greatest(*ratios.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:  # first-match-wins in dict order, mirrored in SQL
        pred = pred.when(ratios[lang] == best, F.lit(lang))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_tokens"),
        ratios["en"].alias("en_ratio"),
        pred.alias("predicted_lang"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document-quality features + composite score.

    Features: char length, token count, mean token length, alpha ratio
    (share of [a-z ] chars after lowercasing), stopword ratio. Score is a
    simple thresholded composite in [0,1] — the shape of C4/Gopher-style
    quality filters, kept deterministic and SQL-expressible.
    Output: (doc_id, n_chars, n_tokens, mean_token_len, alpha_ratio,
    stopword_ratio, quality_score).
    """
    t = F.col(text_col)
    lower = F.lower(t)
    words = _words(t)
    n_chars = F.length(t)
    n_tokens = F.size(words)
    alpha_chars = F.length(F.regexp_replace(lower, "[^a-z ]", ""))
    en_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS["en"])))
    mean_tok = F.round(
        F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / F.greatest(n_tokens, F.lit(1)),
        4,
    )
    alpha_ratio = F.round(alpha_chars / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(en_stop / F.greatest(n_tokens, F.lit(1)), 4)
    score = F.round(
        (
            F.when((n_tokens >= 10) & (n_tokens <= 100000), 0.25).otherwise(0.0)
            + F.when(mean_tok.between(3, 10), 0.25).otherwise(0.0)
            + F.when(alpha_ratio >= 0.8, 0.25).otherwise(0.0)
            + F.when(stop_ratio >= 0.05, 0.25).otherwise(0.0)
        ),
        2,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (runs of letters / digits / single other chars — the classic GPT-2
    pre-tokenizer shape without the learned merges).
    Output: (doc_id, ws_tokens, bpe_ish_tokens, distinct_tokens).
    """
    t = F.col(text_col)
    ws = F.filter(F.split(t, " "), lambda w: w != "")
    bpe = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).alias("ws_tokens"),
        F.size(bpe).alias("bpe_ish_tokens"),
        F.size(F.array_distinct(ws)).alias("distinct_tokens"),
    )


def char_entropy(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character-level Shannon entropy per document — the cheapest
    gibberish/boilerplate detector in the quality-filter family
    (low entropy = repeated padding, high entropy ~ natural text).

    Cross-engine determinism: entropy is log2(N) - sum(c*log2(c))/N over
    per-char counts c. The sum's terms are rounded to integer 1e-6 units
    and accumulated as longs, so the result is independent of summation
    order (the same discipline as user_decayed_value); the single final
    subtraction/division/round is IEEE-deterministic. c = 2^k terms are
    exact integers so the half-up/half-even rounding-mode difference
    between engines can never bite.

    Scale: explode-to-chars is a flatMap (linear, no driver state), one
    (doc_id, ch) shuffle then one doc_id shuffle — both map-side combined.
    Output: (doc_id, n_chars_used, char_entropy, ent_bucket).
    """
    chars = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.round(F.col("c") * F.log2("c") * F.lit(1000000.0)).cast("long")
        ).alias("s_micro"),
    )
    ent = F.round(
        F.log2("n") - (F.col("s_micro") / F.lit(1000000.0)) / F.col("n"), 4
    )
    return per_doc.select(
        "doc_id",
        F.col("n").alias("n_chars_used"),
        ent.alias("char_entropy"),
        F.when(ent >= 4.2, F.lit("high"))
        .when(ent >= 3.9, F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("ent_bucket"),
    )


def fingerprint(docs: DataFrame, k: int = 16, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprinting: full-content md5 plus a winnowing-style
    min-of-shingle-hashes signature (robust to local edits).
    Output: (doc_id, content_md5, min_shingle_md5).
    """
    t = F.lower(F.col(text_col))
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.md5(F.substr(t, i, F.lit(k)))
    )
    # Single-file test corpora scan as one partition; the per-shingle md5
    # map stage is CPU-bound, so fan out first (no-op at multi-file scale).
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(t).alias("content_md5"),
        F.array_min(shingle_hashes).alias("min_shingle_md5"),
    )


# ---------------------------------------------------------------------------
# Term weighting & ranked keyword retrieval (TF-IDF, BM25)
# ---------------------------------------------------------------------------


def _term_freqs(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, token, tf): one explode + one hash agg, partitioned by
    (doc, token) — the inverted-index build. At 100 TB this is THE shuffle
    of any retrieval pipeline; everything downstream joins on token
    (document frequencies) or doc (lengths), both already small."""
    return (
        docs.select(
            F.col(id_col), F.explode(_words(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1). The corpus stats are two tiny aggregates
    (per-token df, scalar N) broadcast back onto the term-frequency table;
    the per-doc top-k window sorts only each doc's own terms.

    Output: (doc_id, token, tf, tfidf) — ties broken by token for
    determinism; tfidf rounded 4dp (absorbs ln() ulp differences between
    engines)."""
    t = _term_freqs(docs, text_col, id_col)
    df_tbl = t.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_tbl = docs.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        t.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(n_tbl))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .select(id_col, "token", "tf", "tfidf")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    top_n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ranked keyword retrieval: Okapi BM25 over the corpus for a literal
    term list (Lucene's idf variant: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Plan shape: the term-frequency table is FILTERED to the query terms
    before any join (predicate on the grouped explode — tiny), then picks
    up df (broadcast), doc length and avgdl (broadcast scalars); one
    per-doc sum and a global top-n (TakeOrdered — no full sort). Scores
    rounded 4dp, doc_id tiebreak.

    Output: (doc_id, score, n_hit_terms)."""
    terms = [t.lower() for t in query_terms]
    t = _term_freqs(docs, text_col, id_col).filter(F.col("token").isin(terms))
    df_tbl = t.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    dl_tbl = docs.select(
        F.col(id_col), F.size(_words(F.col(text_col))).alias("dl")
    )
    stats = dl_tbl.select(
        F.avg("dl").alias("__avgdl"), F.count(F.lit(1)).alias("__n")
    )
    scored = (
        t.join(F.broadcast(df_tbl), "token")
        .join(dl_tbl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                1.0
                + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "__w",
            F.col("__idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(F.sum("__w"), 4).alias("score"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_n)
    )


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BPE tokenizer-training bootstrap (Sennrich et al. 2016,
    arXiv:1508.07909): corpus-wide counts of adjacent character pairs
    inside words — the statistic whose argmax is BPE's first merge.

    Scale shape: compress the corpus to its VOCABULARY first (one word
    groupBy — at 100 TB the vocab is millions of rows where the corpus is
    trillions of tokens), then explode each distinct word into its ≤len-1
    pairs weighted by word frequency. Pair counting therefore shuffles
    O(vocab × avg_word_len) rows, independent of corpus size; each BPE
    merge round in a full trainer re-runs this over the re-segmented
    vocab, so this is also the per-round cost model.

    Output: (pair string, cnt long) — top_k by count, ties broken by pair.
    """
    wf = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.length("w") >= 2)
    )
    pairs = wf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        F.col("n"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(top_k)
    )


def bpe_merge_vocab(
    docs: DataFrame,
    rounds: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Iterative BPE merge training (Sennrich et al. 2016,
    arXiv:1508.07909) — the actual tokenizer-training kernel, not just the
    round-0 statistic (bpe_pair_counts): ``rounds`` greedy merges, each
    picking the corpus-wide most frequent adjacent symbol pair
    (ties: count desc, then pair lexicographic) and re-segmenting the
    vocabulary with leftmost-first non-overlapping replacement.

    Scale shape: the corpus is compressed to its frequency-weighted
    VOCABULARY once (one word groupBy; vocab is millions of rows where the
    corpus is trillions of tokens), then each round is (a) one
    map-side-combined groupBy over the vocab's adjacent pairs, (b) a
    TakeOrdered(1) argmax — the only driver transfer, a single row —
    and (c) a pure-projection re-segmentation. Per-round cost is
    O(vocab x avg_word_len), independent of corpus size; an eager
    localCheckpoint on the (tiny) vocab truncates the growing lineage so
    round k never replans rounds 1..k-1.

    POLICY BOUND (SCALE.md §10): each round is one Spark job + one
    driver round-trip + one localCheckpoint, so wall-clock is linear in
    ``rounds`` with a per-round floor of job-scheduling overhead — fine
    at rounds≈10-100, hours of pure scheduling at a production 30k-merge
    vocab. At that scale, train on a fixed-size SAMPLED corpus (the merge
    table converges long before the full corpus is needed — vocabulary
    frequencies are what matter, and a ~1e6-word sample pins them) and/or
    cap ``rounds``; the application stage (bpe_encode_tokens) is already
    the scale-safe pure projection and handles the full corpus.

    Segmentations are delimited strings (",c1,,c2,," form — words are
    [a-z]+ so ',' can never occur in a symbol) and a merge applies as one
    literal ``replace(seg, ",a,,b,", ",ab,")``: both Spark and DuckDB
    replace() scan left-to-right non-overlapping, which IS the BPE
    replacement rule, so the oracle replays training exactly.

    Output: (merge_round, sym_a, sym_b, merged, pair_count) — one row per
    merge, in training order.
    """
    spark = docs.sparkSession
    wf = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    chars = F.filter(F.split("w", ""), lambda c: c != "")
    vocab = wf.select(
        F.concat(F.lit(","), F.array_join(chars, ",,"), F.lit(",")).alias("seg"),
        "n",
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, rounds + 1):
        s = F.expr("split(substring(seg, 2, length(seg) - 2), ',,')")
        best = (
            vocab.select(s.alias("s"), "n")
            .filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("s", 1, F.size("s") - 1).alias("a"),
                        F.slice("s", 2, F.size("s") - 1).alias("b"),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((r, a, b, a + b, cnt))
        # Lazy checkpoint: round r+1's argmax collect materializes this
        # frame anyway, so eager=True paid a SECOND job per round for the
        # same materialization — and the final round's vocab (never read
        # after the loop) is now never computed at all. Lineage still
        # truncates at each materialization, so no round replans its
        # predecessors.
        vocab = vocab.select(
            F.replace(
                F.col("seg"), F.lit(f",{a},,{b},"), F.lit(f",{a}{b},")
            ).alias("seg"),
            "n",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges,
        schema="merge_round int, sym_a string, sym_b string, "
        "merged string, pair_count bigint",
    )


def bpe_encode_tokens(
    docs: DataFrame,
    rounds: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a freshly trained BPE tokenizer to the corpus: train
    ``rounds`` merges (bpe_merge_vocab — vocab-sized work), then encode
    every word instance by replaying the merge rules in training order and
    count the resulting tokens per document.

    Scale shape: training cost is O(vocab) per round; application is a
    PURE PROJECTION — the k merge rules come back to the executors as k
    literal ``replace()`` expressions (a broadcast-join-free broadcast:
    the rules are baked into the plan), so encoding the corpus is one
    codegen'd map over the word stream plus one doc-keyed groupBy. This is
    exactly how a production tokenizer-apply stage runs: train once,
    ship the merge table, stream the corpus through it.

    Output: (doc_id, n_words, bpe_tokens) — tokens after ``rounds`` merges.
    """
    merges = bpe_merge_vocab(
        docs, rounds=rounds, text_col=text_col, id_col=id_col
    ).collect()
    chars = F.filter(F.split("w", ""), lambda c: c != "")
    seg = F.concat(F.lit(","), F.array_join(chars, ",,"), F.lit(","))
    toks = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("w")
    ).select(id_col, seg.alias("seg"))
    col = F.col("seg")
    for m in merges:
        a, b = m["sym_a"], m["sym_b"]
        col = F.replace(col, F.lit(f",{a},,{b},"), F.lit(f",{a}{b},"))
    n_sym = (
        F.length(col) - F.length(F.replace(col, F.lit(",,"), F.lit(","))) + 1
    )
    return (
        toks.select(id_col, n_sym.alias("n_sym"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("bpe_tokens"),
        )
    )


def _adjacent_pairs(
    docs: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared scaffold for the bigram-family operators: the tokenized
    corpus materialized ONCE (lazy localCheckpoint — every count-table
    branch would otherwise re-plan down to its own corpus scan+tokenize),
    plus the exploded adjacent-pair frame (id, w1, w2) from docs with >= 2
    tokens. arrays_zip over the two shifted slices stays in codegen."""
    toks = docs.select(
        F.col(id_col), _words(F.col(text_col)).alias("w")
    ).localCheckpoint(eager=False)
    big = (
        toks.filter(F.size("w") >= 2)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.slice("w", 1, F.size("w") - 1).alias("w1"),
                    F.slice("w", 2, F.size("w") - 1).alias("w2"),
                )
            ).alias("b"),
        )
        .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    return toks, big


def bigram_logprob_score(
    docs: DataFrame,
    lam: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated bigram LM quality score — the next tier above
    unigram_logprob_score on the CCNet-style filtering ladder (a corpus-
    trained bigram model standing in for the 5-gram KenLM).

    p(w2|w1) = lam * c(w1,w2)/c(w1) + (1-lam) * c(w2)/N, where c(w1) is
    the bigram-start count (so the conditional sums to 1 over the observed
    vocabulary) and c(w2)/N is the corpus unigram backoff. Per doc:
    token-position-weighted average of ln p over its bigrams.

    Plan: the tokenized corpus materializes ONCE (lazy localCheckpoint,
    same trade as dedup._minhash_profile — without it Catalyst re-plans
    every count-table branch down to its own corpus scan+tokenize, 5 scans
    measured); one explode of adjacent word pairs -> (doc,w1,w2) hash agg
    (THE shuffle, same class as the inverted-index build); corpus tables
    c12 / c1 / unigram re-aggregate that frame; scoring joins are keyed on
    vocabulary-sized frames. No UDFs — arrays_zip/slice stay in codegen.

    Output: (doc_id, n_bigrams, avg_logprob) — docs with < 2 tokens drop.
    """
    toks, big = _adjacent_pairs(docs, text_col, id_col)
    btf = big.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    c12 = btf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    uni = (
        toks.select(F.explode("w").alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    n_tok = uni.agg(F.sum("c2").alias("n"))
    p = F.lit(lam) * F.col("c12") / F.col("c1") + F.lit(1.0 - lam) * F.col(
        "c2"
    ) / F.col("n")
    return (
        btf.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(n_tok))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 4).alias(
                "avg_logprob"
            ),
        )
    )


def pmi_top_pairs(
    docs: DataFrame,
    top_k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information —
    the phrase-mining pass (word2phrase / tokenizer-merge candidates) of a
    corpus pipeline: PMI = ln( p(w1,w2) / (p(w1) p(w2)) ), bigram
    probability over adjacent-pair positions, unigram probabilities over
    token positions, pairs below ``min_count`` dropped (PMI is noise at
    low counts).

    Same shuffle shape as bigram_logprob_score minus the per-doc stage:
    tokenize once, one (w1,w2) agg, vocabulary-keyed joins, global top-k
    (a TakeOrdered, not a full sort).

    Output: (w1, w2, pair_count, pmi 4dp), ordered pmi desc then pair.
    """
    toks, big = _adjacent_pairs(docs, text_col, id_col)
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    n12 = c12.agg(F.sum("pair_count").alias("n12"))
    uni = (
        toks.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n1 = uni.agg(F.sum("c").alias("n1"))
    return (
        c12.filter(F.col("pair_count") >= min_count)
        .join(uni.select(F.col("t").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("t").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n12))
        .crossJoin(F.broadcast(n1))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("n12"))
                    / ((F.col("c1") / F.col("n1")) * (F.col("c2") / F.col("n1")))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )
