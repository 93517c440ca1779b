"""Round-7 late-batch operator tests: char entropy, Heaps vocab growth,
Zipf slope, and (added with their queries) MMR rerank / edit-distance
verify / multi-touch attribution / span corruption."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.text import char_entropy


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_entropy_known_distributions(spark):
    out = {
        r["doc_id"]: r
        for r in char_entropy(
            _docs(
                spark,
                [
                    (1, "aaaa"),  # single symbol -> 0 bits
                    (2, "abab"),  # two equiprobable symbols -> 1 bit
                    (3, "abcd"),  # four equiprobable symbols -> 2 bits
                    (4, None),  # null text -> no rows
                    (5, ""),  # empty text -> no rows
                ],
            )
        ).collect()
    }
    assert out[1]["char_entropy"] == 0.0 and out[1]["ent_bucket"] == "low"
    assert out[2]["char_entropy"] == 1.0
    assert out[3]["char_entropy"] == 2.0
    assert out[3]["n_chars_used"] == 4
    assert 4 not in out and 5 not in out


def test_char_entropy_matches_numpy(spark):
    text = "the quick brown fox jumps over the lazy dog" * 3
    row = char_entropy(_docs(spark, [(1, text)])).collect()[0]
    _, counts = np.unique(list(text), return_counts=True)
    p = counts / counts.sum()
    expected = -(p * np.log2(p)).sum()
    assert abs(row["char_entropy"] - expected) < 1e-3


def test_vocab_growth_curve_toy(spark, tmp_path, sf_dir_factory):
    sf = sf_dir_factory(
        documents=[
            (1, "a b c", "en", "s", 5),
            (2, "a b d", "en", "s", 5),
            (3, "", "en", "s", 0),
            (4, "d e", "en", "s", 3),
        ]
    )
    from ecommerce_data_pipeline_spark.queries.llm_text import (
        q_vocab_growth_curve,
    )

    rows = {
        r["doc_id"]: (r["cum_tokens"], r["cum_vocab"])
        for r in q_vocab_growth_curve(spark, sf).collect()
    }
    assert rows == {1: (3, 3), 2: (6, 4), 3: (6, 4), 4: (8, 5)}


def test_zipf_slope_matches_numpy_ols(spark, sf_dir_factory):
    # Synthetic near-Zipf corpus: token r appears ceil(64/r) times. Token
    # names must be alphabetic — the shared tokenizer strips digits.
    words = []
    for r in range(1, 20):
        name = "tok" + chr(ord("a") + r // 10) + chr(ord("a") + r % 10)
        words += [name] * math.ceil(64 / r)
    text = " ".join(words)
    sf = sf_dir_factory(documents=[(1, text, "en", "s0", len(text))])
    from ecommerce_data_pipeline_spark.queries.llm_text import q_zipf_slope

    row = q_zipf_slope(spark, sf).collect()[0]
    counts = sorted((math.ceil(64 / r) for r in range(1, 20)), reverse=True)
    x = np.array([round(math.log(i + 1) * 1e5) for i in range(len(counts))])
    y = np.array([round(math.log(c) * 1e5) for c in counts])
    n = len(x)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() * x.sum()
    )
    assert row["n_terms"] == 19
    assert row["zipf_slope"] == round(slope, 4)
    assert -1.3 < row["zipf_slope"] < -0.7


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mmr_skips_redundant_candidate(spark):
    from ecommerce_data_pipeline_spark.operators.similarity import mmr_rerank

    # q = [1,0]; a/b are near-identical high-relevance twins; c is barely
    # relevant but anti-correlated with a. Pure relevance ranks (a, b, c);
    # MMR at lambda=0.5 must pick a then c: score(b) = 0.5*(0.9900-1.0) < 0
    # while score(c) = 0.5*(0.0699-(-0.0705)) > 0.
    vecs = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.99, 0.14]),    # a: rel ~0.9901
            (2, [0.99, 0.141]),   # b: rel ~0.9900, sim(a,b) ~1.0
            (3, [0.07, -1.0]),    # c: rel ~0.0699, sim(a,c) ~-0.07
        ],
    )
    out = mmr_rerank(
        vecs, vecs.filter(F.col("vec_id") == 0), k_candidates=3, k_select=2
    ).collect()
    picked = {r["sel_rank"]: r["neighbor_id"] for r in out}
    assert picked == {1: 1, 2: 3}


def test_mmr_matches_numpy_greedy(spark):
    from ecommerce_data_pipeline_spark.operators.similarity import mmr_rerank

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(40, 8)).astype(np.float32)
    vecs = _emb(spark, [(i, mat[i].tolist()) for i in range(40)])
    out = mmr_rerank(
        vecs, vecs.filter(F.col("vec_id") == 0), k_candidates=10, k_select=4
    ).collect()

    m = mat.astype(np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    cos = np.round((m @ m.T) / np.outer(norms, norms), 4)
    rel = cos[0].copy()
    rel[0] = -np.inf
    cand = sorted(range(1, 40), key=lambda i: (-rel[i], i))[:10]
    sel = [min(cand, key=lambda i: (-rel[i], i))]
    while len(sel) < 4:
        rest = [c for c in cand if c not in sel]
        best = min(
            rest,
            key=lambda d: (-(0.5 * rel[d] - 0.5 * max(cos[d][s] for s in sel)), d),
        )
        sel.append(best)
    got = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["sel_rank"])]
    assert got == sel


def test_edit_distance_near_dup_filters(spark, sf_dir_factory):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the quiet green forest before the rain begins to fall "
        "while birds return to their nests and the river keeps moving "
        "slowly past the old stone bridge toward the distant silver sea"
    )
    twin = base.replace("quiet", "silent", 1)  # one edit in ~250 chars
    # same shingle soup, heavily reordered -> high jaccard, low edit_sim
    words = base.split()
    shuffled = " ".join(words[::-1])
    sf = sf_dir_factory(
        documents=[
            (1, base, "en", "s", len(base)),
            (2, twin, "en", "s", len(twin)),
            (3, shuffled, "en", "s", len(shuffled)),
            (4, "completely unrelated text about spark plans", "en", "s", 44),
        ]
    )
    from ecommerce_data_pipeline_spark.queries.llm_text import (
        q_edit_distance_near_dup,
    )

    rows = q_edit_distance_near_dup(spark, sf).collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in rows}
    assert pairs == {(1, 2)}
    (row,) = rows
    assert row["edit_sim"] >= 0.97 and row["lev"] <= 7
