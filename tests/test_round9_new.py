"""Round-9 additions: the oracle tz-discipline guards (the r8
``streaming_trending_topk`` red's bug class), plus tests for the new
operators registered this round.
"""

from __future__ import annotations

import os
import re
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_correctness import dtype_mismatches  # noqa: E402


# ---------------------------------------------------------------------------
# Oracle tz discipline: DuckDB to_timestamp() returns TIMESTAMP WITH TIME
# ZONE while every Spark query here collects naive timestamps, so a bare
# to_timestamp( in any oracle is a driver schema failure waiting to happen
# (CORRECTNESS_r08.json: streaming_trending_topk). Windowed oracles must use
# naive make_timestamp(); a legit epoch-seconds use must be wrapped in
# CAST(... AS TIMESTAMP) and added to the allowlist below with a comment.
# ---------------------------------------------------------------------------

_TO_TIMESTAMP_ALLOWLIST: set[str] = set()


def test_no_bare_to_timestamp_in_any_oracle():
    from ecommerce_data_pipeline_spark.queries import ORACLES

    offenders = []
    for name, sql in ORACLES.items():
        if name in _TO_TIMESTAMP_ALLOWLIST:
            continue
        # Strip CAST(to_timestamp(...) AS TIMESTAMP)-wrapped uses: the CAST
        # back to naive TIMESTAMP is exactly the discipline we require.
        stripped = re.sub(
            r"CAST\s*\(\s*to_timestamp\b.*?AS\s+TIMESTAMP\s*\)",
            "",
            sql,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if re.search(r"\bto_timestamp\s*\(", stripped, re.IGNORECASE):
            offenders.append(name)
    assert not offenders, (
        f"oracles using bare to_timestamp() (returns TIMESTAMPTZ; driver "
        f"schema check fails vs Spark's naive timestamps): {offenders} — "
        f"use make_timestamp(epoch_micros) or CAST(... AS TIMESTAMP)"
    )


def test_verifier_fails_tz_aware_vs_naive():
    naive = pd.DataFrame(
        {"w": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:15:00"])}
    )
    aware = pd.DataFrame({"w": naive["w"].dt.tz_localize("UTC")})
    kind_bad, tz_bad = dtype_mismatches(naive, aware)
    assert tz_bad == ["w"] and not kind_bad
    # symmetric
    assert dtype_mismatches(aware, naive)[1] == ["w"]
    # both naive / both aware: fine
    assert dtype_mismatches(naive, naive.copy()) == ([], [])
    assert dtype_mismatches(aware, aware.copy()) == ([], [])


def test_verifier_fails_int_vs_float():
    a = pd.DataFrame({"n": [1, 2]})
    b = pd.DataFrame({"n": [1.0, 2.0]})
    kind_bad, tz_bad = dtype_mismatches(a, b)
    assert kind_bad == ["n"] and not tz_bad


# ---------------------------------------------------------------------------
# kmeans oracle-parity cap (ADVICE r8): kmeans_fit's default
# fit_sample=100_000 sees the same rows as the oracles' full-corpus Lloyd
# replay ONLY while every oracle-certified embeddings fixture stays under
# the cap. Pin that invariant so a fixture regeneration cannot silently
# break centroid parity for every k-means-backed query.
# ---------------------------------------------------------------------------

def test_embeddings_fixtures_under_kmeans_fit_sample_cap():
    import inspect

    import duckdb

    from ecommerce_data_pipeline_spark.operators.quantize import kmeans_fit

    cap = inspect.signature(kmeans_fit).parameters["fit_sample"].default
    assert cap is not None
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/embeddings.parquet"
        if not os.path.exists(path):
            continue
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{path}')"
        ).fetchone()[0]
        assert n <= cap, (
            f"sf{sf} embeddings has {n} rows > fit_sample default {cap}: "
            f"kmeans_fit's sample would diverge from the oracles' "
            f"full-corpus Lloyd replay — mirror the smallest-md5 sample "
            f"in _kmeans_cells_sql before raising the cap"
        )


# ---------------------------------------------------------------------------
# ivf_pq_rerank_topk: with the shortlist covering the whole corpus and
# nprobe = n_cells (nothing pruned, nothing lost to PQ shortlisting), the
# exact rerank must equal brute-force cosine_topk.
# ---------------------------------------------------------------------------

def _toy_embeddings(spark, n=30, dim=8):
    import numpy as np

    rng = np.random.RandomState(9)
    rows = [
        (int(i), [float(x) for x in rng.randn(dim)], int(i % 3))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_ivf_pq_rerank_full_shortlist_equals_exact(spark):
    from ecommerce_data_pipeline_spark.operators.quantize import (
        ivf_pq_rerank_topk,
    )
    from ecommerce_data_pipeline_spark.operators.similarity import cosine_topk

    emb = _toy_embeddings(spark, n=30, dim=8)
    queries = emb.filter("vec_id % 10 = 0")
    got = ivf_pq_rerank_topk(
        emb, queries, k=5, shortlist_mult=6, n_cells=4, nprobe=4, m=4
    )
    want = cosine_topk(emb, queries, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_corpus_snapshot_diff_classification(spark):
    from ecommerce_data_pipeline_spark.operators.curate import (
        corpus_snapshot_diff,
    )

    schema = "doc_id long, text string, source string"
    old = spark.createDataFrame(
        [
            (1, "a", "web"),     # unchanged
            (2, "b", "web"),     # changed
            (3, "c", "web"),     # removed
            (4, None, "books"),  # NULL text both sides -> unchanged
            (5, "e", "books"),   # NULL'd text -> changed
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, "a", "web"),
            (2, "B", "web"),
            (4, None, "books"),
            (5, None, "books"),
            (6, "f", "web"),     # added
            (7, None, "books"),  # added with NULL text
        ],
        schema,
    )
    got = {
        r["source"]: (
            r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"]
        )
        for r in corpus_snapshot_diff(old, new).collect()
    }
    assert got == {"web": (1, 1, 1, 1), "books": (1, 0, 1, 1)}


def test_ivf_pq_rerank_is_shortlist_bounded(spark):
    """With a tight shortlist the rerank emits exactly k rows per query,
    ranked by exact cosine descending with neighbor_id tiebreak."""
    from ecommerce_data_pipeline_spark.operators.quantize import (
        ivf_pq_rerank_topk,
    )

    emb = _toy_embeddings(spark, n=30, dim=8)
    queries = emb.filter("vec_id % 10 = 0")
    out = ivf_pq_rerank_topk(
        emb, queries, k=3, shortlist_mult=2, n_cells=4, nprobe=2, m=4
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [(-r["cosine_sim"], r["neighbor_id"]) for r in rows]
        assert sims == sorted(sims)
