"""K-means IVF quantizer: determinism, assignment sanity, and multi-probe
recall against the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.quantize import (
    assign_cells,
    kmeans_fit,
    multiprobe_topk,
)
from ecommerce_data_pipeline_spark.operators.similarity import cosine_topk
from ecommerce_data_pipeline_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def test_kmeans_deterministic_and_covers_cells(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    c1 = kmeans_fit(emb, k=8, iters=3)
    c2 = kmeans_fit(emb, k=8, iters=3)
    assert c1 == c2  # bit-identical across runs (deterministic init + plan)
    cells = assign_cells(emb, c1)
    counts = {r["cell"]: r["n"] for r in cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(counts) >= 4  # clustering actually spreads the corpus
    assert sum(counts.values()) == emb.count()


def test_multiprobe_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = kmeans_fit(emb, k=8, iters=3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx_full = {
        (r["query_id"], r["neighbor_id"])
        for r in multiprobe_topk(emb, queries, centroids, k=5, nprobe=8).collect()
    }
    # nprobe == k_cells probes everything → must equal the exact answer.
    assert approx_full == exact
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in multiprobe_topk(emb, queries, centroids, k=5, nprobe=3).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"multi-probe recall {recall} too low"


def test_ann_recall_report_bounds(spark):
    from ecommerce_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["ann_recall_report"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    vals = [r["recall_at_5"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in vals)
    # nprobe=3 of 8 cells on clustered synthetic data: recall well above
    # the 3/8 random-pruning floor.
    assert sum(vals) / len(vals) >= 0.5


def test_semantic_dedup_drops_higher_id_of_near_pair(spark):
    from ecommerce_data_pipeline_spark.operators.quantize import semantic_dedup

    # Two identical vectors (cos=1) plus one orthogonal: the higher id of
    # the identical pair is dropped, everything else kept.
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (9, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(emb, k=2, iters=2, threshold=0.95).collect()}
    assert out[1] is True and out[9] is True
    assert out[2] is False


def test_pq_exact_when_codebook_saturates(spark):
    # k >= n distinct vectors => every vector is its own centroid in every
    # subspace => ADC distance == exact distance => recall@k must be 1.
    import pyspark.sql.functions as F

    from ecommerce_data_pipeline_spark.operators.quantize import (
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), 0.0, float(-i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    books = pq_fit(vecs, m=2, k=8, iters=2)
    assert len(books) == 2 and all(len(cb[0]) == 2 for cb in books)
    codes = pq_encode(vecs, books)
    rows = {r["vec_id"]: list(r["pq_codes"]) for r in codes.collect()}
    assert len({tuple(v) for v in rows.values()}) == 6  # all distinct codes
    top = pq_adc_topk(vecs, vecs.filter(F.col("vec_id") == 0), books, k=2)
    got = [r["neighbor_id"] for r in top.orderBy("rank").collect()]
    assert got == [1, 2]  # exact L2 order from v0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pq_fit(vecs, m=3)  # dim 4 not divisible
