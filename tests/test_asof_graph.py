"""Operator goldens: as-of join, binned interval-overlap join, connected
components / dedup clustering (operators/asof.py, operators/graph.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from ecommerce_data_pipeline_spark.operators.asof import (
    asof_join,
    interval_overlap_pairs,
)
from ecommerce_data_pipeline_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


def test_asof_join_picks_latest_prior_row_inclusive(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(10), lv="p1"),
            Row(k=1, ts=_ts(20), lv="p2"),
            Row(k=2, ts=_ts(5), lv="p3"),  # no prior right row -> dropped
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(9), rv="old"),
            Row(k=1, ts=_ts(10), rv="tie"),  # same ts as p1: inclusive match
            Row(k=1, ts=_ts(15), rv="mid"),
            Row(k=2, ts=_ts(6), rv="late"),  # after p3 -> not a match
        ]
    )
    out = {
        r["lv"]: r
        for r in asof_join(
            left, right, on=["k"], value_cols=["rv"], prefix="m_"
        ).collect()
    }
    assert set(out) == {"p1", "p2"}
    assert out["p1"]["m_rv"] == "tie" and out["p1"]["m_ts"] == _ts(10)
    assert out["p2"]["m_rv"] == "mid" and out["p2"]["m_ts"] == _ts(15)


def test_asof_join_tolerance_drops_stale_matches(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(30), lv="p")])
    right = spark.createDataFrame([Row(k=1, ts=_ts(0), rv="ancient")])
    assert (
        asof_join(left, right, on=["k"], value_cols=["rv"]).count() == 1
    )
    assert (
        asof_join(
            left, right, on=["k"], value_cols=["rv"], tolerance_seconds=600
        ).count()
        == 0
    )


def test_asof_join_struct_carries_whole_row(spark):
    # A right row with a NULL value column must still be THE match (no
    # per-column fallback to an older row).
    left = spark.createDataFrame([Row(k=1, ts=_ts(10), lv="p")])
    right = spark.createDataFrame(
        [Row(k=1, ts=_ts(1), rv="filled"), Row(k=1, ts=_ts(5), rv=None)]
    )
    row = asof_join(left, right, on=["k"], value_cols=["rv"]).collect()[0]
    assert row["matched_ts"] == _ts(5)
    assert row["matched_rv"] is None


def test_interval_overlap_pairs_cross_bucket_dedup(spark):
    # Sessions span multiple 1h buckets; each overlapping pair must appear
    # exactly once, non-overlapping and same-group pairs never.
    rows = [
        Row(g=1, sid=1, s=_ts(0), e=dt.datetime(2024, 1, 1, 14, 30)),  # 12:00-14:30
        Row(g=2, sid=1, s=dt.datetime(2024, 1, 1, 13, 0), e=dt.datetime(2024, 1, 1, 15, 0)),
        Row(g=3, sid=1, s=dt.datetime(2024, 1, 1, 16, 0), e=dt.datetime(2024, 1, 1, 17, 0)),
        Row(g=1, sid=2, s=dt.datetime(2024, 1, 1, 13, 30), e=dt.datetime(2024, 1, 1, 13, 45)),
    ]
    df = spark.createDataFrame(rows)
    pairs = interval_overlap_pairs(
        df, id_cols=["sid"], start_col="s", end_col="e",
        partition_col="g", bucket_seconds=3600,
    ).collect()
    got = {(r["a_g"], r["a_sid"], r["b_g"], r["b_sid"]) for r in pairs}
    # (g1,s1)x(g2,s1) overlap 13:00-14:30 across 2 shared buckets -> once;
    # (g1,s2)x(g2,s1) overlap; g3 overlaps nothing; g1's two sessions
    # overlap each other but share a group -> excluded.
    assert got == {(1, 1, 2, 1), (1, 2, 2, 1)}
    assert len(pairs) == len(got)


def test_connected_components_chain_and_singleton(spark):
    edges = spark.createDataFrame(
        [Row(src=2, dst=3), Row(src=3, dst=4), Row(src=10, dst=11)]
    )
    vertices = spark.createDataFrame([Row(id=i) for i in [2, 3, 4, 7, 10, 11]])
    comp = {
        r["id"]: r["component"]
        for r in connected_components(edges, vertices=vertices).collect()
    }
    assert comp == {2: 2, 3: 2, 4: 2, 7: 7, 10: 10, 11: 10}


def test_dedup_clusters_transitive_keep_one(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 6)])
    # 1~2, 2~3 transitively cluster {1,2,3}; 4 and 5 are singletons.
    pairs = spark.createDataFrame(
        [Row(doc_id_a=1, doc_id_b=2), Row(doc_id_a=2, doc_id_b=3)]
    )
    out = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert {d: r["cluster_id"] for d, r in out.items()} == {
        1: 1, 2: 1, 3: 1, 4: 4, 5: 5,
    }
    keepers = {d for d, r in out.items() if r["is_canonical"]}
    assert keepers == {1, 4, 5}


def test_resample_locf_hourly_grid(spark):
    from ecommerce_data_pipeline_spark.operators.asof import resample_locf

    obs = spark.createDataFrame(
        [
            Row(k=1, ts=dt.datetime(2024, 1, 1, 12, 15), v=10.0),
            Row(k=1, ts=dt.datetime(2024, 1, 1, 14, 45), v=20.0),
            Row(k=1, ts=dt.datetime(2024, 1, 1, 15, 30), v=30.0),
        ]
    )
    out = {
        r["grid_ts"]: r
        for r in resample_locf(
            obs, on=["k"], ts_col="ts", value_cols=["v"]
        ).collect()
    }
    # Grid spans trunc(min)=12:00 .. max=15:30 → 12,13,14,15; 12:00 has no
    # prior observation (inner as-of) so it is dropped.
    assert sorted(h.hour for h in out) == [13, 14, 15]
    assert out[dt.datetime(2024, 1, 1, 13, 0)]["matched_v"] == 10.0  # LOCF
    assert out[dt.datetime(2024, 1, 1, 14, 0)]["matched_v"] == 10.0
    assert out[dt.datetime(2024, 1, 1, 15, 0)]["matched_v"] == 20.0


def test_connected_components_long_chain(spark):
    """A 64-node path graph has diameter 63: one-hop min-propagation alone
    would silently exhaust max_iter; the pointer-doubling hop must settle
    it to a single all-zero component within ~log2(64)+2 rounds."""
    from ecommerce_data_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    # Force the distributed pointer-doubling path (small_graph_edges=0);
    # the driver union-find fast path must produce the identical labeling.
    out = connected_components(edges, max_iter=12, small_graph_edges=0)
    rows = out.collect()
    assert len(rows) == 64
    assert {r["component"] for r in rows} == {0}
    fast = connected_components(edges).collect()
    assert {(r["id"], r["component"]) for r in fast} == {
        (r["id"], r["component"]) for r in rows
    }


def test_pagerank_paths_identical(spark):
    # path graph 1-2-3 plus isolated pair 4-5: hub (2) must outrank leaves
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    from ecommerce_data_pipeline_spark.operators.graph import pagerank

    fast = {
        r["id"]: r["rank_nano"]
        for r in pagerank(edges, iters=5).collect()
    }
    dist = {
        r["id"]: r["rank_nano"]
        for r in pagerank(edges, iters=5, small_graph_edges=0).collect()
    }
    assert fast == dist  # exact integer agreement between both paths
    assert fast[2] > fast[1] == fast[3]  # hub outranks symmetric leaves
    assert fast[4] == fast[5]
    # duplicate + reversed edges must not change degrees or ranks
    noisy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 2), (4, 5)], "src long, dst long"
    )
    assert fast == {
        r["id"]: r["rank_nano"] for r in pagerank(noisy, iters=5).collect()
    }


def test_triangle_counts_oriented(spark):
    from ecommerce_data_pipeline_spark.operators.graph import triangle_counts

    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    out = {r["id"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}
    # duplicate / reversed edges must not inflate counts
    noisy = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (2, 3), (2, 4), (2, 4)],
        "src long, dst long",
    )
    assert {
        r["id"]: r["triangles"] for r in triangle_counts(noisy).collect()
    } == out
    # triangle-free graph -> empty result
    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert triangle_counts(path).count() == 0
