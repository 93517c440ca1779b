"""Measured sf-scaling probe for the heavy-tier queries.

Runs each named query at sf0.001 / sf0.01 / sf0.1 (two decades of data
volume) in one warm session and fits the per-decade scaling exponent
alpha: t ~ n^alpha, alpha = log10(t_hi/t_lo) / log10(n_hi/n_lo), where n is
the row count of the query's basis table (HEAVY map — documents and
embeddings do NOT grow 10x per decade). alpha <= ~1.15 reads as linear (fixed
per-query machinery makes small-sf runs overestimate the constant, so the
exponent across the LAST decade, sf0.01 -> sf0.1, is the honest one);
anything super-linear is a bug report on the query's own plan.

Usage: python tools/scaling_probe.py [query ...]   (default: heavy tier)
Emits a markdown table (paste into SCALE.md §measured) + one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> the table whose row count is the scaling basis n. The driver
# testdata scales lineitem 10x per decade but documents/embeddings only
# grow in the sf0.01 -> sf0.1 decade (500 -> 5000 docs, 500 -> 2000
# embeddings), so exponents must be computed against the table the query
# actually consumes or they understate the true slope.
HEAVY = {
    "streaming_fct_sales_minute": "orders",
    "ngram_jaccard_pairs": "documents",
    "streaming_session_windows": "events",
    "part_pagerank": "lineitem",
    "stream_stream_attribution_join": "events",
    "ann_recall_report": "embeddings",
    "part_triangles": "lineitem",
    "dedup_clusters": "documents",
    "pq_recall_report": "embeddings",
    "dedup_incremental_assign": "documents",
    "minhash_lsh_pairs": "documents",
    "hybrid_rrf_search": "documents",
    # round-7 additions
    "image_phash_dedup": "documents",
    "audio_fingerprint_dedup": "documents",
    "text_minhash_topk_join": "documents",
    "bpe_encode_tokens": "documents",
    "bpe_merge_vocab": "documents",
    "video_frame_topk": "documents",
    # round-8 additions (r7 verdict: the >2.5 s heavy tier must carry a
    # measured alpha row; multitouch per ask #3's bucketed-join rework)
    "edit_distance_near_dup": "documents",
    "mmr_diverse_topk": "embeddings",
    "multitouch_attribution": "events",
    # round-9 additions (r8 verdict ask #5: the two new heavy entries —
    # the artifact-probe streaming dedup and IVFPQ — plus the rerank twin)
    "streaming_incremental_dedup": "documents",
    "ivf_pq_topk": "embeddings",
    "ivf_pq_rerank_topk": "embeddings",
    "cdc_chunk_dedup": "documents",
    "streaming_trending_topk_merge": "events",
    "incremental_view_refresh": "lineitem",
    "part_kcore": "lineitem",
    "streaming_trending_topk": "events",
    "boilerplate_segment_report": "documents",
    "tokenizer_fertility_by_lang": "documents",
    "knn_label_accuracy_ivf": "embeddings",
    "copurchase_lift": "lineitem",
    "simhash_pairs": "documents",
    "shingle_novelty_curve": "documents",
    "streaming_ann_assign": "embeddings",
    # round-11 additions (new >2.5 s entries: posting compaction, IVF
    # contamination, z-order layout rewrite, duplicated-span runs)
    "ann_postings_compaction": "embeddings",
    "eval_contamination_ivf": "embeddings",
    "streaming_postings_lifecycle": "embeddings",
    "ivf_postings_probe": "embeddings",
    "postings_vacuum_read": "embeddings",
    # quarantine_recovery measured 1.58 s flat (alpha -0.00) in round 12
    # — below the 2.5 s heavy-tier bar, so not tracked here.
    "zorder_orders_layout": "orders",
    "dup_span_runs": "documents",
    "part_reachability_rcte": "lineitem",
    # r14 additions (>2.5 s at sf0.1 in the clean r14 bench, plus the two
    # borderline lake-ops queries for completeness)
    "zorder_multiband_scan": "orders",
    "partitioned_retention_delete": "orders",
    "small_files_compaction": "events",
    "advised_skew_join": "events",
    "streaming_file_index": "orders",
    "cbo_stats_broadcast": "lineitem",
    "incremental_zorder_maintenance": "orders",
    "boilerplate_strip": "documents",
    # r15 additions (>2.5 s at sf0.1 in the clean r15 bench)
    "file_index_append_table": "orders",
    "retention_inflight_reader": "orders",
    "advised_null_skew_left_join": "events",
    # r16 addition (manifest-pointer compaction + zorder maintenance)
    "compaction_inflight_reader": "events",
}

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# SPARK_GRAFT_EXTRA_SF appends one more scale dir (e.g. the generated sf1
# from tools/gen_sf1.py — r14 verdict ask #7: measure the sf0.1 -> sf1
# decade instead of extrapolating it). With it set, alpha_last_decade is
# computed over sf0.1 -> sf1. SPARK_GRAFT_PROBE_LAST_TWO=1 additionally
# drops the two smallest scales so a heavy-tier sweep at sf1 doesn't pay
# the sf0.001/sf0.01 runs again (their exponents are already in SCALE.md).


def main() -> None:
    names = sys.argv[1:] or list(HEAVY)
    global SFS
    extra = os.environ.get("SPARK_GRAFT_EXTRA_SF")
    if extra:
        SFS = SFS + [extra.rstrip("/")]
    if os.environ.get("SPARK_GRAFT_PROBE_LAST_TWO") == "1":
        SFS = SFS[-2:]
    from ecommerce_data_pipeline_spark.session import get_spark
    from ecommerce_data_pipeline_spark.queries import QUERIES

    spark = get_spark()
    tables = sorted({HEAVY.get(n, "lineitem") for n in names})
    nrows = {
        (sf, t): spark.read.parquet(f"{sf}/{t}.parquet").count()
        for sf in SFS
        for t in tables
    }
    # Warm the JVM + parquet footers so sf0.001 doesn't pay cold-start.
    QUERIES[names[0]](spark, SFS[0]).count()

    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        basis = HEAVY.get(name, "lineitem")
        times = {}
        for sf in SFS:
            best = math.inf
            for _ in range(2):  # best-of-2: VM timer noise is ~±15%
                t0 = time.time()
                fn(spark, sf).count()
                best = min(best, time.time() - t0)
            times[sf] = best
        ts = [times[s] for s in SFS]
        growth_last = nrows[(SFS[-1], basis)] / nrows[(SFS[-2], basis)]
        alpha_last = (
            math.log10(ts[-1] / ts[-2]) / math.log10(growth_last)
            if growth_last > 1
            else float("nan")
        )
        results[name] = {
            "basis_table": basis,
            "basis_growth_last_decade": growth_last,
            **{
                f"{os.path.basename(s)}_s": round(t, 2)
                for s, t in zip(SFS, ts)
            },
            "alpha_last_decade": round(alpha_last, 2),
        }
        cells = " | ".join(f"{t:.2f}" for t in ts)
        print(
            f"| {name} | {basis} ×{growth_last:g} | {cells} "
            f"| {alpha_last:.2f} |",
            flush=True,
        )
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
