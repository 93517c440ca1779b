"""Plan-invariant audit: assert scale discipline over EVERY registry query.

Hard invariants (exit 1 on violation):

1. No ``BatchEvalPython`` anywhere — row-at-a-time Python UDFs are banned
   outright; Python must enter plans only as Arrow-vectorized nodes.
2. Arrow/pandas nodes (MapInPandas / ArrowEvalPython / AggregateInPandas /
   FlatMapGroupsInPandas) appear only in PANDAS_OK queries — the documented
   extension-layer exceptions (multimodal kernels, the LSH band-bucket
   numpy fold, k-means assignment) — never in the reference-parity layer.
3. Cartesian / broadcast-nested-loop joins appear only in CARTESIAN_OK
   queries, each audited as a 1-row broadcast scalar join (corpus stats,
   funnel denominators, exact-baseline top-k) — never data x data.

Queries in SKIP_BUILD execute work at DataFrame-construction time
(streaming drains, driver-fast-path materializations), so their final plan
is a checkpoint scan with nothing to audit — they are covered by
CORRECTNESS rows and tests instead.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001; prints one
line per violation, a summary, and regenerates nothing — read-only).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose construction RUNS the workload (streaming drains, eager
# checkpoints): plan audit is meaningless post-hoc.
SKIP_BUILD = {
    "streaming_fct_sales_minute",
    "streaming_replay_dedup",
    "streaming_session_windows",
    "stream_stream_attribution_join",
    "user_state_history",
    "notification_emails",
    "cdc_change_feed",
    "table_time_travel",
    "schema_evolution_merge",
    "gdpr_delete_audit",
    "streaming_media_decode",
    # r8: artifact-probe dedup drain (foreachBatch over the file stream)
    "streaming_incremental_dedup",
    # r10: ANN index-maintenance drain (foreachBatch assigns new vectors
    # against broadcast centroid literals; final plan is a postings scan)
    "streaming_ann_assign",
    # r10: JSONL / .tbl write+read-back executes at build; final plan is
    # the eager checkpoint of the round-tripped aggregate
    "corpus_jsonl_roundtrip",
    "orders_tbl_roundtrip",
    # r11: four posting-batch writes + compaction run at build; final plan
    # is the eager checkpoint of the post-compaction per-cell aggregate
    # (compaction plan audited in code: partition-pruned snapshot read,
    # repartition by cell, one file per cell)
    "ann_postings_compaction",
    # r11: ORC write + pushdown guard run at build; final plan is the
    # eager checkpoint of the read-back content aggregate
    "lineitem_orc_roundtrip",
    # r11: z-order rewrite + layout guard run at build; final plan is the
    # eager checkpoint of the read-back content aggregate (layout job
    # audited in code: one quantile sample pass per column + one range
    # shuffle, no UDF in the Morton key)
    "zorder_orders_layout",
    # r12: full write→compact-mid-stream→resume lifecycle runs at build;
    # final plan is the eager checkpoint of the per-cell aggregate (each
    # stage reuses already-audited machinery: streaming_ann_assign's
    # foreachBatch map stage, ann_postings_compaction's partition-pruned
    # one-file-per-cell rewrite + manifest/repair pre-pass)
    "streaming_postings_lifecycle",
    # r12: posting write+compaction execute at build; final plan is the
    # partition-pruned cell-scan join certified by the pruning test
    # (tests/test_round12_new.py) and the oracle equality
    "ivf_postings_probe",
    # r12: retained compaction + vacuum execute at build; final plan is
    # the grouped count/checksum over the manifest-aware snapshot read
    # (reader-safety certified by the raw-vs-snapshot assertions inside)
    "postings_vacuum_read",
    # r12: corrupt-dump write + strict read + quarantine replay execute
    # at build; final plan is the grouped union of good + recovered
    # (recovery completeness asserted inside, oracle hash on the result)
    "quarantine_recovery",
    # r12: multiline .tbl write+read-back executes at build; final plan is
    # the eager checkpoint of the grouped note/count/checksum aggregate
    # (multiLine read is the documented whole-file landing path, not the
    # 100 TB scan)
    "orders_tbl_multiline_roundtrip",
    # r8: watermarked windowed-count drain + rank-on-read
    "streaming_trending_topk",
    # r9: update-mode drain maintaining the gold top-k via foreachBatch
    # MERGE (rank + MERGE audited in the foreachBatch body: counts MERGE
    # by (window_start, event_type), rank over touched windows only,
    # top-k MERGE by (window_start, rank) — all equi-joins)
    "streaming_trending_topk_merge",
    # r9: bootstrap + change-feed MERGE + key-pruned refresh all run at
    # build (refresh path audited in code: broadcast semi-joins on the
    # affected keys prune both scans)
    "incremental_view_refresh",
    # r9: symmetrized edge set is eagerly checkpointed at build (and the
    # small-graph numpy peel runs there); per-round plan is one degree
    # groupBy + two semi-joins, audited in code
    "part_kcore",
    # r13: full postings lifecycle (write → retained compact → in-flight
    # snapshot → vacuum) runs at build; final plan is the eager
    # checkpoint of the per-cell aggregate (reader/vacuum disjointness
    # certified by the in-query guards and the oracle hash)
    "postings_inflight_reader",
    # r13: streaming dropDuplicates drain + statestore read run at build;
    # final plan is the eager checkpoint of the per-type state aggregate
    "streaming_state_inspect",
    # r13: z-order rewrite + stats-index build + skipping scan run at
    # build; final plan is the eager checkpoint of the band aggregate
    # (pruning effectiveness asserted in-query; predicate pushdown on the
    # survivor scan pinned by tests/test_profile_fileindex.py)
    "file_skipping_scan",
    # r13: bucketed saveAsTable writes + the zero-Exchange plan guard run
    # at build; final plan is the eager checkpoint of the per-flag
    # aggregate (co-location pinned by the in-query SortMergeJoin/no-
    # Exchange assertion and tests/test_skew.py)
    "bucketed_colocated_join",
    # r13: streaming ingest + per-batch incremental index refresh run at
    # build; final plan is the eager checkpoint of the band aggregate
    # (incremental == full-rebuild equality asserted in-query)
    "streaming_file_index",
    # r14: z-order rewrite + three index prunes run at build; final plan
    # is the eager checkpoint of the 2-band aggregate (2-D pruning
    # superiority asserted in-query; survivor-scan pushdown same as
    # file_skipping_scan)
    "zorder_multiband_scan",
    # r14: 64-file landing + size listing + planned rewrite run at
    # build; final plan is the eager checkpoint of the content aggregate
    # (plan arithmetic + exact output file count asserted in-query)
    "small_files_compaction",
    # r14: partitioned write + dir drops + boundary rewrite run at
    # build; final plan is the eager checkpoint of the kept-rows
    # aggregate (untouched-files byte-identity asserted in-query)
    "partitioned_retention_delete",
    # r14: catalog-table writes + ANALYZE + the two plan contrasts run at
    # build; final plan is the eager checkpoint of the joined aggregate
    # (SMJ-without-stats / static-BHJ-with-stats asserted in-query)
    "cbo_stats_broadcast",
    # r14: base z-order write + append + incremental re-cluster + swap
    # run at build; final plan is the eager checkpoint of the band
    # aggregate (base-files byte-identity + post-maintenance skipping
    # asserted in-query)
    "incremental_zorder_maintenance",
}

# Documented Arrow-vectorized extension ops (see SCALE.md §5). Anything
# else showing a pandas node is a regression.
PANDAS_OK = {
    # LSH band buckets via numpy fold (dedup.py:_profile_buckets)
    "minhash_lsh_pairs",
    # simhash majority-vote fold (dedup.py pandas_udf, 63 conditional sums)
    "simhash",
    "simhash_pairs",
    # cell-blocked pair scan: one k-means cell = one applyInPandas task
    "embedding_near_dup_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "dedup_canonical_docs",
    "dedup_incremental_assign",
    # grouped greedy MMR selection (similarity.py:mmr_rerank, r16: the
    # k_select join-per-step chain collapsed into one bounded-block
    # Arrow pass — |Q|*k rows, JVM-rounded sims in, argmax loop only)
    "mmr_diverse_topk",
    # k-means cell assignment / PQ codebooks (quantize.py)
    "semantic_dedup_keep",
    "kmeans_ivf_topk",
    "ivf_topk",
    "pq_recall_report",
    "ann_recall_report",
    # multimodal kernels (real codecs + stubs)
    "decode_media_features",
    "frame_sample_plan",
    "media_resize_plan",
    "media_embedding_topk",
    "media_image_decode",
    "media_audio_decode",
    "media_image_patches",
    "media_audio_frames",
    "media_video_frame_sample",
    # r7: aHash decode kernel / video frame-vector kernel / WAV
    # fingerprint kernel / LSH band fold inside the topk join
    "image_phash_dedup",
    "video_frame_topk",
    "audio_fingerprint_dedup",
    "text_minhash_topk_join",
    # LSH-candidate generation (same MinHash pandas fold) feeding the
    # exact Levenshtein verify
    "edit_distance_near_dup",
    # r8: real frame-decode kernel behind the scene-cut detector
    "video_scene_cuts",
}

# 1-row broadcast scalar joins, individually audited (PLANS.md header).
CARTESIAN_OK = {
    "event_funnel",
    # corpus-N / corpus-stats 1-row broadcasts
    "tfidf_top_terms",
    # merged-sketch vs exact-count scalar comparison (both sides 1 row)
    "approx_users_sketch_rollup",
    # rolling view anchored on the max(event_ts) scalar
    "events_last_hour",
    "copurchase_lift",
    "bm25_search",
    "cosine_topk",
    # r10: eval-probe broadcast into cosine_topk's exact scan (same shape
    # as cosine_topk — the probe set is bounded by the eval suite, never
    # data x data; WindowGroupLimit pre-reduces before the exchange)
    "eval_contamination_embedding",
    "unigram_logprob_score",
    "bigram_logprob_score",
    # 1-row corpus-total denominators (n_raw/n_tgt, n12/n1)
    "dsir_importance_weights",
    "pmi_top_pairs",
    # 1-row max-event-time anchor
    "user_decayed_value",
    # 1-row min-minute anchor for the integer-exact OLS x shift
    "revenue_trend_by_type",
    # 1-row PRF-centroid broadcast + corpus-stats anchors in the BM25 stage
    "retrieve_rerank_prf",
    # 1-row time-midpoint anchor + broadcast 10-bucket grid
    "value_drift_psi",
    # 1-row positive-balance-average anchor (TPC-H Q22 shape)
    "dormant_rich_customers",
    # 1-row nation-total denominator (TPC-H Q11 shape, integer-cents)
    "important_parts_by_nation",
    "hybrid_rrf_search",
    # r9: nDCG eval retrieves via cosine_topk's broadcast exact top-k
    # (the != self-match join); everything after is equi-joins + aggs
    "ndcg_label_retrieval",
    # r11: IVF route is equi-join on cell + broadcast probe set; the
    # cartesian is the exact-baseline column (cosine_topk's bounded
    # eval-probe broadcast — same class as eval_contamination_embedding)
    "eval_contamination_ivf",
    # r11: bounded probe-set broadcast into cosine_topk over the
    # |users|x24 profile table (same exact-top-k class as cosine_topk;
    # WindowGroupLimit pre-reduces before the exchange)
    "user_activity_similarity",
    "ann_recall_report",
    "pq_recall_report",
    "kmeans_ivf_topk",
    "ivf_topk",
    "media_embedding_topk",
    "knn_label_accuracy",
    # bounded sampled-frame queries broadcast against the corpus (same
    # exact-top-k class as cosine_topk/media_embedding_topk)
    "video_frame_topk",
    # MMR retrieval stage = cosine_topk's broadcast exact top-k; the
    # greedy loop after it is all equi-joins on candidate rows
    "mmr_diverse_topk",
    # bounded en-probe block broadcast against the de corpus (same
    # exact-top-k class as cosine_topk; probe side doc_id%10)
    "bitext_margin_pairs",
    "ccnet_quality_buckets",
    # r13: the Bloom filter is ONE row (dense array<bigint>, n_bits/64
    # words) broadcast-nested-loop joined onto the probe — filter bytes
    # per executor, the runtime-filter shape; never data x data
    "bloom_pruned_order_revenue",
    "token_budget_mixture",
    "forecast_revenue_change",
    "nation_market_share",
    "promo_revenue_share",
    "top_supplier_quarter",
    "above_avg_orders",
    "winsorized_event_stats",
    "source_quality_drift",
    "retention_cohorts",
    "contrastive_pairs",
    "events_incremental_2h",
    "events_value_quantiles",
    "events_value_quantiles_approx",
    "approx_distinct_users",
    "payment_reconciliation",
    "quality_report",
    "freshness_by_type",
    "corpus_stats_by_source",
    "training_corpus_filter",
    "language_temperature_sample",
    "curated_training_set",
    "token_freq_cms",
    "minute_anomalies",
    "order_count_distribution",
    "customer_spend_quartiles",
    "doc_length_histogram",
    "duplicate_ngram_spans",
    "leakage_safe_split",
    "source_capped_sample",
    "sequence_packing",
}

PANDAS_NODES = (
    "MapInPandas",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
    "MapInArrow",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from ecommerce_data_pipeline_spark.queries import QUERIES
    from ecommerce_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    violations: list[str] = []
    audited = 0
    for name, fn in QUERIES.items():
        if name in SKIP_BUILD:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        except Exception as exc:  # pragma: no cover - audit must not crash
            violations.append(f"{name}: PLAN BUILD FAILED: {exc}")
            continue
        audited += 1
        if "BatchEvalPython" in plan:
            violations.append(f"{name}: row-at-a-time Python UDF (BatchEvalPython)")
        pandas_hits = [n for n in PANDAS_NODES if n in plan]
        if pandas_hits and name not in PANDAS_OK:
            violations.append(
                f"{name}: unexpected Arrow/pandas node(s) {pandas_hits} "
                "(not in PANDAS_OK)"
            )
        cartesian = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        if cartesian and name not in CARTESIAN_OK:
            violations.append(
                f"{name}: cartesian/nested-loop join (not in CARTESIAN_OK)"
            )

    for v in violations:
        print(f"VIOLATION  {v}")
    print(
        f"{audited} plans audited, {len(SKIP_BUILD)} skipped (execute-on-build), "
        f"{len(violations)} violations"
    )
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
