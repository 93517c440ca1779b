"""Query registry: every implemented operator exposed as a named query.

Each entry is a ``(spark, sf_dir) -> DataFrame`` callable plus (where
SQL-expressible) a DuckDB oracle that computes the identical result on the
same parquet tables. Column names AND dtypes are aligned on both sides;
doubles follow the cents-exact discipline (functions.money_sum) or explicit
matching rounding so value hashes compare bit-stable.

The medallion queries run the real pipeline transforms over the derived
event streams (sources/events.py) — bronze projection, W1 dedup, from_json
parse, enrichment join, minute fact — while their oracles recompute the same
result directly from the ``orders`` table, proving the whole chain
(JSON round-trip included) is lossless.

Layout: one module per domain, each registering into the shared
``_registry.QUERIES/ORACLES`` dicts at import time; this package __init__
imports them all and then applies the driver-priority ordering below.
"""

from __future__ import annotations

from ecommerce_data_pipeline_spark.queries._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    register,
)

# Importing each domain module registers its queries (decorator side effect).
from ecommerce_data_pipeline_spark.queries import (  # noqa: E402,F401  isort: skip
    medallion,
    llm_text,
    streaming_q,
    curation,
    analytics,
    relational,
    retrieval,
)

# ---------------------------------------------------------------------------
# Driver-priority ordering.
#
# The correctness driver checks the FIRST ~50 registered queries per round
# and the signal is cumulative across rounds. Round 6 rotates to the front
# the seven queries the round-5 verdict flagged as lacking a post-change
# driver row: five whose plans changed late in round 5 (shared shingle
# profile / driver-side k-means fit) and two that were never inside a
# driver window. New round-6 queries go right behind them; everything not
# named keeps its registration order behind these.
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY: list[str] = [
    # plans changed late in round 5 — re-certify under the new plans
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "ivf_topk",
    # never inside a driver window before round 6
    "part_triangles",
    "token_budget_mixture",
    # --- round-6 additions (never had a driver row) ---
    "media_image_decode",
    "media_audio_decode",
    "bigram_logprob_score",
    "matryoshka_audit",
    "dedup_rate_by_source",
    "media_image_patches",
    "media_audio_frames",
    "cdc_change_feed",
    "table_time_travel",
    "dsir_importance_weights",
    "pmi_top_pairs",
    "user_decayed_value",
    "knn_label_accuracy",
    "media_video_frame_sample",
    "schema_evolution_merge",
    "gdpr_delete_audit",
    # --- round-5 rows already certified in CORRECTNESS_r05.json ---
    "user_sessions",
    "session_overlap_pairs",
    "asof_view_before_purchase",
    "ann_recall_report",
    "ccnet_quality_buckets",
    "bpe_pair_stats",
    "streaming_session_windows",
    "small_lot_revenue",
    "scd2_point_in_time",
    "variant_props_rollup",
    "forecast_revenue_change",
    "branded_shipment_revenue",
    "returned_item_customers",
    "promo_revenue_share",
    "nation_market_share",
    "top_supplier_quarter",
    "large_volume_orders",
    "sequence_packing",
    "document_chunks",
    "dedup_incremental_assign",
    "embedding_int8_audit",
    "source_capped_sample",
    "leakage_safe_split",
    "semantic_dedup_keep",
    "hybrid_rrf_search",
    "streaming_replay_dedup",
    "event_funnel",
    "retention_cohorts",
    "minute_anomalies",
    "order_count_distribution",
    "part_pagerank",
    "conversion_lag",
    "copurchase_lift",
    "user_trailing_hour_value",
    "curated_training_set",
    "user_state_history",
    "events_quarantine",
    "token_freq_cms",
    "stream_stream_attribution_join",
    "order_items_revenue",
    "pq_recall_report",
    "contrastive_pairs",
    "customer_rfm_segments",
    "winsorized_event_stats",
    "media_resize_plan",
    "nation_trade_flows",
    "event_path_trigrams",
    "event_transition_gaps",
    "supplier_diversity",
    "source_quality_drift",
    # round-2 additions that never got a driver CORRECTNESS row
    "dedup_clusters",
    "revenue_rollup",
    "orders_status_pivot",
    "top_customers_per_nation",
    "events_resampled_locf",
    "customers_without_orders",
    "parts_with_shipments",
    "purchase_and_error_users",
    "clean_purchase_days",
    "user_value_moving_avg",
    "session_window_fact",
    "tfidf_top_terms",
    "bm25_search",
    "top_tokens",
    "customer_spend_quartiles",
    "events_hourly_window",
    "approx_users_sketch_rollup",
    "shipping_priority_top10",
    "media_embedding_topk",
    "shipment_status_current",
    "quality_report",
    "sales_cube",
    "above_avg_orders",
    "payment_reconciliation",
    "inventory_counters",
    # reformulated from rows-only to deterministic oracle contracts
    "events_value_quantiles_approx",
    "approx_distinct_users",
    "kmeans_ivf_topk",
    # round-3 additions
    "language_temperature_sample",
    "duplicate_ngram_spans",
    "doc_length_histogram",
    "dedup_canonical_docs",
    "sliding_window_gmv",
    "salted_user_enrich",
    "local_supplier_revenue",
    "unigram_logprob_score",
    "corpus_stats_by_source",
    "training_corpus_filter",
]


def _apply_driver_priority() -> None:
    front = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    order = front + rest
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        for n in order:
            if n in snapshot:
                mapping[n] = snapshot[n]


_apply_driver_priority()
