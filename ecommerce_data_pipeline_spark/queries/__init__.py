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
# Driver-priority ordering. POLICY (round 7+): oldest-certified-first.
#
# The correctness driver checks the FIRST ~50 registered queries per round
# and the signal is cumulative across rounds, so certifications age. Each
# round we front-load, in order: (1) queries whose plan/runtime changed since
# their last driver row (flagship first), (2) brand-new queries with no row
# yet, (3) the cohort whose last green row is OLDEST (compute with
# `python tools/cert_age.py`), oldest round first. Everything else keeps
# registration order behind these; queries certified in the immediately
# previous round go last.
#
# Round 8 (policy applied): (1) the SEVEN late-round-7 queries that have
# never had a driver row in ANY round, at the very front (r7 verdict ask #1
# verbatim); (2) the round-8 additions; (3) queries whose plan/code path
# changed this round (asof tolerance now integer-micros, curriculum NULL
# coalesce, incremental-dedup artifact refactor, kmeans fit_sample default);
# (4) the 44-query r04 cohort (SURVEY-mapped rows J1/P6/W-graph/O1 first);
# (5) the r05 cohort. r06/r07-certified queries follow in registration
# order. ~50 fit the window, so the r04 tail + r05 land in round 9.
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY: list[str] = [
    # (1) never driver-certified, added late round 7
    "mmr_diverse_topk",
    "edit_distance_near_dup",
    "multitouch_attribution",  # + bucketed range join this round
    "key_skew_report",
    "char_entropy_quality",
    "vocab_growth_curve",
    "zipf_slope",
    # (2) round-8 additions
    "markup_extract_text",
    "streaming_incremental_dedup",
    "min_cost_part_supplier",
    "important_parts_by_nation",
    "returnflag_priority_lateness",
    "dominant_promo_part_shippers",
    "part_profit_by_nation_year",
    "bitext_margin_pairs",
    "boilerplate_segment_report",
    "video_scene_cuts",
    "tokenizer_fertility_by_lang",
    "ivf_pq_topk",
    "streaming_trending_topk",
    # (3) plan/code path changed this round
    "asof_tolerance_attribution",  # tolerance filter now integer micros
    "curriculum_interleave",  # NULL-text coalesce both sides (ADVICE)
    "dedup_incremental_assign",  # routed through signature_artifact split
    "pq_recall_report",  # kmeans_fit fit_sample default change
    "kmeans_ivf_topk",
    "knn_label_accuracy_ivf",
    # (4) oldest cohort: last green driver row = round 4 (SURVEY rows first)
    "order_payments_enriched",
    "events_incremental_2h",
    "dedup_clusters",
    "recent_sales_top10",
    "above_avg_orders",
    "approx_distinct_users",
    "approx_users_sketch_rollup",
    "bm25_search",
    "clean_purchase_days",
    "corpus_stats_by_source",
    "customer_spend_quartiles",
    "customers_without_orders",
    "dedup_canonical_docs",
    "doc_length_histogram",
    "duplicate_ngram_spans",
    "events_hourly_window",
    "events_last_hour",
    "events_minute_fact",
    "events_resampled_locf",
    "events_value_quantiles_approx",
    "inventory_counters",
    "language_temperature_sample",
    "local_supplier_revenue",
    "media_embedding_topk",
    "orders_status_pivot",
    "paid_orders_recent",
    "parts_with_shipments",
    "payment_reconciliation",
    "purchase_and_error_users",
    "quality_report",
    "revenue_rollup",
    "sales_cube",
    "salted_user_enrich",
    "session_window_fact",
    "shipment_status_current",
    "shipping_priority_top10",
    "sliding_window_gmv",
    "tfidf_top_terms",
    "top_customers_per_nation",
    "top_tokens",
    "training_corpus_filter",
    "unigram_logprob_score",
    "user_value_moving_avg",
    # (5) round-5 cohort
    "contrastive_pairs",
    "conversion_lag",
    "copurchase_lift",
    "curated_training_set",
    "customer_rfm_segments",
    "event_path_trigrams",
    "event_transition_gaps",
    "events_quarantine",
    "media_resize_plan",
    "minute_anomalies",
    "nation_trade_flows",
    "order_count_distribution",
    "order_items_revenue",
    "part_pagerank",
    "retention_cohorts",
    "source_quality_drift",
    "stream_stream_attribution_join",
    "supplier_diversity",
    "token_freq_cms",
    "user_state_history",
    "user_trailing_hour_value",
    "winsorized_event_stats",
    # (6) r06/r07-certified cohorts follow in registration order.
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
