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
# ROUND 14 (policy applied): (0) the seven brand-new round-14 queries (the
# advisor certified end-to-end per VERDICT r13 ask #3, the Z-order x
# multi-band skipping composition per ask #4, the lake-maintenance
# pair — small-file compaction and partition-pruned retention delete —
# the CBO ANALYZE-statistics plan-flip certification, incremental
# Z-order maintenance, and the boilerplate-REMOVAL rewrite);
# (1) bloom_pruned_order_revenue, whose operator contract AND in-query
# plan changed this round (ADVICE r13: canonical key hashing,
# self-describing filter rows, and build-side-scaled n_bits), so its r13
# certification must be refreshed; (2) the FULL r09 cohort (33 queries,
# tools/cert_age.py — VERDICT r13 ask #1); (3) the 9 oldest r10-cohort
# queries in cert_age order — as many as fit the 50-slot window after
# the new/changed queries took their slots (ask #1 wanted 17;
# ann_recall_report..document_chunks fit; dsir_importance_weights /
# embedding_int8_audit /
# eval_contamination_embedding / event_funnel / forecast_revenue_change /
# gdpr_delete_audit / hybrid_rrf_search / ivf_topk roll to round 15).
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY: list[str] = [
    # (0) brand-new this round, no driver row yet
    "advised_skew_join",
    "zorder_multiband_scan",
    "small_files_compaction",
    "partitioned_retention_delete",
    "cbo_stats_broadcast",
    "incremental_zorder_maintenance",
    "boilerplate_strip",
    # (1) operator contract + in-query plan changed this round
    "bloom_pruned_order_revenue",
    # (2) the r09 cohort, cert_age order (all 33)
    "ndcg_label_retrieval",
    "order_count_distribution",
    "order_items_revenue",
    "orders_status_pivot",
    "paid_orders_recent",
    "part_pagerank",
    "parts_with_shipments",
    "payment_reconciliation",
    "purchase_and_error_users",
    "quality_report",
    "retention_cohorts",
    "revenue_rollup",
    "sales_cube",
    "salted_user_enrich",
    "session_window_fact",
    "shipment_status_current",
    "shipping_priority_top10",
    "sliding_window_gmv",
    "source_quality_drift",
    "stream_stream_attribution_join",
    "streaming_trending_topk",
    "streaming_trending_topk_merge",
    "supplier_diversity",
    "tfidf_top_terms",
    "token_freq_cms",
    "top_customers_per_nation",
    "top_tokens",
    "training_corpus_filter",
    "unigram_logprob_score",
    "user_state_history",
    "user_trailing_hour_value",
    "user_value_moving_avg",
    "winsorized_event_stats",
    # (3) the 9 oldest r10-cohort queries, cert_age order
    "ann_recall_report",
    "asof_view_before_purchase",
    "bag_set_ops",
    "bigram_logprob_score",
    "bpe_pair_stats",
    "branded_shipment_revenue",
    "ccnet_quality_buckets",
    "cdc_change_feed",
    "document_chunks",
    # (4) remaining cohorts follow in registration order; queries
    # certified in round 13 go last via their registration position.
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
