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
# Round 10 (policy applied): (1) brand-new `bag_set_ops` (EXCEPT ALL /
# INTERSECT ALL bag semantics — the last uncovered SQL surface corner) and
# `revenue_trend_by_type` whose plan changed this round (sxx/sxy now
# accumulate as decimal(38,0), ADVICE r9); (2) the other four round-9
# overflow queries that never got a driver row (part_kcore,
# k_anonymity_audit, order_value_rank_profile, retrieve_rerank_prf — all
# judge-verified green at sf0.01 in r9); (3) the 45-query r06 cohort,
# `leakage_safe_split` first because it was an r9 bench watch-item (solo
# re-measure this round confirmed first-touch JIT, not a plan problem).
# 9+4+45 = 58: with a 50-row driver window the final ~8 r06 items
# (`source_capped_sample`, `streaming_replay_dedup`,
# `streaming_session_windows`, `table_time_travel`,
# `token_budget_mixture`, `top_supplier_quarter`, `user_sessions`,
# `variant_props_rollup`) roll to round 11 and front-load there.
#
# ROUND 11 PLAN: front-load (a) any r10 red, (b) whichever tail r06 items
# got no r10 row, (c) the r07 cohort (47 queries — `python
# tools/cert_age.py`); r08+ follow.
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY: list[str] = [
    # (1) new this round / plan changed this round
    "bag_set_ops",
    "shingle_novelty_curve",
    "eval_contamination_embedding",
    "streaming_ann_assign",
    "corpus_jsonl_roundtrip",
    "orders_tbl_roundtrip",
    "revenue_trend_by_type",
    # plan rebound onto operators.windows.top_k_recent this round (same
    # physical TakeOrderedAndProject; re-certify per changed-plan policy)
    "recent_sales_top10",
    # gini moments now accumulate as decimal(38,0) (latent int64 wrap at
    # ~1e9 keys x 1e12 events — r9 ADVICE bug class, swept proactively)
    "key_skew_report",
    # (2) never driver-certified (round-9 overflow)
    "part_kcore",
    "k_anonymity_audit",
    "order_value_rank_profile",
    "retrieve_rerank_prf",
    # (3) oldest cohort: last green driver row = round 6
    # (leakage_safe_split first: plan changed this round)
    "leakage_safe_split",
    "ann_recall_report",
    "asof_view_before_purchase",
    "bigram_logprob_score",
    "bpe_pair_stats",
    "branded_shipment_revenue",
    "ccnet_quality_buckets",
    "cdc_change_feed",
    "document_chunks",
    "dsir_importance_weights",
    "embedding_int8_audit",
    "event_funnel",
    "forecast_revenue_change",
    "gdpr_delete_audit",
    "hybrid_rrf_search",
    "ivf_topk",
    "knn_label_accuracy",
    "large_volume_orders",
    "matryoshka_audit",
    "media_audio_decode",
    "media_audio_frames",
    "media_image_decode",
    "media_image_patches",
    "media_video_frame_sample",
    "minhash_lsh_pairs",
    "nation_market_share",
    "part_triangles",
    "pmi_top_pairs",
    "promo_revenue_share",
    "returned_item_customers",
    "scd2_point_in_time",
    "schema_evolution_merge",
    "semantic_dedup_keep",
    "sequence_packing",
    "session_overlap_pairs",
    "simhash",
    "small_lot_revenue",
    "source_capped_sample",
    "streaming_replay_dedup",
    "streaming_session_windows",
    "table_time_travel",
    "token_budget_mixture",
    "top_supplier_quarter",
    "user_sessions",
    "variant_props_rollup",
    # (4) remaining r07+-certified cohorts follow in registration order.
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
