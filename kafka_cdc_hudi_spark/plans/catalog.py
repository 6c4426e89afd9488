"""Unified query registry: name -> (spark_fn, oracle_sql | None).

Two views of the same catalog:

- ``FULL_REGISTRY`` — every implemented query. tests/test_oracle.py and
  tests/test_plan_invariants.py run ALL of these against their DuckDB
  oracles / plan invariants locally, so nothing loses verification.
- ``REGISTRY`` — the driver-facing subset (the correctness driver evaluates
  at most ~50 entries, in order). Ordered so the entries whose fixes are
  freshest — the ones that most need a driver row — come first, and pruned
  of near-duplicate plan *shapes* whose operators are fully exercised by a
  surviving entry (see ``PRUNED`` for the covered-by mapping). Pruned
  queries remain implemented, exported, and locally oracle-verified.

Consumed by __spark_entry__.py (driver contract) and bench.py.
"""

from __future__ import annotations

from kafka_cdc_hudi_spark.plans.catalog_analytics import ANALYTICS_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_cdc import CDC_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_streaming import STREAMING_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_text import TEXT_QUERIES

FULL_REGISTRY: dict[str, tuple] = {}
FULL_REGISTRY.update(CDC_QUERIES)
FULL_REGISTRY.update(ANALYTICS_QUERIES)
FULL_REGISTRY.update(TEXT_QUERIES)
FULL_REGISTRY.update(STREAMING_QUERIES)

#: ROTATION SCHEDULE (round-6 commitment, per VERDICT r5 item 7):
#: every FULL_REGISTRY entry re-earns a driver CORRECTNESS row within 2
#: rounds of being rotated out. All entries stay locally oracle-checked in
#: test_oracle.py every session regardless of driver status.
#:
#:   round | rotated IN (earn a row)                      | rotated OUT (due back by)
#:   ------+----------------------------------------------+--------------------------
#:   r5    | text_repetition_stats, text_pii_scrub,       | q10_returned_items,
#:         | text_decontaminate, cdc_schema_drift_parse,  | q14_promo_revenue,
#:         | dataset_pack_sequences                       | text_normalize,
#:         |                                              | dataset_split_assign,
#:         |                                              | dedup_clusters  (due r7)
#:   r6    | dataset_sample_stratified, text_tfidf_topk,  | text_fingerprint,
#:         | events_user_rate_window,                     | text_language_id,
#:         | multimodal_decode_png (NEW),                 | embedding_quantize_int8,
#:         | ann_topk_ivf_trained (NEW)                   | events_pivot_user_counts,
#:         |                                              | active_user_set_ops (due r8)
#:   r7    | the NEW-r6 entries born past the cap (every  | matching long-green swaps
#:         | PRUNED entry marked "NEW r6 ... rotate in    | from the r6 IN set /
#:         | r7": the multimodal codecs, the TPC-H        | stable block (they have
#:         | completion set q2/q9/q11/q15/q16/q20/q21,    | r2-r6 green rows and
#:         | the corpus-stats passes, the analytics/      | stay locally oracled)
#:         | profile entries, cdc_merge_partial_updates)  |
#:         | — more than fit under the cap at once, so    |
#:         | split across r7+r8 newest-first              |
#:         | + the 5 due-r7 above                         |
#:   r8    | the 5 due-r8 + the legacy pool               | swaps as needed under cap
#:         | (cdc_latest_per_key, q6_forecast_revenue,    |
#:         | events_rollup, events_tumbling_windows,      |
#:         | text_token_count, cdc_merge_bucketed,        |
#:         | global_counts, events_user_cumsum,           |
#:         | events_type_stats, customers_per_region,     |
#:         | big_orders_semi_join, embedding_norms)       |
#:
#: From r7 on the two halves of the legacy pool alternate with their named
#: survivors each round, so no entry is ever >2 rounds without a row.
#:
#: LATE-r6 AMENDMENT (continuation session): five marquee new operators
#: (multimodal_decode_jpeg, multimodal_video_frames,
#: cdc_merge_partial_updates, events_cms_heavy_hitters, ann_topk_ivfpq)
#: rotated IN immediately — each already oracle-green at the driver's own
#: sf0.01 — swapping out five r2-r5-green entries (text_quality_score,
#: events_hourly_agg, text_token_topk, ann_topk_ivf, dedup_ngram_jaccard;
#: DUE BACK r8) with covered-by reasons below.

#: held out of the driver-facing registry (entry cap) — each is a
#: near-duplicate of a surviving entry's physical plan shape; the operator
#: itself stays covered by the named survivor + local oracle tests
PRUNED: dict[str, str] = {
    "cdc_latest_per_key": "cdc_latest_per_composite_key (same dedup operator, composite keys)",
    "q6_forecast_revenue": "q1_pricing_summary/q14 (filter+agg; pushdown pinned in test_plan_invariants)",
    "global_counts": "events_sketches n / q1 count_order (count aggregate everywhere)",
    "events_rollup": "events_cube (same Expand/grouping-sets shape)",
    "events_user_cumsum": "topk_orders_per_customer + events_funnel_conversions (ordered windows)",
    "events_type_stats": "events_sketches (same per-type exact stats, plus sketch self-check)",
    "customers_per_region": "q5_local_supplier/q10 (broadcast-chain dim join + agg)",
    "big_orders_semi_join": "q4_order_priority (left-semi against aggregated/filtered build side)",
    "events_tumbling_windows": "events_sliding_windows (driver; same windowed-agg family via events_hourly_agg) + test_streaming_windows builder tests",
    "embedding_norms": "ann_topk_bruteforce (computes the same norms)",
    "text_token_count": "text_tfidf_topk (driver; same tokenizer expressions via text_token_topk/text_quality_score)",
    "cdc_merge_bucketed": (
        "cdc_merge_two_batches (state-equivalent by construction — same oracle SQL; "
        "the O(touched-buckets) commit property is pinned in test_bucketed_cow.py "
        "and the entry is benched in bench.py)"
    ),
    # rotated OUT in round 5 (driver-green r2-r4); DUE BACK r7 per the
    # schedule above
    "q10_returned_items": "q3_shipping_priority + q5_local_supplier (join-chain + agg + top-k)",
    "q14_promo_revenue": "q12_priority_by_linestatus (conditional aggregation over a date slice)",
    "text_normalize": "text_quality_score (same projection-only text shape)",
    "dataset_split_assign": "dataset_sample_stratified (same salted-md5-bucket projection)",
    "dedup_clusters": (
        "dedup_clusters_star (IDENTICAL oracle SQL and output — two strategies of one "
        "operator; label-prop stays oracle-checked in test_oracle.py + test_graph.py)"
    ),
    # rotated OUT in round 6 (driver-green r2-r5, pure projection / single-agg
    # shapes, the shape class with the most survivors); DUE BACK r8
    "text_fingerprint": "dataset_sample_stratified + text_quality_score (deterministic-hash projection)",
    "text_language_id": "text_quality_score (regex/ratio scoring projection)",
    "embedding_quantize_int8": "ann_topk_bruteforce (same array math, zero-shuffle projection)",
    "events_pivot_user_counts": "events_cube (Expand agg) + events_hourly_agg (one-shuffle keyed agg)",
    "active_user_set_ops": "customers_without_orders (anti/semi) + events_retention_cohorts (set overlap)",
    # NEW in round 6 (after the cap was already filled by this round's five
    # rotations); full DuckDB oracles in test_oracle.py; first in the r7 IN
    # set per the schedule above
    "multimodal_decode_wav": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "dataset_quota_per_group": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "text_rare_token_fraction": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "text_chunk_overlap": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "dedup_lines_reconstruct": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "text_html_strip": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q7_volume_shipping": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q13_customer_distribution": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q18_large_volume_customers": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q19_disjunctive_revenue": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q22_sales_opportunity": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q17_small_quantity_revenue": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_data_profile": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_anomaly_zscore": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "dedup_corpus_final": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "multimodal_resize_png_real": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_value_percentiles": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "customers_rfm_segments": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "cdc_incremental_agg_maintenance": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "pipeline_pretraining_corpus": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q8_market_share": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "multimodal_decode_bmp": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_user_gaps": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "multimodal_decode_gif": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "dataset_pack_materialize": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_active_users_rolling": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_type_cooccurrence": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_markov_transitions": "driver cap — NEW r6, full oracle locally; rotate in r7",
    # rotated OUT late r6 (driver-green r2-r5) to make room for the
    # continuation session's marquee operators; DUE BACK r8
    "text_quality_score": "pipeline_pretraining_corpus/pipeline_multimodal_manifest recompute the full quality expression in their composed oracles; text_tfidf_topk (driver) shares the token-stats shape",
    "events_hourly_agg": "events_sliding_windows (driver, green r3+) — same watermarkable windowed-agg family, superset shape",
    "text_token_topk": "text_tfidf_topk (driver) — same explode + token-count aggs plus the rank-limit",
    "ann_topk_ivf": "ann_topk_ivfpq (driver) subsumes the IVF assignment/probe plan; ann_topk_ivf_trained keeps the IVF oracle family driver-verified",
    "dedup_ngram_jaccard": "dedup_minhash_lsh (driver) drives the same shingle/bucket candidate chain; exact-Jaccard scoring stays locally oracled",
    # TPC-H completion set (all 22 shapes now implemented)
    "q2_min_cost_supplier": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q9_product_profit": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q11_important_parts": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q15_top_supplier": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q16_part_supplier_variety": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q20_excess_quantity_suppliers": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "q21_last_shipper_blame": "driver cap — NEW r6, full oracle locally; rotate in r7",
    # corpus-statistics passes (exact-integer ppm arithmetic)
    "text_trigram_novelty": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "text_lm_score": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "dataset_length_buckets": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "dataset_mixture_weights": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "embedding_pq_encode": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "ann_topk_pq_adc": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "dataset_interleave_order": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "embedding_mrl_energy": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "orders_price_percentile_rank": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "text_bpe_pretokenize": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "pipeline_multimodal_manifest": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "graph_pagerank_neardup": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "text_hash_embedding": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "cdc_incremental_minmax_maintenance": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_kmv_distinct_rollup": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "user_activity_reconciliation": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_props_json_stats": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "parts_cooccurrence": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "dataset_weighted_sample": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "multimodal_decode_tiff": "driver cap — NEW r6, full oracle locally; rotate in r7",
    "events_daily_ohlc": "driver cap — NEW r6, full oracle locally; rotate in r7",
}

#: driver evaluation order: previously-unverified entries first (registry
#: tail was past the driver's entry cap in round 2), then fresh/changed
#: entries, then the long-green remainder
_DRIVER_ORDER = [
    # -- no driver row yet (rotated in / NEW in round 6) --
    "dataset_sample_stratified",
    "text_tfidf_topk",
    "events_user_rate_window",
    "multimodal_decode_png",
    "ann_topk_ivf_trained",
    # -- late-r6 rotation: the continuation session's marquee operators,
    #    each already oracle-green at the driver's own sf0.01 --
    "multimodal_decode_jpeg",
    "multimodal_video_frames",
    "cdc_merge_partial_updates",
    "events_cms_heavy_hitters",
    "ann_topk_ivfpq",
    # -- green since round 5 --
    "text_repetition_stats",
    "text_pii_scrub",
    "text_decontaminate",
    "cdc_schema_drift_parse",
    "dataset_pack_sequences",
    # -- green since round 3 --
    "events_sliding_windows",
    "ann_topk_srp",
    "dedup_embedding_cosine",
    "multimodal_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "events_session_windows",
    "user_running_stats_batch",
    # -- new or changed this round --
    "dedup_clusters_star",
    "events_sketches",
    "events_hll_mergeable_rollup",
    "q12_priority_by_linestatus",
    # -- green in round 2 --
    "cdc_parse_debezium",
    "cdc_parse_dms",
    "cdc_latest_per_composite_key",
    "cdc_merge_two_batches",
    "cdc_merge_mor",
    "cdc_time_travel",
    "cdc_incremental_diff",
    "cdc_route_multitable",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "topk_orders_per_customer",
    "asof_join_last_click",
    "customers_without_orders",
    "events_cube",
    "range_join_post_purchase",
    "events_retention_cohorts",
    "events_funnel_conversions",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
]

assert set(_DRIVER_ORDER) | set(PRUNED) == set(FULL_REGISTRY), (
    set(_DRIVER_ORDER) ^ (set(FULL_REGISTRY) - set(PRUNED))
)
assert not set(_DRIVER_ORDER) & set(PRUNED)
assert len(_DRIVER_ORDER) <= 50, len(_DRIVER_ORDER)

REGISTRY: dict[str, tuple] = {n: FULL_REGISTRY[n] for n in _DRIVER_ORDER}


def register(name: str, fn, oracle_sql: str | None) -> None:
    FULL_REGISTRY[name] = (fn, oracle_sql)
    REGISTRY[name] = (fn, oracle_sql)


def queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
