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

#: DEMOTED (r10 registry hygiene, VERDICT r9 item 7): structurally
#: duplicative entries removed from FULL_REGISTRY so per-round gate
#: wall-time (full oracle suite + sweep, both of which run every
#: FULL_REGISTRY entry) stays roughly flat as the registry grows. Each
#: name stays implemented + exported in its catalog_* module, keeps its
#: oracle SQL, and is smoke-executed every session by
#: tests/test_demoted.py; its operator surface is fully exercised by the
#: named survivor — the same covered-by mapping that kept these in PRUNED
#: (never in the driver set) for 4+ rounds. Demotion is reversible by
#: deleting the entry here.
DEMOTED: dict[str, str] = {
    "global_counts": "events_sketches n / q1 count_order (count aggregate everywhere)",
    "events_rollup": "events_cube (same Expand/grouping-sets shape)",
    "events_user_cumsum": "topk_orders_per_customer + events_funnel_conversions (ordered windows)",
    "events_type_stats": "events_sketches (same per-type exact stats, plus sketch self-check)",
    "customers_per_region": "q5_local_supplier/q10 (broadcast-chain dim join + agg)",
    "embedding_norms": "ann_topk_bruteforce (computes the same norms)",
    "text_token_count": "text_bpe_pretokenize (same tokenizer-count shape) + text_tfidf_topk",
}
for _n in DEMOTED:
    del FULL_REGISTRY[_n]

#: ROTATION SCHEDULE (standing commitment since r6, per VERDICT r5 item 7 /
#: VERDICT r6 item 1): every FULL_REGISTRY entry earns a driver CORRECTNESS
#: row within 2 rounds of rotating out (or of being born). All entries stay
#: locally oracle-checked in test_oracle.py every session regardless of
#: driver status, and the full-registry sf0.01 sweep artifact
#: (SWEEP_r{N}.json, scripts/sweep.py) is committed each round.
#:
#: ROUND-10 ROTATION (this file's current state; executes the schedule
#: pre-committed in r9 verbatim, VERDICT r9 item 3, plus the maintained-ANN
#: driver surface mandated by VERDICT r9 item 2). IN (50 slots, in order):
#:   1. ann_topk_maintained — the r9-born AnnIndexMaintainer
#:      (streaming/ann_ivm.py) gets its driver-oracle surface: a
#:      deterministic CDC script (cell-moving re-embeds + top-k-evicting
#:      deletes) folded through the maintainer, final top-k oracled as a
#:      static IVF rebuild over the live corpus in DuckDB.
#:   2. the 12 slipped r3-r6/r5-r6 entries (text_repetition_stats,
#:      text_pii_scrub, text_decontaminate, cdc_schema_drift_parse,
#:      dataset_pack_sequences, ann_topk_srp, dedup_embedding_cosine,
#:      multimodal_meta, multimodal_frame_sample, multimodal_resize,
#:      events_session_windows, user_running_stats_batch) — the oldest
#:      rows in the registry; due back r10, "must not slip twice".
#:   3. 37 slots of the r7 green block in PRUNED listing order
#:      (q10_returned_items .. cdc_incremental_agg_maintenance).
#: OUT: the 50 green r9 driver entries (due back r11) and the 50 green r8
#: entries (due back r11). The last 12 of the r7 block slip one round
#: (slots consumed by the due-back-r10 block) and are named below — due
#: back r11, must not slip twice.
#:
#: ROUND-11 ROTATION (committed in advance, the standing pattern):
#: IN (50 slots, in order):
#:   1. the 3 entries born in r10 after this driver-set freeze
#:      (text_bm25_topk, text_bm25_maintained, hybrid_retrieval_rrf),
#:      plus any later r10 births.
#:   2. the 12 slipped r7 entries (cdc_incremental_minmax_maintenance,
#:      user_activity_reconciliation, events_anomaly_zscore,
#:      events_daily_ohlc, events_data_profile, events_kmv_distinct_rollup,
#:      events_markov_transitions, events_props_json_stats,
#:      parts_cooccurrence, text_bpe_pretokenize, text_lm_score,
#:      text_trigram_novelty) — oldest rows by then; must not slip twice.
#:   3. the r8 green block oldest-row-first as slots allow (~35 slots;
#:      the last ~15 slip to r12 and must not slip twice).
#:   4. r9/r10 greens rest and return r12 oldest-row-first.
#: Structural near-duplicates stay DEMOTED (see ``DEMOTED``) with
#: covered-by reasons and a smoke test.

#: held out of the driver-facing registry (entry cap) — each is either a
#: near-duplicate of a surviving entry's physical plan shape or a
#: driver-green entry resting between rotations; the operator itself stays
#: covered by the named survivor + local oracle tests + the committed sweep
PRUNED: dict[str, str] = {
    # ---- born r10 past the driver-set freeze (locally oracled + swept
    #      from birth; rotate into the r11 driver set, slot 1) ----
    "text_bm25_topk": "born r10 past the freeze; rotate r11",
    "text_bm25_maintained": "born r10 past the freeze; rotate r11",
    "hybrid_retrieval_rrf": "born r10 past the freeze; rotate r11",
    "hybrid_retrieval_maintained": "born r10 past the freeze; rotate r11",
    # ---- structural near-duplicates (standing; each covered by survivor) ----
    "cdc_latest_per_key": "cdc_latest_per_composite_key (same dedup operator, composite keys; r2-r6 green)",
    "q6_forecast_revenue": "q1_pricing_summary/q14 (filter+agg; pushdown pinned in test_plan_invariants)",
    "big_orders_semi_join": "q4_order_priority (left-semi against aggregated/filtered build side)",
    "events_tumbling_windows": "events_sliding_windows (same windowed-agg family) + test_streaming_windows builder tests",
    # ---- r7 greens slipped one round to r11 (slots consumed by the
    #      due-back-r10 block; must not slip twice) ----
    "cdc_incremental_minmax_maintenance": "green r7; slipped r10, due back r11",
    "user_activity_reconciliation": "green r7; slipped r10, due back r11",
    "events_anomaly_zscore": "green r7; slipped r10, due back r11",
    "events_daily_ohlc": "green r7; slipped r10, due back r11",
    "events_data_profile": "green r7; slipped r10, due back r11",
    "events_kmv_distinct_rollup": "green r7; slipped r10, due back r11",
    "events_markov_transitions": "green r7; slipped r10, due back r11",
    "events_props_json_stats": "green r7; slipped r10, due back r11",
    "parts_cooccurrence": "green r7; slipped r10, due back r11",
    "text_bpe_pretokenize": "green r7; slipped r10, due back r11",
    "text_lm_score": "green r7; slipped r10, due back r11",
    "text_trigram_novelty": "green r7; slipped r10, due back r11",
    # ---- r8 driver set, resting after green CORRECTNESS_r08 rows
    #      (due back r11 oldest-row-first; all locally oracled + swept) ----
    "text_hash_embedding": "green r8; due back r11",
    "dataset_interleave_order": "green r8; due back r11",
    "dataset_length_buckets": "green r8; due back r11",
    "embedding_mrl_energy": "green r8; due back r11",
    "events_value_percentiles": "green r8; due back r11",
    "events_user_gaps": "green r8; due back r11",
    "events_active_users_rolling": "green r8; due back r11",
    "text_rare_token_fraction": "green r8; due back r11",
    "text_chunk_overlap": "green r8; due back r11",
    "text_html_strip": "green r8; due back r11",
    "orders_price_percentile_rank": "green r8; due back r11",
    "events_type_cooccurrence": "green r8; due back r11",
    "customers_rfm_segments": "green r8; due back r11",
    "multimodal_decode_jpeg_color": "green r8; due back r11",
    "multimodal_audio_segments": "green r8; due back r11",
    "multimodal_video_cuts": "green r8; due back r11",
    "events_histogram_quantile_rollup": "green r8; due back r11",
    "text_bpe_pair_counts": "green r8; due back r11",
    "text_bpe_train_merges": "green r8; due back r11",
    "pipeline_audio_manifest": "green r8; due back r11",
    "text_bloom_decontaminate": "green r8; due back r11",
    "dedup_fuzzy_editdist": "green r8; due back r11",
    "dedup_fuzzy_canonicalize": "green r8; due back r11",
    "text_bpe_encode": "green r8; due back r11",
    "cdc_incremental_enriched_agg_maintenance": "green r8; due back r11",
    "dataset_negative_sample": "green r8; due back r11",
    "text_duplicated_span_fraction": "green r8; due back r11",
    "text_fingerprint": "green r8; due back r11",
    "text_language_id": "green r8; due back r11",
    "embedding_quantize_int8": "green r8; due back r11",
    "events_pivot_user_counts": "green r8; due back r11",
    "active_user_set_ops": "green r8; due back r11",
    "text_quality_score": "green r8; due back r11",
    "events_hourly_agg": "green r8; due back r11",
    "text_token_topk": "green r8; due back r11",
    "ann_topk_ivf": "green r8; due back r11",
    "dedup_ngram_jaccard": "green r8; due back r11",
    "dataset_sample_stratified": "green r8; due back r11",
    "text_tfidf_topk": "green r8; due back r11",
    "events_user_rate_window": "green r8; due back r11",
    "multimodal_decode_png": "green r8; due back r11",
    "ann_topk_ivf_trained": "green r8; due back r11",
    "multimodal_decode_jpeg": "green r8; due back r11",
    "multimodal_video_frames": "green r8; due back r11",
    "cdc_merge_partial_updates": "green r8; due back r11",
    "events_cms_heavy_hitters": "green r8; due back r11",
    "ann_topk_ivfpq": "green r8; due back r11",
    "dedup_clusters_star": "green r8; due back r11",
    "events_sketches": "green r8; due back r11",
    "multimodal_video_keyframes": "green r8; due back r11",
    # ---- r9 driver set, resting after green CORRECTNESS_r09 rows
    #      (due back r11; all locally oracled + swept) ----
    "cdc_merge_dms_e2e": "green r9; due back r11",
    "dedup_incremental_candidates": "green r9; due back r11",
    "graph_triangles_neardup": "green r9; due back r11",
    "ann_recall_at_k": "green r9; due back r11",
    "dedup_spans_remove": "green r9; due back r11",
    "dedup_simhash_pairs": "green r9; due back r11",
    "events_partitioned_day_slice": "green r9; due back r11",
    "dedup_simhash_wide_pairs": "green r9; due back r11",
    "ann_recall_trained_vs_static": "green r9; due back r11",
    "events_ab_test": "green r9; due back r11",
    "dedup_semantic_clusters": "green r9; due back r11",
    "text_nb_classifier": "green r9; due back r11",
    "dataset_dsir_weights": "green r9; due back r11",
    "pipeline_rag_index": "green r9; due back r11",
    "pipeline_quality_funnel": "green r9; due back r11",
    "dedup_cdc_pair_ivm": "green r9; due back r11",
    "ann_topk_ivfpq_rerank": "green r9; due back r11",
    "dedup_cross_source_stats": "green r9; due back r11",
    "dataset_epoch_order": "green r9; due back r11",
    "text_containment_pairs": "green r9; due back r11",
    "embedding_pca_whiten": "green r9; due back r11",
    "pipeline_cdc_corpus_refresh": "green r9; due back r11",
    "events_ewma_forecast": "green r9; due back r11",
    "cdc_scd2_history": "green r9; due back r11",
    "q12_priority_by_linestatus": "green r9; due back r11",
    "events_hll_mergeable_rollup": "green r9; due back r11",
    "cdc_parse_debezium": "green r9; due back r11",
    "cdc_parse_dms": "green r9; due back r11",
    "cdc_latest_per_composite_key": "green r9; due back r11",
    "cdc_merge_two_batches": "green r9; due back r11",
    "cdc_merge_mor": "green r9; due back r11",
    "cdc_time_travel": "green r9; due back r11",
    "cdc_incremental_diff": "green r9; due back r11",
    "cdc_route_multitable": "green r9; due back r11",
    "q1_pricing_summary": "green r9; due back r11",
    "q3_shipping_priority": "green r9; due back r11",
    "q4_order_priority": "green r9; due back r11",
    "q5_local_supplier": "green r9; due back r11",
    "topk_orders_per_customer": "green r9; due back r11",
    "asof_join_last_click": "green r9; due back r11",
    "customers_without_orders": "green r9; due back r11",
    "events_cube": "green r9; due back r11",
    "range_join_post_purchase": "green r9; due back r11",
    "events_retention_cohorts": "green r9; due back r11",
    "events_funnel_conversions": "green r9; due back r11",
    "dedup_exact": "green r9; due back r11",
    "dedup_minhash_lsh": "green r9; due back r11",
    "dedup_simhash": "green r9; due back r11",
    "ann_topk_bruteforce": "green r9; due back r11",
    "events_sliding_windows": "green r9; due back r11",
}

#: driver evaluation order, round 10: the born-r10 maintained-ANN
#: surface first, then the 12 due-back slips (oldest rows), then the
#: r7 green block in PRUNED listing order
_DRIVER_ORDER = [
    # -- born r10 (VERDICT r9 item 2: the maintained ANN index) --
    "ann_topk_maintained",
    # -- the 12 slipped r3-r6/r5-r6 entries (must not slip twice) --
    "text_repetition_stats",
    "text_pii_scrub",
    "text_decontaminate",
    "cdc_schema_drift_parse",
    "dataset_pack_sequences",
    "ann_topk_srp",
    "dedup_embedding_cosine",
    "multimodal_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "events_session_windows",
    "user_running_stats_batch",
    # -- the r7 green block, 37 slots in PRUNED listing order --
    "q10_returned_items",
    "q14_promo_revenue",
    "text_normalize",
    "dataset_split_assign",
    "dedup_clusters",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_quantity_suppliers",
    "q21_last_shipper_blame",
    "q22_sales_opportunity",
    "embedding_pq_encode",
    "ann_topk_pq_adc",
    "graph_pagerank_neardup",
    "multimodal_decode_bmp",
    "multimodal_decode_gif",
    "multimodal_decode_tiff",
    "multimodal_decode_wav",
    "multimodal_resize_png_real",
    "pipeline_pretraining_corpus",
    "pipeline_multimodal_manifest",
    "dataset_pack_materialize",
    "dataset_quota_per_group",
    "dataset_weighted_sample",
    "dataset_mixture_weights",
    "dedup_lines_reconstruct",
    "dedup_corpus_final",
    "cdc_merge_bucketed",
    "cdc_incremental_agg_maintenance",
]

assert set(_DRIVER_ORDER) | set(PRUNED) == set(FULL_REGISTRY), (
    set(_DRIVER_ORDER) ^ (set(FULL_REGISTRY) - set(PRUNED))
)
assert not set(_DRIVER_ORDER) & set(PRUNED)
assert len(_DRIVER_ORDER) <= 50, len(_DRIVER_ORDER)

REGISTRY: dict[str, tuple] = {n: FULL_REGISTRY[n] for n in _DRIVER_ORDER}


def sf_dependent_sql_builders() -> dict:
    """Entries whose oracle SQL bakes per-scale-factor literals (trained
    artifacts rerun at oracle-build time). The registry carries the
    driver's sf0.01 build; test_oracle.py and scripts/sweep.py rebuild
    for their own SF via these builders."""
    from kafka_cdc_hudi_spark.plans.catalog_streaming import ivf_trained_sql_for
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        bpe_encode_sql_for,
        bpe_merges_sql_for,
    )

    from kafka_cdc_hudi_spark.plans.catalog_streaming import (
        recall_trained_vs_static_sql_for,
        semdedup_sql_for,
    )

    from kafka_cdc_hudi_spark.plans.catalog_streaming import pca_whiten_sql_for

    return {
        "embedding_pca_whiten": pca_whiten_sql_for,
        "ann_topk_ivf_trained": ivf_trained_sql_for,
        "ann_recall_trained_vs_static": recall_trained_vs_static_sql_for,
        "dedup_semantic_clusters": semdedup_sql_for,
        "text_bpe_train_merges": bpe_merges_sql_for,
        "text_bpe_encode": bpe_encode_sql_for,
    }


def register(name: str, fn, oracle_sql: str | None) -> None:
    FULL_REGISTRY[name] = (fn, oracle_sql)
    REGISTRY[name] = (fn, oracle_sql)


def queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
