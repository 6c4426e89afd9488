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
    # -- r12 scale hygiene (VERDICT r11 item 1): the two fixed-width SimHash
    #    pairing entries are subsumed by the corpus-scalable successor.
    #    Both keep their oracle SQL + smoke (test_demoted) and a loud
    #    corpus-size guard in catalog_text raises the banding law before
    #    the quadratic band join can materialize.
    "dedup_simhash_pairs": "dedup_simhash_band_scaled (same vote/band/verify algebra; the 32-bit signature's chance-collision term is quadratic — measured 7.05x wall per 10x rows at sf1, PLANS.md r11)",
    "dedup_simhash_wide_pairs": "dedup_simhash_band_scaled (same algebra, 16-bit bands; the 10-bit bands OOM at 500k docs — E[bucket]~N/1024 makes the candidate join quadratic, SCALE notes r11)",
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
#: ROUND-14 ROTATION (this file's current state; executes the schedule
#: pre-committed in r13 verbatim, VERDICT r13 item 1). IN (50 slots, in
#: order):
#:   1. the 3 entries born r13 past that round's driver-set freeze
#:      (multimodal_webp_anim_frames, corpus_warc_extract,
#:      pipeline_warc_corpus) — the only entries never driver-tested,
#:      all sweep-green r13 with full DuckDB oracles.
#:   2. the 16 slipped r10 entries (graph_pagerank_neardup ..
#:      cdc_incremental_agg_maintenance) — due back r14, "must not slip
#:      twice".
#:   3. 31 slots of the r11 green block in CORRECTNESS_r11 row order
#:      (text_bm25_topk .. multimodal_audio_segments). The last 19 r11
#:      entries (multimodal_video_cuts .. events_hourly_agg) slip to r15
#:      and must not slip twice.
#: OUT: the 50 green r13 driver entries (due back r15+ oldest-row-first)
#: and the 50 green r12 entries (due back r15 as slots allow).
#:
#: ROUND-15 ROTATION (committed in advance, the standing pattern):
#: IN (50 slots, in order):
#:   1. the entries born in r14 past this driver-set freeze (4:
#:      corpus_warc_http_decode, multimodal_webp_lossy_meta,
#:      pipeline_warc_html_corpus, pipeline_wet_roundtrip) plus any
#:      born later in r14.
#:   2. the 19 slipped r11 entries (multimodal_video_cuts,
#:      events_histogram_quantile_rollup, text_bpe_pair_counts,
#:      text_bpe_train_merges, pipeline_audio_manifest,
#:      text_bloom_decontaminate, dedup_fuzzy_editdist,
#:      dedup_fuzzy_canonicalize, text_bpe_encode,
#:      cdc_incremental_enriched_agg_maintenance, dataset_negative_sample,
#:      text_duplicated_span_fraction, text_fingerprint, text_language_id,
#:      embedding_quantize_int8, events_pivot_user_counts,
#:      active_user_set_ops, text_quality_score, events_hourly_agg) —
#:      must not slip twice.
#:   3. the r12 green block in CORRECTNESS_r12 row order as slots allow
#:      (~27 slots with the 4 born entries; the rest slip to r16 and
#:      must not slip twice).
#:   4. r13/r14 greens rest and return r16 oldest-row-first.
#: Structural near-duplicates stay DEMOTED (see ``DEMOTED``) with
#: covered-by reasons and a smoke test.

#: held out of the driver-facing registry (entry cap) — each is either a
#: near-duplicate of a surviving entry's physical plan shape or a
#: driver-green entry resting between rotations; the operator itself stays
#: covered by the named survivor + local oracle tests + the committed sweep
PRUNED: dict[str, str] = {
    # ---- born r14 AFTER the r14 driver-set freeze (rotate r15 slot 1) ----
    "corpus_warc_http_decode": "born r14 (chunked/gzip/charset HTTP wire framings through the WARC extractor, full oracle); rotate r15",
    "multimodal_webp_lossy_meta": "born r14 (lossy-VP8 key-frame header metadata, RFC 6386 uncompressed header; full oracle); rotate r15",
    "pipeline_warc_html_corpus": "born r14 (crawl flagship v2: HTML pages behind wire framings -> markup strip -> hash-keyed dedup; full composed oracle); rotate r15",
    "pipeline_wet_roundtrip": "born r14 (WET extracted-text output: warcinfo + conversion records, round-tripped through the WARC walker; full oracle); rotate r15",
    # ---- structural near-duplicates (standing; each covered by survivor) ----
    "cdc_latest_per_key": 'cdc_latest_per_composite_key (same dedup operator, composite keys; r2-r6 green)',
    "q6_forecast_revenue": 'q1_pricing_summary/q14 (filter+agg; pushdown pinned in test_plan_invariants)',
    "big_orders_semi_join": 'q4_order_priority (left-semi against aggregated/filtered build side)',
    "events_tumbling_windows": 'events_sliding_windows (same windowed-agg family) + test_streaming_windows builder tests',
    # ---- r11 greens slipped one round to r15 (slots consumed by the
    #      born-r13 + must-not-slip-twice r10 blocks; must not slip twice) ----
    "multimodal_video_cuts": "green r11; slipped r14, due back r15",
    "events_histogram_quantile_rollup": "green r11; slipped r14, due back r15",
    "text_bpe_pair_counts": "green r11; slipped r14, due back r15",
    "text_bpe_train_merges": "green r11; slipped r14, due back r15",
    "pipeline_audio_manifest": "green r11; slipped r14, due back r15",
    "text_bloom_decontaminate": "green r11; slipped r14, due back r15",
    "dedup_fuzzy_editdist": "green r11; slipped r14, due back r15",
    "dedup_fuzzy_canonicalize": "green r11; slipped r14, due back r15",
    "text_bpe_encode": "green r11; slipped r14, due back r15",
    "cdc_incremental_enriched_agg_maintenance": "green r11; slipped r14, due back r15",
    "dataset_negative_sample": "green r11; slipped r14, due back r15",
    "text_duplicated_span_fraction": "green r11; slipped r14, due back r15",
    "text_fingerprint": "green r11; slipped r14, due back r15",
    "text_language_id": "green r11; slipped r14, due back r15",
    "embedding_quantize_int8": "green r11; slipped r14, due back r15",
    "events_pivot_user_counts": "green r11; slipped r14, due back r15",
    "active_user_set_ops": "green r11; slipped r14, due back r15",
    "text_quality_score": "green r11; slipped r14, due back r15",
    "events_hourly_agg": "green r11; slipped r14, due back r15",
    # ---- r12 driver set, resting after green CORRECTNESS_r12 rows
    #      (due back r15 oldest-row-first as slots allow) ----
    "dedup_simhash_band_scaled": "green r12; due back r15",
    "text_token_topk": "green r12; due back r15",
    "ann_topk_ivf": "green r12; due back r15",
    "dedup_ngram_jaccard": "green r12; due back r15",
    "dataset_sample_stratified": "green r12; due back r15",
    "text_tfidf_topk": "green r12; due back r15",
    "events_user_rate_window": "green r12; due back r15",
    "multimodal_decode_png": "green r12; due back r15",
    "ann_topk_ivf_trained": "green r12; due back r15",
    "multimodal_decode_jpeg": "green r12; due back r15",
    "multimodal_video_frames": "green r12; due back r15",
    "cdc_merge_partial_updates": "green r12; due back r15",
    "events_cms_heavy_hitters": "green r12; due back r15",
    "ann_topk_ivfpq": "green r12; due back r15",
    "dedup_clusters_star": "green r12; due back r15",
    "events_sketches": "green r12; due back r15",
    "multimodal_video_keyframes": "green r12; due back r15",
    "cdc_merge_dms_e2e": "green r12; due back r15",
    "dedup_incremental_candidates": "green r12; due back r15",
    "graph_triangles_neardup": "green r12; due back r15",
    "ann_recall_at_k": "green r12; due back r15",
    "dedup_spans_remove": "green r12; due back r15",
    "events_partitioned_day_slice": "green r12; due back r15",
    "ann_recall_trained_vs_static": "green r12; due back r15",
    "events_ab_test": "green r12; due back r15",
    "dedup_semantic_clusters": "green r12; due back r15",
    "text_nb_classifier": "green r12; due back r15",
    "dataset_dsir_weights": "green r12; due back r15",
    "pipeline_rag_index": "green r12; due back r15",
    "pipeline_quality_funnel": "green r12; due back r15",
    "dedup_cdc_pair_ivm": "green r12; due back r15",
    "ann_topk_ivfpq_rerank": "green r12; due back r15",
    "dedup_cross_source_stats": "green r12; due back r15",
    "dataset_epoch_order": "green r12; due back r15",
    "text_containment_pairs": "green r12; due back r15",
    "embedding_pca_whiten": "green r12; due back r15",
    "pipeline_cdc_corpus_refresh": "green r12; due back r15",
    "events_ewma_forecast": "green r12; due back r15",
    "cdc_scd2_history": "green r12; due back r15",
    "q12_priority_by_linestatus": "green r12; due back r15",
    "events_hll_mergeable_rollup": "green r12; due back r15",
    "cdc_parse_debezium": "green r12; due back r15",
    "cdc_parse_dms": "green r12; due back r15",
    "cdc_latest_per_composite_key": "green r12; due back r15",
    "cdc_merge_two_batches": "green r12; due back r15",
    "cdc_merge_mor": "green r12; due back r15",
    "cdc_time_travel": "green r12; due back r15",
    "cdc_incremental_diff": "green r12; due back r15",
    "cdc_route_multitable": "green r12; due back r15",
    "q1_pricing_summary": "green r12; due back r15",
    # ---- r13 driver set, resting after green CORRECTNESS_r13 rows (50/50)
    #      (due back r15+ as slots allow; all locally oracled + swept) ----
    "multimodal_decode_webp": "green r13; due back r15+",
    "q3_shipping_priority": "green r13; due back r15+",
    "q4_order_priority": "green r13; due back r15+",
    "q5_local_supplier": "green r13; due back r15+",
    "topk_orders_per_customer": "green r13; due back r15+",
    "asof_join_last_click": "green r13; due back r15+",
    "customers_without_orders": "green r13; due back r15+",
    "events_cube": "green r13; due back r15+",
    "range_join_post_purchase": "green r13; due back r15+",
    "events_retention_cohorts": "green r13; due back r15+",
    "events_funnel_conversions": "green r13; due back r15+",
    "dedup_exact": "green r13; due back r15+",
    "dedup_minhash_lsh": "green r13; due back r15+",
    "dedup_simhash": "green r13; due back r15+",
    "ann_topk_bruteforce": "green r13; due back r15+",
    "events_sliding_windows": "green r13; due back r15+",
    "ann_topk_maintained": "green r13; due back r15+",
    "text_repetition_stats": "green r13; due back r15+",
    "text_pii_scrub": "green r13; due back r15+",
    "text_decontaminate": "green r13; due back r15+",
    "cdc_schema_drift_parse": "green r13; due back r15+",
    "dataset_pack_sequences": "green r13; due back r15+",
    "ann_topk_srp": "green r13; due back r15+",
    "dedup_embedding_cosine": "green r13; due back r15+",
    "multimodal_meta": "green r13; due back r15+",
    "multimodal_frame_sample": "green r13; due back r15+",
    "multimodal_resize": "green r13; due back r15+",
    "events_session_windows": "green r13; due back r15+",
    "user_running_stats_batch": "green r13; due back r15+",
    "q10_returned_items": "green r13; due back r15+",
    "q14_promo_revenue": "green r13; due back r15+",
    "text_normalize": "green r13; due back r15+",
    "dataset_split_assign": "green r13; due back r15+",
    "dedup_clusters": "green r13; due back r15+",
    "q2_min_cost_supplier": "green r13; due back r15+",
    "q7_volume_shipping": "green r13; due back r15+",
    "q8_market_share": "green r13; due back r15+",
    "q9_product_profit": "green r13; due back r15+",
    "q11_important_parts": "green r13; due back r15+",
    "q13_customer_distribution": "green r13; due back r15+",
    "q15_top_supplier": "green r13; due back r15+",
    "q16_part_supplier_variety": "green r13; due back r15+",
    "q17_small_quantity_revenue": "green r13; due back r15+",
    "q18_large_volume_customers": "green r13; due back r15+",
    "q19_disjunctive_revenue": "green r13; due back r15+",
    "q20_excess_quantity_suppliers": "green r13; due back r15+",
    "q21_last_shipper_blame": "green r13; due back r15+",
    "q22_sales_opportunity": "green r13; due back r15+",
    "embedding_pq_encode": "green r13; due back r15+",
    "ann_topk_pq_adc": "green r13; due back r15+",
}

#: driver evaluation order, round 14: the 3 born-r13 entries first (the
#: never-driver-tested set), then the 16 due-back-r10 slips (oldest rows),
#: then 31 slots of the r11 green block in CORRECTNESS_r11 row order
_DRIVER_ORDER = [
    # -- born r13 (never driver-tested; full oracles, sweep-green r13) --
    "multimodal_webp_anim_frames",
    "corpus_warc_extract",
    "pipeline_warc_corpus",
    # -- the 16 slipped r10 entries (must not slip twice) --
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
    # -- the r11 green block, 31 slots in CORRECTNESS_r11 row order --
    "text_bm25_topk",
    "text_bm25_maintained",
    "hybrid_retrieval_rrf",
    "hybrid_retrieval_maintained",
    "cdc_incremental_minmax_maintenance",
    "user_activity_reconciliation",
    "events_anomaly_zscore",
    "events_daily_ohlc",
    "events_data_profile",
    "events_kmv_distinct_rollup",
    "events_markov_transitions",
    "events_props_json_stats",
    "parts_cooccurrence",
    "text_bpe_pretokenize",
    "text_lm_score",
    "text_trigram_novelty",
    "text_hash_embedding",
    "dataset_interleave_order",
    "dataset_length_buckets",
    "embedding_mrl_energy",
    "events_value_percentiles",
    "events_user_gaps",
    "events_active_users_rolling",
    "text_rare_token_fraction",
    "text_chunk_overlap",
    "text_html_strip",
    "orders_price_percentile_rank",
    "events_type_cooccurrence",
    "customers_rfm_segments",
    "multimodal_decode_jpeg_color",
    "multimodal_audio_segments",
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
