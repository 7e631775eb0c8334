"""Aggregate query registry: every declared operator across modules.

Ordering matters: the external driver's correctness harness checks the
FIRST 50 entries of ``queries()`` in dict order. The priority list below
rotates by staleness: queries that have never had a driver row lead,
then anything rebuilt since its last row, then everything whose last
green row is oldest. Queries verified last round follow the window in
module order — nothing is ever dropped from the declared surface, and
with ~156 declared queries the whole surface re-verifies every ~3
rounds (the rotation always puts never-checked and oldest-evidence
queries first, so staleness is bounded even as the surface grows).
"""

from __future__ import annotations

from pyconnect_spark.operators import dedup, extended, multimodal, relational, similarity, text, timeseries, tpch
from pyconnect_spark.query import Query, QueryRegistry

_MERGED = QueryRegistry()
for mod in (relational, extended, tpch, timeseries, text, dedup, similarity, multimodal):
    _MERGED.merge(mod.REGISTRY)

# First 50 = the driver's verification window for round 4. Composition:
# (a) every query with NO driver row in CORRECTNESS_r01∪r02∪r03 — the
#     7 round-3 additions plus the 26 round-4 additions (33 total);
# (b) the 2 queries REBUILT in round 3 after their last (r2) driver row
#     (merged semantics, so the r2 row covers an old query body);
# (c) 15 refresh slots for CORRECTNESS_r02-era greens, prioritizing the
#     operators whose implementations were MODIFIED during round 4
#     (dd03 signature codegen cut, dd05 edge/probe overhead cut, sm05
#     n_probe=8, sm06 persist lifecycle) — their r2 evidence predates
#     the change — then the riskiest unchanged r2-greens (b21's former
#     hash-bug site, x08 sketches, the quadratic ground-truth tiers,
#     the ordered-fold/cogroup time-series).
# Rationale: a never-checked query is a bigger evidence gap than a
# 2-round-stale green, so first rows win the slots. The spilled
# r2-greens (x25-x29, ts01-ts14 tumbling/session family, tx01-tx10
# scan-tier, dd01, sm01/03/04/08, mm03, tx03/06/07, sm07) are
# unchanged since their green row and lead the round-5 window below.
_PRIORITY = [
    # -- (a) round-3 additions, never driver-checked
    "tx13_char_entropy", "tx14_zipf_audit", "ts15_zscore_anomaly",
    "x34_tpch_q12_late_shipments", "sm09_ann_recall_audit",
    "dd10_minhash_calibration", "x35_lateral_topk", "tx08_quality_suite",
    # -- (a) round-4 additions, never driver-checked
    "x36_tpch_q4", "x37_scd2_intervals", "x38_source_cap_sample",
    "x39_robust_stats", "x40_cooccurrence_lift", "x41_conversion_lag",
    "x42_udtf_chunks", "b27_full_outer_join",
    "ts16_time_weighted_avg", "ts17_interpolate", "ts18_cusum_change",
    "ts19_seasonal_residual",
    "tx15_pii_redaction", "tx16_chunk_dedup", "tx17_bpe_pair_freq",
    "tx18_length_buckets", "tx19_split_oov", "tx20_bigram_perplexity",
    "tx21_word_dropout",
    "dd11_source_overlap", "dd12_semantic_dedup_ivf",
    "sm10_cluster_quality", "sm11_knn_classify", "sm12_embedding_health",
    "mm04_media_manifest",
    # -- (b) rebuilt in round 3 after their r2 driver row (merged semantics)
    "ts08_props_json", "mm02_decode_pipeline",
    # -- (c) refresh: r2-green but MODIFIED in round 4
    "dd03_minhash_lsh", "dd05_dedup_clusters", "sm05_ann_ivf",
    "sm06_ann_mllib_lsh",
    # -- (c) refresh: riskiest unchanged r2-greens
    "b21_json_funcs", "x08_approx_stats", "dd02_ngram_jaccard",
    "dd04_simhash", "dd06_keep_best", "dd07_contamination",
    "dd08_split_decontamination", "sm02_embedding_neardup",
    "ts03_asof_join", "ts06_funnel", "ts12_ewma",
]

# ROUND-5 ROTATION PLAN: window = the 8 late-round-4 additions that
# landed after this window was frozen (x43_recursive_hierarchy,
# x44_data_quality_audit, tx22_boilerplate_removal,
# tx23_vocab_coverage, tx24_textrank_keywords,
# dd13_soft_dedup_weights, mm05_pairing_audit, ts20_churn_gaps,
# ts21_trend_forecast, sm13_embedding_drift, x45_value_histogram,
# dd14_prefix_filter_join, ts22_holt_smoothing, dd15_weighted_sample,
# x46_markov_transitions, tx25_effective_tokens,
# x47_last_touch_attribution, x48_graph_triangles,
# x49_hll_mergeable_rollup, ts23_session_facts, sm14_jl_projection,
# ts24_active_time, ts25_cumulative_distinct, ts26_wow_change,
# dd16_bow_dedup, sm15_similarity_histogram, mm06_frame_dedup,
# x50_decile_lift, ts27_peak_days, dd17_dedup_funnel, x51_psi_drift,
# ts28_autocorrelation, x52_benford_audit, x53_rfm_segments,
# x54_market_concentration, ts29_survival_curve, tx26_lang_leakage,
# x55_pareto_abc, dd18_cluster_sizes, x56_cohort_ltv,
# x57_growth_decomposition, ts30_burstiness, x58_basket_size,
# tx27_compression_quality, ts31_transition_latency,
# dd19_novelty_rate, x59_price_elasticity, ts32_weekday_weekend,
# x60_repeat_purchase_cycle, x61_shipping_sla, ts33_rolling_wau,
# tx28_length_gini, ts34_feed_continuity) and
# any round-5 additions first, then the
# r2-greens that spilled past this window (x25_tpch_q14, x26_value_share,
# x27_latest_per_key, x28_skew_two_phase_agg, x29_stratified_sample,
# ts01_tumbling_window, ts02_sessionize, ts04_sliding_window,
# ts05_session_window_agg, ts07_retention, ts09_rollup_cascade,
# ts11_rolling_time_window, ts13_ohlc_bars, ts14_resample_ffill,
# tx01_text_stats, tx02_lang_id, tx04_quality_filter,
# tx05_winnow_fingerprint, tx10_vocab_topk, tx03_fingerprint,
# tx06_edit_distance, tx07_hash_split, dd01_exact_dedup,
# sm01_cosine_topk, sm03_ann_lsh, sm04_label_centroids,
# sm07_int8_quantize, sm08_centroid_assign, mm03_frame_sample — 29,
# by then 3 rounds stale), then the r3/r4-green families, oldest
# evidence first.

ALL = QueryRegistry()
_all_merged = _MERGED.queries()
for _name in _PRIORITY:
    ALL.add(_all_merged[_name])
for _name, _q in _all_merged.items():
    if _name not in set(_PRIORITY):
        ALL.add(_q)


def queries():
    return ALL.builders()


def oracles():
    return ALL.oracles()


def get(name: str) -> Query:
    return ALL.queries()[name]
