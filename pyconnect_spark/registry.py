"""Aggregate query registry: every declared operator across modules.

Ordering matters: the external driver's correctness harness checks the
FIRST 50 entries of ``queries()`` in dict order. The priority list below
rotates by staleness: queries that have never had a driver row lead,
then the round-3 merges (new names), then everything whose last green
row is oldest. Queries verified last round follow the window in module
order — nothing is ever dropped from the declared surface, and with
~126 declared queries the whole surface re-verifies every ~2.5 rounds
(the rotation always puts never-checked and oldest-evidence queries
first, so staleness is bounded even as the surface grows).
"""

from __future__ import annotations

from pyconnect_spark.operators import dedup, extended, multimodal, relational, similarity, text, timeseries, tpch
from pyconnect_spark.query import Query, QueryRegistry

_MERGED = QueryRegistry()
for mod in (relational, extended, tpch, timeseries, text, dedup, similarity, multimodal):
    _MERGED.merge(mod.REGISTRY)

# First 50 = the driver's verification window for round 4. Composition:
# (a) the 7 round-3 additions that have NEVER had a driver row,
# (b) the 3 queries REBUILT in round 3 after their last (r2) driver row,
# (c) the queries whose last green row is round 2 (CORRECTNESS_r02),
#     oldest evidence first. Four lowest-risk r02-greens (map-only
#     scan-tier: tx03 sha256 fingerprint, tx06 builtin levenshtein,
#     tx07 md5 hash-split, sm07 pure-column quantization) spill past
#     the window to round 5. Everything green in round 3's
#     CORRECTNESS_r03 (the old window) follows, so with ~104 declared
#     queries every query re-verifies on a strict 2-round cadence.
_PRIORITY = [
    # -- (a) round-3 additions, never driver-checked
    "tx13_char_entropy", "tx14_zipf_audit", "ts15_zscore_anomaly",
    "x34_tpch_q12_late_shipments", "sm09_ann_recall_audit",
    "dd10_minhash_calibration", "x35_lateral_topk",
    # -- (b) rebuilt in round 3 after their r2 driver row (merged semantics)
    "ts08_props_json", "tx08_quality_suite", "mm02_decode_pipeline",
    # -- (c) last green in round 2: extended / TPC-H adapted
    "b21_json_funcs", "x08_approx_stats", "x29_stratified_sample",
    "x25_tpch_q14", "x26_value_share", "x27_latest_per_key",
    "x28_skew_two_phase_agg",
    # -- (c) last green in round 2: time-series
    "ts01_tumbling_window", "ts02_sessionize", "ts03_asof_join",
    "ts04_sliding_window", "ts05_session_window_agg", "ts06_funnel",
    "ts07_retention", "ts09_rollup_cascade", "ts11_rolling_time_window",
    "ts12_ewma", "ts13_ohlc_bars", "ts14_resample_ffill",
    # -- (c) last green in round 2: text (tx03/tx06/tx07 spill to r5)
    "tx01_text_stats", "tx02_lang_id", "tx04_quality_filter",
    "tx05_winnow_fingerprint", "tx10_vocab_topk",
    # -- (c) last green in round 2: dedup
    "dd01_exact_dedup", "dd02_ngram_jaccard", "dd03_minhash_lsh",
    "dd04_simhash", "dd05_dedup_clusters", "dd06_keep_best",
    "dd07_contamination", "dd08_split_decontamination",
    # -- (c) last green in round 2: similarity (sm07 spills to r5)
    "sm01_cosine_topk", "sm02_embedding_neardup", "sm03_ann_lsh",
    "sm04_label_centroids", "sm05_ann_ivf", "sm06_ann_mllib_lsh",
    "sm08_centroid_assign",
    # -- (c) last green in round 2: multimodal
    "mm03_frame_sample",
]

# ROUND-5 ROTATION PLAN: window = the round-4 additions with no driver
# row yet (ts16_time_weighted_avg, x37_scd2_intervals,
# sm10_cluster_quality, tx15_pii_redaction, tx16_chunk_dedup,
# x36_tpch_q4, ts17_interpolate, sm11_knn_classify,
# dd11_source_overlap, tx17_bpe_pair_freq, tx18_length_buckets,
# b27_full_outer_join, x38_source_cap_sample,
# dd12_semantic_dedup_ivf, ts18_cusum_change, sm12_embedding_health,
# x39_robust_stats, mm04_media_manifest, tx19_split_oov,
# ts19_seasonal_residual, tx20_bigram_perplexity,
# x40_cooccurrence_lift, tx21_word_dropout, x41_conversion_lag,
# x42_udtf_chunks),
# the 4 spilled r02-greens (tx03, tx06, tx07,
# sm07), then the round-3-green families (the b/x relational core
# verified in CORRECTNESS_r03), oldest evidence first.

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
