"""Plan-shape assertions for the round-9 operators: the scale-critical
physical properties their docstrings promise — broadcasts where dims are
small, no CartesianProduct anywhere, every WindowExec partitioned, JVM-only
paths staying off MapInPandas, checkpoint pins visible as ExistingRDD
scans."""

from __future__ import annotations

from pyconnect_spark.plans import (
    explain_str,
    has_broadcast_join,
    unpartitioned_windows,
)
from pyconnect_spark.registry import ALL

SF = "/root/testdata/sf0.01"
_Q = ALL.builders()


def _clean(name, spark):
    df = _Q[name](spark, SF)
    text = explain_str(df)
    assert "CartesianProduct" not in text, name
    assert not unpartitioned_windows(df), name
    return df, text


def test_x95_broadcast_rank_maps(spark):
    # both rank maps broadcast back onto the fact scan; the only windows
    # run flag-partitioned on the tiny distinct-value frames
    df, text = _clean("x95_spearman_dependence", spark)
    assert has_broadcast_join(df)
    assert "MapInPandas" not in text


def test_x96_distributed_prefix_max(spark):
    # rankops.cummax_excl: range-partition + pinned layout (ExistingRDD)
    # + per-slice windows; frontier joins back via broadcast
    df, text = _clean("x96_pareto_skyline", spark)
    assert has_broadcast_join(df)
    assert "Scan ExistingRDD" in text  # the localCheckpoint pin


def test_x98_broadcast_part_dim(spark):
    df, text = _clean("x98_sku_repurchase", spark)
    assert has_broadcast_join(df)
    assert "MapInPandas" not in text


def test_ts73_ts74_ts75_typed_windows_only(spark):
    for name in (
        "ts73_record_breaking_days",
        "ts74_turning_points_test",
        "ts75_traffic_concentration",
    ):
        df, text = _clean(name, spark)
        assert "MapInPandas" not in text, name


def test_ts77_no_windows_at_all(spark):
    # retention curve is pure aggregation + broadcast joins: no
    # WindowExec of any kind in the plan
    df, text = _clean("ts77_weekly_retention_curve", spark)
    assert "Window" not in text
    assert has_broadcast_join(df)


def test_ts78_histogram_grain_windows(spark):
    # user-grain work ends at the (type, user) combiner agg; all windows
    # run on the (type, count) histogram frame, type-partitioned
    df, text = _clean("ts78_user_concentration", spark)
    assert "MapInPandas" not in text


def test_ts79_one_union_two_carries(spark):
    # nearest as-of: both carry windows keyed on the same user partition,
    # no Python workers, no cartesian
    df, text = _clean("ts79_asof_nearest", spark)
    assert "MapInPandas" not in text
    assert "Union" in text


def test_tx58_tx59_tx60_map_side_collapse(spark):
    for name in (
        "tx58_char_coverage_curve",
        "tx59_template_prefix_profile",
        "tx60_length_lognormal_fit",
    ):
        df, text = _clean(name, spark)
        assert "MapInPandas" not in text, name


def test_dd42_dd46_bucket_joins_only(spark):
    # both candidate generators join on (band/block, hash) bucket keys —
    # a cartesian anywhere would mean the LSH shape regressed
    for name in ("dd42_seed_stability_audit", "dd46_minhash_vs_simhash"):
        _clean(name, spark)


def test_dd44_pinned_components(spark):
    # the CC label frame is checkpoint-pinned (size agg + pair self-join
    # both read it); intra-cluster pairs join root-keyed
    df, text = _clean("dd44_chain_merge_audit", spark)
    assert "Scan ExistingRDD" in text


def test_sm45_sm46_broadcast_query_scan(spark):
    for name in (
        "sm45_dot_cosine_rank_overlap",
        "sm46_class_margin_matrix",
    ):
        df, text = _clean(name, spark)
        assert has_broadcast_join(df), name
        assert "MapInPandas" not in text, name


def test_sm47_jvm_only_centroid(spark):
    # the d-row centroid folds to one broadcast array; the centered-norm
    # pass is pure JVM expressions
    df, text = _clean("sm47_centroid_distance_anova", spark)
    assert "MapInPandas" not in text


def test_mm15_decode_stub_then_source_agg(spark):
    # the ONLY Python stage is the Arrow-batched decode stub; the plan
    # arithmetic and the source rollup are JVM-side
    import re

    df, text = _clean("mm15_video_frame_plan", spark)
    assert "MapInPandas" in text
    # exactly ONE physical MapInPandas node (formatted explain prints the
    # tree and the detail section, so count numbered detail entries)
    assert len(re.findall(r"\(\d+\) MapInPandas", text)) == 1
    assert "Window" not in text
