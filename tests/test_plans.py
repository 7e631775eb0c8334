"""Plan-shape assertions: scale-critical physical-plan properties must
hold (and stay held) for the headline queries — pushdown, pruning,
broadcast, top-k without global sort."""

from __future__ import annotations

from pyconnect_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema,
    wholestage_codegen_spans,
)
from pyconnect_spark.registry import ALL

SF = "/root/testdata/sf0.01"
_Q = ALL.builders()


def test_b01_filter_pushed_and_columns_pruned(spark):
    df = _Q["b01_filter_project"](spark, SF)
    pf = " ".join(pushed_filters(df))
    assert "l_quantity" in pf and "GreaterThan" in pf
    cols = read_schema(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity"}  # pruned


def test_b03_date_filter_pushed(spark):
    df = _Q["b03_tpch_q1"](spark, SF)
    assert any("l_shipdate" in f for f in pushed_filters(df))
    assert "l_partkey" not in read_schema(df)  # unused columns pruned


def test_b06_broadcast_and_topk(spark):
    df = _Q["b06_tpch_q3"](spark, SF)
    text = explain_str(df)
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in text  # top-10 without a global sort


def test_b10_dimension_broadcast(spark):
    assert has_broadcast_join(_Q["b10_broadcast_join"](spark, SF))


def test_b18_topk_no_global_sort(spark):
    assert "TakeOrderedAndProject" in explain_str(_Q["b18_global_topk"](spark, SF))


def test_codegen_spans_exist(spark):
    # whole-stage codegen active on the hot aggregation path
    assert wholestage_codegen_spans(_Q["b03_tpch_q1"](spark, SF)) >= 1
