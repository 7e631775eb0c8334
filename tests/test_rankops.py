"""rankops must be bit-identical to the unpartitioned-window semantics it
replaces (rank / ntile / running sum / totals under a TOTAL order), while
keeping every Window node in its plan partitioned. Checked against the
plain single-partition window on the same data, across partition counts —
the exact invariance a 1000-executor run needs."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pyconnect_spark.operators.rankops import (
    ntile_from_rank,
    rank_small_frame,
    with_global_order,
)
from pyconnect_spark.plans import unpartitioned_windows


@pytest.fixture(scope="module")
def frame(spark):
    # 997 rows, heavy ties on g (only 7 distinct), unique id tiebreak,
    # exact decimal + long measures
    return (
        spark.range(997)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("g"),
            ((F.col("id") * 37) % 101).cast("decimal(12,2)").alias("m"),
            ((F.col("id") * 13) % 19).cast("long").alias("n"),
        )
        .cache()
    )


def _order():
    return [F.desc("g"), F.col("id")]


def _reference(frame):
    w = Window.orderBy(*_order())
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    return frame.select(
        "id",
        F.row_number().over(w).cast("long").alias("rk"),
        F.ntile(10).over(w).cast("long").alias("dec10"),
        F.sum("m").over(wc).alias("cum_m"),
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("m").over(wall).alias("tot_m"),
        F.count("*").over(wall).cast("long").alias("tot_cnt"),
    )


@pytest.mark.parametrize("nparts", [1, 5, 32])
def test_with_global_order_matches_window(spark, frame, nparts):
    got = with_global_order(
        frame,
        _order(),
        rank_col="rk",
        cumsum={"m": "cum_m", "n": "cum_n"},
        totals={"m": "tot_m"},
        total_count_col="tot_cnt",
        npartitions=nparts,
    ).select(
        "id",
        "rk",
        ntile_from_rank("rk", "tot_cnt", 10).cast("long").alias("dec10"),
        "cum_m",
        "cum_n",
        "tot_m",
        "tot_cnt",
    )
    exp = {r["id"]: r for r in _reference(frame).collect()}
    rows = got.collect()
    assert len(rows) == len(exp)
    for r in rows:
        e = exp[r["id"]]
        assert (r["rk"], r["dec10"], r["cum_m"], r["cum_n"], r["tot_m"], r["tot_cnt"]) == (
            e["rk"], e["dec10"], e["cum_m"], e["cum_n"], e["tot_m"], e["tot_cnt"]
        ), f"row id={r['id']} diverges at nparts={nparts}"


def test_with_global_order_plan_has_no_unpartitioned_window(spark, frame):
    got = with_global_order(frame, _order(), rank_col="rk", cumsum={"n": "cum_n"})
    assert unpartitioned_windows(got) == []


def test_ntile_remainder_split(spark):
    # 7 rows into 3 buckets: sizes 3, 2, 2 — SQL-standard head-heavy split
    df = spark.range(1, 8).select(
        F.col("id").alias("rk"), F.lit(7).alias("n")
    )
    got = {
        r["rk"]: r["t"]
        for r in df.select("rk", ntile_from_rank("rk", "n", 3).alias("t")).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}


def test_rank_small_frame_matches_window(spark, frame):
    top = frame.orderBy(F.desc("n"), "id").limit(23)
    got = rank_small_frame(
        top, F.struct((-F.col("n")).alias("k1"), F.col("id").alias("k2")), rank_col="rk"
    )
    assert unpartitioned_windows(got) == []
    exp = {
        r["id"]: r["rk"]
        for r in top.select(
            "id",
            F.row_number().over(Window.orderBy(F.desc("n"), "id")).cast("long").alias("rk"),
        ).collect()
    }
    rows = got.collect()
    assert len(rows) == 23
    for r in rows:
        assert r["rk"] == exp[r["id"]]


@pytest.mark.parametrize("nparts", [1, 5, 32])
def test_cummax_excl_matches_window(spark, frame, nparts):
    """Exclusive prefix max must equal MAX OVER (... 1 PRECEDING) under
    the unpartitioned window, NULL on the global first row, across
    partition counts (the skyline/frontier primitive)."""
    wx = Window.orderBy(*_order()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    exp = {
        r["id"]: r["pm"]
        for r in frame.select("id", F.max("n").over(wx).alias("pm")).collect()
    }
    got = with_global_order(
        frame, _order(), cummax_excl={"n": "pm"}, npartitions=nparts
    )
    assert unpartitioned_windows(got) == []
    rows = got.collect()
    assert len(rows) == len(exp)
    assert sum(1 for r in rows if r["pm"] is None) == 1
    for r in rows:
        assert r["pm"] == exp[r["id"]], f"id={r['id']} at nparts={nparts}"
