"""Adapted TPC-H query shapes beyond the b/x series (x18-x26).

The driver fixtures are TPC-H-ish but trimmed: no `partsupp`, no
`l_commitdate`/`l_receiptdate`, no `c_phone` (`/root/repo/TESTDATA.md`).
Each query here keeps the *plan shape* of its TPC-H counterpart — the
join graph, the subquery/decorrelation pattern, the aggregation structure
— re-targeted at the available columns, because the plan shape is what
stresses the optimizer and what must survive a 100 TB scale-up.

Reference parity: the reference engine's query surface is declared in
SURVEY.md §2.3; these extend the same declared-query contract (Spark
builder + DuckDB oracle per query, exact-decimal aggregation per
operators/_util.py so results are bitwise-stable under any partitioning).

Scale notes per query are in each docstring; the common rules:
dimension tables broadcast, the single fact shuffle lands on the most
selective pre-filtered slice, thresholds are computed as exact decimals
so plans can be compared across engines without float tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyconnect_spark.operators._util import (
    FACTOR,
    MONEY,
    SQL_ONE_MINUS,
    dec,
    dsum,
    one_minus,
    sql_dsum,
    t,
)
from pyconnect_spark.query import QueryRegistry

REGISTRY = QueryRegistry()

_REV = f"CAST(l_extendedprice AS {MONEY}) * {SQL_ONE_MINUS.format(c='l_discount')}"


def _revenue() -> F.Column:
    return dec("l_extendedprice") * one_minus("l_discount")


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


@REGISTRY.register(
    "x18_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR
           (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping): bidirectional nation pair between "
    "supplier side and customer side, revenue by shipment year. Two "
    "broadcast nation joins with a disjunctive pair predicate that "
    "Catalyst can only apply after both joins — the fact-side work is "
    "pre-filtered by shipdate at the scan. The one big shuffle is "
    "lineitem⋈orders on orderkey; supplier/customer/nation broadcast.",
    tags=("join", "multi-join", "agg", "tpch"),
)
def x18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@REGISTRY.register(
    "x19_tpch_q8",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV}
                               ELSE CAST(0 AS {MONEY}) END) AS DOUBLE)
                 / CAST(SUM({_REV}) AS DOUBLE), 6) AS mkt_share,
           COUNT(*) AS n_items
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    """,
    doc="TPC-H Q8 (market share): one supplier nation's share of PROMO-part "
    "revenue sold into ASIA, by order year. Conditional aggregation — "
    "numerator is a CASE inside the same exact-decimal SUM as the "
    "denominator, so the share is one pass, not two joins. All dims "
    "broadcast; both fact shuffles (lineitem⋈orders on orderkey) carry "
    "only the part-filtered PROMO slice because the p_type filter is a "
    "broadcast-semi reduction applied before the shuffle.",
    tags=("join", "multi-join", "agg", "conditional", "tpch"),
)
def x19(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _revenue()
    zero = F.lit(0).cast(MONEY)
    return (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
    )


@REGISTRY.register(
    "x20_tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (disjunctive predicate pushdown): an OR-of-ANDs mixing "
    "build-side (p_brand/p_size) and probe-side (l_quantity) columns. "
    "Catalyst extracts the per-side common disjunctions — "
    "`p_brand IN (…)`, `p_size <= 35`, `l_quantity <= 30` — and pushes "
    "them below the join into both parquet scans (visible as "
    "PushedFilters), so the broadcast hash join probes only candidate "
    "rows and the full OR is re-checked post-join.",
    tags=("join", "filter", "pushdown", "tpch"),
)
def x20(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = F.col("l_quantity")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & q.between(1, 11)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & q.between(10, 20)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & q.between(20, 30)
    )
    return (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(cond)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@REGISTRY.register(
    "x21_late_supplier",
    oracle="""
    WITH fo AS (
      SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ),
    flagged AS (
      SELECT l_orderkey, l_suppkey,
             CAST(l_shipdate > o_orderdate + INTERVAL 100 DAY AS INT) AS is_late
      FROM lineitem JOIN fo ON l_orderkey = o_orderkey
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late
      FROM flagged GROUP BY l_orderkey
    ),
    late_supp AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM flagged WHERE is_late = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late_supp
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (suppliers who kept the order waiting): the sole "
    "late supplier in multi-supplier finished orders, 'late' adapted to "
    "shipdate > orderdate + 100d (fixtures lack commit/receipt dates). "
    "The textbook EXISTS + correlated NOT-EXISTS pair needs a non-equality "
    "correlated predicate Spark won't decorrelate — rewritten Spark-first "
    "as per-order distinct-supplier counts via collect_set window "
    "functions, so lineitem is scanned ONCE and shuffled once on "
    "orderkey (a groupBy+join-back formulation plans the same subtree "
    "twice — Spark DataFrames don't share unreferenced subplans). The "
    "post-filter distinct and supplier join run on the tiny survivor set. "
    "At 100 TB this is the difference between one fact pass and three.",
    tags=("join", "agg", "decorrelation-rewrite", "window", "tpch"),
)
def x21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    fo = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    flagged = (
        t(spark, sf_dir, "lineitem")
        .join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAY")
            ).cast("int").alias("is_late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    # collect_set skips nulls, so the late-set counts only late suppliers
    marked = flagged.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("is_late") == 1, F.col("l_suppkey"))
            ).over(w)
        ).alias("n_late"),
    )
    return (
        marked.filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@REGISTRY.register(
    "x22_tpch_q22",
    oracle=f"""
    SELECT c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           {sql_dsum('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (SELECT {sql_dsum('c_acctbal')} / COUNT(*)
                       FROM customer
                       WHERE c_acctbal > 0
                         AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 (global sales opportunity): well-funded customers in "
    "selected countries with no *recent* order (every fixture customer "
    "has some order, so 'never ordered' is vacuous; the date cut keeps "
    "the anti-join selective); country code adapted to c_nationkey "
    "(fixtures lack c_phone). Uncorrelated scalar AVG becomes "
    "a broadcast single-row cross join; NOT EXISTS becomes a left-anti "
    "join on custkey. The threshold is an exact decimal sum divided once "
    "in double, so both engines derive the bit-identical cutoff and the "
    "boundary rows agree. Anti-join side needs only o_custkey — column "
    "pruning keeps the 100 TB orders scan to one column.",
    tags=("anti-join", "scalar-subquery", "agg", "tpch"),
)
def x22(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = [1, 3, 5, 7, 9, 11, 13]
    cust = t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(keys))
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((dsum("c_acctbal") / F.count("*")).alias("avg_bal"))
    )
    recent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@REGISTRY.register(
    "x23_tpch_q18",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           -- string timestamp: identical rendering and pandas dtype in
           -- both engines (Spark exports ns, DuckDB us resolution)
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS {MONEY})) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 (large-volume customers): orders whose total quantity "
    "exceeds 250 (p99 of the fixture distribution), with customer detail. "
    "The IN-subquery is an aggregation over the same fact table — Spark "
    "plans it as agg→filter→semi-join where both the subquery agg and "
    "the outer agg shuffle on orderkey, so AQE reuses one exchange. "
    "Exact-decimal quantity sums make the >250 cutoff engine-stable.",
    tags=("subquery", "semi-join", "agg", "tpch"),
)
def x23(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_ok"), F.col("l_orderkey") == F.col("_ok"), "left_semi")
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
    )


@REGISTRY.register(
    "x24_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 (returned-item reporting): top-20 customers by revenue "
    "lost to returns in one quarter. Global top-k over an aggregate: "
    "Spark runs TakeOrderedAndProject — per-partition heaps then a "
    "driver-side merge of 20-row candidates, never a full sort. The "
    "revenue sort key is an exact decimal sum (bit-stable), tie-broken "
    "by unique custkey, so LIMIT is deterministic across engines.",
    tags=("join", "agg", "topk", "tpch"),
)
def x24(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@REGISTRY.register(
    "x25_tpch_q14",
    oracle=f"""
    SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                       ELSE CAST(0 AS {MONEY}) END) AS DOUBLE)
                 / CAST(SUM({_REV}) AS DOUBLE), 6) AS promo_revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="TPC-H Q14 (promotion effect): PROMO parts' share of one month's "
    "revenue as a single global scalar. Conditional numerator and "
    "denominator in one aggregation pass — map-side partial aggregation "
    "reduces each partition to two decimals before a single-row exchange, "
    "so the 100 TB case moves kilobytes. part broadcast; shipdate filter "
    "pushed to the scan.",
    tags=("join", "agg", "conditional", "tpch"),
)
def x25(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    rev = _revenue()
    zero = F.lit(0).cast(MONEY)
    return (
        li.join(
            F.broadcast(t(spark, sf_dir, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue"),
            F.count("*").alias("n_items"),
        )
    )


@REGISTRY.register(
    "x26_value_share",
    oracle=f"""
    SELECT l_partkey, {sql_dsum('l_extendedprice')} AS value
    FROM lineitem
    GROUP BY l_partkey
    HAVING {sql_dsum('l_extendedprice')} >
           (SELECT {sql_dsum('l_extendedprice')} * 0.0005 FROM lineitem)
    """,
    doc="TPC-H Q11 shape (important stock, partsupp-free): parts whose "
    "revenue exceeds a fraction of total revenue. The HAVING threshold is "
    "an uncorrelated scalar subquery — Spark computes the single-row "
    "total (map-side partial agg, one-row exchange) and broadcasts it "
    "into the filter above the per-part aggregation; the fact table is "
    "scanned twice but shuffles once on l_partkey and once to one row. "
    "Both engines derive the threshold from the same exact decimal sum.",
    tags=("agg", "scalar-subquery", "having", "tpch"),
)
def x26(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    total = li.agg((dsum("l_extendedprice") * F.lit(0.0005)).alias("_cut"))
    return (
        li.groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("value"))
        .join(F.broadcast(total))
        .filter(F.col("value") > F.col("_cut"))
        .select("l_partkey", "value")
    )


@REGISTRY.register(
    "x27_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
           o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
      FROM orders
    ) WHERE rk = 1
    """,
    doc="Latest-row-per-key compaction (the CDC/upsert read pattern): one "
    "windowed rank per key, deterministic tie-break on the unique key so "
    "replays and repartitionings keep the same survivor. One shuffle on "
    "the key; at 100 TB this is the standard change-log compaction read — "
    "write the table bucketed by the key and the window needs no exchange "
    "at all (see test_bucketed_join_has_no_shuffle).",
    tags=("window", "dedup", "cdc"),
)
def x27(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    )


@REGISTRY.register(
    "x28_skew_two_phase_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice')} AS total_price,
           CAST(MAX(CAST(l_quantity AS {MONEY})) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Skew-safe aggregation as a declared query: lineitem's 3-value "
    "l_returnflag is the canonical hot-key aggregation (at 100 TB each "
    "group would funnel tens of TB into one reducer). two_phase_agg "
    "salts the groupBy with a content-deterministic xxhash64 salt, "
    "pre-aggregates on (key, salt) — bounding any reducer to 1/16 of a "
    "hot group — then combines partials. Sums stay exact decimals through "
    "both phases and the salt derives from row content (no rand()), so "
    "the result is bit-identical to the direct groupBy oracle under any "
    "partitioning, retry, or speculative re-execution.",
    tags=("agg", "skew", "two-phase"),
)
def x28(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyconnect_spark.functions.skew import two_phase_agg

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", dec("l_extendedprice").alias("_p"), dec("l_quantity").alias("_q")
    )
    out = two_phase_agg(
        li,
        ["l_returnflag"],
        {"n": F.count("*"), "s": F.sum("_p"), "m": F.max("_q")},
        {"n_items": F.sum("n"), "_s2": F.sum("s"), "_m2": F.max("m")},
    )
    return out.select(
        "l_returnflag",
        "n_items",
        F.col("_s2").cast("double").alias("total_price"),
        F.col("_m2").cast("double").alias("max_qty"),
    )


@REGISTRY.register(
    "x30_tpch_q6",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {MONEY})
                    * CAST(l_discount AS {FACTOR})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND CAST(l_discount AS {FACTOR}) BETWEEN CAST(0.05 AS {FACTOR})
                                           AND CAST(0.07 AS {FACTOR})
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): the canonical "
    "scan-filter-aggregate with zero joins. Every predicate — shipdate "
    "range, discount band, quantity cap — is pushed into the parquet scan "
    "(PushedFilters), the projection prunes to three columns, and map-side "
    "partial aggregation reduces each partition to one decimal pair before "
    "a single-row exchange. At 100 TB this query's cost is pure I/O; "
    "with date-partitioned or zone-mapped storage the range predicate "
    "prunes whole files. Discount compares in decimal(4,2) on both "
    "engines so the band edges (exact 2-dp values) can never flip on "
    "float representation.",
    tags=("scan", "filter", "agg", "pushdown", "tpch"),
)
def x30(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dec("l_discount", FACTOR)
    lo = F.lit("0.05").cast(FACTOR)
    hi = F.lit("0.07").cast(FACTOR)
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & d.between(lo, hi)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * d).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@REGISTRY.register(
    "x31_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (customer distribution), adapted: the fixture has no "
    "o_comment, so the anti-predicate moves to o_orderpriority — the plan "
    "shape (outer join that must keep zero-order customers, then a "
    "two-level aggregation over the join result) is unchanged. The join "
    "condition's non-key predicate stays in the ON clause, NOT a WHERE "
    "(a WHERE would silently turn the outer join inner and drop the "
    "c_count=0 bucket). One shuffle on custkey, one on the tiny c_count "
    "domain (≤ max orders per customer, a few hundred groups at any "
    "scale) — the second aggregation is effectively free.",
    tags=("outer-join", "agg", "distribution", "tpch"),
)
def x31(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@REGISTRY.register(
    "x32_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM({_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 (top supplier): a quarter's revenue per supplier, then "
    "the supplier(s) hitting the global maximum. The max is derived from "
    "the SAME per-supplier aggregate as a broadcast scalar — the groupBy "
    "exchange is reused across both branches (ReusedExchange, pinned by "
    "plan test), so the fact table is scanned and shuffled exactly once, "
    "on l_suppkey (the naive scalar-subquery formulation plans two full "
    "lineitem scans; round-3 fix), and no WindowExec appears at all. "
    "The revenue ties are compared as exact decimals (never doubles), so "
    "'equal to the max' is deterministic under any partitioning — the "
    "TPC-H spec's own footnote about ties becomes a non-issue.",
    tags=("agg", "scalar-subquery", "join", "tpch"),
)
def x32(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        # explicit, so the supplier join's INFERRED isnotnull doesn't make
        # the two branches' scans differ and defeat AQE stage reuse below
        & F.col("l_suppkey").isNotNull()
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_rev"))
    # global max via broadcast scalar over the SAME per-supplier aggregate
    # — the groupBy shuffle stage is reused (AQE stage reuse), so lineitem
    # is still scanned/shuffled once, with no single-partition WindowExec
    best = rev.agg(F.max("total_rev").alias("_best"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("_best"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@REGISTRY.register(
    "x33_tpch_q17",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {MONEY})) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS a_partkey,
             SUM(CAST(l_quantity AS {MONEY})) AS qty_sum,
             COUNT(*) AS qty_n
      FROM lineitem GROUP BY l_partkey
    ) ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(l_quantity AS {MONEY}) * 5 * qty_n < qty_sum
    """,
    doc="TPC-H Q17 (small-quantity-order revenue), adapted: no "
    "p_container in the fixture, so brand alone selects the part slice. "
    "The correlated scalar subquery (0.2 * per-part average quantity) is "
    "written in its decorrelated form — a per-part aggregate joined back "
    "— which is exactly the plan Catalyst produces for the correlated "
    "original. The threshold test is cross-multiplied (5*qty*n < sum) so "
    "it stays in exact integer/decimal arithmetic: no division, no float, "
    "identical edge behavior on both engines. The brand slice of part is "
    "broadcast-joined to lineitem BEFORE the per-part aggregate (the "
    "per-part average only depends on rows of that part, so restricting "
    "to brand parts first is exact): the only wide shuffle — groupBy "
    "l_partkey — carries ~1/25 of lineitem instead of all of it, which "
    "is the difference between shuffling 4 TB and 100 TB at scale. The "
    "aggregate-to-probe join is then small enough for AQE to broadcast.",
    tags=("join", "correlated-subquery", "agg", "tpch"),
)
def x33(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    # Brand restriction FIRST: every downstream operator (including the
    # decorrelated per-part aggregate) sees only the brand slice.
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("qty_sum"),
        F.count("*").alias("qty_n"),
    ).withColumnRenamed("l_partkey", "a_partkey")
    return (
        li.join(per_part, F.col("a_partkey") == F.col("l_partkey"))
        .filter(dec("l_quantity") * F.lit(5) * F.col("qty_n") < F.col("qty_sum"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@REGISTRY.register(
    "x34_tpch_q12_late_shipments",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           round(CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                              THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS late_share
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q12 shape (shipping-mode priority audit), adapted: the "
    "fixture has no l_shipmode/l_commitdate/l_receiptdate, so lateness is "
    "l_shipdate > o_orderdate + 60 days and the grouping key is "
    "o_orderpriority - same join graph (the one big-big equi join on "
    "orderkey) and the same conditional two-way count aggregation. At "
    "100 TB neither side broadcasts: this is the canonical co-partition "
    "case - both tables shuffle once on orderkey (or are bucket-joined "
    "shuffle-free if written bucketed by orderkey, sources/layout.py), "
    "and the conditional counts partial-aggregate map-side so the "
    "post-join exchange carries |priorities| rows per task.",
    tags=("join", "agg", "tpch", "date"),
)
def x34(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(late).cast("long").alias("n_late"),
            F.round(F.sum(late).cast("double") / F.count("*"), 6).alias("late_share"),
        )
    )


@REGISTRY.register(
    "x35_lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc="Correlated LATERAL subquery with ORDER BY + LIMIT: each BUILDING "
    "customer's two largest orders. Catalyst decorrelates the lateral "
    "into an equi join + per-key group limit — no per-customer subquery "
    "execution, no repeated orders scans; the same plan a hand-written "
    "window row_number() <= 2 produces, but declared in the SQL form "
    "users port from other engines. Ties break on the unique order key "
    "so the LIMIT 2 set is deterministic in both engines.",
    tags=("lateral", "subquery", "topk", "join"),
)
def x35(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("pc_x35_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("pc_x35_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM pc_x35_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM pc_x35_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@REGISTRY.register(
    "x36_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 (order priority checking; reference category: decision-"
    "support queries), adapted to the fixture: no l_commitdate/"
    "l_receiptdate, so the lateness witness is l_shipdate more than 60 "
    "days after o_orderdate — same shape as the official Q4: a quarter-"
    "window scan of orders, an EXISTS decorrelated by Catalyst into a "
    "LEFT SEMI join on orderkey, and a tiny grouped count. The date "
    "filter prunes orders BEFORE the join (PushedFilters on the scan), "
    "so the semi join probes only the quarter's orders; the correlated "
    "non-equi term (shipdate vs THIS order's date) rides along as the "
    "semi-join's extra condition, not a separate pass. At 100 TB both "
    "sides shuffle once on orderkey (or bucket-join shuffle-free); the "
    "semi join short-circuits per key, so the build side never "
    "materializes duplicate matches.",
    tags=("tpch", "exists", "semi-join", "agg"),
)
def x36(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("pc_x36_orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("pc_x36_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM pc_x36_orders o
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
          AND EXISTS (SELECT 1 FROM pc_x36_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """
    )
