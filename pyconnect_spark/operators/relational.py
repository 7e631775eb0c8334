"""Core relational operator surface (declared-query contract B01-B24).

Every query here exists twice: as an idiomatic DataFrame pipeline (what the
engine executes — Catalyst plans it, so filters/projections push into the
parquet scan and joins pick broadcast/SMJ adaptively) and as an ANSI-SQL
oracle string for DuckDB. Aliases and types are aligned pairwise; exact
decimal accumulation (see operators/_util.py) makes float aggregates
bitwise-reproducible across engines *and* across cluster repartitionings.

Scale notes are attached per query: which side broadcasts, where the
shuffle lands, what AQE is expected to do at 100 TB.

Reference parity: the reference (real-digital/pyconnect) has no relational
operators at all — it is a connector framework (see SURVEY.md §2.1); this
module is the EXT surface mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyconnect_spark.operators._util import (
    FACTOR,
    MONEY,
    SQL_ONE_MINUS,
    SQL_ONE_PLUS,
    davg,
    dec,
    dsum,
    one_minus,
    one_plus,
    sql_davg,
    sql_dsum,
    t,
)
from pyconnect_spark.query import QueryRegistry

REGISTRY = QueryRegistry()


# --------------------------------------------------------------------------
# B01 — scan / filter / projection
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b01_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
    doc="Scan + filter + projection; predicate and columns push into the parquet scan.",
    tags=("scan", "filter", "projection"),
)
def b01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


# --------------------------------------------------------------------------
# B02 — string scalar functions + LIKE
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b02_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                       AS brand_upper,
           CAST(length(p_name) AS BIGINT)       AS name_len,
           trim(concat(p_type, ' '))            AS type_trim,
           substring(p_name, 1, 5)              AS name_pfx
    FROM part WHERE p_type LIKE '%ECO%'
    """,
    tags=("string", "filter"),
)
def b02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type").like("%ECO%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.trim(F.concat(F.col("p_type"), F.lit(" "))).alias("type_trim"),
            F.substring("p_name", 1, 5).alias("name_pfx"),
        )
    )


# --------------------------------------------------------------------------
# B03 — TPC-H Q1 shape: hash aggregation with arithmetic + date predicate
# --------------------------------------------------------------------------
_B03_DISC = SQL_ONE_MINUS.format(c="l_discount")
_B03_TAX = SQL_ONE_PLUS.format(c="l_tax")


@REGISTRY.register(
    "b03_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')}                                        AS sum_qty,
           {sql_dsum('l_extendedprice')}                                   AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS {MONEY}) * {_B03_DISC}) AS DOUBLE)              AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS {MONEY}) * {_B03_DISC} * {_B03_TAX}) AS DOUBLE) AS sum_charge,
           {sql_davg('l_quantity')}                                        AS avg_qty,
           {sql_davg('l_extendedprice')}                                   AS avg_price,
           {sql_davg('l_discount', 'decimal(8,2)')}                        AS avg_disc,
           COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-03 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: partial (map-side) agg + final agg after a 2-key shuffle; "
    "6 groups total, so the shuffle is tiny regardless of input scale.",
    tags=("agg", "arithmetic", "date"),
)
def b03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1998-09-03 00:00:00").cast("timestamp_ntz")
    )
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(disc_price * one_plus("l_tax")).cast("double").alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount", "decimal(8,2)").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------
# B04 — date extraction + aggregation
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b04_date_agg",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT)  AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           COUNT(*)                           AS n_orders,
           {sql_dsum('o_totalprice')}         AS sum_total
    FROM orders GROUP BY 1, 2
    """,
    tags=("agg", "date"),
)
def b04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_total"))
    )


# --------------------------------------------------------------------------
# B05 — inner equi join + aggregation
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b05_join_agg",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="orders⋈customer: customer is the small side — AQE turns this into a "
    "broadcast hash join at any scale where customer fits the threshold.",
    tags=("join", "agg"),
)
def b05(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# B06 — TPC-H Q3 shape: 3-way join + agg + top-k
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b06_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS {MONEY}) * {_B03_DISC}) AS DOUBLE) AS revenue,
           -- string date: identical rendering (and pandas dtype) in both
           -- engines — DATE exports as datetime64 from DuckDB but as
           -- datetime.date objects from Spark
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: filters push below the joins; customer broadcasts; "
    "orders⋈lineitem shuffles on orderkey. Top-10 via TakeOrderedAndProject "
    "(no global sort materialization).",
    tags=("join", "agg", "topk"),
)
def b06(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    customer = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.sum(dec("l_extendedprice") * one_minus("l_discount")).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# B07 — left outer join, counting preserved nulls
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b07_left_join",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join", "outer", "agg"),
)
def b07(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# B08 / B09 — semi and anti joins
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b08_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "semi"),
)
def b08(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@REGISTRY.register(
    "b09_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "anti"),
)
def b09(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# B10 — broadcast join (explicit hint)
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b10_broadcast_join",
    oracle=f"""
    SELECT p_brand, {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Explicit broadcast of the dimension table: no shuffle of the fact "
    "side for the join; only the 25-group agg shuffles.",
    tags=("join", "broadcast", "agg"),
)
def b10(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(dsum("l_extendedprice").alias("sum_price"))
    )


# --------------------------------------------------------------------------
# B11 — non-equi (range) join
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b11_range_join",
    oracle="""
    SELECT COUNT(*) AS n_matches
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    """,
    doc="Equi key + range residual: executes as a (broadcast) hash join on "
    "partkey with the BETWEEN as a post-join filter — the scalable shape for "
    "equi+range predicates.",
    tags=("join", "range"),
)
def b11(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    cond = (
        (lineitem.l_partkey == part.p_partkey)
        & (lineitem.l_quantity >= part.p_size - 5)
        & (lineitem.l_quantity <= part.p_size + 5)
    )
    return lineitem.join(F.broadcast(part), cond).agg(F.count("*").alias("n_matches"))


# --------------------------------------------------------------------------
# B12 — distinct aggregation
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b12_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*)                  AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Multi-column distinct agg: Spark expands to a partial-distinct "
    "(expand + two-phase agg) plan — no single-node de-dup bottleneck.",
    tags=("agg", "distinct"),
)
def b12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# B13 / B14 — rollup and cube
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b13_rollup_sets",
    oracle=f"""
    SELECT n_name, c_mktsegment,
           COUNT(*) AS n, {sql_dsum('c_acctbal')} AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
    """,
    doc="GROUPING SETS covering the ROLLUP levels plus the per-segment "
    "marginal (round-3 merge of b13_rollup and x01_grouping_sets: same "
    "Expand physical operator, one declared query instead of two). All "
    "grouping variants are a single Expand + one hash aggregate — the "
    "fact side is scanned once regardless of how many sets are listed.",
    tags=("agg", "rollup", "grouping-sets"),
)
def b13(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    joined = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    # groupingSets is SQL-only surface; expressed via the SQL API on a temp view.
    joined.createOrReplaceTempView("pc_b13_cust_nat")
    return spark.sql(
        f"""
        SELECT n_name, c_mktsegment, COUNT(*) AS n,
               {sql_dsum('c_acctbal')} AS sum_acctbal
        FROM pc_b13_cust_nat
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
        """
    )


@REGISTRY.register(
    "b14_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def b14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# B15 — ranking window, top-k per group
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b15_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
      FROM customer) WHERE rn <= 3
    """,
    doc="Top-k per group via ranking window; Spark inserts a rank-limit "
    "(WindowGroupLimit) before the shuffle so only k rows per group move.",
    tags=("window", "topk"),
)
def b15(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# B16 — analytic window: lag + running sum (rows frame)
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b16_window_running",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice) OVER w AS prev_price,
           CAST(SUM(CAST(o_totalprice AS {MONEY})) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "analytic"),
)
def b16(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
    )


# --------------------------------------------------------------------------
# B17 — range frame window
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b17_range_frame",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(SUM(CAST(l_extendedprice AS {MONEY})) OVER (
                PARTITION BY l_returnflag ORDER BY l_quantity
                RANGE BETWEEN CURRENT ROW AND 5 FOLLOWING) AS DOUBLE) AS range_sum
    FROM lineitem
    """,
    tags=("window", "range-frame"),
)
def b17(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity").rangeBetween(0, 5)
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.sum(dec("l_extendedprice")).over(w).cast("double").alias("range_sum"),
    )


# --------------------------------------------------------------------------
# B18 — global sort + limit (top-k)
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b18_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    doc="Global top-k: executes as TakeOrderedAndProject (per-partition heap "
    "+ driver merge of k rows) — never a full global sort.",
    tags=("sort", "topk"),
)
def b18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --------------------------------------------------------------------------
# B19 — union / union all
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b19_set_union",
    oracle="""
    SELECT CAST(nationkey AS BIGINT) AS nationkey,
           (SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer
                                  UNION ALL
                                  SELECT s_nationkey FROM supplier)) AS n_all
    FROM (SELECT c_nationkey AS nationkey FROM customer
          UNION
          SELECT s_nationkey FROM supplier)
    """,
    doc="UNION (distinct) rows with the UNION ALL cardinality attached as a "
    "scalar (round-3 merge of b19_union_distinct and b19_union_all_count). "
    "The distinct is one shuffle on a tiny key domain; the count is a "
    "broadcast scalar cross join — no second fact-table pass at scale "
    "because AQE reuses the exchange.",
    tags=("setop", "union"),
)
def b19(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    u = c.union(s)
    n_all = u.agg(F.count("*").alias("n_all"))
    return u.distinct().crossJoin(F.broadcast(n_all))


# --------------------------------------------------------------------------
# B20 — intersect / except
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b20_intersect_except",
    oracle="""
    SELECT 'intersect' AS op, CAST(nationkey AS BIGINT) AS nationkey
    FROM (SELECT c_nationkey AS nationkey FROM customer
          INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except', CAST(nationkey AS BIGINT)
    FROM (SELECT c_nationkey AS nationkey FROM customer
          EXCEPT SELECT s_nationkey FROM supplier)
    """,
    doc="INTERSECT and EXCEPT results tagged and unioned (round-3 merge of "
    "b20_intersect and b20_except): both set ops planned in one query, each "
    "a left-semi/anti shape over the same two distinct inputs.",
    tags=("setop", "intersect", "except"),
)
def b20(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    inter = c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey")
    exc = c.subtract(s).select(F.lit("except").alias("op"), "nationkey")
    return inter.unionAll(exc)


# --------------------------------------------------------------------------
# B21 — JSON functions
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b21_json_funcs",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value,
           -- outer CAST: DuckDB SUM(BIGINT) returns HUGEINT (int128), which
           -- becomes DOUBLE on Arrow/pandas export and hash-mismatches
           -- Spark's BIGINT (99111 vs 99111.0) — r01 driver failure.
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def b21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )
    return (
        ev.filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("sum_value"),
            F.sum("k").alias("sum_k"),
        )
    )


# --------------------------------------------------------------------------
# B22 — text scalar functions over documents
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b22_text_scalar",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
           CAST(SUM(CASE WHEN length(text) > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
    FROM documents GROUP BY lang
    """,
    tags=("text", "agg"),
)
def b22(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("n_chars")).alias("avg_chars"),
        F.sum(F.when(F.length("text") > 100, 1).otherwise(0)).cast("long").alias("n_long"),
    )


# --------------------------------------------------------------------------
# B23 — array / higher-order functions
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b23_array_explode",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS emb_dim,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS emb_sum,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS emb_sq_sum,
           CAST(unnest(range(1, len(embedding) + 1)) AS BIGINT) AS idx,
           round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
    FROM embeddings WHERE vec_id < 100
    """,
    doc="Higher-order array functions (transform/aggregate, JVM-side) plus "
    "posexplode / unnest-with-ordinality in one plan (round-3 merge of "
    "b23_array_funcs and x07_explode_arrays; 1-based index to match SQL "
    "convention). The per-vector scalars are computed before the generator "
    "so each array is folded once, not once per exploded row.",
    tags=("array", "higher-order", "explode"),
)
def b23(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("emb_dim"),
        F.round(F.aggregate(xd, F.lit(0.0), lambda a, x: a + x), 6).alias("emb_sum"),
        F.round(F.aggregate(xd, F.lit(0.0), lambda a, x: a + x * x), 6).alias("emb_sq_sum"),
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "emb_dim",
        "emb_sum",
        "emb_sq_sum",
        (F.col("pos") + 1).cast("long").alias("idx"),
        F.round(F.col("v").cast("double"), 6).alias("val"),
    )


# --------------------------------------------------------------------------
# B24 — Python UDF parity (CASE-equivalent oracle)
# --------------------------------------------------------------------------
@REGISTRY.register(
    "b24_udf_tier",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier
    FROM customer
    """,
    doc="Deliberately exercises the row-at-a-time Python UDF surface (the "
    "one query allowed off the JVM fast path); oracle uses equivalent CASE.",
    tags=("udf",),
)
def b24(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("string")
    def tier(b: float) -> str:
        if b < 0:
            return "debt"
        if b < 1000:
            return "low"
        if b < 5000:
            return "mid"
        return "high"

    return t(spark, sf_dir, "customer").select("c_custkey", tier("c_acctbal").alias("tier"))


@REGISTRY.register(
    "b27_full_outer_join",
    oracle="""
    WITH a AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_jan FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-02-01'
      GROUP BY 1
    ),
    b AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_feb FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-02-01'
        AND o_orderdate < TIMESTAMP '1995-03-01'
      GROUP BY 1
    )
    SELECT o_custkey,
           coalesce(n_jan, 0) AS n_jan,
           coalesce(n_feb, 0) AS n_feb,
           CASE WHEN n_jan IS NOT NULL AND n_feb IS NOT NULL THEN 'both'
                WHEN n_jan IS NOT NULL THEN 'only_jan'
                ELSE 'only_feb' END AS activity
    FROM a FULL JOIN b USING (o_custkey)
    """,
    doc="Full outer join (the one join type the b05-b10 family didn't "
    "declare): January-1995 vs February-1995 active customers, with the "
    "USING-key coalesced and a both/only-left/only-right activity class "
    "— the month-over-month churn/retention frame. Both inputs pre-"
    "aggregate to one row per key BEFORE the join (the exchange carries "
    "per-customer counts, not order rows) and the date filters push to "
    "the scans. Full outer cannot broadcast either side in Spark, so the "
    "plan is the honest co-partitioned sort-merge — at 100 TB both "
    "sides shuffle once on the key, same as the big-big equi join.",
    tags=("join", "full-outer", "agg"),
)
def b27(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")

    def month(n: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= f"1995-{n:02d}-01")
                & (F.col("o_orderdate") < f"1995-{n + 1:02d}-01")
            )
            .groupBy("o_custkey")
            .agg(F.count("*").cast("long").alias(f"n_{'jan' if n == 1 else 'feb'}"))
        )

    j = month(1).join(month(2), ["o_custkey"], "full_outer")
    return j.select(
        "o_custkey",
        F.coalesce("n_jan", F.lit(0)).alias("n_jan"),
        F.coalesce("n_feb", F.lit(0)).alias("n_feb"),
        F.when(F.col("n_jan").isNotNull() & F.col("n_feb").isNotNull(), "both")
        .when(F.col("n_jan").isNotNull(), "only_jan")
        .otherwise("only_feb")
        .alias("activity"),
    )


@REGISTRY.register(
    "b28_nullsafe_join",
    oracle="""
    WITH c AS (
      SELECT c_custkey, NULLIF(c_nationkey % 7, 0) AS grp
      FROM customer
    ),
    o AS (
      SELECT o_custkey, o_totalprice,
             NULLIF(CAST(o_custkey AS BIGINT) % 7, 0) AS grp
      FROM orders
    )
    SELECT COALESCE(CAST(c.grp AS VARCHAR), 'NULL') AS grp_key,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           round(SUM(o.o_totalprice), 2) AS total_price
    FROM c JOIN o ON c.grp IS NOT DISTINCT FROM o.grp
                 AND c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): standard "
    "equi-joins silently DROP null keys (NULL = NULL is NULL, not "
    "true), which corrupts pipelines that use NULL as a real category "
    "(unknown region, unparsed field). Derived nullable keys "
    "(NULLIF(k % 7, 0)) exercise the exact semantics: the NULL bucket "
    "must survive the join and aggregate like any other group. Spark's "
    "eqNullSafe compiles to the same hash join as = (null keys hash "
    "into one bucket — observable as the NULL group's row; a skewed "
    "real-world NULL bucket is the canonical AQE skew-split case, "
    "x28's salting applies unchanged). The compound condition keeps "
    "the pair count bounded by the real c_custkey = o_custkey match.",
    tags=("relational", "join", "null-safe", "semantics"),
)
def b28(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_nationkey") % 7, F.lit(0)).alias("grp"),
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.nullif(F.col("o_custkey").cast("long") % 7, F.lit(0)).alias("grp"),
    )
    return (
        cust.join(
            orders,
            cust["grp"].eqNullSafe(orders["grp"])
            & (cust["c_custkey"] == orders["o_custkey"]),
        )
        .groupBy(
            F.coalesce(cust["grp"].cast("string"), F.lit("NULL")).alias(
                "grp_key"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.count_distinct(cust["c_custkey"]).cast("long").alias(
                "n_customers"
            ),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@REGISTRY.register(
    "b29_null_ordering",
    oracle="""
    WITH keyed AS (
      SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS grp,
             NULLIF(round(c_acctbal, 0), 0) AS bal
      FROM customer
    )
    SELECT CAST(row_number() OVER (
             ORDER BY grp ASC NULLS FIRST, bal DESC NULLS LAST, c_custkey)
             AS BIGINT) AS rk,
           c_custkey, grp, bal
    FROM keyed
    ORDER BY rk LIMIT 20
    """,
    doc="Explicit null-ordering semantics: Spark sorts NULLS FIRST on ASC "
    "by default, DuckDB (and Postgres) NULLS LAST — silent cross-engine "
    "divergence for any ranking over a nullable key unless the "
    "direction is written out. This query pins both directions at once "
    "(asc_nulls_first on the group key, desc_nulls_last on the "
    "measure) under a totally-ordered rank, which is the discipline "
    "every nullable ORDER BY in the engine follows. "
    "TakeOrderedAndProject keeps the top-20 without a global sort.",
    tags=("relational", "sort", "nulls", "semantics"),
)
def b29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyconnect_spark.operators.rankops import rank_small_frame

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("grp"),
        F.nullif(F.round("c_acctbal", 0), F.lit(0.0)).alias("bal"),
    )
    order = [
        F.col("grp").asc_nulls_first(),
        F.col("bal").desc_nulls_last(),
        F.col("c_custkey"),
    ]
    # top-20 first (TakeOrderedAndProject — per-partition top-k, no global
    # sort), THEN rank the 20 survivors by a broadcast triangular join;
    # the old global row_number-then-limit denied the optimizer that
    # pruning. The struct key encodes the null directions as null-free
    # flag fields so struct `<` reproduces asc_nulls_first/desc_nulls_last.
    top = cust.orderBy(*order).limit(20)
    key = F.struct(
        F.when(F.col("grp").isNull(), 0).otherwise(1).alias("g_null"),
        F.coalesce(F.col("grp"), F.lit(0)).alias("g_val"),
        F.when(F.col("bal").isNull(), 1).otherwise(0).alias("b_null"),
        F.coalesce(-F.col("bal"), F.lit(0.0)).alias("b_negval"),
        F.col("c_custkey").alias("ck"),
    )
    return rank_small_frame(top, key, rank_col="rk").select(
        "rk", "c_custkey", "grp", "bal"
    )
