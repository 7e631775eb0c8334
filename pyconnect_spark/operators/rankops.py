"""Distributed exact global ordering — the single-partition-window killer.

``row_number()/ntile()/SUM() OVER (ORDER BY ...)`` with no PARTITION BY is
correct but collapses the whole frame onto ONE task (Spark even warns:
"No Partition Defined for Window operation"). Fine for a 25-row Markov
matrix; fatal for a |users| or |parts| frame at 100 TB. These helpers give
the same exact semantics with a fully distributed plan:

1. ``repartitionByRange`` over the total order — the range sampler splits
   even heavy tie runs across partitions because it samples the *composite*
   key (ties break on the tiebreak columns), so no partition is forced to
   hold an entire tie class.
2. A lazy ``localCheckpoint`` pins the materialized partition layout, so
   every downstream subtree (the per-partition stats AND the final ranked
   output) reads the SAME partitioning — without it, each action would
   re-sample range bounds (``RangePartitioner`` seeds by ``rdd.id``) and
   partition ids could silently shift between the offset job and the rank
   job.
3. Per-partition ``row_number``/running sums under a *partitioned* window
   (``partitionBy(spark_partition_id())``) — a local sort per range slice,
   never a global one.
4. Prefix offsets per partition from the tiny per-partition stats frame
   (≤ ``spark.sql.shuffle.partitions`` rows) via a triangular self-join —
   not a collect (stays a declarative plan) and not a global window (which
   would just re-introduce the anti-pattern one level down).

The result is bit-identical to the unpartitioned window (ranks are a pure
function of the total order; running DECIMAL sums are association-free) but
the biggest sort any task performs is |frame| / n_partitions rows.

For frames already proven tiny (a top-k slice after ``orderBy().limit(k)``,
which compiles to TakeOrderedAndProject), ``rank_small_frame`` ranks by a
triangular broadcast self-join instead — no WindowExec at all.

Reference parity: the reference engine has no distributed ranking (it is a
single-process connector, real-digital/pyconnect src/ throughout); this
module exists for the 100-TB posture of the EXT analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_rng_pid"


def with_global_order(
    df: DataFrame,
    order: list[Column],
    *,
    rank_col: str | None = None,
    cumsum: dict[str, str] | None = None,
    cummax_excl: dict[str, str] | None = None,
    totals: dict[str, str] | None = None,
    total_count_col: str | None = None,
    npartitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number`` / running sums under a TOTAL order,
    with no unpartitioned WindowExec anywhere in the plan.

    order:            sort expressions forming a total order (caller must
                      include a unique tiebreak — same contract as any
                      deterministic ranking in this repo).
    rank_col:         if set, attach the global 1-based rank (long).
    cumsum:           {src_col: out_col} running-sum columns (inclusive of
                      the current row). Use exact (decimal/integer) sources:
                      a running DOUBLE sum is association-dependent and the
                      distributed regrouping could differ from a sequential
                      engine in the last ulp.
    cummax_excl:      {src_col: out_col} running-max columns EXCLUSIVE of
                      the current row (``MAX(s) OVER (... ROWS BETWEEN
                      UNBOUNDED PRECEDING AND 1 PRECEDING)``) — NULL on the
                      first row of the total order. Max is association-free
                      for any orderable type, so no exactness caveat. The
                      strict-prefix shape is what dominance scans (skyline /
                      frontier) need.
    totals:           {src_col: out_col} frame-wide totals of the same
                      sources, broadcast onto every row.
    total_count_col:  if set, attach the frame-wide row count (long) —
                      what ``ntile_from_rank`` needs.
    """
    cumsum = cumsum or {}
    cummax_excl = cummax_excl or {}
    totals = totals or {}
    spark = df.sparkSession
    np_ = int(npartitions or spark.conf.get("spark.sql.shuffle.partitions", "32"))

    part = df.repartitionByRange(np_, *order).localCheckpoint(eager=False)
    part = part.withColumn(_PID, F.spark_partition_id())
    dtypes = dict(part.dtypes)

    srcs = sorted(set(cumsum) | set(totals))
    msrcs = sorted(cummax_excl)
    stats = part.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("_rng_cnt"),
        *[F.sum(s).alias(f"_rng_s_{i}") for i, s in enumerate(srcs)],
        *[F.max(s).alias(f"_rng_m_{i}") for i, s in enumerate(msrcs)],
    )

    # prefix offsets: for each partition, totals over strictly-lower pids.
    # Triangular join on a ≤ n_partitions-row frame — O(np²) tiny.
    a, b = stats.alias("a"), stats.alias("b")
    offs = (
        a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(
            F.coalesce(F.sum("b._rng_cnt"), F.lit(0)).alias("_rng_off_cnt"),
            *[
                F.coalesce(
                    F.sum(f"b._rng_s_{i}"), F.lit(0).cast(dtypes[s])
                ).alias(f"_rng_off_{i}")
                for i, s in enumerate(srcs)
            ],
            # max over strictly-lower pids; NULL (identity) when pid 0
            *[
                F.max(f"b._rng_m_{i}").alias(f"_rng_offm_{i}")
                for i, s in enumerate(msrcs)
            ],
        )
    )

    out = part.join(F.broadcast(offs), _PID)

    if total_count_col or totals:
        tot = stats.agg(
            F.sum("_rng_cnt").cast("long").alias("_rng_tot_cnt"),
            *[F.sum(f"_rng_s_{i}").alias(f"_rng_tot_{i}") for i, s in enumerate(srcs)],
        )
        out = out.crossJoin(F.broadcast(tot))
        if total_count_col:
            out = out.withColumn(total_count_col, F.col("_rng_tot_cnt"))
        for i, s in enumerate(srcs):
            if s in totals:
                out = out.withColumn(totals[s], F.col(f"_rng_tot_{i}"))
        out = out.drop("_rng_tot_cnt", *[f"_rng_tot_{i}" for i in range(len(srcs))])

    w = Window.partitionBy(_PID).orderBy(*order)
    if rank_col:
        out = out.withColumn(
            rank_col, (F.col("_rng_off_cnt") + F.row_number().over(w)).cast("long")
        )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for i, s in enumerate(srcs):
        if s in cumsum:
            out = out.withColumn(cumsum[s], F.col(f"_rng_off_{i}") + F.sum(s).over(wc))
    # exclusive prefix max: within-slice strict-prefix window max combined
    # with the lower-slice max (greatest skips NULLs, so the first row of
    # each slice falls back to the offset and pid 0's first row stays NULL)
    wx = w.rowsBetween(Window.unboundedPreceding, -1)
    for i, s in enumerate(msrcs):
        out = out.withColumn(
            cummax_excl[s],
            F.greatest(F.col(f"_rng_offm_{i}"), F.max(s).over(wx)),
        )

    return out.drop(
        _PID,
        "_rng_off_cnt",
        *[f"_rng_off_{i}" for i in range(len(srcs))],
        *[f"_rng_offm_{i}" for i in range(len(msrcs))],
    )


def ntile_from_rank(rank_col: str | Column, n_col: str | Column, k: int) -> Column:
    """``ntile(k)`` reconstructed from an exact global rank and frame count:
    the first ``n % k`` buckets hold ``n div k + 1`` rows, the rest
    ``n div k`` (SQL-standard — matches Spark and DuckDB). Double division
    inside floor is exact for any frame below 2^53 rows."""
    r = F.col(rank_col) if isinstance(rank_col, str) else rank_col
    n = F.col(n_col) if isinstance(n_col, str) else n_col
    base = F.floor(n / k)
    rem = n % k
    head = rem * (base + F.lit(1))
    return F.when(r <= head, F.ceil(r / (base + 1))).otherwise(
        rem + F.ceil((r - head) / base)
    )


def rank_small_frame(df: DataFrame, key: Column, rank_col: str = "rk") -> DataFrame:
    """Exact 1-based rank of a PROVEN-SMALL frame (e.g. the output of
    ``orderBy().limit(k)`` → TakeOrderedAndProject) by a triangular
    broadcast self-join on a totally-ordering sort key — no WindowExec,
    no single-partition sort, O(k²) comparisons on k rows. All payload
    columns (arrays included) are carried through by an equi-join back
    on the key, which also keeps the triangular legs narrow.

    key:  a (struct) expression whose ``<`` ordering IS the rank order and
          which is UNIQUE per row (struct comparison in Spark is
          lexicographic over its fields; encode any NULLS FIRST/LAST
          semantics into null-free flag fields before calling).

    NOTE: ``df`` is referenced three times in the output plan, so its
    lineage must be deterministic under re-execution — ``orderBy(total
    order).limit(k)`` is; a bare ``limit(k)`` is NOT."""
    kt = df.withColumn("_rsf_k", key)
    keys = kt.select("_rsf_k")
    ranks = (
        keys.alias("a")
        .join(
            F.broadcast(keys.select(F.col("_rsf_k").alias("_rsf_k2"))),
            F.col("_rsf_k2") < F.col("_rsf_k"),
            "left",
        )
        .groupBy("_rsf_k")
        .agg((F.count("_rsf_k2") + 1).cast("long").alias(rank_col))
    )
    return kt.join(F.broadcast(ranks), "_rsf_k").drop("_rsf_k")
