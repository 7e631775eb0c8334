"""10x scale-sanity protocol: replicate the fixture tables with shifted
ids, then time named queries at 1x vs 10x (min-of-2) and print the ratio.

This is the experiment behind every "10x data at Nx cost" line in
BASELINE.md — kept as a tool so the numbers are reproducible:

    python tools/scale_replicate.py                      # build /tmp/scale10x
    python tools/scale_replicate.py dd03_minhash_lsh ... # measure queries

Replication preserves FK relationships (o_orderkey/l_orderkey shift
together) and text content VERBATIM — which means exact-duplicate
cliques grow quadratically across copies. That is intentional: it is
how dd14's "cost sublinear in the true result" and dd12's fixed-nlist
failure mode were measured.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyconnect_spark.catalog import load_table
from pyconnect_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 10_000_000
# SCALE_COPIES=100 runs the 100x probe (round-7 verdict task #3: 10x can
# miss super-linear terms that 100x exposes; ~6M docs / 60M lineitem rows
# fits the 128 GiB sandbox). SCALE_SALT_TEXT=1 appends a per-copy token to
# document text: verbatim replication grows exact-dup cliques x COPIES, so
# pair-producing dedup queries at 100x would measure the QUADRATIC growth
# of the true result (10^4 per clique), not the engine — salting models
# "100x more data" instead of "100x more copies of the same data". Record
# which mode a ratio used; verbatim remains the default (it is how dd14's
# sublinearity and dd12's fixed-nlist failure were measured).
COPIES = int(os.environ.get("SCALE_COPIES", "10"))
SALT_TEXT = os.environ.get("SCALE_SALT_TEXT", "") == "1"
OUT = os.environ.get(
    "SCALE10X_DIR",
    f"/tmp/scale{COPIES}x" + ("_salted" if SALT_TEXT else ""),
)

# key columns to shift per table so replicated rows get distinct ids while
# joins stay consistent within each copy
SHIFTS: dict[str, tuple[str, ...]] = {
    "documents": ("doc_id",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "customer": ("c_custkey",),
    "events": ("event_id", "user_id"),
    "embeddings": ("vec_id",),
}


def replicate(spark) -> None:
    for tbl, keys in SHIFTS.items():
        df = load_table(spark, SF, tbl)
        parts = []
        for i in range(COPIES):
            d = df
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if SALT_TEXT and tbl == "documents" and i > 0:
                d = d.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" c{i}"))
                )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(f"{OUT}/{tbl}.parquet")
        print(f"replicated {tbl} x{COPIES}")
    # small dims pass through unreplicated (FKs above keep pointing at
    # the same 25 nations / 5 regions / suppliers — "more facts, same
    # dimensions", which is also what a real 100 TB star looks like)
    for tbl in ("nation", "region", "supplier"):
        load_table(spark, SF, tbl).write.mode("overwrite").parquet(
            f"{OUT}/{tbl}.parquet"
        )
        print(f"copied {tbl} (dimension, unreplicated)")


def measure(spark, names: list[str]) -> None:
    from pyconnect_spark.cachereg import clear_operator_caches
    from pyconnect_spark.registry import ALL

    builders = ALL.builders()
    for name in names:
        res = {}
        nx = f"{COPIES}x"
        for label, d in (("1x", SF), (nx, OUT)):
            best, rows = float("inf"), 0
            for _ in range(2):
                t0 = time.perf_counter()
                rows = builders[name](spark, d).count()
                best = min(best, time.perf_counter() - t0)
            res[label] = (best, rows)
            clear_operator_caches()
        r1, rn = res["1x"], res[nx]
        print(
            f"{name}: 1x={r1[0]:.2f}s({r1[1]} rows) "
            f"{nx}={rn[0]:.2f}s({rn[1]} rows) ratio={rn[0] / r1[0]:.1f}x"
        )


def main() -> None:
    spark = get_spark("scale-replicate", cores=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:]
    if not os.path.isdir(OUT) or not names:
        replicate(spark)
    if names:
        measure(spark, names)
    spark.stop()


if __name__ == "__main__":
    main()
