#!/usr/bin/env python
"""Dry-run the external driver's correctness window: the FIRST 50 entries
of __spark_entry__.queries() in declared order, each executed under a
VANILLA SparkSession (no repo config — exactly how the driver runs them)
and compared against its oracle_sql() on the sf0.01 fixtures.

This is the pre-flight for CORRECTNESS_r{N}: run it before the round ends
and the driver's window should come back green with no surprises.

Usage: python tools/window_check.py [n_window]    (default 50)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def c(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(c(r[i]) for i in order) for r in rows)


def main() -> None:
    n_window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    window = list(qs)[:n_window]
    bad = []
    for name in window:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            if name in osql:
                rel = con.sql(osql[name])
                ok = (
                    canon(srows, sdf.columns) == canon(rel.fetchall(), rel.columns)
                    and sorted(sdf.columns) == sorted(rel.columns)
                )
                status = "ok" if ok else "MISMATCH"
                if not ok:
                    bad.append(name)
            else:
                status = "rows-only"
            print(f"{name:35s} {status:9s} n={len(srows):<6d} {time.time()-t0:.1f}s")
        except Exception as exc:  # noqa: BLE001 — report and keep sweeping
            bad.append(name)
            print(f"{name:35s} ERROR     {type(exc).__name__}: {exc}"[:120])
    print(f"WINDOW {len(window) - len(bad)}/{len(window)} green; bad={bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
