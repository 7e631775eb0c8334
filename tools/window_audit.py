#!/usr/bin/env python
"""Audit EVERY declared query's optimized plan for unpartitioned Window /
WindowGroupLimit nodes (the single-task global-sort anti-pattern). Plan-only
— builds each DataFrame at sf0.001 and walks the optimized logical plan, no
execution — so the full 215-query surface audits in ~a minute.

Output: one line per offending query with the node strings, then a summary.
Exit 1 if any offender is found outside the allowlist passed on argv.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.001")


def main() -> None:
    allow = set(sys.argv[1:])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m
    from pyconnect_spark.plans import unpartitioned_windows

    bad = []
    for name, fn in m.queries().items():
        try:
            nodes = unpartitioned_windows(fn(spark, SF))
        except Exception as exc:  # noqa: BLE001 — plan-build failure is a finding too
            print(f"{name:35s} PLAN-ERROR {type(exc).__name__}: {exc}"[:150])
            bad.append(name)
            continue
        if nodes:
            flag = " (allowed)" if name in allow else ""
            print(f"{name:35s} {len(nodes)} unpartitioned window node(s){flag}")
            for n in nodes:
                print(f"    {n[:140]}")
            if name not in allow:
                bad.append(name)
    print(f"\nOFFENDERS outside allowlist: {len(bad)} -> {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
