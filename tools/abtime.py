"""Interleaved A/B timing for the spread() parallelism floor.

Runs each named query alternately with _util spread() disabled (A = before,
via the module-level _AB_DISABLE_SPREAD flag — the toggle lives HERE, not in
an env var the production paths would read) and enabled (B = after), several
interleaved rounds, in ONE session — host
steal drifts over tens of seconds, so interleaving cancels it where
back-to-back reps cannot. Prints per-query min/median for both arms.

Usage: python tools/abtime.py [--reps N] name [name ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyconnect_spark.registry import ALL
from pyconnect_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 4
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    spark = get_spark("abtime", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builders = ALL.builders()
    builders["b01_filter_project"](spark, SF).count()  # warm-up
    from pyconnect_spark.cachereg import clear_operator_caches

    results: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names
    }
    for r in range(reps):
        for name in names:
            for arm in ("A", "B"):
                from pyconnect_spark.operators import _util

                _util._AB_DISABLE_SPREAD = arm == "A"
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}{r}")
                t0 = time.perf_counter()
                builders[name](spark, SF).count()
                results[name][arm].append(round(time.perf_counter() - t0, 3))
                clear_operator_caches()
        print(f"-- round {r} done", flush=True)
    for name in names:
        a, b = results[name]["A"], results[name]["B"]
        print(
            f"{name}: A(min={min(a)}, med={statistics.median(a):.2f}) "
            f"B(min={min(b)}, med={statistics.median(b):.2f})  A={a} B={b}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
