"""Interleaved A/B timing for optimization toggles.

Runs each named query alternately with a change disabled (A = before) and
enabled (B = after), several interleaved rounds, in ONE session — host
steal drifts over tens of seconds, so interleaving cancels it where
back-to-back reps cannot. Prints per-query min/median for both arms.

The toggle is a module-level ``_AB_DISABLE_*`` attribute set HERE, not an
env var the production paths would read (round-11 advice: a stale env var
in a driver environment would silently change production job structure).
Default toggle is the spread() parallelism floor; pass ``--attr
pyconnect_spark.operators.<mod>:<attr>`` to A/B a different change.

Usage: python tools/abtime.py [--reps N] [--attr mod:attr] name [name ...]
"""
from __future__ import annotations

import importlib
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
    attr_spec = "pyconnect_spark.operators._util:_AB_DISABLE_SPREAD"
    if "--attr" in args:
        i = args.index("--attr")
        attr_spec = args[i + 1]
        del args[i : i + 2]
    mod_name, attr = attr_spec.split(":")
    mod = importlib.import_module(mod_name)
    if not hasattr(mod, attr):
        raise SystemExit(f"{mod_name} has no attribute {attr}")
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
                setattr(mod, attr, arm == "A")
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}{r}")
                t0 = time.perf_counter()
                builders[name](spark, SF).count()
                results[name][arm].append(round(time.perf_counter() - t0, 3))
                clear_operator_caches()
        print(f"-- round {r} done", flush=True)
    setattr(mod, attr, False)
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
