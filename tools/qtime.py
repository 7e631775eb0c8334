"""Time individual queries in isolation, bench-methodology-compatible.

Usage: python tools/qtime.py name [name ...]        (min-of-2, builder+count)
       python tools/qtime.py --noop name [...]      (noop sink instead of count)
       python tools/qtime.py --reps N name [...]

Prints one line per query: name, per-rep seconds, min.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyconnect_spark.registry import ALL
from pyconnect_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    spark = get_spark("qtime", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builders = ALL.builders()
    builders["b01_filter_project"](spark, SF).count()  # warm-up
    from pyconnect_spark.cachereg import clear_operator_caches

    for name in names:
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            df = builders[name](spark, SF)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.perf_counter() - t0, 3))
            clear_operator_caches()
        print(f"{name}: {times} min={min(times)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
