"""Per-query job/stage profile via the status tracker.

For each named query: run builder+count once (warm session), then report
how many Spark jobs it launched, how many stages, total task time vs wall
time, and the slowest stages. Distinguishes "many serial tiny jobs /
scheduling-bound" from "one big compute stage" — the decision the
optimization guide's §1 empirical loop needs.

Usage: python tools/jprof.py name [name ...]
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
    names = sys.argv[1:]
    spark = get_spark("jprof", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sc = spark.sparkContext
    builders = ALL.builders()
    builders["b01_filter_project"](spark, SF).count()  # warm-up
    from pyconnect_spark.cachereg import clear_operator_caches

    tracker = sc.statusTracker()
    for name in names:
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(f"jprof-{name}", name)
        t0 = time.perf_counter()
        builders[name](spark, SF).count()
        wall = time.perf_counter() - t0
        jobs = tracker.getJobIdsForGroup(f"jprof-{name}") or []
        stage_ids: set[int] = set()
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji:
                stage_ids.update(ji.stageIds)
        stages = []
        for s in stage_ids:
            si = tracker.getStageInfo(s)
            if si and si.numCompletedTasks > 0:
                stages.append((si.numTasks, s))
        sc.setJobGroup(None, None)
        print(
            f"{name}: wall={wall:.2f}s jobs={len(jobs)} "
            f"stages={len(stages)} tasks={sum(n for n, _ in stages)}",
            flush=True,
        )
        clear_operator_caches()
    spark.stop()


if __name__ == "__main__":
    main()
