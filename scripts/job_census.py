#!/usr/bin/env python
"""Per-key Spark scheduler-job census — the host-independent perf metric.

Wall-clock on this host class is steal-contaminated (round 13: adjacent
reps of identical code at 2.9 s vs 87 s); the number of scheduler JOBS a
key launches is deterministic modulo AQE and is what actually bounds
job-count-bound keys (~0.3-0.5 s fixed floor per job here).  This script
materializes each requested key through the noop sink inside its own job
group and reports ``len(statusTracker.getJobIdsForGroup(group))``.

Usage: python scripts/job_census.py [key,key,...|all] [sf_dir]
Prints one ``key jobs wall_s`` line per key plus a JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from task_mapreduce_spark.session import get_spark  # noqa: E402
from task_mapreduce_spark.registry import QUERIES  # noqa: E402


def main() -> int:
    keys = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sorted(QUERIES) if keys == "all" else keys.split(",")
    spark = get_spark("tmrs-census")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm-up: JVM/session startup must not be charged to the first key
    QUERIES["tpch_q1"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    out: dict[str, dict] = {}
    for key in names:
        sc.setJobGroup(key, key)
        t0 = time.time()
        QUERIES[key](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        wall = round(time.time() - t0, 2)
        sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = len(sc.statusTracker().getJobIdsForGroup(key))
        out[key] = {"jobs": jobs, "wall": wall}
        print(f"{key} jobs={jobs} wall={wall}", flush=True)
    print("CENSUS " + json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
