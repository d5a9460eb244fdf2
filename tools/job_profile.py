"""Job/stage profiler: run registry queries with the bench methodology
(noop sink, release_cached between queries) and report how many Spark
jobs, stages and tasks each one launches, via the statusTracker.

At tiny SFs (sf0.001) data work is nil, so job/stage counts isolate
plan/driver overhead — the r13 finding that heavy queries run 13-38
jobs each is what moved optimization from "shuffle fewer bytes" to
"execute fewer exchanges/jobs/duplicate subplans" (guide §1.2/§2.4).

Usage: python tools/job_profile.py [--sf DIR] name [name...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    args = ap.parse_args()

    from nhl_data_warehouse_spark.session import get_spark, release_cached
    from nhl_data_warehouse_spark.suite import REGISTRY

    spark = get_spark(app_name="job_profile")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def job_ids() -> set[int]:
        return set(tracker.getJobIdsForGroup(None) or [])

    for name in args.names:
        spec = REGISTRY[name]
        before = job_ids()
        sc.setJobDescription(name)
        t0 = time.time()
        df = spec.fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        new_jobs = sorted(job_ids() - before)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(
            json.dumps(
                {
                    "query": name,
                    "sec": dt,
                    "jobs": len(new_jobs),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
            ),
            flush=True,
        )
        release_cached(spark)
        del df
        gc.collect()


if __name__ == "__main__":
    main()
