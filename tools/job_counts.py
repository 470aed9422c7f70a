#!/usr/bin/env python3
"""Deterministic per-query cost metrics: Spark JOB and STAGE counts.

Wall-clock on a credit-throttled box swings 2-3x run to run; job and
stage counts are exact and comparable across commits, so the round-12
optimization evidence leads with them (guide section 1: measure first,
with a metric that cannot lie).

For each named query (default: the bench HEADLINE + WRITE_PATH lists)
this runs the query once end-to-end in a fresh bench-config session and
records how many jobs/stages/tasks it scheduled via the status tracker.

Usage: python tools/job_counts.py [sf_dir] [query ...]
Output: TSV  query  jobs  stages  tasks  wall_s
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]

    from cassandra_elasticsearch_sync_spark.registry import queries
    from cassandra_elasticsearch_sync_spark.session import get_spark

    if not names:
        import bench
        names = bench.HEADLINE + bench.WRITE_PATH

    spark = get_spark(app_name="job-counts")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = queries()

    # Warm code paths once so first-query JIT doesn't pollute wall_s.
    qs["flagship_pricing_summary"](spark, "/root/testdata/sf0.001").count()

    print("query\tjobs\tstages\ttasks\twall_s")
    for name in names:
        jsc = sc._jsc.sc().statusTracker()
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        # jobs/stages are monotonically increasing ids; snapshot via
        # the JVM tracker (covers all groups).
        j0 = max([-1] + list(before_jobs))
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        ids = [i for i in (tracker.getJobIdsForGroup(name) or [])]
        n_stages = n_tasks = 0
        for i in ids:
            info = jsc.getJobInfo(i)
            if info.isDefined():
                sids = info.get().stageIds()
                n_stages += len(sids)
                for s in sids:
                    sinfo = jsc.getStageInfo(s)
                    if sinfo.isDefined():
                        n_tasks += sinfo.get().numTasks()
        print(f"{name}\t{len(ids)}\t{n_stages}\t{n_tasks}\t{wall:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
