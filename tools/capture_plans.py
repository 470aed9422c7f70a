#!/usr/bin/env python3
"""Capture .explain("formatted") for the bench headliners into
plans/<dir>/<query>_<tag>.txt (the round-12 before/after evidence).

Usage: python tools/capture_plans.py <tag> [out_dir] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r12"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    import bench
    from cassandra_elasticsearch_sync_spark.registry import queries
    from cassandra_elasticsearch_sync_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in bench.HEADLINE:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok", flush=True)


if __name__ == "__main__":
    main()
