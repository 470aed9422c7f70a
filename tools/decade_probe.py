#!/usr/bin/env python3
"""Decade probe: time registry keys at sf0.01 and sf0.1 (10x facts)
and report the growth factor - the per-round scale check (BENCH_NOTES
tables). Usage: python tools/decade_probe.py key1 key2 ...

Each key runs once per SF on a quiet machine (min-of-1 by design: the
probe hunts order-of-growth, not milliseconds). Queries materialize
via count() to avoid collect()-size effects."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

from cassandra_elasticsearch_sync_spark import registry  # noqa: E402

keys = sys.argv[1:]
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
specs = registry.all_specs()

print(f"| Query | sf0.01 | sf0.1 | growth |")
print(f"| --- | --- | --- | --- |")
for k in keys:
    ts = []
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        t0 = time.time()
        specs[k].fn(spark, sf).count()
        ts.append(time.time() - t0)
    print(f"| {k} | {ts[0]:.2f} s | {ts[1]:.2f} s | "
          f"**{ts[1] / ts[0]:.1f}x** |", flush=True)
