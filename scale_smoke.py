#!/usr/bin/env python3
"""Scale smoke: replicate sf0.1 10x into /tmp (~sf1: 6M-row lineitem,
50k docs with heavy dup families) and time the headline operators.
Evidence for the README's scaling claims; not part of the driver gate.

Usage: python scale_smoke.py
"""

from __future__ import annotations

import os
import shutil
import time

import pyspark.sql.functions as F

from cassandra_elasticsearch_sync_spark.registry import all_specs
from cassandra_elasticsearch_sync_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = "/tmp/ces_scale_smoke"
PICKS = ("flagship_pricing_summary", "q5_local_supplier_volume", "l3_lww_merge",
         "k1_exact_dedup", "k2_minhash_lsh_pairs", "k3_cosine_topk",
         "e9_decile_by_segment", "k7e_cumulative_users", "c7b_interval_overlap_join")


def main() -> None:
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(BIG, ignore_errors=True)
    os.makedirs(BIG)
    small = ("region", "nation", "customer", "supplier", "part", "embeddings")
    for t in small:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.parquet(f"{BIG}/{t}.parquet")
    for t in ("lineitem", "orders", "events"):
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        out = df
        for _ in range(9):
            out = out.union(df)
        out.write.parquet(f"{BIG}/{t}.parquet")
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    out = d
    for i in range(1, 10):
        out = out.union(d.withColumn("doc_id", F.col("doc_id") + 100000 * i))
    out.write.parquet(f"{BIG}/documents.parquet")

    specs = all_specs()
    for name in PICKS:
        t0 = time.perf_counter()
        specs[name].fn(spark, BIG).write.mode("overwrite").format("noop").save()
        print(f"{name}: {time.perf_counter() - t0:.1f}s at ~10x {BASE}")
    shutil.rmtree(BIG, ignore_errors=True)


if __name__ == "__main__":
    main()
