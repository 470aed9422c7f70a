#!/usr/bin/env python3
"""Benchmark the headline queries. Prints ONE JSON line:

{"metric": "headline_suite_seconds", "value": N, "unit": "sec",
 "queries": {...per-query seconds...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Methodology: one shared SparkSession (BASELINE.md: JVM startup dwarfs
data time at these SFs); each query is forced end-to-end with the
noop sink (full computation, no collect/serialize cost); value = sum
of per-query wall seconds, session startup excluded.
"""

from __future__ import annotations

import json
import os
import time

from cassandra_elasticsearch_sync_spark.registry import queries
from cassandra_elasticsearch_sync_spark.session import get_spark

HEADLINE = [
    "flagship_pricing_summary",   # Q1: scan + 6-group agg
    "q3_shipping_priority",       # 3-way join + top-k
    "q5_local_supplier_volume",   # 6-way star join
    "q6_forecast_revenue",        # pushdown scan
    "d10_pivot",                  # events pivot
    "e4_topk_per_group",          # window top-k
    "c8_asof_join",               # as-of join (union+window)
    "l3_lww_merge",               # sync LWW merge
    "l1_snapshot_diff",           # sync full-outer diff
    "k1_exact_dedup",             # hash dedup
    "k2_minhash_lsh_pairs",       # MinHash-LSH near-dup
    "k3_cosine_topk",             # embedding top-k
    "k4_tfidf",                   # text stats
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    # Warm the JVM/code paths once on the smallest SF so per-query times
    # measure data processing, not first-call codegen/planning warmup.
    qs["flagship_pricing_summary"](spark, "/root/testdata/sf0.001").count()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        # min of two runs: the first run includes codegen/plan compile,
        # the second is the steady state a resident service would see.
        times = []
        for _ in range(2):
            df = qs[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(min(times), 4)

    total = round(sum(per_query.values()), 4)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
