#!/usr/bin/env python3
"""Interleaved prepared-plan A/B in ONE session (round 13, guide §1):
two DataFrame builders run alternating min-of-1 rounds, so box noise
hits both variants equally. Reports per-round times and min/median.

Edit VARIANTS below or import and call ab().
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")


def ab(spark, builders: dict, sf_dir: str, rounds: int = 9) -> dict:
    prepared = {}
    for name, fn in builders.items():
        df = fn(spark, sf_dir)
        rdd = df._jdf.queryExecution().toRdd()
        rdd.count()  # prime codegen + plan
        prepared[name] = rdd
    times = {name: [] for name in builders}
    for _ in range(rounds):
        for name, rdd in prepared.items():
            t0 = time.perf_counter()
            rdd.count()
            times[name].append(time.perf_counter() - t0)
    out = {}
    for name, ts in times.items():
        out[name] = {"min": round(min(ts), 4),
                     "median": round(statistics.median(ts), 4),
                     "all": [round(t, 4) for t in ts]}
    return out
