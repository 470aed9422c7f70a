#!/usr/bin/env python3
"""Registry-wide physical-plan audit (round-12 optimization evidence).

For EVERY registry query, build the DataFrame against a small SF and
summarize the physical plan's scale-relevant shape:

- number of Exchange nodes (shuffles) and BroadcastExchange nodes
- join strategies present (BHJ / SMJ / SHJ / BNLJ / Cartesian)
- Python-boundary nodes (BatchEvalPython / ArrowEvalPython /
  MapInPandas / MapInArrow / FlatMapGroupsInPandas)
- aggregate strategy (HashAggregate / ObjectHashAggregate /
  SortAggregate)
- top-k shape (TakeOrderedAndProject) and global sorts
- scan count

Output: one TSV line per query to stdout (sorted by name), plus a
summary histogram to stderr.  The audit is DETERMINISTIC (plans, not
timings), so it is comparable across boxes and commits - the round-12
optimization checklist in OPTIMIZATION_r12.md is generated from it.

Usage: python tools/plan_audit.py [sf_dir] [> plans/r12/plan_audit.tsv]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = [
    ("exchanges", "Exchange"),            # includes BroadcastExchange; split below
    ("broadcasts", "BroadcastExchange"),
    ("bhj", "BroadcastHashJoin"),
    ("smj", "SortMergeJoin"),
    ("shj", "ShuffledHashJoin"),
    ("bnlj", "BroadcastNestedLoopJoin"),
    ("cartesian", "CartesianProduct"),
    ("batch_py", "BatchEvalPython"),
    ("arrow_py", "ArrowEvalPython"),
    ("map_pandas", "MapInPandas"),
    ("map_arrow", "MapInArrow"),
    ("grouped_pandas", "FlatMapGroupsInPandas"),
    ("hash_agg", "HashAggregate"),
    ("obj_hash_agg", "ObjectHashAggregate"),
    ("sort_agg", "SortAggregate"),
    ("topk", "TakeOrderedAndProject"),
    ("window", "Window"),
    ("scans", "Scan parquet"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # Vanilla-ish local session; plans don't depend on core count.
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .appName("plan-audit")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from cassandra_elasticsearch_sync_spark.registry import all_specs

    cols = [k for k, _ in NODES]
    print("query\t" + "\t".join(cols) + "\tnote")
    hist: Counter = Counter()
    n_ok = n_err = 0
    for name, spec in sorted(all_specs().items()):
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming/stateful entries need a sink
            print(f"{name}\t" + "\t".join("-" for _ in cols)
                  + f"\tUNPLANNABLE: {type(e).__name__}")
            n_err += 1
            continue
        counts = {k: plan.count(pat) for k, pat in NODES}
        # "Exchange" matches BroadcastExchange too; report data shuffles.
        counts["exchanges"] -= counts["broadcasts"]
        # SortAggregate's toString contains no "HashAggregate"; but
        # ObjectHashAggregate contains "HashAggregate" - correct it.
        counts["hash_agg"] -= counts["obj_hash_agg"]
        note = ""
        if counts["cartesian"]:
            note = "CARTESIAN"
        elif counts["batch_py"]:
            note = "row-at-a-time python"
        print(f"{name}\t" + "\t".join(str(counts[k]) for k in cols)
              + f"\t{note}")
        hist[f"shuffles={counts['exchanges']}"] += 1
        for k in ("smj", "bnlj", "batch_py", "sort_agg", "cartesian"):
            if counts[k]:
                hist[k] += 1
        n_ok += 1
    print(f"# audited={n_ok} unplannable={n_err}", file=sys.stderr)
    for k, v in sorted(hist.items()):
        print(f"# {k}: {v}", file=sys.stderr)


if __name__ == "__main__":
    main()
