#!/usr/bin/env python3
"""Driver-twin parity sweep over the FULL registry on a vanilla session.

Mirrors the driver's correctness gate exactly: a default
``SparkSession.builder.master('local[8]').getOrCreate()`` (no engine
confs), every oracle-backed query compared against its DuckDB twin at
sf0.01 via tests/oracle_harness.compare. Rows-only queries are executed
and row-counted (the driver's weaker check). Appends nothing; writes
the log to stdout — redirect into PARITY_LOG_r{N}.txt.

Usage: python tools/parity_sweep.py [sf_dir] [--limit N] [--pandas]

``--limit N`` restricts the sweep to the first N registry keys in
driver order — the exact shape of the driver's sampled run (one shared
vanilla session, driver order, N queries), for driver-twin bisection.

``--pandas`` compares through ``oracle_harness.pandas_compare`` — the
DRIVER-FAITHFUL path (toPandas / .df(), factorize-backed sort, pandas'
own row hash) instead of the str(v) normalizer. This is the mode that
catches unhashable array cells and object-Decimal/float64 splits
(VERDICT r9's two driver errs were invisible to the str(v) path);
run it before any round where the front-50 rotates.
"""

from __future__ import annotations

import sys
import time

argv = [a for a in sys.argv[1:]]
limit = None
if "--limit" in argv:
    i = argv.index("--limit")
    limit = int(argv[i + 1])
    del argv[i:i + 2]
# --cluster: the CLUSTER-POSTURE sweep (VERDICT r5 #5) - same vanilla
# driver shape, but with the session.py cluster defaults pinned
# explicitly (200 shuffle partitions, AQE + skew-join + coalesce on),
# proving the registry's hash stability is knob-independent: no query
# result may depend on partition count or runtime re-planning.
cluster = "--cluster" in argv
if cluster:
    argv.remove("--cluster")
pandas_mode = "--pandas" in argv
if pandas_mode:
    argv.remove("--pandas")
# --heap SIZE / --cores N: resource sizing for big-SF sweeps (sf0.1
# holds ~460 queries' localCheckpoint blocks in ONE JVM - the vanilla
# 1g driver heap OOMs around query ~120; r7 run). Memory and core
# count are not semantics knobs - result hashes are independent of
# both (the cluster-posture sweep proves partition independence), so
# sizing the JVM for the workload keeps the sweep honest.
heap = None
if "--heap" in argv:
    i = argv.index("--heap")
    heap = argv[i + 1]
    del argv[i:i + 2]
cores = 8
if "--cores" in argv:
    i = argv.index("--cores")
    cores = int(argv[i + 1])
    del argv[i:i + 2]
sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from pyspark.sql import SparkSession  # noqa: E402

from oracle_harness import compare, duck_connection, pandas_compare  # noqa: E402
from cassandra_elasticsearch_sync_spark import registry  # noqa: E402

builder = SparkSession.builder.master(f"local[{cores}]")
if heap:
    builder = builder.config("spark.driver.memory", heap)
if cluster:
    builder = (
        builder.config("spark.sql.shuffle.partitions", "200")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
    )
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
con = duck_connection(sf_dir)

specs = registry.all_specs()
if limit is not None:
    specs = dict(list(specs.items())[:limit])
t0 = time.time()
n_ok = n_fail = n_rows_only = 0
fails: list[str] = []


def _is_streaming(name: str, spec) -> bool:
    """Streaming-backed keys: the I tier plus the streaming-shaped
    sync/ACID round trips. These hold micro-batch queries whose
    awaitTermination deadlines are wall-clock - under machine
    contention (3 JVMs sharing the box, r7/r8 incidents) they can
    time out spuriously, so the sweep runs them in a DEDICATED final
    phase (fewer concurrent JVM threads fighting for the scheduler)
    with one contention-aware retry (VERDICT r8 #7)."""
    return spec.survey_id.startswith("I") or name.startswith(("i", "l36"))


def _run_one(name, spec, attempt=1):
    global n_ok, n_fail, n_rows_only
    try:
        df = spec.fn(spark, sf_dir)
        if spec.oracle is None:
            n = df.count()
            print(f"{name}: ROWS-ONLY ({n} rows)", flush=True)
            n_rows_only += 1
            return
        cmp_fn = pandas_compare if pandas_mode else compare
        res = cmp_fn(name, df, con, spec.oracle)
        print(res, flush=True)
        if res.ok:
            n_ok += 1
        else:
            n_fail += 1
            fails.append(name)
    except Exception as e:  # noqa: BLE001 - sweep must finish
        msg = f"{type(e).__name__}: {e}"
        if (attempt == 1 and _is_streaming(name, spec)
                and "imeout" in msg):
            # spurious wall-clock timeout under contention: one retry
            # after a settle pause, logged either way
            print(f"{name}: TIMEOUT (attempt 1) - retrying once: "
                  f"{msg[:200]}", flush=True)
            time.sleep(10)
            _run_one(name, spec, attempt=2)
            return
        print(f"{name}: ERROR {msg}", flush=True)
        n_fail += 1
        fails.append(name)


batch_specs = {n: s for n, s in specs.items() if not _is_streaming(n, s)}
stream_specs = {n: s for n, s in specs.items() if _is_streaming(n, s)}
for name, spec in batch_specs.items():
    _run_one(name, spec)
if stream_specs:
    print(f"\n-- streaming phase ({len(stream_specs)} keys, serialized "
          "last per VERDICT r8 #7) --", flush=True)
for name, spec in stream_specs.items():
    _run_one(name, spec)

print(f"\n== SWEEP {n_ok} OK / {n_fail} FAIL / {n_rows_only} rows-only "
      f"of {len(specs)} at {sf_dir} in {time.time() - t0:.0f}s ==")
if fails:
    print("FAILED:", ", ".join(fails))
    sys.exit(1)
