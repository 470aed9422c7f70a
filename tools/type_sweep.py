"""Sweep every oracle: compare DuckDB declared output types vs Spark schema.

The driver's hasher materializes the oracle result type-sensitively
(HUGEINT -> float64/decimal128 via Arrow), so any oracle output column
whose DuckDB type doesn't map exactly onto the Spark column type is a
latent driver-red. The mapping and per-query check live in
tests/oracle_harness.py (duck_to_spark_type / type_mismatches), which
compare() now enforces on every parity run; this tool is the
standalone registry-wide report.

Usage: python tools/type_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from cassandra_elasticsearch_sync_spark.registry import all_specs
from cassandra_elasticsearch_sync_spark.session import get_spark
from oracle_harness import duck_connection, type_mismatches


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    con = duck_connection(sf_dir)
    bad = 0
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: spark build failed: {e}")
            bad += 1
            continue
        try:
            probs = type_mismatches(sdf, con, spec.oracle)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DESCRIBE failed: {e}")
            bad += 1
            continue
        for p in probs:
            print(f"{name}: {p}")
        bad += len(probs)
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} divergent output columns")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
