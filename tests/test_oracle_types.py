"""Oracle output-type guard (VERDICT r5 item #1).

Every driver-red row across rounds 1-5 was exactly a sampled oracle
whose output carried an un-cast DuckDB HUGEINT (SUM over integer
types), which the driver's type-sensitive hasher materializes as
decimal128/float64 while Spark returns BIGINT. The class is killed in
two layers:

1. ``oracle_harness.compare`` (used by test_oracle_parity over all
   oracle-backed queries, and by tools/parity_sweep.py) now enforces a
   strict per-column declared-type pairing - so the registry-wide
   guard runs on every parity pass.
2. This module meta-tests the detector itself (an undetectable guard
   is vacuous - the same discipline as the r3 window-detector
   meta-test): synthetic HUGEINT / DECIMAL-vs-DOUBLE / JSON oracles
   must be flagged even when every VALUE compares equal, and the three
   r5 driver-red oracles must now DESCRIBE to driver-safe types.
"""

from __future__ import annotations

import duckdb
import pytest

from cassandra_elasticsearch_sync_spark.registry import all_specs
from tests.oracle_harness import (
    compare,
    duck_connection,
    duck_to_spark_type,
    type_mismatches,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_detector_fires_on_hugeint(spark, duck):
    """The exact r5 red shape: SUM(BIGINT) -> HUGEINT, values equal."""
    sdf = spark.sql("SELECT CAST(7519554 AS BIGINT) AS s")
    oracle = "SELECT SUM(x) AS s FROM (SELECT CAST(7519554 AS BIGINT) AS x)"
    assert duck.execute(f"DESCRIBE {oracle}").fetchall()[0][1] == "HUGEINT"
    probs = type_mismatches(sdf, duck, oracle)
    assert probs and "HUGEINT" in probs[0]
    # and compare() itself must fail even though every value matches
    res = compare("synthetic_hugeint", sdf, duck, oracle)
    assert not res.ok


def test_detector_fires_on_decimal_vs_double(spark, duck):
    sdf = spark.sql("SELECT CAST(56.25 AS DOUBLE) AS mean_b")
    oracle = "SELECT 56.25 AS mean_b"
    probs = type_mismatches(sdf, duck, oracle)
    assert probs and "decimal(4,2)" in probs[0]


def test_detector_fires_on_integer_vs_bigint(spark, duck):
    sdf = spark.sql("SELECT CAST(5 AS BIGINT) AS n")
    oracle = "SELECT CAST(5 AS INTEGER) AS n"
    probs = type_mismatches(sdf, duck, oracle)
    assert probs and "INTEGER" in probs[0]


def test_detector_passes_on_exact_pairing(spark, duck):
    sdf = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS a, CAST(1.5 AS DOUBLE) AS b, 'x' AS c, "
        "CAST(1.23 AS DECIMAL(38,2)) AS d, DATE'2024-01-01' AS e"
    )
    oracle = ("SELECT CAST(1 AS BIGINT) AS a, CAST(1.5 AS DOUBLE) AS b, "
              "'x' AS c, CAST(1.23 AS DECIMAL(38,2)) AS d, "
              "DATE '2024-01-01' AS e")
    assert type_mismatches(sdf, duck, oracle) == []


def test_unmappable_types_have_no_twin():
    for t in ("HUGEINT", "UHUGEINT", "UINTEGER", "JSON", "UUID"):
        assert duck_to_spark_type(t) is None
    assert duck_to_spark_type("DECIMAL(38,2)") == "decimal(38,2)"
    assert duck_to_spark_type("VARCHAR[]") == "array<string>"
    assert duck_to_spark_type("TIMESTAMP") == "timestamp_ntz"


R5_REDS = {
    "k7o_cusum_changepoint": "max_dev_scaled",
    "k_mann_whitney_u": "n1",
    "k6s_ima_adpcm_decode": "sum_pcm",
}


@pytest.mark.parametrize("name,col", sorted(R5_REDS.items()))
def test_r5_red_oracles_now_bigint(name, col):
    """The three r5 driver-red oracles DESCRIBE to BIGINT post-fix."""
    spec = all_specs()[name]
    con = duck_connection(SF_DIR)
    try:
        types = {c: t for c, t, *_ in
                 con.execute(f"DESCRIBE {spec.oracle}").fetchall()}
    finally:
        con.close()
    assert types[col] == "BIGINT", types
