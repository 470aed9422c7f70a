"""The big one: every oracle-declared query must hash-match DuckDB.

This mirrors the driver's sf0.01 correctness gate, run at sf0.001 for
speed (set PARITY_SF_DIR=/root/testdata/sf0.01 for the full-size run).
"""

from __future__ import annotations

import os

import pytest

from cassandra_elasticsearch_sync_spark.registry import all_specs
from tests.oracle_harness import compare, duck_connection

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

SPECS = {k: v for k, v in all_specs().items() if v.oracle is not None}


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_parity(spark, duck, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    res = compare(name, df, duck, spec.oracle)
    assert res.ok, str(res)


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must execute and return a schema."""
    for name, spec in all_specs().items():
        if spec.oracle is None:
            df = spec.fn(spark, SF_DIR)
            assert df.columns, name
            assert df.count() >= 0, name
