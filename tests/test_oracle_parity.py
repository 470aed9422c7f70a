"""The big one: every oracle-declared query must hash-match DuckDB.

This mirrors the driver's sf0.01 correctness gate, run at sf0.001 for
speed (set PARITY_SF_DIR=/root/testdata/sf0.01 for the full-size run).
"""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


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


def test_harness_detects_mismatches(spark):
    """Meta-test: the comparison harness must actually catch value,
    count, and column differences (guards against a vacuous gate)."""
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(SF_DIR)
    df = SPECS["d3_count_distinct"].fn(spark, SF_DIR)
    wrong_value = "SELECT event_type, COUNT(DISTINCT user_id) + 1 AS n_users, COUNT(*) AS n_events FROM events GROUP BY event_type"
    assert not compare("wrong_value", df, con, wrong_value).ok
    wrong_rows = "SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events FROM events GROUP BY event_type LIMIT 2"
    assert not compare("wrong_rows", df, con, wrong_rows).ok
    wrong_cols = "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type"
    assert not compare("wrong_cols", df, con, wrong_cols).ok
    con.close()


def test_coverage_doc_matches_registry():
    """COVERAGE.md's generated table must list exactly the registered
    query names (guards against doc drift)."""
    import re

    text = open("COVERAGE.md").read()
    table_part = text.split("## Rows covered by library functions")[0]
    documented = set(re.findall(r"\| [A-Z0-9+]+ \| `([a-z0-9_]+)` \|", table_part))
    registered = set(all_specs())
    assert documented == registered, (
        sorted(registered - documented), sorted(documented - registered))
