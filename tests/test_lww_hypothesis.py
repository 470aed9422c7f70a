"""Property-based tests (hypothesis) for the LWW merge semantics.

Randomized keyed snapshots, fixed seed corpus via hypothesis: the
invariants must hold for ANY pair of snapshots, not just the fixture:

- key coverage: merged keys == union of input keys
- dominance: per key the winner's version is the max version present
- idempotence: merging the result with either input changes nothing
"""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_elasticsearch_sync_spark.sync.ops import lww_merge

_BASE = dt.datetime(2020, 1, 1)

row = st.tuples(
    st.integers(min_value=0, max_value=8),               # key (forced collisions)
    st.floats(min_value=0, max_value=100, allow_nan=False, width=32),
    st.integers(min_value=0, max_value=5),               # version offset days
)

snapshot = st.lists(row, min_size=0, max_size=8).map(
    # one row per key: keep the lexicographically-largest tuple
    lambda rows: list({k: (k, float(v), _BASE + dt.timedelta(days=d))
                       for k, v, d in sorted(rows)}.values())
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(a_rows=snapshot, b_rows=snapshot)
def test_lww_invariants(spark, a_rows, b_rows):
    schema = "key bigint, price double, version timestamp"
    a = spark.createDataFrame(a_rows, schema) if a_rows else spark.createDataFrame([], schema)
    b = spark.createDataFrame(b_rows, schema) if b_rows else spark.createDataFrame([], schema)

    merged = lww_merge(a, b).collect()
    merged_keys = {r["key"] for r in merged}
    assert merged_keys == {r[0] for r in a_rows} | {r[0] for r in b_rows}

    best = {}
    for k, _v, ver in [(r[0], r[1], r[2]) for r in a_rows + b_rows]:
        best[k] = max(best.get(k, ver), ver)
    for r in merged:
        assert r["version"] == best[r["key"]], r

    # Idempotence: re-merging the result with b is a no-op.
    again = lww_merge(
        spark.createDataFrame([(r["key"], r["price"], r["version"], r["side"])
                               for r in merged],
                              schema + ", side string"),
        b,
    ).collect()
    assert sorted((r["key"], r["price"], r["version"]) for r in again) == \
           sorted((r["key"], r["price"], r["version"]) for r in merged)
