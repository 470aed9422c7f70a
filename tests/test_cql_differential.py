"""Differential test for the CQL SELECT compiler: random VALID
statements over the orders table must return the same rows through the
Spark compiler (sources/cql_query.cql_select) and through an
independent SQL rendering of CQL's semantics in DuckDB (including the
token-order LIMIT and the clustering-ordered PER PARTITION LIMIT)."""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.sources.cql_query import cql_select

SF_DIR = "/root/testdata/sf0.001"

_TOKEN = ("CAST(('0x' || SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 1, 15)) "
          "AS BIGINT)")

stmt_strategy = st.tuples(
    st.one_of(st.none(), st.integers(1, 150)),       # pk equality
    st.one_of(st.none(),                             # clustering range
              st.sampled_from([">=", "<"]).flatmap(
                  lambda op: st.sampled_from(
                      ["1993-01-01 00:00:00", "1996-06-01 00:00:00"]
                  ).map(lambda d: (op, d)))),
    st.one_of(st.none(), st.integers(100000, 400000)),  # price AF filter
    st.one_of(st.none(), st.integers(1, 3)),         # per partition limit
    st.one_of(st.none(), st.integers(5, 40)),        # limit
)


def _build(pk, crange, price, pplimit, limit):
    where, allow = [], False
    if pk is not None:
        where.append(f"o_custkey = {pk}")
    if crange is not None:
        if pk is None:
            allow = True            # clustering without pk needs AF
        op, d = crange
        where.append(f"o_orderdate {op} '{d}'")
    if price is not None:
        allow = True
        where.append(f"o_totalprice > {price}")
    cql = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    if where:
        cql += " WHERE " + " AND ".join(where)
    if pplimit is not None:
        cql += f" PER PARTITION LIMIT {pplimit}"
    if limit is not None:
        cql += f" LIMIT {limit}"
    if allow:
        cql += " ALLOW FILTERING"
    return cql


def _sql(pk, crange, price, pplimit, limit):
    conds = ["TRUE"]
    if pk is not None:
        conds.append(f"o_custkey = {pk}")
    if crange is not None:
        op, d = crange
        conds.append(f"o_orderdate {op} TIMESTAMP '{d}'")
    if price is not None:
        conds.append(f"o_totalprice > {price}")
    sql = f"SELECT * FROM orders WHERE {' AND '.join(conds)}"
    if pplimit is not None:
        sql = f"""SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey) AS __rn
            FROM ({sql})) WHERE __rn <= {pplimit}"""
    if limit is not None:
        sql = f"""SELECT * FROM ({sql})
            ORDER BY {_TOKEN}, o_orderdate DESC, o_orderkey
            LIMIT {limit}"""
    return f"SELECT o_orderkey, o_custkey, o_totalprice FROM ({sql})"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    yield con
    con.close()


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(params=stmt_strategy)
def test_cql_matches_independent_sql(spark, duck, params):
    o = load_table(spark, SF_DIR, "orders")
    cql = _build(*params)
    got = sorted(tuple(r) for r in cql_select(o, cql).collect())
    want = sorted(tuple(r) for r in duck.sql(_sql(*params)).fetchall())
    assert got == want, (cql, len(got), len(want))


# --- GROUP BY restriction rules (VERDICT r4 #8) ------------------------

_GB_LEGAL = (
    ["o_custkey"],
    ["o_custkey", "o_orderdate"],
    ["o_custkey", "o_orderdate", "o_orderkey"],
)
# Each illegal case breaks the pk-plus-clustering-prefix rule a
# different way: clustering without pk, skipping a clustering column,
# wrong order, and non-primary-key columns.
_GB_ILLEGAL = (
    ["o_orderdate"],
    ["o_orderkey"],
    ["o_custkey", "o_orderkey"],
    ["o_orderdate", "o_custkey"],
    ["o_totalprice"],
    ["o_custkey", "o_totalprice"],
)

gb_strategy = st.tuples(
    st.booleans(),                                    # legal or illegal
    st.integers(0, 5),                                # which case
    st.sampled_from(["count(*)", "max(o_totalprice)", "min(o_totalprice)"]),
    st.one_of(st.none(), st.integers(1, 150)),        # optional pk filter
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(params=gb_strategy)
def test_cql_group_by_differential(spark, duck, params):
    """Random GROUP BY statements: legal pk-plus-clustering-prefix
    groupings must match an independent DuckDB rendering value for
    value; every way of breaking the rule must raise CqlError - the
    same differential shape as the restriction-rule tests above."""
    from cassandra_elasticsearch_sync_spark.sources.cql_query import CqlError

    legal, idx, agg, pk = params
    groups = (_GB_LEGAL[idx % len(_GB_LEGAL)] if legal
              else list(_GB_ILLEGAL[idx % len(_GB_ILLEGAL)]))
    where = f" WHERE o_custkey = {pk}" if pk is not None else ""
    cql = (f"SELECT {', '.join(groups)}, {agg} FROM orders{where} "
           f"GROUP BY {', '.join(groups)}")
    o = load_table(spark, SF_DIR, "orders")
    if not legal:
        with pytest.raises(CqlError, match="GROUP BY"):
            cql_select(o, cql)
        return
    cond = f"o_custkey = {pk}" if pk is not None else "TRUE"
    want = sorted(tuple(r) for r in duck.sql(
        f"SELECT {', '.join(groups)}, {agg} FROM orders "
        f"WHERE {cond} GROUP BY {', '.join(groups)}").fetchall())
    got = sorted(tuple(r) for r in cql_select(o, cql).collect())
    assert got == want, (cql, len(got), len(want))


def test_cql_writetime_ttl_selector_rules(spark):
    """Cassandra's writetime()/ttl() selector rules: never on a
    PRIMARY KEY part, never on a collection, no mixing with GROUP
    BY/aggregates, ttl() needs an explicit read instant, and both
    need a writetime-tracked table."""
    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        CqlError, cql_select,
    )

    o = load_table(spark, SF_DIR, "orders")
    with pytest.raises(CqlError, match="PRIMARY KEY"):
        cql_select(o, "SELECT writetime(o_custkey) FROM orders")
    with pytest.raises(CqlError, match="PRIMARY KEY"):
        cql_select(o, "SELECT ttl(o_orderdate) FROM orders")
    with pytest.raises(CqlError, match="GROUP BY|aggregates"):
        cql_select(o, "SELECT writetime(o_totalprice), count(*) "
                      "FROM orders")
    # collections are rejected before any data access
    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        customer_profiles,
    )
    cp = customer_profiles(spark, SF_DIR)
    with pytest.raises(CqlError, match="collection"):
        cql_select(cp, "SELECT writetime(tags) FROM customer_profiles")
    # a table without the shadow columns cannot serve the selector
    with pytest.raises(CqlError, match="writetime-tracked"):
        cql_select(o, "SELECT writetime(o_totalprice) FROM orders "
                      ).collect()
    # ttl() without a pinned clock is an error (determinism contract)
    kv = spark.createDataFrame(
        [(1, 1.0, 1000000, 60)],
        "key long, price double, writetime_us long, ttl_s long")
    with pytest.raises(CqlError, match="now_us"):
        cql_select(kv, "SELECT ttl(price) FROM kv")
    # the happy path: writetime needs no clock, ttl floors remaining
    got = cql_select(kv, "SELECT key, writetime(price) AS wt, "
                         "ttl(price) AS t FROM kv",
                     now_us=31_000_000).collect()
    assert [(r.key, r.wt, r.t) for r in got] == [(1, 1000000, 30)]
