"""Differential test for the ES query-DSL compiler: random bool trees
over the orders table must return the same row set through the Spark
compiler (sources/es_query.compile_query) and through an INDEPENDENT
rendering of the same tree to DuckDB SQL. Catches operator-precedence,
null-handling, and clause-combination bugs the hand-picked demo
queries never exercise."""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.sources.es_query import es_search

SF_DIR = "/root/testdata/sf0.001"

_STATUSES = ["O", "F", "P"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

leaf = st.one_of(
    st.sampled_from(_STATUSES).map(lambda v: {"term": {"o_orderstatus": v}}),
    st.lists(st.sampled_from(_STATUSES), min_size=1, max_size=2)
      .map(lambda vs: {"terms": {"o_orderstatus": vs}}),
    st.sampled_from(["1-", "2-", "3-"]).map(
        lambda p: {"prefix": {"o_orderpriority": p}}),
    st.tuples(st.sampled_from(["gt", "gte", "lt", "lte"]),
              st.integers(1000, 500000)).map(
        lambda t: {"range": {"o_totalprice": {t[0]: t[1]}}}),
    st.just({"exists": {"field": "o_orderpriority"}}),
    st.just({"match_all": {}}),
    # round-8/9/10 text-matching kinds (whitespace-analyzer
    # semantics; priorities like '4-NOT SPECIFIED' are multi-token,
    # so phrase adjacency and last-term-prefix are both live)
    st.sampled_from(["1-URGENT", "2-HIGH", "4-NOT SPECIFIED",
                     "NOT SPECIFIED", "SPECIFIED"]).map(
        lambda v: {"match_phrase": {"o_orderpriority": v}}),
    st.sampled_from(["4-NOT SPEC", "NOT SPEC", "1-URG", "2-", "SPECI"]).map(
        lambda v: {"match_phrase_prefix": {"o_orderpriority": v}}),
    st.sampled_from(["1-*", "*URGENT", "*-H*", "*SPECIFIED"]).map(
        lambda v: {"wildcard": {"o_orderpriority": v}}),
    st.sampled_from([("1-URGENT", 1), ("2-HIGH", 0), ("5-LOW", 2)]).map(
        lambda t: {"fuzzy": {"o_orderpriority":
                             {"value": t[0], "fuzziness": t[1]}}}),
    # round-11: span_multi as a bare document predicate - the wrapped
    # multi-term leaf matches PER TOKEN (priorities like
    # '4-NOT SPECIFIED' are multi-token, so per-token vs whole-field
    # disagreement is live)
    st.sampled_from(["1-", "urg", "spec", "not", "5-l"]).map(
        lambda v: {"span_multi": {"match":
                                  {"prefix": {"o_orderpriority": v}}}}),
    st.sampled_from(["*urgent*", "?-high", "spec*", "*ow"]).map(
        lambda v: {"span_multi": {"match":
                                  {"wildcard": {"o_orderpriority": v}}}}),
)


def _bool_node(children):
    return st.tuples(
        st.lists(children, max_size=2),
        st.lists(children, max_size=2),
        st.lists(children, max_size=1),
    ).map(lambda t: {"bool": {"must": t[0], "should": t[1],
                              "must_not": t[2]}})


query_strategy = st.recursive(leaf, _bool_node, max_leaves=8)


def _sql(q) -> str:
    """Independent DSL -> SQL renderer (test-only twin)."""
    (kind, body), = q.items()
    if kind == "match_all":
        return "TRUE"
    if kind == "term":
        (f, v), = body.items()
        return f"{f} = '{v}'"
    if kind == "terms":
        (f, vs), = body.items()
        inlist = ", ".join(f"'{v}'" for v in vs)
        return f"{f} IN ({inlist})"
    if kind == "prefix":
        (f, v), = body.items()
        return f"{f} LIKE '{v}%'"
    if kind == "range":
        (f, conds), = body.items()
        ops = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
        return " AND ".join(f"{f} {ops[o]} {v}" for o, v in conds.items())
    if kind == "exists":
        return f"{body['field']} IS NOT NULL"
    if kind == "match_phrase":
        (f, v), = body.items()
        phrase = " ".join(str(v).lower().split())
        return f"' ' || LOWER({f}) || ' ' LIKE '% {phrase} %'"
    if kind == "match_phrase_prefix":
        (f, v), = body.items()
        phrase = " ".join(str(v).lower().split())
        return f"' ' || LOWER({f}) || ' ' LIKE '% {phrase}%'"
    if kind == "wildcard":
        (f, v), = body.items()
        return f"{f} LIKE '{str(v).replace('*', '%')}'"
    if kind == "fuzzy":
        (f, spec), = body.items()
        return (f"levenshtein({f}, '{spec['value']}')"
                f" <= {int(spec['fuzziness'])}")
    if kind == "span_multi":
        (ik, ib), = body["match"].items()
        (f, v), = ib.items()
        v = str(v).lower()
        if ik == "prefix":
            cond = f"t LIKE '{v}%'"
        elif ik == "wildcard":
            pat = v.replace("*", "%").replace("?", "_")
            cond = f"t LIKE '{pat}'"
        else:
            raise AssertionError(ik)
        return (f"LEN(LIST_FILTER(STRING_SPLIT(LOWER({f}), ' '), "
                f"t -> {cond})) > 0")
    if kind == "bool":
        parts = [_sql(c) for c in body.get("must", [])]
        should = [_sql(c) for c in body.get("should", [])]
        if should:
            parts.append("(" + " OR ".join(should) + ")")
        parts += [f"NOT ({_sql(c)})" for c in body.get("must_not", [])]
        return "(" + " AND ".join(parts) + ")" if parts else "TRUE"
    raise AssertionError(kind)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW orders AS "
        f"SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    yield con
    con.close()


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=query_strategy)
def test_compiler_matches_independent_sql(spark, duck, q):
    o = load_table(spark, SF_DIR, "orders")
    got = {r[0] for r in es_search(o, q).select("o_orderkey").collect()}
    want = {
        r[0] for r in duck.sql(
            f"SELECT o_orderkey FROM orders WHERE {_sql(q)}"
        ).fetchall()
    }
    assert got == want, (q, len(got), len(want))
