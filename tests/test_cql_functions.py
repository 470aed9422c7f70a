"""CQL CREATE FUNCTION / CREATE AGGREGATE: hand-checked semantics +
Cassandra-faithful rejection battery (the DDL rules Cassandra itself
enforces, plus the distributivity rules a distributed engine must
add)."""

import pytest

from cassandra_elasticsearch_sync_spark.sources.cql_functions import (
    _AGGREGATES,
    _FUNCTIONS,
    create_aggregate,
    create_function,
    drop_aggregate,
    drop_function,
)
from cassandra_elasticsearch_sync_spark.sources.cql_query import (
    CqlError,
    cql_select,
)


@pytest.fixture(autouse=True)
def _clean_registry():
    _FUNCTIONS.clear()
    _AGGREGATES.clear()
    yield
    _FUNCTIONS.clear()
    _AGGREGATES.clear()


def _mkfn(name="f", args="a int", ret="int", body="return a + 1;",
          null="RETURNS NULL ON NULL INPUT", prefix=""):
    return create_function(
        f"CREATE {prefix}FUNCTION {name}({args}) {null} RETURNS {ret} "
        f"LANGUAGE java AS '{body}'")


def test_udf_uda_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, 10, 2.0), (1, 20, 4.0), (2, 7, 1.0), (2, None, 3.0)],
        "pk long, x int, y double")
    import cassandra_elasticsearch_sync_spark.sources.cql_query as cq
    cq.CQL_TABLES.setdefault("t_udf", {"partition": ["pk"],
                                       "clustering": []})

    _mkfn("twice_plus", args="v int, w int", body="return v * 2 + w;")
    _mkfn("step", args="state bigint, v int", ret="bigint",
          body="return state + v * v;")
    _mkfn("halve", args="s bigint", ret="double", body="return s / 2.0;")
    create_aggregate("CREATE AGGREGATE sumsq(int) SFUNC step "
                     "STYPE bigint INITCOND 100")
    create_aggregate("CREATE AGGREGATE sumsq_h(int) SFUNC step "
                     "STYPE bigint FINALFUNC halve INITCOND 0")
    # no INITCOND -> Cassandra's null state stays null forever
    create_aggregate("CREATE AGGREGATE sumsq_null(int) SFUNC step "
                     "STYPE bigint")

    out = {r["pk"]: r for r in cql_select(df, """
        SELECT pk, sumsq(x) AS sq, sumsq_h(x) AS sqh,
               sumsq_null(x) AS sqn
        FROM t_udf GROUP BY pk
    """).collect()}
    # pk 1: 100 + 10^2 + 20^2 = 600; halved variant seeds 0: 250.0
    assert out[1]["sq"] == 600 and out[1]["sqh"] == 250.0
    # pk 2: null x row is skipped by the null-propagating fold
    assert out[2]["sq"] == 149 and out[2]["sqh"] == 24.5
    assert out[1]["sqn"] is None and out[2]["sqn"] is None

    # scalar projection, incl. null propagation + multi-arg
    rows = {(r["pk"], r["x"]): r["t"] for r in cql_select(df, """
        SELECT pk, x, twice_plus(x, pk) AS t FROM t_udf
    """).collect()}
    assert rows[(1, 10)] == 21 and rows[(2, 7)] == 16
    assert rows[(2, None)] is None

    # a scalar UDF cannot sit in an aggregating select list, and a
    # UDA cannot sit in a plain one
    with pytest.raises(CqlError, match="not an aggregate"):
        cql_select(df, "SELECT pk, twice_plus(x, pk) AS t, sumsq(x) "
                       "AS s FROM t_udf GROUP BY pk").collect()
    with pytest.raises(CqlError, match="first-row values"):
        cql_select(df, "SELECT pk, sumsq(x) AS s, x FROM t_udf").collect()
    cq.CQL_TABLES.pop("t_udf", None)


def test_ddl_rules_fail_closed():
    # duplicate without OR REPLACE / IF NOT EXISTS
    _mkfn("dup")
    with pytest.raises(CqlError, match="already exists"):
        _mkfn("dup")
    _mkfn("dup", prefix="OR REPLACE ")               # replace OK
    # IF NOT EXISTS returns the existing one untouched
    f = create_function("CREATE FUNCTION IF NOT EXISTS dup(a int) "
                        "RETURNS NULL ON NULL INPUT RETURNS int "
                        "LANGUAGE java AS 'return a - 1;'")
    assert f.body_toks == _FUNCTIONS["dup"].body_toks
    # OR REPLACE + IF NOT EXISTS are mutually exclusive
    with pytest.raises(CqlError, match="mutually exclusive"):
        create_function("CREATE OR REPLACE FUNCTION IF NOT EXISTS g(a int) "
                        "RETURNS NULL ON NULL INPUT RETURNS int "
                        "LANGUAGE java AS 'return a;'")
    # CALLED ON NULL INPUT mislabels the subset's null propagation
    with pytest.raises(CqlError, match="CALLED ON NULL INPUT"):
        _mkfn("g", null="CALLED ON NULL INPUT")
    # unsupported language / type / body shapes
    with pytest.raises(CqlError, match="LANGUAGE"):
        create_function("CREATE FUNCTION g(a int) RETURNS NULL ON NULL "
                        "INPUT RETURNS int LANGUAGE javascript "
                        "AS 'return a;'")
    with pytest.raises(CqlError, match="unsupported CQL type"):
        _mkfn("g", args="a list<int>")
    with pytest.raises(CqlError, match="return <expr>"):
        _mkfn("g", body="int x = a; return x;")
    with pytest.raises(CqlError, match="text argument"):
        _mkfn("g", args="a text", body="return a + 1;")
    # text in ==/!= is fine; inner quotes double per Cassandra
    _mkfn("cmp_ok", args="a text", ret="int",
          body="return a == ''x'' ? 1 : 0;")
    # the $$...$$ dollar-quoted body form
    create_function("CREATE FUNCTION cmp_dollar(a text) RETURNS NULL "
                    "ON NULL INPUT RETURNS int LANGUAGE java "
                    "AS $$return a == 'x' ? 1 : 0;$$")
    assert (_FUNCTIONS["cmp_dollar"].body_toks
            == _FUNCTIONS["cmp_ok"].body_toks)
    # DROP rules
    drop_function("dup")
    with pytest.raises(CqlError, match="does not exist"):
        drop_function("dup")
    drop_function("dup", if_exists=True)


def test_uda_rules_fail_closed():
    _mkfn("step", args="state bigint, v int", ret="bigint",
          body="return state + v;")
    # SFUNC signature must be (STYPE, agg args)
    with pytest.raises(CqlError, match="does not match"):
        create_aggregate("CREATE AGGREGATE bad(text) SFUNC step "
                         "STYPE bigint INITCOND 0")
    with pytest.raises(CqlError, match="does not match"):
        create_aggregate("CREATE AGGREGATE bad(int) SFUNC step "
                         "STYPE int INITCOND 0")
    # SFUNC must return STYPE
    _mkfn("badret", args="state bigint, v int", ret="int",
          body="return state + v;")
    with pytest.raises(CqlError, match="must return STYPE"):
        create_aggregate("CREATE AGGREGATE bad(int) SFUNC badret "
                         "STYPE bigint INITCOND 0")
    # tuple STYPE rejected (not distributive-checkable)
    with pytest.raises(CqlError, match="scalar state"):
        create_aggregate("CREATE AGGREGATE bad(int) SFUNC step "
                         "STYPE tuple<bigint, bigint> INITCOND (0, 0)")
    # non-distributive fold bodies rejected
    _mkfn("lastw", args="state bigint, v int", ret="bigint",
          body="return v + 0;")
    with pytest.raises(CqlError, match="not a distributive fold"):
        create_aggregate("CREATE AGGREGATE bad(int) SFUNC lastw "
                         "STYPE bigint INITCOND 0")
    _mkfn("selfref", args="state bigint, v int", ret="bigint",
          body="return state + state + v;")
    with pytest.raises(CqlError, match="re-reference"):
        create_aggregate("CREATE AGGREGATE bad(int) SFUNC selfref "
                         "STYPE bigint INITCOND 0")
    # FINALFUNC arity
    _mkfn("fin2", args="a bigint, b bigint", ret="double",
          body="return a / 2.0;")
    with pytest.raises(CqlError, match="exactly \\(STYPE\\)"):
        create_aggregate("CREATE AGGREGATE bad(int) SFUNC step "
                         "STYPE bigint FINALFUNC fin2 INITCOND 0")
    # unknown SFUNC / FINALFUNC
    with pytest.raises(CqlError, match="not a registered"):
        create_aggregate("CREATE AGGREGATE bad(int) SFUNC ghost "
                         "STYPE bigint INITCOND 0")
    drop_aggregate("ghost", if_exists=True)
    with pytest.raises(CqlError, match="does not exist"):
        drop_aggregate("ghost")
    # still-referenced rule (ADVICE r9): a function bound as an
    # aggregate's SFUNC (or FINALFUNC) can be neither DROPPED nor
    # CREATE-OR-REPLACEd - Cassandra's InvalidRequest; a replace
    # would leave the UDA on the stale body tokens captured at
    # create_aggregate time
    _mkfn("fin1", args="a bigint", ret="double",
          body="return a / 2.0;")
    create_aggregate("CREATE AGGREGATE refd(int) SFUNC step "
                     "STYPE bigint FINALFUNC fin1 INITCOND 0")
    with pytest.raises(CqlError, match="still referenced by aggregate"):
        drop_function("step")
    with pytest.raises(CqlError, match="still referenced by aggregate"):
        drop_function("fin1")
    with pytest.raises(CqlError, match="still referenced by aggregate"):
        _mkfn("step", prefix="OR REPLACE ",
              args="state bigint, v int", ret="bigint",
              body="return state + v + v;")
    # IF NOT EXISTS on a referenced name stays a no-op return, never
    # a mutation - still allowed
    create_function("CREATE FUNCTION IF NOT EXISTS step"
                    "(state bigint, v int) RETURNS NULL ON NULL INPUT "
                    "RETURNS bigint LANGUAGE java "
                    "AS 'return state + v;'")
    # dropping the aggregate releases both functions
    drop_aggregate("refd")
    _mkfn("step", prefix="OR REPLACE ",
          args="state bigint, v int", ret="bigint",
          body="return state + v;")
    drop_function("fin1")


def test_max_min_folds(spark):
    df = spark.createDataFrame([(1, 3), (1, 9), (1, 5)],
                               "pk long, x int")
    import cassandra_elasticsearch_sync_spark.sources.cql_query as cq
    cq.CQL_TABLES.setdefault("t_mm", {"partition": ["pk"],
                                      "clustering": []})
    _mkfn("mx", args="state int, v int", ret="int",
          body="return Math.max(state, v * 10);")
    _mkfn("mn", args="state int, v int", ret="int",
          body="return Math.min(state, v);")
    create_aggregate("CREATE AGGREGATE biggest(int) SFUNC mx "
                     "STYPE int INITCOND 55")
    create_aggregate("CREATE AGGREGATE smallest(int) SFUNC mn "
                     "STYPE int INITCOND 4")
    r, = cql_select(df, "SELECT pk, biggest(x) AS b, smallest(x) AS s "
                        "FROM t_mm GROUP BY pk").collect()
    assert r["b"] == 90           # max(55, 30, 90, 50)
    assert r["s"] == 3            # min(4, 3, 9, 5) - INITCOND folds in
    cq.CQL_TABLES.pop("t_mm", None)
