"""CQL SELECT compiler: parser, restriction-rule validator, and a
compile-run check against plain DataFrame ops."""

from __future__ import annotations

import pytest

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.sources.cql_query import (
    CqlError,
    cql_select,
    parse_cql,
    validate_cql,
)

SF_DIR = "/root/testdata/sf0.001"


def test_parser_full_statement():
    sel = parse_cql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_custkey = 37 AND o_orderdate >= '1995-01-01' "
        "PER PARTITION LIMIT 2 LIMIT 10 ALLOW FILTERING;"
    )
    assert [c.name for c in sel.columns] == ["o_orderkey", "o_totalprice"]
    assert sel.table == "orders"
    assert sel.where == [
        ("o_custkey", "=", 37),
        ("o_orderdate", ">=", "1995-01-01"),
    ]
    assert sel.per_partition_limit == 2
    assert sel.limit == 10
    assert sel.allow_filtering


def test_parser_in_list_and_star():
    sel = parse_cql("SELECT * FROM events WHERE user_id IN (1, 2, 3)")
    assert [c.name for c in sel.columns] == ["*"]
    assert sel.where == [("user_id", "IN", [1, 2, 3])]


def test_non_key_predicate_requires_allow_filtering():
    sel = parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 1000")
    with pytest.raises(CqlError, match="ALLOW FILTERING"):
        validate_cql(sel)
    sel_ok = parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 1000 "
        "ALLOW FILTERING")
    validate_cql(sel_ok)


def test_clustering_requires_partition_equality():
    sel = parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_orderdate >= '1995-01-01'")
    with pytest.raises(CqlError, match="partition key"):
        validate_cql(sel)


def test_clustering_contiguous_slice_rule():
    # range on the FIRST clustering col then a restriction on the
    # second is not a contiguous slice
    sel = parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_custkey = 1 "
        "AND o_orderdate >= '1995-01-01' AND o_orderkey = 5")
    with pytest.raises(CqlError, match="contiguous"):
        validate_cql(sel)
    # equality on the first then range on the second is fine
    ok = parse_cql(
        "SELECT ts FROM events WHERE user_id = 1 "
        "AND ts = '2024-01-01 00:00:00' AND event_id > 10")
    validate_cql(ok)


def test_unknown_table_rejected():
    with pytest.raises(CqlError, match="unknown table"):
        validate_cql(parse_cql("SELECT x FROM nope WHERE x = 1"))


def test_compile_matches_dataframe_ops(spark):
    from pyspark.sql import functions as F

    o = load_table(spark, SF_DIR, "orders")
    got = cql_select(o, """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = 37 AND o_orderdate >= '1995-01-01 00:00:00'
    """)
    want = (
        o.filter((F.col("o_custkey") == 37)
                 & (F.col("o_orderdate")
                    >= F.to_timestamp(F.lit("1995-01-01 00:00:00"))))
        .select("o_orderkey", "o_totalprice")
    )
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_per_partition_limit_caps_each_partition(spark):
    from pyspark.sql import functions as F

    o = load_table(spark, SF_DIR, "orders")
    got = cql_select(o, """
        SELECT o_custkey, o_orderkey FROM orders
        PER PARTITION LIMIT 2
    """)
    per = got.groupBy("o_custkey").count().agg(F.max("count")).collect()
    assert per[0][0] <= 2


def test_group_by_pk_prefix_rule():
    validate_cql(parse_cql(
        "SELECT o_custkey, count(*) FROM orders GROUP BY o_custkey"))
    validate_cql(parse_cql(
        "SELECT o_custkey, count(*) FROM orders "
        "GROUP BY o_custkey, o_orderdate"))
    with pytest.raises(CqlError, match="partition key plus a clustering"):
        validate_cql(parse_cql(
            "SELECT count(*) FROM orders GROUP BY o_orderdate"))
    with pytest.raises(CqlError, match="not in GROUP BY"):
        validate_cql(parse_cql(
            "SELECT o_orderkey, count(*) FROM orders GROUP BY o_custkey"))


def test_aggregate_plain_mix_requires_group_by():
    with pytest.raises(CqlError, match="mix aggregates"):
        validate_cql(parse_cql("SELECT o_custkey, count(*) FROM orders"))
    validate_cql(parse_cql("SELECT count(*) FROM orders"))


def test_order_by_rules():
    # full reversal of (o_orderdate DESC, o_orderkey ASC) is legal
    validate_cql(parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_custkey = 1 "
        "ORDER BY o_orderdate ASC, o_orderkey DESC"))
    # declared directions are legal too
    validate_cql(parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_custkey = 1 "
        "ORDER BY o_orderdate DESC"))
    with pytest.raises(CqlError, match="clustering order"):
        validate_cql(parse_cql(
            "SELECT o_orderkey FROM orders WHERE o_custkey = 1 "
            "ORDER BY o_orderdate ASC, o_orderkey ASC"))  # mixed
    with pytest.raises(CqlError, match="equality-restricted"):
        validate_cql(parse_cql(
            "SELECT o_orderkey FROM orders ORDER BY o_orderdate DESC"))


def test_token_predicate_needs_full_partition_key():
    validate_cql(parse_cql(
        "SELECT o_orderkey FROM orders WHERE token(o_custkey) > 5"))
    with pytest.raises(CqlError, match="full partition key"):
        validate_cql(parse_cql(
            "SELECT l_orderkey FROM lineitem WHERE token(l_linenumber) > 5"))


def test_group_by_aggregate_and_json_render(spark):
    from cassandra_elasticsearch_sync_spark.sources.cql_query import cql_select

    df = spark.createDataFrame(
        [(1, 1, 2.0), (1, 2, 3.0), (2, 1, 5.0)],
        "l_orderkey bigint, l_linenumber int, l_quantity double")
    got = sorted(tuple(r) for r in cql_select(df, """
        SELECT l_orderkey, count(*) AS n, sum(l_quantity) AS q
        FROM lineitem GROUP BY l_orderkey
    """).collect())
    assert got == [(1, 2, 5.0), (2, 1, 5.0)]

    js = cql_select(df, """
        SELECT JSON l_orderkey, l_linenumber FROM lineitem
        WHERE l_orderkey = 2
    """).collect()
    assert [r["json"] for r in js] == ['{"l_orderkey":2,"l_linenumber":1}']


def test_contains_rules():
    """CONTAINS/CONTAINS KEY: collections only, CONTAINS KEY maps only,
    ALLOW FILTERING required (no secondary index declared)."""
    # valid with ALLOW FILTERING
    validate_cql(parse_cql(
        "SELECT cust_id FROM customer_profiles "
        "WHERE tags CONTAINS 'x' ALLOW FILTERING"))
    validate_cql(parse_cql(
        "SELECT cust_id FROM customer_profiles "
        "WHERE prefs CONTAINS KEY 'promo' ALLOW FILTERING"))
    with pytest.raises(CqlError, match="ALLOW FILTERING"):
        validate_cql(parse_cql(
            "SELECT cust_id FROM customer_profiles WHERE tags CONTAINS 'x'"))
    with pytest.raises(CqlError, match="not a collection"):
        validate_cql(parse_cql(
            "SELECT cust_id FROM customer_profiles "
            "WHERE cust_id CONTAINS 5 ALLOW FILTERING"))
    with pytest.raises(CqlError, match="only valid on map"):
        validate_cql(parse_cql(
            "SELECT cust_id FROM customer_profiles "
            "WHERE tags CONTAINS KEY 'x' ALLOW FILTERING"))
    with pytest.raises(CqlError, match="CONTAINS/CONTAINS KEY"):
        validate_cql(parse_cql(
            "SELECT cust_id FROM customer_profiles "
            "WHERE tags = 'x' ALLOW FILTERING"))


def test_udt_field_access_rules():
    validate_cql(parse_cql(
        "SELECT cust_id, address.city FROM customer_profiles"))
    with pytest.raises(CqlError, match="no field"):
        validate_cql(parse_cql(
            "SELECT address.country FROM customer_profiles"))
    with pytest.raises(CqlError, match="not a UDT"):
        validate_cql(parse_cql(
            "SELECT tags.city FROM customer_profiles"))


def test_contains_and_udt_compile(spark):
    from cassandra_elasticsearch_sync_spark.sources.cql_query import cql_select

    df = spark.createDataFrame(
        [(1, ["a", "b"], {"theme": 1}, ("rome", 10)),
         (2, ["b", "c"], {"theme": 2, "promo": 1}, ("oslo", 20))],
        "cust_id bigint, tags array<string>, prefs map<string,int>, "
        "address struct<city:string, zip:int>")
    got = [r["cust_id"] for r in cql_select(df, """
        SELECT cust_id FROM customer_profiles
        WHERE tags CONTAINS 'b' AND prefs CONTAINS KEY 'promo'
        ALLOW FILTERING""").collect()]
    assert got == [2]
    # map VALUE containment
    got = sorted(r["cust_id"] for r in cql_select(df, """
        SELECT cust_id FROM customer_profiles
        WHERE prefs CONTAINS 1 ALLOW FILTERING""").collect())
    assert got == [1, 2]
    # UDT field access with aliasing
    rows = sorted(tuple(r) for r in cql_select(df, """
        SELECT cust_id, address.city AS city, address.zip
        FROM customer_profiles""").collect())
    assert rows == [(1, "rome", 10), (2, "oslo", 20)]


def test_secondary_index_rules():
    """One indexed equality: OK without ALLOW FILTERING. A range on
    the indexed column, an extra non-key predicate, or an unindexed
    column: ALLOW FILTERING required."""
    validate_cql(parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'"))
    with pytest.raises(CqlError, match="ALLOW FILTERING"):
        validate_cql(parse_cql(
            "SELECT o_orderkey FROM orders WHERE o_orderpriority > '1'"))
    with pytest.raises(CqlError, match="ALLOW FILTERING"):
        validate_cql(parse_cql(
            "SELECT o_orderkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100"))
    with pytest.raises(CqlError, match="ALLOW FILTERING"):
        validate_cql(parse_cql(
            "SELECT o_orderkey FROM orders WHERE o_totalprice > 100"))


def test_select_distinct_partition_key_rules():
    """SELECT DISTINCT: only (and all of) the partition key columns,
    pk/token restrictions only, no ORDER BY / PER PARTITION LIMIT /
    aggregates - Cassandra's exact rule set."""
    ok = parse_cql("SELECT DISTINCT o_custkey FROM orders")
    assert ok.distinct and validate_cql(ok)
    ok2 = parse_cql(
        "SELECT DISTINCT user_id FROM events WHERE token(user_id) > 0")
    assert validate_cql(ok2)
    with pytest.raises(CqlError, match="partition key"):
        validate_cql(parse_cql("SELECT DISTINCT o_orderkey FROM orders"))
    with pytest.raises(CqlError, match="partition key"):
        validate_cql(parse_cql(
            "SELECT DISTINCT o_custkey, o_orderdate FROM orders"))
    with pytest.raises(CqlError, match="ORDER BY"):
        validate_cql(parse_cql(
            "SELECT DISTINCT o_custkey FROM orders "
            "ORDER BY o_orderdate DESC"))
    with pytest.raises(CqlError, match="PER PARTITION"):
        validate_cql(parse_cql(
            "SELECT DISTINCT o_custkey FROM orders PER PARTITION LIMIT 1"))
    with pytest.raises(CqlError, match="aggregates"):
        validate_cql(parse_cql(
            "SELECT DISTINCT count(*) FROM orders GROUP BY o_custkey"))
    with pytest.raises(CqlError, match="restricted by"):
        validate_cql(parse_cql(
            "SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderdate > '1995-01-01 00:00:00' ALLOW FILTERING"))


def test_select_distinct_executes(spark):
    df = cql_select(
        load_table(spark, SF_DIR, "orders"),
        "SELECT DISTINCT o_custkey FROM orders LIMIT 5")
    rows = df.collect()
    assert len(rows) == 5
    assert df.columns == ["o_custkey"]
    assert len({r["o_custkey"] for r in rows}) == 5


def test_in_restriction_rules():
    """Cassandra's IN rules: equality-class on pk/clustering, token()
    IN rejected, IN on unindexed non-key columns needs ALLOW
    FILTERING, IN on collections rejected."""
    import pytest

    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        CqlError,
        parse_cql,
        validate_cql,
    )

    # pk IN + clustering slice: legal without ALLOW FILTERING
    validate_cql(parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_custkey IN (1, 2)"
        " AND o_orderdate >= '1995-01-01 00:00:00'"))
    # IN on a clustering column with pk equality: legal (equality class)
    validate_cql(parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_custkey = 1"
        " AND o_orderdate IN ('1995-01-01 00:00:00')"))
    # token() IN: rejected
    with pytest.raises(CqlError, match="token\\(\\) does not support IN"):
        validate_cql(parse_cql(
            "SELECT o_orderkey FROM orders WHERE token(o_custkey) IN (1)"))
    # IN on an unindexed non-key column: needs ALLOW FILTERING
    with pytest.raises(CqlError, match="ALLOW FILTERING"):
        validate_cql(parse_cql(
            "SELECT o_orderkey FROM orders WHERE o_totalprice IN (1, 2)"))
    # the same with ALLOW FILTERING: accepted
    validate_cql(parse_cql(
        "SELECT o_orderkey FROM orders WHERE o_totalprice IN (1, 2)"
        " ALLOW FILTERING"))


def test_pk_in_compiles_to_isin_pushdown(spark):
    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        cql_select,
    )

    o = load_table(spark, SF_DIR, "orders")
    out = cql_select(o, "SELECT o_orderkey FROM orders"
                        " WHERE o_custkey IN (5, 37)")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "o_custkey" in plan.split("PushedFilters")[1][:300] \
        or "In(o_custkey" in plan, plan[:1200]
    got = {r.o_orderkey for r in out.collect()}
    want = {r.o_orderkey
            for r in o.filter(o.o_custkey.isin(5, 37)).collect()}
    assert got == want and got


def test_ann_restriction_rules(spark):
    """Cassandra 5.0 ANN rules: SAI vector index required, LIMIT
    mandatory and <= 1000, no mixing with other clauses; the page is
    a TakeOrderedAndProject."""
    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        CqlError,
        cql_select,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    vec = ", ".join(repr(float(x)) for x in
                    e.head()["embedding"][:64])
    good = f"SELECT vec_id FROM embeddings ORDER BY embedding ANN OF [{vec}] LIMIT 3"
    out = cql_select(e, good)
    assert out.count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]

    with pytest.raises(CqlError, match="LIMIT"):
        cql_select(e, f"SELECT vec_id FROM embeddings "
                      f"ORDER BY embedding ANN OF [{vec}]")
    with pytest.raises(CqlError, match="1000"):
        cql_select(e, f"SELECT vec_id FROM embeddings "
                      f"ORDER BY embedding ANN OF [{vec}] LIMIT 1001")
    with pytest.raises(CqlError, match="vector SAI"):
        cql_select(e, f"SELECT vec_id FROM embeddings "
                      f"ORDER BY label ANN OF [{vec}] LIMIT 3")
    with pytest.raises(CqlError, match="non-empty"):
        cql_select(e, "SELECT vec_id FROM embeddings "
                      "ORDER BY embedding ANN OF [] LIMIT 3")


def test_cql_similarity_select_functions(spark):
    """similarity_* in the SELECT list: projection value matches the
    [0,1] form by hand; bracket-aware select-list parsing; Cassandra
    validation rules (vector column required, no GROUP BY/DISTINCT/
    aggregate mixing, zero query vector rejected); zero-norm doc rows
    read NULL under cosine."""
    import math

    e = load_table(spark, SF_DIR, "embeddings")
    row = e.head()
    vec = ", ".join(repr(float(x)) for x in row["embedding"][:64])
    out = cql_select(e, f"""
        SELECT vec_id, similarity_cosine(embedding, [{vec}]) AS sim,
               similarity_dot_product(embedding, [{vec}]) AS dp,
               similarity_euclidean(embedding, [{vec}]) AS eu
        FROM embeddings WHERE vec_id = {int(row['vec_id'])}
    """).collect()
    assert len(out) == 1
    q = [float(x) for x in row["embedding"]]
    dot = sum(a * a for a in q)
    nrm = math.sqrt(dot)
    assert abs(out[0]["sim"] - round((1 + dot / (nrm * nrm)) / 2, 6)) < 1e-9
    assert abs(out[0]["dp"] - round((1 + dot) / 2, 6)) < 1e-9
    assert abs(out[0]["eu"] - round(1.0, 6)) < 1e-9  # d=0 -> 1/(1+0)
    # self-similarity under cosine is exactly 1.0
    assert out[0]["sim"] == 1.0

    with pytest.raises(CqlError, match="vector column"):
        cql_select(e, f"SELECT similarity_cosine(label, [{vec}]) "
                      "FROM embeddings")
    with pytest.raises(CqlError, match="GROUP BY/DISTINCT"):
        cql_select(e, f"SELECT count(*), similarity_cosine(embedding, "
                      f"[{vec}]) FROM embeddings")
    zeros = ", ".join(["0.0"] * 64)
    with pytest.raises(CqlError, match="zero query vector"):
        cql_select(e, f"SELECT similarity_cosine(embedding, [{zeros}]) "
                      "FROM embeddings")
    with pytest.raises(CqlError, match="non-empty"):
        cql_select(e, "SELECT similarity_cosine(embedding, []) "
                      "FROM embeddings")


def test_cql_sasi_like_rules(spark):
    """LIKE restriction rules: SASI index required (ALLOW FILTERING
    does not rescue it); PREFIX mode serves only 'x%'; CONTAINS mode
    serves all three shapes; mid-pattern wildcards rejected; '_' is
    literal (not a wildcard)."""
    d = load_table(spark, SF_DIR, "documents")
    o = load_table(spark, SF_DIR, "orders")

    # CONTAINS mode: all three shapes compile and run
    for pat in ("'merge%'", "'%merge'", "'%merge%'"):
        out = cql_select(d, f"SELECT doc_id FROM documents "
                            f"WHERE text LIKE {pat}")
        assert out.columns == ["doc_id"]
    # no SASI index -> rejected even with ALLOW FILTERING
    with pytest.raises(CqlError, match="SASI"):
        cql_select(d, "SELECT doc_id FROM documents "
                      "WHERE lang LIKE 'd%' ALLOW FILTERING")
    # PREFIX mode serves only 'x%'
    assert cql_select(o, "SELECT o_orderkey FROM orders "
                         "WHERE o_orderpriority LIKE '3-%'").count() > 0
    with pytest.raises(CqlError, match="PREFIX"):
        cql_select(o, "SELECT o_orderkey FROM orders "
                      "WHERE o_orderpriority LIKE '%MEDIUM'")
    # mid-pattern wildcard rejected
    with pytest.raises(CqlError, match="unsupported LIKE pattern"):
        cql_select(d, "SELECT doc_id FROM documents "
                      "WHERE text LIKE '%a%b%'")
    # '_' is literal in Cassandra LIKE: no doc contains a literal
    # underscore, so the match set is empty (SQL LIKE would match)
    n = cql_select(d, "SELECT doc_id FROM documents "
                      "WHERE text LIKE '%merge_%'").count()
    assert n == 0


def test_time_functions_hand_checked(spark):
    """toDate/toTimestamp/toUnixTimestamp: pinned conversions (UTC
    date, epoch MILLISECONDS - Cassandra's unit), GROUP BY/aggregate
    combination rejected, unknown timeuuid forms stay unknown."""
    import datetime as dt

    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        CQL_TABLES, CqlError, cql_select,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    CQL_TABLES.setdefault("tstab", {"partition": ["k"], "clustering": []})
    try:
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 3, 5, 23, 59, 59))], "k long, ts timestamp")
        row = cql_select(
            df, "SELECT toDate(ts) AS d, toTimestamp(ts) AS t, "
                "toUnixTimestamp(ts) AS ms FROM tstab WHERE k = 1"
        ).collect()[0]
        assert row["d"] == dt.date(2024, 3, 5)
        assert row["t"] == dt.datetime(2024, 3, 5, 23, 59, 59)
        assert row["ms"] == 1709683199000     # epoch ms, not seconds
        with _pt.raises(CqlError, match="GROUP BY/aggregates"):
            cql_select(df, "SELECT toDate(ts) AS d, count(*) "
                           "FROM tstab WHERE k = 1")
        with _pt.raises(CqlError, match="unsupported CQL function"):
            cql_select(df, "SELECT minTimeuuid(ts) FROM tstab WHERE k = 1")
        # ADVICE r11: non-temporal argument is a loud CqlError (the
        # Cassandra prepare-time type check), never Spark's lenient
        # cast-to-NULL
        df2 = spark.createDataFrame(
            [(1, "not-a-time")], "k long, ts string")
        for fn in ("toDate", "toTimestamp", "toUnixTimestamp"):
            with _pt.raises(CqlError, match="timestamp/date argument"):
                cql_select(df2, f"SELECT {fn}(ts) AS x FROM tstab "
                                "WHERE k = 1")
        # DATE arguments remain accepted (Cassandra: toDate(date),
        # toTimestamp(date) are valid overloads)
        df3 = spark.createDataFrame(
            [(1, dt.date(2024, 3, 5))], "k long, d date")
        row3 = cql_select(
            df3, "SELECT toDate(d) AS dd FROM tstab WHERE k = 1"
        ).collect()[0]
        assert row3["dd"] == dt.date(2024, 3, 5)
    finally:
        CQL_TABLES.pop("tstab", None)


# -- toJson / fromJson (round 12) -------------------------------------------

def test_tojson_encodings(spark):
    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        cql_select,
    )
    import datetime as dt
    df = spark.createDataFrame(
        [(1, 'he said "hi"', 5.5, dt.datetime(2001, 2, 3, 4, 5, 6),
          ["a", "b"]),
         (2, None, None, None, None)],
        "key bigint, txt string, price double, ts timestamp, "
        "tags array<string>")
    out = {r["key"]: r for r in cql_select(
        df, "SELECT key, toJson(txt) AS j_txt, toJson(price) AS j_price, "
            "toJson(ts) AS j_ts, toJson(tags) AS j_tags FROM kv").collect()}
    assert out[1]["j_txt"] == '"he said \\"hi\\""', "JSON string escaping"
    assert out[1]["j_price"] == "5.5"
    assert out[1]["j_ts"] == '"2001-02-03 04:05:06.000Z"', \
        "Cassandra's space-separated UTC spelling, not ISO-8601 T"
    assert out[1]["j_tags"] == '["a","b"]'
    assert out[2]["j_txt"] == "null" and out[2]["j_ts"] == "null"


def test_tojson_rejects_group_by(spark):
    import pytest as _pytest

    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        CqlError,
        cql_select,
    )
    df = spark.createDataFrame([(1, 2.0)], "key bigint, price double")
    with _pytest.raises(CqlError, match="toJson"):
        cql_select(df, "SELECT toJson(price), count(*) FROM kv "
                       "GROUP BY key")


def test_fromjson_value_positions(spark, tmp_path):
    from cassandra_elasticsearch_sync_spark.sources.acid import (
        AcidParquetTable,
    )
    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        _parse_literal,
    )
    from cassandra_elasticsearch_sync_spark.sources.cql_write import (
        apply_cql_writes,
    )
    assert _parse_literal("fromJson('\"abc\"')") == "abc"
    assert _parse_literal("fromJson('5')") == 5
    assert _parse_literal("fromJson('[1, 2]')") == [1, 2]
    assert _parse_literal("fromJson('\"it''s\"')") == "it's"
    # a fromJson payload with commas survives the VALUES tuple split
    t = AcidParquetTable(spark, str(tmp_path / "kv"))
    t.init(spark.createDataFrame([(1, "x", 0.0)],
                                 "key bigint, txt string, price double"))
    apply_cql_writes(t, ["key"],
                     "INSERT INTO kv (key, txt, price) VALUES "
                     "(2, fromJson('\"a,b\"'), fromJson('2.5'))")
    # separate call: a conditional batch is confined to one partition
    apply_cql_writes(t, ["key"],
                     "UPDATE kv SET price = fromJson('9.25') WHERE key = 1 "
                     "IF txt = fromJson('\"x\"')")
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(1, "x", 9.25), (2, "a,b", 2.5)]
