"""Ad-hoc SQL parity: arbitrary user SQL (the dialect-common subset)
run VERBATIM through spark.sql and DuckDB over the registered views
must agree - the engine is a general SQL surface, not just the curated
query list.

The identical text must also produce identically-TYPED outputs now
that compare() is type-sensitive: RANK()/LENGTH() are int in Spark and
BIGINT in DuckDB, a genuine dialect divergence, so those snippets pin
BIGINT explicitly - the same convention the registry adopted in round
6 (the driver's hasher is type-sensitive)."""

from __future__ import annotations

import pytest

from cassandra_elasticsearch_sync_spark.catalog import register_views
from tests.oracle_harness import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"

ADHOC = {
    "count_star": "SELECT COUNT(*) AS n FROM lineitem",
    "group_count": """
        SELECT o_orderstatus, COUNT(*) AS n FROM orders
        GROUP BY o_orderstatus""",
    "join_filter": """
        SELECT c_name, o_orderkey FROM customer JOIN orders
        ON c_custkey = o_custkey WHERE o_totalprice > 450000""",
    "having": """
        SELECT o_custkey, COUNT(*) AS n FROM orders
        GROUP BY o_custkey HAVING COUNT(*) > 14""",
    "case_when": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'hi' ELSE 'lo' END AS bucket
        FROM orders WHERE o_orderkey % 25 = 0""",
    "in_subquery": """
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""",
    "union_distinct": """
        SELECT c_nationkey AS k FROM customer
        UNION
        SELECT n_nationkey AS k FROM nation""",
    "window_rank": """
        SELECT s_suppkey,
               CAST(RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey)
                    AS BIGINT) AS r
        FROM supplier""",
    "string_ops": """
        SELECT doc_id, UPPER(lang) AS lang_up, CAST(LENGTH(text) AS BIGINT) AS n
        FROM documents WHERE doc_id % 100 = 0""",
    "scalar_subquery": """
        SELECT s_suppkey, s_acctbal,
               (SELECT COUNT(*) FROM supplier) AS n_suppliers
        FROM supplier WHERE s_acctbal > 0""",
}


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ADHOC))
def test_adhoc_sql_parity(spark, duck, name):
    register_views(spark, SF_DIR)
    sql = ADHOC[name]
    res = compare(name, spark.sql(sql), duck, sql)
    assert res.ok, str(res)
