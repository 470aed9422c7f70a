"""Sorts / limits / top-k (SURVEY.md 2.F).

A bare ORDER BY is invisible to the driver's order-insensitive hash, so
each sort query materializes its order: top-k with a total-order
tiebreak (F3 compiles to TakeOrderedAndProject - per-partition heaps +
a k-row merge on the driver, no global sort even at 100 TB), or a rank
column that encodes the position in the values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register


@register("f1_multikey_sort", "F1", """
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
LIMIT 50
""", "Multi-key sort (asc + desc) made observable via total-order LIMIT")
def f1_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .limit(50)
    )


@register("f3_global_topk", "F3", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""", "Global top-k: orderBy+limit -> TakeOrderedAndProject (no full sort)")
def f3_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register("f4_nulls_ordering", "F1", """
SELECT c_custkey, bal
FROM (SELECT c_custkey, NULLIF(ROUND(c_acctbal), 0) AS bal FROM customer)
ORDER BY bal ASC NULLS FIRST, c_custkey
LIMIT 50
""", "Explicit NULLS FIRST/LAST ordering semantics: engines disagree "
     "by default (Spark sorts NULLs first ascending, DuckDB last), so "
     "portable sorts must pin the placement - this query orders "
     "derived-null balances NULLS FIRST with a key tiebreak and takes "
     "a page. Compiles to TakeOrderedAndProject with asc_nulls_first; "
     "no full sort. The page boundary cutting through the null run is "
     "exactly what an unpinned sort gets wrong cross-engine.")
def f4_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.nullif(F.round("c_acctbal"), F.lit(0.0)).alias("bal"),
        )
        .orderBy(F.col("bal").asc_nulls_first(), F.col("c_custkey"))
        .limit(50)
    )
