"""Set operations (SURVEY.md 2.G) - the two-store merge primitives."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register


def _year_custkeys(spark, sf_dir, year: int) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == year).select("o_custkey")


@register("g1_union_all", "G1", """
SELECT o_custkey, COUNT(*) AS n
FROM (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
      UNION ALL
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
GROUP BY o_custkey
""", "Bag union of two store slices, then per-key counts")
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _year_custkeys(spark, sf_dir, 1995)
    b = _year_custkeys(spark, sf_dir, 1996)
    return a.unionAll(b).groupBy("o_custkey").agg(F.count("*").alias("n"))


@register("g2_intersect", "G2", """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
""", "Set intersection: customers active in both years")
def g2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _year_custkeys(spark, sf_dir, 1995).intersect(
        _year_custkeys(spark, sf_dir, 1996)
    )


@register("g3_except_all", "G3", """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
EXCEPT ALL
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
""", "Bag difference (exceptAll): 1995 order slots not offset by 1996 ones")
def g3_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _year_custkeys(spark, sf_dir, 1995).exceptAll(
        _year_custkeys(spark, sf_dir, 1996)
    )


@register("g1b_union_by_name", "G1", """
SELECT key, price, COALESCE(bal, 0.0) AS bal
FROM (
  SELECT o_orderkey AS key, o_totalprice AS price, NULL::DOUBLE AS bal
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT c_custkey AS key, NULL::DOUBLE AS price, c_acctbal AS bal
  FROM customer WHERE c_custkey % 10 = 0
)
""", "Name-aligned union with missing columns (two heterogeneous store "
     "schemas merged - the ES-doc vs CQL-row reconciliation shape)")
def g1b_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price")
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal")
    )
    return o.unionByName(c, allowMissingColumns=True).select(
        "key", "price", F.coalesce("bal", F.lit(0.0)).alias("bal")
    )


@register("g2b_intersect_all", "G2", """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
INTERSECT ALL
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
""", "Bag intersection (intersectAll): keeps multiplicity - min of the "
     "two sides' per-key counts")
def g2b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _year_custkeys(spark, sf_dir, 1995).intersectAll(
        _year_custkeys(spark, sf_dir, 1996)
    )


@register("g1c_union_distinct", "G1", """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
""", "UNION (distinct) - the dedup union completing the set-op "
     "family: nations having a high-balance customer OR supplier. "
     "Catalyst plans union-then-hash-aggregate, so the distinct "
     "costs one shuffle of the (already filter-reduced) union - "
     "pushdown reaches both scans.")
def g1c_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register("g4_symmetric_difference", "G3+L1", """
WITH a AS (SELECT o_orderkey AS key FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
b AS (SELECT o_orderkey AS key FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
SELECT 'a_only' AS side, key FROM (SELECT key FROM a EXCEPT SELECT key FROM b)
UNION ALL
SELECT 'b_only' AS side, key FROM (SELECT key FROM b EXCEPT SELECT key FROM a)
""", "Symmetric difference with side labels - the reconciliation "
     "set report ('keys only in the recent window' vs 'keys only "
     "in the urgent class') that completes the set-op family; "
     "l13's checksums say WHICH buckets diverge, this says WHICH "
     "KEYS. Two left-anti joins under the hood, each shuffling "
     "only its filtered side; both filters reach the scans.")
def g4_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'")
    ).select(F.col("o_orderkey").alias("key"))
    b = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.col("o_orderkey").alias("key"))
    return (
        a.exceptAll(b).distinct().select(F.lit("a_only").alias("side"), "key")
        .unionByName(
            b.exceptAll(a).distinct().select(F.lit("b_only").alias("side"), "key")
        )
    )
