"""Skew mitigation: deterministic salted joins.

AQE's skew-join split handles most skew at runtime, but the classic
manual remedy - salt the skewed side, replicate the other - is part of
the engine's scale toolkit. `salted_join` is semantics-preserving: the
result equals the plain equi-join (the oracle for the demo query IS
the plain join), while the physical plan spreads each hot key over
`n_salts` shuffle partitions.

Determinism: the salt derives from a caller-provided per-row column
(xxhash64 mod n), never rand() - SURVEY.md 5.3 rule 4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_src: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` with `other` on column `on`, spreading each
    join key of the skewed side across `n_salts` sub-keys.

    The other side is replicated n_salts times (explode) - cheap when
    it is the smaller relation. Result == skewed.join(other, on, how).
    """
    s = skewed.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(o, [on, "_salt"], how).drop("_salt")


@register("skew_salted_join", "C1", """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS spend
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'MACHINERY'
GROUP BY o_custkey
""", "Salted join demo: same result as the plain equi-join (the oracle "
     "runs the plain join), but each customer key is spread over 8 "
     "salt buckets - the manual remedy when one key dominates "
     "(AQE skew-split is the automatic one)")
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    ).withColumnRenamed("c_custkey", "o_custkey")
    joined = salted_join(o, c, "o_custkey", F.col("o_orderkey"), n_salts=8)
    return joined.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
         .cast("double") / 100.0).alias("spend"),
    )
