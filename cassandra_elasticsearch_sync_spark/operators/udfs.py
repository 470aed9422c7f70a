"""UDF / UDAF / UDTF surface (SURVEY.md section 2.J).

Ordered from worst to best execution profile - the docstrings are the
engine's guidance on when each tier is acceptable at 100 TB:

- J1 row-at-a-time Python UDF: one Python call per row, pickled both
  ways. Here only as the escape-hatch demo; everything it does in this
  file is also expressible in built-ins (the oracle proves it).
- J2/J3/J4/J5 Arrow-vectorized (pandas_udf / applyInPandas /
  mapInPandas): amortized Arrow batches, 10-100x over J1. The right
  tool when built-ins genuinely cannot express the logic (custom
  science code, model inference).
- J6 Python UDTF: row -> many rows with a declared schema.
- J7 SQL registration: exposes any of the above to spark.sql.

Float parity note: pandas reductions (mean/sum) use pairwise
summation while DuckDB folds sequentially, so UDAF outputs are rounded
to 6 dp and operate on small-magnitude values - the deterministic-
decimal trick is not available inside Python workers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register


@register("j1_scalar_udf", "J1", """
SELECT o_orderkey,
       CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
            THEN 'expedite' ELSE 'standard' END AS lane
FROM orders
""", "Row-at-a-time Python UDF (the discouraged tier; oracle proves the "
     "same logic is a CASE expression)")
def j1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=T.StringType())
    def lane(priority: str) -> str:
        return "expedite" if priority[:2] in ("1-", "2-") else "standard"

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", lane("o_orderpriority").alias("lane"))


@register("j2_pandas_udf", "J2", """
SELECT event_id, ROUND(value * 2.0 + 1.0, 6) AS boosted
FROM events
""", "Arrow-vectorized scalar pandas UDF (series -> series; elementwise "
     "double math is bit-identical to the JVM, rounded as a cushion)")
def j2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def boost(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", F.round(boost("value"), 6).alias("boosted"))


@register("j3_grouped_agg_udaf", "J3", """
SELECT user_id,
       ROUND(MIN(value) + MAX(value), 6) AS minmax_sum
FROM events
GROUP BY user_id
""", "Grouped-aggregate pandas UDAF (series -> scalar per group); "
     "min+max avoids summation-order divergence entirely. Spark forbids "
     "mixing pandas UDAFs with JVM aggregates in one agg - a real "
     "constraint of the tier, noted here.")
def j3_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def minmax_sum(v: pd.Series) -> float:
        return float(v.min() + v.max())

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(minmax_sum("value"), 6).alias("minmax_sum"),
    )


@register("j4_apply_in_pandas", "J4", """
SELECT event_id, user_id,
       ROUND(value - MAX(value) OVER (PARTITION BY user_id), 6) AS below_peak
FROM events
""", "Grouped-map applyInPandas (pandas DF -> DF per key group) - the "
     "per-key custom-resolution shape the sync engine uses for "
     "non-relational per-key logic")
def j4_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def below_peak(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["event_id", "user_id"]].copy()
        out["below_peak"] = (pdf["value"] - pdf["value"].max()).round(6)
        return out

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        below_peak, "event_id bigint, user_id bigint, below_peak double"
    )


@register("j5_map_in_pandas", "J5", """
SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS token
FROM documents WHERE doc_id % 25 = 0
""", "Partition-wise mapInPandas tokenizer (1 row -> N rows through "
     "Arrow batches; the Python twin of the JVM explode in h4_explode)")
def j5_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["text"].str.lower().str.split(" ")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(toks.str.len()),
                    "token": [t for lst in toks for t in lst],
                }
            )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return d.select("doc_id", "text").mapInPandas(tokenize, "doc_id bigint, token string")


@register("j6_python_udtf", "J6", """
SELECT o_orderkey,
       CAST(STRING_SPLIT(o_orderpriority, '-')[1] AS INT) AS priority_num,
       STRING_SPLIT(o_orderpriority, '-')[2] AS priority_word
FROM orders WHERE o_orderkey % 50 = 0
""", "Python UDTF (table function): one row in, structured rows out "
     "with a declared schema")
def j6_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="priority_num int, priority_word string")
    class SplitPriority:
        def eval(self, priority: str):
            num, word = priority.split("-", 1)
            yield int(num), word

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    o.createOrReplaceTempView("_j6_orders")
    spark.udtf.register("split_priority", SplitPriority)
    return spark.sql(
        "SELECT o_orderkey, s.priority_num, s.priority_word "
        "FROM _j6_orders, LATERAL split_priority(o_orderpriority) s"
    )


@register("j7_sql_registration", "J7", """
SELECT c_custkey, UPPER(c_mktsegment) || ':' || CAST(c_nationkey AS VARCHAR) AS seg_key
FROM customer WHERE c_custkey % 20 = 0
""", "spark.udf.register: engine ops exposed to the SQL surface")
def j7_sql_registration(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udf.register(
        "seg_key", lambda seg, nk: f"{seg.upper()}:{nk}", T.StringType()
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 20 == 0)
    c.createOrReplaceTempView("_j7_customer")
    return spark.sql(
        "SELECT c_custkey, seg_key(c_mktsegment, c_nationkey) AS seg_key FROM _j7_customer"
    )


@register("j8_cogroup_apply_in_pandas", "J4+C3", """
WITH early AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders
  WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY o_custkey
),
late AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY o_custkey
)
SELECT COALESCE(early.o_custkey, late.o_custkey) AS custkey,
       COALESCE(early.n, 0) AS n_early,
       COALESCE(late.n, 0) AS n_late
FROM early FULL OUTER JOIN late ON early.o_custkey = late.o_custkey
""", "Cogrouped applyInPandas (the J-tier API j4 does not touch): "
     "TWO DataFrames cogrouped on the key, each key's pair of "
     "pandas frames handed to one Python function - the shape for "
     "custom cross-source per-key logic (era-over-era comparison, "
     "pandas-side as-of merges, per-key reconciliation that needs "
     "imperative code). Arrow moves both sides; the function here "
     "counts each era, and the oracle's full-outer-join of two "
     "aggregates must match exactly - including keys present in "
     "only one era (one of the two frames arrives EMPTY, the edge "
     "case this API is prone to getting wrong).")
def j8_cogroup_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    early = o.filter(
        F.expr("o_orderdate < TIMESTAMP_NTZ '1996-01-01 00:00:00'")
    ).select("o_custkey", "o_orderkey")
    late = o.filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'")
    ).select("o_custkey", "o_orderkey")

    def era_counts(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": [key[0]], "n_early": [len(left)], "n_late": [len(right)]}
        )

    return early.groupBy("o_custkey").cogroup(late.groupBy("o_custkey")).applyInPandas(
        era_counts, "custkey bigint, n_early bigint, n_late bigint"
    )
