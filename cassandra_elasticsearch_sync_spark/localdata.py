"""Tiny driver-local DataFrames without the 32-slice Python-RDD tax.

``SparkSession.createDataFrame(list, schema)`` parallelizes the rows
into ``defaultParallelism`` slices - 32 near-empty Python partitions
for a 3-row relation at ``local[32]``. Every evaluation of such a plan
pays one JVM<->Python worker round PER SLICE (measured ~130-175 ms
each on a cold worker), and any downstream ``coalesce(1)`` iterates
the parent slices INSIDE one task, i.e. 32 rounds SERIALLY: persisting
a 3-row ledger measured 6-8 s at local[32] (round 13, guide §4 - the
Python boundary is per-partition, not per-row).

``tiny_df`` keeps the exact createDataFrame conversion/verification
semantics (same row converter, same schema coercion - it only hands
createDataFrame a pre-sliced RDD) but puts ALL rows in ONE slice, so
the plan costs one Python round instead of defaultParallelism rounds.
Use it for any driver-local relation that is small by construction
(probe rows, lexicons, request tables, empty relations); data that
should parallelize keeps the stock API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def tiny_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL driver-local
    ``rows``, materialized as ONE partition (order preserved)."""
    rdd = spark.sparkContext.parallelize(rows if rows else [], 1)
    return spark.createDataFrame(rdd, schema)
