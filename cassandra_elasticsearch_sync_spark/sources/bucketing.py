"""Bucketed table layout: the co-located fact-fact join (SURVEY.md 2.A
storage tier, 100 TB design).

A repeated big-big join (orders x lineitem on orderkey every sync
cycle) pays a full shuffle of BOTH sides each run. Bucketing is the
classic amortization: write each table hash-clustered into the same
number of buckets on the join key; Spark's scan then reports a
HashPartitioning that satisfies the join's distribution requirement,
and the physical plan contains NO Exchange on either side - the join
runs entirely map-side, partition i against partition i. At 100 TB
that converts the dominant repeated cost (two full-network shuffles)
into a one-time layout cost at ingest.

We create the tables with explicit DDL (``CLUSTERED BY ... INTO n
BUCKETS`` + ``LOCATION``) rather than ``DataFrameWriter.bucketBy``
so the data lands in a caller-chosen scratch directory instead of the
session warehouse - the same mechanics, but driver-session-friendly.

Cluster notes:
- bucket counts must MATCH on both sides (or be integer multiples on
  Spark 4 with bucket coalescing) for the exchange to be elided;
- ``SORTED BY`` the join key additionally removes the per-task sort
  under SortMergeJoin;
- bucket pruning applies equality filters on the bucket key at scan
  time (scan 1/n of the files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    location: str,
    bucket_key: str,
    n_buckets: int,
) -> None:
    """(Re)create ``table`` at ``location`` bucketed+sorted on
    ``bucket_key`` into ``n_buckets``, and load ``df`` into it."""
    cols = ", ".join(f"`{name}` {dtype}" for name, dtype in df.dtypes)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING PARQUET "
        f"CLUSTERED BY (`{bucket_key}`) SORTED BY (`{bucket_key}`) "
        f"INTO {n_buckets} BUCKETS LOCATION '{location}'"
    )
    # One writing task per bucket -> exactly one file per bucket, which
    # is the layout Spark requires before it will trust the SORTED BY
    # metadata and elide the per-task sort under SortMergeJoin.
    # repartition() and bucketing share the Murmur3 hash, so output
    # partition i IS bucket i.
    from pyspark.sql import functions as F

    df.repartition(n_buckets, F.col(bucket_key)).write.mode(
        "overwrite"
    ).insertInto(table)
