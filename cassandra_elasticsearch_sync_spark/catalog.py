"""Table catalog: load the corpus parquet tables and register views.

The reference syncs two physical stores (a Cassandra table and an
Elasticsearch index, BASELINE.json:6). In this engine every store
surface is a DataFrame behind a named view; the parquet corpus at
``/root/testdata/sf*/`` stands in for both stores' full scans
(SURVEY.md section 2.A rows A1-A3). Production would swap the reader
in sources/ for spark-cassandra-connector / elasticsearch-hadoop
without touching any operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Every table the driver's DuckDB oracle pre-registers (FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor -- at 100 TB, region/nation are still tiny and supplier/part
# grow slowly; Catalyst's size-based auto-broadcast handles the rest.
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Shared relation cache (round 5, VERDICT r4 #4): a driver/bench run
# calls dozens of registered queries against the same handful of
# corpus tables, and every `spark.read.parquet` re-lists the path and
# re-reads parquet footers to infer the schema. Caching the ANALYZED
# DataFrame per (session, resolved path, path mtime) shares one
# InMemoryFileIndex + schema across the whole run. The mtime in the
# key makes the cache safe against a path being rewritten mid-session
# (tests that stage scratch corpora): any file add/remove/replace
# bumps the directory or file mtime and misses the cache. DataFrames
# are immutable, so sharing the object is free.
_RELATION_CACHE: dict[tuple, DataFrame] = {}
_RELATION_CACHE_MAX = 512


def _cache_key(spark: SparkSession, path: str):
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    return (spark.sparkContext.applicationId, os.path.realpath(path), mtime)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table.

    Plain ``spark.read.parquet`` so Catalyst keeps full pushdown: any
    filter/projection an operator applies lands in the parquet scan
    (PushedFilters/ReadSchema), which at 100 TB is the difference
    between scanning a partition and scanning the lake.

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (round-1
    corpus) and TIMESTAMP(MICROS) (round-2 corpus). Spark 4 rejects
    NANOS outright unless it is read as a raw nanosecond long
    (``spark.sql.legacy.parquet.nanosAsLong``); we set that conf at
    runtime (the driver may hand us its own session) and, ONLY when the
    column actually arrives as a long, rebuild the timestamp with exact
    integer division — the ns epoch (~1.7e18) exceeds double's 2^53
    exact range, so float division would corrupt microseconds. A MICROS
    corpus reads natively as timestamp and passes through untouched.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Engine invariant: epoch/formatting semantics are defined in UTC
    # (oracle parity - DuckDB's epoch() of a naive timestamp is
    # UTC-based). The driver may hand us its own session, so pin the
    # conf here rather than only in our session factory.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = table_path(sf_dir, name)
    key = _cache_key(spark, path)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # NANOS corpus read as raw long
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Normalize to the session-TZ timestamp every operator was
            # written against; session TZ is pinned UTC above, so this
            # is a pure type relabel of the same wall-clock instant.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    if len(_RELATION_CACHE) >= _RELATION_CACHE_MAX:
        _RELATION_CACHE.clear()
    _RELATION_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each corpus table as a temp view (for spark.sql paths)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
