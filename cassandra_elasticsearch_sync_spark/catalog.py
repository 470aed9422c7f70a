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
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # NANOS corpus read as raw long
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Normalize to the session-TZ timestamp every operator was
            # written against; session TZ is pinned UTC above, so this
            # is a pure type relabel of the same wall-clock instant.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each corpus table as a temp view (for spark.sql paths)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
