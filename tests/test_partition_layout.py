"""Hive-style partitioned layout: writes partitioned by a low-
cardinality column must yield scans whose PartitionFilters prune
directories at planning time - the other half (with bucketing) of the
storage story that makes a 100 TB lake queryable. A date/type filter
that scans every file is the difference between touching 1/n of the
lake and touching all of it."""

from __future__ import annotations

import re
import tempfile

import pytest
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned_events(spark):
    ev = load_table(spark, SF_DIR, "events")
    root = tempfile.mkdtemp(prefix="part_events_")
    (
        ev.withColumn("day", F.date_trunc("day", "ts").cast("date"))
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(root)
    )
    yield root


def test_partition_filter_prunes_directories(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    one_type = df.filter(F.col("event_type") == "click")
    plan = one_type._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan
    # The partition predicate must NOT appear as a data filter - it is
    # resolved against directory names, zero file footers opened.
    dm = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert dm is None or "event_type" not in dm.group(1)


def test_partition_values_round_trip(spark, partitioned_events):
    ev = load_table(spark, SF_DIR, "events")
    df = spark.read.parquet(partitioned_events)
    want = {
        tuple(r)
        for r in ev.groupBy("event_type").count().collect()
    }
    got = {tuple(r) for r in df.groupBy("event_type").count().collect()}
    assert got == want


def test_dynamic_partition_overwrite_replaces_only_touched(spark, partitioned_events):
    """INSERT OVERWRITE with dynamic partition mode must replace only
    the partitions present in the incoming batch - the idempotent
    re-run primitive for a partitioned sink (re-landing one day/type
    never truncates the rest of the table)."""
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df = spark.read.parquet(partitioned_events)
        before_click = df.filter(F.col("event_type") == "click").count()
        before_total = df.count()
        # Re-land ONLY the 'click' partition, halved (even event_ids).
        repl = (
            df.filter((F.col("event_type") == "click") & (F.col("event_id") % 2 == 0))
        )
        repl.write.mode("overwrite").partitionBy("event_type").parquet(
            partitioned_events
        )
        after = spark.read.parquet(partitioned_events)
        after_click = after.filter(F.col("event_type") == "click").count()
        assert after_click < before_click
        # Every other partition untouched.
        assert (
            after.filter(F.col("event_type") != "click").count()
            == before_total - before_click
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def test_dynamic_partition_pruning_on_dim_filter(spark, partitioned_events):
    """Dynamic partition pruning: joining the partitioned fact to a
    FILTERED tiny dimension must inject the dim's keys as a runtime
    partition filter on the fact scan (dynamicpruning expression in
    the plan) - at 100 TB this is what turns 'join against 3 of 500
    event types' into a 3-directory scan without the user naming the
    partitions."""
    fact = spark.read.parquet(partitioned_events)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 9.9)],
        "event_type string, weight double",
    ).filter("weight > 0.6")
    joined = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
