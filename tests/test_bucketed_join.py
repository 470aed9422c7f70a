"""Bucketed co-located join: the physical plan must show the payoff -
no Exchange on either side of the orders x lineitem join when both
tables are bucketed on the join key with matching bucket counts, and
results identical to the plain shuffled join."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.sources.bucketing import create_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    root = tempfile.mkdtemp(prefix="bucketed_")
    create_bucketed(spark, o, "b_orders", f"{root}/orders", "o_orderkey", 8)
    create_bucketed(spark, li, "b_lineitem", f"{root}/lineitem", "l_orderkey", 8)
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _join(o, li):
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias("rev_c"),
        )
    )


def test_bucketed_join_elides_exchange(spark, bucketed):
    bo, bli = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force a non-broadcast join so the distribution requirement is real.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bo.join(bli, bo.o_orderkey == bli.l_orderkey).select(
            "o_orderkey", "l_linenumber"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # Note: Spark 4 still inserts the per-task Sort even with
        # SORTED BY + one file per bucket - local, linear, and cheap
        # next to the shuffle it replaced; the Exchange elision above
        # is the scale property we are buying.

        # The plain parquet join, by contrast, must shuffle both sides.
        o = load_table(spark, SF_DIR, "orders")
        li = load_table(spark, SF_DIR, "lineitem")
        plain = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_linenumber"
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_results_match_plain(spark, bucketed):
    bo, bli = bucketed
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    got = {tuple(r) for r in _join(bo, bli).collect()}
    want = {tuple(r) for r in _join(o, li).collect()}
    assert got == want


def test_bucket_pruning_scans_single_bucket(spark, bucketed):
    bo, _ = bucketed
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        # The planner downgrades lone scans to non-bucketed (it only
        # keeps bucketing when an operator needs the distribution);
        # pruning requires the bucketed scan, so pin it on.
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        key = bo.select(F.min("o_orderkey")).first()[0]
        pruned = bo.filter(F.col("o_orderkey") == key)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert pruned.count() >= 1
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )
