"""I6 stateful operator: streaming state machine vs batch equivalent."""

from __future__ import annotations

import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.streaming import incremental as inc
from cassandra_elasticsearch_sync_spark.streaming.stateful import running_max_stream

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_running_max_equals_batch_window(spark):
    staged = inc.stage_events_stream(spark, SF_DIR, n_chunks=4)
    try:
        ev = inc.read_events_stream(spark, staged)
        q = (
            running_max_stream(ev)
            .writeStream.format("memory")
            .queryName("t_stateful")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("t_stateful").select("user_id", "event_id", "running_max")

        # Batch twin: running max over the per-user (es, event_id) order.
        b = load_table(spark, SF_DIR, "events").select(
            "user_id", "event_id",
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"),
            "value",
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("es", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = b.withColumn("running_max", F.max("value").over(w)).select(
            "user_id", "event_id", "running_max"
        )
        # Stale-suppression: rows sharing a second with a predecessor are
        # dropped by the state machine; compare on the emitted subset.
        got_rows = {(r[0], r[1]): r[2] for r in got.collect()}
        want_rows = {(r[0], r[1]): r[2] for r in want.collect()}
        assert got_rows  # emitted something
        for k, v in got_rows.items():
            assert abs(want_rows[k] - v) < 1e-9, (k, v, want_rows[k])
    finally:
        shutil.rmtree(staged, ignore_errors=True)
