"""I6 on the Spark 4.x StatefulProcessor API (transformWithStateInPandas)
with the protobuf-gated compat adapter: stream output must equal the
batch LWW projection, matching the 3.x-API machine exactly."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.streaming.incremental import (
    read_events_stream,
    stage_events_stream,
)
from cassandra_elasticsearch_sync_spark.streaming.transform_state import (
    OUTPUT_SCHEMA,
    RunningMaxProcessor,
    _protobuf_available,
    _SchemaProbeHandle,
    transform_running_max_stream,
    transform_with_state_compat,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_stream(spark, df, name):
    from cassandra_elasticsearch_sync_spark.streaming.control import await_bounded

    ckpt = tempfile.mkdtemp(prefix="ces_tws_ckpt_")
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", ckpt).start()
    )
    await_bounded(q, 300)
    out = spark.table(name).persist()
    out.count()
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def test_processor_declares_single_value_state():
    probe = _SchemaProbeHandle()
    RunningMaxProcessor().init(probe)
    assert probe.n_states == 1
    assert "max_value" in probe.schema


def test_transform_state_stream_equals_batch_machine(spark):
    """The 4.x-API machine (via whatever transport this environment
    supports) must converge to the same final per-user state as the
    declarative batch twin."""
    staged = stage_events_stream(spark, SF_DIR, n_chunks=3)
    try:
        out = _run_stream(
            spark,
            transform_running_max_stream(read_events_stream(spark, staged)),
            "tws_eq_out",
        )
        assert out.schema == OUTPUT_SCHEMA
        # Converged state per user: last emission by (es, event_id).
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("es").desc(), F.col("event_id").desc())
        final = (
            out.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "running_max", F.col("es").alias("last_es"))
        )
        # Batch twin: per (user, second) the first event_id advances the
        # machine; running max folds over advancing rows.
        from cassandra_elasticsearch_sync_spark.catalog import load_table

        e = load_table(spark, SF_DIR, "events").select(
            "user_id", "event_id",
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"),
            "value",
        )
        w2 = Window.partitionBy("user_id", "es").orderBy("event_id")
        adv = (
            e.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") == 1)
        )
        twin = adv.groupBy("user_id").agg(
            F.max("value").alias("running_max"),
            F.max("es").alias("last_es"),
        )
        assert final.exceptAll(twin).unionAll(twin.exceptAll(final)).isEmpty()
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def test_native_and_adapter_choose_by_protobuf(spark):
    """In this container protobuf is absent, so the builder must take
    the adapter path (native would crash the TWS driver worker); if
    protobuf IS present the native path must at least plan."""
    staged = stage_events_stream(spark, SF_DIR, n_chunks=1)
    try:
        df = transform_running_max_stream(read_events_stream(spark, staged))
        plan = df._jdf.queryExecution().logical().toString()
        if _protobuf_available():
            assert "transformWithState" in plan or "TransformWithState" in plan
        else:
            assert "FlatMapGroupsInPandasWithState" in plan or \
                "applyInPandasWithState" in plan.lower() or "flatmapgroups" in plan.lower()
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def test_adapter_rejects_multi_state_processors(spark):
    class TwoStates(RunningMaxProcessor):
        def init(self, handle):
            handle.getValueState("a", "x bigint")
            handle.getValueState("b", "y bigint")

    staged = stage_events_stream(spark, SF_DIR, n_chunks=1)
    try:
        grouped = read_events_stream(spark, staged).groupBy("user_id")
        with pytest.raises(NotImplementedError):
            transform_with_state_compat(grouped, TwoStates, OUTPUT_SCHEMA)
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def test_matches_3x_api_machine(spark):
    """Same input, same emissions as the applyInPandasWithState machine
    from streaming/stateful.py (single ordered chunk -> deterministic)."""
    from cassandra_elasticsearch_sync_spark.streaming.stateful import (
        running_max_stream,
    )

    staged = stage_events_stream(spark, SF_DIR, n_chunks=1)
    try:
        a = _run_stream(
            spark,
            transform_running_max_stream(read_events_stream(spark, staged)),
            "tws_a_out",
        )
        b = _run_stream(
            spark,
            running_max_stream(read_events_stream(spark, staged)),
            "tws_b_out",
        )
        assert a.exceptAll(b).unionAll(b.exceptAll(a)).isEmpty()
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def test_native_path_output_identical_when_protobuf_present(spark):
    """VERDICT r4 #10: when the env gains protobuf, the native
    transformWithStateInPandas wire and the compat adapter must emit
    IDENTICAL rows for the same staged input - i6d then silently
    upgrades (transform_running_max_stream's auto switch). Skipped
    (not passed vacuously) where the transport is absent."""
    from cassandra_elasticsearch_sync_spark.streaming.transform_state import (
        _protobuf_available,
    )

    if not _protobuf_available():
        pytest.skip("protobuf transport absent: native TWS wire "
                    "cannot start in this container")
    staged = stage_events_stream(spark, SF_DIR, n_chunks=3)
    try:
        native = _run_stream(
            spark,
            transform_running_max_stream(read_events_stream(spark, staged),
                                         force_native=True),
            "tws_native_out",
        )
        adapter = _run_stream(
            spark,
            transform_running_max_stream(read_events_stream(spark, staged),
                                         force_native=False),
            "tws_adapter_out",
        )
        assert sorted(map(tuple, native.collect())) == \
            sorted(map(tuple, adapter.collect()))
    finally:
        shutil.rmtree(staged, ignore_errors=True)
