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


# ---------------------------------------------------------------------------
# Checkpoint-resume equivalence (VERDICT r6 #4): the state store must
# carry per-key state across a query restart - the one exactly-once
# claim not covered by the foreachBatch crash-injection test.
# ---------------------------------------------------------------------------

import glob
import os
import tempfile
import time


def _staged_files(staged):
    return sorted(glob.glob(os.path.join(staged, "part-*.parquet")),
                  key=os.path.getmtime)


def _copy_in_order(files, feed, phase):
    """Copy chunk files into the feed dir with STRICTLY INCREASING
    mtimes. The file source orders same-batch discoveries by
    (mtime, path); two copies landing in the same millisecond fall
    back to UUID-random path order, which can deliver chunk 2 before
    chunk 1 - the state machine then (correctly) suppresses chunk 1's
    rows as stale and the in-order batch oracle no longer applies
    (observed as a full-suite-load flake)."""
    import shutil as sh

    # Strictly increasing mtimes in the PAST: files appended later
    # with natural now-mtimes (the watermark-flush sentinels) must
    # still sort after every phase's chunks.
    base = time.time() - 1000
    for i, f in enumerate(files):
        dst = os.path.join(feed, os.path.basename(f))
        sh.copy(f, dst)
        t = base + phase * 100 + i
        os.utime(dst, (t, t))


def _start_running_max(spark, feed, ckpt, outdir):
    return (
        running_max_stream(inc.read_events_stream(spark, feed))
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def _running_max_oracle(spark):
    """Batch twin of the state machine's emission log: per (user,
    second) only the first row by event_id advances; running max over
    the advancing rows in (es, event_id) order."""
    b = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"),
        "value")
    w_rn = Window.partitionBy("user_id", "es").orderBy("event_id")
    adv = (b.withColumn("rn", F.row_number().over(w_rn))
           .filter(F.col("rn") == 1))
    w_cum = (Window.partitionBy("user_id").orderBy("es", "event_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return adv.withColumn("running_max", F.max("value").over(w_cum))


def _assert_final_state_matches_oracle(spark, got):
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("es").desc(), F.col("event_id"))
    final = {r["user_id"]: (r["es"], r["running_max"]) for r in
             got.withColumn("rn", F.row_number().over(w_last))
                .filter(F.col("rn") == 1).collect()}
    oracle = _running_max_oracle(spark)
    w_last_o = Window.partitionBy("user_id").orderBy(
        F.col("es").desc(), F.col("event_id"))
    want = {r["user_id"]: (r["es"], r["running_max"]) for r in
            oracle.withColumn("rn", F.row_number().over(w_last_o))
                  .filter(F.col("rn") == 1).collect()}
    assert final == want  # exact: max folds copy input doubles


def test_checkpoint_resume_two_phase_running_max(spark):
    """Graceful restart: run to completion on half the feed, add the
    rest, restart from the SAME checkpoint - per-user state must carry
    over (no running_max reset), emissions stay exactly-once, and the
    converged state hash-matches the batch oracle."""
    import shutil as sh

    staged = inc.stage_events_stream(spark, SF_DIR, n_chunks=4)
    feed = tempfile.mkdtemp(prefix="ces_resume_feed_")
    ckpt = tempfile.mkdtemp(prefix="ces_resume_ckpt_")
    outdir = tempfile.mkdtemp(prefix="ces_resume_out_")
    try:
        files = _staged_files(staged)
        assert len(files) == 4
        _copy_in_order(files[:2], feed, phase=0)
        q = _start_running_max(spark, feed, ckpt, outdir)
        q.awaitTermination(300)
        run1 = spark.read.parquet(outdir).persist()
        n1 = run1.count()
        assert n1 > 0
        # phase-A per-user max among ADVANCING rows (the state the
        # resumed query must remember)
        a_max = {r["user_id"]: r["m"] for r in
                 run1.groupBy("user_id")
                     .agg(F.max("running_max").alias("m")).collect()}
        _copy_in_order(files[2:], feed, phase=1)
        q2 = _start_running_max(spark, feed, ckpt, outdir)
        q2.awaitTermination(300)
        got = spark.read.parquet(outdir).persist()
        n_total = got.count()
        assert n_total > n1  # phase B emitted
        # exactly-once: the emission log has no duplicate events
        assert got.groupBy("user_id", "event_id").count() \
                  .filter(F.col("count") > 1).count() == 0
        # state continuity: no phase-B emission may fall below the
        # user's phase-A running max (a reset state would)
        run2 = got.join(run1, ["user_id", "event_id"], "left_anti")
        bad = [r for r in run2.collect()
               if r["user_id"] in a_max
               and r["running_max"] < a_max[r["user_id"]] - 1e-12]
        assert not bad, bad[:3]
        _assert_final_state_matches_oracle(spark, got)
        run1.unpersist(); got.unpersist()
    finally:
        for d in (staged, feed, ckpt, outdir):
            sh.rmtree(d, ignore_errors=True)


def test_checkpoint_resume_after_midstream_stop(spark):
    """Adversarial kill: stop() the query while batches remain, restart
    from the checkpoint, drain - wherever the kill lands, the resumed
    run must converge to the same oracle state with no duplicate
    emissions (state-store versioning makes batch replay idempotent)."""
    import shutil as sh

    staged = inc.stage_events_stream(spark, SF_DIR, n_chunks=8)
    ckpt = tempfile.mkdtemp(prefix="ces_kill_ckpt_")
    outdir = tempfile.mkdtemp(prefix="ces_kill_out_")
    try:
        q = _start_running_max(spark, staged, ckpt, outdir)
        # wait for the first completed batch, then kill mid-stream
        deadline = time.time() + 120
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(120)
        q2 = _start_running_max(spark, staged, ckpt, outdir)
        q2.awaitTermination(300)
        got = spark.read.parquet(outdir)
        assert got.groupBy("user_id", "event_id").count() \
                  .filter(F.col("count") > 1).count() == 0
        _assert_final_state_matches_oracle(spark, got)
    finally:
        for d in (staged, ckpt, outdir):
            sh.rmtree(d, ignore_errors=True)


def test_checkpoint_resume_session_timeout(spark):
    """Session-window resume: half the feed, restart with the rest +
    the watermark flush sentinels - sessions spanning the restart
    boundary must NOT split (the open session and the watermark both
    live in the checkpoint); converged sessions equal the batch
    gaps-and-islands oracle exactly."""
    import shutil as sh

    from cassandra_elasticsearch_sync_spark.streaming.incremental import (
        _SENTINEL_USER,
        _append_watermark_flush_chunks,
    )
    from cassandra_elasticsearch_sync_spark.streaming.stateful import (
        SESSION_GAP_S,
        session_timeout_stream,
    )

    staged = inc.stage_events_stream(spark, SF_DIR, n_chunks=4)
    feed = tempfile.mkdtemp(prefix="ces_sess_feed_")
    ckpt = tempfile.mkdtemp(prefix="ces_sess_ckpt_")
    outdir = tempfile.mkdtemp(prefix="ces_sess_out_")

    def start():
        return (
            session_timeout_stream(inc.read_events_stream(spark, feed))
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    try:
        files = _staged_files(staged)
        _copy_in_order(files[:2], feed, phase=0)
        q = start()
        q.awaitTermination(300)
        _copy_in_order(files[2:], feed, phase=1)
        _append_watermark_flush_chunks(spark, feed, SF_DIR)
        q2 = start()
        q2.awaitTermination(300)
        got = {(r["user_id"], r["session_start_es"]):
               (r["duration_s"], r["n_events"]) for r in
               spark.read.parquet(outdir)
                    .filter(F.col("user_id") != _SENTINEL_USER).collect()}
        # batch gaps-and-islands twin
        e = load_table(spark, SF_DIR, "events").select(
            "user_id",
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"))
        w = Window.partitionBy("user_id").orderBy("es")
        flagged = e.withColumn(
            "new_s",
            F.when(F.col("es") - F.lag("es").over(w) > SESSION_GAP_S, 1)
             .when(F.lag("es").over(w).isNull(), 1).otherwise(0))
        sess = flagged.withColumn(
            "sid", F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        want = {(r["user_id"], r["session_start_es"]):
                (r["duration_s"], r["n_events"]) for r in
                sess.groupBy("user_id", "sid").agg(
                    F.min("es").alias("session_start_es"),
                    (F.max("es") - F.min("es")).alias("duration_s"),
                    F.count("*").alias("n_events")).collect()}
        assert got == want
    finally:
        for d in (staged, feed, ckpt, outdir):
            sh.rmtree(d, ignore_errors=True)
