"""I6: custom stateful per-key processing (applyInPandasWithState).

The sync engine's per-key state machine: for every key, remember the
latest (version, value) seen so far and emit a row only when the
incoming record actually advances the version - i.e. the streaming
form of LWW with suppression of stale updates. This is exactly the
state the reference kept "partially outside" the process
(BASELINE.json:6); here it lives in Spark's checkpointed state store,
sharded by key.

Scale notes: state is O(#live keys) and partitioned by the groupBy
key; the state store scales horizontally with executors and is
persisted per micro-batch to the checkpoint. Timeouts would evict
idle keys in a production deployment (not enabled here so the tests
are deterministic).

Verification: rows-only by nature (the oracle cannot run a state
machine), but tests/test_stateful.py asserts the streaming output
equals the batch LWW projection of the same data - the honest
equivalence check (SURVEY.md 2.I).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("es", T.LongType()),
        T.StructField("running_max", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_value", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("last_es", T.LongType()),
    ]
)


def running_max_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running max + arrival counter with stale suppression:
    rows at-or-before the last processed event time are counted but
    emit nothing new (the LWW 'ignore stale update' rule)."""
    (user_id,) = key
    if state.exists:
        max_value, n_seen, last_es = state.get
    else:
        max_value, n_seen, last_es = float("-inf"), 0, -1

    out = []
    # A micro-batch is UNORDERED by contract: the group's rows arrive
    # as multiple Arrow chunks whose boundary cuts are arbitrary, so
    # sorting each chunk separately still lets a later-second row
    # overtake an earlier one across the boundary and poison the
    # stale-suppression rule (observed as a 2-in-1500-keys
    # nondeterminism at sf0.1). Materialize the group's batch and
    # order it ONCE by event time - the well-defined semantics for a
    # state machine fed by an unordered micro-batch.
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks).sort_values(["es", "event_id"])
        for r in pdf.itertuples():
            n_seen += 1
            if r.es <= last_es:
                continue  # stale delivery - state unchanged
            last_es = int(r.es)
            if r.value > max_value:
                max_value = float(r.value)
            out.append((user_id, int(r.event_id), int(r.es), max_value, n_seen))
    state.update((max_value, n_seen, last_es))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "es", "running_max", "n_seen"]
        )


def running_max_stream(events: DataFrame) -> DataFrame:
    """Apply the per-key state machine to a (streaming) events frame."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        running_max_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Registered rows-only query form (driver-runnable): executes the state
# machine over the staged event stream with trigger(availableNow) and
# returns the emitted rows as a batch DataFrame.
# --------------------------------------------------------------------------

from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402
from cassandra_elasticsearch_sync_spark.streaming.control import await_bounded  # noqa: E402


@register("i6_stateful_running_max", "I6", None,
          "applyInPandasWithState per-user state machine (running max + "
          "stale-delivery suppression). Rows-only: the oracle cannot run "
          "a state machine; batch equivalence is asserted in "
          "tests/test_stateful.py.")
def i6_stateful_running_max(spark, sf_dir):
    import shutil

    import tempfile

    from cassandra_elasticsearch_sync_spark.streaming.incremental import (
        read_events_stream,
        stage_events_stream,
    )

    staged = stage_events_stream(spark, sf_dir, n_chunks=3)
    ckpt = tempfile.mkdtemp(prefix="ces_i6_ckpt_")
    name = "i6_stateful_out"
    q = (
        running_max_stream(read_events_stream(spark, staged))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    await_bounded(q, 300)
    out = spark.table(name).persist()
    out.count()  # materialize before the scratch dirs vanish
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# I6b: the state machine's CONVERGED state, oracle-backed. A state
# machine's emission log is batching-dependent, but its final state is
# a pure function of the (deterministically ordered) input - so replay
# the stream once (availableNow over a single time-ordered file, i.e.
# per-user processing order = (es, event_id) exactly), take the LAST
# emission per user, and hash-match it against the SQL twin: per
# (user, second) only the first row by event_id advances the machine
# (stale suppression), the running max folds over those rows.
# --------------------------------------------------------------------------


@register("i6b_stateful_final_state", "I6", """
WITH p AS (
  SELECT user_id,
         CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es,
         event_id, value
  FROM events
),
r AS (
  SELECT user_id, es, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, es ORDER BY event_id) AS rn
  FROM p
)
SELECT user_id,
       MAX(CASE WHEN rn = 1 THEN value END) AS running_max,
       MAX(es) AS last_es
FROM r GROUP BY user_id
""", "Converged final state of the I6 per-user state machine, "
     "oracle-backed: the stream replays the time-ordered feed with "
     "trigger(availableNow) through applyInPandasWithState (real "
     "state store, real Arrow state passing), the last emission per "
     "user IS the final (running_max, last_es) state, and it must "
     "hash-match the declarative twin - per (user, second) only the "
     "first row by event_id advances the machine, later same-second "
     "deliveries are suppressed as stale. Single time-ordered file "
     "so the replay order is a pure function of the data (the "
     "multi-batch persistence path stays covered by i6 + "
     "tests/test_stateful.py).")
def i6b_stateful_final_state(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.streaming.incremental import (
        read_events_stream,
        stage_events_stream,
    )

    staged = stage_events_stream(spark, sf_dir, n_chunks=1)
    ckpt = tempfile.mkdtemp(prefix="ces_i6b_ckpt_")
    name = "i6b_stateful_out"
    q = (
        running_max_stream(read_events_stream(spark, staged))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    await_bounded(q, 300)
    emitted = spark.table(name).persist()
    emitted.count()  # materialize before the scratch dirs vanish
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    w = Window.partitionBy("user_id").orderBy(F.col("es").desc(), F.col("event_id"))
    return (
        emitted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "running_max", F.col("es").alias("last_es"))
    )


# --------------------------------------------------------------------------
# I6c: timeout-driven sessionization - the GroupStateTimeout capability
# --------------------------------------------------------------------------

SESSION_GAP_S = 1800

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_es", T.LongType()),
        T.StructField("duration_s", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start_es", T.LongType()),
        T.StructField("last_es", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def session_timeout_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Gap-based sessionizer with EVENT-TIME TIMEOUT eviction: the open
    session lives in state; when the watermark passes last_es + gap the
    state times out, the session is emitted, and the key's state is
    REMOVED - idle keys cost nothing, which is what makes per-key state
    viable when keys are unbounded (the production eviction the i6
    machine's docstring deferred). Sessions that close because a
    same-batch event starts a new one emit immediately."""
    (user_id,) = key
    if state.hasTimedOut:
        start_es, last_es, n = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, start_es, last_es - start_es, n)],
            columns=["user_id", "session_start_es", "duration_s", "n_events"],
        )
        return

    if state.exists:
        start_es, last_es, n = state.get
    else:
        start_es = last_es = None
        n = 0
    out = []
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks).sort_values("es")
        for r in pdf.itertuples():
            es = int(r.es)
            if start_es is None:
                start_es, last_es, n = es, es, 1
            elif es - last_es > SESSION_GAP_S:
                out.append((user_id, start_es, last_es - start_es, n))
                start_es, last_es, n = es, es, 1
            else:
                last_es, n = es, n + 1
    state.update((start_es, last_es, n))
    # fire once the watermark proves no event can extend this session
    state.setTimeoutTimestamp((last_es + SESSION_GAP_S) * 1000)
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start_es", "duration_s", "n_events"],
        )


def session_timeout_stream(events: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    prepared = events.withWatermark("ts", "1 hour").select(
        "user_id", "ts",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        session_timeout_fn,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


@register("i6c_stateful_session_timeout", "I6+I4", """
WITH e AS (
  SELECT user_id,
         CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es
  FROM events
),
flagged AS (
  SELECT user_id, es,
         CASE WHEN es - LAG(es) OVER w > 1800 OR LAG(es) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)
),
sessions AS (
  SELECT user_id, es,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY es
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(es) AS session_start_es,
       MAX(es) - MIN(es) AS duration_s,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""", "Custom stateful sessionization with EVENT-TIME TIMEOUT "
     "(applyInPandasWithState + GroupStateTimeout.EventTimeTimeout), "
     "oracle-backed: the open session per user lives in the state "
     "store and is emitted+EVICTED when the watermark passes its "
     "last event + 30 min - the mechanism that keeps per-key state "
     "bounded under unbounded key cardinality (i6's documented "
     "production gap, now demonstrated). Sentinel flush chunks "
     "advance the final watermark so every real session times out; "
     "the converged emissions hash-match the batch gaps-and-islands "
     "oracle - eviction timing provably never mis-splits a session "
     "because staged chunks are time-contiguous, so any event that "
     "could extend a session arrives before the watermark can pass "
     "its gap horizon.")
def i6c_stateful_session_timeout(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.streaming.incremental import (
        _SENTINEL_USER,
        _append_watermark_flush_chunks,
        read_events_stream,
        stage_events_stream,
    )

    staged = stage_events_stream(spark, sf_dir, n_chunks=4)
    _append_watermark_flush_chunks(spark, staged, sf_dir)
    checkpoint = tempfile.mkdtemp(prefix="ces_i6c_ckpt_")
    outdir = tempfile.mkdtemp(prefix="ces_i6c_out_")
    try:
        q = (
            session_timeout_stream(read_events_stream(spark, staged))
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_bounded(q, 300)
        return (
            spark.read.parquet(outdir)
            .filter(F.col("user_id") != _SENTINEL_USER)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)
