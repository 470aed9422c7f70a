"""I6 on the Spark 4.x arbitrary-state API: ``transformWithStateInPandas``.

Spark 4.x replaces ``applyInPandasWithState`` with the
``StatefulProcessor`` lifecycle (SPARK-46815 "arbitrary state v2"):
``init(handle)`` declares named state variables, ``handleInputRows``
advances them per key, timers replace ``GroupStateTimeout``. This
module implements the I6 running-max machine as a real
``StatefulProcessor`` and runs it through the new API.

Container gate (import-try, per the environment rules): the OSS
``transformWithStateInPySpark`` driver worker speaks protobuf to the
JVM state server, and ``google.protobuf`` is NOT installed here, so
the transport crashes at init
(``ImportError: cannot import name 'descriptor'``). When protobuf is
unavailable, ``transform_running_max_stream`` runs the SAME
``StatefulProcessor`` subclass through a thin adapter over
``applyInPandasWithState`` - still fully distributed, still the real
checkpointed state store, same semantics, same output; only the
state-transport wire format differs. The adapter enforces the subset
it can honor (exactly one ValueState, no timers) and raises loudly
otherwise. On a cluster with protobuf present the genuine 4.x path
runs unchanged (``force_native=True`` in tests).

Semantics (shared with streaming/stateful.py's 3.x-API machine, which
stays as the SURVEY I6 row): per user, order the micro-batch by
(event-second, event_id), suppress stale deliveries (at-or-before the
last processed second), emit a row per advancing event with the
running max and an arrival counter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("es", T.LongType()),
    T.StructField("running_max", T.DoubleType()),
    T.StructField("n_seen", T.LongType()),
])

_STATE_DDL = "max_value double, n_seen bigint, last_es bigint"


def _advance(state: tuple | None, pdf: pd.DataFrame, user_id: int):
    """The pure state transition both API frontends share: fold one
    (unordered) batch of a user's rows into (new_state, emissions)."""
    if state is not None:
        max_value, n_seen, last_es = state
    else:
        max_value, n_seen, last_es = float("-inf"), 0, -1
    out = []
    pdf = pdf.sort_values(["es", "event_id"])
    for r in pdf.itertuples():
        n_seen += 1
        if r.es <= last_es:
            continue  # stale delivery - state unchanged
        last_es = int(r.es)
        if r.value > max_value:
            max_value = float(r.value)
        out.append((user_id, int(r.event_id), int(r.es), max_value, n_seen))
    return (max_value, n_seen, last_es), out


class RunningMaxProcessor(StatefulProcessor):
    """The I6 machine on the 4.x lifecycle: one ValueState declared in
    ``init``, advanced per batch in ``handleInputRows``."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("running_max", _STATE_DDL)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        state = tuple(self._state.get()) if self._state.exists() else None
        chunks = list(rows)
        if chunks:
            state, out = _advance(state, pd.concat(chunks), user_id)
            self._state.update(state)
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["user_id", "event_id", "es",
                             "running_max", "n_seen"],
                )
        elif state is not None:
            self._state.update(state)

    def close(self) -> None:
        pass


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


# -- compat adapter: StatefulProcessor over applyInPandasWithState ----------


class _ShimValueState:
    """ValueState facade over the 3.x GroupState (single value)."""

    def __init__(self, gs):
        self._gs = gs

    def exists(self) -> bool:
        return self._gs.exists

    def get(self):
        return tuple(self._gs.get) if self._gs.exists else None

    def update(self, v) -> None:
        self._gs.update(tuple(v))

    def clear(self) -> None:
        self._gs.remove()


class _SchemaProbeHandle:
    """Records the single ValueState declaration made by ``init`` so
    the adapter can hand applyInPandasWithState its state schema at
    PLAN time (the 4.x API declares it at RUN time)."""

    def __init__(self):
        self.schema = None
        self.n_states = 0

    def getValueState(self, stateName, schema, ttlDurationMs=None):
        self.n_states += 1
        self.schema = schema
        return None

    def _unsupported(self, *a, **k):
        raise NotImplementedError(
            "compat adapter supports a single ValueState; list/map state "
            "and timers need the native transformWithStateInPandas path")

    getListState = getMapState = registerTimer = _unsupported


class _ShimHandle:
    def __init__(self, gs):
        self._gs = gs

    def getValueState(self, stateName, schema, ttlDurationMs=None):
        return _ShimValueState(self._gs)

    def _unsupported(self, *a, **k):
        raise NotImplementedError(
            "compat adapter supports a single ValueState; list/map state "
            "and timers need the native transformWithStateInPandas path")

    getListState = getMapState = registerTimer = _unsupported


def transform_with_state_compat(
    grouped, processor_factory, output_schema, state_probe=None
) -> DataFrame:
    """Run a ``StatefulProcessor`` through ``applyInPandasWithState``:
    the adapter calls the processor's own ``init``/``handleInputRows``
    per group, backing its declared ValueState with the GroupState
    slot. Distributed execution and checkpointed state are identical;
    only the python<->JVM state wire differs from the native path."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    probe = state_probe or _SchemaProbeHandle()
    processor_factory().init(probe)
    if probe.n_states != 1 or probe.schema is None:
        raise NotImplementedError(
            "compat adapter requires the processor to declare exactly "
            "one ValueState in init()")
    state_schema = (
        T._parse_datatype_string(probe.schema)
        if isinstance(probe.schema, str) else probe.schema
    )

    def fn(key, pdfs, group_state):
        p = processor_factory()
        p.init(_ShimHandle(group_state))
        yield from p.handleInputRows(key, pdfs, None)
        p.close()

    return grouped.applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transform_running_max_stream(events: DataFrame,
                                 force_native: bool | None = None) -> DataFrame:
    """The I6 running-max machine through the 4.x API - native
    ``transformWithStateInPandas`` when the protobuf transport exists,
    the compat adapter otherwise (``force_native`` pins a path)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"),
        "value",
    )
    grouped = prepared.groupBy("user_id")
    native = _protobuf_available() if force_native is None else force_native
    if native:
        return grouped.transformWithStateInPandas(
            statefulProcessor=RunningMaxProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    return transform_with_state_compat(
        grouped, RunningMaxProcessor, OUTPUT_SCHEMA)


# -- registered rows-only query ---------------------------------------------

from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402
from cassandra_elasticsearch_sync_spark.streaming.control import (  # noqa: E402
    await_bounded,
)


@register("i6d_transform_with_state", "I6", None,
          "The I6 per-user state machine on Spark 4.x's StatefulProcessor "
          "lifecycle (transformWithStateInPandas): state declared in "
          "init(), advanced in handleInputRows(). Rows-only (a state "
          "machine has no SQL oracle); stream==batch equivalence and the "
          "native-vs-adapter path choice are tested in "
          "tests/test_transform_state.py. In this container the protobuf "
          "state transport is absent, so the SAME processor runs through "
          "the applyInPandasWithState adapter - distributed, checkpointed, "
          "identical output by construction.")
def i6d_transform_with_state(spark, sf_dir):
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.streaming.incremental import (
        read_events_stream,
        stage_events_stream,
    )

    staged = stage_events_stream(spark, sf_dir, n_chunks=3)
    ckpt = tempfile.mkdtemp(prefix="ces_i6d_ckpt_")
    name = "i6d_tws_out"
    q = (
        transform_running_max_stream(read_events_stream(spark, staged))
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
