"""End-to-end SyncEngine: bootstrap + incremental cycles converge and
are idempotent - the reference's whole program, verified - on BOTH
store backends: the snapshot-swap ParquetStore baseline and the ACID
AcidStore whose apply is a copy-on-write MERGE (VERDICT r3 #1)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.sync.engine import (
    AcidStore,
    ParquetStore,
    SyncEngine,
)
from cassandra_elasticsearch_sync_spark.sync.ops import side_a, side_b

SF_DIR = "/root/testdata/sf0.001"

STORES = [ParquetStore, AcidStore]


def _mk_engine(spark, store_cls=ParquetStore):
    root = tempfile.mkdtemp(prefix="ces_engine_")
    a = store_cls(spark, f"{root}/a",
                  side_a(spark, SF_DIR).withColumn("side", F.lit("a")))
    b = store_cls(spark, f"{root}/b",
                  side_b(spark, SF_DIR).withColumn("side", F.lit("b")))
    return SyncEngine(spark, a, b, f"{root}/state"), root


@pytest.mark.parametrize("store_cls", STORES)
def test_full_sync_then_idempotent_cycles(spark, store_cls):
    eng, root = _mk_engine(spark, store_cls)
    try:
        assert not eng.in_sync()
        eng.full_sync()
        assert eng.in_sync()
        # Nothing changed since the watermark -> cycle ships 0 rows.
        assert eng.incremental_cycle() == 0
        assert eng.in_sync()
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.parametrize("store_cls", STORES)
def test_incremental_ships_local_edit(spark, store_cls):
    eng, root = _mk_engine(spark, store_cls)
    try:
        eng.full_sync()
        # Local edit on B after the sync point: bump one key's version.
        b = eng.b.read()
        edited = b.withColumn(
            "price",
            F.when(F.col("key") == 7, F.col("price") + 1000).otherwise(F.col("price")),
        ).withColumn(
            # A real LWW write stamps the CURRENT time - i.e. newer than
            # every synced version, hence newer than the watermark.
            "version",
            F.when(F.col("key") == 7,
                   F.lit(dt.datetime(2002, 1, 1)).cast("timestamp"))
             .otherwise(F.col("version")),
        )
        eng.b.overwrite(edited.localCheckpoint(eager=True))
        shipped = eng.incremental_cycle()
        assert shipped >= 1
        assert eng.in_sync()
        got = eng.a.read().filter(F.col("key") == 7).collect()[0]
        want = edited.filter(F.col("key") == 7).collect()[0]
        assert got["price"] == want["price"]
        # Second cycle: converged, nothing to ship.
        assert eng.incremental_cycle() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.parametrize("store_cls", STORES)
def test_equal_version_boundary_write_is_not_lost(spark, store_cls):
    """A write landing AFTER the watermark advance with version exactly
    EQUAL to the watermark must still ship (inclusive >= boundary);
    a strict > would silently drop it forever."""
    from cassandra_elasticsearch_sync_spark.sources.storage import load_watermark

    eng, root = _mk_engine(spark, store_cls)
    try:
        eng.full_sync()
        wm = load_watermark(spark, f"{root}/state")
        new_row = spark.createDataFrame(
            [(999999, 123.45, wm, "b")], "key bigint, price double, "
            "version timestamp, side string"
        )
        eng.b.overwrite(
            eng.b.read().unionByName(new_row).localCheckpoint(eager=True))
        assert eng.incremental_cycle() >= 1
        assert eng.a.read().filter(F.col("key") == 999999).count() == 1
        assert eng.in_sync()
        assert eng.incremental_cycle() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_acid_cycle_is_copy_on_write(spark):
    """The 100 TB property the AcidStore exists for: an incremental
    cycle shipping a NARROW key range rewrites only the manifest
    entries whose key stats intersect it - most data files carry over
    byte-for-byte into the post-cycle snapshot."""
    eng, root = _mk_engine(spark, AcidStore)
    try:
        eng.full_sync()
        # Edit a narrow key range on B via the ACID table itself
        # (update_where = CoW on B), stamped newer than the watermark.
        eng.b.table.update_where(
            F.col("key") <= 50,
            {"price": F.col("price") + 1000.0,
             "version": F.lit(dt.datetime(2003, 1, 1)).cast("timestamp")},
        )
        a_before = set(eng.a.table._manifest(
            eng.a.table.current_version())["files"])
        assert eng.incremental_cycle() >= 1
        assert eng.in_sync()
        m_after = eng.a.table._manifest(eng.a.table.current_version())
        carried = a_before & set(m_after["files"])
        # 16 range-clustered slices; keys <= 50 live in few of them.
        assert len(carried) >= len(a_before) - 4, (
            f"expected CoW carry-over, kept {len(carried)}/{len(a_before)}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_acid_cycle_crash_retry_is_idempotent(spark):
    """At-least-once safety on the ACID path: re-applying the SAME
    shipped delta (crash between apply and watermark advance -> next
    cycle re-extracts and re-applies) leaves the store unchanged."""
    eng, root = _mk_engine(spark, AcidStore)
    try:
        eng.full_sync()
        eng.b.table.update_where(
            F.col("key") % 13 == 1,
            {"price": F.col("price") * 2.0,
             "version": F.lit(dt.datetime(2003, 6, 1)).cast("timestamp")},
        )
        assert eng.incremental_cycle() >= 1
        before = sorted(tuple(r) for r in eng.a.read().collect())
        # Simulate the crash-retry: apply the already-applied delta again.
        delta = eng.b.read().filter(F.col("key") % 13 == 1)\
            .localCheckpoint(eager=True)
        eng.a.apply_delta(delta)
        after = sorted(tuple(r) for r in eng.a.read().collect())
        assert before == after
        assert eng.in_sync()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_scd2_apply_semantics(spark):
    import datetime as dt

    from cassandra_elasticsearch_sync_spark.sync.ops import scd2_apply

    ts = lambda d: dt.datetime(2000, 1, d)  # noqa: E731
    dim = spark.createDataFrame(
        [(1, 10.0, ts(1), None, True),
         (2, 20.0, ts(1), None, True),
         (3, 30.0, ts(1), None, True)],
        "key bigint, price double, valid_from timestamp, "
        "valid_to timestamp, is_current boolean")
    upd = spark.createDataFrame(
        [(1, 11.0, ts(5)),    # changed -> close + open
         (2, 20.0, ts(5)),    # same value -> no-op
         (3, 31.0, ts(1)),    # ts NOT after valid_from -> guarded no-op
         (9, 90.0, ts(5))],   # new key -> first row
        "key bigint, price double, version timestamp")
    out = scd2_apply(dim, upd, "key", "price", "version")
    rows = {(r["key"], r["valid_from"], r["is_current"]):
            (r["price"], r["valid_to"]) for r in out.collect()}
    assert rows[(1, ts(1), False)] == (10.0, ts(5))     # closed
    assert rows[(1, ts(5), True)] == (11.0, None)       # opened
    assert rows[(2, ts(1), True)] == (20.0, None)       # untouched
    assert rows[(3, ts(1), True)] == (30.0, None)       # guarded
    assert rows[(9, ts(5), True)] == (90.0, None)       # fresh
    assert len(rows) == 5
    # delta view = exactly the written rows
    delta = scd2_apply(dim, upd, "key", "price", "version",
                       delta_only=True)
    assert delta.count() == 3


def test_ledger_records_slo_metrics(spark):
    """The SLO ledger, hand-computed on a 3-key scenario: per-cycle
    shipped counts, the conflict definition (keys shipped BOTH ways),
    Spark-ROUND conflict_rate, data-lag percentiles vs the version
    frontier, and the quiet-cycle null row."""
    ts = lambda d: dt.datetime(2000, 1, d)  # noqa: E731
    root = tempfile.mkdtemp(prefix="ces_ledger_")
    try:
        init_a = spark.createDataFrame(
            [(1, 10.0, ts(1), "a"), (2, 20.0, ts(2), "a"),
             (3, 30.0, ts(3), "a")],
            "key bigint, price double, version timestamp, side string")
        a = ParquetStore(spark, f"{root}/a", init_a)
        b = ParquetStore(spark, f"{root}/b",
                         init_a.withColumn("side", F.lit("b")))
        eng = SyncEngine(spark, a, b, f"{root}/state",
                         record_ledger=True)
        eng.full_sync()          # watermark = 2000-01-03
        # cycle 1: B edits keys 1 and 2 (versions day 11 and day 21),
        # A edits key 2 (day 13) -> key 2 ships both ways = conflict
        def edit(store, key, price, day):
            st = store.read().withColumn(
                "price", F.when(F.col("key") == key, F.lit(price))
                          .otherwise(F.col("price"))
            ).withColumn(
                "version", F.when(F.col("key") == key,
                                  F.lit(ts(day)).cast("timestamp"))
                            .otherwise(F.col("version")))
            store.overwrite(st.localCheckpoint(eager=True))
        edit(b, 1, 11.0, 11)
        edit(b, 2, 22.0, 21)
        edit(a, 2, 21.5, 13)
        assert eng.incremental_cycle() == 3
        # cycle 2: quiet
        assert eng.incremental_cycle() == 0
        led = {r["cycle"]: r for r in eng.ledger_df().collect()}
        r1, r2 = led[1], led[2]
        assert (r1["shipped_a"], r1["shipped_b"]) == (1, 2)
        assert r1["conflict_keys"] == 1          # key 2, both ways
        assert r1["conflict_rate"] == 0.5        # 1 of 2 distinct keys
        # frontier = day 21; lags: day11 -> 10d, day13 -> 8d, day21 -> 0
        day = 86400.0
        assert r1["max_lag_s"] == 10 * day
        assert r1["p50_lag_s"] == 8 * day
        # p95 of [0, 8d, 10d] (exact interpolation: 0.95*2=1.9 ->
        # 8d + 0.9*(10d-8d) = 9.8d)
        assert abs(r1["p95_lag_s"] - 9.8 * day) < 1e-6
        assert r1["watermark_s"] == "2000-01-21 00:00:00"
        assert (r2["shipped_a"], r2["shipped_b"]) == (0, 0)
        assert r2["conflict_keys"] == 0
        assert r2["conflict_rate"] is None
        assert r2["p50_lag_s"] is None and r2["max_lag_s"] is None
        assert r2["watermark_s"] == "2000-01-21 00:00:00"
        # ledger off by default: no rows recorded
        eng2 = SyncEngine(spark, a, b, f"{root}/state2")
        eng2.full_sync()
        eng2.incremental_cycle()
        assert eng2.ledger == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_overlap_commits_awaits_both_and_raises(spark):
    """Round-12 optimization guard: `_overlap_commits` runs two
    independent commits concurrently, but a failure in one must NEVER
    orphan the other mid-commit - both closures are awaited before
    the exception propagates, in either submission order."""
    import time

    from cassandra_elasticsearch_sync_spark.sync.engine import (
        _overlap_commits,
    )

    done: list[str] = []

    def slow_ok() -> None:
        time.sleep(0.3)
        done.append("ok")

    def boom() -> None:
        raise ValueError("commit failed")

    with pytest.raises(ValueError, match="commit failed"):
        _overlap_commits(spark, boom, slow_ok)
    assert done == ["ok"]          # the healthy commit ran to completion

    done.clear()
    with pytest.raises(ValueError, match="commit failed"):
        _overlap_commits(spark, slow_ok, boom)
    assert done == ["ok"]

    # and the success path returns only after BOTH are done
    done.clear()
    _overlap_commits(spark, slow_ok, lambda: done.append("b"))
    assert sorted(done) == ["b", "ok"]


def test_acid_read_since_prunes_files_and_matches_filtered_read(spark):
    """Round-12: `AcidStore.read_since` prunes the delta scan at the
    manifest (version-range stats) - rows must equal the plain
    filtered read, and the plan must actually read FEWER files when
    only one slice holds post-watermark versions."""
    ts = lambda d: dt.datetime(2001, 1, d)  # noqa: E731
    root = tempfile.mkdtemp(prefix="ces_read_since_")
    try:
        rows = [(i, float(i), ts(1 + (i % 5)), "x") for i in range(64)]
        init = spark.createDataFrame(
            rows, "key bigint, price double, version timestamp, side string")
        st = AcidStore(spark, f"{root}/t", init=init, n_slices=4)
        # bump ONE key far past the rest: only its slice can hold
        # post-watermark rows afterwards
        st.table.update_where(
            F.col("key") == 3,
            {"version": F.lit(ts(20)).cast("timestamp")})
        wm = ts(10)
        got = st.read_since(wm)
        want = st.read().filter(F.col("version") >= F.lit(wm))
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, want.collect()))
        assert len(got.inputFiles()) < len(st.read().inputFiles())
        # watermark None = everything (first sync)
        assert st.read_since(None).count() == 64
        # and a watermark below every version prunes nothing away
        assert st.read_since(ts(1)).count() == 64
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_engine_delta_since_falls_back_without_read_since(spark):
    """A custom KeyedStore without `read_since` still syncs - the
    engine falls back to the plain filtered read (protocol compat)."""

    class MinimalStore:
        """ParquetStore minus read_since: only the protocol trio."""

        def __init__(self, inner):
            self._inner = inner

        def read(self):
            return self._inner.read()

        def overwrite(self, df, key_quantiles=None):
            self._inner.overwrite(df, key_quantiles=key_quantiles)

        def apply_delta(self, delta, key_stats=None):
            self._inner.apply_delta(delta, key_stats=key_stats)

    root = tempfile.mkdtemp(prefix="ces_minimal_store_")
    try:
        a = MinimalStore(ParquetStore(
            spark, f"{root}/a",
            side_a(spark, SF_DIR).withColumn("side", F.lit("a"))))
        b = MinimalStore(ParquetStore(
            spark, f"{root}/b",
            side_b(spark, SF_DIR).withColumn("side", F.lit("b"))))
        eng = SyncEngine(spark, a, b, f"{root}/state")
        eng.full_sync()
        assert eng.in_sync()
        assert eng.incremental_cycle() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
