"""Model-based property test for the ACID store (sources/acid.py).

A random SEQUENCE of write operations - MERGE upserts (plain and
txn-versioned-with-replay), copy-on-write DELETE/UPDATE, merge-on-read
key deletes, delete compaction, RESTORE to a random earlier version,
VACUUM with pinned-version reader probes (retained snapshots read
exactly, vacuumed ones fail fast, restore targets shrink to the
retention window), and shallow-clone equality probes - is applied
both to the real table
and to a plain-dict model; after every step the snapshot read must
equal the model exactly. This is the cross-path interaction coverage
the single-op tests can't give: MoR deletes followed by re-inserting
merges (sequence-number scoping), CoW deletes over MoR-masked files,
compaction in the middle of a sequence, RESTORE jumping over pending
MoR deletes, clones carrying delete files, replayed txn batches after
maintenance.
"""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

_SCHEMA = "key bigint, price double, version int"

_merge_batch = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 50), st.integers(1, 9)),
    min_size=1, max_size=5,
).map(lambda rows: list({k: (k, float(p), v) for k, p, v in rows}.values()))

_op = st.one_of(
    st.tuples(st.just("merge"), _merge_batch),
    st.tuples(st.just("txn_merge"), _merge_batch),
    st.tuples(st.just("cow_delete"), st.integers(0, 2)),
    st.tuples(st.just("update"), st.integers(0, 2)),
    st.tuples(st.just("mor_delete"),
              st.lists(st.integers(0, 11), min_size=1, max_size=4,
                       unique=True)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("restore"), st.integers(0, 1_000_000)),
    st.tuples(st.just("clone_check"), st.just(None)),
    # WHEN NOT MATCHED BY SOURCE: one merge updates matched keys AND
    # deletes every unmatched key in one commit (full-snapshot
    # reconciliation)
    st.tuples(st.just("nmbs_sync"), _merge_batch),
    # ... and the conditioned update flavor (archive the odd unmatched)
    st.tuples(st.just("nmbs_mark"), _merge_batch),
    # VACUUM under readers (VERDICT r5 #8): retention drops old
    # manifests/files mid-sequence; pinned readers on retained
    # versions must still read exactly, vacuumed versions must fail
    # fast, and later restores must only see retained targets.
    st.tuples(st.just("vacuum"), st.integers(2, 3)),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_acid_sequences_match_dict_model(spark, ops):
    root = tempfile.mkdtemp(prefix="ces_acid_model_")
    try:
        t = AcidParquetTable(spark, root)
        init = [(k, float(k * 10), 1) for k in range(0, 8)]
        t.init(spark.createDataFrame(init, _SCHEMA))
        model = {k: (p, v) for k, p, v in init}
        history = {t.current_version(): dict(model)}
        txn_counter = 0

        for kind, arg in ops:
            if kind == "merge":
                t.merge_into(spark.createDataFrame(arg, _SCHEMA), ["key"])
                for k, p, v in arg:
                    model[k] = (p, v)
            elif kind == "txn_merge":
                txn_counter += 1
                for _replay in range(2):  # at-least-once delivery
                    t.merge_into(spark.createDataFrame(arg, _SCHEMA),
                                 ["key"], txn_app_id="model",
                                 txn_version=txn_counter)
                for k, p, v in arg:
                    model[k] = (p, v)
            elif kind == "cow_delete":
                t.delete_where(F.col("key") % 3 == arg)
                model = {k: pv for k, pv in model.items() if k % 3 != arg}
            elif kind == "update":
                t.update_where(F.col("key") % 3 == arg,
                               {"price": F.col("price") + 1.0})
                model = {k: ((p + 1.0, v) if k % 3 == arg else (p, v))
                         for k, (p, v) in model.items()}
            elif kind == "mor_delete":
                t.delete_keys_mor(
                    spark.createDataFrame([(k,) for k in arg], "key bigint"),
                    ["key"])
                model = {k: pv for k, pv in model.items() if k not in arg}
            elif kind == "nmbs_sync":
                t.merge_into(spark.createDataFrame(arg, _SCHEMA), ["key"],
                             assume_unique_keys=True,
                             not_matched_by_source_action="delete")
                src_keys = {k for k, _, _ in arg}
                model = {k: pv for k, pv in model.items() if k in src_keys}
                for k, p, v in arg:
                    model[k] = (p, v)
            elif kind == "nmbs_mark":
                t.merge_into(
                    spark.createDataFrame(arg, _SCHEMA), ["key"],
                    assume_unique_keys=True,
                    not_matched_by_source_action="update",
                    not_matched_by_source_condition=F.col("tgt.key") % 2 == 1,
                    not_matched_by_source_assignments={
                        "price": F.col("tgt.price") + 100.0})
                src_keys = {k for k, _, _ in arg}
                for k, p, v in arg:
                    model[k] = (p, v)
                model = {k: ((p + 100.0, v)
                             if k not in src_keys and k % 2 == 1 else (p, v))
                         for k, (p, v) in model.items()}
            elif kind == "compact":
                t.compact_deletes()
            elif kind == "vacuum":
                cur = t.current_version()
                t.vacuum(retain_last=arg)
                retained = {v for v in history
                            if max(1, cur - arg + 1) <= v <= cur}
                dropped = sorted(set(history) - retained)
                # pinned readers on every retained version read exactly
                for v in sorted(retained):
                    got_v = {r["key"]: (r["price"], r["version"])
                             for r in t.read(version=v).collect()}
                    assert got_v == history[v], f"pinned v{v} diverged"
                # a reader pinned to a vacuumed snapshot fails fast
                if dropped:
                    try:
                        t.read(version=dropped[-1]).collect()
                        raise AssertionError(
                            f"read of vacuumed v{dropped[-1]} succeeded")
                    except AssertionError:
                        raise
                    except Exception:
                        pass  # expected: snapshot gone
                # restores may now only target retained versions
                history = {v: history[v] for v in retained}
            elif kind == "restore":
                versions = sorted(history)
                target = versions[arg % len(versions)]
                t.restore(target)
                model = dict(history[target])
            elif kind == "clone_check":
                clone_root = tempfile.mkdtemp(prefix="ces_acid_clone_m_")
                try:
                    c = t.shallow_clone(clone_root)
                    got_c = {r["key"]: (r["price"], r["version"])
                             for r in c.read().collect()}
                    assert got_c == model, f"clone diverged: {got_c}"
                finally:
                    shutil.rmtree(clone_root, ignore_errors=True)

            got = {r["key"]: (r["price"], r["version"])
                   for r in t.read().collect()}
            assert got == model, f"after {kind}({arg}): {got} != {model}"
            history[t.current_version()] = dict(model)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_optimize_racing_merge_conflict_rule(spark):
    """VERDICT r4 #9: OPTIMIZE and MERGE both commit via the same
    conditional put, and their file sets always overlap (OPTIMIZE
    rewrites everything), so whichever loses the race MUST get
    CommitConflict and retry against the new base - never silently
    drop the other writer's rows. Both orders pinned here.

    Order A - merge lands while OPTIMIZE is between read and commit:
    the stale OPTIMIZE loses; its retry compacts the merged content.
    Order B - OPTIMIZE lands while a merge is between read and
    commit: the stale merge loses; its retry merges onto the
    optimized layout."""
    import tempfile

    import pytest

    from cassandra_elasticsearch_sync_spark.sources.acid import CommitConflict

    root = tempfile.mkdtemp(prefix="ces_race_")
    try:
        class RacyTable(AcidParquetTable):
            pre_commit_hook = None

            def _commit(self, *a, **kw):
                if RacyTable.pre_commit_hook is not None:
                    hook, RacyTable.pre_commit_hook = (
                        RacyTable.pre_commit_hook, None)
                    hook()
                return super()._commit(*a, **kw)

        t = RacyTable(spark, root)
        t.init(spark.createDataFrame(
            [(1, 10.0, 1), (2, 20.0, 1), (3, 30.0, 1)], _SCHEMA))
        plain = AcidParquetTable(spark, root)  # the racing writer

        # -- Order A: OPTIMIZE reads, merge commits first ----------------
        src_a = spark.createDataFrame([(2, 99.0, 2), (4, 40.0, 2)], _SCHEMA)
        RacyTable.pre_commit_hook = (
            lambda: plain.merge_into(src_a, ["key"]))
        with pytest.raises(CommitConflict):
            t.optimize(["key"], n_slices=2)
        after_merge = [(1, 10.0, 1), (2, 99.0, 2), (3, 30.0, 1),
                       (4, 40.0, 2)]
        assert _rows(t) == after_merge  # merge won, nothing lost
        v = t.current_version()
        t.optimize(["key"], n_slices=2)  # the standard retry
        assert t.current_version() == v + 1
        assert _rows(t) == after_merge  # compaction preserved content

        # -- Order B: merge reads, OPTIMIZE commits first ----------------
        base = t.current_version()
        stale_manifest = t._manifest(base)
        plain.optimize(["key"], n_slices=3)
        src_b = spark.createDataFrame([(5, 50.0, 3)], _SCHEMA)
        with pytest.raises(CommitConflict):
            t._merge_against(stale_manifest, src_b, ["key"], None, None,
                             None, base)
        t.merge_into(src_b, ["key"])  # retry from the fresh base
        assert _rows(t) == after_merge + [(5, 50.0, 3)]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_vacuum_pinned_reader_semantics(spark):
    """Deterministic twin of the model test's vacuum op (the random
    sequences may not always draw the dropped-version path): three
    committed versions, vacuum retain_last=2 - the two retained
    snapshots keep reading exactly (including the non-current pinned
    one), the oldest fails fast, restore to it is refused, and the
    CURRENT reader is untouched before and after."""
    import tempfile

    import pytest

    root = tempfile.mkdtemp(prefix="ces_vacuum_pin_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(spark.createDataFrame([(1, 10.0, 1), (2, 20.0, 1)], _SCHEMA))
        v1 = t.current_version()
        t.merge_into(spark.createDataFrame([(2, 21.0, 2)], _SCHEMA), ["key"])
        v2 = t.current_version()
        t.merge_into(spark.createDataFrame([(3, 30.0, 3)], _SCHEMA), ["key"])
        v3 = t.current_version()

        snap_v2 = _rows_at(t, v2)
        t.vacuum(retain_last=2)

        assert _rows_at(t, v2) == snap_v2          # retained pin reads
        assert _rows_at(t, v3) == _rows(t)         # current unaffected
        with pytest.raises(Exception):
            t.read(version=v1).collect()           # vacuumed pin fails
        with pytest.raises(ValueError, match="vacuumed|never existed"):
            t.restore(v1)                          # restore refused
        t.restore(v2)                              # retained restore ok
        assert _rows(t) == snap_v2
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _rows_at(t, version):
    return sorted(tuple(r) for r in t.read(version=version).collect())
