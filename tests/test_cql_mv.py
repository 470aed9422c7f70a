"""Cassandra materialized-view semantics: CREATE rules + incremental
refresh (cql_mv.py)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable
from cassandra_elasticsearch_sync_spark.sources.cql_mv import (
    MaterializedView,
    _parse_view_pk,
)
from cassandra_elasticsearch_sync_spark.sources.cql_query import CqlError
from cassandra_elasticsearch_sync_spark.sources.cql_write import (
    apply_cql_writes,
)

DDL = """
CREATE MATERIALIZED VIEW kv_by_band AS
SELECT band, key, price FROM kv
WHERE band IS NOT NULL AND key IS NOT NULL
PRIMARY KEY ((band), key)
"""


@pytest.fixture()
def base(spark):
    root = tempfile.mkdtemp(prefix="ces_mvt_base_")
    t = AcidParquetTable(spark, root)
    t.init(spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (3, None, 3.0)],
        "key bigint, band bigint, price double"))
    yield t
    shutil.rmtree(root, ignore_errors=True)


def _mv(spark, base, ddl=DDL):
    root = tempfile.mkdtemp(prefix="ces_mvt_view_")
    return MaterializedView(spark, base, ["key"], ddl, root), root


def _rows(mv):
    return sorted(tuple(r) for r in mv.read().collect())


def test_initial_build_excludes_null_view_keys(spark, base):
    mv, root = _mv(spark, base)
    try:
        # key 3 has a null band -> excluded (Cassandra's null rule)
        assert _rows(mv) == [(10, 1, 1.0), (20, 2, 2.0)]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_incremental_refresh_moves_deletes_inserts(spark, base):
    mv, root = _mv(spark, base)
    try:
        apply_cql_writes(base, ["key"], [
            "UPDATE kv SET band = 99 WHERE key = 1",   # moves partition
            "DELETE FROM kv WHERE key = 2",            # leaves the view
            "UPDATE kv SET band = 5 WHERE key = 3",    # null -> 5: joins
            "INSERT INTO kv (key, band, price) VALUES (4, 10, 4.0)",
        ])
        mv.refresh()
        assert _rows(mv) == [(5, 3, 3.0), (10, 4, 4.0), (99, 1, 1.0)]
        # nulling the view key column removes the row from the view
        apply_cql_writes(base, ["key"], "DELETE band FROM kv WHERE key = 3")
        mv.refresh()
        assert _rows(mv) == [(10, 4, 4.0), (99, 1, 1.0)]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_refresh_is_noop_when_base_unchanged(spark, base):
    mv, root = _mv(spark, base)
    try:
        v0 = mv.view.current_version()
        assert mv.refresh() == v0, "no base commit -> no view commit"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_view_pk_parse_forms():
    # the caller strips PRIMARY KEY's outer parens before this runs
    assert _parse_view_pk("a, b") == (["a"], ["b"])
    assert _parse_view_pk("(a, b), c") == (["a", "b"], ["c"])
    assert _parse_view_pk("(a), b, c") == (["a"], ["b", "c"])


def test_create_rules_rejected(spark, base):
    def bad(ddl, match):
        with pytest.raises(CqlError, match=match):
            root = tempfile.mkdtemp(prefix="ces_mvt_bad_")
            try:
                MaterializedView(spark, base, ["key"], ddl, root)
            finally:
                shutil.rmtree(root, ignore_errors=True)

    bad("""CREATE MATERIALIZED VIEW v AS SELECT band, price FROM kv
           WHERE band IS NOT NULL PRIMARY KEY ((band))""",
        "must include every base primary key")
    bad("""CREATE MATERIALIZED VIEW v AS SELECT * FROM kv
           WHERE band IS NOT NULL AND price IS NOT NULL
           AND key IS NOT NULL PRIMARY KEY ((band), price, key)""",
        "more than one non-primary-key column")
    bad("""CREATE MATERIALIZED VIEW v AS SELECT * FROM kv
           WHERE key IS NOT NULL PRIMARY KEY ((band), key)""",
        "IS NOT NULL")
    bad("""CREATE MATERIALIZED VIEW v AS SELECT * FROM kv
           WHERE band IS NOT NULL AND key IS NOT NULL AND price > 1
           PRIMARY KEY ((band), key)""",
        "only `col IS NOT NULL`")
    bad("""CREATE MATERIALIZED VIEW v AS SELECT price, key FROM kv
           WHERE band IS NOT NULL AND key IS NOT NULL
           PRIMARY KEY ((band), key)""",
        "SELECT must include every view primary key")
    bad("""CREATE MATERIALIZED VIEW v AS SELECT * FROM kv
           WHERE nope IS NOT NULL AND key IS NOT NULL
           PRIMARY KEY ((nope), key)""",
        "unknown columns")


def test_refresh_diff_reads_only_changed_files(spark, tmp_path):
    """The refresh diff must scale with the CHANGED data: after a
    one-partition write to a multi-slice base, the manifest set
    difference names only the rewritten slice(s), not the table."""
    from pyspark.sql import functions as F

    base = AcidParquetTable(spark, str(tmp_path / "base"))
    df = spark.range(1000).select(
        F.col("id").alias("key"), (F.col("id") % 5).alias("band"),
        F.col("id").cast("double").alias("price"))
    base.init_clustered(df, ["key"], n_slices=8)
    root = str(tmp_path / "view")
    mv = MaterializedView(spark, base, ["key"], """
        CREATE MATERIALIZED VIEW v AS SELECT band, key, price FROM t
        WHERE band IS NOT NULL AND key IS NOT NULL
        PRIMARY KEY ((band), key)
    """, root)
    v_synced = mv._synced
    apply_cql_writes(base, ["key"],
                     "UPDATE t SET band = 99 WHERE key = 7")
    mo = base._manifest(v_synced)
    mn = base._manifest(base.current_version())
    do, dn = MaterializedView._changed_dirs(mo, mn)
    assert len(mo["files"]) == 8
    assert len(do) < len(mo["files"]), \
        "diff must not re-read unchanged slices"
    assert len(dn) < len(mn["files"])
    mv.refresh()
    got = sorted(tuple(r) for r in mv.read().collect())
    want = sorted(
        tuple(r) for r in
        mv._project(base.read()).select("band", "key", "price").collect())
    assert got == want, "file-diff refresh must equal a full rebuild"
