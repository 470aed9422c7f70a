"""Cassandra static-column semantics (cql_static.StaticTable)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from cassandra_elasticsearch_sync_spark.sources.cql_query import CqlError
from cassandra_elasticsearch_sync_spark.sources.cql_static import StaticTable


@pytest.fixture()
def table(spark):
    root = tempfile.mkdtemp(prefix="ces_static_")
    t = StaticTable(
        spark, root, partition=["pk"], clustering=["ck"], statics=["s"],
        base_df=spark.createDataFrame(
            [(1, 1, 10.0), (1, 2, 20.0), (2, 1, 30.0)],
            "pk bigint, ck bigint, v double"),
        static_df=spark.createDataFrame(
            [(1, "one"), (2, "two")], "pk bigint, s string"))
    yield t
    shutil.rmtree(root, ignore_errors=True)


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_static_cell_shared_across_partition_rows(spark, table):
    assert _rows(table) == [
        (1, 1, 10.0, "one"), (1, 2, 20.0, "one"), (2, 1, 30.0, "two")]
    # partition-key-only UPDATE rewrites the shared cell for ALL rows
    table.apply("UPDATE t SET s = 'ONE' WHERE pk = 1")
    assert _rows(table) == [
        (1, 1, 10.0, "ONE"), (1, 2, 20.0, "ONE"), (2, 1, 30.0, "two")]


def test_static_row_without_regular_rows(spark, table):
    # INSERT naming only (pk, s): the partition becomes visible as one
    # row with null clustering/regular cells - Cassandra's static row
    table.apply("INSERT INTO t (pk, s) VALUES (9, 'nine')")
    assert (9, None, None, "nine") in _rows(table)
    # a later regular insert attaches to the same static cell
    table.apply("INSERT INTO t (pk, ck, v) VALUES (9, 1, 90.0)")
    rows = _rows(table)
    assert (9, 1, 90.0, "nine") in rows
    assert (9, None, None, "nine") not in rows, \
        "static row folds into the regular row once one exists"


def test_partition_delete_removes_rows_and_static(spark, table):
    table.apply("DELETE FROM t WHERE pk = 1")
    assert _rows(table) == [(2, 1, 30.0, "two")]


def test_mixed_statement_splits_across_stores(spark, table):
    # full primary key restricted: regular + static cells in one
    # statement (Cassandra allows the mix)
    table.apply("UPDATE t SET v = -1.0, s = 'TWO' WHERE pk = 2 AND ck = 1")
    assert _rows(table)[-1] == (2, 1, -1.0, "TWO")


def test_regular_write_needs_full_key(spark, table):
    with pytest.raises(CqlError, match="Missing mandatory PRIMARY KEY"):
        table.apply("UPDATE t SET v = 5.0 WHERE pk = 1")


def test_static_schema_rules(spark):
    root = tempfile.mkdtemp(prefix="ces_static_bad_")
    try:
        with pytest.raises(CqlError, match="must not appear"):
            StaticTable(
                spark, root, partition=["pk"], clustering=["ck"],
                statics=["v"],
                base_df=spark.createDataFrame([(1, 1, 1.0)],
                                              "pk bigint, ck bigint, "
                                              "v double"),
                static_df=spark.createDataFrame([(1, 1.0)],
                                                "pk bigint, v double"))
    finally:
        shutil.rmtree(root, ignore_errors=True)
