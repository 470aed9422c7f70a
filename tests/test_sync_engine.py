"""End-to-end SyncEngine: bootstrap + incremental cycles converge and
are idempotent - the reference's whole program, verified."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.sync.engine import ParquetStore, SyncEngine
from cassandra_elasticsearch_sync_spark.sync.ops import side_a, side_b

SF_DIR = "/root/testdata/sf0.001"


def _mk_engine(spark):
    root = tempfile.mkdtemp(prefix="ces_engine_")
    a = ParquetStore(spark, f"{root}/a",
                     side_a(spark, SF_DIR).withColumn("side", F.lit("a")))
    b = ParquetStore(spark, f"{root}/b",
                     side_b(spark, SF_DIR).withColumn("side", F.lit("b")))
    return SyncEngine(spark, a, b, f"{root}/state"), root


def test_full_sync_then_idempotent_cycles(spark):
    eng, root = _mk_engine(spark)
    try:
        assert not eng.in_sync()
        eng.full_sync()
        assert eng.in_sync()
        # Nothing changed since the watermark -> cycle ships 0 rows.
        assert eng.incremental_cycle() == 0
        assert eng.in_sync()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_incremental_ships_local_edit(spark):
    eng, root = _mk_engine(spark)
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
        eng.b.overwrite(edited)
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


def test_equal_version_boundary_write_is_not_lost(spark):
    """A write landing AFTER the watermark advance with version exactly
    EQUAL to the watermark must still ship (inclusive >= boundary);
    a strict > would silently drop it forever."""
    from cassandra_elasticsearch_sync_spark.sources.storage import load_watermark

    eng, root = _mk_engine(spark)
    try:
        eng.full_sync()
        wm = load_watermark(spark, f"{root}/state")
        new_row = spark.createDataFrame(
            [(999999, 123.45, wm, "b")], "key bigint, price double, "
            "version timestamp, side string"
        )
        eng.b.overwrite(eng.b.read().unionByName(new_row))
        assert eng.incremental_cycle() >= 1
        assert eng.a.read().filter(F.col("key") == 999999).count() == 1
        assert eng.in_sync()
        assert eng.incremental_cycle() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
