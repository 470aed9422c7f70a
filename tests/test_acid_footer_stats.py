"""Footer-derived manifest stats must equal the Spark aggregate's.

The round-12 optimization replaces the commit-time stats job (a full
re-read of every byte just written) with a driver-side fold over the
parquet FOOTERS. These tests pin the contract:

- value parity with the aggregate job for every stats-eligible type
  the engine proves from footers (ints, doubles, strings, dates,
  timestamps tz + ntz), including nulls and all-null columns;
- per-column conservative degradation to [None, None] (which every
  pruning consumer treats as "keep the file") for anything footers
  cannot prove - NaN doubles and pyarrow-undecodable decimals are the
  canonical cases;
- the clustered-write path actually commits footer stats that match
  the job's;
- the NaN pruning guard: a NaN max bound must never skip a file.
"""

from __future__ import annotations

import datetime as dt
import decimal
import os
import tempfile

from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable


def _spark_stats(table, files, schema):
    """The aggregate-job path, bypassing the footer fast path."""
    stats = {}
    cols = table._stats_cols(schema)
    if not cols or not files:
        return stats
    enc = table._enc_stat
    path = F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
    entry = F.coalesce(*[
        F.when(path.startswith(d.rstrip("/") + "/"), F.lit(d))
        for d in files
    ])
    rows = (
        table.spark.read.schema(schema).parquet(*files)
        .groupBy(entry.alias("__entry"))
        .agg(*[F.min(c).alias(f"__min_{c}") for c in cols],
             *[F.max(c).alias(f"__max_{c}") for c in cols])
        .collect()
    )
    for row in rows:
        stats[row["__entry"]] = {
            c: [enc(row[f"__min_{c}"]), enc(row[f"__max_{c}"])] for c in cols
        }
    return stats


def _write_entry(spark, root, df):
    d = os.path.join(root, "data", "e0")
    df.write.parquet(d)
    return d


def test_footer_stats_match_aggregate_all_types(spark):
    with tempfile.TemporaryDirectory() as root:
        df = spark.createDataFrame(
            [
                (1, 2.5, "alpha", dt.date(2020, 1, 2),
                 dt.datetime(2020, 1, 2, 3, 4, 5, 123456),
                 dt.datetime(2021, 6, 7, 8, 9, 10),
                 decimal.Decimal("12.34"), None),
                (-7, -0.5, "omega", dt.date(1999, 12, 31),
                 dt.datetime(2019, 11, 30, 23, 59, 59),
                 dt.datetime(2020, 1, 1, 0, 0, 0),
                 decimal.Decimal("-99.10"), None),
                (42, None, None, None, None, None, None, None),
            ],
            "i long, x double, s string, d date, ts timestamp, "
            "tsn timestamp_ntz, dec decimal(10,2), allnull string",
        )
        t = AcidParquetTable(spark, root)
        entry = _write_entry(spark, root, df)
        schema = df.schema

        footer = t._footer_stats([entry], t._stats_cols(schema))
        via_job = _spark_stats(t, [entry], schema)

        assert via_job, "aggregate path must produce stats"
        assert footer is not None
        # every column: footer bounds are either EXACTLY the job's or
        # the conservative [None, None]
        for c in t._stats_cols(schema):
            assert footer[entry][c] in ([None, None], via_job[entry][c]), c
        # the engine's core types MUST be provable, not degraded
        for c in ("i", "x", "s", "d", "ts", "tsn"):
            assert footer[entry][c] == via_job[entry][c], c
        assert footer[entry]["allnull"] == [None, None]


def test_footer_stats_nan_degrades_to_none(spark):
    with tempfile.TemporaryDirectory() as root:
        df = spark.createDataFrame(
            [(1, float("nan")), (2, 3.5)], "k long, v double")
        t = AcidParquetTable(spark, root)
        entry = _write_entry(spark, root, df)
        footer = t._footer_stats([entry], t._stats_cols(df.schema))
        assert footer is not None
        job = _spark_stats(t, [entry], df.schema)
        assert footer[entry]["k"] == job[entry]["k"]
        # NaN bounds are never trusted from footers
        assert footer[entry]["v"] == [None, None]


def test_nan_bounds_never_skip_a_file():
    # the pruning guard, independent of where the stats came from:
    # Spark's max() ranks NaN above every double, so the legacy stats
    # path can record fmax=NaN; that file must be KEPT for any range
    nan = float("nan")
    keep = AcidParquetTable._range_may_overlap
    assert keep([3.5, nan], 2.0, None)
    assert keep([nan, nan], None, 10.0)
    assert keep([nan, 3.5], 1.0, 2.0)


def test_footer_stats_multi_file_entry_and_missing_column(spark):
    with tempfile.TemporaryDirectory() as root:
        d = os.path.join(root, "data", "e0")
        spark.createDataFrame([(5, "m")], "k long, s string") \
            .write.mode("append").parquet(d)
        spark.createDataFrame([(11, "a")], "k long, s string") \
            .write.mode("append").parquet(d)
        t = AcidParquetTable(spark, root)
        # schema evolution: stats schema has a column the files lack
        from pyspark.sql.types import StructType
        schema = StructType.fromJson(
            spark.createDataFrame([(1, "x", 2.0)], "k long, s string, z double")
            .schema.jsonValue())
        footer = t._footer_stats([d], t._stats_cols(schema))
        assert footer is not None
        assert footer[d]["k"] == [5, 11]
        assert footer[d]["s"] == ["a", "m"]
        assert footer[d]["z"] == [None, None]
        assert footer == _spark_stats(t, [d], schema)


def test_clustered_write_stats_equal_job_stats(spark, tmp_path):
    """init_clustered's committed stats (footer path) must equal what
    the aggregate job computes over the same slices."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("key"),
        (F.col("id") * 1.5).alias("price"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("version"),
        F.lit("a").alias("side"),
    )
    t = AcidParquetTable(spark, str(tmp_path / "tbl"))
    t.init_clustered(df, ["key"], n_slices=4)
    m = t._manifest(t.current_version())
    from pyspark.sql.types import StructType
    schema = StructType.fromJson(m["schema"])
    assert m["stats"] == _spark_stats(t, m["files"], schema)
    # and pruning over the committed stats behaves
    assert len(t.candidate_files("key", 0, 10)) < len(m["files"])


def test_footer_stats_distrust_long_string_bounds(spark):
    """Round 13 (VERDICT r12 #8): parquet writers may truncate or drop
    oversized binary min/max, and this pyarrow does not expose the
    exactness flags - so any string bound at/past the trust limit must
    degrade to [None, None] (never pruned), while short strings keep
    exact bounds. Types and short-string parity stay pinned by the
    other tests."""
    with tempfile.TemporaryDirectory() as root:
        long_lo = "b" * 5000          # past parquet-mr's 4 KiB ceiling
        long_hi = "y" * 5000
        df = spark.createDataFrame(
            [(1, long_lo, "aa"), (2, long_hi, "zz")],
            "k long, big string, small string")
        d = _write_entry(spark, root, df)
        t = AcidParquetTable(spark, root)
        footer = t._footer_stats([d], ["k", "big", "small"])
        assert footer is not None
        assert footer[d]["k"] == [1, 2]
        assert footer[d]["small"] == ["aa", "zz"]
        # whether the writer dropped the oversized stats or kept them,
        # the engine must not trust them as exact
        assert footer[d]["big"] == [None, None]
        # boundary: a bound just under the limit stays trusted
        near = "c" * 1000
        df2 = spark.createDataFrame([(near,), ("d",)], "s string")
        d2 = _write_entry(spark, root + "/2", df2)
        f2 = t._footer_stats([d2], ["s"])
        assert f2[d2]["s"] == [near, "d"]
