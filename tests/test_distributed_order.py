"""Property tests for the skew-proof distributed-order primitives:
with_grouped_order / with_grouped_ntile must agree with the naive
single-task window on ANY input - including the shapes that break
naive implementations (one giant group, empty input, all-ties,
single-row groups)."""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
    with_global_ntile,
    with_grouped_ntile,
    with_grouped_order,
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # group key (skew-prone)
        st.integers(min_value=-50, max_value=50),  # order value (ties likely)
    ),
    min_size=0,
    max_size=60,
)


def _df(spark, rows):
    # (group, value, uid): uid makes the order total, as the contract
    # requires.
    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    return spark.createDataFrame(data, "g string, v int, uid int")


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_strategy)
def test_grouped_order_matches_naive_window(spark, rows):
    df = _df(spark, rows)
    order = [F.col("v"), F.col("uid")]
    ours = {
        (r.g, r.uid, r.rk)
        for r in with_grouped_order(df, ["g"], order, rank_col="rk").collect()
    }
    w = Window.partitionBy("g").orderBy("v", "uid")
    naive = {
        (r.g, r.uid, r.rk)
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert ours == naive


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_strategy, n_buckets=st.sampled_from([1, 3, 7]))
def test_grouped_ntile_matches_naive_window(spark, rows, n_buckets):
    df = _df(spark, rows)
    order = [F.col("v"), F.col("uid")]
    ours = {
        (r.g, r.uid, r.b)
        for r in with_grouped_ntile(
            df, ["g"], order, n_buckets, bucket_col="b"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "uid")
    naive = {
        (r.g, r.uid, r.b)
        for r in df.withColumn("b", F.ntile(n_buckets).over(w)).collect()
    }
    assert ours == naive


def test_global_ntile_empty_input(spark):
    df = spark.createDataFrame([], "v int, uid int")
    out = with_global_ntile(df, [F.col("v"), F.col("uid")], 4, bucket_col="b")
    assert out.count() == 0


def test_grouped_order_null_group_keys(spark):
    """NULL is a legitimate window partition: rows whose group key is
    NULL must keep exact ranks (a plain equi-join on the offsets would
    silently drop them - ADVICE r2)."""
    data = [
        (None, 5, 0), ("a", 3, 1), (None, 1, 2), ("a", 7, 3),
        (None, 9, 4), ("b", 2, 5), (None, 5, 6),
    ]
    df = spark.createDataFrame(data, "g string, v int, uid int")
    order = [F.col("v"), F.col("uid")]
    ours = {
        (r.g, r.uid, r.rk)
        for r in with_grouped_order(df, ["g"], order, rank_col="rk").collect()
    }
    w = Window.partitionBy("g").orderBy("v", "uid")
    naive = {
        (r.g, r.uid, r.rk)
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert ours == naive
    assert len(ours) == len(data)  # no NULL-group row dropped


def test_grouped_ntile_null_group_keys(spark):
    data = [(None, v, i) for i, v in enumerate([4, 1, 9, 2, 7])] + [
        ("a", 3, 10), ("a", 8, 11)
    ]
    df = spark.createDataFrame(data, "g string, v int, uid int")
    order = [F.col("v"), F.col("uid")]
    ours = {
        (r.g, r.uid, r.b)
        for r in with_grouped_ntile(df, ["g"], order, 3, bucket_col="b").collect()
    }
    w = Window.partitionBy("g").orderBy("v", "uid")
    naive = {
        (r.g, r.uid, r.b)
        for r in df.withColumn("b", F.ntile(3).over(w)).collect()
    }
    assert ours == naive


def test_grouped_order_cumsum_param_validation(spark):
    import pytest

    df = spark.createDataFrame([("a", 1, 0)], "g string, v int, uid int")
    with pytest.raises(ValueError, match="cumsum_col requires cumsum_of"):
        with_grouped_order(
            df, ["g"], [F.col("v"), F.col("uid")], cumsum_col="cs"
        )


def test_global_cumsum_over_doubles_multi_partition(spark):
    """Regression: a FLOAT cumsum whose data spans multiple ranged
    partitions must carry fractional offsets exactly - a long-typed
    offset column truncates them (invisible while everything fits in
    one partition, wrong at scale)."""
    from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
        with_global_order,
    )

    n = 500
    df = spark.createDataFrame(
        [(i, 0.25) for i in range(n)], "k bigint, v double"
    ).repartition(8)
    out, totals = with_global_order(
        df, [F.col("k")], cumsum_of="v", cumsum_col="cum")
    rows = {r["k"]: r["cum"] for r in out.collect()}
    assert totals["sum"] == n * 0.25
    for k in (0, 123, 250, 499):
        assert rows[k] == (k + 1) * 0.25, (k, rows[k])
