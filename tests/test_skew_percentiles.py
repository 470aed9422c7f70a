"""High-cardinality percentile hardening: approx_percentile must stay
a MERGEABLE aggregation (map-side partial + merge) at 10^6 group keys,
so no per-key value multiset concentrates at a reducer - the escape
hatch for the exact-percentile scale caveat documented on
d6c/k_mad_outliers/l11."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.registry import all_specs


def test_approx_percentile_partial_aggregates_at_1m_groups(spark):
    """1M distinct groups, skewed sizes (one giant group + a long tail
    of singletons): the plan must show a two-phase ObjectHashAggregate
    (partial then merge) and complete quickly; single-value groups must
    come back exact."""
    n = 2_000_000
    df = (
        spark.range(n)
        # id % 1_000_000 -> 1M groups; group 0 additionally absorbs a
        # skew spike (every id < 500_000 doubles into group 0's key
        # space via the second column below).
        .select(
            F.when(F.col("id") < 500_000, F.lit(0))
            .otherwise(F.col("id") % 1_000_000)
            .alias("g"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
    )
    agg = df.groupBy("g").agg(
        F.approx_percentile("v", F.lit(0.5), F.lit(100)).alias("p50"),
        F.count("*").alias("n"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # Mergeable sketch => partial + final ObjectHashAggregate phases.
    assert plan.count("ObjectHashAggregate") >= 2, plan
    assert "partial_approx_percentile" in plan, plan
    # No window/sort-based per-key concentration anywhere.
    assert "WindowExec" not in plan

    # Skew + tail both computed; singleton groups exact.
    # Group population: g=0 absorbs ids 0..499999 plus id=1000000
    # (500001 rows); g in 1..499999 holds only id=g+1M (singletons);
    # g in 500000..999999 holds id=g and id=g+1M (pairs).
    rows = agg.filter(F.col("g").isin(0, 499_999)).collect()
    by_g = {r["g"]: r for r in rows}
    assert by_g[0]["n"] == 500_001            # the skewed giant group
    assert by_g[499_999]["n"] == 1            # a tail singleton
    assert by_g[499_999]["p50"] == float(1_499_999 % 97)
    assert agg.count() == 1_000_000


def test_approx_variants_run_and_bound_error(spark):
    """The three registered approx variants execute at sf0.001 and the
    approx p50 lands within the exact group min/max envelope."""
    specs = all_specs()
    sf = "/root/testdata/sf0.001"
    d6d = specs["d6d_approx_percentiles_highcard"].fn(spark, sf)
    assert d6d.count() > 0
    mad = specs["k_mad_outliers_approx"].fn(spark, sf).collect()
    exact = {r["event_type"]: r for r in specs["k_mad_outliers"].fn(spark, sf).collect()}
    assert len(mad) == len(exact)
    for r in mad:
        e = exact[r["event_type"]]
        # With accuracy 10000 >> rows-per-type at sf0.001 the sketch is
        # exact up to which-element conventions; allow a small band.
        assert abs(r["med"] - e["med"]) <= abs(e["med"]) * 0.05 + 1.0
    lag = specs["l11b_sync_lag_percentiles_approx"].fn(spark, sf)
    assert lag.count() > 0
