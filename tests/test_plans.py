"""Physical-plan regression tests: the scale properties the engine
promises (broadcasts, pushdown, top-k without full sort) must survive
refactors. These read .explain output, not timings, so they are stable
on any machine."""

from __future__ import annotations

import pytest

from cassandra_elasticsearch_sync_spark.registry import all_specs

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_specs()[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_all_dimensions(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_q6_pushes_filters_and_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "l_shipdate" in plan.split("DataFilters")[1][:400]
    # ReadSchema prunes to the 4 referenced columns of 11.
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_comment" not in read_schema
    assert read_schema.count("l_") <= 5, read_schema


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(spark, "f3_global_topk")
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_flagship_partial_aggregation(spark):
    plan = _plan(spark, "flagship_pricing_summary")
    # partial (map-side) + final hash aggregate around one exchange
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_c1_broadcasts_filtered_dimension(spark):
    plan = _plan(spark, "c1_inner_join")
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_k5_broadcasts_lexicon(spark):
    plan = _plan(spark, "k5_keyword_score")
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_aqe_coalesces_small_shuffle(spark):
    """AQE must shrink the 32 planned shuffle partitions for a tiny
    aggregation at runtime (the knob that keeps small syncs cheap and
    big syncs parallel with the same config)."""
    from cassandra_elasticsearch_sync_spark.catalog import load_table

    df = (
        load_table(spark, SF_DIR, "customer")
        .groupBy("c_mktsegment")
        .count()
    )
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan, plan[:1500]


# Queries that historically used a global (no-partitionBy) window and
# were rewritten onto the two-pass distributed rank/cumsum or the
# window-free top-k (operators/distributed_order.py). A regression that
# reintroduces a single-partition WindowExec - the one shape that
# funnels the whole table through one task at 100 TB - must fail here.
_REWRITTEN_GLOBAL_WINDOW_QUERIES = [
    "price_deciles",
    "k_build_vocab",
    "share_of_total",
    "k_pack_sequences",
    "k_pipeline_end_to_end",
    "k_bm25_search",
    "k7_timeseries_similarity",
]


@pytest.mark.parametrize("name", _REWRITTEN_GLOBAL_WINDOW_QUERIES)
def test_no_unpartitioned_window(spark, name):
    plan = _plan(spark, name)
    for line in plan.splitlines():
        if "Window [" in line:
            # A partitioned Window prints three bracket groups
            # (exprs, partitionSpec, orderSpec); an unpartitioned one
            # only two.
            assert line.count("], [") >= 2, f"{name}: single-partition window:\n{line}"


def test_topk_with_rank_avoids_global_sort(spark):
    plan = _plan(spark, "k_bm25_search")
    assert "TakeOrderedAndProject" in plan or "LocalLimit" in plan, plan[:2000]


def test_salted_join_equals_plain_join(spark):
    """Semantics preservation: the salted join returns exactly the rows
    of the plain equi-join (salting only changes the physical spread)."""
    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.operators.skew import salted_join

    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    salted = salted_join(o, c, "o_custkey", F.col("o_orderkey"), n_salts=5)
    plain = o.join(c, "o_custkey")
    got = sorted(tuple(r) for r in salted.select("o_orderkey", "c_name").collect())
    want = sorted(tuple(r) for r in plain.select("o_orderkey", "c_name").collect())
    assert got == want


def test_q8_star_join_is_all_broadcast(spark):
    """Q8's seven dimension sides must broadcast; the only shuffle in
    the plan feeds the final aggregation - at 100 TB lineitem is the
    single shuffled relation."""
    plan = _plan(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") == 7, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_e6_window_is_partitioned(spark):
    """Distribution functions must run over the high-cardinality
    l_orderkey partitioning, never a global window."""
    plan = _plan(spark, "e6_distribution_functions")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "l_orderkey" in line, line


def test_lww_merge_is_partial_aggregate_not_window(spark):
    """The LWW merge must stay a partial-aggregating max(struct) (the
    shuffle carries one candidate per task x key, hot keys collapse
    map-side); a window top-1 here would shuffle every raw row. Struct
    max compiles to SortAggregate (not hash-aggregable), which is fine:
    the partial_max before the exchange is the property that scales."""
    plan = _plan(spark, "l3_lww_merge")
    assert "Window" not in plan, plan[:2000]
    assert "partial_max(struct" in plan, plan[:2000]


def test_grouped_ntile_matches_naive_window(spark):
    """with_grouped_ntile (two-pass, skew-proof) must reproduce SQL
    NTILE(PARTITION BY group) bit-for-bit, and its plan must contain
    no window partitioned by the bare group key (every window carries
    the partition-id column, bounding it by partition size)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
        with_grouped_ntile,
    )

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    order = [F.col("o_totalprice"), F.col("o_orderkey")]
    ours = with_grouped_ntile(
        o, ["o_orderpriority"], order, 7, bucket_col="b"
    ).select("o_orderkey", "b")
    naive = o.select(
        "o_orderkey",
        F.ntile(7)
        .over(Window.partitionBy("o_orderpriority").orderBy(*order))
        .alias("b"),
    )
    assert ours.exceptAll(naive).count() == 0
    assert naive.exceptAll(ours).count() == 0

    plan = ours._jdf.queryExecution().executedPlan().toString()
    import re
    # The load-bearing assertion: no window spec partitioned ONLY by the
    # group column (that would be the skewed single-task-per-group shape).
    assert not re.search(
        r"windowspecdefinition\(o_orderpriority#\d+, o_totalprice", plan
    ), "found a window partitioned by the bare group key"


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling: a join where one key holds 90% of the
    rows must come out of adaptive execution with the skewed
    partition SPLIT (the SortMergeJoin node carries skew=true in the
    final plan) - the runtime answer to hot keys at 100 TB when
    salting wasn't applied up front. Thresholds are scaled down so
    the sub-GB test input trips the same code path a hot production
    partition would."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0][0] == 180100  # 180k hot-key rows + 100 tail
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert any("skew=true" in line for line in plan.splitlines()), plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_decontamination_broadcasts_eval_grams(spark):
    """The eval-split gram set must broadcast: the training-corpus scan
    (the 100 TB side) never shuffles on gram."""
    plan = _plan(spark, "k1_decontamination")
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_degree_oriented_triangles_broadcast_degrees(spark):
    """Degree lookups join |V|-sized tables against |E|-sized edges -
    both must be broadcast, never an edge shuffle per lookup."""
    plan = _plan(spark, "k2h_triangle_degree_oriented")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_weighted_sample_is_take_ordered(spark):
    """Priority sampling's top-k must compile to TakeOrderedAndProject
    (per-partition heaps), not a global sort."""
    plan = _plan(spark, "k_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "Sort " not in plan, plan[:1500]


# ---------------------------------------------------------------------------
# Registry-wide single-partition-window sweep
# ---------------------------------------------------------------------------

def _windowspec_is_unpartitioned(spec_args: str) -> bool:
    """Parse the args of a ``windowspecdefinition(...)`` (text up to the
    frame spec): the window is UNPARTITIONED iff every leading arg is an
    order spec (``col ASC/DESC NULLS ...``) - partition columns print as
    bare expressions with no sort direction."""
    depth, args, cur = 0, [], []
    for ch in spec_args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    leading = [a for a in args
               if a and not a.startswith("specifiedwindowframe")]
    return all((" ASC" in a or " DESC" in a) for a in leading)


# fns that execute side-effectful jobs when called (streaming runs,
# ACID commits, CDC source registration) - their plans are asserted by
# their own dedicated tests instead.
_PLAN_SWEEP_SKIP_PREFIXES = (
    # streaming / side-effectful queries: their registered result is a
    # localCheckpoint of an engine run (ACID commits, WAP publishes,
    # sync cycles), so the sweep would execute the whole engine to
    # inspect a trivial checkpoint-scan plan - no signal, real cost.
    "i", "l7_", "l12_", "l14_", "l15_", "l16_", "l17_", "l18_",
    "l19_", "l21_", "l23_", "l24_", "l26_", "l27_", "l28_", "l29_",
    "l31_", "l32_", "l33_", "l34_", "l38_", "a10_", "a2r_", "a2t_",
    # PIT page-walk: the registered result is a localCheckpoint of a
    # multi-page walk over an ACID store built in-query (commits +
    # interleaved writes); its page plan (time-travel scan +
    # TakeOrderedAndProject) is asserted in test_es_query.py instead.
    "a3dd_",
)

# Documented exceptions: windows that run over a POST-AGGREGATION table
# whose cardinality is bounded by construction (not by corpus size), so
# a single partition is the correct plan at any scale.
_BOUNDED_WINDOW_ALLOWED = {
    # ES pipeline aggs window over date_histogram buckets
    # (cardinality = calendar buckets, ~1200 rows per century).
    "a3p_es_pipeline_aggs",
    "a3s_es_moving_fn_serial_diff",
    "a3bt_es_moving_percentiles",
    # bucket_correlation ranks the POST-AGGREGATION bucket series to
    # index its indicator vector - the same calendar-bounded class
    # (yearly buckets; the indicator arity pins the cardinality).
    "a3cm_es_bucket_correlation",
    # bucket_count_ks_test: running CDFs over the same yearly bucket
    # table (fraction arity pins the cardinality).
    "a3cq_es_bucket_count_ks_test",
    # cumulative_cardinality: the running sum runs over the POST-
    # AGGREGATION daily bucket table (cardinality = calendar days,
    # ~365 rows/year; the raw-event scan reduced in the two grouped
    # aggregates before any window sees a row).
    "a3db_es_cumulative_cardinality",
    # normalize: percent_of_sum / rescale_0_1 window over the terms
    # bucket table (cardinality = |o_orderpriority| = 5 by corpus
    # construction; the orders scan reduced in the hash aggregate).
    "a3dc_es_normalize",
}


@pytest.mark.slow  # plans all 567 registry entries (~5 min) - round 13
def test_registry_has_no_single_partition_window_or_cartesian(spark):
    """THE scale invariants, swept over every non-side-effectful
    registry entry: (1) no unpartitioned WindowExec - the plan shape
    that serializes 100 TB through a single task; (2) no
    CartesianProduct - the non-broadcast all-pairs join.
    BroadcastNestedLoopJoin is allowed: its loop side is
    broadcast-bounded by construction (1-row totals, capped query
    sets, the guarded c6 cross join), which is exactly the difference
    that matters at scale."""
    import re

    bad_window, bad_cartesian = [], []
    for name, spec in sorted(all_specs().items()):
        if name.startswith(_PLAN_SWEEP_SKIP_PREFIXES):
            continue
        qe = spec.fn(spark, SF_DIR)._jdf.queryExecution()
        if "CartesianProduct" in qe.executedPlan().toString():
            bad_cartesian.append(name)
        if name in _BOUNDED_WINDOW_ALLOWED:
            continue
        plan = qe.optimizedPlan().toString()
        for m in re.finditer(r"windowspecdefinition\(", plan):
            start = m.end()
            frame = plan.find("specifiedwindowframe", start)
            args = plan[start:frame] if frame > 0 else plan[start:start + 300]
            if _windowspec_is_unpartitioned(args):
                bad_window.append(name)
                break
    assert not bad_window, f"single-partition windows in: {bad_window}"
    assert not bad_cartesian, f"cartesian products in: {bad_cartesian}"


def test_window_sweep_detector_catches_global_window(spark):
    """Meta-test: the sweep's parser must actually flag a genuinely
    unpartitioned window (and not flag a partitioned no-order one)."""
    import re
    from pyspark.sql import Window, functions as F

    from cassandra_elasticsearch_sync_spark.catalog import load_table

    def flagged(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for m in re.finditer(r"windowspecdefinition\(", plan):
            start = m.end()
            frame = plan.find("specifiedwindowframe", start)
            args = plan[start:frame] if frame > 0 else plan[start:start + 300]
            if _windowspec_is_unpartitioned(args):
                return True
        return False

    n = load_table(spark, SF_DIR, "nation")
    w_global = Window.orderBy("n_nationkey")
    assert flagged(n.withColumn("r", F.row_number().over(w_global)))
    w_part_noorder = Window.partitionBy("n_regionkey")
    assert not flagged(n.withColumn("c", F.count("*").over(w_part_noorder)))
    w_part = Window.partitionBy("n_regionkey").orderBy("n_name")
    assert not flagged(n.withColumn("r", F.row_number().over(w_part)))


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Scale feature: when a selective dimension filter feeds a
    shuffle join, Spark's runtime Bloom-filter injection should
    pre-filter the fact scan (might_contain on the join key) - the
    runtime analogue of static partition pruning, and at 100 TB the
    difference between shuffling the whole fact table and shuffling
    the ~matching slice. Asserts the engine's plans COMPOSE with the
    feature (nothing in the query library blocks injection) and that
    results are unchanged."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
        )
    }

    def build():
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_totalprice") > 400000)
        l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .select("l_orderkey", "l_extendedprice", "o_totalprice")
        )

    try:
        baseline = sorted(map(tuple, build().collect()))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10GB")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")
        j = build()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert sorted(map(tuple, j.collect())) == baseline
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
