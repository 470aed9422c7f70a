"""Aggregation operators (SURVEY.md section 2.D) + the flagship query.

All double aggregations use the exact-decimal strategy from parity.py,
so the DuckDB oracle hash-matches bit-for-bit without tolerance.

Scale notes (100 TB): every groupBy here compiles to partial
HashAggregate -> shuffle on the group keys -> final HashAggregate, so
the shuffle carries one row per (partition, group), not the raw data.
Group-key cardinalities (returnflag x linestatus = 6, event_type = 5,
priorities = 5) stay tiny at any scale; the customer-keyed aggregates
shuffle on a dense high-cardinality key, which AQE coalesces/splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.parity import davg, dsum, lsum
from cassandra_elasticsearch_sync_spark.registry import register

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("flagship_pricing_summary", "D1", _Q1_ORACLE,
          "TPC-H Q1-style pricing summary: filter + 6-group agg over "
          "lineitem. Sums run on scaled longs (parity.lsum) - the fast "
          "codegen path, exact for this corpus's 2-dp columns.")
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.expr("l_shipdate <= TIMESTAMP_NTZ '2000-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            lsum("l_quantity", 2).alias("sum_qty"),
            lsum("l_extendedprice", 2).alias("sum_base_price"),
            lsum(disc_price, 4).alias("sum_disc_price"),
            lsum(charge, 6).alias("sum_charge"),
            (lsum("l_quantity", 2) / F.count("l_quantity")).alias("avg_qty"),
            (lsum("l_extendedprice", 2) / F.count("l_extendedprice")).alias("avg_price"),
            (lsum("l_discount", 2) / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register("d2_global_agg", "D2", """
SELECT
  COUNT(*) AS n_rows,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(l_discount) AS avg_discount,
  MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty
FROM lineitem
""", "Global (ungrouped) aggregate over lineitem")
def d2_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        davg("l_discount").alias("avg_discount"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register("d3_count_distinct", "D3", """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""", "Exact distinct user count per event type")
def d3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register("d4_approx_count_distinct", "D4", None,
          "HyperLogLog++ cardinality (approx - rows-only check; Spark and "
          "DuckDB sketches differ by design)")
def d4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
    )


_D5_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(l_quantity) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DECIMAL(38,2)) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS DECIMAL(38,2)) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
       ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
       ROUND((sxy - sx * sy / n) / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 6) AS corr_qty_disc
FROM s
"""


@register("d5_stat_aggs", "D5", _D5_ORACLE,
          "stddev/variance/corr from exact decimal sums (deterministic "
          "across engines; Spark's native stddev has order-dependent "
          "float merges that can never hash-match). The correlated pair "
          "is (quantity, discount): both 2-dp columns, so every rescale "
          "is exact - price^2 sums exceed 2^53 at any lossless scale.")
def d5_stat_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_discount")
    s = li.groupBy("l_returnflag").agg(
        F.count(x).alias("n"),
        dsum(x, 2).alias("sx"),
        dsum(x * x, 4).alias("sxx"),
        dsum(y, 2).alias("sy"),
        dsum(y * y, 4).alias("syy"),
        dsum(x * y, 4).alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return s.select(
        "l_returnflag",
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("var_qty"),
        F.round((sxy - sx * sy / n) / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)), 6)
         .alias("corr_qty_disc"),
    )


@register("d6_percentiles", "D6", """
SELECT l_returnflag,
       ROUND(MEDIAN(l_quantity), 6) AS median_qty,
       ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90_qty
FROM lineitem
GROUP BY l_returnflag
""", "Exact median / interpolated quantile per group")
def d6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90_qty"),
    )


@register("d7_collect_strings", "D7", """
SELECT o_orderpriority,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), ',') AS statuses,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
""", "collect_set per group, sorted and joined to a string so the hash "
     "is order- and container-type-insensitive")
def d7_collect_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count("*").alias("n"),
    )


@register("d8_having", "D8", """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DECIMAL(38,2)) AS DOUBLE) AS spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
""", "Post-aggregation filter (HAVING)")
def d8_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("spend"))
        .filter(F.col("n_orders") >= 12)
    )


@register("d9_rollup", "D9", """
SELECT COALESCE(r_name, '(all)') AS region_name,
       COALESCE(n_name, '(all)') AS nation_name,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(n_name) AS INT) AS g_nation,
       COUNT(*) AS n_customers,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DECIMAL(38,2)) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""", "Multi-granularity rollup with grouping() flags over the "
     "customer->nation->region star")
def d9_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region_name"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation_name"),
            "g_region",
            "g_nation",
            "n_customers",
            "total_bal",
        )
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_D10_ORACLE = """
SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY 1
"""


@register("d10_pivot", "D10", _D10_ORACLE,
          "Pivot event_type categories into columns (explicit value list "
          "so the plan is one pass; missing combos coalesced to 0)")
def d10_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Group on the DATE value (integer day arithmetic) and render the
    # string key only on the ~365 output rows - formatting per input
    # row was ~40% of this query's time at sf0.1.
    p = (
        ev.withColumn("day_d", F.date_trunc("day", "ts").cast("date"))
        .groupBy("day_d")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    return p.select(
        F.date_format("day_d", "yyyy-MM-dd").alias("day"),
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


@register("d11_max_by", "D11", """
SELECT c_mktsegment, top_customer, top_bal
FROM (SELECT c_mktsegment, c_name AS top_customer, c_acctbal AS top_bal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
      FROM customer)
WHERE rn = 1
""", "Deterministic arg-max per group (LWW in aggregate form; the "
     "(value, key) composite struct makes ties deterministic). DuckDB "
     "1.0's arg_max lacks composite ordering keys, so the oracle uses "
     "the equivalent window form.")
def d11_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", F.struct("c_acctbal", "c_custkey")).alias("top_customer"),
        F.max("c_acctbal").alias("top_bal"),
    )


@register("d9b_cube", "D9", """
SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(o_orderpriority, '(all)') AS priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""", "Cube: all 2^k grouping-set combinations with grouping() flags")
def d9b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "g_status",
            "g_priority",
            "n",
        )
    )


@register("d6b_approx_percentiles", "D6", None,
          "approx_percentile sketch (t-digest-family; rows-only check - "
          "Spark's and DuckDB's sketches legitimately differ). The exact "
          "variant is d6_percentiles.")
def d6b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("approx_p99_price"),
    )


@register("util_profile_orders", "D2", """
SELECT 'o_totalprice' AS col,
       COUNT(*) AS n,
       COUNT(o_totalprice) AS n_nonnull,
       COUNT(DISTINCT o_totalprice) AS n_distinct,
       MIN(o_totalprice) AS vmin,
       MAX(o_totalprice) AS vmax
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
FROM orders
""", "Table profiling: per-column null/distinct/min/max stats - the "
     "data-quality sweep a pipeline runs before training ingestion")
def util_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def prof(col: str, cast_double: bool):
        c = F.col(col)
        vmin, vmax = F.min(c), F.max(c)
        if cast_double:
            vmin, vmax = vmin.cast("double"), vmax.cast("double")
        return o.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n"),
            F.count(c).alias("n_nonnull"),
            F.countDistinct(c).alias("n_distinct"),
            vmin.alias("vmin"),
            vmax.alias("vmax"),
        )

    return prof("o_totalprice", False).unionByName(prof("o_custkey", True))


@register("d9c_grouping_sets", "D9", """
SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(o_orderpriority, '(all)') AS priority,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""", "Explicit GROUPING SETS (the general form rollup/cube compile to): "
     "status-only, priority-only, and grand-total groups in one pass")
def d9c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_d9c_orders")
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n
        FROM _d9c_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@register("d2b_null_skipping_aggs", "D2", """
WITH e AS (
  SELECT event_type,
         CASE WHEN value < 50 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(v) AS n_nonnull,
       CAST(CAST(SUM(CAST(v AS DECIMAL(38,10))) AS DECIMAL(38,2)) AS DOUBLE) AS v_sum,
       CAST(CAST(SUM(CAST(v AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(v) AS v_avg,
       MIN(v) AS v_min
FROM e GROUP BY event_type
""", "Null-skipping aggregate semantics: COUNT(*) vs COUNT(col), and "
     "sum/avg/min over a sparsely-null column agree with SQL null rules "
     "in both engines")
def d2b_null_skipping_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") < 50, None).otherwise(F.col("value"))
    return ev.withColumn("v", v).groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        dsum("v").alias("v_sum"),
        davg("v").alias("v_avg"),
        F.min("v").alias("v_min"),
    )


@register("dq_suite", "C5+D2", """
SELECT
  (SELECT COUNT(*) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    AS orphan_lineitems,
  (SELECT COUNT(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
    AS childless_orders,
  (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                         GROUP BY o_orderkey HAVING COUNT(*) > 1))
    AS duplicate_order_keys,
  (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS null_custkeys
""", "Data-quality suite: referential integrity (orphans both ways), "
     "key uniqueness, and null violations in one scalar report - the "
     "pre-ingestion gate a training pipeline runs on every snapshot")
def dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE fused plan, one action (was: four separate driver-side
    # .count() jobs). Both tables collapse to per-key aggregates first
    # (map-side partial aggregation), then a single full-outer join on
    # the key carries every check: a key missing on the orders side
    # marks its lineitems orphaned, a key missing on the lineitem side
    # marks the orders childless, o_cnt > 1 marks duplicates, and the
    # per-key null-custkey counts sum up globally. NULL keys never
    # join (plain `=`), which exactly reproduces NOT EXISTS semantics
    # for NULL foreign keys on both engines.
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lg = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count("*").alias("li_cnt")
    )
    og = o.groupBy(F.col("o_orderkey").alias("key")).agg(
        F.count("*").alias("o_cnt"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_cust"),
    )
    j = og.join(lg, "key", "full_outer")

    def z(c: Column) -> Column:
        return F.coalesce(c, F.lit(0)).cast("bigint")

    return j.agg(
        z(F.sum(F.when(F.col("o_cnt").isNull(), F.col("li_cnt"))))
            .alias("orphan_lineitems"),
        z(F.sum(F.when(F.col("li_cnt").isNull(), F.col("o_cnt"))))
            .alias("childless_orders"),
        z(F.count(F.when(F.col("o_cnt") > 1, 1))).alias("duplicate_order_keys"),
        z(F.sum("null_cust")).alias("null_custkeys"),
    )


@register("d6c_percentiles_by_group", "D6", """
SELECT o_orderpriority,
       ROUND(QUANTILE_CONT(o_totalprice, 0.25), 6) AS p25,
       ROUND(QUANTILE_CONT(o_totalprice, 0.50), 6) AS p50,
       ROUND(QUANTILE_CONT(o_totalprice, 0.75), 6) AS p75,
       ROUND(QUANTILE_CONT(o_totalprice, 0.95), 6) AS p95
FROM orders
GROUP BY o_orderpriority
""", "Percentile profile BY group in one aggregate pass - the "
     "quartile/tail summary behind pricing dashboards. Both engines "
     "interpolate order statistics with lo + (hi-lo)*frac on the "
     "same doubles, so 6-dp rounding is cosmetic, not load-bearing. "
     "Scale note: exact per-group percentiles concentrate each "
     "group's values at its reducer; the group-key cardinality here "
     "(priority classes) is tiny and fixed, which is exactly when "
     "the exact form is affordable - for high-cardinality keys or "
     "100 TB facts, approx_percentile (mergeable t-digest) is the "
     "drop-in scale path with this identical query shape.")
def d6c_percentiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pct = [0.25, 0.50, 0.75, 0.95]
    names = ["p25", "p50", "p75", "p95"]
    return o.groupBy("o_orderpriority").agg(
        *[
            F.round(F.percentile("o_totalprice", F.lit(p)), 6).alias(n)
            for p, n in zip(pct, names)
        ]
    )


@register("d12_boolean_aggs", "D2", """
SELECT event_type,
       COUNT(*) FILTER (WHERE value > 100) AS n_high,
       BOOL_AND(value > 0) AS all_positive,
       BOOL_OR(value < 0) AS any_negative,
       ROUND(CAST(COUNT(*) FILTER (WHERE value > 100) AS DOUBLE)
             / COUNT(*), 6) AS frac_high
FROM events
GROUP BY event_type
""", "Boolean/conditional aggregate family: filtered count (count_if), "
     "universal and existential predicates (bool_and / bool_or - "
     "every/any), and the derived fraction - the data-quality "
     "assertion shapes. All are partial-aggregatable single-pass "
     "aggregates (count_if is a sum of 0/1; bool_and/or are min/max "
     "on booleans), so the plan is one scan + one shuffle of "
     "|types| rows; the fraction divides two exact bigints.")
def d12_boolean_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_high"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") < 0).alias("any_negative"),
        F.round(
            F.count_if(F.col("value") > 100).cast("double") / F.count("*"), 6
        ).alias("frac_high"),
    )


@register("d13_mode_per_group", "D11+D1", """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket AS modal_bucket, n AS modal_count
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, bucket) AS rn
      FROM c)
WHERE rn = 1
""", "Deterministic per-group mode (most frequent value bucket): "
     "count per (group, bucket), then the top row under the TOTAL "
     "order (count desc, bucket asc) - never a bare mode() "
     "aggregate, whose tie-breaking is engine-defined and would "
     "hash-diverge. The ranking window runs over the AGGREGATED "
     "count table (|groups| x |buckets| rows, bounded at any corpus "
     "size), partitioned by group. floor(value/50) is exact on "
     "doubles; counts are exact bigints.")
def d13_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.floor(F.col("value") / 50).cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("bucket"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bucket").alias("modal_bucket"),
            F.col("n").alias("modal_count"),
        )
    )


_TABLES_ALL = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings")

_UTIL_COUNTS_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS tbl, COUNT(*) AS n FROM {t}" for t in _TABLES_ALL
)


@register("util_table_counts", "A1+G1", _UTIL_COUNTS_ORACLE,
          "Catalog sweep: row count of every table the engine serves, "
          "as one union plan - the smoke query a migration runs first "
          "(and proof the catalog module loads all ten tables). Each "
          "branch is a metadata-cheap count-star scan; parquet "
          "footers make these near-free at any scale.")
def util_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t in _TABLES_ALL:
        c = (
            load_table(spark, sf_dir, t)
            .agg(F.count("*").alias("n"))
            .select(F.lit(t).alias("tbl"), "n")
        )
        out = c if out is None else out.unionByName(c)
    return out


@register("d14_weighted_avg", "D2", """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice * l_quantity * 100) AS BIGINT))
            AS DOUBLE) / 100.0
         AS weighted_price_mass,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * l_quantity * 100) AS BIGINT))
                  AS DOUBLE)
             / 100.0 / SUM(l_quantity), 6) AS qty_weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
""", "Quantity-weighted average price per return flag - the "
     "weighted-mean aggregate every pricing/quality pipeline needs "
     "(plain avg() over line items would over-weight small lines). "
     "The weighted mass sums exactly as scaled longs (price has 2 "
     "decimals, quantity is integral, so price*qty*100 is integer-"
     "valued in double and both engines round it to the same long); "
     "the denominator sum of integral quantities is exact in "
     "double; one divide at the end. Single scan, partial-agg "
     "shuffle of |flags| rows.")
def d14_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    mass = (
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_quantity") * 100, 0)
            .cast("bigint")
        ).cast("double") / 100.0
    )
    return li.groupBy("l_returnflag").agg(
        mass.alias("weighted_price_mass"),
        F.round(mass / F.sum("l_quantity"), 6).alias("qty_weighted_avg_price"),
    )


@register("d6d_approx_percentiles_highcard", "D6", None,
          "The high-cardinality scale path for per-group percentiles: "
          "approx_percentile per USER (thousands of keys) instead of "
          "exact percentile per priority class. approx_percentile is a "
          "mergeable quantile sketch, so the plan is partial aggregation "
          "map-side + merge - no per-key value multiset ever "
          "concentrates at a reducer, which is what makes percentiles "
          "affordable over 100 TB with millions of keys. Rows-only by "
          "design (sketch results are engine-specific); the exact twin "
          "d6c is the hash-checked correctness anchor, and "
          "tests/test_skew_percentiles.py proves the mergeable plan "
          "shape at 1M groups.")
def d6d_approx_percentiles_highcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.round(F.approx_percentile("value", F.lit(0.5), F.lit(1000)), 6)
         .alias("p50_approx"),
        F.round(F.approx_percentile("value", F.lit(0.95), F.lit(1000)), 6)
         .alias("p95_approx"),
    )


@register("d16_bitmap_distinct", "D3+D4", """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
""", "Exact distinct counting via BITMAP aggregates - the third point "
     "on the distinct-count spectrum beside naive COUNT DISTINCT "
     "(D3, re-shuffles raw values) and HLL approximation (D4, "
     "mergeable but inexact): values hash to (bucket, bit) positions, "
     "each group x bucket folds into one fixed-size bitmap map-side, "
     "bitmaps OR-merge associatively, and the final count is "
     "popcount - EXACT and mergeable at once, which is why bitmap "
     "indexes are the standard pre-aggregation for distinct-count "
     "dashboards over append-only data at 100 TB (incremental "
     "refresh = OR the new day's bitmaps in; never touch history). "
     "Uses Spark's bitmap_bucket_number / bitmap_construct_agg / "
     "bitmap_count built-ins (JVM codegen, no UDF); the oracle is "
     "plain COUNT DISTINCT, so the hash match proves bitmap "
     "exactness.")
def d16_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("bigint")
             .alias("n_users"))
    )


@register("d10b_unpivot", "D10+B1", """
SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
       event_type, COUNT(*) AS n
FROM events
GROUP BY 1, 2
""", "UNPIVOT (melt): the inverse of D10 - wide per-day count columns "
     "back to tidy (day, event_type, n) rows via DataFrame.unpivot "
     "(SQL UNPIVOT / stack). The round trip pivot-then-unpivot minus "
     "the absent combinations reproduces the plain GROUP BY exactly, "
     "which is what the oracle checks. Unpivot is a map-side "
     "projection (each row expands to its value columns - no "
     "shuffle beyond the pivot's own aggregate), so the wide->long "
     "reshape costs nothing extra at scale.")
def d10b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = d10_pivot(spark, sf_dir)
    long = wide.unpivot(["day"], list(_EVENT_TYPES), "event_type", "n")
    # pivot materializes absent (day, type) combos as 0; the tidy form
    # (and the GROUP BY oracle) has no such rows
    return long.filter(F.col("n") > 0).select("day", "event_type", "n")
