"""Window functions (SURVEY.md 2.E).

Every window carries a total order (deterministic tiebreak on a key
column) because the driver's value-hash is exact: rank ties or frame
boundaries that depend on an ambiguous sort would differ between
engines even on identical data.

Scale note: all windows partition by a real key (mktsegment, user_id),
so state is distributed; there is no global unpartitioned window in the
verified surface except inside top-k after a LIMIT-sized reduction.
Running double sums inside frames use the exact-decimal trick
(parity.dsum_w) - window sums are order-sensitive float folds
otherwise (DuckDB uses segment trees, Spark streams the frame; only
exact decimal arithmetic hash-matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.parity import DEC
from cassandra_elasticsearch_sync_spark.registry import register


@register("e1_ranking", "E1", """
SELECT c_custkey, c_mktsegment,
       ROW_NUMBER()  OVER w AS rn,
       RANK()        OVER w AS rnk,
       DENSE_RANK()  OVER w AS drnk,
       NTILE(4)      OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST()    OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""", "Ranking family over a keyed window with total-order tiebreak")
def e1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register("e2_lag_lead", "E2", """
WITH e AS (SELECT event_id, user_id, value,
                  CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es
           FROM events)
SELECT event_id, user_id,
       es - LAG(es)  OVER w AS secs_since_prev,
       LEAD(value)   OVER w AS next_value,
       LAG(value, 2, -1.0) OVER w AS value_2_back
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
""", "lag/lead offsets per user (sessionization deltas)")
def e2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("es") - F.lag("es").over(w)).alias("secs_since_prev"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("value_2_back"),
    )


@register("e3_frame_aggs", "E3", """
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,10)))
            OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,6)) AS DOUBLE) AS running_sum,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,10)))
            OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE) AS moving_sum_4,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_in_frame
FROM events
""", "Frame aggregates: running + moving sums (exact decimal inside the frame)")
def e3_frame_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-3, Window.currentRow)
    dec_val = F.col("value").cast(DEC)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec_val).over(run).cast("decimal(38,6)").cast("double").alias("running_sum"),
        F.sum(dec_val).over(mov).cast("decimal(38,6)").cast("double").alias("moving_sum_4"),
        F.count("*").over(mov).alias("n_in_frame"),
    )


@register("e4_topk_per_group", "E4", """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
WHERE rn <= 3
""", "Per-group top-k (also the LWW-resolve shape, SURVEY.md 2.L row L3)")
def e4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
    )


@register("e5_first_last_value", "E5", """
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey)  OVER w AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""", "first_value/last_value with an explicit full frame")
def e5_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@register("e3b_range_window", "E3", """
WITH e AS (SELECT event_id, user_id,
                  CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS es,
                  value
           FROM events)
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER w AS DECIMAL(38,6)) AS DOUBLE)
         AS value_last_hour
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY es
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""", "rangeBetween frame on epoch seconds: sliding 1h per-row window "
     "(value-based frame, not row-count-based)")
def e3b_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("es"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast(DEC)).over(w)
         .cast("decimal(38,6)").cast("double").alias("value_last_hour"),
    )


@register("e5b_last_nonnull", "E5", """
WITH e AS (
  SELECT event_id, user_id,
         CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
  FROM events
)
SELECT event_id, user_id,
       LAST_VALUE(purchase_value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS UNBOUNDED PRECEDING) AS last_purchase_value
FROM e
""", "last_value IGNORE NULLS: forward-fill of the most recent "
     "purchase amount per user (the gap-filling primitive)")
def e5b_last_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.withColumn("purchase_value", pv).select(
        "event_id",
        "user_id",
        F.last("purchase_value", ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register("e4b_topk_with_ties", "E4", """
SELECT c_mktsegment, c_custkey, c_acctbal
FROM (SELECT *, RANK() OVER (PARTITION BY c_mktsegment
                             ORDER BY ROUND(c_acctbal, 0) DESC) AS rnk
      FROM customer)
WHERE rnk <= 3
""", "Top-k WITH TIES: rank() keeps every row tied at the boundary "
     "(row_number's e4 picks exactly k) - ranking on a coarsened key "
     "so ties actually occur")
def e4b_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.round("c_acctbal", 0).desc())
    return (
        c.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


@register("e6_distribution_functions", "E1", """
SELECT l_orderkey, l_linenumber,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       CAST(NTILE(2) OVER w AS INT) AS half
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_extendedprice, l_linenumber)
""", "Distribution window functions (percent_rank / cume_dist / ntile) "
     "over each order's line items. The partition key is the "
     "high-cardinality l_orderkey with a bounded group size (<= 7 "
     "lines/order), so the window parallelizes at any scale - the "
     "scale-safe home for distribution functions (corpus-wide ranks "
     "go through operators/distributed_order.py instead).")
def e6_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_extendedprice", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(2).over(w).cast("int").alias("half"),
    )


@register("e7_month_over_month", "E2+D1", """
WITH monthly AS (
  SELECT o_orderpriority,
         STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month, revenue,
       ROUND((revenue - LAG(revenue) OVER w)
             / LAG(revenue) OVER w, 6) AS mom_change
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
""", "Month-over-month revenue change per priority class: the lag "
     "window runs over the AGGREGATED table (priorities x months = "
     "a few hundred rows at any corpus size), never the raw facts - "
     "the aggregate-then-window ordering is what keeps a trend query "
     "scale-safe. Revenue is the scaled-long exact sum, so the "
     "(cur-prev)/prev divide sees bit-identical inputs in both "
     "engines.")
def e7_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.parity import lsum

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
    ).agg(lsum("o_totalprice", 2).alias("revenue"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "o_orderpriority", "month", "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_change"),
    )


@register("e8_nth_value", "E5", """
SELECT l_orderkey, l_linenumber,
       NTH_VALUE(l_extendedprice, 2) OVER w AS second_price,
       LEAD(l_extendedprice, 2, -1.0) OVER w AS price_after_next,
       LAG(l_linenumber, 1, CAST(0 AS INT)) OVER w AS prev_line
FROM lineitem
WHERE l_orderkey % 50 = 0
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""", "Window navigation beyond first/last: NTH_VALUE over the full "
     "frame plus multi-offset LEAD/LAG with explicit defaults - the "
     "line-level 'compare against the order's 2nd line' shape. "
     "Partitioned by l_orderkey (bounded frames per key, scale-safe); "
     "prices compare exactly as untouched parquet doubles.")
def e8_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wo = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
        F.lead("l_extendedprice", 2, -1.0).over(wo).alias("price_after_next"),
        F.lag("l_linenumber", 1, 0).over(wo).alias("prev_line"),
    )


@register("e9_decile_by_segment", "E1+D1", """
WITH seg AS (
  SELECT c_mktsegment AS segment, o_totalprice, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
),
t AS (
  SELECT segment, o_totalprice,
         NTILE(10) OVER (PARTITION BY segment
                         ORDER BY o_totalprice, o_orderkey) AS decile
  FROM seg
)
SELECT segment, decile, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue
FROM t
GROUP BY segment, decile
""", "Per-segment price deciles over the full orders fact - the "
     "grouped analogue of price_deciles. A naive NTILE window "
     "partitioned by market segment puts ~1/5 of ALL orders on one "
     "task at any scale; this uses with_grouped_ntile "
     "(operators/distributed_order.py): range partition on "
     "(segment, price, key), per-(partition, group) counts to the "
     "driver (P+G-1 tiny rows), broadcast offsets, windows bounded "
     "by partition size - bit-identical to SQL NTILE semantics, "
     "skew-proof. The rank order (price, orderkey) is total, so "
     "bucket assignment is deterministic in both engines.")
def e9_decile_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
        with_grouped_ntile,
    )
    from cassandra_elasticsearch_sync_spark.parity import lsum

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "o_totalprice", "o_orderkey"
    )
    tiled = with_grouped_ntile(
        seg,
        ["segment"],
        [F.col("o_totalprice"), F.col("o_orderkey")],
        10,
        bucket_col="decile",
    )
    return tiled.groupBy("segment", "decile").agg(
        F.count("*").alias("n_orders"),
        lsum("o_totalprice", 2).alias("revenue"),
    )


@register("e10_pareto_revenue_share", "E3+D1", """
WITH o AS (
  SELECT o_orderpriority AS pri, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
c AS (
  SELECT pri, o_orderkey, cents,
         SUM(cents) OVER (PARTITION BY pri
                          ORDER BY cents DESC, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_cents,
         ROW_NUMBER() OVER (PARTITION BY pri
                            ORDER BY cents DESC, o_orderkey) AS rk,
         SUM(cents) OVER (PARTITION BY pri) AS tot_cents,
         COUNT(*) OVER (PARTITION BY pri) AS n
  FROM o
)
SELECT pri,
       CAST(MIN(rk) AS BIGINT) AS orders_to_half_revenue,
       ROUND(CAST(MIN(rk) AS DOUBLE) / MIN(n), 6) AS frac_of_orders
FROM c
WHERE cum_cents * 2 >= tot_cents
GROUP BY pri
""", "Pareto concentration report: per priority class, how many of "
     "the largest orders carry HALF the class revenue (and what "
     "fraction of the order count that is) - the 80/20 skew check "
     "run before capacity planning. The cumulative revenue is the "
     "GROUPED two-pass cumsum (with_grouped_order + cumsum: "
     "range-partitioned, per-(partition,group) windows, broadcast "
     "offsets - no group ever pinned to one task); revenue is exact "
     "scaled-long cents so the half-total comparison is pure "
     "integer arithmetic. The oracle's naive partitioned window "
     "hash-matches it bit-for-bit.")
def e10_pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
        with_grouped_order,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    cum = with_grouped_order(
        o, ["pri"],
        [F.col("cents").desc(), F.col("o_orderkey")],
        rank_col="rk", cumsum_of="cents", cumsum_col="cum_cents",
    )
    totals = cum.groupBy("pri").agg(
        F.sum("cents").alias("tot_cents"), F.count("*").alias("n")
    )
    j = cum.join(F.broadcast(totals), "pri").filter(
        F.col("cum_cents") * 2 >= F.col("tot_cents")
    )
    half = j.groupBy("pri").agg(
        F.min("rk").cast("bigint").alias("orders_to_half_revenue"),
        F.min("n").alias("n"),
    )
    return half.select(
        "pri",
        "orders_to_half_revenue",
        F.round(
            F.col("orders_to_half_revenue").cast("double") / F.col("n"), 6
        ).alias("frac_of_orders"),
    )


@register("e11_churn_gaps", "E2+D1", """
WITH g AS (
  SELECT o_orderpriority,
         DATE_DIFF('day', CAST(o_orderdate AS DATE),
                   CAST(LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate,
                                                         o_orderkey) AS DATE))
           AS gap_days
  FROM orders
)
SELECT o_orderpriority,
       COUNT(gap_days) AS n_gaps,
       CAST(SUM(CASE WHEN gap_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_churn_gaps,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
       ROUND(CAST(SUM(CASE WHEN gap_days > 90 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(gap_days), 6) AS churn_gap_rate
FROM g WHERE gap_days IS NOT NULL
GROUP BY o_orderpriority
""", "Churn-gap detection: per customer, the day gap to their NEXT "
     "order (LEAD over a window partitioned by the high-cardinality "
     "customer key - bounded per-key history, scale-safe), then the "
     "share of gaps exceeding 90 days per priority class - the "
     "dormancy signal a retention model trains on. Integer day "
     "arithmetic end to end; the rate divides two exact bigints. "
     "Ordering is total via (orderdate, orderkey).")
def e11_churn_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_orderpriority",
        F.datediff(
            F.lead("o_orderdate").over(w).cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return g.groupBy("o_orderpriority").agg(
        F.count("gap_days").alias("n_gaps"),
        F.sum(F.when(F.col("gap_days") > 90, 1).otherwise(0))
        .cast("bigint").alias("n_churn_gaps"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
        F.round(
            F.sum(F.when(F.col("gap_days") > 90, 1).otherwise(0)).cast("double")
            / F.count("gap_days"),
            6,
        ).alias("churn_gap_rate"),
    )


@register("e12_range_interval_frame", "E3", """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(EPOCH(DATE_TRUNC('second', o_orderdate)) AS BIGINT) AS es,
         o_totalprice
  FROM orders
)
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
              OVER (PARTITION BY o_custkey ORDER BY es
                    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
            AS DECIMAL(38,2)) AS DOUBLE) AS trailing_30d_revenue,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY es
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
         AS trailing_30d_orders
FROM o
""", "RANGE-interval window frame: per customer, each order's "
     "trailing-30-day revenue and order count - the frame bound is a "
     "VALUE offset on event time (2592000 s), not a row count, so "
     "same-timestamp rows aggregate together and sparse/bursty "
     "histories window correctly where a ROWS frame would not (the "
     "semantic difference from e3). One shuffle on the partition key; "
     "frames never leave the per-customer group, sums decimal-exact. "
     "The trailing-window-metric shape behind every rolling-revenue "
     "and rate-limit query.")
def e12_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    es = F.unix_timestamp(F.date_trunc("second", "o_orderdate"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("es"))
        .rangeBetween(-2592000, 0)
    )
    return (
        o.select("o_custkey", "o_orderkey", es.alias("es"), "o_totalprice")
        .select(
            "o_custkey", "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(38,10)")).over(w)
             .cast("decimal(38,2)").cast("double")
             .alias("trailing_30d_revenue"),
            F.count("*").over(w).alias("trailing_30d_orders"),
        )
    )
