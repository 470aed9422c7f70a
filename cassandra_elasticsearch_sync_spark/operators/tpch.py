"""TPC-H-shaped headline queries (bench workload + C/D-tier composites).

These are the classic multi-join analytical shapes on the corpus's
star schema - the queries BASELINE.md benchmarks. Plans to expect
(verify with .explain): Q3/Q5 broadcast every dimension side under the
64 MB threshold and shuffle only the fact tables; Q6 is a pure
scan+filter+agg with every predicate pushed into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.parity import lsum
from cassandra_elasticsearch_sync_spark.registry import register

_REV = "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0"


def _revenue() -> F.Column:
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return lsum(disc_price, 4)


@register("q3_shipping_priority", "C1+D1+F3", f"""
SELECT o_orderkey,
       {_REV} AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""", "Q3-style: 3-way join + grouped revenue + total-order top-10")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate < TIMESTAMP_NTZ '1998-03-15 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate > TIMESTAMP_NTZ '1998-03-15 00:00:00'")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register("q5_local_supplier_volume", "C1+D1", f"""
SELECT n_name,
       {_REV} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""", "Q5-style: 6-way star join, dimensions broadcast, facts shuffled once")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'")
        & F.expr("o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
    )


@register("q6_forecast_revenue", "B2+D2", """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""", "Q6-style: pure scan + pushed-down filters + global agg (the "
     "I/O-bound shape; PushedFilters should list all three predicates)")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.expr("l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'")
            & F.expr("l_shipdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            lsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register("q4_late_orders", "C4+D1", """
SELECT o_orderpriority, COUNT(*) AS n_late
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""", "Q4-style: EXISTS semi-join (orders with any lineitem shipped "
     ">60 days after order) + priority counts")
def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_late"))


@register("q12_priority_buckets", "D1+B6", """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY l_returnflag
""", "Q12-style: conditional (CASE) aggregation over a fact-fact join")
def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register("q14_promo_share", "C1+D2", """
SELECT ROUND(
         100.0 * (CAST(SUM(CAST(ROUND(CASE WHEN p_type LIKE 'PROMO%'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END * 10000)
                       AS BIGINT)) AS DOUBLE) / 10000.0)
         / (CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) AS DOUBLE) / 10000.0), 6) AS promo_share_pct,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
""", "Q14-style: promo revenue share (conditional scaled-long sums; "
     "part side broadcast)")
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'")
        & F.expr("l_shipdate < TIMESTAMP_NTZ '1997-07-01 00:00:00'")
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    num = F.sum(F.round(promo_rev * 10000, 0).cast("bigint")).cast("double") / 10000.0
    den = F.sum(F.round(rev * 10000, 0).cast("bigint")).cast("double") / 10000.0
    return j.agg(
        F.round(100.0 * num / den, 6).alias("promo_share_pct"),
        F.count("*").alias("n_rows"),
    )


@register("q18_large_orders", "D8+C4", """
SELECT c_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 15000)
GROUP BY c_custkey, o_orderkey
""", "Q18-style: IN over a grouped-HAVING subquery (large-quantity "
     "orders), then 3-way join + per-order totals")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Integer threshold comparison: a float-sum HAVING could flip for a
    # group landing exactly on the boundary (engine summation order).
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100, 0).cast("bigint")).alias("q"))
        .filter(F.col("q") > 15000)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                li.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg((F.sum(F.round(F.col("l_quantity") * 100, 0).cast("bigint"))
              .cast("double") / 100.0).alias("total_qty"))
    )


@register("q7_nation_volume", "C1+D1", f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       EXTRACT(year FROM l_shipdate) AS ship_year,
       {_REV} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
""", "Q7-style: bidirectional two-nation trade volume (nation aliased "
     "twice, OR pair predicate, year rollup)")
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .filter(pair)
        .groupBy("cust_nation", "supp_nation",
                 F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(_revenue().alias("revenue"))
    )


@register("q10_returned_items", "C1+D1+F3", f"""
SELECT c_custkey, c_name, n_name,
       {_REV} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""", "Q10-style: returned-item revenue ranking (4-way join, top-20 "
     "with total order on the exact scaled-long revenue)")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'")
        & F.expr("o_orderdate < TIMESTAMP_NTZ '1997-07-01 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register("q8_market_share", "C1+D1+B6", """
WITH flat AS (
  SELECT CAST(DATE_PART('year', o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ROUND(
         CAST(SUM(CAST(ROUND((CASE WHEN supp_nation = 'NATION_3'
                                    THEN volume ELSE 0 END) * 10000) AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(ROUND(volume * 10000) AS BIGINT)) AS DOUBLE),
         6) AS mkt_share
FROM flat
GROUP BY o_year
""", "Q8-style market share: 8-way star join (nation joined TWICE - "
     "customer side and supplier side), conditional scaled-long revenue "
     "ratio per year. All seven dimension sides broadcast; lineitem is "
     "the only shuffled relation - the plan a 100 TB star join needs.")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'")
        & F.expr("o_orderdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    german = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))

    def scaled(colexpr):
        return F.sum(F.round(colexpr * 10000, 0).cast("bigint")).cast("double")

    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(scaled(german) / scaled(volume), 6).alias("mkt_share"))
    )


@register("q13_order_count_distribution", "C2+D1", """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""", "Q13-style: orders-per-customer distribution (left join keeps the "
     "zero-order customers, two stacked hash aggregations; COUNT(col) "
     "null-skipping makes the no-match customers count 0). Both "
     "aggregations combine map-side; the second one's key space is "
     "tiny, so the plan is one fact shuffle + one micro shuffle.")
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register("q17_small_quantity_revenue", "C1+D1+SQ", """
WITH pa AS (
  SELECT l_partkey AS pa_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
           AS qty_thresh
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pa_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_thresh
""", "Q17-style: revenue lost to small-quantity orders - correlated "
     "AVG subquery decorrelated into a per-part aggregate that joins "
     "back to the fact table. The per-part threshold table is "
     "part-cardinality (tiny vs lineitem), so it broadcasts; lineitem "
     "is scanned twice but never shuffled on a row basis. l_quantity "
     "is integral, so SUM(BIGINT)/COUNT is bit-exact in both engines "
     "and the 0.2x threshold compare is deterministic.")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("bigint")).cast("double")
                / F.count("*")
            )
        ).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(pa), li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (lsum("l_extendedprice", 2) / 7.0).alias("avg_yearly")
        )
    )


@register("q19_bracket_revenue", "B3+C1+D2", f"""
SELECT {_REV} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""", "Q19-style: disjunctive bracket predicates across both join "
     "sides. Catalyst extracts the common constraints it can (join "
     "key null-filters) and evaluates the OR post-join; the part side "
     "still broadcasts, so the disjunction never forces a shuffle "
     "join. One scan each side, one scalar aggregate.")
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(bracket).agg(_revenue().alias("revenue"))


@register("q15_top_supplier", "C1+D1+SQ", f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
""", "Q15-style: top supplier by quarterly revenue - the MAX scalar "
     "subquery becomes an agg-of-agg broadcast, never a global sort. "
     "Revenue goes through the scaled-long exact sum, so the equality "
     "against MAX is bit-exact in both engines. rev is "
     "supplier-cardinality; both the max and the supplier dim "
     "broadcast.")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'")
        & F.expr("l_shipdate < TIMESTAMP_NTZ '1997-04-01 00:00:00'")
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue().alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register("q9_product_profit", "C1+D1", """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)
                - 5 * CAST(ROUND(p_retailprice * l_quantity * 100) AS BIGINT))
            AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
""", "Q9-style: product-line profit by supplier nation and year. The "
     "reference schema has no partsupp/supplycost, so cost is modeled "
     "as 5% of retailprice x quantity; both terms are scaled to exact "
     "longs BEFORE the subtraction (retailprice has 2 decimals, "
     "quantity is integral), so the whole profit sum is integer "
     "arithmetic - no float summation order anywhere. Part/supplier/"
     "nation broadcast; orders and lineitem are the shuffled facts.")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    scaled_profit = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("bigint")
        - 5 * F.round(F.col("p_retailprice") * F.col("l_quantity") * 100, 0)
        .cast("bigint")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(scaled_profit).cast("double") / 10000.0).alias("sum_profit"))
    )


@register("q21_sole_late_shipper", "C1+C4+C5+D1", """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS nsupp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
  FROM lo GROUP BY l_orderkey
),
sole AS (
  SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
  FROM lo JOIN per_order USING (l_orderkey)
  WHERE lo.late AND per_order.nsupp >= 2 AND per_order.nlate = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM sole JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""", "Q21-style: suppliers who were the SOLE late shipper in a "
     "multi-supplier finalized order (late = shipped >60 days after "
     "the order date; the reference schema has no commit/receipt "
     "dates). The classic EXISTS / NOT EXISTS pair decorrelates into "
     "one per-order aggregate (distinct suppliers, distinct late "
     "suppliers) joined back - two scans of the joined fact, both "
     "combining map-side, no correlated re-execution.")
def q21_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lo = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .alias("late"),
        )
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("nlate"),
    )
    sole = (
        lo.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register("q22_idle_customers", "C5+D1+SQ", """
WITH avg_bal AS (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DECIMAL(38,4))
              AS DOUBLE) / COUNT(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS DECIMAL(38,2))
            AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
""", "Q22-style: wealthy customers with no RECENT order (none since "
     "1998-01-01), by nation - the schema has no phone country "
     "codes, so nationkey is the grouping, and the corpus's order "
     "history covers every customer, so 'never ordered' is vacuous "
     "and the idle-account cutoff carries the anti-join semantics. "
     "The AVG scalar subquery is an agg-of-agg broadcast (exact "
     "decimal sum -> bit-identical threshold in both engines); the "
     "NOT EXISTS is a left-anti join against the date-filtered "
     "orders key set (filter pushed to the scan). One shuffle each "
     "for the anti join and the final tiny aggregate.")
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.parity import dsum

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", 4) / F.count("c_acctbal")).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Q2/Q11/Q16/Q20 - the four queries whose original form needs PARTSUPP.
# The corpus has no partsupp table, so the supply relationship is
# derived from lineitem history (same adaptation q9 uses for supply
# cost): a (part, supplier) pair exists iff that supplier ever shipped
# that part, and its "supply cost" / "stock" stand-ins are exact
# cent-scaled aggregates over those shipments. With these four, all 22
# TPC-H query shapes are covered.
# ---------------------------------------------------------------------------

_SUPPLY = """
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY 1, 2
"""


@register("q2_min_cost_supplier", "C1+D1+SQ", f"""
WITH supply AS ({_SUPPLY}),
eu AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
best AS (
  SELECT partkey, MIN(cost_c) AS best_c
  FROM supply JOIN eu ON suppkey = s_suppkey
  GROUP BY partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost
FROM part
JOIN supply ON p_partkey = partkey
JOIN eu     ON suppkey = s_suppkey
JOIN best   USING (partkey)
WHERE p_size = 15 AND p_type = 'STANDARD' AND cost_c = best_c
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""", "Q2-style minimum-cost supplier: for each qualifying part, the "
     "EUROPE supplier(s) achieving the minimum supply cost. The "
     "correlated MIN subquery decorrelates into a per-part agg that "
     "joins back (the classic Catalyst rewrite, done explicitly). "
     "supply is (part,supplier)-cardinality - orders of magnitude "
     "under lineitem - and every dimension side broadcasts; lineitem "
     "shuffles once on its grouping key. Cost is an exact cent-scaled "
     "MIN, so the equality against the per-part best is bit-exact. "
     "Ties on best cost keep every achieving supplier in both "
     "engines; the ORDER BY suffix (s_name, p_partkey) is a total "
     "order, so LIMIT 100 is deterministic.")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cost_c")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu_supply = supply.join(F.broadcast(eu), F.col("suppkey") == F.col("s_suppkey"))
    best = eu_supply.groupBy("partkey").agg(F.min("cost_c").alias("best_c"))
    return (
        eu_supply.join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .join(best, "partkey")
        .filter(F.col("cost_c") == F.col("best_c"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            (F.col("cost_c").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register("q11_important_stock", "C1+D8+SQ", """
WITH v AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS val_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_9', 'NATION_13')
  GROUP BY 1
)
SELECT partkey, CAST(val_c AS DOUBLE) / 100.0 AS value
FROM v
WHERE CAST(val_c AS DOUBLE)
      > (SELECT CAST(SUM(val_c) AS DOUBLE) * 2.0 / COUNT(*) FROM v)
ORDER BY value DESC, partkey
""", "Q11-style important stock: parts whose shipped value through "
     "a 3-nation supplier group exceeds 2x the mean per-part value. "
     "TPC-H scales its q11 fraction by 1/SF; a mean-relative cut is "
     "the equivalent self-scaling form (a fixed fraction goes vacuous "
     "as the part count grows). The HAVING-over-scalar-subquery "
     "becomes agg -> agg-of-agg -> broadcast threshold join - two "
     "passes over a part-cardinality intermediate, never a re-scan "
     "of lineitem. Values are exact cent-scaled longs; the threshold "
     "is the same double expression in both engines, so the > "
     "compare is deterministic even at the boundary.")
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_9", "NATION_13")
    )
    v = (
        li.join(
            F.broadcast(
                s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
                    "s_suppkey"
                )
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("val_c")
        )
    )
    thresh = v.agg(
        (F.sum("val_c").cast("double") * 2.0 / F.count("*")).alias("thr")
    )
    return (
        v.join(F.broadcast(thresh), F.col("val_c").cast("double") > F.col("thr"))
        .select(
            "partkey", (F.col("val_c").cast("double") / 100.0).alias("value")
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


@register("q16_supplier_relationship", "C5+D3", """
SELECT p_brand, p_size, COUNT(DISTINCT suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem) ps
JOIN part ON p_partkey = partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 15, 23)
  AND suppkey NOT IN (SELECT s_suppkey FROM supplier
                      WHERE s_name LIKE '%7')
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
""", "Q16-style supplier relationship: how many distinct suppliers "
     "can ship each (brand, size) bucket, excluding one brand, the "
     "PROMO type class, and 'complaint' suppliers (names ending in "
     "7 stand in for the comment scan). The NOT IN becomes a "
     "left-anti join against a broadcast key set (s_suppkey is "
     "non-null, so anti == NOT IN); the distinct (part,supplier) "
     "projection collapses lineitem before any join, and the "
     "count-distinct shuffles the already-small pair set once.")
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").endswith("7")
    ).select("s_suppkey")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    return (
        ps.join(F.broadcast(bad), ps.suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register("q20_potential_promotion", "C4+D1+SQ", """
WITH pq AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_all_c,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
                  THEN CAST(ROUND(l_quantity * 100) AS BIGINT)
                  ELSE 0 END) AS qty_98_c
  FROM lineitem GROUP BY 1, 2
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_13')
  AND s_suppkey IN (
    SELECT suppkey FROM pq JOIN part ON p_partkey = partkey
    WHERE p_name LIKE 'small%'
      AND qty_98_c > 0 AND qty_all_c > 2 * qty_98_c)
ORDER BY s_name
""", "Q20-style potential promotion: suppliers in two nations holding "
     "surplus stock of 'small…' parts - the availqty > half-of-"
     "shipped predicate maps to lifetime shipped quantity exceeding "
     "twice the 1998 volume (stock stand-in from shipment history). "
     "The nested IN subqueries become one left-semi join against the "
     "qualifying (part,supplier) pair set, which is aggregated once "
     "from lineitem with a conditional partial agg (no second scan "
     "for the date window). Quantities are exact cent-scaled longs, "
     "so the 2x compare never sees float drift; ORDER BY the unique "
     "s_name is a total order.")
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_13")
    )
    qc = F.round(F.col("l_quantity") * 100).cast("bigint")
    in_98 = F.expr(
        "l_shipdate >= TIMESTAMP_NTZ '1998-01-01 00:00:00'"
    ) & F.expr("l_shipdate < TIMESTAMP_NTZ '1999-01-01 00:00:00'")
    pq = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.sum(qc).alias("qty_all_c"),
        F.sum(F.when(in_98, qc).otherwise(F.lit(0))).alias("qty_98_c"),
    )
    qual = (
        pq.join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .filter(
            (F.col("qty_98_c") > 0)
            & (F.col("qty_all_c") > 2 * F.col("qty_98_c"))
        )
        .select("suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qual, s.s_suppkey == qual.suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
