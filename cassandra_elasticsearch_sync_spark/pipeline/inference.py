"""Statistical-inference and association operators.

The experiment-analysis tier a product analytics engine is expected to
carry: two-sample hypothesis testing (Welch), fraud screening
(Benford), dependence measures (mutual information), per-stratum
deterministic sampling, and market-basket association (support /
confidence / lift). Every query is a pure aggregate shape - exact
integer/decimal sums with map-side combine, double arithmetic only in
identical expression trees on both engines (parity.py rules), so all
of them hash-match the DuckDB oracle and all of them are one or two
shuffles regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.parity import r6
from cassandra_elasticsearch_sync_spark.registry import register

_DEC = "decimal(38,10)"


def _dsum4(c):
    """dsum at out_scale=4 (see parity.dsum for why the rescale)."""
    return F.sum(c.cast(_DEC)).cast("decimal(38,4)").cast("double")


@register("k_welch_ttest", "D5", """
WITH g AS (
  SELECT event_type,
         COUNT(value) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DECIMAL(38,4))
              AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,10)))
              AS DECIMAL(38,4)) AS DOUBLE) AS sq
  FROM events
  WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL
  GROUP BY event_type
),
m AS (
  SELECT event_type, n, s / n AS mean,
         (sq - (s / n) * (s / n) * n) / (n - 1) AS var
  FROM g
),
ab AS (
  SELECT
    (SELECT mean FROM m WHERE event_type = 'purchase') AS m1,
    (SELECT var  FROM m WHERE event_type = 'purchase') AS v1,
    (SELECT n    FROM m WHERE event_type = 'purchase') AS n1,
    (SELECT mean FROM m WHERE event_type = 'error')    AS m2,
    (SELECT var  FROM m WHERE event_type = 'error')    AS v2,
    (SELECT n    FROM m WHERE event_type = 'error')    AS n2
)
SELECT n1, n2, ROUND(m1, 6) AS mean_a, ROUND(m2, 6) AS mean_b,
       ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
       ROUND(POWER(v1 / n1 + v2 / n2, 2)
             / (POWER(v1 / n1, 2) / (n1 - 1)
                + POWER(v2 / n2, 2) / (n2 - 1)), 6) AS welch_dof
FROM ab
""", "Welch's unequal-variance two-sample t-test ('did the purchase "
     "cohort's value differ from the error cohort's?') - the A/B "
     "readout. One grouped aggregate computes exact decimal sums of x "
     "and x^2 per arm (map-side combine, two rows out); mean/variance/"
     "t/Welch-Satterthwaite dof evaluate driver-free in identical "
     "double expression trees on both engines. Constant cost at any "
     "corpus size beyond the single scan.")
def k_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    g = (
        e.filter(F.col("event_type").isin("purchase", "error")
                 & F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.count("value").alias("n"),
             _dsum4(F.col("value")).alias("s"),
             _dsum4(F.col("value") * F.col("value")).alias("sq"))
    )
    m = g.select(
        "event_type", "n",
        (F.col("s") / F.col("n")).alias("mean"),
        ((F.col("sq") - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
          * F.col("n")) / (F.col("n") - 1)).alias("var"),
    )
    # two rows -> one: conditional-agg pivot, no join
    ab = m.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("mean"))).alias("m1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("var"))).alias("v1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "error", F.col("mean"))).alias("m2"),
        F.max(F.when(F.col("event_type") == "error", F.col("var"))).alias("v2"),
        F.max(F.when(F.col("event_type") == "error", F.col("n"))).alias("n2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return ab.select(
        "n1", "n2",
        r6(F.col("m1")).alias("mean_a"),
        r6(F.col("m2")).alias("mean_b"),
        r6((F.col("m1") - F.col("m2")) / F.sqrt(se2)).alias("t_stat"),
        r6(F.pow(se2, F.lit(2))
           / (F.pow(F.col("v1") / F.col("n1"), F.lit(2)) / (F.col("n1") - 1)
              + F.pow(F.col("v2") / F.col("n2"), F.lit(2)) / (F.col("n2") - 1))
           ).alias("welch_dof"),
    )


@register("k_benford_first_digit", "D5", """
WITH d AS (
  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice > 0
),
o AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM o)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / total, 6) AS obs_share,
       ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_share,
       ROUND(POWER(CAST(n AS DOUBLE) / total - LOG10(1.0 + 1.0 / digit), 2)
             / LOG10(1.0 + 1.0 / digit) * total, 6) AS chi2_contrib
FROM o CROSS JOIN t
ORDER BY digit
""", "Benford's-law first-significant-digit audit over order totals - "
     "the classic synthetic-data / fraud screen. The digit is taken "
     "from the decimal string of the exact cents value (never "
     "log10-of-a-double, whose floor is boundary-unstable across "
     "engines), counted in one grouped aggregate (9 rows out), and "
     "compared to log10(1+1/d) with per-digit chi-square "
     "contributions. Single scan, map-side combine, constant output.")
def k_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        1, 1).cast("int")
    obs = (o.filter(F.col("o_totalprice") > 0)
           .select(digit.alias("digit"))
           .groupBy("digit").agg(F.count("*").alias("n")))
    tot = obs.agg(F.sum("n").alias("total"))
    exp_share = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            r6(F.col("n").cast("double") / F.col("total")).alias("obs_share"),
            r6(exp_share).alias("benford_share"),
            r6(F.pow(F.col("n").cast("double") / F.col("total") - exp_share,
                     F.lit(2)) / exp_share * F.col("total"))
            .alias("chi2_contrib"),
        )
        .orderBy("digit")
    )


@register("k_mutual_information", "D5", """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2
),
tot AS (SELECT SUM(o) AS n FROM cells),
rows_ AS (SELECT lang, SUM(o) AS rt FROM cells GROUP BY 1),
cols_ AS (SELECT source, SUM(o) AS ct FROM cells GROUP BY 1),
contrib AS (
  SELECT (CAST(c.o AS DOUBLE) / t.n)
         * LN((CAST(c.o AS DOUBLE) * t.n)
              / (CAST(r.rt AS DOUBLE) * CAST(co.ct AS DOUBLE))) AS x
  FROM cells c
  JOIN rows_ r ON c.lang = r.lang
  JOIN cols_ co ON c.source = co.source
  CROSS JOIN tot t
),
hl AS (
  SELECT SUM(-(CAST(rt AS DOUBLE) / t.n)
             * LN(CAST(rt AS DOUBLE) / t.n)) AS h
  FROM rows_ CROSS JOIN tot t
)
SELECT ROUND(SUM(x), 6) AS mutual_information_nats,
       ROUND(SUM(x) / (SELECT h FROM hl), 6) AS uncertainty_coefficient
FROM contrib
""", "Mutual information I(lang; source) in nats plus Theil's "
     "uncertainty coefficient I/H(lang) - 'how much does knowing the "
     "source tell you about the language', the dependence measure "
     "behind feature-selection screens. Identical skeleton to the "
     "chi-square audit: one grouped count builds the contingency "
     "cells (|langs| x |sources| rows, corpus-size independent), "
     "broadcast-joined marginals, double math in matching trees.")
def k_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    tot = cells.agg(F.sum("o").alias("n"))
    rows_ = cells.groupBy("lang").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("source").agg(F.sum("o").alias("ct"))
    contrib = (
        cells.join(F.broadcast(rows_), "lang")
        .join(F.broadcast(cols_), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            ((F.col("o").cast("double") / F.col("n"))
             * F.log((F.col("o").cast("double") * F.col("n"))
                     / (F.col("rt").cast("double")
                        * F.col("ct").cast("double")))).alias("x"),
        )
    )
    hl = (
        rows_.crossJoin(F.broadcast(tot))
        .agg(F.sum(-(F.col("rt").cast("double") / F.col("n"))
                   * F.log(F.col("rt").cast("double") / F.col("n")))
             .alias("h"))
    )
    return (
        contrib.agg(F.sum("x").alias("sx"))
        .crossJoin(F.broadcast(hl))
        .select(
            r6(F.col("sx")).alias("mutual_information_nats"),
            r6(F.col("sx") / F.col("h")).alias("uncertainty_coefficient"),
        )
    )


@register("k_stratified_sample", "K1", """
SELECT doc_id, lang,
       CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         % 100 AS bucket,
       CASE WHEN lang = 'en' THEN 10
            WHEN lang IN ('zh', 'es') THEN 25 ELSE 50 END AS stratum_pct
FROM documents
WHERE CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        % 100
      < CASE WHEN lang = 'en' THEN 10
             WHEN lang IN ('zh', 'es') THEN 25 ELSE 50 END
""", "Stratified deterministic sampling: per-language sampling rates "
     "(downsample the dominant language, keep more of the rare ones) "
     "- the data-mixture rebalance every multilingual training corpus "
     "runs. Membership is hash(doc_id) mod 100 against a per-stratum "
     "threshold, so it is a pure map-side filter: no shuffle, no "
     "rand(), reproducible on every engine/run/executor, and rates "
     "are adjustable per stratum without re-shuffling 100 TB.")
def k_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.pipeline.hashing import (
        portable_hash60,
    )

    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash60(F.col("doc_id").cast("string")) % 100
    rate = (F.when(F.col("lang") == "en", 10)
            .when(F.col("lang").isin("zh", "es"), 25)
            .otherwise(50))
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"),
                 rate.alias("stratum_pct"))
        .filter(F.col("bucket") < F.col("stratum_pct"))
    )


@register("c14_market_basket_lift", "C9", """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n_ord AS (SELECT COUNT(DISTINCT okey) AS n FROM ob),
brand_ct AS (SELECT brand, COUNT(*) AS c FROM ob GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_ct
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, pair_ct,
       ROUND(CAST(pair_ct AS DOUBLE) / n.n, 6) AS support,
       ROUND(CAST(pair_ct AS DOUBLE) / ca.c, 6) AS confidence_a_to_b,
       ROUND((CAST(pair_ct AS DOUBLE) / n.n)
             / ((CAST(ca.c AS DOUBLE) / n.n) * (CAST(cb.c AS DOUBLE) / n.n)),
             6) AS lift
FROM pairs
JOIN brand_ct ca ON ca.brand = brand_a
JOIN brand_ct cb ON cb.brand = brand_b
CROSS JOIN n_ord n
ORDER BY lift DESC, brand_a, brand_b
LIMIT 20
""", "Market-basket association over order contents: distinct "
     "(order, brand) pairs self-joined on the order key -> "
     "co-occurrence counts -> support / confidence / lift, top-20 by "
     "lift with a total tiebreak. The self-join is equi-keyed on the "
     "order key, so the pair blowup is bounded by items-per-basket "
     "squared (a constant), never corpus^2; brand marginals and the "
     "basket count are broadcast. This is one-pass Apriori at the "
     "pair level - the shape a recommender's co-view table uses at "
     "100 TB.")
def c14_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ob = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_ord = ob.agg(F.countDistinct("okey").alias("n"))
    brand_ct = ob.groupBy("brand").agg(F.count("*").alias("c"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey"))
               & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(F.col("a.brand").alias("brand_a"),
                 F.col("b.brand").alias("brand_b"))
        .agg(F.count("*").alias("pair_ct"))
    )
    ca = brand_ct.select(F.col("brand").alias("brand_a"), F.col("c").alias("ca"))
    cb = brand_ct.select(F.col("brand").alias("brand_b"), F.col("c").alias("cb"))
    out = (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "brand_a", "brand_b", "pair_ct",
            r6(F.col("pair_ct").cast("double") / F.col("n")).alias("support"),
            r6(F.col("pair_ct").cast("double") / F.col("ca"))
            .alias("confidence_a_to_b"),
            r6((F.col("pair_ct").cast("double") / F.col("n"))
               / ((F.col("ca").cast("double") / F.col("n"))
                  * (F.col("cb").cast("double") / F.col("n")))).alias("lift"),
        )
    )
    return out.orderBy(F.col("lift").desc(), "brand_a", "brand_b").limit(20)
