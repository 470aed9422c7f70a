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


@register("k_two_proportion_ztest", "D5", """
WITH u AS (
  SELECT user_id, user_id % 2 AS cohort,
         MAX(CASE WHEN event_type = 'purchase' AND value > 480
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT cohort, COUNT(*) AS n, SUM(conv) AS k FROM u GROUP BY cohort
),
ab AS (
  SELECT (SELECT n FROM g WHERE cohort = 0) AS n1,
         (SELECT k FROM g WHERE cohort = 0) AS k1,
         (SELECT n FROM g WHERE cohort = 1) AS n2,
         (SELECT k FROM g WHERE cohort = 1) AS k2
)
SELECT n1, CAST(k1 AS BIGINT) AS k1, n2, CAST(k2 AS BIGINT) AS k2,
       ROUND(CAST(k1 AS DOUBLE) / n1, 6) AS p1,
       ROUND(CAST(k2 AS DOUBLE) / n2, 6) AS p2,
       ROUND(CASE WHEN k1 + k2 = 0 OR k1 + k2 = n1 + n2 THEN NULL
                  ELSE (CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2)
                       / SQRT((CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
                              * (1.0 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
                              * (1.0 / n1 + 1.0 / n2)) END, 6) AS z_stat
FROM ab
""", "Two-proportion z-test on conversion: users split into hash "
     "cohorts, converted = reached a purchase event, pooled-variance "
     "z statistic - the launch-gate readout for binary metrics. One "
     "per-user aggregate (map-side combine) then a 2-row conditional "
     "pivot; every input to the statistic is an exact integer, the "
     "double tree is textually identical on both engines.")
def k_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    u = (
        e.groupBy("user_id")
        .agg(F.max(F.when((F.col("event_type") == "purchase")
                          & (F.col("value") > 480), 1)
                   .otherwise(0)).alias("conv"))
        .withColumn("cohort", F.col("user_id") % 2)
    )
    g = u.groupBy("cohort").agg(F.count("*").alias("n"), F.sum("conv").alias("k"))
    ab = g.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 0, F.col("k"))).alias("k1"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("cohort") == 1, F.col("k"))).alias("k2"),
    )
    p1 = F.col("k1").cast("double") / F.col("n1")
    p2 = F.col("k2").cast("double") / F.col("n2")
    k12 = F.col("k1") + F.col("k2")
    n12 = F.col("n1") + F.col("n2")
    pp = k12.cast("double") / n12
    z = F.when((k12 == 0) | (k12 == n12), F.lit(None).cast("double")) \
        .otherwise((p1 - p2) / F.sqrt(pp * (1.0 - pp)
                                      * (1.0 / F.col("n1")
                                         + 1.0 / F.col("n2"))))
    return ab.select(
        "n1", "k1", "n2", "k2",
        r6(p1).alias("p1"), r6(p2).alias("p2"),
        r6(z).alias("z_stat"),
    )


@register("k_mann_whitney_u", "D5", """
WITH vals AS (
  SELECT value AS v, COUNT(*) AS c,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1
  FROM events
  WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL
  GROUP BY value
),
cum AS (
  SELECT v, c, c1, SUM(c) OVER (ORDER BY v) AS cumc FROM vals
),
s AS (
  SELECT SUM(c1) AS n1, SUM(c - c1) AS n2,
         CAST(CAST(SUM(CAST(c1 * (CAST(cumc - c AS DOUBLE) + (c + 1) / 2.0)
                            AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE)
           AS r1,
         SUM(c * c * c - c) AS tie_term
  FROM cum
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0, 6) AS u_stat,
       ROUND((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
              - CAST(n1 AS DOUBLE) * n2 / 2.0)
             / SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
                    * ((n1 + n2 + 1.0)
                       - CAST(tie_term AS DOUBLE)
                         / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1.0)))),
             6) AS z_stat
FROM s
""", "Mann-Whitney U (Wilcoxon rank-sum) between the purchase and "
     "error arms - THE nonparametric two-sample test, immune to the "
     "heavy tails that break the t-test. No per-row ranking: one "
     "grouped count collapses the corpus to distinct values with tie "
     "counts, the tie-group average ranks come from an exact "
     "distributed cumulative count (two-pass ranged cumsum - no "
     "single-partition window), and the rank-sum + tie-corrected "
     "normal approximation evaluate from exact integers/half-integers "
     "in identical double trees. Scales as O(distinct values), not "
     "O(rows log rows).")
def k_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
        with_global_order,
    )

    e = load_table(spark, sf_dir, "events")
    vals = (
        e.filter(F.col("event_type").isin("purchase", "error")
                 & F.col("value").isNotNull())
        .groupBy(F.col("value").alias("v"))
        .agg(F.count("*").alias("c"),
             F.sum(F.when(F.col("event_type") == "purchase", 1)
                   .otherwise(0)).alias("c1"))
    )
    cum, _ = with_global_order(vals, [F.col("v")], cumsum_of="c",
                               cumsum_col="cumc")
    r1_term = (F.col("c1")
               * ((F.col("cumc") - F.col("c")).cast("double")
                  + (F.col("c") + 1) / 2.0))
    s = cum.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum(r1_term.cast(_DEC)).cast("decimal(38,4)").cast("double")
        .alias("r1"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .alias("tie_term"),
    )
    u = F.col("r1") - F.col("n1").cast("double") * (F.col("n1") + 1) / 2.0
    n = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        F.col("n1").cast("double") * F.col("n2") / 12.0
        * ((n + 1.0)
           - F.col("tie_term").cast("double") / (n.cast("double") * (n - 1.0)))
    )
    return s.select(
        "n1", "n2",
        r6(u).alias("u_stat"),
        r6((u - F.col("n1").cast("double") * F.col("n2") / 2.0) / sigma)
        .alias("z_stat"),
    )


@register("k_zipf_fit", "K4", """
WITH tf AS (
  SELECT w AS token, COUNT(*) AS tf
  FROM (SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS w FROM documents)
  GROUP BY w
),
ranked AS (
  SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS r FROM tf
),
pts AS (
  -- the logs are rounded to 6dp BEFORE the moment sums: JVM Math.log
  -- and libm log disagree by 1 ulp on ~2% of integer inputs, and an
  -- OLS ratio amplifies per-term noise; 6dp-rounded points are
  -- bit-identical doubles on both engines, so everything downstream
  -- is exact arithmetic on equal inputs.
  SELECT ROUND(LN(CAST(r AS DOUBLE)), 6) AS x,
         ROUND(LN(CAST(tf AS DOUBLE)), 6) AS y
  FROM ranked WHERE r <= 1000
),
s AS (
  SELECT COUNT(*) AS n,
         CAST(CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DECIMAL(38,8))
              AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DECIMAL(38,8))
              AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,10))) AS DECIMAL(38,8))
              AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DECIMAL(38,8))
              AS DOUBLE) AS sxx
  FROM pts
)
SELECT n,
       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS zipf_slope,
       ROUND(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n, 6)
         AS log_intercept
FROM s
""", "Zipf's-law fit: OLS slope of log(frequency) on log(rank) over "
     "the top-1000 tokens - the corpus-health diagnostic (natural "
     "text sits near -1; synthetic or template-heavy corpora drift). "
     "Rank comes from the two-pass distributed order (no global "
     "window), the regression moments are exact decimal sums over "
     "1000 points, one row out. The token count is the only "
     "corpus-sized stage and it is a plain grouped count.")
def k_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
        with_global_order,
    )

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token").agg(F.count("*").alias("tf"))
    )
    ranked, _ = with_global_order(
        tf, [F.col("tf").desc(), F.col("token")], rank_col="r")
    # 6dp-rounded log points: bit-identical doubles on both engines
    # (JVM vs libm log differ by 1 ulp on ~2% of integer inputs, which
    # an OLS ratio amplifies) - see the oracle's comment.
    pts = (ranked.filter(F.col("r") <= 1000)
           .select(r6(F.log(F.col("r").cast("double"))).alias("x"),
                   r6(F.log(F.col("tf").cast("double"))).alias("y")))

    def dsum8(c):
        return F.sum(c.cast(_DEC)).cast("decimal(38,8)").cast("double")

    s = pts.agg(
        F.count("*").alias("n"),
        dsum8(F.col("x")).alias("sx"),
        dsum8(F.col("y")).alias("sy"),
        dsum8(F.col("x") * F.col("y")).alias("sxy"),
        dsum8(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
             / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")))
    return s.select(
        "n",
        r6(slope).alias("zipf_slope"),
        r6(F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"))
        .alias("log_intercept"),
    )


@register("k_kruskal_wallis", "D5", """
WITH vals AS (
  SELECT value AS v, COUNT(*) AS c,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c2,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c3
  FROM events
  WHERE event_type IN ('purchase', 'error', 'click') AND value IS NOT NULL
  GROUP BY value
),
cum AS (
  SELECT v, c, c1, c2, c3, SUM(c) OVER (ORDER BY v) AS cumc FROM vals
),
s AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c3) AS BIGINT) AS n3,
         CAST(CAST(SUM(CAST(c1 * (CAST(cumc - c AS DOUBLE) + (c + 1) / 2.0)
                            AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE)
           AS r1,
         CAST(CAST(SUM(CAST(c2 * (CAST(cumc - c AS DOUBLE) + (c + 1) / 2.0)
                            AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE)
           AS r2,
         CAST(CAST(SUM(CAST(c3 * (CAST(cumc - c AS DOUBLE) + (c + 1) / 2.0)
                            AS DECIMAL(38,10))) AS DECIMAL(38,4)) AS DOUBLE)
           AS r3,
         CAST(SUM(c * c * c - c) AS BIGINT) AS tie_term
  FROM cum
)
SELECT n1, n2, n3,
       ROUND(12.0 * (r1 * r1 / n1 + r2 * r2 / n2 + r3 * r3 / n3)
             / (CAST(n1 + n2 + n3 AS DOUBLE) * (n1 + n2 + n3 + 1.0))
             - 3.0 * (n1 + n2 + n3 + 1.0), 6) AS h_stat,
       ROUND((12.0 * (r1 * r1 / n1 + r2 * r2 / n2 + r3 * r3 / n3)
              / (CAST(n1 + n2 + n3 AS DOUBLE) * (n1 + n2 + n3 + 1.0))
              - 3.0 * (n1 + n2 + n3 + 1.0))
             / (1.0 - CAST(tie_term AS DOUBLE)
                      / (CAST(n1 + n2 + n3 AS DOUBLE)
                         * (n1 + n2 + n3) * (n1 + n2 + n3) 
                         - (n1 + n2 + n3))), 6) AS h_tied
FROM s
""", "Kruskal-Wallis H test across three arms (purchase / error / "
     "click) - the k-group generalization of Mann-Whitney, THE "
     "nonparametric one-way ANOVA. Same scale machinery as "
     "k_mann_whitney_u: one grouped count collapses the corpus to "
     "distinct values with per-arm tie counts, tie-average ranks come "
     "from the distributed cumulative count (two-pass ranged cumsum), "
     "per-arm rank sums accumulate in DECIMAL(38,10) (half-integers - "
     "exact), and H plus the documented tie correction "
     "1 - sum(t^3-t)/(N^3-N) evaluate in textually identical double "
     "trees. Cost is O(distinct values), not O(rows log rows).")
def k_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
        with_global_order,
    )

    e = load_table(spark, sf_dir, "events")
    arms = [("purchase", "c1"), ("error", "c2"), ("click", "c3")]
    vals = (
        e.filter(F.col("event_type").isin([a for a, _ in arms])
                 & F.col("value").isNotNull())
        .groupBy(F.col("value").alias("v"))
        .agg(F.count("*").alias("c"),
             *[F.sum(F.when(F.col("event_type") == a, 1).otherwise(0))
               .alias(cn) for a, cn in arms])
    )
    cum, _ = with_global_order(vals, [F.col("v")], cumsum_of="c",
                               cumsum_col="cumc")
    rank_avg = ((F.col("cumc") - F.col("c")).cast("double")
                + (F.col("c") + 1) / 2.0)
    s = cum.agg(
        *[F.sum(cn).alias(f"n{i+1}") for i, (_, cn) in enumerate(arms)],
        *[F.sum((F.col(cn) * rank_avg).cast(_DEC)).cast("decimal(38,4)")
          .cast("double").alias(f"r{i+1}") for i, (_, cn) in enumerate(arms)],
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .alias("tie_term"),
    )
    n = F.col("n1") + F.col("n2") + F.col("n3")
    ssum = (F.col("r1") * F.col("r1") / F.col("n1")
            + F.col("r2") * F.col("r2") / F.col("n2")
            + F.col("r3") * F.col("r3") / F.col("n3"))
    h = (F.lit(12.0) * ssum / (n.cast("double") * (n + 1.0))
         - 3.0 * (n + 1.0))
    corr = (F.lit(1.0) - F.col("tie_term").cast("double")
            / (n.cast("double") * n * n - n))
    return s.select(
        "n1", "n2", "n3",
        r6(h).alias("h_stat"),
        r6(h / corr).alias("h_tied"),
    )
