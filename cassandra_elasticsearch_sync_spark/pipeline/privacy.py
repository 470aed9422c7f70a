"""PII detection / redaction + URL analysis (SURVEY.md 2.K row K4).

The privacy pass every training-data pipeline runs before release:
find emails / phone numbers / IP addresses, count them, and redact
them with typed placeholders. The corpus text is synthetic word-salad
with no real PII, so each query first *injects* PII deterministically
from doc_id (the same pure-SQL expression on both engines - no
randomness, no UDF) and then detects/redacts it; the detection logic
never knows which docs were seeded, so the regex path is exercised
for real, including the no-match docs.

Regex parity note: Spark compiles Java regex, DuckDB compiles RE2.
The patterns below stay inside the common subset - character classes,
+/{n,} quantifiers, one capture group, no lookaround, no backrefs -
so both engines match identical spans. Spark's regexp_replace is
global by default; DuckDB needs the explicit 'g' flag.

Scale shape: every operator here is a single narrow projection -
per-row regex work, no shuffle at all until the final (tiny) agg.
At 100 TB this is the embarrassingly-parallel map stage; the regexes
are compiled once per task by the JVM, not per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register

EMAIL_PAT = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}"
PHONE_PAT = r"555-[0-9]{4}"
IP_PAT = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"
URL_PAT = r"https?://[A-Za-z0-9.-]+/[A-Za-z0-9./-]*"
DOMAIN_PAT = r"https?://([A-Za-z0-9.-]+)/"

# Deterministic PII seeding: ~1/3 of docs get an email, ~1/5 a phone,
# ~1/7 an IP (overlapping - a doc can carry all three). Same literal
# SQL on the oracle side.
_SEED_SQL = """
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
                 ELSE '' END AS raw
  FROM documents
"""


def _seed_pii(d: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"),
                 F.lit("@mail.example.com")),
    ).otherwise("")
    phone = F.when(
        did % 5 == 0,
        F.concat(F.lit(" call 555-"),
                 F.lpad((did % 10000).cast("string"), 4, "0")),
    ).otherwise("")
    ip = F.when(
        did % 7 == 0,
        F.concat(F.lit(" from 10."), (did % 256).cast("string"),
                 F.lit("."), ((did * 7) % 256).cast("string"),
                 F.lit("."), ((did * 13) % 256).cast("string")),
    ).otherwise("")
    return d.select(
        "doc_id", "source",
        F.concat(F.col("text"), email, phone, ip).alias("raw"),
    )


@register("k_pii_scrub", "K4", rf"""
WITH seeded AS ({_SEED_SQL})
SELECT doc_id,
       LEN(REGEXP_EXTRACT_ALL(raw, '{EMAIL_PAT}')) AS n_emails,
       LEN(REGEXP_EXTRACT_ALL(raw, '{PHONE_PAT}')) AS n_phones,
       LEN(REGEXP_EXTRACT_ALL(raw, '{IP_PAT}')) AS n_ips,
       REGEXP_REPLACE(
         REGEXP_REPLACE(
           REGEXP_REPLACE(raw, '{EMAIL_PAT}', '<EMAIL>', 'g'),
           '{PHONE_PAT}', '<PHONE>', 'g'),
         '{IP_PAT}', '<IP>', 'g') AS clean
FROM seeded
WHERE doc_id % 3 = 0 OR doc_id % 5 = 0 OR doc_id % 7 = 0
""", "PII scrub: count + redact emails, phone numbers, and IPv4 "
     "addresses with typed placeholders (<EMAIL>/<PHONE>/<IP>), the "
     "privacy pass before a corpus release. PII is seeded "
     "deterministically from doc_id (synthetic corpus has none), then "
     "detected by regexes the seeding never told about; redaction "
     "order email->phone->ip is fixed so the engines transform "
     "identically. Pure narrow map over the scan - zero shuffles; "
     "the full redacted string is hash-compared, so every byte of "
     "the replacement logic is verified.")
def k_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _seed_pii(load_table(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    raw = F.col("raw")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, EMAIL_PAT, "<EMAIL>"),
            PHONE_PAT, "<PHONE>"),
        IP_PAT, "<IP>")
    return d.filter((did % 3 == 0) | (did % 5 == 0) | (did % 7 == 0)).select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_PAT), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(PHONE_PAT), 0)).cast("long").alias("n_phones"),
        F.size(F.regexp_extract_all(raw, F.lit(IP_PAT), 0)).cast("long").alias("n_ips"),
        clean.alias("clean"),
    )


_URL_SEED_SQL = """
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 2 = 0
                 THEN ' see '
                      || CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END
                      || '://site' || CAST(doc_id % 7 AS VARCHAR)
                      || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                 ELSE '' END AS raw
  FROM documents
"""


@register("k_url_domains", "K4", rf"""
WITH seeded AS ({_URL_SEED_SQL})
SELECT REGEXP_EXTRACT(raw, '{DOMAIN_PAT}', 1) AS domain,
       COUNT(*) AS n_urls,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(CASE WHEN raw LIKE '%https://%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_https
FROM seeded
WHERE REGEXP_MATCHES(raw, '{URL_PAT}')
GROUP BY 1
ORDER BY n_urls DESC, domain
""", "URL/domain statistics: extract the domain of each doc's URL and "
     "aggregate per-domain counts + https share - the link-graph "
     "profile a web-corpus pipeline computes for source weighting and "
     "blocklists. URLs are seeded deterministically (half the docs, "
     "7 domains, mixed schemes); extraction is a single capture-group "
     "regex in the common Java/RE2 subset. One narrow map + one tiny "
     "7-row aggregate; the domain key space is bounded, so the "
     "shuffle is negligible at any corpus size.")
def k_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.when(
        did % 2 == 0,
        F.concat(
            F.lit(" see "),
            F.when(did % 4 == 0, F.lit("http")).otherwise(F.lit("https")),
            F.lit("://site"), (did % 7).cast("string"),
            F.lit(".example.org/p/"), did.cast("string"),
        ),
    ).otherwise("")
    seeded = d.select(
        "doc_id", F.concat(F.col("text"), url).alias("raw")
    )
    return (
        seeded.filter(F.col("raw").rlike(URL_PAT))
        .groupBy(F.regexp_extract(F.col("raw"), DOMAIN_PAT, 1).alias("domain"))
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(
                F.when(F.col("raw").contains("https://"), 1).otherwise(0)
            ).cast("bigint").alias("n_https"),
        )
        .orderBy(F.col("n_urls").desc(), "domain")
    )


@register("k_anonymity_audit", "K4+D1", """
WITH q AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer
),
g AS (
  SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS group_size
  FROM q GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, bal_band, group_size,
       (group_size < 5) AS violates_k5
FROM g
""", "k-anonymity audit over quasi-identifiers (nation x segment x "
     "coarsened balance band): every equivalence class's size, "
     "flagged where fewer than k=5 individuals share the class - the "
     "re-identification risk check a dataset must pass before "
     "release, and the generalization feedback loop's input (classes "
     "below k get their bands widened). One grouped count on the "
     "quasi-identifier tuple: map-side partial, scales to any "
     "cardinality; banding is exact integer floor division so both "
     "engines agree without float hazards.")
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    q = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    g = q.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("group_size")
    )
    return g.select(
        "c_nationkey", "c_mktsegment", "bal_band", "group_size",
        (F.col("group_size") < 5).alias("violates_k5"),
    )


@register("k_l_diversity_audit", "K4+D3", """
WITH q AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         (c_acctbal < 0) AS in_debt
  FROM customer
),
g AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         COUNT(*) AS group_size,
         COUNT(DISTINCT in_debt) AS l_distinct
  FROM q GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, bal_band, group_size, l_distinct,
       (l_distinct < 2) AS violates_l2
FROM g
""", "l-diversity audit: k-anonymity's necessary complement - an "
     "equivalence class can be large (k-safe) yet reveal the "
     "sensitive attribute anyway if EVERY member shares its value "
     "(the homogeneity attack). Per quasi-identifier class (same "
     "classes as k_anonymity_audit), count DISTINCT sensitive "
     "values (here: the in-debt flag) and flag classes below l=2 - "
     "those leak the sensitive bit for every member even though no "
     "row is individually identifiable. One grouped "
     "count+count-distinct on the class tuple, map-side partial; "
     "the sensitive flag is exact boolean arithmetic.")
def k_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    q = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        (F.col("c_acctbal") < 0).alias("in_debt"),
    )
    g = q.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("group_size"),
        F.countDistinct("in_debt").alias("l_distinct"),
    )
    return g.select(
        "c_nationkey", "c_mktsegment", "bal_band", "group_size",
        "l_distinct", (F.col("l_distinct") < 2).alias("violates_l2"),
    )


@register("k_t_closeness_audit", "K4+D5", """
WITH cls AS (
  SELECT o_orderstatus AS status,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS p
  FROM orders
),
class_tot AS (SELECT status, yr, COUNT(*) AS n_c FROM cls GROUP BY 1, 2),
gdist AS (SELECT p, COUNT(*) AS g_p FROM cls GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM cls),
cp AS (SELECT status, yr, p, COUNT(*) AS cnt FROM cls GROUP BY 1, 2, 3),
grid AS (
  SELECT ct.status, ct.yr, ct.n_c, g.p, g.g_p,
         COALESCE(cp.cnt, 0) AS cnt, t.n
  FROM class_tot ct CROSS JOIN gdist g CROSS JOIN tot t
  LEFT JOIN cp ON cp.status = ct.status AND cp.yr = ct.yr AND cp.p = g.p
),
cum AS (
  SELECT status, yr, n_c, n, p,
         SUM(cnt * n - g_p * n_c)
           OVER (PARTITION BY status, yr ORDER BY p
                 ROWS UNBOUNDED PRECEDING) AS d
  FROM grid
)
SELECT status, yr, group_size, t_emd, t_emd > 0.15 AS violates_t
FROM (
  SELECT status, yr, n_c AS group_size,
         ROUND(CAST(SUM(ABS(d)) AS DOUBLE)
               / (CAST(n_c AS DOUBLE) * n * 4), 6) AS t_emd
  FROM cum GROUP BY status, yr, n_c, n
)
""", "t-closeness audit - the third rung of the release-safety "
     "ladder (k_anonymity_audit: class sizes; k_l_diversity_audit: "
     "sensitive-value variety; here: sensitive-value DISTRIBUTION "
     "distance). Per quasi-identifier class (order status x year), "
     "the Earth Mover's Distance between the class's distribution of "
     "the ORDERED sensitive attribute (priority rank 1..5) and the "
     "global distribution: EMD = sum_k |D_k| / (n_c*N*(m-1)) where "
     "D_k is the cumulative INTEGER cross-multiplied deviation "
     "sum_{p<=k}(cnt_cp*N - g_p*n_c) - every quantity an exact "
     "bigint until ONE final division, so the audit is "
     "bit-deterministic (same technique as the CUSUM changepoint). "
     "Shape: three grouped counts (all map-side partial), a "
     "classes x 5 broadcast grid, bounded windows over 5 ordered "
     "rows per class - linear scan cost, class-bounded everything "
     "else, at any corpus size.")
def k_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cls = o.select(
        F.col("o_orderstatus").alias("status"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("p"),
    )
    class_tot = cls.groupBy("status", "yr").agg(F.count("*").alias("n_c"))
    glob = cls.groupBy("p").agg(F.count("*").alias("g_p"))
    tot = cls.agg(F.count("*").alias("n"))
    cp = cls.groupBy("status", "yr", "p").agg(F.count("*").alias("cnt"))
    grid = (
        class_tot.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cp, ["status", "yr", "p"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    w = (Window.partitionBy("status", "yr").orderBy("p")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = grid.select(
        "status", "yr", "n_c", "n", "p",
        F.sum(F.col("cnt") * F.col("n") - F.col("g_p") * F.col("n_c"))
        .over(w).alias("d"),
    )
    out = cum.groupBy("status", "yr", "n_c", "n").agg(
        F.round(F.sum(F.abs("d")).cast("double")
                / (F.col("n_c").cast("double") * F.col("n") * 4), 6)
        .alias("t_emd"))
    return out.select(
        "status", "yr", F.col("n_c").alias("group_size"), "t_emd",
        (F.col("t_emd") > 0.15).alias("violates_t"),
    )


@register("k_url_canonical_dedup", "K1+K4", r"""
WITH seeded AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0
                  THEN UPPER('site' || CAST(doc_id % 10 AS VARCHAR)
                             || '.example.org')
                  ELSE 'site' || CAST(doc_id % 10 AS VARCHAR)
                       || '.example.org' END)
         || '/p/' || CAST(doc_id % 25 AS VARCHAR)
         || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 11 = 0 THEN '?utm_source=feed' ELSE '' END)
         AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         REGEXP_REPLACE(
           REGEXP_REPLACE(
             REGEXP_REPLACE(
               REGEXP_REPLACE(LOWER(url), '^https?://', ''),
               '^www\.', ''),
             '\?utm.*$', ''),
           '/$', '') AS canonical_url
  FROM seeded
)
SELECT canonical_url,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_variants,
       COUNT(DISTINCT doc_id) AS n_docs
FROM canon GROUP BY 1
""", "Canonical-URL deduplication - the web-pipeline dedup that runs "
     "BEFORE any content hashing: URLs that differ only by scheme "
     "(http/https), www. prefix, host case, trailing slash, or "
     "tracking query params are the same page. Each doc gets a "
     "deterministically-seeded raw URL exercising all five noise "
     "axes; canonicalization is lower + four anchored regex strips "
     "(identical RE2-subset patterns on both engines), then a "
     "grouped keep-smallest-doc_id - K1's exact-dedup shape keyed by "
     "the canonical string. Narrow map + one grouped aggregate: "
     "map-side partial, linear at any corpus size.")
def k_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = F.concat(F.lit("site"), (did % 10).cast("string"),
                    F.lit(".example.org"))
    url = F.concat(
        F.when(did % 2 == 0, F.lit("http")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(did % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.upper(host)).otherwise(host),
        F.lit("/p/"), (did % 25).cast("string"),
        F.when(did % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit("?utm_source=feed")).otherwise(F.lit("")),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(url), "^https?://", ""),
                r"^www\.", ""),
            r"\?utm.*$", ""),
        "/$", "")
    return (
        d.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count("*").alias("n_variants"),
             F.countDistinct("doc_id").alias("n_docs"))
    )


@register("k_dp_noisy_counts", "K4+D1", """
WITH g AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
u AS (
  SELECT lang, n,
         (CAST(('0x' || SUBSTR(MD5('dp-noise-1|' || lang), 1, 15))
               AS BIGINT) % 1000000 + 0.5) / 1000000.0 AS unif
  FROM g
)
SELECT lang,
       ROUND(CAST(n AS DOUBLE)
             - (1.0 / 0.5)
               * CASE WHEN unif - 0.5 >= 0 THEN 1.0 ELSE -1.0 END
               * LN(1.0 - 2.0 * ABS(unif - 0.5)), 6) AS noisy_count,
       CAST(0.5 AS DOUBLE) AS epsilon
FROM u
""", "Differentially-private released counts, completing the privacy "
     "ladder (k-anonymity -> l-diversity -> t-closeness -> DP "
     "release): per-language counts + Laplace(1/epsilon) noise via "
     "inverse-CDF sampling of a SEEDED-HASH uniform - deterministic "
     "on every engine/run/executor (the repo's no-rand() rule), "
     "which is exactly how production DP pipelines make releases "
     "reproducible (a fixed noise seed per release id). Count "
     "sensitivity is 1, so scale 1/epsilon gives epsilon-DP per "
     "released cell. One grouped count (map-side combine) + a "
     "constant-width noise projection - corpus-size independent.")
def k_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.parity import r6
    from cassandra_elasticsearch_sync_spark.pipeline.hashing import (
        portable_hash60,
    )

    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(F.count("*").alias("n"))
    unif = ((portable_hash60(F.concat(F.lit("dp-noise-1|"), F.col("lang")))
             % 1000000 + 0.5) / 1000000.0)
    eps = 0.5
    noise = ((1.0 / eps)
             * F.when(unif - 0.5 >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
             * F.log(1.0 - 2.0 * F.abs(unif - 0.5)))
    return g.select(
        "lang",
        r6(F.col("n").cast("double") - noise).alias("noisy_count"),
        F.lit(eps).alias("epsilon"),
    )
