"""String / datetime / math / hash scalar families (SURVEY.md 2.H1-H3, H7).

All of these run JVM-side inside whole-stage codegen - no Python UDFs.
Cross-engine gotchas handled here:

- dayofweek: Spark is 1=Sunday..7, DuckDB dayofweek() is 0=Sunday..6;
  we normalize to DuckDB's convention (dow = Spark dayofweek - 1).
- datediff argument order: Spark datediff(end, start), DuckDB
  date_diff('day', start, end).
- log/exp/pow go through ROUND(x, 6): JVM StrictMath vs libm may differ
  in the last ulp even on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register


@register("h1_string_funcs", "H1", """
SELECT doc_id,
       LENGTH(text) AS text_len,
       UPPER(lang) AS lang_up,
       SUBSTRING(text, 1, 20) AS head20,
       STRING_SPLIT(text, ' ')[1] AS first_token,
       CONCAT(lang, '-', source) AS lang_source,
       POSITION('scan' IN text) AS scan_pos,
       REGEXP_EXTRACT(text, '[a-z]+') AS first_word,
       REGEXP_REPLACE(text, '[aeiou]', '_', 'g') AS devoweled_head,
       LEVENSHTEIN(lang, 'en') AS lang_dist
FROM documents
""", "String family: length/case/substring/split/concat/position/regex/levenshtein")
def h1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("text_len"),
        F.upper("lang").alias("lang_up"),
        F.substring("text", 1, 20).alias("head20"),
        F.split(F.col("text"), " ").getItem(0).alias("first_token"),
        F.concat_ws("-", "lang", "source").alias("lang_source"),
        F.instr("text", "scan").cast("long").alias("scan_pos"),
        F.regexp_extract("text", "[a-z]+", 0).alias("first_word"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled_head"),
        F.levenshtein("lang", F.lit("en")).cast("long").alias("lang_dist"),
    )


@register("h2_datetime_funcs", "H2", """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS y,
       EXTRACT(month FROM o_orderdate) AS m,
       EXTRACT(day FROM o_orderdate) AS d,
       DAYOFWEEK(o_orderdate) AS dow,
       STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
       CAST(EPOCH(DATE_TRUNC('second', o_orderdate)) AS BIGINT) AS epoch_s
FROM orders
""", "Datetime family: parts, truncation, diff, add, epoch")
def h2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
         .cast("long").alias("days_since_95"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
         .alias("plus_30d"),
        F.unix_timestamp(F.date_trunc("second", "o_orderdate")).alias("epoch_s"),
    )


@register("h3_math_funcs", "H3", """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 2) AS price_r2,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       ROUND(POW(l_quantity, 2), 6) AS qty_sq,
       ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
       ROUND(LN(l_extendedprice), 6) AS price_ln,
       ROUND(EXP(l_discount), 6) AS disc_exp,
       CAST(SIGN(l_quantity - 25.0) AS INT) AS qty_side
FROM lineitem
WHERE l_orderkey % 100 = 0
""", "Math family (libm-sensitive ops rounded to 6 dp)")
def h3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_side"),
    )


@register("h7_hash_funcs", "H7", """
SELECT doc_id,
       MD5(text) AS md5_hex,
       SHA256(text) AS sha256_hex
FROM documents
""", "Cryptographic content hashes - the exact-dedup keys (K1). "
     "xxhash64 is used internally for MinHash (K2) but has no DuckDB "
     "twin, so the verified surface uses md5/sha256.")
def h7_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
    )


@register("h1b_string_funcs_ext", "H1", """
SELECT doc_id,
       LPAD(lang, 5, '*') AS lang_pad,
       RPAD(source, 8, '.') AS src_pad,
       TRANSLATE(lang, 'aeiou', 'AEIOU') AS lang_tr,
       REPEAT(lang, 2) AS lang2,
       REVERSE(source) AS src_rev,
       LEFT(text, 5) AS head5,
       RIGHT(text, 5) AS tail5,
       CONTAINS(text, 'merge') AS has_merge,
       STARTS_WITH(text, 'the') AS starts_the,
       ENDS_WITH(source, '1') AS ends_1,
       SPLIT_PART(source, 'c', 2) AS src_num
FROM documents
""", "Extended string family: pad/translate/repeat/reverse/left/right/"
     "contains/starts/ends/split_part")
def h1b_string_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad("lang", 5, "*").alias("lang_pad"),
        F.rpad("source", 8, ".").alias("src_pad"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_tr"),
        F.repeat("lang", 2).alias("lang2"),
        F.reverse("source").alias("src_rev"),
        F.substring("text", 1, 5).alias("head5"),
        F.substring(F.col("text"), -5, 5).alias("tail5"),
        F.col("text").contains("merge").alias("has_merge"),
        F.col("text").startswith("the").alias("starts_the"),
        F.col("source").endswith("1").alias("ends_1"),
        F.split_part("source", F.lit("c"), F.lit(2)).alias("src_num"),
    )


@register("h2b_datetime_funcs_ext", "H2", """
SELECT o_orderkey,
       QUARTER(o_orderdate) AS q,
       WEEKOFYEAR(o_orderdate) AS iso_week,
       STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
       STRFTIME(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY, '%Y-%m-%d') AS week_before,
       DAYOFYEAR(o_orderdate) AS doy
FROM orders
""", "Extended datetime family: quarter/ISO week/last_day/add_months/"
     "date_sub/dayofyear")
def h2b_datetime_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("next_month"),
        F.date_format(F.date_sub(d, 7), "yyyy-MM-dd").alias("week_before"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
    )


@register("h3b_math_funcs_ext", "H3", """
SELECT l_orderkey, l_linenumber,
       MOD(CAST(l_quantity AS BIGINT), 7) AS qty_mod7,
       ROUND(LOG10(l_extendedprice), 6) AS price_log10,
       ROUND(LOG2(l_quantity), 6) AS qty_log2,
       ROUND(SIN(l_discount), 6) AS disc_sin,
       ROUND(ATAN2(l_quantity, l_extendedprice), 6) AS angle,
       ROUND(CBRT(l_quantity), 6) AS qty_cbrt,
       ROUND(DEGREES(l_discount), 6) AS disc_deg,
       ROUND(RADIANS(l_quantity), 6) AS qty_rad
FROM lineitem
WHERE l_orderkey % 200 = 0
""", "Extended math family: mod/log10/log2/trig/cbrt/degrees/radians "
     "(libm-sensitive ops rounded)")
def h3b_math_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.log2("l_quantity"), 6).alias("qty_log2"),
        F.round(F.sin("l_discount"), 6).alias("disc_sin"),
        F.round(F.atan2("l_quantity", "l_extendedprice"), 6).alias("angle"),
        F.round(F.cbrt("l_quantity"), 6).alias("qty_cbrt"),
        F.round(F.degrees("l_discount"), 6).alias("disc_deg"),
        F.round(F.radians("l_quantity"), 6).alias("qty_rad"),
    )


@register("h3c_bitwise_funcs", "H3", """
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 65535) AS toggled,
       (o_orderkey & 1023) << 2 AS shifted_up,
       o_orderkey >> 3 AS shifted_down,
       CAST(bit_count(o_orderkey) AS INT) AS popcount,
       CASE WHEN (o_orderkey & 1) = 1 THEN 'odd' ELSE 'even' END AS parity
FROM orders
WHERE o_orderkey % 97 = 0
""", "Bitwise function bridge: AND/OR/XOR masks, shifts, popcount, "
     "and bit-test - the flag-field and partition-key manipulations "
     "a sync engine does on packed ID/status words. All pure "
     "narrow-map integer ops inside whole-stage codegen; shift input "
     "is masked to 10 bits so the result is identical bigint math in "
     "both engines.")
def h3c_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("low_byte"),
        k.bitwiseOR(4096).alias("with_flag"),
        k.bitwiseXOR(65535).alias("toggled"),
        F.shiftleft(k.bitwiseAND(1023), 2).cast("bigint").alias("shifted_up"),
        F.shiftright(k, 3).cast("bigint").alias("shifted_down"),
        F.bit_count(k).cast("int").alias("popcount"),
        F.when(k.bitwiseAND(1) == 1, "odd").otherwise("even").alias("parity"),
    )


@register("h2c_calendar_funcs", "H2", """
SELECT o_orderkey,
       STRFTIME(LAST_DAY(o_orderdate), '%Y-%m-%d') AS month_end,
       STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo,
       CAST(QUARTER(o_orderdate) AS INT) AS qtr,
       CAST(ISODOW(o_orderdate) AS INT) AS iso_dow,
       CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE),
                      LAST_DAY(o_orderdate)) AS INT) AS days_to_month_end
FROM orders
WHERE o_orderkey % 20 = 0
""", "Calendar arithmetic family: month-end (LAST_DAY), calendar-"
     "clamped month addition (Jan 31 + 1 month = Feb 28 in BOTH "
     "engines - add_months / +INTERVAL MONTH share the clamp rule), "
     "quarter, ISO day-of-week (Spark's weekday() is 0=Monday, "
     "DuckDB's ISODOW 1=Monday - bridged with +1, never the "
     "Sunday-anchored dayofweek() whose origin differs per engine), "
     "and a day-countdown. All outputs are formatted dates or small "
     "ints - no raw timestamps, per the parity rules. Narrow "
     "projection, filter pushed to the scan.")
def h2c_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3mo"),
        F.quarter(d).cast("int").alias("qtr"),
        (F.weekday(d) + 1).cast("int").alias("iso_dow"),
        F.datediff(F.last_day(d), d.cast("date")).cast("int").alias("days_to_month_end"),
    )


@register("h2d_business_days", "H2", """
WITH d AS (
  SELECT o_orderkey,
         CAST(o_orderdate AS DATE) AS start_d,
         (o_orderkey % 45) + 1 AS n
  FROM orders
),
p AS (
  SELECT o_orderkey, n,
         ISODOW(start_d) - 1 AS sw,        -- Monday-indexed 0..6
         n % 7 AS r
  FROM d
)
SELECT o_orderkey, CAST(n AS BIGINT) AS total_days,
       CAST(5 * (n // 7)
            + LEAST(r, GREATEST(0, 5 - sw))
            + GREATEST(0, LEAST(r - (7 - sw), 5)) AS BIGINT) AS business_days
FROM p
""", "Business-day counting: weekdays in [start, start + n days) by "
     "pure integer calendar arithmetic - 5 per full week plus a "
     "closed-form ragged-edge term from the Monday-indexed start "
     "weekday (no generate-days explode, no UDF, no calendar table; "
     "swap in a broadcast holiday table for the full trading-day "
     "variant). Branch-free LEAST/GREATEST math is identical in both "
     "engines, and the weekday convention difference (Spark "
     "dayofweek is Sunday-1, DuckDB ISODOW is Monday-1) is "
     "normalized on each side - the classic cross-engine calendar "
     "trap, pinned by the hash check. Per-row projection, "
     "embarrassingly parallel.")
def h2d_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    n = (F.col("o_orderkey") % 45) + 1
    sw = (F.dayofweek(F.col("o_orderdate").cast("date")) + 5) % 7
    r = n % 7
    return o.select(
        "o_orderkey",
        n.cast("bigint").alias("total_days"),
        (5 * F.expr("((o_orderkey % 45) + 1) div 7")
         + F.least(r, F.greatest(F.lit(0), 5 - sw))
         + F.greatest(F.lit(0), F.least(r - (7 - sw), F.lit(5))))
        .cast("bigint").alias("business_days"),
    )


@register("h3d_try_arithmetic", "H3+B4", """
SELECT event_id,
       CASE WHEN (event_id % 7) = 0 THEN NULL
            ELSE ROUND(value / (event_id % 7), 6) END AS safe_div,
       TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'not-a-number'
                     ELSE CAST(event_id AS VARCHAR) END AS BIGINT)
         AS safe_cast,
       TRY_CAST(props AS BIGINT) AS json_as_int
FROM events
""", "Error-safe expression surface (the ANSI-mode escape hatches a "
     "malformed-data pipeline needs): try_divide returns NULL on "
     "division by zero instead of failing the job, try_cast turns "
     "unparseable strings into NULL row-locally (a 100 TB ingest "
     "cannot abort on one bad record), and both compile to ordinary "
     "codegen'd expressions - no exception handling at runtime, no "
     "UDF. Oracle: DuckDB TRY_CAST and an explicit zero-guard, "
     "value-identical per row.")
def h3d_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bad_str = (F.when(F.col("event_id") % 3 == 0, F.lit("not-a-number"))
               .otherwise(F.col("event_id").cast("string")))
    return e.select(
        "event_id",
        F.round(F.try_divide("value", F.col("event_id") % 7), 6)
        .alias("safe_div"),
        bad_str.try_cast("bigint").alias("safe_cast"),
        F.col("props").try_cast("bigint").alias("json_as_int"),
    )
