"""Distributed sketches (SURVEY.md 2.K "novel sketch" slot).

Count-Min sketch over the token stream, built with plain aggregates:
row (d, w) counter matrix where cell [i][hash_i(token) % W] sums the
token's occurrences. The build is one groupBy over (depth, bucket) -
fully parallel, mergeable by cell-wise addition (the sketch IS a
DataFrame), and the point query upper-bounds the true count with
error <= eps * N at confidence 1 - delta. Hash family: the portable
seeded universal hashes from the MinHash pipeline, so every run and
engine agrees on placement.

Also here: deterministic per-group sampling (top-k by portable hash
order) - the reproducible stratified sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.pipeline.dedup import MERSENNE_P, _COEF
from cassandra_elasticsearch_sync_spark.pipeline.hashing import portable_hash60
from cassandra_elasticsearch_sync_spark.registry import register

CMS_DEPTH = 4
CMS_WIDTH = 64


def _cell_exprs():
    """depth-i bucket for the token's base hash (column `h`)."""
    return [
        ((F.col("h") * F.lit(a) + F.lit(b)) % MERSENNE_P % CMS_WIDTH).alias(f"b{i}")
        for i, (a, b) in enumerate(_COEF[:CMS_DEPTH])
    ]


def cms_build(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """Build the CMS as a (depth, bucket, cnt) DataFrame - mergeable
    with another sketch by union + groupBy-sum over the same key."""
    h = tokens.select(
        (portable_hash60(F.col(token_col)) % MERSENNE_P).alias("h")
    ).select(*_cell_exprs())
    stacked = None
    for i in range(CMS_DEPTH):
        part = h.select(F.lit(i).alias("depth"), F.col(f"b{i}").alias("bucket"))
        stacked = part if stacked is None else stacked.unionByName(part)
    return stacked.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(spark: SparkSession, sketch: DataFrame, token: str) -> int:
    """Point estimate = min over depths of the token's cell (an upper
    bound on the true count)."""
    probe = spark.createDataFrame([(token,)], "token string").select(
        (portable_hash60(F.col("token")) % MERSENNE_P).alias("h")
    ).select(*_cell_exprs())
    cells = [(i, r[f"b{i}"]) for r in probe.collect() for i in range(CMS_DEPTH)]
    cond = None
    for d, b in cells:
        c = (F.col("depth") == d) & (F.col("bucket") == b)
        cond = c if cond is None else cond | c
    rows = sketch.filter(cond).collect()
    by_depth = {r["depth"]: r["cnt"] for r in rows}
    return min(by_depth.get(d, 0) for d, _ in cells)


@register("k_cms_sketch", "K2", None,
          "Count-Min sketch build over the token stream (4x64 counter "
          "matrix via one groupBy; mergeable cell-wise). Rows-only: the "
          "sketch's accuracy contract (estimate >= truth, bounded "
          "overestimate) is property-tested in tests/test_sketches.py.")
def k_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
    return cms_build(tokens)


@register("k_group_sample", "K1", """
SELECT lang, doc_id
FROM (SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15))
                             AS BIGINT), doc_id) AS rn
      FROM documents)
WHERE rn <= 3
""", "Deterministic stratified sample: 3 docs per language, ordered by "
     "portable hash of the id - uniform-ish, reproducible everywhere, "
     "never rand()")
def k_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        portable_hash60(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "doc_id")
    )


@register("k_bloom_build", "K8+H7", """
WITH h AS (
  SELECT CAST(('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM orders
),
probes AS (
  SELECT hv % 248 AS pos FROM h
  UNION ALL
  SELECT (hv // 248) % 248 AS pos FROM h
)
SELECT CAST(pos // 62 AS BIGINT) AS word_idx,
       CAST(BIT_OR(1::BIGINT << CAST(pos % 62 AS INT)) AS BIGINT) AS bits,
       CAST(COUNT(DISTINCT pos) AS BIGINT) AS n_set
FROM probes
GROUP BY 1
""", "Bloom-filter CONSTRUCTION as a distributed aggregate: every key "
     "sets k=2 probe bits derived from the portable hash, and the "
     "filter materializes as 4 x 62-bit words via BIT_OR - a "
     "map-side-partial, commutative reduction, so building a "
     "membership filter over 100 TB of keys is one scan + one "
     "fixed-width aggregate row (this is how a join-pruning filter "
     "or a cross-store anti-entropy pre-check gets built; Spark's "
     "own runtime Bloom join pruning is plan-asserted in "
     "tests/test_plans.py - here the BITS themselves are the "
     "deterministic, hash-checked output, not just the plan). "
     "Exact cross-engine: hash, probe positions, and OR-folding are "
     "all integer arithmetic.")
def k_bloom_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.pipeline.hashing import (
        portable_hash60,
    )

    o = load_table(spark, sf_dir, "orders")
    hv = portable_hash60(F.col("o_orderkey").cast("string"))
    # `div` keeps every step in exact 64-bit integer arithmetic - a
    # double `/` would round 60-bit hashes above 2^53 before dividing.
    p1 = o.select((hv % 248).alias("pos"))
    p2 = o.select(hv.alias("hv")).selectExpr("(hv div 248) % 248 AS pos")
    probes = p1.unionByName(p2)
    return probes.groupBy(
        F.expr("pos div 62").alias("word_idx")
    ).agg(
        F.expr("bit_or(shiftleft(1L, CAST(pos % 62 AS INT)))").alias("bits"),
        F.countDistinct("pos").cast("bigint").alias("n_set"),
    )
