"""Search-engine semantics: BM25 ranking (SURVEY.md 2.K text tier).

The reference's ES side is a search engine; its query-time scoring is
BM25. This operator reproduces it relationally: one token explode, two
aggregates (df, per-doc tf + length), a broadcast join against the
query terms, and a weighted sum - fully distributed, no UDFs.

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))        (Lucene form)
    s(d, t) = idf(t) * tf / (tf + k1 * (1 - b + b * |d| / avgdl))
    score(d) = sum over query terms

Float parity: idf/score go through ROUND(x, 6); the inputs (tf, df,
N, |d|, avgdl) are exact integers/exact-ratio doubles in both engines,
so the only libm-sensitive op is ln.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.operators.distributed_order import (
    topk_with_rank,
)
from cassandra_elasticsearch_sync_spark.registry import register

K1 = 1.2
B = 0.75
QUERY_TERMS = ("fast", "query", "spark")
_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

_BM25_ORACLE = f"""
WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS w
             FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
       WHERE w IN ({_TERMS_SQL}) GROUP BY doc_id, w),
df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok
       WHERE w IN ({_TERMS_SQL}) GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         SUM(LN(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dlen / stats.avgdl)))
           AS score
  FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25, CAST(rn AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS rn
      FROM scored)
WHERE rn <= 20
"""


@register("k_bm25_search", "K4", _BM25_ORACLE,
          "BM25 full-text ranking (the ES side's query-time scoring) as "
          "explode + two aggregates + broadcast term join; top-20 with "
          "total-order tiebreak on the rounded score")
def k_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dlen").cast("double") / F.count("*")).alias("avgdl"),
    )
    qtok = tok.filter(F.col("w").isin(*QUERY_TERMS))
    tf = qtok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df = qtok.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = idf * F.col("tf") / (
        F.col("tf") + K1 * (1 - B + B * F.col("dlen") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    # Top-20 via sort+limit (distributed TakeOrdered, never a global
    # sort), then rank attached over the 20 surviving rows only.
    top = topk_with_rank(
        scored.withColumn("bm25", F.round("score", 6)),
        [("bm25", False), ("doc_id", True)],
        20,
        rank_col="rank",
    )
    return top.select("doc_id", "bm25", F.col("rank").cast("int").alias("rank"))
