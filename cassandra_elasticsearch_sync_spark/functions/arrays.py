"""Array / map higher-order functions (SURVEY.md 2.H4-H5).

These are the substrate of the embedding math in pipeline/similarity.py:
dot products and norms are expressed with aggregate()/zip_with() so
they run JVM-side (no Python UDF in the hot path). Both engines fold
lists left-to-right in double precision, so the results hash-match
(rounded to 6 dp as a cushion).

Array-typed columns never appear in verified output - containers are
reduced to scalars or joined into strings, because the driver's value
hash may normalize list types differently per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register


@register("h4_array_ops", "H4", """
SELECT vec_id,
       LEN(embedding) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       ROUND(CAST(LIST_AGGREGATE(embedding, 'min') AS DOUBLE), 6) AS vmin,
       ROUND(CAST(LIST_AGGREGATE(embedding, 'max') AS DOUBLE), 6) AS vmax,
       ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS norm2,
       LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_positive
FROM embeddings
""", "Higher-order array ops: size/index/min/max/transform+aggregate/filter")
def h4_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.round(sq_sum, 6).alias("norm2"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register("h4_explode", "H4", """
SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
FROM documents
WHERE doc_id % 50 = 0
""", "explode/unnest: one row per array element (the tokenizer primitive)")
def h4_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@register("h5_map_ops", "H5", """
SELECT event_id,
       MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)])['type'][1] AS type_val,
       ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(
           MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]))), ',') AS keys_sorted
FROM events
WHERE event_id % 100 = 0
""", "Map construction + element access + key listing")
def h5_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@register("h4b_array_set_ops", "H4", """
WITH t AS (
  SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
         LIST_DISTINCT(STRING_SPLIT(LOWER(d1.text), ' ')) AS ta,
         LIST_DISTINCT(STRING_SPLIT(LOWER(d2.text), ' ')) AS tb
  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
  WHERE d1.doc_id % 20 = 0
)
SELECT doc_a, doc_b,
       LEN(LIST_DISTINCT(LIST_CONCAT(ta, tb))) AS union_size,
       LEN(LIST_INTERSECT(ta, tb)) AS intersect_size,
       LEN(LIST_FILTER(ta, x -> NOT LIST_CONTAINS(tb, x))) AS except_size,
       (LEN(LIST_INTERSECT(ta, tb)) > 0) AS overlaps
FROM t
""", "Array set algebra: union/intersect/except sizes + overlap flag "
     "between adjacent documents' token sets (containers reduced to "
     "scalars per the no-collections-in-output rule)")
def h4b_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("doc_a"),
        F.array_distinct(F.split(F.lower("text"), " ")).alias("ta"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.array_distinct(F.split(F.lower("text"), " ")).alias("tb"),
    )
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_union("ta", "tb")).cast("long").alias("union_size"),
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("intersect_size"),
            F.size(F.array_except("ta", "tb")).cast("long").alias("except_size"),
            F.arrays_overlap("ta", "tb").alias("overlaps"),
        )
    )


@register("h4c_higher_order_funcs", "H4", """
SELECT vec_id,
       LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_pos,
       LIST_SUM(LIST_TRANSFORM(embedding,
           x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)) = LEN(embedding)
         AS all_pos,
       ROUND(CAST(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(FLOOR(ABS(CAST(x AS DOUBLE))
                                 * 1099511627776.0) AS BIGINT)))
             AS DOUBLE) / 1099511627776.0, 6) AS l1_norm,
       CAST(LIST_INDEXOF(embedding, LIST_MAX(embedding)) AS BIGINT)
         AS argmax_dim
FROM embeddings
WHERE vec_id % 50 = 0
""", "Higher-order array function family - filter (count of positive "
     "components), forall (all-positive flag), transform+aggregate "
     "(L1 norm via the 2^40 scale-and-floor exact-integer fold, same "
     "trick as k_normalize_embeddings), and array_position+array_max "
     "(argmax dimension). All evaluate inside the JVM row pipeline - "
     "no UDF, no shuffle, no explode: the lambda-calculus subset of "
     "the engine a feature-engineering user leans on per-vector at "
     "100 TB. Exact parity: counts and argmax are integers; the L1 "
     "fold sums exact bigints so the divide is bit-identical.")
def h4c_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 50 == 0)
    scaled_abs = F.transform(
        "embedding",
        lambda x: F.floor(F.abs(x.cast("double")) * F.lit(1099511627776.0)).cast(
            "bigint"
        ),
    )
    l1 = (
        F.aggregate(scaled_abs, F.lit(0).cast("bigint"), lambda acc, v: acc + v)
        .cast("double") / F.lit(1099511627776.0)
    )
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.forall("embedding", lambda x: x > 0).alias("all_pos"),
        F.round(l1, 6).alias("l1_norm"),
        F.array_position("embedding", F.array_max("embedding"))
        .cast("bigint").alias("argmax_dim"),
    )
