"""JSON functions (SURVEY.md 2.H6) over events.props.

The ES side of the sync carries JSON documents (SURVEY.md 1.1), so the
engine owns JSON extraction/construction. events.props is observed as
'{"k": <int>}' (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


@register("h6_json_extract", "H6", """
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k_path,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_extract,
       (JSON_EXTRACT(props, '$.k') IS NOT NULL) AS has_k,
       (JSON_EXTRACT(props, '$.missing') IS NOT NULL) AS has_missing
FROM events
""", "JSON path extraction (get_json_object / from_json struct access)")
def h6_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", PROPS_SCHEMA)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        parsed.getField("k").alias("k_extract"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
    )


@register("h6_json_aggregate", "H6", """
SELECT event_type,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_total,
       COUNT(*) FILTER (WHERE CAST(props->>'k' AS BIGINT) >= 50) AS n_high_k
FROM events
GROUP BY event_type
""", "Filter + aggregate on a JSON-extracted field (schema-on-read path)")
def h6_json_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("k_total"),
        F.count(F.when(F.col("k") >= 50, 1)).alias("n_high_k"),
    )


@register("h6b_nested_json", "H6", """
WITH j AS (
  SELECT event_id,
         '{"meta":{"type":"' || event_type || '","tags":[' ||
         CAST(user_id % 5 AS VARCHAR) || ',' ||
         CAST(user_id % 7 AS VARCHAR) || ']}}' AS doc
  FROM events WHERE event_id % 50 = 0
)
SELECT event_id,
       JSON_EXTRACT_STRING(doc, '$.meta.type') AS type_val,
       CAST(JSON_EXTRACT_STRING(doc, '$.meta.tags[0]') AS BIGINT) AS tag0,
       CAST(JSON_EXTRACT_STRING(doc, '$.meta.tags[1]') AS BIGINT) AS tag1
FROM j
""", "Nested-object + array-index JSON paths: document built "
     "deterministically in-query (identical strings both engines), "
     "then extracted via $.a.b[i] paths - the deep-JSON half of the "
     "ES document bridge")
def h6b_nested_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    doc = F.concat(
        F.lit('{"meta":{"type":"'), F.col("event_type"), F.lit('","tags":['),
        (F.col("user_id") % 5).cast("string"), F.lit(","),
        (F.col("user_id") % 7).cast("string"), F.lit("]}}"),
    )
    return ev.withColumn("doc", doc).select(
        "event_id",
        F.get_json_object("doc", "$.meta.type").alias("type_val"),
        F.get_json_object("doc", "$.meta.tags[0]").cast("bigint").alias("tag0"),
        F.get_json_object("doc", "$.meta.tags[1]").cast("bigint").alias("tag1"),
    )


@register("h6c_variant_type", "H6+B4", """
SELECT event_id,
       CAST(doc->>'$.k' AS BIGINT) AS k,
       CAST(doc->>'$.meta.type' AS VARCHAR) AS ev_type,
       CAST(doc->>'$.meta.vals[1]' AS BIGINT) AS second_val,
       CAST(doc->>'$.meta.vals[9]' AS BIGINT) AS missing_idx
FROM (
  SELECT event_id,
         JSON('{"k": ' || CAST(CAST(props->>'$.k' AS BIGINT) AS VARCHAR)
              || ', "meta": {"type": "' || event_type || '", "vals": ['
              || CAST(event_id % 7 AS VARCHAR) || ', '
              || CAST(event_id % 11 AS VARCHAR) || ']}}') AS doc
  FROM events
)
""", "Spark 4.x VARIANT type (the semi-structured column every "
     "modern lakehouse added): parse_json into an open-schema "
     "variant, then typed path extraction with variant_get - object "
     "fields, NESTED paths, array indexing, and out-of-range access "
     "returning NULL (not an error). Unlike from_json there is no "
     "declared schema, so schema drift in the ES-side documents "
     "never breaks ingestion - extraction is late-bound and binary-"
     "encoded (no per-row string re-parse downstream). The oracle is "
     "DuckDB's JSON path operators over an identically constructed "
     "document.")
def h6c_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    doc_json = F.concat(
        F.lit('{"k": '),
        F.get_json_object("props", "$.k").cast("bigint").cast("string"),
        F.lit(', "meta": {"type": "'), F.col("event_type"),
        F.lit('", "vals": ['), (F.col("event_id") % 7).cast("string"),
        F.lit(", "), (F.col("event_id") % 11).cast("string"),
        F.lit("]}}"),
    )
    v = ev.select("event_id", F.parse_json(doc_json).alias("doc"))
    return v.select(
        "event_id",
        F.variant_get("doc", "$.k", "bigint").alias("k"),
        F.variant_get("doc", "$.meta.type", "string").alias("ev_type"),
        F.variant_get("doc", "$.meta.vals[1]", "bigint").alias("second_val"),
        F.variant_get("doc", "$.meta.vals[9]", "bigint").alias("missing_idx"),
    )
