from __future__ import annotations

import json

from pyspark.sql import types as T

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.sources.type_bridge import (
    cql_ddl,
    cql_udt,
    es_index_mapping,
    spark_to_cql,
    spark_to_es,
)

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_schemas_bridge_to_both_stores(spark):
    """Every corpus table's Spark schema must map cleanly to both a CQL
    DDL and an ES mapping - the reference's schema contract."""
    from cassandra_elasticsearch_sync_spark.catalog import TABLES

    for t in TABLES:
        schema = load_table(spark, SF_DIR, t).schema
        ddl = cql_ddl(schema, t, schema.fields[0].name)
        assert f"CREATE TABLE {t}" in ddl
        mapping = json.loads(es_index_mapping(schema))
        assert set(mapping["mappings"]["properties"]) == {f.name for f in schema.fields}


def test_nested_and_collection_types():
    arr = T.ArrayType(T.FloatType())
    assert spark_to_cql(arr) == "list<float>"
    assert spark_to_es(arr) == {"type": "float"}
    m = T.MapType(T.StringType(), T.LongType())
    assert spark_to_cql(m) == "map<text, bigint>"
    # CQL tuples are positional and unnamed; names need a UDT.
    st = T.StructType([
        T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType()),
    ])
    assert spark_to_cql(st) == "frozen<tuple<int, text>>"
    assert cql_udt("pt", st) == "CREATE TYPE pt (\n  a int,\n  b text\n)"
    ddl = cql_ddl(
        T.StructType([T.StructField("id", T.LongType()), T.StructField("meta", st)]),
        "docs", "id",
    )
    assert "CREATE TYPE docs_meta" in ddl and "meta frozen<docs_meta>" in ddl
    assert spark_to_es(st) == {
        "properties": {"a": {"type": "integer"}, "b": {"type": "keyword"}}
    }
    assert spark_to_cql(T.BinaryType()) == "blob"
    assert spark_to_es(T.BinaryType()) == {"type": "binary"}
