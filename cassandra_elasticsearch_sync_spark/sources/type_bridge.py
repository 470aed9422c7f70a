"""The CQL <-> Spark <-> ES type system bridge (SURVEY.md 1.2).

The reference's core projection is per-record type mapping between
Cassandra's CQL types and Elasticsearch's JSON mapping types. Here the
bridge is first-class metadata code: given a Spark schema, emit the
CQL DDL for the Cassandra side and the index mapping for the ES side
(and validate round trips). The runtime projection itself is the
b4_type_bridge query; this module is the schema-management half.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

# Spark -> CQL (the write-side DDL for the Cassandra store).
_SPARK_TO_CQL: dict[type, str] = {
    T.IntegerType: "int",
    T.LongType: "bigint",
    T.ShortType: "smallint",
    T.ByteType: "tinyint",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "text",
    T.BooleanType: "boolean",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp",
    T.DateType: "date",
    T.BinaryType: "blob",
}

# Spark -> ES mapping type (the index mapping for the ES store).
_SPARK_TO_ES: dict[type, str] = {
    T.IntegerType: "integer",
    T.LongType: "long",
    T.ShortType: "short",
    T.ByteType: "byte",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "keyword",
    T.BooleanType: "boolean",
    T.TimestampType: "date",
    T.TimestampNTZType: "date",
    T.DateType: "date",
    T.BinaryType: "binary",
}


def spark_to_cql(dt: T.DataType) -> str:
    """CQL type for a Spark type (collections/structs recurse)."""
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_to_cql(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_to_cql(dt.keyType)}, {spark_to_cql(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        # CQL tuple types are positional and UNNAMED - `frozen<tuple<
        # name type, ...>>` is invalid DDL that Cassandra rejects.
        # Field names only survive through a user-defined type; use
        # cql_udt()/cql_ddl() when names must be preserved.
        inner = ", ".join(spark_to_cql(f.dataType) for f in dt.fields)
        return f"frozen<tuple<{inner}>>"
    try:
        return _SPARK_TO_CQL[type(dt)]
    except KeyError:
        raise TypeError(f"no CQL mapping for Spark type {dt}") from None


def cql_udt(name: str, st: T.StructType) -> str:
    """CREATE TYPE DDL for a struct whose field names must survive on
    the Cassandra side (CQL tuples are positional; only a UDT carries
    names)."""
    fields = ",\n  ".join(f"{f.name} {spark_to_cql(f.dataType)}" for f in st.fields)
    return f"CREATE TYPE {name} (\n  {fields}\n)"


def spark_to_es(dt: T.DataType) -> dict:
    """ES mapping fragment for a Spark type."""
    if isinstance(dt, T.DecimalType):
        return {"type": "double"}
    if isinstance(dt, T.ArrayType):
        # ES has no array type: any field may be multi-valued.
        return spark_to_es(dt.elementType)
    if isinstance(dt, (T.MapType, T.StructType)):
        if isinstance(dt, T.StructType):
            return {
                "properties": {f.name: spark_to_es(f.dataType) for f in dt.fields}
            }
        return {"type": "object", "enabled": True}
    try:
        return {"type": _SPARK_TO_ES[type(dt)]}
    except KeyError:
        raise TypeError(f"no ES mapping for Spark type {dt}") from None


def cql_ddl(schema: T.StructType, table: str, partition_key: str) -> str:
    """CREATE TABLE DDL for the Cassandra side of a sync pair.

    Top-level struct columns become UDTs named ``{table}_{column}``
    (emitted as CREATE TYPE statements ahead of the table) so their
    field names survive; nested structs below collections fall back to
    positional tuples via spark_to_cql.
    """
    udts: list[str] = []
    cols = []
    for f in schema.fields:
        if isinstance(f.dataType, T.StructType):
            udt_name = f"{table}_{f.name}"
            udts.append(cql_udt(udt_name, f.dataType))
            cols.append(f"{f.name} frozen<{udt_name}>")
        else:
            cols.append(f"{f.name} {spark_to_cql(f.dataType)}")
    body = ",\n  ".join(cols)
    table_ddl = (
        f"CREATE TABLE {table} (\n  {body},\n"
        f"  PRIMARY KEY ({partition_key})\n)"
    )
    return ";\n\n".join([*udts, table_ddl])


def es_index_mapping(schema: T.StructType) -> str:
    """Index-mapping JSON for the ES side of a sync pair."""
    return json.dumps(
        {"mappings": {"properties": {f.name: spark_to_es(f.dataType)
                                     for f in schema.fields}}},
        sort_keys=True,
    )
