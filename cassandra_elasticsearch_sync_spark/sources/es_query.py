"""ES query-DSL translator: bool/term/terms/range/exists/match/prefix
queries -> Catalyst predicates.

A user of the reference queries the ES side with the JSON query DSL.
This module lets those queries run against the engine directly: the
DSL dict compiles to a Column predicate, so Catalyst pushes the
resulting filters into the parquet scan exactly like any native
filter (the same pushdown `elasticsearch-hadoop` does for ES,
inverted).

Supported (the reference-era core DSL):
    {"term":   {field: value}}
    {"terms":  {field: [v1, v2, ...]}}
    {"range":  {field: {"gt"/"gte"/"lt"/"lte": value, ...}}}
    {"exists": {"field": field}}
    {"prefix": {field: value}}
    {"match":  {field: text}}        # token OR-containment on a text col
    {"bool":   {"must": [...], "should": [...], "must_not": [...]}}
    {"match_all": {}}
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RANGE_OPS = {
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
}


def compile_query(q: dict) -> Column:
    """Compile an ES query-DSL dict to a Spark Column predicate."""
    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError(f"expected a single-clause query dict, got {q!r}")
    kind, body = next(iter(q.items()))

    if kind == "match_all":
        return F.lit(True)
    if kind == "term":
        (field, value), = body.items()
        return F.col(field) == F.lit(value)
    if kind == "terms":
        (field, values), = body.items()
        return F.col(field).isin(*values)
    if kind == "range":
        (field, conds), = body.items()
        preds = [_RANGE_OPS[op](F.col(field), F.lit(v)) for op, v in conds.items()]
        return reduce(lambda a, b: a & b, preds)
    if kind == "exists":
        return F.col(body["field"]).isNotNull()
    if kind == "prefix":
        (field, value), = body.items()
        return F.col(field).startswith(value)
    if kind == "match":
        # OR over whitespace tokens of the query text, word-boundary
        # containment on the document field (analyzer = whitespace).
        (field, text), = body.items()
        toks = [t for t in str(text).lower().split() if t]
        preds = [
            F.array_contains(F.split(F.lower(field), " "), t) for t in toks
        ]
        return reduce(lambda a, b: a | b, preds) if preds else F.lit(False)
    if kind == "bool":
        parts: list[Column] = []
        for clause in body.get("must", []):
            parts.append(compile_query(clause))
        should = [compile_query(c) for c in body.get("should", [])]
        if should:
            parts.append(reduce(lambda a, b: a | b, should))
        for clause in body.get("must_not", []):
            parts.append(~compile_query(clause))
        return reduce(lambda a, b: a & b, parts) if parts else F.lit(True)
    raise ValueError(f"unsupported ES query clause: {kind}")


def es_search(df: DataFrame, query: dict) -> DataFrame:
    """Filter df with an ES query-DSL dict (the scan-side of the ES
    source, pushdown included)."""
    return df.filter(compile_query(query))


# --------------------------------------------------------------------------
# Registered, oracle-verified DSL query (the user-facing proof)
# --------------------------------------------------------------------------

from cassandra_elasticsearch_sync_spark.catalog import load_table  # noqa: E402
from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402

_DSL_DEMO = {
    "bool": {
        "must": [
            {"terms": {"o_orderstatus": ["F", "P"]}},
            {"range": {"o_totalprice": {"gte": 100000, "lt": 300000}}},
        ],
        "should": [
            {"term": {"o_orderpriority": "1-URGENT"}},
            {"prefix": {"o_orderpriority": "2-"}},
        ],
        "must_not": [{"term": {"o_orderstatus": "O"}}],
    }
}


@register("a3b_es_dsl_search", "A3", """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_totalprice >= 100000 AND o_totalprice < 300000
  AND (o_orderpriority = '1-URGENT' OR o_orderpriority LIKE '2-%')
  AND NOT o_orderstatus = 'O'
""", "ES query-DSL execution: a bool/terms/range/prefix query compiled "
     "to Catalyst predicates (pushdown included); the oracle is the "
     "equivalent SQL WHERE - what the reference's ES side would return")
def a3b_es_dsl_search(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return es_search(o, _DSL_DEMO).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
