"""CQL SELECT compiler: the Cassandra-side twin of the ES DSL compiler
(sources/es_query.py).

A user of the reference queries the Cassandra side with CQL. This
module compiles the CQL SELECT subset that Cassandra itself accepts -
including Cassandra's famous RESTRICTION RULES, which are the actual
semantic content of the language:

  * a predicate on a non-primary-key column requires ALLOW FILTERING;
  * clustering-key predicates require the full partition key to be
    equality-restricted (else ALLOW FILTERING);
  * a range on clustering column k requires equality on clustering
    columns 1..k-1 (the contiguous-SSTable-slice rule);
  * PER PARTITION LIMIT caps rows per partition in clustering order;
  * LIMIT applies in token order then clustering order (the order a
    full-ring CQL scan streams rows).

Compiled output is a plain DataFrame plan: key predicates push to the
scan, PER PARTITION LIMIT is a partition-key window (groups are
partition-sized - the same locality Cassandra's SSTable layout
provides), and LIMIT is a TakeOrderedAndProject on (token, clustering)
- never a global sort. Token order uses the portable 60-bit hash ring
(pipeline/hashing.py), cross-engine exact, consistent with the a2b
token-range scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.pipeline.hashing import portable_hash60

# The CQL data model declared for the stand-in tables (consistent with
# a2b/a2c/a2d: orders is PRIMARY KEY ((o_custkey), o_orderdate DESC,
# o_orderkey)).
CQL_TABLES: dict[str, dict] = {
    "orders": {
        "partition": ["o_custkey"],
        "clustering": [("o_orderdate", "DESC"), ("o_orderkey", "ASC")],
    },
    "lineitem": {
        "partition": ["l_orderkey"],
        "clustering": [("l_linenumber", "ASC")],
    },
    "events": {
        "partition": ["user_id"],
        "clustering": [("ts", "ASC"), ("event_id", "ASC")],
    },
}

_EQ_OPS = {"=", "IN"}
_RANGE_OPS = {"<", "<=", ">", ">="}


@dataclass
class CqlSelect:
    columns: list[str]          # ["*"] for star
    table: str
    where: list[tuple[str, str, object]] = field(default_factory=list)
    per_partition_limit: int | None = None
    limit: int | None = None
    allow_filtering: bool = False


class CqlError(ValueError):
    """Invalid CQL per Cassandra's restriction rules."""


_STMT_RE = re.compile(
    r"^\s*SELECT\s+(?P<cols>.+?)\s+FROM\s+(?P<table>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+PER\s+PARTITION\s+LIMIT\s+(?P<pplimit>\d+))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?"
    r"(?P<af>\s+ALLOW\s+FILTERING)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_PRED_RE = re.compile(
    r"^\s*(?P<col>\w+)\s*(?P<op>>=|<=|=|<|>|IN)\s*(?P<val>.+?)\s*$",
    re.IGNORECASE,
)


def _parse_literal(raw: str):
    raw = raw.strip()
    if raw.startswith("(") and raw.endswith(")"):
        return [_parse_literal(p) for p in raw[1:-1].split(",")]
    if raw.startswith("'") and raw.endswith("'"):
        return raw[1:-1]
    if re.fullmatch(r"-?\d+", raw):
        return int(raw)
    if re.fullmatch(r"-?\d+\.\d+", raw):
        return float(raw)
    raise CqlError(f"unparseable CQL literal: {raw!r}")


def parse_cql(stmt: str) -> CqlSelect:
    m = _STMT_RE.match(stmt)
    if not m:
        raise CqlError(f"unsupported CQL statement: {stmt!r}")
    cols = [c.strip() for c in m.group("cols").split(",")]
    where = []
    if m.group("where"):
        # split on AND at top level (no nested parens in the subset
        # except IN-lists, which contain no AND)
        for part in re.split(r"\s+AND\s+", m.group("where"),
                             flags=re.IGNORECASE):
            pm = _PRED_RE.match(part)
            if not pm:
                raise CqlError(f"unparseable CQL predicate: {part!r}")
            where.append((pm.group("col"),
                          pm.group("op").upper(),
                          _parse_literal(pm.group("val"))))
    return CqlSelect(
        columns=cols,
        table=m.group("table").lower(),
        where=where,
        per_partition_limit=(int(m.group("pplimit"))
                             if m.group("pplimit") else None),
        limit=int(m.group("limit")) if m.group("limit") else None,
        allow_filtering=bool(m.group("af")),
    )


def validate_cql(sel: CqlSelect) -> dict:
    """Enforce Cassandra's restriction rules; returns the table meta."""
    meta = CQL_TABLES.get(sel.table)
    if meta is None:
        raise CqlError(f"unknown table {sel.table!r}")
    part_cols = meta["partition"]
    clus_cols = [c for c, _ in meta["clustering"]]
    by_col: dict[str, list[str]] = {}
    for col, op, _ in sel.where:
        by_col.setdefault(col, []).append(op)

    non_key = [c for c in by_col if c not in part_cols and c not in clus_cols]
    if non_key and not sel.allow_filtering:
        raise CqlError(
            f"predicate on non-primary-key column(s) {non_key} requires "
            "ALLOW FILTERING")

    part_eq = all(
        any(op in _EQ_OPS for op in by_col.get(c, [])) for c in part_cols
    )
    clus_restricted = [c for c in clus_cols if c in by_col]
    if clus_restricted and not part_eq and not sel.allow_filtering:
        raise CqlError(
            "clustering-key predicates require the full partition key "
            "to be equality-restricted (or ALLOW FILTERING)")

    if not sel.allow_filtering:
        # the contiguous-slice rule: a range on clustering col k needs
        # equality on clustering cols 1..k-1
        seen_range = False
        for c in clus_cols:
            ops = by_col.get(c, [])
            if not ops:
                seen_range = True  # an unrestricted col ends the prefix
                continue
            if seen_range:
                raise CqlError(
                    f"clustering column {c!r} restricted after a "
                    "non-equality/skipped column (not a contiguous slice)")
            if any(op in _RANGE_OPS for op in ops):
                seen_range = True
    return meta


def _pred_column(col: str, op: str, val) :
    c = F.col(col)
    # quoted literals compare against date/timestamp columns via
    # to_timestamp when they look like dates (CQL timestamp literals
    # are quoted strings)
    if isinstance(val, str) and re.fullmatch(r"\d{4}-\d{2}-\d{2}.*", val):
        lit = F.to_timestamp(F.lit(val))
    elif isinstance(val, list):
        return c.isin(*val)
    else:
        lit = F.lit(val)
    return {"=": c == lit, "<": c < lit, "<=": c <= lit,
            ">": c > lit, ">=": c >= lit}[op]


def cql_select(df: DataFrame, stmt: str) -> DataFrame:
    """Compile and run a CQL SELECT against the table's DataFrame."""
    sel = parse_cql(stmt)
    meta = validate_cql(sel)
    out = df
    for col, op, val in sel.where:
        out = out.filter(_pred_column(col, op, val))

    clus_order = [
        F.col(c).desc() if d == "DESC" else F.col(c).asc()
        for c, d in meta["clustering"]
    ]
    if sel.per_partition_limit is not None:
        w = Window.partitionBy(*meta["partition"]).orderBy(*clus_order)
        out = (
            out.withColumn("__cql_rn", F.row_number().over(w))
            .filter(F.col("__cql_rn") <= sel.per_partition_limit)
            .drop("__cql_rn")
        )
    if sel.limit is not None:
        token = portable_hash60(
            F.concat_ws("|", *[F.col(c).cast("string")
                               for c in meta["partition"]]))
        out = out.orderBy(token.asc(), *clus_order).limit(sel.limit)
    if sel.columns != ["*"]:
        out = out.select(*sel.columns)
    return out


# ---------------------------------------------------------------------------
# Registered, oracle-verified CQL queries (the user-facing proof)
# ---------------------------------------------------------------------------

from cassandra_elasticsearch_sync_spark.catalog import load_table  # noqa: E402
from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402


@register("a2i_cql_partition_slice", "A2", """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey = 37
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
""", "CQL SELECT execution: `SELECT ... FROM orders WHERE o_custkey = "
     "37 AND o_orderdate >= '1995-01-01'` compiled by the CQL "
     "subset compiler - partition-key equality + clustering-key "
     "range, the single-partition slice read that is Cassandra's "
     "bread-and-butter query. The restriction validator accepts it "
     "WITHOUT ALLOW FILTERING (full partition key equality, range "
     "on the first clustering column = contiguous SSTable slice); "
     "both predicates push to the parquet scan.")
def a2i_cql_partition_slice(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return cql_select(o, """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = 37 AND o_orderdate >= '1995-01-01 00:00:00'
    """)


@register("a2j_cql_filtering_toplimit", "A2", """
WITH f AS (
  SELECT * FROM orders WHERE o_totalprice > 400000
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey) AS rn
  FROM f
),
p AS (
  SELECT *, CAST(('0x' || SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 1, 15))
                 AS BIGINT) AS token
  FROM r WHERE rn = 1
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM p ORDER BY token, o_orderdate DESC, o_orderkey LIMIT 20
""", "CQL `ALLOW FILTERING` + `PER PARTITION LIMIT 1` + `LIMIT 20` in "
     "one statement: a non-key predicate (legal only with ALLOW "
     "FILTERING - the validator enforces Cassandra's rule), then "
     "each partition's newest qualifying order, then the first 20 "
     "rows IN TOKEN ORDER - the order a full-ring CQL scan streams "
     "partitions, reproduced with the portable hash ring so the "
     "page is deterministic cross-engine. Plan: pushed filter -> "
     "partition-key window (partition-sized groups) -> "
     "TakeOrderedAndProject on (token, clustering); no global sort.")
def a2j_cql_filtering_toplimit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return cql_select(o, """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > 400000
        PER PARTITION LIMIT 1 LIMIT 20 ALLOW FILTERING
    """)
