"""Local twin of the driver's correctness gate.

Runs a registered query in Spark and its oracle in DuckDB over the
same parquet dir, then compares row count, column names, and
order-insensitive values - the same shape as CORRECTNESS_r{N}.json.
Comparison is exact (stringified cells, sorted rows); any float that
needs tolerance is a parity bug in the query, not in this harness.

Round-6 hardening (VERDICT r5's root-cause finding): the driver's
hasher materializes the oracle result TYPE-SENSITIVELY (Arrow turns
DuckDB HUGEINT into decimal128/float64, so `7519554` hashes as
`7519554.0`), while this harness's `fetchall()` path hands back
Python ints where HUGEINT and BIGINT are indistinguishable - which is
exactly why every driver-red row across r1-r5 (all un-cast HUGEINT
oracle outputs) was invisible locally. `compare()` therefore now ALSO
enforces a strict declared-type pairing per output column (DuckDB
DESCRIBE type -> exact Spark simpleString, e.g. BIGINT<->bigint,
DOUBLE<->double); any oracle column whose DuckDB type has no faithful
Spark twin (HUGEINT, JSON, ...) or maps to a different Spark type is
a mismatch even when every value compares equal.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb

from cassandra_elasticsearch_sync_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


# DuckDB declared type -> the exact Spark simpleString it must pair
# with. Types absent from this map (HUGEINT, UHUGEINT, JSON, UINTEGER,
# ...) have no faithful Spark twin: an oracle emitting one is a latent
# driver-red regardless of values.
DUCK_TO_SPARK = {
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "DATE": "date",
    # Both engines read the parquet timestamps as naive wall-clock
    # (DuckDB TIMESTAMP, Spark TimestampNTZType): the faithful pair.
    "TIMESTAMP": "timestamp_ntz",
    "VARCHAR": "string",
    "BLOB": "binary",
}


def duck_to_spark_type(duck_type: str) -> str | None:
    """Map a DuckDB DESCRIBE type to its exact Spark twin (or None)."""
    t = duck_type.upper()
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t.endswith("[]"):
        inner = duck_to_spark_type(t[:-2])
        return f"array<{inner}>" if inner else None
    return DUCK_TO_SPARK.get(t)


def type_mismatches(spark_df, con, oracle) -> list[str]:
    """Strict per-column declared-type check between both engines."""
    stypes = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    out = []
    for col, dtype, *_ in con.execute(f"DESCRIBE {oracle}").fetchall():
        want = duck_to_spark_type(dtype)
        got = stypes.get(col)
        if got is None:
            continue  # column-name divergence is reported separately
        if want is None:
            out.append(f"type: {col} duck {dtype} has no Spark twin (spark {got})")
        elif want != got:
            out.append(f"type: {col} duck {dtype} -> {want} != spark {got}")
    return out


def _norm_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # repr round-trips doubles exactly; both engines hand back binary64
        return repr(v)
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list = field(default_factory=list)

    def __str__(self) -> str:
        if self.ok:
            return f"{self.name}: OK ({self.spark_rows} rows)"
        head = (f"{self.name}: MISMATCH spark={self.spark_rows} "
                f"oracle={self.oracle_rows}")
        for m in self.mismatches[:5]:
            head += f"\n  {m}"
        return head


def compare(name, spark_df, con, oracle, max_report=5) -> CompareResult:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(oracle)
    o_cols = [d[0] for d in rel.description]
    o_rows = rel.fetchall()

    mismatches = type_mismatches(spark_df, con, oracle)
    if sorted(s_cols) != sorted(o_cols):
        mismatches.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return CompareResult(name, False, len(s_rows), len(o_rows), mismatches)

    sn = _normalize(s_rows, s_cols)
    on = _normalize(o_rows, o_cols)
    if len(sn) != len(on):
        mismatches.append(f"row counts differ: {len(sn)} vs {len(on)}")
    sset, oset = set(sn), set(on)
    only_s = [r for r in sn if r not in oset][:max_report]
    only_o = [r for r in on if r not in sset][:max_report]
    for r in only_s:
        mismatches.append(f"spark-only: {r}")
    for r in only_o:
        mismatches.append(f"oracle-only: {r}")
    if not mismatches and sn != on:
        mismatches.append("multiset differs (duplicate multiplicities)")
    return CompareResult(name, not mismatches, len(sn), len(on), mismatches)
