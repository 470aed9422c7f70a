"""Local twin of the driver's correctness gate.

Runs a registered query in Spark and its oracle in DuckDB over the
same parquet dir, then compares row count, column names, and
order-insensitive values - the same shape as CORRECTNESS_r{N}.json.
Comparison is exact (stringified cells, sorted rows); any float that
needs tolerance is a parity bug in the query, not in this harness.
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

    mismatches = []
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
