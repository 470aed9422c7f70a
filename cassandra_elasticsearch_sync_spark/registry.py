"""Query registry: the single source of truth for the verified surface.

Every operator in SURVEY.md section 2 that is oracle-checkable is
declared exactly once, as a QuerySpec carrying BOTH the PySpark
callable and the equivalent DuckDB-runnable ANSI SQL. The driver
contract (__spark_entry__.py) then reduces to two dict comprehensions
over this registry.

Parity rules enforced by convention here (SURVEY.md section 5.3):
alias every computed column identically on both sides; round floats to
6 dp on both sides; timestamps only via date_trunc/date parts; total
ordering on every LIMIT; no nondeterministic functions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str           # registry key, e.g. "d1_groupby_agg"
    fn: QueryFn         # (spark, sf_dir) -> DataFrame
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None
    survey_id: str      # SURVEY.md section 2 row, e.g. "D1"
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, survey_id: str, oracle: str | None, doc: str = ""):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under `name`."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                    survey_id=survey_id, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: v.oracle for k, v in all_specs().items() if v.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from cassandra_elasticsearch_sync_spark.operators import (  # noqa: F401
        relational,
        aggregates,
        windows,
        setops,
        sorts,
        tpch,
        udfs,
        skew,
    )
    from cassandra_elasticsearch_sync_spark.functions import (  # noqa: F401
        scalar,
        json_ops,
        arrays,
    )
    from cassandra_elasticsearch_sync_spark.sync import ops as sync_ops  # noqa: F401
    from cassandra_elasticsearch_sync_spark.pipeline import (  # noqa: F401
        dedup,
        similarity,
        text_analysis,
        multimodal,
        timeseries,
        search,
        analytics,
        sketches,
    )
    from cassandra_elasticsearch_sync_spark.streaming import incremental, stateful  # noqa: F401
    from cassandra_elasticsearch_sync_spark.sources import readers, es_query  # noqa: F401
    _LOADED = True
