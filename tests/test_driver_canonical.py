"""Driver-canonicalizable outputs (VERDICT r9 items #1/#2).

Round 9's two driver ``err`` rows (a3bu/a3bz) were array-typed output
columns - the driver canonicalizes through pandas, where a list cell
raises ``TypeError: unhashable type`` inside sort_values' factorize -
and six never-sampled queries leaked raw DECIMAL outputs, which pandas
keeps as object-Decimal cells that hash-diverge from DuckDB's float64
despite value-identical rows. The builder's str(v)-based harness was
blind to both.

Three layers, each meta-tested here (an undetectable guard is vacuous,
the house discipline since the r3 window-detector meta-test):

1. ``oracle_harness.compare`` now rejects any oracle-checked Spark
   output carrying array/map/struct/decimal fields
   (``driver_unsafe_fields``), so the registry-wide parity suite and
   tools/parity_sweep.py enforce the rule on every pass.
2. ``oracle_harness.pandas_compare`` is a driver-faithful compare
   (toPandas / .df(), sorted columns, factorize-backed sort, pandas'
   own row hash) that reproduces both r9 failure shapes on synthetic
   inputs - proven below.
3. The 11 repaired queries (5 array-flattened: a3bu a3bz a3co a3cp
   a3cj; 6 decimal->double: a3cx a3ae a3ag a3ah i11
   k_rfm_segmentation) must pass ``pandas_compare`` end-to-end.
"""

from __future__ import annotations

import pytest

from cassandra_elasticsearch_sync_spark.registry import all_specs
from tests.oracle_harness import (
    compare,
    driver_unsafe_fields,
    duck_connection,
    pandas_compare,
)

SF_DIR = "/root/testdata/sf0.001"

REPAIRED = [
    "a3bu_es_has_child_inner_hits",
    "a3bz_es_nested_inner_hits",
    "a3co_es_has_parent_inner_hits",
    "a3cp_es_collapse_inner_hits",
    "a3cj_es_geo_line",
    "a3cx_es_fixed_interval_histogram",
    "a3ae_es_geotile_grid",
    "a3ag_es_geo_distance_rings",
    "a3ah_es_multi_terms",
    "i11_exactly_once_acid_sink",
    "k_rfm_segmentation",
]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


# --- layer 2 meta-tests: pandas_compare reproduces both r9 shapes ----

def test_pandas_compare_catches_array_cells(spark, duck):
    """The exact a3bu/a3bz driver shape: an array<string> output
    column errs (unhashable list in factorize), even though the
    str(v) path would have compared it equal."""
    sdf = spark.sql("SELECT 1 AS k, array('a', 'b') AS hits")
    oracle = "SELECT 1 AS k, ['a', 'b'] AS hits"
    res = pandas_compare("synthetic_array", sdf, duck, oracle)
    assert not res.ok
    assert any("driver-err" in m for m in res.mismatches), res.mismatches


def test_pandas_compare_catches_decimal_vs_float(spark, duck):
    """The a3cx driver shape: Spark decimal output rides pandas as
    object-Decimal, DuckDB's .df() as float64 - value-identical rows
    must still hash-mismatch on the pandas path."""
    sdf = spark.sql("SELECT CAST(123.45 AS DECIMAL(38,2)) AS v")
    oracle = "SELECT CAST(123.45 AS DOUBLE) AS v"
    res = pandas_compare("synthetic_decimal", sdf, duck, oracle)
    assert not res.ok, "decimal-vs-float64 must not hash-match"


def test_pandas_compare_passes_on_clean_match(spark, duck):
    sdf = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS n, CAST(1.5 AS DOUBLE) AS v, 'x' AS s")
    oracle = "SELECT CAST(1 AS BIGINT) AS n, CAST(1.5 AS DOUBLE) AS v, 'x' AS s"
    res = pandas_compare("synthetic_clean", sdf, duck, oracle)
    assert res.ok, str(res)


def test_pandas_compare_catches_value_diff(spark, duck):
    sdf = spark.sql("SELECT CAST(1 AS BIGINT) AS n")
    res = pandas_compare("synthetic_diff", sdf, duck,
                         "SELECT CAST(2 AS BIGINT) AS n")
    assert not res.ok


# --- layer 1 meta-tests: compare() rejects driver-unsafe schemas ----

def test_compare_rejects_array_output(spark, duck):
    sdf = spark.sql("SELECT 1 AS k, array('a') AS hits")
    res = compare("synthetic_array", sdf, duck,
                  "SELECT 1 AS k, ['a'] AS hits")
    assert not res.ok
    assert any("driver-unsafe" in m for m in res.mismatches)


def test_compare_rejects_decimal_output(spark, duck):
    sdf = spark.sql("SELECT CAST(1.23 AS DECIMAL(38,2)) AS v")
    res = compare("synthetic_decimal", sdf, duck,
                  "SELECT CAST(1.23 AS DECIMAL(38,2)) AS v")
    assert not res.ok
    assert any("driver-unsafe" in m for m in res.mismatches)


def test_driver_unsafe_fields_names_the_offender(spark):
    sdf = spark.sql(
        "SELECT map('a', 1) AS m, named_struct('x', 1) AS st, "
        "CAST(1 AS BIGINT) AS ok")
    probs = driver_unsafe_fields(sdf.schema)
    assert len(probs) == 2
    assert any("m is map<" in p for p in probs)
    assert any("st is struct<" in p for p in probs)


# --- layer 3: the 11 repaired queries pass the driver-faithful path --

@pytest.mark.parametrize("name", REPAIRED)
def test_repaired_queries_pandas_green(spark, duck, name):
    spec = all_specs()[name]
    assert spec.oracle is not None
    df = spec.fn(spark, SF_DIR)
    assert driver_unsafe_fields(df.schema) == [], name
    res = pandas_compare(name, df, duck, spec.oracle)
    assert res.ok, str(res)


def test_front50_pandas_mode_green(spark, duck):
    """VERDICT r9 #2's done-criterion: the driver-facing front-50
    re-verified under the driver-faithful pandas compare mode (the
    str(v) harness passed 50/50 in r9 while the driver err'd twice -
    this is the mode that would have caught it)."""
    specs = all_specs()
    front50 = list(specs)[:50]
    bad = []
    for name in front50:
        spec = specs[name]
        if spec.oracle is None:
            bad.append(f"{name}: rows-only key in the front-50")
            continue
        res = pandas_compare(name, spec.fn(spark, SF_DIR), duck,
                             spec.oracle)
        if not res.ok:
            bad.append(str(res))
    assert not bad, bad
