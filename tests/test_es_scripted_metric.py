"""scripted_metric: hand-checked semantics + the fail-closed battery.

The compiler accepts exactly the distributive map/combine/reduce form
and rejects everything whose value would depend on the shard count -
the same guarantee real ES silently does NOT give, made loud here.
"""

import pytest

from cassandra_elasticsearch_sync_spark.sources.es_scripted_metric import (
    PainlessError,
    es_scripted_metric,
)

CANON = {
    "init_script": "state.t = 0;",
    "map_script": "state.t += doc['x'].value;",
    "combine_script": "return state",
    "reduce_script": "double t = 0; for (s in states) { t += s.t; } "
                     "return t;",
}


def test_scripted_metric_hand_checked(spark):
    df = spark.createDataFrame(
        [("a", 10, 5), ("a", 20, 1), ("a", 30, 9), ("b", 7, 2)],
        "g string, x long, y long")

    # grouped: sum, max with seed folding, count, ternary
    out = es_scripted_metric(df, {
        "init_script": "state.t = 0; state.hi = 8; state.n = 0; "
                       "state.small = 0;",
        "map_script": (
            "state.t += doc['x'].value; "
            "state.hi = Math.max(state.hi, doc['y'].value); "
            "state.n += 1; "
            "state.small += doc['x'].value <= 10 ? 1 : 0;"),
        "combine_script": "return state",
        "reduce_script": (
            "double t = 0; double h = 0; double n = 0; double sm = 0; "
            "for (s in states) { t += s.t; h = Math.max(h, s.hi); "
            "n += s.n; sm += s.small; } "
            "return t / n + h + sm;"),
    }, group_by="g")
    got = {r["key"]: r["value"] for r in out.collect()}
    # a: sum 60 / 3 + max(8, 9) + 1 small = 20 + 9 + 1 = 30
    # b: 7/1 + max(8, 2) + 1 = 7 + 8 + 1 = 16 (init seed 8 wins the max)
    assert got == {"a": 30.0, "b": 16.0}

    # global (no group_by) folds to one row; Math.min path
    out = es_scripted_metric(df, {
        "init_script": "state.lo = 100;",
        "map_script": "state.lo = Math.min(state.lo, doc['y'].value);",
        "combine_script": "return state;",
        "reduce_script": "double lo = 100; for (s in states) "
                         "{ lo = Math.min(lo, s.lo); } return lo;",
    }).collect()
    assert len(out) == 1 and out[0]["value"] == 1.0

    # a nonzero REDUCE-local seed on a sum is well-defined (the reduce
    # runs once on the coordinator) and must be honored, not silently
    # dropped (ADVICE r9): 'double t = 100' -> 100 + sum(x)
    out = es_scripted_metric(df, {
        "init_script": "state.t = 0;",
        "map_script": "state.t += doc['x'].value;",
        "combine_script": "return state",
        "reduce_script": "double t = 100; for (s in states) "
                         "{ t += s.t; } return t;",
    }).collect()
    assert len(out) == 1 and out[0]["value"] == 167.0  # 100 + 67

    # the whole "script" is Catalyst expressions - no Python eval node
    plan = es_scripted_metric(df, CANON, group_by="g") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _expect_reject(match, **overrides):
    spec = {**CANON, **overrides}
    with pytest.raises(PainlessError, match=match):
        # parsing/validation happens before any Spark action, so a
        # DataFrame stub is never touched on the rejection paths
        es_scripted_metric(None, spec)


def test_scripted_metric_fail_closed():
    # nonzero sum seed = per-shard init = shard-count-dependent
    _expect_reject("shard-count-dependent",
                   init_script="state.t = 5;")
    # combine must return the state itself
    _expect_reject("return state",
                   combine_script="return state.t * 2")
    # reduce merge op must match the map fold
    _expect_reject("mismatched merge",
                   map_script="state.t = Math.max(state.t, doc['x'].value);")
    # map var never seeded
    _expect_reject("never seeded",
                   init_script="state.other = 0;")
    # reduce merges a var map never writes
    _expect_reject("never writes",
                   reduce_script="double t = 0; for (s in states) "
                                 "{ t += s.ghost; } return t;")
    # undeclared merge local
    _expect_reject("not declared",
                   reduce_script="for (s in states) { t += s.t; } return t;")
    # plain last-write assignment in map is doc-order-dependent
    _expect_reject("doc-order-dependent",
                   map_script="state.t = doc['x'].value;")
    # Math fold must fold into its own variable
    _expect_reject("own variable",
                   init_script="state.t = 0; state.u = 1;",
                   map_script="state.t = Math.max(state.u, doc['x'].value);")
    # return over unknown locals
    _expect_reject("unknown",
                   reduce_script="double t = 0; for (s in states) "
                                 "{ t += s.t; } return t + ghost;")
    # unparseable constructs stay loud, never guessed
    _expect_reject("unparseable",
                   map_script="state.t += doc['x'].value @ 2;")
    _expect_reject("unsupported",
                   map_script="state.t *= doc['x'].value;")
