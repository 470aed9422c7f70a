"""CQL ``CREATE FUNCTION`` / ``CREATE AGGREGATE`` - user-defined
scalars and aggregates registered into the CQL compiler.

Cassandra UDFs are Java/JSR-223 bodies; the subset registered here is
the arithmetic one (the same bounded-translation house pattern as
es_scripted_metric): ``return <expr>;`` over the declared arguments
with numbers, strings (comparison-only), ``+ - * / %``, comparisons,
``&&``/``||``, ternaries, and ``Math.max``/``Math.min``. The body
compiles ONCE at DDL time to a Column factory - every call site is a
plain Catalyst expression (whole-stage codegen), never a Python UDF.

Fidelity rules enforced like Cassandra (and tested):
- ``CREATE OR REPLACE`` and ``IF NOT EXISTS`` are mutually exclusive;
  a duplicate CREATE without either raises; DROP of a missing object
  raises unless IF EXISTS.
- One of ``RETURNS NULL ON NULL INPUT`` / ``CALLED ON NULL INPUT`` is
  mandatory. The subset's expressions are null-propagating, which IS
  ``RETURNS NULL ON NULL INPUT``; ``CALLED ON NULL INPUT`` is
  rejected loudly rather than silently mislabeled.
- A UDA's SFUNC must be a registered function whose first argument
  type equals STYPE and whose remaining signature matches the
  aggregate's argument types; FINALFUNC must take exactly (STYPE).
- UDA semantics: Cassandra folds rows SEQUENTIALLY on the
  coordinator, so any fold body is "well-defined" there; a
  distributed engine must demand an associative+commutative fold or
  silently return different answers. The SFUNC body must therefore
  match a distributive pattern - ``return state + <expr(args)>``
  (sum) or ``return Math.max/min(state, <expr(args)>)`` - anything
  else (order-dependent folds, tuple states) is rejected, not
  guessed.
- ``INITCOND`` seeds the single sequential fold, so a nonzero sum
  seed is added ONCE (unlike scripted_metric's per-shard init - both
  engines agree here). An omitted INITCOND starts the state NULL and,
  with null-propagating folds, the aggregate returns NULL for any
  input - Cassandra's exact (surprising) behavior, reproduced.

Sum folds over floating STYPEs ride the decimal dsum rescale so the
result hash-matches at any row order; integral STYPEs sum as longs.
Java's integer-division truncation is NOT emulated: ``/`` is true
division on both engines (declare a floating RETURNS for bodies that
divide), documented divergence.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.parity import dsum
from cassandra_elasticsearch_sync_spark.sources.cql_query import CqlError
from cassandra_elasticsearch_sync_spark.sources.es_scripted_metric import (
    PainlessError,
    _Parser,
    _tokenize,
)

_NUMERIC_TYPES = {
    "tinyint": "tinyint", "smallint": "smallint", "int": "int",
    "bigint": "long", "varint": "long", "counter": "long",
    "float": "float", "double": "double",
}
_TEXT_TYPES = {"text", "ascii", "varchar"}


def _spark_type(cql_type: str) -> str:
    t = cql_type.strip().lower()
    if t in _NUMERIC_TYPES:
        return _NUMERIC_TYPES[t]
    if t in _TEXT_TYPES:
        return "string"
    raise CqlError(f"unsupported CQL type {t!r} (the arithmetic-subset "
                   "UDFs take numeric and text types; tuple/collection "
                   "states are rejected, not guessed)")


@dataclass(frozen=True)
class CqlUdf:
    name: str
    arg_names: tuple          # declared argument names, in order
    arg_types: tuple          # declared CQL types, lowered
    returns: str              # declared CQL return type, lowered
    body_toks: tuple          # tokenized 'return'-stripped expression

    def column(self, args: list[Column]) -> Column:
        if len(args) != len(self.arg_names):
            raise CqlError(
                f"{self.name} takes {len(self.arg_names)} argument(s), "
                f"got {len(args)}")
        # bind arguments AT their declared CQL types (Cassandra
        # validates the call signature; the cast is the type bridge)
        args = [a.cast(_spark_type(t))
                for a, t in zip(args, self.arg_types)]
        binding = dict(zip(self.arg_names, args))

        def resolve(ref):
            kind, n = ref
            if kind == "local" and n in binding:
                return binding[n]
            raise CqlError(f"{self.name} body references {n!r}, which is "
                           "not a declared argument")

        try:
            expr = _Parser(list(self.body_toks), resolve).expr()
        except PainlessError as e:
            raise CqlError(str(e)) from e
        return expr.cast(_spark_type(self.returns))


@dataclass(frozen=True)
class CqlUda:
    name: str
    arg_types: tuple
    stype: str
    fold: str                 # 'sum' | 'max' | 'min'
    map_toks: tuple           # sfunc body expression over the value args
    sfunc_arg_names: tuple    # sfunc's VALUE argument names (state excl.)
    initcond: float | int | None
    finalfunc: "CqlUdf | None"
    sfunc_name: str = ""      # for the still-referenced DDL guard

    def agg_column(self, args: list[Column]) -> Column:
        if len(args) != len(self.arg_types):
            raise CqlError(
                f"{self.name} takes {len(self.arg_types)} argument(s), "
                f"got {len(args)}")
        stype = _spark_type(self.stype)
        if self.initcond is None:
            # Cassandra: no INITCOND -> state starts null and a
            # null-propagating sfunc keeps it null forever
            out = F.lit(None).cast(stype)
            return self.finalfunc.column([out]) if self.finalfunc else out
        args = [a.cast(_spark_type(t))
                for a, t in zip(args, self.arg_types)]
        binding = dict(zip(self.sfunc_arg_names, args))

        def resolve(ref):
            kind, n = ref
            if kind == "local" and n in binding:
                return binding[n]
            raise CqlError(f"{self.name} sfunc references {n!r}")

        try:
            expr = _Parser(list(self.map_toks), resolve).expr()
        except PainlessError as e:
            raise CqlError(str(e)) from e
        if self.fold == "sum":
            if stype in ("float", "double"):
                # decimal-exact rescale: order-independent double sums
                folded = F.lit(float(self.initcond)) + dsum(expr, 6)
            else:
                folded = (F.lit(int(self.initcond))
                          + F.sum(expr.cast("long")))
        elif self.fold == "max":
            folded = F.greatest(F.lit(self.initcond).cast(stype),
                                F.max(expr.cast(stype)))
        else:
            folded = F.least(F.lit(self.initcond).cast(stype),
                             F.min(expr.cast(stype)))
        out = folded.cast(stype)
        return self.finalfunc.column([out]) if self.finalfunc else out


_FUNCTIONS: dict[str, CqlUdf] = {}
_AGGREGATES: dict[str, CqlUda] = {}


def lookup_function(name: str) -> CqlUdf | None:
    return _FUNCTIONS.get(name.lower())


def lookup_aggregate(name: str) -> CqlUda | None:
    return _AGGREGATES.get(name.lower())


_CREATE_FN_RE = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?FUNCTION\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s*"
    r"\(\s*(?P<args>[^)]*)\)\s+"
    r"(?P<null>RETURNS\s+NULL\s+ON\s+NULL\s+INPUT|CALLED\s+ON\s+NULL\s+INPUT)\s+"
    r"RETURNS\s+(?P<ret>\w+)\s+"
    r"LANGUAGE\s+(?P<lang>\w+)\s+"
    # Cassandra body literals: '...' with '' doubling an inner quote,
    # or the $$...$$ dollar-quoted form
    r"AS\s+(?:'(?P<body>(?:[^']|'')*)'|\$\$(?P<dbody>.*?)\$\$)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_CREATE_AGG_RE = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?AGGREGATE\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s*"
    r"\(\s*(?P<args>[^)]*)\)\s+"
    r"SFUNC\s+(?P<sfunc>\w+)\s+"
    r"STYPE\s+(?P<stype>[\w<>,\s]+?)"
    r"(?:\s+FINALFUNC\s+(?P<final>\w+))?"
    r"(?:\s+INITCOND\s+(?P<init>\([^)]*\)|[-\w.]+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _check_exclusive(m) -> None:
    if m.group("replace") and m.group("ine"):
        raise CqlError("OR REPLACE and IF NOT EXISTS are mutually "
                       "exclusive (Cassandra's rule)")


def create_function(ddl: str) -> CqlUdf:
    m = _CREATE_FN_RE.match(ddl)
    if not m:
        raise CqlError(f"unsupported CREATE FUNCTION statement: {ddl!r}")
    _check_exclusive(m)
    name = m.group("name").lower()
    if name in _FUNCTIONS:
        if m.group("ine"):
            return _FUNCTIONS[name]
        if not m.group("replace"):
            raise CqlError(f"function {name!r} already exists "
                           "(use CREATE OR REPLACE or IF NOT EXISTS)")
        # Cassandra's still-referenced rule (ADVICE r9): replacing a
        # function bound as an aggregate's SFUNC/FINALFUNC would leave
        # the UDA on the body tokens captured at create_aggregate
        # time - a silent stale binding. Reject like Cassandra does.
        refs = _aggregates_referencing(name)
        if refs:
            raise CqlError(
                f"function {name!r} is still referenced by aggregate"
                f"{'s' if len(refs) > 1 else ''} {', '.join(refs)} "
                "(drop the aggregate first, Cassandra's rule)")
    if m.group("lang").lower() != "java":
        raise CqlError(f"LANGUAGE {m.group('lang')!r} unsupported "
                       "(the arithmetic subset is declared as java)")
    if m.group("null").upper().startswith("CALLED"):
        raise CqlError(
            "CALLED ON NULL INPUT is rejected: the arithmetic subset "
            "compiles to null-propagating expressions, which is "
            "RETURNS NULL ON NULL INPUT semantics - declaring CALLED "
            "would mislabel the behavior")
    arg_names, arg_types = [], []
    args_src = m.group("args").strip()
    for part in ([] if not args_src else args_src.split(",")):
        pieces = part.split()
        if len(pieces) != 2:
            raise CqlError(f"malformed argument declaration {part!r}")
        arg_names.append(pieces[0].lower())
        arg_types.append(pieces[1].lower())
        _spark_type(pieces[1])
    if len(set(arg_names)) != len(arg_names):
        raise CqlError("duplicate argument names")
    _spark_type(m.group("ret"))
    body = (m.group("dbody") if m.group("dbody") is not None
            else m.group("body").replace("''", "'")).strip()
    if not body.lower().startswith("return"):
        raise CqlError("the function body must be 'return <expr>;'")
    toks = _tokenize(body[len("return"):].strip().rstrip(";"))
    if not toks:
        raise CqlError("empty function body")
    # text-typed arguments may only be COMPARED (==/!=), never used in
    # arithmetic - the closest static check to javac's type errors
    # this subset can make, applied at DDL time
    text_args = {n for n, t in zip(arg_names, arg_types)
                 if t in _TEXT_TYPES}
    for i, (k, v) in enumerate(toks):
        if k == "id" and v in text_args:
            prev = toks[i - 1] if i else None
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            cmp_ops = {"==", "!="}
            ok = (prev is not None and prev[0] == "op"
                  and prev[1] in cmp_ops) or \
                 (nxt is not None and nxt[0] == "op" and nxt[1] in cmp_ops)
            if not ok:
                raise CqlError(
                    f"text argument {v!r} used outside an ==/!= "
                    "comparison (arithmetic on text does not type-check)")
    fn = CqlUdf(name=name, arg_names=tuple(arg_names),
                arg_types=tuple(arg_types),
                returns=m.group("ret").lower(), body_toks=tuple(toks))
    _FUNCTIONS[name] = fn
    return fn


def _parse_fold(sfunc: CqlUdf) -> tuple[str, tuple]:
    """Recognize the distributive fold pattern in an SFUNC body (module
    docstring); returns (fold_kind, value-expression tokens)."""
    toks = list(sfunc.body_toks)
    state = sfunc.arg_names[0]
    if (len(toks) >= 3 and toks[0] == ("id", state)
            and toks[1] == ("op", "+")):
        rest = toks[2:]
    elif (len(toks) >= 6 and toks[0][0] == "mathfn"
          and toks[1] == ("op", "(") and toks[2] == ("id", state)
          and toks[3] == ("op", ",") and toks[-1] == ("op", ")")):
        rest = toks[4:-1]
        kind = toks[0][1]  # 'max' | 'min'
        if any(t == ("id", state) for t in rest):
            raise CqlError("the fold expression must not re-reference "
                           "the state argument")
        return kind, tuple(rest)
    else:
        raise CqlError(
            f"SFUNC {sfunc.name!r} is not a distributive fold: a "
            "distributed engine supports 'return state + <expr>' and "
            "'return Math.max/min(state, <expr>)' - Cassandra folds "
            "sequentially on the coordinator, so other bodies would "
            "silently change meaning here; rejected instead")
    if any(t == ("id", state) for t in rest):
        raise CqlError("the fold expression must not re-reference the "
                       "state argument")
    return "sum", tuple(rest)


def create_aggregate(ddl: str) -> CqlUda:
    m = _CREATE_AGG_RE.match(ddl)
    if not m:
        raise CqlError(f"unsupported CREATE AGGREGATE statement: {ddl!r}")
    _check_exclusive(m)
    name = m.group("name").lower()
    if name in _AGGREGATES:
        if m.group("ine"):
            return _AGGREGATES[name]
        if not m.group("replace"):
            raise CqlError(f"aggregate {name!r} already exists")
    stype = m.group("stype").strip().lower()
    if "<" in stype:
        raise CqlError(
            f"STYPE {stype!r} unsupported: tuple/collection states are "
            "not distributive-checkable; use a scalar state")
    _spark_type(stype)
    arg_types = tuple(t.strip().lower()
                      for t in m.group("args").split(",") if t.strip())
    sfunc = lookup_function(m.group("sfunc"))
    if sfunc is None:
        raise CqlError(f"SFUNC {m.group('sfunc')!r} is not a registered "
                       "function")
    want = (stype, *arg_types)
    if sfunc.arg_types != want:
        raise CqlError(
            f"SFUNC {sfunc.name!r} signature {sfunc.arg_types} does not "
            f"match (STYPE, aggregate args) = {want} (Cassandra's rule)")
    if sfunc.returns != stype:
        raise CqlError(f"SFUNC must return STYPE {stype!r}, "
                       f"returns {sfunc.returns!r}")
    final = None
    if m.group("final"):
        final = lookup_function(m.group("final"))
        if final is None:
            raise CqlError(f"FINALFUNC {m.group('final')!r} is not a "
                           "registered function")
        if final.arg_types != (stype,):
            raise CqlError("FINALFUNC must take exactly (STYPE)")
    init = None
    if m.group("init") is not None:
        raw = m.group("init")
        if raw.startswith("("):
            raise CqlError(f"INITCOND {raw!r} is a tuple literal; "
                           "scalar states take scalar seeds")
        if raw.lower() != "null":
            init = float(raw) if "." in raw else int(raw)
    fold, map_toks = _parse_fold(sfunc)
    uda = CqlUda(name=name, arg_types=arg_types, stype=stype, fold=fold,
                 map_toks=map_toks,
                 sfunc_arg_names=tuple(sfunc.arg_names[1:]),
                 initcond=init, finalfunc=final, sfunc_name=sfunc.name)
    _AGGREGATES[name] = uda
    return uda


def _aggregates_referencing(fn_name: str) -> list[str]:
    """Registered aggregates binding ``fn_name`` as SFUNC/FINALFUNC."""
    n = fn_name.lower()
    return sorted(
        a.name for a in _AGGREGATES.values()
        if a.sfunc_name == n
        or (a.finalfunc is not None and a.finalfunc.name == n))


def drop_function(name: str, if_exists: bool = False) -> None:
    # Cassandra rejects dropping a function an aggregate still binds
    # (InvalidRequest 'still referenced by') - the check precedes the
    # existence pop so a referenced function is never half-dropped
    refs = _aggregates_referencing(name)
    if refs:
        raise CqlError(
            f"function {name!r} is still referenced by aggregate"
            f"{'s' if len(refs) > 1 else ''} {', '.join(refs)} "
            "(drop the aggregate first, Cassandra's rule)")
    if _FUNCTIONS.pop(name.lower(), None) is None and not if_exists:
        raise CqlError(f"function {name!r} does not exist")


def drop_aggregate(name: str, if_exists: bool = False) -> None:
    if _AGGREGATES.pop(name.lower(), None) is None and not if_exists:
        raise CqlError(f"aggregate {name!r} does not exist")


# ---------------------------------------------------------------------------
# Registered, oracle-verified queries
# ---------------------------------------------------------------------------

from cassandra_elasticsearch_sync_spark.catalog import load_table  # noqa: E402
from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402


@register("a2ae_cql_create_aggregate", "A2+D5", """
SELECT l_orderkey,
       CAST(SUM(CAST(l_quantity AS INT) * CAST(l_quantity AS INT))
            AS BIGINT) AS qty_sq,
       CAST(SUM(CAST(l_quantity AS INT) * CAST(l_quantity AS INT))
            AS BIGINT) / 1000.0 AS qty_sq_k,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY 1
""", "CQL CREATE FUNCTION + CREATE AGGREGATE: a UDA 'sum of squared "
     "quantities' built from SFUNC 'return state + q * q;' (STYPE "
     "bigint, INITCOND 0) plus a FINALFUNC variant dividing the "
     "final state by 1000.0 - registered through the DDL parser, "
     "validated like Cassandra (SFUNC signature must be (STYPE, "
     "args); FINALFUNC takes exactly (STYPE); tuple STYPEs and "
     "non-distributive fold bodies are rejected, because Cassandra "
     "folds sequentially on the coordinator and a distributed "
     "engine running an order-dependent fold would silently change "
     "meaning). The fold compiles to ONE grouped aggregate with "
     "map-side partials; INITCOND seeds the fold ONCE (sequential "
     "semantics - unlike scripted_metric's per-shard init), so "
     "nonzero seeds are legal here. No Python UDF anywhere.")
def a2ae_cql_create_aggregate(spark, sf_dir):
    # idempotent re-run under the still-referenced rule (ADVICE r9):
    # Cassandra refuses CREATE OR REPLACE of a function an aggregate
    # still binds, so - exactly like a real CQL migration script -
    # the aggregates drop first, then the functions replace
    drop_aggregate("sum_sq", if_exists=True)
    drop_aggregate("sum_sq_k", if_exists=True)
    create_function(
        "CREATE OR REPLACE FUNCTION sq_step(state bigint, q int) "
        "RETURNS NULL ON NULL INPUT RETURNS bigint LANGUAGE java "
        "AS 'return state + q * q;'")
    create_function(
        "CREATE OR REPLACE FUNCTION per_mille(s bigint) "
        "RETURNS NULL ON NULL INPUT RETURNS double LANGUAGE java "
        "AS 'return s / 1000.0;'")
    create_aggregate(
        "CREATE OR REPLACE AGGREGATE sum_sq(int) "
        "SFUNC sq_step STYPE bigint INITCOND 0")
    create_aggregate(
        "CREATE OR REPLACE AGGREGATE sum_sq_k(int) "
        "SFUNC sq_step STYPE bigint FINALFUNC per_mille INITCOND 0")
    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        cql_select,
    )
    li = load_table(spark, sf_dir, "lineitem")
    return cql_select(li, """
        SELECT l_orderkey, sum_sq(l_quantity) AS qty_sq,
               sum_sq_k(l_quantity) AS qty_sq_k,
               count(*) AS n_items
        FROM lineitem GROUP BY l_orderkey
    """)


@register("a2af_cql_create_function", "A2+H3", """
SELECT doc_id, n_chars,
       CAST(CASE WHEN n_chars < 300 THEN 0
                 WHEN n_chars < 600 THEN 1 ELSE 2 END
            AS INTEGER) AS tier,
       CAST(n_chars * 3 + doc_id % 10 AS BIGINT) AS wscore
FROM documents
""", "CQL scalar CREATE FUNCTION calls in the select list: a ternary "
     "tier function and a two-argument arithmetic score, both "
     "compiled ONCE at DDL time into Catalyst expressions and "
     "projected per row in whole-stage codegen - a UDF call costs "
     "exactly what the inline expression costs, never a per-row "
     "script engine or Python UDF. Arguments bind AT their declared "
     "CQL types (the type bridge Cassandra's signature validation "
     "implies); text arguments outside ==/!= comparisons fail the "
     "DDL, the subset's stand-in for javac's type errors.")
def a2af_cql_create_function(spark, sf_dir):
    create_function(
        "CREATE OR REPLACE FUNCTION chars_tier(n bigint) "
        "RETURNS NULL ON NULL INPUT RETURNS int LANGUAGE java "
        "AS 'return n < 300 ? 0 : (n < 600 ? 1 : 2);'")
    create_function(
        "CREATE OR REPLACE FUNCTION wscore(n bigint, k bigint) "
        "RETURNS NULL ON NULL INPUT RETURNS bigint LANGUAGE java "
        "AS 'return n * 3 + k % 10;'")
    from cassandra_elasticsearch_sync_spark.sources.cql_query import (
        cql_select,
    )
    d = load_table(spark, sf_dir, "documents")
    return cql_select(d, """
        SELECT doc_id, n_chars, chars_tier(n_chars) AS tier,
               wscore(n_chars, doc_id) AS wscore
        FROM documents
    """)
