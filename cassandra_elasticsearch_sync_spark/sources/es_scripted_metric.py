"""ES ``scripted_metric`` aggregation: a bounded Painless subset
compiled to ONE grouped Spark aggregate.

``scripted_metric`` is ES's escape-hatch agg: four Painless scripts
(init / map / combine / reduce) run per shard and fold into a single
metric. The subset compiled here is the canonical distributive form
the ES docs themselves teach (the "profit tracking" example):

- ``init_script``: ``state.v = <number>;`` seeds. A SUM variable must
  seed 0 - ES runs init ONCE PER SHARD, so a nonzero sum seed makes
  the metric depend on the shard count, i.e. it is not a well-defined
  metric on any engine; this compiler rejects it instead of guessing.
  Min/max seeds are shard-count-independent (the merge re-folds them)
  and are honored.
- ``map_script``: per-doc updates, each declaring its variable's fold:
  ``state.v += <expr>`` (sum; ``-=`` sums the negation),
  ``state.v = Math.max(state.v, <expr>)`` / ``Math.min`` (max/min).
  ``<expr>`` is arithmetic over ``doc['field'].value`` references,
  numeric/string literals, comparisons, ``&&``/``||``, and the
  ternary ``cond ? a : b`` - compiled to when/otherwise Catalyst
  expressions, never a script engine, so at 100 TB the "script" costs
  what any projected expression costs (whole-stage codegen).
- ``combine_script``: must be ``return state``. Anything else (a
  per-shard projection) makes the reduce see shard-count-dependent
  inputs unless it is linear - the one shape that is always correct
  is returning the state, which is also what the ES docs recommend.
  Fail-closed, like the JPEG arithmetic guard.
- ``reduce_script``: the canonical merge loop -
  ``double t = 0; for (s in states) { t += s.v; ... } return <expr>``.
  Each merge statement's fold op must MATCH the map-side fold of the
  variable it merges (merging a max variable with ``+=`` is
  shard-count-dependent garbage on real ES too - rejected loudly).
  The final ``return`` expression over the merged locals is the
  metric.

Lowering: per state variable one aggregate column (sum variables via
the decimal-exact ``dsum`` rescale so the metric hash-matches
cross-engine at any row order; min/max fold seeds via
``greatest``/``least``), then the reduce return expression projects
over the folded columns, rounded 6 dp at the double edge. One grouped
aggregate with map-side partials - the same plan a native metric gets.

Reference semantics: the public ES scripted_metric documentation
(map/combine/reduce contract, per-shard init). No reference source
exists to cite (SURVEY.md section 0: /root/reference is empty).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.parity import dsum
from cassandra_elasticsearch_sync_spark.registry import register


class PainlessError(ValueError):
    """An unsupported or ill-defined scripted_metric construct."""


_TOKEN_RE = re.compile(r"""
    (?P<docref>doc\[\s*['"](?P<docfield>\w+)['"]\s*\]\.value)
  | (?P<stateref>state\.(?P<statevar>\w+))
  | (?P<mathfn>Math\.(?P<mathname>max|min))
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>'[^']*'|"[^"]*")
  | (?P<op>\+=|-=|==|!=|<=|>=|&&|\|\||[-+*/%(){}?:;,=<>.])
  | (?P<id>\w+)
  | (?P<ws>\s+)
""", re.VERBOSE)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise PainlessError(f"unparseable script at: {src[pos:pos+25]!r}")
        pos = m.end()
        if m.group("ws"):
            continue
        if m.group("docref"):
            out.append(("docref", m.group("docfield")))
        elif m.group("stateref"):
            out.append(("stateref", m.group("statevar")))
        elif m.group("mathfn"):
            out.append(("mathfn", m.group("mathname")))
        elif m.group("num"):
            out.append(("num", m.group("num")))
        elif m.group("str"):
            out.append(("str", m.group("str")[1:-1]))
        elif m.group("op"):
            out.append(("op", m.group("op")))
        else:
            out.append(("id", m.group("id")))
    return out


class _Parser:
    """Recursive-descent expression parser shared by map and reduce.

    ``resolve`` maps a primary reference to a Column: ``('doc', f)``
    for ``doc['f'].value`` in map scripts, ``('local', x)`` for merge
    locals in the reduce return - each script binds its own."""

    def __init__(self, toks: list, resolve):
        self.toks, self.i, self.resolve = toks, 0, resolve

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise PainlessError(f"expected {val or kind}, got {t!r}")
        return t

    def at_end(self) -> bool:
        return self.i >= len(self.toks)

    # expr := or [ '?' expr ':' expr ]
    def expr(self) -> Column:
        c = self.or_expr()
        if self.peek() == ("op", "?"):
            self.next()
            a = self.expr()
            self.expect("op", ":")
            b = self.expr()
            return F.when(c, a).otherwise(b)
        return c

    def or_expr(self) -> Column:
        c = self.and_expr()
        while self.peek() == ("op", "||"):
            self.next()
            c = c | self.and_expr()
        return c

    def and_expr(self) -> Column:
        c = self.cmp_expr()
        while self.peek() == ("op", "&&"):
            self.next()
            c = c & self.cmp_expr()
        return c

    def cmp_expr(self) -> Column:
        c = self.add_expr()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<=", ">=", "<", ">"):
            self.next()
            r = self.add_expr()
            return {"==": c.__eq__, "!=": c.__ne__, "<=": c.__le__,
                    ">=": c.__ge__, "<": c.__lt__, ">": c.__gt__}[v](r)
        return c

    def add_expr(self) -> Column:
        c = self.mul_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            _, v = self.next()
            r = self.mul_expr()
            c = c + r if v == "+" else c - r
        return c

    def mul_expr(self) -> Column:
        c = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            _, v = self.next()
            r = self.unary()
            c = {"*": c.__mul__, "/": c.__truediv__, "%": c.__mod__}[v](r)
        return c

    def unary(self) -> Column:
        if self.peek() == ("op", "-"):
            self.next()
            return -self.unary()
        return self.primary()

    def primary(self) -> Column:
        k, v = self.next()
        if k == "num":
            return F.lit(float(v) if "." in v else int(v))
        if k == "str":
            return F.lit(v)
        if k == "docref":
            return self.resolve(("doc", v))
        if k == "id":
            return self.resolve(("local", v))
        if k == "op" and v == "(":
            c = self.expr()
            self.expect("op", ")")
            return c
        raise PainlessError(f"unsupported primary {k} {v!r} (this subset "
                            "takes doc refs, literals, and arithmetic)")


def _parse_number(tok) -> float:
    if tok[0] != "num":
        raise PainlessError(f"expected a numeric literal, got {tok!r}")
    return float(tok[1])


def _parse_init(src: str) -> dict[str, float]:
    """``state.v = <number>;`` sequence -> {var: seed}."""
    p = _Parser(_tokenize(src), None)
    seeds: dict[str, float] = {}
    while not p.at_end():
        k, var = p.next()
        if k != "stateref":
            raise PainlessError(f"init_script takes 'state.v = <number>;' "
                                f"statements, got {k} {var!r}")
        p.expect("op", "=")
        neg = p.peek() == ("op", "-")
        if neg:
            p.next()
        n = _parse_number(p.next())
        seeds[var] = -n if neg else n
        if p.peek() == ("op", ";"):
            p.next()
    return seeds


def _parse_map(src: str):
    """Map statements -> [(var, fold_kind, expr_tokens)]; fold_kind in
    sum|min|max (``-=`` becomes a sum of the negated expression)."""
    toks = _tokenize(src)
    p = _Parser(toks, None)
    out = []
    while not p.at_end():
        k, var = p.next()
        if k != "stateref":
            raise PainlessError(
                f"map_script statements update state variables, got {k!r}")
        k2, op = p.next()
        start = p.i
        if (k2, op) == ("op", "="):
            fk, fn = p.next()
            if fk != "mathfn":
                raise PainlessError(
                    "plain assignment in map_script supports only "
                    "'state.v = Math.max/min(state.v, expr)' - a "
                    "last-write assignment is doc-order-dependent")
            p.expect("op", "(")
            sk, svar = p.next()
            if sk != "stateref" or svar != var:
                raise PainlessError(
                    f"Math.{fn} fold must reference its own variable "
                    f"state.{var}")
            p.expect("op", ",")
            start = p.i
            depth = 0
            while not p.at_end():
                t = p.peek()
                if t == ("op", "(",):
                    depth += 1
                elif t == ("op", ")"):
                    if depth == 0:
                        break
                    depth -= 1
                p.next()
            expr_toks = p.toks[start:p.i]
            p.expect("op", ")")
            fold = fn  # 'max' | 'min'
        elif (k2, op) in (("op", "+="), ("op", "-=")):
            while not p.at_end() and p.peek() != ("op", ";"):
                p.next()
            expr_toks = p.toks[start:p.i]
            if op == "-=":
                expr_toks = [("op", "-"), ("op", "(")] + expr_toks \
                    + [("op", ")")]
            fold = "sum"
        else:
            raise PainlessError(f"unsupported map operator {op!r}")
        if p.peek() == ("op", ";"):
            p.next()
        out.append((var, fold, expr_toks))
    return out


def _parse_combine(src: str) -> None:
    toks = _tokenize(src.strip())
    ok = (len(toks) >= 2 and toks[0] == ("id", "return")
          and toks[1] == ("id", "state")
          and all(t == ("op", ";") for t in toks[2:]))
    if not ok:
        raise PainlessError(
            "combine_script must be 'return state' - any per-shard "
            "projection other than the state itself makes the metric "
            "depend on the shard count (the ES docs' own recommended "
            "pattern, enforced)")


def _parse_reduce(src: str):
    """Decls + canonical merge loop + return expression.

    Returns (local_seeds, merges=[(local, fold, statevar)],
    return_expr_tokens)."""
    p = _Parser(_tokenize(src), None)
    seeds: dict[str, float] = {}
    while p.peek()[0] == "id" and p.peek()[1] in ("double", "long", "int",
                                                  "def", "float"):
        p.next()
        _, local = p.expect("id")
        p.expect("op", "=")
        neg = p.peek() == ("op", "-")
        if neg:
            p.next()
        n = _parse_number(p.next())
        seeds[local] = -n if neg else n
        p.expect("op", ";")
    p.expect("id", "for")
    p.expect("op", "(")
    _, loopvar = p.expect("id")
    p.expect("id", "in")
    p.expect("id", "states")
    p.expect("op", ")")
    p.expect("op", "{")
    merges = []

    def state_member() -> str:
        k, v = p.next()
        if (k, v) != ("id", loopvar):
            raise PainlessError(f"merge reads {loopvar}.<var>, got {v!r}")
        p.expect("op", ".")
        _, var = p.expect("id")
        return var

    while p.peek() != ("op", "}"):
        _, local = p.expect("id")
        if local not in seeds:
            raise PainlessError(f"merge local {local!r} not declared")
        k2, op = p.next()
        if (k2, op) == ("op", "+="):
            merges.append((local, "sum", state_member()))
        elif (k2, op) == ("op", "="):
            fk, fn = p.next()
            if fk != "mathfn":
                raise PainlessError(
                    "reduce merge supports 'l += s.v' and "
                    "'l = Math.max/min(l, s.v)' only")
            p.expect("op", "(")
            _, l2 = p.expect("id")
            if l2 != local:
                raise PainlessError(
                    f"Math.{fn} merge must fold into its own local")
            p.expect("op", ",")
            merges.append((local, fn, state_member()))
            p.expect("op", ")")
        else:
            raise PainlessError(f"unsupported merge operator {op!r}")
        if p.peek() == ("op", ";"):
            p.next()
    p.expect("op", "}")
    p.expect("id", "return")
    ret = p.toks[p.i:]
    if ret and ret[-1] == ("op", ";"):
        ret = ret[:-1]
    if not ret:
        raise PainlessError("reduce_script must return an expression")
    return seeds, merges, ret


def es_scripted_metric(df: DataFrame, spec: dict,
                       group_by: str | None = None,
                       value_name: str = "value") -> DataFrame:
    """Compile + run a scripted_metric agg (see module docstring).

    ``group_by`` buckets the metric like an enclosing terms agg
    (column aliased ``key``); None folds the whole relation to one
    row. The metric lands in ``value_name``, rounded 6 dp."""
    init = _parse_init(spec["init_script"])
    map_ops = _parse_map(spec["map_script"])
    _parse_combine(spec["combine_script"])
    r_seeds, merges, ret_toks = _parse_reduce(spec["reduce_script"])

    folds: dict[str, tuple[str, list]] = {}
    for var, fold, toks in map_ops:
        if var in folds:
            raise PainlessError(f"state.{var} updated twice in map_script")
        if var not in init:
            raise PainlessError(f"state.{var} never seeded in init_script")
        if fold == "sum" and init[var] != 0:
            raise PainlessError(
                f"sum variable state.{var} seeds {init[var]} - init runs "
                "once PER SHARD on ES, so a nonzero sum seed makes the "
                "metric shard-count-dependent; seed 0")
        folds[var] = (fold, toks)
    locals_to_var: dict[str, str] = {}
    for local, fold, var in merges:
        if var not in folds:
            raise PainlessError(f"reduce merges state.{var}, which "
                                "map_script never writes")
        if fold != folds[var][0]:
            raise PainlessError(
                f"reduce merges state.{var} with {fold!r} but map folds "
                f"it with {folds[var][0]!r} - a mismatched merge is "
                "shard-count-dependent")
        if local in locals_to_var:
            raise PainlessError(f"local {local!r} merged twice")
        locals_to_var[local] = var

    def doc_resolve(ref):
        kind, name = ref
        if kind != "doc":
            raise PainlessError(
                f"map expressions reference doc['{name}'].value, not "
                f"bare identifiers ({name!r})")
        return F.col(name)

    aggs = []
    for local, var in locals_to_var.items():
        fold, toks = folds[var]
        expr = _Parser(list(toks), doc_resolve).expr()
        if fold == "sum":
            # the reduce-local seed ('double t = 100;') is well-defined
            # for a sum: the reduce runs ONCE on the coordinator, so
            # the seed adds exactly once regardless of shard count
            # (unlike an init_script sum seed, rejected above). Before
            # ADVICE r9 a nonzero seed was parsed then silently
            # dropped - a silent wrong answer on accepted input.
            c = F.lit(float(r_seeds.get(local, 0.0))) + dsum(expr, 6)
        elif fold == "max":
            c = F.greatest(F.lit(float(max(init[var],
                                           r_seeds.get(local, init[var])))),
                           F.max(expr.cast("double")))
        else:
            c = F.least(F.lit(float(min(init[var],
                                        r_seeds.get(local, init[var])))),
                        F.min(expr.cast("double")))
        aggs.append(c.alias(f"__sm_{local}"))

    def local_resolve(ref):
        kind, name = ref
        if kind == "local" and name in locals_to_var:
            return F.col(f"__sm_{name}")
        raise PainlessError(f"reduce return references unknown {name!r}")

    ret = _Parser(list(ret_toks), local_resolve).expr()
    if group_by is not None:
        folded = df.groupBy(F.col(group_by).alias("key")).agg(*aggs)
    else:
        folded = df.agg(*aggs)
    out = folded.withColumn(value_name,
                            F.round(ret.cast("double"), 6))
    return out.drop(*[c for c in out.columns if c.startswith("__sm_")])


@register("a3bv_es_scripted_metric", "A3+D5", """
SELECT l_linestatus AS key,
       ROUND(
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10)))
                   AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*)
         + MAX(CAST(l_extendedprice AS DOUBLE))
         + CAST(CAST(SUM(CAST(CASE WHEN l_returnflag = 'R'
                                    THEN l_quantity ELSE 0 END
                              AS DECIMAL(38,10)))
                     AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*)
       , 6) AS value
FROM lineitem
GROUP BY 1
""", "ES scripted_metric - the escape-hatch agg on production "
     "dashboards - through the bounded Painless subset: init seeds, "
     "map folds (+= sum with a ternary over doc refs, Math.max), "
     "combine 'return state' (the only shard-count-independent "
     "shape, enforced), and the canonical reduce merge loop whose "
     "per-variable merge ops must match the map folds. Compiles to "
     "ONE grouped aggregate (sums decimal-exact via the dsum "
     "rescale, map-side partials) + a projected return expression - "
     "the same plan a native metric gets; the 'script' is Catalyst "
     "expressions end to end, never a per-row script engine. The "
     "metric: avg quantity + max price + avg returned quantity per "
     "linestatus.")
def a3bv_es_scripted_metric(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return es_scripted_metric(li, {
        "init_script": "state.qty = 0; state.hi = 0; state.n = 0; "
                       "state.rqty = 0;",
        "map_script": (
            "state.qty += doc['l_quantity'].value; "
            "state.hi = Math.max(state.hi, doc['l_extendedprice'].value); "
            "state.n += 1; "
            "state.rqty += doc['l_returnflag'].value == 'R' "
            "? doc['l_quantity'].value : 0;"),
        "combine_script": "return state",
        "reduce_script": (
            "double q = 0; double h = 0; double n = 0; double rq = 0; "
            "for (s in states) { q += s.qty; h = Math.max(h, s.hi); "
            "n += s.n; rq += s.rqty; } "
            "return q / n + h + rq / n;"),
    }, group_by="l_linestatus")
