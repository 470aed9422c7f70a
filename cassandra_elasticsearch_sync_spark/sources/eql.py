"""EQL - Elastic's Event Query Language (``GET index/_eql/search``).

The security-analytics query surface over an ordered event stream:
single event queries (``category where condition``) and SEQUENCE
queries (``sequence by key with maxspan=2h [a where ...] [b where
...]``) that match ordered chains of related events per join key.

Subset implemented (the public EQL grammar's core):

  * event queries: ``<category> where <condition>`` with ``any`` as
    the wildcard category; conditions compose ==, !=, <, <=, >, >=,
    ``in (...)``, and/or/not, parentheses, string/number/bool
    literals;
  * sequences: global ``by`` join keys, ``with maxspan=<n><unit>``
    (s/m/h/d) anchored at the FIRST step's timestamp (ES's rule),
    2..n steps;
  * pipes: ``| head N`` / ``| tail N`` over the result order.

Rejected loudly (not guessed): per-step ``by`` overrides, ``until``,
``with runs``, function calls inside conditions - each raises with
the construct named.

Sequence semantics - the deterministic reference: ES's EQL matcher is
a streaming state machine that, per join key, advances each partial
sequence on the EARLIEST qualifying continuation and expires partials
past ``maxspan``. The closed-form equivalent computed here: every
step-1 match pairs with the earliest step-2 event strictly after it
(timestamp, then event id - ES's own tiebreaker), that pair with the
earliest qualifying step-3 event, and so on, keeping chains whose
last timestamp stays within ``maxspan`` of the first. Where ES's
machine CONSUMES an event into one sequence, this reference lets
concurrent partials share a continuation - a documented superset on
overlapping chains (ES itself matches every candidate start; the
difference only shows when two starts race for one continuation).

Plan shape: each step is ONE union + ONE key-partitioned window
(partitionBy the join key, orderBy ts/event id) computing the
earliest following step event via first(..., ignorenulls) over the
forward frame - never an unpartitioned window, never a cross join.
Per-key event cardinality bounds every frame; at 100 TB the stream
hash-partitions by the join key and each step is one co-partitioned
shuffle, the same budget as a per-key sessionization.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

_TOK_RE = re.compile(r"""
    \s*(?:
      (?P<num>-?\d+(?:\.\d+)?)
    | (?P<str>"(?:[^"\\]|\\.)*")
    | (?P<op>==|!=|<=|>=|<|>|\(|\)|\[|\]|,|\|)
    | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    | (?P<eq>=)
    )""", re.VERBOSE)


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(text):
        m = _TOK_RE.match(text, i)
        if not m or m.end() == i:
            if text[i:].strip():
                raise ValueError(f"EQL: cannot tokenize at {text[i:i+20]!r}")
            break
        i = m.end()
        for kind in ("num", "str", "op", "word", "eq"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    return toks


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1].lower() != val:
            raise ValueError(f"EQL: expected {val!r}, got {t[1]!r}")
        return t


def _lit(tok):
    kind, v = tok
    if kind == "num":
        return float(v) if "." in v else int(v)
    if kind == "str":
        return v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    if kind == "word" and v.lower() in ("true", "false"):
        return v.lower() == "true"
    raise ValueError(f"EQL: expected a literal, got {v!r}")


def _parse_condition(p: _P, build: bool = True):
    """or_expr -> and_expr (or and_expr)*. With ``build=False`` the
    grammar is checked (every rejection still fires) but no Spark
    Column is constructed - parse_eql's eager validation path, which
    must work without an active SparkContext."""
    def primary():
        kind, v = p.peek()
        if v == "(":
            p.next()
            c = or_expr()
            p.expect(")")
            return c
        if kind == "word" and v.lower() == "not":
            p.next()
            inner = primary()
            return (~inner) if build else None
        if kind == "word" and v.lower() == "true":
            p.next()
            return F.lit(True) if build else None
        if kind == "word" and v.lower() == "false":
            p.next()
            return F.lit(False) if build else None
        if kind != "word":
            raise ValueError(f"EQL: expected a field name, got {v!r}")
        p.next()
        fname = v
        kind2, op = p.next()
        if kind2 == "word" and op.lower() == "in":
            p.expect("(")
            vals = [_lit(p.next())]
            while p.peek()[1] == ",":
                p.next()
                vals.append(_lit(p.next()))
            p.expect(")")
            return F.col(fname).isin(*vals) if build else None
        if kind2 == "word" and op.lower() == "like":
            raise ValueError(
                "EQL: like/wildcard conditions are not implemented; "
                "use ==/in")
        if op not in ("==", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"EQL: unsupported operator {op!r}")
        if p.peek()[1] == "(":
            raise ValueError(
                "EQL: function calls in conditions are not implemented")
        lit = _lit(p.next())
        if not build:
            return None
        field, rhs = F.col(fname), F.lit(lit)
        return {"==": field == rhs, "!=": field != rhs,
                "<": field < rhs, "<=": field <= rhs,
                ">": field > rhs, ">=": field >= rhs}[op]

    def and_expr():
        c = primary()
        while p.peek()[1].lower() == "and":
            p.next()
            n = primary()
            c = (c & n) if build else None
        return c

    def or_expr():
        c = and_expr()
        while p.peek()[1].lower() == "or":
            p.next()
            n = and_expr()
            c = (c | n) if build else None
        return c

    return or_expr()


_SPAN_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _parse_maxspan(raw: str) -> int:
    m = re.fullmatch(r"(\d+)([smhd])", raw)
    if not m:
        raise ValueError(f"EQL: bad maxspan {raw!r} (want e.g. 2h)")
    return int(m.group(1)) * _SPAN_UNITS[m.group(2)]


def parse_eql(query: str) -> dict:
    """Parse one EQL query -> {'kind': 'event'|'sequence', ...}."""
    toks = _tokenize(query)
    p = _P(toks)
    head, pipes = p, []
    # split off trailing "| head N" / "| tail N" pipes
    for j, (_, v) in enumerate(toks):
        if v == "|":
            p = _P(toks[:j])
            q = _P(toks[j:])
            while q.peek()[1] == "|":
                q.next()
                _, name = q.next()
                if name.lower() not in ("head", "tail"):
                    raise ValueError(
                        f"EQL: pipe {name!r} is not implemented "
                        "(head/tail only)")
                n = _lit(q.next())
                pipes.append((name.lower(), int(n)))
            break
    first = p.peek()
    if first[1].lower() == "sequence":
        p.next()
        by, maxspan = [], None
        while True:
            t = p.peek()
            if t[1].lower() == "by":
                p.next()
                by.append(p.next()[1])
                while p.peek()[1] == ",":
                    p.next()
                    by.append(p.next()[1])
            elif t[1].lower() == "with":
                p.next()
                key = p.next()[1].lower()
                if key != "maxspan":
                    raise ValueError(
                        f"EQL: `with {key}` is not implemented "
                        "(maxspan only; `with runs` rejected)")
                p.expect("=")
                num = p.next()[1]
                unit = p.next()[1]
                maxspan = _parse_maxspan(num + unit)
            elif t[1] == "[":
                break
            elif t[1].lower() == "until":
                raise ValueError("EQL: `until` is not implemented")
            else:
                raise ValueError(f"EQL: unexpected {t[1]!r} in sequence "
                                 "header")
        steps = []
        while p.peek()[1] == "[":
            p.next()
            cat = p.next()[1]
            p.expect("where")
            depth, j0 = 1, p.i
            while depth:
                t = p.next()
                if t[1] == "[":
                    depth += 1
                elif t[1] == "]":
                    depth -= 1
            cond_toks = p.toks[j0:p.i - 1]
            steps.append((cat, cond_toks))
            if p.peek()[1].lower() == "by":
                raise ValueError(
                    "EQL: per-step `by` overrides are not implemented "
                    "(use the sequence-level by)")
        if p.peek()[1].lower() == "until":
            raise ValueError("EQL: `until` is not implemented")
        if len(steps) < 2:
            raise ValueError("EQL: a sequence needs at least two steps")
        if not by:
            raise ValueError(
                "EQL: sequences without a `by` join key are not "
                "implemented (every partial would share one global "
                "stream)")
        for _, cond_toks in steps:
            if cond_toks:
                _parse_condition(_P(list(cond_toks)), build=False)
        return {"kind": "sequence", "by": by, "maxspan_s": maxspan,
                "steps": steps, "pipes": pipes}
    # plain event query
    cat = p.next()[1]
    p.expect("where")
    cond_toks = p.toks[p.i:]
    if cond_toks:
        _parse_condition(_P(list(cond_toks)), build=False)
    return {"kind": "event", "category": cat, "cond_toks": cond_toks,
            "pipes": pipes}


def eql_search(df: DataFrame, query: str, *,
               timestamp_field: str = "ts",
               event_category_field: str = "event_type",
               tiebreaker_field: str = "event_id",
               size: int = 100) -> DataFrame:
    """Run one EQL query against an event DataFrame.

    Event queries return the matching events in stream order
    (timestamp, then the tiebreaker - ES's ordering). Sequence
    queries return ONE ROW PER MATCHED SEQUENCE carrying the join
    keys plus each step's event id and timestamp (``e1_id``,
    ``e1_ts`` ...), ordered by the first step's position in the
    stream. See the module header for the matcher's deterministic
    reference semantics and its documented divergence from ES's
    consuming state machine."""
    spec = parse_eql(query)
    ts, tb = timestamp_field, tiebreaker_field

    def _step_filter(cat: str, cond_toks) -> DataFrame:
        out = df
        if cat.lower() != "any":
            out = out.filter(F.col(event_category_field) == cat)
        if cond_toks:
            out = out.filter(_parse_condition(_P(list(cond_toks))))
        return out

    def _pipe(out: DataFrame, order_cols) -> DataFrame:
        for name, n in spec["pipes"]:
            if name == "head":
                out = out.orderBy(*[F.col(c).asc() for c in order_cols]) \
                         .limit(n)
            else:
                out = out.orderBy(*[F.col(c).desc() for c in order_cols]) \
                         .limit(n)
        return out.orderBy(*[F.col(c).asc() for c in order_cols])

    if spec["kind"] == "event":
        out = _step_filter(spec["category"], spec["cond_toks"])
        out = out.orderBy(F.col(ts).asc(), F.col(tb).asc()).limit(size)
        return _pipe(out, [ts, tb])

    by = spec["by"]
    steps = spec["steps"]
    cur = _step_filter(*steps[0]).select(
        *by,
        F.col(ts).alias("e1_ts"), F.col(tb).alias("e1_id"))
    for k, (cat, cond_toks) in enumerate(steps[1:], start=2):
        nxt = _step_filter(cat, cond_toks).select(
            *by, F.col(ts).alias("__nts"), F.col(tb).alias("__nid"))
        left = cur.withColumn("__is_left", F.lit(True)) \
                  .withColumn("__nts", F.col(f"e{k-1}_ts")) \
                  .withColumn("__nid", F.col(f"e{k-1}_id"))
        right = nxt.withColumn("__is_left", F.lit(False))
        for c in left.columns:
            if c not in right.columns:
                right = right.withColumn(c, F.lit(None))
        combined = left.unionByName(right.select(*left.columns))
        # forward-earliest continuation: per join key, the first
        # step-k event STRICTLY after this row in (ts, id) order -
        # ES's timestamp-then-tiebreaker. At an identical (ts, id)
        # the right copy sorts BEFORE the left marker (is_left
        # ascending), so an event can never continue itself when two
        # steps share a category.
        w = (Window.partitionBy(*by)
             .orderBy(F.col("__nts").asc(), F.col("__nid").asc(),
                      F.col("__is_left").asc())
             .rowsBetween(1, Window.unboundedFollowing))
        nxt_struct = F.first(
            F.when(~F.col("__is_left"),
                   F.struct(F.col("__nts").alias("t"),
                            F.col("__nid").alias("i"))),
            ignorenulls=True).over(w)
        cur = (combined
               .withColumn("__next", nxt_struct)
               .filter(F.col("__is_left") & F.col("__next").isNotNull())
               .withColumn(f"e{k}_ts", F.col("__next.t"))
               .withColumn(f"e{k}_id", F.col("__next.i"))
               .drop("__is_left", "__nts", "__nid", "__next"))
        if spec["maxspan_s"] is not None:
            cur = cur.filter(
                F.col(f"e{k}_ts").cast("double")
                - F.col("e1_ts").cast("double") <= spec["maxspan_s"])
    out_cols = list(by)
    for k in range(1, len(steps) + 1):
        out_cols += [f"e{k}_id", f"e{k}_ts"]
    out = cur.select(*out_cols) \
             .orderBy(F.col("e1_ts").asc(), F.col("e1_id").asc()) \
             .limit(size)
    return _pipe(out, ["e1_ts", "e1_id"])


# -- registered, oracle-verified queries ------------------------------------

from cassandra_elasticsearch_sync_spark.catalog import load_table  # noqa: E402,E501
from cassandra_elasticsearch_sync_spark.parity import fmt_ts  # noqa: E402
from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402


@register("a3el_es_eql_event", "A3+B3", """
SELECT event_id, user_id, event_type, value,
       STRFTIME(DATE_TRUNC('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s
FROM events
WHERE event_type = 'error' AND (value > 90.0 OR user_id IN (3, 7))
ORDER BY ts, event_id
LIMIT 25
""", "EQL event query (eql_search): `error where value > 90.0 or "
     "user_id in (3, 7) | head 25` - the single-event form of "
     "Elastic's security query language, with the boolean grammar "
     "(and/or/not, in-lists, comparisons) compiled onto the one "
     "scan and results in ES's stream order (timestamp then the "
     "tiebreaker id). The filter pushes to parquet like any "
     "predicate; head/tail pipes are total-ordered limits.")
def a3el_es_eql_event(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = eql_search(
        ev, 'error where value > 90.0 or user_id in (3, 7) | head 25')
    return out.select("event_id", "user_id", "event_type", "value",
                      fmt_ts("ts").alias("ts_s"))


@register("a3em_es_eql_sequence", "A3+E2+C8", """
WITH s1 AS (
  SELECT user_id, ts AS e1_ts, event_id AS e1_id
  FROM events WHERE event_type = 'view' AND value > 15.0
), s2 AS (
  SELECT s1.*, n2.e2_ts, n2.e2_id
  FROM s1, LATERAL (
    SELECT e.ts AS e2_ts, e.event_id AS e2_id
    FROM events e
    WHERE e.user_id = s1.user_id AND e.event_type = 'click'
      AND (e.ts > s1.e1_ts OR (e.ts = s1.e1_ts
                               AND e.event_id > s1.e1_id))
    ORDER BY e.ts, e.event_id LIMIT 1
  ) n2
  WHERE EPOCH(n2.e2_ts) - EPOCH(s1.e1_ts) <= 259200
), s3 AS (
  SELECT s2.*, n3.e3_ts, n3.e3_id
  FROM s2, LATERAL (
    SELECT e.ts AS e3_ts, e.event_id AS e3_id
    FROM events e
    WHERE e.user_id = s2.user_id AND e.event_type = 'purchase'
      AND (e.ts > s2.e2_ts OR (e.ts = s2.e2_ts
                               AND e.event_id > s2.e2_id))
    ORDER BY e.ts, e.event_id LIMIT 1
  ) n3
  WHERE EPOCH(n3.e3_ts) - EPOCH(s2.e1_ts) <= 259200
)
SELECT user_id, e1_id,
       STRFTIME(DATE_TRUNC('second', e1_ts), '%Y-%m-%d %H:%M:%S')
         AS e1_ts_s,
       e2_id,
       STRFTIME(DATE_TRUNC('second', e2_ts), '%Y-%m-%d %H:%M:%S')
         AS e2_ts_s,
       e3_id,
       STRFTIME(DATE_TRUNC('second', e3_ts), '%Y-%m-%d %H:%M:%S')
         AS e3_ts_s
FROM s3
ORDER BY e1_ts, e1_id
LIMIT 100
""", "EQL sequence query (eql_search): `sequence by user_id with "
     "maxspan=3d [view where value > 15.0] [click where true] "
     "[purchase where true]` - the three-step per-user funnel every "
     "security/product team writes in EQL. Each step is ONE union + "
     "ONE key-partitioned window (forward-earliest continuation via "
     "first-over-following-frame in (ts, id) order - ES's "
     "timestamp-then-tiebreaker), maxspan anchored at the FIRST "
     "step per ES's rule; the oracle derives the same chains "
     "independently with LATERAL earliest-continuation subqueries. "
     "No unpartitioned window, no cross join; per-key cardinality "
     "bounds every frame, and the stream hash-partitions by the "
     "join key at any scale. The consuming-state-machine divergence "
     "is documented in the module header.")
def a3em_es_eql_sequence(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = eql_search(
        ev, "sequence by user_id with maxspan=3d "
            "[view where value > 15.0] [click where true] "
            "[purchase where true]")
    return out.select(
        "user_id", "e1_id", fmt_ts("e1_ts").alias("e1_ts_s"),
        "e2_id", fmt_ts("e2_ts").alias("e2_ts_s"),
        "e3_id", fmt_ts("e3_ts").alias("e3_ts_s"))
