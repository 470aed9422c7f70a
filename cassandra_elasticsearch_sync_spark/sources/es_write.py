"""ES write-by-query APIs: ``_update_by_query`` and ``_delete_by_query``.

The two most-used named WRITE APIs an Elasticsearch operator calls:
bulk mutation guarded by a query-DSL predicate. ES implements them as
a scroll-plus-bulk loop (snapshot the matching doc set, then re-index
or delete each doc, counting per-document version conflicts). The
Spark-first equivalent composes two pieces this engine already proves
independently:

- the query DSL compiler (``es_query.compile_query``) supplies the
  predicate as ONE Catalyst Column - every leaf the read path supports
  (bool/term/range/match/prefix/span/...) works verbatim as a write
  guard, and

- the ACID table's copy-on-write mutation path
  (``acid.AcidParquetTable.update_where`` / ``delete_where``) supplies
  the transactional apply: an ``input_file_name`` probe finds the
  affected data files, ONLY those files rewrite, and the commit is one
  atomic manifest swap. A predicate touching 1% of a 100 TB table
  rewrites 1% of it - strictly better than ES's per-document
  re-index loop, which always pays O(matched docs) network round
  trips.

Conflict semantics: ES's default ``conflicts=abort`` stops the whole
operation on the first version conflict; here the optimistic commit
(``CommitConflict`` on a concurrent writer) aborts the WHOLE commit
atomically - no partial application is possible, which is abort
semantics with a stronger guarantee (ES may have already applied
earlier batches when it aborts). ``conflicts=proceed`` counts
per-document conflicts and keeps going; that needs per-document
version bookkeeping this store does not keep, so it is rejected
loudly, never approximated. ``max_docs`` is rejected loudly too: ES
applies it in scroll order, which is shard-iteration-dependent and
therefore not reproducible by ANY deterministic engine.

Update scripts are the bounded Painless subset the scripted_metric
parser (``es_scripted_metric``) already lowers - sequential
``ctx._source.<field> = <expr>`` assignments (also ``+=`` / ``-=``)
over doc-field references, literals, arithmetic, comparisons, and the
ternary. Sequential Painless semantics are FOLDED at compile time:
each statement's RHS resolves earlier assignments' expressions
inline, so the final per-column expressions are all in terms of the
ORIGINAL row and apply as one simultaneous SELECT (SQL UPDATE
semantics; ``update_where``'s contract).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable
from cassandra_elasticsearch_sync_spark.sources.es_query import compile_query
from cassandra_elasticsearch_sync_spark.sources.es_scripted_metric import (
    PainlessError,
    _Parser,
    _tokenize,
)


class EsWriteError(ValueError):
    """An unsupported or ill-defined write-by-query construct."""


_CTX_SOURCE_RE = re.compile(r"ctx\._source\.(\w+)")
_STRINGS_RE = re.compile(r"'[^']*'|\"[^\"]*\"")


def compile_update_script(script: str,
                          columns: list[str]) -> dict[str, Column]:
    """Compile a ``_update_by_query`` Painless script to per-column
    Catalyst expressions over the ORIGINAL row.

    Grammar: ``stmt (';' stmt)* ';'?`` where
    ``stmt := ctx._source.<field> ('=' | '+=' | '-=') <expr>`` and
    ``<expr>`` is the scripted_metric expression subset (doc-field
    refs via ``ctx._source.<f>``, literals, + - * / %, comparisons,
    && ||, ternary). Painless executes statements sequentially; that
    is preserved by FOLDING: a later RHS referencing an
    earlier-assigned field resolves to that assignment's expression
    inline, so the returned dict applies simultaneously (exactly
    ``AcidParquetTable.update_where``'s SQL-UPDATE contract).

    Rejected loudly: references to anything but ``ctx._source.<f>``
    (``ctx.op`` no-op routing, ``ctx._now``, ``params`` need
    machinery this subset does not model), assignments to fields not
    in ``columns`` (ES would create the field; here that is schema
    evolution - ``add_columns`` first), and any construct the
    expression parser does not know.
    """
    rewritten = _CTX_SOURCE_RE.sub(
        lambda m: f"doc['{m.group(1)}'].value", script)
    # any ctx.* left after the _source rewrite is an unsupported
    # context reference (ctx.op / ctx._id / ctx._now); check outside
    # string literals only
    if re.search(r"\bctx\b", _STRINGS_RE.sub("", rewritten)):
        raise EsWriteError(
            "only ctx._source.<field> references are supported "
            "(ctx.op / ctx._id / ctx._now routing is not modeled)")
    if re.search(r"\bparams\b", _STRINGS_RE.sub("", rewritten)):
        raise EsWriteError(
            "params are not supported; inline the values into the "
            "script")
    try:
        toks = _tokenize(rewritten)
    except PainlessError as e:
        raise EsWriteError(str(e)) from e

    # split the token stream on ';' (tokenizing first keeps literal
    # semicolons inside strings intact)
    stmts: list[list] = []
    cur: list = []
    for t in toks:
        if t == ("op", ";"):
            if cur:
                stmts.append(cur)
                cur = []
        else:
            cur.append(t)
    if cur:
        stmts.append(cur)
    if not stmts:
        raise EsWriteError("empty update script")

    env: dict[str, Column] = {}

    def resolve(ref):
        kind, name = ref
        if kind == "doc":
            if name not in columns:
                raise EsWriteError(
                    f"unknown _source field {name!r}; table columns "
                    f"are {sorted(columns)}")
            return env.get(name, F.col(name))
        raise EsWriteError(
            f"unsupported reference {name!r} (doc-field references "
            "and literals only)")

    for st in stmts:
        if (len(st) < 3 or st[0][0] != "docref" or st[1][0] != "op"
                or st[1][1] not in ("=", "+=", "-=")):
            raise EsWriteError(
                "each statement must be ctx._source.<field> = <expr> "
                "(or += / -=)")
        field = st[0][1]
        op = st[1][1]
        if field not in columns:
            raise EsWriteError(
                f"cannot create new _source field {field!r}; evolve "
                "the schema first (AcidParquetTable.add_columns)")
        p = _Parser(st[2:], resolve)
        try:
            rhs = p.expr()
        except PainlessError as e:
            raise EsWriteError(str(e)) from e
        if not p.at_end():
            raise EsWriteError(
                f"trailing tokens after the {field!r} assignment")
        prev = env.get(field, F.col(field))
        env[field] = (rhs if op == "="
                      else prev + rhs if op == "+="
                      else prev - rhs)
    return env


def _check_write_params(conflicts: str, max_docs) -> None:
    if conflicts != "abort":
        raise EsWriteError(
            f"conflicts={conflicts!r} is not supported: "
            "conflicts=proceed counts per-document version conflicts, "
            "which needs per-document version bookkeeping this store "
            "does not keep; the atomic commit gives abort semantics "
            "(CommitConflict) with no partial application")
    if max_docs is not None:
        raise EsWriteError(
            "max_docs applies in ES scroll order, which is "
            "shard-iteration-dependent and not deterministically "
            "reproducible; filter the query instead")


def es_update_by_query(table: AcidParquetTable, query: dict, *,
                       script: str, conflicts: str = "abort",
                       max_docs: int | None = None) -> dict:
    """ES ``POST index/_update_by_query``: apply ``script`` to every
    document matching the DSL ``query``, as ONE copy-on-write ACID
    commit (module docstring). Returns the ES response counters:
    ``{"total": n, "updated": n, "deleted": 0, "version_conflicts": 0,
    "noops": 0}`` - the matched count is ES's snapshot count, one
    count job over the same predicate (exactly what ES's initial
    scroll pays)."""
    _check_write_params(conflicts, max_docs)
    cond = compile_query(query)
    snapshot = table.read()
    assignments = compile_update_script(script, snapshot.columns)
    total = snapshot.filter(F.coalesce(cond, F.lit(False))).count()
    table.update_where(cond, assignments)
    return {"total": total, "updated": total, "deleted": 0,
            "version_conflicts": 0, "noops": 0}


def es_delete_by_query(table: AcidParquetTable, query: dict, *,
                       conflicts: str = "abort",
                       max_docs: int | None = None) -> dict:
    """ES ``POST index/_delete_by_query``: delete every document
    matching the DSL ``query`` as ONE copy-on-write ACID commit
    (module docstring). NULL predicate results keep the row
    (``delete_where``'s SQL contract - identical to ES, where a doc a
    query does not match is not deleted). Returns the ES response
    counters."""
    _check_write_params(conflicts, max_docs)
    cond = compile_query(query)
    total = table.read().filter(F.coalesce(cond, F.lit(False))).count()
    table.delete_where(cond)
    return {"total": total, "updated": 0, "deleted": total,
            "version_conflicts": 0, "noops": 0}


# ---------------------------------------------------------------------------
# Registered, oracle-verified queries (the user-facing proof)
# ---------------------------------------------------------------------------

from cassandra_elasticsearch_sync_spark.catalog import load_table  # noqa: E402
from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402

_UBQ_PRED_SQL = "o_orderstatus = 'F' AND o_totalprice >= 150000.0"


@register("a3dy_es_update_by_query", "A3+A7", f"""
SELECT o_orderkey AS key, o_orderstatus AS status,
       CASE WHEN {_UBQ_PRED_SQL}
            THEN o_totalprice - o_totalprice * 0.1
            ELSE o_totalprice END AS price,
       CASE WHEN {_UBQ_PRED_SQL}
            THEN o_totalprice * 0.1 ELSE 0.0 END AS discount
FROM orders
""", "ES _update_by_query end-to-end (sources/es_write.py): orders "
     "commit to the ACID store as two key-range entries, then a DSL "
     "bool query (term status:'F' AND range price>=150000) guards a "
     "two-statement Painless script - 'ctx._source.discount = "
     "ctx._source.price * 0.1; ctx._source.price = ctx._source.price "
     "- ctx._source.discount;'. The hash proves SEQUENTIAL Painless "
     "semantics (the second statement reads the first's result) "
     "folded into simultaneous SQL-UPDATE expressions over the "
     "original row, applied as ONE copy-on-write commit that "
     "rewrites only DSL-affected files (the query asserts the "
     "predicate-free entry carried over byte-for-byte, the l18 "
     "discipline). All arithmetic is two shared-literal IEEE ops, "
     "bit-identical in both engines.")
def a3dy_es_update_by_query(spark, sf_dir):
    import shutil
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.lit(0.0).alias("discount"))
    root = tempfile.mkdtemp(prefix="ces_es_ubq_")
    try:
        t = AcidParquetTable(spark, root)
        # two entries split so that one provably holds NO status='F'
        # rows (status 'O' only) - the CoW prune assertion below
        t.init(o.filter(F.col("status") == "O"))
        t.merge_into(o.filter(F.col("status") != "O"), ["key"])
        before = set(t._manifest(t.current_version())["files"])
        resp = es_update_by_query(
            t,
            {"bool": {"must": [
                {"term": {"status": "F"}},
                {"range": {"price": {"gte": 150000.0}}},
            ]}},
            script="ctx._source.discount = ctx._source.price * 0.1; "
                   "ctx._source.price = ctx._source.price "
                   "- ctx._source.discount;")
        after = set(t._manifest(t.current_version())["files"])
        if not (before & after):
            raise AssertionError("CoW update rewrote the 'O'-only entry")
        if resp["updated"] == 0 or resp["updated"] != resp["total"]:
            raise AssertionError(f"unexpected response {resp}")
        return (t.read().select("key", "status", "price", "discount")
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("a3dz_es_delete_by_query", "A3+A7", """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE NOT ((list_contains(string_split(lower(text), ' '), 'merge')
            OR list_contains(string_split(lower(text), ' '), 'batch'))
           AND lang <> 'zh')
""", "ES _delete_by_query end-to-end (sources/es_write.py): the "
     "documents corpus commits to the ACID store, then a DSL bool "
     "query - match text:'merge batch' (whitespace-analyzer OR over "
     "tokens) AND must_not term lang:'zh' - deletes every match as "
     "ONE copy-on-write commit. The response counters are asserted "
     "against the post-state row delta (ES's 'deleted' count), and "
     "the surviving table hash-matches the NOT(predicate) oracle - "
     "the full read-path DSL compiler reused verbatim as a write "
     "guard. conflicts=proceed and max_docs are rejected loudly "
     "(module docstring).")
def a3dz_es_delete_by_query(spark, sf_dir):
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="ces_es_dbq_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(d)
        n0 = t.read().count()
        resp = es_delete_by_query(t, {"bool": {
            "must": [{"match": {"text": "merge batch"}}],
            "must_not": [{"term": {"lang": "zh"}}],
        }})
        n1 = t.read().count()
        if resp["deleted"] != n0 - n1 or resp["deleted"] == 0:
            raise AssertionError(
                f"deleted counter {resp['deleted']} != row delta "
                f"{n0 - n1}")
        return (t.read().select("doc_id", "lang", "source", "n_chars")
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(root, ignore_errors=True)
