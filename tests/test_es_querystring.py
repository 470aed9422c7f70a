"""query_string / simple_query_string parser: Lucene precedence,
modifier combine rules, field syntax, and strict rejection of what ES
rejects. The parser emits plain query-DSL dicts, so tree-shape tests
pin the lowering and tiny-corpus tests pin the compiled semantics."""

from __future__ import annotations

import pytest

from cassandra_elasticsearch_sync_spark.sources.es_query import es_search
from cassandra_elasticsearch_sync_spark.sources.es_querystring import (
    query_string_to_dsl,
    simple_query_string_to_dsl,
)


def test_precedence_not_and_or():
    """NOT > AND > OR: 'a OR b AND NOT c' == a OR (b AND (NOT c))."""
    d = query_string_to_dsl("a OR b AND NOT c", ["t"])
    assert d == {"bool": {"should": [
        {"match": {"t": "a"}},
        {"bool": {"must": [
            {"match": {"t": "b"}},
            {"bool": {"must_not": [{"match": {"t": "c"}}]}},
        ]}},
    ]}}


def test_field_term_phrase_group_and_wildcards():
    assert query_string_to_dsl("status:open", ["t"]) == \
        {"match": {"status": "open"}}
    assert query_string_to_dsl('name:"ada lovelace"', ["t"]) == \
        {"match_phrase": {"name": "ada lovelace"}}
    # field-scoped group re-binds the default fields inside the parens
    d = query_string_to_dsl("tag:(a OR b)", ["t"])
    assert d == {"bool": {"should": [{"match": {"tag": "a"}},
                                     {"match": {"tag": "b"}}]}}
    # trailing-* lowers to prefix; ?/inner-* stay wildcard
    assert query_string_to_dsl("pri:5*", ["t"]) == {"prefix": {"pri": "5"}}
    assert query_string_to_dsl("pri:5?LOW", ["t"]) == \
        {"wildcard": {"pri": "5?LOW"}}
    assert query_string_to_dsl("pri:*LOW", ["t"]) == \
        {"wildcard": {"pri": "*LOW"}}


def test_lucene_modifier_combine():
    """'a -b' (default OR) is a AND NOT b - Lucene's BooleanQuery rule
    that prohibited clauses always constrain; '+b a' makes b required
    and the bare should optional (dropped in filter context)."""
    d = query_string_to_dsl("a -b", ["t"])
    assert d == {"bool": {
        "must_not": [{"match": {"t": "b"}}],
        "must": [{"bool": {"should": [{"match": {"t": "a"}}]}}],
    }}
    d2 = query_string_to_dsl("+b a", ["t"])
    assert d2 == {"bool": {"must": [{"match": {"t": "b"}}]}}
    # lone negation
    assert query_string_to_dsl("-a", ["t"]) == \
        {"bool": {"must_not": [{"match": {"t": "a"}}]}}


def test_default_operator_and_multifield():
    assert query_string_to_dsl("a b", ["t"], "and") == \
        {"bool": {"must": [{"match": {"t": "a"}}, {"match": {"t": "b"}}]}}
    assert query_string_to_dsl("a b", ["t"], "or") == \
        {"bool": {"should": [{"match": {"t": "a"}}, {"match": {"t": "b"}}]}}
    # two default fields -> per-field should for a bare term
    assert query_string_to_dsl("x", ["t", "u"]) == \
        {"bool": {"should": [{"match": {"t": "x"}}, {"match": {"u": "x"}}]}}


def test_simple_syntax_operators():
    """simple_query_string: + is AND, | is OR, leading - is NOT,
    ':' is a literal character (field syntax is query_string-only)."""
    d = simple_query_string_to_dsl("this + (that | thus)", ["t"])
    assert d == {"bool": {"must": [
        {"match": {"t": "this"}},
        {"bool": {"should": [{"match": {"t": "that"}},
                             {"match": {"t": "thus"}}]}},
    ]}}
    d2 = simple_query_string_to_dsl("quick brown -fox", ["t"])
    assert d2 == {"bool": {
        "must_not": [{"match": {"t": "fox"}}],
        "must": [{"bool": {"should": [{"match": {"t": "quick"}},
                                      {"match": {"t": "brown"}}]}}],
    }}
    # ':' is literal text, never a field separator
    assert simple_query_string_to_dsl("a:b", ["t"]) == {"match": {"t": "a:b"}}


def test_simple_minimum_should_match_rules():
    d = simple_query_string_to_dsl("a | b | c", ["t"],
                                   minimum_should_match=2)
    assert d["bool"]["minimum_should_match"] == 2
    # msm is ignored once required clauses exist, as in ES
    d2 = simple_query_string_to_dsl("a + b", ["t"],
                                    minimum_should_match=2)
    assert "minimum_should_match" not in str(d2)


def test_minimum_should_match_compiled_semantics(spark):
    rows = [("vector stream x",), ("vector y",), ("stream merge join",),
            ("merge join vector",), (None,)]
    df = spark.createDataFrame(rows, "text string")
    got = sorted(r["text"] for r in es_search(df, {"simple_query_string": {
        "query": 'vector | "merge join" | stream',
        "fields": ["text"], "minimum_should_match": 2,
    }}).collect())
    assert got == ["merge join vector", "stream merge join",
                   "vector stream x"]


def test_query_string_compiled_semantics(spark):
    rows = [(1, "open", "alpha beta"), (2, "closed", "beta gamma"),
            (3, "open", "gamma delta"), (4, "open", None)]
    df = spark.createDataFrame(rows, "id long, status string, body string")
    got = sorted(r["id"] for r in es_search(df, {"query_string": {
        "query": "status:open AND NOT body:gamma*",
        "fields": ["body"],
    }}).collect())
    # id=3 excluded (gamma-prefixed body); id=4's NULL body is not
    # gamma-prefixed, so NOT keeps it? NULL startswith -> NULL -> the
    # negation is NULL -> filtered: id=4 drops, matching SQL 3VL.
    assert got == [1]
    got2 = sorted(r["id"] for r in es_search(df, {"query_string": {
        "query": "beta -delta", "fields": ["body"],
    }}).collect())
    assert got2 == [1, 2]


def test_rejections_match_es():
    with pytest.raises(ValueError, match="unbalanced quote"):
        query_string_to_dsl('"open phrase', ["t"])
    with pytest.raises(ValueError, match="unbalanced"):
        query_string_to_dsl("(a OR b", ["t"])
    with pytest.raises(ValueError, match="unexpected token"):
        query_string_to_dsl("a ) b", ["t"])
    with pytest.raises(ValueError, match="unexpected end"):
        query_string_to_dsl("a AND", ["t"])
    with pytest.raises(ValueError, match="malformed field:term"):
        query_string_to_dsl("field:", ["t"])
    with pytest.raises(ValueError, match="empty field"):
        query_string_to_dsl(':"phrase"', ["t"])
    with pytest.raises(ValueError, match="default fields"):
        query_string_to_dsl("bare", [])
    with pytest.raises(ValueError, match="default_operator"):
        query_string_to_dsl("a", ["t"], "xor")
    # empty query = match_all, as ES's lenient empty-box behavior
    assert query_string_to_dsl("   ", ["t"]) == {"match_all": {}}
    assert simple_query_string_to_dsl("", ["t"]) == {"match_all": {}}
