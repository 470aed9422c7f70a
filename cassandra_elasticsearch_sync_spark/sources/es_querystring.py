"""ES ``query_string`` / ``simple_query_string`` -> query-DSL lowering.

The Lucene-syntax text box behind every Kibana search bar. Both
parsers produce an ordinary query-DSL dict (bool/match/match_phrase/
prefix/wildcard), so compilation, pushdown, and oracle parity all ride
the existing ``compile_query`` combinators - the parser adds zero new
execution machinery.

Supported surface (the subset real dashboards use):

``query_string``
  uppercase ``AND`` / ``OR`` / ``NOT`` with Lucene precedence
  (NOT > AND > OR), parentheses, ``field:term``, ``field:"a phrase"``,
  field-scoped groups ``field:(a OR b)``, quoted phrases, ``*``/``?``
  wildcards (trailing-``*``-only lowers to ``prefix``), leading ``+``
  (required) / ``-`` (prohibited) clause modifiers with Lucene's
  BooleanQuery combine (required+prohibited win over optional),
  ``default_operator`` for bare adjacency. Malformed input raises -
  ES's query_string is strict, and so is this one.

``simple_query_string``
  ``+`` (AND), ``|`` (OR), leading ``-`` (NOT), quoted phrases,
  trailing ``*`` prefix, parentheses, ``default_operator`` adjacency,
  ``minimum_should_match`` over the top-level optional clauses. ``:``
  is a literal character (field syntax is query_string-only, as in
  ES); per ES semantics the operator characters never name fields.

Scoring note: both queries compile to FILTER context (this engine
compiles predicates, not BM25 scores) - the same trade documented for
``match`` and ``bool``.
"""

from __future__ import annotations

# token kinds: ("LP",) ("RP",) ("AND",) ("OR",) ("NOT",)
# ("MOD", "+"|"-") ("TERM", field|None, value, quoted: bool)

_QS_RESERVED = {"AND": ("AND",), "OR": ("OR",), "NOT": ("NOT",),
                "&&": ("AND",), "||": ("OR",)}


def _read_quoted(text: str, i: int) -> tuple[str, int]:
    """Read a double-quoted phrase starting at text[i] == '"'."""
    j = text.find('"', i + 1)
    if j < 0:
        raise ValueError(f"unbalanced quote at offset {i}: {text!r}")
    return text[i + 1:j], j + 1


def _tokenize_query_string(text: str) -> list[tuple]:
    toks: list[tuple] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch in "()":
            toks.append(("LP",) if ch == "(" else ("RP",))
            i += 1
            continue
        if ch in "+-" and i + 1 < n and not text[i + 1].isspace() \
                and text[i + 1] not in ")":
            toks.append(("MOD", ch))
            i += 1
            continue
        if ch == '"':
            phrase, i = _read_quoted(text, i)
            toks.append(("TERM", None, phrase, True))
            continue
        # a word: runs to whitespace/paren/quote; a ':' splits off a
        # field name, whose value may itself be a quote or a group
        j = i
        while j < n and not text[j].isspace() and text[j] not in '()"':
            j += 1
        word = text[i:j]
        i = j
        if word in _QS_RESERVED:
            toks.append(_QS_RESERVED[word])
            continue
        if word.endswith(":") and i < n and text[i] in '("':
            field = word[:-1]
            if not field:
                raise ValueError(f"empty field name before ':' in {text!r}")
            if text[i] == '"':
                phrase, i = _read_quoted(text, i)
                toks.append(("TERM", field, phrase, True))
            else:  # field-scoped group: field:(a OR b)
                toks.append(("FIELD_LP", field))
                i += 1
            continue
        if ":" in word:
            field, value = word.split(":", 1)
            if not field or not value:
                raise ValueError(f"malformed field:term {word!r}")
            toks.append(("TERM", field, value, False))
        elif word:
            toks.append(("TERM", None, word, False))
    return toks


def _tokenize_simple(text: str) -> list[tuple]:
    toks: list[tuple] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "(":
            toks.append(("LP",))
            i += 1
            continue
        if ch == ")":
            toks.append(("RP",))
            i += 1
            continue
        if ch == "+":
            toks.append(("AND",))
            i += 1
            continue
        if ch == "|":
            toks.append(("OR",))
            i += 1
            continue
        if ch == "-" and i + 1 < n and not text[i + 1].isspace():
            toks.append(("MOD", "-"))
            i += 1
            continue
        if ch == '"':
            phrase, i = _read_quoted(text, i)
            toks.append(("TERM", None, phrase, True))
            continue
        j = i
        while j < n and not text[j].isspace() and text[j] not in '()+|"':
            j += 1
        if j > i:
            toks.append(("TERM", None, text[i:j], False))
        i = j
    return toks


def _leaf(field: str | None, value: str, quoted: bool,
          default_fields: list[str]) -> dict:
    """One term -> a query-DSL leaf over the effective field list."""
    fields = [field] if field else list(default_fields)
    if not fields:
        raise ValueError("query_string needs default fields for an "
                         f"unfielded term {value!r}")
    if quoted:
        per = [{"match_phrase": {f: value}} for f in fields]
    elif "*" in value or "?" in value:
        # trailing-*-only is ES's prefix fast path; anything else is
        # the general wildcard. Both are term-level (whole-value)
        # matches - the keyword-field semantics this engine's
        # prefix/wildcard combinators implement.
        if value.endswith("*") and "?" not in value \
                and "*" not in value[:-1]:
            per = [{"prefix": {f: value[:-1]}} for f in fields]
        else:
            per = [{"wildcard": {f: value}} for f in fields]
    else:
        per = [{"match": {f: value}} for f in fields]
    return per[0] if len(per) == 1 else {"bool": {"should": per}}


class _Parser:
    """Recursive descent with Lucene precedence: NOT > AND > OR.
    Bare adjacency joins at the default_operator's level. Leading
    +/- modifiers ride up to the nearest OR combine, which applies
    Lucene's BooleanQuery rules: required/prohibited clauses win,
    optional clauses only constrain when nothing is required."""

    def __init__(self, toks: list[tuple], default_fields: list[str],
                 default_operator: str):
        if default_operator not in ("or", "and"):
            raise ValueError("default_operator must be 'or' or 'and', "
                             f"got {default_operator!r}")
        self.toks = toks
        self.pos = 0
        self.fields = default_fields
        self.op = default_operator

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def _starts_primary(self, t) -> bool:
        return t is not None and t[0] in ("TERM", "LP", "FIELD_LP",
                                          "NOT", "MOD")

    def parse(self) -> dict:
        out = self.parse_or(self.fields)
        if self.peek() is not None:
            raise ValueError(f"unexpected token {self.peek()!r}")
        return out

    def parse_or(self, fields) -> dict:
        items = [self.parse_and(fields)]
        while True:
            t = self.peek()
            if t is not None and t[0] == "OR":
                self.next()
                items.append(self.parse_and(fields))
            elif self.op == "or" and self._starts_primary(t):
                items.append(self.parse_and(fields))
            else:
                break
        if len(items) == 1:
            mod, d = items[0]
            if mod == "-":
                return {"bool": {"must_not": [d]}}
            return d
        shoulds = [d for m, d in items if m is None]
        musts = [d for m, d in items if m == "+"]
        nots = [d for m, d in items if m == "-"]
        body: dict = {}
        if musts:
            body["must"] = musts
        if nots:
            body["must_not"] = nots
        if shoulds:
            if musts:
                # Lucene: optional clauses don't constrain once a
                # required clause exists (filter context)
                pass
            elif nots:
                body["must"] = [{"bool": {"should": shoulds}}]
            else:
                body["should"] = shoulds
        return {"bool": body}

    def parse_and(self, fields) -> tuple[str | None, dict]:
        items = [self.parse_unary(fields)]
        while True:
            t = self.peek()
            if t is not None and t[0] == "AND":
                self.next()
                items.append(self.parse_unary(fields))
            elif self.op == "and" and self._starts_primary(t):
                items.append(self.parse_unary(fields))
            else:
                break
        if len(items) == 1:
            return items[0]
        parts = [({"bool": {"must_not": [d]}} if m == "-" else d)
                 for m, d in items]
        return None, {"bool": {"must": parts}}

    def parse_unary(self, fields) -> tuple[str | None, dict]:
        t = self.peek()
        if t is not None and t[0] == "NOT":
            self.next()
            m, d = self.parse_unary(fields)
            inner = {"bool": {"must_not": [d]}} if m == "-" else d
            return None, {"bool": {"must_not": [inner]}}
        mod = None
        if t is not None and t[0] == "MOD":
            mod = self.next()[1]
        return mod, self.parse_primary(fields)

    def parse_primary(self, fields) -> dict:
        t = self.next()
        if t is None:
            raise ValueError("unexpected end of query string")
        if t[0] == "LP":
            d = self.parse_or(fields)
            if self.peek() is None or self.next()[0] != "RP":
                raise ValueError("unbalanced '(' in query string")
            return d
        if t[0] == "FIELD_LP":
            d = self.parse_or([t[1]])
            if self.peek() is None or self.next()[0] != "RP":
                raise ValueError("unbalanced '(' in field group")
            return d
        if t[0] == "TERM":
            _, field, value, quoted = t
            return _leaf(field, value, quoted, fields)
        raise ValueError(f"unexpected token {t!r} in query string")


def query_string_to_dsl(query: str, fields: list[str],
                        default_operator: str = "or") -> dict:
    """Parse an ES ``query_string`` query into a query-DSL dict."""
    toks = _tokenize_query_string(query)
    if not toks:
        return {"match_all": {}}
    return _Parser(toks, fields, default_operator).parse()


def simple_query_string_to_dsl(query: str, fields: list[str],
                               default_operator: str = "or",
                               minimum_should_match: int | None = None,
                               ) -> dict:
    """Parse an ES ``simple_query_string`` query into a query-DSL
    dict. ``minimum_should_match`` constrains the top-level optional
    clauses (it is ignored when explicit required clauses exist, as
    in ES)."""
    toks = _tokenize_simple(query)
    if not toks:
        return {"match_all": {}}
    out = _Parser(toks, fields, default_operator).parse()
    if minimum_should_match is not None and isinstance(out, dict) \
            and "bool" in out and list(out["bool"]) == ["should"]:
        out["bool"]["minimum_should_match"] = int(minimum_should_match)
    return out
