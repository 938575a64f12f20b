"""Lucene-ish ``query_string`` mini-parser.

Scope = what the reference's own docs/tests exercise (SURVEY.md §7 "hard
parts" item 2): terms, ``field:value``, nested field paths
(``AttributeValues.LastName:ab*``), wildcards ``*``/``?``, phrases,
boolean ``AND/OR/NOT`` (+ ``&&/||/!``/leading ``-``), parentheses,
ranges ``[a TO b]`` / ``{a TO b}``, comparisons ``field:>=v``,
``_exists_:field``, ``*:*``.
(ref query examples README.md:179,404,689,731, doc/examples.txt:24,
ElasticIndexTest.java:243-251.)

Juxtaposed terms combine with OR — ES ``query_string`` default_operator.
"""

from __future__ import annotations

import re

from cassandra_es_index_spark.search.ast import (
    And, Exists, MatchAll, Node, Not, Or, Phrase, Range, Term, Wildcard,
)


class QueryParseError(ValueError):
    """Raised on malformed query strings — the engine surfaces this the way
    the reference surfaces ``InvalidRequestException`` after `_validate`
    (ref ElasticIndex.java:734-782)."""


_TOKEN_RE = re.compile(
    r"""
    \s*(
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<and>AND\b|&&) |
        (?P<or>OR\b|\|\|) |
        (?P<not>NOT\b|!|-(?=\S)) |
        (?P<range>[\[{]\s*\S+\s+TO\s+\S+?\s*[\]}]) |
        (?P<phrase>"(?:[^"\\]|\\.)*") |
        (?P<word>[^\s()!:"]+) |
        (?P<colon>:)
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise QueryParseError(f"cannot tokenize at {text[pos:]!r}")
            break
        pos = m.end()
        kind = next(k for k, v in m.groupdict().items() if v is not None)
        tokens.append((kind, m.group(kind)))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def take(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise QueryParseError("unexpected end of query")
        self.i += 1
        return tok

    # query := or_expr
    def parse(self) -> Node:
        node = self.or_expr()
        if self.peek() is not None:
            raise QueryParseError(f"trailing tokens at {self.peek()!r}")
        return node

    # or_expr := and_expr ((OR | <juxtaposition>) and_expr)*
    def or_expr(self) -> Node:
        children = [self.and_expr()]
        while True:
            tok = self.peek()
            if tok is None or tok[0] == "rparen":
                break
            if tok[0] == "or":
                self.take()
                children.append(self.and_expr())
            elif tok[0] in ("lparen", "not", "word", "phrase", "range"):
                # bare juxtaposition → OR (default_operator)
                children.append(self.and_expr())
            else:
                break
        return children[0] if len(children) == 1 else Or(tuple(children))

    # and_expr := unary (AND unary)*
    def and_expr(self) -> Node:
        children = [self.unary()]
        while True:
            tok = self.peek()
            if tok is not None and tok[0] == "and":
                self.take()
                children.append(self.unary())
            else:
                break
        return children[0] if len(children) == 1 else And(tuple(children))

    def unary(self) -> Node:
        tok = self.peek()
        if tok is None:
            raise QueryParseError("unexpected end of query")
        if tok[0] == "not":
            self.take()
            return Not(self.unary())
        return self.primary()

    def primary(self) -> Node:
        kind, text = self.take()
        if kind == "lparen":
            node = self.or_expr()
            nxt = self.take()
            if nxt[0] != "rparen":
                raise QueryParseError("expected ')'")
            return node
        if kind == "phrase":
            return Phrase(None, _unescape(text))
        if kind == "range":
            return self._range(None, text)
        if kind == "word":
            nxt = self.peek()
            if nxt is not None and nxt[0] == "colon":
                self.take()  # consume ':'
                return self._field_value(text)
            return self._value_node(None, text)
        raise QueryParseError(f"unexpected token {text!r}")

    def _field_value(self, fld: str) -> Node:
        if fld == "_exists_":
            kind, text = self.take()
            if kind != "word":
                raise QueryParseError("_exists_ needs a field name")
            return Exists(text)
        kind, text = self.take()
        if kind == "phrase":
            return Phrase(fld, _unescape(text))
        if kind == "range":
            return self._range(fld, text)
        if kind == "lparen":
            # field:(a OR b) — distribute the field over the group
            node = self.or_expr()
            nxt = self.take()
            if nxt[0] != "rparen":
                raise QueryParseError("expected ')'")
            return _distribute_field(node, fld)
        if kind == "word":
            return self._value_node(fld, text)
        raise QueryParseError(f"bad value for field {fld!r}: {text!r}")

    def _value_node(self, fld: str | None, text: str) -> Node:
        if fld == "*" and text == "*":
            return MatchAll()
        if text.startswith((">=", "<=")):
            op, val = text[:2], text[2:]
            return (Range(fld, val, None, True, True) if op == ">="
                    else Range(fld, None, val, True, True))
        if text.startswith((">", "<")):
            op, val = text[0], text[1:]
            return (Range(fld, val, None, False, True) if op == ">"
                    else Range(fld, None, val, True, False))
        if "*" in text or "?" in text:
            if fld is None and text == "*":
                return MatchAll()
            return Wildcard(fld, text)
        return Term(fld, text)

    def _range(self, fld: str | None, text: str) -> Range:
        m = re.match(r"([\[{])\s*(\S+)\s+TO\s+(\S+?)\s*([\]}])", text)
        if not m:
            raise QueryParseError(f"bad range {text!r}")
        open_b, lo, hi, close_b = m.groups()
        return Range(
            fld,
            None if lo == "*" else lo,
            None if hi == "*" else hi,
            include_lo=open_b == "[",
            include_hi=close_b == "]",
        )


def _distribute_field(node: Node, fld: str) -> Node:
    if isinstance(node, (And, Or)):
        cls = type(node)
        return cls(tuple(_distribute_field(c, fld) for c in node.children))
    if isinstance(node, Not):
        return Not(_distribute_field(node.child, fld))
    if isinstance(node, Term):
        return Term(fld, node.value)
    if isinstance(node, Wildcard):
        return Wildcard(fld, node.pattern)
    if isinstance(node, Phrase):
        return Phrase(fld, node.text)
    if isinstance(node, Range):
        return Range(fld, node.lo, node.hi, node.include_lo, node.include_hi)
    return node


def _unescape(quoted: str) -> str:
    body = quoted[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def parse(query: str) -> Node:
    """Parse a Lucene-ish query string into the engine AST."""
    tokens = _tokenize(query)
    if not tokens:
        raise QueryParseError("empty query")
    return _Parser(tokens).parse()
