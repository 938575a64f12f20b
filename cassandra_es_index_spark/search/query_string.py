"""Lucene-ish ``query_string`` mini-parser.

Scope = what the reference's own docs/tests exercise (SURVEY.md §7 "hard
parts" item 2): terms, ``field:value``, nested field paths
(``AttributeValues.LastName:ab*``), wildcards ``*``/``?``, phrases,
boolean ``AND/OR/NOT`` (+ ``&&/||/!``/leading ``-``), parentheses,
ranges ``[a TO b]`` / ``{a TO b}``, comparisons ``field:>=v``,
``_exists_:field``, ``*:*`` — plus the rest of the Lucene operator
surface the reference exposes by forwarding query strings verbatim to ES
(ref ElasticIndex.java:663-667): fuzzy ``term~``/``term~1``, boosts
``term^2`` / ``"phrase"^2`` / ``(group)^2``, phrase slop ``"a b"~2``,
and the required/prohibited operators ``+a -b`` (must / must_not inside
a default-OR group).

Juxtaposed terms combine with OR — ES ``query_string`` default_operator.
"""

from __future__ import annotations

import re

from cassandra_es_index_spark.search.ast import (
    And, Boost, Exists, Fuzzy, MatchAll, Node, Not, Or, Phrase, Range,
    Regexp, Required, Should, Term, Wildcard,
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
        (?P<plus>\+(?=\S)) |
        (?P<range>[\[{]\s*\S+\s+TO\s+\S+?\s*[\]}]) |
        (?P<regex>/(?:[^/\\]|\\.)+/) |
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
    def __init__(self, tokens: list[tuple[str, str]],
                 default_and: bool = False):
        self.tokens = tokens
        self.i = 0
        self.default_and = default_and

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
        # (node, explicit_or): juxtaposed children carry Lucene's
        # required/prohibited operator semantics; explicitly OR-joined
        # children are plain boolean disjuncts.
        items: list[tuple[Node, bool]] = [(self.and_expr(), False)]
        while True:
            tok = self.peek()
            if tok is None or tok[0] == "rparen":
                break
            if tok[0] == "or":
                self.take()
                items.append((self.and_expr(), True))
            elif tok[0] in ("lparen", "not", "plus", "word", "phrase",
                            "range"):
                # bare juxtaposition → OR (default_operator)
                items.append((self.and_expr(), False))
            else:
                break
        if self.default_and:
            return self._regroup_and(items)
        return self._regroup(items)

    @staticmethod
    def _regroup_and(items: list[tuple[Node, bool]]) -> Node:
        """``default_operator: and`` (r11): juxtaposed clauses are ALL
        required (Lucene's AND default), so the group is a plain
        conjunction — ``+a`` is redundant (unwrapped), ``-b``/``NOT b``
        prohibits as before (And + Not). A group joined ENTIRELY by
        explicit ``OR`` stays the plain boolean disjunction. MIXING
        juxtaposition with explicit ``OR`` in one group is a typed
        error: Lucene's classic QueryParser regroups that combination
        inconsistently (pairwise SHOULD conversion — famously
        surprising), so the engine rejects the ambiguous form instead
        of guessing; parenthesize the OR group (``a (b OR c)``)."""
        if len(items) == 1:
            node = items[0][0]
            return node.child if isinstance(node, Required) else node
        explicit = [expl for _, expl in items[1:]]
        if all(explicit):
            # pure explicit-OR group: plain boolean disjunction (a
            # stray `+` is a no-op inside a disjunction — unwrapped)
            return Or(tuple(n.child if isinstance(n, Required) else n
                            for n, _ in items))
        if any(explicit):
            raise QueryParseError(
                "mixing explicit OR with juxtaposition under "
                "default_operator 'and' is ambiguous in Lucene's "
                "grammar — parenthesize the OR group (engine subset)")
        parts = [n.child if isinstance(n, Required) else n
                 for n, _ in items]
        return And(tuple(parts))

    @staticmethod
    def _regroup(items: list[tuple[Node, bool]]) -> Node:
        """Lucene operator semantics over a default-OR group: ``+a`` is a
        must clause, a juxtaposed ``-b``/``NOT b`` is a prohibit (``a -b``
        matches a AND NOT b — not the boolean ``a OR NOT b``), everything
        else is optional. An explicit ``OR NOT`` keeps pure boolean
        semantics. With no operators present this reduces to the plain
        default-OR disjunction."""
        if len(items) == 1:
            node = items[0][0]
            return node.child if isinstance(node, Required) else node
        musts = [n.child for n, _ in items if isinstance(n, Required)]
        prohibits = [n for n, expl in items
                     if isinstance(n, Not) and not expl]
        opts = [n for n, expl in items
                if not isinstance(n, Required)
                and not (isinstance(n, Not) and not expl)]
        if not musts and not prohibits:
            return Or(tuple(opts))
        parts: list[Node] = list(musts)
        if opts:
            if musts:
                # musts gate; the rest only boost (minimum_should_match=0)
                parts.append(Should(tuple(opts)))
            else:
                parts.append(opts[0] if len(opts) == 1 else Or(tuple(opts)))
        parts.extend(prohibits)
        return parts[0] if len(parts) == 1 else And(tuple(parts))

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
        if tok[0] == "plus":
            self.take()
            return Required(self.unary())
        return self.primary()

    # standalone `~N` / `^N` / `~N^M` after a phrase or group — the
    # tokenizer emits them as one word token
    _SUFFIX_RE = re.compile(r"(?:~(?P<slop>\d+))?(?:\^(?P<boost>\d+(?:\.\d+)?))?")

    def _suffix(self, node: Node) -> Node:
        tok = self.peek()
        if tok is None or tok[0] != "word":
            return node
        m = self._SUFFIX_RE.fullmatch(tok[1])
        if not m or (m.group("slop") is None and m.group("boost") is None):
            return node
        self.take()
        if m.group("slop") is not None:
            if not isinstance(node, Phrase):
                raise QueryParseError("slop (~N) only applies to phrases")
            node = Phrase(node.field, node.text, int(m.group("slop")))
        if m.group("boost") is not None:
            node = Boost(node, float(m.group("boost")))
        return node

    def primary(self) -> Node:
        kind, text = self.take()
        if kind == "lparen":
            node = self.or_expr()
            nxt = self.take()
            if nxt[0] != "rparen":
                raise QueryParseError("expected ')'")
            return self._suffix(node)
        if kind == "phrase":
            return self._suffix(Phrase(None, _unescape(text)))
        if kind == "range":
            return self._suffix(self._range(None, text))
        if kind == "regex":
            return self._suffix(Regexp(None, _unescape_regex(text)))
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
            return self._suffix(Phrase(fld, _unescape(text)))
        if kind == "range":
            return self._suffix(self._range(fld, text))
        if kind == "regex":
            return self._suffix(Regexp(fld, _unescape_regex(text)))
        if kind == "lparen":
            # field:(a OR b) — distribute the field over the group
            node = self.or_expr()
            nxt = self.take()
            if nxt[0] != "rparen":
                raise QueryParseError("expected ')'")
            return self._suffix(_distribute_field(node, fld))
        if kind == "word":
            return self._value_node(fld, text)
        raise QueryParseError(f"bad value for field {fld!r}: {text!r}")

    # in-word `value~N^M` suffixes (fuzzy + boost, Lucene order); a word
    # whose tail doesn't parse as a suffix stays a literal term value
    _WORD_SUFFIX_RE = re.compile(
        r"(?P<core>.*?[^~^])(?:~(?P<fuzz>\d*))?(?:\^(?P<boost>\d+(?:\.\d+)?))?")

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
        core, fuzz, boost = text, None, None
        m = self._WORD_SUFFIX_RE.fullmatch(text)
        if m and (m.group("fuzz") is not None or m.group("boost") is not None):
            core, fuzz, boost = m.group("core"), m.group("fuzz"), \
                m.group("boost")
        if fuzz is not None:
            if "*" in core or "?" in core:
                raise QueryParseError(
                    f"cannot combine fuzzy ~ with wildcards: {text!r}")
            # bare `~` = Lucene's AUTO budget (length-dependent: 0/1/2
            # edits below 3 / below 6 / at 6+ query-term chars)
            node: Node = Fuzzy(fld, core, int(fuzz) if fuzz else None)
        elif "*" in core or "?" in core:
            if fld is None and core == "*":
                return MatchAll()
            node = Wildcard(fld, core)
        else:
            node = Term(fld, core)
        if boost is not None:
            node = Boost(node, float(boost))
        return node

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
    if isinstance(node, (And, Or, Should)):
        cls = type(node)
        return cls(tuple(_distribute_field(c, fld) for c in node.children))
    if isinstance(node, Not):
        return Not(_distribute_field(node.child, fld))
    if isinstance(node, Required):
        return Required(_distribute_field(node.child, fld))
    if isinstance(node, Boost):
        return Boost(_distribute_field(node.child, fld), node.factor)
    if isinstance(node, Term):
        return Term(fld, node.value)
    if isinstance(node, Wildcard):
        return Wildcard(fld, node.pattern)
    if isinstance(node, Phrase):
        return Phrase(fld, node.text, node.slop)
    if isinstance(node, Fuzzy):
        import dataclasses
        return dataclasses.replace(node, field=fld)
    if isinstance(node, Regexp):
        return Regexp(fld, node.pattern)
    if isinstance(node, Range):
        return Range(fld, node.lo, node.hi, node.include_lo, node.include_hi)
    return node


def _unescape(quoted: str) -> str:
    body = quoted[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def _unescape_regex(slashed: str) -> str:
    """Strip the ``/.../`` delimiters; only ``\\/`` un-escapes (every
    other backslash sequence belongs to the regex itself)."""
    return slashed[1:-1].replace("\\/", "/")


def parse(query: str, default_operator: str = "or") -> Node:
    """Parse a Lucene-ish query string into the engine AST.
    ``default_operator`` sets how juxtaposed clauses combine — ``or``
    (Lucene/ES default: the ±-operator regroup over a default-OR
    group) or ``and`` (every juxtaposed clause required; explicit
    ``OR`` inside such a group is a typed error — ``_regroup_and``)."""
    if default_operator not in ("or", "and"):
        raise QueryParseError(
            f"bad default_operator {default_operator!r}")
    tokens = _tokenize(query)
    if not tokens:
        raise QueryParseError("empty query")
    return _Parser(tokens, default_and=default_operator == "and").parse()
