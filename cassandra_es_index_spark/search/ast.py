"""Query AST shared by the query_string parser and the ES-DSL translator.

The reference ships the query text verbatim to Elasticsearch; our engine
parses it into this small algebra and compiles it to Catalyst expressions
(SURVEY.md §4 "custom Catalyst work actually needed", item 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Term(Node):
    """``field:value`` — exact token/term match. ``field=None`` means the
    default search field."""
    field: str | None
    value: str


@dataclass(frozen=True)
class Wildcard(Node):
    """``field:cassan*`` — ``*`` = any run of word chars, ``?`` = one."""
    field: str | None
    pattern: str


@dataclass(frozen=True)
class Phrase(Node):
    """``field:"hello world"`` — tokens adjacent in order."""
    field: str | None
    text: str


@dataclass(frozen=True)
class Range(Node):
    """``field:[a TO b]`` / ``{a TO b}`` or ``field:>=v`` comparisons.

    ``lo``/``hi`` of None mean unbounded (``*``)."""
    field: str | None
    lo: str | None
    hi: str | None
    include_lo: bool = True
    include_hi: bool = True


@dataclass(frozen=True)
class Exists(Node):
    """``_exists_:field`` — field is non-null."""
    field: str


@dataclass(frozen=True)
class Ids(Node):
    """ES ``ids`` query — match documents by engine doc id (``_id``)."""
    values: tuple[str, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class MatchAll(Node):
    """``*:*`` / ES ``match_all``."""


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Not(Node):
    child: Node = None  # type: ignore[assignment]


@dataclass(frozen=True)
class Should(Node):
    """ES bool ``should`` alongside must/filter: optional clauses that
    boost the score when matched but do not gate matching
    (ES ``minimum_should_match`` defaults to 0 when must/filter exist)."""
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Scoreless(Node):
    """ES bool ``filter`` context: gates matching, contributes no score."""
    child: Node = None  # type: ignore[assignment]
