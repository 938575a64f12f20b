"""Analyzer/tokenizer registry (U2).

The reference lets users define custom ES analyzers via
``index-properties`` — e.g. a pattern tokenizer splitting on dashes
(``dash-ex``) and an ``html_analyzer`` with ``html_strip`` + lowercase
(ref README.md:483-487, ElasticIndexTest.java:176-179). The engine-native
equivalents are Column pipelines producing ``array<string>`` token
columns; search predicates can then use ``array_contains`` semantics over
a chosen analyzer instead of the default whitespace/word tokenizer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Analyzer = Callable[[Column], Column]

_REGISTRY: dict[str, Analyzer] = {}


def register(name: str, fn: Analyzer) -> None:
    _REGISTRY[name] = fn


def get(name: str) -> Analyzer:
    if name not in _REGISTRY:
        raise KeyError(f"unknown analyzer {name!r}")
    return _REGISTRY[name]


def names() -> list[str]:
    return sorted(_REGISTRY)


def analyze(name: str, col: Column) -> Column:
    return get(name)(col)


# -- built-ins --------------------------------------------------------------


def standard(col: Column) -> Column:
    """Lowercase word tokens (the engine default)."""
    return F.filter(F.split(F.lower(col), r"\W+"), lambda t: t != "")


def whitespace(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def keyword(col: Column) -> Column:
    """The whole value as one token (ES keyword analyzer)."""
    return F.array(col)


def pattern_tokenizer(pattern: str, lowercase: bool = True) -> Analyzer:
    """Split on a regex — e.g. the reference's dash tokenizer example
    (``"tokenizer": {"dash-ex": {"type": "pattern", "pattern": "-"}}``,
    ref README.md:483-487)."""
    def fn(col: Column) -> Column:
        base = F.lower(col) if lowercase else col
        return F.filter(F.split(base, pattern), lambda t: t != "")
    return fn


def html_strip(col: Column) -> Column:
    """Drop HTML tags and entities before standard tokenization — the
    engine analogue of the reference's ``html_analyzer``
    (char_filter html_strip + lowercase, ref ElasticIndexTest.java:176-179)."""
    no_tags = F.regexp_replace(col, r"<[^>]*>", " ")
    no_entities = F.regexp_replace(no_tags, r"&[a-zA-Z#0-9]+;", " ")
    return standard(no_entities)


register("standard", standard)
register("whitespace", whitespace)
register("keyword", keyword)
register("html", html_strip)
register("dash", pattern_tokenizer("-"))
