"""ES query-DSL subset → engine AST.

The reference forwards any query starting with ``{`` verbatim to ES
(ref ElasticIndex.java:663-667); the documented/tested subset is
``range``, ``term``, ``terms``, ``match``, ``match_all``, ``exists``,
``bool`` (must/should/must_not/filter), ``query_string``, plus a top-level
``size`` (ref README.md:404-405). We translate that subset plus
``match_phrase`` (a superset clause mapping onto the same Phrase AST the
query_string parser produces).
"""

from __future__ import annotations

import json
from typing import Any

from cassandra_es_index_spark.search.ast import (
    And, Exists, MatchAll, Node, Not, Or, Phrase, Range, Scoreless, Should,
    Term,
)
from cassandra_es_index_spark.search import query_string as qs


class DslError(ValueError):
    pass


def parse(query_json: str | dict[str, Any]) -> tuple[Node, int | None]:
    """Parse an ES-DSL query; returns (AST, size-or-None)."""
    if isinstance(query_json, str):
        try:
            obj = json.loads(query_json)
        except json.JSONDecodeError as e:
            raise DslError(f"bad DSL JSON: {e}") from e
    else:
        obj = query_json
    if not isinstance(obj, dict):
        raise DslError("DSL root must be an object")
    size = obj.get("size")
    if size is not None and not isinstance(size, int):
        raise DslError("size must be an integer")
    query = obj.get("query", {"match_all": {}})
    return _node(query), size


def _node(q: dict[str, Any]) -> Node:
    if not isinstance(q, dict) or len(q) != 1:
        raise DslError(f"query clause must have exactly one key: {q!r}")
    (kind, body), = q.items()
    if kind == "match_all":
        return MatchAll()
    if kind == "term":
        field, value = _single(body)
        if isinstance(value, dict):
            value = value.get("value")
        return Term(field, _scalar(value))
    if kind == "terms":
        field, values = _single(body)
        if not isinstance(values, list):
            raise DslError("terms needs a list")
        return Or(tuple(Term(field, _scalar(v)) for v in values))
    if kind == "match":
        field, value = _single(body)
        if isinstance(value, dict):
            value = value.get("query")
        # match = analyzed OR-of-tokens over one field
        tokens = str(value).split()
        if len(tokens) == 1:
            return Term(field, tokens[0])
        return Or(tuple(Term(field, t) for t in tokens))
    if kind == "match_phrase":
        # tokens adjacent in order; index-served when a positional index
        # exists (engine superset — the reference's tested subset stops at
        # match, but phrase composes naturally with the same AST)
        field, value = _single(body)
        if isinstance(value, dict):
            value = value.get("query")
        return Phrase(field, str(value))
    if kind == "range":
        field, bounds = _single(body)
        if not isinstance(bounds, dict):
            raise DslError("range needs bounds object")
        lo = bounds.get("gte", bounds.get("gt"))
        hi = bounds.get("lte", bounds.get("lt"))
        return Range(
            field,
            None if lo is None else _scalar(lo),
            None if hi is None else _scalar(hi),
            include_lo="gte" in bounds or "gt" not in bounds,
            include_hi="lte" in bounds or "lt" not in bounds,
        )
    if kind == "exists":
        if not isinstance(body, dict) or "field" not in body:
            raise DslError("exists needs {'field': name}")
        return Exists(body["field"])
    if kind == "bool":
        if not isinstance(body, dict):
            raise DslError("bool needs an object")
        parts: list[Node] = []
        for sub in _as_list(body.get("must")):
            parts.append(_node(sub))
        for sub in _as_list(body.get("filter")):
            # filter context: required but scoreless, like ES
            parts.append(Scoreless(_node(sub)))
        should = [_node(sub) for sub in _as_list(body.get("should"))]
        if should:
            if parts:
                # must/filter present → should is optional, score-only
                # (ES minimum_should_match=0 in that case)
                parts.append(Should(tuple(should)))
            else:
                # should alone → at least one must match
                parts.append(should[0] if len(should) == 1 else Or(tuple(should)))
        for sub in _as_list(body.get("must_not")):
            parts.append(Not(_node(sub)))
        if not parts:
            return MatchAll()
        return parts[0] if len(parts) == 1 else And(tuple(parts))
    if kind == "query_string":
        if not isinstance(body, dict) or "query" not in body:
            raise DslError("query_string needs {'query': str}")
        return qs.parse(body["query"])
    raise DslError(f"unsupported DSL clause {kind!r}")


def _single(body: Any) -> tuple[str, Any]:
    if not isinstance(body, dict) or len(body) != 1:
        raise DslError(f"clause body must have exactly one field: {body!r}")
    (field, value), = body.items()
    return field, value


def _scalar(value: Any) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def _as_list(value: Any) -> list[dict[str, Any]]:
    if value is None:
        return []
    if isinstance(value, list):
        return value
    return [value]
