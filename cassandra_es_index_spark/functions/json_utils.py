"""JSON utilities with reference-parity semantics.

Pure-Python ports of the reference's JsonUtils (ref JsonUtils.java), used
both driver-side (settings/config handling) and as the semantics spec for
the Spark-side column transforms in ``docmodel``. Each function is golden-
tested against the reference's own documented vectors
(README.md:566-592, JsonUtilsTest.java:87-96).
"""

from __future__ import annotations

import json
from typing import Any

# ---------------------------------------------------------------------------
# flatten — ref JsonUtils.flatten (JsonUtils.java:81-116)
# ---------------------------------------------------------------------------


def _java_str(value: Any) -> str:
    """String.valueOf()-compatible rendering for scalars and nested values."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, dict):
        # Java Map.toString(): {k1=v1, k2=v2}
        inner = ", ".join(f"{k}={_java_str(v)}" for k, v in value.items())
        return "{" + inner + "}"
    if isinstance(value, list):
        # Java List.toString(): [v1, v2]
        inner = ", ".join(_java_str(v) for v in value)
        return "[" + inner + "]"
    if isinstance(value, float) and value.is_integer():
        return str(value)  # Java prints 42.0 for doubles; JSON ints parse as int
    return str(value)


def flatten(json_string: str) -> str:
    """Flatten a JSON object to ``map<string, array<string>>``.

    ES cannot index heterogeneous value types under one key, so the
    reference rewrites every top-level value to an array of strings:
    sub-maps become ``"key=value"`` entries, arrays/collections become
    arrays of element strings, scalars become one-element arrays
    (ref JsonUtils.java:81-116; vector README.md:566-592).
    """
    obj = json.loads(json_string)
    if not isinstance(obj, dict):
        raise ValueError("flatten expects a JSON object")
    out: dict[str, list[str]] = {}
    for key, value in obj.items():
        if isinstance(value, dict):
            out[key] = [f"{k}={_java_str(v)}" for k, v in value.items()]
        elif isinstance(value, list):
            out[key] = [_java_str(v) for v in value]
        else:
            out[key] = [_java_str(value)]
    return json.dumps(out, separators=(",", ":"))


# ---------------------------------------------------------------------------
# dotted → structured — ref JsonUtils.dotedToStructured (JsonUtils.java:306-325)
# ---------------------------------------------------------------------------


def dotted_to_structured(obj: dict[str, Any]) -> dict[str, Any]:
    """Convert ``{"a.b.c": v}`` keys into nested objects ``{"a":{"b":{"c":v}}}``.

    Used when applying flat ``index-properties`` settings to engines that
    want nested settings documents (ref ElasticIndex.java:347-352). Later
    keys merge into earlier structures; insertion order is preserved
    (golden vector JsonUtilsTest.java:87-96).
    """
    out: dict[str, Any] = {}
    for key, value in obj.items():
        parts = key.split(".")
        node = out
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
                node[part] = nxt
            node = nxt
        node[parts[-1]] = value
    return out


# ---------------------------------------------------------------------------
# path helpers — ref JsonUtils.java:168-292
# ---------------------------------------------------------------------------


def get_path(obj: dict[str, Any], *path: str) -> Any:
    """Walk ``path`` through nested objects; None when absent
    (ref JsonUtils.getJsonElement, JsonUtils.java:168-186)."""
    node: Any = obj
    for part in path:
        if not isinstance(node, dict) or part not in node:
            return None
        node = node[part]
    return node


def get_string(obj: dict[str, Any], *path: str) -> str | None:
    """String form of the element at ``path`` (ref JsonUtils.getString)."""
    value = get_path(obj, *path)
    if value is None:
        return None
    return value if isinstance(value, str) else _java_str(value)


def filter_keys(obj: dict[str, Any], keep: set[str]) -> dict[str, Any]:
    """Keep only top-level ``keep`` keys (ref JsonUtils.filterKeys)."""
    return {k: v for k, v in obj.items() if k in keep}


def filter_path(obj: dict[str, Any], *path: str) -> dict[str, Any]:
    """Remove the element at ``path`` (ref JsonUtils.filterPath)."""
    out = json.loads(json.dumps(obj))  # deep copy
    node = out
    for part in path[:-1]:
        if not isinstance(node, dict) or part not in node:
            return out
        node = node[part]
    if isinstance(node, dict):
        node.pop(path[-1], None)
    return out


def merge(base: dict[str, Any], extra: dict[str, Any]) -> dict[str, Any]:
    """Recursive merge, ``extra`` wins on scalar conflicts
    (ref JsonUtils.merge, JsonUtils.java:280-292)."""
    out = dict(base)
    for key, value in extra.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = merge(out[key], value)
        else:
            out[key] = value
    return out


def un_quote(value: str) -> str:
    """Strip surrounding double quotes (ref JsonUtils.unQuote, :270-272)."""
    return value.strip('"')
