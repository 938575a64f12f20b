"""Layered index configuration.

Mirrors the reference's option model (ref config/IndexConfig.java,
config/OptionReader.java:109-210): options resolve with precedence

    env/system overrides  >  properties file  >  per-table options  >  defaults

and every key is also tried with a ``<scope>.`` prefix (the reference uses
``<dc.rack>.`` / ``<dc>.``; we generalize to an arbitrary scope string) and
with hyphen↔dot spelling variants (``async-write`` == ``async.write``).

Only a subset of the reference's ~40 options is meaningful for a Spark
engine; unknown keys are preserved and retrievable (the reference likewise
passes unknown ``index-properties`` through).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Mapping

ENV_PREFIX = "CASSANDRA_ES_INDEX_"

# Defaults mirror config/IndexConfig.java (citations per key).
DEFAULTS: dict[str, Any] = {
    "async-write": True,             # IndexConfig.java:70-71
    "discard-nulls": True,           # IndexConfig.java:73-74
    "max-results": 10_000,           # IndexConfig.java:64-65
    "concurrent-lock": True,         # IndexConfig.java:88-89
    "validate-queries": False,       # IndexConfig.java:79-80
    "json-serialized-fields": "",    # IndexConfig.java:102-104
    "json-flat-serialized-fields": "",
    "es-analytic-mode": False,       # IndexConfig.java:107-108
    "truncate-rebuild": False,
    "available-while-rebuilding": True,  # IndexConfig.java:116-117
    "ttl-shift": 0,                  # IndexConfig.java:128-129
    "index-segment": "OFF",          # DefaultIndexManager: OFF|YEAR|MONTH|DAY|HOUR|CUSTOM
    "segment-name": "",              # custom segment suffix
    "segment-size": 86_400_000,      # IndexDropManager epoch frame, ms (README.md:558)
    "retry-on-conflict": 5,          # IndexConfig.java:143-144
    "read-consistency-level": "ONE",  # IndexConfig.java:67-68
    "id-separator": "-",             # IndexConfig.java:42
    "skip-log-replay": True,         # EsSecondaryIndex.java:396-402
    "skip-non-local-updates": True,  # EsSecondaryIndex.java:404-411
    "ttl-period-seconds": 60,        # DefaultIndexManager.java:50
    "purge-period-minutes": 60,      # IndexConfig.java:122-123
    "per-request-timeout-ms": 0,
}

_TRUE = {"true", "1", "yes", "on"}
_FALSE = {"false", "0", "no", "off"}


def _variants(key: str, scope: str | None) -> list[str]:
    """Key spellings in lookup order: scoped first, hyphen and dot forms."""
    forms = [key, key.replace("-", "."), key.replace(".", "-")]
    seen: list[str] = []
    for f in forms:
        if f not in seen:
            seen.append(f)
    out: list[str] = []
    if scope:
        # Most-specific scope first, then progressively shorter dotted scopes
        # (reference: "<dc>.<rack>." then "<dc>." — OptionReader.java:172-210).
        parts = scope.split(".")
        for i in range(len(parts), 0, -1):
            prefix = ".".join(parts[:i]) + "."
            out.extend(prefix + f for f in seen)
    out.extend(seen)
    return out


def _coerce(value: Any, default: Any) -> Any:
    """Coerce a string option value to the type of its default."""
    if not isinstance(value, str):
        return value
    if isinstance(default, bool):
        low = value.strip().lower()
        if low in _TRUE:
            return True
        if low in _FALSE:
            return False
        raise ValueError(f"not a boolean: {value!r}")
    if isinstance(default, int):
        return int(value)
    if isinstance(default, float):
        return float(value)
    return value


@dataclass
class IndexConfig:
    """Resolved option view for one index/table.

    ``table_options`` play the role of the CQL index options; ``file_options``
    the es-index.properties file; env vars ``CASSANDRA_ES_INDEX_<KEY>``
    (hyphens as underscores) override everything — same precedence chain as
    OptionReader.java:109-169.
    """

    table_options: Mapping[str, Any] = field(default_factory=dict)
    file_options: Mapping[str, Any] = field(default_factory=dict)
    scope: str | None = None

    def get(self, key: str, default: Any | None = None) -> Any:
        base_default = DEFAULTS.get(key, default)
        for variant in _variants(key, self.scope):
            env_key = ENV_PREFIX + variant.replace("-", "_").replace(".", "_").upper()
            if env_key in os.environ:
                return _coerce(os.environ[env_key], base_default)
        for source in (self.file_options, self.table_options):
            for variant in _variants(key, self.scope):
                if variant in source:
                    return _coerce(source[variant], base_default)
        return base_default

    # Typed accessors for the hot options.
    @property
    def max_results(self) -> int:
        return int(self.get("max-results"))

    @property
    def discard_nulls(self) -> bool:
        return bool(self.get("discard-nulls"))

    @property
    def id_separator(self) -> str:
        return str(self.get("id-separator"))

    @property
    def ttl_shift(self) -> int:
        return int(self.get("ttl-shift"))

    @property
    def analytic_mode(self) -> bool:
        return bool(self.get("es-analytic-mode"))

    def csv_list(self, key: str) -> list[str]:
        raw = self.get(key, "")
        if not raw:
            return []
        return [part.strip() for part in str(raw).split(",") if part.strip()]

    @property
    def json_serialized_fields(self) -> list[str]:
        return self.csv_list("json-serialized-fields")

    @property
    def json_flat_serialized_fields(self) -> list[str]:
        return self.csv_list("json-flat-serialized-fields")
