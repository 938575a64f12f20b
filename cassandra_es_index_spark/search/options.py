"""``#options:k=v,…#`` query-prefix parsing.

Faithful port of QueryMetaData (ref QueryMetaData.java:32-59; behavior
vectors QueryMetaDataTest.java:26-57): the prefix is split off the front of
the query; ``,`` separates options, ``=`` separates key/value; the rest of
the string — including further ``#`` characters — is the query verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass, field

META_PREFIX = "#options:"
META_SUFFIX = "#"

LOAD_ROWS = "load-rows"      # default true  — join hits back to base table
LOAD_SOURCE = "load-source"  # default false — return full document source


@dataclass
class QueryMetaData:
    query: str
    options: dict[str, str] = field(default_factory=dict)

    @classmethod
    def parse(cls, query_str: str) -> "QueryMetaData":
        if not query_str.startswith(META_PREFIX):
            return cls(query=query_str)
        end = query_str.index(META_SUFFIX, len(META_PREFIX))
        option_str = query_str[len(META_PREFIX):end]
        options: dict[str, str] = {}
        for option in option_str.split(","):
            key, value = option.split("=", 1)
            options[key] = value
        return cls(query=query_str[end + 1:], options=options)

    @property
    def load_rows(self) -> bool:
        return self.options.get(LOAD_ROWS, "true").lower() == "true"

    @property
    def load_source(self) -> bool:
        return self.options.get(LOAD_SOURCE, "false").lower() == "true"
