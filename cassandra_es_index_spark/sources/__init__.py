"""Source connectors (SURVEY.md §2.1 S1/S2).

``read_parquet`` — parquet scan with nanosecond-timestamp normalization.
The bulk-build path (S1) reads any table through here; Structured
Streaming sources live in ``streaming``.
"""

from cassandra_es_index_spark.sources.parquet import read_parquet

__all__ = ["read_parquet"]
