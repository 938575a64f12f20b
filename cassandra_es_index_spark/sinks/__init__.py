"""Index sinks (SURVEY.md §2.1 S3/S4).

``elasticsearch`` — bulk upsert writer config for the elasticsearch-spark
connector (production), with the parquet ``ParquetIndexStore`` as the
in-repo equivalent used by tests and the driver harness.
"""

from cassandra_es_index_spark.sinks.elasticsearch import (
    es_available, write_documents,
)

__all__ = ["es_available", "write_documents"]
