"""Elasticsearch bulk sink (S3/S4 production path).

The reference upserts one HTTP request per document
(``doc_as_upsert`` + ``retry_on_conflict``, ref ElasticIndex.java:593-615)
— its documented throughput ceiling (BASELINE.md "write amplification").
The Spark-native path batches per partition through the elasticsearch-spark
connector:

    df.write.format("es")
      .option("es.write.operation", "upsert")          # doc_as_upsert
      .option("es.mapping.id", "_id")                  # doc-id column
      .option("es.update.retry.on.conflict", "5")      # retry_on_conflict
      .option("es.batch.size.entries", "1000")         # bulk batching
      .save("<alias>_index@<segment>/docs")

Partition-level bulk requests amortize connection setup and let every
executor write concurrently — the "free win" the reference could not take
(SURVEY.md §4 "write batching: absent").

The connector jar (``org.elasticsearch:elasticsearch-spark-30``) is not in
this environment; ``write_documents`` falls back to the parquet
``ParquetIndexStore``, which implements identical upsert semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_es_index_spark.config import IndexConfig

ES_FORMAT = "es"


def es_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.elasticsearch.spark.sql.DefaultSource15")
        return True
    except Exception:  # noqa: BLE001
        return False


def es_writer_options(cfg: IndexConfig, nodes: str = "localhost:9200") -> dict[str, str]:
    """The connector option set mirroring the reference's write behavior."""
    return {
        "es.nodes": nodes,
        "es.write.operation": "upsert",                       # S3 doc_as_upsert
        "es.mapping.id": "_id",
        "es.update.retry.on.conflict": str(cfg.get("retry-on-conflict")),
        "es.batch.size.entries": "1000",
        "es.batch.write.refresh": "false",                    # translog async analogue
    }


def write_documents(docs: DataFrame, index_name: str,
                    cfg: IndexConfig | None = None,
                    nodes: str = "localhost:9200",
                    fallback_store=None) -> str:
    """Bulk-write documents to ES; fall back to the parquet index store.

    Returns "es" or "parquet" depending on the path taken.
    """
    cfg = cfg or IndexConfig()
    spark = docs.sparkSession
    if es_available(spark):
        writer = docs.write.format(ES_FORMAT).mode("append")
        for key, value in es_writer_options(cfg, nodes).items():
            writer = writer.option(key, value)
        writer.save(f"{index_name}/docs")
        return "es"
    if fallback_store is None:
        raise RuntimeError(
            "elasticsearch-spark is not on the classpath; pass a "
            "ParquetIndexStore as fallback_store")
    fallback_store.upsert(docs)
    return "parquet"
