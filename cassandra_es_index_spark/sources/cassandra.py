"""Cassandra bulk source (S1 production path).

The reference's index build scans SSTables node-locally
(ref EsIndexBuilder.java:60-88). The Spark-native equivalent reads the
table through the DataSource V2 Cassandra connector, which maps Cassandra
token ranges to input partitions — the same data locality the SSTable scan
exploits, but parallel across the whole cluster and with predicate/column
pushdown into CQL.

The connector jar (``com.datastax.spark:spark-cassandra-connector``) is not
in this environment, so ``read_cassandra`` raises a clear error unless the
format is available; ``read_table_or_fixture`` falls back to the parquet
fixture layout used by the test harness. The options below are the
documented public connector surface — nothing environment-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cassandra_es_index_spark.sources.parquet import read_parquet

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def cassandra_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.cassandra.DefaultSource")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_cassandra(spark: SparkSession, keyspace: str, table: str,
                   consistency: str = "ONE",
                   split_size_mb: int = 64) -> DataFrame:
    """Full-table scan via the Cassandra connector.

    ``split_size_mb`` controls input-partition granularity (token-range
    splits); ``consistency`` mirrors the reference's
    ``read-consistency-level`` option (ref config/IndexConfig.java:67-68).
    """
    if not cassandra_available(spark):
        raise RuntimeError(
            "spark-cassandra-connector is not on the classpath; use "
            "read_table_or_fixture() for parquet fixtures")
    return (spark.read.format(CASSANDRA_FORMAT)
            .option("keyspace", keyspace)
            .option("table", table)
            .option("spark.cassandra.input.consistency.level", consistency)
            .option("spark.cassandra.input.split.sizeInMB", str(split_size_mb))
            .load())


def read_table_or_fixture(spark: SparkSession, keyspace: str, table: str,
                          fixture_dir: str | None = None) -> DataFrame:
    """Production: Cassandra connector. Test harness: parquet fixture."""
    if cassandra_available(spark):
        return read_cassandra(spark, keyspace, table)
    if fixture_dir is None:
        raise RuntimeError("no Cassandra connector and no fixture_dir given")
    return read_parquet(spark, f"{fixture_dir}/{table}.parquet")
