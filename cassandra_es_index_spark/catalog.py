"""Table registry: primary-key / clustering-key metadata + index options.

The reference derives this from Cassandra table metadata
(ref EsSecondaryIndex.java:149-156: partition keys, clustering columns,
dummy index column). In Spark the base table is any DataFrame; ``TableSpec``
carries the same metadata explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from cassandra_es_index_spark.config import IndexConfig


@dataclass
class TableSpec:
    """Metadata for one indexed table.

    ``partition_keys`` + ``clustering_keys`` define document identity:
    doc id = values joined by ``id-separator`` (ref CStarUtils.java:376-406).
    """

    name: str
    partition_keys: list[str]
    clustering_keys: list[str] = field(default_factory=list)
    ttl_column: str | None = None   # epoch-seconds expiry → _cassandraTtl
    options: dict = field(default_factory=dict)

    @property
    def key_columns(self) -> list[str]:
        return [*self.partition_keys, *self.clustering_keys]

    def config(self) -> IndexConfig:
        return IndexConfig(table_options=self.options)


class Catalog:
    """Registry of (DataFrame, TableSpec) pairs — the engine's keyspace."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, tuple[DataFrame, TableSpec]] = {}

    def register(self, df: DataFrame, spec: TableSpec) -> None:
        missing = [c for c in spec.key_columns if c not in df.columns]
        if missing:
            raise ValueError(f"key columns {missing} not in table {spec.name}")
        self._tables[spec.name] = (df, spec)
        df.createOrReplaceTempView(spec.name)

    def register_parquet(self, path: str, spec: TableSpec) -> DataFrame:
        df = self.spark.read.parquet(path)
        self.register(df, spec)
        return df

    def get(self, name: str) -> tuple[DataFrame, TableSpec]:
        if name not in self._tables:
            raise KeyError(f"unknown table {name!r}")
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)
