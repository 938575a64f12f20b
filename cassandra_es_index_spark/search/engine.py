"""SearchEngine — the engine's `SELECT … WHERE query='…'` entry point.

Re-expresses the reference's search lifecycle (SURVEY.md §3.1,
ref EsSecondaryIndex.java:441-511) in one process: parse → compile to
Catalyst → top-k by deterministic score → optional join back to the base
table. Process/node boundaries of the reference become exchange stages
that Catalyst/AQE plan (broadcast for the ≤max-results hit set).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_es_index_spark.catalog import Catalog, TableSpec
from cassandra_es_index_spark.docmodel import DOC_ID, build_documents
from cassandra_es_index_spark.search import es_dsl, query_string
from cassandra_es_index_spark.search.compile import Compiler
from cassandra_es_index_spark.search.options import QueryMetaData

# Admin verbs dispatched before search (ref EsSecondaryIndex.java:101-103,
# 441-472, 517-545).
UPDATE_PREFIX = "#update#"
GET_MAPPING = "#get_mapping#"
PUT_MAPPING_PREFIX = "#put_mapping#"

SCORE = "_score"


class SearchEngine:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.catalog = Catalog(spark)
        self._docs: dict[str, DataFrame] = {}
        self._postings: dict[tuple[str, str], DataFrame] = {}

    # -- registration / index build ----------------------------------------

    def register(self, df: DataFrame, spec: TableSpec) -> DataFrame:
        """Register a base table and build its index documents DataFrame
        (the bulk-build path, ref EsIndexBuilder.java:60-88)."""
        self.catalog.register(df, spec)
        docs = build_documents(df, spec)
        self._docs[spec.name] = docs
        return docs

    def documents(self, table: str) -> DataFrame:
        return self._docs[table]

    # -- admin verbs --------------------------------------------------------

    def _admin(self, table: str, query_str: str) -> DataFrame | None:
        base, spec = self.catalog.get(table)
        if query_str.startswith(UPDATE_PREFIX):
            # Settings hot-reload (ref EsSecondaryIndex.java:441-448,517-545)
            payload = query_str[len(UPDATE_PREFIX):].rstrip("#")
            updates = json.loads(payload) if payload else {}
            spec.options.update(updates)
            self._docs[table] = build_documents(base, spec)
            return self.spark.createDataFrame(
                [(k, str(v)) for k, v in updates.items()] or [("", "")],
                "option string, value string")
        if query_str.startswith(GET_MAPPING):
            # Mapping read (ref EsSecondaryIndex.java:466-468)
            docs = self._docs[table]
            return self.spark.createDataFrame(
                [(f.name, f.dataType.simpleString()) for f in docs.schema.fields],
                "field string, type string")
        if query_str.startswith(PUT_MAPPING_PREFIX):
            # Mapping write: cast listed columns (ref EsSecondaryIndex.java:470-472)
            payload = query_str[len(PUT_MAPPING_PREFIX):].rstrip("#")
            mapping = json.loads(payload)
            docs = self._docs[table]
            for col_name, target in mapping.items():
                if col_name in docs.columns:
                    docs = docs.withColumn(col_name, F.col(col_name).cast(target))
            self._docs[table] = docs
            return self.spark.createDataFrame(
                [(k, v) for k, v in mapping.items()], "field string, type string")
        return None

    # -- search -------------------------------------------------------------

    def parse(self, docs: DataFrame, query: str,
              default_field: str | None = None):
        """Query text → (predicate, score, dsl-size). Eager — parse/compile
        errors surface before execution, like `_validate/query`
        (ref ElasticIndex.java:734-782)."""
        size = None
        text = query.strip()
        if text.startswith("{"):
            node, size = es_dsl.parse(text)
        else:
            node = query_string.parse(text)
        pred, score = Compiler(docs, default_field).compile(node)
        return pred, score, size

    def validate(self, table: str, query: str,
                 default_field: str | None = None) -> str | None:
        """Return an error message, or None if the query is valid
        (``validate-queries`` semantics; admin verbs skip validation,
        ref ElasticIndexTest.java:171-301)."""
        qmd = QueryMetaData.parse(query)
        if qmd.query.startswith("#"):
            return None  # admin commands are not validated
        try:
            self.parse(self._docs[table], qmd.query, default_field)
            return None
        except Exception as e:  # noqa: BLE001 — surface any compile error
            return str(e)

    def search(self, table: str, query: str,
               default_field: str | None = None,
               limit: int | None = None) -> DataFrame:
        """Full search path. Returns, per hit:

        - ``load-rows`` default: base-table row + ``_score``  (J1 join)
        - ``load-rows=false``: PK/CK columns + ``_score`` only (fake-row
          mode, ref FakePartitionIterator.java:91-119)
        - ``load-source=true``: full document columns + ``_score``
        """
        admin = self._admin(table, query)
        if admin is not None:
            return admin
        base, spec = self.catalog.get(table)
        docs = self._docs[table]
        qmd = QueryMetaData.parse(query)
        pred, score, size = self.parse(docs, qmd.query, default_field)

        cfg = spec.config()
        k = limit if limit is not None else (size if size is not None else cfg.max_results)
        keys = spec.key_columns

        hits = (docs.where(pred)
                    .withColumn(SCORE, score)
                    # deterministic top-k: score desc, then full key asc
                    .orderBy(F.desc(SCORE), *[F.asc(c) for c in keys])
                    .limit(k))

        if qmd.load_source:
            result = hits
        elif not qmd.load_rows:
            result = hits.select(*keys, SCORE)
        else:
            # J1 — hits ⋈ base on the full primary key. The hit set is
            # capped at max-results (10k default) so it is always
            # broadcastable; ghost rows drop out naturally via the inner
            # join (ref StreamingPartitionIterator.java:102-140).
            hit_keys = F.broadcast(hits.select(*keys, SCORE))
            result = base.join(hit_keys, on=keys, how="inner")

        if qmd.options.get("metadata", "false").lower() == "true":
            # Global search metadata as a JSON column on every row. The
            # reference smuggles this into the FIRST row's dummy index
            # column (ref StreamingPartitionIterator.java:146-173); a
            # DataFrame has no "first row", so every row carries it.
            # total/max reflect ALL matches, not the top-k cap (hits.total
            # semantics, ref README.md:199-203).
            meta = (docs.where(pred).select(score)
                        .agg(F.count("*").alias("total_hits"),
                             F.max(SCORE).alias("max_score"))
                        .select(F.to_json(F.struct("total_hits", "max_score"))
                                 .alias("_metadata")))
            result = result.crossJoin(F.broadcast(meta))
        return result

    def term_search(self, table: str, terms: list[str],
                    field: str | None = None, mode: str = "any") -> DataFrame:
        """Selective term lookup through the inverted postings index
        (SURVEY.md §4 item 2) instead of a corpus scan.

        The postings DataFrame is built once per (table, field) and cached;
        on a cluster it would be a bucketed table
        (``postings.write_postings``). Results match the scan path for
        whole-token terms (oracle-checked by ``search_postings_term``).
        """
        from cassandra_es_index_spark.search.postings import (
            build_postings, lookup_terms,
        )

        _, spec = self.catalog.get(table)
        docs = self._docs[table]
        fld = field or Compiler(docs).default_field
        key = (table, fld)
        if key not in self._postings:
            self._postings[key] = build_postings(
                docs, spec.key_columns[0] if len(spec.key_columns) == 1 else DOC_ID,
                fld).cache()
        return lookup_terms(self._postings[key], [t.lower() for t in terms], mode)

    def search_metadata(self, table: str, query: str,
                        default_field: str | None = None) -> DataFrame:
        """Global search metadata: total hit count + max score
        (ref README.md:199-203 — ``hits.total`` / ``max_score`` surfaced in
        the metadata column)."""
        docs = self._docs[table]
        qmd = QueryMetaData.parse(query)
        pred, score, _ = self.parse(docs, qmd.query, default_field)
        return (docs.where(pred)
                    .select(score)
                    .agg(F.count("*").alias("total_hits"),
                         F.max(SCORE).alias("max_score")))
