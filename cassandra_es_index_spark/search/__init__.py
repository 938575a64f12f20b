"""Search surface (SURVEY.md §2.2, §3.1).

``query_string`` — Lucene-ish query-string mini-parser → AST
                   (ref ElasticIndex.java:663-665, README.md:179,731)
``es_dsl``       — ES query-DSL subset (term/range/bool/match/query_string)
                   → the same AST (ref ElasticIndex.java:663-667)
``compile``      — AST → Catalyst (predicate Column, score Column)
``engine``       — SearchEngine: options prefix, admin verbs, top-k,
                   hits⋈base join, fake-row mode
"""

from cassandra_es_index_spark.search.engine import SearchEngine

__all__ = ["SearchEngine"]
