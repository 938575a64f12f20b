"""Scalar-function surface of the engine (SURVEY.md §2.7).

``json_utils``  — pure-Python JSON helpers with reference-parity semantics
                  (flatten, dotted→structured, path get/filter/merge).
``dates``       — ISO-8601 GMT formatting Columns.
``text``        — tokenization, token counting, quality scoring, language
                  ID, document fingerprinting (north-star text analysis).
"""
