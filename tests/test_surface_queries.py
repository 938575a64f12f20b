"""ES ``match_bool_prefix``, ``combined_fields``, and ``geo_polygon``
queries (round-9). The reference forwards any query DSL verbatim to ES
(ref ElasticIndex.java:663-667).

- match_bool_prefix desugars to Term leaves + a trailing-star Wildcard
  on the last analyzed token (the search-as-you-type primitive); the
  desugar target is the prefix-served shape, so a postings index serves
  it without a corpus scan.
- combined_fields desugars per-term to an Or over the fields (the
  engine's Or sums matching branch tfs — term-centric combined-field
  frequency; documented deviation: no BM25F weighting).
- geo_polygon is even-odd ray casting as per-edge Column comparisons
  with driver-side slope constants (planar, like ES's legacy
  geo_polygon).
"""

import json

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError


@pytest.fixture(scope="module")
def surf_engine(spark):
    eng = SearchEngine(spark)
    df = (spark.createDataFrame(
        [("a", "quick brown fox", "quick dog", 57.65, 10.41),
         ("b", "quick brown", "slow fox", 57.90, 10.20),
         ("c", "brown fort", None, 40.70, -74.00),
         ("d", "other", "quick fort", None, None)],
        "id string, title string, body string, lat double, lon double")
        .select("id", "title", "body",
                F.struct("lat", "lon").alias("loc")))
    eng.register(df, TableSpec("surf", ["id"]))
    return eng


def _rows(eng, q):
    out = eng.search("surf", "#options:load-rows=false#" + json.dumps(q),
                     default_field="title")
    return {r["id"]: r["_score"] for r in out.collect()}


# --------------------------------------------------- match_bool_prefix

def test_match_bool_prefix_or(surf_engine):
    got = _rows(surf_engine,
                {"query": {"match_bool_prefix":
                           {"title": "quick brown fo"}}})
    # a: quick+brown+fox, b: quick+brown, c: brown+fort (fo* prefix)
    assert got == {"a": 3, "b": 2, "c": 2}


def test_match_bool_prefix_and(surf_engine):
    got = _rows(surf_engine,
                {"query": {"match_bool_prefix":
                           {"title": {"query": "quick brown fo",
                                      "operator": "and"}}}})
    assert got == {"a": 3}


def test_match_bool_prefix_single_token_is_pure_prefix(surf_engine):
    got = _rows(surf_engine,
                {"query": {"match_bool_prefix": {"title": "bro"}}})
    assert got == {"a": 1, "b": 1, "c": 1}


def test_match_bool_prefix_empty_matches_nothing(surf_engine):
    assert _rows(surf_engine,
                 {"query": {"match_bool_prefix": {"title": "  "}}}) == {}


def test_match_bool_prefix_served_from_postings(spark):
    # the desugar target is Term/prefix-Wildcard — the postings plan
    # serves it scan-free, bit-equal to the scan
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "quick brown fox"), ("b", "quick brown"),
         ("c", "brown fort"), ("d", "other")],
        "id string, title string")
    eng.register(df, TableSpec("mbp", ["id"]))
    q = ('#options:load-rows=false#'
         '{"query":{"match_bool_prefix":{"title":"quick fo"}}}')
    scan = {(r["id"], r["_score"])
            for r in eng.search("mbp", q, default_field="title").collect()}
    eng.build_postings_index("mbp", "title")
    served = eng.search("mbp", q, default_field="title")
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "regexp_extract_all" not in plan
    assert {(r["id"], r["_score"]) for r in served.collect()} == scan


def test_match_bool_prefix_errors(surf_engine):
    with pytest.raises(DslError, match="operator"):
        _rows(surf_engine,
              {"query": {"match_bool_prefix":
                         {"title": {"query": "x", "operator": "xor"}}}})
    with pytest.raises(DslError, match="unknown"):
        _rows(surf_engine,
              {"query": {"match_bool_prefix":
                         {"title": {"query": "x", "fuzz": 1}}}})


# ----------------------------------------------------- combined_fields

def test_combined_fields_or_sums_across_fields(surf_engine):
    got = _rows(surf_engine,
                {"query": {"combined_fields":
                           {"query": "quick fox",
                            "fields": ["title", "body"]}}})
    # a: quick(title)+quick(body)+fox(title)=3; b: quick+fox(body)=2;
    # d: quick(body)=1
    assert got == {"a": 3, "b": 2, "d": 1}


def test_combined_fields_and_requires_every_term_somewhere(surf_engine):
    got = _rows(surf_engine,
                {"query": {"combined_fields":
                           {"query": "quick fox",
                            "fields": ["title", "body"],
                            "operator": "and"}}})
    # d has quick but no fox in either field → drops out
    assert got == {"a": 3, "b": 2}


def test_combined_fields_field_boost(surf_engine):
    got = _rows(surf_engine,
                {"query": {"combined_fields":
                           {"query": "quick",
                            "fields": ["title^3", "body"]}}})
    assert got == {"a": 4, "b": 3, "d": 1}


def test_combined_fields_errors(surf_engine):
    with pytest.raises(DslError, match="non-empty"):
        _rows(surf_engine, {"query": {"combined_fields":
                                      {"query": "x", "fields": []}}})
    with pytest.raises(DslError, match="unknown"):
        _rows(surf_engine,
              {"query": {"combined_fields":
                         {"query": "x", "fields": ["title"],
                          "minimum_should_match": 1}}})
    assert _rows(surf_engine,
                 {"query": {"combined_fields":
                            {"query": "", "fields": ["title"]}}}) == {}


# --------------------------------------------------------- geo_polygon

POLY = [{"lat": 57.0, "lon": 10.0}, {"lat": 58.0, "lon": 10.0},
        {"lat": 58.0, "lon": 10.45}, {"lat": 57.0, "lon": 10.45}]


def test_geo_polygon_inside_outside_null(surf_engine):
    got = _rows(surf_engine,
                {"query": {"geo_polygon": {"loc": {"points": POLY}}}})
    # a (57.65, 10.41) and b (57.9, 10.2) inside; c NYC outside;
    # d null point drops out
    assert got == {"a": 1, "b": 1}


def test_geo_polygon_closed_ring_equivalent(surf_engine):
    closed = POLY + [POLY[0]]
    got = _rows(surf_engine,
                {"query": {"geo_polygon": {"loc": {"points": closed}}}})
    assert got == {"a": 1, "b": 1}


def test_geo_polygon_triangle_and_bool_compose(surf_engine):
    tri = [[10.0, 57.0], [11.0, 57.0], [10.5, 58.0]]  # [lon, lat]
    got = _rows(surf_engine, {"query": {"bool": {
        "must": [{"term": {"title": "quick"}}],
        "filter": [{"geo_polygon": {"loc": {"points": tri}}}]}}})
    # a (57.65, 10.41) inside the triangle; b (57.9, 10.2) is outside
    # (left edge at lat 57.9 sits at lon ≈ 10.45)
    assert got == {"a": 1}


def test_geo_polygon_concave(surf_engine):
    # concave "notch" polygon: the notch excludes a, keeps b
    pts = [{"lat": 57.0, "lon": 10.0}, {"lat": 58.0, "lon": 10.0},
           {"lat": 58.0, "lon": 10.45}, {"lat": 57.5, "lon": 10.30},
           {"lat": 57.0, "lon": 10.45}]
    got = _rows(surf_engine,
                {"query": {"geo_polygon": {"loc": {"points": pts}}}})
    assert got == {"b": 1}


def test_geo_polygon_errors(surf_engine):
    with pytest.raises(DslError, match="at least 3"):
        _rows(surf_engine,
              {"query": {"geo_polygon":
                         {"loc": {"points": [[10, 57], [11, 57]]}}}})
    with pytest.raises(DslError, match="bad geo point"):
        _rows(surf_engine,
              {"query": {"geo_polygon":
                         {"loc": {"points": [[10, 57], [11, 57],
                                             "nope"]}}}})
    with pytest.raises(DslError, match="points"):
        _rows(surf_engine, {"query": {"geo_polygon": {"loc": {}}}})
