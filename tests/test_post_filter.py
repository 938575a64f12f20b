"""ES ``post_filter`` + ``track_total_hits`` (round-9).

The reference forwards search bodies to ES verbatim (ref
ElasticIndex.java:663-667), so both are reference surface. Contracts:

- post_filter narrows the HIT LIST but scores stay those of ``query``
  alone (the faceted-navigation idiom); both plans (scan and
  postings-served) agree.
- hits.total (the ``#options:metadata=true#`` payload) reflects
  min_score AND post_filter, but ignores collapse/paging — ES
  hits.total semantics.
- search_aggs IGNORES post_filter: aggregations keep the query scope.
- track_total_hits: True = exact (engine default, documented deviation
  from ES's 10000 default cap), False = no total, int N = capped count
  with a "relation" marker ("gte" when the cap binds, else "eq").
- knn + post_filter is a typed error (ES knn filtering is a
  pre-filter); post_filter date-math resolves like any range.
"""

import json

import pytest

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "spark spark", 100), ("b", "spark", 500),
         ("c", "spark spark spark", 450), ("d", "other", 999)],
        "id string, text string, n int")
    e.register(df, TableSpec("pf", ["id"]))
    return e


PF = ('{"query":{"term":{"text":"spark"}},'
      '"post_filter":{"range":{"n":{"gte":300}}}}')


def _rows(df):
    return {r["id"]: r["_score"] for r in df.collect()}


def test_post_filter_narrows_hits_but_not_scores(eng):
    base = _rows(eng.search("pf", '{"query":{"term":{"text":"spark"}}}',
                            default_field="text"))
    pf = _rows(eng.search("pf", PF, default_field="text"))
    assert set(base) == {"a", "b", "c"}
    assert set(pf) == {"b", "c"}
    # scores are the query scores, untouched by the filter
    assert pf == {k: v for k, v in base.items() if k in pf}


def test_post_filter_served_plan_matches_scan(eng):
    # builds the postings index; later tests in this module run (and
    # further exercise) the served plan — results are plan-invariant
    scan = _rows(eng.search("pf", PF, default_field="text"))
    eng.build_postings_index("pf", "text", materialize=True)
    served = _rows(eng.search("pf", PF, default_field="text"))
    assert served == scan


def test_metadata_total_reflects_post_filter(eng):
    m = (eng.search("pf", "#options:metadata=true#" + PF,
                    default_field="text")
            .select("_metadata").first()[0])
    assert json.loads(m) == {"total_hits": 2, "max_score": 3}


def test_aggs_ignore_post_filter(eng):
    body = ('{"query":{"term":{"text":"spark"}},'
            '"post_filter":{"range":{"n":{"gte":300}}},'
            '"aggs":{"cnt":{"value_count":{"field":"n"}}}}')
    row = eng.search_aggs("pf", body, default_field="text").first()
    assert row["cnt"] == 3  # all query matches, not the 2 post-filtered


def test_track_total_hits_false_omits_total(eng):
    q = PF[:-1] + ',"track_total_hits":false}'
    m = (eng.search("pf", "#options:metadata=true#" + q,
                    default_field="text")
            .select("_metadata").first()[0])
    assert json.loads(m) == {"max_score": 3}


def test_track_total_hits_cap_binds_and_releases(eng):
    q1 = PF[:-1] + ',"track_total_hits":1}'
    m1 = (eng.search("pf", "#options:metadata=true#" + q1,
                     default_field="text")
             .select("_metadata").first()[0])
    assert json.loads(m1) == {"total_hits": 1, "relation": "gte"}
    q9 = PF[:-1] + ',"track_total_hits":9}'
    m9 = (eng.search("pf", "#options:metadata=true#" + q9,
                     default_field="text")
             .select("_metadata").first()[0])
    assert json.loads(m9) == {"total_hits": 2, "relation": "eq"}


def test_post_filter_typed_errors(eng):
    with pytest.raises(DslError, match="post_filter"):
        eng.search("pf", '{"query":{"match_all":{}},"post_filter":[1]}')
    with pytest.raises(DslError, match="track_total_hits"):
        eng.search("pf", '{"query":{"match_all":{}},'
                         '"track_total_hits":-1}')
    with pytest.raises(DslError, match="track_total_hits"):
        eng.search("pf", '{"query":{"match_all":{}},'
                         '"track_total_hits":"yes"}')


def test_post_filter_with_knn_rejected(eng, spark):
    e2 = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "id string, emb array<float>")
    e2.register(df, TableSpec("kv", ["id"]))
    with pytest.raises(DslError, match="post_filter cannot combine"):
        e2.search("kv", '{"knn":{"field":"emb",'
                        '"query_vector":[1.0,0.0],"k":1},'
                        '"post_filter":{"term":{"id":"a"}}}')


def test_post_filter_date_math_resolves(eng, spark):
    e2 = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "x", "2024-01-01 00:00:00"),
         ("b", "x", "2024-03-01 00:00:00")],
        "id string, text string, ts string").selectExpr(
        "id", "text", "cast(ts as timestamp) ts")
    e2.register(df, TableSpec("dm", ["id"]))
    q = ('#options:now=2024-03-02T00:00:00Z#'
         '{"query":{"term":{"text":"x"}},'
         '"post_filter":{"range":{"ts":{"gte":"now-7d"}}}}')
    out = [r["id"] for r in e2.search("dm", q,
                                      default_field="text").collect()]
    assert out == ["b"]
