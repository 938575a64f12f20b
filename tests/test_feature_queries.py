"""ES ``script`` (filter), ``rank_feature``, ``distance_feature``
queries (round-9). The reference forwards any query DSL verbatim to ES
(ref ElasticIndex.java:663-667); these are the remaining scoring-query
kinds of that surface.

ES parity targets:
- script query: filter-context boolean script over doc values; a
  non-boolean script is an error (engine: typed DslError at parse);
  null evaluation (null ref, 0 divisor) filters the doc out.
- rank_feature: only docs with a POSITIVE feature match; saturation
  v/(v+pivot), log ln(s+v), sigmoid v^e/(v^e+pivot^e), linear v; boost
  multiplies. The engine requires an explicit saturation pivot
  (documented deviation — no index-statistic defaults).
- distance_feature: only docs with the field match; score =
  boost·pivot/(pivot+dist); date fields use |value−origin| millis with
  date-math origins and duration pivots, geo fields haversine meters
  with distance-unit pivots.
"""

import json
import math

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.search.compile import CompileError
from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError

from tests.test_geo import hav_m

DAY_MS = 86400000.0


@pytest.fixture(scope="module")
def feat_engine(spark):
    eng = SearchEngine(spark)
    df = (spark.createDataFrame(
        [("a", "spark rules", 100, "2024-01-19 00:00:00", 3.0,
          57.64911, 10.40744),
         ("b", "spark", 400, "2024-01-10 00:00:00", 0.0,
          57.70000, 10.50000),
         ("c", "spark", None, "2023-12-01 00:00:00", None,
          None, None),
         ("d", "other", 100, "2024-01-20 00:00:00", 9.0,
          40.71280, -74.00600)],
        "id string, text string, n int, ts string, pr double, "
        "lat double, lon double")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("id", "text", "n", "ts", "pr",
                F.struct("lat", "lon").alias("loc")))
    eng.register(df, TableSpec("feat", ["id"]))
    return eng


def _rows(eng, q, **kw):
    out = eng.search("feat", "#options:load-rows=false#" + json.dumps(q),
                     default_field="text", **kw)
    return {r["id"]: r["_score"] for r in out.collect()}


# ------------------------------------------------------------- script

def test_script_filter_matches_boolean(feat_engine):
    got = _rows(feat_engine,
                {"query": {"script": {"script":
                                      {"source": "doc['n'].value > 150"}}}})
    assert got == {"b": 1}


def test_script_filter_null_ref_no_match(feat_engine):
    # c has null n: painless would NPE; the engine's contract is
    # null → no match (same rule as terms_set null thresholds)
    got = _rows(feat_engine,
                {"query": {"script": {"script":
                                      {"source": "doc['n'].value >= 100"}}}})
    assert got == {"a": 1, "b": 1, "d": 1}


def test_script_filter_zero_divisor_no_match(feat_engine):
    # 100/(n-100): divisor 0 for a and d → try_divide NULL → no match
    src = "100 / (doc['n'].value - 100) > 0.1"
    got = _rows(feat_engine, {"query": {"script": {"script":
                                                   {"source": src}}}})
    assert got == {"b": 1}


def test_script_filter_arithmetic_only_rejected(feat_engine):
    with pytest.raises(DslError, match="must return a boolean"):
        _rows(feat_engine,
              {"query": {"script": {"script":
                                    {"source": "doc['n'].value + 1"}}}})


def test_script_filter_unknown_field_typed(feat_engine):
    with pytest.raises(CompileError):
        _rows(feat_engine,
              {"query": {"script": {"script":
                                    {"source": "doc['nope'].value > 1"}}}})


def test_script_filter_composes_in_bool(feat_engine):
    got = _rows(feat_engine, {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "filter": [{"script": {"script":
                               {"source": "doc['n'].value < 200"}}}]}}})
    assert got == {"a": 1}


# -------------------------------------------------------- rank_feature

def test_rank_feature_saturation(feat_engine):
    got = _rows(feat_engine,
                {"query": {"rank_feature": {"field": "pr",
                                            "saturation": {"pivot": 3}}}})
    # b (pr=0) and c (null) never match — positive features only
    assert set(got) == {"a", "d"}
    assert got["a"] == pytest.approx(3.0 / 6.0)
    assert got["d"] == pytest.approx(9.0 / 12.0)


def test_rank_feature_log_sigmoid_linear_boost(feat_engine):
    log = _rows(feat_engine,
                {"query": {"rank_feature":
                           {"field": "pr",
                            "log": {"scaling_factor": 1}}}})
    assert log["d"] == pytest.approx(math.log(10.0))
    sig = _rows(feat_engine,
                {"query": {"rank_feature":
                           {"field": "pr", "boost": 2,
                            "sigmoid": {"pivot": 3, "exponent": 2}}}})
    assert sig["a"] == pytest.approx(2 * 9.0 / 18.0)
    assert sig["d"] == pytest.approx(2 * 81.0 / 90.0)
    lin = _rows(feat_engine,
                {"query": {"rank_feature": {"field": "pr",
                                            "linear": {}}}})
    assert lin == {"a": pytest.approx(3.0), "d": pytest.approx(9.0)}


def test_rank_feature_in_should_adds_to_match_score(feat_engine):
    # the production shape: match gates, rank_feature boosts
    got = _rows(feat_engine, {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "should": [{"rank_feature": {"field": "pr",
                                     "saturation": {"pivot": 3}}}]}}})
    assert got["a"] == pytest.approx(1 + 0.5)
    assert got["b"] == pytest.approx(1.0)   # pr=0: no boost, still matches
    assert got["c"] == pytest.approx(1.0)


def test_rank_feature_typed_errors(feat_engine):
    for q, pat in [
        ({"rank_feature": {"field": "pr"}}, "needs 'pivot'"),
        ({"rank_feature": {"field": "pr", "log": {"scaling_factor": 0.5}}},
         ">= 1.0"),
        ({"rank_feature": {"field": "pr", "saturation": {"pivot": 0}}},
         "> 0"),
        ({"rank_feature": {"field": "pr", "saturation": {"pivot": 1},
                           "log": {"scaling_factor": 2}}},
         "at most one"),
        ({"rank_feature": {"field": "pr", "linear": {"pivot": 1}}},
         "no parameters"),
        ({"rank_feature": {"field": "pr", "nope": 1}}, "unknown"),
    ]:
        with pytest.raises(DslError, match=pat):
            _rows(feat_engine, {"query": q})
    with pytest.raises(CompileError, match="numeric"):
        _rows(feat_engine, {"query": {"rank_feature":
                                      {"field": "text",
                                       "saturation": {"pivot": 1}}}})


# ---------------------------------------------------- distance_feature

def test_distance_feature_date(feat_engine):
    got = _rows(feat_engine,
                {"query": {"distance_feature":
                           {"field": "ts",
                            "origin": "2024-01-20 00:00:00",
                            "pivot": "10d"}}})
    p = 10 * DAY_MS
    assert got["d"] == pytest.approx(1.0)
    assert got["a"] == pytest.approx(p / (p + DAY_MS))
    assert got["b"] == pytest.approx(0.5)
    assert got["c"] == pytest.approx(p / (p + 50 * DAY_MS))


def test_distance_feature_date_math_origin(feat_engine):
    # now-anchored origin resolves through the injectable now, like
    # range bounds (#now# option pins the anchor)
    out = feat_engine.search(
        "feat",
        '#options:load-rows=false,now=2024-01-20T00:00:00#'
        + json.dumps({"query": {"distance_feature":
                                {"field": "ts", "origin": "now/d",
                                 "pivot": "10d"}}}),
        default_field="text")
    got = {r["id"]: r["_score"] for r in out.collect()}
    assert got["d"] == pytest.approx(1.0)
    assert got["b"] == pytest.approx(0.5)


def test_distance_feature_geo(feat_engine):
    got = _rows(feat_engine,
                {"query": {"distance_feature":
                           {"field": "loc",
                            "origin": [10.40744, 57.64911],  # lon, lat
                            "pivot": "10km", "boost": 3}}})
    assert set(got) == {"a", "b", "d"}   # c's null point never matches
    assert got["a"] == pytest.approx(3.0)
    d_b = hav_m(57.64911, 10.40744, 57.7, 10.5)
    assert got["b"] == pytest.approx(3 * 10000.0 / (10000.0 + d_b))
    d_d = hav_m(57.64911, 10.40744, 40.7128, -74.006)
    assert got["d"] == pytest.approx(3 * 10000.0 / (10000.0 + d_d))


def test_distance_feature_boosts_matches(feat_engine):
    got = _rows(feat_engine, {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "should": [{"distance_feature":
                    {"field": "ts", "origin": "2024-01-20 00:00:00",
                     "pivot": "10d"}}]}}})
    assert got["a"] == pytest.approx(1 + 10.0 / 11.0)
    assert got["b"] == pytest.approx(1.5)


def test_distance_feature_typed_errors(feat_engine):
    with pytest.raises(DslError, match="needs"):
        _rows(feat_engine, {"query": {"distance_feature":
                                      {"field": "ts", "origin": "now"}}})
    with pytest.raises(DslError, match="unknown"):
        _rows(feat_engine, {"query": {"distance_feature":
                                      {"field": "ts", "origin": "now",
                                       "pivot": "1d", "nope": 1}}})
    # numeric field: neither date nor geo_point
    with pytest.raises(CompileError, match="date or geo_point"):
        _rows(feat_engine, {"query": {"distance_feature":
                                      {"field": "n", "origin": 0,
                                       "pivot": "1d"}}})
    # geo origin against a date field
    with pytest.raises(CompileError, match="geo point"):
        _rows(feat_engine, {"query": {"distance_feature":
                                      {"field": "ts",
                                       "origin": [10.0, 57.0],
                                       "pivot": "1d"}}})
    # bad duration / bad distance unit
    with pytest.raises((DslError, CompileError)):
        _rows(feat_engine, {"query": {"distance_feature":
                                      {"field": "ts", "origin": "now",
                                       "pivot": "10parsecs"}}})


def test_fractional_score_dtype(feat_engine):
    out = feat_engine.search(
        "feat", "#options:load-rows=false#" + json.dumps(
            {"query": {"rank_feature": {"field": "pr",
                                        "saturation": {"pivot": 3}}}}),
        default_field="text")
    assert dict(out.dtypes)["_score"] == "double"
    out2 = feat_engine.search(
        "feat", "#options:load-rows=false#" + json.dumps(
            {"query": {"script": {"script":
                                  {"source": "doc['n'].value > 0"}}}}),
        default_field="text")
    assert dict(out2.dtypes)["_score"] == "bigint"


# ------------------------------------------- retriever.rrf (r11)

@pytest.fixture(scope="module")
def rrf_engine(spark):
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("text", T.StringType()),
                           T.StructField("emb",
                                         T.ArrayType(T.FloatType()))])
    rows = [(1, "spark fast", [1.0, 0.0]),
            (2, "spark slow", [0.9, 0.1]),
            (3, "other text", [1.0, 0.05]),
            (4, "spark spark spark", [0.0, 1.0])]
    eng = SearchEngine(spark)
    eng.register(spark.createDataFrame(rows, schema),
                 TableSpec("rrft", ["id"]))
    return eng


def test_rrf_hand_computed_fusion(rrf_engine):
    # standard tf ranking: 4 (tf 3), 1, 2 (ties by id);
    # knn cosine to [1,0]: 1 (1.0), 3 (~.9988), 2 (~.9939)
    # rrf k=60: 1 → 1/62+1/61, 2 → 2/63, 4 → 1/61, 3 → 1/62
    q = json.dumps({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "spark"}}}},
        {"knn": {"field": "emb", "query_vector": [1.0, 0.0], "k": 3}}],
        "rank_constant": 60, "rank_window_size": 3}}})
    out = rrf_engine.search("rrft", "#options:load-rows=false#" + q)
    got = [(r["id"], round(r["_score"], 9)) for r in out.collect()]
    want = [(1, round(1 / 62 + 1 / 61, 9)), (2, round(2 / 63, 9)),
            (4, round(1 / 61, 9)), (3, round(1 / 62, 9))]
    assert got == want


def test_rrf_window_and_size(rrf_engine):
    # window 1 keeps only each retriever's top hit; size truncates
    q = json.dumps({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "spark"}}}},
        {"knn": {"field": "emb", "query_vector": [1.0, 0.0], "k": 3}}],
        "rank_window_size": 1}}, "size": 1})
    out = rrf_engine.search("rrft", "#options:load-rows=false#" + q)
    got = [(r["id"], round(r["_score"], 9)) for r in out.collect()]
    # doc 1 is knn top-1 (1/61); doc 4 standard top-1 (1/61) — tie,
    # id asc, size 1 keeps doc 1
    assert got == [(1, round(1 / 61, 9))]


def test_rrf_row_load_mode(rrf_engine):
    q = json.dumps({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "spark"}}}},
        {"standard": {"query": {"match": {"text": "other"}}}}],
    }}, "size": 2})
    out = rrf_engine.search("rrft", q)     # default row-load mode
    assert set(out.columns) == {"id", "text", "emb", "_score"}
    assert out.count() == 2


@pytest.mark.parametrize("body,msg", [
    ({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match_all": {}}}}]}}},
     "two or more"),
    ({"retriever": {"bm25f": {}}}, "'rrf' and 'linear' kinds"),
    ({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match_all": {}}}},
        {"rescorer": {}}]}}}, "retriever kind"),
    ({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match_all": {}}}},
        {"standard": {"query": {"match_all": {}}}}],
        "rank_constant": 0}}}, "positive"),
    ({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match_all": {}}}},
        {"standard": {"query": {"match_all": {}}}}]}},
      "sort": [{"id": "asc"}]}, "cannot combine"),
    ({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match_all": {}},
                      "filter": {"term": {"text": "x"}}}},
        {"standard": {"query": {"match_all": {}}}}]}}},
     "'query' only"),
])
def test_rrf_typed_errors(rrf_engine, body, msg):
    with pytest.raises(DslError, match=msg):
        rrf_engine.search("rrft", json.dumps(body)).collect()


def test_rrf_count_and_aggs_reject(rrf_engine):
    q = json.dumps({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match_all": {}}}},
        {"standard": {"query": {"match_all": {}}}}]}}})
    with pytest.raises(DslError, match="search\\(\\)-only"):
        rrf_engine.count("rrft", q)


def test_linear_retriever_minmax_and_weights(rrf_engine):
    # two standard retrievers, minmax within each window: spark-match
    # scores (4:3, 1:1, 2:1) → 4:1.0, 1:0.0, 2:0.0; other-match is a
    # degenerate window (one doc) → 3:1.0
    q = json.dumps({"retriever": {"linear": {"retrievers": [
        {"retriever": {"standard": {"query": {"match":
                                              {"text": "spark"}}}},
         "normalizer": "minmax"},
        {"retriever": {"standard": {"query": {"match":
                                              {"text": "other"}}}},
         "normalizer": "minmax"}],
        "rank_window_size": 5}}, "size": 5})
    out = rrf_engine.search("rrft", "#options:load-rows=false#" + q)
    got = [(r["id"], r["_score"]) for r in out.collect()]
    assert got == [(3, 1.0), (4, 1.0), (1, 0.0), (2, 0.0)]

    # weights without normalization: score = 2·tf + 1·tf_other
    q2 = json.dumps({"retriever": {"linear": {"retrievers": [
        {"retriever": {"standard": {"query": {"match":
                                              {"text": "spark"}}}},
         "weight": 2.0},
        {"retriever": {"standard": {"query": {"match":
                                              {"text": "text"}}}}}],
        "rank_window_size": 5}}, "size": 5})
    out2 = rrf_engine.search("rrft", "#options:load-rows=false#" + q2)
    got2 = {r["id"]: r["_score"] for r in out2.collect()}
    assert got2 == {4: 6.0, 1: 2.0, 2: 2.0, 3: 1.0}


@pytest.mark.parametrize("body,msg", [
    ({"retriever": {"linear": {"retrievers": [
        {"retriever": {"standard": {"query": {"match_all": {}}}},
         "normalizer": "l2_norm"},
        {"retriever": {"standard": {"query": {"match_all": {}}}}}]}}},
     "none/minmax"),
    ({"retriever": {"linear": {"retrievers": [
        {"retriever": {"standard": {"query": {"match_all": {}}}},
         "weight": 0},
        {"retriever": {"standard": {"query": {"match_all": {}}}}}]}}},
     "positive number"),
    ({"retriever": {"linear": {"retrievers": [
        {"standard": {"query": {"match_all": {}}}},
        {"retriever": {"standard": {"query": {"match_all": {}}}}}]}}},
     "needs"),
])
def test_linear_retriever_typed_errors(rrf_engine, body, msg):
    with pytest.raises(DslError, match=msg):
        rrf_engine.search("rrft", json.dumps(body)).collect()


def test_rrf_window_defaults_to_size(rrf_engine):
    # r12 (ADVICE): no explicit rank_window_size + size=4 must fuse each
    # retriever's top-4 (ES defaults window to size), not top-10-vs-
    # silent-top-10 — and, critically, not a silent top-10 ranking when
    # size exceeds 10. With window=size=4 every doc appears in both
    # retriever windows, so doc 3 gets a standard-rank contribution it
    # would NOT get at window 3.
    q = json.dumps({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "spark"}}}},
        {"knn": {"field": "emb", "query_vector": [1.0, 0.0], "k": 4}}],
        "rank_constant": 60}}, "size": 4})
    out = rrf_engine.search("rrft", "#options:load-rows=false#" + q)
    got = [(r["id"], round(r["_score"], 9)) for r in out.collect()]
    # standard tf: 4,1,2 then non-matching (3) rank 4 in knn only;
    # knn cosine ranks: 1,3,2,4
    want = sorted([(1, 1 / 62 + 1 / 61), (2, 1 / 63 + 1 / 63),
                   (4, 1 / 61 + 1 / 64), (3, 1 / 62)],
                  key=lambda p: (-p[1], p[0]))
    assert got == [(i, round(s, 9)) for i, s in want]


def test_rrf_window_below_size_typed_rejects(rrf_engine):
    q = json.dumps({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match_all": {}}}},
        {"standard": {"query": {"match_all": {}}}}],
        "rank_window_size": 2}}, "size": 5})
    with pytest.raises(DslError, match="must be >= size"):
        rrf_engine.search("rrft", q).collect()
    q2 = json.dumps({"retriever": {"linear": {"retrievers": [
        {"retriever": {"standard": {"query": {"match_all": {}}}}},
        {"retriever": {"standard": {"query": {"match_all": {}}}}}],
        "rank_window_size": 2}}, "size": 5})
    with pytest.raises(DslError, match="must be >= size"):
        rrf_engine.search("rrft", q2).collect()


def test_retriever_source_filter_applies(rrf_engine):
    # r12 (ADVICE): `_source` beside `retriever` was accepted but
    # silently ignored — now it projects the fused result
    q = json.dumps({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "spark"}}}},
        {"standard": {"query": {"match": {"text": "other"}}}}],
    }}, "size": 2, "_source": ["text"]})
    out = rrf_engine.search("rrft", q)     # row-load mode
    assert set(out.columns) == {"id", "text", "_score"}
    q_false = json.dumps({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "spark"}}}},
        {"standard": {"query": {"match": {"text": "other"}}}}],
    }}, "size": 2, "_source": False})
    out2 = rrf_engine.search("rrft", q_false)
    assert set(out2.columns) == {"id", "_score"}


# -- sparse_vector (r12) ---------------------------------------------------


def test_sparse_vector_weighted_term_sum(feat_engine):
    # score = Σ_token weight × tf; docs matching any token qualify
    # ("spark rules" tf 1 each → 2.0 + 0.5; "spark" → 2.0; "other" out)
    body = {"query": {"sparse_vector": {
        "field": "text",
        "query_vector": {"spark": 2.0, "rules": 0.5}}}, "size": 10}
    rows = {r["id"]: r["_score"] for r in feat_engine.search(
        "feat", "#options:load-rows=false#" + json.dumps(body)).collect()}
    assert rows == {"a": 2.5, "b": 2.0, "c": 2.0}


def test_sparse_vector_composes_and_boosts(feat_engine):
    body = {"query": {"bool": {
        "must": [{"sparse_vector": {
            "field": "text", "query_vector": {"spark": 1.0},
            "boost": 3.0}}],
        "filter": [{"term": {"id": "b"}}]}}, "size": 10}
    rows = feat_engine.search(
        "feat", "#options:load-rows=false#" + json.dumps(body)).collect()
    assert [(r["id"], r["_score"]) for r in rows] == [("b", 3.0)]


def test_sparse_vector_typed_errors(feat_engine):
    cases = [
        ({"sparse_vector": {"field": "text"}}, "query_vector"),
        ({"sparse_vector": {"field": "text", "query_vector": {}}},
         "query_vector"),
        ({"sparse_vector": {"field": "text",
                            "query_vector": {"a": 0}}}, "positive"),
        ({"sparse_vector": {"field": "text", "query_vector": {"a": 1},
                            "inference_id": "m"}}, "unsupported keys"),
        ({"sparse_vector": {"field": "text", "query_vector": {"a": 1},
                            "prune": True}}, "unsupported keys"),
    ]
    for q, frag in cases:
        with pytest.raises(DslError, match=frag):
            feat_engine.search(
                "feat",
                "#options:load-rows=false#" + json.dumps({"query": q}))


# -- knn rescore_vector (r12) ----------------------------------------------


@pytest.fixture(scope="module")
def rv_engine(spark):
    from cassandra_es_index_spark.search.engine import SearchEngine
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(1, 51)],
        "id bigint, emb array<double>")
    eng.register(df, TableSpec("rvv", ["id"]))
    return eng


def _rv_search(eng, knn):
    body = {"knn": knn, "size": 10}
    return eng.search("rvv",
                      "#options:load-rows=false#" + json.dumps(body))


def test_rescore_vector_matches_exact_at_generous_oversample(rv_engine):
    # UNNORMALIZED corpus (growing norms — the case where a raw
    # dot-product prefilter mis-ranks): the in-plan normalization must
    # make the two-stage reproduce the exact top-k, ids AND scores
    base = {"field": "emb", "query_vector": [3.0, 1.0, 0.5], "k": 5}
    exact = sorted((r["id"], r["_score"]) for r in
                   _rv_search(rv_engine, base).collect())
    two = sorted((r["id"], r["_score"]) for r in _rv_search(
        rv_engine, {**base, "rescore_vector":
                    {"oversample": 3.0}}).collect())
    assert exact == two
    assert [i for i, _ in exact] == [2, 3, 4, 5, 6]


def test_rescore_vector_filter_composes(rv_engine):
    knn = {"field": "emb", "query_vector": [3.0, 1.0, 0.5], "k": 5,
           "rescore_vector": {"oversample": 2},
           "filter": {"range": {"id": {"lte": 10}}}}
    rows = _rv_search(rv_engine, knn).collect()
    assert len(rows) == 5 and all(r["id"] <= 10 for r in rows)


def test_rescore_vector_typed_errors(rv_engine):
    base = {"field": "emb", "query_vector": [1.0, 1.0, 0.5], "k": 5}
    cases = [
        ({**base, "rescore_vector": {"oversample": 0.5}},
         r"\[1, 10\]"),
        ({**base, "rescore_vector": {"x": 1}}, "oversample"),
        ({**base, "rescore_vector": {"oversample": 2},
          "method": "lsh"}, "exact method"),
        ({**base, "query_vector_builder": {}}, "unsupported params"),
    ]
    for knn, frag in cases:
        with pytest.raises(DslError, match=frag):
            _rv_search(rv_engine, knn).collect()


# -- nested retriever trees (r12) ------------------------------------------


@pytest.fixture(scope="module")
def tree_engine(spark):
    from cassandra_es_index_spark.search.engine import SearchEngine
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [(1, "spark fast engine", 10.0), (2, "spark slow", 50.0),
         (3, "engine room", 30.0), (4, "fast engine spark spark", 5.0),
         (5, "other", 99.0)], "id bigint, text string, v double")
    eng.register(df, TableSpec("rtree", ["id"]))
    return eng


def test_linear_of_linear_hand_weights(tree_engine):
    # inner linear (weight 2): fast {1,4} + engine {1,3,4} → {1:2,
    # 4:2, 3:1}; outer adds spark tf (1:1, 2:1, 4:2) →
    # {4:6, 1:5, 3:2, 2:1}
    body = {"retriever": {"linear": {"retrievers": [
        {"retriever": {"linear": {"retrievers": [
            {"retriever": {"standard": {"query": {
                "term": {"text": "fast"}}}}, "weight": 1.0},
            {"retriever": {"standard": {"query": {
                "term": {"text": "engine"}}}}, "weight": 1.0}],
            "rank_window_size": 10}}, "weight": 2.0},
        {"retriever": {"standard": {"query": {
            "term": {"text": "spark"}}}}, "weight": 1.0}],
        "rank_window_size": 10}}, "size": 10}
    rows = [(r["id"], r["_score"]) for r in tree_engine.search(
        "rtree",
        "#options:load-rows=false#" + json.dumps(body)).collect()]
    assert rows == [(4, 6.0), (1, 5.0), (3, 2.0), (2, 1.0)]


def test_rrf_of_rrf_runs_and_ranks(tree_engine):
    body = {"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"term": {"text": "spark"}}}},
        {"rrf": {"retrievers": [
            {"standard": {"query": {"term": {"text": "engine"}}}},
            {"standard": {"query": {"range": {"v": {"gte": 30}}}}}],
            "rank_window_size": 10}}],
        "rank_window_size": 10}}, "size": 10}
    rows = [r["id"] for r in tree_engine.search(
        "rtree",
        "#options:load-rows=false#" + json.dumps(body)).collect()]
    # docs in BOTH branches lead; hand check: 1 (rank1+rank3-ish)
    assert rows[0] == 1 and set(rows) == {1, 2, 3, 4, 5}


def test_retriever_tree_depth_cap_typed(tree_engine):
    deep = {"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"term": {"text": "spark"}}}},
        {"rrf": {"retrievers": [
            {"standard": {"query": {"term": {"text": "engine"}}}},
            {"rrf": {"retrievers": [
                {"standard": {"query": {"term": {"text": "fast"}}}},
                {"standard": {"query": {"term": {"text": "room"}}}}],
                "rank_window_size": 10}}],
            "rank_window_size": 10}}],
        "rank_window_size": 10}}}
    with pytest.raises(DslError, match="at most one level"):
        tree_engine.search(
            "rtree", "#options:load-rows=false#" + json.dumps(deep))
