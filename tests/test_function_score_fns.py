"""function_score beyond field_value_factor (round-7): script_score via
the painless arithmetic subset, gauss/linear/exp decay as closed-form
Column math, and seeded random_score.

ES semantics covered (FunctionScoreQueryBuilder + DecayFunctionBuilder):
decay pivots σ² = −scale²/(2·ln decay), λ = ln(decay)/scale,
s = scale/(1−decay); origin defaults to ``now`` on date fields and
resolves through the engine's injectable now like range bounds; docs
missing the field take function value 1.0. Trees carrying a fractional
scorer keep DOUBLE scores (a long cast would truncate the [0,1] decay
range to nothing); legacy trees keep the long tf-count contract.
"""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_es_index_spark.search.compile import CompileError
from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError, parse_request


@pytest.fixture(scope="module")
def fs_engine(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "spark spark", 100, "2024-01-19 00:00:00"),
         ("b", "spark", 400, "2024-01-10 00:00:00"),
         ("c", "spark", None, "2023-12-01 00:00:00"),
         ("d", "other", 100, "2024-01-20 00:00:00")],
        "id string, text string, n int, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    eng.register(df, TableSpec("fs_docs", ["id"]))
    return eng


def _rows(eng, q, opts="#options:load-rows=false#"):
    out = eng.search("fs_docs", opts + q, default_field="text")
    return {r["id"]: r["_score"] for r in out.collect()}, out


GAUSS_Q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
           '"gauss":{"n":{"origin":100,"scale":200,"decay":0.5}},'
           '"boost_mode":"multiply"}}}')


def test_gauss_numeric_closed_form(fs_engine):
    got, out = _rows(fs_engine, GAUSS_Q)
    assert isinstance(out.schema["_score"].dataType, T.DoubleType)

    def gauss(value, tf):
        d = max(0.0, abs(value - 100.0))
        return tf * math.exp(d * d * math.log(0.5) / (200.0 * 200.0))

    assert got["a"] == pytest.approx(gauss(100, 2))
    assert got["b"] == pytest.approx(gauss(400, 1))
    assert got["c"] == pytest.approx(1.0)   # null field → fv 1.0
    assert "d" not in got                   # child gates matching


def test_linear_and_exp_closed_form(fs_engine):
    lin = GAUSS_Q.replace("gauss", "linear")
    got, _ = _rows(fs_engine, lin)
    s = 200.0 / (1.0 - 0.5)
    assert got["b"] == pytest.approx(max(0.0, (s - 300.0) / s))
    exp_q = GAUSS_Q.replace('"gauss"', '"exp"')
    got_e, _ = _rows(fs_engine, exp_q)
    assert got_e["b"] == pytest.approx(
        math.exp(300.0 * math.log(0.5) / 200.0))


def test_decay_offset_flattens_near_origin(fs_engine):
    q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
         '"gauss":{"n":{"origin":100,"scale":200,"offset":350,'
         '"decay":0.5}},"boost_mode":"replace"}}}')
    got, _ = _rows(fs_engine, q)
    # |400-100| = 300 <= offset 350 → d = 0 → fv = 1.0
    assert got["b"] == pytest.approx(1.0)


def test_date_decay_resolves_now_through_engine(fs_engine):
    q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
         '"gauss":{"ts":{"origin":"now/d","scale":"10d","decay":0.5}},'
         '"boost_mode":"replace"}}}')
    got, _ = _rows(fs_engine, q,
                   "#options:load-rows=false,now=2024-01-20T12:00:00#")
    # origin = 2024-01-20 00:00; a is 1d away, b is 10d away
    one_day = 86_400_000.0
    assert got["a"] == pytest.approx(
        math.exp(one_day ** 2 * math.log(0.5) / (10 * one_day) ** 2))
    assert got["b"] == pytest.approx(0.5)   # exactly one scale out
    # ISO origin resolves WITHOUT the engine's now (plain anchor)
    q2 = q.replace("now/d", "2024-01-20T00:00:00")
    got2, _ = _rows(fs_engine, q2)
    assert got2 == pytest.approx(got)


def test_script_score_arithmetic_subset(fs_engine):
    q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
         '"script_score":{"script":{"source":'
         '"doc[\'n\'].value / 100.0 + 1"}},"boost_mode":"multiply"}}}')
    got, out = _rows(fs_engine, q)
    assert isinstance(out.schema["_score"].dataType, T.DoubleType)
    assert got["a"] == pytest.approx(2 * (100 / 100.0 + 1))
    assert got["b"] == pytest.approx(1 * (400 / 100.0 + 1))


def test_script_score_rejects_beyond_subset_and_unknown_field():
    with pytest.raises(DslError, match="arithmetic"):
        parse_request({"query": {"function_score": {
            "script_score": {"script": "System.exit(1)"}}}})


def test_script_score_unknown_field_is_compile_error(fs_engine):
    q = ('{"query":{"function_score":{"query":{"match_all":{}},'
         '"script_score":{"script":"doc[\'nope\'].value * 2"}}}}')
    with pytest.raises((CompileError, DslError)):
        fs_engine.search("fs_docs", q, default_field="text").collect()


def test_random_score_seeded_deterministic(fs_engine):
    q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
         '"random_score":{"seed":42,"field":"id"},'
         '"boost_mode":"replace"}}}')
    got1, _ = _rows(fs_engine, q)
    got2, _ = _rows(fs_engine, q)
    assert got1 == got2
    assert all(0.0 <= v < 1.0 for v in got1.values())
    got3, _ = _rows(fs_engine, q.replace('"seed":42', '"seed":7'))
    assert got3 != got1
    with pytest.raises(DslError, match="seed"):
        parse_request({"query": {"function_score": {
            "random_score": {}}}})


@pytest.mark.parametrize("bad", [
    {"gauss": {"n": {"origin": 1}}},                      # no scale
    {"gauss": {"n": {"origin": 1, "scale": 2, "decay": 1.5}}},
    {"gauss": {"n": {"origin": 1, "scale": 2, "decay": 0}}},
    {"linear": {"n": {"origin": 1, "scale": 2, "decay": "x"}}},
])
def test_decay_validation_errors(bad):
    with pytest.raises(DslError):
        parse_request({"query": {"function_score": bad}})


def test_two_functions_rejected():
    with pytest.raises(DslError, match="exactly one"):
        parse_request({"query": {"function_score": {
            "gauss": {"n": {"origin": 1, "scale": 2}},
            "script_score": {"script": "1 + 1"}}}})


def test_decay_on_numeric_field_rejects_duration_scale(fs_engine):
    q = ('{"query":{"function_score":{"query":{"match_all":{}},'
         '"gauss":{"n":{"origin":100,"scale":"10d"}}}}}')
    with pytest.raises((CompileError, DslError)):
        fs_engine.search("fs_docs", q, default_field="text").collect()


def test_legacy_fvf_score_stays_long(fs_engine):
    q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
         '"field_value_factor":{"field":"n","factor":0.01,'
         '"modifier":"ln1p","missing":1.0},"boost_mode":"sum"}}}')
    _, out = _rows(fs_engine, q)
    assert isinstance(out.schema["_score"].dataType, T.LongType)


def test_decay_served_from_range_index_bit_exact(fs_engine, spark):
    scan, _ = _rows(fs_engine, GAUSS_Q)
    fs_engine.build_postings_index("fs_docs", "text", materialize=True)
    fs_engine.build_range_index("fs_docs", "n")
    got, out = _rows(fs_engine, GAUSS_Q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "regexp_extract_all" not in plan   # scan-free
    assert got == scan


# ---------------- standalone script_score + vector functions (r11)

@pytest.fixture(scope="module")
def vec_engine(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("emb", T.ArrayType(T.FloatType())),
        T.StructField("w", T.DoubleType())])
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0], 2.0), (2, [0.0, 1.0, 0.0], 3.0),
         (3, [0.6, 0.8, 0.0], 4.0), (4, None, 5.0)], schema)
    eng = SearchEngine(spark)
    eng.register(df, TableSpec("vs", ["id"]))
    return eng


def _vq(eng, q):
    import json
    out = eng.search("vs", "#options:load-rows=false#" + json.dumps(q))
    return {r["id"]: round(r["_score"], 6) for r in out.collect()}


def test_script_score_query_replaces_score(vec_engine):
    # standalone script_score: the script REPLACES the query score
    # (w-gated term would otherwise contribute); null vector → 0
    got = _vq(vec_engine, {"query": {"script_score": {
        "query": {"match_all": {}},
        "script": {"source":
                   "cosineSimilarity(params.qv, 'emb') + params.base",
                   "params": {"qv": [1.0, 0.0, 0.0], "base": 1.0}}}}})
    assert got == {1: 2.0, 2: 1.0, 3: 1.6, 4: 0.0}


def test_script_score_dot_and_l2(vec_engine):
    got = _vq(vec_engine, {"query": {"script_score": {
        "query": {"range": {"w": {"gte": 3.0}}},
        "script": {"source": "dotProduct(params.qv, 'emb')",
                   "params": {"qv": [2.0, 1.0, 0.0]}}}}})
    assert got[2] == 1.0 and abs(got[3] - 2.0) < 1e-6 and got[4] == 0.0
    l2 = _vq(vec_engine, {"query": {"script_score": {
        "query": {"match_all": {}},
        "script": {"source": "l2norm(params.qv, 'emb')",
                   "params": {"qv": [1.0, 0.0, 0.0]}}}}})
    assert l2[1] == 0.0 and abs(l2[2] - math.sqrt(2)) < 1e-6
    assert abs(l2[3] - math.sqrt(0.16 + 0.64)) < 1e-5


def test_function_score_script_params_and_vector(vec_engine):
    # the function_score form takes params + vector functions too;
    # boost_mode default multiply composes with the query score
    got = _vq(vec_engine, {"query": {"function_score": {
        "query": {"term": {"id": 1}},
        "script_score": {"script": {
            "source": "dotProduct(params.qv, 'emb') * params.k",
            "params": {"qv": [3.0, 0.0, 0.0], "k": 2.0}}},
        "boost_mode": "replace"}}})
    assert got == {1: 6.0}


@pytest.mark.parametrize("script,params,err", [
    ("cosineSimilarity(params.qv, 'emb')", {}, "no such param"),
    ("cosineSimilarity(params.qv, 'emb')", {"qv": [0.0, 0.0, 0.0]},
     "zero"),
    ("cosineSimilarity(params.qv, 'emb')", {"qv": "nope"},
     "numeric array"),
    ("doc['w'].value * params.k", {"k": [1.0]}, "must be numeric"),
])
def test_script_vector_typed_errors(vec_engine, script, params, err):
    import json
    q = json.dumps({"query": {"script_score": {
        "query": {"match_all": {}},
        "script": {"source": script, "params": params}}}})
    with pytest.raises(DslError, match=err):
        vec_engine.search("vs", q).collect()


def test_script_vector_non_array_field_typed(vec_engine):
    import json
    q = json.dumps({"query": {"script_score": {
        "query": {"match_all": {}},
        "script": {"source": "dotProduct(params.qv, 'w')",
                   "params": {"qv": [1.0]}}}}})
    with pytest.raises(CompileError, match="numeric array"):
        vec_engine.search("vs", q).collect()


def test_script_score_query_needs_query_and_script(vec_engine):
    import json
    with pytest.raises(DslError, match="needs"):
        vec_engine.search("vs", json.dumps(
            {"query": {"script_score": {"script": {"source": "1"}}}}))
    with pytest.raises(DslError, match="min_score"):
        vec_engine.search("vs", json.dumps(
            {"query": {"script_score": {
                "query": {"match_all": {}},
                "script": {"source": "1"}, "min_score": 2.0}}}))
