"""function_score ``functions`` ARRAY form (round-8): per-entry
filter/weight, score_mode combination (multiply/sum/avg/first/max/min),
max_boost cap — the production relevance-tuning idiom. The reference
forwards the body verbatim to ES (ref ElasticIndex.java:663-667), so
the ES FunctionScoreQuery contract is the parity target:

- entries whose ``filter`` matches (no filter = always) each yield
  ``weight × function value``; a weight-only entry yields ``weight``
- ``score_mode`` folds them into ONE factor; a doc where NO entry
  applies takes factor 1.0 (the factor starts at 1 and only matching
  functions contribute)
- ``avg`` is the WEIGHTED average Σ(w·fv)/Σw (ES's documented rule)
- ``max_boost`` caps the combined factor, then ``boost_mode`` merges
  it with the query score
- array trees always keep DOUBLE scores (fractional score_mode math)
"""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError, parse_request


@pytest.fixture(scope="module")
def fsa_engine(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "spark spark", 100, "2024-01-19 00:00:00"),
         ("b", "spark", 400, "2024-01-10 00:00:00"),
         ("c", "spark", None, "2023-12-01 00:00:00"),
         ("d", "other", 100, "2024-01-20 00:00:00")],
        "id string, text string, n int, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    eng.register(df, TableSpec("fsa_docs", ["id"]))
    return eng


def _rows(eng, q, opts="#options:load-rows=false#"):
    out = eng.search("fsa_docs", opts + q, default_field="text")
    return {r["id"]: r["_score"] for r in out.collect()}, out


def _q(functions, score_mode="multiply", boost_mode="multiply",
       extra=""):
    return ('{"query":{"function_score":{'
            '"query":{"match":{"text":"spark"}},'
            f'"functions":{functions},'
            f'"score_mode":"{score_mode}","boost_mode":"{boost_mode}"'
            f'{extra}}}}}}}')


# the three-entry array used across the combination tests:
#   e0: filter id:a, weight-only 2.0            → applies to a only
#   e1: fvf n × 0.5 (missing 1.0), weight 1.0   → applies everywhere
#   e2: gauss(n; origin 100, scale 200, λ .5)   → applies everywhere
FNS = ('[{"filter":{"term":{"id":"a"}},"weight":2},'
       '{"field_value_factor":{"field":"n","factor":0.5,'
       '"missing":1.0}},'
       '{"gauss":{"n":{"origin":100,"scale":200,"decay":0.5}}}]')

TF = {"a": 2.0, "b": 1.0, "c": 1.0}          # d never matches the child


def _gauss(value):
    d = abs(value - 100.0)
    return math.exp(d * d * math.log(0.5) / (200.0 * 200.0))


def _entries(doc_id, n):
    """(applies, weighted value, weight) triples per the FNS array."""
    fvf = 0.5 * (n if n is not None else 1.0)
    gauss = _gauss(n) if n is not None else 1.0   # null field → fv 1.0
    out = [(doc_id == "a", 2.0, 2.0), (True, fvf, 1.0),
           (True, gauss, 1.0)]
    return [(ap, wfv, w) for ap, wfv, w in out]


N = {"a": 100, "b": 400, "c": None}


def _expected(score_mode):
    exp = {}
    for doc, n in N.items():
        parts = [(wfv, w) for ap, wfv, w in _entries(doc, n) if ap]
        if score_mode == "multiply":
            f = math.prod(wfv for wfv, _ in parts) if parts else 1.0
        elif score_mode == "sum":
            f = sum(wfv for wfv, _ in parts) if parts else 1.0
        elif score_mode == "avg":
            wsum = sum(w for _, w in parts)
            f = (sum(wfv for wfv, _ in parts) / wsum) if wsum else 1.0
        elif score_mode == "first":
            f = parts[0][0] if parts else 1.0
        elif score_mode == "max":
            f = max(wfv for wfv, _ in parts) if parts else 1.0
        elif score_mode == "min":
            f = min(wfv for wfv, _ in parts) if parts else 1.0
        exp[doc] = TF[doc] * f
    return exp


@pytest.mark.parametrize(
    "score_mode", ["multiply", "sum", "avg", "first", "max", "min"])
def test_score_modes_closed_form(fsa_engine, score_mode):
    got, out = _rows(fsa_engine, _q(FNS, score_mode=score_mode))
    assert isinstance(out.schema["_score"].dataType, T.DoubleType)
    exp = _expected(score_mode)
    assert set(got) == set(exp)
    for doc, want in exp.items():
        assert got[doc] == pytest.approx(want), (score_mode, doc)


def test_no_entry_applies_factor_is_one(fsa_engine):
    # every entry filtered to id:a → b/c keep their raw query score
    fns = ('[{"filter":{"term":{"id":"a"}},"weight":3},'
           '{"filter":{"term":{"id":"a"}},'
           '"gauss":{"n":{"origin":100,"scale":200,"decay":0.5}}}]')
    got, _ = _rows(fsa_engine, _q(fns, score_mode="sum"))
    assert got["a"] == pytest.approx(2.0 * (3.0 + _gauss(100)))
    assert got["b"] == pytest.approx(1.0)   # factor 1.0, multiply
    assert got["c"] == pytest.approx(1.0)


def test_max_boost_caps_combined_factor(fsa_engine):
    got, _ = _rows(fsa_engine,
                   _q(FNS, score_mode="sum", extra=',"max_boost":1.5'))
    for doc in TF:
        assert got[doc] == pytest.approx(TF[doc] * 1.5)   # all > 1.5


def test_boost_mode_sum_with_array(fsa_engine):
    got, _ = _rows(fsa_engine, _q(FNS, score_mode="max",
                                  boost_mode="sum"))
    exp = _expected("max")
    for doc, want in exp.items():
        # replace multiply with sum: tf + factor
        assert got[doc] == pytest.approx(TF[doc] + want / TF[doc])


def test_avg_weight_zero_entries_keep_factor_one(fsa_engine):
    # ES: avg divides by the applicable weight sum; weight-0 entries
    # leave weightSum 0 → factor stays 1
    fns = '[{"weight":0}]'
    got, _ = _rows(fsa_engine, _q(fns, score_mode="avg"))
    for doc, tf in TF.items():
        assert got[doc] == pytest.approx(tf)


def test_script_score_entry_and_date_math_filter(fsa_engine):
    # the generic date-math walker must descend into ScoreFunction
    # entries: the range filter's now-anchored bound and the decay
    # origin "now/d" both resolve through the injected now
    fns = ('[{"filter":{"range":{"ts":{"gte":"now-15d"}}},'
           '"script_score":{"script":{"source":'
           '"doc[\'n\'].value / 100.0"}}},'
           '{"gauss":{"ts":{"origin":"now/d","scale":"10d",'
           '"decay":0.5}}}]')
    got, _ = _rows(fsa_engine, _q(fns, score_mode="multiply"),
                   "#options:load-rows=false,now=2024-01-20T12:00:00#")
    day = 86_400_000.0
    # a: ts 2024-01-19 (in range, 1d from origin), n=100
    assert got["a"] == pytest.approx(
        2.0 * (100.0 / 100.0)
        * math.exp(day * day * math.log(0.5) / (10 * day) ** 2))
    # c: ts 2023-12-01 (out of range → script entry n/a), 50d away
    assert got["c"] == pytest.approx(
        1.0 * math.exp((50 * day) ** 2 * math.log(0.5) / (10 * day) ** 2))


def test_array_served_from_range_index_bit_exact(fsa_engine):
    q = _q(FNS, score_mode="sum", extra=',"max_boost":60')
    scan, _ = _rows(fsa_engine, q)
    fsa_engine.build_postings_index("fsa_docs", "text", materialize=True)
    fsa_engine.build_postings_index("fsa_docs", "id", materialize=True)
    fsa_engine.build_range_index("fsa_docs", "n")
    got, out = _rows(fsa_engine, q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "regexp_extract_all" not in plan   # scan-free
    assert got == scan


def test_random_score_entry_falls_back_to_scan(fsa_engine):
    # seeded random entries are not index-projected; results still match
    # the no-index run exactly (scan fallback, same expression tree)
    fns = ('[{"random_score":{"seed":7,"field":"id"}},'
           '{"weight":2}]')
    got, out = _rows(fsa_engine, _q(fns, score_mode="sum"))
    for doc, tf in TF.items():
        r = got[doc] / tf - 2.0
        assert 0.0 <= r < 1.0   # seeded random component in [0,1)


@pytest.mark.parametrize("bad,msg", [
    ('{"functions":[],"query":{"match_all":{}}}', "non-empty"),
    ('{"functions":[{"weight":2}],"score_mode":"bogus"}', "score_mode"),
    ('{"functions":[{"filter":{"match_all":{}}}]}', "missing a function"),
    ('{"functions":[{"weight":2,"nope":1}]}', "unknown keys"),
    ('{"functions":[{"weight":true}]}', "numeric"),
    ('{"functions":[{"weight":2}],"max_boost":"x"}', "max_boost"),
    ('{"functions":[{"gauss":{"n":{"scale":1}},'
     '"field_value_factor":{"field":"n"}}]}', "more than one"),
    ('{"functions":[{"weight":2}],'
     '"field_value_factor":{"field":"n"}}', "cannot mix"),
])
def test_malformed_arrays_raise_typed_errors(bad, msg):
    with pytest.raises(DslError, match=msg):
        parse_request('{"query":{"function_score":' + bad + "}}")
