"""User-script runtime safety (round-8, VERDICT "What's wrong" 1-2):

1. ``script_score`` function values clamp at 0 — ES rejects negative
   script scores at query time ("script score function must not
   produce negative scores"); lazy Spark plans cannot raise a typed
   per-row error, so negatives floor to 0 on BOTH plans (documented
   deviation, deterministic).
2. User-script arithmetic runtime errors never surface as untyped
   Spark exceptions: ``/`` and ``%`` compile to try_divide/try_mod
   (ANSI-mode DIVIDE_BY_ZERO becomes NULL), and the NULL then follows
   each consumer's null rule — a null terms_set threshold matches
   nothing, a null script_score scores 0, a null bucket-script value
   stays a null bucket column.
"""

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import (
    DslError, _compile_doc_script, parse_request,
)


@pytest.fixture(scope="module")
def sr_engine(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "spark spark", 100, 2),
         ("b", "spark", 1500, 2),
         ("c", "spark", None, 0)],
        "id string, text string, n int, k int")
    eng.register(df, TableSpec("sr_docs", ["id"]))
    return eng


def _rows(eng, q, opts="#options:load-rows=false#"):
    out = eng.search("sr_docs", opts + q, default_field="text")
    return {r["id"]: r["_score"] for r in out.collect()}, out


NEG_Q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
         '"script_score":{"script":{"source":'
         '"doc[\'n\'].value - 1000"}},"boost_mode":"multiply"}}}')


def test_script_score_negative_clamps_to_zero(sr_engine):
    got, _ = _rows(sr_engine, NEG_Q)
    assert got["a"] == pytest.approx(0.0)    # 100-1000 < 0 → 0
    assert got["b"] == pytest.approx(500.0)  # 1500-1000, tf 1
    assert got["c"] == pytest.approx(0.0)    # null ref → 0


def test_script_score_clamp_index_served_parity(sr_engine):
    scan, _ = _rows(sr_engine, NEG_Q)
    sr_engine.build_postings_index("sr_docs", "text", materialize=True)
    sr_engine.build_range_index("sr_docs", "n")
    sr_engine.build_range_index("sr_docs", "k")
    got, out = _rows(sr_engine, NEG_Q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "regexp_extract_all" not in plan
    assert got == scan


def test_division_compiles_to_try_divide():
    expr = _compile_doc_script("t", "doc['n'].value / 0")
    assert "try_divide" in expr
    expr = _compile_doc_script("t", "doc['n'].value % 0")
    assert "try_mod" in expr


def test_script_score_zero_divisor_scores_zero_not_error(sr_engine):
    q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
         '"script_score":{"script":{"source":'
         '"doc[\'n\'].value / 0"}},"boost_mode":"multiply"}}}')
    got, _ = _rows(sr_engine, q)   # collect() must not raise
    assert set(got) == {"a", "b", "c"}
    assert all(v == pytest.approx(0.0) for v in got.values())


def test_terms_set_zero_divisor_script_matches_nothing(sr_engine):
    # params.num_terms / 0 → try_divide NULL threshold → match nothing
    # (the probe that leaked SparkArithmeticException DIVIDE_BY_ZERO
    # pre-r8); no exception may escape collect()
    q = ('{"query":{"terms_set":{"text":{"terms":["spark"],'
         '"minimum_should_match_script":{"source":'
         '"params.num_terms / 0"}}}}}')
    got, _ = _rows(sr_engine, q)
    assert got == {}


def test_terms_set_nonzero_divisor_script_still_works(sr_engine):
    q = ('{"query":{"terms_set":{"text":{"terms":["spark"],'
         '"minimum_should_match_script":{"source":'
         '"params.num_terms / 1"}}}}}')
    got, _ = _rows(sr_engine, q)
    assert set(got) == {"a", "b", "c"}


def test_bucket_script_zero_divisor_yields_null_column(sr_engine, spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("x", "spark", 1), ("y", "spark", 2), ("y", "spark", 3)],
        "grp string, text string, v int")
    eng.register(df, TableSpec("bs_docs", ["grp", "v"]))
    q = ('{"query":{"match_all":{}},"aggs":{"g":{"terms":'
         '{"field":"grp"},"aggs":{"s":{"sum":{"field":"v"}},'
         '"ratio":{"bucket_script":{"buckets_path":{"t":"s"},'
         '"script":"params.t / 0"}}}}}}')
    out = eng.search_aggs("bs_docs", q, default_field="text")
    rows = out.collect()   # must not raise DIVIDE_BY_ZERO
    assert all(r["ratio"] is None for r in rows)


def test_complex_script_precedence_preserved(sr_engine):
    # the precedence-climbing re-emit must keep painless precedence:
    # 1 + n/100 * 2 = 1 + (n/100)*2, parens respected, unary minus
    q = ('{"query":{"function_score":{"query":{"match":{"text":"spark"}},'
         '"script_score":{"script":{"source":'
         '"1 + doc[\'n\'].value / 100 * 2 - (doc[\'k\'].value - 1)"}},'
         '"boost_mode":"replace"}}}')
    got, _ = _rows(sr_engine, q)
    assert got["a"] == pytest.approx(1 + 100 / 100 * 2 - (2 - 1))
    assert got["b"] == pytest.approx(1 + 1500 / 100 * 2 - (2 - 1))


def test_terms_set_string_threshold_null_cast_both_plans(spark):
    # ADVICE r7: a minimum_should_match_field whose value does not cast
    # to a long must match NOTHING on both plans (try_cast → NULL →
    # excluded), never clamp to 1 on the index plan or raise an ANSI
    # CAST_INVALID_INPUT on the scan plan
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "spark tables", "1"),     # numeric string → floor 1
         ("b", "spark tables", "two"),   # non-numeric → match nothing
         ("c", "spark tables", None)],   # null → match nothing
        "id string, text string, req string")
    eng.register(df, TableSpec("tsx_docs", ["id"]))
    q = ('{"query":{"terms_set":{"text":{"terms":["spark","tables"],'
         '"minimum_should_match_field":"req"}}}}')
    scan = {r["id"] for r in eng.search("tsx_docs", q).collect()}
    assert scan == {"a"}
    eng.build_postings_index("tsx_docs", "text", materialize=True)
    eng.build_range_index("tsx_docs", "req")
    served = {r["id"] for r in eng.search("tsx_docs", q).collect()}
    assert served == scan


def test_malformed_script_still_typed_error():
    with pytest.raises(DslError):
        parse_request(
            '{"query":{"function_score":{"script_score":{"script":'
            '{"source":"doc[\'n\'].value + )("}}}}}')
