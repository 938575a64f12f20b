"""ES ``more_like_this`` DSL query (round-9). The reference forwards
it verbatim to ES (ref ElasticIndex.java:663-667); the engine already
served the one-doc API form (``SearchEngine.more_like_this``) — this is
the full query-DSL form resolved through the engine-rewrite seam
(``_expand_data_nodes``, same pattern as match_phrase_prefix max_expansions):

- like = free text and/or {"_id": ...} refs (one key-filtered lookup)
- candidate terms: standard-analyzed, tf >= min_term_freq
- df via the candidate-bounded postings lookup; min/max_doc_freq gates
- top max_query_terms by (tf·ln((N+1)/(df+0.5)) desc, term asc) — the
  selection rule the API form pins
- TermsSet with the resolved minimum_should_match count; like-ids with
  include=false (ES default) excluded via And(…, Not(Ids))
- compiling the raw node without the engine is a typed CompileError
"""

import json

import pytest

from cassandra_es_index_spark.search.compile import CompileError, Compiler
from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError, parse_request


@pytest.fixture(scope="module")
def mlt_engine(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "spark streaming joins window"),
         ("b", "spark streaming state"),
         ("c", "spark joins window shuffle"),
         ("d", "flink only here"),
         ("e", "the the the the common words")],
        "id string, text string")
    eng.register(df, TableSpec("mltd", ["id"]))
    return eng, df


def _run(eng, q):
    out = eng.search("mltd", "#options:load-rows=false#" + json.dumps(q),
                     default_field="text")
    return {r["id"]: r["_score"] for r in out.collect()}


def test_mlt_like_text_percentage_msm(mlt_engine):
    eng, _ = mlt_engine
    got = _run(eng, {"query": {"more_like_this": {
        "like": "spark streaming joins", "min_term_freq": 1,
        "min_doc_freq": 1, "minimum_should_match": "60%"}}})
    # 3 terms, 60% → floor(1.8) = 1 required; score = Σ matched tf
    assert got == {"a": 3, "b": 2, "c": 2}


def test_mlt_msm_count_gates(mlt_engine):
    eng, _ = mlt_engine
    got = _run(eng, {"query": {"more_like_this": {
        "like": "spark streaming joins", "min_term_freq": 1,
        "min_doc_freq": 1, "minimum_should_match": 3}}})
    assert got == {"a": 3}


def test_mlt_like_doc_excludes_source_by_default(mlt_engine):
    eng, _ = mlt_engine
    q = {"query": {"more_like_this": {
        "like": [{"_id": "a"}], "min_term_freq": 1, "min_doc_freq": 1,
        "minimum_should_match": 2}}}
    got = _run(eng, q)
    assert got == {"b": 2, "c": 3}      # a itself excluded (include=false)
    q["query"]["more_like_this"]["include"] = True
    got = _run(eng, q)
    assert got == {"a": 4, "b": 2, "c": 3}


def test_mlt_min_term_freq_default_drops_singletons(mlt_engine):
    eng, _ = mlt_engine
    # default min_term_freq=2: every like-term appears once → no terms
    got = _run(eng, {"query": {"more_like_this": {
        "like": "spark streaming", "min_doc_freq": 1}}})
    assert got == {}
    # doc e repeats "the" 4× → tf gate passes with the default
    got = _run(eng, {"query": {"more_like_this": {
        "like": "the the common", "min_doc_freq": 1,
        "minimum_should_match": 1}}})
    assert got == {"e": 4}


def test_mlt_max_query_terms_prefers_high_idf(mlt_engine):
    eng, _ = mlt_engine
    # "spark" (df 3) has lower idf than "shuffle" (df 1): with
    # max_query_terms=1 the rarer term wins the tf·idf ranking
    got = _run(eng, {"query": {"more_like_this": {
        "like": "spark shuffle", "min_term_freq": 1, "min_doc_freq": 1,
        "max_query_terms": 1, "minimum_should_match": 1}}})
    assert got == {"c": 1}


def test_mlt_max_doc_freq_drops_common_terms(mlt_engine):
    eng, _ = mlt_engine
    got = _run(eng, {"query": {"more_like_this": {
        "like": "spark shuffle", "min_term_freq": 1, "min_doc_freq": 1,
        "max_doc_freq": 2, "minimum_should_match": 1}}})
    # spark (df 3) filtered by max_doc_freq=2; only shuffle remains
    assert got == {"c": 1}


def test_mlt_composes_in_bool(mlt_engine):
    eng, _ = mlt_engine
    got = _run(eng, {"query": {"bool": {
        "must": [{"more_like_this": {
            "like": "spark streaming joins", "min_term_freq": 1,
            "min_doc_freq": 1, "minimum_should_match": 1}}],
        "filter": [{"term": {"text": "state"}}]}}})
    assert got == {"b": 2}


def test_mlt_typed_errors(mlt_engine):
    eng, _ = mlt_engine
    for q, pat in [
        ({"more_like_this": {"like": "x", "fields": ["a", "b"]}},
         "exactly one field"),
        ({"more_like_this": {"like": []}}, "at least one"),
        ({"more_like_this": {"like": [42]}}, "strings or"),
        ({"more_like_this": {"like": "x", "minimum_should_match": "x%"}},
         "minimum_should_match"),
        ({"more_like_this": {"like": "x", "min_term_freq": 0}},
         "positive integer"),
        ({"more_like_this": {"like": "x", "nope": 1}}, "unknown"),
    ]:
        with pytest.raises(DslError, match=pat):
            _run(eng, {"query": q})


def test_mlt_raw_node_compile_is_typed(mlt_engine, spark):
    _, df = mlt_engine
    req = parse_request(json.dumps(
        {"query": {"more_like_this": {"like": "x"}}}))
    with pytest.raises(CompileError, match="data-driven"):
        Compiler(df, "text").compile(req.node)


# -------------------------------------------------- unlike (r11)

def test_mlt_unlike_text_stop_set(mlt_engine):
    # 'spark' lands in the unlike stop set → selection keeps
    # streaming/joins only; doc b matches via streaming, c via joins
    eng, _ = mlt_engine
    got = _run(eng, {"query": {"more_like_this": {
        "like": "spark streaming joins", "unlike": "spark window",
        "min_term_freq": 1, "min_doc_freq": 1,
        "minimum_should_match": 1}}})
    assert got == {"a": 2, "b": 1, "c": 1}


def test_mlt_unlike_doc_id(mlt_engine):
    # unlike {'_id': 'd'} stops flink/only/here — here harmless, but
    # unlike {'_id': 'c'} stops joins/window/shuffle/spark → only
    # streaming survives from the like text
    eng, _ = mlt_engine
    got = _run(eng, {"query": {"more_like_this": {
        "like": "spark streaming joins",
        "unlike": [{"_id": "c"}],
        "min_term_freq": 1, "min_doc_freq": 1,
        "minimum_should_match": 1}}})
    assert got == {"a": 1, "b": 1}


def test_mlt_unlike_everything_matches_none(mlt_engine):
    eng, _ = mlt_engine
    got = _run(eng, {"query": {"more_like_this": {
        "like": "spark streaming", "unlike": "spark streaming",
        "min_term_freq": 1, "min_doc_freq": 1}}})
    assert got == {}


def test_mlt_unlike_bad_entry_typed(mlt_engine):
    eng, _ = mlt_engine
    with pytest.raises(DslError, match="unlike entries"):
        eng.search("mltd", json.dumps({"query": {"more_like_this": {
            "like": "spark", "unlike": [7]}}}),
            default_field="text")
