"""ES ``sampler`` / ``diversified_sampler`` aggs (r9): sub-aggregations
over the top ``shard_size`` highest-scoring matches (single engine = one
shard; deterministic score desc, key asc), diversified capping each
field value at ``max_docs_per_value`` first. The reference forwards agg
bodies verbatim to ES, so the ES contracts are the parity targets."""

import json

import pytest

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError

# score = tf of 'x' in text
ROWS = [
    (1, "a", "x x x x"),       # score 4
    (2, "a", "x x x"),         # score 3
    (3, "a", "x x"),           # score 2
    (4, "b", "x x x x x"),     # score 5
    (5, "b", "x"),             # score 1
    (6, "c", "x x"),           # score 2
    (7, None, "x x x"),        # score 3, null diversity key
]


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    docs = spark.createDataFrame(ROWS, "id int, g string, text string")
    e.register(docs, TableSpec("smp", ["id"]))
    return e


def _run(eng, aggs):
    q = json.dumps({"query": {"term": {"text": "x"}}, "aggs": aggs})
    return eng.search_aggs("smp", q).collect()


def test_sampler_takes_top_by_score_then_key(eng):
    # top-3: 4 (5), 1 (4), then the score-3 tie {2, 7} breaks key asc → 2
    rows = _run(eng, {"s": {"sampler": {"shard_size": 3},
                            "aggs": {"by": {"terms": {"field": "g"}}}}})
    assert {r["key"]: r["doc_count"] for r in rows} == {"a": 2, "b": 1}


def test_sampler_without_subaggs_returns_doc_count(eng):
    rows = _run(eng, {"s": {"sampler": {"shard_size": 4}}})
    assert len(rows) == 1 and rows[0]["doc_count"] == 4


def test_sampler_larger_than_match_set_is_everything(eng):
    rows = _run(eng, {"s": {"sampler": {"shard_size": 100}}})
    assert rows[0]["doc_count"] == 7


def test_diversified_caps_per_value_null_unlimited(eng):
    # max 1 per g: 4 (b), 1 (a), 7 (null key: never limited) → max id 7
    rows = _run(eng, {"s": {"diversified_sampler":
                            {"shard_size": 3, "field": "g",
                             "max_docs_per_value": 1},
                            "aggs": {"mx": {"max": {"field": "id"}}}}})
    assert rows[0]["mx"] == 7


def test_diversified_max_two_per_value(eng):
    rows = _run(eng, {"s": {"diversified_sampler":
                            {"shard_size": 5, "field": "g",
                             "max_docs_per_value": 2},
                            "aggs": {"by": {"terms": {"field": "g"}}}}})
    # per-g top-2 candidates: 4,5 (b), 1,2 (a), 6 (c), 7 (null) —
    # overall top-5 by (score desc, id asc): 4(5) 1(4) 2(3) 7(3) 3? no —
    # 3 was cut by the per-a cap; next is 6(2) then 5(1): top-5 =
    # 4, 1, 2, 7, 6
    counts = {r["key"]: r["doc_count"] for r in rows}
    assert counts == {"a": 2, "b": 1, "c": 1}


def test_sampler_with_metrics_only_sub(eng):
    rows = _run(eng, {"s": {"sampler": {"shard_size": 2},
                            "aggs": {"sm": {"sum": {"field": "id"}}}}})
    assert rows[0]["sm"] == 5   # ids 4 + 1


def test_sampler_index_served_scores_match_scan(eng, spark):
    # a fresh engine with a postings index: the sample must be the same
    # docs (scores ride the postings hits, no re-scan)
    e2 = SearchEngine(spark)
    docs = spark.createDataFrame(ROWS, "id int, g string, text string")
    e2.register(docs, TableSpec("smp2", ["id"]))
    e2.build_postings_index("smp2", "text", materialize=True)
    q = json.dumps({"query": {"term": {"text": "x"}}, "aggs": {
        "s": {"sampler": {"shard_size": 3},
              "aggs": {"by": {"terms": {"field": "g"}}}}}})
    rows = e2.search_aggs("smp2", q).collect()
    assert {r["key"]: r["doc_count"] for r in rows} == {"a": 2, "b": 1}


@pytest.mark.parametrize("aggs, msg", [
    ({"s": {"sampler": {"shard_size": 0}}}, "positive integer"),
    ({"s": {"sampler": {"shard_size": 2, "field": "g"}}},
     "unsupported parameters"),
    ({"s": {"diversified_sampler": {"shard_size": 2}}}, "needs a 'field'"),
    ({"s": {"diversified_sampler": {"shard_size": 2, "field": "g",
                                    "max_docs_per_value": 0}}},
     "max_docs_per_value"),
    ({"s": {"sampler": {"shard_size": 2},
            "aggs": {"t": {"sampler": {"shard_size": 2}}}}},
     "do not nest"),
])
def test_typed_errors(eng, aggs, msg):
    with pytest.raises(DslError, match=msg):
        _run(eng, aggs)
