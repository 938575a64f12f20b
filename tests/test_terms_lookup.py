"""ES terms-lookup query (r9): the terms list fetched from ONE other
document (``{"terms": {f: {"index", "id", "path"}}}``) — resolved by the
engine before compile (``_expand_data_nodes``, the MoreLikeThis seam).
The reference forwards query bodies verbatim to ES
(ref ElasticIndex.java:663-667), so the ES contracts are the parity
targets: array path → many terms, scalar path → one, missing doc /
null / empty → match nothing, values not analyzed."""

import pytest

from cassandra_es_index_spark.search.ast import TermsLookup
from cassandra_es_index_spark.search.compile import Compiler, CompileError
from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    docs = spark.createDataFrame(
        [(1, "en", "alpha beta"), (2, "de", "beta gamma"),
         (3, "en", "delta"), (4, "fr", "epsilon")],
        "doc_id int, lang string, text string")
    e.register(docs, TableSpec("docs_tl", ["doc_id"]))
    users = spark.createDataFrame(
        [(10, ["en", "fr"]), (11, []), (12, None), (13, ["en", None])],
        "uid int, follows array<string>")
    e.register(users, TableSpec("users_tl", ["uid"]))
    return e


def _ids(eng, q):
    out = eng.search("docs_tl", "#options:load-rows=false#" + q)
    return sorted(r["doc_id"] for r in out.collect())


def _lookup(id_, index="users_tl", path="follows"):
    return ('{"query":{"terms":{"lang":{"index":"%s","id":"%s",'
            '"path":"%s"}}}}' % (index, id_, path))


def test_array_path_expands_to_terms(eng):
    assert _ids(eng, _lookup("10")) == [1, 3, 4]


def test_empty_null_and_missing_doc_match_nothing(eng):
    assert _ids(eng, _lookup("11")) == []     # empty array
    assert _ids(eng, _lookup("12")) == []     # null value
    assert _ids(eng, _lookup("99")) == []     # missing doc


def test_null_array_elements_drop(eng):
    assert _ids(eng, _lookup("13")) == [1, 3]


def test_scalar_path_and_self_lookup(eng):
    # "docs with the same lang as doc 2" — lookup against the searched
    # table itself, scalar path
    assert _ids(eng, _lookup("2", index="docs_tl", path="lang")) == [2]


def test_composes_under_bool(eng):
    q = ('{"query":{"bool":{"must":[{"terms":{"lang":{"index":'
         '"users_tl","id":"10","path":"follows"}}},'
         '{"term":{"text":"beta"}}]}}}')
    assert _ids(eng, q) == [1]


@pytest.mark.parametrize("q, msg", [
    (_lookup("1", index="nope"), "not a registered table"),
    ('{"query":{"terms":{"lang":{"index":"users_tl","id":"1"}}}}',
     "terms lookup needs"),
    ('{"query":{"terms":{"lang":{"index":"users_tl","id":"1",'
     '"path":"follows","routing":"x"}}}}', "unsupported keys"),
])
def test_typed_errors(eng, q, msg):
    with pytest.raises(DslError, match=msg):
        eng.search("docs_tl", q).collect()


def test_unknown_path_is_typed(eng):
    with pytest.raises(CompileError, match="unknown field"):
        eng.search("docs_tl", _lookup("1", path="zzz")).collect()


def test_lookup_boost_beside_field_applies(eng):
    # r12 (ADVICE): {"terms": {f: {lookup}, "boost": b}} must scale the
    # score — the literal-list branch applied the beside-the-field
    # boost but the lookup branch silently dropped it
    q = ('{"query":{"terms":{"lang":{"index":"users_tl","id":"10",'
         '"path":"follows"},"boost":3.0}}}')
    out = eng.search("docs_tl", "#options:load-rows=false#" + q)
    scores = {r["doc_id"]: r["_score"] for r in out.collect()}
    q1 = ('{"query":{"terms":{"lang":{"index":"users_tl","id":"10",'
          '"path":"follows"}}}}')
    base = {r["doc_id"]: r["_score"] for r in
            eng.search("docs_tl",
                       "#options:load-rows=false#" + q1).collect()}
    assert set(scores) == set(base) == {1, 3, 4}
    for d in scores:
        assert scores[d] == pytest.approx(3.0 * base[d])


def test_knn_filter_with_terms_lookup_resolves(eng, spark):
    # r12 (ADVICE): a knn query's `filter` carrying a data-driven node
    # (terms lookup) must be expanded BEFORE the knn clause compiles
    # its pre-filter — previously a misleading CompileError
    e = SearchEngine(spark)
    docs = spark.createDataFrame(
        [(1, "en", [1.0, 0.0]), (2, "de", [0.9, 0.1]),
         (3, "en", [0.0, 1.0]), (4, "fr", [0.8, 0.2])],
        "doc_id int, lang string, emb array<double>")
    e.register(docs, TableSpec("docs_knn_tl", ["doc_id"]))
    users = spark.createDataFrame(
        [(10, ["en"])], "uid int, follows array<string>")
    e.register(users, TableSpec("users_knn_tl", ["uid"]))
    q = ('{"query":{"knn":{"field":"emb","query_vector":[1.0,0.0],'
         '"num_candidates":10,"filter":{"terms":{"lang":{"index":'
         '"users_knn_tl","id":"10","path":"follows"}}}}},"size":5}')
    out = e.search("docs_knn_tl", "#options:load-rows=false#" + q)
    got = [r["doc_id"] for r in out.collect()]
    # only lang=en docs are candidates; cosine to [1,0]: 1 then 3
    assert got == [1, 3]


def test_raw_node_compile_is_typed(eng, spark):
    docs, _ = eng.catalog.get("docs_tl")
    with pytest.raises(CompileError, match="data-driven"):
        Compiler(docs, "text").compile(
            TermsLookup("lang", "users_tl", "1", "follows"))
