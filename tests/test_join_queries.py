"""Parent/child join query family (r12): has_child / has_parent /
parent_id over a registered relation (``SearchEngine.register_relation``
— the engine's analogue of the ES join-field mapping, which the
reference exposes by forwarding DSL bodies verbatim to ES,
ref ElasticIndex.java:663-667).

Resolution shape under test: the engine rewrites the join node to a
``JoinRelMatch`` over hidden ``__rel_*`` columns produced by ONE
child-side keyed aggregate + ONE LEFT equi-join (_expand_join_nodes) —
fully distributed, no driver collect — and the hidden columns never
reach the result surface.
"""

import json

import pytest

from cassandra_es_index_spark.catalog import TableSpec
from cassandra_es_index_spark.search import SearchEngine
from cassandra_es_index_spark.search import es_dsl


def _mk_engine(spark):
    eng = SearchEngine(spark)
    parents = spark.createDataFrame(
        [(1, "alpha urgent", 100.0),
         (2, "beta", 250.0),
         (3, "gamma urgent", 50.0),
         (4, "delta", 10.0)],
        "pid bigint, note string, total double")
    children = spark.createDataFrame(
        [(10, 1, "red fast", 5.0),
         (11, 1, "red slow", 40.0),
         (12, 2, "blue fast", 45.0),
         (13, 2, "red red fast", 1.0),
         (14, 3, "green", 2.0),
         (15, 9, "red orphan", 99.0)],   # orphan: parent 9 missing
        "cid bigint, fk bigint, tags string, qty double")
    eng.register(parents, TableSpec("parents", ["pid"]))
    eng.register(children, TableSpec("children", ["cid"]))
    eng.register_relation("parents", "children", "pid", "fk")
    return eng


@pytest.fixture(scope="module")
def eng(spark):
    return _mk_engine(spark)


def _search(eng, table, body, **kw):
    q = "#options:load-rows=false#" + json.dumps(body)
    return eng.search(table, q, **kw)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# -- has_child -----------------------------------------------------------


def test_has_child_filter_and_count_bounds(eng):
    # children matching tags:red → parents 1 (cids 10,11), 2 (cid 13);
    # orphan cid 15 has no registered parent row and drops out of the
    # LEFT join's other side naturally
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}}}}}
    assert _rows(_search(eng, "parents", body), "pid") == [(1,), (2,)]
    # min_children: 2 → only parent 1 has two matching children
    body["query"]["has_child"]["min_children"] = 2
    assert _rows(_search(eng, "parents", body), "pid") == [(1,)]
    # max_children: 1 → only parent 2 (one matching child)
    del body["query"]["has_child"]["min_children"]
    body["query"]["has_child"]["max_children"] = 1
    assert _rows(_search(eng, "parents", body), "pid") == [(2,)]


def test_has_child_min_children_zero_matches_childless(eng):
    # ES: min_children 0 admits parents with NO matching children
    # (the joined count coalesces to 0, 0 >= 0)
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "green"}},
        "min_children": 0}}}
    assert _rows(_search(eng, "parents", body), "pid") == \
        [(1,), (2,), (3,), (4,)]


def test_has_child_score_modes_hand_computed(eng):
    # child scores for term tags:red are the tf counts: cid 10 → 1,
    # cid 11 → 1, cid 13 → 2 ("red red")
    for mode, p1, p2 in (("sum", 2.0, 2.0), ("max", 1.0, 2.0),
                         ("min", 1.0, 2.0), ("avg", 1.0, 2.0)):
        body = {"query": {"has_child": {
            "type": "children", "query": {"term": {"tags": "red"}},
            "score_mode": mode}}}
        got = dict(_rows(_search(eng, "parents", body), "pid", "_score"))
        assert got == {1: p1, 2: p2}, mode


def test_has_child_score_mode_none_scores_one(eng):
    # predicate-style score (the ScriptFilter convention, documented)
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}}}}}
    got = dict(_rows(_search(eng, "parents", body), "pid", "_score"))
    assert got == {1: 1, 2: 1}


def test_has_child_composes_in_bool(eng):
    # bool must: has_child AND a parent-side range — one plan
    body = {"query": {"bool": {
        "must": [{"has_child": {"type": "children",
                                "query": {"term": {"tags": "red"}}}}],
        "filter": [{"range": {"total": {"gte": 200}}}]}}}
    assert _rows(_search(eng, "parents", body), "pid") == [(2,)]


def test_has_child_with_child_side_range(eng):
    # numeric child predicate: qty >= 40 → parents 1 (cid 11), 2 (12)
    body = {"query": {"has_child": {
        "type": "children", "query": {"range": {"qty": {"gte": 40}}}}}}
    assert _rows(_search(eng, "parents", body), "pid") == [(1,), (2,)]


def test_has_child_aggs_and_count_paths(eng):
    # the expansion runs on every request entry point, not just search()
    q = json.dumps({"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}}}}})
    assert eng.count("parents", q) == 2
    aq = json.dumps({
        "query": {"has_child": {"type": "children",
                                "query": {"term": {"tags": "red"}}}},
        "aggs": {"tot": {"sum": {"field": "total"}}}})
    row = eng.search_aggs("parents", aq).collect()[0]
    assert row["tot"] == pytest.approx(350.0)


def test_has_child_hidden_columns_never_surface(eng):
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}},
        "score_mode": "sum"}}}
    df = eng.search("parents",
                    "#options:load-source=true#" + json.dumps(body))
    assert not [c for c in df.columns if c.startswith("__rel_")]
    assert "note" in df.columns   # source columns still there


# -- has_parent ----------------------------------------------------------


def test_has_parent_filter_and_score(eng):
    # parents matching note:urgent → 1, 3; their children 10, 11, 14
    body = {"query": {"has_parent": {
        "parent_type": "parents", "query": {"term": {"note": "urgent"}}}}}
    got = dict(_rows(_search(eng, "children", body), "cid", "_score"))
    assert got == {10: 1, 11: 1, 14: 1}   # score false → predicate 1
    body["query"]["has_parent"]["score"] = True
    # parent tf score rides to each child (tf of "urgent" is 1)
    got = dict(_rows(_search(eng, "children", body), "cid", "_score"))
    assert got == {10: 1.0, 11: 1.0, 14: 1.0}


def test_has_parent_score_true_inherits_parent_score(eng):
    # should-bool parent scores differ: parent 1 (urgent + total>=100)
    # scores 2, parent 3 (urgent only) scores 1
    body = {"query": {"has_parent": {
        "parent_type": "parents", "score": True,
        "query": {"bool": {"should": [
            {"term": {"note": "urgent"}},
            {"range": {"total": {"gte": 100}}}]}}}}}
    got = dict(_rows(_search(eng, "children", body), "cid", "_score"))
    assert got == {10: 2.0, 11: 2.0, 12: 1.0, 13: 1.0, 14: 1.0}


# -- parent_id -----------------------------------------------------------


def test_parent_id_equality(eng):
    body = {"query": {"parent_id": {"type": "children", "id": "1"}}}
    assert _rows(_search(eng, "children", body), "cid") == [(10,), (11,)]


def test_parent_id_composes(eng):
    body = {"query": {"bool": {
        "must": [{"parent_id": {"type": "children", "id": "2"}},
                 {"term": {"tags": "fast"}}]}}}
    assert _rows(_search(eng, "children", body), "cid") == [(12,), (13,)]


# -- nesting / chaining ----------------------------------------------------


def test_has_parent_inside_has_child_grandparent_chain(spark):
    # three-level chain: grandparents ← parents ← children; a has_child
    # whose child query itself carries a has_parent resolves through
    # the recursive sub-pipeline
    eng = _mk_engine(spark)
    grand = spark.createDataFrame([(100, "root a"), (200, "root b")],
                                  "gid bigint, label string")
    parents2 = spark.createDataFrame(
        [(1, 100, "alpha urgent"), (2, 100, "beta"), (3, 200, "gamma")],
        "pid bigint, gfk bigint, note string")
    eng.register(grand, TableSpec("grand", ["gid"]))
    eng.register(parents2, TableSpec("parents2", ["pid"]))
    eng.register_relation("grand", "parents2", "gid", "gfk")
    eng.register_relation("parents2", "children", "pid", "fk")
    # grandparents having a parent whose note matches urgent
    body = {"query": {"has_child": {
        "type": "parents2",
        "query": {"term": {"note": "urgent"}}}}}
    assert _rows(_search(eng, "grand", body), "gid") == [(100,)]
    # NESTED join: grandparents having a parent that itself has a
    # tags:green child — the child query's own has_child resolves
    # through the recursive sub-pipeline (only parent 3's cid 14 is
    # green; parent 3 hangs off grandparent 200)
    body = {"query": {"has_child": {
        "type": "parents2",
        "query": {"has_child": {
            "type": "children",
            "query": {"term": {"tags": "green"}}}}}}}
    assert _rows(_search(eng, "grand", body), "gid") == [(200,)]


# -- typed errors ----------------------------------------------------------


def test_join_query_typed_errors(eng):
    with pytest.raises(es_dsl.DslError, match="no child relation"):
        _search(eng, "parents",
                {"query": {"has_child": {"type": "nope",
                                         "query": {"match_all": {}}}}})
    with pytest.raises(es_dsl.DslError, match="no parent relation"):
        _search(eng, "children",
                {"query": {"has_parent": {"parent_type": "nope",
                                          "query": {"match_all": {}}}}})
    with pytest.raises(es_dsl.DslError, match="no child relation"):
        _search(eng, "children",
                {"query": {"parent_id": {"type": "nope", "id": "1"}}})
    with pytest.raises(es_dsl.DslError, match="score_mode"):
        _search(eng, "parents",
                {"query": {"has_child": {
                    "type": "children", "query": {"match_all": {}},
                    "score_mode": "median"}}})
    with pytest.raises(es_dsl.DslError, match="min_children"):
        _search(eng, "parents",
                {"query": {"has_child": {
                    "type": "children", "query": {"match_all": {}},
                    "min_children": -1}}})
    with pytest.raises(es_dsl.DslError, match="matches nothing"):
        _search(eng, "parents",
                {"query": {"has_child": {
                    "type": "children", "query": {"match_all": {}},
                    "min_children": 3, "max_children": 2}}})
    with pytest.raises(es_dsl.DslError, match="ignore_unmapped"):
        _search(eng, "parents",
                {"query": {"has_child": {
                    "type": "children", "query": {"match_all": {}},
                    "ignore_unmapped": True}}})
    with pytest.raises(es_dsl.DslError, match="boolean"):
        _search(eng, "children",
                {"query": {"has_parent": {
                    "parent_type": "parents",
                    "query": {"match_all": {}}, "score": "yes"}}})
    with pytest.raises(es_dsl.DslError, match="scalar"):
        _search(eng, "children",
                {"query": {"parent_id": {"type": "children",
                                         "id": [1, 2]}}})


def test_register_relation_typed_errors(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame([(1,)], "a bigint")
    eng.register(df, TableSpec("t1", ["a"]))
    with pytest.raises(es_dsl.DslError, match="not registered"):
        eng.register_relation("t1", "missing", "a", "a")
    eng.register(df, TableSpec("t2", ["a"]))
    with pytest.raises(es_dsl.DslError, match="no column"):
        eng.register_relation("t1", "t2", "nope", "a")


def test_raw_compile_is_typed(eng):
    from cassandra_es_index_spark.search.ast import HasChild, MatchAll
    from cassandra_es_index_spark.search.compile import (
        CompileError, Compiler,
    )
    with pytest.raises(CompileError, match="_expand_join_nodes"):
        Compiler(eng._docs["parents"]).compile(
            HasChild("children", MatchAll()))


def test_has_child_boost(eng):
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}},
        "boost": 3}}}
    got = dict(_rows(_search(eng, "parents", body), "pid", "_score"))
    assert got == {1: 3, 2: 3}


def test_has_child_inside_knn_filter(spark):
    # the top-level knn section's pre-filter may carry a join query —
    # the join expansion probes it (the r11 knn-filter expansion-order
    # lesson applied to has_child)
    import json as _json

    from pyspark.sql import functions as F
    eng = _mk_engine(spark)
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 5)],
        "pid bigint, emb array<double>")
    base = eng._docs["parents"].drop("_id").join(vecs, on="pid")
    eng2 = SearchEngine(spark)
    eng2.register(base, TableSpec("pvec", ["pid"]))
    eng2.register(eng._docs["children"].drop("_id"),
                  TableSpec("children", ["cid"]))
    eng2.register_relation("pvec", "children", "pid", "fk")
    q = _json.dumps({
        "knn": {"field": "emb", "query_vector": [1.0, 1.0], "k": 2,
                "filter": {"has_child": {
                    "type": "children",
                    "query": {"term": {"tags": "red"}}}}},
        "size": 2})
    rows = eng2.search("pvec",
                       "#options:load-rows=false#" + q).collect()
    # parents with red children: 1 and 2 — both pass the filter, knn
    # ranks them by cosine to [1, 1]
    assert {r["pid"] for r in rows} == {1, 2}


# -- children / parent aggregations (r12) ---------------------------------


def test_children_agg_doc_count_and_buckets(eng):
    # parents matching note:urgent = {1, 3}; their children = {10, 11,
    # 14} — doc_count counts CHILDREN (ES children-agg contract), the
    # orphan (fk 9) and parent-2 children never enter the frame
    body = {"query": {"term": {"note": "urgent"}},
            "aggs": {"ch": {"children": {"type": "children"}}}}
    out = eng.search_aggs("parents", json.dumps(body),
                          default_field="note").collect()
    assert len(out) == 1 and out[0]["doc_count"] == 3
    # bucket sub-agg composes unchanged over the rebound child frame
    body["aggs"]["ch"]["aggs"] = {
        "t": {"terms": {"field": "tags", "size": 10},
              "aggs": {"sq": {"sum": {"field": "qty"}}}}}
    rows = sorted((r["key"], r["doc_count"], r["sq"]) for r in
                  eng.search_aggs("parents", json.dumps(body),
                                  default_field="note").collect())
    assert rows == [("green", 1, 2.0), ("red fast", 1, 5.0),
                    ("red slow", 1, 40.0)]


def test_children_agg_metrics_only(eng):
    # metrics-only sub rides the generic global-metrics path (one row,
    # metric columns — the sampler/nested convention)
    body = {"query": {"term": {"note": "urgent"}},
            "aggs": {"ch": {"children": {"type": "children"},
                            "aggs": {"sq": {"sum": {"field": "qty"}},
                                     "mx": {"max": {"field": "qty"}}}}}}
    row = eng.search_aggs("parents", json.dumps(body),
                          default_field="note").collect()[0]
    assert (row["sq"], row["mx"]) == (47.0, 40.0)


def test_parent_agg_distinct_parents(eng):
    # children matching tags:red = {10, 11, 13, 15}; their parents =
    # {1, 2} — parent 1 bucketed ONCE despite two matching children
    # (the semi-join dedup, ES parent-agg contract); orphan fk 9 has no
    # parent row and drops out
    body = {"query": {"term": {"tags": "red"}},
            "aggs": {"p": {"parent": {"type": "parents"}}}}
    out = eng.search_aggs("children", json.dumps(body),
                          default_field="tags").collect()
    assert len(out) == 1 and out[0]["doc_count"] == 2
    body["aggs"]["p"]["aggs"] = {"at": {"avg": {"field": "total"}}}
    row = eng.search_aggs("children", json.dumps(body),
                          default_field="tags").collect()[0]
    assert row["at"] == pytest.approx(175.0)   # (100 + 250) / 2


def test_rel_agg_typed_errors(eng):
    cases = [
        ({"ch": {"children": {"type": "nope"}}},
         "no child relation"),
        ({"p": {"parent": {"type": "nope"}}},
         "no parent relation"),
        ({"ch": {"children": {"type": "children", "x": 1}}},
         "unsupported params"),
        ({"ch": {"children": {}}}, "needs a 'type'"),
        ({"ch": {"children": {"type": "children"},
                 "aggs": {"g": {"global": {}}}}},
         "wrong table"),
        ({"ch": {"children": {"type": "children"},
                 "aggs": {"s": {"sampler": {}}}}},
         "wrong table"),
        ({"ch": {"children": {"type": "children"},
                 "aggs": {"c2": {"children": {"type": "children"}}}}},
         "wrong table"),
    ]
    for aggs, frag in cases:
        body = {"query": {"match_all": {}}, "aggs": aggs}
        with pytest.raises(es_dsl.DslError, match=frag):
            eng.search_aggs("parents" if "ch" in aggs else "children",
                            json.dumps(body))


# -- join inner_hits (r13) -------------------------------------------------


def test_has_child_inner_hits_flatten_and_ranking(eng):
    # each parent hit expands to its top-2 matching children ranked by
    # child score desc (key asc tiebreak); parent 2's single match
    # "red red fast" carries tf 2
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}},
        "score_mode": "sum", "inner_hits": {"size": 2}}}}
    rows = _rows(_search(eng, "parents", body),
                 "pid", "_inner_rank", "children_cid",
                 "children__score")
    assert rows == [(1, 1, 10, 1.0), (1, 2, 11, 1.0), (2, 1, 13, 2.0)]


def test_has_child_inner_hits_size_caps_children(eng):
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}},
        "inner_hits": {"size": 1}}}}
    rows = _rows(_search(eng, "parents", body), "pid", "children_cid")
    assert rows == [(1, 10), (2, 13)]


def test_has_child_inner_hits_paging_counts_parents(eng):
    # size: 1 pages PARENTS — one parent hit, its <=2 inner rows ride
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}},
        "inner_hits": {"size": 2}}}, "size": 1}
    df = _search(eng, "parents", body)
    rows = df.collect()
    assert len({r["pid"] for r in rows}) == 1
    assert sorted(r["_inner_rank"] for r in rows) == [1, 2]


def test_has_child_inner_hits_min_children_zero_null_row(eng):
    # min_children 0 admits childless parents — they keep ONE row with
    # null inner columns (the flattened twin of an empty inner_hits)
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}},
        "min_children": 0, "inner_hits": {"size": 2}}}}
    got = {r["pid"]: r["_inner_rank"]
           for r in _search(eng, "parents", body).collect()
           if r["_inner_rank"] is None}
    assert set(got) == {3, 4}


def test_has_parent_inner_hits_parent_fields(eng):
    body = {"query": {"has_parent": {
        "parent_type": "parents", "query": {"term": {"note": "urgent"}},
        "inner_hits": {"size": 1}}}}
    rows = _rows(_search(eng, "children", body),
                 "cid", "_inner_rank", "parents_pid", "parents_note")
    assert rows == [(10, 1, 1, "alpha urgent"),
                    (11, 1, 1, "alpha urgent"),
                    (14, 1, 3, "gamma urgent")]


def test_has_child_inner_hits_row_load_mode(eng):
    # default row-load mode: base row + _score + flattened inner cols
    import json as _json
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}},
        "inner_hits": {"size": 1}}}}
    df = eng.search("parents", _json.dumps(body))
    assert {"note", "total", "_inner_rank", "children_cid",
            "children__score"} <= set(df.columns)
    assert df.count() == 2


def test_join_inner_hits_typed_errors(eng):
    # non-top-level join clause
    with pytest.raises(es_dsl.DslError, match="TOP-LEVEL join"):
        _search(eng, "parents", {"query": {"bool": {
            "must": [{"has_child": {"type": "children",
                                    "query": {"term": {"tags": "red"}},
                                    "inner_hits": {}}},
                     {"term": {"note": "urgent"}}]}}})
    # grandparent chain: inner join query carrying inner_hits
    with pytest.raises(es_dsl.DslError, match="TOP-LEVEL join"):
        _search(eng, "parents", {"query": {"has_child": {
            "type": "children",
            "query": {"has_parent": {
                "parent_type": "parents",
                "query": {"match_all": {}}, "inner_hits": {}}}}}})
    with pytest.raises(es_dsl.DslError, match="positive integer"):
        _search(eng, "parents", {"query": {"has_child": {
            "type": "children", "query": {"match_all": {}},
            "inner_hits": {"size": 0}}}})
    with pytest.raises(es_dsl.DslError, match="unsupported parameters"):
        _search(eng, "parents", {"query": {"has_child": {
            "type": "children", "query": {"match_all": {}},
            "inner_hits": {"name": "x"}}}})
    with pytest.raises(es_dsl.DslError, match="must be an object"):
        _search(eng, "parents", {"query": {"has_parent": {
            "parent_type": "parents", "query": {"match_all": {}},
            "inner_hits": 3}}})


def test_has_child_inner_hits_source_filter(eng):
    # r13: _source include-list narrows the surfaced child fields;
    # the join/tiebreak keys still rank but do not surface
    body = {"query": {"has_child": {
        "type": "children", "query": {"term": {"tags": "red"}},
        "inner_hits": {"size": 1, "_source": ["tags"]}}}}
    df = _search(eng, "parents", body)
    assert "children_tags" in df.columns
    assert "children_cid" not in df.columns
    assert "children_qty" not in df.columns
    rows = _rows(df, "pid", "children_tags")
    assert rows == [(1, "red fast"), (2, "red red fast")]
    # string shorthand
    body["query"]["has_child"]["inner_hits"]["_source"] = "qty"
    df2 = _search(eng, "parents", body)
    assert "children_qty" in df2.columns
    # unknown field typed
    body["query"]["has_child"]["inner_hits"]["_source"] = ["zz"]
    with pytest.raises(es_dsl.DslError, match="not.*columns"):
        _search(eng, "parents", body)
    # bad shape typed
    body["query"]["has_child"]["inner_hits"]["_source"] = []
    with pytest.raises(es_dsl.DslError, match="_source"):
        _search(eng, "parents", body)
