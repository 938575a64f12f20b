"""The r9 pipeline/sibling tier completion: ``normalize`` pipeline agg,
the sibling stat kinds (``stats_bucket`` / ``extended_stats_bucket`` /
``percentiles_bucket``), and the ``top_metrics`` metric — closed-form
expectations on a hand-sized frame, per-parent normalize scoping at
depth, and the typed-error surface.

Reference parity target: the reference forwards aggregation bodies
verbatim to ES (ref ElasticIndex.java search path), so the ES contracts
are the semantics source."""

import json
import math

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError

# (id, group, sort key, value) — groups of unequal size and sums
ROWS = [
    (1, "a", 10.0, 1.0), (2, "a", 20.0, 2.0), (3, "a", 30.0, 3.0),
    (4, "b", 5.0, 4.0), (5, "b", 15.0, 6.0),
    (6, "c", 99.0, 10.0),
    (7, "c", None, 50.0),   # null sort key: skipped by top_metrics
]


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        ROWS, "id bigint, g string, s double, v double")
    e = SearchEngine(spark)
    e.register(df, TableSpec("t2", ["id"]))
    return e


def _aggs(eng, body):
    q = json.dumps({"query": {"match_all": {}}, "aggs": body})
    return {r["key"]: r for r in eng.search_aggs("t2", q).collect()}


def _terms_with(extra):
    return {"by": {"terms": {"field": "g"},
                   "aggs": {"sv": {"sum": {"field": "v"}}, **extra}}}


# ------------------------------------------------------------- normalize

def test_normalize_methods_closed_form(eng):
    by = _aggs(eng, _terms_with({
        "pct": {"normalize": {"buckets_path": "sv",
                              "method": "percent_of_sum"}},
        "r01": {"normalize": {"buckets_path": "sv",
                              "method": "rescale_0_1"}},
        "r100": {"normalize": {"buckets_path": "sv",
                               "method": "rescale_0_100"}},
        "mn": {"normalize": {"buckets_path": "sv", "method": "mean"}},
        "z": {"normalize": {"buckets_path": "sv", "method": "z-score"}},
        "sm": {"normalize": {"buckets_path": "sv", "method": "softmax"}},
    }))
    sums = {"a": 6.0, "b": 10.0, "c": 60.0}
    tot, mn, mx = 76.0, 6.0, 60.0
    mean = tot / 3.0
    sd = math.sqrt(sum((x - mean) ** 2 for x in sums.values()) / 3.0)
    esum = sum(math.exp(x) for x in sums.values())
    for k, s in sums.items():
        assert abs(by[k]["pct"] - s / tot) < 1e-12
        assert abs(by[k]["r01"] - (s - mn) / (mx - mn)) < 1e-12
        assert abs(by[k]["r100"] - 100.0 * (s - mn) / (mx - mn)) < 1e-12
        assert abs(by[k]["mn"] - (s - mean) / (mx - mn)) < 1e-12
        assert abs(by[k]["z"] - (s - mean) / sd) < 1e-12
        assert abs(by[k]["sm"] - math.exp(s) / esum) < 1e-9


def test_normalize_on_count_and_constant_frame_nulls(eng):
    # _count path works; a CONSTANT frame (max == min) nulls the
    # rescale instead of raising (try_divide, the script-safety rule)
    by = _aggs(eng, {"by": {"terms": {"field": "g"}, "aggs": {
        "cc": {"value_count": {"field": "id"}},
        "r": {"normalize": {"buckets_path": "_count",
                            "method": "rescale_0_1"}}}}})
    assert by["a"]["r"] == 1.0 and by["c"]["r"] == 0.0
    one = _aggs(eng, {"by": {"terms": {"field": "g", "include": ["a"]},
                             "aggs": {"r": {"normalize": {
                                 "buckets_path": "_count",
                                 "method": "rescale_0_1"}}}}})
    assert one["a"]["r"] is None


def test_normalize_scopes_per_parent_at_depth(eng):
    # nested level: each parent's bucket frame normalizes independently
    q = json.dumps({"query": {"match_all": {}}, "aggs": {
        "by": {"terms": {"field": "g"}, "aggs": {
            "h": {"histogram": {"field": "v", "interval": 5.0}, "aggs": {
                "c": {"value_count": {"field": "v"}},
                "p": {"normalize": {"buckets_path": "c",
                                    "method": "percent_of_sum"}}}}}}}})
    rows = eng.search_aggs("t2", q).collect()
    per_parent = {}
    for r in rows:
        per_parent.setdefault(r["key"], []).append(r["p"])
    # each parent's percents sum to 1 independently
    for k, ps in per_parent.items():
        assert abs(sum(p for p in ps if p is not None) - 1.0) < 1e-12, k


# ------------------------------------------------- sibling stat tier

def test_sibling_stats_and_percentiles_closed_form(eng):
    by = _aggs(eng, {**_terms_with({}),
                     "st": {"stats_bucket": {"buckets_path": "by>sv"}},
                     "ex": {"extended_stats_bucket":
                            {"buckets_path": "by>sv"}},
                     "pb": {"percentiles_bucket":
                            {"buckets_path": "by>sv",
                             "percents": [0.0, 50.0, 100.0]}}})
    sums = [6.0, 10.0, 60.0]
    mean = sum(sums) / 3.0
    var = sum((x - mean) ** 2 for x in sums) / 3.0
    row = by["a"]   # constants ride every bucket row
    assert row["st_count"] == 3 and row["st_min"] == 6.0
    assert row["st_max"] == 60.0 and abs(row["st_avg"] - mean) < 1e-12
    assert row["st_sum"] == 76.0
    assert row["ex_sum_of_squares"] == sum(x * x for x in sums)
    assert abs(row["ex_variance"] - var) < 1e-9
    assert abs(row["ex_std_deviation"] - math.sqrt(var)) < 1e-9
    assert row["pb_p0"] == 6.0 and row["pb_p100"] == 60.0
    assert row["pb_p50"] == 10.0   # exact median of [6, 10, 60]


def test_sibling_on_count_and_default_percents(eng):
    by = _aggs(eng, {**_terms_with({}),
                     "st": {"stats_bucket": {"buckets_path": "by>_count"}},
                     "pb": {"percentiles_bucket":
                            {"buckets_path": "by>_count"}}})
    row = by["b"]
    assert row["st_min"] == 2 and row["st_max"] == 3
    assert "pb_p99" in row.asDict()   # ES default percent ladder


# ------------------------------------------------------- top_metrics

def test_top_metrics_desc_asc_and_null_sort_skip(eng):
    by = _aggs(eng, {"by": {"terms": {"field": "g"}, "aggs": {
        "hi": {"top_metrics": {"metrics": [{"field": "v"},
                                           {"field": "id"}],
                               "sort": {"s": "desc"}}},
        "lo": {"top_metrics": {"metrics": {"field": "v"},
                               "sort": {"s": "asc"}}}}}})
    assert by["a"]["hi_v"] == 3.0 and by["a"]["hi_id"] == 3
    assert by["a"]["lo_v"] == 1.0
    # group c: the null-s doc (v=50) is skipped, the s=99 doc wins
    assert by["c"]["hi_v"] == 10.0 and by["c"]["lo_v"] == 10.0


def test_top_metrics_top_level(eng):
    q = json.dumps({"query": {"match_all": {}}, "aggs": {
        "tm": {"top_metrics": {"metrics": {"field": "g"},
                               "sort": {"s": "desc"}}}}})
    rows = eng.search_aggs("t2", q).collect()
    assert len(rows) == 1 and rows[0]["tm_g"] == "c"


# ------------------------------------------------------- typed errors

@pytest.mark.parametrize("extra, msg", [
    ({"n": {"normalize": {"buckets_path": "sv"}}}, "method must be"),
    ({"n": {"normalize": {"buckets_path": "sv", "method": "minmax"}}},
     "method must be"),
    ({"n": {"normalize": {"method": "mean"}}}, "buckets_path"),
    ({"n": {"normalize": {"buckets_path": "zzz", "method": "mean"}}},
     "unknown buckets_path"),
    # size 3 graduated to implemented (r12) — the >10 ceiling is the
    # remaining typed contract
    ({"n": {"top_metrics": {"metrics": {"field": "v"},
                            "sort": {"s": "asc"}, "size": 50}}},
     r"\[1, 10\]"),
    ({"n": {"top_metrics": {"metrics": {"field": "v"}}}},
     "plain-field sort"),
    ({"n": {"top_metrics": {"metrics": {"field": "v"},
                            "sort": "_score"}}}, "plain-field sort"),
    ({"n": {"top_metrics": {"sort": {"s": "asc"}}}}, "'metrics'"),
])
def test_typed_errors_inside_bucket(eng, extra, msg):
    with pytest.raises(DslError, match=msg):
        _aggs(eng, _terms_with(extra))


@pytest.mark.parametrize("body, msg", [
    ({"pb": {"percentiles_bucket": {"buckets_path": "by>sv",
                                    "percents": [-1]}}},
     "numbers in \\[0, 100\\]"),
    ({"pb": {"percentiles_bucket": {"buckets_path": "by>sv",
                                    "percents": []}}},
     "numbers in \\[0, 100\\]"),
    ({"st": {"stats_bucket": {"buckets_path": "by>zzz"}}},
     "buckets_path"),
    ({"st": {"stats_bucket": {"buckets_path": "nope>sv"}}},
     "buckets_path"),
])
def test_typed_errors_sibling(eng, body, msg):
    with pytest.raises(DslError, match=msg):
        _aggs(eng, {**_terms_with({}), **body})


def test_duplicate_flattened_sibling_columns_rejected(eng):
    # a sibling whose flattened stat columns collide with a metric name
    with pytest.raises(DslError, match="duplicate column"):
        _aggs(eng, {"by": {"terms": {"field": "g"},
                           "aggs": {"st_min": {"min": {"field": "v"}},
                                    "sv": {"sum": {"field": "v"}}}},
                    "st": {"stats_bucket": {"buckets_path": "by>sv"}}})
