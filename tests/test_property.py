"""Property-based tests (hypothesis) for the pure-Python surfaces:
JSON flatten, dotted→structured, option parsing, query-string parser."""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_es_index_spark.functions import json_utils as ju
from cassandra_es_index_spark.search import query_string as qs
from cassandra_es_index_spark.search.ast import Node
from cassandra_es_index_spark.search.options import QueryMetaData

keys = st.text(string.ascii_letters + "_", min_size=1, max_size=8)
scalars = st.one_of(st.none(), st.booleans(),
                    st.integers(-10**6, 10**6),
                    st.text(string.ascii_letters, max_size=10))
json_values = st.one_of(
    scalars,
    st.lists(scalars, max_size=4),
    st.dictionaries(keys, scalars, max_size=4),
)
json_objects = st.dictionaries(keys, json_values, max_size=6)


@given(json_objects)
@settings(max_examples=200, deadline=None)
def test_flatten_always_string_arrays(obj):
    out = json.loads(ju.flatten(json.dumps(obj)))
    assert set(out) == set(obj)
    for value in out.values():
        assert isinstance(value, list)
        assert all(isinstance(x, str) for x in value)


@given(st.dictionaries(
    st.lists(keys, min_size=1, max_size=4).map(".".join),
    scalars, min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_dotted_to_structured_preserves_leaves(obj):
    out = ju.dotted_to_structured(obj)

    def leaves(node, prefix=()):
        if isinstance(node, dict):
            for k, v in node.items():
                yield from leaves(v, (*prefix, k))
        else:
            yield ".".join(prefix), node

    got = dict(leaves(out))
    # every input key resolves through the structure (later keys may
    # overwrite earlier conflicting paths — same as the Java merge)
    for key, value in obj.items():
        if key in got:
            assert got[key] == value or isinstance(got[key], dict)
    assert all("." not in k for k in out)


@given(st.dictionaries(
    st.text(string.ascii_letters + "-", min_size=1, max_size=10),
    st.text(string.ascii_letters + string.digits, min_size=1, max_size=10),
    min_size=1, max_size=5),
    st.text(string.ascii_letters + string.digits + ":*# ", max_size=30))
@settings(max_examples=200, deadline=None)
def test_options_roundtrip(options, query):
    encoded = "#options:" + ",".join(f"{k}={v}" for k, v in options.items()) \
              + "#" + query
    meta = QueryMetaData.parse(encoded)
    assert meta.query == query
    assert meta.options == options


@given(st.text(string.ascii_letters + string.digits
               + ' :*?()"[]{}<>=-~&|!.^+/',
               min_size=1, max_size=60))
@settings(max_examples=500, deadline=None)
def test_parser_total(query):
    """The parser either returns an AST or raises QueryParseError —
    never a crash of another type (the `validate` contract)."""
    try:
        node = qs.parse(query)
        assert isinstance(node, Node)
    except qs.QueryParseError:
        pass


@given(st.lists(st.sampled_from(["hello", "body:x", "a*", "f:[1 TO 2]",
                                 '"p q"', "NOT z", "(a OR b)"]),
                min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_parser_accepts_well_formed(parts):
    for joiner in (" ", " AND ", " OR "):
        node = qs.parse(joiner.join(parts))
        assert isinstance(node, Node)


wildcard_patterns = st.text(
    string.ascii_lowercase + "*?", min_size=1, max_size=8).filter(
    lambda p: any(c.isalpha() for c in p.replace("?", "")))
plain_tokens = st.text(string.ascii_lowercase + string.digits,
                       min_size=1, max_size=10)


@given(wildcard_patterns, plain_tokens)
@settings(max_examples=300, deadline=None)
def test_wildcard_dictionary_equivalence(pattern, token):
    """The index-served wildcard plan's core claim: the scan regex
    `\\b<pat>\\b` matches inside a text consisting of one token iff the
    anchored dictionary pattern matches that token — so dictionary
    expansion reproduces the scan exactly."""
    import re as _re

    from cassandra_es_index_spark.search.compile import (
        wildcard_pattern, wildcard_token_pattern,
    )

    scan = _re.compile(wildcard_pattern(pattern).replace("(?i)", ""),
                       _re.IGNORECASE | _re.ASCII)
    anchored = _re.compile(wildcard_token_pattern(pattern), _re.ASCII)
    # surround the token with non-word context like real text would
    m = anchored.match(token)
    assert bool(scan.search(f". {token}, .")) == bool(m and m.end() == len(token))


# -- sloppy-phrase pattern equivalence --------------------------------------

_phrase_words = st.lists(st.sampled_from(["alpha", "beta", "gamma"]),
                         min_size=2, max_size=3, unique=True)
_gap_sizes = st.lists(st.integers(min_value=0, max_value=4),
                      min_size=1, max_size=2)


@given(_phrase_words, _gap_sizes, st.integers(min_value=0, max_value=3))
@settings(max_examples=300, deadline=None)
def test_slop_pattern_gap_budget(words, gaps, slop):
    """phrase_pattern(text, slop) matches exactly when every gap between
    consecutive phrase words holds at most `slop` intervening tokens —
    the documented per-gap budget semantics."""
    import re as _re

    from cassandra_es_index_spark.search.compile import phrase_pattern

    gaps = (gaps * len(words))[:len(words) - 1]  # one gap per word pair
    fillers = ["zzz"] * 99  # disjoint from the phrase vocabulary
    parts = [words[0]]
    for w, g in zip(words[1:], gaps):
        parts.extend(fillers[:g])
        parts.append(w)
    text = "pre " + " ".join(parts) + " post"
    pat = _re.compile(phrase_pattern(" ".join(words), slop)
                      .replace("(?i)", ""), _re.IGNORECASE)
    assert bool(pat.search(text)) == all(g <= slop for g in gaps)


@given(st.lists(st.sampled_from(["+alpha", "-beta", "gamma", "+d", "-e"]),
                min_size=1, max_size=5, unique=True))
@settings(max_examples=200, deadline=None)
def test_required_prohibited_regroup_total(parts):
    """Any mix of +/-/plain juxtaposed clauses parses to a well-formed
    node, and the musts always gate: a query with any +clause regroups
    into a conjunction rooted at And (or the must itself)."""
    from cassandra_es_index_spark.search.ast import And, Node, Not, Term

    node = qs.parse(" ".join(parts))
    assert isinstance(node, Node)
    musts = [p for p in parts if p.startswith("+")]
    if musts and len(parts) > 1:
        assert isinstance(node, (And, Term, Not))


# ---------------------------------------------------------------------------
# DSL robustness fuzz (round 5): parse_request must reject malformed
# bodies with DslError — never leak StopIteration/KeyError/TypeError
# ---------------------------------------------------------------------------

_JSON_SCALARS = st.one_of(
    st.none(), st.booleans(), st.integers(-10, 10),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="abz*?~^&|()[]{}<>\"'\\/.+-_:int 0123", max_size=12))

_DSL_KEYWORDS = st.sampled_from([
    "query", "aggs", "sort", "size", "from", "search_after", "collapse",
    "highlight", "rescore", "knn", "match", "term", "terms", "bool",
    "must", "should", "filter", "must_not", "range", "field", "fields",
    "gte", "lte", "boost", "fuzziness", "terms", "histogram",
    "date_histogram", "interval", "calendar_interval", "buckets_path",
    "script", "significant_terms", "composite", "sources", "dis_max",
    "queries", "function_score", "field_value_factor", "nested", "path",
    "span_near", "clauses", "span_term", "pinned", "ids", "organic",
    "wrapper", "simple_query_string", "missing", "min_doc_count",
    "top_hits", "filters", "ranges", "order", "include", "exclude",
    "_source", "script_fields", "max_expansions", "offset",
    "number_of_fragments", "fragment_size", "num_candidates", "method",
    "nprobe",
    # r14.75 widening — the post-r5 surface: join/percolate/retriever/
    # intervals/rank-features/suggest/runtime/time_zone-format kinds
    "has_child", "has_parent", "parent_id", "inner_hits", "type",
    "percolate", "document", "intervals", "all_of", "any_of",
    "match_bool_prefix", "combined_fields", "rank_feature",
    "distance_feature", "pivot", "origin", "saturation", "log",
    "scaling_factor", "retriever", "rrf", "retrievers", "linear",
    "standard", "rank_window_size", "weights", "normalizer",
    "runtime_mappings", "suggest", "text", "completion", "phrase",
    "prefix", "regex", "min_score", "post_filter", "track_total_hits",
    "docvalue_fields", "terminate_after", "time_zone", "format",
    "moving_avg", "moving_fn", "window", "normalize", "t_test",
    "frequent_item_sets", "geo_distance", "geo_bounding_box",
    "geo_polygon", "geo_shape", "geotile_grid", "geohash_grid",
    "reverse_nested", "sampler", "diversified_sampler",
    "random_sampler", "probability", "seed", "categorize_text",
    "variable_width_histogram", "multi_terms", "rare_terms",
    "significant_text", "adjacency_matrix", "ip_range", "ip_prefix",
    "extended_bounds", "hard_bounds", "other_bucket",
    "other_bucket_key", "span_not", "span_or", "span_first",
    "span_multi", "fuzzy", "regexp", "wildcard", "prefix_length",
    "transpositions", "slop", "in_order", "zero_terms_query",
    "minimum_should_match", "tie_breaker", "operator", "analyzer",
    "case_insensitive", "relation", "value", "flags", "rewrite",
])

_JSON_VALUES = st.recursive(
    _JSON_SCALARS,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(_DSL_KEYWORDS, children, max_size=3)),
    max_leaves=12)


@given(st.dictionaries(_DSL_KEYWORDS, _JSON_VALUES, max_size=4))
@settings(max_examples=400, deadline=None)
def test_parse_request_rejects_with_dsl_error_only(body):
    """Arbitrary JSON built from DSL keywords either parses or raises
    DslError — any other exception type is a parser robustness bug (the
    class the round-4 advice flagged: bare StopIteration / ValueError
    escaping on malformed aggs/boost specs)."""
    from cassandra_es_index_spark.search.es_dsl import (
        DslError, parse_request,
    )
    from cassandra_es_index_spark.search.query_string import (
        QueryParseError,
    )

    try:
        parse_request(body)
    except (DslError, QueryParseError):
        pass


@given(st.text(alphabet='ab "|+-()*~^:[]{}<>&!\\0123', max_size=30))
@settings(max_examples=400, deadline=None)
def test_simple_query_string_is_lenient(text):
    """simple_query_string is lenient BY CONTRACT: any input parses."""
    from cassandra_es_index_spark.search.es_dsl import parse_request

    parse_request({"query": {"simple_query_string": {"query": text}}})


@given(st.datetimes(min_value=__import__("datetime").datetime(1990, 1, 5),
                    max_value=__import__("datetime").datetime(2100, 12, 25)),
       st.integers(min_value=-500, max_value=500),
       st.sampled_from(["y", "M", "w", "d", "h", "m", "s"]))
@settings(max_examples=300, deadline=None)
def test_datemath_properties(now, n, unit):
    from cassandra_es_index_spark.search import datemath as dm

    # arithmetic round-trips: +Nu then -Nu is identity for fixed units;
    # month/year arithmetic may clamp the day, so only fixed units assert
    expr = f"now{'+' if n >= 0 else ''}{n}{unit}"
    moved = dm.resolve(expr, now)
    if unit in ("w", "d", "h", "m", "s"):
        back = dm.resolve(
            f"now{'+' if -n >= 0 else ''}{-n}{unit}", moved)
        assert back == now
    # rounding brackets the instant: down <= now < up, exactly one unit
    # apart in the fixed-unit cases
    down = dm.resolve(f"now/{unit}", now)
    up = dm.resolve(f"now/{unit}", now, round_up=True)
    assert down <= now < up
    assert dm.resolve(f"now/{unit}", down) == down   # idempotent
    # weeks round to Monday
    if unit == "w":
        assert down.weekday() == 0


# --------------------------------------------------------------------------
# pack_sequences span arithmetic (r14) — pure-python twin of the Column
# math: the spans must tile every document's token range exactly once,
# in stream order, within sequence bounds


@given(st.lists(st.integers(min_value=0, max_value=37), min_size=1,
                max_size=30),
       st.integers(min_value=1, max_value=16),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=200, deadline=None)
def test_pack_sequences_span_arithmetic(token_counts, L, boundary):
    # replicate the operator's arithmetic (offsets + overlap windows)
    # and check the tiling invariants hold for ANY corpus shape
    spans = []
    off = 0
    for d, n in enumerate(token_counts):
        if n > 0:
            for s in range(off // L, (off + n - 1) // L + 1):
                lo = max(off, s * L)
                hi = min(off + n, s * L + L)
                spans.append((s, d, lo - s * L, lo - off, hi - lo))
        off += n + boundary
    total = off
    for s, d, seq_off, doc_off, w in spans:
        assert 0 <= seq_off < L and w >= 1 and seq_off + w <= L
        assert 0 <= doc_off < max(1, token_counts[d])
    # every document's tokens are covered exactly once, in order
    per_doc = {}
    for s, d, seq_off, doc_off, w in spans:
        per_doc.setdefault(d, []).append((s, seq_off, doc_off, w))
    for d, n in enumerate(token_counts):
        got = sorted(per_doc.get(d, []))
        assert sum(w for *_, w in got) == n
        expect_off = 0
        for _, _, doc_off, w in got:
            assert doc_off == expect_off
            expect_off += w
    # stream positions never collide across documents
    positions = [(s * L + seq_off + k)
                 for s, _, seq_off, _, w in spans for k in range(w)]
    assert len(positions) == len(set(positions))
    assert all(0 <= p < total for p in positions)
