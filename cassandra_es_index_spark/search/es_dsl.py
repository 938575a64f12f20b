"""ES query-DSL subset → engine AST.

The reference forwards any query starting with ``{`` verbatim to ES
(ref ElasticIndex.java:663-667); the documented/tested subset is
``range``, ``term``, ``terms``, ``match``, ``match_all``, ``exists``,
``bool`` (must/should/must_not/filter), ``query_string``, plus a top-level
``size`` (ref README.md:404-405). We translate that subset plus engine
superset clauses that compose onto the same AST: ``match_phrase``
(Phrase), ``prefix``/``wildcard`` (Wildcard — index-served when postings
exist), ``ids`` (doc-id lookup), top-level ``sort`` (field ordering
instead of score), ``search_after`` (keyset pagination — ES's
deep-pagination mechanism, a filter rather than an offset scan), and
``aggs``/``aggregations`` (terms / histogram / date_histogram buckets
with metric sub-aggs, executed by ``SearchEngine.search_aggs``; the
reference can only pass these through to ES, ref SURVEY.md §2.4).
"""

from __future__ import annotations

import json
import re as _re
from dataclasses import dataclass, field as dc_field
from typing import Any

from cassandra_es_index_spark.search.ast import (
    And, Boost, Boosting, ConstantScore, DisMax, DistanceFeature, Exists,
    FunctionScore,
    FunctionScoreArray, GeoBoundingBox, GeoDistance, GeoExists, GeoGridCell,
    GeoOnLine, GeoPolygon, GeoShapeLookup, HasChild, HasParent,
    KnnClause, ParentIdQ, PercolateDoc,
    DecayScore, Fuzzy, Ids, IntervalsMatch, MatchAll, MatchNone,
    MoreLikeThis, Nested,
    Node, Not, Or,
    Phrase, Range, RandomScore, RankFeature, Regexp, ScoreFunction,
    Scoreless, ScriptFilter, ScriptScore, Should, SpanContaining,
    SpanFirst, SpanNear,
    SpanNot, SpanOr,
    Term, TermPattern, TermsLookup, TermsSet, Wildcard,
)
from cassandra_es_index_spark.search import datemath
from cassandra_es_index_spark.search import query_string as qs


class DslError(ValueError):
    pass


_METRIC_KINDS = ("avg", "sum", "min", "max", "value_count", "cardinality",
                 "stats", "percentiles", "percentile_ranks",
                 "extended_stats", "weighted_avg",
                 "geo_centroid", "geo_bounds",
                 "boxplot", "matrix_stats",
                 "median_absolute_deviation", "string_stats",
                 "top_metrics", "reverse_nested", "rate", "t_test",
                 "geo_line", "scripted_metric")
_BUCKET_KINDS = ("terms", "histogram", "date_histogram", "range",
                 "geo_distance", "filters",
                 "date_range", "significant_terms",
                 "significant_text", "rare_terms",
                 "multi_terms", "adjacency_matrix",
                 "geotile_grid", "geohash_grid", "auto_date_histogram",
                 "categorize_text", "variable_width_histogram",
                 "frequent_item_sets", "ip_range", "ip_prefix")
# single-bucket aggs: one bucket (doc_count + metric sub-aggs) whose doc
# set is a transform of the match set
_SINGLE_BUCKET_KINDS = ("filter", "missing", "global")
# Per-kind parameter allowlists for the GENERIC bucket parse path (r11
# — the specialized branches carry their own): a silently-dropped
# `shard_size`/`time_zone`/`other_bucket` would change bucket contents
# vs ES with no signal (the r9 leaf-params lesson, applied to aggs).
# `keyed` is an accepted no-op where listed: the engine's flattened
# frame is ALWAYS keyed by the key column, so both response shapes
# read identically.
_GENERIC_BUCKET_PARAMS = {
    "terms": {"field", "size", "order", "missing", "min_doc_count",
              "include", "exclude"},
    "histogram": {"field", "interval", "offset", "missing",
                  "min_doc_count", "extended_bounds", "hard_bounds"},
    "date_histogram": {"field", "calendar_interval", "fixed_interval",
                       "offset", "missing", "min_doc_count",
                       "extended_bounds", "hard_bounds", "time_zone"},
    "range": {"field", "ranges", "keyed"},
    "date_range": {"field", "ranges", "keyed", "format"},
    "filters": {"filters", "keyed", "other_bucket", "other_bucket_key"},
    "adjacency_matrix": {"filters"},
    "ip_range": {"field", "ranges", "keyed"},
    "ip_prefix": {"field", "prefix_length", "is_ipv6",
                  "append_prefix_length", "min_doc_count"},
}
# ES pipeline aggs computed OVER the bucket frame (single-level only):
# value per bucket from a sibling metric (or "_count")
_PIPELINE_KINDS = ("cumulative_sum", "derivative", "serial_diff",
                   "moving_fn", "moving_avg", "bucket_script",
                   "bucket_selector",
                   "bucket_sort", "normalize", "cumulative_cardinality",
                   "moving_percentiles")
# ES normalize methods → the rescaling applied per bucket over its
# parent's bucket frame (r9); z-score uses the POPULATION deviation
# (extended_stats convention); a constant frame (max == min) or zero
# sum yields null values (Spark 0-divisor), documented
_NORMALIZE_METHODS = ("rescale_0_1", "rescale_0_100", "percent_of_sum",
                      "mean", "z-score", "softmax")
# sibling pipeline aggs: one value (or flattened stat set, r9) computed
# OVER the bucket agg's frame, declared NEXT TO the bucket agg (ES
# syntax), emitted as constant columns on every bucket row
_SIBLING_KINDS = ("avg_bucket", "sum_bucket", "min_bucket", "max_bucket",
                  "stats_bucket", "extended_stats_bucket",
                  "percentiles_bucket", "bucket_correlation",
                  "bucket_count_ks_test", "change_point")

# bucket_script / bucket_selector scripts: the painless subset that is
# pure arithmetic/comparison over params refs — translated to a Spark SQL
# expression (params.x → the resolved bucket column)
_SCRIPT_OK = _re.compile(
    r"^(?:params\.\w+|\d+(?:\.\d+)?|[\s\+\-\*/%\(\)]|==|!=|<=|>=|<|>|&&"
    r"|\|\||!)+$")


_DOC_SCRIPT_OK = _re.compile(
    r"^(?:doc\['[A-Za-z_][\w.]*'\]\.value|\d+(?:\.\d+)?"
    r"|[\s\+\-\*/%\(\)]|==|!=|<=|>=|<|>|&&|\|\||!)+$")


# user-script token stream: SQL atoms (substituted refs / numbers),
# arithmetic/comparison/logical operators, parens
_SCRIPT_TOK = _re.compile(
    r"\s*(TRY_CAST\(`[^`]+` AS DOUBLE\)|`[^`]+`|\d+(?:\.\d+)?"
    r"|&&|\|\||==|!=|<=|>=|[-+*/%()<>!])")
_SCRIPT_OPS = {"&&", "||", "==", "!=", "<=", ">=", "<", ">", "!",
               "+", "-", "*", "/", "%", "(", ")"}


def _arith_sql(name: str, substituted: str) -> str:
    """Precedence-climbing re-emit of a user script (painless
    arithmetic/comparison subset, refs already substituted with SQL
    atoms) as ONE Spark SQL expression — with ``/`` → ``try_divide``
    and ``%`` → ``try_mod`` so a runtime zero divisor yields NULL
    instead of an untyped SparkArithmeticException (ANSI mode): the
    typed-error contract holds at runtime too. NULL results then follow
    each consumer's null rule — a null terms_set threshold matches
    nothing, a null script_score scores 0, a null bucket-script value
    stays a null bucket column. Spark's ``/`` on integers is already
    floating-point division, so try_divide only changes the 0-divisor
    case."""
    toks: list[str] = []
    i = 0
    while i < len(substituted):
        if substituted[i:].strip() == "":
            break
        m = _SCRIPT_TOK.match(substituted, i)
        if not m:
            raise DslError(
                f"script {name!r}: cannot parse {substituted[i:]!r}")
        toks.append(m.group(1))
        i = m.end()
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def primary() -> str:
        t = peek()
        if t == "(":
            take()
            e = or_()
            if peek() != ")":
                raise DslError(f"script {name!r}: unbalanced parens")
            take()
            return f"({e})"
        if t in ("+", "-"):
            take()
            inner = primary()
            return f"(- {inner})" if t == "-" else inner
        if t is None or t in _SCRIPT_OPS:
            raise DslError(f"script {name!r}: expected a value, got "
                           f"{t!r}")
        return take()

    def mul() -> str:
        e = primary()
        while peek() in ("*", "/", "%"):
            op = take()
            r = primary()
            if op == "/":
                e = f"try_divide({e}, {r})"
            elif op == "%":
                e = f"try_mod({e}, {r})"
            else:
                e = f"({e} * {r})"
        return e

    def add() -> str:
        e = mul()
        while peek() in ("+", "-"):
            op = take()
            e = f"({e} {op} {mul()})"
        return e

    def cmp() -> str:
        e = add()
        if peek() in ("==", "!=", "<=", ">=", "<", ">"):
            op = take()
            e = f"({e} {'=' if op == '==' else op} {add()})"
        return e

    def not_() -> str:
        if peek() == "!":
            take()
            return f"(NOT {not_()})"
        return cmp()

    def and_() -> str:
        e = not_()
        while peek() == "&&":
            take()
            e = f"({e} AND {not_()})"
        return e

    def or_() -> str:
        e = and_()
        while peek() == "||":
            take()
            e = f"({e} OR {and_()})"
        return e

    out = or_()
    if pos != len(toks):
        raise DslError(f"script {name!r}: trailing tokens "
                       f"{toks[pos:]!r}")
    return out


def _compile_doc_script(name: str, script: str) -> str:
    """Translate an ES ``script_fields`` painless script (the same
    arithmetic/comparison subset the bucket scripts accept, with
    ``doc['field'].value`` refs instead of ``params``) to a Spark SQL
    expression over the document columns. Numeric refs evaluate as
    DOUBLE, painless's arithmetic domain (also keeps Spark's DECIMAL
    literal typing out of the result). Division/modulo emit
    try_divide/try_mod — a runtime zero divisor yields NULL, never an
    untyped Spark exception (see ``_arith_sql``)."""
    if not _DOC_SCRIPT_OK.match(script):
        raise DslError(
            f"script field {name!r}: only arithmetic/comparison over "
            f"doc['field'].value refs is supported, got {script!r}")
    substituted = _re.sub(r"doc\['([A-Za-z_][\w.]*)'\]\.value",
                          r"TRY_CAST(`\1` AS DOUBLE)", script)
    return _arith_sql(name, substituted)


_VEC_CALL = _re.compile(
    r"(cosineSimilarity|dotProduct|l2norm)\(\s*params\.(\w+)\s*,"
    r"\s*'([A-Za-z_][\w.]*)'\s*\)")


def _compile_score_script(name: str, script: str,
                          params: dict) -> tuple[str, tuple, tuple]:
    """Translate a ``script_score`` painless source to ONE Spark SQL
    expression — the arithmetic/comparison subset over
    ``doc['f'].value`` refs PLUS (r11) the ES dense-vector functions
    ``cosineSimilarity(params.qv, 'field')`` / ``dotProduct`` /
    ``l2norm`` and numeric ``params.X`` scalars. Vector calls compile
    to higher-order-function SQL over the array column (zip_with dot
    products against a literal query array — JVM codegen, no UDF, the
    same kernel shape as operators/similarity.py); ``cosineSimilarity``
    divides by try_divide so a zero document vector yields NULL →
    score 0 (the engine's null rule). Returns (sql, doc_field_refs,
    array_field_refs)."""
    import math as _math

    placeholders: dict[str, str] = {}
    arr_fields: list[str] = []

    def vec_sub(m: "_re.Match") -> str:
        fn_name, pname, fld = m.groups()
        if pname not in params:
            raise DslError(
                f"{name}: script references params.{pname} but the "
                "script carries no such param")
        vec = params[pname]
        if not isinstance(vec, list) or not vec or not all(
                isinstance(v, (int, float)) and not isinstance(v, bool)
                for v in vec):
            raise DslError(f"{name}: params.{pname} must be a "
                           "non-empty numeric array")
        qa = ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in vec)
        col = f"`{fld}`"
        dot = (f"aggregate(zip_with({col}, array({qa}), "
               "(a, b) -> CAST(a AS DOUBLE) * b), "
               "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
        if fn_name == "dotProduct":
            sql = dot
        elif fn_name == "cosineSimilarity":
            nq = _math.sqrt(sum(float(v) ** 2 for v in vec))
            if nq == 0.0:
                raise DslError(f"{name}: params.{pname} is a zero "
                               "vector (cosine undefined)")
            nd = (f"sqrt(aggregate(transform({col}, "
                  "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
                  "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))")
            sql = (f"try_divide({dot}, "
                   f"{nd} * CAST({nq!r} AS DOUBLE))")
        else:   # l2norm: euclidean distance doc-vector ↔ query vector
            sql = ("sqrt(aggregate(zip_with(" + col + ", array(" + qa
                   + "), (a, b) -> (CAST(a AS DOUBLE) - b) "
                   "* (CAST(a AS DOUBLE) - b)), "
                   "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))")
        key = f"__vec{len(placeholders)}"
        placeholders[key] = f"({sql})"
        arr_fields.append(fld)
        return f"doc['{key}'].value"

    src = _VEC_CALL.sub(vec_sub, script)

    def param_sub(m: "_re.Match") -> str:
        pname = m.group(1)
        if pname not in params:
            raise DslError(
                f"{name}: script references params.{pname} but the "
                "script carries no such param")
        v = params[pname]
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise DslError(f"{name}: params.{pname} must be numeric "
                           "here (vector params belong inside the "
                           "vector functions)")
        return repr(float(v))

    src = _re.sub(r"params\.(\w+)", param_sub, src)
    out = _compile_doc_script(name, src)
    for key, sql in placeholders.items():
        out = out.replace(f"TRY_CAST(`{key}` AS DOUBLE)", sql)
    refs = tuple(dict.fromkeys(
        f for f in _re.findall(r"doc\['([A-Za-z_][\w.]*)'\]\.value",
                               src)
        if not f.startswith("__vec")))
    return out, refs, tuple(dict.fromkeys(arr_fields))


# ES runtime_mappings types the arithmetic-script subset can produce →
# the Spark cast target (keyword/date need string/date-producing
# painless, outside the subset — typed error)
_RUNTIME_TYPES = {"double": "double", "long": "bigint",
                  "boolean": "boolean"}

# the function kinds a function_score query / functions-array entry may
# carry (exactly one per entry)
_FS_FN_KEYS = ("field_value_factor", "script_score", "random_score",
               "gauss", "linear", "exp")


def _parse_score_fn(fn: str, spec: Any) -> Node:
    """Parse ONE function_score function (``fn`` is a ``_FS_FN_KEYS``
    member, ``spec`` its body) into its scorer node with
    ``child=MatchAll()`` / ``boost_mode="multiply"`` — the caller
    re-attaches the real child/boost_mode (single-function form) or
    wraps it in a ScoreFunction entry (functions-array form)."""
    from cassandra_es_index_spark.search.compile import _FVF_MODIFIERS

    child = MatchAll()
    if fn == "field_value_factor":
        if not isinstance(spec, dict) or "field" not in spec:
            raise DslError("field_value_factor needs {'field': name}")
        modifier = str(spec.get("modifier", "none"))
        if modifier not in _FVF_MODIFIERS:
            raise DslError(
                f"unknown field_value_factor modifier {modifier!r}")
        try:
            factor = float(spec.get("factor", 1.0))
            missing = float(spec.get("missing", 1.0))
        except (TypeError, ValueError) as e:
            raise DslError("field_value_factor factor/missing must "
                           "be numeric") from e
        return FunctionScore(child, spec["field"], factor, modifier,
                             missing)
    if fn == "script_score":
        if not isinstance(spec, dict) or "script" not in spec:
            raise DslError("script_score needs {'script': ...}")
        script = spec["script"]
        sparams: dict = {}
        if isinstance(script, dict):
            sparams = script.get("params") or {}
            if not isinstance(sparams, dict):
                raise DslError("script params must be an object")
            script = script.get("source")
        if not isinstance(script, str) or not script.strip():
            raise DslError("script_score needs a script source "
                           "string")
        expr, refs, arr_fields = _compile_score_script(
            "script_score", script, sparams)
        return ScriptScore(child, expr, refs, script,
                           array_fields=arr_fields)
    if fn == "random_score":
        if not isinstance(spec, dict) or "seed" not in spec \
                or "field" not in spec:
            raise DslError(
                "random_score needs {'seed': int, 'field': name} — "
                "the unseeded wall-clock form is not supported "
                "(non-deterministic plans)")
        seed = spec["seed"]
        if isinstance(seed, bool) or not isinstance(seed, int):
            raise DslError("random_score seed must be an integer")
        return RandomScore(child, seed, str(spec["field"]))
    # decay: {"gauss": {field: {"origin", "scale", "offset", "decay"}}}
    if not isinstance(spec, dict) or len(spec) != 1:
        raise DslError(
            f"{fn} needs {{field: {{'origin','scale',...}}}}")
    (dfield, params), = spec.items()
    if not isinstance(params, dict) or "scale" not in params:
        raise DslError(f"{fn} on {dfield!r} needs a 'scale'")
    try:
        decay = float(params.get("decay", 0.5))
    except (TypeError, ValueError) as e:
        raise DslError(f"bad decay {params.get('decay')!r}") from e
    if not 0.0 < decay < 1.0:
        raise DslError(f"decay must be in (0,1), got {decay}")
    # origin defaults to `now` like ES (meaningful on date fields
    # only; numeric fields reject a non-numeric origin at compile)
    origin = params.get("origin", "now")
    return DecayScore(child, str(dfield), fn, origin, params["scale"],
                      params.get("offset", 0.0), decay)


def _compile_bucket_script(name: str, script: str,
                           paths: dict[str, str]) -> str:
    """Translate an ES bucket script (painless arithmetic subset) to a
    Spark SQL expression: ``params.x`` refs substitute their resolved
    bucket column; anything beyond arithmetic/comparison is rejected."""
    if not _SCRIPT_OK.match(script):
        raise DslError(
            f"bucket script {name!r}: only arithmetic/comparison over "
            f"params refs is supported, got {script!r}")
    out = script
    for pname, target in paths.items():
        col = "doc_count" if target == "_count" else target
        out = _re.sub(rf"params\.{_re.escape(pname)}\b", f"`{col}`", out)
    if "params." in out:
        raise DslError(f"bucket script {name!r}: unbound params ref "
                       f"in {script!r}")
    # try_divide/try_mod re-emit: a zero divisor yields a NULL bucket
    # value (bucket_selector: NULL never selects), not an untyped
    # SparkArithmeticException
    return _arith_sql(name, out)
# ES default percents for the percentiles agg
_DEFAULT_PERCENTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)


def _fixed_tz_seconds(tz: str) -> int | None:
    """Seconds east of UTC for a fixed-offset ``time_zone`` string
    ("Z", "UTC", "GMT", "±HH", "±HHMM", "±HH:MM" — the ES-accepted
    fixed forms); ``None`` for anything else (a named IANA zone)."""
    if tz in ("Z", "UTC", "GMT"):
        return 0
    m = _re.fullmatch(r"([+-])(\d{2})(?::?(\d{2}))?", tz)
    if m is None:
        return None
    hh, mm = int(m.group(2)), int(m.group(3) or 0)
    if hh > 18 or mm > 59:
        raise DslError(f"time_zone offset out of range: {tz!r}")
    sec = hh * 3600 + mm * 60
    return -sec if m.group(1) == "-" else sec


def _apply_range_format(fmt: Any, lo: Any, hi: Any) -> tuple:
    """Resolve a range query's ``format`` (r14): bound values parse
    through the ES format-pattern subset (``datemath.key_parser`` —
    ``epoch_millis``/``epoch_second``/yyyy-MM-dd-HH-mm-ss-SSS tokens,
    ``||``-separated fallback patterns tried left to right like ES) and
    rewrite to plain ISO strings, so downstream — including a following
    ``time_zone`` — sees ordinary date bounds. Missing lower-order
    fields default to the unit start (the engine's documented
    down-rounding convention on BOTH bound sides; ES rounds ``lte`` up
    — documented deviation). A bound matching NO pattern typed-rejects
    naming value and formats — never a silently shifted bound.

    Epoch formats (``epoch_millis``/``epoch_second``) emit the ISO
    string WITH an explicit ``+00:00`` offset (r15 fix): epoch values
    are absolute UTC instants — ES never shifts them under a following
    ``time_zone`` — and ``_apply_range_time_zone``'s documented
    explicit-offset-wins rule then preserves the instant instead of
    reinterpreting it as zone-local wall clock. Harmless without a
    time_zone: the session zone is pinned UTC (session.py:39)."""
    if not isinstance(fmt, str) or not fmt:
        raise DslError("range format must be a non-empty string")
    try:
        parsers = [(p, datemath.key_parser(p)) for p in fmt.split("||")]
    except datemath.DateMathError as e:
        raise DslError(str(e)) from e

    def conv(v: Any) -> Any:
        if v is None:
            return v
        if isinstance(v, str) and datemath.is_date_math(v):
            raise DslError(
                "range format with date-math bounds is not supported "
                "(engine subset) — date math already carries its own "
                "anchor syntax")
        errs = []
        for pname, p in parsers:
            try:
                iso = p(v).isoformat(sep=" ")
            except datemath.DateMathError as e:
                errs.append(str(e))
                continue
            if pname in ("epoch_millis", "epoch_second"):
                return iso + "+00:00"
            return iso
        raise DslError(f"range format: {errs[-1]}"
                       if len(parsers) == 1 else
                       f"range format: bound {v!r} matches none of the "
                       f"patterns in {fmt!r}")

    return conv(lo), conv(hi)


def _apply_range_time_zone(tz: Any, lo: Any, hi: Any) -> tuple:
    """Resolve a range query's ``time_zone`` (r14): string date bounds
    WITHOUT an explicit offset are interpreted as wall-clock in the
    zone and rewritten to concrete UTC instants; bounds carrying their
    own offset/Z keep it (the ES rule: an explicit offset wins over
    time_zone). Fixed offsets and named IANA zones both resolve
    DRIVER-SIDE (the bound is a literal, so DST lookup is one zoneinfo
    call, never per row). Numeric bounds (epoch values — zone-free by
    definition) pass through. Date-math bounds typed-reject: zone-aware
    `now/d` rounding is an engine subset — anchor the math on an
    explicit-offset literal instead. Unparseable strings typed-reject —
    time_zone asserts the field is a date, so silently skipping a
    non-date bound would change the match set with no signal."""
    from datetime import datetime, timedelta, timezone as _tzcls

    if not isinstance(tz, str) or not tz:
        raise DslError("range time_zone must be a non-empty string")
    tzsec = _fixed_tz_seconds(tz)
    if tzsec is not None:
        tzinfo = _tzcls(timedelta(seconds=tzsec))
    else:
        try:
            from zoneinfo import ZoneInfo
            tzinfo = ZoneInfo(tz)
        except Exception:
            raise DslError(f"unknown time_zone {tz!r}")

    def conv(v: Any) -> Any:
        if v is None or not isinstance(v, str):
            return v
        if datemath.is_date_math(v):
            raise DslError(
                "range time_zone with date-math bounds is not "
                "supported (engine subset) — use an explicit-offset "
                "anchor in the expression instead")
        try:
            dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            raise DslError(
                f"range time_zone: unparseable date bound {v!r}")
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=tzinfo)
        dt = dt.astimezone(_tzcls.utc).replace(tzinfo=None)
        return dt.isoformat(sep=" ")

    return conv(lo), conv(hi)


def _pct_label(p: float) -> str:
    """50.0 → "50", 99.9 → "99_9" — column-name-safe percent label."""
    return (f"{p:g}").replace(".", "_")


def _leaf_params(kind: str, value: dict, allowed: set[str]) -> None:
    """Typed-reject unknown parameters on a leaf query's object form —
    a silently dropped parameter changes the match set or scoring vs ES
    with no signal (r9, the match-operator lesson). ``case_insensitive``
    is allowed wherever ES allows it but only as ``true``: the engine's
    analyzed-text model lowercases both sides by construction, so
    case-SENSITIVE matching is not expressible (documented)."""
    extra = set(value) - allowed
    if extra:
        raise DslError(f"{kind}: unsupported parameters "
                       f"{sorted(extra)} (engine subset)")
    if value.get("case_insensitive") is False:
        raise DslError(
            f"{kind}: case_insensitive=false is not supported — the "
            "engine's analyzed-text model matches case-insensitively "
            "by construction (documented)")


def _msm_simple(s: str, n_terms: int, ctx: str) -> int:
    """Resolve one SIMPLE minimum-should-match expression (integer
    string or ``[-]N%``) against ``n_terms`` — the leaf evaluator of
    the full Solr grammar (`_msm_count`). Percent resolves by
    toward-zero INTEGER truncation of n·pct/100; Lucene's own
    arithmetic goes through ``(int)(n * pct * (1/100f))`` whose
    float32 rounding can under-count an exact multiple by one (90% of
    10 → 8) — the engine defines the deterministic integer rule
    instead (documented deviation, also what the r10 oracle probes
    pinned)."""
    if s.endswith("%"):
        try:
            pct = int(s[:-1])
        except ValueError as e:
            raise DslError(
                f"{ctx}: bad minimum_should_match {s!r}") from e
        if pct == 0 or pct > 100 or pct < -100:
            raise DslError(
                f"{ctx}: minimum_should_match percentage must be "
                "in (0, 100] or [-100, 0) (engine subset)")
        # Java-style toward-zero truncation of n·pct/100
        return ((n_terms * pct) // 100 if pct > 0
                else n_terms - (n_terms * -pct) // 100)
    try:
        plain = int(s)
    except ValueError as e:
        raise DslError(
            f"{ctx}: minimum_should_match must be an integer, "
            f"an integer string, '[-]N%', or a conditional list "
            f"('3<90%'), got {s!r}") from e
    # negative plain form: all but |N| of the clauses must match
    return plain if plain >= 0 else n_terms + plain


def _msm_count(msm: Any, n_terms: int, ctx: str, *,
               clamp: bool = True) -> int:
    """Resolve an ES ``minimum_should_match`` value to a clause-count
    floor. Full grammar (r11 — ES minimum-should-match spec, Lucene
    ``Queries.calculateMinShouldMatch`` / Solr
    ``calculateMinShouldMatch`` control flow):

    - int or integer STRING (``2``, ``"2"``): that many clauses;
      negative N = ``n_terms + N`` (ES's "all but |N|" form)
    - ``"N%"``: that percent of the clauses, fraction truncated toward
      zero (integer division — see `_msm_simple` for the documented
      float32 deviation); ``"-N%"`` = the percent allowed to be
      UNMATCHED
    - conditional list (``"3<90%"``, ``"2<-25% 9<-3"``): each
      space-separated ``N<value`` clause in order — when the optional
      clause count is ≤ N the previous result stands (initially ALL
      clauses required) and evaluation STOPS; otherwise the result
      becomes the simple-form value. Callers list conditions in
      ascending N, like Solr. A negative conditional result floors
      at 0.

    ``clamp=True`` floors the result at 1 — correct for pure
    disjunctions (match / more_like_this / terms_set), where Lucene
    requires ≥1 matching optional clause regardless. ``bool`` passes
    ``clamp=False`` and maps a sub-1 floor itself: beside must/filter
    the should clauses become fully optional (ES msm=0), alone they
    gate at ≥1."""
    if isinstance(msm, bool):
        raise DslError(f"{ctx}: bad minimum_should_match {msm!r}")
    if isinstance(msm, int):
        value = msm if msm >= 0 else n_terms + msm
    elif isinstance(msm, str):
        s = msm.strip()
        if "<" in s:
            # conditional spec(s): normalize spaces around '<' then
            # split on whitespace — Lucene's spaceAroundLessThan /
            # spacePattern pipeline
            value = n_terms          # "below every bound: all required"
            for part in _re.sub(r"\s*<\s*", "<", s).split():
                left, sep, rest = part.partition("<")
                if not sep or not rest:
                    raise DslError(
                        f"{ctx}: bad conditional minimum_should_match "
                        f"clause {part!r} (want 'N<value')")
                try:
                    upper = int(left)
                except ValueError as e:
                    raise DslError(
                        f"{ctx}: bad conditional minimum_should_match "
                        f"bound {left!r} in {msm!r}") from e
                if n_terms <= upper:
                    break            # Lucene: return the running result
                value = _msm_simple(rest, n_terms, ctx)
            value = max(0, value)
        elif " " in s:
            raise DslError(
                f"{ctx}: bad minimum_should_match {msm!r} — a "
                "space-separated list is only valid as conditional "
                "'N<value' clauses")
        else:
            value = _msm_simple(s, n_terms, ctx)
    else:
        raise DslError(f"{ctx}: minimum_should_match must be an "
                       f"integer, an integer string, '[-]N%', or a "
                       f"conditional list, got {msm!r}")
    return max(1, value) if clamp else value


def sibling_out_names(sn: str, sk: str,
                      percents: tuple[float, ...]) -> tuple[str, ...]:
    """Flattened output columns of one sibling pipeline agg entry —
    single-value kinds emit one column named after the agg; the stat
    kinds (r9) flatten like their metric twins (``stats`` /
    ``extended_stats`` / ``percentiles``)."""
    if sk == "stats_bucket":
        return tuple(f"{sn}_{s}"
                     for s in ("count", "min", "max", "avg", "sum"))
    if sk == "extended_stats_bucket":
        return tuple(f"{sn}_{s}"
                     for s in ("count", "min", "max", "avg", "sum",
                               "sum_of_squares", "variance",
                               "std_deviation"))
    if sk == "percentiles_bucket":
        return tuple(f"{sn}_p{_pct_label(p)}" for p in percents)
    if sk == "bucket_count_ks_test":
        # one p-value column per requested alternative (the 4th slot
        # carries (alternatives, fractions) for this kind)
        return tuple(f"{sn}_{a}" for a in percents[0])
    if sk == "change_point":
        # step_change/stationary verdict + the detected bucket key +
        # the best split's Welch statistic, df, and two-sided p-value
        return (f"{sn}_type", f"{sn}_key", f"{sn}_t",
                f"{sn}_df", f"{sn}_p")
    return (sn,)


@dataclass(frozen=True)
class MetricAgg:
    """One metric aggregation: ``{"name": {"avg": {"field": "f"}}}``.

    ``cardinality`` is served EXACTLY (count distinct) by default — the
    engine's superset of ES's HyperLogLog approximation. Passing ES's
    ``precision_threshold`` opts into HLL++ (approx_count_distinct), the
    shape that scales: the exact distinct needs a shuffle of every
    distinct value, the sketch merges fixed-size registers map-side.

    ``stats`` expands to five flattened columns (``<name>_count``/
    ``_min``/``_max``/``_avg``/``_sum``) — ES returns them as one object;
    a DataFrame row flattens it. A terms ``order`` may target
    ``"<name>.avg"`` etc., mapped onto the flattened column.

    ``percentiles`` is served EXACTLY by default (Spark ``percentile``,
    continuous interpolation — the engine's superset of ES's TDigest
    estimate, and DuckDB-oracle-checkable via ``quantile_cont``);
    passing ES's ``compression`` opts into the sketch
    (``percentile_approx``), the shape that scales — mirroring the
    ``cardinality``/``precision_threshold`` pattern. One flattened column
    per percent: ``<name>_p50``, ``<name>_p99_9``, …"""
    name: str
    kind: str   # avg|sum|min|max|value_count|cardinality|stats|percentiles
                # |extended_stats|weighted_avg
    field: str
    precision_threshold: int | None = None
    percents: tuple[float, ...] = _DEFAULT_PERCENTS
    compression: int | None = None
    # weighted_avg: Σ(value×weight)/Σ(weight); docs missing either the
    # value or the weight are skipped (ES semantics without `missing`)
    weight_field: str | None = None
    # percentile_ranks: the probe values; result per value = percentage
    # of field values ≤ the probe (EXACT — superset of ES's TDigest
    # estimate, like the percentiles metric)
    rank_values: tuple[float, ...] = ()
    # matrix_stats: the field list (listwise deletion — docs missing ANY
    # field are excluded, ES MatrixStats semantics);
    # top_metrics: the metric fields returned from the top document
    multi_fields: tuple[str, ...] = ()
    # top_metrics: `field` holds the sort field, `sort_asc` its
    # direction; size-1 engine subset (one flattened column per metric
    # field — max_by/min_by, map-side combinable; docs with a null sort
    # value are skipped like ES, ties break arbitrarily like ES's
    # shard-order ties)
    sort_asc: bool = True
    # ES metric `missing` (r12, the simple tier): null field values
    # substitute this value instead of dropping from the aggregate
    missing: Any = None
    # rate: the per-`unit` scaling of a date_histogram bucket's
    # doc_count (field=None) or field sum — validated against the
    # PARENT at execution (fixed-span parents only, engine subset)
    unit: str | None = None
    # rate mode (r12): "sum" (ES default — field sum, or doc_count
    # when no field) | "value_count" (count of field VALUES)
    rate_mode: str = "sum"
    # t_test (r12): `field` holds population a's field; t_b is b's;
    # optional filter Nodes gate each side; t_type ∈ paired/
    # heteroscedastic/homoscedastic. DEVIATION (documented): the
    # engine returns the t-STATISTIC and degrees of freedom —
    # deterministic, SQL-oracle-checkable — where ES returns the
    # p-value (a t-distribution CDF, not expressible as Column math;
    # ``functions.stats.t_p_value`` converts client-side).
    t_b: str | None = None
    t_filter_a: "Node | None" = None
    t_filter_b: "Node | None" = None
    t_type: str = "heteroscedastic"
    # geo_line (r12): `field` holds the geo_point field, `sort_field`
    # the ordering field (sort_asc its direction), `line_size` the ES
    # point cap (default/max 10000). Output: ONE GeoJSON LineString
    # string column — the track of the bucket's points in sort order.
    sort_field: str | None = None
    line_size: int = 10000
    # scripted_metric (r12): the init/map/combine/reduce pipeline
    # translated AT PARSE TIME to one Spark SQL aggregate expression —
    # `state.v += <arith>` map statements become sum() aggregates, the
    # combine arithmetic composes them, and the reduce must be a
    # single-state identity form (this engine is ONE shard, the
    # SamplerAgg premise). Stored fully composed; metric_cols just
    # F.expr()s it.
    script_sql: str | None = None
    # reverse_nested (r13): parent-scope metric sub-aggs — each runs
    # over the DISTINCT parent documents holding ≥1 element in the
    # bucket (ES: aggregating continues in parent scope after
    # reverse_nested). Engine subset: avg/sum/min/max/value_count/
    # cardinality over a parent field.
    sub_metrics: tuple["MetricAgg", ...] = ()

    def out_names(self) -> tuple[str, ...]:
        if self.kind == "stats":
            return tuple(f"{self.name}_{s}"
                         for s in ("count", "min", "max", "avg", "sum"))
        if self.kind == "extended_stats":
            # ES extended_stats flattened: the stats five plus sum of
            # squares and POPULATION variance/std-deviation (ES defaults)
            return tuple(f"{self.name}_{s}"
                         for s in ("count", "min", "max", "avg", "sum",
                                   "sum_of_squares", "variance",
                                   "std_deviation"))
        if self.kind == "percentiles":
            return tuple(f"{self.name}_p{_pct_label(p)}"
                         for p in self.percents)
        if self.kind == "percentile_ranks":
            return tuple(f"{self.name}_{_pct_label(v)}"
                         for v in self.rank_values)
        if self.kind == "geo_centroid":
            # ES returns {location: {lat, lon}, count} — flattened
            return tuple(f"{self.name}_{s}"
                         for s in ("lat", "lon", "count"))
        if self.kind == "geo_bounds":
            # ES returns {top_left: {lat, lon}, bottom_right: {...}} —
            # flattened to the four box edges (wrap_longitude=false)
            return tuple(f"{self.name}_{s}"
                         for s in ("top", "left", "bottom", "right"))
        if self.kind == "boxplot":
            return tuple(f"{self.name}_{s}"
                         for s in ("min", "max", "q1", "q2", "q3"))
        if self.kind == "string_stats":
            return tuple(f"{self.name}_{s}"
                         for s in ("count", "min_length", "max_length",
                                   "avg_length", "entropy"))
        if self.kind == "top_metrics":
            return tuple(f"{self.name}_{f}" for f in self.multi_fields)
        if self.kind == "reverse_nested":
            return (f"{self.name}_doc_count",) + tuple(
                f"{self.name}_{n}" for s in self.sub_metrics
                for n in s.out_names())
        if self.kind == "t_test":
            return (f"{self.name}_t", f"{self.name}_df")
        if self.kind == "matrix_stats":
            # per field: count / mean / variance (sample); per unordered
            # pair: covariance / correlation — ES's matrix flattened
            # (skewness/kurtosis omitted, documented deviation)
            names = []
            for f in self.multi_fields:
                names += [f"{self.name}_{f}_{s}"
                          for s in ("count", "mean", "variance")]
            for i, a in enumerate(self.multi_fields):
                for b in self.multi_fields[i + 1:]:
                    names += [f"{self.name}_{a}_{b}_covariance",
                              f"{self.name}_{a}_{b}_correlation"]
            return tuple(names)
        return (self.name,)


@dataclass(frozen=True)
class TopHits:
    """ES ``top_hits`` sub-agg: the top ``size`` documents per bucket
    under ``sort`` (primary key appended as tiebreak; default ordering is
    key asc), flattened as one output row per hit with ``_hit_rank``.
    ``source`` limits the emitted document columns (ES ``_source``
    filtering); empty = all document columns. Allowed only on the
    innermost bucket level."""
    size: int = 3
    sort: tuple[tuple[str, bool, bool], ...] = ()
    source: tuple[str, ...] = ()


@dataclass(frozen=True)
class BucketAgg:
    """One bucket aggregation with optional metric sub-aggs."""
    name: str
    kind: str   # terms | histogram | date_histogram | range
    field: str
    size: int | None = None                 # terms (ES default 10)
    interval: float | None = None           # histogram
    # histogram `offset`: buckets align to offset + n×interval (ES
    # requires |offset| < interval; normalized at parse time)
    offset: float | None = None
    # terms `include`/`exclude`: ("re", anchored-pattern) — the regex
    # must match the WHOLE term string, like ES — or ("values", (…,))
    include: tuple | None = None
    exclude: tuple | None = None
    # multi_terms: the composite key's source fields (≥2)
    multi_fields: tuple[str, ...] = ()
    calendar_interval: str | None = None    # date_histogram
    fixed_interval: str | None = None       # date_histogram ("30s","1h",…)
    # date_histogram `time_zone` (r14): FIXED offsets ("Z", "±HH:MM",
    # "±HHMM", "±HH") fold into `offset` at parse time (bucket
    # boundary = trunc(ts + tz - offset) + offset - tz, i.e. the
    # existing shift-trunc-shift machinery with an effective offset),
    # so this field carries NAMED IANA zones only — their DST-variable
    # offset needs per-instant wall-clock truncation in the engine
    time_zone: str | None = None
    # terms bucket ordering: ((target, ascending), ...) criteria
    # applied left to right, where target is "_count", "_key", a
    # sub-metric agg name, or "<stats>.avg" etc. (ES `order` param —
    # single object or list form); default ES ordering is doc_count desc
    order: tuple[tuple[str, bool], ...] | None = None
    # range agg: ((key, from, to), ...) — from inclusive, to exclusive,
    # None = open side; key is the ES "from-to" label unless the request
    # names the range. Overlapping ranges count a doc in EACH bucket
    # (ES semantics).
    ranges: tuple[tuple[str, float | None, float | None], ...] = ()
    # date_range `format` (r14): renders the ES-style default
    # ``from-to`` keys of UNNAMED ranges from the resolved bound
    # instants (key None in ``ranges`` until the engine renders it);
    # validated at parse via datemath.key_formatter
    key_format: str | None = None
    # filters agg: ((name, query-AST), ...) — one bucket per named query;
    # a doc joins EVERY bucket whose query it matches (ES semantics)
    filter_nodes: tuple[tuple[str, Node], ...] = ()
    # ES `missing`: substitute for null bucket values (docs with a null
    # field join this bucket instead of being dropped)
    missing: Any = None
    # ES `min_doc_count`: drop buckets below this count (terms default 1;
    # histogram 0 — the engine never materializes empty buckets, so only
    # values > 1 change the result)
    min_doc_count: int | None = None
    # geotile_grid zoom (0-29, ES default 7) / geohash_grid chars
    # (1-12, ES default 5) / ip_prefix prefix_length (1-32)
    precision: int | None = None
    # ip_prefix append_prefix_length: suffix bucket keys with "/len"
    append_prefix: bool = False
    # geo_distance agg (r11): (origin_lat, origin_lon, meters_per_unit)
    # — the range bounds/keys are in the request's unit
    geo_origin: tuple | None = None
    # significant_terms/_text background_filter (r12): narrows the
    # BACKGROUND set the foreground is scored against (ES's
    # compare-against-a-context idiom) — None = the whole index
    bg_filter: "Node | None" = None
    # significance heuristic (r12): (kind, include_negatives,
    # background_is_superset) — jlh (ES default) | percentage |
    # chi_square | mutual_information
    sig_heuristic: tuple = ("jlh", False, True)
    # auto_date_histogram target bucket count (ES default 10): the
    # engine picks the smallest fixed interval from its ladder whose
    # bucket count fits, then runs the date_histogram machinery
    buckets: int | None = None
    metrics: tuple[MetricAgg, ...] = dc_field(default_factory=tuple)
    # ES top_hits sub-agg (innermost level only)
    top_hits: TopHits | None = None
    # ES pipeline aggs ((name, kind, buckets_path), ...) — cumulative_sum
    # / derivative over the key-ordered bucket frame; single level only
    pipelines: tuple[tuple[str, str, str], ...] = ()
    # ES extended_bounds {"min":…, "max":…} — with min_doc_count 0 the
    # materialized empty-bucket span widens to cover these bounds
    extended_bounds: tuple[Any, Any] | None = None
    # ES hard_bounds (r12): LIMITS the bucket range — docs whose
    # bucket falls outside [min, max] drop from the aggregation
    # (enforced in the scan gate, a plain pushdown-friendly filter)
    hard_bounds: tuple[Any, Any] | None = None
    # sibling pipeline aggs ((name, kind, bucket column), ...) — ES
    # avg_bucket/sum_bucket/min_bucket/max_bucket declared NEXT TO this
    # bucket agg; one value over the whole bucket frame, emitted as a
    # constant column (single level only); entries are
    # (name, kind, resolved leaf column, percents — percentiles_bucket
    # only); flattened output columns per entry via sibling_out_names
    siblings: tuple[tuple[str, str, str, tuple[float, ...]], ...] = ()
    # one nested sub-bucket per level, nesting to arbitrary depth — ES
    # sub-aggregations; executed flattened: (key, doc_count, sub_key,
    # sub_doc_count, sub2_key, sub2_doc_count, …, metrics per level)
    sub: "BucketAgg | None" = None


@dataclass(frozen=True)
class CompositeSource:
    """One composite-agg source: terms / histogram / date_histogram /
    geotile_grid over a field, ascending by default (``order: desc``
    flips it). ``missing_bucket`` keeps docs with a null source value
    as a null bucket, sorted first ascending / last descending (ES
    default missing_order). ``geotile_grid`` (r11) keys on the
    web-mercator "z/x/y" tile of a geo_point field
    (functions/geo.geotile_key) at ``precision`` (0-29, ES default 7);
    pagination order is the tile key's STRING order — a documented
    deviation from ES's underlying-long order with identical bucket
    membership, mirrored exactly by a string-sorting oracle."""
    name: str
    kind: str       # terms | histogram | date_histogram | geotile_grid
    field: str
    interval: float | None = None
    calendar_interval: str | None = None
    fixed_interval: str | None = None
    # date_histogram source only (r14.75): the EFFECTIVE boundary shift
    # in seconds — the parsed ES `offset` minus the fixed-zone seconds
    # (the same fold the plain date_histogram uses); named zones
    # typed-reject here because keyset `after` anchors must be fixed
    # instants
    offset_sec: float = 0.0
    asc: bool = True
    missing_bucket: bool = False
    precision: int = 7


@dataclass(frozen=True)
class CompositeAgg:
    """ES ``composite`` agg: ALL distinct combinations of the source
    keys (docs with a null source value drop out — ES's default without
    ``missing_bucket``), ordered lexicographically by the source tuple,
    paged with ``size`` + ``after`` keyset cursor — the ES-recommended
    way to walk every bucket at scale, and exactly a Spark
    groupBy + keyset filter + ordered limit (no top-size truncation,
    pages cost the same at any depth)."""
    name: str
    sources: tuple[CompositeSource, ...]
    size: int = 10
    after: tuple[Any, ...] | None = None   # one anchor per source, in order
    metrics: tuple[MetricAgg, ...] = dc_field(default_factory=tuple)


@dataclass(frozen=True)
class SingleBucketAgg:
    """ES single-bucket aggs — one bucket of ``doc_count`` + metric
    sub-aggs whose doc set transforms the match set:

    - ``filter``: match set ∩ the filter clause
    - ``missing``: matching docs with a null ``field``
    - ``global``: ALL documents, ignoring the query
    """
    name: str
    kind: str                       # filter | missing | global
    node: Node | None = None        # filter clause (kind == "filter")
    field: str = ""                 # kind == "missing"
    metrics: tuple[MetricAgg, ...] = dc_field(default_factory=tuple)


@dataclass(frozen=True)
class SamplerAgg:
    """ES ``sampler`` / ``diversified_sampler`` (r9): restrict the
    sub-aggregations to the top ``shard_size`` highest-SCORING matches
    (single engine = one shard, so shard_size IS the sample size —
    deterministic: score desc, primary key asc). ``diversified_sampler``
    first caps each distinct ``field`` value at ``max_docs_per_value``
    best-scoring docs (one groupBy-shaped window); docs with a NULL
    field value are never diversity-limited (each forms its own group —
    the engine's collapse null convention, documented vs Lucene's
    single missing-key bucket). Top level only; the flattened output is
    the sub-aggregation's frame computed over the sample (one
    ``doc_count`` row when no sub-aggs are declared)."""
    name: str
    kind: str          # sampler | diversified_sampler | random_sampler
    shard_size: int = 100
    field: str = ""                 # diversified only
    max_docs_per_value: int = 1     # diversified only
    # random_sampler (r12): keep ≈ probability of the match set via a
    # DETERMINISTIC multiplicative hash of the primary key (documented
    # subset of ES's per-shard RNG — same seed → same sample on every
    # run and every engine, which is what the seed param is FOR)
    probability: float = 0.0        # random_sampler only
    seed: int = 0                   # random_sampler only
    sub: ("BucketAgg | CompositeAgg | SingleBucketAgg | "
          "tuple[MetricAgg, ...] | None") = None


@dataclass(frozen=True)
class NestedAgg:
    """ES ``nested`` aggregation (r9): the sub-aggregations run over the
    ELEMENTS of an array-of-structs field — doc_count semantics switch
    from documents to elements (ES nested agg contract). The engine
    explodes the path once and rebinds the agg frame, so element fields
    resolve by their ES dotted path (``items.rating``) through the
    ordinary struct descent; every bucket/metric/pipeline kind composes
    unchanged over the element frame. Engine subset (typed): top level
    only (optionally under a sampler), ONE nested level (no
    nested-in-nested), path = a top-level array<struct> column,
    ``reverse_nested`` not supported (the flattened output has no
    per-bucket parent identity column to return to)."""
    name: str
    path: str
    sub: ("BucketAgg | CompositeAgg | SingleBucketAgg | "
          "tuple[MetricAgg, ...] | None") = None


@dataclass(frozen=True)
class RelAgg:
    """ES ``children`` / ``parent`` join aggregations (r12): rebind the
    agg frame to the OTHER side of a registered parent/child relation
    (``SearchEngine.register_relation`` — the ES join-field mapping
    analogue; the reference forwards join aggs verbatim to ES, ref
    ElasticIndex.java search passthrough).

    ``children`` (searched on the parent table): the sub-aggregations
    run over the CHILD documents whose foreign key appears in the
    parent match set — doc_count semantics switch from parents to
    children (ES children-agg contract). ``parent`` (searched on the
    child table): symmetric — the frame becomes the DISTINCT parent
    documents of the matching children (each parent bucketed once, the
    ES parent-agg contract; a semi-join gives that for free).

    Plan shape: ONE left-semi equi-join on the relation key
    (AQE-broadcastable when the match set is small, never a driver
    collect), then every downstream bucket/metric/pipeline kind
    composes unchanged over the rebound frame. Engine subset (typed):
    top level only, no sampler/global/rel sub-aggs (they would score or
    scope against the wrong table)."""
    name: str
    kind: str                       # children | parent
    rel_type: str                   # relation name from the mapping
    sub: ("BucketAgg | CompositeAgg | SingleBucketAgg | "
          "tuple[MetricAgg, ...] | None") = None


@dataclass(frozen=True)
class Request:
    """A parsed search request body."""
    node: Node
    size: int | None = None
    from_: int = 0   # ES `from` offset (shallow pagination)
    aggs: ("BucketAgg | CompositeAgg | SingleBucketAgg | "
           "tuple[MetricAgg, ...] | None") = None
    # (field, ascending, nulls_first); nulls_first defaults to False —
    # ES defaults `missing` to `_last` for BOTH directions — and the
    # explicit `missing` param (`_first`/`_last`) overrides it
    sort: tuple[tuple[str, bool, bool], ...] = ()
    search_after: tuple[Any, ...] | None = None
    # ES field collapsing: keep only the top hit (per the active
    # ordering) for each distinct value of this field; docs with a null
    # field are NOT collapsed (each keeps its own hit, like ES docs
    # missing the field). hits.total stays uncollapsed.
    collapse: str | None = None
    # ES collapse inner_hits size (r6): when set, each collapsed group
    # expands to its top-N member rows with an `_inner_rank` column
    # (flattened form of ES's inner_hits arrays); group selection and
    # paging still count GROUPS
    collapse_inner: int | None = None
    # collapse inner_hits custom sort (r13): ((field, asc,
    # nulls_first), ...) — when set, group members rank by THIS
    # ordering instead of the request's primary ordering (ES inner_hits
    # sort); empty = primary ordering
    collapse_inner_sort: tuple = ()
    # ES nested inner_hits size (r8): when set (top-level nested query
    # only — documented), each parent hit expands to its top-N MATCHING
    # array elements ranked by element child score desc, flattened as
    # `<path>_<field>` columns + `_inner_rank`; hit selection and
    # paging still count PARENTS
    nested_inner: int | None = None
    # nested inner_hits custom sort (r13): (element_field, asc) — when
    # set, matching elements rank by this element field instead of the
    # element child score; None = score ranking
    nested_inner_sort: "tuple[str, bool] | None" = None
    # has_child/has_parent inner_hits (r13): populated by the ENGINE's
    # join expansion (never by the parser) — a spec dict holding the
    # matched other-side frame + join-key/prefix/size so the search
    # path can flatten each hit's top-N matching relatives as
    # `<type>_<field>` columns + `_inner_rank` after paging
    join_inner: Any = None
    # ES highlight: ((field, pre_tag, post_tag, number_of_fragments,
    # fragment_size, no_match_size), ...) — each requested field gains a
    # `_highlight_<field>` column. number_of_fragments 0 = whole-field
    # wrapping (one string); N > 0 (ES default 5, r6) = the fragment
    # shape: a JSON array of up to N match-bearing fragments (sentence
    # fragmenter, fragment_size char cap — see SearchEngine.search)
    highlight: tuple[tuple[str, str, str, int, int, int], ...] = ()
    # ES retriever.rrf (r11 — reciprocal rank fusion, the ES 8.14+
    # hybrid-ranking surface): (sub_request_json_strings, rank_constant,
    # rank_window_size). Each sub request is a standard {"query": ...}
    # or {"knn": ...} body the engine re-enters search() with; the
    # final score is Σ 1/(rank_constant + rank_i) over the retrievers
    # that ranked the doc inside the window.
    rrf: tuple | None = None
    # ES kNN search (the ES 8 top-level `knn` section): (vector field,
    # query vector, k, optional pre-filter AST, method, num_candidates,
    # nprobe, hybrid). `hybrid` (r6) marks a knn section declared BESIDE
    # a `query` section — ES 8.4 hybrid search: hit union, score sum.
    # `method` routes the plan: "exact" is a full cosine top-k
    # scan (the correctness baseline), "ivf" probes a built/attached IVF
    # index with cell partition pruning (the 100 TB path — ES's
    # approximate-HNSW analogue), "lsh" buckets on sign-LSH signatures
    # with no prebuilt index. Default: "ivf" when the engine holds an
    # IVF index for the field, else "exact". `num_candidates` (ES param)
    # sizes the examined candidate pool — mapped onto the IVF probe
    # width when `nprobe` is not given explicitly.
    knn: ("tuple[str, tuple[float, ...], int, Node | None, str | None,"
          " int | None, int | None, bool] | None") = None
    # ES `min_score` (r6): hits scoring below the floor drop out —
    # applied to the match set BEFORE ranking/pagination and before the
    # metadata totals, like ES
    min_score: float | None = None
    # ES `runtime_mappings` (r9): ((name, spark type, sql expr), ...) —
    # search-time computed fields over the painless arithmetic subset
    # (`doc['f'].value` refs, the script_fields grammar; an `emit(...)`
    # wrapper unwraps). The engine adds them as computed columns before
    # compile, so query/aggs/sort/script_fields all see them; queries
    # over runtime fields always take the scan plan (no index holds a
    # computed column). Engine subset: double/long/boolean types.
    runtime: tuple[tuple[str, str, str], ...] = ()
    # ES `post_filter` (r9): an extra filter applied to the HIT LIST
    # only — scores stay those of `query` alone (filter context), and
    # aggregations keep the pre-post_filter scope (the faceted-nav
    # idiom: aggs show all facets, hits show the selection). hits.total
    # reflects the post-filtered set, like ES.
    post_filter: Node | None = None
    # ES `track_total_hits` (r9): True = exact total (this engine's
    # default — DEVIATION from ES's default 10000-cap, documented),
    # False = no total in the metadata payload, int N = count accurately
    # up to N via a limit(N+1) early-terminating count and report
    # {"total_hits": N, "relation": "gte"} when the cap is hit
    # ("eq" otherwise)
    track_total_hits: "bool | int" = True
    # ES request-body `suggest` section (r9): carried RAW — the engine
    # routes it to SearchEngine.suggest_request(); search()/
    # search_aggs() typed-reject it rather than silently dropping it
    # (the everything-is-a-typed-error contract)
    suggest: Any = None
    # ES `_source` filtering (r6): None = full source (default), False =
    # metadata only (keys + _score), a tuple = that column subset (plus
    # keys/_score/highlight/script columns). ES include-list form only;
    # wildcard patterns and the excludes object are not supported
    # (documented).
    source_filter: "bool | tuple[str, ...] | None" = None
    # ES script_fields (r6): ((name, spark-sql-expr), ...) — the painless
    # arithmetic subset over `doc['field'].value` refs, translated at
    # parse time; each adds a response column computed on the ≤k hit rows
    # (requires the document columns, like highlight)
    script_fields: "tuple[tuple[str, str], ...]" = ()
    # ES rescore: (rescore-query AST, window_size, query_weight,
    # rescore_query_weight, score_mode) — the top window_size primary
    # hits re-score as combine(qw×primary, rw×secondary); window docs not
    # matching the rescore query score qw×primary; docs past the window
    # keep their raw primary score (ES contract). Incompatible with
    # sort/collapse/search_after, like ES.
    rescore: "tuple[Node, int, float, float, str] | None" = None


def parse(query_json: str | dict[str, Any]) -> tuple[Node, int | None]:
    """Parse an ES-DSL query; returns (AST, size-or-None)."""
    req = parse_request(query_json)
    return req.node, req.size


def parse_request(query_json: str | dict[str, Any]) -> Request:
    """Parse a full ES-DSL request body (query + size + sort +
    search_after + aggs)."""
    if isinstance(query_json, str):
        try:
            obj = json.loads(query_json)
        except json.JSONDecodeError as e:
            raise DslError(f"bad DSL JSON: {e}") from e
    else:
        obj = query_json
    if not isinstance(obj, dict):
        raise DslError("DSL root must be an object")
    # unknown top-level sections typed-reject (r9): a typo'd or
    # unimplemented section ("sorts", "profile", "timeout"…) silently
    # ignored would change results or promise behavior with no signal —
    # the same contract as the per-clause parameter audit
    unknown = set(obj) - {
        "query", "size", "from", "sort", "search_after", "aggs",
        "aggregations", "collapse", "highlight", "knn", "rescore",
        "_source", "fields", "docvalue_fields", "script_fields",
        "runtime_mappings",
        "min_score", "post_filter", "track_total_hits", "suggest",
        "retriever",
    }
    if unknown:
        raise DslError(f"unsupported request sections "
                       f"{sorted(unknown)} (engine subset)")
    # size parses BEFORE the retriever tree (r12): the retriever
    # rank_window_size default derives from it (ES defaults the window
    # to the request size and validates window >= size — a size=30
    # request fusing only each retriever's top-10 would return a
    # differently-ranked tail with no signal)
    size = obj.get("size")
    if size is not None and (not isinstance(size, int)
                             or isinstance(size, bool) or size < 0):
        raise DslError("size must be a non-negative integer")
    rrf = None
    if "retriever" in obj:
        # reciprocal rank fusion (r11): rank-based hybrid combination.
        # The retriever tree replaces the query/knn sections entirely;
        # the other ranking-affecting sections typed-reject (engine
        # subset — a silently-ignored sort/rescore would change the
        # fused ranking with no signal).
        other = set(obj) - {"retriever", "size", "_source"}
        if other:
            raise DslError(
                f"retriever cannot combine with {sorted(other)} "
                "(engine subset: retriever + size/_source only)")
        ret = obj["retriever"]
        if not isinstance(ret, dict) \
                or set(ret) not in ({"rrf"}, {"linear"}):
            raise DslError("retriever supports the 'rrf' and 'linear' "
                           "kinds (engine subset)")
        if "linear" in ret:
            # linear retriever (ES 8.16+): weighted sum of per-
            # retriever scores, optionally minmax-normalized within
            # each retriever's rank window
            spec = ret["linear"]
            if not isinstance(spec, dict) \
                    or not isinstance(spec.get("retrievers"), list) \
                    or len(spec["retrievers"]) < 2:
                raise DslError("linear needs {'retrievers': [two or "
                               "more sub-retrievers]}")
            extra_r = set(spec) - {"retrievers", "rank_window_size"}
            if extra_r:
                raise DslError(f"linear: unsupported parameters "
                               f"{sorted(extra_r)} (engine subset)")
            if len(spec["retrievers"]) > 8:
                raise DslError("linear supports at most 8 retrievers "
                               "(engine subset)")
            window = spec.get("rank_window_size")
            if window is None:
                window = max(10, size or 0)   # ES default: window = size
            if isinstance(window, bool) or not isinstance(window, int) \
                    or window < 1:
                raise DslError("linear rank_window_size must be a "
                               "positive integer")
            if size is not None and window < size:
                raise DslError("linear rank_window_size must be >= "
                               "size (ES contract)")
            lsubs = []
            for i, entry in enumerate(spec["retrievers"]):
                if not isinstance(entry, dict) \
                        or "retriever" not in entry:
                    raise DslError(
                        f"linear retrievers[{i}] needs "
                        "{'retriever': {...}, 'weight'?, "
                        "'normalizer'?}")
                extra_e = set(entry) - {"retriever", "weight",
                                        "normalizer"}
                if extra_e:
                    raise DslError(
                        f"linear retrievers[{i}]: unsupported keys "
                        f"{sorted(extra_e)}")
                w = entry.get("weight", 1.0)
                if isinstance(w, bool) \
                        or not isinstance(w, (int, float)) or w <= 0:
                    raise DslError(f"linear retrievers[{i}] weight "
                                   "must be a positive number")
                norm = str(entry.get("normalizer", "none"))
                if norm not in ("none", "minmax"):
                    raise DslError(
                        f"linear retrievers[{i}] normalizer must be "
                        "none/minmax (engine subset)")
                r = entry["retriever"]
                if not isinstance(r, dict) or len(r) != 1:
                    raise DslError(f"linear retrievers[{i}] retriever "
                                   "must be a single-kind object")
                (rk, rbody), = r.items()
                if rk == "standard":
                    if not isinstance(rbody, dict) \
                            or set(rbody) != {"query"}:
                        raise DslError(
                            f"linear retrievers[{i}]: standard takes "
                            "'query' only (engine subset)")
                    _node(rbody["query"])
                    sub = json.dumps({"query": rbody["query"]},
                                     sort_keys=True)
                elif rk == "knn":
                    if not isinstance(rbody, dict):
                        raise DslError(f"linear retrievers[{i}]: knn "
                                       "needs an object")
                    sub = json.dumps({"knn": rbody}, sort_keys=True)
                elif rk in ("rrf", "linear"):
                    # nested retriever tree (r12): one level, eager
                    # parse — see the rrf branch
                    if not isinstance(rbody, dict):
                        raise DslError(f"linear retrievers[{i}]: "
                                       f"{rk} needs an object")
                    inner = parse_request(
                        json.dumps({"retriever": {rk: rbody}}))
                    for sb in (inner.rrf[1] if rk == "rrf"
                               else [e[0] for e in inner.rrf[1]]):
                        if "retriever" in json.loads(sb):
                            raise DslError(
                                "retriever trees nest at most one "
                                "level (engine subset)")
                    sub = json.dumps({"retriever": {rk: rbody}},
                                     sort_keys=True)
                else:
                    raise DslError(
                        f"linear retrievers[{i}]: unsupported "
                        f"retriever kind {rk!r} (engine subset: "
                        "standard, knn, rrf, linear)")
                lsubs.append((sub, float(w), norm))
            rrf = ("linear", tuple(lsubs), window)
    if "retriever" in obj and rrf is None:
        spec = obj["retriever"]["rrf"]
        if not isinstance(spec, dict) \
                or not isinstance(spec.get("retrievers"), list) \
                or len(spec["retrievers"]) < 2:
            raise DslError("rrf needs {'retrievers': [two or more "
                           "sub-retrievers]}")
        extra_r = set(spec) - {"retrievers", "rank_constant",
                               "rank_window_size"}
        if extra_r:
            raise DslError(f"rrf: unsupported parameters "
                           f"{sorted(extra_r)} (engine subset)")
        if len(spec["retrievers"]) > 8:
            raise DslError("rrf supports at most 8 retrievers "
                           "(engine subset)")
        kconst = spec.get("rank_constant", 60)
        if isinstance(kconst, bool) or not isinstance(kconst, int) \
                or kconst < 1:
            raise DslError("rrf rank_constant must be a positive "
                           "integer")
        window = spec.get("rank_window_size")
        if window is None:
            window = max(10, size or 0)   # ES default: window = size
        if isinstance(window, bool) or not isinstance(window, int) \
                or window < 1:
            raise DslError("rrf rank_window_size must be a positive "
                           "integer")
        if size is not None and window < size:
            raise DslError("rrf rank_window_size must be >= size "
                           "(ES contract)")
        subs = []
        for i, r in enumerate(spec["retrievers"]):
            if not isinstance(r, dict) or len(r) != 1:
                raise DslError(f"rrf retrievers[{i}] must be a "
                               "single-kind object")
            (rk, rbody), = r.items()
            if rk == "standard":
                if not isinstance(rbody, dict) or "query" not in rbody:
                    raise DslError(f"rrf retrievers[{i}]: standard "
                                   "needs {'query': clause}")
                if set(rbody) != {"query"}:
                    raise DslError(
                        f"rrf retrievers[{i}]: standard takes 'query' "
                        "only (engine subset)")
                _node(rbody["query"])      # eager validation
                subs.append(json.dumps({"query": rbody["query"]},
                                       sort_keys=True))
            elif rk == "knn":
                if not isinstance(rbody, dict):
                    raise DslError(f"rrf retrievers[{i}]: knn needs "
                                   "an object")
                subs.append(json.dumps({"knn": rbody},
                                       sort_keys=True))
            elif rk in ("rrf", "linear"):
                # nested retriever tree (r12, ES 8.16): ONE extra
                # level — the sub body re-enters search() whole, so
                # its own fusion serves every plan path; the nested
                # spec parses EAGERLY here (typed errors surface at
                # the outer request), and a further nesting level
                # inside it rejects below
                if not isinstance(rbody, dict):
                    raise DslError(f"rrf retrievers[{i}]: {rk} needs "
                                   "an object")
                inner = parse_request(
                    json.dumps({"retriever": {rk: rbody}}))
                for sb in (inner.rrf[1] if rk == "rrf"
                           else [e[0] for e in inner.rrf[1]]):
                    if "retriever" in json.loads(sb):
                        raise DslError(
                            "retriever trees nest at most one level "
                            "(engine subset)")
                subs.append(json.dumps({"retriever": {rk: rbody}},
                                       sort_keys=True))
            else:
                raise DslError(
                    f"rrf retrievers[{i}]: unsupported retriever kind "
                    f"{rk!r} (engine subset: standard, knn, rrf, "
                    "linear)")
        rrf = ("rrf", tuple(subs), kconst, window)
    from_ = obj.get("from", 0)
    if not isinstance(from_, int) or from_ < 0:
        raise DslError("from must be a non-negative integer")
    min_score = obj.get("min_score")
    if min_score is not None:
        if isinstance(min_score, bool) \
                or not isinstance(min_score, (int, float)):
            raise DslError("min_score must be numeric")
        min_score = float(min_score)
    pf = obj.get("post_filter")
    if pf is not None and not isinstance(pf, dict):
        raise DslError("post_filter must be a query object")
    tth = obj.get("track_total_hits", True)
    if not isinstance(tth, bool):
        if not isinstance(tth, int) or tth < 0:
            raise DslError(
                "track_total_hits must be a boolean or a non-negative "
                "integer")
    query = obj.get("query", {"match_all": {}})
    nested_inner = None
    nested_inner_sort = None
    if isinstance(query, dict) and set(query) == {"nested"} \
            and isinstance(query["nested"], dict) \
            and "inner_hits" in query["nested"]:
        # ES nested inner_hits (r8): supported on a TOP-LEVEL nested
        # query (the "show why the parent matched" idiom) — popped here
        # so _node's nested branch stays inner_hits-free; a deeper
        # nested clause carrying inner_hits is rejected there
        nbody = dict(query["nested"])
        ih = nbody.pop("inner_hits")
        if not isinstance(ih, dict):
            raise DslError("nested inner_hits must be an object")
        ihx = set(ih) - {"size", "sort"}
        if ihx:
            raise DslError(f"nested inner_hits: unsupported parameters "
                           f"{sorted(ihx)} (engine subset)")
        if "sort" in ih:
            # r13: custom element sort — ONE entry over an element
            # field (the path-dotted form), asc or desc; the per-row
            # sort_array ranking keeps the no-window shape. Ties follow
            # element struct order (asc) / its reverse (desc) —
            # deterministic; element nulls sort first asc / last desc
            # (sort_array semantics; documented deviation from ES's
            # missing-last default).
            srt = _sort(ih["sort"])
            if len(srt) != 1 or isinstance(srt[0][0], GeoSort):
                raise DslError(
                    "nested inner_hits sort takes exactly one plain "
                    "field entry (engine subset)")
            sfld, sasc, _ = srt[0]
            path = str(nbody.get("path", ""))
            if not sfld.startswith(path + "."):
                raise DslError(
                    f"nested inner_hits sort field {sfld!r} must be "
                    f"an element field under the nested path "
                    f"({path}.<field>)")
            nested_inner_sort = (sfld[len(path) + 1:], sasc)
        isz = ih.get("size", 3)
        if not isinstance(isz, int) or isinstance(isz, bool) \
                or isz <= 0:
            raise DslError(
                "nested inner_hits size must be a positive integer")
        nested_inner = isz
        query = {"nested": nbody}
    after = obj.get("search_after")
    if after is not None:
        if not isinstance(after, list) or not after:
            raise DslError("search_after must be a non-empty list")
        after = tuple(after)
    collapse = None
    collapse_inner = None
    collapse_inner_sort: tuple = ()
    cspec = obj.get("collapse")
    if cspec is not None:
        if not isinstance(cspec, dict) or "field" not in cspec:
            raise DslError("collapse needs {'field': name}")
        c_extra = set(cspec) - {"field", "inner_hits"}
        if c_extra:
            raise DslError(f"collapse: unsupported parameters "
                           f"{sorted(c_extra)} (engine subset)")
        collapse = cspec["field"]
        ih = cspec.get("inner_hits")
        if ih is not None:
            # ES collapse inner_hits (r6): each collapsed group expands
            # to its top `size` member rows, ranked by the PRIMARY
            # ordering and tagged `_inner_rank` (flattened surface; a
            # custom inner sort is not supported — documented)
            if not isinstance(ih, dict):
                raise DslError("collapse inner_hits must be an object")
            if "sort" in ih:
                # r13: custom inner sort — group members rank by this
                # ordering instead of the primary (ES inner_hits sort);
                # plain fields + _score only (geo sorts typed-reject)
                collapse_inner_sort = _sort(ih["sort"])
                if any(isinstance(f, GeoSort)
                       for f, *_ in collapse_inner_sort):
                    raise DslError(
                        "collapse inner_hits sort does not take "
                        "_geo_distance entries (engine subset)")
            ih_extra = set(ih) - {"size", "sort"}
            if ih_extra:
                raise DslError(
                    f"collapse inner_hits: unsupported parameters "
                    f"{sorted(ih_extra)} (engine subset)")
            isz = ih.get("size", 3)
            if not isinstance(isz, int) or isinstance(isz, bool)                     or isz <= 0:
                raise DslError(
                    "collapse inner_hits size must be a positive "
                    "integer")
            collapse_inner = isz
    highlight: tuple[tuple[str, str, str, int, int, int], ...] = ()
    hspec = obj.get("highlight")
    if hspec is not None:
        if not isinstance(hspec, dict) \
                or not isinstance(hspec.get("fields"), dict) \
                or not hspec["fields"]:
            raise DslError(
                "highlight needs a non-empty {'fields': {name: {...}}}")
        _H_KEYS = {"pre_tags", "post_tags", "number_of_fragments",
                   "fragment_size", "no_match_size"}
        h_extra = set(hspec) - _H_KEYS - {"fields"}
        if h_extra:
            # no silent drops (r11): a vanished `type`/`highlight_query`
            # would change the emitted fragments with no signal
            raise DslError(f"highlight: unsupported parameters "
                           f"{sorted(h_extra)} (engine subset)")

        def tag(spec: dict, key: str, default: str) -> str:
            raw = spec.get(key)
            if raw is None:
                return default
            if not isinstance(raw, list) or len(raw) != 1 \
                    or not isinstance(raw[0], str):
                # ES supports tag ARRAYS for multi-level highlighting;
                # the engine's single-pass replace takes exactly one
                raise DslError(f"{key} must be a one-element string list")
            return raw[0]

        def num(spec: dict, key: str, default: int, floor: int) -> int:
            raw = spec.get(key, default)
            if not isinstance(raw, int) or isinstance(raw, bool) \
                    or raw < floor:
                raise DslError(f"{key} must be an integer >= {floor}")
            return raw

        g_pre = tag(hspec, "pre_tags", "<em>")
        g_post = tag(hspec, "post_tags", "</em>")
        g_nf = num(hspec, "number_of_fragments", 5, 0)
        g_fs = num(hspec, "fragment_size", 100, 1)
        # ES no_match_size (r13): when the field carries no match,
        # return its leading N chars as the (unwrapped) snippet
        # instead of omitting the field; 0 (default) = omit
        g_nm = num(hspec, "no_match_size", 0, 0)
        out: list[tuple[str, str, str, int, int, int]] = []
        for fld, fbody in hspec["fields"].items():
            if fbody is None:
                fbody = {}
            if not isinstance(fbody, dict):
                raise DslError(f"highlight field {fld!r} must be an object")
            f_extra = set(fbody) - _H_KEYS
            if f_extra:
                raise DslError(
                    f"highlight field {fld!r}: unsupported parameters "
                    f"{sorted(f_extra)} (engine subset)")
            out.append((fld, tag(fbody, "pre_tags", g_pre),
                        tag(fbody, "post_tags", g_post),
                        num(fbody, "number_of_fragments", g_nf, 0),
                        num(fbody, "fragment_size", g_fs, 1),
                        num(fbody, "no_match_size", g_nm, 0)))
        highlight = tuple(out)
    knn = None
    kspec = obj.get("knn")
    if kspec is not None:
        if isinstance(kspec, list):
            if len(kspec) != 1:
                raise DslError("exactly one knn section is supported")
            kspec = kspec[0]
        if not isinstance(kspec, dict) or "field" not in kspec \
                or not isinstance(kspec.get("query_vector"), list) \
                or not kspec["query_vector"]:
            raise DslError(
                "knn needs {'field': name, 'query_vector': [...], "
                "'k': int}")
        kk = kspec.get("k", 10)
        if not isinstance(kk, int) or kk <= 0:
            raise DslError("knn k must be a positive integer")
        if not all(isinstance(v, (int, float))
                   for v in kspec["query_vector"]):
            raise DslError("knn query_vector must be numeric")
        kfilter = _node(kspec["filter"]) if "filter" in kspec else None
        # ES 8.4+ hybrid search: a knn section BESIDE a query section —
        # the hit set is the union, scores SUM where a doc appears in
        # both (r6; previously rejected)
        hybrid = "query" in obj
        ksim = kspec.get("similarity")
        if ksim is not None:
            if isinstance(ksim, bool) or not isinstance(ksim, (int, float)):
                raise DslError("knn similarity must be numeric")
            ksim = float(ksim)
        kboost = kspec.get("boost", 1.0)
        if isinstance(kboost, bool) or not isinstance(kboost, (int, float)):
            raise DslError("knn boost must be numeric")
        kboost = float(kboost)
        method = kspec.get("method")
        if method is not None and method not in ("exact", "ivf", "lsh"):
            raise DslError("knn method must be 'exact', 'ivf' or 'lsh'")
        ncand = kspec.get("num_candidates")
        if ncand is not None and (not isinstance(ncand, int)
                                  or isinstance(ncand, bool)
                                  or ncand < kk):
            raise DslError("knn num_candidates must be an integer >= k")
        nprobe = kspec.get("nprobe")
        if nprobe is not None and (not isinstance(nprobe, int)
                                   or isinstance(nprobe, bool)
                                   or nprobe <= 0):
            raise DslError("knn nprobe must be a positive integer")
        # param allowlist (r12 — an unknown knn key was previously a
        # silent no-op; query_vector_builder now rejects typed, it
        # needs a model)
        k_extra2 = set(kspec) - {"field", "query_vector", "k",
                                 "filter", "similarity", "boost",
                                 "method", "num_candidates", "nprobe",
                                 "rescore_vector"}
        if k_extra2:
            raise DslError(f"knn: unsupported params "
                           f"{sorted(k_extra2)} (engine subset)")
        # ES 8.17 rescore_vector (r12): oversample × k candidates via
        # the int8-quantized dot-product prefilter, exact-cosine
        # re-rank to k — the quantized-index rescore idiom
        rv_over = None
        rv = kspec.get("rescore_vector")
        if rv is not None:
            if not isinstance(rv, dict) or set(rv) != {"oversample"}:
                raise DslError(
                    "knn rescore_vector needs {'oversample': number}")
            ov = rv["oversample"]
            if isinstance(ov, bool) or not isinstance(ov, (int, float)) \
                    or not 1.0 <= float(ov) <= 10.0:
                raise DslError("knn rescore_vector oversample must be "
                               "a number in [1, 10] (ES contract)")
            rv_over = float(ov)
            if method not in (None, "exact"):
                raise DslError(
                    "knn rescore_vector combines with the exact "
                    "method only (engine subset: the ANN routes "
                    "already re-rank candidates by exact cosine)")
        knn = (str(kspec["field"]),
               tuple(float(v) for v in kspec["query_vector"]), kk,
               kfilter, method, ncand, nprobe, hybrid, ksim, kboost,
               rv_over)
    rescore = None
    rspec = obj.get("rescore")
    if rspec is not None:
        if isinstance(rspec, list):
            if len(rspec) != 1:
                raise DslError("exactly one rescore stage is supported")
            rspec = rspec[0]
        if not isinstance(rspec, dict) or not isinstance(
                rspec.get("query"), dict) \
                or "rescore_query" not in rspec["query"]:
            raise DslError(
                "rescore needs {'query': {'rescore_query': clause}}")
        r_extra = set(rspec) - {"query", "window_size"}
        if r_extra:
            raise DslError(f"rescore: unsupported parameters "
                           f"{sorted(r_extra)} (engine subset)")
        rq = rspec["query"]
        rq_extra = set(rq) - {"rescore_query", "score_mode",
                              "query_weight", "rescore_query_weight"}
        if rq_extra:
            raise DslError(f"rescore query: unsupported parameters "
                           f"{sorted(rq_extra)} (engine subset)")
        mode = str(rq.get("score_mode", "total"))
        if mode not in ("total", "multiply", "avg", "max", "min"):
            raise DslError(f"unknown rescore score_mode {mode!r}")
        window = rspec.get("window_size", 10)
        if not isinstance(window, int) or window <= 0:
            raise DslError("rescore window_size must be a positive integer")
        try:
            qw = float(rq.get("query_weight", 1.0))
            rw = float(rq.get("rescore_query_weight", 1.0))
        except (TypeError, ValueError) as e:
            raise DslError("rescore weights must be numeric") from e
        rescore = (_node(rq["rescore_query"]), window, qw, rw, mode)
    source_filter: bool | tuple[str, ...] | None = None
    srcspec = obj.get("_source")
    if srcspec is not None and srcspec is not True:
        if srcspec is False:
            source_filter = False
        elif isinstance(srcspec, str):
            source_filter = (srcspec,)
        elif isinstance(srcspec, list) and srcspec \
                and all(isinstance(x, str) for x in srcspec):
            source_filter = tuple(srcspec)
        else:
            raise DslError(
                "_source must be a boolean, a field name, or a "
                "non-empty field-name list")
        # `*` glob patterns (r11) expand against the RESULT columns in
        # the engine (apply_source_filter) — the parse is table-blind
    fspec = obj.get("fields")
    if fspec is not None:
        # ES 8 `fields` retrieval: the engine's flattened response has
        # ONE projection surface, so a plain field-name list maps onto
        # the _source filter (documented; ES returns a separate
        # `fields` section beside _source). Object entries carry
        # `format` — per-field formatting is not supported (typed), and
        # combining with an explicit _source filter would need two
        # projections (typed).
        if source_filter is not None:
            raise DslError("'fields' cannot combine with a '_source' "
                           "filter (one projection surface — engine "
                           "subset)")
        if not isinstance(fspec, list) or not fspec or not all(
                isinstance(x, str) for x in fspec):
            raise DslError(
                "fields must be a non-empty list of field names "
                "(object entries carry 'format' — per-field "
                "formatting is not supported, engine subset)")
        # `*` glob patterns (r11) expand like _source's — in the engine
        source_filter = tuple(fspec)
    dvspec = obj.get("docvalue_fields")
    if dvspec is not None:
        # ES `docvalue_fields` (r12): the third field-retrieval idiom —
        # same one-projection mapping as `fields` (documented; ES
        # returns doc-values formatted, which for the engine's typed
        # columns is the stored value). Object entries carry `format`
        # (typed-reject like fields'); combining with fields/_source
        # would need two projections (typed).
        if source_filter is not None:
            raise DslError(
                "'docvalue_fields' cannot combine with 'fields' or a "
                "'_source' filter (one projection surface — engine "
                "subset)")
        if not isinstance(dvspec, list) or not dvspec or not all(
                isinstance(x, str) for x in dvspec):
            raise DslError(
                "docvalue_fields must be a non-empty list of field "
                "names (object entries carry 'format' — per-field "
                "formatting is not supported, engine subset)")
        source_filter = tuple(dvspec)
    script_fields: tuple[tuple[str, str], ...] = ()
    sfspec = obj.get("script_fields")
    if sfspec is not None:
        if not isinstance(sfspec, dict) or not sfspec:
            raise DslError("script_fields must be a non-empty object")
        out_sf = []
        for sname, sbody in sfspec.items():
            if not isinstance(sbody, dict) or "script" not in sbody:
                raise DslError(f"script field {sname!r} needs a 'script'")
            sb = sbody["script"]
            src = sb.get("source") if isinstance(sb, dict) else sb
            if not isinstance(src, str):
                raise DslError(f"script field {sname!r}: script source "
                               "must be a string")
            out_sf.append((str(sname), _compile_doc_script(sname, src)))
        if len({n for n, _ in out_sf}) != len(out_sf):
            raise DslError("duplicate script_fields names")
        script_fields = tuple(out_sf)
    runtime: tuple[tuple[str, str, str], ...] = ()
    rmspec = obj.get("runtime_mappings")
    if rmspec is not None:
        if not isinstance(rmspec, dict) or not rmspec:
            raise DslError("runtime_mappings must be a non-empty object")
        out_rm = []
        for rname, rbody in rmspec.items():
            if not isinstance(rbody, dict):
                raise DslError(f"runtime field {rname!r} must be an "
                               "object")
            rtype = rbody.get("type")
            if rtype not in _RUNTIME_TYPES:
                raise DslError(
                    f"runtime field {rname!r}: type must be one of "
                    f"{', '.join(sorted(_RUNTIME_TYPES))} (engine "
                    f"subset — arithmetic scripts), got {rtype!r}")
            rb = rbody.get("script")
            src = rb.get("source") if isinstance(rb, dict) else rb
            if not isinstance(src, str):
                raise DslError(f"runtime field {rname!r} needs a "
                               "'script' with a string source")
            m = _re.fullmatch(r"\s*emit\s*\((.*)\)\s*;?\s*", src,
                              _re.DOTALL)
            if m is not None:
                src = m.group(1)
            out_rm.append((str(rname), _RUNTIME_TYPES[rtype],
                           _compile_doc_script(rname, src)))
        if len({n for n, *_ in out_rm}) != len(out_rm):
            raise DslError("duplicate runtime field names")
        runtime = tuple(out_rm)
    if nested_inner is not None and collapse_inner is not None:
        raise DslError(
            "nested inner_hits and collapse inner_hits cannot combine "
            "(both flatten an _inner_rank surface)")
    return Request(
        node=_node(query),
        size=size,
        from_=from_,
        aggs=_aggs(obj.get("aggs", obj.get("aggregations"))),
        sort=_sort(obj.get("sort")),
        search_after=after,
        collapse=collapse,
        collapse_inner=collapse_inner,
        collapse_inner_sort=collapse_inner_sort,
        nested_inner=nested_inner,
        nested_inner_sort=nested_inner_sort,
        highlight=highlight,
        rescore=rescore,
        knn=knn,
        script_fields=script_fields,
        source_filter=source_filter,
        min_score=min_score,
        runtime=runtime,
        post_filter=_node(pf) if pf is not None else None,
        track_total_hits=tth,
        suggest=obj.get("suggest"),
        rrf=rrf,
    )


@dataclass(frozen=True)
class GeoSort:
    """An ES ``_geo_distance`` sort entry: order hits by haversine
    distance from one origin point. The computed distance (in the
    requested ``unit``) surfaces as a ``_geo_distance`` response column
    — ES returns it as the hit's sort value; a flat frame carries it as
    a column — which also makes it the ``search_after``/scroll anchor.
    Docs with a NULL point sort as infinitely far (ES: missing geo =
    Infinity), i.e. last ascending / first descending. Engine subset
    (documented, typed errors): ONE origin point, ONE geo sort entry
    per request, ``distance_type`` arc only, no ``mode``."""
    field: str
    lat: float
    lon: float
    unit_m: float = 1.0     # meters per requested unit


_GEO_SORT_PARAMS = {"order", "unit", "distance_type", "mode",
                    "ignore_unmapped"}


def _geo_sort(body: Any) -> tuple[GeoSort, bool, bool]:
    if not isinstance(body, dict):
        raise DslError(f"_geo_distance sort needs an object, got {body!r}")
    fields = [k for k in body if k not in _GEO_SORT_PARAMS]
    if len(fields) != 1:
        raise DslError("_geo_distance sort needs exactly one geo field, "
                       f"got {fields!r}")
    fld = fields[0]
    if isinstance(body[fld], list) and body[fld] \
            and isinstance(body[fld][0], (list, dict)):
        raise DslError("_geo_distance sort: multiple origin points are "
                       "not supported (engine subset)")
    lat, lon = _geo_point(body[fld], "_geo_distance sort")
    order = body.get("order", "asc")
    if order not in ("asc", "desc"):
        raise DslError(f"sort order must be asc/desc, got {order!r}")
    if body.get("distance_type", "arc") != "arc":
        raise DslError("_geo_distance sort: only distance_type 'arc' "
                       "is supported (engine subset)")
    if "mode" in body:
        raise DslError("_geo_distance sort: 'mode' is not supported "
                       "(single-point fields — engine subset)")
    unit = body.get("unit", "m")
    from cassandra_es_index_spark.functions.geo import _UNITS
    if unit not in _UNITS:
        raise DslError(f"_geo_distance sort: unknown unit {unit!r}")
    asc = order == "asc"
    # missing geo point = Infinity distance (ES): nulls trail ascending
    # and lead descending
    return (GeoSort(field=fld, lat=lat, lon=lon, unit_m=_UNITS[unit]),
            asc, not asc)


def _sort(spec: Any) -> tuple[tuple[str, bool, bool], ...]:
    """ES sort forms: ``"f"``, ``{"f": "desc"}``, ``{"f": {"order":
    "desc"}}``, ``{"_geo_distance": {...}}`` (→ :class:`GeoSort`), or a
    list of those. Defaults: ascending (``_score``: descending, like
    ES). Null placement follows ES: ``missing`` defaults to ``_last``
    for BOTH directions (docs without the sort field trail), and
    ``"_first"``/``"_last"`` overrides it."""
    if spec is None:
        return ()
    if not isinstance(spec, list):
        spec = [spec]
    out: list[tuple[str, bool, bool]] = []
    for entry in spec:
        if isinstance(entry, str):
            asc = entry != "_score"
            out.append((entry, asc, False))
            continue
        if isinstance(entry, dict) and len(entry) == 1:
            (fld, body), = entry.items()
            if fld == "_geo_distance":
                out.append(_geo_sort(body))
                continue
            missing = None
            if isinstance(body, str):
                order = body
            elif isinstance(body, dict):
                s_extra = set(body) - {"order", "missing"}
                if s_extra:
                    # no silent drops (r11): a vanished `mode`/
                    # `unmapped_type`/`format` would reorder results
                    raise DslError(
                        f"sort on {fld!r}: unsupported parameters "
                        f"{sorted(s_extra)} (engine subset)")
                order = body.get("order", "desc" if fld == "_score" else "asc")
                missing = body.get("missing")
            else:
                raise DslError(f"bad sort entry: {entry!r}")
            if order not in ("asc", "desc"):
                raise DslError(f"sort order must be asc/desc, got {order!r}")
            asc = order == "asc"
            if missing is None:
                nulls_first = False   # ES default `missing: _last`
            elif missing in ("_first", "_last"):
                nulls_first = missing == "_first"
            else:
                raise DslError(
                    f"sort missing must be _first/_last, got {missing!r}")
            out.append((fld, asc, nulls_first))
            continue
        raise DslError(f"bad sort entry: {entry!r}")
    if sum(isinstance(f, GeoSort) for f, *_ in out) > 1:
        raise DslError("at most one _geo_distance sort entry per request "
                       "(engine subset: one _geo_distance response "
                       "column)")
    return tuple(out)


def _top_hits(name: str, body: Any) -> TopHits:
    if not isinstance(body, dict):
        raise DslError(f"top_hits agg {name!r} needs an object")
    size = body.get("size", 3)
    if not isinstance(size, int) or size <= 0:
        raise DslError(f"top_hits agg {name!r}: size must be positive")
    source = body.get("_source", [])
    if isinstance(source, str):
        source = [source]
    if not isinstance(source, list) or not all(
            isinstance(s, str) for s in source):
        raise DslError(f"top_hits agg {name!r}: _source must be "
                       "a field name or list of field names")
    th_sort = _sort(body.get("sort"))
    if any(isinstance(f, GeoSort) for f, *_ in th_sort):
        raise DslError(f"top_hits agg {name!r}: _geo_distance sort is "
                       "not supported inside top_hits (engine subset)")
    return TopHits(size=size, sort=th_sort, source=tuple(source))


def _ranges(name: str,
            spec: Any) -> tuple[tuple[str, float | None, float | None], ...]:
    """ES range-agg ``ranges``: each entry has ``from`` (inclusive)
    and/or ``to`` (exclusive), and an optional ``key`` label (default is
    ES's ``from-to`` with ``*`` for an open side)."""
    if not isinstance(spec, list) or not spec:
        raise DslError(f"range agg {name!r} needs a non-empty 'ranges' list")
    out = []
    for entry in spec:
        if not isinstance(entry, dict) or \
                ("from" not in entry and "to" not in entry):
            raise DslError(f"range agg {name!r}: each range needs "
                           "'from' and/or 'to'")
        lo = entry.get("from")
        hi = entry.get("to")
        for v in (lo, hi):
            if v is not None and not isinstance(v, (int, float)):
                raise DslError(f"range agg {name!r}: bounds must be numbers")
        key = entry.get("key") or (
            f"{'*' if lo is None else float(lo)}"
            f"-{'*' if hi is None else float(hi)}")
        out.append((str(key),
                    None if lo is None else float(lo),
                    None if hi is None else float(hi)))
    if len({k for k, *_ in out}) != len(out):
        raise DslError(f"range agg {name!r}: duplicate range keys")
    return tuple(out)


def _date_ranges(name: str, spec: Any, key_format: Any = None,
                 ) -> tuple[tuple[str | None, str | None,
                                  str | None], ...]:
    """ES date_range-agg ``ranges``: like ``_ranges`` but bounds are date
    strings the engine casts to timestamps (``from`` inclusive, ``to``
    exclusive). ES date-math bounds (``now-1M/d``, ``2024-01-01||+1w``)
    pass through and resolve engine-side against the injectable ``now``
    anchor (r6; ``search/datemath.py``) — ``from``/``to`` both round
    DOWN, their gte/lt comparison semantics.

    With a ``format`` (r14): unnamed ranges get a None key here and the
    engine renders the ES-style default ``from-to`` label from the
    RESOLVED bound instants through the format (so date-math bounds
    label correctly); the format itself is validated at parse time."""
    if not isinstance(spec, list) or not spec:
        raise DslError(
            f"date_range agg {name!r} needs a non-empty 'ranges' list")
    if key_format is not None:
        if not isinstance(key_format, str) or not key_format:
            raise DslError(f"date_range agg {name!r}: format must be a "
                           "non-empty string")
        try:
            datemath.key_formatter(key_format)
        except datemath.DateMathError as e:
            raise DslError(f"date_range agg {name!r}: {e}") from e
    out = []
    for entry in spec:
        if not isinstance(entry, dict) or \
                ("from" not in entry and "to" not in entry):
            raise DslError(f"date_range agg {name!r}: each range needs "
                           "'from' and/or 'to'")
        lo = entry.get("from")
        hi = entry.get("to")
        for v in (lo, hi):
            if v is not None and not isinstance(v, str):
                raise DslError(
                    f"date_range agg {name!r}: bounds must be date "
                    "strings (optionally with ES date-math)")
        key = entry.get("key")
        if key is None and key_format is None:
            key = (f"{'*' if lo is None else lo}"
                   f"-{'*' if hi is None else hi}")
        out.append((None if key is None else str(key), lo, hi))
    named = [k for k, *_ in out if k is not None]
    if len(set(named)) != len(named):
        raise DslError(f"date_range agg {name!r}: duplicate range keys")
    return tuple(out)


def _ip_ranges(name: str,
               spec: Any) -> tuple[tuple[str, float | None,
                                         float | None], ...]:
    """ES ip_range-agg ``ranges``: each entry has ``from`` (inclusive)
    / ``to`` (exclusive) dotted-quad bounds, OR a CIDR ``mask``
    (resolved to [network, broadcast+1) — ES's mask semantics). Bounds
    resolve to their 32-bit values AT PARSE TIME (plan-time constants;
    a 32-bit long is exact in the float the generic range machinery
    carries). IPv4 only — IPv6 bounds typed-reject (engine subset).
    Default keys are ES's ``from-to`` (``*`` for an open side) or the
    mask string itself."""
    import ipaddress
    if not isinstance(spec, list) or not spec:
        raise DslError(
            f"ip_range agg {name!r} needs a non-empty 'ranges' list")

    def ip_val(v: Any, side: str) -> int:
        try:
            addr = ipaddress.ip_address(str(v))
        except ValueError:
            raise DslError(f"ip_range agg {name!r}: {side} {v!r} is "
                           "not a valid IP address") from None
        if addr.version != 4:
            raise DslError(f"ip_range agg {name!r}: IPv6 bounds are "
                           "not supported (engine subset)")
        return int(addr)

    out = []
    for entry in spec:
        if not isinstance(entry, dict) \
                or ("mask" not in entry
                    and "from" not in entry and "to" not in entry):
            raise DslError(f"ip_range agg {name!r}: each range needs "
                           "'from'/'to' bounds or a 'mask'")
        if "mask" in entry and ("from" in entry or "to" in entry):
            raise DslError(f"ip_range agg {name!r}: 'mask' excludes "
                           "'from'/'to' (ES contract)")
        if "mask" in entry:
            try:
                net = ipaddress.ip_network(str(entry["mask"]),
                                           strict=False)
            except ValueError:
                raise DslError(
                    f"ip_range agg {name!r}: mask {entry['mask']!r} "
                    "is not a valid CIDR block") from None
            if net.version != 4:
                raise DslError(f"ip_range agg {name!r}: IPv6 masks "
                               "are not supported (engine subset)")
            lo = int(net.network_address)
            hi = int(net.broadcast_address) + 1
            key = entry.get("key") or str(entry["mask"])
        else:
            lo = ip_val(entry["from"], "from") \
                if "from" in entry else None
            hi = ip_val(entry["to"], "to") if "to" in entry else None
            key = entry.get("key") or (
                f"{'*' if lo is None else entry['from']}"
                f"-{'*' if hi is None else entry['to']}")
        out.append((str(key),
                    None if lo is None else float(lo),
                    None if hi is None else float(hi)))
    if len({k for k, *_ in out}) != len(out):
        raise DslError(f"ip_range agg {name!r}: duplicate range keys")
    return tuple(out)


_RN_SUB_KINDS = ("avg", "sum", "min", "max", "value_count",
                 "cardinality")


def _metric(name: str, spec: dict[str, Any]) -> MetricAgg:
    rn_sub_spec = None
    if isinstance(spec, dict) and "reverse_nested" in spec \
            and set(spec) == {"reverse_nested", "aggs"}:
        # reverse_nested is the one metric-tier kind that may carry
        # sub-aggs (ES: aggregation continues in parent scope) — peel
        # them off before the exactly-one-kind check
        rn_sub_spec = spec["aggs"]
        spec = {"reverse_nested": spec["reverse_nested"]}
    if not isinstance(spec, dict) or len(spec) != 1:
        raise DslError(
            f"metric agg {name!r} must have exactly one kind: {spec!r}")
    (kind, body), = spec.items()
    if kind not in _METRIC_KINDS:
        raise DslError(f"unsupported metric agg {kind!r} (supported: "
                       f"{', '.join(_METRIC_KINDS)})")
    if kind == "rate":
        # ES rate: bucket doc_count (or `field` sum) rescaled to a
        # time unit of the PARENT date_histogram's span — the span
        # itself is validated at execution where the parent is known.
        # Fixed-span parents use one literal factor; calendar month/
        # quarter/year parents (r12) use a per-bucket span column.
        # Unit subset: second/minute/hour/day/week. `mode:
        # value_count` typed-rejects.
        if not isinstance(body, dict) or "unit" not in body:
            raise DslError(f"rate agg {name!r} needs a 'unit'")
        extra = set(body) - {"unit", "field", "mode"}
        if extra:
            raise DslError(f"rate agg {name!r}: unsupported params "
                           f"{sorted(extra)} (engine subset)")
        unit = str(body["unit"])
        if unit not in ("second", "minute", "hour", "day", "week"):
            raise DslError(
                f"rate agg {name!r}: unit must be second/minute/hour/"
                f"day/week (fixed spans — engine subset), got {unit!r}")
        fld = body.get("field")
        if fld is not None and not isinstance(fld, str):
            raise DslError(f"rate agg {name!r}: field must be a string")
        # ES rate mode (r12): sum (default) | value_count — the latter
        # counts field VALUES instead of summing them
        mode = body.get("mode", "sum")
        if mode not in ("sum", "value_count"):
            raise DslError(f"rate agg {name!r}: mode must be 'sum' or "
                           f"'value_count', got {mode!r}")
        if mode == "value_count" and not fld:
            raise DslError(f"rate agg {name!r}: mode value_count "
                           "needs a 'field' (ES contract)")
        return MetricAgg(name=name, kind="rate", field=fld or "",
                         unit=unit, rate_mode=str(mode))
    if kind == "scripted_metric":
        # ES scripted_metric, DECLARATIVELY (r12): the engine's subset
        # translates the init/map/combine/reduce pipeline at parse time
        # into ONE Spark SQL aggregate expression — the iterative
        # per-doc script becomes sum() aggregates Catalyst combines
        # map-side, which is both the 100 TB shape and deterministic
        # where the general scripted_metric is not. Subset (all typed):
        # - init:    `state.v = 0` assignments only (a nonzero init is
        #   per-shard in ES — shard-count-dependent results — so it is
        #   rejected, not emulated);
        # - map:     `state.v += <arith>` statements over the
        #   doc['f'].value painless arithmetic subset (no comparisons/
        #   conditionals; null field values contribute nothing, the
        #   sum-skips-nulls convention);
        # - combine: `return <arith over state.*>`;
        # - reduce:  a single-state identity (`return states[0]` or
        #   the canonical `for (t in states) { s += t }` sum loop) —
        #   this engine is ONE shard (the SamplerAgg premise), so the
        #   combine arithmetic is exact over GLOBAL sums and reduce
        #   has nothing to merge.
        if not isinstance(body, dict):
            raise DslError(f"scripted_metric agg {name!r} must be an "
                           "object")
        sm_required = {"init_script", "map_script", "combine_script",
                       "reduce_script"}
        sm_missing = sm_required - set(body)
        if sm_missing:
            raise DslError(f"scripted_metric agg {name!r} needs "
                           f"{sorted(sm_missing)}")
        sm_extra = set(body) - sm_required
        if sm_extra:
            raise DslError(
                f"scripted_metric agg {name!r}: unsupported params "
                f"{sorted(sm_extra)} (engine subset; params would make "
                "the translation non-declarative)")

        def stmts(s: str) -> list[str]:
            return [x.strip() for x in str(s).split(";") if x.strip()]

        sm_vars: set[str] = set()
        for st in stmts(body["init_script"]):
            m_i = _re.fullmatch(r"state\.(\w+)\s*=\s*0(?:\.0)?", st)
            if m_i is None:
                raise DslError(
                    f"scripted_metric agg {name!r}: init must be "
                    f"'state.<var> = 0' assignments, got {st!r} (a "
                    "nonzero init is per-shard in ES — shard-count-"
                    "dependent — and is rejected, not emulated)")
            sm_vars.add(m_i.group(1))
        if not sm_vars:
            raise DslError(f"scripted_metric agg {name!r}: init_script "
                           "initializes no state variables")
        var_sums: dict[str, list[str]] = {v: [] for v in sm_vars}
        for st in stmts(body["map_script"]):
            m_m = _re.fullmatch(r"state\.(\w+)\s*\+=\s*(.+)", st)
            if m_m is None:
                raise DslError(
                    f"scripted_metric agg {name!r}: map must be "
                    f"'state.<var> += <arithmetic>' statements, got "
                    f"{st!r}")
            v, expr = m_m.group(1), m_m.group(2)
            if v not in sm_vars:
                raise DslError(
                    f"scripted_metric agg {name!r}: map writes "
                    f"uninitialized state.{v}")
            if _re.search(r"==|!=|<=|>=|<|>|&&|\|\||!|\?", expr):
                raise DslError(
                    f"scripted_metric agg {name!r}: map expressions "
                    "are arithmetic only (engine subset — no "
                    "comparisons/conditionals)")
            var_sums[v].append(_compile_doc_script(name, expr))
        mapped = {v: es_ for v, es_ in var_sums.items() if es_}
        if not mapped:
            raise DslError(f"scripted_metric agg {name!r}: map_script "
                           "updates no state variables")
        m_c = _re.fullmatch(r"return\s+(.+?)\s*;?",
                            str(body["combine_script"]).strip())
        if m_c is None:
            raise DslError(
                f"scripted_metric agg {name!r}: combine must be "
                "'return <arithmetic over state.*>'")
        comb = m_c.group(1)
        if _re.search(r"==|!=|<=|>=|<|>|&&|\|\||!|\?", comb):
            raise DslError(
                f"scripted_metric agg {name!r}: combine is arithmetic "
                "only (engine subset)")

        def comb_ref(m_v: "_re.Match[str]") -> str:
            v = m_v.group(1)
            if v not in mapped:
                raise DslError(
                    f"scripted_metric agg {name!r}: combine reads "
                    f"state.{v}, which the map never updates")
            return f"`__stv_{v}`"

        comb_sub = _re.sub(r"state\.(\w+)", comb_ref, comb)
        comb_sql = _arith_sql(name, comb_sub)
        red = _re.sub(r"\s+", " ", str(body["reduce_script"]).strip())
        red_ok = (
            _re.fullmatch(r"return states\[0\] ?;?", red) or
            _re.fullmatch(
                r"double (\w+) = 0 ?; for \( ?(\w+) in states ?\) "
                r"\{ ?\1 \+= \2 ?;? ?\} return \1 ?;?", red))
        if not red_ok:
            raise DslError(
                f"scripted_metric agg {name!r}: reduce must be a "
                "single-state identity — 'return states[0]' or the "
                "canonical 'double s = 0; for (t in states) "
                "{ s += t } return s' sum loop (this engine is ONE "
                "shard; any other reduce would change the result)")
        final = comb_sql
        for v, exprs in mapped.items():
            total = " + ".join(f"sum({e})" for e in exprs)
            final = final.replace(f"`__stv_{v}`", f"({total})")
        return MetricAgg(name, "scripted_metric", "",
                         script_sql=f"CAST(({final}) AS DOUBLE)")
    if kind == "geo_line":
        # ES geo_line: the bucket's points as a GeoJSON LineString in
        # sort order — {"point": {"field": p}, "sort": {"field": s},
        # "size"?, "sort_order"?}. include_sort: true typed-rejects
        # (it changes the response shape; the sort values are the
        # caller's own field). Output: one string column.
        if not isinstance(body, dict) \
                or not isinstance(body.get("point"), dict) \
                or "field" not in body["point"] \
                or not isinstance(body.get("sort"), dict) \
                or "field" not in body["sort"]:
            raise DslError(
                f"geo_line agg {name!r} needs "
                "{'point': {'field': …}, 'sort': {'field': …}}")
        gl_extra = set(body) - {"point", "sort", "size", "sort_order",
                                "include_sort"}
        if gl_extra:
            raise DslError(f"geo_line agg {name!r}: unsupported params "
                           f"{sorted(gl_extra)} (engine subset)")
        if body.get("include_sort"):
            raise DslError(
                f"geo_line agg {name!r}: include_sort: true is not "
                "supported (it changes the response shape; the sort "
                "values are the request's own field — documented)")
        order = body.get("sort_order", "asc")
        if order not in ("asc", "desc"):
            raise DslError(f"geo_line agg {name!r}: sort_order must be "
                           f"'asc' or 'desc', got {order!r}")
        size = body.get("size", 10000)
        if isinstance(size, bool) or not isinstance(size, int) \
                or not 1 <= size <= 10000:
            raise DslError(f"geo_line agg {name!r}: size must be an "
                           "integer in [1, 10000] (the ES ceiling)")
        return MetricAgg(name, "geo_line", body["point"]["field"],
                         sort_field=str(body["sort"]["field"]),
                         sort_asc=(order == "asc"), line_size=size)
    if kind == "weighted_avg":
        # ES shape: {"value": {"field": v}, "weight": {"field": w}}
        if not isinstance(body, dict) \
                or not isinstance(body.get("value"), dict) \
                or "field" not in body["value"] \
                or not isinstance(body.get("weight"), dict) \
                or "field" not in body["weight"]:
            raise DslError(
                f"weighted_avg agg {name!r} needs "
                "{'value': {'field': …}, 'weight': {'field': …}}")
        return MetricAgg(name, kind, body["value"]["field"],
                         weight_field=body["weight"]["field"])
    if kind == "t_test":
        # ES shape: {"t_test": {"a": {"field": f, "filter"?: q},
        # "b": {...}, "type"?: ...}}. DEVIATION (documented on
        # MetricAgg): returns <name>_t + <name>_df instead of ES's
        # p-value. paired requires two plain fields over the SAME rows
        # (ES contract: no filters with paired).
        if not isinstance(body, dict) \
                or not isinstance(body.get("a"), dict) \
                or not isinstance(body.get("b"), dict):
            raise DslError(f"t_test agg {name!r} needs "
                           "{'a': {'field': …}, 'b': {'field': …}}")
        tt_extra = set(body) - {"a", "b", "type"}
        if tt_extra:
            raise DslError(f"t_test agg {name!r}: unsupported params "
                           f"{sorted(tt_extra)} (engine subset)")
        tt_type = str(body.get("type", "heteroscedastic"))
        if tt_type not in ("paired", "heteroscedastic",
                           "homoscedastic"):
            raise DslError(
                f"t_test agg {name!r}: type must be paired/"
                f"heteroscedastic/homoscedastic, got {tt_type!r}")
        sides = {}
        for side in ("a", "b"):
            sspec = body[side]
            s_extra = set(sspec) - {"field", "filter"}
            if s_extra:
                raise DslError(
                    f"t_test agg {name!r}.{side}: unsupported params "
                    f"{sorted(s_extra)}")
            if not isinstance(sspec.get("field"), str):
                raise DslError(f"t_test agg {name!r}.{side} needs a "
                               "'field'")
            filt = None
            if "filter" in sspec:
                if tt_type == "paired":
                    raise DslError(
                        f"t_test agg {name!r}: paired type cannot "
                        "take filters (ES contract — pairs come from "
                        "the same documents)")
                filt = _node(sspec["filter"])
            sides[side] = (sspec["field"], filt)
        if tt_type != "paired" and sides["a"][0] == sides["b"][0] \
                and sides["a"][1] is None and sides["b"][1] is None:
            raise DslError(
                f"t_test agg {name!r}: unpaired types need distinct "
                "fields or filters (identical populations)")
        return MetricAgg(name, kind, sides["a"][0],
                         t_b=sides["b"][0],
                         t_filter_a=sides["a"][1],
                         t_filter_b=sides["b"][1],
                         t_type=tt_type)
    if kind == "matrix_stats":
        # ES shape: {"matrix_stats": {"fields": [a, b, ...]}} —
        # listwise deletion across the field set
        flds = body.get("fields") if isinstance(body, dict) else None
        if not isinstance(flds, list) or len(flds) < 2 or not all(
                isinstance(f, str) for f in flds):
            raise DslError(f"matrix_stats agg {name!r} needs a 'fields' "
                           "list of at least two field names")
        if len(set(flds)) != len(flds):
            raise DslError(f"matrix_stats agg {name!r}: duplicate fields")
        return MetricAgg(name, kind, flds[0], multi_fields=tuple(flds))
    if kind == "reverse_nested":
        # ES reverse_nested jumps back to PARENT documents inside a
        # nested agg: doc_count = distinct parents holding ≥1 element
        # in the bucket. r13 adds parent-scope METRIC sub-aggs (ES:
        # aggregation continues in parent scope) — engine subset:
        # avg/sum/min/max/value_count/cardinality over a parent field,
        # computed over the distinct-parent frame (one extra
        # map-side-combinable aggregation on (bucket, parent) — never
        # a per-bucket corpus join). `path` (multi-level nesting) and
        # bucket sub-aggs stay typed errors.
        if body not in ({}, None):
            raise DslError(
                f"reverse_nested agg {name!r}: parameters are not "
                "supported (engine subset — one nested level, so the "
                "jump target is always the document root)")
        subs: list[MetricAgg] = []
        if rn_sub_spec is not None:
            if not isinstance(rn_sub_spec, dict) or not rn_sub_spec:
                raise DslError(f"reverse_nested agg {name!r}: aggs "
                               "must be a non-empty object")
            for sn, ss in rn_sub_spec.items():
                sm = _metric(sn, ss)
                if sm.kind not in _RN_SUB_KINDS:
                    raise DslError(
                        f"reverse_nested agg {name!r}: parent-scope "
                        f"sub-agg {sn!r} kind {sm.kind!r} is not "
                        f"supported (engine subset: "
                        f"{', '.join(_RN_SUB_KINDS)})")
                if sm.precision_threshold is not None:
                    raise DslError(
                        f"reverse_nested agg {name!r}: "
                        "precision_threshold is not supported on "
                        "parent-scope cardinality (engine subset — "
                        "exact count distinct)")
                subs.append(sm)
        return MetricAgg(name, kind, "", sub_metrics=tuple(subs))
    if kind == "top_metrics":
        # ES shape: {"metrics": {"field": f} | [{...}, ...],
        # "sort": {field: "asc"|"desc"}, "size": 1} — the metric field
        # values of the TOP document under the sort. Engine subset:
        # size 1 (the ES default; the flattened frame has no
        # array-of-hits shape), plain-field sort only.
        if not isinstance(body, dict):
            raise DslError(f"top_metrics agg {name!r} must be an object")
        mts = body.get("metrics")
        if isinstance(mts, dict):
            mts = [mts]
        if not isinstance(mts, list) or not mts or not all(
                isinstance(e, dict) and isinstance(e.get("field"), str)
                for e in mts):
            raise DslError(f"top_metrics agg {name!r} needs 'metrics' "
                           "as {'field': name} or a list of those")
        mfields = tuple(e["field"] for e in mts)
        if len(set(mfields)) != len(mfields):
            raise DslError(f"top_metrics agg {name!r}: duplicate "
                           "metric fields")
        size = body.get("size", 1)
        if isinstance(size, bool) or not isinstance(size, int) \
                or not 1 <= size <= 10:
            raise DslError(f"top_metrics agg {name!r}: size must be an "
                           "integer in [1, 10] (the ES ceiling)")
        tsort = _sort(body.get("sort"))
        if len(tsort) != 1 or not isinstance(tsort[0][0], str) \
                or tsort[0][0] == "_score":
            raise DslError(f"top_metrics agg {name!r} needs exactly one "
                           "plain-field sort entry")
        sfield, sasc, _ = tsort[0]
        return MetricAgg(name, kind, sfield, multi_fields=mfields,
                         sort_asc=sasc, line_size=size)
    if not isinstance(body, dict) or "field" not in body:
        raise DslError(f"metric agg {name!r} needs {{'field': name}}")
    if kind in ("boxplot", "median_absolute_deviation"):
        # EXACT percentiles by default; ES `compression` opts into the
        # percentile_approx sketch (the shape that scales), mirroring
        # the percentiles metric's contract
        comp_v = body.get("compression")
        if comp_v is not None and (isinstance(comp_v, bool)
                                   or not isinstance(comp_v, int)
                                   or comp_v <= 0):
            raise DslError("compression must be a positive integer")
        return MetricAgg(name, kind, body["field"], compression=comp_v)
    if kind == "percentile_ranks":
        vals = body.get("values")
        if not isinstance(vals, list) or not vals or not all(
                isinstance(v, (int, float)) for v in vals):
            raise DslError(f"percentile_ranks agg {name!r} needs a "
                           "non-empty numeric 'values' list")
        return MetricAgg(name, kind, body["field"],
                         rank_values=tuple(float(v) for v in vals))
    # simple-metric tail (avg/sum/min/max/value_count/cardinality/
    # stats/extended_stats/percentiles/weighted_avg base …): param
    # allowlist (r12 — an unknown key was previously a silent no-op)
    # + ES `missing` (null field values substitute this value instead
    # of dropping from the aggregate)
    tail_allow = {"field", "missing"}
    if kind == "cardinality":
        tail_allow |= {"precision_threshold"}
    if kind == "percentiles":
        tail_allow |= {"percents", "compression", "tdigest"}
    t_extra = set(body) - tail_allow
    if t_extra:
        raise DslError(f"metric agg {name!r} ({kind}): unsupported "
                       f"params {sorted(t_extra)} (engine subset)")
    mval = body.get("missing")
    if mval is not None and (isinstance(mval, bool)
                             or not isinstance(mval,
                                               (int, float, str))):
        raise DslError(f"metric agg {name!r}: missing must be a "
                       "number or string")
    threshold = body.get("precision_threshold")
    if threshold is not None and (not isinstance(threshold, int)
                                  or threshold <= 0):
        raise DslError("precision_threshold must be a positive integer")
    percents: tuple[float, ...] = _DEFAULT_PERCENTS
    compression = None
    if kind == "percentiles":
        if "percents" in body:
            raw = body["percents"]
            if not isinstance(raw, list) or not raw or not all(
                    isinstance(p, (int, float)) and 0 <= p <= 100
                    for p in raw):
                raise DslError(f"percentiles agg {name!r}: percents must "
                               "be numbers in [0, 100]")
            percents = tuple(float(p) for p in raw)
        # ES nests compression under "tdigest"; accept flat too
        compression = body.get("compression",
                               (body.get("tdigest") or {}).get("compression"))
        if compression is not None and (not isinstance(compression, int)
                                        or compression <= 0):
            raise DslError("compression must be a positive integer")
    return MetricAgg(name, kind, body["field"],
                     precision_threshold=threshold,
                     percents=percents,
                     compression=compression,
                     missing=mval)


def _aggs(spec: Any) -> BucketAgg | tuple[MetricAgg, ...] | None:
    if spec is None:
        return None
    if not isinstance(spec, dict) or not spec:
        raise DslError("aggs must be a non-empty object")
    entries = list(spec.items())
    # peel off sibling pipeline aggs (avg_bucket & co) — they sit NEXT TO
    # the bucket agg in ES syntax and attach to it after parsing
    sib_raw: list[tuple[str, str, str, tuple[float, ...]]] = []
    rest: list[tuple[str, Any]] = []
    for name, body in entries:
        if isinstance(body, dict) and body:
            k = next((k for k in body if k != "aggs"), None)
            if k in _SIBLING_KINDS:
                pbody = body[k]
                if not isinstance(pbody, dict) \
                        or "buckets_path" not in pbody \
                        or ">" not in str(pbody["buckets_path"]):
                    raise DslError(
                        f"sibling agg {name!r} needs a 'buckets_path' "
                        "of the form 'bucket>metric'")
                percents: tuple[float, ...] = ()
                if k == "bucket_count_ks_test":
                    # ES bucket_count_ks_test (r12): Kolmogorov-Smirnov
                    # of the bucket-count distribution against the
                    # request's `fractions` (default uniform) — the
                    # drift/anomaly idiom over a date_histogram.
                    # Engine subset (typed): alternatives
                    # less/greater/two_sided; p-values via the
                    # ASYMPTOTIC null distributions (one-sided
                    # exp(−2nD²), two-sided the Kolmogorov series with
                    # the √n + 0.12 + 0.11/√n refinement) — documented
                    # vs ES's sampled variant; `sampling_method`
                    # typed-rejects (it changes which docs n counts).
                    k_extra = set(pbody) - {"buckets_path",
                                            "alternative", "fractions"}
                    if k_extra:
                        raise DslError(
                            f"bucket_count_ks_test agg {name!r}: "
                            f"unsupported params {sorted(k_extra)} "
                            "(engine subset — sampling_method would "
                            "silently change the statistic)")
                    alts = pbody.get("alternative",
                                     ["less", "greater", "two_sided"])
                    if not isinstance(alts, list) or not alts or not all(
                            a in ("less", "greater", "two_sided")
                            for a in alts):
                        raise DslError(
                            f"bucket_count_ks_test agg {name!r}: "
                            "alternative must be a non-empty list of "
                            "less/greater/two_sided")
                    fr = pbody.get("fractions")
                    if fr is not None and (
                            not isinstance(fr, list) or len(fr) < 2
                            or not all(isinstance(x, (int, float))
                                       and not isinstance(x, bool)
                                       and x >= 0 for x in fr)
                            or sum(fr) <= 0):
                        raise DslError(
                            f"bucket_count_ks_test agg {name!r}: "
                            "fractions must be ≥2 non-negative numbers "
                            "with a positive sum")
                    sib_raw.append(
                        (name, k, str(pbody["buckets_path"]),
                         (tuple(dict.fromkeys(alts)),
                          tuple(float(x) for x in fr)
                          if fr is not None else None)))
                    continue
                if k == "change_point":
                    # ES change_point (r12): detect a shift in the
                    # bucket series. Engine subset (documented,
                    # deterministic): the BEST MEAN-SHIFT split —
                    # argmax over split points of the two-segment
                    # Welch t statistic — reported as `step_change`
                    # when its two-sided p < 0.05, else `stationary`
                    # (ES's agglomerate of spike/dip/trend detectors
                    # is shard-order- and sampling-dependent; the
                    # mean-shift test is the reproducible core).
                    cp_extra = set(pbody) - {"buckets_path"}
                    if cp_extra:
                        raise DslError(
                            f"change_point agg {name!r}: unsupported "
                            f"params {sorted(cp_extra)} "
                            "(engine subset)")
                    sib_raw.append(
                        (name, k, str(pbody["buckets_path"]), ()))
                    continue
                if k == "bucket_correlation":
                    # ES bucket_correlation (r12): Pearson correlation
                    # between the bucket series (key-ascending) and the
                    # indicator expectations. Engine subset (typed):
                    # plain Pearson — ES's count_correlation variant
                    # additionally scales by the indicator's doc_count,
                    # so doc_count is REJECTED rather than silently
                    # ignored (the no-silent-drops contract).
                    c_extra = set(pbody) - {"buckets_path", "function"}
                    if c_extra:
                        raise DslError(
                            f"bucket_correlation agg {name!r}: "
                            f"unsupported params {sorted(c_extra)}")
                    fn = pbody.get("function")
                    if not isinstance(fn, dict) \
                            or set(fn) != {"count_correlation"} \
                            or not isinstance(fn["count_correlation"],
                                              dict) \
                            or set(fn["count_correlation"]) \
                            != {"indicator"}:
                        raise DslError(
                            f"bucket_correlation agg {name!r} needs "
                            "{'function': {'count_correlation': "
                            "{'indicator': {...}}}}")
                    ind = fn["count_correlation"]["indicator"]
                    if not isinstance(ind, dict) \
                            or "expectations" not in ind:
                        raise DslError(
                            f"bucket_correlation agg {name!r}: the "
                            "indicator needs 'expectations'")
                    i_extra = set(ind) - {"expectations"}
                    if i_extra:
                        raise DslError(
                            f"bucket_correlation agg {name!r}: "
                            f"unsupported indicator params "
                            f"{sorted(i_extra)} (engine subset: plain "
                            "Pearson — doc_count scaling would "
                            "silently change the statistic)")
                    exp = ind["expectations"]
                    if not isinstance(exp, list) or len(exp) < 2 \
                            or not all(isinstance(e, (int, float))
                                       and not isinstance(e, bool)
                                       for e in exp):
                        raise DslError(
                            f"bucket_correlation agg {name!r}: "
                            "expectations must be a list of ≥2 numbers")
                    sib_raw.append((name, k, str(pbody["buckets_path"]),
                                    tuple(float(e) for e in exp)))
                    continue
                if k == "percentiles_bucket":
                    praw = pbody.get("percents", list(_DEFAULT_PERCENTS))
                    if not isinstance(praw, list) or not praw or not all(
                            isinstance(p, (int, float))
                            and not isinstance(p, bool)
                            and 0 <= p <= 100 for p in praw):
                        raise DslError(
                            f"percentiles_bucket agg {name!r}: percents "
                            "must be numbers in [0, 100]")
                    percents = tuple(float(p) for p in praw)
                sib_raw.append((name, k, str(pbody["buckets_path"]),
                                percents))
                continue
        rest.append((name, body))
    entries = rest
    if sib_raw and not entries:
        raise DslError("sibling pipeline aggs need a bucket agg to "
                       "aggregate over")
    first_kind = None
    for name, body in entries:
        if not isinstance(body, dict) or not body:
            raise DslError(f"agg {name!r} must be an object")
        first_kind = next((k for k in body if k != "aggs"), None)
        if first_kind is None:
            raise DslError(f"agg {name!r} has no aggregation clause")
        break
    if sib_raw and first_kind not in _BUCKET_KINDS:
        raise DslError("sibling pipeline aggs need a bucket agg sibling")
    if first_kind == "composite":
        if len(entries) != 1:
            raise DslError("exactly one bucket agg is supported per request")
        name, body = entries[0]
        extra = set(body) - {"composite", "aggs"}
        if extra:
            raise DslError(f"unexpected keys {sorted(extra)} in composite "
                           f"agg {name!r}")
        params = body["composite"]
        if not isinstance(params, dict) \
                or not isinstance(params.get("sources"), list) \
                or not params["sources"]:
            raise DslError(f"composite agg {name!r} needs a non-empty "
                           "'sources' list")
        sources: list[CompositeSource] = []
        for s in params["sources"]:
            if not isinstance(s, dict) or len(s) != 1:
                raise DslError("each composite source must be "
                               "{name: {kind: {...}}}")
            (sname, sbody), = s.items()
            if not isinstance(sbody, dict) or len(sbody) != 1:
                raise DslError(f"composite source {sname!r} must have "
                               "exactly one kind")
            (skind, sparams), = sbody.items()
            if skind not in ("terms", "histogram", "date_histogram",
                             "geotile_grid"):
                raise DslError(
                    f"unsupported composite source kind {skind!r}")
            if not isinstance(sparams, dict) or "field" not in sparams:
                raise DslError(f"composite source {sname!r} needs a 'field'")
            allowed_sp = {"field", "order", "missing_bucket"} | {
                "terms": set(),
                "histogram": {"interval"},
                "date_histogram": {"calendar_interval",
                                   "fixed_interval", "offset",
                                   "time_zone"},
                "geotile_grid": {"precision"},
            }[skind]
            sp_extra = set(sparams) - allowed_sp
            if sp_extra:
                # no silent drops: a vanished interval/precision would
                # change every bucket key without a signal
                raise DslError(
                    f"composite source {sname!r} ({skind}): "
                    f"unsupported parameters {sorted(sp_extra)} "
                    "(engine subset)")
            if skind == "histogram":
                siv = sparams.get("interval")
                if siv is None:
                    raise DslError("histogram source needs an 'interval'")
                if isinstance(siv, bool) \
                        or not isinstance(siv, (int, float)) or siv <= 0:
                    raise DslError(
                        "histogram source interval must be a number > 0")
            if skind == "date_histogram" \
                    and "calendar_interval" not in sparams \
                    and "fixed_interval" not in sparams:
                raise DslError("date_histogram source needs a "
                               "'calendar_interval' or 'fixed_interval'")
            soff = 0.0
            if skind == "date_histogram":
                raw_off = sparams.get("offset")
                if raw_off is not None:
                    m = _re.fullmatch(r"([+-]?)(\d+)([smhd])",
                                      str(raw_off))
                    if m is None:
                        raise DslError("date_histogram source offset "
                                       "must be ±N(s|m|h|d)")
                    mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}
                    secs = int(m.group(2)) * mult[m.group(3)]
                    soff = float(-secs if m.group(1) == "-" else secs)
                stz = sparams.get("time_zone")
                if stz is not None:
                    if not isinstance(stz, str) or not stz:
                        raise DslError("time_zone must be a non-empty "
                                       "string")
                    tzs = _fixed_tz_seconds(stz)
                    if tzs is None:
                        raise DslError(
                            "composite date_histogram time_zone must "
                            "be a fixed offset (keyset 'after' anchors "
                            "need fixed instants) — named zones work "
                            "on the plain date_histogram agg")
                    # boundary = trunc(ts + tz - off) + off - tz
                    soff -= tzs
            sprec = 7
            if skind == "geotile_grid":
                sprec = sparams.get("precision", 7)
                if isinstance(sprec, bool) or not isinstance(sprec, int) \
                        or not 0 <= sprec <= 29:
                    raise DslError(
                        "geotile_grid source precision must be an "
                        "integer in [0, 29] (ES zoom range)")
            order = sparams.get("order", "asc")
            if order not in ("asc", "desc"):
                raise DslError(f"bad source order {order!r}")
            mb = sparams.get("missing_bucket", False)
            if not isinstance(mb, bool):
                raise DslError("missing_bucket must be a boolean")
            sources.append(CompositeSource(
                sname, skind, sparams["field"],
                interval=sparams.get("interval"),
                calendar_interval=sparams.get("calendar_interval"),
                fixed_interval=sparams.get("fixed_interval"),
                offset_sec=soff,
                asc=order == "asc",
                missing_bucket=mb,
                precision=sprec))
        names = [s.name for s in sources]
        if len(set(names)) != len(names):
            raise DslError("duplicate composite source names")
        size = params.get("size", 10)
        if not isinstance(size, int) or size <= 0:
            raise DslError("composite size must be a positive integer")
        after = None
        if "after" in params:
            aspec = params["after"]
            if not isinstance(aspec, dict) or set(aspec) != set(names):
                raise DslError("composite 'after' must provide one value "
                               "per source")
            after = tuple(aspec[n] for n in names)
        metrics = tuple(_metric(n, sp)
                        for n, sp in (body.get("aggs") or {}).items())
        return CompositeAgg(name, tuple(sources), size=size,
                            after=after, metrics=metrics)
    if first_kind == "nested":
        if len(entries) != 1:
            raise DslError("exactly one bucket agg is supported per request")
        name, body = entries[0]
        extra = set(body) - {"nested", "aggs"}
        if extra:
            raise DslError(f"unexpected keys {sorted(extra)} in nested "
                           f"agg {name!r}")
        params = body["nested"]
        if not isinstance(params, dict) \
                or not isinstance(params.get("path"), str):
            raise DslError(f"nested agg {name!r} needs a 'path' string")
        if "." in params["path"]:
            raise DslError(f"nested agg {name!r}: path must be a "
                           "top-level array field (one nested level — "
                           "engine subset)")
        sub = _aggs(body.get("aggs")) if body.get("aggs") else None
        if isinstance(sub, (NestedAgg, SamplerAgg)):
            raise DslError("nested aggs hold ordinary bucket/metric "
                           "sub-aggs only (no nested-in-nested or "
                           "sampler — engine subset)")
        return NestedAgg(name, params["path"], sub=sub)
    if first_kind in ("children", "parent"):
        if len(entries) != 1:
            raise DslError("exactly one bucket agg is supported per request")
        name, body = entries[0]
        extra = set(body) - {first_kind, "aggs"}
        if extra:
            raise DslError(f"unexpected keys {sorted(extra)} in "
                           f"{first_kind} agg {name!r}")
        params = body[first_kind]
        if not isinstance(params, dict) \
                or not isinstance(params.get("type"), str) \
                or not params["type"]:
            raise DslError(f"{first_kind} agg {name!r} needs a 'type' "
                           "string (the relation name from the join "
                           "mapping — see register_relation)")
        j_extra = set(params) - {"type"}
        if j_extra:
            raise DslError(f"{first_kind} agg {name!r}: unsupported "
                           f"params {sorted(j_extra)} (engine subset)")
        sub = _aggs(body.get("aggs")) if body.get("aggs") else None
        if isinstance(sub, (RelAgg, SamplerAgg)) or (
                isinstance(sub, SingleBucketAgg) and sub.kind == "global"):
            raise DslError(
                f"{first_kind} agg {name!r}: sampler/global/join "
                "sub-aggs are not supported under a join agg (they "
                "would score or scope against the wrong table — "
                "engine subset)")
        return RelAgg(name, first_kind, params["type"], sub=sub)
    if first_kind in ("sampler", "diversified_sampler", "random_sampler"):
        if len(entries) != 1:
            raise DslError("exactly one bucket agg is supported per request")
        name, body = entries[0]
        extra = set(body) - {first_kind, "aggs"}
        if extra:
            raise DslError(f"unexpected keys {sorted(extra)} in "
                           f"sampler agg {name!r}")
        params = body[first_kind] or {}
        if not isinstance(params, dict):
            raise DslError(f"sampler agg {name!r} must be an object")
        if first_kind == "random_sampler":
            r_extra = set(params) - {"probability", "seed"}
            if r_extra:
                raise DslError(
                    f"random_sampler agg {name!r}: unsupported params "
                    f"{sorted(r_extra)} (engine subset)")
            p = params.get("probability")
            if isinstance(p, bool) or not isinstance(p, (int, float)) \
                    or not 0.0 < p <= 1.0:
                raise DslError(
                    f"random_sampler agg {name!r}: probability must be "
                    "a number in (0, 1]")
            seed = params.get("seed", 0)
            if isinstance(seed, bool) or not isinstance(seed, int) \
                    or seed < 0:
                raise DslError(
                    f"random_sampler agg {name!r}: seed must be a "
                    "non-negative integer")
            sub = _aggs(body.get("aggs")) if body.get("aggs") else None
            if isinstance(sub, SamplerAgg):
                raise DslError("sampler aggs do not nest (top level "
                               "only)")
            return SamplerAgg(name, "random_sampler",
                              probability=float(p), seed=seed, sub=sub)
        allowed = {"shard_size"} if first_kind == "sampler" \
            else {"shard_size", "field", "max_docs_per_value"}
        bad = set(params) - allowed
        if bad:
            raise DslError(f"sampler agg {name!r}: unsupported "
                           f"parameters {sorted(bad)}")
        shard_size = params.get("shard_size", 100)
        if not isinstance(shard_size, int) or isinstance(shard_size, bool) \
                or shard_size <= 0:
            raise DslError(f"sampler agg {name!r}: shard_size must be a "
                           "positive integer")
        field = ""
        max_per = 1
        if first_kind == "diversified_sampler":
            field = params.get("field")
            if not isinstance(field, str) or not field:
                raise DslError(f"diversified_sampler agg {name!r} needs "
                               "a 'field' (engine subset: field-based "
                               "diversification only)")
            max_per = params.get("max_docs_per_value", 1)
            if not isinstance(max_per, int) or isinstance(max_per, bool) \
                    or max_per <= 0:
                raise DslError(f"diversified_sampler agg {name!r}: "
                               "max_docs_per_value must be a positive "
                               "integer")
        sub = _aggs(body.get("aggs")) if body.get("aggs") else None
        if isinstance(sub, SamplerAgg):
            raise DslError("sampler aggs do not nest (top level only)")
        return SamplerAgg(name, first_kind, shard_size=shard_size,
                          field=field, max_docs_per_value=max_per,
                          sub=sub)
    if first_kind in _SINGLE_BUCKET_KINDS:
        if len(entries) != 1:
            raise DslError("exactly one bucket agg is supported per request")
        name, body = entries[0]
        extra = set(body) - {first_kind, "aggs"}
        if extra:
            raise DslError(f"unexpected keys {sorted(extra)} in "
                           f"single-bucket agg {name!r}")
        params = body[first_kind]
        subs = body.get("aggs") or {}
        has_bucket_sub = any(
            isinstance(sp, dict) and any(
                k in _BUCKET_KINDS for k in sp if k != "aggs")
            for sp in subs.values())
        if first_kind == "missing" and has_bucket_sub:
            # missing agg with a BUCKET sub-agg (r6): same desugar as
            # filter — the missing bucket IS the docs where the field
            # is absent
            if not isinstance(params, dict) or "field" not in params:
                raise DslError(f"missing agg {name!r} needs a 'field'")
            clause = {"bool": {"must_not": [
                {"exists": {"field": params["field"]}}]}}
            return _aggs({name: {"filters": {"filters": {name: clause}},
                                 "aggs": subs}})
        if first_kind == "filter" and has_bucket_sub:
            # filter agg with a BUCKET sub-agg (r6): desugar to a
            # one-entry `filters` bucket — the generic nested machinery
            # then handles the sub levels/metrics; the flattened key
            # column carries the agg's name (the filter bucket is
            # anonymous in ES; documented)
            if not isinstance(params, dict) or not params:
                raise DslError(f"filter agg {name!r} needs a query clause")
            return _aggs({name: {"filters": {"filters": {name: params}},
                                 "aggs": subs}})
        metrics = tuple(_metric(n, sp) for n, sp in subs.items())
        if first_kind == "filter":
            if not isinstance(params, dict) or not params:
                raise DslError(f"filter agg {name!r} needs a query clause")
            return SingleBucketAgg(name, "filter", node=_node(params),
                                   metrics=metrics)
        if first_kind == "missing":
            if not isinstance(params, dict) or "field" not in params:
                raise DslError(f"missing agg {name!r} needs a 'field'")
            m_extra = set(params) - {"field"}
            if m_extra:
                raise DslError(f"missing agg {name!r}: unsupported "
                               f"params {sorted(m_extra)} "
                               "(engine subset)")
            return SingleBucketAgg(name, "missing", field=params["field"],
                                   metrics=metrics)
        # global: body must be the empty object (ES syntax)
        if params not in ({}, None):
            raise DslError(f"global agg {name!r} takes no parameters")
        return SingleBucketAgg(name, "global", metrics=metrics)
    if first_kind in _BUCKET_KINDS:
        if len(entries) != 1:
            raise DslError("exactly one bucket agg is supported per request")
        name, body = entries[0]
        extra = set(body) - {first_kind, "aggs"}
        if extra:
            # sibling metrics belong INSIDE the bucket's `aggs` object
            # (ES syntax) — stray keys here would be silently dropped
            raise DslError(f"unexpected keys {sorted(extra)} in bucket "
                           f"agg {name!r} (siblings go under 'aggs')")
        params = body[first_kind]
        if not isinstance(params, dict) or (
                first_kind not in ("filters", "multi_terms",
                                   "adjacency_matrix",
                                   "frequent_item_sets")
                and "field" not in params):
            raise DslError(f"bucket agg {name!r} needs a 'field'")
        allowed_bp = _GENERIC_BUCKET_PARAMS.get(first_kind)
        if allowed_bp is not None:
            bp_extra = set(params) - allowed_bp
            if bp_extra:
                # no silent drops: a vanished shard_size/time_zone/
                # other_bucket would silently change bucket contents
                raise DslError(
                    f"{first_kind} agg {name!r}: unsupported params "
                    f"{sorted(bp_extra)} (engine subset)")
        if sib_raw and first_kind in ("rare_terms", "multi_terms",
                                      "significant_terms",
                                      "geotile_grid", "geohash_grid",
                                      "auto_date_histogram",
                                      "variable_width_histogram",
                                      "frequent_item_sets"):
            # these branches return before the sibling attach below — a
            # silent pass-through would DROP the requested aggregation
            raise DslError(
                "sibling pipeline aggs are not supported beside "
                f"{first_kind} buckets")
        if first_kind == "rare_terms":
            # ES rare_terms: buckets at or below max_doc_count, ordered
            # doc_count asc then key asc, no top-size truncation
            extra_p = set(params) - {"field", "max_doc_count"}
            if extra_p:
                raise DslError(f"rare_terms agg {name!r}: unsupported "
                               f"params {sorted(extra_p)}")
            if body.get("aggs"):
                raise DslError("rare_terms does not support "
                               "sub-aggregations")
            mx = params.get("max_doc_count", 1)
            if not isinstance(mx, int) or mx <= 0:
                raise DslError("max_doc_count must be a positive integer")
            return BucketAgg(name=name, kind="rare_terms",
                             field=params["field"], size=mx)
        if first_kind == "multi_terms":
            # ES multi_terms: composite key over several fields, terms
            # ordering (doc_count desc, keys asc), size cap; flattened
            # one column per source field
            tspec = params.get("terms")
            if not isinstance(tspec, list) or len(tspec) < 2 or not all(
                    isinstance(t, dict) and "field" in t for t in tspec):
                raise DslError(
                    f"multi_terms agg {name!r} needs a 'terms' list of "
                    "at least two {'field': ...} entries")
            msize = params.get("size", 10)
            if not isinstance(msize, int) or msize <= 0:
                raise DslError("multi_terms size must be a positive "
                               "integer")
            metrics = tuple(_metric(n, sp)
                            for n, sp in (body.get("aggs") or {}).items())
            flds = tuple(t["field"] for t in tspec)
            if len(set(flds)) != len(flds):
                raise DslError("duplicate multi_terms fields")
            return BucketAgg(name=name, kind="multi_terms",
                             field=flds[0], multi_fields=flds,
                             size=msize, metrics=metrics)
        if first_kind == "categorize_text":
            # ES categorize_text, deterministic subset (r11): ES's
            # drain-tree categorizer is ML-adaptive (merges near-equal
            # templates by similarity) and not reproducible; the
            # engine groups by an EXACT token template — lowercase
            # whitespace tokens with every digit-bearing token masked
            # to <num> — the classic log-template key. Terms-style
            # selection (doc_count desc, key asc, size cap, ES default
            # 10); metric sub-aggs ride the same aggregation. The
            # adaptive knobs (similarity_threshold,
            # max_unique_tokens, categorization_filters, …)
            # typed-reject.
            extra_p = set(params) - {"field", "size"}
            if extra_p:
                raise DslError(
                    f"categorize_text agg {name!r}: unsupported "
                    f"params {sorted(extra_p)} (engine subset — the "
                    "adaptive drain-tree knobs are not reproducible)")
            csize = params.get("size", 10)
            if isinstance(csize, bool) or not isinstance(csize, int) \
                    or csize <= 0:
                raise DslError("categorize_text size must be a "
                               "positive integer")
            metrics = tuple(_metric(n, sp)
                            for n, sp in (body.get("aggs")
                                          or {}).items())
            return BucketAgg(name=name, kind="categorize_text",
                             field=params["field"], size=csize,
                             metrics=metrics)
        if first_kind in ("geotile_grid", "geohash_grid"):
            # ES geo grid aggs (r8): web-mercator "z/x/y" tiles /
            # base32 geohash cells of the struct<lat,lon> geo_point
            # field, doc_count desc + key asc, size cap (ES default
            # 10000); metric sub-aggs ride the same aggregation
            extra_p = set(params) - {"field", "precision", "size"}
            if extra_p:
                raise DslError(f"{first_kind} agg {name!r}: unsupported "
                               f"params {sorted(extra_p)}")
            lo_p, hi_p, dflt = (0, 29, 7) if first_kind == "geotile_grid" \
                else (1, 12, 5)
            prec = params.get("precision", dflt)
            if isinstance(prec, bool) or not isinstance(prec, int) \
                    or not lo_p <= prec <= hi_p:
                raise DslError(
                    f"{first_kind} precision must be an integer in "
                    f"[{lo_p}, {hi_p}]")
            gsize = params.get("size", 10_000)
            if isinstance(gsize, bool) or not isinstance(gsize, int) \
                    or gsize <= 0:
                raise DslError(f"{first_kind} size must be a positive "
                               "integer")
            metrics = tuple(_metric(n, sp)
                            for n, sp in (body.get("aggs") or {}).items())
            return BucketAgg(name=name, kind=first_kind,
                             field=params["field"], size=gsize,
                             precision=prec, metrics=metrics)
        if first_kind == "geo_distance":
            # ES geo_distance aggregation (r11): range buckets keyed by
            # the doc point's distance from `origin`, expressed in
            # `unit` (ES default m). Reuses the range-bucket machinery
            # — the value column is the haversine distance scaled to
            # the unit (arc distance_type only; `plane` typed-rejects,
            # the engine computes one distance formula on both plans).
            # Overlapping ranges count a doc in EACH bucket; null
            # points drop out (ES semantics). Buckets order by key
            # string asc like the range agg (documented deviation: ES
            # returns request order).
            extra_p = set(params) - {"field", "origin", "ranges",
                                     "unit", "distance_type"}
            if extra_p:
                raise DslError(
                    f"geo_distance agg {name!r}: unsupported params "
                    f"{sorted(extra_p)}")
            if "origin" not in params:
                raise DslError(f"geo_distance agg {name!r} needs an "
                               "'origin' point")
            olat, olon = _geo_point(params["origin"],
                                    f"geo_distance agg {name!r}")
            dtype_p = str(params.get("distance_type", "arc")).lower()
            if dtype_p != "arc":
                raise DslError(
                    f"geo_distance agg {name!r}: distance_type "
                    f"{dtype_p!r} is not supported (engine subset: "
                    "arc — one haversine formula on every plan)")
            unit = str(params.get("unit", "m")).lower()
            from cassandra_es_index_spark.functions.geo import _UNITS
            if unit not in _UNITS:
                raise DslError(f"geo_distance agg {name!r}: unknown "
                               f"distance unit {unit!r}")
            ranges = _ranges(name, params.get("ranges"))
            metrics = tuple(_metric(n, sp)
                            for n, sp in (body.get("aggs") or {}).items())
            return BucketAgg(name=name, kind="geo_distance",
                             field=params["field"], ranges=ranges,
                             geo_origin=(olat, olon, _UNITS[unit]),
                             metrics=metrics)
        if first_kind == "auto_date_histogram":
            # ES auto_date_histogram: target a bucket COUNT instead of
            # an interval — the engine picks the smallest interval from
            # its fixed ladder whose bucket count fits the data's
            # min/max span (resolved in search_aggs, where the match
            # set is known), then runs the ordinary date_histogram
            # machinery. Metric sub-aggs ride along; sub-BUCKETS are
            # rejected (the interval resolution is top-level-only,
            # documented engine subset).
            extra_p = set(params) - {"field", "buckets"}
            if extra_p:
                raise DslError(
                    f"auto_date_histogram agg {name!r}: unsupported "
                    f"params {sorted(extra_p)}")
            nb = params.get("buckets", 10)
            if isinstance(nb, bool) or not isinstance(nb, int) or nb < 1:
                raise DslError("auto_date_histogram buckets must be a "
                               "positive integer")
            sub_specs_a = dict(body.get("aggs") or {})
            if any(isinstance(sp, dict) and any(
                    k in _BUCKET_KINDS or k in _SINGLE_BUCKET_KINDS
                    for k in sp) for sp in sub_specs_a.values()):
                raise DslError("auto_date_histogram supports metric "
                               "sub-aggs only (documented subset)")
            metrics = tuple(_metric(n, sp)
                            for n, sp in sub_specs_a.items())
            return BucketAgg(name=name, kind="auto_date_histogram",
                             field=params["field"], buckets=nb,
                             metrics=metrics)
        if first_kind == "frequent_item_sets":
            # ES frequent_item_sets (r12), the 2-itemset A-priori
            # subset (typed): frequent co-occurring ITEM PAIRS across
            # documents — items are the doc's DISTINCT analyzed tokens
            # (string field) or distinct array elements (array<string>
            # field). ES's ECLAT miner returns sets of any size;
            # pairs are the overwhelmingly-common use and the shape
            # with a clean distributed plan (apriori prune → pruned
            # self-join on the doc key → pair count), so larger
            # minimum_set_size typed-rejects. Output per bucket:
            # item1, item2 (item1 < item2), doc_count, support.
            extra_p = set(params) - {"fields", "minimum_support",
                                     "minimum_set_size", "size"}
            if extra_p:
                raise DslError(
                    f"frequent_item_sets agg {name!r}: unsupported "
                    f"params {sorted(extra_p)} (engine subset)")
            flds = params.get("fields")
            if not isinstance(flds, list) or len(flds) != 1 \
                    or not isinstance(flds[0], dict) \
                    or "field" not in flds[0]:
                raise DslError(
                    f"frequent_item_sets agg {name!r} needs "
                    "{'fields': [{'field': …}]} — exactly one field "
                    "(engine subset)")
            mss = params.get("minimum_set_size", 2)
            if mss not in (2, 3):
                raise DslError(
                    "frequent_item_sets minimum_set_size must be 2 or "
                    "3 (engine subset: the pair/triple A-priori miner "
                    "— deeper levels would need iterative candidate "
                    "generation; sets are EXACTLY that size, a "
                    "documented deviation from ES's ≥-size ECLAT)")
            msup = params.get("minimum_support", 0.1)
            if isinstance(msup, bool) \
                    or not isinstance(msup, (int, float)) \
                    or not 0.0 < msup <= 1.0:
                raise DslError("frequent_item_sets minimum_support "
                               "must be a number in (0, 1]")
            fis_size = params.get("size", 10)
            if isinstance(fis_size, bool) or not isinstance(fis_size, int) \
                    or not 1 <= fis_size <= 10000:
                raise DslError("frequent_item_sets size must be an "
                               "integer in [1, 10000]")
            if body.get("aggs"):
                raise DslError("frequent_item_sets does not support "
                               "sub-aggregations")
            return BucketAgg(name=name, kind="frequent_item_sets",
                             field=flds[0]["field"],
                             size=fis_size,
                             interval=float(msup),
                             precision=int(mss))  # set size (2|3)
        if first_kind == "variable_width_histogram":
            # ES variable_width_histogram: cluster a numeric field into
            # ~`buckets` dynamically-sized buckets. ES's streaming
            # clusterer is shard-order dependent; the engine's
            # DETERMINISTIC analogue (documented) splits the sorted
            # DISTINCT values at the buckets−1 LARGEST adjacent gaps
            # (ties → the leftmost/smallest boundary), which is the
            # 1-D clustering that minimizes within-cluster spread for
            # fixed k. Output per bucket: min, key (the ES centroid =
            # value average), max, doc_count. Metric sub-aggs ride
            # along; sub-buckets typed-reject (documented subset).
            extra_p = set(params) - {"field", "buckets"}
            if extra_p:
                raise DslError(
                    f"variable_width_histogram agg {name!r}: "
                    f"unsupported params {sorted(extra_p)} "
                    "(engine subset: field + buckets; ES's "
                    "shard_size/initial_buffer tune its streaming "
                    "clusterer, which the deterministic gap-split "
                    "replaces)")
            nb = params.get("buckets", 10)
            if isinstance(nb, bool) or not isinstance(nb, int) \
                    or nb < 1 or nb > 256:
                raise DslError(
                    "variable_width_histogram buckets must be an "
                    "integer in [1, 256] (engine ceiling — the "
                    "boundary set is driver-resolved like "
                    "auto_date_histogram's interval)")
            sub_specs_v = dict(body.get("aggs") or {})
            if any(isinstance(sp, dict) and any(
                    k in _BUCKET_KINDS or k in _SINGLE_BUCKET_KINDS
                    for k in sp) for sp in sub_specs_v.values()):
                raise DslError("variable_width_histogram supports "
                               "metric sub-aggs only (documented "
                               "subset)")
            metrics = tuple(_metric(n, sp)
                            for n, sp in sub_specs_v.items())
            return BucketAgg(name=name, kind="variable_width_histogram",
                             field=params["field"], buckets=nb,
                             metrics=metrics)
        if first_kind in ("significant_terms", "significant_text"):
            # foreground-vs-background scored terms; no sub-aggs (the
            # score IS the payload), size caps the output.
            # significant_text (r11): the unit is the analyzed TOKEN of
            # a text field (distinct per doc — ES's doc-count
            # semantics), same JLH scorer; top-level only (documented
            # subset — significant_terms may nest one level under a
            # bucket).
            H_KINDS = ("jlh", "percentage", "chi_square",
                       "mutual_information", "gnd")
            extra_p = set(params) - {"field", "size",
                                     "background_filter",
                                     "min_doc_count"} - set(H_KINDS)
            if extra_p:
                raise DslError(
                    f"{first_kind} agg {name!r}: unsupported "
                    f"params {sorted(extra_p)}")
            if body.get("aggs"):
                raise DslError(f"{first_kind} does not support "
                               "sub-aggregations")
            bgf = params.get("background_filter")
            if bgf is not None and (not isinstance(bgf, dict) or not bgf):
                raise DslError(
                    f"{first_kind} agg {name!r}: background_filter "
                    "must be a query clause object")
            # significance heuristic (r12): at most one of the ES
            # heuristic keys; jlh is the default. gnd typed-rejects —
            # its return transform differs across ES versions, so a
            # silent approximation would mis-rank (the no-silent-drops
            # contract).
            chosen = [h for h in H_KINDS if h in params]
            if len(chosen) > 1:
                raise DslError(
                    f"{first_kind} agg {name!r}: at most one "
                    f"significance heuristic, got {chosen}")
            h_kind, h_neg, h_sup = "jlh", False, True
            if chosen:
                h_kind = chosen[0]
                if h_kind == "gnd":
                    raise DslError(
                        f"{first_kind} agg {name!r}: gnd is not "
                        "supported (engine subset — its score "
                        "transform is ES-version-dependent; use "
                        "jlh/chi_square/mutual_information/"
                        "percentage)")
                hspec = params[h_kind]
                if not isinstance(hspec, dict):
                    raise DslError(
                        f"{first_kind} agg {name!r}: the {h_kind} "
                        "heuristic must be an object")
                h_allow = (set() if h_kind in ("jlh", "percentage")
                           else {"include_negatives",
                                 "background_is_superset"})
                h_extra = set(hspec) - h_allow
                if h_extra:
                    raise DslError(
                        f"{first_kind} agg {name!r}: {h_kind} takes "
                        f"{sorted(h_allow) or 'no'} params, got "
                        f"{sorted(h_extra)}")
                h_neg = hspec.get("include_negatives", False)
                h_sup = hspec.get("background_is_superset", True)
                if not isinstance(h_neg, bool) \
                        or not isinstance(h_sup, bool):
                    raise DslError(
                        f"{first_kind} agg {name!r}: heuristic flags "
                        "must be booleans")
            # ES significant min_doc_count: foreground-count floor
            # before ranking. ENGINE DEFAULT 1 (every matched term
            # ranks) — a documented deviation from ES's noise-trim
            # default of 3; pass the param for ES behavior.
            sig_mdc = params.get("min_doc_count", 1)
            if isinstance(sig_mdc, bool) or not isinstance(sig_mdc, int) \
                    or sig_mdc < 1:
                raise DslError(f"{first_kind} agg {name!r}: "
                               "min_doc_count must be a positive "
                               "integer")
            return BucketAgg(name=name, kind=first_kind,
                             field=params["field"],
                             size=params.get("size"),
                             bg_filter=_node(bgf) if bgf else None,
                             min_doc_count=sig_mdc,
                             sig_heuristic=(h_kind, h_neg, h_sup))
        sub_specs = dict(body.get("aggs") or {})
        sub_bucket = None
        bucket_subs = []
        top_hits = None
        pipelines: list[tuple[str, str, str]] = []
        for n, sp in list(sub_specs.items()):
            if not isinstance(sp, dict) or not sp:
                raise DslError(f"agg {n!r} must be an object")
            kind = next((k for k in sp if k != "aggs"), None)
            if kind is None:
                raise DslError(f"agg {n!r} has no aggregation clause")
            if kind == "top_hits":
                if top_hits is not None:
                    raise DslError("at most one top_hits per bucket level")
                top_hits = _top_hits(n, sp[kind])
                sub_specs.pop(n)
                continue
            if kind in _PIPELINE_KINDS:
                pbody = sp[kind]
                if not isinstance(pbody, dict):
                    raise DslError(f"pipeline agg {n!r} must be an object")
                if kind in ("cumulative_sum", "derivative",
                            "serial_diff", "moving_fn"):
                    if "buckets_path" not in pbody:
                        raise DslError(f"pipeline agg {n!r} needs a "
                                       "'buckets_path'")
                    lag = pbody.get("lag", 1)
                    if not isinstance(lag, int) or lag <= 0:
                        raise DslError("serial_diff lag must be a "
                                       "positive integer")
                    path = str(pbody["buckets_path"])
                    if kind == "moving_fn":
                        # painless subset: the built-in MovingFunctions
                        # over the window values
                        m = _re.fullmatch(
                            r"MovingFunctions\.(unweightedAvg|min|max"
                            r"|sum)\(values\)",
                            str(pbody.get("script", "")).strip())
                        if m is None:
                            raise DslError(
                                f"moving_fn agg {n!r}: only MovingFunc"
                                "tions.unweightedAvg/min/max/sum(values)"
                                " scripts are supported")
                        window = pbody.get("window")
                        if not isinstance(window, int) or window <= 0:
                            raise DslError("moving_fn needs a positive "
                                           "integer 'window'")
                        shift = pbody.get("shift", 0)
                        if not isinstance(shift, int):
                            raise DslError("moving_fn shift must be an "
                                           "integer")
                        pipelines.append(
                            (n, kind, (path, m.group(1), window, shift)))
                    elif kind == "serial_diff":
                        pipelines.append((n, kind, (path, lag)))
                    elif kind == "derivative" and "unit" in pbody:
                        # ES derivative `unit` (r12): adds a
                        # `<name>_normalized` column = derivative ÷
                        # (parent bucket span / unit span) — the
                        # per-unit rate of change. Fixed-interval
                        # date_histogram parents only (one literal
                        # factor — the `rate` agg's premise); validated
                        # at execution where the parent is known.
                        u = str(pbody["unit"])
                        if not _re.fullmatch(r"\d+[smhd]", u.strip()):
                            raise DslError(
                                f"derivative agg {n!r}: unit must be a "
                                f"fixed interval ('30s'/'5m'/'1h'/'7d'),"
                                f" got {u!r}")
                        pipelines.append((n, kind, (path, "unit", u)))
                    else:
                        pipelines.append((n, kind, path))
                elif kind == "moving_avg":
                    # ES legacy moving_avg (r13 — removed in ES 8 in
                    # favour of moving_fn, but ubiquitous in older
                    # request bodies an ES porter carries over). Engine
                    # subset (typed): models simple (default) / linear
                    # / ewma (settings.alpha, ES default 0.3); the
                    # window INCLUDES the current bucket (the
                    # moving_avg contract — moving_fn's shift applies
                    # to the moving_fn kind only). minimize/predict
                    # typed-reject (they fit model parameters /
                    # extrapolate buckets — out of the deterministic
                    # frame contract).
                    ma_extra = set(pbody) - {"buckets_path", "window",
                                             "model", "settings"}
                    if ma_extra:
                        raise DslError(
                            f"moving_avg agg {n!r}: unsupported "
                            f"params {sorted(ma_extra)} (engine "
                            "subset; minimize/predict change the "
                            "result nondeterministically)")
                    if "buckets_path" not in pbody:
                        raise DslError(f"pipeline agg {n!r} needs a "
                                       "'buckets_path'")
                    ma_w = pbody.get("window", 5)
                    if not isinstance(ma_w, int) \
                            or isinstance(ma_w, bool) \
                            or not 1 <= ma_w <= 100:
                        raise DslError(
                            f"moving_avg agg {n!r}: window must be an "
                            "integer in [1, 100] (the window unrolls "
                            "to per-lag expressions — bounded by "
                            "contract)")
                    ma_model = pbody.get("model", "simple")
                    if ma_model not in ("simple", "linear", "ewma"):
                        raise DslError(
                            f"moving_avg agg {n!r}: model must be "
                            "simple/linear/ewma (engine subset — "
                            "holt/holt_winters fit parameters)")
                    ma_alpha = 0.3
                    st = pbody.get("settings")
                    if st is not None:
                        if not isinstance(st, dict) \
                                or set(st) - {"alpha"}:
                            raise DslError(
                                f"moving_avg agg {n!r}: settings "
                                "supports {'alpha'} only (engine "
                                "subset)")
                        if "alpha" in st:
                            if ma_model != "ewma":
                                raise DslError(
                                    f"moving_avg agg {n!r}: alpha "
                                    "applies to the ewma model only")
                            a = st["alpha"]
                            if isinstance(a, bool) or not isinstance(
                                    a, (int, float)) or not 0 < a <= 1:
                                raise DslError(
                                    f"moving_avg agg {n!r}: alpha "
                                    "must be a number in (0, 1]")
                            ma_alpha = float(a)
                    pipelines.append(
                        (n, kind, (str(pbody["buckets_path"]),
                                   ma_model, ma_w, ma_alpha)))
                elif kind == "moving_percentiles":
                    # ES moving_percentiles (r12): percentiles over a
                    # moving window of buckets. Per-bucket percentiles
                    # don't merge (ES merges TDigest sketches), so the
                    # engine computes EXACT percentiles over the
                    # window's SOURCE rows — the buckets_path must
                    # name a sibling `percentiles` metric (its field +
                    # percents drive the pass; resolved in the
                    # validation block below).
                    mp_extra = set(pbody) - {"buckets_path", "window",
                                             "shift"}
                    if mp_extra:
                        raise DslError(
                            f"moving_percentiles agg {n!r}: "
                            f"unsupported params {sorted(mp_extra)} "
                            "(engine subset)")
                    if "buckets_path" not in pbody:
                        raise DslError(f"pipeline agg {n!r} needs a "
                                       "'buckets_path'")
                    mp_w = pbody.get("window")
                    if not isinstance(mp_w, int) \
                            or isinstance(mp_w, bool) or mp_w <= 0 \
                            or mp_w > 1000:
                        raise DslError(
                            f"moving_percentiles agg {n!r}: window "
                            "must be an integer in [1, 1000] (each "
                            "source row fans out to `window` bucket "
                            "windows — bounded by contract)")
                    mp_s = pbody.get("shift", 0)
                    if not isinstance(mp_s, int) \
                            or isinstance(mp_s, bool):
                        raise DslError(
                            f"moving_percentiles agg {n!r}: shift "
                            "must be an integer")
                    pipelines.append(
                        (n, kind, (str(pbody["buckets_path"]),
                                   mp_w, mp_s)))
                elif kind == "cumulative_cardinality":
                    # ES cumulative_cardinality (r12): the running
                    # count of DISTINCT values seen up to each bucket.
                    # Per-bucket cardinalities don't merge into a
                    # cumulative one, so the buckets_path must name a
                    # sibling `cardinality` metric at this level — its
                    # FIELD drives a first-appearance pass over the
                    # source frame at execution (resolved in the
                    # validation block below, where `metrics` exists).
                    cc_extra = set(pbody) - {"buckets_path"}
                    if cc_extra:
                        raise DslError(
                            f"cumulative_cardinality agg {n!r}: "
                            f"unsupported params {sorted(cc_extra)} "
                            "(engine subset)")
                    if "buckets_path" not in pbody:
                        raise DslError(f"pipeline agg {n!r} needs a "
                                       "'buckets_path'")
                    pipelines.append((n, kind, str(pbody["buckets_path"])))
                elif kind == "normalize":
                    if "buckets_path" not in pbody:
                        raise DslError(f"normalize agg {n!r} needs a "
                                       "'buckets_path'")
                    method = pbody.get("method")
                    if method not in _NORMALIZE_METHODS:
                        raise DslError(
                            f"normalize agg {n!r}: method must be one "
                            f"of {', '.join(_NORMALIZE_METHODS)}, got "
                            f"{method!r}")
                    pipelines.append(
                        (n, kind, (str(pbody["buckets_path"]), method)))
                elif kind in ("bucket_script", "bucket_selector"):
                    bp = pbody.get("buckets_path")
                    if not isinstance(bp, dict) or not bp \
                            or "script" not in pbody:
                        raise DslError(
                            f"{kind} agg {n!r} needs "
                            "{'buckets_path': {param: path}, "
                            "'script': str}")
                    paths = {str(k): str(v) for k, v in bp.items()}
                    pipelines.append(
                        (n, kind,
                         (_compile_bucket_script(n, str(pbody["script"]),
                                                 paths), paths)))
                else:  # bucket_sort
                    bsort = _sort(pbody.get("sort"))
                    bsize = pbody.get("size")
                    if bsize is not None and (not isinstance(bsize, int)
                                              or bsize <= 0):
                        raise DslError("bucket_sort size must be a "
                                       "positive integer")
                    if not bsort and bsize is None:
                        raise DslError(f"bucket_sort agg {n!r} needs "
                                       "'sort' and/or 'size'")
                    pipelines.append((n, kind, (bsort, bsize)))
                sub_specs.pop(n)
                continue
            if kind in _BUCKET_KINDS:
                bucket_subs.append(n)
        if bucket_subs:
            if len(bucket_subs) != 1:
                raise DslError("at most one nested bucket agg is supported"
                               " per level")
            # recursion: sub-buckets nest to ARBITRARY depth, each level
            # carrying its own metrics and at most one deeper bucket
            sub_bucket = _aggs(
                {bucket_subs[0]: sub_specs.pop(bucket_subs[0])})
            # significant_terms may nest ONE level deep as the terminal
            # sub-agg (per-parent foreground vs whole-index background,
            # r6); the engine rejects deeper placements
        metrics = tuple(_metric(n, s) for n, s in sub_specs.items())
        order = None
        if "order" in params:
            # ES terms order: one {target: dir} object, or a LIST of
            # them — multi-criteria ordering, applied left to right (r6)
            ospec = params["order"]
            specs = ospec if isinstance(ospec, list) else [ospec]
            if not specs or not all(
                    isinstance(o, dict) and len(o) == 1 for o in specs):
                raise DslError("terms order must be {target: asc|desc} "
                               "or a list of those")
            valid = {"_count", "_key"}
            for m in metrics:
                valid.add(m.name)
                if m.kind in ("stats", "extended_stats"):
                    valid.update(
                        f"{m.name}.{n[len(m.name) + 1:]}"
                        for n in m.out_names())
            crits = []
            for o in specs:
                (target, direction), = o.items()
                if direction not in ("asc", "desc"):
                    raise DslError(f"bad order direction {direction!r}")
                if target not in valid:
                    raise DslError(f"order target {target!r} is neither "
                                   "_count, _key, nor a sub-agg name")
                crits.append((target, direction == "asc"))
            if len({t for t, _ in crits}) != len(crits):
                raise DslError("duplicate terms order targets")
            order = tuple(crits)
        if first_kind == "histogram":
            iv = params.get("interval")
            if iv is None:
                raise DslError("histogram needs an 'interval'")
            if isinstance(iv, bool) or not isinstance(iv, (int, float)) \
                    or iv <= 0:
                raise DslError("histogram interval must be a number > 0")
        if first_kind == "date_histogram" \
                and "calendar_interval" not in params \
                and "fixed_interval" not in params:
            raise DslError("date_histogram needs a 'calendar_interval' "
                           "or 'fixed_interval'")
        ranges: tuple = ()
        if first_kind == "range":
            ranges = _ranges(name, params.get("ranges"))
        elif first_kind == "date_range":
            ranges = _date_ranges(name, params.get("ranges"),
                                  params.get("format"))
        elif first_kind == "ip_range":
            ranges = _ip_ranges(name, params.get("ranges"))
        ip_plen = None
        ip_append = False
        if first_kind == "ip_prefix":
            ip_plen = params.get("prefix_length")
            if isinstance(ip_plen, bool) or not isinstance(ip_plen, int) \
                    or not 1 <= ip_plen <= 32:
                raise DslError(f"ip_prefix agg {name!r}: prefix_length "
                               "must be an integer in [1, 32] "
                               "(IPv4 — engine subset)")
            if params.get("is_ipv6", False) is not False:
                raise DslError(f"ip_prefix agg {name!r}: is_ipv6 is "
                               "not supported (engine subset — IPv4 "
                               "dotted-quad fields only)")
            ip_append = params.get("append_prefix_length", False)
            if not isinstance(ip_append, bool):
                raise DslError(f"ip_prefix agg {name!r}: "
                               "append_prefix_length must be a boolean")
        filter_nodes: tuple = ()
        if first_kind in ("filters", "adjacency_matrix"):
            fspec = params.get("filters")
            if not isinstance(fspec, dict) or not fspec:
                raise DslError(f"{first_kind} agg {name!r} needs a "
                               "non-empty 'filters' object")
            filter_nodes = tuple((fname, _node(clause))
                                 for fname, clause in fspec.items())
            if first_kind == "adjacency_matrix" \
                    and any("&" in fname for fname, _ in filter_nodes):
                raise DslError("adjacency_matrix filter names must not "
                               "contain '&' (the intersection separator)")
            if first_kind == "filters" and (
                    params.get("other_bucket")
                    or "other_bucket_key" in params):
                # ES other_bucket (r12): one extra bucket of the docs
                # matching NONE of the named filters — a parse-time
                # desugar to Not(Or(all clauses)); the engine's filters
                # machinery then treats it like any named bucket
                ob = params.get("other_bucket", True)
                if not isinstance(ob, bool):
                    raise DslError("filters other_bucket must be a "
                                   "boolean")
                ob_key = params.get("other_bucket_key", "_other_")
                if not isinstance(ob_key, str) or not ob_key:
                    raise DslError("filters other_bucket_key must be a "
                                   "non-empty string")
                if ob_key in {fname for fname, _ in filter_nodes}:
                    raise DslError(
                        f"filters other_bucket_key {ob_key!r} collides "
                        "with a named filter bucket")
                if ob:
                    filter_nodes += ((ob_key, Not(Or(tuple(
                        n for _, n in filter_nodes)))),)
        mdc = params.get("min_doc_count")
        if mdc is not None and (not isinstance(mdc, int) or mdc < 0):
            raise DslError("min_doc_count must be a non-negative integer")
        offset = params.get("offset")
        if offset is not None:
            if first_kind == "histogram":
                if not isinstance(offset, (int, float)) \
                        or isinstance(offset, bool):
                    raise DslError("histogram offset must be numeric")
                offset = float(offset) % float(params["interval"])
            elif first_kind == "date_histogram":
                # ES date_histogram offset: a signed duration shifting
                # every bucket boundary (e.g. "+6h" → day buckets start
                # at 06:00). Fixed units only, like ES (the offset must
                # be smaller than the calendar unit to be meaningful).
                m = _re.fullmatch(r"([+-]?)(\d+)([smhd])", str(offset))
                if m is None:
                    raise DslError(
                        "date_histogram offset must be ±N(s|m|h|d)")
                mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}
                secs = int(m.group(2)) * mult[m.group(3)]
                offset = float(-secs if m.group(1) == "-" else secs)
            else:
                raise DslError("offset is a histogram/date_histogram "
                               "param")

        tz_named = None
        tz = params.get("time_zone")
        if tz is not None:
            if first_kind != "date_histogram":
                raise DslError("time_zone is a date_histogram param")
            if not isinstance(tz, str) or not tz:
                raise DslError("time_zone must be a non-empty string")
            tzsec = _fixed_tz_seconds(tz)
            if tzsec is None:
                # named IANA zone: the DST-variable offset rules out
                # the effective-offset fold, so the engine truncates in
                # local wall-clock per instant. Combinations that must
                # GENERATE aligned keys outside the data (min_doc_count
                # 0 spans, extended_bounds) typed-reject — fixed
                # offsets cover those; fixed_interval's epoch alignment
                # under a DST-variable zone is engine-ambiguous, so it
                # typed-rejects too (ES resolves it with its own
                # rounding prepare; fixed offsets reproduce it exactly)
                try:
                    from zoneinfo import ZoneInfo
                    ZoneInfo(tz)
                except Exception:
                    raise DslError(f"unknown time_zone {tz!r}")
                if params.get("fixed_interval") is not None:
                    raise DslError(
                        "a named time_zone needs calendar_interval "
                        "(fixed-offset zones work with fixed_interval)")
                if mdc == 0 or "extended_bounds" in params:
                    raise DslError(
                        "a named time_zone cannot combine with "
                        "min_doc_count 0 / extended_bounds (key "
                        "generation needs a fixed offset) — use a "
                        "fixed-offset time_zone")
                tz_named = tz
            elif tzsec:
                # boundary = trunc_zone(ts) + offset, trunc_zone(ts) =
                # trunc(ts + tz) - tz → effective offset = offset - tz
                offset = float(offset or 0.0) - tzsec

        def _inc_exc(key: str):
            raw = params.get(key)
            if raw is None:
                return None
            if first_kind != "terms":
                raise DslError(f"{key} is a terms-agg param")
            if isinstance(raw, str):
                return ("re", raw)
            if isinstance(raw, list) and raw:
                return ("values", tuple(raw))
            if isinstance(raw, dict) and key == "include":
                # ES partitioned terms (r12): walk a huge-cardinality
                # field in disjoint deterministic slices —
                # {"partition": p, "num_partitions": m}. The engine
                # partitioner is pmod(xxhash64(key-as-string), m)
                # (documented constant; ES's own partition hash is
                # likewise engine-internal — the CONTRACT is
                # deterministic + disjoint + complete, pinned by test)
                if set(raw) != {"partition", "num_partitions"}:
                    raise DslError(
                        "terms include partition form needs exactly "
                        "{'partition': p, 'num_partitions': m}")
                p, m = raw["partition"], raw["num_partitions"]
                if not isinstance(p, int) or not isinstance(m, int) \
                        or isinstance(p, bool) or isinstance(m, bool) \
                        or m <= 0 or not 0 <= p < m:
                    raise DslError(
                        "terms include partition needs integers "
                        "0 <= partition < num_partitions")
                return ("partition", p, m)
            raise DslError(f"terms {key} must be a regex string, a "
                           "non-empty value list, or the include "
                           "partition object")

        include = _inc_exc("include")
        exclude = _inc_exc("exclude")
        if top_hits is not None and sub_bucket is not None:
            raise DslError("top_hits is supported on the innermost "
                           "bucket level only")
        if pipelines:
            if sub_bucket is not None:
                raise DslError(
                    "pipeline aggs are supported on the innermost "
                    "bucket level only (declare them inside the "
                    "deepest bucket's aggs)")
            valid_paths = {"_count"} | {
                n for m in metrics for n in m.out_names()}
            for pi, (pn, pk, payload) in enumerate(pipelines):
                if pk == "moving_percentiles":
                    if first_kind not in ("histogram", "date_histogram"):
                        raise DslError(
                            "moving_percentiles needs an ordered "
                            "histogram/date_histogram bucket "
                            "(ES requirement)")
                    mp_path, mp_w, mp_s = payload
                    tgt = next((m for m in metrics
                                if m.name == mp_path
                                and m.kind == "percentiles"), None)
                    if tgt is None:
                        raise DslError(
                            f"moving_percentiles agg {pn!r}: "
                            f"buckets_path {mp_path!r} must name a "
                            "sibling percentiles metric (its field "
                            "and percents drive the source-window "
                            "pass)")
                    pipelines[pi] = (pn, pk, (mp_path, tgt.field,
                                              tgt.percents, mp_w,
                                              mp_s))
                    continue
                if pk == "cumulative_cardinality":
                    if first_kind not in ("histogram", "date_histogram"):
                        raise DslError(
                            "cumulative_cardinality needs an ordered "
                            "histogram/date_histogram bucket "
                            "(ES requirement)")
                    tgt = next((m for m in metrics
                                if m.name == payload
                                and m.kind == "cardinality"), None)
                    if tgt is None:
                        raise DslError(
                            f"cumulative_cardinality agg {pn!r}: "
                            f"buckets_path {payload!r} must name a "
                            "sibling cardinality metric at this level "
                            "(its field drives the first-appearance "
                            "pass)")
                    # rewrite the payload to carry the resolved field
                    pipelines[pi] = (pn, pk, (payload, tgt.field))
                    continue
                if pk in ("cumulative_sum", "derivative",
                          "serial_diff", "moving_fn", "moving_avg"):
                    # sequence aggs need a key-ordered frame (ES
                    # requires histogram parents)
                    if first_kind not in ("histogram", "date_histogram"):
                        raise DslError(
                            f"{pk} needs an ordered histogram/"
                            "date_histogram bucket (ES requirement)")
                    path = payload if isinstance(payload, str) \
                        else payload[0]
                    if path not in valid_paths:
                        raise DslError(f"pipeline agg {pn!r}: unknown "
                                       f"buckets_path {path!r}")
                elif pk == "normalize":
                    # any multi-bucket parent qualifies (ES normalize)
                    if payload[0] not in valid_paths:
                        raise DslError(f"pipeline agg {pn!r}: unknown "
                                       f"buckets_path {payload[0]!r}")
                elif pk in ("bucket_script", "bucket_selector"):
                    for tgt in payload[1].values():
                        if tgt != "_count" and tgt not in valid_paths:
                            raise DslError(
                                f"pipeline agg {pn!r}: unknown "
                                f"buckets_path {tgt!r}")
                else:  # bucket_sort — targets are bucket columns
                    for fld, _asc, _nf in payload[0]:
                        if fld not in valid_paths | {"_key"}:
                            raise DslError(
                                f"bucket_sort {pn!r}: unknown sort "
                                f"target {fld!r}")
        eb = None
        if "extended_bounds" in params:
            ebs = params["extended_bounds"]
            if not isinstance(ebs, dict) \
                    or "min" not in ebs or "max" not in ebs:
                raise DslError("extended_bounds needs {'min': …, 'max': …}")
            eb = (ebs["min"], ebs["max"])
        hb = None
        if "hard_bounds" in params:
            hbs = params["hard_bounds"]
            if not isinstance(hbs, dict) \
                    or "min" not in hbs or "max" not in hbs:
                raise DslError("hard_bounds needs {'min': …, 'max': …}")
            if eb is not None:
                raise DslError("hard_bounds and extended_bounds are "
                               "mutually exclusive (ES contract)")
            # type-validate per parent kind (r12 review finding): a
            # numeric bound on date_histogram would cast as epoch
            # SECONDS where ES means MILLIS — silently empty buckets;
            # reject rather than guess the unit
            for side in ("min", "max"):
                v = hbs[side]
                if first_kind == "histogram":
                    if isinstance(v, bool) \
                            or not isinstance(v, (int, float)):
                        raise DslError(
                            f"histogram hard_bounds {side} must be "
                            "numeric")
                else:  # date_histogram
                    if not isinstance(v, str):
                        raise DslError(
                            f"date_histogram hard_bounds {side} must "
                            "be a date STRING (engine subset — a "
                            "numeric epoch is ambiguous between "
                            "seconds and ES's millis)")
            hb = (hbs["min"], hbs["max"])
        siblings: list[tuple[str, str, str, tuple[float, ...]]] = []
        if sib_raw:
            # sibling aggs aggregate over the TERMINAL (leaf) bucket
            # level's frame; the buckets_path must walk the full chain
            # of level names down to a leaf metric or _count (r6 —
            # previously single-level only)
            chain = [name]
            leaf: Any = None
            b = sub_bucket
            while b is not None and not isinstance(b, tuple):
                chain.append(b.name)
                leaf = b
                b = getattr(b, "sub", None)
            leaf_metrics = metrics if leaf is None else leaf.metrics
            depth = len(chain) - 1
            count_col = "doc_count" if depth == 0 else (
                "sub_doc_count" if depth == 1
                else f"sub{depth}_doc_count")
            sib_valid = {"_count"} | {
                n for m in leaf_metrics for n in m.out_names()}
            want = ">".join(chain)
            for sn, sk, spath, spcts in sib_raw:
                *bkts, metric = spath.split(">")
                if bkts != chain or metric not in sib_valid:
                    raise DslError(
                        f"sibling agg {sn!r}: buckets_path {spath!r} "
                        f"must be '{want}>[_count|leaf metric]'")
                siblings.append(
                    (sn, sk,
                     count_col if metric == "_count" else metric,
                     spcts))
        bsize = params.get("size")
        if bsize is not None and (isinstance(bsize, bool)
                                  or not isinstance(bsize, int)
                                  or bsize < 1):
            # fuzz catch (r14.75): a negative size leaked an
            # AnalysisException out of the bucket limit (ES contract:
            # [size] must be greater than 0)
            raise DslError(f"{first_kind} agg {name!r}: size must be "
                           f"a positive integer, got {bsize!r}")
        return BucketAgg(
            name=name, kind=first_kind,
            field=params.get("field", ""),
            size=bsize,
            interval=params.get("interval"),
            offset=offset,
            include=include,
            exclude=exclude,
            calendar_interval=params.get("calendar_interval"),
            fixed_interval=params.get("fixed_interval"),
            time_zone=tz_named,
            order=order,
            ranges=ranges,
            key_format=(params.get("format")
                        if first_kind == "date_range" else None),
            filter_nodes=filter_nodes,
            missing=params.get("missing"),
            min_doc_count=mdc,
            metrics=metrics,
            top_hits=top_hits,
            pipelines=tuple(pipelines),
            siblings=tuple(siblings),
            extended_bounds=eb,
            hard_bounds=hb,
            precision=ip_plen,
            append_prefix=ip_append,
            sub=sub_bucket)
    # metrics-only request: every entry must be a metric
    return tuple(_metric(n, s) for n, s in entries)


def _node(q: dict[str, Any]) -> Node:
    if not isinstance(q, dict) or len(q) != 1:
        raise DslError(f"query clause must have exactly one key: {q!r}")
    (kind, body), = q.items()
    if kind == "match_all":
        return MatchAll()
    if kind == "match_none":
        return MatchNone()
    if kind == "term":
        field, value = _single(body)
        boost = None
        if isinstance(value, dict):
            _leaf_params("term", value,
                         {"value", "boost", "case_insensitive"})
            boost = value.get("boost")
            value = value.get("value")
        return _boosted(Term(field, _scalar(value)), boost)
    if kind == "terms":
        # ES terms boost rides BESIDE the field key:
        # {"terms": {f: [...], "boost": b}} (r11 — previously a typed
        # "exactly one field" error)
        t_boost = None
        if isinstance(body, dict) and "boost" in body and len(body) == 2:
            t_boost = body["boost"]
            body = {k: v for k, v in body.items() if k != "boost"}
        field, values = _single(body)
        if isinstance(values, dict):
            # ES terms lookup: the list lives in another document
            # ({"index", "id", "path"}, optional "routing" rejected —
            # single-engine, no routing); resolved by the engine before
            # compile (ast.TermsLookup)
            extra = set(values) - {"index", "id", "path"}
            if extra:
                raise DslError(f"terms lookup: unsupported keys "
                               f"{sorted(extra)} (engine subset: "
                               "index/id/path)")
            bad = [k for k in ("index", "path")
                   if not isinstance(values.get(k), str)]
            if not isinstance(values.get("id"), (str, int)) \
                    or isinstance(values.get("id"), bool):
                bad.append("id")
            if bad:
                raise DslError("terms lookup needs 'index'/'path' "
                               "strings and a string-or-int 'id' "
                               f"(missing/bad: {bad})")
            # the beside-the-field boost applies to the lookup form too
            # (r12): the engine's expansion to Or(Term...) inherits it
            # through the Boost wrapper — previously silently dropped
            return _boosted(TermsLookup(field, str(values["index"]),
                                        str(values["id"]),
                                        str(values["path"])), t_boost)
        if not isinstance(values, list):
            raise DslError("terms needs a list or a lookup object")
        if not values:
            # ES: empty terms list is a valid match-no-docs query
            return MatchNone()
        return _boosted(Or(tuple(Term(field, _scalar(v))
                                 for v in values)), t_boost)
    if kind == "match":
        field, value = _single(body)
        fuzziness = None
        boost = None
        operator = "or"
        msm = None
        transpositions = False
        prefix_length = 0
        ztq = "none"
        if isinstance(value, dict):
            extra = set(value) - {"query", "fuzziness", "boost",
                                  "operator", "minimum_should_match",
                                  "fuzzy_transpositions",
                                  "prefix_length", "zero_terms_query"}
            if extra:
                # reject rather than silently drop — a dropped operator
                # changes the match set with no signal (r9)
                raise DslError(f"match: unsupported parameters "
                               f"{sorted(extra)} (engine subset)")
            ztq = str(value.get("zero_terms_query", "none")).lower()
            if ztq not in ("none", "all"):
                raise DslError("match: zero_terms_query must be "
                               "'none' or 'all' (ES contract)")
            fuzziness = value.get("fuzziness")
            # fuzzy modifiers without fuzziness do nothing in ES —
            # the engine rejects the inoperative combination instead
            # (no silent parameter drops)
            if fuzziness is None and ("fuzzy_transpositions" in value
                                      or "prefix_length" in value):
                raise DslError(
                    "match: fuzzy_transpositions/prefix_length are "
                    "inoperative without fuzziness (this engine "
                    "rejects the combination)")
            transpositions = value.get("fuzzy_transpositions", False)
            if not isinstance(transpositions, bool):
                raise DslError("match: fuzzy_transpositions must be "
                               "a boolean")
            prefix_length = value.get("prefix_length", 0)
            if isinstance(prefix_length, bool) \
                    or not isinstance(prefix_length, int) \
                    or prefix_length < 0:
                raise DslError("match: prefix_length must be a "
                               "non-negative integer")
            boost = value.get("boost")
            operator = value.get("operator", "or")
            if operator not in ("or", "and"):
                raise DslError(
                    f"match operator must be or/and, got {operator!r}")
            msm = value.get("minimum_should_match")
            value = value.get("query")
        # match = analyzed OR-of-tokens over one field (AND with
        # `operator: and`); with `fuzziness` each token matches within
        # the edit budget (ES match+fuzziness); `minimum_should_match`
        # floors the count of distinct matching terms (CoveringQuery —
        # the TermsSet machinery, Σ-matched-tf score)
        tokens = str(value).split()
        if not tokens:
            # ES zero_terms_query: empty/whitespace text analyzes to
            # zero tokens → MatchNoDocs by default; 'all' (r11) flips
            # to match_all (the stopword-analyzer escape hatch)
            return MatchAll() if ztq == "all" else MatchNone()
        edits = _fuzziness_edits(fuzziness)
        if msm is not None:
            if operator == "and":
                # ES silently ignores msm under operator=and; the
                # engine rejects the combination instead (no silent
                # parameter drops — documented)
                raise DslError("match: minimum_should_match is "
                               "inoperative with operator 'and' (ES "
                               "ignores it; this engine rejects the "
                               "combination)")
            if edits is not None:
                raise DslError("match: minimum_should_match with "
                               "fuzziness is not supported (engine "
                               "subset — the covering count is over "
                               "exact terms)")
            terms = tuple(dict.fromkeys(t.lower() for t in tokens))
            count = _msm_count(msm, len(terms), "match")
            return _boosted(
                TermsSet(field, terms, msm_expr=str(count)), boost)
        leaves: list[Node] = [
            _fuzzy_node(field, t, edits,
                        transpositions=transpositions,
                        prefix_length=prefix_length)
            if edits is not None
            else Term(field, t)
            for t in tokens]
        node = leaves[0] if len(leaves) == 1 else (
            And(tuple(leaves)) if operator == "and" else Or(tuple(leaves)))
        return _boosted(node, boost)
    if kind == "fuzzy":
        # ES fuzzy query: {"fuzzy": {"f": {"value": "x", "fuzziness": 1}}}
        # (short form {"fuzzy": {"f": "x"}} = AUTO, length-dependent)
        field, value = _single(body)
        fuzziness = None
        boost = None
        transpositions = False
        prefix_length = 0
        if isinstance(value, dict):
            _leaf_params("fuzzy", value,
                         {"value", "fuzziness", "boost", "rewrite",
                          "transpositions", "prefix_length",
                          "max_expansions"})
            # transpositions=true (r11): unrestricted Damerau —
            # adjacent swap = 1 edit (ast.Fuzzy documents the
            # OSA-corner deviation vs Lucene's automaton). The ENGINE
            # default stays false (classic Levenshtein) where ES
            # defaults true — documented deviation, COVERAGE P1''.
            transpositions = value.get("transpositions", False)
            if not isinstance(transpositions, bool):
                raise DslError("fuzzy: transpositions must be a "
                               "boolean")
            prefix_length = value.get("prefix_length", 0)
            if isinstance(prefix_length, bool) \
                    or not isinstance(prefix_length, int) \
                    or prefix_length < 0:
                raise DslError("fuzzy: prefix_length must be a "
                               "non-negative integer")
            if "max_expansions" in value:
                raise DslError(
                    "fuzzy: max_expansions is not supported — the "
                    "engine expands the whole edit-budget "
                    "neighbourhood (a silent cap would shrink the "
                    "match set; engine subset)")
            fuzziness = value.get("fuzziness")
            boost = value.get("boost")
            value = value.get("value")
        edits = _fuzziness_edits(fuzziness)
        # ES fuzzy default fuzziness is AUTO (length-dependent)
        return _boosted(
            _fuzzy_node(field, _scalar(value),
                        (3, 6) if edits is None else edits,
                        transpositions=transpositions,
                        prefix_length=prefix_length),
            boost)
    if kind == "match_phrase":
        # tokens adjacent in order; index-served when a positional index
        # exists (engine superset — the reference's tested subset stops at
        # match, but phrase composes naturally with the same AST).
        # `slop` allows intervening tokens per gap (ast.Phrase docstring).
        field, value = _single(body)
        slop = 0
        boost = None
        ztq = "none"
        if isinstance(value, dict):
            _leaf_params("match_phrase", value,
                         {"query", "slop", "boost", "zero_terms_query"})
            ztq = str(value.get("zero_terms_query", "none")).lower()
            if ztq not in ("none", "all"):
                raise DslError("match_phrase: zero_terms_query must be "
                               "'none' or 'all' (ES contract)")
            slop = int(value.get("slop", 0))
            boost = value.get("boost")
            value = value.get("query")
        if not str(value).split():
            # ES zero_terms_query: an empty analyzed phrase matches NO
            # docs by default; 'all' (r11) flips it to match_all — the
            # stopword-analyzer escape hatch
            return MatchAll() if ztq == "all" else MatchNone()
        return _boosted(Phrase(field, str(value), slop), boost)
    if kind == "terms_set":
        # {"terms_set": {f: {"terms": [...],
        #                    "minimum_should_match_field": g}}} or the
        # _script form (painless arithmetic over doc refs +
        # params.num_terms, substituted with the term count here)
        field, spec = _single(body)
        if not isinstance(spec, dict) \
                or not isinstance(spec.get("terms"), list):
            raise DslError("terms_set needs {'terms': [...]}")
        ts_extra = set(spec) - {"terms", "minimum_should_match_field",
                                "minimum_should_match_script", "boost"}
        if ts_extra:
            raise DslError(f"terms_set: unsupported parameters "
                           f"{sorted(ts_extra)} (engine subset)")
        # lowercase dedupe: token matching is case-insensitive, so
        # "Spark" and "spark" are ONE term on both plan shapes
        terms = tuple(dict.fromkeys(str(t).lower() for t in spec["terms"]))
        if not terms:
            return MatchNone()
        msm_f = spec.get("minimum_should_match_field")
        msm_s = spec.get("minimum_should_match_script")
        if (msm_f is None) == (msm_s is None):
            raise DslError(
                "terms_set needs exactly one of "
                "minimum_should_match_field / "
                "minimum_should_match_script")
        if msm_f is not None:
            # boost now EXECUTES (r11 — previously silently dropped)
            return _boosted(TermsSet(field, terms, str(msm_f), None),
                            spec.get("boost"))
        if isinstance(msm_s, dict):
            msm_s = msm_s.get("source")
        if not isinstance(msm_s, str) or not msm_s.strip():
            raise DslError("minimum_should_match_script needs a source "
                           "string")
        substituted = _re.sub(r"params\.num_terms\b", str(len(terms)),
                              msm_s)
        expr = _compile_doc_script("terms_set", substituted)
        return _boosted(TermsSet(field, terms, None, expr),
                        spec.get("boost"))
    if kind == "intervals":
        # ES intervals query: `match` rule (multi-term, ordered/
        # unordered, max_gaps — width/order semantics in
        # ast.IntervalsMatch; duplicate query terms collapse, documented
        # deviation) plus the combining rules `any_of` (ANY source
        # matches) and positionally-unconstrained `all_of` (EVERY
        # source matches somewhere in the doc — all_of with
        # ordered/max_gaps needs cross-source interval algebra, typed
        # error, documented subset). Combined trees keep the intervals
        # flat-1 score (ConstantScore — the engine's documented
        # intervals scoring deviation).
        field, spec = _single(body)

        def rule_node(rspec: Any) -> Node:
            if not isinstance(rspec, dict) or len(rspec) != 1:
                raise DslError("intervals needs {field: {rule: {...}}}")
            (rule, params), = rspec.items()
            if rule == "match":
                if not isinstance(params, dict) or "query" not in params:
                    raise DslError("intervals match needs {'query': str}")
                tokens = tuple(dict.fromkeys(
                    str(params["query"]).lower().split()))
                if not tokens:
                    return MatchNone()
                mg = params.get("max_gaps", -1)
                if isinstance(mg, bool) or not isinstance(mg, int) \
                        or mg < -1:
                    raise DslError("max_gaps must be an integer >= -1")
                ordered = params.get("ordered", False)
                if not isinstance(ordered, bool):
                    raise DslError("intervals 'ordered' must be a boolean")
                return IntervalsMatch(field, tokens, ordered, mg)
            if rule in ("any_of", "all_of"):
                if not isinstance(params, dict) \
                        or not isinstance(params.get("intervals"), list) \
                        or not params["intervals"]:
                    raise DslError(f"intervals {rule} needs "
                                   "{'intervals': [rule, ...]}")
                if rule == "all_of" and (
                        params.get("ordered") or
                        params.get("max_gaps", -1) != -1):
                    raise DslError(
                        "intervals all_of with ordered/max_gaps needs "
                        "cross-source interval algebra (engine subset: "
                        "positionally unconstrained all_of)")
                subs = tuple(rule_node(r) for r in params["intervals"])
                return Or(subs) if rule == "any_of" else And(subs)
            if rule in ("prefix", "wildcard", "fuzzy"):
                # ES intervals multi-term rules (r11): the rule
                # matches wherever ANY dictionary term the pattern
                # expands to occurs — a one-term interval, the
                # span_multi TermPattern machinery (expanded against
                # the term dictionary pre-compile, ≤1024 clauses).
                # Inside any_of/all_of they compose positionally
                # unconstrained, like the engine's all_of subset.
                # `analyzer`/`use_field` are not supported (typed).
                if not isinstance(params, dict):
                    raise DslError(f"intervals {rule} needs an object")
                key = {"prefix": "prefix", "wildcard": "pattern",
                       "fuzzy": "term"}[rule]
                allowed = {key} | ({"fuzziness"} if rule == "fuzzy"
                                   else set())
                extra = set(params) - allowed
                if extra:
                    raise DslError(
                        f"intervals {rule}: unsupported parameters "
                        f"{sorted(extra)} (engine subset)")
                if key not in params:
                    raise DslError(
                        f"intervals {rule} needs {{{key!r}: str}}")
                val = _scalar(params[key])
                edits = 2
                if rule == "fuzzy":
                    from cassandra_es_index_spark.search.ast import (
                        fuzzy_edits,
                    )
                    e = _fuzziness_edits(params.get("fuzziness"))
                    edits = fuzzy_edits(
                        _fuzzy_node(field, val,
                                    (3, 6) if e is None else e))
                return SpanOr(field, (TermPattern(rule, val, edits),))
            raise DslError(
                f"intervals rule {rule!r} is not supported (engine "
                "rules: match, any_of, all_of, prefix, wildcard, "
                "fuzzy)")

        if not isinstance(spec, dict) or len(spec) != 1:
            raise DslError("intervals needs {field: {rule: {...}}}")
        (rule0, params0), = spec.items()
        node = rule_node(spec)
        if rule0 == "match":
            return _boosted(node, params0.get("boost")
                            if isinstance(params0, dict) else None)
        if isinstance(node, MatchNone):
            return node
        # combined tree: flat-1 intervals score (documented deviation)
        return ConstantScore(node, 1.0)
    if kind == "constant_score":
        cs_extra = set(body) - {"filter", "boost"} \
            if isinstance(body, dict) else set()
        if cs_extra:
            raise DslError(f"constant_score: unsupported parameters "
                           f"{sorted(cs_extra)} (engine subset)")
        if not isinstance(body, dict) or "filter" not in body:
            raise DslError("constant_score needs {'filter': clause}")
        return ConstantScore(_node(body["filter"]),
                             float(body.get("boost", 1.0)))
    if kind == "match_phrase_prefix":
        # phrase whose LAST word matches any token it prefixes (ES
        # match_phrase_prefix). The expansion caps at max_expansions
        # (ES default 50) dictionary terms in term order — the engine
        # rewrites the node to its concrete expansion set at search
        # time when the cap binds (r6; see ast.Phrase)
        field, value = _single(body)
        slop = 0
        boost = None
        me = 50
        if isinstance(value, dict):
            slop = int(value.get("slop", 0))
            boost = value.get("boost")
            me = value.get("max_expansions", 50)
            if not isinstance(me, int) or isinstance(me, bool) or me <= 0:
                raise DslError(
                    "max_expansions must be a positive integer")
            value = value.get("query")
        words = str(value).split()
        if not words:
            raise DslError("match_phrase_prefix needs a non-empty query")
        return _boosted(Phrase(field, str(value), slop, last_prefix=True,
                               max_expansions=me),
                        boost)
    if kind == "dis_max":
        # ES dis_max: best subquery's score + tie_breaker × the rest
        dm_extra = set(body) - {"queries", "tie_breaker", "boost"} \
            if isinstance(body, dict) else set()
        if dm_extra:
            raise DslError(f"dis_max: unsupported parameters "
                           f"{sorted(dm_extra)} (engine subset)")
        if not isinstance(body, dict) \
                or not isinstance(body.get("queries"), list) \
                or not body["queries"]:
            raise DslError("dis_max needs {'queries': [clause, ...]}")
        try:
            tb = float(body.get("tie_breaker", 0.0))
        except (TypeError, ValueError) as e:
            raise DslError(
                f"bad tie_breaker {body.get('tie_breaker')!r}") from e
        if not 0.0 <= tb <= 1.0:
            raise DslError(f"tie_breaker must be in [0,1], got {tb}")
        return _boosted(
            DisMax(tuple(_node(q) for q in body["queries"]), tb),
            body.get("boost"))
    if kind == "script_score":
        # ES standalone script_score query (r11): the script REPLACES
        # the query score (function_score boost_mode=replace) — the
        # home of the dense-vector idiom
        # `cosineSimilarity(params.qv, 'embedding') + 1.0`. `query` is
        # required like ES; min_score is served by the request-level
        # `min_score` (typed pointer, engine subset).
        if not isinstance(body, dict) or "query" not in body \
                or "script" not in body:
            raise DslError(
                "script_score needs {'query': clause, 'script': ...}")
        extra = set(body) - {"query", "script", "boost"}
        if extra:
            raise DslError(
                f"script_score: unsupported parameters {sorted(extra)}"
                " (engine subset — use the request-level min_score "
                "instead of the query-level one)")
        from dataclasses import replace as _dc_replace2
        scorer = _parse_score_fn("script_score",
                                 {"script": body["script"]})
        return _boosted(
            _dc_replace2(scorer, child=_node(body["query"]),
                         boost_mode="replace"),
            body.get("boost"))
    if kind == "function_score":
        # single-function form (field_value_factor / script_score /
        # random_score / gauss/linear/exp) OR the `functions` ARRAY —
        # per-entry filter/weight, score_mode combination, max_boost
        # cap — the production relevance-tuning idiom (r8)
        if not isinstance(body, dict):
            raise DslError("function_score needs an object")
        from dataclasses import replace as _dc_replace

        from cassandra_es_index_spark.search.compile import (
            _BOOST_MODES, _SCORE_MODES,
        )
        boost_mode = str(body.get("boost_mode", "multiply"))
        if boost_mode not in _BOOST_MODES:
            raise DslError(f"unknown boost_mode {boost_mode!r}")
        fns = [k for k in _FS_FN_KEYS if k in body]
        child = _node(body["query"]) if "query" in body else MatchAll()
        if "functions" in body:
            if fns:
                raise DslError(
                    "function_score cannot mix a top-level function "
                    f"({fns[0]!r}) with a 'functions' array")
            arr = body["functions"]
            if not isinstance(arr, list) or not arr:
                raise DslError(
                    "function_score 'functions' needs a non-empty "
                    "array")
            score_mode = str(body.get("score_mode", "multiply"))
            if score_mode not in _SCORE_MODES:
                raise DslError(f"unknown score_mode {score_mode!r}")
            max_boost = body.get("max_boost")
            if max_boost is not None:
                if isinstance(max_boost, bool):
                    raise DslError("max_boost must be numeric")
                try:
                    max_boost = float(max_boost)
                except (TypeError, ValueError) as e:
                    raise DslError(
                        f"bad max_boost {max_boost!r}") from e
            entries = []
            for i, spec in enumerate(arr):
                if not isinstance(spec, dict):
                    raise DslError(f"functions[{i}] must be an object")
                extra = set(spec) - set(_FS_FN_KEYS) \
                    - {"filter", "weight"}
                if extra:
                    raise DslError(
                        f"functions[{i}]: unknown keys {sorted(extra)}")
                flt = _node(spec["filter"]) if "filter" in spec else None
                weight = spec.get("weight")
                if weight is not None:
                    if isinstance(weight, bool):
                        raise DslError(
                            f"functions[{i}] weight must be numeric")
                    try:
                        weight = float(weight)
                    except (TypeError, ValueError) as e:
                        raise DslError(
                            f"bad weight {weight!r}") from e
                fk = [k for k in _FS_FN_KEYS if k in spec]
                if len(fk) > 1:
                    raise DslError(
                        f"functions[{i}] carries more than one "
                        f"function: {fk}")
                scorer = (_parse_score_fn(fk[0], spec[fk[0]])
                          if fk else None)
                if scorer is None and weight is None:
                    raise DslError(
                        f"functions[{i}] needs a function or a "
                        "'weight' (ES: an entry in the functions list "
                        "is missing a function)")
                entries.append(ScoreFunction(flt, weight, scorer))
            return _boosted(
                FunctionScoreArray(child, tuple(entries), score_mode,
                                   boost_mode, max_boost),
                body.get("boost"))
        if len(fns) != 1:
            raise DslError(
                "function_score needs exactly one of field_value_factor/"
                "script_score/random_score/gauss/linear/exp or a "
                f"'functions' array (got {fns or 'none'})")
        scorer = _parse_score_fn(fns[0], body[fns[0]])
        return _boosted(
            _dc_replace(scorer, child=child, boost_mode=boost_mode),
            body.get("boost"))
    if kind == "range":
        field, bounds = _single(body)
        if not isinstance(bounds, dict):
            raise DslError("range needs bounds object")
        # `relation` changes range-field semantics — anything but the
        # default typed-rejects (engine subset). `format` and
        # `time_zone` GRADUATED r14: bounds are literals at parse time,
        # so custom-format bound strings parse and zone-local wall
        # clocks resolve driver-side to concrete UTC instants here —
        # both serving paths (scan pushdown and range index) then see
        # plain typed bounds.
        _leaf_params("range", bounds,
                     {"gte", "gt", "lte", "lt", "boost", "relation",
                      "time_zone", "format"})
        if bounds.get("relation", "intersects") != "intersects":
            raise DslError("range: only relation 'intersects' is "
                           "supported (engine subset — scalar fields)")
        lo = bounds.get("gte", bounds.get("gt"))
        hi = bounds.get("lte", bounds.get("lt"))
        if "format" in bounds:
            lo, hi = _apply_range_format(bounds["format"], lo, hi)
        if "time_zone" in bounds:
            lo, hi = _apply_range_time_zone(bounds["time_zone"], lo, hi)
        return _boosted(Range(
            field,
            None if lo is None else _scalar(lo),
            None if hi is None else _scalar(hi),
            include_lo="gte" in bounds or "gt" not in bounds,
            include_hi="lte" in bounds or "lt" not in bounds,
        ), bounds.get("boost"))
    if kind == "prefix":
        # served from token-sorted postings as a LIKE range when an index
        # exists — the reference's own headline query class (`body:cassan*`,
        # ref README.md:179) in DSL form. `rewrite` only selects ES's
        # internal scoring strategy (the match set is unchanged) — the
        # engine has ONE documented scoring convention, so it is
        # accepted as a no-op.
        field, value = _single(body)
        boost = None
        if isinstance(value, dict):
            _leaf_params("prefix", value,
                         {"value", "boost", "case_insensitive",
                          "rewrite"})
            boost = value.get("boost")
            value = value.get("value")
        return _boosted(Wildcard(field, f"{value}*"), boost)
    if kind == "wildcard":
        field, value = _single(body)
        boost = None
        if isinstance(value, dict):
            _leaf_params("wildcard", value,
                         {"value", "wildcard", "boost",
                          "case_insensitive", "rewrite"})
            boost = value.get("boost")
            value = value.get("value", value.get("wildcard"))
        return _boosted(Wildcard(field, str(value)), boost)
    if kind == "regexp":
        # ES regexp query: TERM-anchored (the pattern must match a whole
        # lowercased token), like Lucene's RegexpQuery over the term
        # dictionary
        field, value = _single(body)
        boost = None
        if isinstance(value, dict):
            # flags select Lucene regexp OPERATORS (the engine executes
            # JAVA regex — documented deviation), so only the ALL
            # default passes; max_determinized_states is a safety knob
            # with no match-set effect (no-op)
            _leaf_params("regexp", value,
                         {"value", "boost", "case_insensitive", "flags",
                          "max_determinized_states", "rewrite"})
            if value.get("flags", "ALL") != "ALL":
                raise DslError("regexp: only flags 'ALL' is supported "
                               "(engine executes Java regex — "
                               "documented deviation)")
            boost = value.get("boost")
            value = value.get("value")
        return _boosted(Regexp(field, str(value)), boost)
    if kind == "multi_match":
        # per-field match clauses combined by `type` — the FULL ES
        # type set (r11): "best_fields" (the DEFAULT, matching ES —
        # DisMax: best branch + tie_breaker × rest), "most_fields"
        # (Σ of per-field branch scores, the Or convention),
        # "cross_fields" (term-centric: the token grouping flips
        # field-major → token-major, each token must appear in ≥1
        # field under `operator: and`; score = Σ over tokens of the
        # per-field tf sum — documented deviation from ES's blended
        # term statistics, same match set), "phrase"/"phrase_prefix"
        # (a match_phrase(_prefix) per field under a DisMax — ES's
        # best_fields-like behavior; `slop`/`max_expansions` pass
        # through), and "bool_prefix" (a match_bool_prefix per field,
        # scores combined like most_fields — the ES-documented scoring
        # for this type). `operator: and` requires every token (per
        # field for best/most/bool_prefix, in any field for
        # cross_fields); `minimum_should_match` (r11) lands on each
        # per-field covering (best/most) or the token-group Should
        # gate (cross_fields).
        if not isinstance(body, dict) or "query" not in body \
                or not isinstance(body.get("fields"), list) \
                or not body["fields"]:
            raise DslError(
                "multi_match needs {'query': str, 'fields': [...]}")
        extra = set(body) - {"query", "fields", "fuzziness", "boost",
                             "type", "tie_breaker", "operator",
                             "minimum_should_match", "slop",
                             "max_expansions", "zero_terms_query"}
        if extra:
            raise DslError(f"multi_match: unsupported parameters "
                           f"{sorted(extra)} (engine subset)")
        mm_ztq = str(body.get("zero_terms_query", "none")).lower()
        if mm_ztq not in ("none", "all"):
            raise DslError("multi_match: zero_terms_query must be "
                           "'none' or 'all' (ES contract)")
        mm_type = body.get("type", "best_fields")
        if mm_type not in ("most_fields", "best_fields", "cross_fields",
                           "phrase", "phrase_prefix", "bool_prefix"):
            raise DslError("multi_match type must be most_fields/"
                           "best_fields/cross_fields/phrase/"
                           f"phrase_prefix/bool_prefix, got "
                           f"{mm_type!r}")
        tie = body.get("tie_breaker", 0.0)
        if isinstance(tie, bool) or not isinstance(tie, (int, float)) \
                or not 0.0 <= tie <= 1.0:
            raise DslError("multi_match tie_breaker must be a number "
                           "in [0, 1]")
        phrase_like = mm_type in ("phrase", "phrase_prefix")
        if mm_type not in ("best_fields", "phrase", "phrase_prefix") \
                and "tie_breaker" in body:
            raise DslError("multi_match tie_breaker applies to "
                           "best_fields only")
        operator = body.get("operator", "or")
        if operator not in ("or", "and"):
            raise DslError(
                f"multi_match operator must be or/and, got {operator!r}")
        if phrase_like:
            # ES silently ignores operator/minimum_should_match for the
            # phrase types; the engine rejects instead (no silent
            # parameter drops — the r9 match-operator lesson)
            for bad in ("operator", "minimum_should_match",
                        "fuzziness"):
                if bad in body:
                    raise DslError(
                        f"multi_match {bad} does not apply to the "
                        f"{mm_type} type (ES ignores it; this engine "
                        "rejects the combination)")
        if "slop" in body and not phrase_like:
            raise DslError("multi_match slop applies to phrase/"
                           "phrase_prefix only")
        if "max_expansions" in body and mm_type != "phrase_prefix":
            raise DslError("multi_match max_expansions applies to "
                           "phrase_prefix only")
        slop = body.get("slop", 0)
        if isinstance(slop, bool) or not isinstance(slop, int) \
                or slop < 0:
            raise DslError("multi_match slop must be a non-negative "
                           "integer")
        me = body.get("max_expansions", 50)
        if isinstance(me, bool) or not isinstance(me, int) or me <= 0:
            raise DslError("multi_match max_expansions must be a "
                           "positive integer")
        edits = _fuzziness_edits(body.get("fuzziness"))
        if mm_type in ("cross_fields", "bool_prefix") \
                and edits is not None:
            raise DslError(f"multi_match {mm_type} does not support "
                           "fuzziness (engine subset)")
        msm = body.get("minimum_should_match")
        if msm is not None:
            if operator == "and":
                raise DslError("multi_match: minimum_should_match is "
                               "inoperative with operator 'and' (ES "
                               "ignores it; this engine rejects the "
                               "combination)")
            if edits is not None:
                raise DslError("multi_match: minimum_should_match "
                               "with fuzziness is not supported "
                               "(engine subset — the covering count "
                               "is over exact terms)")
            if mm_type == "bool_prefix":
                raise DslError("multi_match bool_prefix does not "
                               "support minimum_should_match (engine "
                               "subset)")
        tokens = str(body["query"]).split()
        if not tokens:
            # zero analyzed tokens → MatchNoDocs; 'all' flips to
            # match_all (zero_terms_query, r11 — same as match)
            return MatchAll() if mm_ztq == "all" else MatchNone()
        fields: list[tuple[str, float | None]] = []
        for f in body["fields"]:
            fboost = None
            if "^" in f:
                f, _, fb = f.partition("^")
                try:
                    fboost = float(fb)
                except ValueError as e:
                    raise DslError(
                        f"bad multi_match field boost {fb!r}") from e
            fields.append((f, fboost))
        if phrase_like:
            # ES: phrase / phrase_prefix behave like best_fields — a
            # match_phrase(_prefix) per field under a DisMax
            qtext = str(body["query"])
            branches = [
                _boosted(Phrase(f, qtext, slop,
                                last_prefix=(mm_type == "phrase_prefix"),
                                max_expansions=me), fboost)
                for f, fboost in fields]
            node: Node = branches[0] if len(branches) == 1 \
                else DisMax(tuple(branches), tie_breaker=float(tie))
            return _boosted(node, body.get("boost"))
        if mm_type == "bool_prefix":
            # ES: a match_bool_prefix per field, scores combined like
            # most_fields (Σ branch scores — the ES-documented scoring
            # for this type)
            branches = []
            for f, fboost in fields:
                leaves = [Term(f, t) for t in tokens[:-1]]
                leaves.append(Wildcard(f, tokens[-1] + "*"))
                br = leaves[0] if len(leaves) == 1 else (
                    And(tuple(leaves)) if operator == "and"
                    else Or(tuple(leaves)))
                branches.append(_boosted(br, fboost))
            node = branches[0] if len(branches) == 1 \
                else Or(tuple(branches))
            return _boosted(node, body.get("boost"))
        if mm_type == "cross_fields":
            # token-major: one group per TOKEN, each an OR over the
            # fields (the token matches in any of them); groups
            # combine And/Or by `operator`. With minimum_should_match
            # (r11) the groups become a Should gated on the count of
            # matching DISTINCT-token groups — the token-major twin of
            # match's covering count.
            if msm is not None:
                tokens = list(dict.fromkeys(t.lower() for t in tokens))
            groups: list[Node] = []
            for t in tokens:
                leaves = [_boosted(Term(f, t), fboost)
                          for f, fboost in fields]
                groups.append(leaves[0] if len(leaves) == 1
                              else Or(tuple(leaves)))
            if msm is not None and len(groups) > 1:
                count = _msm_count(msm, len(groups), "multi_match")
                return _boosted(Should(tuple(groups), min_count=count),
                                body.get("boost"))
            node: Node = groups[0] if len(groups) == 1 else (
                And(tuple(groups)) if operator == "and"
                else Or(tuple(groups)))
            return _boosted(node, body.get("boost"))
        branches: list[Node] = []
        for f, fboost in fields:
            if msm is not None:
                # ES passes minimum_should_match into each per-field
                # match query — the same CoveringQuery the match leaf
                # compiles (TermsSet machinery, index-servable)
                terms = tuple(dict.fromkeys(t.lower() for t in tokens))
                count = _msm_count(msm, len(terms), "multi_match")
                branches.append(_boosted(
                    TermsSet(f, terms, msm_expr=str(count)), fboost))
                continue
            leaves = [
                _fuzzy_node(f, t, edits) if edits is not None
                else Term(f, t)
                for t in tokens]
            branch = leaves[0] if len(leaves) == 1 else (
                And(tuple(leaves)) if operator == "and"
                else Or(tuple(leaves)))
            branches.append(_boosted(branch, fboost))
        if len(branches) == 1:
            node = branches[0]
        elif mm_type == "best_fields":
            node = DisMax(tuple(branches), tie_breaker=float(tie))
        else:
            node = Or(tuple(branches))
        return _boosted(node, body.get("boost"))
    if kind == "ids":
        if not isinstance(body, dict) or not isinstance(body.get("values"), list):
            raise DslError("ids needs {'values': [...]}")
        extra = set(body) - {"values", "boost"}
        if extra:
            raise DslError(f"ids: unsupported parameters "
                           f"{sorted(extra)} (engine subset)")
        # boost now EXECUTES (r11 — previously silently dropped)
        return _boosted(Ids(tuple(str(v) for v in body["values"])),
                        body.get("boost"))
    if kind == "exists":
        if not isinstance(body, dict) or "field" not in body:
            raise DslError("exists needs {'field': name}")
        extra = set(body) - {"field", "boost"}
        if extra:
            raise DslError(f"exists: unsupported parameters "
                           f"{sorted(extra)} (engine subset)")
        # boost now EXECUTES (r11 — previously silently dropped)
        return _boosted(Exists(body["field"]), body.get("boost"))
    if kind == "bool":
        if not isinstance(body, dict):
            raise DslError("bool needs an object")
        extra = set(body) - {"must", "filter", "should", "must_not",
                             "minimum_should_match", "boost"}
        if extra:
            raise DslError(f"bool: unsupported parameters "
                           f"{sorted(extra)} (engine subset)")
        parts: list[Node] = []
        for sub in _as_list(body.get("must")):
            parts.append(_node(sub))
        for sub in _as_list(body.get("filter")):
            # filter context: required but scoreless, like ES
            parts.append(Scoreless(_node(sub)))
        should = [_node(sub) for sub in _as_list(body.get("should"))]
        msm = body.get("minimum_should_match")
        if msm is not None and not should:
            raise DslError("bool: minimum_should_match needs 'should' "
                           "clauses")
        if should:
            if msm is not None:
                # explicit msm gates ≥ n should clauses, beside
                # must/filter or alone; score = Σ matching clauses (r9).
                # A sub-1 resolved floor (negative forms, r10) means
                # fully-optional shoulds beside must/filter (ES msm=0)
                # but still gates at ≥1 when should stands alone
                # (Lucene: a pure-should bool needs one match).
                n = _msm_count(msm, len(should), "bool", clamp=False)
                if n >= 1:
                    parts.append(Should(tuple(should), min_count=n))
                elif parts:
                    parts.append(Should(tuple(should)))
                else:
                    parts.append(should[0] if len(should) == 1
                                 else Or(tuple(should)))
            elif parts:
                # must/filter present → should is optional, score-only
                # (ES minimum_should_match=0 in that case)
                parts.append(Should(tuple(should)))
            else:
                # should alone → at least one must match
                parts.append(should[0] if len(should) == 1 else Or(tuple(should)))
        for sub in _as_list(body.get("must_not")):
            parts.append(Not(_node(sub)))
        if not parts:
            return MatchAll()
        node = parts[0] if len(parts) == 1 else And(tuple(parts))
        return _boosted(node, body.get("boost"))
    if kind == "knn":
        # ES 8.12+ knn QUERY kind (vs the top-level knn SECTION): a
        # vector search usable as an ordinary bool clause — in should
        # it adds similarity to the score, in must/filter it gates to
        # the candidate pool. Data-driven (ast.KnnClause): the engine
        # resolves the top-num_candidates docs pre-compile (IVF-served
        # when an index exists, exact cosine otherwise) into a
        # ScoredIds literal. Engine defaults num_candidates to 100
        # when neither it nor k is given (documented — ES derives it
        # from k).
        if not isinstance(body, dict):
            raise DslError("knn query needs an object body")
        extra = set(body) - {"field", "query_vector", "num_candidates",
                             "k", "filter", "similarity", "boost"}
        if extra:
            raise DslError(f"knn query: unsupported parameters "
                           f"{sorted(extra)} (engine subset)")
        fld = body.get("field")
        if not isinstance(fld, str):
            raise DslError("knn query needs a 'field' string")
        vec = body.get("query_vector")
        if not isinstance(vec, list) or not vec or not all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                for x in vec):
            raise DslError(
                "knn query needs a non-empty numeric 'query_vector'")
        kk = body.get("k")
        if kk is not None and (isinstance(kk, bool)
                               or not isinstance(kk, int) or kk < 1):
            raise DslError("knn query k must be a positive integer")
        nc = body.get("num_candidates",
                      kk if kk is not None else 100)
        if isinstance(nc, bool) or not isinstance(nc, int) \
                or not 1 <= nc <= 10000:
            raise DslError("knn query num_candidates must be an "
                           "integer in [1, 10000] (the ES ceiling)")
        if kk is not None and kk > nc:
            raise DslError("knn query k cannot exceed num_candidates")
        sim = body.get("similarity")
        if sim is not None and (isinstance(sim, bool)
                                or not isinstance(sim, (int, float))):
            raise DslError("knn query similarity must be a number")
        fnode: Node | None = None
        if "filter" in body:
            parts = tuple(_node(f) for f in _as_list(body["filter"]))
            if not parts:
                raise DslError("knn query filter cannot be empty")
            fnode = parts[0] if len(parts) == 1 \
                else And(tuple(Scoreless(p) for p in parts))
        return _boosted(
            KnnClause(fld, tuple(float(x) for x in vec),
                      num_candidates=nc, k=kk, filter_node=fnode,
                      similarity=None if sim is None else float(sim)),
            body.get("boost"))
    if kind == "wrapper":
        # ES wrapper query: base64-encoded JSON query, decoded and parsed
        import base64 as _b64
        if not isinstance(body, dict) or "query" not in body:
            raise DslError("wrapper needs {'query': base64-string}")
        try:
            decoded = _b64.b64decode(str(body["query"])).decode("utf-8")
            inner = json.loads(decoded)
        except Exception as e:  # noqa: BLE001 — malformed payloads
            raise DslError(f"wrapper query is not valid base64 JSON: "
                           f"{e}") from e
        return _node(inner)
    if kind == "pinned":
        # ES pinned query, desugared onto the existing algebra: pinned
        # doc i becomes constant_score(ids([i]), BASE - i) and the whole
        # request is a dis_max over those branches plus the organic
        # query — pinned docs outrank any organic score, in listed
        # order, and organic-only docs keep their scores. Requires the
        # synthesized `_id` document field, like the ids query.
        pn_extra = set(body) - {"ids", "organic"} \
            if isinstance(body, dict) else set()
        if pn_extra:
            raise DslError(f"pinned: unsupported parameters "
                           f"{sorted(pn_extra)} (engine subset — "
                           "docs-form pins and boost are not "
                           "supported)")
        if not isinstance(body, dict) \
                or not isinstance(body.get("ids"), list) \
                or not body["ids"] or "organic" not in body:
            raise DslError(
                "pinned needs {'ids': [...], 'organic': clause}")
        base = float(1 << 30)
        branches: list[Node] = [
            ConstantScore(Ids((str(v),)), base - k)
            for k, v in enumerate(body["ids"])]
        branches.append(_node(body["organic"]))
        return DisMax(tuple(branches), 0.0)
    if kind == "span_near":
        # N span clause slots (r10 — Lucene SpanNearQuery is N-ary and
        # the reference forwards it verbatim, ElasticIndex.java:663-667;
        # the r9 engine accepted exactly two span_term clauses). Each
        # slot is span_term / span_or / span_multi (_span_clause_terms
        # — span_multi slots carry TermPattern, expanded against the
        # term dictionary before compile); slop bounds the non-matched
        # positions inside the match window (max − min + 1 − N ≤ slop),
        # in_order defaults true like Lucene.
        if not isinstance(body, dict) \
                or not isinstance(body.get("clauses"), list) \
                or len(body["clauses"]) < 2:
            raise DslError("span_near needs {'clauses': [two or more "
                           "span clauses]}")
        extra = set(body) - {"clauses", "slop", "in_order", "boost"}
        if extra:
            raise DslError(f"span_near: unsupported parameters "
                           f"{sorted(extra)} (engine subset)")
        if len(body["clauses"]) > 8:
            raise DslError(
                "span_near supports at most 8 clauses (engine subset "
                "— the tuple-count plan nests one evaluation level "
                "per clause)")
        fields = set()
        slots: list[tuple] = []
        slot_fields: list = []
        for cl in body["clauses"]:
            # span_field_masking (r12): the clause REPORTS `field` (so
            # the mixed-field combination is accepted) while its
            # positions come from the inner query's own field
            # (Lucene FieldMaskingSpanQuery). Engine subset (typed):
            # masking wraps a whole span_near clause only, and the
            # inner query is span_term/span_or (no span_multi — its
            # term-dictionary expansion would run against the wrong
            # field's dictionary).
            if isinstance(cl, dict) and len(cl) == 1 \
                    and "span_field_masking" in cl:
                m = cl["span_field_masking"]
                if not isinstance(m, dict) or "query" not in m \
                        or "field" not in m:
                    raise DslError(
                        "span_field_masking needs {'query': span "
                        "clause, 'field': masked-as field}")
                m_extra = set(m) - {"query", "field", "boost"}
                if m_extra:
                    raise DslError(
                        f"span_field_masking: unsupported parameters "
                        f"{sorted(m_extra)} (engine subset)")
                src_fld, terms = _span_clause_terms(m["query"])
                if any(not isinstance(t, str) for t in terms):
                    raise DslError(
                        "span_field_masking does not wrap span_multi "
                        "(the pattern would expand against the wrong "
                        "field's term dictionary — documented subset)")
                fields.add(str(m["field"]))
                slots.append(terms)
                slot_fields.append(src_fld)
                continue
            fld, terms = _span_clause_terms(cl)
            fields.add(fld)
            slots.append(terms)
            slot_fields.append(None)
        if len(fields) != 1:
            raise DslError("span_near clauses must share one field "
                           "(wrap cross-field clauses in "
                           "span_field_masking)")
        slop = body.get("slop", 0)
        if isinstance(slop, bool) or not isinstance(slop, int) \
                or slop < 0:
            raise DslError("span_near slop must be a non-negative integer")
        in_order = body.get("in_order", True)
        if not isinstance(in_order, bool):
            raise DslError("span_near in_order must be a boolean")
        masked = any(f is not None for f in slot_fields)
        first = second = ""
        if not masked and len(slots) == 2 and all(
                len(s) == 1 and isinstance(s[0], str) for s in slots):
            first, second = slots[0][0], slots[1][0]
        return _boosted(
            SpanNear(next(iter(fields)), first, second, slop,
                     in_order, tuple(slots),
                     tuple(slot_fields) if masked else ()),
            body.get("boost"))
    if kind == "span_term":
        # standalone span_term (r12): a span of one token ≡ the term's
        # own positions — ES scores it like a term query (Σ tf, which
        # IS the position count). The one-element SpanOr keeps the
        # span-family score convention and the index-served plan.
        st_boost = None
        if isinstance(body, dict) and len(body) == 1:
            inner = next(iter(body.values()))
            if isinstance(inner, dict):
                st_extra = set(inner) - {"value", "boost"}
                if st_extra:
                    raise DslError(
                        f"span_term: unsupported parameters "
                        f"{sorted(st_extra)} (engine subset)")
                st_boost = inner.get("boost")
        fld, terms = _span_clause_terms({"span_term": body})
        return _boosted(SpanOr(fld, terms), st_boost)
    if kind == "span_or":
        # union of single-token span_term clauses, one shared field —
        # score = count of matching positions (Σ tf)
        so_extra = set(body) - {"clauses", "boost"} \
            if isinstance(body, dict) else set()
        if so_extra:
            raise DslError(f"span_or: unsupported parameters "
                           f"{sorted(so_extra)} (engine subset)")
        fld, terms = _span_clause_terms({"span_or": body})
        return _boosted(SpanOr(fld, terms), body.get("boost")
                        if isinstance(body, dict) else None)
    if kind == "span_multi":
        # standalone span_multi ≡ span_or over the pattern's dictionary
        # expansion (Σ matching positions — Lucene
        # SpanMultiTermQueryWrapper's union-of-spans frequency)
        fld, terms = _span_clause_terms({"span_multi": body})
        return SpanOr(fld, terms)
    if kind == "span_first":
        # spans of `match` ending at position ≤ end (Lucene
        # SpanPositionRangeQuery(match, 0, end))
        sf_extra = set(body) - {"match", "end", "boost"} \
            if isinstance(body, dict) else set()
        if sf_extra:
            raise DslError(f"span_first: unsupported parameters "
                           f"{sorted(sf_extra)} (engine subset)")
        if not isinstance(body, dict) or "match" not in body \
                or "end" not in body:
            raise DslError(
                "span_first needs {'match': span clause, 'end': int}")
        end = body["end"]
        if isinstance(end, bool) or not isinstance(end, int) or end < 0:
            raise DslError("span_first end must be a non-negative "
                           "integer")
        fld, terms = _span_clause_terms(body["match"])
        return _boosted(SpanFirst(fld, terms, end), body.get("boost"))
    if kind == "span_not":
        # include spans not within pre/post tokens of an exclude span;
        # `dist` sets both (ES parity)
        sn_extra = set(body) - {"include", "exclude", "pre", "post",
                                "dist", "boost"} \
            if isinstance(body, dict) else set()
        if sn_extra:
            raise DslError(f"span_not: unsupported parameters "
                           f"{sorted(sn_extra)} (engine subset)")
        if not isinstance(body, dict) or "include" not in body \
                or "exclude" not in body:
            raise DslError("span_not needs {'include': span clause, "
                           "'exclude': span clause}")
        if "dist" in body and ("pre" in body or "post" in body):
            raise DslError("span_not takes dist OR pre/post, not both")
        pre = body.get("dist", body.get("pre", 0))
        post = body.get("dist", body.get("post", 0))
        for nm, v in (("pre", pre), ("post", post)):
            if isinstance(v, bool) or not isinstance(v, int) or v < 0:
                raise DslError(
                    f"span_not {nm} must be a non-negative integer")
        ifld, inc = _span_clause_terms(body["include"])
        efld, exc = _span_clause_terms(body["exclude"])
        if ifld != efld:
            raise DslError("span_not include/exclude must share one "
                           "field")
        return _boosted(SpanNot(ifld, inc, exc, pre, post),
                        body.get("boost"))
    if kind in ("span_containing", "span_within"):
        # big spans that contain a little span / little spans inside a
        # big span (r9; N-ary big r11). Engine subset: little is
        # single-token (span_term/span_or); big is single-token OR a
        # span_near of 2–8 clauses with union slots (span_term /
        # span_or / span_multi — the same shapes span_near itself
        # takes) — Lucene's common usage (phrase-contains-term).
        # Score = count of qualifying spans.
        if not isinstance(body, dict) or "big" not in body \
                or "little" not in body:
            raise DslError(f"{kind} needs {{'big': span clause, "
                           "'little': span clause}")
        lfld, little = _span_clause_terms(body["little"])
        big = body["big"]
        if isinstance(big, dict) and len(big) == 1 \
                and "span_near" in big:
            near = _node(big)
            # a `boost` inside the big clause would come back wrapped —
            # reject it (boost the whole query instead)
            if not isinstance(near, SpanNear):
                raise DslError(f"{kind} big span_near does not take "
                               "boost (boost the whole query)")
            bfld = near.field
            big_terms: tuple = ()
            big_near = (near.slots(), near.slop, near.in_order)
        else:
            bfld, big_terms = _span_clause_terms(big)
            big_near = None
        if bfld != lfld:
            raise DslError(f"{kind} big/little must share one field")
        return _boosted(
            SpanContaining(bfld, big_terms, big_near, little,
                           within=(kind == "span_within")),
            body.get("boost"))
    if kind == "geo_distance":
        # {"geo_distance": {"distance": "200km", field: point}} —
        # haversine filter on the struct<lat,lon> geo_point column
        if not isinstance(body, dict) or "distance" not in body:
            raise DslError(
                "geo_distance needs {'distance': d, field: point}")
        from cassandra_es_index_spark.functions.geo import (
            distance_meters,
        )
        try:
            meters = distance_meters(body["distance"])
        except ValueError as e:
            raise DslError(str(e)) from e
        g_boost = body.get("boost")
        rest = {k: v for k, v in body.items()
                if k not in ("distance", "boost")}
        if len(rest) != 1:
            raise DslError("geo_distance needs exactly one field")
        (gfield, point), = rest.items()
        lat, lon = _geo_point(point, "geo_distance")
        return _boosted(GeoDistance(str(gfield), lat, lon, meters),
                        g_boost)
    if kind == "geo_bounding_box":
        # ES boost rides beside the field key (r11)
        gb_boost = None
        if isinstance(body, dict) and "boost" in body and len(body) == 2:
            gb_boost = body["boost"]
            body = {k: v for k, v in body.items() if k != "boost"}
        if not isinstance(body, dict) or len(body) != 1:
            raise DslError(
                "geo_bounding_box needs {field: {'top_left': point, "
                "'bottom_right': point}}")
        (gfield, box), = body.items()
        if not isinstance(box, dict) \
                or set(box) != {"top_left", "bottom_right"}:
            raise DslError("geo_bounding_box needs top_left and "
                           "bottom_right corners")
        top, left = _geo_point(box["top_left"], "geo_bounding_box")
        bottom, right = _geo_point(box["bottom_right"],
                                   "geo_bounding_box")
        if bottom > top:
            raise DslError("geo_bounding_box bottom above top")
        # left > right is a box CROSSING the antimeridian (ES
        # semantics, r9): the lon predicate becomes lon ≥ left OR
        # lon ≤ right — handled by the compiler and the covering-cell
        # enumeration alike
        return _boosted(GeoBoundingBox(str(gfield), top, left,
                                       bottom, right), gb_boost)
    if kind == "boosting":
        # ES boosting query: positive gates, negative demotes by
        # negative_boost (must be in [0, 1) per ES)
        bo_extra = set(body) - {"positive", "negative",
                                "negative_boost", "boost"} \
            if isinstance(body, dict) else set()
        if bo_extra:
            raise DslError(f"boosting: unsupported parameters "
                           f"{sorted(bo_extra)} (engine subset)")
        if not isinstance(body, dict) or "positive" not in body \
                or "negative" not in body:
            raise DslError(
                "boosting needs {'positive': clause, 'negative': clause}")
        try:
            nb = float(body.get("negative_boost", 0.5))
        except (TypeError, ValueError) as e:
            raise DslError("negative_boost must be numeric") from e
        if not 0.0 <= nb < 1.0:
            raise DslError(f"negative_boost must be in [0, 1), got {nb}")
        return _boosted(
            Boosting(_node(body["positive"]), _node(body["negative"]),
                     nb), body.get("boost"))
    if kind == "nested":
        # ES nested query over an array<struct> column: the inner query
        # evaluates per element (same-element semantics), score_mode
        # combines matching elements' scores (ES default avg)
        ne_extra = set(body) - {"path", "query", "score_mode",
                                "boost", "inner_hits"} \
            if isinstance(body, dict) else set()
        if ne_extra:
            raise DslError(f"nested: unsupported parameters "
                           f"{sorted(ne_extra)} (engine subset)")
        if not isinstance(body, dict) or "path" not in body \
                or "query" not in body:
            raise DslError("nested needs {'path': name, 'query': clause}")
        if "inner_hits" in body:
            raise DslError(
                "nested inner_hits is supported on a TOP-LEVEL nested "
                "query only (documented engine subset)")
        mode = str(body.get("score_mode", "avg"))
        if mode not in ("avg", "sum", "min", "max", "none"):
            raise DslError(f"unknown nested score_mode {mode!r}")
        return _boosted(
            Nested(str(body["path"]), _node(body["query"]), mode),
            body.get("boost"))
    if kind == "has_child":
        # ES has_child (join-field parent/child): matches PARENT docs
        # whose children — per a relation registered with
        # SearchEngine.register_relation, the engine's analogue of the
        # ES join-field mapping — satisfy the inner query. Data-driven:
        # the engine resolves it before compile (_expand_join_nodes).
        hc_extra = set(body) - {"type", "query", "score_mode",
                                "min_children", "max_children", "boost",
                                "ignore_unmapped", "inner_hits"} \
            if isinstance(body, dict) else set()
        if hc_extra:
            raise DslError(f"has_child: unsupported parameters "
                           f"{sorted(hc_extra)} (engine subset)")
        if not isinstance(body, dict) or "type" not in body \
                or "query" not in body:
            raise DslError(
                "has_child needs {'type': child_relation, 'query': "
                "clause}")
        if body.get("ignore_unmapped"):
            raise DslError(
                "has_child ignore_unmapped: true is not supported — an "
                "unregistered relation is a typed error by design "
                "(the everything-is-a-typed-error contract)")
        hc_mode = str(body.get("score_mode", "none"))
        if hc_mode not in ("none", "min", "max", "sum", "avg"):
            raise DslError(f"unknown has_child score_mode {hc_mode!r}")
        hc_min = body.get("min_children", 1)
        hc_max = body.get("max_children")
        for label, v in (("min_children", hc_min),
                         ("max_children", hc_max)):
            if v is not None and (isinstance(v, bool)
                                  or not isinstance(v, int) or v < 0):
                raise DslError(
                    f"has_child {label} must be a non-negative "
                    f"integer, got {v!r}")
        if hc_max is not None and hc_max < hc_min:
            raise DslError(
                f"has_child max_children ({hc_max}) < min_children "
                f"({hc_min}) matches nothing — typed error, not a "
                "silent MatchNone")
        hc_ih = _join_inner_size("has_child", body.get("inner_hits"))
        return _boosted(
            HasChild(str(body["type"]), _node(body["query"]), hc_mode,
                     int(hc_min),
                     int(hc_max) if hc_max is not None else None,
                     hc_ih[0] if hc_ih else None,
                     hc_ih[1] if hc_ih else None),
            body.get("boost"))
    if kind == "has_parent":
        # ES has_parent: matches CHILD docs whose parent satisfies the
        # inner query; score: true hands children their parent's score
        hp_extra = set(body) - {"parent_type", "query", "score",
                                "boost", "ignore_unmapped",
                                "inner_hits"} \
            if isinstance(body, dict) else set()
        if hp_extra:
            raise DslError(f"has_parent: unsupported parameters "
                           f"{sorted(hp_extra)} (engine subset)")
        if not isinstance(body, dict) or "parent_type" not in body \
                or "query" not in body:
            raise DslError(
                "has_parent needs {'parent_type': parent_relation, "
                "'query': clause}")
        if body.get("ignore_unmapped"):
            raise DslError(
                "has_parent ignore_unmapped: true is not supported — "
                "an unregistered relation is a typed error by design")
        hp_score = body.get("score", False)
        if not isinstance(hp_score, bool):
            raise DslError(
                f"has_parent score must be a boolean, got {hp_score!r}")
        hp_ih = _join_inner_size("has_parent", body.get("inner_hits"))
        return _boosted(
            HasParent(str(body["parent_type"]), _node(body["query"]),
                      hp_score,
                      hp_ih[0] if hp_ih else None,
                      hp_ih[1] if hp_ih else None),
            body.get("boost"))
    if kind == "parent_id":
        # ES parent_id: child docs of relation `type` whose parent key
        # equals `id` — engine-resolved to an equality on the child
        # foreign-key column (no join needed)
        pid_extra = set(body) - {"type", "id", "boost",
                                 "ignore_unmapped"} \
            if isinstance(body, dict) else set()
        if pid_extra:
            raise DslError(f"parent_id: unsupported parameters "
                           f"{sorted(pid_extra)}")
        if not isinstance(body, dict) or "type" not in body \
                or "id" not in body:
            raise DslError("parent_id needs {'type': child_relation, "
                           "'id': parent_id}")
        if body.get("ignore_unmapped"):
            raise DslError(
                "parent_id ignore_unmapped: true is not supported — "
                "an unregistered relation is a typed error by design")
        if isinstance(body["id"], (dict, list)):
            raise DslError("parent_id id must be a scalar")
        return _boosted(ParentIdQ(str(body["type"]), str(body["id"])),
                        body.get("boost"))
    if kind == "query_string":
        # full Lucene grammar via the query_string parser; r11 adds
        # the field-binding parameters (previously any extra key was
        # SILENTLY DROPPED — the r9 no-silent-drops lesson):
        # `default_field` rebinds the parse's default-field leaves;
        # `fields` (with `^boost` syntax) runs the parse per field
        # under a DisMax + `tie_breaker` (ES's multi-field
        # query_string combination). `default_operator: and` (r11)
        # requires every juxtaposed clause (query_string._regroup_and);
        # mixing explicit OR with juxtaposition under the AND default
        # typed-rejects — Lucene's classic-QP regroup of that
        # combination is inconsistent, parenthesize instead.
        if not isinstance(body, dict) or "query" not in body:
            raise DslError("query_string needs {'query': str}")
        if not isinstance(body["query"], str):
            # fuzz catch (r14.75): a non-string query leaked a bare
            # TypeError out of the Lucene parser
            raise DslError(
                f"query_string query must be a string, got "
                f"{type(body['query']).__name__}")
        extra = set(body) - {"query", "default_field", "fields",
                             "default_operator", "tie_breaker",
                             "boost"}
        if extra:
            raise DslError(f"query_string: unsupported parameters "
                           f"{sorted(extra)} (engine subset)")
        default_op = str(body.get("default_operator", "or")).lower()
        if default_op not in ("or", "and"):
            raise DslError(f"bad default_operator {default_op!r}")
        if "default_field" in body and "fields" in body:
            raise DslError("query_string takes default_field OR "
                           "fields, not both")
        tie = body.get("tie_breaker", 0.0)
        if isinstance(tie, bool) or not isinstance(tie, (int, float)) \
                or not 0.0 <= tie <= 1.0:
            raise DslError("query_string tie_breaker must be a number "
                           "in [0, 1]")
        if "tie_breaker" in body and "fields" not in body:
            raise DslError("query_string tie_breaker applies to the "
                           "'fields' form only")
        try:
            parsed = qs.parse(body["query"], default_operator=default_op)
        except qs.QueryParseError as e:
            # the mixed OR/juxtaposition AND-default rejection (and any
            # other parse error) surfaces as the DSL's typed error class
            raise DslError(f"query_string: {e}") from e
        if "fields" in body:
            flist = body["fields"]
            if not isinstance(flist, list) or not flist:
                raise DslError("query_string fields must be a "
                               "non-empty list")
            branches: list[Node] = []
            for f in flist:
                fboost = None
                if "^" in f:
                    f, _, fb = f.partition("^")
                    try:
                        fboost = float(fb)
                    except ValueError as e:
                        raise DslError(
                            f"bad query_string field boost {fb!r}"
                        ) from e
                branches.append(_boosted(
                    _bind_default_field(parsed, str(f)), fboost))
            node = branches[0] if len(branches) == 1 \
                else DisMax(tuple(branches), tie_breaker=float(tie))
            return _boosted(node, body.get("boost"))
        if "default_field" in body:
            parsed = _bind_default_field(parsed,
                                         str(body["default_field"]))
        return _boosted(parsed, body.get("boost"))
    if kind == "simple_query_string":
        if not isinstance(body, dict) or "query" not in body:
            raise DslError("simple_query_string needs {'query': str}")
        default_op = str(body.get("default_operator", "or")).lower()
        if default_op not in ("or", "and"):
            raise DslError(f"bad default_operator {default_op!r}")
        fields = body.get("fields")
        if fields is not None and (not isinstance(fields, list)
                                   or not fields):
            raise DslError("simple_query_string fields must be a "
                           "non-empty list")
        text = str(body["query"])
        if fields is None:
            node = _sqs_parse(text, None, default_op)
            return _boosted(node, body.get("boost"))
        branches = []
        for f in fields:
            fboost = None
            if "^" in f:
                f, _, fb = f.partition("^")
                try:
                    fboost = float(fb)
                except ValueError as e:
                    raise DslError(
                        f"bad simple_query_string field boost {fb!r}") from e
            branches.append(_boosted(_sqs_parse(text, f, default_op),
                                     fboost))
        node = branches[0] if len(branches) == 1 else Or(tuple(branches))
        return _boosted(node, body.get("boost"))
    if kind == "match_bool_prefix":
        # ES match_bool_prefix: analyzed terms as a bool query whose
        # LAST term is a prefix — the search-as-you-type primitive.
        # Desugars to Term leaves + a trailing-star Wildcard (exactly
        # the prefix-served shape); `operator` joins with and/or (ES
        # default or). Empty analyzed input → MatchNoDocs, like match.
        field, value = _single(body)
        op = "or"
        boost = None
        if isinstance(value, dict):
            extra = set(value) - {"query", "operator", "boost"}
            if extra:
                raise DslError(
                    f"unknown match_bool_prefix keys {sorted(extra)}")
            op = str(value.get("operator", "or")).lower()
            boost = value.get("boost")
            value = value.get("query")
        if op not in ("or", "and"):
            raise DslError(f"bad match_bool_prefix operator {op!r}")
        tokens = str(value).split()
        if not tokens:
            return MatchNone()
        leaves: list[Node] = [Term(field, t) for t in tokens[:-1]]
        leaves.append(Wildcard(field, tokens[-1] + "*"))
        node = leaves[0] if len(leaves) == 1 else \
            (Or if op == "or" else And)(tuple(leaves))
        return _boosted(node, boost)
    if kind == "combined_fields":
        # ES combined_fields: the query terms match across several
        # fields AS IF they were one combined field. Desugar: per term,
        # an Or over the fields (the engine's Or sums matching branch
        # tfs — the term-centric combined-field frequency; DEVIATION:
        # no BM25F weighting, the engine's documented tf-count scoring
        # applies); `operator` joins the per-term groups (ES default
        # or). Per-field `^boost` syntax scales that field's
        # contribution, like multi_match.
        if not isinstance(body, dict) or "query" not in body \
                or "fields" not in body:
            raise DslError("combined_fields needs {'query': str, "
                           "'fields': [...]}")
        extra = set(body) - {"query", "fields", "operator", "boost"}
        if extra:
            raise DslError(
                f"unknown combined_fields keys {sorted(extra)}")
        fields = body["fields"]
        if not isinstance(fields, list) or not fields:
            raise DslError("combined_fields fields must be a "
                           "non-empty list")
        op = str(body.get("operator", "or")).lower()
        if op not in ("or", "and"):
            raise DslError(f"bad combined_fields operator {op!r}")
        parsed_fields: list[tuple[str, float | None]] = []
        for f in fields:
            fboost = None
            f = str(f)
            if "^" in f:
                f, _, fb = f.partition("^")
                try:
                    fboost = float(fb)
                except ValueError as e:
                    raise DslError(
                        f"bad combined_fields field boost {fb!r}") from e
            parsed_fields.append((f, fboost))
        tokens = str(body["query"]).split()
        if not tokens:
            return MatchNone()
        groups: list[Node] = []
        for t in tokens:
            branches = [_boosted(Term(f, t), fb)
                        for f, fb in parsed_fields]
            groups.append(branches[0] if len(branches) == 1
                          else Or(tuple(branches)))
        node = groups[0] if len(groups) == 1 else \
            (Or if op == "or" else And)(tuple(groups))
        return _boosted(node, body.get("boost"))
    if kind == "more_like_this":
        # {"more_like_this": {"fields": [f], "like": "text" |
        #  [... , {"_id": id}], "max_query_terms": 25, ...}} —
        # data-driven: resolved engine-side (ast.MoreLikeThis)
        if not isinstance(body, dict) or "like" not in body:
            raise DslError("more_like_this needs {'like': ...}")
        extra = set(body) - {"fields", "like", "unlike",
                             "max_query_terms",
                             "min_term_freq", "min_doc_freq",
                             "max_doc_freq", "minimum_should_match",
                             "include", "boost"}
        if extra:
            raise DslError(
                f"unknown more_like_this keys {sorted(extra)}")
        fields = body.get("fields")
        fld = None
        if fields is not None:
            if not isinstance(fields, list) or not fields:
                raise DslError("more_like_this fields must be a "
                               "non-empty list")
            if len(fields) > 1:
                raise DslError("more_like_this supports exactly one "
                               "field (documented engine subset)")
            fld = str(fields[0])
        likes = body["like"]
        if not isinstance(likes, list):
            likes = [likes]
        texts: list[str] = []
        ids: list[str] = []
        for lk in likes:
            if isinstance(lk, str):
                texts.append(lk)
            elif isinstance(lk, dict) and "_id" in lk:
                ids.append(str(lk["_id"]))
            else:
                raise DslError(
                    "more_like_this like entries must be strings or "
                    f"{{'_id': id}} objects, got {lk!r}")
        if not texts and not ids:
            raise DslError("more_like_this needs at least one like "
                           "text or doc id")
        unlikes = body.get("unlike", [])
        if not isinstance(unlikes, list):
            unlikes = [unlikes]
        un_texts: list[str] = []
        un_ids: list[str] = []
        for lk in unlikes:
            if isinstance(lk, str):
                un_texts.append(lk)
            elif isinstance(lk, dict) and "_id" in lk:
                un_ids.append(str(lk["_id"]))
            else:
                raise DslError(
                    "more_like_this unlike entries must be strings or "
                    f"{{'_id': id}} objects, got {lk!r}")

        def _posint(nm: str, dflt: int) -> int:
            v = body.get(nm, dflt)
            if isinstance(v, bool) or not isinstance(v, int) or v < 1:
                raise DslError(f"more_like_this {nm} must be a "
                               "positive integer")
            return v

        mdf = body.get("max_doc_freq")
        if mdf is not None and (isinstance(mdf, bool)
                                or not isinstance(mdf, int) or mdf < 1):
            raise DslError("more_like_this max_doc_freq must be a "
                           "positive integer")
        msm = body.get("minimum_should_match", "30%")
        # grammar check at parse time (widened r10: ints, integer
        # strings incl. negative, ±N% — the _msm_count subset); the
        # count resolves against the picked term set at expansion time
        _msm_count(msm, 100, "more_like_this")
        inc = body.get("include", False)
        if not isinstance(inc, bool):
            raise DslError("more_like_this include must be a boolean")
        return _boosted(
            MoreLikeThis(fld, tuple(texts), tuple(ids),
                         unlike_texts=tuple(un_texts),
                         unlike_ids=tuple(un_ids),
                         max_query_terms=_posint("max_query_terms", 25),
                         min_term_freq=_posint("min_term_freq", 2),
                         min_doc_freq=_posint("min_doc_freq", 5),
                         max_doc_freq=mdf,
                         minimum_should_match=str(msm).strip(),
                         include=inc),
            body.get("boost"))
    if kind == "geo_shape":
        # {"geo_shape": {field: {"shape": {...}, "relation": ...}}} —
        # r10 subset (VERDICT r9 missing #2; the reference forwards it
        # verbatim, ElasticIndex.java:663-667): envelope / polygon
        # (single outer ring) / point shapes with relation
        # `intersects`. The corpus geo field is a POINT, so intersects
        # ≡ point-in-shape and every shape desugars onto the existing
        # bbox/polygon algebra — inheriting their scan predicates AND
        # the covering-cell index-served plan (shape_to_node). r11
        # adds `indexed_shape` (the query shape lives in another
        # document — ES's shared-geofence pattern): parsed to the
        # data-driven GeoShapeLookup node, resolved by the engine
        # before compile like terms lookup.
        if not isinstance(body, dict) or len(body) != 1:
            raise DslError("geo_shape needs {field: {'shape': {...}}}")
        (gfield, spec), = body.items()
        if not isinstance(spec, dict):
            raise DslError("geo_shape needs {'shape': {...}}")
        extra = set(spec) - {"shape", "indexed_shape", "relation",
                             "boost"}
        if extra:
            raise DslError(
                f"geo_shape: unsupported parameters {sorted(extra)} "
                "(engine subset)")
        gs_boost = spec.get("boost")
        if ("shape" in spec) == ("indexed_shape" in spec):
            raise DslError("geo_shape needs exactly one of 'shape' "
                           "(inline) or 'indexed_shape' (reference)")
        rel = str(spec.get("relation", "intersects")).lower()
        if rel not in ("intersects", "within", "disjoint"):
            # `contains` would need shape-typed documents (a point can
            # only contain a point); the engine's corpus geo field is
            # a point
            raise DslError(
                f"geo_shape relation {rel!r} is not supported (engine "
                "subset: intersects / within / disjoint — the corpus "
                "field is a point, so contains needs shape-typed "
                "documents)")
        if "indexed_shape" in spec:
            ref = spec["indexed_shape"]
            if not isinstance(ref, dict):
                raise DslError(
                    "geo_shape indexed_shape needs {'index': ..., "
                    "'id': ..., 'path': ...}")
            iextra = set(ref) - {"index", "id", "path"}
            if iextra:
                # `routing` is a shard-addressing hint with no engine
                # analogue — typed, not silently dropped
                raise DslError(
                    "geo_shape indexed_shape: unsupported parameters "
                    f"{sorted(iextra)} (engine subset: index/id/path)")
            missing = {"index", "id", "path"} - set(ref)
            if missing:
                raise DslError(
                    f"geo_shape indexed_shape needs {sorted(missing)}")
            return _boosted(
                GeoShapeLookup(str(gfield), str(ref["index"]),
                               str(ref["id"]), str(ref["path"]),
                               relation=rel), gs_boost)
        return _boosted(shape_to_node(str(gfield), spec["shape"], rel),
                        gs_boost)
    if kind == "geo_polygon":
        # {"geo_polygon": {field: {"points": [...]}}} — even-odd
        # point-in-polygon (ast.GeoPolygon); ES boost rides beside
        # the field key (r11)
        gp_boost = None
        if isinstance(body, dict) and "boost" in body and len(body) == 2:
            gp_boost = body["boost"]
            body = {k: v for k, v in body.items() if k != "boost"}
        if not isinstance(body, dict) or len(body) != 1:
            raise DslError(
                "geo_polygon needs {field: {'points': [...]}}")
        (gfield, spec), = body.items()
        if not isinstance(spec, dict) \
                or not isinstance(spec.get("points"), list):
            raise DslError("geo_polygon needs {'points': [...]}")
        pts = [_geo_point(p, "geo_polygon") for p in spec["points"]]
        # an explicitly closed ring (first == last) is accepted and
        # unclosed — the edge walk closes implicitly
        if len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        if len(pts) < 3:
            raise DslError("geo_polygon needs at least 3 distinct "
                           "points")
        return _boosted(GeoPolygon(str(gfield), tuple(pts)), gp_boost)
    if kind == "geo_grid":
        # ES geo_grid query (r12): docs in ONE named grid cell —
        # {"geo_grid": {field: {"geohash": key}}} or {"geotile":
        # "z/x/y"}. Compiles to the SAME key functions as the grid
        # aggregations, so a bucket key fed back as a query returns
        # exactly that bucket's documents. geohex typed-rejects (no
        # H3 library in the engine subset); boost rides beside the
        # field key like the other geo kinds.
        gg_boost = None
        if isinstance(body, dict) and "boost" in body and len(body) == 2:
            gg_boost = body["boost"]
            body = {k: v for k, v in body.items() if k != "boost"}
        if not isinstance(body, dict) or len(body) != 1:
            raise DslError("geo_grid needs {field: {'geohash': key} "
                           "or {'geotile': 'z/x/y'}}")
        (gfield, spec), = body.items()
        if not isinstance(spec, dict) or len(spec) != 1:
            raise DslError("geo_grid needs exactly one of "
                           "geohash/geotile (geohex: engine subset)")
        (gkind, gkey), = spec.items()
        if gkind == "geohash":
            key = str(gkey).lower()
            if not 1 <= len(key) <= 12 \
                    or any(c not in "0123456789bcdefghjkmnpqrstuvwxyz"
                           for c in key):
                raise DslError(
                    f"geo_grid geohash key {gkey!r} must be 1-12 "
                    "base32 geohash characters")
            return _boosted(GeoGridCell(str(gfield), "geohash", key),
                            gg_boost)
        if gkind == "geotile":
            parts = str(gkey).split("/")
            try:
                z, x, y = (int(p) for p in parts)
            except (ValueError, TypeError):
                z = -1
            if len(parts) != 3 or not 0 <= z <= 29 \
                    or not 0 <= x < (1 << z) or not 0 <= y < (1 << z):
                raise DslError(
                    f"geo_grid geotile key {gkey!r} must be 'z/x/y' "
                    "with 0 <= z <= 29 and x, y tile indices in "
                    "range")
            return _boosted(
                GeoGridCell(str(gfield), "geotile", f"{z}/{x}/{y}"),
                gg_boost)
        raise DslError(
            f"geo_grid kind {gkind!r} is not supported (engine "
            "subset: geohash / geotile — geohex needs an H3 library)")
    if kind == "percolate":
        # ES percolate query (r12): run against a STORED-QUERIES
        # table, match the rows whose query matches the inline
        # document. {"percolate": {"field": <query column>,
        # "document": {...}}} — `documents` (multi-doc slots) and the
        # stored-document reference form (index/id) typed-reject
        # (engine subset); `name` is ES's multi-percolate disambiguator
        # and meaningless for a single clause.
        if not isinstance(body, dict):
            raise DslError("percolate needs {'field': ..., "
                           "'document': {...}}")
        extra = set(body) - {"field", "document", "documents"}
        if extra:
            raise DslError(
                f"percolate: unsupported parameters {sorted(extra)} "
                "(engine subset: field + inline document(s) — "
                "stored-document references are not implemented)")
        pfield = body.get("field")
        if not isinstance(pfield, str) or not pfield:
            raise DslError("percolate needs a 'field' naming the "
                           "stored-query column")
        if ("document" in body) == ("documents" in body):
            raise DslError("percolate takes exactly one of "
                           "'document' or 'documents'")
        if "document" in body:
            pdocs = [body["document"]]
        else:
            pdocs = body["documents"]
            if not isinstance(pdocs, list) or not pdocs:
                raise DslError("percolate 'documents' must be a "
                               "non-empty array of objects")
            if len(pdocs) > 100:
                raise DslError(
                    "percolate 'documents' exceeds 100 slots (engine "
                    "subset — every slot multiplies the one-pass "
                    "evaluation; batch through percolate())")
        for d in pdocs:
            if not isinstance(d, dict) or not d:
                raise DslError("each percolate document must be a "
                               "non-empty object")
        keysets = {tuple(sorted(d)) for d in pdocs}
        if len(keysets) > 1:
            raise DslError(
                "percolate 'documents' slots must share one key set "
                "(engine subset — one inferred schema per pass)")
        # value TYPES must also agree per key (r12 review finding):
        # mixed types would fail schema inference at execution with
        # an opaque merge error instead of a typed one here
        if len(pdocs) > 1:
            for k in pdocs[0]:
                kinds = {("num" if isinstance(d[k], (int, float))
                          and not isinstance(d[k], bool)
                          else type(d[k]).__name__)
                         for d in pdocs if d[k] is not None}
                if len(kinds) > 1:
                    raise DslError(
                        f"percolate 'documents' field {k!r} mixes "
                        f"value types {sorted(kinds)} across slots "
                        "(one inferred schema per pass)")
        return PercolateDoc(pfield, tuple(
            json.dumps(d, sort_keys=True) for d in pdocs))
    if kind == "script":
        # ES script query (filter context): {"script": {"script":
        # {"source": "doc['f'].value > 5"}}} — the painless
        # arithmetic/comparison subset, compiled to ONE SQL boolean
        # expression. ES requires filter scripts to return a boolean;
        # the engine enforces it at parse: the translated expression
        # must carry a comparison (arithmetic-only → typed error).
        spec = body.get("script") if isinstance(body, dict) else None
        if isinstance(spec, dict):
            spec = spec.get("source")
        if not isinstance(spec, str) or not spec.strip():
            raise DslError("script query needs {'script': {'source': "
                           "str}}")
        expr = _compile_doc_script("script", spec)
        if not _re.search(r"(?:<=|>=|!=|<|>|=)", expr):
            raise DslError(
                "script query must return a boolean — the script "
                f"{spec!r} is arithmetic-only (no comparison)")
        refs = tuple(dict.fromkeys(_re.findall(
            r"doc\['([A-Za-z_][\w.]*)'\]\.value", spec)))
        return _boosted(ScriptFilter(expr, refs, spec),
                        body.get("boost") if isinstance(body, dict)
                        else None)
    if kind == "sparse_vector":
        # ES sparse_vector with an INLINE query_vector (r12): score =
        # Σ_token query_weight × stored_weight over the matched tokens.
        # Engine subset: the field is an analyzed text column whose
        # stored weight for a token IS its tf (the engine's scoring
        # model — ES stores learned weights in a rank_features field;
        # with tf weights the query desugars EXACTLY to a weighted
        # bool/should of term clauses, so every plan path — postings
        # serve, bool composition, paging, aggs — composes for free).
        # Tokens must be pre-analyzed (lowercase), like ES's (the model
        # emits vocabulary tokens; term clauses don't analyze).
        # inference_id/query (server-side ML) and prune/pruning_config
        # typed-reject.
        if not isinstance(body, dict):
            raise DslError("sparse_vector must be an object")
        extra = set(body) - {"field", "query_vector", "boost"}
        if extra:
            raise DslError(
                f"sparse_vector: unsupported keys {sorted(extra)} "
                "(engine subset: inline query_vector only — "
                "inference_id/query need a model; prune changes the "
                "match set silently)")
        fld = body.get("field")
        if not isinstance(fld, str) or not fld:
            raise DslError("sparse_vector needs a 'field' string")
        qv = body.get("query_vector")
        if not isinstance(qv, dict) or not qv:
            raise DslError("sparse_vector needs a non-empty "
                           "'query_vector' object of token: weight")
        if len(qv) > 1024:
            raise DslError(
                "sparse_vector query_vector exceeds 1024 tokens "
                "(the engine's max-clause ceiling)")
        shoulds = []
        for tok, w in qv.items():
            if not isinstance(tok, str) or not tok:
                raise DslError("sparse_vector query_vector tokens "
                               "must be non-empty strings")
            if isinstance(w, bool) or not isinstance(w, (int, float)) \
                    or w <= 0:
                raise DslError(
                    f"sparse_vector weight for token {tok!r} must be "
                    "a positive number")
            shoulds.append(_boosted(Term(fld, tok), float(w)))
        node = Or(tuple(shoulds)) if len(shoulds) > 1 else shoulds[0]
        sv_boost = body.get("boost")
        if sv_boost is not None and (
                isinstance(sv_boost, bool)
                or not isinstance(sv_boost, (int, float))
                or sv_boost <= 0):
            raise DslError("sparse_vector boost must be a positive "
                           "number")
        return _boosted(node, sv_boost)
    if kind == "rank_feature":
        # {"rank_feature": {"field": f, "saturation": {"pivot": 8}}} —
        # positive-feature matching + saturating score (ast.RankFeature)
        if not isinstance(body, dict) or "field" not in body:
            raise DslError("rank_feature needs {'field': name}")
        fns = [k for k in ("saturation", "log", "sigmoid", "linear")
               if k in body]
        if len(fns) > 1:
            raise DslError(
                f"rank_feature takes at most one function, got {fns}")
        extra = set(body) - {"field", "boost"} - set(fns)
        if extra:
            raise DslError(f"unknown rank_feature keys {sorted(extra)}")
        try:
            boost = float(body.get("boost", 1.0))
        except (TypeError, ValueError) as e:
            raise DslError("rank_feature boost must be numeric") from e
        fkind = fns[0] if fns else "saturation"
        spec = body.get(fkind, {})
        if not isinstance(spec, dict):
            raise DslError(f"rank_feature {fkind} must be an object")

        def _pos(name: str, required: bool = True,
                 minimum: float = 0.0) -> float | None:
            v = spec.get(name)
            if v is None:
                if required:
                    raise DslError(
                        f"rank_feature {fkind} needs {name!r} (the "
                        "engine does not derive index-statistic "
                        "defaults — documented deviation)")
                return None
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise DslError(f"rank_feature {name} must be numeric")
            bad = (float(v) <= 0.0) if minimum == 0.0 \
                else (float(v) < minimum)
            if bad:
                raise DslError(
                    f"rank_feature {name} must be "
                    f"{'> 0' if minimum == 0.0 else f'>= {minimum}'}")
            return float(v)

        pivot = exponent = scaling = None
        if fkind == "saturation":
            if set(spec) - {"pivot"}:
                raise DslError("rank_feature saturation takes only "
                               "'pivot'")
            pivot = _pos("pivot")
        elif fkind == "log":
            if set(spec) - {"scaling_factor"}:
                raise DslError("rank_feature log takes only "
                               "'scaling_factor'")
            scaling = _pos("scaling_factor", minimum=1.0)
        elif fkind == "sigmoid":
            if set(spec) - {"pivot", "exponent"}:
                raise DslError("rank_feature sigmoid takes only "
                               "'pivot' and 'exponent'")
            pivot = _pos("pivot")
            exponent = _pos("exponent")
        else:  # linear
            if spec:
                raise DslError("rank_feature linear takes no "
                               "parameters")
        return RankFeature(str(body["field"]), fkind, pivot, exponent,
                           scaling, boost)
    if kind == "distance_feature":
        # {"distance_feature": {"field": f, "origin": ..., "pivot":
        # "7d"}} — closeness scoring on date / geo_point fields
        # (ast.DistanceFeature). Origin/pivot stay raw here; the
        # engine's date-math pass (date fields) or the compiler (geo
        # fields) resolves them by the field's dtype.
        if not isinstance(body, dict) or "field" not in body \
                or "origin" not in body or "pivot" not in body:
            raise DslError("distance_feature needs {'field': name, "
                           "'origin': ..., 'pivot': ...}")
        extra = set(body) - {"field", "origin", "pivot", "boost"}
        if extra:
            raise DslError(
                f"unknown distance_feature keys {sorted(extra)}")
        try:
            boost = float(body.get("boost", 1.0))
        except (TypeError, ValueError) as e:
            raise DslError(
                "distance_feature boost must be numeric") from e
        origin: object = body["origin"]
        if isinstance(origin, bool):
            raise DslError("distance_feature origin must be a date, "
                           "date-math string, or geo point")
        if isinstance(origin, (list, dict)):
            # geo literal point forms ([lon, lat], {lat, lon})
            origin = _geo_point(origin, "distance_feature")
        elif isinstance(origin, (int, float)):
            origin = float(origin)
        elif isinstance(origin, str):
            # "lat,lon" string point parses eagerly; date strings stay
            # raw for the engine's date-math pass
            if _re.fullmatch(r"\s*-?\d+(\.\d+)?\s*,\s*-?\d+(\.\d+)?\s*",
                             origin):
                origin = _geo_point(origin, "distance_feature")
        else:
            raise DslError("distance_feature origin must be a date, "
                           "date-math string, or geo point")
        pivot: object = body["pivot"]
        if isinstance(pivot, bool) or not isinstance(pivot,
                                                     (str, int, float)):
            raise DslError("distance_feature pivot must be a duration "
                           "or distance string")
        return DistanceFeature(str(body["field"]), origin, pivot, boost)
    raise DslError(f"unsupported DSL clause {kind!r}")


def _sqs_parse(text: str, field: str | None, default_op: str) -> Node:
    """ES ``simple_query_string`` parser — the LENIENT grammar: ``+``
    (AND), ``|`` (OR), ``-`` (negate next clause), ``"..."``~N phrases,
    trailing-``*`` prefixes, ``word~N`` fuzziness, ``( )`` grouping;
    juxtaposed clauses join with ``default_operator``. AND binds tighter
    than OR (Lucene SimpleQueryParser precedence). Lenient by contract:
    malformed syntax never raises — an unmatched quote drops, an
    unmatched ``(`` opens a group to end-of-input, stray operators are
    skipped, and an all-empty query is ``match_none`` (the ES builder's
    MatchNoDocsQuery rewrite for empty query text). DEVIATION
    (documented): a mid-word hyphen splits into a negation (tokens are
    ``\\s()|+-"``-delimited), and Lucene's left-assoc operator chaining
    is approximated by the AND-over-OR precedence grammar."""
    toks: list[tuple[str, Any]] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c in "()|+-":
            toks.append((c, c))
            i += 1
            continue
        if c == '"':
            j = text.find('"', i + 1)
            if j == -1:
                i += 1      # lenient: unmatched quote drops
                continue
            phrase = text[i + 1:j]
            i = j + 1
            slop = 0
            m = _re.match(r"~(\d+)", text[i:])
            if m:
                slop = int(m.group(1))
                i += m.end()
            if phrase.strip():
                toks.append(("phrase", (phrase, slop)))
            continue
        m = _re.match(r'[^\s()|+\-"]+', text[i:])
        toks.append(("word", m.group(0)))
        i += m.end()

    pos = 0

    def peek() -> str | None:
        return toks[pos][0] if pos < len(toks) else None

    def leaf(kind: str, val: Any) -> Node:
        if kind == "phrase":
            return Phrase(field, val[0], val[1])
        w = val
        m = _re.fullmatch(r"(.+)~(\d+)", w)
        if m:
            return Fuzzy(field, m.group(1), int(m.group(2)))
        if w.endswith("~"):
            return Fuzzy(field, w[:-1], None)   # AUTO budget
        if ("*" in w or "?" in w) and w.strip("*?"):
            return Wildcard(field, w)
        return Term(field, w)

    def parse_unary() -> Node | None:
        nonlocal pos
        while peek() in ("+", "|"):     # stray infix operator — skip
            pos += 1
        k = peek()
        if k is None or k == ")":
            return None
        if k == "-":
            pos += 1
            inner = parse_unary()
            return None if inner is None else Not(inner)
        if k == "(":
            pos += 1
            inner = parse_or()
            if peek() == ")":
                pos += 1
            return inner
        kind, val = toks[pos]
        pos += 1
        return leaf(kind, val)

    def parse_and() -> Node | None:
        nonlocal pos
        parts: list[Node] = []
        first = parse_unary()
        if first is not None:
            parts.append(first)
        while True:
            k = peek()
            if k == "+":
                pos += 1
                nxt = parse_unary()
                if nxt is not None:
                    parts.append(nxt)
                continue
            if k in ("word", "phrase", "(", "-") and default_op == "and":
                nxt = parse_unary()
                if nxt is not None:
                    parts.append(nxt)
                continue
            break
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def parse_or() -> Node | None:
        nonlocal pos
        parts: list[Node] = []
        first = parse_and()
        if first is not None:
            parts.append(first)
        while True:
            k = peek()
            if k == "|":
                pos += 1
            elif k in ("word", "phrase", "(", "-") and default_op == "or":
                pass
            else:
                break
            nxt = parse_and()
            if nxt is not None:
                parts.append(nxt)
        if not parts:
            return None
        # Lucene SQP: a negated clause is a MUST_NOT on the ENCLOSING
        # group, never a disjunct — `foo | -bar` matches foo AND NOT bar
        positives = [p for p in parts if not isinstance(p, Not)]
        negs = [p for p in parts if isinstance(p, Not)]
        core = (positives[0] if len(positives) == 1
                else Or(tuple(positives)) if positives else MatchAll())
        if negs:
            return And((core, *negs))
        return core

    node = parse_or()
    # pure-negation queries (`-foo`) gate like ES: everything except the
    # match set; wrap with match_all so the And has a positive driver
    if isinstance(node, Not):
        node = And((MatchAll(), node))
    # ES SimpleQueryStringQueryBuilder: empty/all-dropped query text
    # rewrites to MatchNoDocsQuery, not match_all
    return node if node is not None else MatchNone()


def _geo_point(raw: Any, ctx: str) -> tuple[float, float]:
    """(lat, lon) of an ES geo point literal — ``{"lat", "lon"}``
    object, ``[lon, lat]`` array (GeoJSON order, ES parity), or
    ``"lat,lon"`` string — range-checked."""
    if isinstance(raw, dict) and set(raw) == {"lat", "lon"}:
        lat, lon = raw["lat"], raw["lon"]
    elif isinstance(raw, list) and len(raw) == 2:
        lon, lat = raw
    elif isinstance(raw, str) and raw.count(",") == 1:
        lat, lon = raw.split(",")
    else:
        raise DslError(f"{ctx}: bad geo point {raw!r}")
    try:
        lat_f, lon_f = float(lat), float(lon)
    except (TypeError, ValueError) as e:
        raise DslError(f"{ctx}: bad geo point {raw!r}") from e
    if not -90.0 <= lat_f <= 90.0:
        raise DslError(f"{ctx}: latitude {lat_f} out of [-90, 90]")
    if not -180.0 <= lon_f <= 180.0:
        raise DslError(f"{ctx}: longitude {lon_f} out of [-180, 180]")
    return lat_f, lon_f


def shape_to_node(gfield: str, shape: Any, rel: str) -> Node:
    """Desugar one geo_shape body (GeoJSON-ish dict, validated) onto
    the bbox/polygon algebra for the point corpus — shared by the
    inline ``shape`` form and the engine's ``indexed_shape``
    resolution (``SearchEngine._expand_data_nodes``), so both forms
    inherit identical scan predicates AND the covering-cell
    index-served plan. ``rel`` must be pre-validated
    (intersects/within/disjoint)."""
    if not isinstance(shape, dict):
        raise DslError(
            "geo_shape shape needs {'type': ..., 'coordinates': ...}")
    stype = str(shape.get("type", "")).lower()
    coords = shape.get("coordinates")

    def _rel(node: Node) -> Node:
        # point corpus (r11): `within` ≡ `intersects` (a point is
        # within the query shape iff it intersects it); `disjoint`
        # ≡ has-a-point AND NOT intersects — ES only matches docs
        # that HAVE the field, and GeoExists checks both
        # coordinates (a struct of two nulls is non-null). Score
        # stays 1 per match (GeoExists 1 + Not 0).
        if rel == "disjoint":
            return And((GeoExists(gfield), Not(node)))
        return node

    if stype == "envelope":
        # GeoJSON-ish ES envelope: [[minLon, maxLat],
        # [maxLon, minLat]] — top-left then bottom-right
        if not isinstance(coords, list) or len(coords) != 2:
            raise DslError(
                "geo_shape envelope needs [[lon, lat], [lon, lat]]"
                " (top-left, bottom-right)")
        top, left = _geo_point(coords[0], "geo_shape envelope")
        bottom, right = _geo_point(coords[1], "geo_shape envelope")
        if bottom > top:
            raise DslError(
                "geo_shape envelope top-left must be north of "
                "bottom-right")
        # left > right wraps the antimeridian, like
        # geo_bounding_box (r9 semantics)
        return _rel(GeoBoundingBox(gfield, top, left, bottom, right))
    if stype == "point":
        # point ∩ point-corpus: exact coordinate match — the
        # degenerate box, which both plans already serve
        plat, plon = _geo_point(coords, "geo_shape point")
        return _rel(GeoBoundingBox(gfield, plat, plon, plat, plon))
    if stype == "polygon":
        if not isinstance(coords, list) or not coords \
                or not isinstance(coords[0], list):
            raise DslError(
                "geo_shape polygon needs [[[lon, lat], ...]] ring "
                "coordinates")
        if len(coords) > 1:
            raise DslError(
                "geo_shape polygon holes (inner rings) are not "
                "supported (engine subset)")
        pts = [_geo_point(p, "geo_shape polygon")
               for p in coords[0]]
        if len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]   # GeoJSON closed ring → implicit close
        if len(pts) < 3:
            raise DslError("geo_shape polygon ring needs at least "
                           "3 distinct points")
        return _rel(GeoPolygon(gfield, tuple(pts)))
    if stype == "multipolygon":
        # GeoJSON multipolygon (r11): [[outer-ring, holes...],
        # ...] — point-in-multipolygon ≡ OR over the member
        # polygons (holes reject like single polygons). Score =
        # number of containing polygons (the engine's Or
        # convention; ES scores a flat 1 — documented deviation,
        # same match set for non-overlapping members).
        if not isinstance(coords, list) or not coords \
                or not all(isinstance(pg, list) and pg
                           and isinstance(pg[0], list)
                           for pg in coords):
            raise DslError(
                "geo_shape multipolygon needs [[[[lon, lat], "
                "...]], ...] polygon coordinates")
        polys: list[Node] = []
        for pg in coords:
            if len(pg) > 1:
                raise DslError(
                    "geo_shape polygon holes (inner rings) are "
                    "not supported (engine subset)")
            pts = [_geo_point(p, "geo_shape multipolygon")
                   for p in pg[0]]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            if len(pts) < 3:
                raise DslError(
                    "geo_shape polygon ring needs at least 3 "
                    "distinct points")
            polys.append(GeoPolygon(gfield, tuple(pts)))
        return _rel(polys[0] if len(polys) == 1
                    else Or(tuple(polys)))
    if stype == "circle":
        # ES circle shape (r12): center [lon, lat] + "radius" distance
        # string — point-in-circle ≡ the geo_distance haversine
        # predicate, so both geo plans serve it unchanged
        radius = shape.get("radius")
        if radius is None:
            raise DslError("geo_shape circle needs a 'radius' "
                           "(ES distance string, e.g. '10km')")
        from cassandra_es_index_spark.functions.geo import (
            distance_meters,
        )
        try:
            meters = distance_meters(radius)
        except ValueError as e:
            raise DslError(str(e)) from e
        clat, clon = _geo_point(coords, "geo_shape circle")
        return _rel(GeoDistance(gfield, clat, clon, meters))

    def _line_pts(raw, what: str) -> tuple:
        if not isinstance(raw, list) or len(raw) < 2:
            raise DslError(f"{what} needs at least 2 [lon, lat] "
                           "points")
        if len(raw) > 128:
            raise DslError(f"{what} supports at most 128 points "
                           "(engine subset)")
        return tuple(_geo_point(p, what) for p in raw)

    if stype == "linestring":
        # measure-zero against the point corpus by construction
        # (exact on-segment doubles) — implemented, documented in
        # GeoOnLine; within ≡ intersects (a point within a line is
        # on it), disjoint composes via the GeoExists leg
        return _rel(GeoOnLine(gfield,
                              _line_pts(coords, "geo_shape "
                                                "linestring")))
    if stype == "multilinestring":
        if not isinstance(coords, list) or not coords:
            raise DslError("geo_shape multilinestring needs "
                           "[[[lon, lat], ...], ...] line "
                           "coordinates")
        lines = tuple(
            GeoOnLine(gfield, _line_pts(ln, "geo_shape "
                                            "multilinestring"))
            for ln in coords)
        return _rel(lines[0] if len(lines) == 1 else Or(lines))
    if stype == "geometrycollection":
        # GeoJSON GeometryCollection (r12): the UNION of its member
        # shapes — each member desugars recursively WITHOUT the
        # relation (intersects semantics), the union wraps once, and
        # `_rel` applies the within/disjoint treatment to the whole
        # collection (disjoint-from-a-collection = disjoint from
        # every member, which Not(Or(...)) gives exactly)
        geoms = shape.get("geometries")
        if not isinstance(geoms, list) or not geoms:
            raise DslError("geo_shape geometrycollection needs a "
                           "non-empty 'geometries' list")
        if len(geoms) > 32:
            raise DslError("geo_shape geometrycollection supports at "
                           "most 32 member geometries (engine subset)")
        members = tuple(shape_to_node(gfield, g, "intersects")
                        for g in geoms)
        return _rel(members[0] if len(members) == 1 else Or(members))
    raise DslError(
        f"geo_shape type {shape.get('type')!r} is not supported "
        "(engine subset: envelope / polygon / multipolygon / point / "
        "circle / linestring / multilinestring / geometrycollection)")


def _span_clause_terms(clause: Any) -> tuple[str, tuple[str, ...]]:
    """(field, terms) of a single-token span clause — ``span_term`` or
    ``span_or`` of span_terms (nesting collapses: a union of unions is
    a union). The engine's documented span subset: composite spans
    (span_near inside span_or etc.) are rejected with a typed error,
    like span_near's two-clause shape."""
    if not isinstance(clause, dict) or len(clause) != 1:
        raise DslError("span clause must be span_term or span_or")
    (k, v), = clause.items()
    if k == "span_term":
        fld, val = _single(v)
        if isinstance(val, dict):
            val = val.get("value")
        return fld, (_scalar(val),)
    if k == "span_or":
        if not isinstance(v, dict) \
                or not isinstance(v.get("clauses"), list) \
                or not v["clauses"]:
            raise DslError(
                "span_or needs {'clauses': [span_term, ...]}")
        fields: set[str] = set()
        terms: list[str] = []
        for cl in v["clauses"]:
            f2, ts = _span_clause_terms(cl)
            fields.add(f2)
            terms.extend(ts)
        if len(fields) != 1:
            raise DslError("span_or clauses must share one field")
        return next(iter(fields)), tuple(dict.fromkeys(terms))
    if k == "span_multi":
        # ES span_multi: a multi-term query in a span position — the
        # slot carries a TermPattern the engine expands against the
        # term dictionary pre-compile (the span_or union semantics,
        # Lucene SpanMultiTermQueryWrapper)
        if not isinstance(v, dict) or "match" not in v \
                or not isinstance(v["match"], dict) \
                or len(v["match"]) != 1:
            raise DslError("span_multi needs {'match': {prefix|"
                           "wildcard|regexp|fuzzy: {field: ...}}}")
        (mk, mv), = v["match"].items()
        if mk not in ("prefix", "wildcard", "regexp", "fuzzy"):
            raise DslError("span_multi supports prefix/wildcard/"
                           f"regexp/fuzzy matches, got {mk!r}")
        fld, val = _single(mv)
        fuzziness = None
        transpositions = False
        prefix_length = 0
        if isinstance(val, dict):
            # per-kind allowlist — unknown keys typed-reject, never
            # silently dropped (r11; previously extra keys vanished)
            allowed = {"value"} if mk != "fuzzy" else \
                {"value", "fuzziness", "transpositions",
                 "prefix_length"}
            extra = set(val) - allowed
            if extra:
                raise DslError(
                    f"span_multi {mk}: unsupported parameters "
                    f"{sorted(extra)} (engine subset)")
            fuzziness = val.get("fuzziness")
            transpositions = val.get("transpositions", False)
            if not isinstance(transpositions, bool):
                raise DslError("span_multi fuzzy: transpositions "
                               "must be a boolean")
            prefix_length = val.get("prefix_length", 0)
            if isinstance(prefix_length, bool) \
                    or not isinstance(prefix_length, int) \
                    or prefix_length < 0:
                raise DslError("span_multi fuzzy: prefix_length must "
                               "be a non-negative integer")
            val = val.get("value")
        edits = 2
        if mk == "fuzzy":
            from cassandra_es_index_spark.search.ast import fuzzy_edits
            e = _fuzziness_edits(fuzziness)
            edits = fuzzy_edits(
                _fuzzy_node(fld, _scalar(val),
                            (3, 6) if e is None else e))
        return fld, (TermPattern(mk, _scalar(val), edits,
                                 transpositions=transpositions,
                                 prefix_length=prefix_length),)
    raise DslError(
        f"span clause {k!r} is not supported here (the engine "
        "composes span_term, span_or, and span_multi)")


def _bind_default_field(node: Node, fld: str) -> Node:
    """Rewrite a parsed query_string tree so default-field leaves
    (``field=None``) address ``fld`` — the DSL ``default_field`` /
    per-entry ``fields`` binding (r11). Compound nodes recurse; leaves
    with an explicit field are untouched."""
    import dataclasses

    if isinstance(node, (And, Or, Should, DisMax)):
        return dataclasses.replace(
            node, children=tuple(_bind_default_field(c, fld)
                                 for c in node.children))
    if hasattr(node, "child") and getattr(node, "child", None) \
            is not None:
        return dataclasses.replace(
            node, child=_bind_default_field(node.child, fld))
    if getattr(node, "field", "") is None:
        return dataclasses.replace(node, field=fld)
    return node


def _boosted(node: Node, boost: Any) -> Node:
    if boost is None:
        return node
    try:
        factor = float(boost)
    except (TypeError, ValueError) as e:
        raise DslError(f"bad boost {boost!r}") from e
    return node if factor == 1.0 else Boost(node, factor)


def _join_inner_size(kind: str, ih: Any
                     ) -> "tuple[int, tuple[str, ...] | None] | None":
    """Validate a has_child/has_parent ``inner_hits`` object (r13) —
    engine subset: ``size`` and an include-list ``_source``
    (name/sort/highlight on join inner hits typed-reject). ES default
    size is 3. Returns (size, source_includes | None)."""
    if ih is None:
        return None
    if not isinstance(ih, dict):
        raise DslError(f"{kind} inner_hits must be an object")
    extra = set(ih) - {"size", "_source"}
    if extra:
        raise DslError(f"{kind} inner_hits: unsupported parameters "
                       f"{sorted(extra)} (engine subset: size and "
                       "_source only)")
    size = ih.get("size", 3)
    if isinstance(size, bool) or not isinstance(size, int) or size < 1:
        raise DslError(f"{kind} inner_hits size must be a positive "
                       f"integer, got {size!r}")
    src = ih.get("_source")
    includes: tuple[str, ...] | None = None
    if src is not None:
        if isinstance(src, str):
            src = [src]
        if not isinstance(src, list) or not src or not all(
                isinstance(f, str) for f in src):
            raise DslError(
                f"{kind} inner_hits _source must be a field name or a "
                "non-empty list of field names (engine subset: "
                "include list only)")
        includes = tuple(src)
    return size, includes


def _fuzziness_edits(fuzziness: Any) -> int | tuple[int, int] | None:
    """ES ``fuzziness`` → edit budget: int 0/1/2; ``"AUTO"`` /
    ``"AUTO:low,high"`` → an (auto_low, auto_high) tuple, resolved
    against each query term's LENGTH the way ES does (0 edits below
    ``low`` chars, 1 below ``high``, else 2). None = not requested."""
    if fuzziness is None:
        return None
    if isinstance(fuzziness, str):
        up = fuzziness.upper()
        if up == "AUTO":
            return (3, 6)
        if up.startswith("AUTO:"):
            m = _re.fullmatch(r"AUTO:(\d+),(\d+)", up)
            if m is None:
                raise DslError(f"bad fuzziness {fuzziness!r} "
                               "(expected AUTO:low,high)")
            return (int(m.group(1)), int(m.group(2)))
        if fuzziness.isdigit():
            return int(fuzziness)
        raise DslError(f"bad fuzziness {fuzziness!r}")
    if isinstance(fuzziness, int) and 0 <= fuzziness <= 2:
        return fuzziness
    raise DslError(f"bad fuzziness {fuzziness!r}")


def _fuzzy_node(field: str, term: str,
                edits: int | tuple[int, int], *,
                transpositions: bool = False,
                prefix_length: int = 0) -> Fuzzy:
    if isinstance(edits, tuple):
        return Fuzzy(field, term, None,
                     auto_low=edits[0], auto_high=edits[1],
                     transpositions=transpositions,
                     prefix_length=prefix_length)
    return Fuzzy(field, term, edits, transpositions=transpositions,
                 prefix_length=prefix_length)


def _single(body: Any) -> tuple[str, Any]:
    if not isinstance(body, dict) or len(body) != 1:
        raise DslError(f"clause body must have exactly one field: {body!r}")
    (field, value), = body.items()
    return field, value


def _scalar(value: Any) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def _as_list(value: Any) -> list[dict[str, Any]]:
    if value is None:
        return []
    if isinstance(value, list):
        return value
    return [value]
