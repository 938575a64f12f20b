"""AST → Catalyst (predicate Column, score Column).

This is the engine's replacement for shipping the query to Elasticsearch
(ref ElasticIndex.java:658-672): the parsed query compiles to built-in
Column expressions that Catalyst pushes into the parquet scan where
possible (range/term on typed columns) and evaluates inside
WholeStageCodegen otherwise (regex token matching). No Python UDFs.

Scoring — deterministic, documented (SURVEY.md §7 hard-part 1: float BM25
parity with ES is impossible, so the engine defines its own formula):

    score(doc) = Σ over positive text leaves of  tf(leaf, doc)
               + Σ over positive non-text leaves of  1 if matched

where tf = number of token matches of the leaf's pattern in the field,
and — like Lucene's disjunction scoring — a leaf under an Or/Should
contributes ONLY when its own branch matches (a compound disjunct with a
partial match adds nothing; pinned by
``test_or_compound_child_scores_matching_only``, identical on the scan
and index-served plans). Integer-valued, reproducible, and expressible
in ANSI SQL for oracle checks. NOT-subtrees contribute 0.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_es_index_spark.search.ast import (
    And, Boost, Boosting, ConstantScore, DecayScore, DisMax,
    DistanceFeature, Exists,
    FunctionScore, FunctionScoreArray, GeoBoundingBox, GeoDistance, GeoExists,
    GeoGridCell, GeoOnLine, GeoPolygon, GeoShapeLookup, Fuzzy,
    HasChild, HasParent, Ids,
    IntervalsMatch, JoinRelMatch, KnnClause, ParentIdQ, PercolateDoc,
    MatchAll,
    MatchNone, MoreLikeThis, ScoredIds,
    Nested, Node, Not, Or,
    Phrase, Range,
    RandomScore, RankFeature, Regexp,
    Required, Scoreless, ScriptFilter, ScriptScore, Should, SpanContaining,
    SpanFirst, SpanNear,
    SpanNot, SpanOr, Term, TermsLookup, TermsSet,
    Wildcard,
)


class CompileError(ValueError):
    """Unknown field / untypeable comparison — the analogue of the
    reference's eager `_validate/query` rejection
    (ref ElasticIndex.java:734-782)."""


_NUMERIC = (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
            T.FloatType, T.DoubleType, T.DecimalType)

# Spark's accepted date/timestamp STRING grammar (SparkDateTimeUtils.
# stringToTimestamp): yyyy[-[m]m[-[d]d[ or T [h]h[:[m]m[:[s]s[.frac]]]
# [zone]]]] — zone = Z / ±hh[:mm[:ss]] / a region id. Date literals on
# date-typed fields validate against this at COMPILE time so malformed
# values are typed errors, never ANSI runtime cast crashes.
_DATE_LITERAL = re.compile(
    r"\s*[+-]?\d{4,7}"
    r"(-\d{1,2}"
    r"(-\d{1,2}"
    r"([ T]\d{1,2}"
    r"(:\d{1,2}"
    r"(:\d{1,2}"
    r"(\.\d{1,9})?)?)?"
    r"\s*([zZ]|[+-]\d{1,2}(:\d{1,2}(:\d{1,2})?)?"
    r"|(?P<zone>[A-Za-z][A-Za-z0-9/_+\-:]*))?"
    r")?)?)?\s*")

# java.time.ZoneId.SHORT_IDS keys — Spark resolves zone ids via
# ZoneId.of(id, SHORT_IDS), so these legacy three-letter ids are
# accepted on top of the IANA region database.
_JAVA_SHORT_TZ = frozenset((
    "ACT", "AET", "AGT", "ART", "AST", "BET", "BST", "CAT", "CNT",
    "CST", "CTT", "EAT", "ECT", "IET", "IST", "JST", "MIT", "NET",
    "NST", "PLT", "PNT", "PRT", "PST", "SST", "VST",
    "EST", "HST", "MST"))


def _zone_id_ok(zone: str, spark) -> bool:
    """True iff Spark's timestamp-string parser would resolve ``zone``
    (the region-id tail of a date literal). Fuzz-class fix (r15): the
    literal grammar's zone alternative accepted ANY letter-led tail, so
    '2024-01-01 10:00:00 NotAZone' passed compile validation and still
    crashed at runtime with the ANSI SparkDateTimeException the check
    exists to prevent. Resolution runs against the SAME JVM resolver
    Spark's cast uses (DateTimeUtils.getZoneId — same pattern as
    ``validate_java_regex``) when a JVM handle exists; without one
    (Connect / schema-only compiles) zoneinfo + the java.time short-id
    map + UTC/GMT/UT-prefixed offsets approximate it."""
    jvm = getattr(spark, "_jvm", None) if spark is not None else None
    if jvm is not None:
        try:
            resolver = jvm.org.apache.spark.sql.catalyst.util.DateTimeUtils
            resolver.getZoneId("UTC")  # resolver-reachable sanity probe
        except Exception:  # noqa: BLE001 — fall through to approximation
            resolver = None
        if resolver is not None:
            try:
                resolver.getZoneId(zone)
                return True
            except Exception:  # noqa: BLE001 — Py4JJavaError on bad id
                return False
    if re.fullmatch(
            r"(?:UTC|GMT|UT)(?:[+-]\d{1,2}(?::\d{1,2}(?::\d{1,2})?)?)?",
            zone):
        return True
    if zone in _JAVA_SHORT_TZ:
        return True
    try:
        from zoneinfo import ZoneInfo
        ZoneInfo(zone)
        return True
    except Exception:  # noqa: BLE001 — unknown region id
        return False


@dataclass
class FieldRef:
    col: Column
    dtype: T.DataType


def _escape_regex(text: str) -> str:
    return re.sub(r"[.^$+?{}\[\]\\|()*]", lambda m: "\\" + m.group(0), text)


def validate_java_regex(pattern: str, spark) -> None:
    """Syntax-check a user regexp with the SAME engine that executes it
    (java.util.regex, what ``rlike`` runs) so accept/reject never depends
    on a Python-re approximation or on whether an index exists: Java-only
    constructs (``\\p{Alpha}``, possessive quantifiers) pass, malformed
    patterns fail eagerly with CompileError on BOTH the scan and the
    dictionary-served paths. See ast.Regexp for the documented
    Java-vs-Lucene syntax deviation."""
    if spark is None:  # no JVM handle (e.g. Connect) — defer to runtime
        return
    try:
        spark._jvm.java.util.regex.Pattern.compile(pattern)
    except Exception as e:  # Py4JJavaError → eager, typed rejection
        raise CompileError(f"bad regexp {pattern!r}: {e}") from e


def presence_pred(col: Column, dtype: T.DataType) -> Column:
    """Field-presence predicate — ES ``exists`` semantics (r11 fix): a
    geo_point-shaped struct (lat/lon members) EXISTS only when both
    coordinates are non-null — a struct of two nulls is itself non-null,
    so plain ``isNotNull`` wrongly matched pointless docs. Shared by the
    scan plan (Exists compile) and the presence-index builder
    (engine._presence_rows) so both plans agree."""
    if isinstance(dtype, T.StructType) \
            and {"lat", "lon"} <= {f.name for f in dtype.fields}:
        return (col.getField("lat").isNotNull()
                & col.getField("lon").isNotNull())
    return col.isNotNull()


def token_pattern(term: str) -> str:
    """Case-insensitive whole-token regex for a term.

    Uses only RE2-safe constructs (``\\b``, no lookaround) so the DuckDB
    oracle can evaluate the identical pattern.
    """
    return r"(?i)\b" + _escape_regex(term) + r"\b"


def wildcard_pattern(pattern: str) -> str:
    """Lucene wildcard → regex: ``*`` = word-char run, ``?`` = one word char."""
    out: list[str] = [r"(?i)\b"]
    for ch in pattern:
        if ch == "*":
            out.append(r"\w*")
        elif ch == "?":
            out.append(r"\w")
        else:
            out.append(_escape_regex(ch))
    out.append(r"\b")
    return "".join(out)


def wildcard_token_pattern(pattern: str) -> str:
    """Anchored form of ``wildcard_pattern`` for term-DICTIONARY matching:
    because ``wildcard_pattern`` pins both ends to word boundaries, its
    matches in raw text are exactly the whole tokens matching this
    anchored pattern over the (lowercased) token dictionary — the
    equivalence the index-served wildcard plan relies on
    (property-tested in tests/test_property.py)."""
    out: list[str] = ["^"]
    for ch in pattern:
        if ch == "*":
            out.append(r"\w*")
        elif ch == "?":
            out.append(r"\w")
        else:
            out.append(re.escape(ch.lower()))
    out.append("$")
    return "".join(out)


def phrase_pattern(text: str, slop: int = 0, last_prefix: bool = False,
                   last_alternatives: tuple[str, ...] | None = None) -> str:
    words = [_escape_regex(w) for w in text.split()]
    if last_alternatives is not None:
        # capped match_phrase_prefix expansion (ES max_expansions, r6):
        # the last token must EQUAL one of the concrete dictionary
        # expansions — the trailing `\b` rejects longer runs, so this is
        # exactly the term-set semantics the positional serve uses
        words[-1] = "(?:%s)" % "|".join(
            _escape_regex(t) for t in last_alternatives)
    elif last_prefix:
        # match_phrase_prefix: the last word matches any token it
        # prefixes. `\w*` greedily consumes the rest of the token, so the
        # trailing `\b` still holds — one pattern serves both flavors.
        words[-1] = words[-1] + r"\w*"
    if slop > 0:
        # up to `slop` intervening tokens per gap, in order (see
        # ast.Phrase docstring for the Lucene-semantics comparison);
        # bounded repetition only — RE2-safe for the DuckDB oracle
        gap = r"(?:\s+\w+){0,%d}\s+" % slop
        return r"(?i)\b" + gap.join(words) + r"\b"
    return r"(?i)\b" + r"\s+".join(words) + r"\b"


def _strip_nested_prefix(node: Node, path: str) -> Node:
    """Rewrite a nested query's child so its leaf fields are relative to
    the array element: ``items.qty`` → ``qty``. Every leaf must address a
    field under ``path`` (ES requires it); a bare or foreign field is a
    compile error — nested children have no default field."""
    import dataclasses

    prefix = path + "."

    def rewrite(n: Node) -> Node:
        if isinstance(n, (And, Or, Should, DisMax)):
            return dataclasses.replace(
                n, children=tuple(rewrite(c) for c in n.children))
        if isinstance(n, (Boost, ConstantScore, Required, Scoreless, Not)):
            return dataclasses.replace(n, child=rewrite(n.child))
        if isinstance(n, Nested):
            raise CompileError("nested queries do not nest (one level)")
        fld = getattr(n, "field", None)
        if fld is None:
            if isinstance(n, (MatchAll, MatchNone)):
                return n
            raise CompileError(
                "nested query leaves must name a field under "
                f"{path!r} (no default field inside nested)")
        if not fld.startswith(prefix):
            raise CompileError(
                f"nested query leaf field {fld!r} is not under {path!r}")
        return dataclasses.replace(n, field=fld[len(prefix):])

    return rewrite(node)


def highlight_patterns(node: Node, field: str,
                       default_field: str | None) -> list[str]:
    """Regex patterns of the POSITIVE text leaves targeting ``field`` —
    the match set a highlighter must wrap. Term/Wildcard/Phrase leaves
    contribute their scan patterns (the same regexes the scan plan
    counts); Not subtrees are excluded (their matches are absent from the
    hits); Fuzzy/Regexp leaves contribute nothing (their match sets are
    dictionary expansions, not a single pattern — documented deviation
    from ES's unified highlighter, which highlights those too)."""
    out: list[str] = []

    def walk(n: Node) -> None:
        if isinstance(n, Not):
            return
        if isinstance(n, (And, Or, Should, DisMax)):
            for c in n.children:
                walk(c)
            return
        if isinstance(n, (Boost, ConstantScore, Required, Scoreless,
                          FunctionScore, ScriptScore, DecayScore,
                          RandomScore)):
            walk(n.child)
            return
        tgt = getattr(n, "field", None)
        resolved = tgt if tgt is not None else default_field
        if resolved != field:
            return
        if isinstance(n, Term):
            out.append(token_pattern(n.value))
        elif isinstance(n, Wildcard):
            out.append(wildcard_pattern(n.pattern))
        elif isinstance(n, Phrase):
            if n.last_alternatives == ():
                return  # empty expansion matches nothing
            out.append(phrase_pattern(n.text, n.slop, n.last_prefix,
                                      n.last_alternatives))

    walk(node)
    # de-dup, order-preserving — alternation order is part of the match
    # semantics for overlapping patterns
    seen: set[str] = set()
    return [p for p in out if not (p in seen or seen.add(p))]


# ES field_value_factor modifiers (log family is log10, ln natural —
# ES's own definitions). Shared by the scan compiler and the index-served
# plan so both paths score identically.
_FVF_MODIFIERS = {
    "none": lambda v: v,
    "log": F.log10,
    "log1p": lambda v: F.log10(v + F.lit(1.0)),
    "log2p": lambda v: F.log10(v + F.lit(2.0)),
    "ln": F.log,
    "ln1p": lambda v: F.log(v + F.lit(1.0)),
    "ln2p": lambda v: F.log(v + F.lit(2.0)),
    "square": lambda v: v * v,
    "sqrt": F.sqrt,
    "reciprocal": lambda v: F.lit(1.0) / v,
}

_BOOST_MODES = ("multiply", "sum", "replace", "max", "min", "avg")


def fvf_value(raw: Column, node: FunctionScore) -> Column:
    """``field_value_factor`` function value: ``modifier(factor ×
    coalesce(field, missing))`` — ES applies factor and modifier to the
    ``missing`` substitute exactly as to a stored value."""
    if node.modifier not in _FVF_MODIFIERS:
        raise CompileError(
            f"unknown field_value_factor modifier {node.modifier!r}")
    v = (F.coalesce(raw.cast("double"), F.lit(float(node.missing)))
         * F.lit(float(node.factor)))
    return _FVF_MODIFIERS[node.modifier](v)


def decay_params(node: "DecayScore", is_date: bool) -> tuple[float, float,
                                                             float]:
    """Coerce a DecayScore's origin/scale/offset to floats. Numeric
    fields take plain numbers; date fields take epoch-millis numbers
    (pre-resolved by the engine for ``now``-anchored origins) or the
    driver-resolvable forms: a plain ISO origin and ``10d``-style
    durations. A still-symbolic ``now`` here means the query bypassed
    the engine's date-math rewrite — a compile error, not a silent 0."""
    from cassandra_es_index_spark.search import datemath as dm

    def num(v: object, what: str) -> float:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise CompileError(
                f"{node.kind} {what} on {node.field_name!r} must be "
                f"numeric, got {v!r}")
        return float(v)

    if not is_date:
        return (num(node.origin, "origin"), num(node.scale, "scale"),
                num(node.offset, "offset"))
    try:
        if isinstance(node.origin, (int, float)) \
                and not isinstance(node.origin, bool):
            origin = float(node.origin)
        elif dm.is_date_math(node.origin):
            raise CompileError(
                f"unresolved date-math origin {node.origin!r} (now-"
                "anchored origins resolve through the engine)")
        else:
            origin = dm.epoch_millis(dm.parse_now(str(node.origin)))
        return (origin, dm.duration_millis(node.scale),
                dm.duration_millis(node.offset))
    except dm.DateMathError as e:
        raise CompileError(str(e)) from e


def decay_value(value: Column, node: "DecayScore", origin: float,
                scale: float, offset: float) -> Column:
    """ES decay curve as closed-form Column math over a DOUBLE value
    (epoch millis on date fields). Null values decay to 1.0 — ES does
    not penalize docs missing the field."""
    import math

    if scale <= 0:
        raise CompileError(f"{node.kind} scale must be > 0, got {scale}")
    d = F.greatest(F.lit(0.0),
                   F.abs(value - F.lit(origin)) - F.lit(float(offset)))
    ln_decay = math.log(node.decay)
    if node.kind == "gauss":
        fv = F.exp(d * d * F.lit(ln_decay / (scale * scale)))
    elif node.kind == "exp":
        fv = F.exp(d * F.lit(ln_decay / scale))
    elif node.kind == "linear":
        s = scale / (1.0 - node.decay)
        fv = F.greatest(F.lit(0.0), (F.lit(s) - d) / F.lit(s))
    else:
        raise CompileError(f"unknown decay kind {node.kind!r}")
    return F.when(value.isNull(), F.lit(1.0)).otherwise(fv)


def decay_input(col: Column, dtype: T.DataType, node: "DecayScore") \
        -> Column:
    """The decay distance domain for a field value: DOUBLE for numeric
    fields, epoch millis for date/timestamp fields."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_millis(col).cast("double")
    if isinstance(dtype, T.DateType):
        return F.unix_millis(col.cast("timestamp")).cast("double")
    if isinstance(dtype, _NUMERIC):
        return col.cast("double")
    raise CompileError(
        f"{node.kind} needs a numeric or date field, got "
        f"{dtype.simpleString()} for {node.field_name!r}")


def random_value(col: Column, seed: int) -> Column:
    """Seeded per-doc pseudo-random value in [0, 1): xxhash64 of the
    field value and the seed, folded to 31 bits — deterministic across
    runs/executors like ES's seeded random_score."""
    return (F.pmod(F.xxhash64(col, F.lit(int(seed))), F.lit(1 << 31))
            .cast("double") / F.lit(float(1 << 31)))


def script_score_value(expr: str) -> Column:
    """``script_score`` function value: the compiled script expression
    floored at 0 — ES rejects script scores < 0 at query time ("script
    score function must not produce negative scores"); the engine's
    lazy plans cannot raise a typed error per-row, so negatives clamp
    to 0 (documented deviation, deterministic on both plans). Spark
    ``greatest`` skips NULLs, so a script whose arithmetic failed
    (try_divide 0-divisor → NULL) or that read a NULL field also
    scores 0."""
    return F.greatest(F.lit(0.0), F.expr(expr).cast("double"))


def rank_feature_value(v: Column, node: "RankFeature") -> Column:
    """``rank_feature`` score curve over the (positive, DOUBLE) feature
    value — ES's saturation / log / sigmoid / linear functions times
    ``boost``. The caller gates on v > 0 (ES: docs without a positive
    feature never match)."""
    import math

    if node.kind == "saturation":
        fv = v / (v + F.lit(float(node.pivot)))
    elif node.kind == "log":
        fv = F.log(F.lit(float(node.scaling_factor)) + v)
    elif node.kind == "sigmoid":
        vp = F.pow(v, F.lit(float(node.exponent)))
        fv = vp / (vp + F.lit(math.pow(float(node.pivot),
                                       float(node.exponent))))
    elif node.kind == "linear":
        fv = v
    else:
        raise CompileError(f"unknown rank_feature kind {node.kind!r}")
    return F.lit(float(node.boost)) * fv


def distance_feature_value(dist: Column, pivot: float,
                           boost: float) -> Column:
    """``distance_feature`` score: boost · pivot / (pivot + distance) —
    1×boost at the origin, halving at the pivot distance (the ES
    curve)."""
    if pivot <= 0:
        raise CompileError(
            f"distance_feature pivot must be > 0, got {pivot}")
    return F.lit(float(boost)) * F.lit(float(pivot)) \
        / (F.lit(float(pivot)) + dist)


def _swap_at(s: Column, i: Column) -> Column:
    """``s`` with the adjacent characters at 1-based positions
    ``i``/``i+1`` transposed — the primitive Damerau edit, built from
    four substrings (the over-long tail length is clamped by
    ``substr``)."""
    return F.concat(s.substr(F.lit(1), i - 1),
                    s.substr(i + 1, F.lit(1)),
                    s.substr(i, F.lit(1)),
                    s.substr(i + 2, F.length(s)))


def _dl_cond(t: Column, w: str, k: int) -> Column:
    """Unrestricted Damerau–Levenshtein(t, w) ≤ k as a pure Column
    predicate — EXACT for k ≤ 2 (the ES fuzziness ceiling) by
    two-sided adjacent-swap enumeration: any ≤2-op DL script is
    (a) pure Levenshtein, (b) one swap on either string followed by
    ≤k-1 Levenshtein ops, or (c) two swaps, which always reduce to
    ``swap(t, i) == swap(w, j)`` (both-on-t / both-on-w / one each).
    Term-side swaps are driver-enumerated literals; token-side swaps
    are one higher-order ``exists`` over the ≤len-1 positions. This is
    the metric DuckDB's ``damerau_levenshtein`` implements (oracle
    parity); Lucene's automaton is the restricted OSA variant —
    documented deviation on overlapping-edit corners (ast.Fuzzy)."""
    if k <= 0:
        return t == F.lit(w)

    def lev_le(a: Column, b: str, budget: int) -> Column:
        if budget <= 0:
            return a == F.lit(b)
        return F.levenshtein(a, F.lit(b)) <= budget

    swaps_w: list[str] = []
    for i in range(len(w) - 1):
        v = w[:i] + w[i + 1] + w[i] + w[i + 2:]
        if v != w and v not in swaps_w:
            swaps_w.append(v)
    cond = F.levenshtein(t, F.lit(w)) <= k
    for v in swaps_w:          # one swap on the TERM side
        cond = cond | lev_le(t, v, k - 1)

    def swapped_hits(i: Column) -> Column:
        s = _swap_at(t, i)
        c = lev_le(s, w, k - 1)   # one swap on the TOKEN side
        if k >= 2 and swaps_w:    # two swaps ⇒ token swap == term swap
            c = c | s.isin(*swaps_w)
        return c

    # guard: sequence(1, 0) would run DESCENDING for 1-char tokens
    tok_side = F.when(
        F.length(t) >= 2,
        F.exists(F.sequence(F.lit(1), F.length(t) - 1), swapped_hits)
    ).otherwise(F.lit(False))
    return cond | tok_side


def fuzzy_token_cond(tok: Column, node: "Fuzzy", edits: int) -> Column:
    """Per-token fuzzy match predicate — ONE definition shared by the
    scan path (``Compiler._fuzzy_tf``) and the dictionary-served plan
    rewrite (``SearchEngine``), so both plans match identically.
    Composes the length-window prefilter (|Δlen| ≤ edits holds for
    Levenshtein and DL alike — every op changes length by ≤ 1), the
    Lucene ``prefix_length`` guard (token shares the term's first P
    chars; the budget applies to the suffixes), and classic
    Levenshtein or unrestricted DL per ``node.transpositions``."""
    term = node.value.lower()
    if node.transpositions and edits > 2:
        raise CompileError(
            "fuzzy transpositions need an edit budget <= 2 (the "
            f"ES/Lucene fuzziness ceiling), got {edits}")
    p = min(node.prefix_length, len(term))
    w = term[p:]
    cond = F.abs(F.length(tok) - len(term)) <= edits
    suffix = tok
    if p:
        cond = cond & (tok.substr(F.lit(1), F.lit(p)) == F.lit(term[:p]))
        suffix = tok.substr(F.lit(p + 1), F.length(tok))
    if node.transpositions:
        return cond & _dl_cond(suffix, w, edits)
    if edits <= 0:
        return cond & (suffix == F.lit(w))
    return cond & (F.levenshtein(suffix, F.lit(w)) <= edits)


def has_fractional_scorer(node: Node) -> bool:
    """Whether the tree carries a scorer whose values are meaningful
    fractions (script_score / decay / random_score, or any
    ``functions``-array form — whose score_mode math is fractional by
    construction) — those trees keep DOUBLE scores instead of the
    legacy long tf-count contract."""
    from dataclasses import fields as dc_fields
    from dataclasses import is_dataclass

    if isinstance(node, (ScriptScore, DecayScore, RandomScore,
                         FunctionScoreArray, RankFeature,
                         DistanceFeature, ScoredIds, KnnClause)):
        return True
    # a resolved has_child/has_parent with a real score mode reads a
    # pre-aggregated DOUBLE column (avg of child tf counts is fractional
    # by construction); mode "none" scores 0/1 and stays on the long
    # contract
    if isinstance(node, JoinRelMatch) and node.mode != "none":
        return True
    # a FRACTIONAL boost / constant_score value is itself a meaningful
    # fraction (r12): `^2.5` truncated to ×2 by the long root cast was
    # a silent value change — such trees keep double scores (integer
    # boosts stay on the long tf-count contract)
    if isinstance(node, Boost) and float(node.factor) \
            != int(node.factor):
        return True
    if isinstance(node, ConstantScore) and float(node.boost) \
            != int(node.boost):
        return True
    if is_dataclass(node):
        for f in dc_fields(node):
            v = getattr(node, f.name)
            if isinstance(v, Node) and has_fractional_scorer(v):
                return True
            if isinstance(v, tuple) and any(
                    isinstance(x, Node) and has_fractional_scorer(x)
                    for x in v):
                return True
    return False


def combine_boost_mode(score: Column, fv: Column, mode: str) -> Column:
    """Combine the query score with the function value per ES
    ``boost_mode``."""
    if mode == "multiply":
        return score * fv
    if mode == "sum":
        return score + fv
    if mode == "replace":
        return fv
    if mode == "max":
        return F.greatest(score, fv)
    if mode == "min":
        return F.least(score, fv)
    if mode == "avg":
        return (score + fv) / F.lit(2.0)
    raise CompileError(f"unknown boost_mode {mode!r}")


_SCORE_MODES = ("multiply", "sum", "avg", "first", "max", "min")


def combine_score_mode(parts: list[tuple[Column, Column, Column]],
                       mode: str) -> Column:
    """Combine the per-function values of a ``functions`` array per ES
    ``score_mode``. ``parts`` is ``[(applies, weighted_value, weight),
    …]`` in declaration order; a doc where NO function applies takes
    factor 1.0 (ES FunctionScoreQuery: the factor starts at 1 and only
    matching functions contribute). ``avg`` is the WEIGHTED average
    Σ(w·fv)/Σw — ES's documented rule — and degrades to 1.0 when the
    applicable weights sum to 0. Shared by the scan compiler and the
    index-served plan so both score bit-identically."""
    one = F.lit(1.0)
    if mode == "multiply":
        out = one
        for ap, wfv, _ in parts:
            out = out * F.when(ap, wfv).otherwise(one)
        return out
    if mode in ("sum", "avg"):
        zero = F.lit(0.0)
        total = zero
        wsum = zero
        cnt: Column = F.lit(0)
        for ap, wfv, w in parts:
            total = total + F.when(ap, wfv).otherwise(zero)
            wsum = wsum + F.when(ap, w).otherwise(zero)
            cnt = cnt + F.when(ap, 1).otherwise(0)
        if mode == "sum":
            return F.when(cnt > 0, total).otherwise(one)
        return F.when(wsum != 0, total / wsum).otherwise(one)
    # first/max/min: null marks a non-applying function — greatest/least
    # skip nulls (Spark semantics), coalesce restores the empty-set 1.0
    gated = [F.when(ap, wfv) for ap, wfv, _ in parts]
    if mode == "first":
        return F.coalesce(*gated, one)
    if mode in ("max", "min"):
        agg = F.greatest if mode == "max" else F.least
        g = gated[0] if len(gated) == 1 else agg(*gated)
        return F.coalesce(g, one)
    raise CompileError(f"unknown score_mode {mode!r}")


class Compiler:
    """Schema-aware compiler for one documents DataFrame."""

    def __init__(self, df: DataFrame, default_field: str | None = None):
        self.schema = df.schema
        try:
            self._spark = df.sparkSession
        except Exception:  # noqa: BLE001 — schema-only uses stay valid
            self._spark = None
        self.default_field = default_field or self._guess_default_field()

    def _guess_default_field(self) -> str:
        for f in self.schema.fields:
            if isinstance(f.dataType, T.StringType) and f.name not in ("_id",):
                return f.name
        raise CompileError("no string column to use as default search field")

    # -- field resolution ---------------------------------------------------

    def resolve(self, path: str | None) -> FieldRef:
        name = path if path is not None else self.default_field
        parts = name.split(".")
        root = next((f for f in self.schema.fields if f.name == parts[0]), None)
        if root is None:
            raise CompileError(f"unknown field {parts[0]!r}")
        col: Column = F.col(parts[0])
        dtype: T.DataType = root.dataType
        for part in parts[1:]:
            if isinstance(dtype, T.StructType):
                sub = next((f for f in dtype.fields if f.name == part), None)
                if sub is None:
                    raise CompileError(f"no struct field {part!r} in {name!r}")
                col, dtype = col.getField(part), sub.dataType
            elif isinstance(dtype, T.MapType):
                col, dtype = col.getItem(part), dtype.valueType
            else:
                raise CompileError(f"cannot descend into {part!r} of {name!r}")
        return FieldRef(col, dtype)

    # -- literals -----------------------------------------------------------

    def _typed_lit(self, ref: FieldRef, raw: str) -> Column:
        if isinstance(ref.dtype, _NUMERIC):
            try:
                float(raw)
            except ValueError as e:
                raise CompileError(f"non-numeric literal {raw!r} for numeric field") from e
            return F.lit(float(raw)).cast(ref.dtype)
        if isinstance(ref.dtype, (T.TimestampType, T.DateType)):
            # fuzz catch (r14.75): under ANSI casts a malformed date
            # literal ("now-1d/d" that bypassed the date-math rewrite,
            # "true", a bare epoch number) crashed at RUNTIME with a
            # SparkDateTimeException instead of a typed compile error
            # (the ES parse_exception analogue). Validate driver-side
            # against Spark's accepted string grammar
            # (yyyy[-[m]m[-[d]d[ hh:mm:ss[.f]][zone]]]).
            m = _DATE_LITERAL.fullmatch(raw)
            if m is None:
                raise CompileError(
                    f"unparseable date literal {raw!r} for field of "
                    f"type {ref.dtype.simpleString()} (expected "
                    "yyyy[-MM[-dd[ HH:mm:ss[.SSS]][zone]]] or a "
                    "resolvable date-math expression)")
            # region-id zone tails resolve against the JVM's own zone
            # table (r15 fix) — the grammar alone accepted any
            # letter-led tail, deferring the crash to the ANSI cast
            zone = m.group("zone")
            if zone is not None and not _zone_id_ok(zone, self._spark):
                raise CompileError(
                    f"unknown time zone {zone!r} in date literal "
                    f"{raw!r}")
            return F.lit(raw).cast(ref.dtype)
        if isinstance(ref.dtype, T.BooleanType):
            return F.lit(raw.lower() == "true")
        return F.lit(raw)

    # -- per-leaf tf (token match count) ------------------------------------

    def _text_tf(self, ref: FieldRef, pattern: str) -> Column:
        """Match count of ``pattern`` in a text-ish field (0 when no match)."""
        if isinstance(ref.dtype, T.StringType):
            return F.size(F.regexp_extract_all(ref.col, F.lit(pattern), F.lit(0)))
        if isinstance(ref.dtype, T.ArrayType) and isinstance(ref.dtype.elementType, T.StringType):
            return F.aggregate(
                F.transform(ref.col, lambda x: F.size(
                    F.regexp_extract_all(x, F.lit(pattern), F.lit(0)))),
                F.lit(0), lambda acc, x: acc + x)
        if isinstance(ref.dtype, T.MapType):
            # flattened map<string,array<string>> / map<string,string>:
            # search across all values (ref README.md:539 — any token under
            # the json field matches).
            vt = ref.dtype.valueType
            if isinstance(vt, T.ArrayType):
                return F.aggregate(
                    F.flatten(F.map_values(ref.col)),
                    F.lit(0),
                    lambda acc, x: acc + F.size(
                        F.regexp_extract_all(x, F.lit(pattern), F.lit(0))),
                )
            return F.aggregate(
                F.map_values(ref.col), F.lit(0),
                lambda acc, x: acc + F.size(
                    F.regexp_extract_all(x, F.lit(pattern), F.lit(0))))
        # numeric/other: no token semantics
        raise CompileError("text match on non-text field")

    def _token_match_tf(self, ref: FieldRef, match) -> Column:
        """Count tokens (lowercased ``\\w+`` runs) satisfying ``match`` —
        the shared shape for term-anchored matching (fuzzy, regexp):
        JVM-side split + higher-order filter, no UDF."""
        def count(col: Column) -> Column:
            toks = F.split(F.lower(col), r"\W+")
            return F.size(F.filter(
                toks, lambda t: (F.length(t) > 0) & match(t)))
        if isinstance(ref.dtype, T.StringType):
            return count(ref.col)
        if isinstance(ref.dtype, T.ArrayType) and \
                isinstance(ref.dtype.elementType, T.StringType):
            return F.aggregate(
                F.transform(ref.col, count), F.lit(0),
                lambda acc, x: acc + x)
        if isinstance(ref.dtype, T.MapType):
            vt = ref.dtype.valueType
            vals = F.flatten(F.map_values(ref.col)) \
                if isinstance(vt, T.ArrayType) else F.map_values(ref.col)
            return F.aggregate(vals, F.lit(0),
                               lambda acc, x: acc + count(x))
        raise CompileError("token match on non-text field")

    def _fuzzy_tf(self, ref: FieldRef, node: "Fuzzy",
                  max_edits: int) -> Column:
        """Count of tokens within ``max_edits`` edits of the node's
        term — Lucene FuzzyQuery's per-token match. The shared
        ``fuzzy_token_cond`` carries the length pre-filter (pruning
        the O(len²) edit distance the way Lucene prunes its automaton
        expansion), the ``prefix_length`` guard, and the
        transpositions variant — identical on the dictionary-served
        plan."""
        return self._token_match_tf(
            ref, lambda t: fuzzy_token_cond(t, node, max_edits))

    # -- compile ------------------------------------------------------------

    def compile(self, node: Node) -> tuple[Column, Column]:
        """Return (predicate, score). Score is LongType (the engine's
        tf-count contract, matching the reference's count-style scores)
        — except when the tree carries a fractional scorer
        (script_score / decay / random_score), whose [0,1]-range values
        a long cast would truncate to nothing: those stay DOUBLE, like
        ES's float scores. The index-served plan applies the same root
        cast rule so both plans score identically."""
        pred, score = self._walk(node)
        target = "double" if has_fractional_scorer(node) else "long"
        return pred, score.cast(target).alias("_score")

    @staticmethod
    def _gated(pred: Column, score: Column) -> Column:
        """Score contribution of one disjunct: its score when it matches,
        else 0 (null-safe — a null predicate is a non-match)."""
        return F.when(F.coalesce(pred, F.lit(False)), score).otherwise(0)

    def _leaf_text(self, field: str | None, pattern: str) -> tuple[Column, Column]:
        ref = self.resolve(field)
        if isinstance(ref.dtype, (T.StringType, T.ArrayType, T.MapType)):
            tf = self._text_tf(ref, pattern)
            tf = F.coalesce(tf, F.lit(0))
            return tf > 0, tf
        raise CompileError("text leaf on non-text field")

    def _fn_value(self, node: Node) -> Column:
        """Raw function value of one function_score scorer node —
        field_value_factor / script_score / decay / random_score —
        ignoring its ``child``/``boost_mode`` (the caller combines).
        Field refs resolve eagerly so bad fields raise CompileError,
        not a late AnalysisException."""
        if isinstance(node, FunctionScore):
            ref = self.resolve(node.field_name)
            if not isinstance(ref.dtype, _NUMERIC):
                raise CompileError(
                    "field_value_factor needs a numeric field, got "
                    f"{ref.dtype.simpleString()} for {node.field_name!r}")
            return fvf_value(ref.col, node)
        if isinstance(node, ScriptScore):
            for fld in node.fields:   # unknown refs fail at compile,
                self.resolve(fld)     # not as a late AnalysisException
            for fld in node.array_fields:
                # vector-function refs (r11) must be numeric arrays —
                # typed here, not a late AnalysisException
                ref = self.resolve(fld)
                if not (isinstance(ref.dtype, T.ArrayType)
                        and isinstance(ref.dtype.elementType,
                                       _NUMERIC)):
                    raise CompileError(
                        f"script_score vector function needs a "
                        f"numeric array field, got "
                        f"{ref.dtype.simpleString()} for {fld!r}")
            return script_score_value(node.expr)
        if isinstance(node, DecayScore):
            ref = self.resolve(node.field_name)
            if isinstance(ref.dtype, T.StructType):
                # geo decay (r11): origin is a point literal, scale/
                # offset are ES distance strings; the decay domain is
                # the haversine distance in meters (so decay_value
                # runs with origin 0 over the distance itself). Null
                # points decay to 1.0 like any missing field.
                from cassandra_es_index_spark.functions.geo import (
                    distance_meters, geo_point_cols, haversine_meters,
                    point_latlon,
                )
                try:
                    lat, lon = geo_point_cols(ref.col, ref.dtype,
                                              node.field_name)
                except ValueError as e:
                    raise CompileError(str(e)) from e
                if node.origin == "now":   # the date default leaked in
                    raise CompileError(
                        f"{node.kind} on geo field "
                        f"{node.field_name!r} needs an 'origin' point")
                try:
                    olat, olon = point_latlon(node.origin)
                    scale_m = distance_meters(node.scale)
                    off = node.offset
                    off_m = 0.0 if off in (0, 0.0, None)                         else distance_meters(off)
                except ValueError as e:
                    raise CompileError(
                        f"{node.kind} on geo field: {e}") from e
                dist = haversine_meters(lat, lon, F.lit(olat),
                                        F.lit(olon))
                return decay_value(dist, node, 0.0, scale_m, off_m)
            is_date = isinstance(ref.dtype, (T.TimestampType,
                                             T.TimestampNTZType,
                                             T.DateType))
            origin, scale, offset = decay_params(node, is_date)
            return decay_value(decay_input(ref.col, ref.dtype, node),
                               node, origin, scale, offset)
        if isinstance(node, RandomScore):
            ref = self.resolve(node.field_name)
            return random_value(ref.col, node.seed)
        raise CompileError(
            f"unsupported score function {type(node).__name__}")

    def _nested_fns(self, node: Nested):
        """(field ref, element struct type, per-element predicate fn,
        per-element score fn) of a nested query — shared by the match
        branch and the ``inner_hits`` element expansion."""
        ref = self.resolve(node.path)
        if not (isinstance(ref.dtype, T.ArrayType)
                and isinstance(ref.dtype.elementType, T.StructType)):
            raise CompileError(
                f"nested path {node.path!r} must be array<struct>, "
                f"got {ref.dtype.simpleString()}")
        child = _strip_nested_prefix(node.child, node.path)
        elem_type = ref.dtype.elementType

        def epred(x: Column) -> Column:
            p, _ = _ElementCompiler(x, elem_type, self._spark)._walk(
                child)
            return F.coalesce(p, F.lit(False))

        def escore(x: Column) -> Column:
            _, s = _ElementCompiler(x, elem_type, self._spark)._walk(
                child)
            return s.cast("double")

        return ref, elem_type, epred, escore

    def nested_matches_ranked(self, node: Nested) -> tuple[Column,
                                                           T.StructType]:
        """Matching elements of a nested query as ONE array column of
        ``struct<_neg: -score, _elem: element>`` sorted ascending — i.e.
        by element child score DESC, ties by element field order (ES
        inner-hit ranking, deterministic). Per-row array math
        (sort_array over transform) — no window, no shuffle; the
        ``inner_hits`` source (r8)."""
        ref, elem_type, epred, escore = self._nested_fns(node)
        matched = F.filter(ref.col, epred)
        pairs = F.transform(
            matched,
            lambda x: F.struct((-escore(x)).alias("_neg"),
                               x.alias("_elem")))
        return F.sort_array(pairs), elem_type

    def nested_matches_ranked_by(self, node: Nested, elem_field: str,
                                 asc: bool) -> tuple[Column,
                                                     T.StructType]:
        """``nested_matches_ranked`` with a CUSTOM element sort (r13,
        the inner_hits.sort surface): matching elements ordered by one
        element field asc/desc instead of the child score — same
        per-row sort_array shape, no window, no shuffle. Ties follow
        element struct order (asc) or its reverse (desc); element
        nulls sort first asc / last desc (sort_array semantics —
        documented deviation from ES's missing-last default)."""
        ref, elem_type, epred, _ = self._nested_fns(node)
        if elem_field not in elem_type.fieldNames():
            raise CompileError(
                f"nested inner_hits sort field {elem_field!r} is not "
                f"an element field (has: "
                f"{', '.join(elem_type.fieldNames())})")
        matched = F.filter(ref.col, epred)
        pairs = F.transform(
            matched,
            lambda x: F.struct(x[elem_field].alias("_k"),
                               x.alias("_elem")))
        return F.sort_array(pairs, asc=asc), elem_type

    def _walk(self, node: Node) -> tuple[Column, Column]:
        if isinstance(node, MatchAll):
            return F.lit(True), F.lit(0)
        if isinstance(node, MatchNone):
            # Lucene MatchNoDocsQuery — Catalyst folds `WHERE false`
            # to an empty LocalRelation, so this never scans.
            return F.lit(False), F.lit(0)
        if isinstance(node, Term):
            ref = self.resolve(node.field)
            if isinstance(ref.dtype, (T.StringType, T.ArrayType, T.MapType)):
                # "k=v" entries of flattened fields contain '='; token
                # pattern covers it since '=' is a non-word boundary char.
                return self._leaf_text(node.field, token_pattern(node.value))
            pred = ref.col == self._typed_lit(ref, node.value)
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, Wildcard):
            return self._leaf_text(node.field, wildcard_pattern(node.pattern))
        if isinstance(node, Phrase):
            if node.last_alternatives == ():
                # capped expansion with an empty dictionary set — the
                # phrase can match nothing (ES: zero expanded terms)
                return F.lit(False), F.lit(0)
            return self._leaf_text(
                node.field,
                phrase_pattern(node.text, node.slop, node.last_prefix,
                               node.last_alternatives))
        if isinstance(node, Fuzzy):
            from cassandra_es_index_spark.search.ast import fuzzy_edits

            ref = self.resolve(node.field)
            if not isinstance(ref.dtype,
                              (T.StringType, T.ArrayType, T.MapType)):
                raise CompileError("fuzzy match on non-text field")
            tf = F.coalesce(
                self._fuzzy_tf(ref, node, fuzzy_edits(node)),
                F.lit(0))
            return tf > 0, tf
        if isinstance(node, Regexp):
            ref = self.resolve(node.field)
            if not isinstance(ref.dtype,
                              (T.StringType, T.ArrayType, T.MapType)):
                raise CompileError("regexp match on non-text field")
            # eager syntax check with java.util.regex — the engine that
            # rlike executes — so validate() rejects bad patterns at
            # compile time and Java-valid syntax is never wrongly refused
            validate_java_regex(node.pattern, self._spark)
            anchored = f"^(?:{node.pattern})$"
            tf = F.coalesce(
                self._token_match_tf(ref, lambda t: t.rlike(anchored)),
                F.lit(0))
            return tf > 0, tf
        if isinstance(node, Boost):
            pred, score = self._walk(node.child)
            # scores stay double until the root cast("long") — nested
            # boosts compose multiplicatively like Lucene
            return pred, score * F.lit(float(node.factor))
        if isinstance(node, ConstantScore):
            pred, _ = self._walk(node.child)
            return pred, F.when(pred, F.lit(float(node.boost))).otherwise(0)
        if isinstance(node, Required):
            return self._walk(node.child)
        if isinstance(node, Range):
            ref = self.resolve(node.field)
            if isinstance(ref.dtype, (T.ArrayType, T.MapType,
                                      T.StructType)):
                # fuzz catch (r15): a range bound on a multi-valued /
                # structured field compiled into `array >= literal` and
                # crashed at analysis with a raw DATATYPE_MISMATCH
                # instead of a typed error (ES's per-value multi-valued
                # range semantics are not implemented — honest seam)
                raise CompileError(
                    f"range query on {ref.dtype.simpleString()} field "
                    f"{node.field!r} — range needs an orderable scalar "
                    "field")
            pred = F.lit(True)
            if node.lo is not None:
                lo = self._typed_lit(ref, node.lo)
                pred = pred & (ref.col >= lo if node.include_lo else ref.col > lo)
            if node.hi is not None:
                hi = self._typed_lit(ref, node.hi)
                pred = pred & (ref.col <= hi if node.include_hi else ref.col < hi)
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, Exists):
            ref = self.resolve(node.field)
            pred = presence_pred(ref.col, ref.dtype)
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, And):
            if not node.children:
                return F.lit(True), F.lit(0)  # ES: empty bool = match_all
            parts = [self._walk(c) for c in node.children]
            pred = parts[0][0]
            for p, _ in parts[1:]:
                pred = pred & p
            score = parts[0][1]
            for _, s in parts[1:]:
                score = score + s
            return pred, score
        if isinstance(node, Or):
            # Lucene disjunction: only MATCHING clauses contribute score.
            # Leaf tf is already 0 when unmatched, but a compound child
            # (an And with a partial match) carries leaf tfs without
            # matching — gate each child's score on its own predicate so
            # the scan and the index-served union score identically
            # (pinned by test_or_compound_child_scores_matching_only).
            if not node.children:
                return F.lit(False), F.lit(0)  # empty disjunction = none
            parts = [self._walk(c) for c in node.children]
            pred = parts[0][0]
            for p, _ in parts[1:]:
                pred = pred | p
            score = self._gated(*parts[0])
            for p, s in parts[1:]:
                score = score + self._gated(p, s)
            return pred, score
        if isinstance(node, DisMax):
            # best matching subquery's score + tie_breaker × the rest;
            # non-matching subqueries contribute nothing (their leaf tf
            # is already 0 for text leaves, and the when() guards the
            # predicate-style leaves that score a flat 1)
            if not node.children:
                return F.lit(False), F.lit(0)
            parts = [self._walk(c) for c in node.children]
            pred = parts[0][0]
            for p, _ in parts[1:]:
                pred = pred | p
            scores = [F.when(p, s.cast("double")).otherwise(F.lit(0.0))
                      for p, s in parts]
            best = scores[0] if len(scores) == 1 else F.greatest(*scores)
            total = scores[0]
            for s in scores[1:]:
                total = total + s
            return pred, best + F.lit(float(node.tie_breaker)) * (total - best)
        if isinstance(node, (FunctionScore, ScriptScore, DecayScore,
                             RandomScore)):
            pred, score = self._walk(node.child)
            fv = self._fn_value(node)
            return pred, combine_boost_mode(score.cast("double"), fv,
                                            node.boost_mode)
        if isinstance(node, FunctionScoreArray):
            # per-entry: filter gates applicability, weight × function
            # value contributes; combine_score_mode folds the applying
            # entries (empty set → 1.0), max_boost caps, boost_mode
            # merges with the query score — ES FunctionScoreQuery order
            pred, score = self._walk(node.child)
            parts = []
            for fn in node.functions:
                if fn.filter is None:
                    ap: Column = F.lit(True)
                else:
                    fpred, _ = self._walk(fn.filter)
                    ap = F.coalesce(fpred, F.lit(False))
                fv = (F.lit(1.0) if fn.scorer is None
                      else self._fn_value(fn.scorer))
                w = 1.0 if fn.weight is None else float(fn.weight)
                parts.append((ap, (F.lit(w) * fv).cast("double"),
                              F.lit(w)))
            factor = combine_score_mode(parts, node.score_mode)
            if node.max_boost is not None:
                factor = F.least(factor, F.lit(float(node.max_boost)))
            return pred, combine_boost_mode(score.cast("double"), factor,
                                            node.boost_mode)
        if isinstance(node, MoreLikeThis):
            raise CompileError(
                "more_like_this is data-driven (tf·idf term selection "
                "over the postings) — run it through SearchEngine, "
                "which resolves it before compile (_expand_data_nodes)")
        if isinstance(node, TermsLookup):
            raise CompileError(
                "terms lookup is data-driven (the terms live in another "
                "table's document) — run it through SearchEngine, which "
                "resolves it before compile (_expand_data_nodes)")
        if isinstance(node, GeoShapeLookup):
            raise CompileError(
                "geo_shape indexed_shape is data-driven (the shape "
                "lives in another table's document) — run it through "
                "SearchEngine, which resolves it before compile "
                "(_expand_data_nodes)")
        if isinstance(node, KnnClause):
            raise CompileError(
                "the knn query clause is data-driven (a vector search "
                "resolves its candidate pool) — run it through "
                "SearchEngine, which resolves it before compile "
                "(_expand_data_nodes)")
        if isinstance(node, PercolateDoc):
            raise CompileError(
                "percolate is data-driven (every stored query "
                "evaluates against the inline document) — run it "
                "through SearchEngine, which resolves it before "
                "compile (_expand_data_nodes)")
        if isinstance(node, ScoredIds):
            # resolved knn clause: ONE all-literal map (Catalyst
            # constant-folds it to a single runtime object — no
            # codegen blowup at the 10k ES ceiling) probed by _id;
            # backslash-escaped SQL literals keep arbitrary doc ids
            # safe
            if not any(f.name == "_id" for f in self.schema.fields):
                raise CompileError(
                    "knn clause needs the _id document field")
            if not node.pairs:
                return F.lit(False), F.lit(0.0)

            def esc(s: str) -> str:
                return s.replace("\\", "\\\\").replace("'", "\\'")

            entries = ", ".join(
                f"'{esc(i)}', {float(s)!r}D" for i, s in node.pairs)
            score = F.expr(f"map({entries})")[F.col("_id")]
            return score.isNotNull(), F.coalesce(score, F.lit(0.0))
        if isinstance(node, (HasChild, HasParent, ParentIdQ)):
            raise CompileError(
                "has_child/has_parent/parent_id are data-driven (the "
                "other side of a registered parent/child relation must "
                "be matched and joined) — run them through SearchEngine, "
                "which resolves them before compile (_expand_join_nodes)")
        if isinstance(node, JoinRelMatch):
            # resolved parent/child join: the hidden per-doc columns were
            # LEFT-joined on by the engine; a missing join row is a
            # 0-count (so min_children: 0 matches childless parents, like
            # ES). Pure Column algebra over the joined columns — the join
            # itself already happened at the DataFrame level.
            cnt = F.coalesce(F.col(node.count_col).cast("long"),
                             F.lit(0))
            pred = cnt >= F.lit(int(node.min_children))
            if node.max_children is not None:
                pred = pred & (cnt <= F.lit(int(node.max_children)))
            if node.mode == "none" or node.score_col is None:
                return pred, F.when(pred, 1).otherwise(0)
            score = F.coalesce(F.col(node.score_col).cast("double"),
                               F.lit(0.0))
            return pred, F.when(pred, score).otherwise(F.lit(0.0))
        if isinstance(node, ScriptFilter):
            # filter-context script: the pre-translated SQL boolean over
            # document columns; NULL (null ref, try_divide 0) → no match.
            # Refs resolve eagerly so unknown fields raise CompileError,
            # not a late AnalysisException.
            for fld in node.fields:
                self.resolve(fld)
            pred = F.coalesce(F.expr(node.expr).cast("boolean"),
                              F.lit(False))
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, RankFeature):
            ref = self.resolve(node.field)
            if not isinstance(ref.dtype, _NUMERIC):
                raise CompileError(
                    "rank_feature needs a numeric field, got "
                    f"{ref.dtype.simpleString()} for {node.field!r}")
            v = ref.col.cast("double")
            pred = F.coalesce(v > F.lit(0.0), F.lit(False))
            score = F.when(pred, rank_feature_value(v, node)) \
                .otherwise(F.lit(0.0))
            return pred, score
        if isinstance(node, DistanceFeature):
            ref = self.resolve(node.field)
            if isinstance(ref.dtype, (T.TimestampType, T.TimestampNTZType,
                                      T.DateType)):
                from cassandra_es_index_spark.search import datemath as dm

                origin, pivot = node.origin, node.pivot
                if isinstance(origin, str):
                    # plain ISO origins resolve here; now-anchored
                    # date-math resolved by the engine pass before
                    # compile (Compiler alone has no `now`)
                    try:
                        origin = dm.epoch_millis(dm.parse_now(origin))
                    except dm.DateMathError as e:
                        raise CompileError(
                            f"distance_feature origin {node.origin!r} "
                            "on a date field must be a timestamp or "
                            "engine-resolved date-math") from e
                if isinstance(origin, tuple):
                    raise CompileError(
                        "distance_feature origin is a geo point but "
                        f"{node.field!r} is a date field")
                if isinstance(pivot, str):
                    try:
                        pivot = dm.duration_millis(pivot)
                    except dm.DateMathError as e:
                        raise CompileError(str(e)) from e
                value = decay_input(ref.col, ref.dtype,
                                    DecayScore(MatchAll(), node.field))
                pred = ref.col.isNotNull()
                dist = F.abs(value - F.lit(float(origin)))
                score = F.when(
                    pred, distance_feature_value(
                        dist, float(pivot), node.boost)) \
                    .otherwise(F.lit(0.0))
                return pred, score
            # geo_point branch: struct<lat, lon> column
            from cassandra_es_index_spark.functions.geo import (
                distance_meters, geo_point_cols, haversine_meters,
            )

            try:
                lat, lon = geo_point_cols(ref.col, ref.dtype, node.field)
            except ValueError as e:
                raise CompileError(
                    "distance_feature needs a date or geo_point field: "
                    f"{e}") from e
            if not isinstance(node.origin, tuple):
                raise CompileError(
                    "distance_feature origin on a geo field must be a "
                    f"point, got {node.origin!r}")
            pivot = node.pivot
            if isinstance(pivot, str):
                try:
                    pivot = distance_meters(pivot)
                except ValueError as e:
                    raise CompileError(str(e)) from e
            olat, olon = node.origin
            pred = F.coalesce(lat.isNotNull() & lon.isNotNull(),
                              F.lit(False))
            dist = haversine_meters(lat, lon, F.lit(float(olat)),
                                    F.lit(float(olon)))
            score = F.when(
                pred, distance_feature_value(dist, float(pivot),
                                             node.boost)) \
                .otherwise(F.lit(0.0))
            return pred, score
        if isinstance(node, TermsSet):
            # match-count floor over per-term tfs; threshold from the
            # doc field / script expr, Lucene CoveringQuery's <1 → 1
            # clamp; null thresholds match nothing
            tfs = []
            for t in node.terms:
                _, tf = self._leaf_text(node.field, token_pattern(t))
                tfs.append(tf)
            m: Column = F.lit(0)
            total: Column = F.lit(0)
            for tf in tfs:
                m = m + F.when(tf > 0, 1).otherwise(0)
                total = total + tf
            # try_cast, not cast: a threshold that does not cast to a
            # long (non-numeric string field, NaN/overflowing script
            # value) becomes NULL → matches nothing, instead of an
            # untyped ANSI CAST_INVALID_INPUT at collect time (r8);
            # the index plan applies the identical rule
            if node.msm_field is not None:
                msm = self.resolve(node.msm_field).col.try_cast("long")
            else:
                import re as _re2
                for fld in _re2.findall(r"TRY_CAST\(`([^`]+)` AS DOUBLE\)",
                                        node.msm_expr or ""):
                    self.resolve(fld)   # typed error, not a late
                msm = F.expr(node.msm_expr).try_cast("long")
            # greatest() skips nulls, so gate null thresholds explicitly
            # (they match nothing — same as the index plan, whose range
            # index holds no row for a null-valued doc)
            pred = F.coalesce(
                msm.isNotNull() & (m >= F.greatest(msm, F.lit(1))),
                F.lit(False))
            return pred, F.when(pred, total).otherwise(0)
        if isinstance(node, IntervalsMatch):
            # position arrays via split + filtered index sequences (JVM
            # higher-order functions, no UDF); width/order logic shared
            # with the index-served plan (positional.interval_match_pred)
            from cassandra_es_index_spark.search.positional import (
                interval_match_pred,
            )

            ref = self.resolve(node.field)
            if not isinstance(ref.dtype, T.StringType):
                raise CompileError(
                    "intervals supports plain string fields")
            toks = F.split(F.lower(ref.col), r"\W+")
            idx = F.sequence(F.lit(0), F.size(toks) - 1)
            def positions(term: str) -> Column:
                # NB: single-parameter lambda — a second (even
                # defaulted) parameter flips F.filter into its
                # (element, index) form
                t = F.lit(term.lower())
                return F.filter(
                    idx, lambda i: (F.length(F.element_at(toks, i + 1))
                                    > 0)
                    & (F.element_at(toks, i + 1) == t))

            arrays = [positions(term) for term in node.terms]
            pred = F.coalesce(
                interval_match_pred(arrays, node.ordered, node.max_gaps),
                F.lit(False))
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, SpanNear):
            # token-position arrays via split + filtered index
            # sequences (JVM higher-order functions, no UDF); score =
            # number of qualifying position tuples — N-ary since r10,
            # the same positional.span_near_tuple_count math the
            # index-served plan applies, so both plans count
            # bit-identically. Each slot is a union of alternatives
            # (span_or / expanded span_multi).
            from cassandra_es_index_spark.search.ast import TermPattern
            from cassandra_es_index_spark.search.positional import (
                span_near_tuple_count,
            )
            if any(isinstance(t, TermPattern)
                   for c in node.slots() for t in c):
                raise CompileError(
                    "span_multi is data-driven (term-dictionary "
                    "expansion) — run it through SearchEngine, which "
                    "resolves it before compile (_expand_data_nodes)")
            def toks_of(fname) -> Column:
                ref = self.resolve(fname)
                if not isinstance(ref.dtype, T.StringType):
                    raise CompileError(
                        "span_near supports plain string fields")
                return F.split(F.lower(ref.col), r"\W+")

            toks0 = toks_of(node.field)

            def slot_positions(terms, toks) -> Column:
                # positions are indexes into the SLOT's own token
                # stream (span_field_masking, r12: a masked slot reads
                # another field's tokens — Lucene FieldMaskingSpanQuery
                # compares positions across streams verbatim, same as
                # here)
                idx = F.sequence(F.lit(0), F.size(toks) - 1)
                lits = [str(t).lower() for t in terms]
                return F.filter(
                    idx, lambda i: (F.length(F.element_at(toks, i + 1))
                                    > 0)
                    & F.element_at(toks, i + 1).isin(lits))

            sfields = node.slot_fields or (None,) * len(node.slots())
            arrays = [slot_positions(c, toks0 if sf is None
                                     else toks_of(sf))
                      for c, sf in zip(node.slots(), sfields)]
            cnt = F.coalesce(
                span_near_tuple_count(arrays, node.slop, node.in_order),
                F.lit(0))
            return cnt > 0, cnt
        if isinstance(node, (GeoDistance, GeoBoundingBox)):
            # geo leaves (r8): haversine / box comparisons as pure
            # Column math over the struct<lat, lon> geo_point column —
            # Catalyst evaluates inside WholeStageCodegen; the
            # comparisons push toward the scan like any numeric filter
            from cassandra_es_index_spark.functions.geo import (
                geo_point_cols, haversine_meters,
            )

            ref = self.resolve(node.field)
            try:
                lat, lon = geo_point_cols(ref.col, ref.dtype, node.field)
            except ValueError as e:
                raise CompileError(str(e)) from e
            if isinstance(node, GeoDistance):
                d = haversine_meters(lat, lon, F.lit(float(node.lat)),
                                     F.lit(float(node.lon)))
                pred = d <= F.lit(float(node.meters))
            else:
                if node.left <= node.right:
                    lon_pred = ((lon >= F.lit(float(node.left)))
                                & (lon <= F.lit(float(node.right))))
                else:
                    # antimeridian-crossing box (ES left > right, r9):
                    # the lon band wraps — ≥ left OR ≤ right
                    lon_pred = ((lon >= F.lit(float(node.left)))
                                | (lon <= F.lit(float(node.right))))
                pred = ((lat <= F.lit(float(node.top)))
                        & (lat >= F.lit(float(node.bottom)))
                        & lon_pred)
            pred = F.coalesce(pred, F.lit(False))
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, GeoPolygon):
            # even-odd ray casting, shared with the geo index-served
            # plan (functions/geo.py::polygon_contains) so both plans
            # match bit-identically
            from cassandra_es_index_spark.functions.geo import (
                geo_point_cols, polygon_contains,
            )

            ref = self.resolve(node.field)
            try:
                lat, lon = geo_point_cols(ref.col, ref.dtype, node.field)
            except ValueError as e:
                raise CompileError(str(e)) from e
            pred = F.coalesce(polygon_contains(lat, lon, node.points),
                              F.lit(False))
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, GeoGridCell):
            # geo_grid (r12): cell-key equality — the SAME key math as
            # the grid aggregations, so query and agg cells agree
            # bit-for-bit
            from cassandra_es_index_spark.functions.geo import (
                geo_point_cols, geohash_col, geotile_key,
            )

            ref = self.resolve(node.field)
            try:
                lat, lon = geo_point_cols(ref.col, ref.dtype, node.field)
            except ValueError as e:
                raise CompileError(str(e)) from e
            if node.kind == "geohash":
                kcol = geohash_col(lat, lon, len(node.key))
            else:
                zoom = int(node.key.split("/")[0])
                kcol = geotile_key(lat, lon, zoom)
            pred = F.coalesce(kcol == F.lit(node.key), F.lit(False))
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, GeoOnLine):
            # exact point-on-polyline (r12 geo_shape linestring) —
            # per-segment collinearity + bbox, pure Column math
            from cassandra_es_index_spark.functions.geo import (
                geo_point_cols, line_contains,
            )

            ref = self.resolve(node.field)
            try:
                lat, lon = geo_point_cols(ref.col, ref.dtype, node.field)
            except ValueError as e:
                raise CompileError(str(e)) from e
            pred = F.coalesce(line_contains(lat, lon, node.points),
                              F.lit(False))
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, GeoExists):
            # geo-point presence (r11): both coordinates non-null — the
            # null-exclusion leg of geo_shape relation `disjoint`
            # (struct(null, null) is non-null, so Exists can't express
            # it). Scores 1 like the other geo leaves, so
            # And((GeoExists, Not(shape))) keeps the geo filter score
            # convention.
            from cassandra_es_index_spark.functions.geo import (
                geo_point_cols,
            )

            ref = self.resolve(node.field)
            try:
                lat, lon = geo_point_cols(ref.col, ref.dtype, node.field)
            except ValueError as e:
                raise CompileError(str(e)) from e
            pred = lat.isNotNull() & lon.isNotNull()
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, (SpanOr, SpanFirst, SpanNot,
                             SpanContaining)):
            # single-token span algebra (r8) + containing/within (r9):
            # position arrays via split + filtered index sequences, the
            # SpanNear machinery; the span_not survival count and the
            # containing/within span math are shared with the
            # index-served plan (positional.span_not_count /
            # span_near_tuple_spans / span_containing_count) so both plans
            # count bit-identically
            from cassandra_es_index_spark.search.positional import (
                span_containing_count, span_near_tuple_spans,
                span_not_count,
            )

            from cassandra_es_index_spark.search.ast import TermPattern
            for attr in ("terms", "include_terms", "exclude_terms",
                         "little_terms", "big_terms"):
                if any(isinstance(t, TermPattern)
                       for t in getattr(node, attr, ()) or ()):
                    raise CompileError(
                        "span_multi is data-driven (term-dictionary "
                        "expansion) — run it through SearchEngine, "
                        "which resolves it before compile "
                        "(_expand_data_nodes)")
            ref = self.resolve(node.field)
            if not isinstance(ref.dtype, T.StringType):
                raise CompileError(
                    "span queries support plain string fields")
            toks = F.split(F.lower(ref.col), r"\W+")
            idx = F.sequence(F.lit(0), F.size(toks) - 1)

            def positions(term: str) -> Column:
                t = F.lit(term.lower())
                return F.filter(
                    idx, lambda i: (F.length(F.element_at(toks, i + 1))
                                    > 0)
                    & (F.element_at(toks, i + 1) == t))

            def union(terms: tuple) -> Column:
                arrs = [positions(t) for t in dict.fromkeys(terms)]
                return arrs[0] if len(arrs) == 1 else F.concat(*arrs)

            if isinstance(node, SpanContaining):
                little = union(node.little_terms)
                if node.big_near is not None:
                    # N-ary big (r11): per-slot union position arrays
                    # → qualifying tuple spans, the same window rule
                    # as span_near's tuple count
                    slots, slop, in_order = node.big_near
                    big = span_near_tuple_spans(
                        [union(tuple(c)) for c in slots],
                        slop, in_order)
                else:
                    big = F.transform(
                        union(node.big_terms),
                        lambda p: F.struct(p.alias("s"), p.alias("e")))
                cnt = F.coalesce(
                    span_containing_count(big, little, node.within),
                    F.lit(0))
            elif isinstance(node, SpanOr):
                cnt = F.coalesce(F.size(union(node.terms)), F.lit(0))
            elif isinstance(node, SpanFirst):
                # single-token span END = p+1 ≤ end ⇔ p < end
                cnt = F.coalesce(
                    F.size(F.filter(union(node.terms),
                                    lambda p: p < F.lit(int(node.end)))),
                    F.lit(0))
            else:
                cnt = F.coalesce(
                    span_not_count(union(node.include_terms),
                                   union(node.exclude_terms),
                                   node.pre, node.post),
                    F.lit(0))
            return cnt > 0, cnt
        if isinstance(node, Boosting):
            # ES boosting: positive gates matching; a doc also matching
            # the negative keeps matching with its score scaled by
            # negative_boost (demote, don't exclude)
            pred, score = self._walk(node.positive)
            npred, _ = self._walk(node.negative)
            demoted = F.coalesce(npred, F.lit(False))
            return pred, F.when(
                demoted,
                score.cast("double") * F.lit(float(node.negative_boost))
            ).otherwise(score.cast("double"))
        if isinstance(node, Nested):
            # ES nested query: the child evaluates PER ELEMENT of the
            # array<struct> column (so `a.x = 1 AND a.y = 2` must hold in
            # the SAME element, unlike flattened-field matching); the doc
            # matches when any element does, and the doc score combines
            # the matching elements' child scores per score_mode. All
            # higher-order array functions — JVM-side, no UDF.
            ref, _, epred, escore = self._nested_fns(node)
            matches = F.filter(ref.col, epred)
            # a null array yields null filter/size — treat as no match
            n = F.coalesce(F.size(matches), F.lit(0))
            pred = n > 0
            if node.score_mode == "none":
                return pred, F.when(pred, F.lit(0.0)).otherwise(0.0)
            scores = F.transform(matches, escore)
            total = F.aggregate(scores, F.lit(0.0), lambda a, x: a + x)
            combined = {
                "sum": total,
                "avg": total / n,
                "max": F.array_max(scores),
                "min": F.array_min(scores),
            }.get(node.score_mode)
            if combined is None:
                raise CompileError(
                    f"unknown nested score_mode {node.score_mode!r}")
            return pred, F.coalesce(F.when(pred, combined), F.lit(0.0))
        if isinstance(node, Ids):
            # ES `ids` query: match on the engine doc-id field. Equality on
            # `_id` (string, synthesized from the primary key) — a constant
            # IN-list that Catalyst pushes into the scan; score 1 per hit
            # like the other non-text leaves.
            if not any(f.name == "_id" for f in self.schema.fields):
                raise CompileError("ids query needs the _id document field")
            pred = F.col("_id").isin(*node.values) if node.values else F.lit(False)
            return pred, F.when(pred, 1).otherwise(0)
        if isinstance(node, Not):
            pred, _ = self._walk(node.child)
            return ~F.coalesce(pred, F.lit(False)), F.lit(0)
        if isinstance(node, Should):
            # optional score boost, matching clauses only (same gating
            # rationale as Or — a compound child must not leak partial
            # tf); min_count > 0 (r9) gates on the count of matching
            # clauses — ES bool minimum_should_match
            if not node.children:
                return F.lit(True), F.lit(0)
            parts = [self._walk(c) for c in node.children]
            score = self._gated(*parts[0])
            for p, s in parts[1:]:
                score = score + self._gated(p, s)
            if node.min_count > 0:
                matched = sum(
                    (F.when(p, 1).otherwise(0) for p, _ in parts),
                    F.lit(0))
                return matched >= F.lit(node.min_count), score
            return F.lit(True), score
        if isinstance(node, Scoreless):
            pred, _ = self._walk(node.child)
            return pred, F.lit(0)
        raise CompileError(f"unknown node {node!r}")


class _ElementCompiler:
    """Compiler facade bound to ONE array element (a lambda variable of
    a higher-order function) — resolves leaf fields against the
    element's struct type instead of the DataFrame schema, then reuses
    the full Compiler walk for predicates and scores."""

    def __init__(self, elem: Column, dtype, spark) -> None:
        self._elem = elem
        self._dtype = dtype
        self._spark = spark
        self.schema = dtype          # duck-typed for Compiler methods
        self.default_field = None

    def resolve(self, path: str | None) -> FieldRef:
        if path is None:
            raise CompileError("nested leaves must name a field")
        parts = path.split(".")
        fld = next((f for f in self._dtype.fields if f.name == parts[0]),
                   None)
        if fld is None:
            raise CompileError(
                f"no nested field {parts[0]!r} in element struct")
        col, dtype = self._elem.getField(parts[0]), fld.dataType
        for part in parts[1:]:
            if isinstance(dtype, T.StructType):
                sub = next((f for f in dtype.fields if f.name == part),
                           None)
                if sub is None:
                    raise CompileError(
                        f"no struct field {part!r} in {path!r}")
                col, dtype = col.getField(part), sub.dataType
            elif isinstance(dtype, T.MapType):
                col, dtype = col.getItem(part), dtype.valueType
            else:
                raise CompileError(
                    f"cannot descend into {part!r} of {path!r}")
        return FieldRef(col, dtype)

    # reuse the real Compiler's machinery against the element binding
    _typed_lit = Compiler._typed_lit
    _text_tf = Compiler._text_tf
    _token_match_tf = Compiler._token_match_tf
    _fuzzy_tf = Compiler._fuzzy_tf
    _leaf_text = Compiler._leaf_text
    # staticmethod() re-wrap: a bare `Compiler._gated` assignment makes
    # it an instance method here, so `self._gated(p, s)` would pass
    # self as the predicate (Should/Or inside nested crashed pre-r8)
    _gated = staticmethod(Compiler._gated)
    _walk = Compiler._walk
