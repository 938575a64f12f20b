"""Positional (phrase) index — chunk postings with positions.

The scan path evaluates a phrase ``"w1 w2 … wn"`` as the regex
``(?i)\\bw1\\s+w2\\s+…\\s+wn\\b`` over the raw text (``compile.py``,
``phrase_pattern``), counting NON-OVERLAPPING matches left-to-right
(``regexp_extract_all`` semantics). At 100 TB that is a full corpus scan
per phrase query; ES instead consults its positional postings
(term positions recorded at index time — ref README.md:179's query class
runs against a prebuilt index, never a scan).

This module is the engine's positional index, built so lookups are
BIT-EXACT with the scan regex:

- The text splits into whitespace-delimited **chunks** with positions
  (``\\s+`` is exactly the separator the phrase regex requires between
  words). Per chunk we store its leading word run, trailing word run,
  whole-chunk token (when the chunk is a single word run), and whether
  the chunk holds ≥2 word runs (``multi``).
- A candidate match of an n-word phrase at chunk ``p`` requires:
  ``tail(p) = w1``, ``whole(p+i) = w(i+1)`` for the middle words, and
  ``lead(p+n-1) = wn`` — precisely the character positions where the
  regex can match (``\\bw1`` forces w1 to be a maximal trailing run,
  ``\\s+`` forces chunk adjacency, ``wn\\b`` forces a maximal leading
  run).
- Regex counting is non-overlapping: after a match at ``p`` the scanner
  resumes AFTER wn, i.e. inside chunk ``p+n-1``. The next candidate may
  therefore start at ``p+n-1`` iff that chunk has a second word run
  (``multi``), else at ``p+n``. A per-doc fold over the sorted candidate
  starts applies exactly this rule — all JVM-side (``F.aggregate``), no
  UDFs, and the candidate arrays are phrase-frequency-sized (tiny).

Everything is DataFrame ops: filters on the (cached) chunk index,
equi-joins on (doc, start), one groupBy — the corpus text is never
re-scanned. Parity with the scan path is property-tested
(``tests/test_search_engine.py``) and oracle-checked (``search_phrase``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_RUN = r"\w+"


def build_chunks(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus → (doc, elem, pos, lead, tail, whole, multi) — one row per
    whitespace-delimited chunk of the field.

    ``lead``/``tail`` are the chunk's first/last maximal word run
    (lowered; empty when the chunk has none), ``whole`` the lowered chunk
    itself when it is exactly one word run (else null), ``multi`` whether
    the chunk holds ≥2 word runs (drives the non-overlap resume rule).
    ``elem`` is the element index for ``array<string>`` fields (0 for
    plain strings): the scan path evaluates the phrase regex per element
    and sums, so a match may never bridge two elements — joining
    candidates on (doc, elem, start) enforces exactly that. Like
    ``build_postings``, the input is repartitioned so tokenization
    parallelizes even from a single source file."""
    from pyspark.sql import types as T

    n_part = max(docs.sparkSession.sparkContext.defaultParallelism, 8)
    chunk = F.lower(F.col("_chunk"))
    dtype = docs.schema[text_col].dataType
    if isinstance(dtype, (T.ArrayType, T.MapType)):
        # arrays: one element per entry. Maps (the flattened-attribute
        # columns): one element per value — map<string,array<string>>
        # flattens first. The scan path evaluates the phrase regex per
        # value and sums, so any stable enumeration of values works as
        # the elem id.
        if isinstance(dtype, T.MapType):
            vals = F.map_values(F.col(text_col))
            if isinstance(dtype.valueType, T.ArrayType):
                vals = F.flatten(vals)
        else:
            vals = F.col(text_col)
        exploded = (docs.repartition(n_part)
                        .select(F.col(id_col).alias("doc"),
                                F.posexplode(vals).alias("elem", "_val"))
                        .select("doc", "elem",
                                F.posexplode(F.split(F.col("_val"), r"\s+"))
                                 .alias("pos", "_chunk")))
    else:
        exploded = (docs.repartition(n_part)
                        .select(F.col(id_col).alias("doc"),
                                F.lit(0).alias("elem"),
                                F.posexplode(F.split(F.col(text_col), r"\s+"))
                                 .alias("pos", "_chunk")))
    return (exploded
                .select(
                    "doc", "elem", "pos",
                    F.regexp_extract(chunk, f"^({_WORD_RUN})", 1).alias("lead"),
                    F.regexp_extract(chunk, f"({_WORD_RUN})$", 1).alias("tail"),
                    F.when(chunk.rlike(f"^{_WORD_RUN}$"), chunk).alias("whole"),
                    # ≥2 word runs ⟺ two word chars separated by non-word
                    # chars (kept regexp_extract_all-free so index-served
                    # plans are distinguishable from scan plans)
                    chunk.rlike(r"\w\W+\w").alias("multi"),
                ))


def _greedy_count(matches: Column, n: int) -> Column:
    """Non-overlapping match count from sorted candidate structs
    (start, multi_last) — the regex scanner's resume rule: after a match
    at ``start`` the next may begin at ``start+n-1`` when the last chunk
    has a spare word run, else ``start+n``."""
    zero = F.struct(F.lit(0).cast("long").alias("cnt"),
                    F.lit(-2147483648).alias("nxt"))
    step = lambda acc, x: F.when(  # noqa: E731 — aggregate lambda
        x["start"] >= acc["nxt"],
        F.struct(
            (acc["cnt"] + 1).alias("cnt"),
            (x["start"] + F.lit(n)
             - F.when(x["multi_last"], F.lit(1)).otherwise(F.lit(0))
             ).alias("nxt"))).otherwise(acc)
    return F.aggregate(matches, zero, step)["cnt"]


def phrase_counts(chunks: DataFrame, words: list[str],
                  score_col: str = "_score",
                  last_prefix: bool = False,
                  last_alternatives: tuple[str, ...] | None = None
                  ) -> DataFrame:
    """(doc, score=match count) for an n≥2-word phrase, bit-exact with the
    scan regex ``\\bw1\\s+…\\s+wn\\b`` including non-overlap counting.
    Every returned doc has score ≥ 1 (the leftmost candidate is always a
    genuine match), so the result set equals the scan predicate's.

    ``last_prefix`` (ES ``match_phrase_prefix``): the last slot matches
    any leading word run it prefixes — the regex twin ``wn\\w*`` consumes
    the whole run, so candidate starts and the non-overlap resume rule
    are unchanged (one candidate per chunk either way)."""
    n = len(words)
    if n < 2:
        raise ValueError("phrase_counts needs >= 2 words")
    words = [w.lower() for w in words]
    first = (chunks.where(F.col("tail") == words[0])
                   .select("doc", "elem", F.col("pos").alias("start")))
    parts = [first]
    for i, w in enumerate(words[1:-1], 1):
        parts.append(chunks.where(F.col("whole") == w)
                           .select("doc", "elem",
                                   (F.col("pos") - i).alias("start")))
    if last_alternatives is not None:
        # capped match_phrase_prefix expansion (ES max_expansions, r6):
        # the last slot's lead run must equal one of the concrete
        # dictionary expansions — the index twin of the regex
        # alternation (compile.phrase_pattern)
        last_pred = F.col("lead").isin(*[t.lower()
                                         for t in last_alternatives])
    elif last_prefix:
        last_pred = F.col("lead").startswith(words[-1])
    else:
        last_pred = F.col("lead") == words[-1]
    parts.append(chunks.where(last_pred)
                       .select("doc", "elem",
                               (F.col("pos") - (n - 1)).alias("start"),
                               F.col("multi").alias("multi_last")))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.join(p, on=["doc", "elem", "start"])
    # greedy count per (doc, elem) — regex scanning restarts per element —
    # then Σ over elements, matching the scan path's per-element sum
    per_elem = (cand.groupBy("doc", "elem")
                    .agg(F.sort_array(F.collect_list(
                        F.struct("start", "multi_last"))).alias("_m"))
                    .select("doc",
                            _greedy_count(F.col("_m"), n).alias("_c")))
    return (per_elem.groupBy("doc")
                    .agg(F.sum("_c").cast("long").alias(score_col)))


def build_token_positions(docs: DataFrame, id_col: str,
                          text_col: str) -> DataFrame:
    """Corpus → (doc, token, pos) — one row per token OCCURRENCE with its
    token position, the span-query twin of the scan path's position
    arrays (``compile.py`` SpanNear): ``split(lower(text), \\W+)`` with
    the array index as ``pos`` and empty entries dropped (a leading
    delimiter yields an empty slot whose index still counts, exactly like
    the scan's filtered index sequence — so span distances are bit-exact
    with the scan plan). Plain string fields only, matching the scan
    path's ``span_near`` support. Incrementally maintained under
    mutations by the same PostingsState mechanism as the other index
    kinds."""
    n_part = max(docs.sparkSession.sparkContext.defaultParallelism, 8)
    return (docs.repartition(n_part)
                .select(F.col(id_col).alias("doc"),
                        F.posexplode(F.split(F.lower(F.col(text_col)),
                                             r"\W+"))
                         .alias("pos", "token"))
                .where(F.length("token") > 0))


def span_pair_counts(tokens: DataFrame, first: str, second: str,
                     slop: int = 0, in_order: bool = True,
                     score_col: str = "_score") -> DataFrame:
    """(doc, score = number of qualifying position pairs) for a two-term
    ``span_near`` — bit-exact with the scan path's higher-order-function
    evaluation: pairs (a ∈ positions(first), b ∈ positions(second)) with
    ``b > a`` and ``b−a−1 ≤ slop`` (and the symmetric direction when
    ``in_order`` is false). Both sides are position filters on the
    token index; the pair match is an equi-join on ``doc`` with the
    distance residual — the corpus text is never re-scanned."""
    a = (tokens.where(F.col("token") == first.lower())
               .select("doc", F.col("pos").alias("_pa")))
    b = (tokens.where(F.col("token") == second.lower())
               .select("doc", F.col("pos").alias("_pb")))
    gap = F.lit(int(slop))
    ordered = (F.col("_pb") > F.col("_pa")) \
        & (F.col("_pb") - F.col("_pa") - 1 <= gap)
    cond = ordered if in_order else ordered | (
        (F.col("_pa") > F.col("_pb"))
        & (F.col("_pa") - F.col("_pb") - 1 <= gap))
    return (a.join(b, on="doc").where(cond)
             .groupBy("doc")
             .agg(F.count("*").cast("long").alias(score_col)))


def span_near_tuple_count(arrays: list, slop: int, in_order: bool):
    """Count of qualifying N-slot ``span_near`` tuples over per-slot
    position-array Columns (r10 — the N-ary generalization of the r6
    pair rule; for N = 2 it reduces to it exactly). A tuple (p₁…p_N),
    pᵢ ∈ arrays[i], qualifies when ``max(p) − min(p) + 1 − N ≤ slop``
    (Lucene SpanNearQuery's match width for single-token subspans) —
    strictly increasing under ``in_order``, pairwise-distinct
    otherwise. Nested higher-order functions generated at plan-build
    time; every nesting level prunes candidates against the already
    fixed positions (|pᵢ − pⱼ| ≤ slop + N − 1), so per-doc work is
    bounded by the pruned tuple count, not ∏ tf. Null arrays count 0.
    SHARED by the scan plan (position arrays from split) and the
    index-served plan (arrays collected from the token-position
    index), so both count bit-identically."""
    n = len(arrays)
    w = F.lit(int(slop) + n - 1)        # max allowed max(p) − min(p)
    arrs = [F.coalesce(a, F.array()) for a in arrays]
    if n == 1:
        return F.size(arrs[0])
    if in_order:
        def count_from(k, prev, head):
            cand = F.filter(arrs[k],
                            lambda p: (p > prev) & (p - head <= w))
            if k == n - 1:
                return F.size(cand)
            return F.aggregate(
                cand, F.lit(0),
                lambda acc, p: acc + count_from(k + 1, p, head))

        return F.aggregate(
            arrs[0], F.lit(0),
            lambda acc, p: acc + count_from(1, p, p))

    def count_from_u(k, chosen):
        def ok(p):
            cond = None
            for q in chosen:
                c = (p != q) & (F.abs(p - q) <= w)
                cond = c if cond is None else cond & c
            return cond if cond is not None else F.lit(True)

        cand = F.filter(arrs[k], ok)
        if k == n - 1:
            return F.size(cand)
        return F.aggregate(
            cand, F.lit(0),
            lambda acc, p: acc + count_from_u(k + 1, chosen + [p]))

    return count_from_u(0, [])


def span_near_hits(tokens: DataFrame, clauses, slop: int,
                   in_order: bool,
                   score_col: str = "_score") -> DataFrame:
    """(doc, score = qualifying tuple count) for an N-slot
    ``span_near`` from the token-position index — ONE
    ``token IN ⋃slots`` filter + one per-doc aggregation collecting
    each slot's position list, then the same ``span_near_tuple_count``
    Column math the scan plan compiles. Linear in the matched
    postings; the corpus is never re-tokenized. Slots are unions
    (span_or / expanded span_multi alternatives)."""
    slots = [tuple(dict.fromkeys(t.lower() for t in c))
             for c in clauses]
    wanted = sorted({t for s in slots for t in s})
    per_doc = (tokens.where(F.col("token").isin(wanted))
               .groupBy("doc")
               .agg(*[F.collect_list(
                          F.when(F.col("token").isin(list(s)),
                                 F.col("pos"))).alias(f"_s{i}")
                      for i, s in enumerate(slots)]))
    cnt = span_near_tuple_count(
        [F.col(f"_s{i}") for i in range(len(slots))], slop, in_order)
    return (per_doc.select("doc", cnt.cast("long").alias(score_col))
                   .where(F.col(score_col) > 0))


def interval_match_pred(arrays: list, ordered: bool,
                        max_gaps: int):
    """Predicate over per-term position arrays: do they admit an
    ``intervals``-``match`` occurrence tuple? (ast.IntervalsMatch
    semantics — width ``max(pos) − min(pos) + 1 − n ≤ max_gaps``,
    ``max_gaps = −1`` lifts the constraint, ``ordered`` requires query
    order.) Ordered mode checks each start position against the greedy
    earliest-next chain — minimal end for a fixed start, so the
    exists-check is exact. Pure higher-order-function Column math;
    arrays need not be sorted (only min/exists are consulted). Shared
    by the scan plan (position arrays from split) and the index-served
    plan (position lists collected from the token-position index), so
    both match bit-identically."""
    n = len(arrays)
    if n == 1:
        return F.size(F.coalesce(arrays[0], F.array())) > 0
    if ordered:
        # NB: the inner lambdas take exactly ONE parameter — a second
        # (even defaulted) parameter flips F.filter/F.exists into the
        # (element, index) form
        def after(arr, cur):
            return F.array_min(F.filter(arr, lambda x: x > cur))

        def chain(p1):
            cur = p1
            for arr in arrays[1:]:
                cur = after(arr, cur)
            ok = cur.isNotNull()
            if max_gaps >= 0:
                ok = ok & (cur - p1 + F.lit(1 - n) <= F.lit(max_gaps))
            return ok
        return F.exists(arrays[0], chain)
    nonempty = arrays[0].isNotNull() & (F.size(arrays[0]) > 0)
    for arr in arrays[1:]:
        nonempty = nonempty & arr.isNotNull() & (F.size(arr) > 0)
    if max_gaps < 0:
        return nonempty
    # unordered bounded width: some window of span n + max_gaps anchored
    # at an occurrence position covers one occurrence of every term (a
    # qualifying interval's min position is itself an occurrence, so
    # anchoring at occurrences loses nothing)
    span = n + max_gaps
    starts = F.concat(*arrays)

    def in_window(arr, s):
        return F.exists(arr, lambda p: (p >= s)
                        & (p <= s + F.lit(span - 1)))

    def covered(s):
        ok = F.lit(True)
        for arr in arrays:
            ok = ok & in_window(arr, s)
        return ok

    return nonempty & F.exists(starts, covered)


def interval_hits(tokens: DataFrame, terms: tuple, ordered: bool,
                  max_gaps: int, score_col: str = "_score") -> DataFrame:
    """(doc, 1) for docs whose token-position index rows admit an
    intervals-match tuple. One token filter (``token IN terms``) + one
    per-doc aggregation collecting each term's position list — linear
    in the matched postings, never a corpus re-tokenization; the width
    logic is the same ``interval_match_pred`` the scan plan compiles."""
    low = [t.lower() for t in terms]
    per_doc = (tokens.where(F.col("token").isin(low))
                     .groupBy("doc")
                     .agg(*[F.collect_list(
                               F.when(F.col("token") == t, F.col("pos")))
                             .alias(f"_p{i}")
                            for i, t in enumerate(low)]))
    pred = interval_match_pred([F.col(f"_p{i}") for i in range(len(low))],
                               ordered, max_gaps)
    return (per_doc.where(pred)
                   .select("doc", F.lit(1).cast("long").alias(score_col)))


def span_not_count(inc, exc, pre: int, post: int):
    """Count of include positions that survive ``span_not``: an include
    position p is rejected when some exclude position q falls in
    [p − pre, p + post] (single-token spans — ast.SpanNot). Pure
    higher-order Column math over two position arrays; SHARED by the
    scan plan (arrays from split) and the index-served plan (arrays
    collected from the token-position index) so both count
    bit-identically. A null/empty exclude array rejects nothing."""
    exc_safe = F.coalesce(exc, F.array())
    return F.size(F.filter(
        F.coalesce(inc, F.array()),
        lambda p: ~F.exists(
            exc_safe, lambda q: (q >= p - F.lit(int(pre)))
            & (q <= p + F.lit(int(post))))))


def span_or_hits(tokens: DataFrame, terms: tuple,
                 score_col: str = "_score") -> DataFrame:
    """(doc, score = count of matching token positions) for ``span_or``
    over single-token span_terms — ONE ``token IN terms`` filter + one
    per-doc count over the token-position index; Σ tf, the engine's Or
    convention (ast.SpanOr)."""
    low = list(dict.fromkeys(t.lower() for t in terms))
    return (tokens.where(F.col("token").isin(low))
                  .groupBy("doc")
                  .agg(F.count("*").cast("long").alias(score_col)))


def span_first_hits(tokens: DataFrame, terms: tuple, end: int,
                    score_col: str = "_score") -> DataFrame:
    """(doc, score = count of positions p with p < end) for
    ``span_first`` — a single-token span at p has END p+1, so p+1 ≤ end
    (Lucene SpanPositionRangeQuery(match, 0, end); ast.SpanFirst). The
    position bound pushes into the token filter — never a corpus
    scan."""
    low = list(dict.fromkeys(t.lower() for t in terms))
    return (tokens.where(F.col("token").isin(low)
                         & (F.col("pos") < F.lit(int(end))))
                  .groupBy("doc")
                  .agg(F.count("*").cast("long").alias(score_col)))


def span_not_hits(tokens: DataFrame, include_terms: tuple,
                  exclude_terms: tuple, pre: int, post: int,
                  score_col: str = "_score") -> DataFrame:
    """(doc, score = surviving include positions) for ``span_not`` —
    ONE ``token IN include ∪ exclude`` filter + one per-doc aggregation
    collecting both position lists, then the same ``span_not_count``
    the scan plan compiles (ast.SpanNot). Linear in the matched
    postings."""
    inc = list(dict.fromkeys(t.lower() for t in include_terms))
    exc = list(dict.fromkeys(t.lower() for t in exclude_terms))
    per_doc = (tokens.where(F.col("token").isin(inc + exc))
                     .groupBy("doc")
                     .agg(F.collect_list(
                              F.when(F.col("token").isin(inc),
                                     F.col("pos"))).alias("_inc"),
                          F.collect_list(
                              F.when(F.col("token").isin(exc),
                                     F.col("pos"))).alias("_exc")))
    cnt = span_not_count(F.col("_inc"), F.col("_exc"), pre, post)
    return (per_doc.select("doc", cnt.cast("long").alias(score_col))
                   .where(F.col(score_col) > 0))


def span_near_tuple_spans(arrays: list, slop: int, in_order: bool):
    """``array<struct<s, e>>`` of the qualifying N-slot ``span_near``
    tuple spans from per-slot position-array Columns (r11 — replaces
    the r9 two-clause ``span_big_spans``, emitting one [min, max] span
    per qualifying tuple under EXACTLY ``span_near_tuple_count``'s
    rule: max − min + 1 − N ≤ slop, strictly increasing under
    ``in_order``, pairwise-distinct otherwise; for N = 2 the spans are
    identical to the r9 pair rule b − a − 1 ≤ slop). Used by ``span_containing`` /
    ``span_within`` with an N-ary big clause; same nesting/pruning
    structure as the count twin, so per-doc work is bounded by the
    pruned tuple count. Null arrays yield an empty span list. SHARED
    by the scan and index-served plans, so both count
    bit-identically."""
    n = len(arrays)
    w = F.lit(int(slop) + n - 1)        # max allowed max(p) − min(p)
    arrs = [F.coalesce(a, F.array()) for a in arrays]
    if n == 1:
        return F.transform(arrs[0],
                           lambda p: F.struct(p.alias("s"),
                                              p.alias("e")))
    if in_order:
        def spans_from(k, prev, head):
            cand = F.filter(arrs[k],
                            lambda p: (p > prev) & (p - head <= w))
            if k == n - 1:
                return F.transform(
                    cand, lambda p: F.struct(head.alias("s"),
                                             p.alias("e")))
            return F.flatten(F.transform(
                cand, lambda p: spans_from(k + 1, p, head)))

        return F.flatten(F.transform(
            arrs[0], lambda p: spans_from(1, p, p)))

    def spans_from_u(k, chosen):
        def ok(p):
            cond = None
            for q in chosen:
                c = (p != q) & (F.abs(p - q) <= w)
                cond = c if cond is None else cond & c
            return cond if cond is not None else F.lit(True)

        cand = F.filter(arrs[k], ok)
        if k == n - 1:
            return F.transform(
                cand, lambda p: F.struct(
                    F.least(*chosen, p).alias("s"),
                    F.greatest(*chosen, p).alias("e")))
        return F.flatten(F.transform(
            cand, lambda p: spans_from_u(k + 1, chosen + [p])))

    return spans_from_u(0, [])


def span_containing_count(big_spans, little, within: bool):
    """``span_containing`` / ``span_within`` count over a
    ``array<struct<s, e>>`` of big spans and an array of single-token
    little positions: containing counts big spans holding ≥1 little
    position (s ≤ q ≤ e); within counts little positions inside ≥1 big
    span (ast.SpanContaining). SHARED by both plans so they count
    bit-identically."""
    big_safe = F.coalesce(big_spans, F.array())
    little_safe = F.coalesce(little, F.array())
    if within:
        return F.size(F.filter(
            little_safe,
            lambda q: F.exists(
                big_safe, lambda sp: (sp.getField("s") <= q)
                & (q <= sp.getField("e")))))
    return F.size(F.filter(
        big_safe,
        lambda sp: F.exists(
            little_safe, lambda q: (sp.getField("s") <= q)
            & (q <= sp.getField("e")))))


def span_containing_hits(tokens: DataFrame, big_terms: tuple,
                         big_near: tuple | None, little_terms: tuple,
                         within: bool,
                         score_col: str = "_score") -> DataFrame:
    """(doc, score) for ``span_containing``/``span_within`` from the
    token-position index — ONE ``token IN (big ∪ little)`` filter + one
    per-doc aggregation collecting the needed position lists, then the
    same ``span_near_tuple_spans``/``span_containing_count`` Column
    math the scan plan compiles. ``big_near`` is the N-ary form (r11):
    ``(slots, slop, in_order)`` with one union-of-alternatives term
    tuple per slot. Linear in the matched postings; the corpus is
    never re-tokenized."""
    little = list(dict.fromkeys(t.lower() for t in little_terms))
    if big_near is not None:
        slots, slop, in_order = big_near
        slots = [tuple(dict.fromkeys(t.lower() for t in c))
                 for c in slots]
        wanted = list(dict.fromkeys(
            [t for c in slots for t in c] + little))
        per_doc = (tokens.where(F.col("token").isin(wanted))
                   .groupBy("doc")
                   .agg(*([F.collect_list(
                               F.when(F.col("token").isin(list(c)),
                                      F.col("pos"))).alias(f"_b{i}")
                           for i, c in enumerate(slots)]
                          + [F.collect_list(
                                 F.when(F.col("token").isin(little),
                                        F.col("pos"))).alias("_lt")])))
        big = span_near_tuple_spans(
            [F.col(f"_b{i}") for i in range(len(slots))],
            slop, in_order)
    else:
        bigs = list(dict.fromkeys(t.lower() for t in big_terms))
        wanted = list(dict.fromkeys(bigs + little))
        per_doc = (tokens.where(F.col("token").isin(wanted))
                   .groupBy("doc")
                   .agg(F.collect_list(
                            F.when(F.col("token").isin(bigs),
                                   F.col("pos"))).alias("_bp"),
                        F.collect_list(
                            F.when(F.col("token").isin(little),
                                   F.col("pos"))).alias("_lt")))
        big = F.transform(F.col("_bp"),
                          lambda p: F.struct(p.alias("s"), p.alias("e")))
    cnt = span_containing_count(big, F.col("_lt"), within)
    return (per_doc.select("doc", cnt.cast("long").alias(score_col))
                   .where(F.col(score_col) > 0))
