"""Query AST shared by the query_string parser and the ES-DSL translator.

The reference ships the query text verbatim to Elasticsearch; our engine
parses it into this small algebra and compiles it to Catalyst expressions
(SURVEY.md §4 "custom Catalyst work actually needed", item 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Term(Node):
    """``field:value`` — exact token/term match. ``field=None`` means the
    default search field."""
    field: str | None
    value: str


@dataclass(frozen=True)
class Wildcard(Node):
    """``field:cassan*`` — ``*`` = any run of word chars, ``?`` = one."""
    field: str | None
    pattern: str


@dataclass(frozen=True)
class Phrase(Node):
    """``field:"hello world"`` — tokens adjacent in order.

    ``slop`` > 0 (``"hello world"~2``) allows up to ``slop`` intervening
    tokens PER GAP, in order. For two-word phrases (one gap) this is
    exactly Lucene's ordered slop; for longer phrases it is a documented
    superset of Lucene's total-move budget (any total-moves ≤ slop match
    also has every gap ≤ slop), and out-of-order transpositions (Lucene
    cost 2) are not matched.

    ``last_prefix`` (ES ``match_phrase_prefix``): the LAST word matches
    any token it prefixes (``\\blast\\w*``). ``max_expansions`` (ES
    default 50, r6): the engine expands the prefix against the term
    dictionary in term order and, when MORE than that many terms match,
    rewrites the node to ``last_alternatives`` — the capped, concrete
    expansion set the last slot must equal exactly (ES parity; both
    plans consume the same set). When the dictionary holds at most
    ``max_expansions`` matching terms the unbounded node is kept — the
    results are identical and the plans stay prefix-served.
    ``last_alternatives`` of ``()`` matches nothing (an empty-dictionary
    prefix compiles to a constant-false predicate)."""
    field: str | None
    text: str
    slop: int = 0
    last_prefix: bool = False
    max_expansions: int | None = None
    last_alternatives: tuple[str, ...] | None = None


@dataclass(frozen=True)
class Range(Node):
    """``field:[a TO b]`` / ``{a TO b}`` or ``field:>=v`` comparisons.

    ``lo``/``hi`` of None mean unbounded (``*``)."""
    field: str | None
    lo: str | None
    hi: str | None
    include_lo: bool = True
    include_hi: bool = True


@dataclass(frozen=True)
class Regexp(Node):
    """``field:/pat/`` / ES ``regexp`` query — TERM-anchored like ES:
    the pattern must match a whole (lowercased) token, ``^pat$``. Served
    from the term dictionary when postings exist; the scan path filters
    each document's token array.

    Syntax DEVIATION (documented in COVERAGE.md): patterns are JAVA
    regex (what ``rlike`` executes), not Lucene's regexp operators —
    Lucene's ``<1-10>`` numeric ranges, ``~`` complement, and ``&``
    intersection are not supported, while Java-only constructs
    (``\\p{Alpha}``, possessive quantifiers) ARE. Both serving paths
    validate with java.util.regex at compile time, so accept/reject does
    not depend on whether an index exists."""
    field: str | None
    pattern: str


@dataclass(frozen=True)
class Fuzzy(Node):
    """``field:value~N`` — tokens within ``max_edits`` edits of
    ``value`` match (Lucene fuzzy query). By default the engine uses
    classic Levenshtein (Spark's built-in ``levenshtein``): a
    transposition costs 2 edits — documented deviation (COVERAGE.md
    P1''; ES defaults ``fuzzy_transpositions=true``), identical on the
    scan and dictionary-served paths and pinned by
    ``test_fuzzy_transposition_costs_two_edits``.

    ``transpositions=True`` (r11, DSL ``fuzzy``/``match`` opt-in)
    prices an adjacent transposition at 1 edit using UNRESTRICTED
    Damerau–Levenshtein — computed exactly for budgets ≤ 2 by
    two-sided adjacent-swap enumeration (``compile.fuzzy_token_cond``:
    DL ≤ k ⟺ lev ≤ k, or one swap on either string then lev ≤ k-1,
    or a swap on each/two on one making them equal). This is the
    metric DuckDB's ``damerau_levenshtein`` implements (exact oracle
    parity); Lucene's automaton is the RESTRICTED variant (OSA) —
    identical except overlapping-edit corners like ca→abc (DL 2,
    OSA 3), a documented deviation pinned in tests. Budgets > 2 with
    transpositions are a typed error (ES caps fuzziness at 2).

    ``prefix_length`` (Lucene semantics): candidate tokens must share
    the query term's first ``prefix_length`` characters exactly; the
    edit budget applies to the remaining suffixes only.

    ``max_edits=None`` means AUTO (Lucene/ES default for ``term~`` and
    DSL ``"fuzziness": "AUTO"``): the budget depends on the QUERY term's
    length — 0 edits below ``auto_low`` chars, 1 below ``auto_high``,
    else 2 (``AUTO:low,high`` overrides the bounds). Resolve with
    ``fuzzy_edits``."""
    field: str | None
    value: str
    max_edits: int | None = 2
    auto_low: int = 3
    auto_high: int = 6
    transpositions: bool = False
    prefix_length: int = 0


def fuzzy_edits(node: "Fuzzy") -> int:
    """Resolve a Fuzzy node's edit budget: explicit ``max_edits``, or the
    Lucene/ES AUTO ladder on the query term's length."""
    if node.max_edits is not None:
        return node.max_edits
    n = len(node.value)
    return 0 if n < node.auto_low else (1 if n < node.auto_high else 2)


@dataclass(frozen=True)
class Boost(Node):
    """``clause^N`` / DSL ``boost`` param: the subtree's score scales by
    ``factor``; matching is unchanged. The engine's integer score surface
    truncates the scaled sum at the root (score stays reproducible and
    SQL-expressible)."""
    child: Node = None  # type: ignore[assignment]
    factor: float = 1.0


@dataclass(frozen=True)
class ConstantScore(Node):
    """ES ``constant_score``: the filter gates matching, every match
    scores exactly ``boost``."""
    child: Node = None  # type: ignore[assignment]
    boost: float = 1.0


@dataclass(frozen=True)
class Required(Node):
    """Parser-level marker for Lucene's ``+clause`` (must) operator in a
    default-OR juxtaposition group; regrouped into And/Should before
    compilation, but compilable standalone (≡ its child)."""
    child: Node = None  # type: ignore[assignment]


@dataclass(frozen=True)
class Exists(Node):
    """``_exists_:field`` — field is non-null."""
    field: str


@dataclass(frozen=True)
class Ids(Node):
    """ES ``ids`` query — match documents by engine doc id (``_id``)."""
    values: tuple[str, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class KnnClause(Node):
    """ES 8.12+ ``knn`` QUERY kind — vector search as a composable
    bool clause (vs the top-level ``knn`` SECTION): ``{"knn": {
    "field": f, "query_vector": [...], "num_candidates": N, "k": k,
    "filter": {...}, "similarity": s}}``. A DATA-DRIVEN node: the
    engine resolves it before compile
    (``SearchEngine._expand_data_nodes``) by running the vector search
    (IVF-served when an index exists, exact cosine otherwise — the
    same routing as the section form) for the top ``num_candidates``
    docs (≤ 10000, the ES ceiling; ``k`` truncates further,
    ``similarity`` floors the raw cosine, ``filter`` pre-gates), and
    rewrites to a ``ScoredIds`` literal — so the clause composes with
    the rest of the bool tree as an ordinary scored leaf. Compiling
    the raw node without the engine is a typed CompileError."""
    field: str
    vector: tuple = ()
    num_candidates: int = 100
    k: int | None = None
    filter_node: "Node | None" = None
    similarity: float | None = None


@dataclass(frozen=True)
class ScoredIds(Node):
    """Literal ``(_id → cosine)`` pairs — the RESOLVED form of a
    ``KnnClause``. Compiles to one constant-folded map literal probed
    by ``_id`` (Catalyst folds the all-literal map into a single
    runtime object — no codegen blowup at the 10k ES ceiling, pinned);
    predicate = containment, score = the DOUBLE similarity (a
    fractional scorer: the root cast stays double)."""
    pairs: tuple = ()   # ((id, score), ...)


@dataclass(frozen=True)
class HasChild(Node):
    """ES ``has_child`` query (the join-field parent/child surface):
    matches PARENT docs whose children (per a registered relation —
    ``SearchEngine.register_relation``, the engine's analogue of the ES
    join-field mapping) satisfy ``query``, with ``min_children``/
    ``max_children`` bounds and child-score combination per
    ``score_mode``. A DATA-DRIVEN node: the engine resolves it before
    compile (``SearchEngine._expand_join_nodes``) by running the child
    query against the child table, aggregating matches per parent key
    (one map-side-combinable groupBy), LEFT-joining the keyed aggregate
    onto the parent documents as hidden ``__rel_*`` columns, and
    rewriting to a ``JoinRelMatch`` — so the clause composes with the
    rest of the bool tree as an ordinary scored leaf and the whole
    thing stays one distributed plan (no driver collect; the keyed
    aggregate is AQE-broadcastable when the child match set is small).
    Compiling the raw node without the engine is a typed CompileError."""
    child_type: str = ""
    query: "Node | None" = None
    score_mode: str = "none"       # none|min|max|sum|avg (ES default none)
    min_children: int = 1
    max_children: "int | None" = None
    # ES inner_hits size (r13): when set (TOP-LEVEL join query only —
    # documented), each parent hit expands to its top-N matching
    # children ranked by child score desc, flattened as
    # `<child_type>_<field>` columns + `_inner_rank` (the join twin of
    # the nested inner_hits shape); hit selection/paging count PARENTS
    inner_size: "int | None" = None
    # inner_hits _source include-list (r13): limits which child fields
    # surface (None = all source fields)
    inner_source: "tuple[str, ...] | None" = None


@dataclass(frozen=True)
class HasParent(Node):
    """ES ``has_parent`` query: matches CHILD docs whose parent (per a
    registered relation) satisfies ``query``; ``score: true`` hands each
    child its parent's score (ES score mode; default false = predicate
    score 1). Engine-resolved like ``HasChild`` (one parent-side match
    frame, keyed LEFT join onto the child documents)."""
    parent_type: str = ""
    query: "Node | None" = None
    score: bool = False
    # ES inner_hits size (r13): each child hit expands to its matching
    # parent row (≤1 per unique parent key), flattened as
    # `<parent_type>_<field>` columns + `_inner_rank`
    inner_size: "int | None" = None
    inner_source: "tuple[str, ...] | None" = None


@dataclass(frozen=True)
class ParentIdQ(Node):
    """ES ``parent_id`` query: matches CHILD docs (of relation ``type``)
    whose parent key equals ``id``. Engine-resolved to a Range equality
    on the relation's child foreign-key column — no join needed."""
    child_type: str = ""
    id: str = ""


@dataclass(frozen=True)
class JoinRelMatch(Node):
    """RESOLVED form of ``HasChild``/``HasParent``: the other side's
    match set has been aggregated per join key and LEFT-joined onto the
    searched documents as hidden columns. Predicate = the joined match
    count within [min_children, max_children] (a missing join row
    counts 0, so ``min_children: 0`` matches parents with no matching
    children, like ES); score per ``mode``: ``none`` scores 1 per match
    (predicate-style, the ScriptFilter convention), ``min/max/sum/avg``
    read the pre-aggregated child score column, ``parent`` reads the
    parent's own score (has_parent ``score: true``)."""
    count_col: str = ""
    score_col: "str | None" = None
    mode: str = "none"
    min_children: int = 1
    max_children: "int | None" = None


@dataclass(frozen=True)
class MatchAll(Node):
    """``*:*`` / ES ``match_all``."""


@dataclass(frozen=True)
class MatchNone(Node):
    """ES ``match_none`` / Lucene MatchNoDocsQuery — matches nothing.

    Also the desugar target for empty analyzed input (``{"terms":
    {f: []}}``, ``{"match": {f: ""}}``, ``{"match_phrase": {f: ""}}``,
    ``{"multi_match": {"query": ""}}``): ES treats these as valid
    match-no-docs queries, not errors (MatchNoDocsQuery rewrite)."""


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Not(Node):
    child: Node = None  # type: ignore[assignment]


@dataclass(frozen=True)
class Should(Node):
    """ES bool ``should`` alongside must/filter: optional clauses that
    boost the score when matched but do not gate matching
    (ES ``minimum_should_match`` defaults to 0 when must/filter exist).

    ``min_count`` > 0 (r9) carries an explicit bool
    ``minimum_should_match``: at least that many should clauses must
    match (Lucene's BooleanQuery msm gate); the score stays the sum of
    ALL matching clauses. A floor above the clause count matches
    nothing."""
    children: tuple[Node, ...] = field(default_factory=tuple)
    min_count: int = 0


@dataclass(frozen=True)
class DisMax(Node):
    """ES/Lucene ``dis_max``: a doc matches when ANY subquery matches;
    its score is the BEST subquery's score plus ``tie_breaker`` × the sum
    of the other matching subqueries' scores (tie_breaker=0, the default,
    is pure max — the Lucene DisjunctionMaxQuery contract)."""
    children: tuple[Node, ...] = field(default_factory=tuple)
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class FunctionScore(Node):
    """ES ``function_score`` with a ``field_value_factor`` function: the
    child gates matching; the matched doc's ``field`` value maps through
    ``factor`` × ``modifier`` and combines with the query score per
    ``boost_mode``. ``missing`` substitutes for null field values (ES
    requires it server-side when the field is absent; the engine defaults
    it to 1.0). Modifiers follow ES's definitions — ``log`` family is
    log10, ``ln`` family natural."""
    child: Node = None  # type: ignore[assignment]
    field_name: str = ""
    factor: float = 1.0
    modifier: str = "none"
    missing: float = 1.0
    boost_mode: str = "multiply"


@dataclass(frozen=True)
class ScriptScore(Node):
    """ES ``function_score`` with a ``script_score`` function: the
    child gates matching; the function value is the script result —
    the painless arithmetic/comparison subset over ``doc['f'].value``
    refs (the same grammar script_fields/bucket_script accept),
    translated at parse time to one Spark SQL expression over the
    document columns and combined with the query score per
    ``boost_mode``. No script engine: anything beyond the arithmetic
    subset is a DslError (documented deviation). Function values are
    floored at 0 — ES rejects negative script scores at query time;
    the engine's lazy plans clamp instead (r8, deterministic on both
    plans) — and NULL results (0-divisor try_divide, NULL field refs)
    also score 0."""
    child: Node = None  # type: ignore[assignment]
    expr: str = ""                      # translated Spark SQL expression
    fields: tuple[str, ...] = field(default_factory=tuple)  # doc refs
    raw: str = ""                       # original source, for errors
    boost_mode: str = "multiply"
    # dense-vector function refs (r11 — cosineSimilarity/dotProduct/
    # l2norm over params vectors): fields that must resolve to a
    # numeric ARRAY column (typed CompileError otherwise)
    array_fields: tuple[str, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class DecayScore(Node):
    """ES ``function_score`` decay functions ``gauss``/``linear``/
    ``exp`` as closed-form Column math (no script engine):

        d      = max(0, |value − origin| − offset)
        gauss  = exp(d² · ln(decay) / scale²)
        exp    = exp(d · ln(decay) / scale)
        linear = max(0, (s − d) / s),  s = scale / (1 − decay)

    which are exactly ES's curves after substituting its σ²/λ/s
    pivots. On date fields ``origin`` may be date-math (``now``-anchored
    origins resolve through the engine's injectable ``now``, like range
    bounds) and ``scale``/``offset`` are durations (``10d``); the engine
    rewrites them to epoch-millis floats before compile, so both the
    scan plan and the range-index-served plan see plain numbers.
    Docs with a null field value take function value 1.0 (ES: missing
    docs are not decayed)."""
    child: Node = None  # type: ignore[assignment]
    field_name: str = ""
    kind: str = "gauss"                 # gauss | linear | exp
    origin: object = None               # number, or raw date-math string
    scale: object = None                # number, or raw duration string
    offset: object = 0.0
    decay: float = 0.5
    boost_mode: str = "multiply"


@dataclass(frozen=True)
class RandomScore(Node):
    """ES ``function_score`` ``random_score`` with ``seed`` + ``field``:
    deterministic per-doc pseudo-random value in [0, 1) derived from
    ``xxhash64(field, seed)`` — reproducible across runs and executors
    like ES's seeded variant (which hashes the field value with the
    seed). The unseeded form is rejected: a per-request wall-clock seed
    would break plan determinism (documented deviation)."""
    child: Node = None  # type: ignore[assignment]
    seed: int = 0
    field_name: str = ""
    boost_mode: str = "multiply"


@dataclass(frozen=True)
class ScoreFunction(Node):
    """One entry of a ``function_score`` ``functions`` ARRAY: an
    optional ``filter`` gating whether the entry applies to a doc, an
    optional ``weight`` multiplier, and an optional scorer carrier —
    one of FunctionScore / ScriptScore / DecayScore / RandomScore with
    ``child=MatchAll()`` and its ``boost_mode`` ignored (the array
    node's ``score_mode``/``boost_mode`` govern combination). A
    weight-only entry scores ``weight`` (ES's weight function). A Node
    subclass so the engine's generic date-math walker resolves Range
    bounds inside ``filter`` and decay pivots inside ``scorer``."""
    filter: Node | None = None
    weight: float | None = None
    scorer: Node | None = None


@dataclass(frozen=True)
class FunctionScoreArray(Node):
    """ES ``function_score`` with a ``functions`` array (the production
    relevance-tuning idiom; the reference forwards it verbatim to ES,
    ref ElasticIndex.java:663-667): per-doc, the entries whose
    ``filter`` matches (no filter = always) each yield
    ``weight × function value``; ``score_mode`` combines them —
    ``multiply`` (default) / ``sum`` / ``avg`` (weighted by the entry
    weights, ES's documented rule) / ``first`` / ``max`` / ``min`` —
    into one factor, 1.0 when NO entry applies (ES FunctionScoreQuery:
    the factor starts at 1 and only matching functions contribute).
    ``max_boost`` caps the combined factor; ``boost_mode`` then folds
    it into the query score. Scores stay DOUBLE (ES float-score
    semantics) — the array form is always a fractional scorer."""
    child: Node = None  # type: ignore[assignment]
    functions: tuple[ScoreFunction, ...] = field(default_factory=tuple)
    score_mode: str = "multiply"
    boost_mode: str = "multiply"
    max_boost: float | None = None


@dataclass(frozen=True)
class TermsSet(Node):
    """ES ``terms_set`` query: a doc matches when at least
    ``minimum_should_match`` of the supplied terms occur in the field —
    the per-doc threshold comes from a document field
    (``minimum_should_match_field``) or a painless arithmetic script
    over ``doc['f'].value`` refs and ``params.num_terms``
    (pre-substituted with the term count at parse). Lucene
    CoveringQuery semantics: thresholds below 1 are treated as 1; a
    doc whose threshold value is null matches nothing. Score = Σ leaf
    tf of the matched terms (the engine's Or convention). Compiles to
    a match-count floor over per-term tfs on the scan plan; with a
    postings index it serves as ONE `token IN terms` filter + per-doc
    (count, Σtf) aggregation joined to the threshold field's range
    index (doc-values analogue)."""
    field: str | None = None
    terms: tuple[str, ...] = ()
    msm_field: str | None = None
    msm_expr: str | None = None     # translated Spark SQL expression


@dataclass(frozen=True)
class IntervalsMatch(Node):
    """ES ``intervals`` query with a ``match`` rule (the modern
    positional query; ref: the reference forwards any DSL to ES,
    ElasticIndex.java:663-667). A doc matches when its token positions
    admit an occurrence tuple of ALL query terms with total gap count
    ``max(pos) − min(pos) + 1 − n ≤ max_gaps`` (``max_gaps = −1`` —
    the ES default — lifts the width constraint); ``ordered`` further
    requires the tuple to follow query order. Ordered matching checks
    each start against the GREEDY earliest-next chain, which attains
    the minimal end for a fixed start (Lucene's minimal-interval
    property), so the exists-check is exact. Evaluated with
    higher-order functions over position arrays on the scan plan; with
    a built token-position index (``build_span_index``) the same array
    logic runs over per-term position lists collected from the index —
    the corpus is never re-tokenized. DEVIATION (documented): matching
    docs score a flat 1 (predicate-style, like constant_score) — ES's
    interval scores are IDF/frequency-sampled and not reproducible."""
    field: str | None = None
    terms: tuple[str, ...] = ()   # plain default: `field` is shadowed
    ordered: bool = False
    max_gaps: int = -1


@dataclass(frozen=True)
class TermPattern:
    """A span term-slot holding a multi-term PATTERN instead of one
    token — the parse form of ES ``span_multi`` (Lucene
    SpanMultiTermQueryWrapper). DATA-DRIVEN: the engine expands it
    against the term dictionary into the concrete matching tokens
    before compile (``SearchEngine._expand_data_nodes``), capped at
    1024 expansions (Lucene's BooleanQuery max-clause ceiling — a
    wider pattern raises the same typed too-many-clauses error ES
    surfaces); the expanded node then behaves exactly like the
    equivalent ``span_or`` (union of positions). Compiling a raw
    pattern-carrying span without the engine is a typed CompileError.
    Kinds: ``prefix`` | ``wildcard`` | ``regexp`` | ``fuzzy``
    (``edits`` = the resolved edit budget, AUTO already applied;
    ``transpositions``/``prefix_length`` ride the shared
    ``compile.fuzzy_token_cond`` predicate, r11 — same semantics as
    the top-level fuzzy query)."""
    kind: str
    value: str
    edits: int = 2
    transpositions: bool = False
    prefix_length: int = 0


@dataclass(frozen=True)
class SpanNear(Node):
    """Lucene/ES ``span_near`` over N span clause slots (r10 — the r9
    engine accepted exactly two span_term clauses; Lucene SpanNearQuery
    is N-ary, ref ElasticIndex.java:663-667 forwards it verbatim).

    ``clauses`` is the general form: one tuple per slot, each a union
    of alternatives (plain terms from span_term/span_or; TermPattern
    from span_multi, expanded against the term dictionary upstream).
    A tuple (p₁…p_N), pᵢ from slot i's position set, qualifies when
    ``max(p) − min(p) + 1 − N ≤ slop`` (Lucene's match width for
    single-token subspans) with strictly increasing positions under
    ``in_order`` and pairwise-distinct positions otherwise. Score =
    number of qualifying tuples (deterministic, SQL-expressible — the
    N-ary generalization of the r6 pair count).

    ``first``/``second`` mirror the 2×single-term shape when it
    applies (legacy plan paths + span_containing's big-span shape);
    empty strings otherwise. Evaluated with nested higher-order
    functions over token-position arrays on the scan plan; with a
    built token-position index it serves as one token filter + one
    per-doc aggregation (N-ary) or a distance-predicate equi-join
    (two single terms) — bit-exact, corpus never re-tokenized."""
    field: str | None = None
    first: str = ""
    second: str = ""
    slop: int = 0
    in_order: bool = True
    clauses: tuple = ()
    # span_field_masking (r12): per-slot SOURCE field overrides — slot
    # i's positions come from slot_fields[i]'s token stream when set
    # (None = this node's field). Lucene FieldMaskingSpanQuery: the
    # masked clause REPORTS the outer field so span_near accepts the
    # mix; positions stay the inner field's. Masked span_nears always
    # take the scan plan (each slot tokenizes its own column; the
    # single-field span index can't serve a mixed-field tuple count —
    # documented).
    slot_fields: tuple = ()

    def slots(self) -> tuple:
        """Canonical N-slot form: ``clauses`` when present, else the
        legacy two-single-term shape."""
        return self.clauses if self.clauses \
            else ((self.first,), (self.second,))


@dataclass(frozen=True)
class SpanOr(Node):
    """Lucene/ES ``span_or`` over single-token ``span_term`` clauses
    (one shared field — the engine's documented span subset, like
    span_near's two-clause shape): a doc matches when ANY clause's
    token occurs; score = total count of matching token POSITIONS
    (Σ tf — Lucene SpanOrQuery's union-of-spans frequency, and the
    engine's Or convention). Also the composable clause form accepted
    inside ``span_first``/``span_not``."""
    field: str | None = None
    terms: tuple[str, ...] = ()


@dataclass(frozen=True)
class SpanFirst(Node):
    """Lucene/ES ``span_first``: spans of ``match`` (span_term or
    span_or — single-token spans) whose END position ≤ ``end``. A
    single-token span at position p (0-based) has end p+1, so the
    qualifying positions are p < end — Lucene
    SpanPositionRangeQuery(match, 0, end). Score = count of qualifying
    positions."""
    field: str | None = None
    terms: tuple[str, ...] = ()
    end: int = 0


@dataclass(frozen=True)
class SpanNot(Node):
    """Lucene/ES ``span_not``: ``include`` spans (span_term / span_or)
    that do NOT fall within ``pre`` tokens before or ``post`` tokens
    after any ``exclude`` span. For single-token spans an include
    position p survives when no exclude position q satisfies
    p − pre ≤ q ≤ p + post (``dist`` sets both, ES parity). Score =
    count of surviving include positions."""
    field: str | None = None
    include_terms: tuple[str, ...] = ()
    exclude_terms: tuple[str, ...] = ()
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanContaining(Node):
    """Lucene/ES ``span_containing`` / ``span_within`` (``within``
    flips the role): ``big`` spans that contain a ``little`` span —
    resp. ``little`` spans that lie inside a ``big`` span. The engine's
    span subset: ``little`` is single-token (span_term / span_or);
    ``big`` is either single-token or an N-ary ``span_near`` (r11 —
    the r9 shape accepted exactly two span_term clauses; now any
    2–8-clause near with union slots, matching span_near itself),
    whose qualifying tuples form spans [min(p), max(p)]
    (positional.span_near_tuple_spans — the same window rule as
    span_near's tuple count). A single-token little span at q is
    contained when s ≤ q ≤ e (a single-token big span contains only a
    co-positioned little — Lucene's containment on [start, end) spans,
    degenerate but exact). Score = count of qualifying big spans
    (containing) / surviving little positions (within) — the span
    family's count convention."""
    field: str | None = None
    big_terms: tuple[str, ...] = ()     # single-token big (union)
    # N-ary span_near big (r11): (slots, slop, in_order) — one
    # union-of-alternatives term tuple per slot
    big_near: tuple | None = None
    little_terms: tuple[str, ...] = ()
    within: bool = False


@dataclass(frozen=True)
class GeoDistance(Node):
    """ES ``geo_distance`` filter: docs whose geo_point field (the
    engine's geo_point is a ``struct<lat, lon>`` column, documented)
    lies within ``meters`` of the origin by haversine on ES's mean
    earth radius (GeoUtils.EARTH_MEAN_RADIUS). Score 1 per match, like
    the other predicate leaves. Distance strings parse ES units
    (m/km/mi/ft/nmi/...)."""
    field: str = ""
    lat: float = 0.0
    lon: float = 0.0
    meters: float = 0.0


@dataclass(frozen=True)
class GeoBoundingBox(Node):
    """ES ``geo_bounding_box`` filter: lat ∈ [bottom, top] and
    lon ∈ [left, right] — pure comparisons. Antimeridian-crossing
    boxes (left > right) are rejected at parse (documented engine
    subset). Score 1 per match."""
    field: str = ""
    top: float = 0.0
    left: float = 0.0
    bottom: float = 0.0
    right: float = 0.0


@dataclass(frozen=True)
class MoreLikeThis(Node):
    """ES ``more_like_this`` query: find documents resembling free text
    and/or existing documents. A DATA-DRIVEN node: the engine resolves
    it before compile (``SearchEngine._expand_data_nodes`` — the same
    engine-rewrite pattern as match_phrase_prefix ``max_expansions``)
    into a TermsSet over the top ``max_query_terms`` like-terms ranked
    by tf·idf (tf in the like text, idf = ln((N+1)/(df+0.5)) from the
    postings — the selection rule ``SearchEngine.more_like_this``
    already uses), thresholded by ``minimum_should_match``; with
    ``like`` doc ids and ``include=false`` (ES default) the source docs
    are excluded via And(…, Not(Ids)). Compiling the raw node without
    the engine is a typed CompileError — term selection needs corpus
    statistics. Engine subset (documented): exactly ONE field."""
    field: str | None = None
    like_texts: tuple[str, ...] = ()
    like_ids: tuple[str, ...] = ()
    # `unlike` (r11): texts/docs whose analyzed terms form a STOP SET —
    # excluded from candidate selection before the tf·idf ranking (ES
    # unlike semantics)
    unlike_texts: tuple[str, ...] = ()
    unlike_ids: tuple[str, ...] = ()
    max_query_terms: int = 25
    min_term_freq: int = 2
    min_doc_freq: int = 5
    max_doc_freq: int | None = None
    minimum_should_match: str = "30%"
    include: bool = False


@dataclass(frozen=True)
class TermsLookup(Node):
    """ES terms-lookup query: ``{"terms": {f: {"index": t, "id": i,
    "path": p}}}`` — the terms list comes from ONE other document's
    field (classic "my followers" filtering). A DATA-DRIVEN node like
    MoreLikeThis: the engine resolves it before compile
    (``SearchEngine._expand_data_nodes``) with ONE id-filtered lookup
    against the registered source table (bounded: one doc), turning the
    fetched value (array → many terms, scalar → one) into the plain
    terms disjunction; a missing doc / null / empty value matches
    nothing (ES). Lookup values are NOT analyzed (ES keyword
    semantics). Compiling the raw node without the engine is a typed
    CompileError — the terms live in another table's data."""
    field: str
    index: str
    id: str
    path: str


@dataclass(frozen=True)
class GeoPolygon(Node):
    """ES ``geo_polygon`` filter: docs whose geo_point lies inside the
    polygon by even-odd ray casting (a ray east from the point crosses
    an odd number of edges). ``points`` are (lat, lon) vertices in
    order, implicitly closed; horizontal edges never flip parity (the
    standard crossing rule — also keeps the slope finite). Pure Column
    comparisons per edge — planar semantics like ES's legacy
    geo_polygon (no great-circle edges, no antimeridian wrap;
    documented). Score 1 per match."""
    field: str = ""
    points: tuple = ()   # ((lat, lon), ...)


@dataclass(frozen=True)
class PercolateDoc(Node):
    """ES ``percolate`` QUERY kind (r12): searched against a table of
    STORED queries, it matches the rows whose query (the text in
    ``field``) matches the inline ``document`` — the DSL calling
    convention over the engine's ``percolate()`` primitive (the table
    side is the driver-bounded stored-query set, exactly ES's
    per-shard percolator memory index). The engine resolves it before
    compile (``_expand_data_nodes`` → ScoredIds), so bool composition,
    paging, and aggs all compose. ``documents`` (r12, the ES
    multi-document form) evaluates every slot in ONE percolate pass;
    a query's score is the SUM of its per-slot scores (the engine's Σ
    composition — ES reports per-slot fields instead, documented).
    Engine subset: all slots share one key set; raw compile without
    the engine is a typed CompileError."""
    field: str = ""
    # the inline document slot(s), canonical JSON per slot
    docs_json: tuple = ()


@dataclass(frozen=True)
class GeoGridCell(Node):
    """ES ``geo_grid`` query (r12): docs whose geo_point falls in ONE
    named grid cell — ``kind`` is ``geohash`` (base32 key, precision =
    key length) or ``geotile`` ("z/x/y"). Compiles to key-function
    equality (``geohash_col``/``geotile_key`` == the literal), so cell
    membership is bit-exact with the engine's grid aggregations; the
    geo index serves it by prefix-pruning cells then exact-verifying
    (geohash prefix property). Score 1 per match."""
    field: str = ""
    kind: str = "geohash"   # geohash | geotile
    key: str = ""


@dataclass(frozen=True)
class GeoOnLine(Node):
    """Docs whose geo_point lies exactly ON the open polyline (r12 —
    the ``geo_shape`` linestring/multilinestring query kinds against
    the point corpus): per-segment collinearity (cross product == 0)
    plus bounding-box containment, pure Column comparisons. Exact
    doubles — a measure-zero predicate by construction (meaningful for
    grid-aligned/synthetic data; ES's indexed variant has the same
    character at fine precision). ``points`` are (lat, lon) vertices,
    NOT closed. Score 1 per match."""
    field: str = ""
    points: tuple = ()   # ((lat, lon), ...), len >= 2


@dataclass(frozen=True)
class GeoShapeLookup(Node):
    """ES ``geo_shape`` with an ``indexed_shape`` reference: the query
    shape lives in ANOTHER document — ``{"geo_shape": {f:
    {"indexed_shape": {"index": t, "id": i, "path": p}, "relation":
    r}}}`` (the reference forwards geo_shape bodies verbatim,
    ElasticIndex.java:663-667; pre-registered shapes are ES's classic
    shared-geofence pattern). A DATA-DRIVEN node like TermsLookup: the
    engine resolves it before compile
    (``SearchEngine._expand_data_nodes``) with ONE id-filtered lookup
    against the registered source table, parses the fetched GeoJSON
    (a JSON string column), and desugars it through the same
    inline-shape algebra (``es_dsl.shape_to_node``) — so both the scan
    predicate and the covering-cell index-served plan are inherited
    unchanged. Unlike terms lookup, a missing document or null shape
    is a typed error (ES raises "shape not found", it does not
    match-none). Compiling the raw node without the engine is a typed
    CompileError — the shape lives in another table's data."""
    field: str
    index: str
    id: str
    path: str
    relation: str = "intersects"


@dataclass(frozen=True)
class GeoExists(Node):
    """Docs whose geo_point field carries a non-null point (BOTH
    coordinates non-null — a struct of two nulls is itself non-null,
    so the generic ``Exists`` cannot express this). The null-exclusion
    leg of ``geo_shape`` relation ``disjoint`` (r11): ES only matches
    documents that HAVE an indexed shape, so
    ``disjoint ≡ has-point AND NOT intersects``. Score 1 per match,
    like the other geo leaves."""
    field: str = ""


@dataclass(frozen=True)
class Boosting(Node):
    """ES ``boosting`` query: matches exactly the ``positive`` query;
    docs ALSO matching ``negative`` keep matching but their score
    multiplies by ``negative_boost`` (demote, don't exclude)."""
    positive: Node = None   # type: ignore[assignment]
    negative: Node = None   # type: ignore[assignment]
    negative_boost: float = 0.5


@dataclass(frozen=True)
class Nested(Node):
    """ES ``nested`` query over an ``array<struct>`` column: the child
    query evaluates PER ELEMENT (all its leaves must address fields
    under ``path``), a document matches when some element matches, and
    the document score combines the matching elements' child scores per
    ``score_mode`` (ES default ``avg``; ``none`` scores 0). Evaluated
    with higher-order array functions on the scan plan — element
    semantics have no postings analogue, so nested queries always scan
    (documented)."""
    path: str = ""
    child: Node = None  # type: ignore[assignment]
    score_mode: str = "avg"


@dataclass(frozen=True)
class Scoreless(Node):
    """ES bool ``filter`` context: gates matching, contributes no score."""
    child: Node = None  # type: ignore[assignment]


@dataclass(frozen=True)
class ScriptFilter(Node):
    """ES ``script`` query (filter context; the reference forwards it
    verbatim to ES, ref ElasticIndex.java:663-667): the painless
    arithmetic/comparison subset over ``doc['f'].value`` refs — the
    SAME grammar script_score / script_fields accept — translated at
    parse time to ONE Spark SQL boolean expression over the document
    columns. A doc matches when the expression evaluates TRUE; NULL
    (null field ref, try_divide by 0) matches nothing, mirroring
    painless's null-propagation into a false filter. The top-level
    operator must be a comparison (ES: a filter script must return a
    boolean; arithmetic-only scripts are a typed DslError at parse, not
    a runtime surprise). Predicate-style score: 1 per match."""
    expr: str = ""                      # translated Spark SQL expression
    fields: tuple[str, ...] = ()        # doc refs, for compile-time resolve
    raw: str = ""                       # original source, for errors


@dataclass(frozen=True)
class RankFeature(Node):
    """ES ``rank_feature`` query: docs with a POSITIVE numeric value in
    ``field`` match (ES's rank_feature field type only stores positive
    values; docs lacking the feature never match), scored by a
    saturating function of the value so that bigger is better but
    bounded:

        saturation  S = v / (v + pivot)
        log         S = ln(scaling_factor + v)
        sigmoid     S = v^exp / (v^exp + pivot^exp)
        linear      S = v

    times ``boost``. DEVIATION (documented): ES derives a default
    saturation pivot from index statistics (approximate geometric mean
    of the feature); the engine requires an explicit ``pivot`` — a
    data-dependent default would make the same query text mean
    different things as the corpus mutates. Fractional scorer: the
    tree keeps DOUBLE scores."""
    field: str = ""
    kind: str = "saturation"            # saturation | log | sigmoid | linear
    pivot: float | None = None          # saturation / sigmoid
    exponent: float | None = None       # sigmoid
    scaling_factor: float | None = None  # log
    boost: float = 1.0


@dataclass(frozen=True)
class DistanceFeature(Node):
    """ES ``distance_feature`` query: docs with a non-null ``field``
    match, scored by closeness to ``origin``:

        S = boost · pivot / (pivot + distance)

    On date fields distance is |value − origin| in millis and ``pivot``
    is a duration (``7d``); ``origin`` may be date-math
    (``now``-anchored origins resolve through the engine's injectable
    ``now``, like range bounds) — the engine rewrites both to plain
    millis before compile. On geo_point fields origin is a (lat, lon)
    point, distance is haversine meters, and ``pivot`` parses ES
    distance units (``1km``). Fractional scorer (DOUBLE scores)."""
    field: str = ""
    origin: object = None   # epoch-millis float | raw date-math str | (lat, lon)
    pivot: object = None    # millis/meters float | raw duration/distance str
    boost: float = 1.0
