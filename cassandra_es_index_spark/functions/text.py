"""Text-analysis column functions (north-star operators, SURVEY.md §7 phase 5).

All built-in Column expressions — no Python in the hot path, so these run
inside WholeStageCodegen over arbitrarily large corpora. Regex patterns use
only RE2-safe constructs so a DuckDB oracle can evaluate the same logic.

The reference punts on text processing entirely (it delegates analysis to
Elasticsearch analyzers, ref README.md:483-487); these functions are the
engine-native equivalent of a basic analyzer chain plus the LLM-pipeline
metrics (token counts, quality scores, language ID, fingerprints).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = r"\s+"

# Tiny, deterministic stopword lists per language for the n-gram/stopword
# language-ID heuristic. Order matters: ties resolve in this priority.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "y", "es", "una"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization, lowercased (the engine's default analyzer)."""
    return F.split(F.lower(F.trim(col)), WS)


def token_count(col: Column) -> Column:
    """Number of whitespace tokens (LongType)."""
    return F.size(tokens(col)).cast("long")


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


# BPE-style pre-tokenization pattern (the public GPT-2 shape, simplified to
# RE2-safe constructs — no lookahead — so the same pattern runs in Spark's
# Java regex and the DuckDB oracle): contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs.
BPE_ISH = (r"'(?:[sdmt]|ll|ve|re)"
           r"| ?[A-Za-z]+"
           r"| ?[0-9]+"
           r"| ?[^A-Za-z0-9\s]+")


def bpe_ish_tokens(col: Column) -> Column:
    """Subword-style pre-tokens — the unit LLM training budgets count.
    One whitespace word often yields several pre-tokens ("don't" → 3),
    so this tracks tokenizer cost more closely than whitespace counting."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH), F.lit(0))


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col)).cast("long")


def stopword_count(col: Column, words: list[str]) -> Column:
    """Total occurrences of any of ``words`` as whole tokens."""
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("long")


def type_token_ratio(col: Column) -> Column:
    """Lexical diversity = distinct/total tokens, rounded for portability."""
    return F.round(distinct_token_count(col) / token_count(col), 6)


def quality_score(col: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: rewards mid-length docs
    and lexical diversity, penalizes very short or highly repetitive text.

        q = least(1, tokens/100) * (distinct/tokens)

    The formula is intentionally simple and published so the oracle can
    reproduce it exactly.
    """
    n = token_count(col)
    return F.round(F.least(F.lit(1.0), n / F.lit(100.0)) * (distinct_token_count(col) / n), 6)


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID. Returns the language whose stopword list
    matches the most tokens; ties break by the priority order of
    ``LANG_STOPWORDS``; zero votes everywhere → 'und' (undetermined)."""
    scores = {lang: stopword_count(col, words)
              for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the WHEN chain in reverse priority so earlier langs win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def dup_token_fraction(col: Column | None = None,
                       toks: Column | None = None) -> Column:
    """Fraction of token occurrences that repeat an earlier token
    (1 − distinct/total) — the word-level repetition signal LLM data
    pipelines (Gopher/CCNet-style filters) threshold on."""
    toks = tokens(col) if toks is None else toks
    n = F.size(toks)
    return F.round((n - F.size(F.array_distinct(toks))) / n, 6)


def bigrams_of(toks: Column) -> Column:
    """Word-bigram array ('w1 w2' strings) from a token array — one
    zip_with against the shifted slice, every input evaluated once."""
    sz = F.size(toks)
    tail = F.slice(toks, 2, F.greatest(sz - 1, F.lit(0)))
    pairs = F.zip_with(toks, tail, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(pairs, 1, F.greatest(sz - 1, F.lit(0)))


def dup_bigram_fraction(col: Column | None = None,
                        toks: Column | None = None) -> Column:
    """Fraction of word bigrams that duplicate another bigram in the same
    document — catches looping/boilerplate text that single-token stats
    miss. 0 for documents with fewer than two tokens."""
    toks = tokens(col) if toks is None else toks
    sh = bigrams_of(toks)
    total = F.size(sh)
    frac = F.round((total - F.size(F.array_distinct(sh))) / total, 6)
    return F.when(F.size(toks) >= 2, frac).otherwise(F.lit(0.0))


def max_run_count(toks: Column) -> Column:
    """Count of the most frequent element in a token array: sort, then
    fold once carrying (prev, run, best) — O(n log n) per row. (The naive
    count-each-distinct formulation is O(distinct × tokens) and measured
    ~20× slower on the sf0.1 corpus.)"""
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))
    def step(acc: Column, t: Column) -> Column:
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(t.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))
    return F.aggregate(F.array_sort(toks), zero, step,
                       lambda acc: acc["best"])


def top_token_share(col: Column | None = None,
                    toks: Column | None = None) -> Column:
    """Share of the single most frequent token (Gopher's
    most-common-word filter). Pass a pre-tokenized array column via
    ``toks`` to share one tokenization across several metrics."""
    toks = tokens(col) if toks is None else toks
    return F.round(max_run_count(toks) / F.size(toks), 6)


def ngrams_of(toks: Column, n: int) -> Column:
    """Word n-gram array ('w1 … wn' strings) from a token array — one
    transform over the valid start offsets; empty for documents with
    fewer than n tokens."""
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.transform(F.sequence(F.lit(1), sz - n + 1),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def _gram_char_scores(grams: Column) -> Column:
    """Per-group char masses of the SORTED gram array via boundary
    positions — group starts are the indices where the sorted value
    changes, each group's mass is (next_start − start) × len(gram at
    start). Pure zip_with/filter/array_max HOFs over INT arrays:
    O(n log n) per row like the fold formulation this replaces, but
    ~30× faster in practice (r12 bench: the struct-state
    ``F.aggregate`` fold evaluated interpreted at ~600 µs/row; these
    stay in codegen). Returns struct(top = max group mass, dup = Σ
    masses of groups with count ≥ 2)."""
    # CAUTION (r12 perf lesson): never reference the gram array from
    # INSIDE a HOF lambda (element_at(g, i) etc.) — the captured outer
    # expression re-evaluates per element, turning O(n) into
    # O(n²·build). Every lambda below binds only its zipped elements;
    # the sorted array appears a constant number of times at the outer
    # level.
    g = F.array_sort(grams)
    n = F.size(g)
    # boundary flags: element i starts a group when it differs from its
    # predecessor (the shifted copy); the first element always does
    prev = F.concat(F.array(F.lit(None).cast("string")),
                    F.slice(g, 1, F.greatest(n - 1, F.lit(0))))
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)) \
        .otherwise(F.array().cast("array<int>"))
    flagged = F.zip_with(
        g, prev, lambda a, p: F.when(p.isNull() | (a != p),
                                     F.length(a)).otherwise(F.lit(-1)))
    # group start positions + the started group's gram LENGTH, aligned
    starts = F.filter(F.zip_with(flagged, idx,
                                 lambda fl, i: F.when(fl >= 0, i)
                                 .otherwise(F.lit(-1))),
                      lambda x: x >= 0)
    lens = F.filter(flagged, lambda x: x >= 0)
    nexts = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
        F.array(n + 1))
    runs = F.zip_with(starts, nexts, lambda s, e: e - s)
    top = F.coalesce(
        F.array_max(F.zip_with(runs, lens, lambda r, ln: r * ln)),
        F.lit(0))
    dup = F.coalesce(
        F.aggregate(F.zip_with(runs, lens,
                               lambda r, ln: F.when(r >= 2, r * ln)
                               .otherwise(F.lit(0))),
                    F.lit(0), lambda a, x: a + x), F.lit(0))
    return F.struct(top.alias("top"), dup.alias("dup"))


def _xxh64_long_np(x, seed):
    """Spark's ``XXH64.hashLong`` (catalyst XxHash64 over one LongType
    input) vectorized over numpy uint64 arrays — bit-identical to the
    JVM: h = seed + P5 + 8; h ^= rotl(x·P2, 31)·P1; h = rotl(h, 27)·P1
    + P4; then the standard xxh64 avalanche. All ops wrap mod 2^64
    exactly as Java long arithmetic does."""
    import numpy as np

    p1 = np.uint64(0x9E3779B185EBCA87)
    p2 = np.uint64(0xC2B2AE3D27D4EB4F)
    p3 = np.uint64(0x165667B19E3779F9)
    p4 = np.uint64(0x85EBCA77C2B2AE63)
    p5 = np.uint64(0x27D4EB2F165667C5)
    u64 = np.uint64(64)

    def rotl(v, r):
        r = np.uint64(r)
        return (v << r) | (v >> (u64 - r))

    h = seed + p5 + np.uint64(8)
    h = h ^ (rotl(x * p2, 31) * p1)
    h = rotl(h, 27) * p1 + p4
    h = h ^ (h >> np.uint64(33))
    h = h * p2
    h = h ^ (h >> np.uint64(29))
    h = h * p3
    h = h ^ (h >> np.uint64(32))
    return h


def _xxh64_pair_np(a, b):
    """Spark ``xxhash64(a, b)`` over two long columns (default seed
    42): hashLong(b, hashLong(a, 42)) — the per-argument seed chain of
    the catalyst XxHash64 expression, vectorized. Pinned bit-equal to
    the JVM expression in test_operators."""
    import numpy as np

    return _xxh64_long_np(b, _xxh64_long_np(a, np.uint64(42)))


_XXH64_MASK = (1 << 64) - 1
_XXH64_P1 = 0x9E3779B185EBCA87
_XXH64_P2 = 0xC2B2AE3D27D4EB4F
_XXH64_P3 = 0x165667B19E3779F9
_XXH64_P4 = 0x85EBCA77C2B2AE63
_XXH64_P5 = 0x27D4EB2F165667C5


def _xxh64_int_seed(i: int, seed: int = 42) -> int:
    """Spark's ``XXH64.hashInt`` (catalyst XxHash64 over one
    IntegerType input) in plain Python — how an int literal argument
    folds into the seed chain: ``xxhash64(lit(i), s)`` hashes ``s``
    with seed ``hashInt(i, 42)``. Returns an unsigned 64-bit int."""
    h = (seed + _XXH64_P5 + 4) & _XXH64_MASK
    h ^= ((i & 0xFFFFFFFF) * _XXH64_P1) & _XXH64_MASK
    h = ((((h << 23) | (h >> 41)) & _XXH64_MASK) * _XXH64_P2
         + _XXH64_P3) & _XXH64_MASK
    h ^= h >> 33
    h = (h * _XXH64_P2) & _XXH64_MASK
    h ^= h >> 29
    h = (h * _XXH64_P3) & _XXH64_MASK
    h ^= h >> 32
    return h


def _xxh64_bytes_prepare_np(buf, starts, lens):
    """Spark's ``XXH64.hashUnsafeBytes`` (catalyst XxHash64 over a
    StringType input — standard XXH64 over the UTF-8 bytes; verified
    bit-equal to the JVM on the pinned equivalence grid) vectorized
    over variable-length byte slices of one flat uint8 buffer.

    Per-string structure: ``len // 32`` 32-byte stripes through the
    four accumulator lanes, ``(len % 32) // 8`` tail words, one 4-byte
    word when ``len % 8 >= 4``, then ``len % 4`` single bytes, then
    the avalanche. All byte gathers are seed-INDEPENDENT, so they are
    hoisted here and the returned closure re-runs only the arithmetic
    per seed — the shape MinHash needs (num_hashes seeds over one
    shingle set).

    Returns ``run(seed:int) -> np.uint64[n]``."""
    import numpy as np

    u64 = np.uint64
    p1, p2, p3 = u64(_XXH64_P1), u64(_XXH64_P2), u64(_XXH64_P3)
    p4, p5 = u64(_XXH64_P4), u64(_XXH64_P5)
    sixty4 = u64(64)

    def rotl(v, r):
        r = u64(r)
        return (v << r) | (v >> (sixty4 - r))

    def g64(pos):
        w = buf[pos].astype(np.uint64)
        for j in range(1, 8):
            w |= buf[pos + j].astype(np.uint64) << u64(8 * j)
        return w

    n = starts.shape[0]
    stripes = lens // 32
    words = (lens % 32) // 8
    has32 = stripes > 0

    stripe_reads = []
    for k in range(int(stripes.max()) if n else 0):
        idx = np.flatnonzero(stripes > k)
        pos = starts[idx] + 32 * k
        stripe_reads.append((idx, g64(pos), g64(pos + 8),
                             g64(pos + 16), g64(pos + 24)))
    word_base = starts + 32 * stripes
    word_reads = []
    for k in range(int(words.max()) if n else 0):
        idx = np.flatnonzero(words > k)
        word_reads.append((idx, g64(word_base[idx] + 8 * k)))
    idx4 = np.flatnonzero((lens % 8) >= 4)
    pos4 = starts[idx4] + (lens[idx4] & ~np.int64(7))
    u32s = buf[pos4].astype(np.uint64)
    for j in range(1, 4):
        u32s |= buf[pos4 + j].astype(np.uint64) << u64(8 * j)
    tail = lens % 4
    tail_base = starts + lens - tail
    byte_reads = []
    for k in range(int(tail.max()) if n else 0):
        idx = np.flatnonzero(tail > k)
        byte_reads.append((idx, buf[tail_base[idx] + k]
                           .astype(np.uint64)))
    lens_u64 = lens.astype(np.uint64)

    def run(seed: int):
        h = np.full(n, u64((seed + _XXH64_P5) & _XXH64_MASK))
        if stripe_reads:
            m = has32
            v1 = np.full(n, u64((seed + _XXH64_P1 + _XXH64_P2)
                                & _XXH64_MASK))
            v2 = np.full(n, u64((seed + _XXH64_P2) & _XXH64_MASK))
            v3 = np.full(n, u64(seed & _XXH64_MASK))
            v4 = np.full(n, u64((seed - _XXH64_P1) & _XXH64_MASK))
            for (idx, w1, w2, w3, w4) in stripe_reads:
                v1[idx] = rotl(v1[idx] + w1 * p2, 31) * p1
                v2[idx] = rotl(v2[idx] + w2 * p2, 31) * p1
                v3[idx] = rotl(v3[idx] + w3 * p2, 31) * p1
                v4[idx] = rotl(v4[idx] + w4 * p2, 31) * p1
            hm = (rotl(v1[m], 1) + rotl(v2[m], 7)
                  + rotl(v3[m], 12) + rotl(v4[m], 18))
            for v in (v1, v2, v3, v4):
                hm = (hm ^ (rotl(v[m] * p2, 31) * p1)) * p1 + p4
            h[m] = hm
        h += lens_u64
        for (idx, w) in word_reads:
            h[idx] = rotl(h[idx] ^ (rotl(w * p2, 31) * p1), 27) \
                * p1 + p4
        if idx4.shape[0]:
            h[idx4] = rotl(h[idx4] ^ (u32s * p1), 23) * p2 + p3
        for (idx, b) in byte_reads:
            h[idx] = rotl(h[idx] ^ (b * p5), 11) * p1
        h = h ^ (h >> u64(33))
        h = h * p2
        h = h ^ (h >> u64(29))
        h = h * p3
        h = h ^ (h >> u64(32))
        return h

    return run


def _ngram_chain_batches(ns: frozenset, max_n: int):
    """mapInArrow generator factory: (id, th: list<long>, tl:
    list<int>) doc rows → per-(doc, n) rollup rows (id, n, top, dup,
    tot) — the hash chain AND the gram-identity aggregation computed
    with vectorized numpy. Bit-identical to the old zip_with/xxhash64
    Column chain + the (id, n, h, l) hash aggregation it fed (r15
    equality run: symmetric-diff 0 on the sf0.1 corpus and the edge
    fixtures; the hash itself is pinned by the xxh64 equivalence
    test): every doc's rows are complete inside one batch, so the
    whole gram-level groupBy collapses to a per-doc sort + run-length
    count here, and no gram-scale row ever crosses an exchange or the
    Arrow boundary back."""
    def gen(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            th_col = batch.column(1)
            tl_col = batch.column(2)
            offs = th_col.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # values are the UNSLICED child array — normalize to the
            # batch's own range so flat indexes line up with offsets
            th = th_col.values.to_numpy(zero_copy_only=False) \
                [offs[0]:offs[-1]].astype(np.uint64)
            tl = tl_col.values.to_numpy(zero_copy_only=False) \
                [offs[0]:offs[-1]].astype(np.int32)
            offs = offs - offs[0]
            lens = np.diff(offs)
            total = th.shape[0]
            # per flat token index: its doc ordinal and tokens left in
            # its doc (self included) — a level-n gram starting at flat
            # index j is real iff remaining[j] >= n (never crosses a
            # doc boundary)
            doc_idx = np.repeat(np.arange(lens.shape[0]), lens)
            remaining = np.repeat(offs[1:], lens) - np.arange(total)
            out_id, out_n, out_top, out_dup, out_tot = [], [], [], [], []

            def rollup(n, dv, hv, lv):
                # group the level's gram occurrences by (doc, h, l) —
                # the exact grouping key of the old groupBy — then
                # reduce each doc segment to (top, dup, tot) masses
                if dv.shape[0] == 0:
                    return
                order = np.lexsort((lv, hv, dv))
                dv, hv, lv = dv[order], hv[order], lv[order]
                new = np.empty(dv.shape[0], bool)
                new[0] = True
                new[1:] = ((dv[1:] != dv[:-1]) | (hv[1:] != hv[:-1])
                           | (lv[1:] != lv[:-1]))
                starts = np.flatnonzero(new)
                cnt = np.diff(np.append(starts, dv.shape[0]))
                mass = cnt.astype(np.int64) * lv[starts]
                gdoc = dv[starts]
                dnew = np.empty(gdoc.shape[0], bool)
                dnew[0] = True
                dnew[1:] = gdoc[1:] != gdoc[:-1]
                dstarts = np.flatnonzero(dnew)
                out_id.append(gdoc[dstarts])
                out_n.append(np.full(dstarts.shape[0], n, np.int32))
                out_top.append(np.maximum.reduceat(mass, dstarts))
                out_dup.append(np.add.reduceat(
                    np.where(cnt >= 2, mass, 0), dstarts))
                out_tot.append(np.add.reduceat(mass, dstarts))

            if 1 in ns:
                rollup(1, doc_idx, th.view(np.int64),
                       tl.astype(np.int64))
            h_prev, l_prev = th, tl
            for n in range(2, max_n + 1):
                k = n - 1
                if total > k:
                    # h_n[j] = xxhash64(h_{n-1}[j], th[j+n-1]); cross-
                    # doc garbage stays masked: j+k past the doc end
                    # for level n is past it for every level above too
                    h_cur = _xxh64_pair_np(h_prev[:total - k], th[k:])
                    l_cur = l_prev[:total - k] + tl[k:] + np.int32(1)
                else:
                    h_cur = np.empty(0, np.uint64)
                    l_cur = np.empty(0, np.int32)
                if n in ns:
                    valid = remaining[:h_cur.shape[0]] >= n
                    rollup(n, doc_idx[:h_cur.shape[0]][valid],
                           h_cur[valid].view(np.int64),
                           l_cur[valid].astype(np.int64))
                h_prev, l_prev = h_cur, l_cur
            idv = np.concatenate(out_id) if out_id else \
                np.empty(0, np.int64)
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(idv)),
                 pa.array(np.concatenate(out_n) if out_n else
                          np.empty(0, np.int32)),
                 pa.array(np.concatenate(out_top) if out_top else
                          np.empty(0, np.int64)),
                 pa.array(np.concatenate(out_dup) if out_dup else
                          np.empty(0, np.int64)),
                 pa.array(np.concatenate(out_tot) if out_tot else
                          np.empty(0, np.int64))],
                names=["_id", "n", "top", "dup", "tot"])
    return gen


def ngram_repetition_stats(df, id_col: str, text_col: str,
                           ns: tuple = (2, 3, 5)):
    """Per-document Gopher n-gram repetition statistics for several n
    at once: one Arrow-vectorized pass rolls every doc up to
    (doc, n, top, dup, tot) char masses, then one pivot back to
    columns (`top{n}_frac` = char-mass share of the most frequent
    n-gram; `dup{n}_frac` = char-mass share of occurrences whose gram
    repeats). Docs with fewer than n tokens get 0 via the final LEFT
    join.

    PRECONDITION (ADVICE r15): ``id_col`` must be unique per row. The
    per-row Arrow rollup treats each row as its own document; rows
    sharing an id would keep the MAX of their per-row fractions where
    the pre-r15 global groupBy pooled their gram counts first.
    Every corpus this engine ingests keys documents uniquely; callers
    with repeated ids must pre-aggregate (or dedup) before calling.

    Why not the per-row Column functions below: the grouped statistics
    need either a per-row sorted fold (struct-state ``F.aggregate`` —
    measured ~600 µs/row interpreted) or nested HOFs whose captured
    arrays re-evaluate multiplicatively (r12: 30 s → 175 s on the
    sf0.1 corpus). The Column functions remain for small-document
    row-local use.

    HASH-CHAINED gram identity (r13): the statistic only needs gram
    IDENTITY (for the count) and gram LENGTH (for the char mass), so
    no n-gram string is ever BUILT — level n's hashes chain from
    level n−1's (h_n[i] = xxhash64(h_{n−1}[i], th[i+n−1])) and the
    lengths accumulate the same way. Same equivalence classes as
    hashing the concatenated string (64-bit collisions within one
    document's grams are negligible — the dedup module's documented
    hashed-identity trade); ~5× less allocation than materializing
    gram strings, which kept triggering a mid-suite GC wave that
    poisoned the bench entries AFTER this one (r13 finding).

    Arrow-vectorized chain + rollup (r15, guide §4.2/§2.3): the r13
    form built the chain with ~9 nested zip_with/slice layers
    evaluated by the interpreted HOF path — per-element interpreter
    work whose C2 compilation CHURNED across runs (measured: 25 s of
    aggregate JIT time during a 7.9 s run, walls swinging
    [41, 12, 8, 15, 2.8, 1.5] in one session as each run's fresh
    codegen classes re-polluted the shared interpreter call sites) —
    and exploded gram rows into a 3-level hash-aggregation chain. Both
    now happen in ONE mapInArrow over (id, token-hash array,
    token-length array): the same xxhash64 chain in vectorized numpy
    (bit-identical — pinned by the xxh64 equivalence test) plus the
    per-(doc, n) rollup as a sort + run-length count (every doc's rows
    are complete inside one batch, so the gram-level groupBy needs no
    exchange and no gram-scale row ever crosses the Python boundary
    back — the output is ≤ len(ns) rows per doc). Walls
    [6.1, 1.1, 1.0, 0.8] first-session vs the old form's
    [16.4, 10.0, 3.8, 3.6] on the same corpus, no cliffs; only the
    two shallow per-token transforms (hash, length) remain
    JVM-interpreted, and the boundary carries ~16 B/token in and
    ~40 B/doc out, never text.

    Parallelism guard (r13): the chain + rollup is a CPU-AMPLIFYING
    projection — its cost is invisible to AQE's byte-based coalescing,
    so a small-byte input (one parquet file → one scan partition; an
    AQE-coalesced exchange) serializes the whole map stage on one core
    (measured 9.8 s → 1.3 s at sf0.1, 7.6×). When the input's
    parallelism is below the session default, widen it by
    EXPLICIT-count hash repartition on the doc id (an explicit count
    is exempt from AQE coalescing). A big input (the 100 TB case)
    already has ≥ default-parallelism partitions and is never
    collapsed."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        df = df.repartition(want, id_col)
    toks = tokens(F.col(text_col))
    th = F.transform(toks, lambda t: F.xxhash64(t))
    tl = F.transform(toks, lambda t: F.length(t))
    arr = df.select(F.col(id_col).alias("_id"), th.alias("_th"),
                    tl.alias("_tl"))
    id_type = arr.schema["_id"].dataType.simpleString()
    per = (arr.mapInArrow(
        _ngram_chain_batches(frozenset(ns), max(ns)),
        schema=f"_id {id_type}, n int, top bigint, dup bigint, "
               "tot bigint")
        .withColumnRenamed("_id", id_col))
    stats = per.groupBy(id_col).agg(
        *[F.round(F.max(F.when(F.col("n") == n,
                               F.col("top") / F.col("tot"))), 6)
          .alias(f"top{n}_frac") for n in ns],
        *[F.round(F.max(F.when(F.col("n") == n,
                               F.col("dup") / F.col("tot"))), 6)
          .alias(f"dup{n}_frac") for n in ns])
    out = df.select(id_col).join(stats, on=id_col, how="left")
    for n in ns:
        out = (out.withColumn(f"top{n}_frac",
                              F.coalesce(f"top{n}_frac", F.lit(0.0)))
               .withColumn(f"dup{n}_frac",
                           F.coalesce(f"dup{n}_frac", F.lit(0.0))))
    return out


def top_ngram_char_fraction(col: Column | None = None, n: int = 2,
                            toks: Column | None = None) -> Column:
    """Gopher's top n-gram filter signal (n ∈ 2..4 in the paper): the
    char-mass share of the single most frequent word n-gram —
    count×chars of that gram over the char mass of ALL n-gram
    occurrences (the self-normalized variant: bounded [0,1] by
    construction, deterministic, oracle-mirrorable). 0 for documents
    with fewer than n tokens."""
    toks = tokens(col) if toks is None else toks
    grams = ngrams_of(toks, n)
    total = F.aggregate(F.transform(grams, F.length),
                        F.lit(0), lambda a, x: a + x)
    top = _gram_char_scores(grams)["top"]
    return F.when(total > 0, F.round(top / total, 6)).otherwise(F.lit(0.0))


def dup_ngram_char_fraction(col: Column | None = None, n: int = 5,
                            toks: Column | None = None) -> Column:
    """Gopher's duplicate n-gram filter signal (n ∈ 5..10 in the
    paper): the char-mass share of n-gram occurrences whose gram occurs
    at least twice in the document — every occurrence of a repeated
    gram counts (the paper dedups overlapping character positions; this
    occurrence-mass variant is the deterministic, oracle-mirrorable
    form, documented). 0 for documents with fewer than n tokens."""
    toks = tokens(col) if toks is None else toks
    grams = ngrams_of(toks, n)
    total = F.aggregate(F.transform(grams, F.length),
                        F.lit(0), lambda a, x: a + x)
    dup = _gram_char_scores(grams)["dup"]
    return F.when(total > 0, F.round(dup / total, 6)).otherwise(F.lit(0.0))


def lines_of(col: Column) -> Column:
    """Non-empty trimmed lines of a document (newline-split) — the
    unit of Gopher's line-level repetition filters."""
    raw = F.split(col, "\n")
    # one-arg lambda on purpose: F.trim has an optional second param,
    # and transform() passes (element, INDEX) to any 2-arg callable —
    # bare F.trim would silently become trim(element, trim=index)
    trimmed = F.transform(raw, lambda ln: F.trim(ln))
    return F.filter(trimmed, lambda ln: ln != "")


def dup_line_fraction(col: Column | None = None,
                      lns: Column | None = None) -> Column:
    """Fraction of lines that duplicate another line in the same
    document (1 − distinct/total) — Gopher's duplicate-line filter
    (boilerplate nav bars, repeated headers). 0 for single-line and
    empty documents. Pass a pre-split ``lns`` array to share one split
    across the line metrics."""
    lns = lines_of(col) if lns is None else lns
    n = F.size(lns)
    frac = F.round((n - F.size(F.array_distinct(lns))) / n, 6)
    return F.when(n >= 2, frac).otherwise(F.lit(0.0))


def dup_line_char_fraction(col: Column | None = None,
                           lns: Column | None = None) -> Column:
    """Fraction of line CHARACTERS inside duplicate lines — Gopher's
    companion signal (a repeated long footer weighs more than a
    repeated one-word line). Characters of every occurrence beyond a
    line's first count as duplicated: 1 − Σ distinct-line lengths /
    Σ all-line lengths, 0 when there are no duplicate lines."""
    lns = lines_of(col) if lns is None else lns
    chars = F.aggregate(F.transform(lns, F.length),
                        F.lit(0), lambda a, x: a + x)
    dchars = F.aggregate(
        F.transform(F.array_distinct(lns), F.length),
        F.lit(0), lambda a, x: a + x)
    frac = F.round((chars - dchars) / chars, 6)
    return F.when(chars > 0, frac).otherwise(F.lit(0.0))


# C4 terminal punctuation (Raffel et al. 2020 §2.2): a line survives
# only if it reads like a sentence — ends in . ! ? or a closing quote
_C4_TERMINAL_RE = r'[.!?"]$'


def c4_kept_lines(col: Column | None = None, lns: Column | None = None,
                  min_words: int = 5) -> Column:
    """Lines surviving the public C4 line rules (Raffel et al. 2020,
    "Exploring the Limits of Transfer Learning", §2.2): ends in a
    terminal punctuation mark, carries at least ``min_words``
    whitespace words (C4's 5), and does not mention javascript (the
    cookie/enable-JS boilerplate tell, matched case-insensitively).
    Pass a pre-split ``lns`` to share one split across line metrics."""
    if not isinstance(min_words, int) or min_words < 1:
        raise ValueError(
            f"min_words must be a positive integer, got {min_words!r}")
    lns = lines_of(col) if lns is None else lns
    return F.filter(
        lns,
        lambda ln: ln.rlike(_C4_TERMINAL_RE)
        & (F.size(F.filter(F.split(ln, r"\s+"),
                           lambda t: F.length(t) > 0))
           >= F.lit(min_words))
        & ~F.lower(ln).contains("javascript"))


def c4_clean(df, id_col: str, text_col: str, min_words: int = 5,
             min_kept_lines: int = 3):
    """The C4 cleaning stage as one corpus pass → (id, n_lines,
    n_kept, keep_doc, clean_text):

    - ``clean_text`` = the surviving lines (``c4_kept_lines``)
      re-joined with newlines;
    - ``keep_doc`` = kept-line count ≥ ``min_kept_lines`` (C4 drops
      pages with fewer than 3 sentences; the kept-line count is the
      documented sentence proxy — every kept line ends in terminal
      punctuation) AND the page mentions neither ``lorem ipsum``
      (case-insensitive) nor a ``{`` (C4's code-page tell).

    Pure Column algebra over one line split — no UDF, no shuffle; the
    downstream drop is ``df.where(keep_doc)``, a pushed filter."""
    if not isinstance(min_kept_lines, int) or min_kept_lines < 0:
        raise ValueError(f"min_kept_lines must be a non-negative "
                         f"integer, got {min_kept_lines!r}")
    base = df.select(F.col(id_col),
                     F.col(text_col).alias("_t"),
                     lines_of(F.col(text_col)).alias("_lns"))
    kept = c4_kept_lines(lns=F.col("_lns"), min_words=min_words)
    return (base.withColumn("_kept", kept)
            .select(
                id_col,
                F.size("_lns").cast("long").alias("n_lines"),
                F.size("_kept").cast("long").alias("n_kept"),
                ((F.size("_kept") >= F.lit(min_kept_lines))
                 & ~F.lower("_t").contains("lorem ipsum")
                 & ~F.col("_t").contains("{")).alias("keep_doc"),
                F.array_join("_kept", "\n").alias("clean_text")))


# Gopher quality-filter rules (Rae et al. 2021, Appendix A1.1 — the
# published heuristics every large-scale text pipeline reuses). The 8
# English "must contain ≥2 of" words from the paper:
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and",
                    "that", "have", "with")


def gopher_quality_flags(df, id_col: str, text_col: str,
                         min_words: int = 50,
                         max_words: int = 100_000,
                         stop_words: tuple = GOPHER_STOPWORDS,
                         min_stop_hits: int = 2):
    """The Gopher quality-rule battery, one row per document:
    (doc, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, stop_hits, keep) where
    ``keep`` is the conjunction of the paper's rules —

    - ``min_words ≤ n_words ≤ max_words``
    - mean word length in [3, 10]
    - symbol-to-word ratio (``#`` chars + ``...``/``…`` runs) ≤ 0.1
    - ≤ 90% of lines start with a bullet (``-``/``*``/``•``)
    - ≤ 30% of lines end with an ellipsis
    - ≥ 80% of words contain an alphabetic character
    - ≥ 2 distinct hits among the paper's 8 English stop words

    Pure Column math (one tokenize + one line split per doc, everything
    else derived in codegen), rounded fractions for oracle parity.
    Empty-line documents take the vacuous line fractions (0)."""
    col = F.col(text_col)
    raw_toks = F.col("_toks")
    lns = F.col("_lns")
    n = F.size(raw_toks)
    mean_len = F.round(
        F.aggregate(raw_toks, F.lit(0.0),
                    lambda acc, t: acc + F.length(t)) / n, 4)
    sym = (F.length(col) - F.length(F.replace(col, F.lit("#")))
           + (F.length(col) - F.length(F.replace(col, F.lit("..."))))
           / F.lit(3)
           + F.length(col) - F.length(F.replace(col, F.lit("…"))))
    symbol_ratio = F.round(sym / n, 6)
    n_lines = F.size(lns)
    bullet = F.size(F.filter(
        lns, lambda ln: ln.rlike(r"^[-*•]")))
    ellip = F.size(F.filter(
        lns, lambda ln: ln.rlike(r"(\.\.\.|…)$")))
    bullet_frac = F.when(n_lines > 0,
                         F.round(bullet / n_lines, 6)).otherwise(0.0)
    ellip_frac = F.when(n_lines > 0,
                        F.round(ellip / n_lines, 6)).otherwise(0.0)
    alpha = F.size(F.filter(raw_toks,
                            lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.round(alpha / n, 6)
    low = F.array_distinct(F.transform(raw_toks,
                                       lambda t: F.lower(t)))
    stop_hits = F.size(F.array_intersect(
        low, F.array(*[F.lit(w) for w in stop_words])))
    keep = ((n >= min_words) & (n <= max_words)
            & (mean_len >= 3.0) & (mean_len <= 10.0)
            & (symbol_ratio <= 0.1)
            & (bullet_frac <= 0.9) & (ellip_frac <= 0.3)
            & (alpha_frac >= 0.8) & (stop_hits >= min_stop_hits))
    return (df.select(
        F.col(id_col).alias("doc"), col,
        F.filter(F.split(F.trim(col), WS),
                 lambda t: t != "").alias("_toks"),
        lines_of(col).alias("_lns"))
        .select("doc",
                n.cast("long").alias("n_words"),
                mean_len.alias("mean_word_len"),
                symbol_ratio.alias("symbol_ratio"),
                bullet_frac.alias("bullet_line_frac"),
                ellip_frac.alias("ellipsis_line_frac"),
                alpha_frac.alias("alpha_word_frac"),
                stop_hits.cast("long").alias("stop_hits"),
                keep.alias("keep")))


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization + control-character strip (keeping
    \\t \\n \\r) — the first pass of every LLM text-cleaning pipeline
    (mojibake from mixed NFC/NFD sources makes identical strings
    compare unequal, breaking dedup and tokenization). Spark SQL has
    no normalization builtin, so this is an Arrow-batched pandas UDF —
    one vectorized `str.normalize('NFC')` per batch, no per-row Python
    (the sanctioned slow-path shape); the output is the Unicode
    standard's, byte-identical to DuckDB's ``nfc_normalize`` (the
    oracle's)."""
    from pyspark.sql.functions import pandas_udf

    def _norm(s):
        return s.str.normalize("NFC").str.replace(
            r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", regex=True)

    # lambda-style registration: this module's `from __future__ import
    # annotations` stringifies type hints, which pandas_udf's
    # signature inference can't resolve
    return pandas_udf(_norm, "string")(col)


# html_to_text entity subset: decoded in THIS order — ``&amp;`` LAST,
# so "&amp;lt;" decodes to the literal text "&lt;" (the classic
# double-decode pitfall), and numeric entities stay as-is (documented
# subset: no per-codepoint conversion in Column algebra)
_HTML_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                  ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                  ("&amp;", "&"))


def html_to_text(col: Column) -> Column:
    """Strip HTML to text — the first stage of a web-crawl pipeline
    (the C4/RefinedWeb extraction step, the regex-chain subset):
    script/style blocks drop with their CONTENT, every other tag
    becomes a space, the common named entities decode (``&amp;``
    last — see ``_HTML_ENTITIES``), and whitespace collapses to
    single spaces. Every pattern is RE2-safe (non-greedy spans, no
    backreferences — script and style are two separate passes for
    that reason), so the identical chain replays in the SQL oracle.
    Pure Column algebra: map-side, shuffle-free, codegen."""
    x = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?is)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, WS, " "))


def mojibake_repair(col: Column, max_passes: int = 2) -> Column:
    """Repair UTF-8-read-as-Latin-1 mojibake ("café" → "cafÃ©"): per
    value, re-encode as latin-1 and re-decode as UTF-8 while that
    round-trip is valid AND changes the string, up to ``max_passes``
    (double-encoded text needs two). Pure-ASCII and already-clean text
    are fixed points (the latin-1→utf-8 trip reproduces them), so the
    repair is idempotent and safe to run corpus-wide — the ftfy-lite
    core heuristic. Arrow-batched pandas UDF (encode/decode has no
    Column form); the oracle checks the INVERSE property instead of
    replaying it: repair(mangle(x)) == x with the expected value
    constructed from clean source text in plain SQL."""
    from pyspark.sql.functions import pandas_udf

    passes = int(max_passes)
    if passes < 1:
        raise ValueError("max_passes must be >= 1")

    def _fix_one(x):
        if x is None:
            return None
        cur = x
        for _ in range(passes):
            try:
                cand = cur.encode("latin-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                break
            if cand == cur:
                break
            cur = cand
        return cur

    def _fix(s):
        return s.map(_fix_one)

    return pandas_udf(_fix, "string")(col)


def mojibake_mangle(col: Column) -> Column:
    """The inverse fault injector: UTF-8 bytes re-read as Latin-1 —
    what a mis-configured reader does to clean text. Test/oracle
    helper for :func:`mojibake_repair` (latin-1 decodes any byte, so
    this never fails)."""
    from pyspark.sql.functions import pandas_udf

    def _mangle(s):
        return s.map(lambda x: None if x is None
                     else x.encode("utf-8").decode("latin-1"))

    return pandas_udf(_mangle, "string")(col)


def normalized_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), WS, " ")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.

    Exact-dedup key; portable (md5 is identical in every engine)."""
    return F.md5(normalized_text(col))


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array of 'w1 w2 w3' strings) for MinHash.

    Built by zip_with-chaining the token array against its own shifted
    slices: every array argument is evaluated ONCE per row. (The obvious
    ``transform(indices, i -> element_at(toks, i+j))`` formulation
    re-evaluates the full tokenizing split per element access inside the
    lambda — measured ~10x slower per corpus scan at sf0.1.)
    """
    toks = tokens(col)
    sz = F.size(toks)
    acc = toks
    for j in range(1, n):
        tail = F.slice(toks, j + 1, F.greatest(sz - j, F.lit(0)))
        # zip_with pads the shorter side with null; concat_ws skips nulls,
        # so tail entries hold partial shingles — sliced off below.
        acc = F.zip_with(acc, tail, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(acc, 1, F.greatest(sz - (n - 1), F.lit(0)))
    return F.when(sz >= n, full).otherwise(F.array(F.concat_ws(" ", toks)))


# --------------------------------------------------- PII redaction (r11)
# Training-data pipelines scrub contact/identifier strings before
# anything else sees the text. Patterns are RE2-safe (no lookaround, no
# backrefs) so the DuckDB oracle evaluates the IDENTICAL regexes; the
# replacement ORDER is part of the contract (emails first — they contain
# dots and digits that the later patterns would shred; SSN before IP
# before phone — each later pattern could otherwise swallow pieces of an
# earlier kind's match).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\b\d[\d() .-]{6,}\d\b", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Replace email / SSN-shaped / IPv4 / phone-shaped substrings with
    typed placeholder tokens, in the documented ``PII_PATTERNS`` order.
    Pure ``regexp_replace`` chain — whole-stage codegen, no UDF, one
    pass per pattern over the value (4 passes total, all map-side: at
    100 TB this is scan-bound, shuffle-free)."""
    out = col
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts (LongType) — the audit twin of
    ``redact_pii``; applied to the SAME progressively-redacted value so
    the counts match what redact_pii replaces (an email's digits never
    double-count as a phone)."""
    out: dict[str, Column] = {}
    cur = col
    for name, pat, rep in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(cur, F.lit(pat),
                                                F.lit(0))).cast("long")
        cur = F.regexp_replace(cur, pat, rep)
    return out
