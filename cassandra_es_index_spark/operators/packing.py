"""Token-budget sequence chunking — a training-data pipeline staple.

LLM pre-training packs documents into fixed-size token batches. The
assignment implemented here is the deterministic CONTIGUOUS chunking
used by streaming packers: walk the corpus in a stable order, keep a
running token total, and a document's chunk is its START offset divided
by the budget — ``chunk_id = floor((cumsum(tokens) − tokens) /
budget)``. Documents never reorder, the assignment is reproducible from
the order alone, and the result is SQL-expressible (one windowed prefix
sum), so the driver's DuckDB oracle checks it bit-for-bit.

Scale shape (the reason this is NOT one global window): a single
``Window.orderBy(id)`` collapses the corpus onto ONE task — the
classic 100 TB cliff. Instead the prefix sum is two-pass:

1. range-repartition on the order key (Spark samples split points, so
   partitions tile the key space in order),
2. per-partition running sums under a window PARTITIONED BY the
   physical partition id (parallel, no cross-partition shuffle),
3. one partition-count-sized aggregate of per-partition totals → the
   driver computes each partition's global OFFSET (a few thousand longs
   at any corpus size) and broadcasts it back as a join.

Total cost: one range shuffle + one map-side window + one broadcast
join — linear, no global sort on a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chunk_by_token_budget(df: DataFrame, id_col: str, tokens_col: str,
                          budget: int,
                          n_partitions: int | None = None) -> DataFrame:
    """Assign each document a ``chunk_id`` so chunks hold consecutive
    (by ``id_col``) documents whose token counts start within one
    ``budget`` window: ``chunk_id = floor(start_offset / budget)`` with
    ``start_offset`` the running token total of all PRECEDING documents.

    Returns (id, tokens, start_offset, chunk_id), one row per input
    document. A document longer than the budget still gets the chunk of
    its start offset (the packer's split-long-docs policy lives
    downstream; this operator is the deterministic assignment).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    n_part = n_partitions or max(
        spark.sparkContext.defaultParallelism, 8)
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(tokens_col).cast("long").alias("tokens"))
              .repartitionByRange(n_part, F.col("id")))
    pid = F.spark_partition_id()
    w = Window.partitionBy("_pid").orderBy("id") \
              .rowsBetween(Window.unboundedPreceding, 0)
    local = (base.withColumn("_pid", pid)
                 .withColumn("_local_end", F.sum("tokens").over(w)))
    # partition totals: partition-count-sized — the only driver data
    totals = (local.groupBy("_pid")
                   .agg(F.sum("tokens").alias("_tot"))
                   .orderBy("_pid").collect())
    offsets = []
    acc = 0
    for r in totals:
        offsets.append((r["_pid"], acc))
        acc += r["_tot"]
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    return (local.join(F.broadcast(off_df), "_pid")
                 .select("id", "tokens",
                         (F.col("_off") + F.col("_local_end")
                          - F.col("tokens")).alias("start_offset"))
                 .withColumn("chunk_id",
                             F.floor(F.col("start_offset")
                                     / F.lit(int(budget))).cast("long")))


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   seq_tokens: int, boundary_tokens: int = 1,
                   drop_last: bool = False,
                   n_partitions: int | None = None) -> DataFrame:
    """The packer's OUTPUT stage (r14): concat-and-cut the corpus token
    stream into fixed-length training sequences and emit the exact
    document spans each sequence holds — the last step between chunking
    (``chunk_documents``) / budget grouping (``chunk_by_token_budget``)
    and tokenizer sharding in an LLM data pipeline.

    Model: documents concatenate in ``id_col`` order, each followed by
    ``boundary_tokens`` end-of-document marker positions; the stream is
    cut every ``seq_tokens`` positions. Returns one row per
    (document, sequence) overlap:

    - ``seq_id``     — which fixed-length sequence,
    - ``id_col``     — the document,
    - ``seq_offset`` — where the span starts INSIDE the sequence,
    - ``doc_offset`` — where the span starts inside the document's
      token list (the downstream slice start),
    - ``span_tokens`` — span length.

    Span rows fully determine each sequence: content = spans in
    ``seq_offset`` order, boundary markers at every document end,
    anything past the stream end in the final sequence is padding
    (``drop_last=True`` drops that partial sequence — the common
    training choice; costs one single-row aggregate broadcast).
    Documents with zero tokens emit no span but still advance the
    stream by their boundary markers.

    Scale shape: the global start offsets come from
    ``chunk_by_token_budget``'s two-pass prefix sum (range partition →
    per-partition window → partition-count offset broadcast — never a
    global single-task window); the per-document sequence range then
    explodes in place with row multiplier ≈ doc_tokens / seq_tokens.
    Everything downstream is pure Column arithmetic, so the assignment
    is deterministic, engine-independent, and oracle-checkable."""
    if not isinstance(seq_tokens, int) or seq_tokens < 1:
        raise ValueError(
            f"seq_tokens must be a positive integer, got {seq_tokens!r}")
    if not isinstance(boundary_tokens, int) or boundary_tokens < 0:
        raise ValueError(
            f"boundary_tokens must be a non-negative integer, got "
            f"{boundary_tokens!r}")
    eff = df.select(
        F.col(id_col).alias("id"),
        (F.col(tokens_col).cast("long")
         + F.lit(int(boundary_tokens))).alias("eff"))
    base = chunk_by_token_budget(eff, "id", "eff", seq_tokens,
                                 n_partitions)
    L = F.lit(int(seq_tokens))
    n = (F.col("tokens") - F.lit(int(boundary_tokens))).alias("_n")
    start = F.col("start_offset")
    spans = (base.select("id", start, n)
             .where(F.col("_n") > 0)
             .select(
                 "id", "start_offset", "_n",
                 F.explode(F.sequence(
                     F.floor(start / L),
                     F.floor((start + F.col("_n") - 1) / L)))
                 .alias("seq_id")))
    seq_start = F.col("seq_id") * L
    span_start = F.greatest(start, seq_start)
    span_end = F.least(start + F.col("_n"), seq_start + L)
    out = spans.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("id").alias(id_col),
        (span_start - seq_start).cast("long").alias("seq_offset"),
        (span_start - start).cast("long").alias("doc_offset"),
        (span_end - span_start).cast("long").alias("span_tokens"))
    if drop_last:
        # total stream length: ONE single-row aggregate, broadcast —
        # the final sequence is partial unless the stream divides evenly
        total = eff.agg(F.sum("eff").alias("_total"))
        out = (out.crossJoin(F.broadcast(total))
                  .where(F.col("seq_id")
                         < F.floor(F.col("_total") / L))
                  .drop("_total"))
    return out


def pack_sequence_texts(df: DataFrame, id_col: str, text_col: str,
                        seq_tokens: int,
                        boundary_token: str = "<|endofdoc|>") -> DataFrame:
    """Materialized packed sequences: ``pack_sequences`` spans joined
    back to the source text, each span sliced out of the document's
    whitespace tokens, one ``boundary_token`` piece at every document
    end (a marker can open the NEXT sequence when the cut falls on the
    document end — GPT-style stream semantics), and the pieces
    assembled per sequence in stream order. Returns
    (seq_id, n_docs, token_count, seq_text): ``token_count`` counts
    content + marker tokens present — exactly ``seq_tokens`` for every
    sequence but the final partial one; ``n_docs`` counts documents
    CONTRIBUTING CONTENT to the sequence. Documents with zero tokens
    are dropped before packing (their text is empty — materializing a
    lone marker for them is noise; the span-table operator keeps them
    as stream positions for pipelines that need exact accounting).

    One join on the document id + one groupBy seq_id; the ordered
    assembly is an ``array_sort`` of (seq_offset, piece) structs —
    no window, no driver loop."""
    from .chunking import _raw_tokens

    toks = df.select(F.col(id_col).alias("_did"),
                     _raw_tokens(F.col(text_col)).alias("_toks"))
    counts = (toks.select("_did", F.size("_toks").alias("_n"))
              .where(F.col("_n") > 0))
    spans = pack_sequences(counts, "_did", "_n", seq_tokens,
                           boundary_tokens=1)
    L = F.lit(int(seq_tokens))
    joined = (spans.join(toks, "_did")
              .withColumn("_piece", F.array_join(
                  F.slice("_toks", F.col("doc_offset") + 1,
                          F.col("span_tokens")), " "))
              .withColumn("_end_global",
                          F.col("seq_id") * L + F.col("seq_offset")
                          + F.col("span_tokens"))
              .withColumn("_ends_doc",
                          F.col("doc_offset") + F.col("span_tokens")
                          == F.size("_toks")))
    content = joined.select(
        "seq_id",
        F.struct(F.col("seq_offset"), F.col("_piece").alias("piece"),
                 F.col("span_tokens").alias("n"),
                 F.lit(True).alias("is_doc")).alias("_p"))
    # the marker occupies the stream position right after the doc's
    # final content token — materialized as its own piece so a marker
    # falling on a sequence cut lands at the start of the next sequence
    markers = (joined.where("_ends_doc").select(
        F.floor(F.col("_end_global") / L).cast("long").alias("seq_id"),
        F.struct(
            F.pmod(F.col("_end_global"), L).cast("long")
            .alias("seq_offset"),
            F.lit(boundary_token).alias("piece"),
            F.lit(1).cast("long").alias("n"),
            F.lit(False).alias("is_doc")).alias("_p")))
    return (content.unionByName(markers)
            .groupBy("seq_id")
            .agg(F.array_sort(F.collect_list("_p")).alias("_ps"))
            .select(
                "seq_id",
                F.size(F.filter("_ps", lambda p: p["is_doc"]))
                .cast("long").alias("n_docs"),
                F.aggregate("_ps", F.lit(0).cast("long"),
                            lambda acc, p: acc + p["n"])
                .alias("token_count"),
                F.array_join(F.transform("_ps", lambda p: p["piece"]),
                             " ").alias("seq_text")))


# -- deterministic sampling / corpus mixing ---------------------------------

# Knuth multiplicative constant; the id first folds mod a prime so the
# product stays far inside int64 at ANY id magnitude (100 TB tables have
# ids past 2^32 — a raw multiply would overflow)
_MIX_PRIME = 100_003
_MIX_MULT = 2_654_435_761


def sample_bucket(id_col, modulus: int = 10_000):
    """Deterministic pseudo-random bucket in [0, modulus) from a numeric
    id — `((id % p) * knuth) % modulus`, pure int64 Column arithmetic
    reproducible in any engine (the DuckDB oracle runs the same three
    ops). No RNG, no seed state: the same row always lands in the same
    bucket, so samples are stable across runs, retries, and engines."""
    from pyspark.sql import functions as F

    folded = F.pmod(F.col(id_col).cast("long"), F.lit(_MIX_PRIME))
    return F.pmod(folded * F.lit(_MIX_MULT), F.lit(int(modulus)))


def weighted_sample(df: DataFrame, id_col: str, fraction: float,
                    modulus: int = 10_000) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows: bucket < fraction ×
    modulus. A pure filter — pushes into the scan, no shuffle, no RNG;
    sampling granularity is 1/modulus."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cut = int(round(fraction * modulus))
    return df.where(sample_bucket(id_col, modulus) < cut)


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      fractions: dict, default: float = 0.0,
                      modulus: int = 10_000) -> DataFrame:
    """Per-stratum deterministic sampling — keep ~``fractions[s]`` of
    each stratum (language, source, quality tranche); strata absent
    from the dict take ``default``. One CASE over the stratum column
    picks the cut, the keyed-hash bucket filter does the rest: a pure
    scan-pushable filter, no RNG, no shuffle, reproducible across
    runs, retries, and engines (the oracle replays the identical
    bucket arithmetic). The per-training-source rebalancing step when
    rates are chosen by hand rather than a temperature exponent."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for s, f in fractions.items():
        if not 0.0 <= float(f) <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], "
                             f"got {f!r}")
    if not 0.0 <= float(default) <= 1.0:
        raise ValueError(f"default fraction must be in [0, 1], "
                         f"got {default!r}")
    cut = F.lit(int(round(float(default) * modulus)))
    for s, f in fractions.items():
        cut = F.when(F.col(stratum_col) == F.lit(s),
                     F.lit(int(round(float(f) * modulus)))) \
               .otherwise(cut)
    return df.where(sample_bucket(id_col, modulus) < cut)


def temperature_fractions(counts: dict[str, int], alpha: float,
                          budget: int | None = None) -> dict[str, float]:
    """Per-source keep fractions for temperature-based mixture sampling
    (the multilingual pre-training staple — e.g. the exponent-0.7
    sampling of multilingual BERT / mT5): source *i* is sampled with
    probability ``p_i ∝ n_i^alpha``, flattening large-corpus dominance
    as ``alpha`` drops below 1 (``alpha=1`` = natural proportions,
    ``alpha=0`` = uniform).

    Given corpus sizes ``counts`` and a total document ``budget``
    (default: the total corpus size), the target take from source *i*
    is ``budget·p_i`` documents → fraction ``min(1, budget·p_i/n_i)``.
    Pure float arithmetic on a handful of driver scalars — the
    per-row work stays in ``weighted_sample``'s deterministic bucket
    filter. NOTE an oracle replaying this must repeat the identical
    operation order (pow → sum → divide → multiply → divide)."""
    if not counts:
        raise ValueError("temperature_fractions needs at least one "
                         "source count")
    if not (isinstance(alpha, (int, float))
            and not isinstance(alpha, bool) and 0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha!r}")
    for name, n in counts.items():
        if not isinstance(n, int) or n < 0:
            raise ValueError(f"count for {name!r} must be a "
                             f"non-negative integer, got {n!r}")
    total = sum(counts.values())
    if total == 0:
        return {name: 0.0 for name in counts}
    if budget is None:
        budget = total
    weights = {name: float(n) ** float(alpha) if n > 0 else 0.0
               for name, n in counts.items()}
    z = sum(weights.values())
    return {name: (min(1.0, budget * (w / z) / counts[name])
                   if counts[name] > 0 else 0.0)
            for name, w in weights.items()}


def temperature_mix(sources: list, id_col: str, alpha: float,
                    budget: int | None = None,
                    modulus: int = 10_000) -> DataFrame:
    """Deterministic temperature-sampled corpus mixture: one count per
    source (driver scalars), fractions from
    :func:`temperature_fractions`, then the same keyed-hash
    ``weighted_sample`` filter + union as :func:`mix_sources` — no
    RNG, reproducible across runs and engines. ``sources`` is
    ``[(name, df), ...]`` over UNION-compatible frames; rows carry a
    ``_source`` tag and the resolved ``_fraction``."""
    if not sources:
        raise ValueError("temperature_mix needs at least one source")
    counts = {name: df.count() for name, df in sources}
    fracs = temperature_fractions(counts, alpha, budget)
    parts = []
    for name, df in sources:
        parts.append(
            weighted_sample(df, id_col, fracs[name], modulus)
            .withColumn("_source", F.lit(str(name)))
            .withColumn("_fraction", F.lit(float(fracs[name]))))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_sources(sources: list, id_col: str,
                modulus: int = 10_000) -> DataFrame:
    """Weighted corpus mixture — the training-data rebalancing step
    (e.g. upsample a low-resource language, downsample boilerplate):
    ``sources`` is ``[(name, df, fraction), ...]`` over UNION-compatible
    frames; each source samples deterministically at its fraction and
    rows carry a ``_source`` tag. One filter per source + one union —
    linear, shuffle-free, reproducible."""
    from pyspark.sql import functions as F

    if not sources:
        raise ValueError("mix_sources needs at least one source")
    parts = []
    for name, df, fraction in sources:
        parts.append(weighted_sample(df, id_col, fraction, modulus)
                     .withColumn("_source", F.lit(str(name))))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
