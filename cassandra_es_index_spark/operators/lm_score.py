"""Corpus language-model scoring — the CCNet-style quality signal.

CCNet (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks web documents by the perplexity of
a language model trained on a clean reference corpus; low-perplexity
documents read like the reference, high-perplexity ones are boilerplate
and noise. The deterministic, engine-portable analogue here is a
UNIGRAM model with add-k smoothing estimated over the scored corpus
itself (or any reference DataFrame): every number is reproducible from
parquet alone, so the DuckDB oracle replays it bit-for-bit — no
external model artifacts (the reference engine, cassandra-es-index,
has no LM surface at all; this operator belongs to the LLM-pipeline
tier alongside operators/dedup.py and functions/text.py).

Scale shape (100 TB):
- the model pass is ONE token-grouped count (explode → groupBy token,
  map-side combined) — vocabulary-sized output, corpus-sized input
  read once;
- the two model scalars (total tokens, vocabulary size) come from one
  bounded aggregate collect (the auto_date_histogram pre-pass
  pattern), never a row scan;
- the scoring pass joins exploded tokens to the vocabulary on the
  token key — AQE broadcasts the vocab when it fits, else a plain
  equi-shuffle; the per-document aggregation map-side combines. No
  all-pairs, no driver loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cassandra_es_index_spark.functions.text import tokens


def unigram_model(df: DataFrame, text_col: str) -> DataFrame:
    """``(token, c)`` corpus unigram counts — one exploded count
    aggregation. The model table of :func:`cross_entropy_score`."""
    return (df.select(F.explode(tokens(F.col(text_col))).alias("token"))
              .groupBy("token").agg(F.count("*").alias("c")))


def cross_entropy_score(df: DataFrame, id_col: str, text_col: str,
                        model: DataFrame | None = None,
                        k: float = 0.5) -> DataFrame:
    """Per-document unigram cross-entropy (mean token ``−ln p``) under
    an add-``k``-smoothed corpus model — low = reads like the model
    corpus, high = noise (the CCNet ranking signal, unigram tier).

    ``p(t) = (c(t) + k) / (N + k·V)`` with ``N`` total model tokens
    and ``V`` the model vocabulary size; unseen tokens take the
    ``c = 0`` mass. Returns ``(id_col, n_tokens, xent)`` for documents
    with ≥ 1 token, ``xent`` rounded to 4 decimals (oracle float
    parity; rank on it directly — ties are exact after rounding).
    ``model`` defaults to the scored frame itself (self-perplexity,
    CCNet's bootstrap mode); pass a clean reference frame's
    :func:`unigram_model` for the classic setup.
    """
    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    if model is None:
        model = unigram_model(df, text_col)
    totals = model.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n"),
                       F.count("*").alias("v")).first()
    n_total, v = int(totals["n"]), int(totals["v"])
    denom = float(n_total) + k * float(v)
    if denom <= 0:
        raise ValueError("empty model corpus")
    logp = F.log((F.col("c").cast("double") + F.lit(float(k)))
                 / F.lit(denom))
    vocab = model.select("token", logp.alias("_logp"))
    # unseen-token log-prob is a plan-time constant: ln(k / denom)
    import math
    unseen = math.log(float(k) / denom)
    tok = df.select(F.col(id_col),
                    F.explode(tokens(F.col(text_col))).alias("token"))
    return (tok.join(vocab, "token", "left")
               .groupBy(id_col)
               .agg(F.count("*").alias("n_tokens"),
                    F.round(-F.avg(F.coalesce(F.col("_logp"),
                                              F.lit(unseen))), 4)
                     .alias("xent")))


def corpus_token_stats(df: DataFrame, text_col: str) -> DataFrame:
    """One-row corpus vocabulary report — the numbers every dataset
    card lists: ``n_docs``, ``total_tokens``, ``vocab_size``,
    ``hapax_frac`` (vocabulary share occurring exactly once — the
    Zipf tail), ``top1_share`` (corpus-mass share of the single most
    frequent token), ``mean_doc_tokens``. Two map-side-combinable
    aggregations (per-doc counts + the vocabulary frame), outputs
    rounded 6 dp. Scale shape: vocabulary-sized intermediate, one
    corpus scan feeding both aggs."""
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token")) \
            .where(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count("*").alias("c"))
    v = vocab.agg(
        F.sum("c").alias("total_tokens"),
        F.count("*").alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("_hapax"),
        F.max("c").alias("_top1"))
    d = df.agg(F.count("*").alias("n_docs"))
    return (d.crossJoin(v)
            .select("n_docs",
                    F.col("total_tokens").cast("long")
                    .alias("total_tokens"),
                    F.col("vocab_size").cast("long").alias("vocab_size"),
                    F.round(F.col("_hapax") / F.col("vocab_size"), 6)
                    .alias("hapax_frac"),
                    F.round(F.col("_top1") / F.col("total_tokens"), 6)
                    .alias("top1_share"),
                    F.round(F.col("total_tokens") / F.col("n_docs"), 6)
                    .alias("mean_doc_tokens")))


def ccnet_buckets(df: DataFrame, id_col: str, text_col: str,
                  model: DataFrame | None = None, k: float = 0.5,
                  lang_col: str | None = None,
                  n_buckets: int = 3) -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by LM
    cross-entropy and cut the ranking into ``n_buckets`` equal-depth
    tranches — per language when ``lang_col`` is given (CCNet buckets
    within each language so high-resource languages don't crowd out
    the rest). Returns (id, [lang,] n_tokens, xent, bucket) with
    bucket 1 = "head" (most reference-like) … n = "tail".

    Determinism: the rank orders (xent asc, id asc) — ties from the
    4-dp rounding break on id, so every engine replays the same
    tranche boundaries (``ntile`` semantics are standard SQL).

    Scale shape: one scoring pass (see :func:`cross_entropy_score`)
    plus one ntile window partitioned by language — the classic
    global-sort-per-partition cost; with no ``lang_col`` the window is
    global, which is exactly CCNet's single-corpus semantics (document
    that cost; shard by language to avoid it)."""
    from pyspark.sql.window import Window

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    scored = cross_entropy_score(df, id_col, text_col, model=model, k=k)
    cols = [id_col, "n_tokens", "xent"]
    if lang_col is not None:
        scored = scored.join(df.select(id_col, lang_col), on=id_col)
        w = Window.partitionBy(lang_col).orderBy(F.asc("xent"),
                                                 F.asc(id_col))
        cols = [id_col, lang_col, "n_tokens", "xent"]
    else:
        w = Window.orderBy(F.asc("xent"), F.asc(id_col))
    return scored.select(*cols,
                         F.ntile(n_buckets).over(w).alias("bucket"))


def _gram_strings(toks_col: Column, n: int) -> Column:
    """n-gram strings from a MATERIALIZED token-array column (the HOF
    lambda references only the column, never a captured expression —
    the SCALE.md per-element re-eval trap)."""
    if n == 1:
        return toks_col
    idx = F.when(F.size(toks_col) >= n,
                 F.sequence(F.lit(1), F.size(toks_col) - (n - 1)))
    return F.coalesce(
        F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.element_at(toks_col, i + F.lit(j))
                   for j in range(n)])),
        F.array().cast("array<string>"))


def _portable_bucket(col: Column, buckets: int) -> Column:
    """Engine-portable hash bucket: the first 8 hex chars of md5, read
    as an integer, mod ``buckets`` — identical in Spark
    (``conv(substr(md5(g),1,8),16,10)``) and DuckDB
    (``('0x' || substr(md5(g),1,8))::UBIGINT``), unlike xxhash64 which
    only Spark implements. 32 bits of hash is plenty for bucket
    assignment (the DSIR feature space is 10⁴-10⁵ buckets)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(int(buckets)))


def hashed_gram_buckets(df: DataFrame, id_col: str, text_col: str,
                        n_max: int = 2,
                        buckets: int = 10_000) -> DataFrame:
    """(id, bucket) — one row per word {1..n_max}-gram occurrence,
    hashed into ``buckets`` (the DSIR feature extraction). One explode
    over materialized token arrays, pure Column math."""
    if not isinstance(n_max, int) or n_max < 1:
        raise ValueError(f"n_max must be a positive integer, "
                         f"got {n_max!r}")
    if not isinstance(buckets, int) or buckets < 1:
        raise ValueError(f"buckets must be a positive integer, "
                         f"got {buckets!r}")
    base = df.select(F.col(id_col),
                     tokens(F.col(text_col)).alias("_toks"))
    grams = F.concat(*[_gram_strings(F.col("_toks"), n)
                       for n in range(1, n_max + 1)])
    return base.select(F.col(id_col),
                       F.explode(grams).alias("_g")) \
               .select(F.col(id_col),
                       _portable_bucket(F.col("_g"), buckets)
                       .alias("bucket"))


def hashed_ngram_importance(df: DataFrame, target_df: DataFrame,
                            id_col: str, text_col: str,
                            n_max: int = 2, buckets: int = 10_000,
                            smoothing: float = 1.0) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document of ``df`` by how much more likely its hashed-n-gram bag is
    under the TARGET corpus distribution than under the raw corpus's
    own —

    ``importance(d) = Σ_grams  ln p̂_target(bucket) − ln p̂_raw(bucket)``

    with add-``smoothing`` estimates ``p̂(b) = (c_b + s) / (N + s·B)``.
    High scores read like the target domain; downstream selection is
    top-k or threshold (compose with ``packing.weighted_sample`` for
    the resampling step). Returns (id, n_grams, importance) — rounded
    to 6 dp so cross-engine float-sum ulp noise can't flip the oracle.

    Scale shape: two explode+count passes (map-side combined,
    bucket-bounded output), the ≤``buckets``-row log-ratio table
    broadcast into the per-gram join, one per-document sum. The two
    corpus totals are whole-frame window sums over the joined
    bucket-count frame (≤ 2×buckets rows — never a rescan of the
    corpus) — no driver collect, no UDFs, nothing corpus-squared."""
    if not (isinstance(smoothing, (int, float))
            and not isinstance(smoothing, bool) and smoothing > 0):
        raise ValueError(f"smoothing must be > 0, got {smoothing!r}")
    raw_b = hashed_gram_buckets(df, id_col, text_col, n_max, buckets)
    tgt_b = hashed_gram_buckets(target_df, id_col, text_col, n_max,
                                buckets)
    raw_c = raw_b.groupBy("bucket").agg(F.count("*").alias("_cr"))
    tgt_c = tgt_b.groupBy("bucket").agg(F.count("*").alias("_ct"))
    # (r15) the corpus totals used to be two single-row aggregates
    # cross-joined and broadcast — each re-deriving its count frame
    # from scratch, so the plan scanned (and re-tokenized) the corpus
    # FIVE times (raw: per-gram join + totals + table; target: totals
    # + table). Deriving both totals as whole-frame window sums OVER
    # the joined bucket-count frame (≤ 2×buckets rows — one task)
    # keeps the math bit-identical (integer sums, unchanged log/
    # division chain) and drops the plan to three scans: per-gram raw,
    # bucket-count raw, bucket-count target (guide §1.2/§2.4 — remove
    # redundant passes). The join is FULL outer so target-only buckets
    # still contribute to the target total exactly as before; the
    # per-bucket rows the final join can hit are the raw-side ones,
    # unchanged (left-join semantics restored by the _cr filter).
    from pyspark.sql.window import Window

    s = F.lit(float(smoothing))
    sb = F.lit(float(smoothing) * buckets)
    w = Window.partitionBy()
    table = (raw_c.join(tgt_c, "bucket", "full_outer")
             .withColumn("_nr", F.sum("_cr").over(w))
             .withColumn("_nt", F.sum("_ct").over(w))
             .where(F.col("_cr").isNotNull())
             .select(
                 "bucket",
                 (F.log((F.coalesce(F.col("_ct"), F.lit(0))
                         .cast("double") + s)
                        / (F.coalesce(F.col("_nt"), F.lit(0))
                           .cast("double") + sb))
                  - F.log((F.col("_cr").cast("double") + s)
                          / (F.col("_nr").cast("double") + sb)))
                 .alias("_lr")))
    return (raw_b.join(F.broadcast(table), "bucket")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.round(F.sum("_lr"), 6).alias("importance")))


def perplexity(xent: Column) -> Column:
    """``exp(cross-entropy)`` — the conventional perplexity form."""
    return F.exp(xent)
