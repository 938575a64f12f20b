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


def perplexity(xent: Column) -> Column:
    """``exp(cross-entropy)`` — the conventional perplexity form."""
    return F.exp(xent)
