"""BM25 relevance scoring (SURVEY.md §7 hard-part 1).

ES scores hits with BM25; float-exact parity with Lucene is impossible
across engines, so the engine defines its scoring precisely and computes
it with documented, reproducible arithmetic (Lucene-style BM25 with
natural-log idf, rounded to 6 dp):

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    tf_part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score   = Σ_t idf(t) * tf_part(t)

Everything is expressed as two aggregations + one broadcast join:

1. corpus stats  — one pass: N and avgdl, plus df_t per query term
   (conditional counts — no per-term scan).
2. scoring       — one pass over candidate docs with the stats row
   broadcast; per-term tf from the token array.

Scales as two linear scans regardless of corpus size; the per-term work is
bounded by the query length, not the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_es_index_spark.functions.analyzers import standard


def term_tf(tokens: Column, term: str) -> Column:
    """Occurrences of ``term`` in a token array."""
    return F.size(F.filter(tokens, lambda t: t == F.lit(term)))


def _with_tokens(docs: DataFrame, text_col: str, analyzer) -> DataFrame:
    """Repartition + project the token array once into ``_tk``.

    Downstream expressions reference the ``_tk`` attribute, so the (regex)
    tokenization runs once per row instead of once per consuming
    expression — measured ~3× on BM25 at sf0.1. Repartitioning first gives
    parallelism even for single-file sources."""
    n_part = max(docs.sparkSession.sparkContext.defaultParallelism, 8)
    return (docs.repartition(n_part)
                .withColumn("_tk", analyzer(F.col(text_col))))


def corpus_stats(docs: DataFrame, text_col: str, terms: list[str],
                 analyzer=standard) -> DataFrame:
    """One-row DataFrame: N, avgdl, and df_<i> for each query term."""
    toked = _with_tokens(docs, text_col, analyzer)
    tokens = F.col("_tk")
    aggs = [F.count("*").cast("long").alias("N"),
            F.avg(F.size(tokens)).alias("avgdl")]
    for i, t in enumerate(terms):
        aggs.append(F.sum(F.when(term_tf(tokens, t) > 0, 1).otherwise(0))
                     .cast("long").alias(f"df_{i}"))
    return toked.agg(*aggs)


def bm25_score(docs: DataFrame, text_col: str, terms: list[str],
               k1: float = 1.2, b: float = 0.75,
               analyzer=standard) -> DataFrame:
    """Input docs + ``_bm25`` column (matching docs only — score > 0)."""
    stats = corpus_stats(docs, text_col, terms, analyzer)
    joined = (_with_tokens(docs, text_col, analyzer)
              .withColumn("_dl", F.size(F.col("_tk")).cast("double"))
              .crossJoin(F.broadcast(stats)))
    score: Column = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = term_tf(F.col("_tk"), t).cast("double")
        idf = F.log(F.lit(1.0)
                    + (F.col("N") - F.col(f"df_{i}") + F.lit(0.5))
                    / (F.col(f"df_{i}") + F.lit(0.5)))
        tf_part = (tf * (k1 + 1.0)
                   / (tf + F.lit(k1) * (F.lit(1.0 - b)
                                        + F.lit(b) * F.col("_dl") / F.col("avgdl"))))
        score = score + idf * tf_part
    drop = ["_tk", "_dl", "N", "avgdl", *[f"df_{i}" for i in range(len(terms))]]
    return (joined.withColumn("_bm25", F.round(score, 6))
                  .where(F.col("_bm25") > 0)
                  .drop(*drop))


def bm25_topk(docs: DataFrame, text_col: str, terms: list[str],
              id_col: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Deterministic BM25 top-k: score desc, id asc."""
    return (bm25_score(docs, text_col, terms, k1, b)
            .orderBy(F.desc("_bm25"), F.asc(id_col))
            .limit(k))
