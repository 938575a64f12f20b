"""Per-document TF-IDF keyword extraction (r13): the top-k most
characteristic terms of each document against the corpus — the
data-analysis twin of the engine's more_like_this term picker
(``search/engine.py`` MLT tf·idf selection), exposed as a standalone
corpus operator for pipeline use (topic tagging, quality debugging,
corpus drift dashboards).

Plan shape: one explode → (doc, term, tf) hash aggregation (map-side
combinable, shuffle bounded by corpus token count), one (term → df)
aggregation of the distinct pairs, one equi-join of per-doc terms onto
the term-document-frequency frame (AQE-broadcastable — the vocabulary
is sublinear in the corpus), and one groupBy-shaped rank window
partitioned by the doc key. No UDF, no driver collect, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_es_index_spark.functions.text import tokens


def top_tfidf_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 5) -> DataFrame:
    """→ (id_col, term, tf, score, rank): each document's top-``k``
    terms by tf·idf, rank 1 = most characteristic.

    Conventions (deterministic, oracle-mirrorable): terms are the
    lowercased whitespace tokens; tf = raw in-document count; idf =
    ln((N + 1) / (df + 1)) + 1 (the smoothed form — never negative,
    never divides by zero); ties rank by term asc."""
    if not isinstance(k, int) or k < 1:
        raise ValueError(f"k must be a positive integer, got {k!r}")
    # parallelism guard (the ngram_repetition_stats lesson): the
    # tokenize+explode map is CPU-amplifying and invisible to AQE's
    # byte-based sizing — widen a below-default-parallelism input by
    # explicit-count hash repartition on the doc id (no-op at scale)
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        df = df.repartition(want, id_col)
    n_docs = df.count()
    toks = df.select(F.col(id_col),
                     F.explode(tokens(F.col(text_col))).alias("term"))
    tf = (toks.groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    dfreq = (tf.groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("_df")))
    idf = (F.log((F.lit(float(n_docs)) + 1.0)
                 / (F.col("_df").cast("double") + 1.0)) + F.lit(1.0))
    scored = (tf.join(dfreq, on="term")
              .withColumn("score",
                          F.round(F.col("tf").cast("double") * idf, 6))
              .drop("_df"))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"),
                                           F.asc("term"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select(id_col, "term", "tf", "score", "rank"))


__all__ = ["top_tfidf_terms"]
