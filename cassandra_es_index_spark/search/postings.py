"""Inverted postings index (SURVEY.md §4 custom-work item 2).

For selective term queries over a huge corpus, a full text scan is wasted
work. The postings table inverts the corpus once — ``(token, doc, tf)``,
bucketable by token — and a term lookup becomes a broadcast equi-join of
the (tiny) query-term list against the postings, touching only matching
rows. At 100 TB: write the postings table bucketed by ``token`` so term
lookups prune to the matching buckets and repeated queries never reshuffle.

The scan-based regex path (``search/compile.py``) and this postings path
return identical results for whole-token term queries; the parity is
oracle-checked (``search_postings_term`` in the driver contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_es_index_spark.functions.analyzers import standard


def build_postings(docs: DataFrame, id_col: str, text_col: str,
                   analyzer=standard) -> DataFrame:
    """Corpus → (token, doc, tf). One explode + one aggregation.

    The input is repartitioned first so tokenization parallelizes even when
    the source is a single file/partition (the explode and the map-side
    partial aggregation are the dominant cost)."""
    n_part = max(docs.sparkSession.sparkContext.defaultParallelism, 8)
    return (docs.repartition(n_part)
                .select(F.col(id_col).alias("doc"),
                        F.explode(analyzer(F.col(text_col))).alias("token"))
                .groupBy("token", "doc")
                .agg(F.count("*").cast("long").alias("tf")))


def write_postings(postings: DataFrame, path: str, buckets: int = 64,
                   table_name: str = "postings_bucketed") -> None:
    """Persist bucketed + sorted by token: term lookups then prune to the
    matching buckets (``SelectedBucketsCount`` in the scan) and skip
    non-matching row groups via the sorted min/max stats — at 100 TB a
    single-term lookup touches 1/``buckets`` of the index files."""
    (postings.write.mode("overwrite")
     .bucketBy(buckets, "token").sortBy("token")
     .option("path", path)
     .saveAsTable(table_name))


def read_postings(spark, table_name: str = "postings_bucketed") -> DataFrame:
    """Reopen a persisted postings table (bucket metadata intact, so the
    pruning in ``write_postings``'s docstring applies to lookups)."""
    return spark.table(table_name)


def lookup_terms(postings: DataFrame, terms: list[str],
                 mode: str = "any", isin_threshold: int = 64) -> DataFrame:
    """Docs matching the term list.

    ``any`` → (doc, score=Σ tf) over matched terms (OR semantics);
    ``all`` → docs containing every term (AND), same score column.

    Small term lists become an ``IN`` predicate — a plain filter that
    pushes into the (cached/bucketed) postings scan, touching only
    matching rows. Large lists fall back to a broadcast join — no shuffle
    of the postings side beyond the groupBy on doc either way.
    """
    if 0 < len(terms) <= isin_threshold:
        matched = postings.where(F.col("token").isin(*terms))
    else:
        spark = postings.sparkSession
        term_df = spark.createDataFrame([(t,) for t in terms], "token string")
        matched = postings.join(F.broadcast(term_df), "token")
    agg = matched.groupBy("doc").agg(
        F.sum("tf").cast("long").alias("score"),
        F.countDistinct("token").alias("_nterms"))
    if mode == "all":
        agg = agg.where(F.col("_nterms") == len(set(terms)))
    elif mode != "any":
        raise ValueError(f"unknown mode {mode!r}")
    return agg.drop("_nterms")
