"""Document chunking for training pipelines (r13): split each
document's token stream into fixed-size windows with optional overlap —
the step between long-document ingestion and sequence packing
(``operators.packing``) in every LLM data pipeline.

Pure Column math: tokenization (whitespace, case/punctuation
preserved — chunk text must round-trip the source), a per-row chunk
count, one ``posexplode`` of the chunk index range, and an
``F.slice`` + ``array_join`` per chunk. No UDF, no shuffle — the
explode multiplies rows in place (row multiplier = tokens /
(chunk_tokens − overlap), bounded by the data model), and downstream
consumers group or pack on the (doc, chunk) key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _raw_tokens(col: Column) -> Column:
    """Whitespace tokens with case and punctuation PRESERVED (unlike
    ``functions.text.tokens``, which lowercases for matching): chunk
    text is training data and must re-join to the source's words."""
    return F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 512,
                    overlap: int = 0) -> DataFrame:
    """→ (id_col, chunk_id, n_tokens, chunk_text): document text split
    into windows of ``chunk_tokens`` whitespace tokens, consecutive
    windows sharing ``overlap`` tokens. Chunk count per document =
    max(1, ceil((n − overlap) / (chunk_tokens − overlap))) — every
    token lands in ≥1 chunk, the final chunk may be short, and empty
    documents produce no chunks (the explode of a null index range).

    Typed bounds: chunk_tokens ≥ 1, 0 ≤ overlap < chunk_tokens (an
    overlap ≥ the window never advances)."""
    if not isinstance(chunk_tokens, int) or chunk_tokens < 1:
        raise ValueError(
            f"chunk_tokens must be a positive integer, got "
            f"{chunk_tokens!r}")
    if not isinstance(overlap, int) or not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens, got "
            f"{overlap!r}")
    step = chunk_tokens - overlap
    # parallelism guard (the ngram_repetition_stats lesson): widen a
    # below-default-parallelism input so the tokenize/slice map is
    # sized by CPU, not by input file count (no-op at scale)
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        df = df.repartition(want, id_col)
    toks = _raw_tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(float(step))).cast("int"))
    idx = F.when(n > 0, F.sequence(F.lit(0), n_chunks - F.lit(1)))
    out = (df.select(F.col(id_col), toks.alias("_toks"),
                     F.explode(idx).alias("chunk_id"))
           .withColumn("_chunk",
                       F.slice("_toks",
                               F.col("chunk_id") * F.lit(step)
                               + F.lit(1),
                               F.lit(chunk_tokens)))
           .select(id_col,
                   F.col("chunk_id").cast("int").alias("chunk_id"),
                   F.size("_chunk").cast("long").alias("n_tokens"),
                   F.array_join("_chunk", " ").alias("chunk_text")))
    return out
