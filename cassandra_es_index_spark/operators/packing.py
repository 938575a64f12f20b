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
