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
