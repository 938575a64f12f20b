"""Incremental indexing: mutation stream → index-store upserts.

The reference indexes each Cassandra mutation through per-write Indexer
hooks (ref indexers/EsIndexer.java:59-79); in Spark the equivalent is a
micro-batch ``foreachBatch`` applying the whole batch as one merge.
Semantics carried over (SURVEY.md §2.8):

- W1 upsert-per-mutation, last-writer-wins at the index
- W3 per-key concurrency: the reference serializes writers per key with an
  interned lock (ref ElasticIndex.java:449-458); here a window picks the
  single latest mutation per key inside the batch — deterministic
  one-writer-per-key without any lock
- W7 tombstone policy: ONLY partition deletes propagate; range tombstones
  and row deletes are ignored, and an empty update is NOT a delete
  (UCS-4927, ref indexers/NoOpIndexer.java:31-56,
  EsSecondaryIndex.java:225-227)
- W8 analytic mode: ``es-analytic-mode=true`` drops the delete branch
  entirely (ref EsSecondaryIndex.java:413)
- W2 async vs sync ack: a micro-batch commit IS the sync barrier; async
  fire-and-forget corresponds to not awaiting the streaming epoch.
- W4/W5 (log-replay skip, replica dedup): exactly-once checkpointing makes
  them moot; ``dropDuplicates`` on (key, ts) guards a double-delivering
  source.

Mutation batch layout (FIXTURES.md F4): key columns + payload columns +
``op`` ∈ {insert, update, partition_delete, empty_update} + event-time
``ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_es_index_spark.docmodel import DOC_ID, doc_id_column
from cassandra_es_index_spark.indexstore import ParquetIndexStore

OP = "op"
UPSERT_OPS = ("insert", "update")
DELETE_OP = "partition_delete"
EMPTY_OP = "empty_update"


def apply_mutation_batch(store: ParquetIndexStore, batch: DataFrame,
                         ts_col: str = "ts") -> dict[str, DataFrame | None]:
    """Apply one micro-batch of mutations to the index store.

    Returns the effective change set ``{"upserts": df|None, "deletes":
    df|None}`` (post W3/W7 filtering) so the caller can maintain derived
    state — e.g. the search engine's postings indexes — incrementally
    instead of rebuilding from the full corpus."""
    spec = store.spec
    keys = spec.key_columns
    cfg = spec.config()

    deduped = batch.dropDuplicates([*keys, ts_col])

    # W3: single writer per key — keep only the latest mutation per key.
    w = Window.partitionBy(*keys).orderBy(F.desc(ts_col))
    latest = (deduped.withColumn("_rn", F.row_number().over(w))
                     .where(F.col("_rn") == 1)
                     .drop("_rn"))

    # W7: empty updates are dropped entirely (not deletes, not upserts).
    latest = latest.where(F.col(OP) != EMPTY_OP)
    changes: dict[str, DataFrame | None] = {"upserts": None, "deletes": None}

    upserts = (latest.where(F.col(OP).isin(*UPSERT_OPS))
                     .drop(OP, ts_col))
    if upserts.limit(1).count() > 0:
        store.upsert(upserts)
        changes["upserts"] = upserts

    # W8: analytic mode retains documents on delete.
    if not cfg.analytic_mode:
        deletes = (latest.where(F.col(OP) == DELETE_OP)
                         .select(doc_id_column(spec).alias(DOC_ID)))
        if deletes.limit(1).count() > 0:
            store.delete_ids(deletes)
            changes["deletes"] = deletes
    return changes


class MutationIndexer:
    """foreachBatch adapter: ``indexer.start(stream_df)`` upserts every
    micro-batch into the store (exactly-once via the stream checkpoint).

    ``on_batch(changes)``, when given, receives each batch's effective
    change set — the facade uses it to refresh the search view and update
    postings incrementally per micro-batch instead of on a manual cadence.
    """

    def __init__(self, store: ParquetIndexStore, ts_col: str = "ts",
                 on_batch=None):
        self.store = store
        self.ts_col = ts_col
        self.on_batch = on_batch

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:  # noqa: ARG002
        changes = apply_mutation_batch(self.store, batch, self.ts_col)
        if self.on_batch is not None:
            self.on_batch(changes)

    def start(self, stream_df: DataFrame, checkpoint: str,
              trigger_seconds: int | None = None):
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint)
                  .outputMode("update"))
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()
