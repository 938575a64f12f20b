"""Parquet-backed index table with segment lifecycle.

Re-expresses the reference's index lifecycle (SURVEY.md §2.1 S3-S12, §2.8
W6/W9/W10) on a partitioned parquet layout:

- **Segmentation** — the ES per-period index (``<alias>_index@<suffix>``,
  ref DefaultIndexManager.java:105-163) becomes a ``segment`` partition
  column; the alias spanning segments is simply the table path. Two
  policies, mirroring the two reference index managers:
  * date-suffix segments OFF/YEAR/MONTH/DAY/HOUR (DefaultIndexManager)
  * fixed-width epoch frames of ``segment-size`` ms (IndexDropManager.java:92-99)
- **Upsert** (S3, ``doc_as_upsert``) — MERGE emulated with anti-join +
  union, rewriting only the segments touched by the batch (partition
  pruning keeps untouched segments byte-identical — the scale property;
  with Delta/Iceberg on the cluster this maps 1:1 to ``MERGE INTO``).
- **Doc-level TTL expiry** (S6) — ``DELETE WHERE _cassandraTtl <= now``
  rewrite of affected segments (ref ElasticIndex.java:825-836).
- **Segment-level expiry** (W10) — drop whole segment directories older
  than the retention horizon (ref IndexDropManager.java:154-168).
- **Truncate / drop / purge-empty** (S7, S8, A2) — directory-level ops.

Doc-identity column is ``_id`` (ref doc id); all reads prune on the
``segment`` partition column automatically via Catalyst.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_es_index_spark.catalog import TableSpec
from cassandra_es_index_spark.docmodel import DOC_ID, TTL_FIELD, build_documents

SEGMENT = "segment"

# date-suffix formats per segmentation level (ref DefaultIndexManager.java:48)
_SEGMENT_FMT = {
    "YEAR": "yyyy",
    "MONTH": "yyyy-MM",
    "DAY": "yyyy-MM-dd",
    "HOUR": "yyyy-MM-dd-HH",
}


class ParquetIndexStore:
    """One index table = one parquet directory partitioned by ``segment``."""

    def __init__(self, spark: SparkSession, path: str, spec: TableSpec,
                 event_time_col: str | None = None):
        self.spark = spark
        self.path = path
        self.spec = spec
        self.event_time_col = event_time_col
        cfg = spec.config()
        self.mode = str(cfg.get("index-segment")).upper()   # OFF|YEAR|…|FRAME
        self.segment_size_ms = int(cfg.get("segment-size"))

    # -- segment assignment -------------------------------------------------

    def segment_column(self) -> Column:
        """Segment suffix for each document (ref DefaultIndexManager date
        formats; FRAME = IndexDropManager fixed-width epoch frames)."""
        if self.mode == "OFF" or self.event_time_col is None:
            return F.lit("all")
        ts = F.col(self.event_time_col)
        if self.mode in _SEGMENT_FMT:
            return F.date_format(ts, _SEGMENT_FMT[self.mode])
        if self.mode == "FRAME":
            frame = F.floor(F.unix_millis(ts) / F.lit(self.segment_size_ms))
            return frame.cast("string")
        if self.mode == "CUSTOM":
            return F.lit(str(self.spec.config().get("segment-name") or "custom"))
        raise ValueError(f"unknown index-segment mode {self.mode!r}")

    # -- bulk build (S1 → S3 path) ------------------------------------------

    def build(self, base: DataFrame, truncate_first: bool = False) -> None:
        """Full index (re)build from the base table — the reference's
        ``EsIndexBuilder.build()`` (ref EsIndexBuilder.java:60-93) with
        optional ``truncate-rebuild``."""
        if truncate_first:
            self.truncate()
        docs = build_documents(base, self.spec).withColumn(
            SEGMENT, self.segment_column())
        (docs.write.mode("overwrite").partitionBy(SEGMENT).parquet(self.path))

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            name.startswith(f"{SEGMENT}=") for name in os.listdir(self.path))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def count(self) -> int:
        return self.read().count() if self.exists() else 0

    # -- upsert / delete (S3, S5) -------------------------------------------

    def _touched_segments(self, docs: DataFrame) -> list[str]:
        return [r[SEGMENT] for r in docs.select(SEGMENT).distinct().collect()]

    def upsert(self, batch: DataFrame) -> None:
        """``doc_as_upsert`` semantics (ref ElasticIndex.java:603-614):
        replace-or-insert by ``_id``. Only segments present in the batch
        are rewritten; the anti-join reads just those segments thanks to
        partition pruning on the IN-list filter.

        ``batch`` may be a base-table slice (documents get built here) or
        already-built documents carrying ``_id`` (e.g. from a sink
        fallback)."""
        docs = batch if DOC_ID in batch.columns else build_documents(batch, self.spec)
        if SEGMENT not in docs.columns:
            docs = docs.withColumn(SEGMENT, self.segment_column())
        if not self.exists():
            docs.write.mode("overwrite").partitionBy(SEGMENT).parquet(self.path)
            return
        touched = self._touched_segments(docs)
        existing = self.read().where(F.col(SEGMENT).isin(touched))
        keep = existing.join(docs.select(DOC_ID), on=DOC_ID, how="left_anti")
        merged = keep.unionByName(docs)
        self._rewrite_segments(merged, touched)

    def delete_ids(self, ids: DataFrame) -> None:
        """Single-doc deletes by ``_id`` (ref ElasticIndex.java:642-649);
        missing ids are a no-op, like the reference accepting 404."""
        if not self.exists():
            return
        remaining = self.read().join(F.broadcast(ids.select(DOC_ID)),
                                     on=DOC_ID, how="left_anti")
        self._rewrite_all(remaining)

    def delete_where(self, predicate: Column) -> None:
        """Delete-by-query (ref ElasticIndex.java:817-836)."""
        if not self.exists():
            return
        self._rewrite_all(self.read().where(~predicate | predicate.isNull()))

    # -- TTL / retention (S6, W10, A2) --------------------------------------

    def delete_expired(self, now_epoch_s: int) -> None:
        """Doc-level TTL sweep: drop docs whose ``_cassandraTtl`` passed
        (ref ElasticIndex.java:825-836; 60 s cadence in the reference —
        cadence belongs to the caller's scheduler)."""
        self.delete_where(F.col(TTL_FIELD) <= F.lit(now_epoch_s))

    def expired_segments(self, now_ms: int, retention_ms: int) -> list[str]:
        """FRAME-mode segments entirely older than the retention horizon
        (ref IndexDropManager.deleteExpired, IndexDropManager.java:154-168)."""
        if self.mode != "FRAME" or not self.exists():
            return []
        horizon_frame = (now_ms - retention_ms) // self.segment_size_ms
        out = []
        for name in os.listdir(self.path):
            if name.startswith(f"{SEGMENT}="):
                value = name.split("=", 1)[1]
                if value.isdigit() and int(value) < horizon_frame:
                    out.append(value)
        return out

    def drop_segments(self, segments: list[str]) -> None:
        for seg in segments:
            shutil.rmtree(os.path.join(self.path, f"{SEGMENT}={seg}"),
                          ignore_errors=True)

    def purge_empty_segments(self) -> list[str]:
        """Drop segments with zero rows (ref ElasticIndex.java:839-856,
        hourly in the reference)."""
        if not self.exists():
            return []
        counts = (self.read().groupBy(SEGMENT).count().collect())
        non_empty = {r[SEGMENT] for r in counts if r["count"] > 0}
        dropped = []
        for name in os.listdir(self.path):
            if name.startswith(f"{SEGMENT}="):
                seg = name.split("=", 1)[1]
                if seg not in non_empty:
                    dropped.append(seg)
        self.drop_segments(dropped)
        return dropped

    # -- compaction (SURVEY.md §7 hard-part 3) ------------------------------

    def segment_file_counts(self) -> dict[str, int]:
        if not self.exists():
            return {}
        out: dict[str, int] = {}
        for name in os.listdir(self.path):
            if name.startswith(f"{SEGMENT}="):
                seg_dir = os.path.join(self.path, name)
                n = len([f for f in os.listdir(seg_dir) if f.endswith(".parquet")])
                out[name.split("=", 1)[1]] = n
        return out

    def compact_segments(self, max_files: int = 8,
                         target_files: int = 1) -> list[str]:
        """Rewrite segments whose parquet-file count exceeds ``max_files``
        down to ``target_files`` — the engine's analogue of ES segment
        merging. Upsert-heavy workloads accrete small files per merge;
        compaction restores scan efficiency. Only oversized segments are
        touched (same partition-pruned rewrite as upsert)."""
        crowded = [seg for seg, n in self.segment_file_counts().items()
                   if n > max_files]
        if not crowded:
            return []
        data = (self.read().where(F.col(SEGMENT).isin(crowded))
                    .repartition(target_files, F.col(SEGMENT)))
        self._rewrite_segments(data, crowded)
        return crowded

    # -- truncate / drop (S7, S8) -------------------------------------------

    def truncate(self) -> None:
        if os.path.isdir(self.path):
            shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

    # -- internals ----------------------------------------------------------

    def _rewrite_segments(self, data: DataFrame, segments: list[str]) -> None:
        """Overwrite only the given segment partitions (the MERGE write
        path: untouched segments are never read or written)."""
        staged = data.where(F.col(SEGMENT).isin(segments)).cache()
        try:
            staged.count()  # materialize before deleting source files
            tmp = self.path + ".tmp_rewrite"
            staged.write.mode("overwrite").partitionBy(SEGMENT).parquet(tmp)
            for seg in segments:
                dst = os.path.join(self.path, f"{SEGMENT}={seg}")
                src = os.path.join(tmp, f"{SEGMENT}={seg}")
                shutil.rmtree(dst, ignore_errors=True)
                if os.path.isdir(src):
                    shutil.move(src, dst)
            shutil.rmtree(tmp, ignore_errors=True)
        finally:
            staged.unpersist()

    def _rewrite_all(self, data: DataFrame) -> None:
        tmp = self.path + ".tmp_rewrite"
        data.write.mode("overwrite").partitionBy(SEGMENT).parquet(tmp)
        shutil.rmtree(self.path, ignore_errors=True)
        shutil.move(tmp, self.path)
