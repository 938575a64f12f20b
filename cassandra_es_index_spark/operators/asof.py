"""As-of join — match each left row with the latest right row at or before
it (north-star custom operator; Spark has no native as-of join).

Implementation is the union+window trick, fully built-in (no pandas
``merge_asof`` fallback needed):

1. tag both sides and union them on (by-keys, event time)
2. one window per by-key ordered by time carries the most recent right-side
   payload forward (``max``/``last`` over ``rangeBetween`` ending strictly
   before the current row for ``strict=True``)
3. keep left rows, now annotated with their as-of match

Cost: one shuffle of (left + right) by the by-keys — the same cost as a
regular join on those keys, independent of time-range density. This is the
shape that survives 100 TB; ``applyInPandas``+``merge_asof`` per group is
the fallback only when per-group logic outgrows window functions.

``rangeBetween`` runs on epoch-microseconds so "strictly before" means
``r.ts < l.ts`` exactly — deterministic under timestamp ties (matching the
correlated-subquery semantics ``SELECT max(r.ts) WHERE r.ts < l.ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame,
              by: list[str], ts_col: str,
              value_cols: list[str],
              strict: bool = True) -> DataFrame:
    """As-of join via union + window (see module docstring)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(*by, ts_col, *value_cols).withColumn("_side", F.lit(0))
    left_types = dict(left.dtypes)
    right_types = dict(rt.dtypes)
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left_types[c]))
    for c in value_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(right_types[c]))
    unioned = lt.unionByName(rt.select(*lt.columns))

    # NTZ-proof: user-supplied frames may carry TIMESTAMP_NTZ (e.g. parquet
    # timestamp[us] isAdjustedToUTC=false read without the engine's session
    # confs); unix_micros is TIMESTAMP-only, so normalize first. Under a
    # UTC session the cast is exact for already-TIMESTAMP columns (no-op).
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    upper = -1 if strict else 0
    w = (Window.partitionBy(*by).orderBy(micros)
         .rangeBetween(Window.unboundedPreceding, upper))
    # carry (ts, values...) of the latest right row forward as one struct:
    # max over structs orders by the leading ts field.
    payload = F.when(
        F.col("_side") == 0,
        F.struct(micros.alias("_t"),
                 *[F.col(c).alias(c) for c in value_cols]))
    annotated = unioned.withColumn("_asof", F.max(payload).over(w))
    out = annotated.where(F.col("_side") == 1)
    out = out.withColumn("asof_ts", F.timestamp_micros(F.col("_asof._t")))
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"_asof.{c}"))
    return out.drop("_side", "_asof", *[c for c in value_cols
                                        if c not in left.columns])