"""Range (interval) join — points ⋈ intervals on containment.

The naive plan for ``p.v BETWEEN i.lo AND i.hi`` is a cross join with a
filter (Spark falls back to BroadcastNestedLoopJoin), which is quadratic
and only survives when one side broadcasts. This operator uses the
standard binning rewrite: bucket the value domain into fixed-width bins,
assign each point to its bin, explode each interval to the bins it
overlaps, and equi-join on the bin — each (point, interval) containment
pair meets in EXACTLY one bin (the point's), so no dedup is needed, and
the join is an ordinary hash shuffle on the bin key.

Cost at scale: |points| + Σ interval widths / bin_width rows through one
equi-join. ``bin_width`` trades explode factor against join selectivity:
pick it near the median interval width so intervals explode to O(1) bins.
Skewed bins (a hot value range) respond to AQE skew-join like any other
equi-join — which is the point of rewriting to one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_rj_bin"


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, lo_col: str, hi_col: str,
                  bin_width: float | int) -> DataFrame:
    """Inner-join rows of ``points`` to rows of ``intervals`` where
    ``lo_col <= point_col <= hi_col`` (bounds inclusive, numeric domain —
    cast dates to epoch days first). Returns all columns of both sides.
    Null points / null bounds never match (same as the SQL BETWEEN)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    overlap = [c for c in points.columns if c in set(intervals.columns)]
    if overlap:
        raise ValueError(f"column names collide across sides: {overlap}")
    p = (points.where(F.col(point_col).isNotNull())
               .withColumn(_BIN, F.floor(F.col(point_col) / bin_width)))
    i = (intervals.where(F.col(lo_col).isNotNull()
                         & F.col(hi_col).isNotNull()
                         & (F.col(lo_col) <= F.col(hi_col)))
                  .withColumn(_BIN, F.explode(F.sequence(
                      F.floor(F.col(lo_col) / bin_width),
                      F.floor(F.col(hi_col) / bin_width)))))
    return (p.join(i, on=_BIN)
             .where(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
             .drop(_BIN))
