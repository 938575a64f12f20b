"""Event-time windowing over streams (W11 — superset feature).

The reference has no watermark/window notion (SURVEY.md §2.8 W11); these
helpers expose Structured Streaming's tumbling/sliding/session windows
with watermark-driven late-data handling as engine primitives. They accept
batch DataFrames too (Spark evaluates ``window``/``session_window``
identically in batch mode), which is how the oracle checks them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, duration: str,
             group_cols: list[str], aggs: list[Column],
             watermark: str | None = None) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(ts_col, duration).alias("win"), *group_cols)
              .agg(*aggs)
              .withColumn("win_start", F.col("win.start"))
              .withColumn("win_end", F.col("win.end"))
              .drop("win"))


def sliding(df: DataFrame, ts_col: str, duration: str, slide: str,
            group_cols: list[str], aggs: list[Column],
            watermark: str | None = None) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(ts_col, duration, slide).alias("win"), *group_cols)
              .agg(*aggs)
              .withColumn("win_start", F.col("win.start"))
              .withColumn("win_end", F.col("win.end"))
              .drop("win"))


def session(df: DataFrame, ts_col: str, gap: str,
            group_cols: list[str], aggs: list[Column],
            watermark: str | None = None) -> DataFrame:
    """Session windows with a fixed inactivity gap."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(ts_col, gap).alias("win"), *group_cols)
              .agg(*aggs)
              .withColumn("win_start", F.col("win.start"))
              .withColumn("win_end", F.col("win.end"))
              .drop("win"))
