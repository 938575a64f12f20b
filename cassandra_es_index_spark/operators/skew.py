"""Skew-handling utilities (SURVEY.md §4 / SCALE.md levers).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in ``session.get_spark``);
these helpers cover the two shapes AQE cannot fix:

- ``salted_agg``  — two-phase aggregation for a hot groupBy key: partial
  aggregate on (key, salt), then final aggregate on key. Turns one
  straggler partition into ``n_salts`` even ones.
- ``salted_join`` — replicate the small side per salt so a hot join key
  spreads across ``n_salts`` tasks (classic salt-and-replicate; use when
  the small side is too big to broadcast but the key histogram is spiky).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic salt from a hash of the whole row's key-independent
    spread: uses ``spark_partition_id`` + monotonically increasing id so
    rows of one hot key land in different salts without RNG."""
    return df.withColumn(
        SALT, (F.monotonically_increasing_id() % n_salts).cast("int"))


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, str],
               n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps column → 'sum'|'count'|'max'|'min'.

    Phase 1 aggregates on (keys, salt) — map-side combine already shrinks
    data, the shuffle spreads a hot key over ``n_salts`` reducers. Phase 2
    merges the partials (sum of counts/sums, max of maxes…).
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for col, kind in aggs.items():
        name = f"{kind}_{col}"
        if kind == "count":
            partials.append(F.count(col).alias(name))
            finals.append(F.sum(name).cast("long").alias(name))
        elif kind == "sum":
            partials.append(F.sum(col).alias(name))
            finals.append(F.sum(name).alias(name))
        elif kind == "max":
            partials.append(F.max(col).alias(name))
            finals.append(F.max(name).alias(name))
        elif kind == "min":
            partials.append(F.min(col).alias(name))
            finals.append(F.min(name).alias(name))
        else:
            raise ValueError(f"unsupported agg {kind!r}")
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*key_cols, SALT).agg(*partials)
    return phase1.groupBy(*key_cols).agg(*finals)


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Salt the big side, replicate the small side across all salts, join
    on (keys + salt). Result equals ``big.join(small, on, how)`` for
    many-to-one joins (small side unique on ``on``)."""
    salted_big = with_salt(big, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT)
    replicated = small.select("*", salts).withColumn(SALT, F.col(SALT).cast("int"))
    return (salted_big.join(replicated, [*on, SALT], how)
            .drop(SALT))
