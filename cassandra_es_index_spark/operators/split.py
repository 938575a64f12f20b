"""Deterministic train/validation/test corpus splitting — a
training-data pipeline staple.

A split must be (a) reproducible across runs and cluster sizes, (b)
stable under corpus growth (a document's split never changes when other
documents arrive), and (c) computable with zero coordination. All three
fall out of the keyed multiplicative hash the engine's random_sampler
agg uses: ``u = ((key + seed) · 2654435761 mod 2³²) / 2³²`` is a
uniform-ish value in [0, 1) derived from the document key alone, and the
split is the first cumulative-fraction bucket containing ``u``. Pure
Column math — the assignment rides the scan filter/projection inside
whole-stage codegen, and the SAME integer arithmetic replays in DuckDB
(the oracle) and any other engine.

Spark's own ``randomSplit`` is NOT reproducible across partitionings
(it seeds per partition); this is the keyed alternative that is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD = 4294967296


def split_hash_unit(key: Column, seed: int = 0) -> Column:
    """The [0, 1) unit-interval hash of an integer key — Knuth's
    multiplicative hash mod 2³² (Java's wrapping long multiply is exact
    here because 2³² divides 2⁶⁴; the random_sampler agg shares the
    same arithmetic)."""
    h = F.pmod((key.cast("long") + F.lit(int(seed))) * F.lit(KNUTH),
               F.lit(MOD))
    return h / F.lit(float(MOD))


def split_assign(df: DataFrame, key_col: str,
                 fractions: dict[str, float],
                 seed: int = 0,
                 out_col: str = "split") -> DataFrame:
    """Add a ``split`` column assigning each row to a named split by
    keyed hash. ``fractions`` maps split name → fraction; they must sum
    to 1 (±1e-9). Assignment: the first split whose cumulative fraction
    exceeds the row's unit hash — so enlarging one split's fraction
    only MOVES the boundary (rows change split monotonically), and two
    runs with the same seed agree row-for-row at any scale."""
    if not fractions:
        raise ValueError("split_assign: fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split_assign: fractions must sum to 1, got {total}")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("split_assign: fractions must be non-negative")
    u = split_hash_unit(F.col(key_col), seed)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def shuffle_key(df: DataFrame, key_col: str, seed: int = 0,
                out_col: str = "shuffle_key") -> DataFrame:
    """Deterministic global training-data shuffle (r13): add a
    uniform-ish sort key derived from the document key alone — writing
    the corpus ordered by it IS the shuffled epoch, reproducible
    across runs, cluster sizes, and engines (the same Knuth arithmetic
    replays in the DuckDB oracle).

    Scale shape: consumers ``repartitionByRange(out_col)`` /
    ``orderBy(out_col)`` at write time — a distributed range-exchange
    sort, never a single-partition rank window (a global row_number
    would serialize the corpus through one task; the key itself is
    embarrassingly parallel Column math). Different epochs = different
    seeds."""
    return df.withColumn(out_col,
                         split_hash_unit(F.col(key_col), seed))
