"""Linear quality-classifier scoring (north-star operator).

The GPT-3 / CCNet-style quality filter is a linear text classifier
(logistic regression or fastText) scoring every document against a
"high-quality reference vs crawl" model. The engine-portable analogue
here scores with a PROVIDED token-weight table — training happens
offline (any public toolkit); applying the model at corpus scale is
the data-pipeline job, and it is pure relational algebra:

    score = sigmoid(bias + mean_token_weight)

with out-of-vocabulary tokens contributing weight 0 to the mean (the
fastText convention: the document vector is the average of its token
vectors, OOV = zero vector). Deterministic and oracle-replayable: the
mean is rounded to 6 dp before the logistic.

Scale shape (100 TB): one corpus token explode, one equi-join against
the weight table (vocab-sized — AQE broadcasts it when it fits), one
map-side-combinable per-document aggregation. No UDFs, no driver
loops; the weight table is the only small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cassandra_es_index_spark.functions.text import tokens


def weight_table(spark, weights: dict[str, float]) -> DataFrame:
    """(token, weight) frame from an offline-trained model's vocabulary."""
    if not weights:
        raise ValueError("weights must be non-empty")
    return spark.createDataFrame(
        [(t, float(w)) for t, w in weights.items()],
        "token string, weight double")


def linear_quality_score(df: DataFrame, id_col: str, text_col: str,
                         weights: DataFrame | dict[str, float],
                         bias: float = 0.0,
                         threshold: float = 0.5) -> DataFrame:
    """Per-document classifier score: (id, n_tokens, score, keep).

    ``score = 1 / (1 + e^-(bias + mean_w))`` where ``mean_w`` is the
    document's mean token weight (OOV tokens weigh 0, counted in the
    denominator); ``keep`` is the ``score >= threshold`` filter
    decision. ``weights`` may be a (token, weight) DataFrame or a
    plain dict.

    Determinism: per-token weights quantize to integers (×10⁶,
    rounded) and the per-document SUM runs in exact integer
    arithmetic — order-independent, so the mean is bit-identical in
    any engine regardless of partition order. (A floating mean is
    NOT: decimal weights over power-of-two doc lengths land exactly
    on rounding boundaries, where sum-order ulps flip the rounded
    value — caught by the sf0.1 oracle.)"""
    if isinstance(weights, dict):
        weights = weight_table(df.sparkSession, weights)
    tok = df.select(F.col(id_col),
                    F.explode(tokens(F.col(text_col))).alias("token"))
    qw = F.round(F.coalesce(F.col("weight"), F.lit(0.0))
                 * F.lit(1000000.0)).cast("long")
    scored = (tok.join(F.broadcast(weights), on="token", how="left")
              .groupBy(id_col)
              .agg(F.count("*").cast("long").alias("n_tokens"),
                   F.sum(qw).alias("_sw")))
    scored = scored.withColumn(
        "_mw", F.col("_sw").cast("double")
        / (F.lit(1000000.0) * F.col("n_tokens")))
    score = F.round(
        F.lit(1.0) / (F.lit(1.0)
                      + F.exp(-(F.lit(float(bias)) + F.col("_mw")))), 6)
    return scored.select(id_col, "n_tokens",
                         score.alias("score"),
                         (score >= F.lit(float(threshold)))
                         .alias("keep"))


def train_logreg(df: DataFrame, feature_cols: list[str],
                 label_col: str, *, n_iters: int = 2, lr: float = 0.1,
                 intercept: bool = True) -> DataFrame:
    """DISTRIBUTED training for the quality classifier (r15): full-
    batch gradient descent for logistic regression, one corpus scan
    per iteration — the missing half of ``linear_quality_score``
    (which applies a trained model). Returns a (feature,
    weight_scaled, weight) frame; ``weight = weight_scaled/(1e9·N)``.

    Exactness is the design center: features and labels cast to
    integers, the per-row residual quantizes to 1e-6 fixed point
    (``r = round(1e6·(σ(z)−y))``), and both the gradient sums and the
    per-row dot products run in decimal(38,0) — order-independent
    integer arithmetic, so training is bit-reproducible under any
    partitioning AND replayable in plain SQL (the oracle unrolls the
    iterations as chained CTEs). The trick that keeps the weight
    update exact with no float rounding anywhere: with
    ``lr = lr_m/1000``, the update ``w ← w − lr·g/(1e6·N)`` in units
    of ``1/(1e9·N)`` is the INTEGER recurrence ``W ← W − lr_m·G``;
    ``z = (Σ W_j·x_j)/(1e9·N)`` is one deterministic double division
    per row. ``lr`` must therefore be a positive multiple of 0.001
    (typed error otherwise).

    Scale shape (100 TB): each iteration is one scan + one map-side-
    combinable aggregate of B decimals (B = feature count, dozens);
    weights ride the next plan as literals. The corpus never
    shuffles; there is no driver-side data, only the B-vector.
    Labels must be 0/1 integers; a constant ``_intercept`` feature is
    prepended unless ``intercept=False``.
    """
    if not feature_cols:
        raise ValueError("train_logreg: feature_cols must be non-empty")
    if not isinstance(n_iters, int) or n_iters < 1:
        raise ValueError(f"train_logreg: n_iters must be a positive "
                         f"integer, got {n_iters!r}")
    lr_m = lr * 1000.0
    if not (lr_m > 0 and abs(lr_m - round(lr_m)) < 1e-9):
        raise ValueError(
            f"train_logreg: lr must be a positive multiple of 0.001 "
            f"(the exact-update grid), got {lr!r}")
    lr_m = int(round(lr_m))
    names = (["_intercept"] if intercept else []) + list(feature_cols)
    xcols = ([F.lit(1).cast("long")] if intercept else []) + \
        [F.col(c).cast("long") for c in feature_cols]
    base = df.select(
        *[c.alias(f"_x{j}") for j, c in enumerate(xcols)],
        F.col(label_col).cast("long").alias("_y")).persist()
    try:
        n = base.count()
        if n == 0:
            raise ValueError("train_logreg: empty training frame")
        b = len(names)
        denom = 1.0e9 * n
        dec = "decimal(38,0)"
        weights = [0] * b
        for _ in range(n_iters):
            dot = F.lit(0).cast(dec)
            for j in range(b):
                dot = dot + (F.lit(weights[j]).cast(dec)
                             * F.col(f"_x{j}").cast(dec))
            z = dot.cast("double") / F.lit(denom)
            sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            r = F.round((sig - F.col("_y").cast("double"))
                        * F.lit(1000000.0)).cast("long")
            row = base.agg(*[
                F.sum((r * F.col(f"_x{j}")).cast(dec)).alias(f"g{j}")
                for j in range(b)]).first()
            for j in range(b):
                weights[j] -= lr_m * int(row[f"g{j}"])
    finally:
        base.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(names[j], weights[j], weights[j] / denom) for j in range(b)],
        "feature string, weight_scaled long, weight double")
