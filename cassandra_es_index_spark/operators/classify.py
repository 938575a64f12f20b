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
