"""Collocation extraction — windowed co-occurrence + PMI ranking.

The classic distributional-semantics corpus stage (phrase detection,
word2vec-style vocabulary prep): count token pairs co-occurring within
a sliding window, score them by pointwise mutual information against
the unigram distribution, keep the top collocations. The reference has
no corpus analytics at all (it delegates every aggregation to ES, ref
ElasticIndex.java:663-667); this extends the engine's LLM-pipeline
tier alongside the frequent-item-set and TF-IDF operators.

Scale shape: pair generation is the shingles zip_with pattern (each
window offset is one array zip against a shifted slice — no per-token
explode-and-self-join, no UDF), so the expensive map is linear in
tokens × window. The only shuffles are keyed aggregations with
map-side combine (pair counts, unigram counts) plus two equi-joins of
the FLOOR-PRUNED pair frame against the unigram counts; corpus totals
ride single-row broadcast crossJoins (the engine's documented
aggregate-broadcast pattern).

The emitted score is the PMI **ratio** P(x,y)/(P(x)·P(y)) rather than
its logarithm: the ratio is a single IEEE division chain over exact
integer counts — bit-identical in any engine that evaluates the same
expression order, which is what the DuckDB oracle does — while ln()
is libm-dependent at the last ulp. PMI = ln(ratio), monotonic, so
ranking and thresholds are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_es_index_spark.functions.text import tokens
from cassandra_es_index_spark.operators.dedup import _spread

__all__ = ["pmi_pairs"]


def pmi_pairs(df: DataFrame, id_col: str, text_col: str,
              window: int = 5, min_count: int = 5,
              top_k: int = 100) -> DataFrame:
    """Top-k collocations: (pair, c_xy, pmi_ratio) for unordered token
    pairs co-occurring within ``window`` positions (offsets 1..window-1,
    the unigram-window convention), pair count floored at ``min_count``,
    ranked by PMI ratio desc then pair asc (deterministic ties).

    ``pair`` is "w1 w2" with w1 <= w2 (tokens are whitespace-split, so
    the space separator is unambiguous). ``pmi_ratio`` =
    (c_xy · N_tok · N_tok) / (N_pairs · c_x · c_y) — see module
    docstring for why the log is left to the caller."""
    if not isinstance(window, int) or window < 2:
        raise ValueError(f"window must be an integer >= 2, "
                         f"got {window!r}")
    if not isinstance(min_count, int) or min_count < 1:
        raise ValueError(f"min_count must be an integer >= 1, "
                         f"got {min_count!r}")
    if not isinstance(top_k, int) or top_k < 1:
        raise ValueError(f"top_k must be an integer >= 1, got {top_k!r}")

    base = _spread(df.select(tokens(F.col(text_col)).alias("_toks")))
    sz = F.size("_toks")

    # pair arrays per offset: zip the token array against its own
    # shifted slice (the shingles pattern — every array evaluates once
    # per row); zip_with pads the short side with nulls, sliced off
    pair_arrays = []
    for j in range(1, window):
        tail = F.slice("_toks", j + 1, F.greatest(sz - j, F.lit(0)))
        zipped = F.zip_with(
            F.col("_toks"), tail,
            lambda a, b: F.when(a <= b, F.concat_ws(" ", a, b))
                          .otherwise(F.concat_ws(" ", b, a)))
        pair_arrays.append(
            F.slice(zipped, 1, F.greatest(sz - j, F.lit(0))))
    pairs = base.select(
        F.explode(F.flatten(F.array(*pair_arrays))).alias("pair"))

    # (r15.2) `uni` feeds TWO joins (_w1/_w2) and Spark planned the
    # unigram aggregation subtree — a full corpus tokenize+explode —
    # once per consumer (no ReusedExchange across the alias boundary).
    # One lazy localCheckpoint pins the vocab-sized count frame so the
    # corpus-side unigram aggregation is planned once (guide §2.4: the
    # after-plan's two broadcast builds read Scan ExistingRDD where the
    # before-plan carried the full tokenize+agg subtree twice). Timing
    # at sf0.1 is neutral within noise — the two broadcast builds can
    # still race the lazy pin concurrently, each at most re-paying what
    # the unpinned plan always paid — but the pinned form removes one
    # corpus tokenize whenever the builds run in sequence, which is the
    # at-scale shape. An eager pin measured slightly WORSE (its
    # materialization job is a full extra barrier at this size).
    uni = (base.select(F.explode("_toks").alias("tok"))
           .groupBy("tok").agg(F.count("*").alias("c_tok"))
           .localCheckpoint(eager=False))
    # (r15) the pair total used to be a second aggregate over the pair
    # counts — and with `pc` feeding two consumers the whole pair
    # explosion (and corpus tokenize) executed twice. The total has a
    # closed form the emitter guarantees: every doc contributes exactly
    # max(sz-j, 0) pairs at offset j (zip_with never yields nulls, the
    # slices drop the pad), so N_pairs = Σ_docs Σ_j max(sz-j, 0) — an
    # exact integer identity, computed in the SAME single-row aggregate
    # as N_tok. One corpus scan replaces three (guide §1.2/§2.4).
    pair_cnt = None
    for j in range(1, window):
        term = F.greatest(sz - j, F.lit(0))
        pair_cnt = term if pair_cnt is None else pair_cnt + term
    totals = base.agg(
        F.sum(sz).cast("double").alias("n_toks"),
        F.sum(pair_cnt).cast("double").alias("n_pairs"))
    pc = pairs.groupBy("pair").agg(F.count("*").alias("c_xy"))

    cand = (pc.where(F.col("c_xy") >= min_count)
            .withColumn("_w1", F.split_part("pair", F.lit(" "),
                                            F.lit(1)))
            .withColumn("_w2", F.split_part("pair", F.lit(" "),
                                            F.lit(2)))
            .join(uni.select(F.col("tok").alias("_w1"),
                             F.col("c_tok").alias("_c1")), "_w1")
            .join(uni.select(F.col("tok").alias("_w2"),
                             F.col("c_tok").alias("_c2")), "_w2")
            .crossJoin(F.broadcast(totals)))
    # op order pinned left-to-right — the oracle repeats it verbatim
    ratio = ((F.col("c_xy").cast("double") * F.col("n_toks")
              * F.col("n_toks"))
             / (F.col("n_pairs") * F.col("_c1") * F.col("_c2")))
    return (cand.select("pair", F.col("c_xy").cast("long").alias("c_xy"),
                        ratio.alias("pmi_ratio"))
            .orderBy(F.desc("pmi_ratio"), F.asc("pair"))
            .limit(top_k))
