"""BPE vocabulary induction over a corpus (north-star operator).

The classic byte-pair-encoding trainer (Sennrich et al. 2016, public):
start from characters (plus a word-end marker), repeatedly merge the
most frequent adjacent symbol pair, and the merge table IS the learned
vocabulary. The reference engine has no tokenizer training at all —
this is part of the LLM-data-pipeline tier the north star adds.

Spark-first shape: training never touches the corpus per merge — it
runs on the DISTINCT word-frequency table (|vocab| rows, not |corpus|;
one corpus scan builds it with a map-side-combinable count). Each
merge round is one pair-count aggregation over that small frame plus a
1-row argmax collect; the symbol rewrite is a pure higher-order fold
(greedy left-to-right, the reference semantics), and ``localCheckpoint``
caps plan depth across rounds — the same iterative-DataFrame
discipline as ``connected_components``.

Determinism: pair argmax ties break lexicographically (freq desc,
left asc, right asc) — pinned against a pure-Python twin in tests, and
the level-0 pair counts are closed-form SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

END_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) — the distinct-word frequency table the trainer
    runs on. Lowercased whitespace tokens (the engine's default
    analyzer); one corpus scan, map-side-combined count."""
    return (df.select(F.explode(tokens(F.col(text_col))).alias("word"))
              .where(F.col("word") != "")
              .groupBy("word").agg(F.count("*").alias("freq")))


def _initial_symbols(word: Column) -> Column:
    """Character symbols plus the word-end marker — the BPE level-0
    segmentation."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_WORD)))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<left,right>> of adjacent symbol pairs (overlaps
    included — the classic get_stats counting)."""
    idx = F.sequence(F.lit(0), F.size(syms) - 2)
    return F.when(F.size(syms) >= 2, F.transform(
        idx, lambda i: F.struct(F.get(syms, i).alias("left"),
                                F.get(syms, i + 1).alias("right")))
    ).otherwise(F.array().cast(
        "array<struct<left:string,right:string>>"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, freq) over a (syms, freq) frame."""
    return (words
            .select(F.explode(_adjacent_pairs(F.col("syms")))
                    .alias("pr"), "freq")
            .groupBy(F.col("pr.left").alias("left"),
                     F.col("pr.right").alias("right"))
            .agg(F.sum("freq").alias("freq")))


def bpe_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Level-0 adjacent-pair frequencies: (left, right, freq) over the
    character(+end-marker) segmentation of the corpus vocabulary —
    the frame whose argmax seeds the first BPE merge. Closed-form
    (no iteration), oracle-checkable."""
    w = word_counts(df, text_col).withColumn(
        "syms", _initial_symbols(F.col("word")))
    return _pair_counts(w)


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of every (left, right) occurrence:
    a pure fold — after a merge the combined symbol is what the next
    comparison sees, so "a a a" under (a,a) yields ["aa","a"]."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(merged))
        ).otherwise(F.concat(acc, F.array(s))))


def bpe_learn(df: DataFrame, text_col: str,
              num_merges: int) -> list[tuple[str, str]]:
    """Train a BPE merge table: ``num_merges`` (left, right) merges in
    learned order. Ties in pair frequency break (left asc, right asc)
    — deterministic where the reference implementation's dict-max is
    not. Stops early (shorter list) when no pair remains."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    words = (word_counts(df, text_col)
             .withColumn("syms", _initial_symbols(F.col("word")))
             .select("syms", "freq")
             .localCheckpoint(eager=True))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (_pair_counts(words)
               .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
               .limit(1).collect())
        if not top:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        words = (words.select(
            _merge_pair(F.col("syms"), left, right).alias("syms"),
            "freq")
            .localCheckpoint(eager=True))
    return merges


def bpe_segment(df: DataFrame, id_col: str, text_col: str,
                merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge table: (id, bpe_tokens array<string>,
    n_bpe_tokens). One corpus scan — the merge folds compose into a
    single projection per document; word-end markers are kept on the
    trailing subword (the Sennrich convention). Documents with no
    whitespace tokens produce no row (the groupBy convention shared
    with cross_entropy_score)."""
    word_syms = _initial_symbols(F.col("word"))
    for left, right in merges:
        word_syms = _merge_pair(word_syms, left, right)
    per_word = (df.select(F.col(id_col),
                          F.posexplode(tokens(F.col(text_col)))
                          .alias("pos", "word"))
                  .where(F.col("word") != "")
                  .select(id_col, "pos", word_syms.alias("syms")))
    return (per_word
            .groupBy(id_col)
            .agg(F.flatten(F.array_sort(F.collect_list(
                F.struct("pos", "syms"))).syms).alias("bpe_tokens"))
            .withColumn("n_bpe_tokens",
                        F.size("bpe_tokens").cast("long")))
