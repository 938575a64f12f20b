"""Tests for the north-star operators: dedup, similarity, multimodal,
text analysis."""

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.functions import text as tx
from cassandra_es_index_spark.operators import bpe, dedup, multimodal, similarity


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),   # near dup
        (4, "completely different content about spark engines"),
        (5, "THE QUICK  brown fox jumps over the lazy dog"),  # dup modulo case/ws
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(corpus):
    out = dedup.exact_duplicates(corpus, "doc_id", "text")
    groups = {r["representative_id"]: r["n_copies"] for r in out.collect()}
    assert groups[1] == 3  # docs 1, 2, 5 normalize identically
    assert groups[3] == 1
    assert groups[4] == 1


def test_jaccard_pairs(corpus):
    out = dedup.jaccard_pairs(corpus, "doc_id", "text", threshold=0.7)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_finds_exact_and_near(corpus):
    # true shingle-Jaccard(1,3) = 4/10 = 0.4 (one word changed in 9 →
    # 3 of 7 trigrams differ), so band narrowly and keep the threshold low
    out = dedup.minhash_lsh_pairs(corpus, "doc_id", "text",
                                  threshold=0.2, num_hashes=64, bands=64)
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in out.collect()}
    assert pairs[(1, 2)] == 1.0  # identical signatures
    assert (1, 3) in pairs      # near dup shares most shingles
    assert not any(4 in p for p in pairs)


def test_simhash_pairs(corpus):
    sigs = {r["doc"]: r["simhash"] for r in dedup.simhash64(corpus, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]  # identical text → identical signature
    out = dedup.simhash_pairs(corpus, "doc_id", "text", max_hamming=8)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (1, 2) in pairs


def test_cosine_topk(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]), (3, [-1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(df, "vec_id", "embedding", [1.0, 0.0, 0.0],
                                 k=2, exclude_id=0)
    got = [(r["vec_id"], r["cos_sim"]) for r in out.collect()]
    assert got[0][0] == 1 and got[0][1] > 0.99
    assert got[1][0] == 2


def test_cosine_join_topk(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "vec_id long, embedding array<float>")
    queries = corpus.where(F.col("vec_id") < 2)
    out = similarity.cosine_join_topk(corpus, queries, "vec_id", "embedding",
                                      "vec_id", "embedding", k=1)
    got = {r["query_id"]: r["corpus_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1}  # each query's nearest is itself


def test_lsh_ann_recall_on_self(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(50)], "vec_id long, embedding array<float>")
    queries = df.where(F.col("vec_id") < 5)
    out = similarity.lsh_ann_topk(df, queries, "vec_id", "embedding",
                                  "vec_id", "embedding", k=1, n_planes=4, n_tables=3)
    got = {r["query_id"]: r["corpus_id"] for r in out.collect()}
    # a vector always collides with itself in every table → self is found
    assert got == {i: i for i in range(5)}


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("the cat and the dog in the house",),
         ("der hund und die katze ist nicht da",),
         ("xyzzy plugh",)], "text string")
    out = df.select(
        tx.token_count(F.col("text")).alias("n"),
        tx.lang_id(F.col("text")).alias("lang"),
        tx.quality_score(F.col("text")).alias("q"),
        tx.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert out[0]["n"] == 8 and out[0]["lang"] == "en"
    assert out[1]["lang"] == "de"
    assert out[2]["lang"] == "und"
    assert 0 < out[0]["q"] <= 1
    assert len(out[0]["fp"]) == 32


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    out = df.select(tx.shingles(F.col("text"), 3).alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == ["a b"]  # shorter than n → whole text


def test_multimodal_features_and_frames(spark):
    # m1 is an unrecognized-format row (stub path); mp4 is the one
    # remaining real seam — png/wav/jpeg all decode for REAL
    # (test_media_codecs.py)
    rows = [
        ("m1", b"\x01\x02\x03", ("image", "webp", 10, 10, None, None)),
        ("m2", b"\x09\x08", ("video", "mp4", 64, 48, 3500, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with_meta = multimodal.attach_metadata(df)
    metas = {r["media_id"]: r["meta"]["n_bytes"] for r in with_meta.collect()}
    assert metas == {"m1": 3, "m2": 2}

    feats = multimodal.extract_features(df, dim=8).collect()
    by_id = {r["media_id"]: r["features"] for r in feats}
    assert len(by_id["m1"]) == 8
    # deterministic: same bytes → same features
    feats2 = multimodal.extract_features(df, dim=8).collect()
    assert {r["media_id"]: r["features"] for r in feats2} == by_id

    frames = multimodal.frame_sample(with_meta, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in frames)
    assert ts == [0, 1000, 2000, 3000]  # only the video row, 3.5 s

    with pytest.raises(Exception):
        multimodal.extract_features(df, dim=8, use_stub=False).collect()


def test_ivf_ann(spark):
    import numpy as np
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((80, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(80)],
        "vec_id long, embedding array<float>")
    indexed, centroids = similarity.ivf_build(df, "vec_id", "embedding",
                                              n_cells=4, n_iters=2)
    assert indexed.select("cell").distinct().count() <= 4
    assert len(centroids) == 4

    queries = df.where(F.col("vec_id") < 5)
    # full probe == exact brute force
    exact = similarity.cosine_join_topk(df, queries, "vec_id", "embedding",
                                        "vec_id", "embedding", k=3)
    full = similarity.ivf_topk(indexed, centroids, queries,
                               "vec_id", "embedding", k=3, nprobe=4)
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    f = {(r["query_id"], r["corpus_id"]) for r in full.collect()}
    assert e == f
    # narrow probe still finds self (it lives in the probed cell)
    narrow = similarity.ivf_topk(indexed, centroids, queries,
                                 "vec_id", "embedding", k=1, nprobe=1)
    got = {r["query_id"]: r["corpus_id"] for r in narrow.collect()}
    assert got == {i: i for i in range(5)}


def test_jaccard_auto_guard_bounds_hot_tokens(spark):
    # 30 docs all share a hot token; each also carries one unique token.
    # Bare blocking would generate C(30,2)=435 candidates off the hot token;
    # the df cutoff drops it from candidate generation, and since no
    # qualifying pair exists, the result is empty — bounded, not quadratic.
    rows = [(i, f"common u{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.jaccard_pairs(df, "doc_id", "text", threshold=0.5,
                              max_token_df="auto", auto_floor=5)
    assert out.count() == 0
    # near-dup pairs sharing a rare token still pair up under the guard
    rows.append((100, "common u7 extra"))
    df2 = spark.createDataFrame(rows, "doc_id long, text string")
    out2 = dedup.jaccard_pairs(df2, "doc_id", "text", threshold=0.5,
                               max_token_df="auto", auto_floor=5)
    assert [(r["doc_a"], r["doc_b"]) for r in out2.collect()] == [(7, 100)]


def test_jaccard_auto_guard_noop_on_small_corpus(spark):
    # corpus smaller than the floor → guard disabled, exact semantics
    rows = [(1, "a b c"), (2, "a b c"), (3, "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.jaccard_pairs(df, "doc_id", "text", threshold=0.9)
    assert [(r["doc_a"], r["doc_b"]) for r in out.collect()] == [(1, 2)]


def test_minhash_token_unit_estimates_token_jaccard(spark):
    # permuted bag-of-words docs: token sets identical, order scrambled —
    # token-unit signatures match exactly; shingle-unit sees different docs
    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "zeta epsilon delta gamma beta alpha"),
            (3, "totally different words here now ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = dedup.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.9,
                                  num_hashes=16, bands=8, unit="token")
    got = [(r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in tok.collect()]
    assert got == [(1, 2, 1.0)]
    sh = dedup.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.9,
                                 num_hashes=16, bands=8, unit="shingle")
    assert sh.count() == 0  # order-sensitive: permutation is not a near-dup


def test_ann_recall_floors(spark):
    """Recall of every approximate tier vs its exact twin stays above a
    measured floor on the real test corpus (VERDICT r1 item 9)."""
    import __spark_entry__ as entry

    out = {r["method"]: r["recall"]
           for r in entry.q_ann_recall(spark, "/root/testdata/sf0.001").collect()}
    assert out["ivf_topk_nprobe3"] >= 0.8
    assert out["minhash_lsh_vs_jaccard09"] >= 0.9
    assert out["lsh_ann_topk"] >= 0.5


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [(1, "don't stop"), (2, "abc123 x-y"), (3, "hello")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", tx.bpe_ish_token_count(F.col("text")).alias("n")).collect()}
    # don|'t|( stop) = 3 ; abc|123|( x)|-|y = 5 ; hello = 1
    assert out == {1: 3, 2: 5, 3: 1}


def test_resize_images_plumbing(spark):
    media = spark.createDataFrame(
        [("m1", b"imagebytes-1"), ("m2", b"imagebytes-2")],
        "media_id string, content binary").withColumn(
            "meta", F.lit(None).cast(multimodal.MEDIA_METADATA))
    out = multimodal.resize_images(media, 32, 24)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {"m1", "m2"}
    for r in rows.values():
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 24
        assert r["meta"]["n_bytes"] == len(r["content"]) == 64
    # deterministic stub output
    again = {r["media_id"]: bytes(r["content"])
             for r in multimodal.resize_images(media, 32, 24).collect()}
    assert again == {k: bytes(v["content"]) for k, v in rows.items()}
    # real-codec seam raises per batch
    import pytest as _pytest
    with _pytest.raises(Exception):
        multimodal.resize_images(media, 32, 24, use_stub=False).collect()


def test_simhash_pigeonhole_recall_is_total(spark):
    """Property: for ANY pair of 64-bit signatures within the hamming
    budget, pigeonhole banding must generate the candidate (the old
    top-prefix banding silently dropped pairs whose differing bits touched
    the prefix — e.g. flipping bit 63)."""
    import random

    rng = random.Random(42)
    rows, expected = [], set()
    doc = 0
    for trial in range(40):
        base = rng.getrandbits(64)
        rows.append((doc, base - (1 << 64) if base >= (1 << 63) else base))
        # flip up to max_hamming bits, biased to include HIGH bits (the
        # old prefix scheme's blind spot)
        n_flips = rng.randint(1, 3)
        bits = rng.sample(range(64), n_flips)
        if trial % 2 == 0:
            bits[0] = 63 - (trial % 4)  # force a high-bit flip
        mutated = base
        for bit in set(bits):
            mutated ^= (1 << bit)
        rows.append((doc + 1,
                     mutated - (1 << 64) if mutated >= (1 << 63) else mutated))
        expected.add((doc, doc + 1))
        doc += 2
    sigs = spark.createDataFrame(rows, "doc long, simhash long")
    out = dedup.simhash_pairs_from_signatures(sigs, max_hamming=3)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    missing = expected - got
    assert not missing, f"pigeonhole banding missed pairs: {sorted(missing)}"


def test_simhash_pairs_hamming_bound(spark):
    """No pair beyond the hamming budget survives verification."""
    rows = [(1, 0), (2, 0b111), (3, 0b11111)]  # d(1,2)=3, d(1,3)=5, d(2,3)=2
    sigs = spark.createDataFrame(rows, "doc long, simhash long")
    out = dedup.simhash_pairs_from_signatures(sigs, max_hamming=3)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    assert got == {(1, 2): 3, (2, 3): 2}


def test_minhash_exact_verify_reports_true_jaccard(corpus):
    """verify="exact": reported jaccard equals the true token-set Jaccard
    and no below-threshold pair survives — precision 1 by construction."""
    out = dedup.minhash_lsh_pairs(corpus, "doc_id", "text",
                                  threshold=0.5, num_hashes=64, bands=64,
                                  unit="token", verify="exact")
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    # docs 1/2 identical token sets → true jaccard 1.0
    assert rows[(1, 2)] == 1.0
    # doc 3 swaps one of eight distinct tokens → true J = 7/9 = 0.777778
    assert rows[(1, 3)] == 0.777778
    assert all(j >= 0.5 for j in rows.values())
    # cross-check against the exact operator at the same threshold
    exact = dedup.jaccard_pairs(corpus, "doc_id", "text", threshold=0.5,
                                max_token_df=None)
    truth = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in exact.collect()}
    for pair, j in rows.items():
        assert truth[pair] == j


def test_embedding_dup_pairs_exact_and_lsh(spark):
    """Embedding-cosine near-dup tier: exact all-pairs baseline, and the
    LSH path whose candidates are exact-verified (precision 1)."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
            (3, [-1.0, 0.0, 0.0, 0.0]),     # opposite
            (4, [0.7071, 0.7071, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = similarity.embedding_dup_pairs(emb, "vec_id", "embedding",
                                           threshold=0.95, method="exact")
    pairs = {(r["doc_a"], r["doc_b"]): r["cos_sim"] for r in exact.collect()}
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] > 0.99
    # LSH path: candidates exact-verified, so every reported pair is true
    lsh = similarity.embedding_dup_pairs(emb, "vec_id", "embedding",
                                         threshold=0.95, method="lsh",
                                         n_planes=4, n_tables=8)
    lsh_pairs = {(r["doc_a"], r["doc_b"]): r["cos_sim"] for r in lsh.collect()}
    assert set(lsh_pairs) <= set(pairs)       # precision 1
    assert (0, 1) in lsh_pairs                # collides in some table
    assert lsh_pairs[(0, 1)] == pairs[(0, 1)]


def test_ivf_persisted_index_roundtrip(spark, tmp_path):
    """IVF write/read: identical query results against the persisted
    index, and probes prune to the probed cells' partitions on disk."""
    import numpy as np
    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((60, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(60)],
        "vec_id long, embedding array<float>")
    indexed, centroids = similarity.ivf_build(df, "vec_id", "embedding",
                                              n_cells=4, n_iters=2)
    path = str(tmp_path / "ivf")
    similarity.ivf_write(indexed, centroids, path)
    stored, stored_centroids = similarity.ivf_read(spark, path)
    assert stored_centroids == centroids

    queries = df.where(F.col("vec_id") < 3)
    mem = similarity.ivf_topk(indexed, centroids, queries,
                              "vec_id", "embedding", k=2, nprobe=2)
    disk = similarity.ivf_topk(stored, stored_centroids, queries,
                               "vec_id", "embedding", k=2, nprobe=2)
    m = sorted((r["query_id"], r["corpus_id"], r["cos_sim"])
               for r in mem.collect())
    d = sorted((r["query_id"], r["corpus_id"], r["cos_sim"])
               for r in disk.collect())
    assert m == d
    # the persisted layout is partitioned by cell → the probe join can
    # partition-prune; at minimum the layout must exist per cell
    import os
    cells = [n for n in os.listdir(path) if n.startswith("cell=")]
    assert len(cells) == indexed.select("cell").distinct().count()


def test_interval_join_matches_naive(spark):
    """Binned interval join ≡ the naive cross-join filter — including
    boundary inclusivity, nulls, inverted intervals, and points covered
    by several intervals — with no duplicate pairs from the binning."""
    import random
    from cassandra_es_index_spark.operators import rangejoin

    rng = random.Random(11)
    pts = [(k, rng.randint(-50, 150)) for k in range(200)] + [(200, None)]
    ivs = []
    for k in range(40):
        lo = rng.randint(-60, 140)
        ivs.append((k, lo, lo + rng.randint(0, 40)))
    ivs += [(40, 10, 5), (41, None, 20), (42, 30, None)]  # degenerate
    p = spark.createDataFrame(pts, "pk long, v int")
    i = spark.createDataFrame(ivs, "ik long, lo int, hi int")

    got = sorted((r["pk"], r["ik"]) for r in
                 rangejoin.interval_join(p, i, "v", "lo", "hi",
                                         bin_width=16).collect())
    naive = sorted((r["pk"], r["ik"]) for r in
                   p.crossJoin(i)
                    .where(F.col("v").between(F.col("lo"), F.col("hi")))
                    .collect())
    assert got == naive and len(got) == len(set(got))
    # a width larger than every interval must agree too
    wide = sorted((r["pk"], r["ik"]) for r in
                  rangejoin.interval_join(p, i, "v", "lo", "hi",
                                          bin_width=500).collect())
    assert wide == naive


# -- repetition metrics (Gopher-style LLM data-cleaning signals) ------------


def test_repetition_metrics_known_values(spark):
    from cassandra_es_index_spark.functions import text as tx
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("d1", "spam spam spam spam"),          # one token repeated
         ("d2", "all words here differ fully"),  # no repetition
         ("d3", "go stop go stop go"),           # bigrams repeat
         ("d4", "solo")],                        # single token
        "id string, text string")
    rows = {r["id"]: r for r in df.select(
        "id",
        tx.dup_token_fraction(F.col("text")).alias("dtf"),
        tx.dup_bigram_fraction(F.col("text")).alias("dbf"),
        tx.top_token_share(F.col("text")).alias("tts")).collect()}
    assert rows["d1"]["dtf"] == 0.75          # 4 tokens, 1 distinct
    assert rows["d1"]["dbf"] == round(2 / 3, 6)   # 3 bigrams, 1 distinct
    assert rows["d1"]["tts"] == 1.0
    assert rows["d2"]["dtf"] == 0.0
    assert rows["d2"]["dbf"] == 0.0
    assert rows["d2"]["tts"] == 0.2
    # d3: 5 tokens {go:3, stop:2} → dtf 3/5; bigrams: [go stop, stop go,
    # go stop, stop go] → 4 total 2 distinct → 0.5; tts 3/5
    assert rows["d3"]["dtf"] == round(3 / 5, 6)
    assert rows["d3"]["dbf"] == 0.5
    assert rows["d3"]["tts"] == round(3 / 5, 6)
    assert rows["d4"]["dtf"] == 0.0
    assert rows["d4"]["dbf"] == 0.0           # <2 tokens → defined as 0
    assert rows["d4"]["tts"] == 1.0


def test_dup_line_fractions_known_values(spark):
    """r12 Gopher line-level repetition signals: duplicate-line
    fraction (1 − distinct/total over non-empty trimmed lines) and the
    character-weighted companion (occurrences beyond a line's first
    count their characters as duplicated)."""
    from cassandra_es_index_spark.functions import text as tx
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("d1", "nav bar\nbody text here\nnav bar"),   # 1 of 3 dup
         ("d2", "a\nb\nc"),                            # no dups
         ("d3", "only one line"),                      # single line
         ("d4", "x\n\n  \nx"),                         # blanks drop
         ("d5", "looong footer line\nz\nlooong footer line")],
        "id string, text string")
    rows = {r["id"]: r for r in df.select(
        "id",
        tx.dup_line_fraction(F.col("text")).alias("dlf"),
        tx.dup_line_char_fraction(F.col("text")).alias("dlcf"))
        .collect()}
    assert rows["d1"]["dlf"] == round(1 / 3, 6)
    # chars: 7+14+7 = 28, distinct 7+14 = 21 → 7/28
    assert rows["d1"]["dlcf"] == 0.25
    assert rows["d2"]["dlf"] == 0.0 and rows["d2"]["dlcf"] == 0.0
    assert rows["d3"]["dlf"] == 0.0 and rows["d3"]["dlcf"] == 0.0
    # d4: lines after trim+drop = [x, x] → dlf 1/2, chars 2→1 → 1/2
    assert rows["d4"]["dlf"] == 0.5 and rows["d4"]["dlcf"] == 0.5
    # d5: 18+1+18 = 37 chars, distinct 19 → 18/37 — the long footer
    # dominates the char-weighted form vs the count form's 1/3
    assert rows["d5"]["dlf"] == round(1 / 3, 6)
    assert rows["d5"]["dlcf"] == round(18 / 37, 6)


def test_span_dedup_paragraph_first_wins(spark):
    from cassandra_es_index_spark.operators import dedup
    df = spark.createDataFrame([
        (1, "one two three\nshared para\nunique a"),
        (2, "shared para\nunique b"),
        (3, "unique c\nshared para"),
    ], "id long, text string")
    out = {r["doc"]: r for r in
           dedup.span_dedup(df, "id", "text").collect()}
    # doc 1 owns the shared paragraph's first occurrence
    assert out[1]["text_clean"] == "one two three\nshared para\nunique a"
    assert out[1]["n_dropped"] == 0
    assert out[2]["text_clean"] == "unique b" and out[2]["n_dropped"] == 1
    assert out[3]["text_clean"] == "unique c" and out[3]["n_dropped"] == 1


def test_span_dedup_token_window_exact_copy_empties(spark):
    from cassandra_es_index_spark.operators import dedup
    text = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "zz yy xx")],
        "id long, text string")
    out = {r["doc"]: r for r in
           dedup.span_dedup(df, "id", "text", mode="token_window",
                            span_tokens=25).collect()}
    assert out[1]["n_dropped"] == 0 and out[1]["text_clean"] == text
    # doc 2 is an exact copy — every span already seen → cleaned empty
    assert out[2]["n_dropped"] == out[2]["n_spans"] == 3
    assert out[2]["text_clean"] == ""
    assert out[3]["text_clean"] == "zz yy xx"


def test_span_dedup_rejects_unknown_mode(spark):
    from cassandra_es_index_spark.operators import dedup
    import pytest as _pt
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with _pt.raises(ValueError):
        dedup.span_dedup(df, "id", "text", mode="sentence")


# ---------------------------------------------------------------------------
# token-budget chunking (round 6)
# ---------------------------------------------------------------------------


def test_chunk_by_token_budget_contiguous(spark):
    from cassandra_es_index_spark.operators.packing import (
        chunk_by_token_budget,
    )

    rows = [(i, 100) for i in range(1, 21)]  # 20 docs × 100 tokens
    df = spark.createDataFrame(rows, "id long, ntok long")
    out = chunk_by_token_budget(df, "id", "ntok", budget=512,
                                n_partitions=4).orderBy("id").collect()
    # start offsets 0,100,…,1900 → chunk = offset // 512: 5 docs in
    # chunk 0 (0..400), docs starting 500..900 → chunk 0? 500//512=0 —
    # budget 512 holds starts 0..511 → 6 docs (0..500), next 512..1023
    assert [r["chunk_id"] for r in out] == \
        [0]*6 + [1]*5 + [2]*5 + [3]*4
    assert [r["start_offset"] for r in out] == \
        [100 * i for i in range(20)]
    # deterministic across partition counts (the two-pass offsets make
    # the physical layout invisible)
    out2 = chunk_by_token_budget(df, "id", "ntok", budget=512,
                                 n_partitions=7).orderBy("id").collect()
    assert [tuple(r) for r in out2] == [tuple(r) for r in out]
    with pytest.raises(ValueError):
        chunk_by_token_budget(df, "id", "ntok", budget=0)


def test_hashed_ngram_importance_matches_reference(spark):
    """DSIR importance weights vs a brute-force python reference:
    identical buckets (md5-prefix hash), counts, add-1 smoothing, and
    log-ratio sum; English docs outscore the out-of-domain doc."""
    import hashlib
    import math
    from collections import Counter

    from cassandra_es_index_spark.operators import lm_score

    raw_rows = ["the cat sat", "der hund lief schnell", "the cat ran"]
    tgt_rows = ["the cat sat", "the cat purred"]
    raw = spark.createDataFrame(
        list(enumerate(raw_rows, 1)), "id long, text string")
    tgt = spark.createDataFrame(
        list(enumerate(tgt_rows, 10)), "id long, text string")
    out = {r["id"]: (r["n_grams"], r["importance"]) for r in
           lm_score.hashed_ngram_importance(
               raw, tgt, "id", "text", n_max=2, buckets=64).collect()}
    assert out[1][1] > out[2][1] and out[3][1] > out[2][1]
    assert out[1][0] == 5 and out[2][0] == 7     # uni + bi gram counts

    B, s = 64, 1.0

    def grams(t):
        ws = t.lower().split()
        return ws + [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    cr = Counter(bucket(g) for r in raw_rows for g in grams(r))
    ct = Counter(bucket(g) for r in tgt_rows for g in grams(r))
    nr, nt = sum(cr.values()), sum(ct.values())
    for i, text in enumerate(raw_rows, 1):
        ref = sum(
            math.log((ct.get(bucket(g), 0) + s) / (nt + s * B))
            - math.log((cr[bucket(g)] + s) / (nr + s * B))
            for g in grams(text))
        assert abs(out[i][1] - round(ref, 6)) < 2e-6, (i, out[i], ref)

    with pytest.raises(ValueError, match="n_max"):
        lm_score.hashed_ngram_importance(raw, tgt, "id", "text",
                                         n_max=0)
    with pytest.raises(ValueError, match="buckets"):
        lm_score.hashed_gram_buckets(raw, "id", "text", buckets=0)
    with pytest.raises(ValueError, match="smoothing"):
        lm_score.hashed_ngram_importance(raw, tgt, "id", "text",
                                         smoothing=0)


def test_pack_sequences_spans_exact(spark):
    from cassandra_es_index_spark.operators.packing import pack_sequences

    # a=3 tok, b=5, c=0 (empty), d=2; boundary=1; L=4.
    # stream positions (| = EOD marker): a0 a1 a2 | b0 b1 b2 b3 b4 |
    # | d0 d1 |  → offsets a:0 b:4 c:10 d:11, T=14
    df = spark.createDataFrame([("a", 3), ("b", 5), ("c", 0), ("d", 2)],
                               "id string, n long")
    out = [tuple(r) for r in pack_sequences(df, "id", "n", 4)
           .orderBy("seq_id", "seq_offset").collect()]
    assert out == [
        (0, "a", 0, 0, 3),        # a fills seq 0 up to its marker
        (1, "b", 0, 0, 4),        # b's first 4 tokens fill seq 1
        (2, "b", 0, 4, 1),        # b's tail continues into seq 2
        (2, "d", 3, 0, 1),        # d starts in seq 2 after b's marker
        (3, "d", 0, 1, 1),        # d's final token opens seq 3
    ]
    # empty doc c emits no span but advanced the stream by its marker
    # (d starts at 11, not 10)

    # drop_last: T=14 → 3 full sequences; seq 3's spans drop
    out2 = [tuple(r) for r in
            pack_sequences(df, "id", "n", 4, drop_last=True)
            .orderBy("seq_id", "seq_offset").collect()]
    assert out2 == out[:4]

    # no boundary markers: pure concat-and-cut
    out3 = [tuple(r) for r in
            pack_sequences(df, "id", "n", 4, boundary_tokens=0)
            .orderBy("seq_id", "seq_offset").collect()]
    assert out3 == [
        (0, "a", 0, 0, 3), (0, "b", 3, 0, 1),
        (1, "b", 0, 1, 4), (2, "d", 0, 0, 2),
    ]

    # partition-count invariance (the two-pass prefix sum makes the
    # physical layout invisible)
    out4 = [tuple(r) for r in
            pack_sequences(df, "id", "n", 4, n_partitions=7)
            .orderBy("seq_id", "seq_offset").collect()]
    assert out4 == out

    with pytest.raises(ValueError, match="seq_tokens"):
        pack_sequences(df, "id", "n", 0)
    with pytest.raises(ValueError, match="seq_tokens"):
        pack_sequences(df, "id", "n", 2.5)
    with pytest.raises(ValueError, match="boundary_tokens"):
        pack_sequences(df, "id", "n", 4, boundary_tokens=-1)


def test_pack_sequences_matches_python_twin(spark):
    """Operator output == the pure-python arithmetic twin on a mixed
    corpus (long docs, empties, exact fits) — the same twin the
    hypothesis property test stresses for tiling invariants."""
    from cassandra_es_index_spark.operators.packing import pack_sequences

    counts = [7, 0, 16, 1, 8, 0, 0, 23, 4, 5, 12, 3]
    L, boundary = 8, 1
    expect, off = [], 0
    for d, n in enumerate(counts):
        if n > 0:
            for s in range(off // L, (off + n - 1) // L + 1):
                lo, hi = max(off, s * L), min(off + n, s * L + L)
                expect.append((s, f"d{d:02d}", lo - s * L, lo - off,
                               hi - lo))
        off += n + boundary
    df = spark.createDataFrame(
        [(f"d{i:02d}", n) for i, n in enumerate(counts)],
        "id string, n long")
    got = sorted(tuple(r) for r in
                 pack_sequences(df, "id", "n", L,
                                boundary_tokens=boundary).collect())
    assert got == sorted(expect)


def test_pack_sequence_texts_materialize(spark):
    from cassandra_es_index_spark.operators.packing import (
        pack_sequence_texts,
    )

    rows = [("a", "x1 x2 x3"), ("b", "y1 y2 y3 y4 y5"),
            ("c", "   "), ("d", "z1 z2")]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["seq_id"]: (r["n_docs"], r["token_count"], r["seq_text"])
           for r in pack_sequence_texts(df, "id", "text", 4,
                                        boundary_token="<eod>")
           .collect()}
    # c is whitespace-only → dropped entirely; stream:
    # x1 x2 x3 <eod> y1 y2 y3 y4 y5 <eod> z1 z2 <eod>   (T = 13)
    assert got == {
        0: (1, 4, "x1 x2 x3 <eod>"),
        1: (1, 4, "y1 y2 y3 y4"),
        # y's marker lands mid-seq-2; z's marker falls exactly on the
        # cut and opens seq 3 alone (GPT-style stream semantics)
        2: (2, 4, "y5 <eod> z1 z2"),
        3: (0, 1, "<eod>"),
    }


def test_temperature_mix_flattens_head_source(spark):
    """n^alpha temperature sampling (the multilingual staple): alpha<1
    flattens the head source, alpha=1 is natural proportions, alpha=0
    targets uniform; small sources cap at fraction 1."""
    import math

    from cassandra_es_index_spark.operators.packing import (
        temperature_fractions, temperature_mix,
    )

    counts = {"a": 9000, "b": 900, "c": 100}
    fr = temperature_fractions(counts, 0.5)
    z = math.sqrt(9000) + math.sqrt(900) + math.sqrt(100)
    for k, n in counts.items():
        assert fr[k] == min(1.0, 10000 * (math.sqrt(n) / z) / n)
    assert fr["b"] == 1.0 and fr["c"] == 1.0 and fr["a"] < 0.8
    assert temperature_fractions(counts, 1.0) == {
        "a": 1.0, "b": 1.0, "c": 1.0}       # natural = keep everything
    fr0 = temperature_fractions(counts, 0.0)
    assert fr0["c"] == 1.0 and abs(fr0["a"] - 10000 / 3 / 9000) < 1e-12
    assert temperature_fractions({"a": 0, "b": 10}, 0.5)["a"] == 0.0
    with pytest.raises(ValueError, match="alpha"):
        temperature_fractions(counts, 1.5)
    with pytest.raises(ValueError, match="non-negative"):
        temperature_fractions({"a": -1}, 0.5)
    with pytest.raises(ValueError, match="at least one"):
        temperature_fractions({}, 0.5)
    with pytest.raises(ValueError, match="at least one"):
        temperature_mix([], "id", 0.5)

    df = spark.range(10_000)
    srcs = [("a", df.where("id < 9000")),
            ("b", df.where("id >= 9000 and id < 9900")),
            ("c", df.where("id >= 9900"))]
    got = {r["_source"]: r["n"] for r in
           temperature_mix(srcs, "id", alpha=0.5)
           .groupBy("_source").agg(F.count("*").alias("n")).collect()}
    # small sources keep everything; the head lands near its target
    assert got["b"] == 900 and got["c"] == 100
    target_a = fr["a"] * 9000
    assert abs(got["a"] - target_a) < 0.05 * target_a


def test_weighted_sample_and_mix_deterministic(spark):
    from cassandra_es_index_spark.operators.packing import (
        mix_sources, weighted_sample,
    )

    df = spark.createDataFrame([(i,) for i in range(10_000)], "id long")
    half = weighted_sample(df, "id", 0.5)
    n = half.count()
    assert 4_500 <= n <= 5_500           # ~fraction of the corpus
    # deterministic: same rows every run
    assert half.count() == n
    a = {r["id"] for r in half.collect()}
    b = {r["id"] for r in weighted_sample(df, "id", 0.5).collect()}
    assert a == b
    # nested fractions: the 0.3 sample is a SUBSET of the 0.5 sample
    # (bucket < 3000 ⊂ bucket < 5000) — stable curriculum subsets
    c = {r["id"] for r in weighted_sample(df, "id", 0.3).collect()}
    assert c <= a
    mixed = mix_sources(
        [("evens", df.where(F.col("id") % 2 == 0), 1.0),
         ("odds", df.where(F.col("id") % 2 == 1), 0.1)], "id")
    counts = {r["_source"]: r["n"] for r in
              mixed.groupBy("_source").agg(
                  F.count("*").alias("n")).collect()}
    assert counts["evens"] == 5_000 and 300 <= counts["odds"] <= 700
    with pytest.raises(ValueError):
        weighted_sample(df, "id", 1.5)
    with pytest.raises(ValueError):
        mix_sources([], "id")


# ------------------------------ PII redaction + decontamination (r11)

def test_redact_pii_kinds_and_order(spark):
    from cassandra_es_index_spark.functions.text import (
        pii_counts, redact_pii,
    )
    rows = [
        (1, "mail a.user+tag@sub.example.org now"),
        (2, "ssn 123-45-6789 and ip 10.0.255.1"),
        (3, "call +1 (555) 867-5309 ok"),
        (4, "no pii here at all"),
        (5, "two mails x@y.io and z@w.ai"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {r["id"]: r["red"] for r in df.select(
        "id", redact_pii(F.col("t")).alias("red")).collect()}
    assert got[1] == "mail <EMAIL> now"
    # SSN redacts BEFORE the phone pattern could swallow it; the IP
    # stays an IP (not a phone — digits are gone by the phone pass)
    assert got[2] == "ssn <SSN> and ip <IP>"
    assert got[3] == "call <PHONE> ok"
    assert got[4] == "no pii here at all"
    assert got[5] == "two mails <EMAIL> and <EMAIL>"
    counts = df.select(
        "id", *[c.alias(k) for k, c in pii_counts(F.col("t")).items()]
    ).collect()
    by_id = {r["id"]: (r["email"], r["ssn"], r["ipv4"], r["phone"])
             for r in counts}
    assert by_id[1] == (1, 0, 0, 0)
    assert by_id[2] == (0, 1, 1, 0)   # progressive: ip not a phone
    assert by_id[3] == (0, 0, 0, 1)
    assert by_id[5] == (2, 0, 0, 0)


def test_ngram_contamination_broadcast_and_parity(spark):
    from cassandra_es_index_spark.operators.dedup import (
        ngram_contamination,
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "quick brown fox jumps elsewhere entirely today"),
         (3, "completely different words in this row here"),
         (4, "tiny doc")],                      # < n tokens
        "id int, t string")
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps test sentence"),
         (101, "tiny doc")],
        "id int, t string")
    out = ngram_contamination(docs, bench, "id", "t", n=4,
                              hashed=False)
    got = {r["doc"]: r["contaminated_ngrams"] for r in out.collect()}
    # doc 1 and 2 share 'quick brown fox jumps' with the bench set;
    # doc 4 (< 4 tokens) matches via the whole-text gram convention
    assert got == {1: 1, 2: 1, 4: 1}
    # hashed tier: identical result, 8-byte join keys
    hashed = {r["doc"]: r["contaminated_ngrams"]
              for r in ngram_contamination(docs, bench, "id", "t",
                                           n=4).collect()}
    assert hashed == got
    # the benchmark side broadcasts — no corpus-side shuffle join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_unigram_cross_entropy_hand_case(spark):
    """CCNet-style LM scoring (operators/lm_score.py, r11): hand-check
    the add-k math on a 3-doc corpus. Corpus tokens: a×3 b×2 c×2 →
    N=7, V=3, denom=8.5; p(a)=3.5/8.5, p(b)=p(c)=2.5/8.5."""
    import math

    from cassandra_es_index_spark.operators import lm_score
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "c")], "id int, t string")
    out = {r["id"]: (r["n_tokens"], r["xent"])
           for r in lm_score.cross_entropy_score(
               docs, "id", "t").collect()}
    la, lb, lc = (math.log(3.5 / 8.5), math.log(2.5 / 8.5),
                  math.log(2.5 / 8.5))
    assert out[1] == (3, round(-(2 * la + lb) / 3, 4))
    assert out[2] == (3, round(-(la + lb + lc) / 3, 4))
    assert out[3] == (1, round(-lc, 4))
    # reference-model mode: score against ANOTHER corpus' model —
    # 'd' is unseen there and takes the ln(k/denom) mass
    ref = lm_score.unigram_model(
        spark.createDataFrame([(9, "a a b")], "id int, t string"), "t")
    scored = {r["id"]: r["xent"] for r in lm_score.cross_entropy_score(
        spark.createDataFrame([(4, "a d")], "id int, t string"),
        "id", "t", model=ref).collect()}
    # ref: N=3, V=2 → denom=4; p(a)=2.5/4, unseen=0.5/4
    want = round(-(math.log(2.5 / 4) + math.log(0.5 / 4)) / 2, 4)
    assert scored == {4: want}
    with pytest.raises(ValueError, match="k must be"):
        lm_score.cross_entropy_score(docs, "id", "t", k=0)
    # the scoring plan joins exploded tokens to the vocab — no UDF,
    # no crossJoin
    plan = lm_score.cross_entropy_score(docs, "id", "t") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan


def test_ngram_char_fractions_known_values(spark):
    # Gopher n-gram repetition signals (r12), hand-computed:
    # "a b a b a c" 2-grams = [a b, b a, a b, b a, a c] (len 3 each,
    # total mass 15): top = 2×3 = 6 → 0.4; dup = (2+2)×3 = 12 → 0.8
    from pyspark.sql import functions as F

    from cassandra_es_index_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "x y z"), (3, "w"),
         (4, "r r r r r"), (5, "one two three one two three")],
        "id int, t string")
    rows = {r["id"]: r for r in df.select(
        "id",
        tx.top_ngram_char_fraction(F.col("t"), 2).alias("top2"),
        tx.dup_ngram_char_fraction(F.col("t"), 2).alias("dup2"),
        tx.top_ngram_char_fraction(F.col("t"), 3).alias("top3"),
        tx.dup_ngram_char_fraction(F.col("t"), 5).alias("dup5"),
    ).collect()}
    assert rows[1]["top2"] == 0.4 and rows[1]["dup2"] == 0.8
    # "x y z": grams [x y, y z], all distinct → top 0.5, dup 0
    assert rows[2]["top2"] == 0.5 and rows[2]["dup2"] == 0.0
    # single token: no grams → 0 everywhere
    assert rows[3]["top2"] == 0.0 and rows[3]["dup5"] == 0.0
    # "r r r r r": one distinct 2-gram occurring 4× → 1.0 / 1.0
    assert rows[4]["top2"] == 1.0 and rows[4]["dup2"] == 1.0
    # 6 tokens: 3-grams = [one two three, two three one, three one two,
    # one two three] — "one two three" (13 ch) twice of 4 grams
    # (mass 13+13+13+13=52): top = 26/52 = 0.5, and exactly one
    # 5-gram pair distinct → dup5 = 0
    assert rows[5]["top3"] == 0.5
    assert rows[5]["dup5"] == 0.0


def test_split_assign_deterministic_and_stable(spark):
    # keyed train/valid/test split (r12): reproducible across runs and
    # partitionings; growing the corpus never moves an existing row
    from cassandra_es_index_spark.operators import split as sp

    df = spark.createDataFrame([(i,) for i in range(1000)], "id bigint")
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    a = {r["id"]: r["split"]
         for r in sp.split_assign(df, "id", fr, seed=7).collect()}
    b = {r["id"]: r["split"]
         for r in sp.split_assign(df.repartition(13), "id", fr,
                                  seed=7).collect()}
    assert a == b            # partitioning-independent (randomSplit isn't)
    # hand-replay the hash for a few keys
    for k in (0, 1, 999):
        u = (((k + 7) * 2654435761) % 2**32) / 2**32
        want = "train" if u < 0.8 else ("valid" if u < 0.9 else "test")
        assert a[k] == want
    # fractions are respected within a few percent at n=1000
    from collections import Counter
    c = Counter(a.values())
    assert abs(c["train"] / 1000 - 0.8) < 0.05
    # stability: a 2× corpus assigns the original keys identically
    df2 = spark.createDataFrame([(i,) for i in range(2000)], "id bigint")
    a2 = {r["id"]: r["split"]
          for r in sp.split_assign(df2, "id", fr, seed=7).collect()}
    assert all(a2[k] == v for k, v in a.items())
    # different seed reshuffles
    a9 = {r["id"]: r["split"]
          for r in sp.split_assign(df, "id", fr, seed=9).collect()}
    assert a9 != a
    import pytest as _pt
    with _pt.raises(ValueError, match="sum to 1"):
        sp.split_assign(df, "id", {"a": 0.5, "b": 0.2})
    with _pt.raises(ValueError, match="non-empty"):
        sp.split_assign(df, "id", {})


def test_quantized_topk_recall_and_determinism(spark):
    # int8 SQ8 two-stage retrieval (r12): the quantized prefilter at a
    # generous width recovers the exact top-k, and quantization is
    # deterministic floor arithmetic
    import numpy as np
    from pyspark.sql import functions as F

    from cassandra_es_index_spark.operators import similarity as sim

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(16).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    probe = rows[7][1]
    exact = sim.cosine_topk(df, "vec_id", "embedding", probe, k=5)
    two_stage = sim.quantized_topk(df, "vec_id", "embedding", probe,
                                   k=5, prefilter_k=60)
    assert [r["vec_id"] for r in two_stage.collect()] == \
        [r["vec_id"] for r in exact.collect()]
    # quantization bounds and reconstruction error
    q = sim.quantize_embeddings(df, "vec_id", "embedding").collect()
    for r in q[:20]:
        assert all(-127 <= x <= 127 for x in r["qvec"])
    row0 = next(r for r in q if r["vec_id"] == 0)
    recon = [x * row0["scale"] for x in row0["qvec"]]
    orig = rows[0][1]
    assert max(abs(a - b) for a, b in zip(recon, orig)) \
        <= row0["scale"] / 2 + 1e-12
    # zero vector → zeros with scale 0
    z = spark.createDataFrame([(1, [0.0, 0.0])],
                              "vec_id bigint, embedding array<double>")
    zr = sim.quantize_embeddings(z, "vec_id", "embedding").collect()[0]
    assert zr["qvec"] == [0, 0] and zr["scale"] == 0.0


def test_lit_vec_bit_equals_per_element_lit(spark):
    # the r15 server-side vector literal must parse to bit-identical
    # doubles vs the per-element F.lit chain it replaced — exercised
    # on sign/zero/extreme/subnormal/random bit patterns
    import random
    import struct

    from pyspark.sql import functions as F

    from cassandra_es_index_spark.operators.similarity import _lit_vec

    random.seed(7)
    vals = [0.0, -0.0, 1.0, -1.5, 1e-300, -1e300, 3.141592653589793,
            2 ** -1074, float("nan"), float("inf"), float("-inf")] + \
           [struct.unpack("<d", struct.pack("<q",
                                            random.getrandbits(63)))[0]
            for _ in range(50)]
    row = spark.range(1).select(
        _lit_vec(vals).alias("a"),
        F.array(*[F.lit(float(v)) for v in vals]).alias("b")).first()
    bits = [(struct.pack("<d", x), struct.pack("<d", y))
            for x, y in zip(row["a"], row["b"])]
    assert all(x == y for x, y in bits)


def test_xxh64_numpy_matches_spark_expression(spark):
    # the r15 Arrow-vectorized n-gram chain reimplements Spark's
    # xxhash64-over-two-longs in numpy — pin bit-equality against the
    # JVM expression on a value grid that exercises sign bits,
    # extremes, and chained hashes
    import numpy as np
    from pyspark.sql import functions as F

    from cassandra_es_index_spark.functions.text import _xxh64_pair_np

    vals = [0, 1, -1, 42, -42, 2**63 - 1, -(2**63), 123456789,
            -987654321, 0x9E3779B185EBCA87 - 2**64]
    pairs = [(a, b) for a in vals for b in vals]
    df = spark.createDataFrame(pairs, "a long, b long")
    jvm = [r["h"] for r in
           df.select(F.xxhash64("a", "b").alias("h")).collect()]
    a = np.array([p[0] for p in pairs], dtype=np.int64).view(np.uint64)
    b = np.array([p[1] for p in pairs], dtype=np.int64).view(np.uint64)
    ours = _xxh64_pair_np(a, b).view(np.int64).tolist()
    assert ours == jvm
    # chained level-3 hash: xxhash64(xxhash64(a, b), c) — the chain
    # shape the gram levels use
    df3 = df.select(F.xxhash64(F.xxhash64("a", "b"),
                               F.lit(7).cast("long")).alias("h"))
    jvm3 = [r["h"] for r in df3.collect()]
    ours3 = _xxh64_pair_np(
        _xxh64_pair_np(a, b),
        np.full(len(pairs), 7, np.int64).view(np.uint64)) \
        .view(np.int64).tolist()
    assert ours3 == jvm3


def test_ngram_repetition_stats_null_and_tiny_docs(spark):
    # the Arrow chain must reproduce the Column-pipeline edge
    # semantics: null text → zeros, empty text (one "" token) → zeros
    # for n >= 2, single-token docs → zeros, and 1 ∈ ns emits unigrams
    from cassandra_es_index_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None), (4, "a a a b"), (5, "x y")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in tx.ngram_repetition_stats(
        df, "doc_id", "text", ns=(2, 3)).collect()}
    assert len(rows) == 5
    for d in (1, 2, 3):
        assert rows[d]["top2_frac"] == 0.0 and rows[d]["dup2_frac"] == 0.0
    # doc 4: 2-grams "a a" x2, "a b" x1 over lengths 3+3+3 -> top 2/3
    assert rows[4]["top2_frac"] == round(6 / 9, 6)
    assert rows[4]["dup2_frac"] == round(6 / 9, 6)
    assert rows[5]["top2_frac"] == round(3 / 3, 6)
    assert rows[5]["dup2_frac"] == 0.0
    # 1 ∈ ns on docs with non-empty tokens (an empty-string token has
    # zero char mass and level-1 tot = 0, a pre-existing ANSI
    # divide-by-zero in the Column pipeline — unchanged by the Arrow
    # chain, so not exercised here)
    df1 = df.where("doc_id <> 2")
    uni = {r["doc_id"]: r for r in tx.ngram_repetition_stats(
        df1, "doc_id", "text", ns=(1, 2)).collect()}
    # doc 4 unigrams: "a" x3 (mass 3), "b" x1 (mass 1) -> top 3/4
    assert uni[4]["top1_frac"] == 0.75 and uni[4]["dup1_frac"] == 0.75


def test_ngram_repetition_stats_matches_column_form(spark):
    # the explode/hash-agg pipeline and the row-local Column functions
    # compute the same statistics (the pipeline is the corpus-scale
    # path — see ngram_repetition_stats docstring)
    from pyspark.sql import functions as F

    from cassandra_es_index_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "x y z"), (3, "w"),
         (4, "r r r r r"), (5, "one two three one two three")],
        "doc_id int, text string")
    pipe = {r["doc_id"]: r for r in tx.ngram_repetition_stats(
        df, "doc_id", "text", ns=(2, 3)).collect()}
    toks = tx.tokens(F.col("text"))
    cols = {r["doc_id"]: r for r in df.select(
        "doc_id",
        tx.top_ngram_char_fraction(n=2, toks=toks).alias("t2"),
        tx.dup_ngram_char_fraction(n=2, toks=toks).alias("d2"),
        tx.top_ngram_char_fraction(n=3, toks=toks).alias("t3"),
    ).collect()}
    for k in pipe:
        assert pipe[k]["top2_frac"] == cols[k]["t2"], k
        assert pipe[k]["dup2_frac"] == cols[k]["d2"], k
        assert pipe[k]["top3_frac"] == cols[k]["t3"], k


def test_nfc_normalize_unicode_and_controls(spark):
    import unicodedata

    from pyspark.sql import functions as F

    from cassandra_es_index_spark.functions import text as tx

    rows = [(1, "café"),          # NFD e + combining acute
            (2, "ça"),            # combining cedilla
            (3, "plain ascii"),
            (4, "tab\tand\nnewline kept, bell\x07gone"),
            (5, None)]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {r["id"]: r["c"] for r in df.select(
        "id", tx.nfc_normalize(F.col("t")).alias("c")).collect()}
    assert got[1] == "café"
    assert got[2] == unicodedata.normalize("NFC", "ça")
    assert got[3] == "plain ascii"
    assert got[4] == "tab\tand\nnewline kept, bellgone"
    assert got[5] is None


# -- URL extraction / domain blocklist (r12) ------------------------------


def test_url_extract_domains_and_blocklist(spark):
    from cassandra_es_index_spark.functions import web
    df = spark.createDataFrame([
        (1, 'see http://a.b.Spam.Example.com/path?q=1 and '
            'https://ok.org/x.'),
        (2, 'no urls here'),
        (3, 'multi http://ok.org http://also.ok.org, '
            '(https://spam.example.com).'),
        (4, 'bare host example.com not a url; ftp://x.y ignored'),
        (5, 'https://single-label'),
    ], "id bigint, text string")
    rows = {r["id"]: (r["n"], r["d"]) for r in df.select(
        "id", web.url_count(F.col("text")).alias("n"),
        web.doc_domains(F.col("text")).alias("d")).collect()}
    # trailing sentence punctuation stripped; hosts lowercased; the
    # registered domain is the last two labels; bare hosts and other
    # schemes are not URLs; single-label hosts pass through
    assert rows == {1: (2, ["example.com", "ok.org"]),
                    2: (0, []),
                    3: (3, ["ok.org", "example.com"]),
                    4: (0, []),
                    5: (1, ["single-label"])}
    bl = spark.createDataFrame([("Example.com",)], "domain string")
    out = {r["id"]: r["blocklisted"] for r in web.flag_blocklisted(
        df, ["id"], "text", bl, "domain").collect()}
    assert out == {1: True, 2: False, 3: True, 4: False, 5: False}


def test_c4_clean_line_rules_and_page_tells(spark):
    """The public C4 cleaning rules (Raffel et al. 2020 §2.2):
    terminal-punctuation + >=5-word + no-javascript line filter;
    page floor on kept lines; lorem-ipsum and '{' page tells."""
    from cassandra_es_index_spark.functions import text as tx

    docs = [
        (1, "This is a proper sentence with words.\nshort line\n"
            "Another full sentence follows right here!\n"
            "And a third one to clear the page floor.\n"
            "Please enable Javascript to view this page."),
        (2, "lorem ipsum dolor sit amet consectetur adipiscing.\n"
            "A second proper sentence sits right here.\n"
            "A third proper sentence sits right here too."),
        (3, "function f() { return 1; }\n"
            "Real sentence one is right here okay.\n"
            "Real sentence two is right here okay.\n"
            "Real sentence three is here okay now."),
        (4, "no terminal punctuation here at all\nanother such line"),
        (5, 'He said "stop right there, you fool."\n'
            "She answered with a word?\n"
            "Final sentence number three lands right here."),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    out = {r["id"]: (r["n_lines"], r["n_kept"], r["keep_doc"])
           for r in tx.c4_clean(df, "id", "text").collect()}
    assert out[1] == (5, 3, True)      # short + javascript lines drop
    assert out[2] == (3, 3, False)     # lorem ipsum page tell
    assert out[3] == (4, 3, False)     # '{' page tell
    assert out[4] == (2, 0, False)     # nothing sentence-like
    assert out[5] == (3, 3, True)      # quote/question terminals count
    clean = {r["id"]: r["clean_text"]
             for r in tx.c4_clean(df, "id", "text").collect()}
    assert clean[1].count("\n") == 2 and "Javascript" not in clean[1]
    with pytest.raises(ValueError, match="min_words"):
        tx.c4_clean(df, "id", "text", min_words=0)
    with pytest.raises(ValueError, match="min_kept_lines"):
        tx.c4_clean(df, "id", "text", min_kept_lines=-1)


def test_canonical_url_normalization(spark):
    """Crawl-dedup URL canonicalization (r14): scheme/host lowercase,
    default ports dropped, fragments dropped, tracking params stripped
    and survivors sorted, trailing slashes stripped, path case and
    non-default ports preserved; non-http(s) → null."""
    from cassandra_es_index_spark.functions import web

    cases = [
        ("HTTP://WWW.Example.COM:80/path/?utm_source=x&b=2&a=1"
         "&fbclid=z#frag", "http://www.example.com/path?a=1&b=2"),
        ("HTTPS://Site.ORG:8443/Dir/Sub/?ref=tw",
         "https://site.org:8443/Dir/Sub"),
        ("https://a.b.com:443/", "https://a.b.com"),
        ("http://x.io", "http://x.io"),
        ("http://x.io/?utm_campaign=q", "http://x.io"),
        # survivors sort, duplicates kept (k=v pairs are opaque)
        ("http://x.io/p?z=1&y=2&y=1", "http://x.io/p?y=1&y=2&z=1"),
        ("ftp://x.io/p", None),
        ("not a url", None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, u string")
    got = {r["i"]: r["c"] for r in df.select(
        "i", web.canonical_url(F.col("u")).alias("c")).collect()}
    assert got == {i: want for i, (_, want) in enumerate(cases)}
    # extraction finds mixed-case schemes (r14) — blocklisting a page
    # that hides behind HTTP:// must not silently pass
    n, = df.where("i = 0").select(
        web.url_count(F.concat(F.lit("see "), F.col("u")))
        .alias("n")).collect()
    assert n["n"] == 1


# -- near-dup clustering: connected components (r13) -----------------------


def test_connected_components_hand_graph(spark):
    # {1-2, 2-3} -> 1; {5-6} -> 5; chain 10-11-12-13 -> 10
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6), (11, 10), (11, 12), (12, 13)],
        "doc_a bigint, doc_b bigint")
    got = {r["node"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5,
                   10: 10, 11: 10, 12: 10, 13: 10}


def test_connected_components_max_iters_typed(spark):
    pairs = spark.createDataFrame(
        [(11, 10), (11, 12), (12, 13)], "doc_a bigint, doc_b bigint")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="did not converge"):
        dedup.connected_components(pairs, max_iters=1)
    with _pytest.raises(ValueError, match="max_iters"):
        dedup.connected_components(pairs, max_iters=0)


def test_dedup_clusters_keep_flags_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 5, 6, 99)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6)], "doc_a bigint, doc_b bigint")
    rows = {r["doc_id"]: (r["cluster"], r["keep"])
            for r in dedup.dedup_clusters(docs, "doc_id",
                                          pairs).collect()}
    assert rows == {1: (1, True), 2: (1, False), 3: (1, False),
                    5: (5, True), 6: (5, False), 99: (99, True)}


def test_dedup_clusters_from_jaccard(corpus):
    # near-identical docs 1/2 cluster together; the distinct doc keeps
    pairs = dedup.jaccard_pairs(corpus, "doc_id", "text", threshold=0.7)
    out = dedup.dedup_clusters(corpus, "doc_id", pairs)
    by = {r["doc_id"]: (r["cluster"], r["keep"]) for r in out.collect()}
    clustered = [d for d, (c, _) in by.items() if c != d or not by[d][1]]
    # every non-keeper's cluster representative IS a keeper
    for d, (c, keep) in by.items():
        if not keep:
            assert by[c] == (c, True)


def test_dedup_clusters_quality_keeper(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (5, None), (6, 0.1), (9, 0.5)],
        "doc_id bigint, q double")
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6)], "doc_a bigint, doc_b bigint")
    rows = {r["doc_id"]: (r["cluster"], r["keep"])
            for r in dedup.dedup_clusters(docs, "doc_id", pairs,
                                          quality_col="q").collect()}
    # cluster 1: max quality 0.9 tied by docs 2/3 -> id desc keeps 3;
    # cluster 5: null quality sorts below 0.1 -> 6 keeps;
    # singleton 9 keeps itself
    assert rows == {1: (1, False), 2: (1, False), 3: (1, True),
                    5: (5, False), 6: (5, True), 9: (9, True)}


def test_connected_components_empty_pairs(spark):
    # r15: convergence is announced by the frontier emptying (the
    # per-round label-fixpoint probe was removed as redundant) — the
    # degenerate empty-graph input must still terminate cleanly
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert dedup.connected_components(pairs).collect() == []
    docs = spark.createDataFrame([(7,), (8,)], "doc_id bigint")
    rows = {r["doc_id"]: (r["cluster"], r["keep"])
            for r in dedup.dedup_clusters(docs, "doc_id",
                                          pairs).collect()}
    assert rows == {7: (7, True), 8: (8, True)}


# -- document chunking (r13) ------------------------------------------------


def test_chunk_documents_windows_and_overlap(spark):
    from cassandra_es_index_spark.operators import chunking
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"),    # 7 toks: chunks [a..d], [c..f], [e..g]
         (2, "x y"),              # single short chunk
         (3, ""), (4, None),      # no chunks
         (5, "  p   Q! r  ")],    # whitespace runs collapse, case kept
        "id bigint, text string")
    out = chunking.chunk_documents(docs, "id", "text",
                                   chunk_tokens=4, overlap=2)
    rows = {(r["id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
            for r in out.collect()}
    assert rows == {
        (1, 0): (4, "a b c d"), (1, 1): (4, "c d e f"),
        (1, 2): (3, "e f g"),
        (2, 0): (2, "x y"),
        (5, 0): (3, "p Q! r")}


def test_chunk_documents_no_overlap_and_exact_fit(spark):
    from cassandra_es_index_spark.operators import chunking
    docs = spark.createDataFrame([(1, "a b c d")], "id bigint, text string")
    out = chunking.chunk_documents(docs, "id", "text",
                                   chunk_tokens=2, overlap=0)
    rows = sorted((r["chunk_id"], r["chunk_text"])
                  for r in out.collect())
    assert rows == [(0, "a b"), (1, "c d")]


def test_chunk_documents_typed_errors(spark):
    from cassandra_es_index_spark.operators import chunking
    import pytest as _pytest
    docs = spark.createDataFrame([(1, "a")], "id bigint, text string")
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunking.chunk_documents(docs, "id", "text", chunk_tokens=0)
    with _pytest.raises(ValueError, match="overlap"):
        chunking.chunk_documents(docs, "id", "text",
                                 chunk_tokens=4, overlap=4)


def test_shuffle_key_deterministic_and_seeded(spark):
    from cassandra_es_index_spark.operators import split as sp
    docs = spark.createDataFrame([(i,) for i in range(100)],
                                 "doc_id bigint")
    a = {r["doc_id"]: r["shuffle_key"]
         for r in sp.shuffle_key(docs, "doc_id", seed=7).collect()}
    b = {r["doc_id"]: r["shuffle_key"]
         for r in sp.shuffle_key(docs.repartition(7), "doc_id",
                                 seed=7).collect()}
    assert a == b                      # partitioning-independent
    c = {r["doc_id"]: r["shuffle_key"]
         for r in sp.shuffle_key(docs, "doc_id", seed=8).collect()}
    assert a != c                      # epochs differ by seed
    assert all(0.0 <= v < 1.0 for v in a.values())
    # hand value: ((3 + 7) * 2654435761) % 2^32 / 2^32
    exp = ((3 + 7) * 2654435761 % 4294967296) / 4294967296
    assert abs(a[3] - exp) < 1e-15


def test_top_tfidf_terms_hand_case(spark):
    from cassandra_es_index_spark.operators import keywords
    import math
    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog fish"), (3, "fish fish fish")],
        "id bigint, text string")
    out = keywords.top_tfidf_terms(docs, "id", "text", k=2)
    rows = {(r["id"], r["rank"]): (r["term"], r["tf"], r["score"])
            for r in out.collect()}
    idf1 = math.log(4 / 2) + 1   # df 1 -> ln((3+1)/(1+1))+1
    idf2 = math.log(4 / 3) + 1   # df 2
    assert rows[(1, 1)][0] == "cat"
    assert abs(rows[(1, 1)][2] - round(2 * idf1, 6)) < 1e-9
    assert rows[(1, 2)][0] == "dog"
    assert abs(rows[(1, 2)][2] - round(1 * idf2, 6)) < 1e-9
    # doc 2: dog/fish tie on score (tf 1, df 2 each) -> term asc
    assert rows[(2, 1)][0] == "dog" and rows[(2, 2)][0] == "fish"
    assert rows[(3, 1)] == ("fish", 3, round(3 * idf2, 6))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive integer"):
        keywords.top_tfidf_terms(docs, "id", "text", k=0)


def test_lsh_band_layout_validated(corpus):
    """bands > num_hashes would make every band key the empty string —
    the whole corpus collides into ONE bucket and (on the star path,
    which has no downstream Jaccard verification) silently merges into
    a single cluster. Non-divisible splits silently ignore the
    remainder hashes. Both are typed errors on BOTH banding surfaces
    (r13 ADVICE)."""
    import pytest as _pytest

    for fn in (dedup.minhash_lsh_star_edges, dedup.minhash_lsh_pairs):
        with _pytest.raises(ValueError, match="1 <= bands"):
            fn(corpus, "doc_id", "text", num_hashes=8, bands=16)
        with _pytest.raises(ValueError, match="1 <= bands"):
            fn(corpus, "doc_id", "text", num_hashes=8, bands=0)
        with _pytest.raises(ValueError, match="divisible"):
            fn(corpus, "doc_id", "text", num_hashes=32, bands=5)


def test_lsh_star_edges_connectivity_matches_pairs(corpus):
    # the star graph spans exactly the same band buckets as the pair
    # clique, so connected components agree with the pair-based ones
    edges = dedup.minhash_lsh_star_edges(corpus, "doc_id", "text",
                                         num_hashes=32, bands=16)
    cc_star = {r["node"]: r["component"]
               for r in dedup.connected_components(edges).collect()}
    # hub is always the bucket minimum -> components are min-ids
    assert all(c <= n for n, c in cc_star.items())
    # near-identical docs 1/2 share a bucket in this fixture
    assert cc_star.get(2) == 1 or cc_star.get(1) == cc_star.get(2)


def test_connected_components_random_graphs_match_union_find(spark):
    # seeded random graphs vs a reference union-find — exercises
    # chains, cliques, singleton-free frontiers, and the contraction
    import random

    def union_find(n_edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in n_edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in list(parent)}

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 50, 60),
                                   (3, 80, 40), (4, 25, 200)]:
        rng = random.Random(seed)
        es = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
              for _ in range(n_edges)]
        es = [(a, b) for a, b in es if a != b]
        if not es:
            continue
        expect = union_find(es)
        pairs = spark.createDataFrame(es, "doc_a bigint, doc_b bigint")
        got = {r["node"]: r["component"]
               for r in dedup.connected_components(pairs).collect()}
        assert got == expect, f"seed {seed}"


def test_chunk_documents_reference_model(spark):
    # random token counts vs the closed-form chunk model
    import math
    import random
    from cassandra_es_index_spark.operators import chunking
    rng = random.Random(7)
    rows = [(i, " ".join(f"t{j}" for j in range(rng.randrange(0, 40))))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    for ct, ov in [(8, 0), (8, 3), (5, 4), (1, 0)]:
        out = chunking.chunk_documents(docs, "id", "text",
                                       chunk_tokens=ct, overlap=ov)
        got = {}
        for r in out.collect():
            got.setdefault(r["id"], []).append(
                (r["chunk_id"], r["n_tokens"], r["chunk_text"]))
        step = ct - ov
        for i, text in rows:
            toks = text.split()
            n = len(toks)
            if n == 0:
                assert i not in got
                continue
            n_chunks = max(1, math.ceil((n - ov) / step))
            chunks = sorted(got[i])
            assert len(chunks) == n_chunks, (i, ct, ov)
            for k, ntk, ctext in chunks:
                ref = toks[k * step:k * step + ct]
                assert ctext == " ".join(ref)
                assert ntk == len(ref)
            # every token appears in some chunk
            covered = set()
            for k, _, _ in chunks:
                covered.update(range(k * step,
                                     min(k * step + ct, n)))
            assert covered == set(range(n))


# -- semantic dedup (SemDeDup) tier (r14) -----------------------------------

def test_semantic_dedup_hand_case(spark):
    # two seed cells (n_cells=2 → seeds are vec 0 and 1); the vec-5
    # distance TIES between the cells (2.0 vs 2.0) — the rounded argmin
    # must break to the LOWEST cell, and 5 stays a singleton keeper
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0, 0.0]),
            (3, [0.98, 0.02, 0.0, 0.0]),
            (4, [0.0, 0.9, 0.1, 0.0]),
            (5, [0.0, 0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cells = {r["corpus_id"]: (r["cell"], r["centroid_dist"])
             for r in similarity.semantic_cells(
                 df, "vec_id", "embedding", n_cells=2).collect()}
    assert {k: c for k, (c, _) in cells.items()} == {
        0: 0, 1: 1, 2: 0, 3: 0, 4: 1, 5: 0}
    assert cells[5][1] == 2.0          # tie distance, lowest cell won
    assert cells[3][1] == 0.0008

    pairs = {(r["doc_a"], r["doc_b"]): r["cos_sim"]
             for r in similarity.semantic_pairs(
                 df, "vec_id", "embedding", n_cells=2,
                 threshold=0.95).collect()}
    assert set(pairs) == {(0, 2), (0, 3), (2, 3), (1, 4)}
    assert pairs[(1, 4)] == pytest.approx(0.993884)

    out = {r["vec_id"]: (r["cell"], r["cluster"], r["keep"])
           for r in similarity.semantic_dedup(
               df, "vec_id", "embedding", n_cells=2,
               threshold=0.95).collect()}
    # keeper = FARTHEST from centroid per duplicate group (3 beats 0/2,
    # 4 beats its own seed 1); singletons keep themselves
    assert out == {0: (0, 0, False), 2: (0, 0, False), 3: (0, 0, True),
                   1: (1, 1, False), 4: (1, 1, True), 5: (0, 5, True)}


def test_semantic_cells_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    got = {r["corpus_id"]: (r["cell"], r["centroid_dist"])
           for r in similarity.semantic_cells(
               df, "vec_id", "embedding", n_cells=4).collect()}
    seeds = vecs[:4].astype("float64")
    v64 = vecs.astype("float64")
    for i in range(40):
        d = np.round(((v64[i] - seeds) ** 2).sum(axis=1), 6)
        cell = int(np.argmin(d))          # numpy argmin = first min
        assert got[i][0] == cell, i
        assert got[i][1] == pytest.approx(d[cell], abs=1e-9)


def test_semantic_dedup_kmeans_iterated_one_keeper_per_cluster(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((6, 8))
    rows = []
    # 6 tight groups of 3 near-identical members → 18 vectors
    for g in range(6):
        for j in range(3):
            rows.append((g * 3 + j,
                         [float(x) for x in base[g] + 1e-3 * j]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup(df, "vec_id", "embedding",
                                    n_cells=4, n_iters=2, threshold=0.99)
    rows_out = out.collect()
    assert len(rows_out) == 18
    by_cluster = {}
    for r in rows_out:
        by_cluster.setdefault(r["cluster"], []).append(
            (r["vec_id"], r["keep"]))
    for cl, members in by_cluster.items():
        assert sum(k for _, k in members) == 1, (cl, members)
        # clusters never span the tight groups (pairs only form at
        # cosine ≥ 0.99, and distinct random base vectors are far)
        assert len({i // 3 for i, _ in members}) == 1, (cl, members)
    # most groups merge — a group may split across a k-means cell
    # boundary (the paper's documented boundary miss), but the corpus
    # must still compress well below one-cluster-per-doc
    assert len(by_cluster) <= 9


# -- BPE vocabulary induction (r14) -----------------------------------------

def _py_bpe_learn(texts, n):
    """Pure-Python Sennrich twin with the engine's deterministic tie
    break (freq desc, left asc, right asc)."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            wc[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for _ in range(n):
        pc = Counter()
        for syms, f in wc.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = sorted(pc.items(),
                      key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0][0]
        merges.append(best)
        left, right = best
        new = Counter()
        for syms, f in wc.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new[tuple(out)] += f
        wc = new
    return merges, wc


def test_bpe_learn_matches_python_twin(spark):
    rows = [(1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "wider wide wide new low")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want, _ = _py_bpe_learn([r[1] for r in rows], 8)
    got = bpe.bpe_learn(df, "text", 8)
    assert got == want
    # greedy overlap semantics: "a a a" under (a,a) → ["aa", "a"]
    aaa = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    m = bpe.bpe_learn(aaa, "text", 1)
    assert m == [("a", "a")]
    seg = bpe.bpe_segment(aaa, "doc_id", "text", m).first()
    assert seg["bpe_tokens"] == ["aa", "a", "</w>", "aa", "a", "</w>"]


def test_bpe_segment_roundtrip_and_order(spark):
    rows = [(1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "wider wide wide new low")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_learn(df, "text", 8)
    seg = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe.bpe_segment(df, "doc_id", "text", merges).collect()}
    for i, text in rows:
        # subwords of each doc concatenate back to its words (+ markers)
        joined = "".join(seg[i]).replace("</w>", " ").strip()
        assert joined == " ".join(text.lower().split())
        # word order is preserved through the posexplode/array_sort path
    # with zero merges, segmentation is the raw character stream
    seg0 = bpe.bpe_segment(df.limit(1), "doc_id", "text", []).first()
    assert seg0["bpe_tokens"][:4] == ["l", "o", "w", "</w>"]


def test_bpe_pair_counts_and_validation(spark):
    df = spark.createDataFrame([(1, "ab ab b")], "doc_id long, text string")
    got = {(r["left"], r["right"]): r["freq"]
           for r in bpe.bpe_pair_counts(df, "text").collect()}
    assert got == {("a", "b"): 2, ("b", "</w>"): 3}
    with pytest.raises(ValueError, match="num_merges"):
        bpe.bpe_learn(df, "text", 0)


# -- exact-substring removal (r14) ------------------------------------------

def test_remove_duplicate_spans_matches_twin(spark):
    rows = [
        (1, "a b c d e f g h"),          # shares "a b c d" with doc 2
        (2, "x y a b c d z w"),
        (3, "p q r s t u v"),            # unique — untouched
        (4, "m m m m n o"),              # no window occurs twice
        (5, "short"),
        (6, "a b c d e f g h"),          # exact dup of 1 → both empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
           for r in dedup.remove_duplicate_spans(
               df, "doc_id", "text", span_tokens=4).collect()}

    from collections import Counter
    toks = {i: t.strip().split() for i, t in rows}
    cnt = Counter(" ".join(ts[p:p + 4])
                  for ts in toks.values()
                  for p in range(len(ts) - 3))
    want = {}
    for i, ts in toks.items():
        cov = set()
        for p in range(len(ts) - 3):
            if cnt[" ".join(ts[p:p + 4])] >= 2:
                cov.update(range(p, p + 4))
        want[i] = (" ".join(t for j, t in enumerate(ts)
                            if j not in cov), len(ts), len(cov))
    assert got == want
    # every copy of a duplicated region is cut — position-exact: the
    # exact-dup docs 1/6 empty each other entirely, and doc 2 loses
    # only its shared "a b c d" region
    assert got[1] == ("", 8, 8) and got[6] == ("", 8, 8)
    assert got[2][0] == "x y z w"
    assert got[3][2] == 0 and got[4][2] == 0


def test_remove_duplicate_spans_within_doc_repeat(spark):
    # a tandem repeat INSIDE one document counts as ≥2 occurrences
    df = spark.createDataFrame(
        [(1, "u v w x u v w x tail1 tail2")],
        "doc_id long, text string")
    r = dedup.remove_duplicate_spans(df, "doc_id", "text",
                                     span_tokens=4).first()
    assert r["n_removed"] == 8
    assert r["text_clean"] == "tail1 tail2"
    with pytest.raises(ValueError, match="span_tokens"):
        dedup.remove_duplicate_spans(df, "doc_id", "text",
                                     span_tokens=1)


# -- quality classifier + CCNet buckets (r14) -------------------------------

def test_linear_quality_score_hand_case(spark):
    import math

    from cassandra_es_index_spark.operators import classify

    df = spark.createDataFrame(
        [(1, "good good bad"), (2, "bad bad unk"), (3, "unk unk")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in classify.linear_quality_score(
        df, "doc_id", "text", {"good": 1.0, "bad": -1.0},
        bias=0.0, threshold=0.5).collect()}

    def sig(mw):
        return round(1.0 / (1.0 + math.exp(-round(mw, 6))), 6)
    assert out[1]["score"] == pytest.approx(sig(1 / 3))
    assert out[1]["keep"] is True
    assert out[2]["score"] == pytest.approx(sig(-2 / 3))
    assert out[2]["keep"] is False
    # all-OOV doc scores the bias alone (0 → 0.5 → keep at >=)
    assert out[3]["score"] == pytest.approx(0.5)
    assert out[3]["keep"] is True
    with pytest.raises(ValueError, match="non-empty"):
        classify.weight_table(spark, {})


def test_ccnet_buckets_per_language_tranches(spark):
    from cassandra_es_index_spark.operators import lm_score

    # language A: 6 docs from very reference-like to noisy; B: 3 docs
    rows = [(1, "a", "x x x x"), (2, "a", "x x x y"),
            (3, "a", "x x y y"), (4, "a", "x y y z"),
            (5, "a", "y z z w"), (6, "a", "w w q q"),
            (7, "b", "x x x x"), (8, "b", "x y z w"),
            (9, "b", "q q q q")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in lm_score.ccnet_buckets(
        df, "doc_id", "text", lang_col="lang", n_buckets=3).collect()}
    assert len(out) == 9
    # per language: equal-depth tranches in xent order
    for lang, ids in (("a", [1, 2, 3, 4, 5, 6]), ("b", [7, 8, 9])):
        ranked = sorted(ids, key=lambda i: (out[i]["xent"], i))
        per = len(ids) // 3
        for rank, i in enumerate(ranked):
            assert out[i]["bucket"] == rank // per + 1, (lang, i)
    # head bucket = most model-like: the all-x docs lead both languages
    assert out[1]["bucket"] == 1 and out[7]["bucket"] == 1
    with pytest.raises(ValueError, match="n_buckets"):
        lm_score.ccnet_buckets(df, "doc_id", "text", n_buckets=1)


def test_gopher_quality_flags_rules(spark):
    rows = [
        # passes every rule (with the tuned params below)
        (1, "the cat sat with the dog and that was that " * 5),
        # bullet-heavy: every line starts with a bullet → fails
        (2, "- one two three\n- four five six\n- seven eight nine"),
        # ellipsis-heavy: every line ends with ... → fails
        (3, "something trailing off...\nmore trailing...\nyet more..."),
        # too few words
        (4, "the and"),
        # numeric tokens: alpha fraction fails
        (5, " ".join(["123"] * 30) + " the be of"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r for r in tx.gopher_quality_flags(
        df, "doc_id", "text", min_words=10).collect()}
    assert out[1]["keep"] is True
    assert out[1]["stop_hits"] >= 2
    assert out[2]["bullet_line_frac"] == 1.0 and out[2]["keep"] is False
    assert out[3]["ellipsis_line_frac"] == 1.0 and out[3]["keep"] is False
    assert out[4]["n_words"] == 2 and out[4]["keep"] is False
    assert out[5]["alpha_word_frac"] < 0.8 and out[5]["keep"] is False
    # symbol ratio counts # chars and ... runs against words
    sym = spark.createDataFrame(
        [(1, "# # # # # word the be of and " + "w " * 10)],
        "doc_id long, text string")
    r = tx.gopher_quality_flags(sym, "doc_id", "text",
                                min_words=5).first()
    assert r["symbol_ratio"] > 0.1 and r["keep"] is False


def test_stratified_sample_rates_and_determinism(spark):
    from cassandra_es_index_spark.operators import packing

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = packing.stratified_sample(df, "doc_id", "lang",
                                    {"en": 0.5, "de": 0.2}, default=0.0)
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert "fr" not in by                      # default 0 drops
    assert abs(by["en"] / 1000 - 0.5) < 0.1    # ~rate per stratum
    assert abs(by["de"] / 1000 - 0.2) < 0.1
    # determinism: the same rows every time, partitioning-independent
    again = packing.stratified_sample(
        df.repartition(7), "doc_id", "lang",
        {"en": 0.5, "de": 0.2}, default=0.0)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    with pytest.raises(ValueError, match="fraction"):
        packing.stratified_sample(df, "doc_id", "lang", {"en": 1.5})
    with pytest.raises(ValueError, match="non-empty"):
        packing.stratified_sample(df, "doc_id", "lang", {})


def test_mojibake_repair_round_trip_and_idempotence(spark):
    rows = [(1, "café déjà vu — naïve"),        # single-encoded fault
            (2, "plain ascii stays put"),
            (3, "mixed: №5 ü ß € 中文"),
            (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mangled = df.select("doc_id",
                        tx.mojibake_mangle(F.col("text")).alias("bad"))
    # the fault actually corrupts non-ASCII text
    bad = {r["doc_id"]: r["bad"] for r in mangled.collect()}
    assert bad[1] != rows[0][1] and "Ã" in bad[1]
    assert bad[2] == rows[1][1]
    fixed = mangled.select(
        "doc_id", tx.mojibake_repair(F.col("bad")).alias("good"))
    got = {r["doc_id"]: r["good"] for r in fixed.collect()}
    assert got == {1: rows[0][1], 2: rows[1][1], 3: rows[2][1], 4: None}
    # double-encoded text repairs in two passes
    double = df.where("doc_id = 1").select(tx.mojibake_mangle(
        tx.mojibake_mangle(F.col("text"))).alias("bad2"))
    r2 = double.select(tx.mojibake_repair(F.col("bad2")).alias("g")).first()
    assert r2["g"] == rows[0][1]
    # idempotent on clean text
    clean = df.where("doc_id = 1").select(
        tx.mojibake_repair(F.col("text")).alias("g")).first()
    assert clean["g"] == rows[0][1]
    with pytest.raises(ValueError, match="max_passes"):
        tx.mojibake_repair(F.col("text"), max_passes=0)


def test_corpus_token_stats_hand_case(spark):
    from cassandra_es_index_spark.operators import lm_score

    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a d")], "doc_id long, text string")
    r = lm_score.corpus_token_stats(df, "text").first()
    assert r["n_docs"] == 2
    assert r["total_tokens"] == 6
    assert r["vocab_size"] == 4            # a b c d
    assert r["hapax_frac"] == pytest.approx(3 / 4)   # b c d
    assert r["top1_share"] == pytest.approx(3 / 6)   # 'a' 3 of 6
    assert r["mean_doc_tokens"] == pytest.approx(3.0)


def test_project_embeddings_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((10, 6)).astype("float32")
    mat = rng.standard_normal((3, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(10)],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["proj"] for r in similarity.project_embeddings(
        df, "vec_id", "embedding", mat.tolist()).collect()}
    want = np.round(vecs.astype("float64") @ mat.T, 6)
    for i in range(10):
        assert out[i] == pytest.approx(list(want[i]), abs=1e-9)
    with pytest.raises(ValueError, match="non-empty"):
        similarity.project_embeddings(df, "vec_id", "embedding", [])
    with pytest.raises(ValueError, match="one width"):
        similarity.project_embeddings(df, "vec_id", "embedding",
                                      [[1.0, 2.0], [3.0]])


def test_html_to_text_tags_entities_blocks(spark):
    rows = [
        (1, "<html><body><p>Hello <b>world</b></p>"
            "<script>if (a < b) { alert('x'); }</script>"
            "<style>p { color: red; }</style>"
            "<div>tail</div></body></html>"),
        (2, "A &amp; B &lt;tag&gt; &quot;q&quot;&nbsp;&#39;s&#39;"),
        (3, "&amp;lt; stays encoded-as-text"),
        (4, "no markup at   all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["clean"] for r in df.select(
        "doc_id", tx.html_to_text(F.col("text")).alias("clean")).collect()}
    # script/style content drops entirely, tags become spaces
    assert got[1] == "Hello world tail"
    # named entities decode
    assert got[2] == 'A & B <tag> "q" \'s\''
    # &amp; decodes LAST: "&amp;lt;" is the literal text "&lt;"
    assert got[3] == "&lt; stays encoded-as-text"
    # whitespace collapses
    assert got[4] == "no markup at all"


# ------------------------- incremental (Bloom) dedup (r14)


def test_incremental_dedup_exact_vs_seen(spark):
    from cassandra_es_index_spark.operators import dedup

    new = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "unique one"),
         (4, None)],
        "doc_id long, text string")
    # seen carries case/whitespace perturbations of docs 1 and 2 —
    # normalization must still match them
    seen = spark.createDataFrame(
        [("  ALPHA   beta ",), ("Gamma Delta",), ("other corpus doc",)],
        "text string")
    kept = sorted(r["doc_id"] for r in
                  dedup.incremental_dedup(new, seen, "doc_id", "text")
                  .collect())
    assert kept == [3, 4]
    # null text in BOTH sides dedups too (coalesced sentinel key)
    seen2 = spark.createDataFrame([(None,)], "text string")
    kept2 = sorted(r["doc_id"] for r in
                   dedup.incremental_dedup(new, seen2, "doc_id", "text")
                   .collect())
    assert kept2 == [1, 2, 3]


def test_incremental_dedup_verify_exact_under_heavy_fp(spark):
    from cassandra_es_index_spark.operators import dedup

    new = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(40)],
        "doc_id long, text string")
    seen = new.where("doc_id % 4 = 0").select("text")
    # 16-bit filter saturates -> every doc is a Bloom candidate, but
    # verification keeps the result exact
    kept = dedup.incremental_dedup(new, seen, "doc_id", "text",
                                   num_bits=16, num_hashes=2)
    assert sorted(r["doc_id"] for r in kept.collect()) == \
        [i for i in range(40) if i % 4 != 0]
    # verify=False on the saturated filter documents the approximate
    # tier: candidates drop without the exactness re-check
    approx = dedup.incremental_dedup(new, seen, "doc_id", "text",
                                     num_bits=16, num_hashes=2,
                                     verify=False)
    assert approx.count() <= 30


def test_incremental_dedup_reuses_prebuilt_bloom(spark):
    from cassandra_es_index_spark.operators import dedup

    new = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc")], "doc_id long, text string")
    seen = spark.createDataFrame([("bb",)], "text string")
    bloom = dedup.bloom_build(seen, "text")
    kept = dedup.incremental_dedup(new, seen, "doc_id", "text",
                                   bloom=bloom)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]
    # sparse frame is bounded by num_hashes x docs
    assert bloom.count() <= 5


def test_incremental_dedup_typed_params(spark):
    import pytest

    from cassandra_es_index_spark.operators import dedup

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_bits"):
        dedup.bloom_build(df, "text", num_bits=4)
    with pytest.raises(ValueError, match="num_hashes"):
        dedup.incremental_dedup(df, df, "doc_id", "text", num_hashes=0)
    with pytest.raises(ValueError, match="num_hashes"):
        dedup.incremental_dedup(df, df, "doc_id", "text", num_hashes=17)


# ------------------------- PMI collocations (r14)


def test_pmi_pairs_brute_force_parity(spark):
    import collections

    from cassandra_es_index_spark.operators.collocations import pmi_pairs

    docs = ["big data big data pipeline", "big data flows fast",
            "data pipeline runs", "fast data fast data"]
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = [(r["pair"], r["c_xy"], r["pmi_ratio"]) for r in
           pmi_pairs(df, "doc_id", "text", window=3, min_count=2,
                     top_k=10).collect()]

    uni = collections.Counter()
    pc = collections.Counter()
    ntok = 0
    for d in docs:
        t = d.split()
        ntok += len(t)
        uni.update(t)
        for i in range(len(t)):
            for j in (1, 2):
                if i + j < len(t):
                    a, b = sorted((t[i], t[i + j]))
                    pc[(a, b)] += 1
    npairs = sum(pc.values())
    exp = sorted(
        ((f"{a} {b}", c, (c * ntok * ntok) / (npairs * uni[a] * uni[b]))
         for (a, b), c in pc.items() if c >= 2),
        key=lambda x: (-x[2], x[0]))[:10]
    assert got == exp


def test_pmi_pairs_typed_params(spark):
    import pytest

    from cassandra_es_index_spark.operators.collocations import pmi_pairs

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        pmi_pairs(df, "doc_id", "text", window=1)
    with pytest.raises(ValueError, match="min_count"):
        pmi_pairs(df, "doc_id", "text", min_count=0)
    with pytest.raises(ValueError, match="top_k"):
        pmi_pairs(df, "doc_id", "text", top_k=0)


# ------------------------- WARC crawl ingestion (r14)


def _pages():
    return [{"url": "http://ex.com/a", "date": "2024-01-02T03:04:05Z",
             "body": "<html><body><p>hello &amp; bye</p></body></html>"},
            {"url": "http://ex.com/b", "date": "2024-01-02T03:04:06Z",
             "body": "gone", "status": 404,
             "content_type": "text/plain"}]


def test_warc_round_trip_plain_and_gzip():
    from cassandra_es_index_spark.functions.warc import (
        build_warc, parse_warc,
    )

    for compress in (False, True):
        recs = parse_warc(build_warc(_pages(), compress=compress))
        assert recs[0]["type"] == "warcinfo"
        rs = [r for r in recs if r["type"] == "response"]
        assert [(r["target_uri"], r["http_status"],
                 r["http_content_type"], r["body"].decode())
                for r in rs] == [
            ("http://ex.com/a", 200, "text/html", _pages()[0]["body"]),
            ("http://ex.com/b", 404, "text/plain", "gone")]
        # record lengths restore boundaries exactly
        assert all(r["content_length"] >= len(r["body"]) for r in rs)


def test_warc_typed_errors():
    import pytest

    from cassandra_es_index_spark.functions.warc import (
        WarcParseError, build_warc, parse_warc,
    )

    with pytest.raises(WarcParseError, match="version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(WarcParseError, match="overruns"):
        parse_warc(build_warc(_pages())[:-30])
    with pytest.raises(WarcParseError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    with pytest.raises(WarcParseError, match="gzip"):
        parse_warc(b"\x1f\x8bnot really gzip data")


def test_warc_lenient_http_payload_headers():
    """r15 ADVICE fix: the HTTP payload of a response record is THIRD-
    PARTY server output — garbage header lines skip and RFC 7230
    obs-fold continuations fold into the previous value, instead of a
    WarcParseError failing the whole archive. WARC record headers
    (OUR structural contract) stay strict."""
    import pytest

    from cassandra_es_index_spark.functions.warc import (
        WarcParseError, parse_warc,
    )

    def record(http: bytes) -> bytes:
        head = (b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                b"WARC-Target-URI: http://ex.com/x\r\n"
                b"Content-Length: " + str(len(http)).encode()
                + b"\r\n\r\n")
        return head + http + b"\r\n\r\n"

    # garbage line + obs-fold continuation inside the HTTP headers
    http = (b"HTTP/1.1 200 OK\r\n"
            b"this line has no colon at all\r\n"
            b"Content-Type: text/html;\r\n"
            b"\tcharset=utf-8\r\n"
            b"X-Junk\x01\x02\r\n"
            b"\r\nbody!")
    recs = parse_warc(record(http))
    assert len(recs) == 1
    assert recs[0]["http_status"] == 200
    assert recs[0]["http_content_type"] == "text/html; charset=utf-8"
    assert recs[0]["body"] == b"body!"
    # an orphan continuation line (no preceding header) is skipped
    recs = parse_warc(record(
        b"HTTP/1.1 204 No Content\r\n"
        b" orphan fold\r\nContent-Type: a/b\r\n\r\n"))
    assert recs[0]["http_content_type"] == "a/b"
    # WARC record headers remain strict
    with pytest.raises(WarcParseError, match="malformed header"):
        parse_warc(b"WARC/1.0\r\nno-colon-here\r\n\r\n")


def test_warc_responses_operator(spark):
    import pandas as pd

    from cassandra_es_index_spark.functions.warc import build_warc
    from cassandra_es_index_spark.operators import web_ingest

    df = spark.createDataFrame(
        pd.DataFrame({"archive_id": ["w0", "w1"],
                      "content": [build_warc(_pages()),
                                  build_warc(_pages(),
                                             compress=True)]}),
        "archive_id string, content binary")
    got = sorted((r["archive_id"], r["record_seq"], r["url"],
                  r["http_status"], r["mime"], r["body_text"])
                 for r in web_ingest.warc_responses(df).collect())
    expected_one = [
        (0, "http://ex.com/a", 200, "text/html", _pages()[0]["body"]),
        (1, "http://ex.com/b", 404, "text/plain", "gone")]
    assert got == [(aid, seq, url, st, mime, body)
                   for aid in ("w0", "w1")
                   for seq, url, st, mime, body in expected_one]


def test_warc_to_clean_text_composes(spark):
    # the fineweb head: WARC -> responses -> html_to_text
    import pandas as pd

    from cassandra_es_index_spark.functions.text import html_to_text
    from cassandra_es_index_spark.functions.warc import build_warc
    from cassandra_es_index_spark.operators import web_ingest

    df = spark.createDataFrame(
        pd.DataFrame({"archive_id": ["w"],
                      "content": [build_warc(_pages())]}),
        "archive_id string, content binary")
    out = (web_ingest.warc_responses(df)
           .where("http_status = 200 AND mime = 'text/html'")
           .select(html_to_text(F.col("body_text")).alias("text")))
    assert [r["text"] for r in out.collect()] == ["hello & bye"]


def test_train_logreg_matches_pure_python(spark):
    """r15: the distributed trainer replays the exact integer
    recurrence — a pure-Python reference on the same rows produces
    bit-identical scaled weights."""
    import math

    from cassandra_es_index_spark.operators import classify

    rows = [(1, 10, 3, 1), (2, 40, 1, 0), (3, 25, 7, 1),
            (4, 55, 2, 0), (5, 15, 5, 1), (6, 60, 9, 0)]
    df = spark.createDataFrame(
        rows, "id int, len bigint, punct bigint, y int")
    out = classify.train_logreg(df, ["len", "punct"], "y",
                                n_iters=3, lr=0.1)
    got = {r["feature"]: (r["weight_scaled"], r["weight"])
           for r in out.collect()}

    # reference: W ← W − lr_m·G with r = round(1e6·(σ(z)−y)),
    # z = ΣW·x/(1e9·N)
    n = len(rows)
    feats = [(1, r[1], r[2]) for r in rows]
    ys = [r[3] for r in rows]
    W = [0, 0, 0]
    for _ in range(3):
        G = [0, 0, 0]
        for x, y in zip(feats, ys):
            z = sum(w * xi for w, xi in zip(W, x)) / (1.0e9 * n)
            sig = 1.0 / (1.0 + math.exp(-z))
            r = round((sig - y) * 1000000.0)
            # Python round is half-even; Spark HALF_UP — inputs here
            # are nowhere near ties, so both agree
            for j in range(3):
                G[j] += r * x[j]
        for j in range(3):
            W[j] -= 100 * G[j]
    assert got["_intercept"][0] == W[0]
    assert got["len"][0] == W[1]
    assert got["punct"][0] == W[2]
    assert got["len"][1] == W[1] / (1.0e9 * n)
    # the learned direction separates the classes (short docs y=1)
    assert got["len"][1] < 0


def test_train_logreg_partition_invariant(spark):
    """Integer/decimal sums make training bit-reproducible under any
    partitioning — the 100 TB determinism contract."""
    from cassandra_es_index_spark.operators import classify

    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 37).alias("a"),
        ((F.col("id") * 7) % 11).alias("b"),
        (F.col("id") % 3 == 0).cast("int").alias("y"))
    w1 = {r["feature"]: r["weight_scaled"]
          for r in classify.train_logreg(
              df, ["a", "b"], "y", n_iters=2).collect()}
    w2 = {r["feature"]: r["weight_scaled"]
          for r in classify.train_logreg(
              df.repartition(13), ["a", "b"], "y",
              n_iters=2).collect()}
    assert w1 == w2 and len(w1) == 3


def test_train_logreg_typed_errors(spark):
    from cassandra_es_index_spark.operators import classify

    df = spark.createDataFrame([(1, 1)], "x bigint, y int")
    with pytest.raises(ValueError, match="multiple of 0.001"):
        classify.train_logreg(df, ["x"], "y", lr=0.0007)
    with pytest.raises(ValueError, match="n_iters"):
        classify.train_logreg(df, ["x"], "y", n_iters=0)
    with pytest.raises(ValueError, match="non-empty"):
        classify.train_logreg(df, [], "y")
    with pytest.raises(ValueError, match="empty training frame"):
        classify.train_logreg(df.where("x > 99"), ["x"], "y")


# -- r16: vectorized string-XXH64 + Arrow MinHash signatures ----------------


def test_xxh64_string_numpy_matches_spark_expression(spark):
    # the r16 Arrow MinHash reimplements Spark's xxhash64-over-strings
    # (hashUnsafeBytes on the UTF-8 bytes) in numpy — pin bit-equality
    # against the JVM expression across every tail-structure class
    # (0/4/8-byte boundaries, the 32-byte stripe loop) and unicode,
    # for the default seed AND the int-literal seed chain MinHash uses
    import numpy as np

    from cassandra_es_index_spark.functions.text import (
        _xxh64_bytes_prepare_np, _xxh64_int_seed,
    )

    cases = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg",
             "abcdefgh", "abcdefghi", "0123456789abcde",
             "0123456789abcdef", "0123456789abcdefg",
             "x" * 31, "x" * 32, "x" * 33, "y" * 63, "y" * 64,
             "z" * 65, "w" * 100, "héllo wörld", "中文 tokens",
             "emoji 🙂 bytes", "tab\tnewline\nmix", " ", "  |  "]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "i int, s string")
    jvm = df.select(
        F.xxhash64("s").alias("h42"),
        F.xxhash64(F.lit(0), F.col("s")).alias("h0"),
        F.xxhash64(F.lit(31), F.col("s")).alias("h31")).collect()
    blobs = [c.encode("utf-8") for c in cases]
    buf = np.frombuffer(b"".join(blobs), np.uint8)
    lens = np.array([len(b) for b in blobs], np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    run = _xxh64_bytes_prepare_np(buf, starts, lens)
    assert run(42).view(np.int64).tolist() == [r.h42 for r in jvm]
    assert run(_xxh64_int_seed(0)).view(np.int64).tolist() \
        == [r.h0 for r in jvm]
    assert run(_xxh64_int_seed(31)).view(np.int64).tolist() \
        == [r.h31 for r in jvm]


def _column_form_minhash(df, id_col, text_col, num_hashes, shingle_n,
                         unit):
    # the pre-r16 Column formulation, kept verbatim as the equivalence
    # reference: explode features → num_hashes seeded xxhash64 minima
    feats = (tx.shingles(F.col(text_col), shingle_n)
             if unit == "shingle" else tx.tokens(F.col(text_col)))
    exploded = (dedup._spread(df)
                .select(F.col(id_col).alias("doc"),
                        F.explode(feats).alias("sh")))
    return exploded.groupBy("doc").agg(
        F.array(*[
            F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]).alias("signature"))


def test_minhash_signature_matches_column_form(spark):
    # bit-exact equivalence of the r16 mapInArrow signature against the
    # old explode/aggregate Column pipeline on the edge fixture: null
    # text (shingle unit keeps the [""] fallback signature, token unit
    # drops the doc), empty text, < n tokens, duplicate doc ids
    # (groupBy-merged), unicode, long tokens (stripe loop)
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, ""), (3, "one"), (4, "two words"), (5, None),
            (6, "héllo wörld ünïcode tokens ünïcode again héllo"),
            (1, "duplicate id second row other text entirely"),
            (7, "emoji 🙂 tokens and 中文 mixed in"),
            (8, "   leading and trailing   whitespace   "),
            (9, "x" * 200 + " " + "y" * 77 + " tail words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for unit, nh, sn in (("shingle", 32, 3), ("shingle", 8, 5),
                         ("token", 16, 3)):
        new = dedup.minhash_signature(df, "doc_id", "text", nh, sn, unit)
        old = _column_form_minhash(df, "doc_id", "text", nh, sn, unit)
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0
    # the hot path is Arrow-vectorized (MapInArrow), never a
    # row-at-a-time BatchEvalPython
    explained = new._jdf.queryExecution().toString()
    assert "BatchEvalPython" not in explained
    assert "mapInArrow" in explained or "MapInArrow" in explained


def test_connected_components_frees_superseded_round_pins(spark):
    # r16 (verdict r15 item 5): every superseded per-round checkpoint
    # is unpersisted as soon as its successor materializes — a chain
    # graph forcing multiple rounds + root jumps must leave only the
    # final label pin (+ the final empty frontier) behind, not
    # 2×rounds+jumps pinned RDDs awaiting a session GC
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 14)], "doc_a bigint, doc_b bigint")
    got = {r["node"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {i: 1 for i in range(1, 15)}
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    leftovers = after - before
    assert len(leftovers) <= 3, (
        f"CC left {len(leftovers)} pinned RDDs behind — superseded "
        "round checkpoints are not being freed")


def test_dot_unrolled_expr_matches_column_form(spark):
    # r16: the unrolled dot product renders as ONE server-parsed SQL
    # string — pin bit-equality against the per-Column F.get chain it
    # replaced (same left-fold order, same get() semantics)
    import math
    import random

    from cassandra_es_index_spark.operators.similarity import (
        _dot_unrolled,
    )

    random.seed(3)
    dim = 9
    rows = [(i, [random.uniform(-2, 2) for _ in range(dim)],
             [random.uniform(-2, 2) for _ in range(dim)])
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "i int, a array<double>, b array<double>")
    old = F.get(F.col("a"), 0) * F.get(F.col("b"), 0)
    for j in range(1, dim):
        old = old + F.get(F.col("a"), j) * F.get(F.col("b"), j)
    got = df.select("i", _dot_unrolled("a", "b", dim).alias("n"),
                    old.alias("o")).collect()
    for r in got:
        assert math.isclose(r.n, r.o, rel_tol=0.0, abs_tol=0.0), r
