"""Similarity search over embedding columns (north-star operator).

- ``cosine_topk``      — exact brute-force top-k: one scan, one
  TakeOrderedAndProject; the correctness baseline at any scale.
- ``cosine_join_topk`` — exact top-k for a *set* of query vectors
  (broadcast the queries, scan the corpus once).
- ``lsh_ann_topk``     — random-hyperplane LSH bucketing: queries only
  compare against corpus vectors in colliding buckets. The 100 TB path —
  bucket key is computed scan-side, the join is an equi-join on
  (plane-signature), and candidates per query are bounded.

All arithmetic is double precision, in element order, with final scores
rounded to 6 dp — reproducible across engines for oracle checks. Dot
products use built-in higher-order functions (zip_with/aggregate), staying
JVM-side; no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, rounded to 6 dp."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def _render_double(x) -> str:
    """One double as SQL text: CAST('<repr>' AS DOUBLE). Python's repr
    is the shortest round-tripping decimal, and both Python and the JVM
    parse decimal→binary64 correctly rounded, so the parsed literal is
    bit-identical to ``F.lit(float(x))`` (pinned in test_operators)."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"CAST('{x!r}' AS DOUBLE)"


def _lit_vec_sql(values) -> str:
    # a bare ``array()`` types as array<void> and fails analysis where
    # the replaced ``F.lit(list).cast("array<double>")`` accepted a
    # zero-dim vector — keep the degenerate case typed (ADVICE r15)
    body = ",".join(_render_double(x) for x in values)
    if not body:
        return "CAST(array() AS ARRAY<DOUBLE>)"
    return f"array({body})"


def _lit_vec(values) -> Column:
    """array<double> literal built in ONE py4j/parse round trip.

    ``F.lit(list)`` expands Python-side to one ``lit`` call per element
    plus the ``array`` assembly — ~80 py4j round trips for a dim-64
    vector — and the driver pays it per vector literal: measured
    2.6-5.6 s of pure driver-side construction for the 16-centroid
    assignment expression in ``_semantic_cells`` (r15, guide §5: the
    driver should do almost no work). One ``F.expr`` string parses
    server-side in one call."""
    return F.expr(_lit_vec_sql(values))


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query_vector: list[float], k: int = 10,
                exclude_id=None) -> DataFrame:
    """Exact top-k by cosine against one literal query vector.

    Single scan + TakeOrderedAndProject (no shuffle of the corpus); ties
    break on ascending id for determinism.
    """
    q = _lit_vec(np.asarray(query_vector, dtype="float64").tolist())
    scored = df.select(F.col(id_col), cosine(as_double_array(F.col(vec_col)), q).alias("cos_sim"))
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_join_topk(corpus: DataFrame, queries: DataFrame,
                     corpus_id: str, corpus_vec: str,
                     query_id: str, query_vec: str, k: int = 10) -> DataFrame:
    """Exact top-k per query vector: broadcast the (small) query set and
    scan the corpus once; rank with a window per query id."""
    from pyspark.sql.window import Window

    # Precompute each side's norm once — cosine per pair then costs one dot
    # product instead of three (measured ~3× on a 500×500 join).
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      as_double_array(F.col(corpus_vec)).alias("cvec")) \
              .withColumn("cnorm", _norm(F.col("cvec")))
    q = queries.select(F.col(query_id).alias("query_id"),
                       as_double_array(F.col(query_vec)).alias("qvec")) \
               .withColumn("qnorm", _norm(F.col("qvec")))
    scored = (c.join(F.broadcast(q))
               .select("query_id", "corpus_id",
                       F.round(_dot(F.col("cvec"), F.col("qvec"))
                               / (F.col("cnorm") * F.col("qnorm")), 6)
                        .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "corpus_id", "cos_sim", "rank"))


def _sq_dist(a: Column, centroid: list[float]) -> Column:
    c = _lit_vec(centroid)
    return F.aggregate(F.zip_with(a, c, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def _sq_dist_sql(vec_col_name: str, centroid: list[float],
                 round_dp: int | None = None) -> str:
    """The ``_sq_dist`` expression as one SQL string — same analyzed
    tree (zip_with squared-diff, double-typed left-fold aggregate,
    optional 6-dp round), zero per-element py4j traffic. The
    accumulator seed is CAST(0.0 AS DOUBLE) because a bare SQL 0.0
    parses as DECIMAL and would change the fold's arithmetic type."""
    body = (f"aggregate(zip_with({vec_col_name}, "
            f"{_lit_vec_sql(centroid)}, "
            "(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + x)")
    return f"round({body}, {round_dp})" if round_dp is not None else body


def _sq_dists_array(vec_col_name: str, centroids: list[list[float]],
                    round_dp: int | None = None) -> Column:
    """Per-centroid squared distances as ONE server-parsed expression:
    the n_cells × dim literal matrix and every fold ride a single
    ``F.expr`` call instead of ~20 py4j round trips per centroid
    (guide §5 — plan construction is driver-side work)."""
    return F.expr("array(" + ",".join(
        _sq_dist_sql(vec_col_name, ct, round_dp) for ct in centroids)
        + ")")


def ivf_build(corpus: DataFrame, id_col: str, vec_col: str,
              n_cells: int = 16, n_iters: int = 3) -> tuple[DataFrame, list[list[float]]]:
    """IVF index: deterministic Lloyd's k-means over the corpus.

    Init = the ``n_cells`` vectors with the smallest ids (deterministic,
    no RNG). Each iteration is one assignment scan (argmin over per-cell
    squared distances, pure Column expressions) + one small aggregation;
    centroids (n_cells × dim doubles) round-trip through the driver and
    broadcast back as literals — the only driver-side data, independent of
    corpus size.

    Returns (corpus + ``cell`` column, centroids).
    """
    c = corpus.select(F.col(id_col).alias("corpus_id"),
                      as_double_array(F.col(vec_col)).alias("cvec"))
    centroids = [r["cvec"] for r in
                 c.orderBy("corpus_id").limit(n_cells).collect()]

    def assign(df: DataFrame) -> DataFrame:
        dists = _sq_dists_array("cvec", centroids)
        return df.withColumn(
            "cell", (F.array_position(dists, F.array_min(dists)) - 1).cast("int"))

    for _ in range(n_iters):
        assigned = assign(c)
        rows = (assigned
                .select("cell", F.posexplode("cvec").alias("pos", "x"))
                .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
                .groupBy("cell")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
                .select("cell", F.col("ms.m").alias("centroid"))
                .collect())
        for r in rows:
            centroids[r["cell"]] = list(r["centroid"])
    return assign(c), centroids


def ivf_write(indexed: DataFrame, centroids: list[list[float]],
              path: str) -> None:
    """Persist an IVF index: the assigned corpus parquet-PARTITIONED BY
    ``cell`` plus the centroids as JSON alongside. Build once, query many
    — and because ``ivf_topk`` joins a broadcast probe list on ``cell``,
    scans against the persisted layout prune to the probed cells'
    directories (dynamic partition pruning), touching nprobe/n_cells of
    the index per query."""
    import json as _json
    import os as _os

    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)
    with open(_os.path.join(path, "_centroids.json"), "w") as f:
        _json.dump(centroids, f)


def ivf_read(spark, path: str) -> tuple[DataFrame, list[list[float]]]:
    """Reopen a persisted IVF index → (indexed corpus, centroids)."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_centroids.json")) as f:
        centroids = _json.load(f)
    return spark.read.parquet(path), centroids


def ivf_topk(indexed: DataFrame, centroids: list[list[float]],
             queries: DataFrame, query_id: str, query_vec: str,
             k: int = 10, nprobe: int = 4) -> DataFrame:
    """ANN top-k probing only the ``nprobe`` nearest cells per query.

    The corpus is touched only where cells collide: candidates come from an
    equi-join on ``cell``; cost scales with corpus/|cells| × nprobe, not
    with the corpus. Recall is controlled by ``nprobe`` (= exact when
    nprobe == n_cells).
    """
    from pyspark.sql.window import Window

    q = queries.select(F.col(query_id).alias("query_id"),
                       as_double_array(F.col(query_vec)).alias("qvec"))
    dists = F.expr("array(" + ",".join(
        f"named_struct('d', {_sq_dist_sql('qvec', ct)}, "
        f"'cell', CAST({i} AS INT))"
        for i, ct in enumerate(centroids)) + ")")
    probed = (q.withColumn("_cells", F.slice(F.array_sort(dists), 1, nprobe))
               .select("query_id", "qvec",
                       F.explode(F.col("_cells.cell")).alias("cell")))
    cand = indexed.join(F.broadcast(probed), "cell")
    scored = cand.select("query_id", "corpus_id",
                         cosine(F.col("cvec"), F.col("qvec")).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k)
                  .select("query_id", "corpus_id", "cos_sim", "rank"))


def embedding_dup_pairs(corpus: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95, method: str = "lsh",
                        n_planes: int = 6, n_tables: int = 8,
                        seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the semantic twin of the
    text dedup tiers: (doc_a, doc_b, cos_sim) for every pair with cosine
    ≥ ``threshold`` and doc_a < doc_b.

    ``method="exact"`` — all-pairs with precomputed norms: the correctness
    baseline (oracle-checkable), quadratic, fine at moderate scale.

    ``method="lsh"`` — the 100 TB path: sign-LSH bucketing (``n_tables``
    independent plane sets), candidates only where buckets collide, each
    candidate verified with the exact cosine, so precision is 1 and recall
    is the bucket-collision probability (rises with ``n_tables``; measured
    per round in the driver's ``ann_recall`` harness). The candidate join
    is an equi-join on (table, signature) — no all-pairs stage.
    """
    c = (corpus.select(F.col(id_col).alias("doc"),
                       as_double_array(F.col(vec_col)).alias("vec"))
               .withColumn("nrm", _norm(F.col("vec"))))
    if method == "exact":
        a = c.select(F.col("doc").alias("doc_a"), F.col("vec").alias("va"),
                     F.col("nrm").alias("na"))
        b = c.select(F.col("doc").alias("doc_b"), F.col("vec").alias("vb"),
                     F.col("nrm").alias("nb"))
        pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    elif method == "lsh":
        dim = len(corpus.select(vec_col).first()[0])
        keyed = []
        for t in range(n_tables):
            planes = hyperplanes(dim, n_planes, seed + t)
            keyed.append(c.select(
                "doc", "vec", "nrm", F.lit(t).alias("tbl"),
                plane_signature(F.col("vec"), planes).alias("sig")))
        all_keys = keyed[0]
        for extra in keyed[1:]:
            all_keys = all_keys.unionByName(extra)
        a, b = all_keys.alias("a"), all_keys.alias("b")
        pairs = (a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
                        & (F.col("a.sig") == F.col("b.sig"))
                        & (F.col("a.doc") < F.col("b.doc")))
                  .select(F.col("a.doc").alias("doc_a"),
                          F.col("a.vec").alias("va"), F.col("a.nrm").alias("na"),
                          F.col("b.doc").alias("doc_b"),
                          F.col("b.vec").alias("vb"), F.col("b.nrm").alias("nb"))
                  .dropDuplicates(["doc_a", "doc_b"]))
    else:
        raise ValueError(f"unknown method {method!r}")
    return (pairs.select(
                "doc_a", "doc_b",
                F.round(_dot(F.col("va"), F.col("vb"))
                        / (F.col("na") * F.col("nb")), 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def plane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign bit-string of the vector against each hyperplane — the LSH
    bucket key. Computed with built-in expressions (no UDF)."""
    bits = [
        F.when(_dot(vec, _lit_vec(p)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame,
                 corpus_id: str, corpus_vec: str,
                 query_id: str, query_vec: str,
                 k: int = 10, n_planes: int = 8, n_tables: int = 2,
                 seed: int = 42, dim: int | None = None) -> DataFrame:
    """Approximate top-k: compare only within colliding LSH buckets.

    ``n_tables`` independent plane sets trade recall for cost — a candidate
    matches if it collides in ANY table. At scale: corpus signatures are
    computed once per table in the scan, the candidate join is an equi-join
    on (table, signature) — no all-pairs stage anywhere. Pass ``dim``
    (the vector dimensionality) to skip the one-row corpus probe that
    otherwise infers it.
    """
    from pyspark.sql.window import Window

    if dim is None:
        dim = len(corpus.select(corpus_vec).first()[0])
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      as_double_array(F.col(corpus_vec)).alias("cvec"))
    q = queries.select(F.col(query_id).alias("query_id"),
                       as_double_array(F.col(query_vec)).alias("qvec"))

    c_keys = []
    q_keys = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + t)
        c_keys.append(c.select("corpus_id", "cvec", F.lit(t).alias("tbl"),
                               plane_signature(F.col("cvec"), planes).alias("sig")))
        q_keys.append(q.select("query_id", "qvec", F.lit(t).alias("tbl"),
                               plane_signature(F.col("qvec"), planes).alias("sig")))
    c_all = c_keys[0]
    for extra in c_keys[1:]:
        c_all = c_all.unionByName(extra)
    q_all = q_keys[0]
    for extra in q_keys[1:]:
        q_all = q_all.unionByName(extra)

    cand = (c_all.join(F.broadcast(q_all), ["tbl", "sig"])
                 .select("query_id", "corpus_id", "cvec", "qvec")
                 .dropDuplicates(["query_id", "corpus_id"]))
    scored = cand.select("query_id", "corpus_id",
                         cosine(F.col("cvec"), F.col("qvec")).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "corpus_id", "cos_sim", "rank"))


# -- int8 quantization tier (r12) ------------------------------------------
#
# The standard two-stage retrieval memory trade: store 4-byte floats as
# 1-byte ints (per-vector symmetric max-abs scaling — the faiss/SQ8
# shape), prefilter candidates with the cheap quantized dot product,
# then re-rank the short list exactly. At 100 TB of embeddings the
# quantized corpus is 4× smaller on disk and in cache, and the
# prefilter scan reads only it; the exact pass touches ≤ prefilter_k
# full vectors. Quantization is DETERMINISTIC (floor(x·127/m + 0.5),
# identical in any engine) so the whole pipeline is oracle-checkable —
# no RNG, no codebook training.

def quantize_embeddings(df: DataFrame, id_col: str, vec_col: str
                        ) -> DataFrame:
    """(id, qvec: array<int>, scale: double) — symmetric per-vector
    max-abs int8 quantization: q_i = floor(x_i·127/m + 0.5) ∈
    [−127, 127] with m = max|x|, scale = m/127 reconstructs x ≈
    q·scale. A zero vector quantizes to zeros with scale 0."""
    v = as_double_array(F.col(vec_col))
    m = F.array_max(F.transform(v, F.abs))
    q = F.when(m > 0, F.transform(
        v, lambda x: F.floor(x * F.lit(127.0) / m + F.lit(0.5))
        .cast("int"))).otherwise(
        F.transform(v, lambda x: F.lit(0)))
    return df.select(F.col(id_col),
                     q.alias("qvec"),
                     F.coalesce(m / F.lit(127.0), F.lit(0.0))
                     .alias("scale"))


def project_embeddings(df: DataFrame, id_col: str, vec_col: str,
                       matrix: list[list[float]],
                       out_col: str = "proj") -> DataFrame:
    """Apply an offline-trained linear projection (PCA / whitening /
    random projection) to an embedding column: ``proj_i = round(vec ·
    matrix_i, 6)`` — the dimension-reduction step run before ANN
    indexing at scale (project 1536→64, then IVF/LSH the small
    vectors). The matrix rides the plan as literals (k × dim doubles,
    driver-side only); per-row work is k ordered dot products, one
    corpus scan, no shuffle. Deterministic — element-order sums,
    6-dp rounding — so a fixed matrix replays exactly in SQL."""
    if not matrix or not matrix[0]:
        raise ValueError("projection matrix must be non-empty")
    width = len(matrix[0])
    if any(len(row) != width for row in matrix):
        raise ValueError("projection matrix rows must share one width")
    v = as_double_array(F.col(vec_col))
    rows = [F.round(_dot(v, _lit_vec(row)), 6)
            for row in matrix]
    return df.select(F.col(id_col), F.array(*rows).alias(out_col))


# -- semantic dedup (SemDeDup) tier (r14) ----------------------------------
#
# The public SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540):
# k-means the embedding space, compare pairwise cosine WITHIN each
# cluster only, and drop all but one member of every semantic-duplicate
# group — keeping the member FARTHEST from the cluster centroid (the
# paper's low-redundancy choice: the most atypical copy carries the
# most information). The reference engine has no embedding operators at
# all (blobs are skipped outright, CStarUtils.java:305-306); this tier
# is part of the north-star LLM-pipeline surface.
#
# Scale shape: the k-means is `ivf_build`'s deterministic Lloyd's
# (centroids are the only driver-side data, n_cells × dim doubles);
# the pair stage is an equi-join on `cell`, so cost is Σ|cell|² not
# |corpus|² — with balanced cells that is |corpus|²/n_cells, and
# n_cells grows with the corpus (the paper uses ~11k clusters for
# LAION). Grouping + keeper selection reuses the connected-components
# machinery (linear rounds, edge contraction, checkpointed lineage).
# Everything is deterministic — seeded init, ordered double arithmetic,
# 6-dp rounding — so the n_iters=0 flavor is exactly replayable in
# ANSI SQL for the oracle gate.

def _dot_unrolled(a: str, b: str, dim: int) -> Column:
    """Element-order LEFT-FOLD dot product over two NAMED array
    columns, unrolled to plain codegen arithmetic. Spark's higher-order
    functions (zip_with/aggregate) run INTERPRETED — measured ~6 s for
    a 2k-row × 16-cell assignment at dim 64 where this form runs in
    milliseconds — and the unrolled left fold adds in exactly the same
    IEEE order, so results (and the SQL oracles) are bit-identical.
    Bounded to the known-dim semantic tier; the generic HOF forms stay
    for unknown-dim callers.

    Rendered as ONE server-parsed ``F.expr`` string (r16, the r15.5
    batching trick): the per-Column form cost 4 py4j round trips per
    element — measured 0.9 s of pure driver time per semantic_dedup
    construction at dim 64 — while the SQL string parses to the
    identical left-associative ``get(a,j) * get(b,j)`` sum in one
    trip."""
    body = " + ".join(f"get(`{a}`, {j}) * get(`{b}`, {j})"
                      for j in range(dim))
    return F.expr(body)


def _semantic_cells(corpus: DataFrame, id_col: str, vec_col: str,
                    n_cells: int, n_iters: int
                    ) -> tuple[DataFrame, list[list[float]]]:
    """(cells frame, centroids) — the shared internals of the SemDeDup
    tier. Assignment is one projection over the corpus: an array of
    6-dp-ROUNDED squared distances (ties break to the lowest cell via
    array_position-of-min), so the n_iters=0 flavor replays exactly in
    engines that sum doubles in element order. A/B note (r14.5): at
    bench scale this single-projection form beat both an unrolled
    expression tree (py4j construction + a 20k-node Catalyst tree melt
    the driver) and an explode→broadcast-join→double-agg plan (more
    stages than data); the per-row HOF cost is the honest price of
    interpretation and is flat in corpus size."""
    _, centroids = ivf_build(corpus, id_col, vec_col, n_cells, n_iters)
    if not centroids:
        raise ValueError("semantic_cells: empty corpus — no vectors "
                         "to seed centroids from")
    c = corpus.select(F.col(id_col).alias("corpus_id"),
                      as_double_array(F.col(vec_col)).alias("cvec"))
    dists = _sq_dists_array("cvec", centroids, round_dp=6)
    cells = (c.withColumn("_d", dists)
             .withColumn("cell", (F.array_position(
                 F.col("_d"), F.array_min(F.col("_d"))) - 1).cast("int"))
             .withColumn("centroid_dist", F.array_min(F.col("_d")))
             .drop("_d"))
    return cells, centroids


def semantic_cells(corpus: DataFrame, id_col: str, vec_col: str,
                   n_cells: int = 16, n_iters: int = 0) -> DataFrame:
    """Deterministic k-means cell assignment for the SemDeDup tier:
    (corpus_id, cvec, cell, centroid_dist).

    Centroids come from ``ivf_build`` (seed = the ``n_cells`` vectors
    with the smallest ids; ``n_iters`` Lloyd rounds). Assignment
    rounds each squared distance to 6 dp BEFORE the argmin (ties break
    to the lowest cell) — a rounded argmin is bit-replayable in any
    engine that sums doubles in element order, which is what makes the
    n_iters=0 flavor oracle-checkable; ``ivf_build``'s own unrounded
    assignment stays as-is for the IVF query path."""
    return _semantic_cells(corpus, id_col, vec_col, n_cells,
                           n_iters)[0]


def _pairs_within_cells(cells: DataFrame, threshold: float,
                        dim: int) -> DataFrame:
    """(cell, doc_a, doc_b, cos_sim) for every within-cell pair with
    cosine ≥ threshold, doc_a < doc_b. Norms precomputed once per side;
    the join is an equi-join on cell — never all-pairs; the per-pair
    dot is the unrolled codegen form (the HOF dot ran interpreted on
    every candidate pair — the stage's measured hot spot)."""
    withn = cells.withColumn(
        "nrm", F.sqrt(_dot_unrolled("cvec", "cvec", dim)))
    a = withn.select("cell", F.col("corpus_id").alias("doc_a"),
                     F.col("cvec").alias("_va"), F.col("nrm").alias("_na"))
    b = withn.select("cell", F.col("corpus_id").alias("doc_b"),
                     F.col("cvec").alias("_vb"), F.col("nrm").alias("_nb"))
    return (a.join(b, "cell")
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("cell", "doc_a", "doc_b",
                     F.round(_dot_unrolled("_va", "_vb", dim)
                             / (F.col("_na") * F.col("_nb")), 6)
                     .alias("cos_sim"))
             .where(F.col("cos_sim") >= threshold))


def semantic_pairs(corpus: DataFrame, id_col: str, vec_col: str,
                   n_cells: int = 16, n_iters: int = 0,
                   threshold: float = 0.95) -> DataFrame:
    """SemDeDup candidate pairs: (cell, doc_a, doc_b, cos_sim) — the
    within-cluster near-duplicate graph edges."""
    # the cells frame feeds BOTH join sides — checkpoint it once (id +
    # vector + cell per doc; at corpus scale re-deriving the assignment
    # projection per side doubles the scan); dim comes free from the
    # centroids ivf_build already collected
    cells, centroids = _semantic_cells(corpus, id_col, vec_col,
                                       n_cells, n_iters)
    cells = cells.localCheckpoint(eager=True)
    return _pairs_within_cells(cells, threshold, len(centroids[0]))


def semantic_dedup(corpus: DataFrame, id_col: str, vec_col: str,
                   n_cells: int = 16, n_iters: int = 0,
                   threshold: float = 0.95,
                   max_iters: int = 20) -> DataFrame:
    """SemDeDup: one row per document — (id, cell, cluster, keep).

    Within-cell cosine pairs ≥ ``threshold`` → connected components →
    per duplicate group the member with the LARGEST centroid distance
    keeps (ties: id desc — the ``dedup_clusters`` quality convention);
    every unpaired document is a singleton keeper. ``df.where(~keep)``
    is the semantic drop list."""
    from .dedup import dedup_clusters

    # three consumers (pair side a, pair side b, the keeper base) —
    # checkpoint the per-doc assignment once; dim comes free from the
    # collected centroids
    cells, centroids = _semantic_cells(corpus, id_col, vec_col,
                                       n_cells, n_iters)
    cells = cells.localCheckpoint(eager=True)
    pairs = _pairs_within_cells(cells, threshold, len(centroids[0]))
    base = cells.select(F.col("corpus_id").alias(id_col), "cell",
                        "centroid_dist")
    clustered = dedup_clusters(
        base.select(id_col, "centroid_dist"), id_col, pairs,
        max_iters=max_iters, quality_col="centroid_dist")
    return (clustered.join(base.select(id_col, "cell"), on=id_col)
            .select(id_col, "cell", "cluster", "keep"))


def quantized_topk(df: DataFrame, id_col: str, vec_col: str,
                   query_vector: list, k: int = 10,
                   prefilter_k: int = 50) -> DataFrame:
    """Two-stage top-k by cosine: an int8-quantized dot-product
    prefilter picks ``prefilter_k`` candidates (one scan of the 4×
    smaller quantized projection, TakeOrdered — no corpus shuffle),
    then the ≤prefilter_k survivors re-rank by EXACT cosine (one
    broadcast semi-join back to the full vectors). Returns
    (id, cos_sim, rank)."""
    from pyspark.sql.window import Window

    qv = np.asarray(query_vector, dtype="float64")
    m = float(np.abs(qv).max())
    qq = [int(np.floor(x * 127.0 / m + 0.5)) if m > 0 else 0
          for x in qv.tolist()]
    quant = quantize_embeddings(df, id_col, vec_col)
    qlit = _lit_vec(qq)
    approx = (quant.select(
        F.col(id_col),
        (F.zip_with("qvec", qlit, lambda a, b: a.cast("double") * b)
         .cast("array<double>")).alias("_p"),
        "scale")
        .select(F.col(id_col),
                (F.aggregate("_p", F.lit(0.0), lambda acc, x: acc + x)
                 * F.col("scale")).alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc(id_col)).limit(prefilter_k))
    cand = df.join(F.broadcast(approx.select(id_col)), on=id_col,
                   how="left_semi")
    exact = cand.select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)),
                       _lit_vec(qv.tolist())), 6)
        .alias("cos_sim"))
    w = Window.orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (exact.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
