"""Similarity search over an embedding column (``array<float>``).

BASELINE.json north-star extension (the reference has no vector surface).
Two tiers:

- ``cosine_topk``          — exact brute-force top-k: broadcast the query
                             set, one pass over the corpus, per-task heaps
                             via TakeOrdered/window. The correctness
                             baseline and perfectly adequate when
                             |queries| × dim is broadcastable.
- ``cosine_topk_lsh``      — random-hyperplane LSH (sign-pattern buckets,
                             multi-probe by Hamming-adjacent buckets): the
                             scale path — candidate set shrinks ~2^bits,
                             recall traded explicitly.
- ``cosine_topk_ivf``      — IVF-flat: assign every vector to its nearest
                             of ``n_cells`` coarse centroids (inverted
                             lists), probe the query's top ``nprobe``
                             cells, exact-score within. Deterministic
                             centroid choice (lowest-id corpus vectors) so
                             an external SQL engine can replay the exact
                             partitioning — swap in k-means centroids for
                             production recall.

All vector math is native (``F.zip_with`` + ``F.aggregate`` fold, i.e.
JVM-side) — no pandas UDF in the scoring loop.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-to-right fold (deterministic order, double math)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast(queries) × corpus → score → rank per query. The join is
    a BroadcastNestedLoopJoin by construction (no equi-key), which is the
    right physical plan: every corpus partition scores all queries in one
    pass. Self-matches (same id) are excluded. Ties break on neighbor id
    (ascending) for determinism.

    Returns (query_id, neighbor_id, cosine, rank), rank in 1..k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def hyperplane_bucket(vec: Column, bits: int, seed: int, dim: int = 64) -> Column:
    """Sign-pattern bucket id: bit j = sign(vec · hⱼ) for seeded Gaussian
    hyperplanes. Deterministic given (seed, dim, bits)."""
    planes = _hyperplanes(dim, bits, seed)
    acc = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        h = F.array(*[F.lit(x) for x in plane])
        acc = acc + F.when(dot(vec, h) >= 0, 1 << j).otherwise(0)
    return acc


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    probe_hamming: int = 1,
    seed: int = 11,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only candidates whose hyperplane bucket is
    within ``probe_hamming`` bits of the query's bucket (multi-probe LSH).

    The bucket equi-join replaces the nested-loop scan: corpus hashes once,
    queries explode to (1 + bits·probe) probe buckets, and the join is a
    plain shuffled/broadcast hash join on bucket id. Recall < 1 by design;
    measure against ``cosine_topk`` (tests do).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        hyperplane_bucket(F.col(vec_col), bits, seed, dim).alias("_bkt"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        hyperplane_bucket(F.col(vec_col), bits, seed, dim).alias("_qbkt"),
    )
    # probe set: own bucket + every bucket within Hamming distance probe_hamming
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << j for j in range(bits)]
    if probe_hamming >= 2:
        masks += [(1 << i) | (1 << j) for i in range(bits) for j in range(i + 1, bits)]
    probes = [F.col("_qbkt").bitwiseXOR(F.lit(m)) for m in masks]
    q = q.withColumn("_probe", F.explode(F.array(*probes)))

    scored = (
        c.join(F.broadcast(q), c["_bkt"] == q["_probe"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_iters: int = 5,
    seed: int = 13,
) -> list[list[float]]:
    """Seeded fixed-iteration spherical k-means — the production centroid
    story for :func:`cosine_topk_ivf` (lowest-id centroids are a
    determinism device for oracles, not a recall story).

    Spherical variant because the index metric is cosine: vectors are
    L2-normalized, assignment is argmax dot, the cell update is the mean
    of assigned unit vectors re-normalized. Every step is distributed:

    - assignment — one vectorized pandas_udf pass (centroid matrix rides
      the closure: n_cells × dim doubles);
    - update — ``applyInPandas`` per cell (n_cells bounded groups, numpy
      column means inside);
    - driver traffic per iteration — exactly the n_cells × dim centroid
      table, nothing corpus-sized.

    Determinism: seeds are the ``n_cells`` corpus rows with the smallest
    md5(seed ‖ id); iterations are a fixed count (no convergence test →
    no data-dependent control flow); numpy means accumulate in a fixed
    order. Empty cells keep their previous centroid.
    """
    seeds = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn(
            "_h", F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("_id").cast("string")))
        )
        .orderBy("_h", "_id")
        .limit(n_cells)
        .collect()
    )
    C = np.array(
        [np.asarray(r["_v"], dtype=np.float64) for r in seeds]
    )  # (cells, dim)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    vecs = corpus.select(F.col(vec_col).alias("_v"))
    for _ in range(n_iters):
        Cb = C.copy()

        @F.pandas_udf(T.IntegerType())
        def _assign(vs: pd.Series) -> pd.Series:
            V = np.array([np.asarray(v, dtype=np.float64) for v in vs])
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax(V @ Cb.T, axis=1).astype("int32"))

        def _cell_mean(pdf: pd.DataFrame) -> pd.DataFrame:
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            return pd.DataFrame(
                {"_cell": [int(pdf["_cell"].iloc[0])], "_mean": [V.mean(axis=0)]}
            )

        means = (
            vecs.withColumn("_cell", _assign(F.col("_v")))
            .groupBy("_cell")
            .applyInPandas(_cell_mean, "_cell int, _mean array<double>")
            .collect()
        )
        for r in means:
            C[r["_cell"]] = np.asarray(r["_mean"], dtype=np.float64)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return [[float(x) for x in row] for row in C]


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF-flat (inverted-file) partitioning.

    Index build = one narrow pass: score every vector against the
    ``n_cells`` centroids (a driver-side constant — centroids are the
    corpus rows with the ``n_cells`` smallest ids, deterministic and tiny)
    and keep the argmax cell. Queries explode to their top-``nprobe``
    cells; a plain equi-join on cell id replaces the nested-loop scan, so
    the scored candidate set shrinks ~``nprobe / n_cells``.

    Scale: the centroid table is O(n_cells × dim) and rides the closure;
    the corpus pass is embarrassingly parallel; the join shuffles on an
    int key with bounded per-cell lists. ``nprobe = n_cells`` degenerates
    to exact search (tests pin this). Ties (exact-duplicate vectors) break
    toward the lower centroid index / neighbor id, matching the SQL
    oracle's ``ORDER BY s DESC, cid ASC``.

    Returns (query_id, neighbor_id, cosine, rank), rank in 1..k.

    ``centroids``: pass :func:`ivf_kmeans_centroids` output for trained
    cells (the recall path). Default ``None`` keeps the deterministic
    lowest-id-row centroids an external SQL oracle can replay.
    """
    if centroids is None:
        cent_rows = sorted(
            corpus.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(n_cells)
            .collect(),
            key=lambda r: r[id_col],
        )
        cent_vecs = [[float(x) for x in r[vec_col]] for r in cent_rows]
    else:
        cent_vecs = [[float(x) for x in v] for v in centroids[:n_cells]]
    cents = []
    for j, vec in enumerate(cent_vecs):
        acc = 0.0
        for x in vec:
            acc += x * x
        cents.append((j, vec, math.sqrt(acc)))

    # Scaled centroid scores as one vectorized pandas_udf: the interpreted
    # HOF dot costs ~n_cells× a single cosine, which made assignment pricier
    # than the brute-force scan it replaces at small scale. The numpy form
    # accumulates dimension-by-dimension (a Python loop over dims, each step
    # a fused batch op) — the SAME left-to-right IEEE addition order as the
    # F.aggregate fold, so cell choices and the SQL oracle stay bit-exact.
    C = np.array([vec for _, vec, _ in cents], dtype=np.float64)  # (cells, dim)
    CN = np.array([cn for _, _, cn in cents], dtype=np.float64)  # (cells,)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _scores_udf(vs: pd.Series) -> pd.Series:
        V = np.array([np.asarray(v, dtype=np.float64) for v in vs])  # (n, dim)
        acc = np.zeros((V.shape[0], C.shape[0]))
        for dim in range(C.shape[1]):
            acc += V[:, dim, None] * C[None, :, dim]
        acc /= CN[None, :]
        return pd.Series(list(acc))

    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            _scores_udf(F.col(vec_col)).alias("_s"),
        )
        .withColumn(
            "_cell",
            (F.array_position(F.col("_s"), F.array_max("_s")) - 1).cast("int"),
        )
        .drop("_s")
    )

    # top-nprobe probe cells per query: sort (score, -index) structs desc —
    # lexicographic struct order gives score desc then index asc on ties
    def probe_structs(scores: Column) -> Column:
        return F.sort_array(
            F.array(
                *[
                    F.struct(
                        F.element_at(scores, j + 1).alias("s"),
                        F.lit(-j).alias("nj"),
                    )
                    for j in range(len(cents))
                ]
            ),
            asc=False,
        )

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            _scores_udf(F.col(vec_col)).alias("_s"),
        )
        .withColumn("_probe", F.explode(F.slice(probe_structs(F.col("_s")), 1, nprobe)))
        .select("query_id", "_qv", (-F.col("_probe.nj")).cast("int").alias("_cell"))
    )

    scored = (
        c.join(F.broadcast(q), "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Embedding whitening (PCA): distributed moments, bounded driver eigensolve
# ---------------------------------------------------------------------------


def embedding_whiten(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 1e-6,
    out_col: str = "whitened",
) -> DataFrame:
    """PCA-whiten an embedding column: x → Λ^(−1/2) Vᵀ (x − μ), making the
    output covariance ≈ I. The standard retrieval-quality transform
    (whitening / de-correlation before cosine — cf. "Whitening Sentence
    Representations", su et al.) expressed Spark-first:

    1. per-PARTITION moment matrices via ``mapInPandas`` — each task emits
       ONE flattened (count, Σx, ΣxxT) row computed as a vectorized numpy
       Gram product, so the shuffle carries partitions×(dim²+dim+1)
       values, never the data;
    2. one tiny aggregate sums those rows (columnar ``F.sum`` over the
       flattened arrays via ``posexplode`` — bounded by dim², runs
       anywhere);
    3. the dim×dim eigensolve happens ONCE driver-side (numpy ``eigh`` on
       a symmetric matrix — O(dim³) on ≤ a few thousand dims is
       microseconds) and ships back as a broadcast literal;
    4. projection is one more vectorized ``mapInPandas`` pass.

    Nothing driver-sized ever moves except the dim×dim matrix — the same
    bounded-traffic contract as the IVF k-means trainer.
    """
    import numpy as np

    def moments(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            yield pd.DataFrame(
                {
                    "n": [float(len(X))],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    part = df.select(vec_col).mapInPandas(
        moments, "n double, s array<double>, g array<double>"
    )
    # sum the per-partition rows columnar-wise: explode position-wise and
    # re-aggregate (rows are O(num_partitions) — trivially small)
    totals = part.select(
        "n", F.posexplode(F.concat(F.col("s"), F.col("g"))).alias("i", "v")
    ).groupBy("i").agg(F.sum("v").alias("v"), F.sum(F.when(F.col("i") == 0, F.col("n"))).alias("_n"))
    rows = totals.collect()
    if not rows:
        raise ValueError("embedding_whiten: empty input")
    n_total = sum(r["_n"] for r in rows if r["_n"] is not None)
    flat = [0.0] * len(rows)
    for r in rows:
        flat[r["i"]] = r["v"]
    # infer dim from quadratic: len = dim + dim^2
    dim = int((-1 + (1 + 4 * len(flat)) ** 0.5) / 2)
    s = np.array(flat[:dim])
    G = np.array(flat[dim:]).reshape(dim, dim)
    mu = s / n_total
    cov = G / n_total - np.outer(mu, mu)
    w, V = np.linalg.eigh(cov)
    W = V @ np.diag(1.0 / np.sqrt(np.maximum(w, eps))) @ V.T  # ZCA form
    W_list = W.tolist()
    mu_list = mu.tolist()

    def project(it):
        Wm = np.array(W_list)
        mv = np.array(mu_list)
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Y = (X - mv) @ Wm.T
            out = pdf[[id_col]].copy()
            out[out_col] = [y.tolist() for y in Y]
            yield out

    return df.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, {out_col} array<double>"
    )


def whiten_covariance_probe(
    df: DataFrame,
    vec_col: str = "whitened",
    round_to: int = 6,
) -> DataFrame:
    """Population-covariance probe over a vector column, emitted as
    (i, j, cov_ij, n_vectors) rows — the driver-checkable INVARIANT of
    :func:`embedding_whiten`: cov(whitened) == I, so the oracle predicts
    the identity matrix without replaying the eigensolve (the pattern of
    the geo/ipv6 "predictive oracles").

    Distributed shape: each row contributes one concatenated array
    [1, x, vec(x xᵀ)] (count slot, first moment, flattened Gram — built
    with array HOFs, no UDF), one posexplode + groupBy(pos) sums them
    columnar-wise, and the dim+dim²-row result is reshaped to (i, j)
    entries by joining the Gram slots to the two mean slots. The shuffle
    carries dim²-sized aggregates, never vectors — the same
    bounded-traffic contract as the whitening trainer itself.

    ``round_to`` collapses float eigensolve noise (~1e-12) to exact
    0/1; adding 0.0 normalizes IEEE −0.0 from tiny negatives.
    """
    w = F.col(vec_col)
    arr = F.concat(
        F.array(F.lit(1.0)),
        w,
        F.flatten(F.transform(w, lambda x: F.transform(w, lambda y: x * y))),
    )
    sums = (
        df.select(F.posexplode(arr).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
    )
    # pos layout: 0 -> n; 1..dim -> sums; dim+1.. -> flattened Gram.
    # max(pos) = dim + dim**2, so dim recovers as (-1+sqrt(1+4*mx))/2.
    meta = sums.agg(
        F.max("pos").alias("mx"),
        F.sum(F.when(F.col("pos") == 0, F.col("v"))).alias("n"),
    ).select(
        F.floor((F.sqrt(1.0 + 4.0 * F.col("mx")) - 1.0) / 2.0)
        .cast("long")
        .alias("dim"),
        F.col("n"),
    )
    g = (
        sums.crossJoin(F.broadcast(meta))
        .filter(F.col("pos") > F.col("dim"))
        .select(
            ((F.col("pos") - F.col("dim") - 1) / F.col("dim"))
            .cast("long")
            .alias("i"),
            ((F.col("pos") - F.col("dim") - 1) % F.col("dim")).alias("j"),
            (F.col("v") / F.col("n")).alias("exy"),
            F.col("n"),
        )
    )
    means = (
        sums.crossJoin(F.broadcast(meta))
        .filter((F.col("pos") >= 1) & (F.col("pos") <= F.col("dim")))
        .select(
            (F.col("pos") - 1).alias("k"), (F.col("v") / F.col("n")).alias("m")
        )
    )
    mi = means.select(F.col("k").alias("i"), F.col("m").alias("m_i"))
    mj = means.select(F.col("k").alias("j"), F.col("m").alias("m_j"))
    return (
        g.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                F.round(F.col("exy") - F.col("m_i") * F.col("m_j"), round_to)
                + F.lit(0.0)
            ).alias("cov_ij"),
            F.col("n").cast("long").alias("n_vectors"),
        )
    )


def embedding_quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4× memory
    compression before ANN serving: scale = max|xᵢ| / 127, qᵢ =
    round(xᵢ/scale) ∈ [−127, 127], reconstruction x̂ᵢ = qᵢ·scale.

    Pure array-HOF codegen (no UDF, no shuffle — a scan projection), so
    it composes under any downstream op and the DuckDB oracle replays
    the arithmetic exactly. Emits (id, q array<int>, scale, mse) where
    mse is the per-vector reconstruction error — the quality probe a
    100 TB quantization job reports per shard. All-zero vectors get
    scale 0 and q = zeros (mse 0).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = maxabs / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale > 0.0, F.round(x / scale).cast("int"))
        .otherwise(F.lit(0)),
    )
    err = F.zip_with(
        v, q, lambda x, qq: (x - qq.cast("double") * scale) ** F.lit(2.0)
    )
    mse = F.aggregate(err, F.lit(0.0), lambda a, x: a + x) / F.size(v).cast(
        "double"
    )
    return df.select(
        F.col(id_col),
        q.alias("q"),
        scale.alias("scale"),
        mse.alias("mse"),
    )
