"""Approximate-nearest-neighbor search over an embedding column.

Operators over an embeddings table (vec_id long, embedding array<float>):

- brute-force cosine top-k (the exactness baseline): higher-order array
  functions (zip_with + aggregate) keep the dot product JVM-side — no UDF,
  no Python. O(N) per query; correct at any scale but a full scan.
- LSH-bucketed ANN (the scale path): random-hyperplane signatures with
  deterministic md5-derived plane weights (+-1 per (plane, dim)), bucket
  join, exact re-rank within bucket. Sub-linear candidate sets at the cost
  of recall; multiprobe (hamming-1 buckets) recovers most of it.
- IVF-style variant: coarse k-means-free partitioning by signature prefix,
  same mechanics.

Plane weights are pseudo-random but deterministic ACROSS ENGINES (md5-based),
so the LSH assignment itself is oracle-checkable in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dots(a: Column, b: Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_to_query(embeddings: DataFrame, query_vec: list[float]) -> DataFrame:
    """Add `cos` = cosine(embedding, query_vec) — one map stage, codegen'd."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    return embeddings.withColumn(
        "cos", _dots(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qn))
    )


def knn_bruteforce(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine. orderBy().limit() lowers to TakeOrdered:
    per-partition heaps + a single driver merge of k rows per partition —
    the correct distributed top-k at any N."""
    return (
        cosine_to_query(embeddings, query_vec)
        .select("vec_id", F.round("cos", 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def _plane_weight(p: int, d: int) -> float:
    """Deterministic +-1 weight for (plane, dim): md5-derived so the same
    plane set is reproducible in ANY engine (the DuckDB oracle computes
    identical signatures)."""
    import hashlib

    h = hashlib.md5(f"p{p}#{d}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) % 2 == 0 else -1.0


def _plane_matrix(n_planes: int, dim: int) -> "np.ndarray":
    return np.array(
        [[_plane_weight(p, d) for d in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )


# past this many plan literals, fold weights into a broadcast numpy matrix
# instead of the Catalyst expression tree (dim 1024 x 64 planes = 65k
# literals would explode analysis/codegen time)
_LSH_LITERAL_BUDGET = 2048


def lsh_signature(
    embeddings: DataFrame,
    n_planes: int = 8,
    vec_col: str = "embedding",
    force_udf: bool | None = None,
) -> DataFrame:
    """Random-hyperplane signature: bit p = 1 if sum_d w(p,d)*v[d] >= 0,
    with w(p,d) = +1 if md5('p{p}#{d}') first hex digit is even else -1.

    Two physical strategies, same logical result:
    - small n_planes*dim: transform+aggregate with literal weights — pure
      JVM, whole-stage codegen, sequential fold (bit-matches the DuckDB
      oracle's sum order).
    - large n_planes*dim: Arrow-batched pandas UDF with the weight matrix in
      the UDF closure (one numpy matmul per batch) — production embedding
      dims never enter the Catalyst plan.
    """
    dim_probe = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_probe["d"])
    use_udf = (
        force_udf
        if force_udf is not None
        else (n_planes * dim > _LSH_LITERAL_BUDGET)
    )

    if use_udf:
        W = _plane_matrix(n_planes, dim).T  # (dim, n_planes)
        shifts = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

        @F.pandas_udf("long")
        def _sig(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype="int64")
            M = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
            bits = (M @ W) >= 0.0
            return pd.Series((bits * shifts).sum(axis=1).astype(np.int64))

        return embeddings.withColumn("lsh_bucket", _sig(F.col(vec_col)))

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        weights = F.array(*[F.lit(_plane_weight(p, d)) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), weights, lambda x, ww: x.cast("double") * ww),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return embeddings.withColumn("lsh_bucket", sig)


def knn_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN: hash the query, scan only its bucket (plus hamming-1 buckets when
    multiprobe), exact cosine re-rank inside. At 10^12 vectors the bucket
    filter prunes ~2^-n_planes of the table at the parquet scan (cluster the
    table by lsh_bucket so min/max stats skip row groups)."""
    import hashlib

    dim = len(query_vec)

    def w(p: int, d: int) -> float:
        h = hashlib.md5(f"p{p}#{d}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 0 else -1.0

    qsig = 0
    for p in range(n_planes):
        proj = sum(w(p, d) * float(query_vec[d]) for d in range(dim))
        if proj >= 0:
            qsig |= 1 << p
    buckets = [qsig]
    if multiprobe:
        buckets += [qsig ^ (1 << p) for p in range(n_planes)]
    hashed = lsh_signature(embeddings, n_planes)
    cand = hashed.filter(F.col("lsh_bucket").isin(buckets))
    return knn_bruteforce(cand, query_vec, k)


def ivf_fit(
    embeddings: DataFrame,
    n_lists: int = 16,
    n_iters: int = 5,
    sample_rows: int = 4096,
    vec_col: str = "embedding",
    sample_seed: str = "ivf",
) -> "np.ndarray":
    """IVF coarse quantizer: k-means centroids fit on a bounded sample.

    Deterministic AND unbiased: the sample is the `sample_rows` smallest
    xxhash64(seed || vec_id) values — a seeded hash-order TakeOrdered, so
    the quantizer sees a uniform slice of the id space (smallest-ids
    sampling would underfit any distribution correlated with insert order:
    time-clustered embeddings, per-source id ranges). Init = the first
    n_lists sample vectors, Lloyd iterations in float64. The sample is
    bounded regardless of N — at 10^12 vectors the fit cost is constant;
    only assignment scans the table. Returns the (n_lists, dim) centroid
    matrix (broadcast it)."""
    rows = (
        embeddings.select("vec_id", vec_col)
        .orderBy(
            F.xxhash64(F.concat(F.lit(sample_seed), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(sample_rows)
        .collect()
    )
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    k = min(n_lists, len(X))
    C = X[:k].copy()
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def ivf_assign(
    embeddings: DataFrame, centroids: "np.ndarray", vec_col: str = "embedding"
) -> DataFrame:
    """Add `ivf_list` = nearest-centroid index, via an Arrow-batched pandas
    UDF with the centroid matrix in the closure (one numpy matmul per
    batch). At rest, cluster/sort the table by ivf_list so probes prune
    parquet row groups — the same storage trick as the LSH bucket column."""
    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C**2).sum(axis=1)

    @F.pandas_udf("int")
    def _nearest(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        M = np.stack(v.to_numpy()).astype(np.float64)
        # argmin ||x - c||^2 = argmin (c.c - 2 x.c), x.x constant per row
        scores = c_sq[None, :] - 2.0 * (M @ C.T)
        return pd.Series(scores.argmin(axis=1).astype(np.int32))

    return embeddings.withColumn("ivf_list", _nearest(F.col(vec_col)))


def ivf_search(
    assigned: DataFrame,
    centroids: "np.ndarray",
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN: rank centroids by distance to the query, scan only the
    `n_probe` nearest inverted lists, exact cosine re-rank inside. Recall
    rises with n_probe (n_probe = n_lists degenerates to brute force)."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((C - q[None, :]) ** 2).sum(axis=1)).argsort()
    probes = [int(x) for x in order[:n_probe]]
    cand = assigned.filter(F.col("ivf_list").isin(probes))
    return knn_bruteforce(cand, query_vec, k)


def all_pairs_above(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    materialize: bool = True,
    broadcast_threshold: int = 200_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH bucket join + exact cosine
    verify >= threshold. The join is within-bucket only — the all-pairs
    O(N^2) never materializes.

    ``materialize=True`` computes the hashed frame once (the self-join
    would otherwise evaluate the signature subtree for both sides) and
    respreads it (a checkpointed small frame coalesces to one partition
    under AQE, serializing the within-bucket pair generation); under
    ``broadcast_threshold`` rows the build side broadcasts — embedding
    rows are wide (the vector rides along for the cosine), hence the
    lower threshold than the minhash band join. Same at-scale opt-out
    rationale as textops.minhash_lsh_pairs."""
    hashed = lsh_signature(embeddings, n_planes).select(
        "vec_id", "embedding", "lsh_bucket"
    )
    build = None
    if materialize:
        hashed = hashed.repartition(
            embeddings.sparkSession.sparkContext.defaultParallelism
        ).localCheckpoint()
        if hashed.count() <= broadcast_threshold:
            build = F.broadcast(hashed.alias("b"))
    a = hashed.alias("a")
    b = build if build is not None else hashed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (
            _dots(F.col("a.embedding"), F.col("b.embedding"))
            / (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding")))
        ).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= threshold).select(
        "vec_a", "vec_b", F.round("cos", 6).alias("cos")
    )
