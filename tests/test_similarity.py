"""ANN operators vs numpy oracles on the driver-provided embeddings table."""

import numpy as np
import pytest

from share_spark import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    pdf = df.toPandas()
    return df, pdf


def _numpy_topk(pdf, qvec, k):
    mat = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    ids = pdf["vec_id"].to_numpy()
    order = np.lexsort((ids, -np.round(cos, 6)))
    return [(int(ids[i]), round(float(cos[i]), 6)) for i in order[:k]]


def test_bruteforce_matches_numpy(emb):
    df, pdf = emb
    qvec = [float(x) for x in pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0]]
    got = [(r["vec_id"], r["cos"]) for r in similarity.knn_bruteforce(df, qvec, k=10).collect()]
    want = _numpy_topk(pdf, qvec, 10)
    assert got == want
    assert got[0][0] == 0 and abs(got[0][1] - 1.0) < 1e-9  # self is nearest


def test_lsh_buckets_are_deterministic(emb):
    df, _ = emb
    b1 = {r["vec_id"]: r["lsh_bucket"] for r in similarity.lsh_signature(df, 8).collect()}
    b2 = {r["vec_id"]: r["lsh_bucket"] for r in similarity.lsh_signature(df, 8).collect()}
    assert b1 == b2
    assert all(0 <= v < 256 for v in b1.values())
    assert len(set(b1.values())) > 1  # actually partitions the space


def test_lsh_knn_recall(emb):
    df, pdf = emb
    qvec = [float(x) for x in pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0]]
    exact = {v for v, _ in _numpy_topk(pdf, qvec, 10)}
    approx = {
        r["vec_id"] for r in similarity.knn_lsh(df, qvec, k=10, n_planes=4).collect()
    }
    assert 0 in approx  # self always lands in its own bucket
    # hamming-1 multiprobe recall@10 on 500 weakly-clustered vectors:
    # 4 planes -> ~5/16 of the table probed, measured recall 6/10
    assert len(exact & approx) >= 4


def test_all_pairs_above_verifies_cosine(emb):
    df, pdf = emb
    out = similarity.all_pairs_above(df, threshold=0.95, n_planes=4).collect()
    mat = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    for r in out:
        a, b = mat[r["vec_a"]], mat[r["vec_b"]]
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert abs(cos - r["cos"]) < 1e-5
        assert r["cos"] >= 0.95
        assert r["vec_a"] < r["vec_b"]


def test_lsh_signature_udf_path_matches_expression_path(spark):
    """The broadcast-matrix pandas-UDF strategy (production dims) must
    assign the same buckets as the literal-folded expression strategy."""
    import numpy as np

    from share_spark.similarity import lsh_signature

    rng = np.random.default_rng(11)
    pdf = [(int(i), [float(x) for x in rng.normal(size=24)]) for i in range(200)]
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    expr = {
        r["vec_id"]: r["lsh_bucket"]
        for r in lsh_signature(emb, n_planes=6, force_udf=False).collect()
    }
    udf = {
        r["vec_id"]: r["lsh_bucket"]
        for r in lsh_signature(emb, n_planes=6, force_udf=True).collect()
    }
    assert expr == udf


def test_lsh_signature_large_dim_defaults_to_udf(spark):
    """n_planes*dim past the literal budget must not explode the plan —
    and must still produce valid buckets."""
    import numpy as np

    from share_spark.similarity import lsh_signature

    rng = np.random.default_rng(12)
    dim = 512
    pdf = [(int(i), [float(x) for x in rng.normal(size=dim)]) for i in range(50)]
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    out = lsh_signature(emb, n_planes=16).collect()  # 8192 > budget
    assert len(out) == 50
    assert all(0 <= r["lsh_bucket"] < (1 << 16) for r in out)


def test_ivf_search_recall_and_determinism(spark):
    import numpy as np

    from share_spark.similarity import (
        ivf_assign,
        ivf_fit,
        ivf_search,
        knn_bruteforce,
    )

    rng = np.random.default_rng(21)
    # clustered data so IVF has real structure
    centers = rng.normal(size=(6, 16)) * 5
    rows = []
    for i in range(600):
        c = centers[i % 6]
        rows.append((i, [float(x) for x in c + rng.normal(size=16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    C = ivf_fit(emb, n_lists=8, n_iters=4)
    C2 = ivf_fit(emb, n_lists=8, n_iters=4)
    np.testing.assert_array_equal(C, C2)  # deterministic fit

    assigned = ivf_assign(emb, C).cache()
    counts = assigned.groupBy("ivf_list").count().collect()
    assert len(counts) >= 6  # clusters actually used

    q = rows[7][1]
    exact = [r["vec_id"] for r in knn_bruteforce(emb, q, k=10).collect()]
    got = [r["vec_id"] for r in ivf_search(assigned, C, q, k=10, n_probe=3).collect()]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.8, (recall, got, exact)
    # full probe == brute force exactly
    full = [r["vec_id"] for r in ivf_search(assigned, C, q, k=10, n_probe=8).collect()]
    assert full == exact


def test_ivf_fit_sample_unbiased_on_clustered_ids(spark):
    """Quantizer-sample bias: ids 0..199 are cluster A (+10 in dim 0), ids
    200..399 cluster B (-10). A smallest-ids sample of 100 rows sees ONLY
    cluster A and underfits (no centroid near B); the seeded-hash sample
    draws uniformly across the id space and represents both clusters, so
    assignment stays balanced (bounded probe cost)."""
    import numpy as np

    from share_spark.similarity import ivf_assign, ivf_fit

    def vec(i, center):
        j = ((i * 37) % 100) / 100.0
        return [center + j, j, -j, 0.5 * j]

    rows = [(i, vec(i, 10.0)) for i in range(200)] + [
        (200 + i, vec(i, -10.0)) for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    C = ivf_fit(emb, n_lists=4, sample_rows=100)
    assert (C[:, 0] > 5).any() and (C[:, 0] < -5).any()  # both clusters seen

    # the biased alternative: a fit that only ever sees the head of the id
    # space (what orderBy(vec_id).limit() did) misses cluster B entirely
    C_bias = ivf_fit(emb.filter("vec_id < 100"), n_lists=4, sample_rows=100)
    assert not (C_bias[:, 0] < -5).any()

    sizes = [r["count"] for r in
             ivf_assign(emb, C).groupBy("ivf_list").count().collect()]
    assert max(sizes) < 400  # not one degenerate giant list
