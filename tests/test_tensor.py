"""Thin tensor facade tests (SURVEY §2.9 scope)."""

import numpy as np

from mars_spark import tensor as mt


def test_rand_shapes(spark):
    out = mt.rand(1000, seed=1).toPandas()
    assert len(out) == 1000 and 0 <= out.x.min() and out.x.max() < 1
    rn = mt.randn(1000, seed=1).toPandas()
    assert abs(rn.x.mean()) < 0.2
    ri = mt.randint(1000, 5, 10, seed=1).toPandas()
    assert set(ri.x.unique()) <= {5, 6, 7, 8, 9}


def test_random_vectors_deterministic(spark):
    a = mt.random_vectors(50, 8, seed=7).toPandas().sort_values("id")
    b = mt.random_vectors(50, 8, seed=7, num_partitions=13).toPandas().sort_values("id")
    # partitioning must not change values (hash-seeded, unlike F.rand)
    np.testing.assert_allclose(np.stack(a.vec.values), np.stack(b.vec.values))


def test_percentile_histogram(spark, pdf_numeric):
    import mars_spark as ms

    f = ms.from_pandas(pdf_numeric).to_spark()
    p = mt.percentile(f, "a", [0.25, 0.5, 0.75])
    exp = np.percentile(pdf_numeric.a, [25, 50, 75])
    np.testing.assert_allclose(p, exp, atol=1e-9)
    h = mt.histogram(f, "a", bins=5)
    assert sum(n for _, _, n in h) == len(pdf_numeric)


def test_svd_recovers_rank(spark, rng):
    import pandas as pd
    import mars_spark as ms

    base = rng.standard_normal((300, 2))
    mat = base @ rng.standard_normal((2, 6))  # rank-2, 6-dim
    pdf = pd.DataFrame({"v": [list(map(float, r)) for r in mat]})
    sdf = ms.from_pandas(pdf).to_spark()
    s, _ = mt.svd(sdf, "v", k=4)
    assert s[0] > 0 and s[1] > 0
    assert s[2] / s[0] < 1e-6  # rank 2 → 3rd singular value ~0


def test_matmul_cholesky_qr(spark):
    import numpy as np
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(9)
    A = rng.standard_normal((60, 5))
    pdf = pd.DataFrame({"rid": range(60),
                        "v": [list(map(float, r)) for r in A]})
    sdf = spark.createDataFrame(pdf)

    B = rng.standard_normal((5, 3))
    got = (Tn.matmul(sdf, "v", B, out_col="y").toPandas()
           .sort_values("rid").reset_index(drop=True))
    np.testing.assert_allclose(np.vstack(got.y.to_numpy()), A @ B,
                               rtol=1e-12)

    qdf, R = Tn.qr(sdf, "v")
    Q = np.vstack(qdf.toPandas().sort_values("rid").q.to_numpy())
    # R upper-triangular, A = QR, Q orthonormal
    assert np.allclose(R, np.triu(R))
    np.testing.assert_allclose(Q @ R, A, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(Q.T @ Q, np.eye(5), atol=1e-9)

    # precomputed-gram path produces the identical factorization
    g = Tn.gramian(sdf, "v")
    np.testing.assert_allclose(g, A.T @ A, rtol=1e-9, atol=1e-9)
    qdf2, R2 = Tn.qr(sdf, "v", gram=g)
    np.testing.assert_allclose(R2, R, rtol=1e-12)
    Q2 = np.vstack(qdf2.toPandas().sort_values("rid").q.to_numpy())
    np.testing.assert_allclose(Q2, Q, rtol=1e-12)


def test_gramian_empty_frame(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    pdf = pd.DataFrame({"rid": [1], "v": [[1.0, 2.0]]})
    sdf = spark.createDataFrame(pdf).filter("rid < 0")
    assert Tn.gramian(sdf, "v") is None
