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


def test_norm_vector_and_matrix(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(3)
    x = rng.standard_normal(200)
    A = rng.standard_normal((80, 4))
    sdf = spark.createDataFrame(pd.DataFrame({
        "rid": range(80), "s": x[:80],
        "v": [list(map(float, r)) for r in A]}))
    xs = x[:80]
    assert abs(Tn.norm(sdf, "s") - np.linalg.norm(xs)) < 1e-9
    assert abs(Tn.norm(sdf, "s", 1) - np.linalg.norm(xs, 1)) < 1e-9
    assert abs(Tn.norm(sdf, "s", float("inf"))
               - np.linalg.norm(xs, np.inf)) < 1e-12
    assert abs(Tn.norm(sdf, "v") - np.linalg.norm(A)) < 1e-9
    assert abs(Tn.norm(sdf, "v", "fro") - np.linalg.norm(A, "fro")) < 1e-9
    assert abs(Tn.norm(sdf, "v", 1) - np.linalg.norm(A, 1)) < 1e-9
    assert abs(Tn.norm(sdf, "v", float("inf"))
               - np.linalg.norm(A, np.inf)) < 1e-9
    assert abs(Tn.norm(sdf, "v", 2) - np.linalg.norm(A, 2)) < 1e-8
    assert abs(Tn.norm(sdf, "v", "nuc") - np.linalg.norm(A, "nuc")) < 1e-8


def test_lu_inv_solve(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(11)
    for n in (2, 3, 5):
        g = rng.standard_normal((n, n))
        P, L, U = Tn.lu(g)
        np.testing.assert_allclose(P @ L @ U, g, atol=1e-12)
        assert np.allclose(L, np.tril(L)) and np.allclose(U, np.triu(U))
        np.testing.assert_allclose(
            Tn.inv(g) @ g, np.eye(n), atol=1e-9)
        rhs = rng.standard_normal(n)
        np.testing.assert_allclose(Tn.solve(g, rhs),
                                   np.linalg.solve(g, rhs), atol=1e-9)

    # distributed least-squares solve: normal equations vs lstsq
    A = rng.standard_normal((120, 3))
    beta = np.array([2.0, -1.0, 0.5])
    b = A @ beta + 0.01 * rng.standard_normal(120)
    sdf = spark.createDataFrame(pd.DataFrame({
        "v": [list(map(float, r)) for r in A], "b": b}))
    x, G, atb = Tn.solve(sdf, vec_col="v", b_col="b", return_parts=True)
    np.testing.assert_allclose(G, A.T @ A, rtol=1e-9)
    np.testing.assert_allclose(atb, A.T @ b, rtol=1e-9)
    np.testing.assert_allclose(x, np.linalg.lstsq(A, b, rcond=None)[0],
                               atol=1e-8)

    # rank-deficient: constant zero feature must fall back to lstsq,
    # not raise (the r13 ADVICE OLS lesson, same contract here)
    A2 = A.copy()
    A2[:, 2] = 0.0
    sdf2 = spark.createDataFrame(pd.DataFrame({
        "v": [list(map(float, r)) for r in A2], "b": b}))
    x2 = Tn.solve(sdf2, vec_col="v", b_col="b")
    np.testing.assert_allclose(
        x2[:2], np.linalg.lstsq(A2, b, rcond=None)[0][:2], atol=1e-6)


def test_tensordot_forms(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(21)
    A = rng.standard_normal((60, 4))
    B2 = rng.standard_normal((60, 3))
    sdf = spark.createDataFrame(pd.DataFrame({
        "rid": range(60),
        "a": [list(map(float, r)) for r in A],
        "b": [list(map(float, r)) for r in B2]}))

    # column×column row-axis contraction (cross-gramian)
    got = Tn.tensordot(sdf, "a", "b", axes=([0], [0]))
    np.testing.assert_allclose(got, A.T @ B2, rtol=1e-9)
    got2 = Tn.tensordot(sdf, "a", "b", axes="rows")
    np.testing.assert_allclose(got2, A.T @ B2, rtol=1e-9)
    # gramian is the self special case
    np.testing.assert_allclose(Tn.tensordot(sdf, "a", "a", axes="rows"),
                               A.T @ A, rtol=1e-9)

    # matrix rhs delegates to matmul
    M = rng.standard_normal((4, 2))
    out = (Tn.tensordot(sdf, "a", M, axes=1, out_col="y").toPandas()
           .sort_values("rid"))
    np.testing.assert_allclose(np.vstack(out.y.to_numpy()), A @ M,
                               rtol=1e-12)

    # vector rhs: pure-JVM expression dot (no Python stage)
    c = rng.standard_normal(4)
    out1 = (Tn.tensordot(sdf, "a", c, axes=1, out_col="y").toPandas()
            .sort_values("rid"))
    np.testing.assert_allclose(out1.y.to_numpy(), A @ c, rtol=1e-12)

    import pytest

    with pytest.raises(NotImplementedError):
        Tn.tensordot(sdf, "a", "b", axes=1)
    with pytest.raises(NotImplementedError):
        Tn.tensordot(sdf, "a", np.zeros((2, 2, 2)), axes=1)


def test_randomized_svd_matches_exact(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(5)
    # decaying spectrum: rank-8 signal + small noise in 16 dims
    base = rng.standard_normal((400, 8)) * np.linspace(8, 1, 8)
    A = base @ rng.standard_normal((8, 16))
    A += 0.01 * rng.standard_normal(A.shape)
    sdf = spark.createDataFrame(pd.DataFrame({
        "v": [list(map(float, r)) for r in A]}))
    s_exact = np.linalg.svd(A, compute_uv=False)
    s, V = Tn.randomized_svd(sdf, "v", k=4, n_iter=2, seed=7)
    np.testing.assert_allclose(s, s_exact[:4], rtol=1e-4)
    # V columns orthonormal and deterministic for the seed
    np.testing.assert_allclose(V.T @ V, np.eye(4), atol=1e-8)
    s2, V2 = Tn.randomized_svd(sdf, "v", k=4, n_iter=2, seed=7)
    np.testing.assert_allclose(s, s2, rtol=0)
    np.testing.assert_allclose(V, V2, rtol=0)


def test_creation_analogs(spark):
    from mars_spark import tensor as Tn

    a = Tn.arange(10, name="v").toPandas().v.sort_values().tolist()
    assert a == list(range(10))
    a2 = Tn.arange(3, 12, 3, name="v").toPandas().v.sort_values().tolist()
    assert a2 == [3, 6, 9]

    ls = (Tn.linspace(0.0, 1.0, 5).toPandas()
          .sort_values("id").x.tolist())
    np.testing.assert_allclose(ls, np.linspace(0.0, 1.0, 5), atol=1e-12)
    le = (Tn.linspace(0.0, 1.0, 4, endpoint=False).toPandas()
          .sort_values("id").x.tolist())
    np.testing.assert_allclose(le, np.linspace(0.0, 1.0, 4,
                                               endpoint=False),
                               atol=1e-12)

    assert Tn.ones(7).toPandas().x.tolist() == [1.0] * 7
    assert Tn.zeros(4).toPandas().x.tolist() == [0.0] * 4
    assert Tn.full(3, 2.5).toPandas().x.tolist() == [2.5] * 3


def test_statistics_extras(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(13)
    x = rng.integers(0, 9, 200)
    w = rng.random(200) + 0.1
    sdf = spark.createDataFrame(pd.DataFrame({
        "v": x.astype("int64"), "w": w}))
    assert abs(Tn.average(sdf, "v") - x.mean()) < 1e-9
    assert abs(Tn.average(sdf, "v", "w") - np.average(x, weights=w)) < 1e-9
    assert Tn.ptp(sdf, "v") == np.ptp(x)
    assert Tn.bincount(sdf, "v") == list(np.bincount(x))
    assert Tn.bincount(sdf, "v", minlength=15) == list(
        np.bincount(x, minlength=15))

    bins = [2.0, 4.0, 7.0]
    got = (Tn.digitize(sdf, "v", bins).toPandas()
           .sort_index().bucket.to_numpy())
    # row order from toPandas isn't the pandas index order — compare
    # per-value (digitize is a pure function of v)
    vd = Tn.digitize(sdf, "v", bins).toPandas()
    exp = np.digitize(vd.v.to_numpy(), bins)
    np.testing.assert_array_equal(vd.bucket.to_numpy(), exp)
    vr = Tn.digitize(sdf, "v", bins, right=True).toPandas()
    np.testing.assert_array_equal(
        vr.bucket.to_numpy(), np.digitize(vr.v.to_numpy(), bins,
                                          right=True))


def test_spatial_facade(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    try:
        from scipy.spatial.distance import cdist as sp_cdist
        have_scipy = True
    except ImportError:
        have_scipy = False

    rng = np.random.default_rng(17)
    A = rng.standard_normal((30, 4))
    sdf = spark.createDataFrame(pd.DataFrame({
        "rid": range(30), "v": [list(map(float, r)) for r in A]}))
    Y = rng.standard_normal((3, 4))
    got = (Tn.cdist(sdf, "v", Y, "rid").toPandas()
           .sort_values(["rid", "y_idx"]))
    exp = np.sqrt(((A[:, None, :] - Y[None, :, :]) ** 2).sum(-1))
    np.testing.assert_allclose(
        got.dist.to_numpy().reshape(30, 3), exp, rtol=1e-9)
    if have_scipy:
        np.testing.assert_allclose(got.dist.to_numpy().reshape(30, 3),
                                   sp_cdist(A, Y), rtol=1e-9)

    for metric in ("euclidean", "sqeuclidean", "cityblock", "cosine"):
        pz = (Tn.pdist(sdf, "rid", "v", metric=metric).toPandas()
              .sort_values(["id_i", "id_j"]))
        assert len(pz) == 30 * 29 // 2
        i = pz.id_i.to_numpy()
        j = pz.id_j.to_numpy()
        diff = A[i] - A[j]
        if metric == "euclidean":
            exp = np.sqrt((diff ** 2).sum(1))
        elif metric == "sqeuclidean":
            exp = (diff ** 2).sum(1)
        elif metric == "cityblock":
            exp = np.abs(diff).sum(1)
        else:
            exp = 1 - (A[i] * A[j]).sum(1) / (
                np.linalg.norm(A[i], axis=1)
                * np.linalg.norm(A[j], axis=1))
        np.testing.assert_allclose(pz.dist.to_numpy(), exp, atol=1e-9)

    pz = Tn.pdist(sdf, "rid", "v")
    sq = Tn.squareform(pz).toPandas()
    assert len(sq) == 30 * 29 + 30  # both triangles + diagonal
    assert (sq[sq.id_i == sq.id_j].dist == 0.0).all()

    import pytest

    with pytest.raises(ValueError):
        Tn.pdist(sdf, "rid", "v", max_rows=10)


def test_fft_matches_numpy(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(23)
    for N in (12, 60, 128, 13):  # composite splits + prime fallback
        xr = rng.standard_normal(N)
        xi = rng.standard_normal(N)
        sdf = spark.createDataFrame(pd.DataFrame({
            "j": range(N), "re": xr, "im": xi}))
        got = (Tn.fft(sdf, "j", "re", "im").toPandas()
               .sort_values("k"))
        exp = np.fft.fft(xr + 1j * xi)
        np.testing.assert_allclose(got.re.to_numpy(), exp.real,
                                   atol=1e-9)
        np.testing.assert_allclose(got.im.to_numpy(), exp.imag,
                                   atol=1e-9)
        # real-input form (im omitted)
        sdf_r = spark.createDataFrame(pd.DataFrame({
            "j": range(N), "re": xr}))
        got_r = (Tn.fft(sdf_r, "j", "re").toPandas().sort_values("k"))
        exp_r = np.fft.fft(xr)
        np.testing.assert_allclose(got_r.re.to_numpy(), exp_r.real,
                                   atol=1e-9)
        # ifft round-trips
        back = (Tn.ifft(Tn.fft(sdf, "j", "re", "im"), "k", "re", "im")
                .toPandas().sort_values("k"))
        np.testing.assert_allclose(back.re.to_numpy(), xr, atol=1e-9)
        np.testing.assert_allclose(back.im.to_numpy(), xi, atol=1e-9)

    # prime / badly-factoring lengths beyond the single-group cap
    # route through Bluestein (three power-of-two FFTs) — force the
    # path with a tiny cap and compare against numpy
    for N in (101, 106):  # prime; 2x53 lopsided composite
        xr = rng.standard_normal(N)
        xi = rng.standard_normal(N)
        sdf = spark.createDataFrame(pd.DataFrame({
            "j": range(N), "re": xr, "im": xi}))
        got = (Tn.fft(sdf, "j", "re", "im", _single_group_cap=50)
               .toPandas().sort_values("k"))
        exp = np.fft.fft(xr + 1j * xi)
        np.testing.assert_allclose(got.re.to_numpy(), exp.real,
                                   atol=1e-8)
        np.testing.assert_allclose(got.im.to_numpy(), exp.imag,
                                   atol=1e-8)
        back = (Tn.fft(
            spark.createDataFrame(pd.DataFrame({
                "j": range(N), "re": exp.real, "im": exp.imag})),
            "j", "re", "im", inverse=True, _single_group_cap=50)
            .toPandas().sort_values("k"))
        np.testing.assert_allclose(back.re.to_numpy(), xr, atol=1e-8)
        np.testing.assert_allclose(back.im.to_numpy(), xi, atol=1e-8)


def test_fft_variants(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(29)
    for N in (16, 15):
        x = rng.standard_normal(N)
        sdf = spark.createDataFrame(pd.DataFrame({
            "j": range(N), "re": x}))
        # rfft: non-redundant half, values match numpy
        got = Tn.rfft(sdf, "j", "re").toPandas().sort_values("k")
        exp = np.fft.rfft(x)
        assert len(got) == N // 2 + 1
        np.testing.assert_allclose(got.re.to_numpy(), exp.real,
                                   atol=1e-9)
        np.testing.assert_allclose(got.im.to_numpy(), exp.imag,
                                   atol=1e-9)
        # irfft round-trips the original signal
        half = spark.createDataFrame(pd.DataFrame({
            "k": range(N // 2 + 1), "re": exp.real, "im": exp.imag}))
        back = Tn.irfft(half, "k", "re", "im", n=N).toPandas()
        back = back.sort_values("k")
        np.testing.assert_allclose(back.re.to_numpy(), x, atol=1e-9)

        # fftfreq matches numpy
        fr_sdf = Tn.fftfreq(N, d=0.25)
        fr = fr_sdf.toPandas().sort_values("k")
        np.testing.assert_allclose(fr.freq.to_numpy(),
                                   np.fft.fftfreq(N, d=0.25),
                                   atol=1e-12)
        # fftshift index map: input bin k lands where numpy puts it
        sh = (Tn.fftshift(fr_sdf, "k", N).toPandas()
              .sort_values("k_shifted"))
        np.testing.assert_allclose(sh.freq.to_numpy(),
                                   np.fft.fftshift(
                                       np.fft.fftfreq(N, d=0.25)),
                                   atol=1e-12)
        # ifftshift undoes it (odd n is the asymmetric case)
        unsh = (Tn.ifftshift(
            Tn.fftshift(fr_sdf, "k", N).select("k_shifted", "freq"),
            "k_shifted", N).toPandas().sort_values("k_shifted"))
        np.testing.assert_allclose(unsh.freq.to_numpy(),
                                   np.fft.fftfreq(N, d=0.25),
                                   atol=1e-12)
        # rfftfreq
        rf = Tn.rfftfreq(N, d=0.25).toPandas().sort_values("k")
        np.testing.assert_allclose(rf.freq.to_numpy(),
                                   np.fft.rfftfreq(N, d=0.25),
                                   atol=1e-12)


def test_fft2_matches_numpy(spark):
    import pandas as pd

    from mars_spark import tensor as Tn

    rng = np.random.default_rng(31)
    r, c = 12, 9
    xr = rng.standard_normal((r, c))
    xi = rng.standard_normal((r, c))
    rows = [(i, j, xr[i, j], xi[i, j])
            for i in range(r) for j in range(c)]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["i", "j", "re", "im"]))
    got = (Tn.fft2(sdf, "i", "j", "re", "im").toPandas()
           .sort_values(["ki", "kj"]))
    exp = np.fft.fft2(xr + 1j * xi)
    np.testing.assert_allclose(
        got.re.to_numpy().reshape(r, c), exp.real, atol=1e-9)
    np.testing.assert_allclose(
        got.im.to_numpy().reshape(r, c), exp.imag, atol=1e-9)
    back = (Tn.ifft2(Tn.fft2(sdf, "i", "j", "re", "im"),
                     "ki", "kj", "re", "im").toPandas()
            .sort_values(["ki", "kj"]))
    np.testing.assert_allclose(
        back.re.to_numpy().reshape(r, c), xr, atol=1e-9)
    np.testing.assert_allclose(
        back.im.to_numpy().reshape(r, c), xi, atol=1e-9)


def test_guards_and_empty_parity(spark):
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from mars_spark import tensor as Tn

    empty = spark.createDataFrame(
        pd.DataFrame({"v": [1.0]})).filter("v < 0")
    with pytest.raises(ZeroDivisionError):
        Tn.average(empty.withColumnRenamed("v", "c")
                   .withColumn("w", F.lit(1.0)), "c", "w")
    with pytest.raises(ValueError, match="empty"):
        Tn.ptp(empty, "v")
    assert Tn.bincount(empty, "v", minlength=3) == [0, 0, 0]

    small = spark.createDataFrame(pd.DataFrame({"v": [0, 1, 1 << 30]}))
    with pytest.raises(ValueError, match="max_size"):
        Tn.bincount(small, "v")

    # fft index-contract violations error instead of silently
    # mis-transforming
    gap = spark.createDataFrame(pd.DataFrame({
        "j": [0, 1, 2, 4, 5, 6], "re": [1.0] * 6}))
    with pytest.raises(Exception, match="gaps or duplicates"):
        Tn.fft(gap, "j", "re", n=6).collect()


def test_review_fixes(spark):
    """r14 self-review findings: float arange, empty-average parity,
    null-tolerant bincount, fft2 index guard, rank-deficient rsvd,
    squareform ids, from_tensor index-name collision."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    import mars_spark as ms
    from mars_spark import tensor as Tn

    # float arange matches numpy (no int truncation)
    a = (Tn.arange(1.5, 4.5, name="v").toPandas()
         .sort_values("id").v.to_numpy())
    np.testing.assert_allclose(a, np.arange(1.5, 4.5), atol=1e-12)
    a2 = (Tn.arange(0.0, 1.0, 0.25, name="v").toPandas()
          .sort_values("id").v.to_numpy())
    np.testing.assert_allclose(a2, np.arange(0.0, 1.0, 0.25),
                               atol=1e-12)
    with pytest.raises(ValueError, match="nonzero"):
        Tn.arange(0.0, 1.0, 0.0)

    # unweighted average on empty: same numpy-parity error as the
    # weighted branch
    empty = spark.createDataFrame(
        pd.DataFrame({"v": [1.0]})).filter("v < 0")
    with pytest.raises(ZeroDivisionError):
        Tn.average(empty, "v")

    # bincount skips NULLs instead of TypeError-ing on the null group
    nl = spark.createDataFrame(pd.DataFrame({
        "v": pd.array([1, 2, None, 2], dtype="Int64")}))
    assert Tn.bincount(nl, "v") == [0, 1, 2]

    # fft2 rejects gaps (missing cell) instead of mis-transforming
    cells = [(i, j, 1.0) for i in range(3) for j in range(3)
             if not (i == 1 and j == 2)]
    bad = spark.createDataFrame(
        pd.DataFrame(cells, columns=["i", "j", "re"]))
    with pytest.raises(Exception, match="gaps or duplicates"):
        Tn.fft2(bad, "i", "j", "re").collect()

    # rank-deficient randomized_svd degrades instead of LinAlgError
    one = np.ones(8)
    dup = spark.createDataFrame(pd.DataFrame({
        "v": [list(one)] * 50}))
    s, V = Tn.randomized_svd(dup, "v", k=1, n_oversamples=4, seed=3)
    np.testing.assert_allclose(s[0], np.sqrt(50 * 8), rtol=1e-9)

    # squareform ids covers points absent from every pair
    pairs = spark.createDataFrame(pd.DataFrame({
        "id_i": [0], "id_j": [1], "dist": [2.0]}))
    sq = Tn.squareform(pairs, ids=[0, 1, 2]).toPandas()
    assert len(sq) == 2 + 3
    assert set(sq[sq.id_i == sq.id_j].id_i) == {0, 1, 2}

    # from_tensor refuses the 'index' name collision
    with pytest.raises(ValueError, match="named 'index'"):
        ms.from_tensor(np.zeros((2, 2)), index=[1, 2],
                       columns=["index", "b"])
    with pytest.raises(ValueError, match="named 'index'"):
        ms.from_tensor(np.zeros(3), index=[1, 2, 3], name="index")
