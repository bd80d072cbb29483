"""Thin tensor facade (SURVEY.md §2.9).

The reference ships a full 282-op ndarray engine (mars/tensor/); a
general ndarray engine is explicitly out of scope for the Spark-native
build. What the DataFrame layer actually consumes is kept: random
column generation (mars/tensor/random/, 42 ops → F.rand/randn +
deterministic hashing), element-wise ufuncs (→ Column math, §2.8),
reductions/statistics (→ aggregates, percentile), and distributed
linear algebra for the learn facade (→ MLlib linalg: RowMatrix SVD /
Gramian; mars/tensor/linalg/ has cholesky/qr/svd/… tiled by hand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, SparkSession
from pyspark.sql import functions as F


def _spark() -> SparkSession:
    from mars_spark.session import get_spark

    s = SparkSession.getActiveSession()
    return s if s is not None else get_spark()


# ------------------------------------------------------- random (§2.9)
def rand(n: int, seed: int = 42, name: str = "x",
         num_partitions: int | None = None) -> SparkDF:
    """Uniform[0,1) column of length n (mars/tensor/random/rand.py).
    spark.range + F.rand: generated distributed, never materialized on
    the driver."""
    return _spark().range(0, n, 1, num_partitions).select(
        "id", F.rand(seed).alias(name))


def randn(n: int, seed: int = 42, name: str = "x",
          num_partitions: int | None = None) -> SparkDF:
    return _spark().range(0, n, 1, num_partitions).select(
        "id", F.randn(seed).alias(name))


def randint(n: int, low: int, high: int, seed: int = 42, name: str = "x",
            num_partitions: int | None = None) -> SparkDF:
    return _spark().range(0, n, 1, num_partitions).select(
        "id", (F.floor(F.rand(seed) * (high - low)) + low)
        .cast("bigint").alias(name))


def random_vectors(n: int, dim: int, seed: int = 42, name: str = "vec",
                   num_partitions: int | None = None) -> SparkDF:
    """(id, vec: array<double>) — deterministic per (id, position) via
    hash-seeded uniforms, reproducible regardless of partitioning
    (unlike F.rand, which is per-partition-seeded)."""
    u = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.conv(F.substring(
                F.md5(F.concat_ws("|", F.col("id"), j, F.lit(seed))), 1, 8),
                16, 10).cast("double") / F.lit(float(0xFFFFFFFF))
        ),
    )
    return _spark().range(0, n, 1, num_partitions).select(
        "id", u.alias(name))


# -------------------------------------------------- statistics (§2.9)
def percentile(sdf: SparkDF, col: str, q) -> list[float]:
    """Exact percentile (mars/tensor/statistics/percentile.py). At
    100 TB use approx_percentile(relative_error>0)."""
    qs = [q] if isinstance(q, float) else list(q)
    row = sdf.agg(*[
        F.percentile(F.col(col), F.lit(x)).alias(f"p{i}")
        for i, x in enumerate(qs)
    ]).collect()[0]
    return [row[f"p{i}"] for i in range(len(qs))]


def histogram(sdf: SparkDF, col: str, bins: int = 10) -> list[tuple]:
    """Fixed-width histogram: one min/max pass + one bucket-count agg
    (mars/tensor/statistics/histogram.py tiles the same two passes)."""
    row = sdf.agg(F.min(col), F.max(col)).collect()[0]
    lo, hi = float(row[0]), float(row[1])  # Decimal columns → float
    width = (hi - lo) / bins or 1.0
    bucket = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
    counts = (sdf.groupBy(bucket.alias("b"))
              .agg(F.count(F.lit(1)).alias("n"))
              .orderBy("b").collect())
    by_b = {int(r.b): r.n for r in counts}
    return [(lo + i * width, lo + (i + 1) * width, by_b.get(i, 0))
            for i in range(bins)]


# ------------------------------------------------------ linalg (§2.9)
def gramian(sdf: SparkDF, vec_col: str):
    """Aᵀ·A of a tall-skinny matrix stored as an array column — ONE
    gemm (Xᵀ·X over the stacked batch) per Arrow batch, one d×d
    partial row per partition, summed on the driver (what
    mars/tensor/linalg tiles by hand as blockwise-multiply +
    tree-sum). The driver collect is bounded-contract:
    num_partitions × d² doubles (1000 partitions × d=64 ≈ 32 MB).
    Replaces the r8 per-row ``rdd.treeAggregate`` + ``np.outer`` path
    that pickled every row through Python — measured warm at
    local[32], 200k × 64 rows: 1.20 s (old) → 0.59 s (gemm), and the
    gap widens with row count since the old path ran O(rows) Python
    calls (at the 2k-row bench scale both are overhead-dominated and
    within noise). Returns a numpy (d, d) array, or None for an
    empty frame (parity with the treeAggregate zero)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__v"]])
            p = x.T @ x
            acc = p if acc is None else acc + p
        if acc is not None:
            yield pd.DataFrame({"g": [acc.ravel().tolist()]})

    partials = (sdf.select(F.col(vec_col).alias("__v"))
                .mapInPandas(gen, schema="g array<double>").collect())
    if not partials:
        return None
    mats = np.stack([np.asarray(r["g"], dtype=np.float64)
                     for r in partials])
    d = int(round(mats.shape[1] ** 0.5))
    return mats.sum(axis=0).reshape(d, d)


def svd(sdf: SparkDF, vec_col: str, k: int):
    """Top-k SVD of a tall-skinny array-column matrix via the Gramian
    (d×d eigendecomposition on the driver; d = vector dim, small).
    mars/tensor/linalg/svd.py tiles the equivalent two-stage QR."""
    import numpy as np

    g = gramian(sdf, vec_col)
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    s = np.sqrt(np.maximum(vals[order], 0.0))
    return s, vecs[:, order]  # singular values, right singular vectors


def matmul(sdf: SparkDF, vec_col: str, b, out_col: str = "y") -> SparkDF:
    """Tall-skinny matrix times a small driver-side matrix: each row's
    d-vector maps to ``v @ B`` (d×m) — ONE gemm per Arrow batch
    (mars/tensor/linalg tiles A@B into chunk block-products; with a
    broadcastable right side the whole product is a narrow map, the
    only matmul shape a 100 TB pipeline runs row-wise). For big×big
    use MLlib BlockMatrix — deliberately not wrapped here
    (SURVEY §2.9 scope)."""
    import numpy as np
    import pandas as pd

    bm = np.asarray(b, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__v"]])
            out = x @ bm
            pdf = pdf.drop(columns="__v")
            pdf[out_col] = list(out)
            yield pdf

    cols = [c for c in sdf.columns if c != vec_col]
    base = sdf.select(*cols, F.col(vec_col).alias("__v"))
    schema = ", ".join(f"{c} {t}" for c, t in base.dtypes
                       if c != "__v") + f", {out_col} array<double>"
    return base.mapInPandas(gen, schema=schema)


def cholesky(g) -> "object":
    """Driver-side lower Cholesky of a (small, d×d) Gramian —
    mars/tensor/linalg/cholesky.py tiles this over chunked matrices;
    at tall-skinny shapes d is small and the factor is a driver
    computation over the tree-aggregated Gramian."""
    import numpy as np

    return np.linalg.cholesky(np.asarray(g, dtype=np.float64))


def qr(sdf: SparkDF, vec_col: str, q_col: str = "q", gram=None):
    """Tall-skinny QR by the indirect (Cholesky-QR) method — the
    distributed formulation mars/tensor/linalg/qr.py tiles: R comes
    from the Cholesky factor of the Gramian (R = Lᵀ where
    AᵀA = L·Lᵀ), and Q = A·R⁻¹ is one narrow gemm map. One data pass
    for the Gramian + one for Q; the d×d work is driver-side. Pass a
    precomputed ``gram`` (d×d, e.g. from an earlier ``gramian`` call
    on the same frame) to skip the first pass. Returns (frame with
    ``q_col``, R)."""
    import numpy as np

    g = (gramian(sdf, vec_col) if gram is None
         else np.asarray(gram, dtype=np.float64))
    r = cholesky(g).T
    rinv = np.linalg.inv(r)
    return matmul(sdf, vec_col, rinv, out_col=q_col), r
