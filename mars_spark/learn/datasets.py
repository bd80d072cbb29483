"""Synthetic dataset generators — distributed and DETERMINISTIC.

Reference: mars/learn/datasets/samples_generator.py (make_blobs:402,
make_regression:268, make_classification:31) — Mars parallelizes
numpy's RandomState per chunk, so results depend on the chunk layout.
Here every random draw is a pure Column expression over the row id:
uniforms come from md5(seed|id|dim) hex prefixes, normals via the
Box-Muller transform — so a dataset is bit-identical regardless of
partitioning, cluster size, or execution order (the property that
lets the oracle suite replay generated data, and that makes
regenerating a 100 TB synthetic corpus on a different cluster produce
the same bytes). No driver-side arrays; `spark.range(n)` scales the
row dimension, expressions scale the feature dimension.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame as SparkDF, SparkSession
from pyspark.sql import functions as F

_HEX15 = float(16 ** 15)


def _uniform(*parts) -> F.Column:
    """Deterministic U(0,1] from md5 of the '|'-joined parts (15 hex
    chars = 60 bits — far past double precision)."""
    key = F.concat_ws("|", *[p if isinstance(p, F.Column)
                             else F.lit(str(p)) for p in parts])
    return ((F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
             .cast("double") + 1.0) / (_HEX15 + 1.0))


def _normal(*parts) -> F.Column:
    """Deterministic N(0,1) via Box-Muller over two derived uniforms."""
    u1 = _uniform(*parts, "u1")
    u2 = _uniform(*parts, "u2")
    return (F.sqrt(-2.0 * F.log(u1))
            * F.cos(F.lit(2.0 * math.pi) * u2))


def _py_uniform(*parts) -> float:
    key = "|".join(str(p) for p in parts)
    return (int(hashlib.md5(key.encode()).hexdigest()[:15], 16) + 1.0) \
        / (_HEX15 + 1.0)


def _py_normal(*parts) -> float:
    """Driver-side twin of _normal (same md5 Box-Muller scheme)."""
    u1 = _py_uniform(*parts, "u1")
    u2 = _py_uniform(*parts, "u2")
    return math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)


def make_blobs(spark: SparkSession, n_samples: int, n_features: int = 2,
               centers: int | list[list[float]] = 3,
               cluster_std: float = 1.0, center_box: float = 10.0,
               seed: int = 0):
    """(df, centers): ``df`` has (sample_id, label, features:
    array<double>); rows are assigned round-robin to centers and
    perturbed by N(0, cluster_std). Integer ``centers`` derives the
    center coordinates deterministically from the seed (uniform in
    ±center_box); a list pins them explicitly."""
    if isinstance(centers, int):
        centers = [[(2.0 * _py_uniform(seed, "c", c, j) - 1.0)
                    * center_box
                    for j in range(n_features)]
                   for c in range(centers)]
    k = len(centers)
    sid = F.col("id")
    label = F.pmod(sid, F.lit(k)).cast("int")
    cent = F.element_at(
        F.array(*[F.array(*[F.lit(float(v)) for v in c])
                  for c in centers]),
        label + 1)
    feats = F.array(*[
        F.element_at(cent, j + 1)
        + F.lit(float(cluster_std)) * _normal(seed, sid, j)
        for j in range(n_features)])
    df = (spark.range(n_samples)
          .select(sid.alias("sample_id"), label.alias("label"),
                  feats.alias("features")))
    return df, centers


def make_regression(spark: SparkSession, n_samples: int,
                    n_features: int = 10, noise: float = 0.0,
                    bias: float = 0.0, seed: int = 0):
    """(df, coef): ``df`` has (sample_id, features, target) with
    X ~ N(0,1), target = X·coef + bias + N(0, noise); ``coef`` is a
    deterministic U(0,100) vector derived from the seed (sklearn
    parity in distribution, not in values)."""
    coef = [100.0 * _py_uniform(seed, "w", j) for j in range(n_features)]
    sid = F.col("id")
    xs = [_normal(seed, sid, j) for j in range(n_features)]
    target = F.lit(float(bias))
    for j, w in enumerate(coef):
        target = target + F.lit(w) * xs[j]
    if noise > 0:
        target = target + F.lit(float(noise)) * _normal(seed, sid, "eps")
    df = (spark.range(n_samples)
          .select(sid.alias("sample_id"),
                  F.array(*xs).alias("features"),
                  target.alias("target")))
    return df, coef


def make_classification(spark: SparkSession, n_samples: int,
                        n_features: int = 10, n_classes: int = 2,
                        class_sep: float = 1.0, seed: int = 0):
    """(df, centers): linearly-separable-ish classification data —
    the make_blobs construction with unit-std clusters at
    ``class_sep``-scaled centers and one label per class (the
    hypercube-corner simplification of the reference's generator)."""
    df, centers = make_blobs(
        spark, n_samples, n_features, centers=n_classes,
        cluster_std=1.0, center_box=2.0 * class_sep, seed=seed)
    return df, centers


def make_low_rank_matrix(spark: SparkSession, n_samples: int,
                         n_features: int = 10, effective_rank: int = 5,
                         tail_strength: float = 0.5, seed: int = 0):
    """Mostly low-rank matrix (reference:
    mars/learn/datasets/samples_generator.py make_low_rank_matrix;
    sklearn semantics: bell-shaped singular profile
    s_i = (1−tail)·exp(−(i/r)²) + tail·exp(−i/(10r))).

    Distributed shape: X = G · diag(s) · Hᵀ where the k×n_features
    right factor H is a driver-side deterministic normal matrix
    (broadcast as literals) and each row's k-vector g comes from the
    same md5 Box-Muller stream — one narrow projection per row, no
    shuffle, bit-identical across partition layouts. (sklearn
    orthonormalizes the factors; iid normal factors give the same
    singular-value PROFILE up to rotation, which is what the
    generator exists to provide.)"""
    import math as _math

    k = min(n_samples, n_features)
    sing = [(1.0 - tail_strength)
            * _math.exp(-1.0 * (i / effective_rank) ** 2)
            + tail_strength * _math.exp(-0.1 * i / effective_rank)
            for i in range(k)]
    # driver-side H: k × n_features deterministic normals, scaled so
    # entries of X stay O(1)
    import numpy as np

    H = np.asarray(
        [[_py_normal(seed, "h", i, j) for j in range(n_features)]
         for i in range(k)]) / _math.sqrt(k)
    sid = F.col("id")
    g = [_normal(seed, "g", sid, i) for i in range(k)]
    feats = F.array(*[
        sum((F.lit(float(sing[i] * H[i, j])) * g[i] for i in range(k)),
            start=F.lit(0.0))
        for j in range(n_features)])
    return spark.range(n_samples).select(
        sid.alias("sample_id"), feats.alias("features"))
