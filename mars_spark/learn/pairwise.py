"""Pairwise distance / kernel operators.

Reference: mars/learn/metrics/pairwise/{euclidean,manhattan,cosine,
haversine,rbf_kernel,pairwise,pairwise_distances_topk}.py — Mars
tiles X×Y into chunk pairs and runs sklearn's pairwise kernels per
pair. Spark-first shape here:

- ``Y`` (the query/centroid/reference side) is REQUIRED to be
  driver-collectable and ships to executors as a closure matrix —
  the common shapes (score n points against k centroids, against a
  probe set, against a label dictionary) all have a small side. The
  big×big self-pair sweep is a different op with different math:
  use ``llm.similarity.similarity_self_join`` / ``all_pairs_blocked``
  (LSH/blocked theta-join) — a full X×X distance MATRIX at corpus
  scale is not a thing any engine should materialize.
- per Arrow batch of X, ONE numpy/BLAS evaluation computes the whole
  batch×|Y| block (gemm for euclidean/cosine/rbf via the
  ‖x‖²+‖y‖²−2x·y expansion; broadcasting for manhattan/haversine) —
  the same interpreted-HOF-vs-gemm trade measured in
  llm/similarity.py.
- output is LONG FORM (x_id, y_idx, value) — joinable, groupable,
  and never wider than the batch; ``pairwise_distances_topk`` keeps
  only each row's k best inside the batch kernel, so the full block
  never leaves the executor.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

_METRICS = ("euclidean", "sqeuclidean", "manhattan", "cosine",
            "haversine", "rbf")


def _block(metric: str, xs, ym, gamma: float):
    """Distances for one X batch (b×d) against the full Y (m×d)."""
    import numpy as np

    if metric in ("euclidean", "sqeuclidean", "rbf"):
        x2 = (xs * xs).sum(axis=1)[:, None]
        y2 = (ym * ym).sum(axis=1)[None, :]
        d2 = np.maximum(x2 + y2 - 2.0 * (xs @ ym.T), 0.0)
        if metric == "sqeuclidean":
            return d2
        if metric == "rbf":
            return np.exp(-gamma * d2)
        return np.sqrt(d2)
    if metric == "cosine":
        xn = np.linalg.norm(xs, axis=1)[:, None]
        yn = np.linalg.norm(ym, axis=1)[None, :]
        denom = xn * yn
        denom[denom == 0.0] = 1.0
        # clamp: for a vector against itself 1 - x.y/(|x||y|) is ±ε
        # depending on summation order, and a -0.0 survives rounding
        # (the value hash distinguishes signed zeros); cosine distance
        # is mathematically >= 0, so the clamp only touches the -ε case
        return np.maximum(1.0 - (xs @ ym.T) / denom, 0.0)
    if metric == "manhattan":
        # the broadcasted |x-y| intermediate is b×m×d doubles — bound
        # it to ~32 MB by row-chunking the batch (gemm metrics never
        # materialize the 3-d block, so only L1 needs this)
        step = max(1, (4 << 20) // max(ym.shape[0] * ym.shape[1], 1))
        return np.concatenate([
            np.abs(xs[i:i + step, None, :] - ym[None, :, :]).sum(axis=2)
            for i in range(0, len(xs), step)])
    if metric == "haversine":
        # rows are (lat, lon) in RADIANS; great-circle distance on the
        # unit sphere (multiply by the radius for meters)
        lat1, lon1 = xs[:, 0][:, None], xs[:, 1][:, None]
        lat2, lon2 = ym[:, 0][None, :], ym[:, 1][None, :]
        a = (np.sin((lat2 - lat1) / 2) ** 2
             + np.cos(lat1) * np.cos(lat2)
             * np.sin((lon2 - lon1) / 2) ** 2)
        return 2.0 * np.arcsin(np.sqrt(np.minimum(a, 1.0)))
    raise ValueError(f"unknown metric {metric!r}; one of {_METRICS}")


def pairwise_distances(sdf: SparkDF, y: list[list[float]], vec_col: str,
                       id_col: str, metric: str = "euclidean",
                       gamma: float = 1.0) -> SparkDF:
    """(id, y_idx, dist) for every (row of ``sdf``) × (row of ``y``).
    ``y`` is a driver-side list of vectors (see module docstring);
    one Arrow batch → one BLAS block evaluation."""
    import numpy as np
    import pandas as pd

    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; one of {_METRICS}")
    ym = np.asarray(y, dtype=np.float64)
    m = len(y)
    id_type = dict(sdf.dtypes)[id_col]
    base = sdf.select(F.col(id_col), F.col(vec_col).alias("__e"))

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            xs = np.vstack([np.asarray(v, dtype=np.float64)
                            for v in pdf["__e"]])
            d = _block(metric, xs, ym, gamma)
            b = len(pdf)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy().repeat(m),
                "y_idx": np.tile(np.arange(m, dtype=np.int32), b),
                "dist": d.ravel(),
            })

    return base.mapInPandas(
        gen, schema=f"{id_col} {id_type}, y_idx int, dist double")


def pairwise_distances_topk(sdf: SparkDF, y: list[list[float]],
                            vec_col: str, id_col: str, k: int = 1,
                            metric: str = "euclidean",
                            gamma: float = 1.0) -> SparkDF:
    """(id, y_idx, dist, rank) — each row's ``k`` NEAREST rows of
    ``y`` (reference: pairwise_distances_topk.py). The selection runs
    INSIDE the batch kernel (argpartition per block), so only b×k
    rows ever leave the executor — the full b×m block is never
    shuffled or collected. Ties break on the smaller y index
    (deterministic)."""
    import numpy as np
    import pandas as pd

    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; one of {_METRICS}")
    ym = np.asarray(y, dtype=np.float64)
    kk = min(k, len(y))
    id_type = dict(sdf.dtypes)[id_col]
    base = sdf.select(F.col(id_col), F.col(vec_col).alias("__e"))

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            xs = np.vstack([np.asarray(v, dtype=np.float64)
                            for v in pdf["__e"]])
            d = _block(metric, xs, ym, gamma)
            # stable k-best: order by (dist, y_idx)
            order = np.lexsort(
                (np.broadcast_to(np.arange(d.shape[1]), d.shape), d),
                axis=1)[:, :kk]
            rows = np.arange(len(pdf))[:, None]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy().repeat(kk),
                "y_idx": order.astype("int32").ravel(),
                "dist": d[rows, order].ravel(),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32),
                                len(pdf)),
            })

    return base.mapInPandas(
        gen, schema=(f"{id_col} {id_type}, y_idx int, dist double, "
                     "rank int"))


def haversine_distances(sdf: SparkDF, y: list[list[float]],
                        latlon_col: str, id_col: str,
                        radius: float = 6371000.0) -> SparkDF:
    """Great-circle distances in METERS (``radius`` defaults to the
    Earth's mean radius; inputs are (lat, lon) in radians)."""
    out = pairwise_distances(sdf, y, latlon_col, id_col,
                             metric="haversine")
    return out.withColumn("dist", F.col("dist") * radius)
