"""Similarity search over embedding columns (array<float>).

Scale design:

- brute-force top-k against ONE query vector is a single scan + TakeOrdered
  (no shuffle): cosine is a higher-order-function expression, the top-k
  is TakeOrderedAndProject. At 100 TB this is bandwidth-bound — correct
  baseline, linear scale-out.
- all-pairs near-dup uses block self-join pruned by id ordering, or LSH
  hyperplane buckets so only same-bucket pairs join (the scale path).
- IVF: coarse k-means centroids (MLlib, trained on a sample), assign
  partition = nearest centroid, then search only the probe clusters —
  turns a full scan into cluster-pruned scans. Plumbing here; training
  uses MLlib KMeans (reference analog: mars/learn/cluster/_kmeans.py:596,
  mars/learn/neighbors ANN backends).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import functions as F


def to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product: zip_with + aggregate (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_bruteforce(sdf: SparkDF, vec_col: str, query: list[float], k: int = 10,
                    id_col: str = "vec_id") -> SparkDF:
    """Exact top-k by cosine against a literal query vector.

    orderBy(desc).limit(k) plans as TakeOrderedAndProject — each
    partition keeps a k-heap, the driver merges; no global sort, no
    shuffle. The deterministic id tie-break keeps results stable.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    emb = to_double(F.col(vec_col))
    out = sdf.select(
        F.col(id_col),
        F.round(cosine(emb, q), 6).alias("cos_sim"),
    )
    return out.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def unit(col: Column) -> Column:
    """L2-normalize once so pairwise cosine collapses to a single dot
    (one aggregate per pair instead of dot+2 norms — 3× less per-pair
    work in the O(n²) stage; normalization is O(n))."""
    n = norm(col)
    return F.transform(col, lambda x: x / n)


def near_dup_pairs(sdf: SparkDF, vec_col: str, threshold: float = 0.95,
                   id_col: str = "vec_id", max_id: int | None = None,
                   parallelism: int = 32) -> SparkDF:
    """All-pairs cosine ≥ threshold (brute self-join; O(n²) — cap with
    max_id for tests, use lsh_bucketed_pairs at scale).

    The left side is repartitioned so the nested-loop join fans out
    across cores — a single-partition parquet scan would otherwise run
    the whole O(n²) stage on one thread.
    """
    base = sdf
    if max_id is not None:
        base = base.filter(F.col(id_col) < max_id)
    base = base.select(F.col(id_col), unit(to_double(F.col(vec_col))).alias("e"))
    a = base.select(F.col(id_col).alias("a"), F.col("e").alias("ea")) \
        .repartition(parallelism)
    b = base.select(F.col(id_col).alias("b"), F.col("e").alias("eb"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(dot(F.col("ea"), F.col("eb")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplane_signs(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """LSH bucket id from random-hyperplane sign bits.

    Plane components are deterministic ±1 derived from md5(plane|coord)
    parity — no stored model, reproducible anywhere md5 exists. The
    sign of dot(v, plane_p) = sign of sum_j s_pj * v_j.
    """
    import hashlib

    bucket = F.lit(0)
    for p in range(n_planes):
        signs = [
            1 if int(hashlib.md5(f"{p}|{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1
            for j in range(dim)
        ]
        d = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_pairs(sdf: SparkDF, vec_col: str, dim: int,
                       threshold: float = 0.9, n_planes: int = 8,
                       id_col: str = "vec_id") -> SparkDF:
    """Near-dup pairs restricted to equal LSH buckets — the scale path:
    only same-bucket rows join (expected bucket size n/2^planes)."""
    base = sdf.select(
        F.col(id_col),
        to_double(F.col(vec_col)).alias("e"),
    ).withColumn("bucket", hyperplane_signs(F.col("e"), dim, n_planes))
    a = base.select(F.col(id_col).alias("a"), F.col("e").alias("ea"), "bucket")
    b = base.select(F.col(id_col).alias("b"), F.col("e").alias("eb"), "bucket")
    return (
        a.join(b, on="bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("ea"), F.col("eb")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def ivf_index(sdf: SparkDF, vec_col: str, n_clusters: int = 16,
              id_col: str = "vec_id", seed: int = 42):
    """Coarse IVF: MLlib KMeans centroids + cluster assignment column.

    Returns (assigned_df, centroids). Search with ivf_search — probes
    only the nearest n_probe clusters. Reference analog: Mars wraps
    faiss/proxima for ANN (mars/learn/neighbors); Spark-first we build
    IVF from MLlib primitives.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = sdf.select(
        F.col(id_col),
        to_double(F.col(vec_col)).alias("e"),
    ).withColumn("features", array_to_vector(F.col("e")))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="features",
                predictionCol="cluster")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, "e", "cluster")
    centroids = [list(c) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_search(assigned: SparkDF, centroids: list[list[float]],
               query: list[float], k: int = 10, n_probe: int = 4,
               id_col: str = "vec_id") -> SparkDF:
    """Probe the n_probe nearest clusters only — partition pruning for
    vector search (the filter on `cluster` prunes at the scan when the
    index is written partitioned-by-cluster)."""
    import math

    def cos(u, v):
        du = math.sqrt(sum(x * x for x in u))
        dv = math.sqrt(sum(x * x for x in v))
        return sum(x * y for x, y in zip(u, v)) / (du * dv or 1.0)

    probes = sorted(range(len(centroids)),
                    key=lambda i: -cos(centroids[i], query))[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        assigned.filter(F.col("cluster").isin(probes))
        .select(F.col(id_col), F.round(cosine(F.col("e"), q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
