"""Similarity search over embedding columns (array<float>).

Scale design:

- brute-force top-k against ONE query vector is a single scan + TakeOrdered
  (no shuffle): scoring is an Arrow-batched gemv, the top-k is
  TakeOrderedAndProject. At 100 TB this is bandwidth-bound — correct
  baseline, linear scale-out. Batched `*_queries` forms score a whole
  (query_id, vector) table in the same single pass.
- all-pairs near-dup uses the blocked theta-join (all_pairs_blocked) or
  LSH hyperplane buckets so only same-bucket pairs join; `knn_join` is
  the two-table top-k generalization — neither side driver-collected
  nor broadcast.
- IVF: coarse centroids (deterministic smallest-id seeding for
  oracle-replayable indexes, or MLlib KMeans), assign = per-batch gemm
  argmax, search only the probed clusters — cluster-pruned scans when
  the index is written partitionBy(cluster) (write_ivf_index;
  ivf_assign appends new batches against the FIXED centroids).
- compression ladder, all with pure-JVM ADC search over code rows
  (the vector column is never read at query time):
  PQ (m-byte codes, ~64x) / SQ8 (1 byte per dim, 4x, higher recall,
  pure-JVM encode too) / BQ1 (1 BIT per dim, 32x, Hamming
  bit_count(xor) + the bq1_rerank_search exact re-rank recipe).
  Compression ratios are the LOGICAL code widths — realized at rest
  by parquet encodings (codes live as array<int>/array<bigint> in
  Spark memory; see the per-encoder docstrings).
  IVF composes with each (ivfpq_*, ivfsq8_*).
  Reference capability analog: mars/learn/neighbors ANN backends
  (faiss/proxima wrappers); public formulations from Jégou et al.
  TPAMI'11 (PQ) and Johnson, Douze & Jégou 2019 (FAISS SQ8/binary).
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


def _cosine_to_query_udf(query: list[float]):
    """Arrow-batched cosine-against-a-literal-query scorer (r8):
    one m×d gemv per Arrow batch replaces the interpreted
    zip_with/aggregate fold that previously scored every scanned row
    (lambda HOFs never enter codegen — same trade as the IVF
    assignment stage, which measured the Arrow gemm ~10× cheaper).
    Per-ROW Arrow shipping of the scan side is the cheap direction;
    contrast all_pairs_blocked, where shipping PAIRS of arrays
    measured slower than JVM HOF dots."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qv = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(qv)) or 1.0

    # no type hints: PEP 563 postponed annotations break pandas_udf
    # signature inspection (see ivf_index_deterministic._assign)
    def _score(e):
        if e.empty:
            return pd.Series([], dtype="float64")
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in e])
        nrm = np.linalg.norm(m, axis=1) * qn
        nrm[nrm == 0.0] = 1.0
        return pd.Series((m @ qv) / nrm)

    return pandas_udf(_score, "double")


def topk_bruteforce(sdf: SparkDF, vec_col: str, query: list[float], k: int = 10,
                    id_col: str = "vec_id") -> SparkDF:
    """Exact top-k by cosine against a literal query vector.

    Scoring is one Arrow-batched gemv per batch
    (_cosine_to_query_udf); orderBy(desc).limit(k) plans as
    TakeOrderedAndProject — each partition keeps a k-heap, the driver
    merges; no global sort, no shuffle. The deterministic id
    tie-break keeps results stable.
    """
    scorer = _cosine_to_query_udf(query)
    out = sdf.select(
        F.col(id_col),
        F.round(scorer(to_double(F.col(vec_col))), 6).alias("cos_sim"),
    )
    return out.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def unit(col: Column) -> Column:
    """L2-normalize once so pairwise cosine collapses to a single dot
    (one aggregate per pair instead of dot+2 norms — 3× less per-pair
    work in the O(n²) stage; normalization is O(n)).

    Arrow-batched (r11): the HOF form — ``transform(e, x -> x /
    norm(e))`` — re-evaluates the norm subexpression PER ELEMENT
    (interpreted lambdas get no subexpression elimination), an O(d²)
    per-row cost that measured 47.6 s vs 0.8 s for the raw scan over
    200k 64-dim vectors at sf10 and dominated the whole ANN/semantic-
    dedup family. One numpy row-norm per Arrow batch is O(d) and
    fully vectorized; downstream JVM HOF dots consume the returned
    array<double> unchanged."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: PEP 563 postponed annotations break pandas_udf
    # signature inspection (see ivf_index_deterministic._assign)
    def _unit(e):
        if e.empty:
            return pd.Series([], dtype=object)
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in e])
        n = np.linalg.norm(m, axis=1)
        n[n == 0.0] = 1.0
        return pd.Series(list(m / n[:, None]))

    return pandas_udf(_unit, "array<double>")(col)


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


def _knn_blocks(n_left: int, n_right: int,
                pairs_per_reducer: int = 4_000_000
                ) -> tuple[int, int]:
    """Okcan-Riedewald block counts adapted to the two sides' sizes:
    Bl ≈ |L|/√T, Br ≈ |R|/√T (T = target pairs per reducer) makes
    every reducer score ~T pairs with replication proportional to
    the OTHER side's block count — so a tiny side gets Bl=1 and the
    big side is never replicated. Clamped to [1, 256] per side."""
    import math

    sqrt_t = math.sqrt(max(pairs_per_reducer, 1))
    bl = max(1, min(256, round(n_left / sqrt_t)))
    br = max(1, min(256, round(n_right / sqrt_t)))
    return bl, br


def knn_join(left: SparkDF, left_vec: str, right: SparkDF,
             right_vec: str, k: int = 10,
             left_id: str = "query_id", right_id: str = "vec_id",
             n_blocks_left: int | None = None,
             n_blocks_right: int | None = None,
             pairs_per_reducer: int = 4_000_000) -> SparkDF:
    """Exact cosine top-k join of TWO large tables — (left_id, rank,
    right_id, cos_sim), rank 1 = most similar — with NEITHER side
    collected to the driver nor broadcast. This fills the scale gap
    between the batched query forms (topk_bruteforce_queries: the
    query table must fit on the driver) and learn's kneighbors_graph
    (broadcast-bound self-join): at 100 TB both sides can be
    arbitrarily large.

    The mechanics are the two-table generalization of
    all_pairs_blocked's block-pair theta join (Okcan & Riedewald
    SIGMOD'11): left rows hash into Bl blocks and emit under every
    (lb, q) key, right rows into Br blocks emitting under every
    (p, rb) key, so the shuffle-hash equi-join on (p, q) meets every
    (left block, right block) pair exactly once in Bl·Br bounded
    reducers — no CartesianProduct, skew-free. Replication is Br per
    left row and Bl per right row; the Θ(|L|·|R|) pair scoring is
    inherent to the EXACT join (use the IVF/LSH paths for the
    approximate sweep).

    Blocking adapts to the two sides' sizes: with Bl/Br unset, one
    cheap count() per side picks Bl ≈ |L|/√T, Br ≈ |R|/√T
    (T = pairs_per_reducer), so every reducer scores ~T pairs and the
    replication factor follows the SMALLER side — a 100-row query
    table against 200k vectors gets Bl=1 (no replication of the big
    side) instead of a fixed square grid. The adaptive sizing also
    bounds the shuffle-hash BUILD side: each (p,q) reducer hashes
    |R|/Br right rows in memory, and |R|/√T (√T=2000 at the default)
    keeps that a few thousand vector rows. EXPLICIT block counts
    bypass the bound — measured at 600k×64d vectors, Br=8 made the
    75k-row build exceed the per-task memory share and fail the job
    (SCALE.md r12); leave blocks unset unless you've sized them.

    The per-(left row, right block) partial top-k windows on
    (p, q, __lq) — a superset of the join keys, so the join's own
    (p, q) hash partitioning satisfies the window's clustering
    requirement and NO extra shuffle happens before it (p is a
    function of __lq, so the grouping equals (__lq, q)). Only the
    final global rank window shuffles, on the already-reduced
    Br·k-rows-per-left-row partials."""
    from pyspark.sql import Window

    L = left.select(F.col(left_id).alias("__lq"),
                    unit(to_double(F.col(left_vec))).alias("__le"))
    R = right.select(F.col(right_id).alias("__rid"),
                     unit(to_double(F.col(right_vec))).alias("__re"))
    if n_blocks_left is None or n_blocks_right is None:
        bl, br = _knn_blocks(L.count(), R.count(), pairs_per_reducer)
        n_blocks_left = bl if n_blocks_left is None else n_blocks_left
        n_blocks_right = (br if n_blocks_right is None
                          else n_blocks_right)
    lb = F.pmod(F.hash(F.col("__lq")), F.lit(n_blocks_left))
    rb = F.pmod(F.hash(F.col("__rid")), F.lit(n_blocks_right))
    a = L.withColumn("_blk", lb).select(
        "__lq", "__le",
        F.explode(F.expr(
            f"transform(sequence(0, {n_blocks_right - 1}), q -> "
            f"struct(_blk as p, q as q))")).alias("kk"),
    ).select("__lq", "__le",
             F.col("kk.p").alias("p"), F.col("kk.q").alias("q"))
    b = R.withColumn("_blk", rb).select(
        "__rid", "__re",
        F.explode(F.expr(
            f"transform(sequence(0, {n_blocks_left - 1}), p -> "
            f"struct(p as p, _blk as q))")).alias("kk"),
    ).select("__rid", "__re",
             F.col("kk.p").alias("p"), F.col("kk.q").alias("q"))
    pairs = (a.join(b.hint("shuffle_hash"), on=["p", "q"])
             .select("__lq", "p", "q", "__rid",
                     F.round(dot(F.col("__le"), F.col("__re")), 4)
                     .alias("__s")))
    # (p, q, __lq) ⊇ join keys (p, q): HashPartitioning(p, q) already
    # satisfies this window's clustering, so no Exchange is inserted;
    # p = hash(__lq) % Bl makes the grouping identical to (__lq, q).
    w_part = (Window.partitionBy("p", "q", "__lq")
              .orderBy(F.col("__s").desc(), F.col("__rid").asc()))
    partial = (pairs.withColumn("__rn", F.row_number().over(w_part))
               .filter(F.col("__rn") <= k).drop("__rn", "p", "q"))
    w_full = (Window.partitionBy("__lq")
              .orderBy(F.col("__s").desc(), F.col("__rid").asc()))
    return (partial.withColumn("rank", F.row_number().over(w_full))
            .filter(F.col("rank") <= k)
            .select(F.col("__lq").alias(left_id), "rank",
                    F.col("__rid").alias(right_id),
                    F.col("__s").alias("cos_sim")))


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


def ivf_seeds(sdf: SparkDF, vec_col: str, n_clusters: int,
              id_col: str = "vec_id") -> list:
    """The deterministic IVF seed centroids alone — the unit vectors
    of the ``n_clusters`` smallest ids, cluster label = 0-based rank
    of the seed id. Split out of ``ivf_index_deterministic`` (r15):
    a caller whose assignment table is already staged on disk (the
    streaming semantic-dedup store) only needs the centroid matrix —
    rebuilding the full assignment per invocation paid an Arrow gemm
    stage plus an eager localCheckpoint for nothing.

    n_clusters SMALLEST ids, not ids < n_clusters: sparse/offset id
    spaces would silently undersize the centroid list under the
    filter form (same fix as pq_codebook).

    r14 (optimization): take the top-k FIRST, normalize after — the
    projected form evaluated the Arrow-batched unit() over EVERY row
    just to collect n_clusters seeds (a full Python stage per index
    build; measured as the row's biggest single job). Same expression
    on the k surviving rows → identical seeds. Collects only
    centroid-sized data (n_clusters × dim)."""
    seed_rows = (sdf.select(F.col(id_col),
                            to_double(F.col(vec_col)).alias("__r"))
                 .orderBy(id_col).limit(n_clusters)
                 .select(F.col(id_col), unit(F.col("__r")).alias("e"))
                 .collect())
    # fewer rows than n_clusters: degrade to one cluster per row
    # (fewer clusters is semantically fine for IVF — unlike
    # pq_codebook, whose 2^nbits code domain is fixed — and
    # small-corpus callers like clean_corpus(dedup='semantic')
    # cannot know the post-filter count to clamp themselves)
    return [list(r["e"]) for r in
            sorted(seed_rows, key=lambda r: r[id_col])]


def ivf_index_deterministic(sdf: SparkDF, vec_col: str,
                            n_clusters: int = 16,
                            id_col: str = "vec_id",
                            refine: int = 0):
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
    seeds = ivf_seeds(sdf, vec_col, n_clusters, id_col=id_col)
    if not seeds:
        raise ValueError("ivf_index_deterministic: empty input")
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
    # Lloyd refinement (r13 generalizes the bool to int(refine)
    # iterations -- the trained-coarse-quantizer path AnnIndex
    # defaults can ride): each round is one distributed
    # per-(cluster, dim) mean collected at centroid size
    # (n_clusters x dim scalars), then a re-assign; empty clusters
    # keep their previous centroid (standard Lloyd convention, keeps
    # the cluster-id domain stable for the partitioned store). The
    # base projection is snapshotted once so the N assignment passes
    # re-read checkpoint blocks instead of re-running the scan.
    import math

    n_iter = int(refine)
    base = base.localCheckpoint()
    centroids = [list(v) for v in seeds]
    for _ in range(n_iter):
        first = _assign(base, centroids)
        means = (
            first.select("cluster", F.posexplode("e").alias("pos", "v"))
            .groupBy("cluster", "pos").agg(F.avg("v").alias("m"))
            .collect()
        )
        acc: dict[int, dict[int, float]] = {}
        for r in means:
            acc.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        for c, dims in acc.items():
            vec = [dims[i] for i in range(len(centroids[0]))]
            nrm = math.sqrt(sum(x * x for x in vec)) or 1.0
            centroids[c] = [x / nrm for x in vec]
    assigned = _assign(base, centroids)
    return assigned.localCheckpoint(), centroids


def ivf_assign(sdf: SparkDF, vec_col: str,
               centroids: list[list[float]],
               id_col: str = "vec_id") -> SparkDF:
    """Assign NEW vectors to an EXISTING index's centroids — the
    incremental-ingest primitive behind write_ivf_index's
    mode='append': encode the arriving batch against the FIXED
    centroid set (never re-derive seeds from the new data, which
    would silently build a different index), then append its cells.
    Returns (id, cluster, e) with unit vectors, exactly the
    ivf_index_deterministic assignment shape: one gemm per Arrow
    batch against the broadcast centroid matrix, argmax first-max
    tie-break — bit-identical to what the original index build would
    have assigned, so appended and original rows are
    indistinguishable to every search path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.float64).T  # d × k

    # no type hints: PEP 563 postponed annotations break pandas_udf
    # signature inspection (see ivf_index_deterministic._assign)
    def _argmax(e):
        if e.empty:
            return pd.Series([], dtype="int32")
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in e])
        return pd.Series(np.argmax(m @ cmat, axis=1).astype("int32"))

    base = sdf.select(
        F.col(id_col), unit(to_double(F.col(vec_col))).alias("e"))
    return base.withColumn("cluster",
                           pandas_udf(_argmax, "int")(F.col("e")))


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


def _dropped_in_cells(assigned: SparkDF, threshold: float, id_col: str,
                      cell_cap: int = 4096) -> SparkDF:
    """IDs having a lower-id neighbor at dot >= threshold inside their
    cluster cell — the n²/k pair term of semantic_dedup, computed as
    ONE BLAS gemm per cell (applyInPandas on the cluster key: the
    n_c×d cell matrix times its transpose, lower-triangle threshold
    mask). Replaces the r7 self-join whose per-pair zip_with/aggregate
    dot was interpreted (Catalyst never compiles lambda HOFs; the
    Arrow-batched gemm is the same trade the IVF assignment stage
    made). Measured r8, same-session old-vs-new, identical drop sets:
    sf0.1 (5k×64 vectors) a wash (pair term too small to matter);
    sf1 (20k×64) k=16: old 15.8-34.7 s → new 8.0-8.3 s (~2× warm,
    4× cold), and the k-dependence flattens (new k=16 ≈ k=64 — the
    pair term stops dominating), which is exactly the regime a hot
    low-k index hits at 100 TB. At k=64/small cells old ≈ new: the
    per-group Arrow overhead offsets the gemm win, so the rewrite
    never loses, and wins where cells are large.

    Hot-cell mitigation (skew): a pathological cell (e.g. a near-dup
    flood all landing in one cluster) would make one task quadratic.
    Cells larger than ``cell_cap`` are split into B = ceil(n_c/cap)
    id-hashed blocks and processed as B(B+1)/2 block-pair groups (the
    1-bucket-theta-join decomposition all_pairs_blocked uses), so no
    task ever holds more than ~2·cell_cap vectors regardless of skew;
    pair coverage is exact — every in-cell pair meets in exactly the
    (min-block, max-block) group. The (cluster, n_blocks) routing
    table is computed distributed and BROADCAST-JOINED back on the
    cluster key (r10; it was a collect + create_map literal — at
    10^5-10^6 IVF cells the literal itself becomes a plan-size /
    driver problem, while the broadcast side stays two ints per
    cell). Block routing never changes WHICH pairs are compared, so
    the drop verdict is unchanged and stays oracle-replayable."""
    import numpy as np
    import pandas as pd

    nb_df = (assigned.groupBy("cluster")
             .agg(F.count(F.lit(1)).alias("__n"))
             .select("cluster",
                     F.greatest(
                         F.lit(1),
                         F.ceil(F.col("__n") / F.lit(cell_cap)))
                     .cast("int").alias("__nb")))
    blk = F.pmod(F.hash(F.col(id_col)), F.col("__nb")).cast("int")
    # LEFT join + default 1 block: groupBy emits a NULL-cluster group
    # but an equi-join can't match it back (NULL != NULL), so an inner
    # join would silently exempt null-assigned vectors from the split
    keyed = (
        assigned.join(F.broadcast(nb_df), "cluster", "left")
        .withColumn("__nb", F.coalesce(F.col("__nb"), F.lit(1)))
        .withColumn("__blk", blk)
        .select(
            id_col, "e", "cluster", "__blk",
            F.explode(F.expr(
                "transform(sequence(0, __nb - 1), o -> struct("
                "least(__blk, o) as p, greatest(__blk, o) as q))"))
            .alias("__pq"))
        .select(id_col, "e", "cluster", "__blk",
                F.col("__pq.p").alias("p"), F.col("__pq.q").alias("q")))

    id_type = dict(assigned.dtypes)[id_col]

    def _cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        mat = np.vstack([np.asarray(v, dtype=np.float64)
                         for v in pdf["e"]])
        p = int(pdf["p"].iloc[0])
        q = int(pdf["q"].iloc[0])
        if p == q:
            order = np.argsort(ids)
            ids_s, ms = ids[order], mat[order]
            mask = np.tril(ms @ ms.T >= threshold, -1)
            dropped = ids_s[mask.any(axis=1)]
        else:
            bk = pdf["__blk"].to_numpy()
            ia, ib = ids[bk == p], ids[bk == q]
            if not len(ia) or not len(ib):
                return pd.DataFrame({id_col: ids[:0]})
            m = mat[bk == p] @ mat[bk == q].T >= threshold
            gt = ia[:, None] > ib[None, :]
            dropped = np.concatenate(
                [ia[(m & gt).any(axis=1)], ib[(m & ~gt).any(axis=0)]])
        return pd.DataFrame({id_col: dropped})

    return (keyed.groupBy("cluster", "p", "q")
            .applyInPandas(_cell, schema=f"{id_col} {id_type}")
            .select(id_col).distinct())


def semantic_dedup(sdf: SparkDF, vec_col: str, threshold: float = 0.95,
                   n_clusters: int = 16, id_col: str = "vec_id",
                   cell_cap: int = 4096) -> SparkDF:
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
    by the SQL oracle (argmax of k dot products). The in-cluster pair
    pass shuffles once on the cluster key and scores each cell with
    one Arrow-batched gemm (vectors are unit-normalized by the
    quantizer, so cosine == dot); hot cells are split into bounded
    block-pair tasks — see _dropped_in_cells for both mechanisms. At
    100 TB, write the assigned table partitioned by cluster first and
    the pair pass reads co-located cells.
    """
    assigned, _ = ivf_index_deterministic(
        sdf, vec_col, n_clusters=n_clusters, id_col=id_col)
    dropped = _dropped_in_cells(assigned, threshold, id_col,
                                cell_cap=cell_cap)
    return sdf.join(dropped, id_col, "left_anti")


def ivf_search(assigned: SparkDF, centroids: list[list[float]],
               query: list[float], k: int = 10, n_probe: int = 4,
               id_col: str = "vec_id") -> SparkDF:
    """Probe the n_probe nearest clusters only — partition pruning for
    vector search (the filter on `cluster` prunes at the scan when the
    index is written partitioned-by-cluster). Probe-side scoring is
    the Arrow-batched gemv (_cosine_to_query_udf) — the probe scan
    covers ~n·n_probe/k rows, previously each paying the interpreted
    HOF fold."""
    import math

    def cos(u, v):
        du = math.sqrt(sum(x * x for x in u))
        dv = math.sqrt(sum(x * x for x in v))
        return sum(x * y for x, y in zip(u, v)) / (du * dv or 1.0)

    probes = sorted(range(len(centroids)),
                    key=lambda i: -cos(centroids[i], query))[:n_probe]
    scorer = _cosine_to_query_udf(query)
    return (
        assigned.filter(F.col("cluster").isin(probes))
        .select(F.col(id_col),
                F.round(scorer(F.col("e")), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ------------------------------------------------------------------- PQ
def pq_codebook(sdf: SparkDF, vec_col: str, id_col: str = "vec_id",
                m: int = 8, nbits: int = 4,
                refine: int = 0) -> list[list[list[float]]]:
    """Deterministic product-quantization codebook (Jégou, Douze &
    Schmid, TPAMI 2011 — the public PQ formulation): the d dims split
    into ``m`` subspaces; each subspace's 2^nbits centroids are the
    corresponding subvectors of the 2^nbits smallest-id rows (the same
    fixed-'random' seeding ivf_index_deterministic uses, so the whole
    index — and therefore search results — is bit-reproducible across
    partitionings and replayable by the SQL oracle). Returns
    m × 2^nbits × (d/m).

    ``refine`` > 0 runs that many per-subspace Lloyd iterations on
    top of the seeds — the trained-codebook step FAISS does, which
    buys quantization error (and recall) on real data where the
    smallest-id rows are a poor net. Each iteration is ONE Arrow
    pass emitting per-(subspace, code) partial sums/counts at
    centroid size (m·2^nbits·(d/m) scalars collected — constant,
    never data-sized) + a tiny groupBy; empty cells keep their
    previous centroid, so the codebook shape is stable. The gated
    strata pin refine=0 (the oracle replays smallest-id seeding);
    refined codebooks are float means, deterministic for a fixed
    partition layout but — like the IVF refine path — with last-ulp
    layout sensitivity inherent to distributed averaging."""
    import numpy as np

    k = 1 << nbits
    # k SMALLEST ids, not ids < k: sparse/offset id spaces would
    # silently undersize the codebook under the filter form
    # top-k first, cast-transform after (r14): the projected form
    # evaluated the interpreted per-element cast over every row just
    # to collect 2^nbits seeds (same fix as the IVF seed collect)
    rows = (sdf.select(F.col(id_col).alias("i"), F.col(vec_col))
            .orderBy("i").limit(k)
            .select("i", to_double(F.col(vec_col)).alias("e"))
            .collect())
    if len(rows) < k:
        raise ValueError(
            f"pq_codebook needs >= {k} rows (2^nbits); got {len(rows)}")
    vecs = [list(r["e"]) for r in rows]
    d = len(vecs[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    codebook = [[v[s * ds:(s + 1) * ds] for v in vecs]
                for s in range(m)]
    if not refine:
        return codebook

    import pandas as pd

    base = sdf.select(to_double(F.col(vec_col)).alias("__e"))
    for _ in range(refine):
        cents = [np.asarray(cb, dtype=np.float64) for cb in codebook]

        def gen(batches, _cents=cents):
            sums = np.zeros((m, k, ds))
            cnts = np.zeros((m, k), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.vstack([np.asarray(v, dtype=np.float64)
                               for v in pdf["__e"]])
                for s in range(m):
                    xs = x[:, s * ds:(s + 1) * ds]
                    code = ((xs[:, None, :] - _cents[s][None, :, :])
                            ** 2).sum(axis=2).argmin(axis=1)
                    np.add.at(sums[s], code, xs)
                    np.add.at(cnts[s], code, 1)
            s_idx, c_idx = np.nonzero(cnts)
            yield pd.DataFrame({
                "s": np.repeat(s_idx, ds).astype("int32"),
                "c": np.repeat(c_idx, ds).astype("int32"),
                "pos": np.tile(np.arange(ds, dtype="int32"),
                               len(s_idx)),
                "sm": sums[s_idx, c_idx].ravel(),
                "n": np.repeat(cnts[s_idx, c_idx], ds),
            })

        parts = (base.mapInPandas(
            gen, "s int, c int, pos int, sm double, n long")
            .groupBy("s", "c", "pos")
            .agg(F.sum("sm").alias("sm"), F.sum("n").alias("n"))
            .collect())
        for r in parts:
            if r["n"]:
                codebook[r["s"]][r["c"]][r["pos"]] = r["sm"] / r["n"]
    return codebook


def pq_encode(sdf: SparkDF, vec_col: str,
              codebook: list[list[list[float]]],
              id_col: str = "vec_id",
              keep_cols: tuple = ()) -> SparkDF:
    """(id, [keep_cols...], codes: array<int>) — each row compressed
    to ``m`` small codes (argmin subspace centroid; first-min
    tie-break matches the SQL replay's (dist, c) ordering). One Arrow
    batch → m small distance blocks via numpy broadcasting; at 100 TB
    this pass is the index build. ``keep_cols`` pass extra columns
    through the encode (e.g. the IVF ``cluster``) so callers don't
    need a corpus-sized re-join on the id. The m-byte logical code
    row (~64× smaller than the float32 vector; stored as array<int>,
    so realized at rest via parquet dictionary/bit-packing rather
    than in Spark memory) is what lets the search-side scan stay
    RAM-resident."""
    import numpy as np
    import pandas as pd

    cents = [np.asarray(cb, dtype=np.float64) for cb in codebook]
    m = len(cents)
    ds = cents[0].shape[1]
    dtypes = dict(sdf.dtypes)
    base = sdf.select(F.col(id_col),
                      *[F.col(c) for c in keep_cols],
                      to_double(F.col(vec_col)).alias("__e"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__e"]])
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * ds:(s + 1) * ds]
                # direct (x-c)^2 block; len-ds inner sums are
                # sequential in numpy, matching the SQL fold order
                dist = ((xs[:, None, :] - cents[s][None, :, :]) ** 2
                        ).sum(axis=2)
                codes[:, s] = np.argmin(dist, axis=1)
            out = {id_col: pdf[id_col].to_numpy()}
            for c in keep_cols:
                out[c] = pdf[c].to_numpy()
            out["codes"] = list(codes)
            yield pd.DataFrame(out)

    schema = ", ".join(
        [f"{id_col} {dtypes[id_col]}"]
        + [f"{c} {dtypes[c]}" for c in keep_cols]
        + ["codes array<int>"])
    return base.mapInPandas(gen, schema=schema)


def pq_search(codes_df: SparkDF, codebook: list[list[list[float]]],
              query: list[float], k: int = 10,
              id_col: str = "vec_id") -> SparkDF:
    """Asymmetric-distance (ADC) top-k over PQ codes: the m × 2^nbits
    query-to-centroid table is computed ONCE on the driver and inlined
    as literal arrays, so the scan is pure JVM arithmetic —
    ``Σ_s table[s][code_s]`` via element_at — with NO Python, no
    vector column read, and TakeOrderedAndProject for the top-k. The
    distances are approximations of ‖q−x‖²; ties break on the id."""
    m = len(codebook)
    ds = len(codebook[0][0])
    q = [float(v) for v in query]
    tables = []
    for s in range(m):
        qs = q[s * ds:(s + 1) * ds]
        tables.append([
            sum((qs[i] - c[i]) ** 2 for i in range(ds))
            for c in codebook[s]])
    dist = None
    for s in range(m):
        term = F.element_at(
            F.array(*[F.lit(v) for v in tables[s]]),
            F.element_at(F.col("codes"), s + 1) + 1)
        dist = term if dist is None else dist + term
    out = codes_df.select(F.col(id_col),
                          F.round(dist, 6).alias("adc_dist"))
    return out.orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(k)


def ivfpq_index(sdf: SparkDF, vec_col: str, n_clusters: int = 16,
                m: int = 8, nbits: int = 4, id_col: str = "vec_id",
                coarse_refine: int = 0):
    """The production ANN index shape (FAISS-style IVF+PQ, both from
    the public formulations): coarse IVF cells for probe pruning plus
    PQ codes for in-cell scanning. Returns (index_df, centroids,
    codebook) where index_df = (id, cluster, codes) — at 100 TB this
    is the table you write partitioned by cluster: a query touches
    n_probe/k of the data AND reads m-byte codes instead of d-double
    vectors, multiplicative savings. Both components keep their
    deterministic seeding, so the whole index is bit-reproducible."""
    assigned, centroids = ivf_index_deterministic(
        sdf, vec_col, n_clusters=n_clusters, id_col=id_col,
        refine=coarse_refine)
    codebook = pq_codebook(sdf, vec_col, id_col=id_col, m=m, nbits=nbits)
    codes = pq_encode(sdf, vec_col, codebook, id_col=id_col)
    index = assigned.select(id_col, "cluster").join(codes, id_col)
    return index, centroids, codebook


def ivfpq_search(index: SparkDF, centroids: list[list[float]],
                 codebook: list[list[list[float]]], query: list[float],
                 k: int = 10, n_probe: int = 4,
                 id_col: str = "vec_id") -> SparkDF:
    """Probe the n_probe nearest IVF cells, then ADC top-k over the
    codes — the cluster filter prunes at the scan (write the index
    partitioned by cluster) and the ADC scan is pure JVM arithmetic
    over m-byte codes (see pq_search). No vector column is read at
    query time at all."""
    import math

    def cos(u, v):
        du = math.sqrt(sum(x * x for x in u))
        dv = math.sqrt(sum(x * x for x in v))
        return sum(x * y for x, y in zip(u, v)) / (du * dv or 1.0)

    probes = sorted(range(len(centroids)),
                    key=lambda i: -cos(centroids[i], query))[:n_probe]
    return pq_search(index.filter(F.col("cluster").isin(probes)),
                     codebook, query, k=k, id_col=id_col)


def _residual_frame(assigned: SparkDF, centroids: list[list[float]],
                    id_col: str = "vec_id") -> SparkDF:
    """(id, cluster, r) where r = unit(x) − centroid[cluster] — one
    Arrow pass (batch matrix minus gathered centroid rows); float
    subtraction is exact, so residuals replay bit-identically in
    numpy/SQL given the deterministic assignment."""
    import numpy as np
    import pandas as pd

    cmat = np.asarray(centroids, dtype=np.float64)
    id_type = dict(assigned.dtypes)[id_col]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["e"]])
            r = e - cmat[pdf["cluster"].to_numpy()]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "cluster": pdf["cluster"],
                "r": [list(map(float, v)) for v in r],
            })

    return assigned.mapInPandas(
        gen, f"{id_col} {id_type}, cluster int, r array<double>")


def ivfadc_index(sdf: SparkDF, vec_col: str, n_clusters: int = 16,
                 m: int = 8, nbits: int = 4, id_col: str = "vec_id",
                 refine: int = 0, coarse_refine: int = 0):
    """FAISS's actual IVFADC layout (Jégou TPAMI'11 §IV): PQ encodes
    the RESIDUAL unit(x) − centroid[cluster], not the raw vector.
    Residuals concentrate around 0 with far less variance than the
    vectors themselves, so the same m×2^nbits code budget spends its
    resolution inside the cell — the standard accuracy step over
    ivfpq_index's raw-vector codes (kept for its simpler oracle).
    Returns (index_df = (id, cluster, codes), centroids, codebook);
    write the index partitionBy(cluster) exactly like ivfpq. All
    seeding stays deterministic (smallest-id IVF seeds, smallest-id
    residual codebook seeds), so the whole index is bit-reproducible
    and SQL-replayable; ``refine`` adds Lloyd iterations on the
    residual codebook (pq_codebook refine semantics)."""
    import numpy as np
    import pandas as pd

    assigned, centroids = ivf_index_deterministic(
        sdf, vec_col, n_clusters=n_clusters, id_col=id_col,
        refine=coarse_refine)
    cmat = np.asarray(centroids, dtype=np.float64)
    d = cmat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    kcodes = 1 << nbits
    # codebook seeds = residuals of the kcodes smallest ids — a
    # TakeOrdered collect of kcodes rows, residuals computed on the
    # driver; the refine=0 path never materializes corpus residuals
    seed_rows = (assigned.orderBy(id_col).limit(kcodes)
                 .select(id_col, "cluster", "e").collect())
    if len(seed_rows) < kcodes:
        raise ValueError(
            f"ivfadc_index needs >= {kcodes} rows (2^nbits); "
            f"got {len(seed_rows)}")
    seed_rows = sorted(seed_rows, key=lambda r: r[id_col])
    codebook = [[
        [float(r["e"][s * ds + i] - cmat[r["cluster"]][s * ds + i])
         for i in range(ds)]
        for r in seed_rows] for s in range(m)]
    if refine:
        # Lloyd iterations need corpus residuals — materialize them
        # for the training passes only — snapshot it once (same
        # rationale as ivf_index_deterministic's localCheckpoint:
        # don't re-run the Python stage per consumer)
        res = _residual_frame(assigned, centroids,
                              id_col=id_col).localCheckpoint()
        codebook = pq_codebook(res, "r", id_col=id_col, m=m,
                               nbits=nbits, refine=refine)

    # fused residual + encode: ONE Arrow pass over the assigned
    # frame (subtract the gathered centroid row, then m argmin
    # blocks), cluster riding through — no second corpus
    # materialization, no corpus-sized id re-join
    cents = [np.asarray(cb, dtype=np.float64) for cb in codebook]
    id_type = dict(assigned.dtypes)[id_col]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["e"]])
            r = e - cmat[pdf["cluster"].to_numpy()]
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                xs = r[:, s * ds:(s + 1) * ds]
                dist = ((xs[:, None, :] - cents[s][None, :, :]) ** 2
                        ).sum(axis=2)
                codes[:, s] = np.argmin(dist, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "cluster": pdf["cluster"].to_numpy(),
                                "codes": list(codes)})

    index = assigned.mapInPandas(
        gen, schema=f"{id_col} {id_type}, cluster int, "
                    "codes array<int>")
    return index, centroids, codebook


def ivfadc_search(index: SparkDF, centroids: list[list[float]],
                  codebook: list[list[list[float]]],
                  query: list[float], k: int = 10, n_probe: int = 4,
                  id_col: str = "vec_id") -> SparkDF:
    """IVFADC top-k: probe the n_probe nearest cells; in each cell
    the ADC table is built from the QUERY RESIDUAL unit(q) − that
    cell's centroid (per-cell tables — the residual trick's cost is
    n_probe driver-side table builds, still constant-sized). ONE
    pruned scan: the isin(probes) filter prunes cluster partitions,
    the per-cell table is selected by array_position(cluster) from a
    2-level literal (m · n_probe · 2^nbits inlined doubles — pure
    JVM, no Python, no union of per-cell jobs), and the top-k is a
    single TakeOrderedAndProject. Distances approximate
    ‖unit(q)−unit(x)‖², rank-equivalent to cosine."""
    import math

    q = [float(v) for v in query]
    nq = math.sqrt(sum(x * x for x in q)) or 1.0
    qu = [x / nq for x in q]

    def dot(u, v):
        return sum(a * b for a, b in zip(u, v))

    probes = sorted(range(len(centroids)),
                    key=lambda i: (-dot(centroids[i], qu), i))[:n_probe]
    m = len(codebook)
    ds = len(codebook[0][0])
    # tables[p][s][c] = ‖(qu − centroid_p)[s] − codebook[s][c]‖²,
    # sequential inner sums (the SQL fold order)
    tables = []
    for p in probes:
        qr = [qu[i] - centroids[p][i] for i in range(len(qu))]
        tables.append([
            [sum((qr[s * ds + i] - c[i]) ** 2 for i in range(ds))
             for c in codebook[s]]
            for s in range(m)])
    probe_arr = F.array(*[F.lit(int(p)) for p in probes])
    prank = F.array_position(probe_arr, F.col("cluster")).cast("int")
    dist = None
    for s in range(m):
        tbl2 = F.array(*[
            F.array(*[F.lit(v) for v in tables[pi][s]])
            for pi in range(len(probes))])
        term = F.element_at(
            F.element_at(tbl2, prank),
            F.element_at(F.col("codes"), s + 1) + 1)
        dist = term if dist is None else dist + term
    return (index.filter(F.col("cluster").isin([int(p) for p in probes]))
            .select(F.col(id_col), F.round(dist, 6).alias("adc_dist"))
            .orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(k))


# ------------------------------------------------------------------ SQ8
def sq8_train(sdf: SparkDF, vec_col: str, dim: int | None = None
              ) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) bounds for 8-bit scalar quantization
    (the FAISS ``ScalarQuantizer QT_8bit`` formulation, from the
    public FAISS docs/paper — Johnson, Douze & Jégou, IEEE TBD 2019).
    Min/max are order-independent on doubles, so the bounds — and
    everything derived from them — are partition-layout independent
    and SQL-replayable whichever plan computes them. Two plans by
    width: d ≤ 64 emits all 2·d bounds as codegen'd JVM min/max
    aggregates in ONE projection (no shuffle beyond the final 1-row
    reduce); wider vectors (modern embedding widths, d=1024-4096)
    would make that a 2·d-column aggregate row and a plan-size
    hazard, so they run ONE posexplode → groupBy(pos) pass instead —
    still a single bandwidth-bound scan, plus one d-row shuffle.
    Both are pure JVM. Reference capability analog:
    mars/learn/neighbors ANN backends (proxima quantizers)."""
    if dim is None:
        dim = sdf.select(F.size(F.col(vec_col))).first()[0]
    v = to_double(F.col(vec_col))
    if dim <= 64:
        aggs = []
        for i in range(dim):
            x = F.element_at(v, i + 1)
            aggs.append(F.min(x).alias(f"mn{i}"))
            aggs.append(F.max(x).alias(f"mx{i}"))
        row = sdf.agg(*aggs).collect()[0]
        mins = [float(row[f"mn{i}"]) for i in range(dim)]
        maxs = [float(row[f"mx{i}"]) for i in range(dim)]
        return mins, maxs
    per_dim = (sdf.select(F.posexplode(v).alias("pos", "x"))
               .groupBy("pos")
               .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
               .collect())
    mins, maxs = [0.0] * dim, [0.0] * dim
    for r in per_dim:
        mins[r["pos"]] = float(r["mn"])
        maxs[r["pos"]] = float(r["mx"])
    return mins, maxs


def sq8_encode(sdf: SparkDF, vec_col: str, mins: list[float],
               maxs: list[float], id_col: str = "vec_id") -> SparkDF:
    """(id, codes: array<int>) — each dimension quantized to one byte:
    ``code_i = clip(floor((x_i − min_i)·(255/(max_i−min_i)) + 0.5))``
    (the floor(x+0.5) form is the cross-engine deterministic rounding
    rule — Spark and DuckDB round() disagree on decimal halves).
    Degenerate dims (max == min) encode as 0. All d expressions are
    native Column arithmetic inside one projection — pure JVM
    whole-stage codegen, no Python. The 1-byte/dim compression is
    LOGICAL: Spark stores the codes as array<int> in memory, and the
    4× (vs float32) shrink is realized at rest by parquet's
    dictionary/bit-packed encoding of the 0..255 values, not in the
    in-memory row. Unlike PQ there is no codebook lookup at decode
    time, just an affine map, so recall is higher at lower
    compression."""
    d = len(mins)
    v = to_double(F.col(vec_col))
    codes = []
    for i in range(d):
        if maxs[i] > mins[i]:
            inv = 255.0 / (maxs[i] - mins[i])
            c = F.floor((F.element_at(v, i + 1) - F.lit(mins[i]))
                        * F.lit(inv) + F.lit(0.5))
            c = F.least(F.lit(255), F.greatest(F.lit(0), c))
        else:
            c = F.lit(0)
        codes.append(c.cast("int"))
    return sdf.select(F.col(id_col), F.array(*codes).alias("codes"))


def sq8_search(codes_df: SparkDF, mins: list[float], maxs: list[float],
               query: list[float], k: int = 10,
               id_col: str = "vec_id") -> SparkDF:
    """Asymmetric-distance top-k over SQ8 codes: each dim reconstructs
    as ``min_i + code_i·step_i`` (step = (max−min)/255; degenerate
    dims contribute (q_i − min_i)²) and the squared L2 distance is a
    left-fold sum of d native terms — pure JVM arithmetic with the
    query/bounds inlined as literals, NO Python, no vector column
    read, TakeOrderedAndProject for the top-k. Composes with IVF
    exactly like pq_search: filter the codes frame on `cluster`
    first and the scan prunes to the probed cells."""
    d = len(mins)
    q = [float(x) for x in query]
    dist = None
    for i in range(d):
        if maxs[i] > mins[i]:
            step = (maxs[i] - mins[i]) / 255.0
            recon = (F.lit(mins[i])
                     + F.element_at(F.col("codes"), i + 1) * F.lit(step))
        else:
            recon = F.lit(mins[i])
        term = (F.lit(q[i]) - recon)
        term = term * term
        dist = term if dist is None else dist + term
    out = codes_df.select(F.col(id_col),
                          F.round(dist, 6).alias("adc_dist"))
    return out.orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(k)


def sq8_index(sdf: SparkDF, vec_col: str, id_col: str = "vec_id",
              dim: int | None = None):
    """Convenience: train bounds + encode in one call. Returns
    (codes_df, mins, maxs). For the IVF-composed form, join the codes
    against an ivf_index assignment on the id and write
    partitionBy(cluster) — queries then prune cells AND read 1-byte
    codes instead of float vectors."""
    mins, maxs = sq8_train(sdf, vec_col, dim=dim)
    return sq8_encode(sdf, vec_col, mins, maxs, id_col=id_col), mins, maxs


def ivfsq8_index(sdf: SparkDF, vec_col: str, n_clusters: int = 16,
                 id_col: str = "vec_id", coarse_refine: int = 0):
    """IVF + SQ8 composition (the ivfpq_index twin at the other point
    on the compression/recall curve): coarse cells for probe pruning,
    1-byte-per-dim codes for the in-cell scan. Returns (index_df,
    centroids, mins, maxs) where index_df = (id, cluster, codes) —
    write it partitionBy(cluster) (write_ivf_index) and a query
    touches n_probe/k of the data while reading 4×-compressed codes,
    at higher recall than PQ's subspace codebooks."""
    assigned, centroids = ivf_index_deterministic(
        sdf, vec_col, n_clusters=n_clusters, id_col=id_col,
        refine=coarse_refine)
    codes, mins, maxs = sq8_index(sdf, vec_col, id_col=id_col)
    index = assigned.select(id_col, "cluster").join(codes, id_col)
    return index, centroids, mins, maxs


def ivfsq8_search(index: SparkDF, centroids: list[list[float]],
                  mins: list[float], maxs: list[float],
                  query: list[float], k: int = 10, n_probe: int = 4,
                  id_col: str = "vec_id") -> SparkDF:
    """Probe the n_probe nearest IVF cells, ADC top-k over the SQ8
    codes — the cluster filter prunes at the scan on a
    cluster-partitioned index, and the ADC scan is pure JVM
    arithmetic over the codes; the vector column is never read."""
    import math

    def cos(u, v):
        du = math.sqrt(sum(x * x for x in u))
        dv = math.sqrt(sum(x * x for x in v))
        return sum(x * y for x, y in zip(u, v)) / (du * dv or 1.0)

    probes = sorted(range(len(centroids)),
                    key=lambda i: -cos(centroids[i], query))[:n_probe]
    return sq8_search(index.filter(F.col("cluster").isin(probes)),
                      mins, maxs, query, k=k, id_col=id_col)


# -------------------------------------------------- binary quantization
def bq1_train(sdf: SparkDF, vec_col: str, dim: int | None = None
              ) -> list[float]:
    """Per-dimension binarization thresholds for 1-bit quantization
    (the FAISS IndexBinaryFlat family, public formulation). The
    threshold is the per-dim (min+max)/2 midpoint — derived from the
    same order-exact min/max aggregation sq8_train uses, so the
    thresholds (and every code downstream) are partition-layout
    independent and SQL-replayable; a mean threshold would be
    order-dependent in its last bits across engines."""
    mins, maxs = sq8_train(sdf, vec_col, dim=dim)
    return [(mn + mx) / 2.0 for mn, mx in zip(mins, maxs)]


def _bq1_words(vals, thresholds: list[float], as_python: bool):
    """Shared pack layout: bit j of word w is dim 32·w+j, so a d-dim
    vector becomes ceil(d/32) BIGINT words, each < 2^32 (no sign
    traps in either engine). `vals` is a Column (as_python=False) or
    a python list (True)."""
    d = len(thresholds)
    n_words = (d + 31) // 32
    words = []
    for w in range(n_words):
        if as_python:
            acc = 0
            for j in range(min(32, d - 32 * w)):
                i = 32 * w + j
                if float(vals[i]) > thresholds[i]:
                    acc += 1 << j
            words.append(acc)
        else:
            acc = F.lit(0).cast("long")
            for j in range(min(32, d - 32 * w)):
                i = 32 * w + j
                bit = (F.element_at(vals, i + 1)
                       > F.lit(thresholds[i])).cast("long")
                acc = acc + bit * F.lit(1 << j)
            words.append(acc)
    return words


def bq1_encode(sdf: SparkDF, vec_col: str, thresholds: list[float],
               id_col: str = "vec_id") -> SparkDF:
    """(id, words: array<bigint>) — each vector packed to 1 bit per
    dim (bit j of word w = dim 32·w+j > threshold), ceil(d/32) words.
    Pure integer Column arithmetic — JVM codegen, no Python. The 1
    bit/dim compression is LOGICAL: in Spark memory each word is a
    full 8-byte long in an array<bigint> (two longs for d=64), so the
    32× shrink vs float32 is what the BIT layout admits — realized at
    rest by parquet encodings and by the fact that a Hamming scan
    touches ceil(d/32) integer words instead of d floats, which is
    what makes exhaustive scans bandwidth-cheap at 100 TB."""
    v = to_double(F.col(vec_col))
    words = _bq1_words(v, thresholds, as_python=False)
    return sdf.select(F.col(id_col), F.array(*words).alias("words"))


def bq1_encode_query(query: list[float],
                     thresholds: list[float]) -> list[int]:
    """Driver-side query packing (same bit layout as bq1_encode)."""
    return _bq1_words([float(x) for x in query], thresholds,
                      as_python=True)


def hamming_search(words_df: SparkDF, query_words: list[int],
                   k: int = 10, id_col: str = "vec_id") -> SparkDF:
    """Exact Hamming top-k over packed binary codes:
    ``Σ_w bit_count(words[w] XOR q_w)`` — pure JVM bit arithmetic
    with the query words inlined as literals, no Python, no vector
    column read, TakeOrderedAndProject for the top-k (id
    tie-break). The standard re-rank recipe: Hamming top-(c·k) here,
    then exact cosine on the c·k survivors only."""
    dist = None
    for w, qw in enumerate(query_words):
        term = F.bit_count(
            F.element_at(F.col("words"), w + 1)
            .bitwiseXOR(F.lit(int(qw))))
        dist = term if dist is None else dist + term
    out = words_df.select(F.col(id_col),
                          dist.cast("int").alias("hamming"))
    return out.orderBy(F.asc("hamming"), F.asc(id_col)).limit(k)


def bq1_index(sdf: SparkDF, vec_col: str, id_col: str = "vec_id",
              dim: int | None = None):
    """Convenience: thresholds + packed codes in one call. Returns
    (words_df, thresholds)."""
    thresholds = bq1_train(sdf, vec_col, dim=dim)
    return bq1_encode(sdf, vec_col, thresholds, id_col=id_col), thresholds


def bq1_rerank_search(sdf: SparkDF, vec_col: str, words_df: SparkDF,
                      thresholds: list[float], query: list[float],
                      k: int = 10, expand: int = 4,
                      id_col: str = "vec_id") -> SparkDF:
    """The standard two-stage recipe productized: Hamming top-(expand
    ·k) over the packed 1-bit codes (the cheap stage — a bandwidth-
    trivial scan of 8-byte rows, never the vectors), then EXACT
    cosine re-rank of just those expand·k survivors against the
    vector table. The survivor id set is k·expand rows, so the
    rejoin broadcasts; the expensive gemv touches only the
    candidates. Returns topk_bruteforce's (id, cos_sim) shape —
    exact scores, binary-scan candidate cost. Recall vs the true
    top-k is governed by `expand` (the survivors are a superset of
    the Hamming-nearest, not guaranteed to contain every cosine
    winner — raise expand where the margin matters)."""
    qw = bq1_encode_query([float(x) for x in query], thresholds)
    cand = (hamming_search(words_df, qw, k=expand * k, id_col=id_col)
            .select(id_col))
    surv = sdf.join(F.broadcast(cand), id_col)
    return topk_bruteforce(surv, vec_col, query, k=k, id_col=id_col)


# ------------------------------------------------- batched query tables
def _collect_queries(queries: SparkDF, query_id_col: str,
                     query_vec_col: str):
    """Driver-collect the query table (the BROADCAST side of every
    batched search — queries ≪ corpus is the contract; a query set
    too big to broadcast needs block-partitioned all-pairs, which is
    near_dup_pairs/all_pairs_blocked territory, not top-k search).
    Returns (qids, Q, Qn) with rows ordered by query id for
    deterministic iteration."""
    import numpy as np

    rows = (queries.select(query_id_col, query_vec_col)
            .orderBy(query_id_col).collect())
    if not rows:
        raise ValueError("empty query table")
    qids = [r[query_id_col] for r in rows]
    Q = np.vstack([np.asarray(r[query_vec_col], dtype=np.float64)
                   for r in rows])
    Qn = np.linalg.norm(Q, axis=1)
    Qn[Qn == 0.0] = 1.0
    return qids, Q, Qn


def _round_half_away(x, ndigits: int = 4):
    """Vectorized HALF_UP (away from zero) — the rounding BOTH Spark's
    round() and DuckDB's round() apply to doubles, so scores rounded
    here order identically in the engine, the window re-rank, and the
    SQL oracle (numpy's np.round is banker's and would disagree on
    exact halves)."""
    import numpy as np

    p = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def _gemm_partial_topk(base: SparkDF, qids, Q, Qn, k: int, id_col: str,
                       id_type: str, qid_type: str,
                       query_id_col: str) -> SparkDF:
    """ONE corpus pass scores EVERY query (per-Arrow-batch gemm:
    batch × dim @ dim × q) and keeps only the per-batch top-k per
    query — so the global re-rank window runs over ≤ batches·q·k
    candidate rows, never the n·q cross product. This is the batched
    twin of topk_bruteforce's TakeOrderedAndProject: partial top-k
    map-side, tiny global merge."""
    import numpy as np
    import pandas as pd

    kq = len(qids)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__e"]])
            Xn = np.linalg.norm(X, axis=1)
            Xn[Xn == 0.0] = 1.0
            S = _round_half_away((X @ Q.T) / (Xn[:, None] * Qn[None, :]))
            ids = pdf["__id"].to_numpy()
            kk = min(k, len(pdf))
            out_q, out_i, out_s = [], [], []
            for j in range(kq):
                # deterministic per-batch top-k: rounded score desc,
                # id asc — the exact order the global window re-ranks
                # by, so the partial top-k never drops a global winner
                order = np.lexsort((ids, -S[:, j]))[:kk]
                out_q.extend([qids[j]] * kk)
                out_i.extend(ids[order])
                out_s.extend(S[order, j])
            yield pd.DataFrame({"__qid": out_q, "__cid": out_i,
                                "__s": out_s})

    from pyspark.sql import Window

    part = base.mapInPandas(
        gen, schema=f"__qid {qid_type}, __cid {id_type}, __s double")
    w = (Window.partitionBy("__qid")
         .orderBy(F.col("__s").desc(), F.col("__cid").asc()))
    return (part.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select(F.col("__qid").alias(query_id_col),
                    F.col("__cid").alias(id_col),
                    F.col("__s").alias("cos_sim")))


def topk_bruteforce_queries(sdf: SparkDF, vec_col: str, queries: SparkDF,
                            k: int = 10, id_col: str = "vec_id",
                            query_id_col: str = "query_id",
                            query_vec_col: str = "q") -> SparkDF:
    """Batched exact top-k: a (query_id, vector) TABLE scored in ONE
    corpus pass (the real-user shape — per-query topk_bruteforce
    loops scan the corpus once per query). Returns (query_id, id,
    cos_sim) rows, k per query, cosine rounded 4dp with id
    tie-breaks. Scores ride a per-Arrow-batch gemm — batching over
    queries exactly as the row dimension batches — with per-batch
    partial top-k, so the final window re-rank touches only
    batches·q·k rows."""
    qids, Q, Qn = _collect_queries(queries, query_id_col, query_vec_col)
    qid_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(sdf.dtypes)[id_col]
    base = sdf.select(F.col(id_col).alias("__id"),
                      to_double(F.col(vec_col)).alias("__e"))
    return _gemm_partial_topk(base, qids, Q, Qn, k, id_col, id_type,
                              qid_type, query_id_col)


def ivf_search_queries(assigned: SparkDF, centroids: list[list[float]],
                       queries: SparkDF, k: int = 10, n_probe: int = 4,
                       id_col: str = "vec_id",
                       query_id_col: str = "query_id",
                       query_vec_col: str = "q") -> SparkDF:
    """Batched IVF probe: per-query probe lists computed driver-side
    from the (tiny, literal) centroid table, shipped as a BROADCAST
    (query_id, cluster) probe table joined against the cell-assigned
    index — on a cluster-partitioned index the broadcast join enables
    dynamic partition pruning, the batched twin of the single-query
    isin() pushdown. Survivor rows (~n·n_probe/n_clusters per query)
    then score through the same one-pass gemm partial top-k."""
    import math

    import numpy as np

    qids, Q, Qn = _collect_queries(queries, query_id_col, query_vec_col)
    qid_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(assigned.dtypes)[id_col]
    C = np.asarray(centroids, dtype=np.float64)
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0.0] = 1.0
    sim = (Q @ C.T) / (Qn[:, None] * Cn[None, :])
    probe_rows = []
    for j, qid in enumerate(qids):
        order = sorted(range(len(centroids)), key=lambda c: -sim[j, c])
        probe_rows.extend((qid, int(c)) for c in order[:n_probe])
    spark = assigned.sparkSession
    probes = F.broadcast(spark.createDataFrame(
        probe_rows, f"__pq {qid_type}, cluster int"))
    # the probe join fans each surviving row out to the queries that
    # probe its cell; scoring then only needs THAT query's column of
    # the gemm — slice per batch via the carried query id
    surv = (assigned.join(probes, "cluster")
            .select(F.col("__pq"), F.col(id_col).alias("__id"),
                    F.col("e").alias("__e")))

    import pandas as pd

    qindex = {qid: i for i, qid in enumerate(qids)}

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf["__e"]])
            Xn = np.linalg.norm(X, axis=1)
            Xn[Xn == 0.0] = 1.0
            qi = np.asarray([qindex[q] for q in pdf["__pq"]])
            s = _round_half_away(
                np.einsum("bd,bd->b", X, Q[qi]) / (Xn * Qn[qi]))
            out = pd.DataFrame({"__qid": pdf["__pq"].to_numpy(),
                                "__cid": pdf["__id"].to_numpy(),
                                "__s": s})
            # per-batch partial top-k per query present in the batch
            out = (out.sort_values(["__qid", "__s", "__cid"],
                                   ascending=[True, False, True])
                   .groupby("__qid", sort=False).head(k))
            yield out

    from pyspark.sql import Window

    part = surv.mapInPandas(
        gen, schema=f"__qid {qid_type}, __cid {id_type}, __s double")
    w = (Window.partitionBy("__qid")
         .orderBy(F.col("__s").desc(), F.col("__cid").asc()))
    return (part.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select(F.col("__qid").alias(query_id_col),
                    F.col("__cid").alias(id_col),
                    F.col("__s").alias("cos_sim")))


def pq_search_queries(codes_df: SparkDF, codebook: list[list[list[float]]],
                      queries: SparkDF, k: int = 10,
                      id_col: str = "vec_id",
                      query_id_col: str = "query_id",
                      query_vec_col: str = "q") -> SparkDF:
    """Batched ADC top-k: the q × m × 2^nbits query-to-centroid
    distance tensor is computed once on the driver (exactly the
    single-query pq_search table, batched over queries) and applied
    per Arrow batch as a numpy gather over the code rows — ONE pass
    over the m-byte codes scores every query; per-batch partial
    top-k keeps the global window tiny. The vector column is never
    read, same as the single-query path."""
    import numpy as np
    import pandas as pd

    qids, Q, _ = _collect_queries(queries, query_id_col, query_vec_col)
    qid_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(codes_df.dtypes)[id_col]
    m = len(codebook)
    ds = len(codebook[0][0])
    # T[q, s, c] = ||query_q[s] - centroid_{s,c}||^2
    C = np.asarray(codebook, dtype=np.float64)        # m x 2^nbits x ds
    T = np.empty((len(qids), m, C.shape[1]), dtype=np.float64)
    for s in range(m):
        qs = Q[:, s * ds:(s + 1) * ds]                # q x ds
        diff = qs[:, None, :] - C[s][None, :, :]      # q x 2^nbits x ds
        T[:, s, :] = (diff * diff).sum(axis=2)
    kq = len(qids)

    base = codes_df.select(F.col(id_col).alias("__id"), "codes")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack([np.asarray(c, dtype=np.int64)
                               for c in pdf["codes"]])      # b x m
            ids = pdf["__id"].to_numpy()
            # gather: d[b, q] = sum_s T[q, s, codes[b, s]]
            d = np.zeros((len(pdf), kq), dtype=np.float64)
            for s in range(m):
                d += T[:, s, :][:, codes[:, s]].T        # b x q
            d = _round_half_away(d, 6)
            kk = min(k, len(pdf))
            out_q, out_i, out_d = [], [], []
            for j in range(kq):
                order = np.lexsort((ids, d[:, j]))[:kk]
                out_q.extend([qids[j]] * kk)
                out_i.extend(ids[order])
                out_d.extend(d[order, j])
            yield pd.DataFrame({"__qid": out_q, "__cid": out_i,
                                "__d": out_d})

    from pyspark.sql import Window

    part = base.mapInPandas(
        gen, schema=f"__qid {qid_type}, __cid {id_type}, __d double")
    w = (Window.partitionBy("__qid")
         .orderBy(F.col("__d").asc(), F.col("__cid").asc()))
    return (part.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select(F.col("__qid").alias(query_id_col),
                    F.col("__cid").alias(id_col),
                    F.col("__d").alias("adc_dist")))


def ivfadc_search_queries(index: SparkDF,
                          centroids: list[list[float]],
                          codebook: list[list[list[float]]],
                          queries: SparkDF, k: int = 10,
                          n_probe: int = 4,
                          id_col: str = "vec_id",
                          query_id_col: str = "query_id",
                          query_vec_col: str = "q") -> SparkDF:
    """Batched IVFADC: the bulk-retrieval form of ivfadc_search.
    Per-query probe lists come from the literal centroid table
    (driver-side dots); a BROADCAST (query_id, cluster) probe table
    joins the (id, cluster, codes) index — dynamic partition pruning
    on a cluster-partitioned index, the batched twin of the
    single-query isin() pushdown. The residual ADC tables — one
    m × 2^nbits block per (query, probed cell), built from
    unit(q) − centroid(cell) — ship as one constant-sized tensor;
    each surviving code row scores via a vectorized gather against
    ITS (query, cell) block, per-batch partial top-k, tiny global
    window. One pass over the probed code rows scores every query;
    no vector column is read."""
    import numpy as np
    import pandas as pd

    qids, Q, Qn = _collect_queries(queries, query_id_col,
                                   query_vec_col)
    qid_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(index.dtypes)[id_col]
    Qu = Q / Qn[:, None]
    C = np.asarray(centroids, dtype=np.float64)
    m = len(codebook)
    ds = len(codebook[0][0])
    CB = np.asarray(codebook, dtype=np.float64)   # m x 2^nbits x ds
    sim = Qu @ C.T
    probe_rows, tab_blocks, pair_index = [], [], {}
    for j, qid in enumerate(qids):
        order = sorted(range(len(centroids)),
                       key=lambda c: (-sim[j, c], c))[:n_probe]
        for cl in order:
            probe_rows.append((qid, int(cl)))
            qr = Qu[j] - C[cl]
            blk = np.empty((m, CB.shape[1]), dtype=np.float64)
            for s in range(m):
                diff = qr[s * ds:(s + 1) * ds][None, :] - CB[s]
                blk[s] = (diff * diff).sum(axis=1)
            pair_index[(qid, int(cl))] = len(tab_blocks)
            tab_blocks.append(blk)
    T = np.stack(tab_blocks)                      # pairs x m x 2^nbits
    spark = index.sparkSession
    probes = F.broadcast(spark.createDataFrame(
        probe_rows, f"__pq {qid_type}, cluster int"))
    surv = (index.join(probes, "cluster")
            .select(F.col("__pq"), F.col("cluster").alias("__cl"),
                    F.col(id_col).alias("__id"), "codes"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack([np.asarray(c, dtype=np.int64)
                               for c in pdf["codes"]])
            idx = np.asarray([pair_index[(q, int(cl))]
                              for q, cl in zip(pdf["__pq"],
                                               pdf["__cl"])])
            d = np.zeros(len(pdf), dtype=np.float64)
            for s in range(m):
                d += T[idx, s, codes[:, s]]
            d = _round_half_away(d, 6)
            out = pd.DataFrame({"__qid": pdf["__pq"].to_numpy(),
                                "__cid": pdf["__id"].to_numpy(),
                                "__d": d})
            out = (out.sort_values(["__qid", "__d", "__cid"])
                   .groupby("__qid", sort=False).head(k))
            yield out

    from pyspark.sql import Window

    part = surv.mapInPandas(
        gen, schema=f"__qid {qid_type}, __cid {id_type}, __d double")
    w = (Window.partitionBy("__qid")
         .orderBy(F.col("__d").asc(), F.col("__cid").asc()))
    return (part.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select(F.col("__qid").alias(query_id_col),
                    F.col("__cid").alias(id_col),
                    F.col("__d").alias("adc_dist")))


def sq8_search_queries(codes_df: SparkDF, mins: list[float],
                       maxs: list[float], queries: SparkDF, k: int = 10,
                       id_col: str = "vec_id",
                       query_id_col: str = "query_id",
                       query_vec_col: str = "q") -> SparkDF:
    """Batched SQ8 ADC top-k: one pass over the 1-byte code rows
    scores every query — per Arrow batch the codes decode through the
    affine map (mn + code·step, vectorized) and the per-dim squared
    differences accumulate IN DIMENSION ORDER, matching the
    single-query plan's left-fold exactly, so results are identical
    to a per-query sq8_search loop. Per-batch partial top-k keeps the
    global window over ≤ batches·q·k rows; the vector column is
    never read."""
    import numpy as np
    import pandas as pd

    qids, Q, _ = _collect_queries(queries, query_id_col, query_vec_col)
    qid_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(codes_df.dtypes)[id_col]
    d = len(mins)
    mn = np.asarray(mins, dtype=np.float64)
    mx = np.asarray(maxs, dtype=np.float64)
    live = mx > mn
    step = np.where(live, (mx - mn) / np.where(live, 255.0, 1.0), 0.0)
    kq = len(qids)

    base = codes_df.select(F.col(id_col).alias("__id"), "codes")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack([np.asarray(c, dtype=np.float64)
                               for c in pdf["codes"]])       # b x d
            recon = mn[None, :] + codes * step[None, :]
            ids = pdf["__id"].to_numpy()
            # accumulate per dim, in dim order: the same sequence of
            # IEEE additions as the single-query JVM left-fold
            dist = np.zeros((len(pdf), kq), dtype=np.float64)
            for i in range(d):
                diff = Q[:, i][None, :] - recon[:, i][:, None]
                dist += diff * diff
            dist = _round_half_away(dist, 6)
            kk = min(k, len(pdf))
            out_q, out_i, out_d = [], [], []
            for j in range(kq):
                order = np.lexsort((ids, dist[:, j]))[:kk]
                out_q.extend([qids[j]] * kk)
                out_i.extend(ids[order])
                out_d.extend(dist[order, j])
            yield pd.DataFrame({"__qid": out_q, "__cid": out_i,
                                "__d": out_d})

    from pyspark.sql import Window

    part = base.mapInPandas(
        gen, schema=f"__qid {qid_type}, __cid {id_type}, __d double")
    w = (Window.partitionBy("__qid")
         .orderBy(F.col("__d").asc(), F.col("__cid").asc()))
    return (part.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select(F.col("__qid").alias(query_id_col),
                    F.col("__cid").alias(id_col),
                    F.col("__d").alias("adc_dist")))


def hamming_search_queries(words_df: SparkDF, thresholds: list[float],
                           queries: SparkDF, k: int = 10,
                           id_col: str = "vec_id",
                           query_id_col: str = "query_id",
                           query_vec_col: str = "q") -> SparkDF:
    """Batched Hamming top-k over packed binary codes: every query of
    a (query_id, vector) table is binarized driver-side through the
    same thresholds, and ONE pass over the code rows scores all of
    them — per Arrow batch the XOR popcount runs as a 16-bit-table
    lookup over the packed words (integer-exact, so results are
    identical to a per-query hamming_search loop). Per-batch partial
    top-k keeps the global window tiny, as in the other *_queries
    forms."""
    import numpy as np
    import pandas as pd

    qids, Q, _ = _collect_queries(queries, query_id_col, query_vec_col)
    qid_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(words_df.dtypes)[id_col]
    qwords = np.asarray(
        [_bq1_words(list(map(float, Q[j])), thresholds, as_python=True)
         for j in range(len(qids))], dtype=np.int64)     # q x n_words
    kq = len(qids)
    pop16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                     dtype=np.int32)

    base = words_df.select(F.col(id_col).alias("__id"), "words")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            W = np.vstack([np.asarray(w, dtype=np.int64)
                           for w in pdf["words"]])        # b x n_words
            ids = pdf["__id"].to_numpy()
            x = np.bitwise_xor(W[:, None, :], qwords[None, :, :])
            # words are < 2^32: two 16-bit table lookups per word
            ham = (pop16[x & 0xFFFF]
                   + pop16[(x >> 16) & 0xFFFF]).sum(axis=2)  # b x q
            kk = min(k, len(pdf))
            out_q, out_i, out_h = [], [], []
            for j in range(kq):
                order = np.lexsort((ids, ham[:, j]))[:kk]
                out_q.extend([qids[j]] * kk)
                out_i.extend(ids[order])
                out_h.extend(int(v) for v in ham[order, j])
            yield pd.DataFrame({"__qid": out_q, "__cid": out_i,
                                "__h": out_h})

    from pyspark.sql import Window

    part = base.mapInPandas(
        gen, schema=f"__qid {qid_type}, __cid {id_type}, __h int")
    w = (Window.partitionBy("__qid")
         .orderBy(F.col("__h").asc(), F.col("__cid").asc()))
    return (part.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select(F.col("__qid").alias(query_id_col),
                    F.col("__cid").alias(id_col),
                    F.col("__h").alias("hamming")))


# --------------------------------------------------- index persistence
def write_ivf_index(assigned: SparkDF, path: str,
                    mode: str = "overwrite") -> None:
    """Persist an IVF(-PQ) index table ``partitionBy("cluster")`` —
    the layout every probe path here is designed around: ivf_search's
    ``cluster.isin(probes)`` filter and ivf_search_queries' broadcast
    probe-table join both prune to n_probe/n_clusters of the data AT
    THE SCAN when the index is laid out by cluster (static partition
    pruning for the literal filter, dynamic partition pruning for the
    join). Works for the plain (id, cluster, e) assignment table and
    the ivfpq_index (id, cluster, codes) table alike. ``mode='append'``
    is the incremental-ingest shape: encode + assign the new batch,
    append its cells."""
    assigned.write.mode(mode).partitionBy("cluster").parquet(path)


def read_ivf_index(spark, path: str) -> SparkDF:
    """Read a write_ivf_index table back. The cluster partition column
    comes back typed int; every search entry point here accepts the
    frame as-is."""
    return spark.read.parquet(path)
