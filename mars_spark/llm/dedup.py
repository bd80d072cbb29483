"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the whole point at 100 TB):

- exact: one hash-groupBy on a 32-char fingerprint — a single shuffle
  of (fingerprint, doc_id) pairs, NOT the documents themselves; the
  winner set is then a broadcast-able or shuffled semi-join back.
- minhash LSH: signatures are computed scan-side with higher-order
  functions (no explode of shingles, no Python); only the (band_id,
  band_hash, doc_id) triples shuffle — b rows per doc of ~50 bytes.
  Candidate pairs come from a self-equi-join on the band hash, i.e.
  a shuffle join keyed on band buckets; a verify pass computes true
  Jaccard only for candidates (tiny fraction).
- simhash: 32-bit signature scan-side; near-dup = hamming ≤ r via
  band-rotation join (here: exact-signature buckets + optional
  bit_count verify join).
- hashes are md5 throughout — portable, so every stage has a DuckDB
  oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.llm.text import (_memo_builder, fingerprint,
                                 word_shingles, tokens)

import threading

# serializes materialize_spill_aware's persist+storage-probe window so
# concurrent materializations don't cross-attribute each other's blocks
_SPILL_PROBE_LOCK = threading.Lock()


# ------------------------------------------------------------------ exact
def exact_dedup_keys(sdf: SparkDF, text_col: str, id_col: str) -> SparkDF:
    """One surviving id per normalized-content fingerprint (min id wins —
    deterministic). Returns (fingerprint, keep_id, dup_count)."""
    return (
        sdf.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup(sdf: SparkDF, text_col: str, id_col: str) -> SparkDF:
    """Drop exact near-identical (normalized) duplicates, keep min-id row."""
    keys = exact_dedup_keys(sdf, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return sdf.join(keys, on=id_col, how="leftsemi")


def incremental_dedup(new: SparkDF, seen_fps: SparkDF, text_col: str,
                      id_col: str) -> SparkDF:
    """Dedup an arriving batch against an EXISTING corpus — the daily
    shape of a 100 TB pipeline (re-running global dedup over the whole
    corpus per increment is quadratic in deliveries). ``seen_fps`` is
    the persisted fingerprint set from prior batches (one 'fp' column,
    e.g. ``exact_dedup_keys(...).select('fp')`` written to parquet).
    Returns the batch rows that are new w.r.t. BOTH the corpus
    (anti-join on fingerprint — a shuffle keyed on fp, or a broadcast
    when the seen set is small) and the batch itself (min-id winner).
    Append ``exact_dedup_keys`` of the survivors to the store for the
    next increment."""
    batch = new.withColumn("__fp", fingerprint(text_col))
    fresh = batch.join(seen_fps.withColumnRenamed("fp", "__fp"),
                       on="__fp", how="left_anti")
    w = fresh.groupBy("__fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    return fresh.join(w, on=id_col, how="leftsemi").drop("__fp")


# ---------------------------------------------------------------- minhash
def minhash_signature(col: Column, num_hashes: int = 8, k: int = 3) -> list[Column]:
    """num_hashes min-hash values of the word-k-gram shingle set.

    Each "permutation" i is min(md5(i || '|' || shingle)) — the
    lexicographic min of a salted md5 is a uniform minwise hash, needs
    no coefficient tables, and is reproducible in any engine with md5.
    Evaluated as array_min(transform(...)) — scan-side, no shuffle.
    """
    # NB: plain one-arg lambdas only inside _sig_from_shingles —
    # pyspark's higher-order-function bridge dispatches on the lambda's
    # arity, so a captured default (lambda s, i=i: ...) would receive
    # the array index as ``i``.
    return _sig_from_shingles(word_shingles(col, k), num_hashes)


def _fan_out(sdf: SparkDF) -> SparkDF:
    """Repartition up to defaultParallelism when the input arrives in
    fewer partitions (a small parquet file = 1 partition = 1 core for
    the whole scan-side text work). No-op at cluster scale.

    Partition count comes from the plan's output partitioning (no
    ``sdf.rdd`` — that forces a full plan-to-RDD conversion on every
    call, r01 advice)."""
    target = sdf.sparkSession.sparkContext.defaultParallelism
    try:
        n = sdf._jdf.queryExecution().executedPlan() \
            .outputPartitioning().numPartitions()
    except Exception:
        n = 0
    if n <= 0:
        # UnknownPartitioning reports 0 (AQE wrappers, non-bucketed file
        # scans) — fall back to the RDD partition count rather than
        # treating "unknown" as "single partition" and force-shuffling
        # (which would also SHRINK wide inputs at cluster scale).
        n = sdf.rdd.getNumPartitions()
    if 0 < n < target:
        sdf = sdf.repartition(target)
    return sdf


def materialize_spill_aware(df: SparkDF) -> SparkDF:
    """Persist + materialize a SHARED cache with a spill-aware
    storage policy (r10; SCALE.md sf30: minhash's 4.5 GB posting
    cache outgrew the JVM heap — MEMORY_AND_DISK then pins its
    memory-resident share in the unified pool, evicting the very
    execution memory the downstream self-joins need, and the row
    went super-linear / OOM-prone).

    Policy: materialize under MEMORY_AND_DISK (the right level while
    the cache fits — stats-first planning and zero re-derivation),
    measure THIS cache's blocks via an RDD-storage-info diff, and if
    the majority of its bytes already spilled, demote it wholly to
    DISK_ONLY (one recompute). A mostly-spilled cache gains nothing
    from its memory slice; releasing it hands the unified pool back
    to the shuffles, which is what keeps the profile linear once
    data outgrows RAM. On a real cluster the same policy holds
    per-executor; the storage-info probe is the same API the Spark
    UI reads. Returns the (materialized) frame; callers still own
    unpersist.

    The before/after storage diff attributes every block persisted in
    the window to THIS cache, and this repo runs concurrent actions
    from thread pools — so the persist+probe section holds a module
    lock: two overlapping materialize calls would otherwise cross-
    attribute each other's bytes and could flip a demotion decision
    (perf-only, never correctness)."""
    from pyspark.storagelevel import StorageLevel

    sc = df.sparkSession.sparkContext

    def _blocks():
        try:
            return {i.id(): (i.memSize(), i.diskSize())
                    for i in sc._jsc.sc().getRDDStorageInfo()}
        except Exception:  # storage probe is best-effort only
            return None

    with _SPILL_PROBE_LOCK:
        before = _blocks()
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        after = _blocks()
        if before is None or after is None:
            return df
        new = [v for k, v in after.items() if k not in before]
        mem = sum(m for m, _ in new)
        disk = sum(d for _, d in new)
        if disk > max(mem, 1):
            df.unpersist(blocking=True)
            df = df.persist(StorageLevel.DISK_ONLY)
            df.count()
    return df


def shingle_postings(sdf: SparkDF, text_col: str, id_col: str,
                     k: int = 3) -> SparkDF:
    """(id, sh) posting rows of word-k-gram shingles — the scalable
    shingle form.

    Implementation note (measured 30× at sf0.1): the array-expression
    form (word_shingles = transform over sequence) re-inlines the
    tokenization INSIDE the lambda, so every shingle re-runs the
    normalize regex — O(len·shingles) per doc, interpreted. This form
    tokenizes once (posexplode), builds shingles with two window leads
    (codegen'd), and filters trailing partials to match word_shingles
    semantics exactly (docs shorter than k keep their single partial
    shingle). One shuffle on id; the posting list is exactly what the
    dedup joins/aggregations consume anyway.
    """
    from pyspark.sql import Window

    toks = _fan_out(sdf).select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    with_sh = toks.select(
        F.col(id_col), F.col("pos"),
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("n_tok"),
        F.concat_ws(" ", *leads).alias("sh"),
    )
    return with_sh.filter(
        (F.col("pos") <= F.col("n_tok") - k)
        | ((F.col("n_tok") < k) & (F.col("pos") == 0))
    ).select(F.col(id_col), F.col("sh"))


def shingle_frame(sdf: SparkDF, text_col: str, id_col: str,
                  k: int = 3) -> SparkDF:
    """(id, sh: array<string>) — distinct-shingle array per doc, built
    from the posting list (collect_list of distinct postings)."""
    return (
        shingle_postings(sdf, text_col, id_col, k)
        .distinct()
        .groupBy(id_col)
        .agg(F.collect_list("sh").alias("sh"))
    )


def minhash_sig_frame(sdf: SparkDF, text_col: str, id_col: str,
                      num_hashes: int = 8, k: int = 3,
                      postings: SparkDF | None = None) -> SparkDF:
    """(id, mh0..mh{n-1}) via hash-aggregate over the posting list:
    sig_i = min(md5(i|shingle)) per doc. min over the multiset equals
    min over the set, so no distinct pass is needed. Fully codegen'd
    partial/final agg — the scalable form of minhash_signature."""
    if postings is None:
        postings = shingle_postings(sdf, text_col, id_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return postings.groupBy(id_col).agg(*aggs)


def minhash_bands(sdf: SparkDF, text_col: str, id_col: str,
                  num_hashes: int = 8, band_size: int = 2,
                  k: int = 3, postings: SparkDF | None = None) -> SparkDF:
    """(id, band_idx, band_hash) triples — the only thing that shuffles.

    Emitted via ONE projection + explode(array(structs)) rather than a
    union of per-band selects: a union re-evaluates the signature
    expressions once per branch (4× the scan work); the explode form
    evaluates each minhash exactly once.
    """
    with_sig = minhash_sig_frame(sdf, text_col, id_col, num_hashes, k,
                                 postings=postings)
    n_bands = num_hashes // band_size
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[
                F.col(f"mh{b * band_size + j}") for j in range(band_size)
            ])).alias("band_hash"),
        )
        for b in range(n_bands)
    ])
    return (
        with_sig.select(F.col(id_col), F.explode(band_structs).alias("bb"))
        .select(F.col(id_col), F.col("bb.band").alias("band"),
                F.col("bb.band_hash").alias("band_hash"))
    )


def write_band_store(bands: SparkDF, path: str,
                     mode: str = "overwrite") -> None:
    """Persist an LSH band store for ``streaming.stream_minhash_dedup``
    probes: DISTINCT (band, band_hash), written ``partitionBy("band")``.

    The partition layout is the scale contract: the stream consumer
    probes one band index per join, and with the store laid out by
    band each probe is a partition-pruned scan of 1/n_bands of the
    store — without it, every micro-batch re-scans the FULL store
    once per band. distinct() on write keeps matched stream rows from
    multiplying against duplicate store entries before the miss
    filter. ``mode='append'`` is the nightly-batch shape: append the
    accepted delivery's bands after the batch dedup pass.
    """
    (bands.select("band", "band_hash").distinct()
     .write.mode(mode).partitionBy("band").parquet(path))


def _sig_from_shingles(sh, num_hashes: int):
    def salted(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return [
        F.array_min(F.transform(sh, salted(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def minhash_candidate_pairs(sdf: SparkDF, text_col: str, id_col: str,
                            num_hashes: int = 8, band_size: int = 2,
                            k: int = 3,
                            postings: SparkDF | None = None) -> SparkDF:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band bucket."""
    bands = minhash_bands(sdf, text_col, id_col, num_hashes, band_size, k,
                          postings=postings)
    left = bands.select(F.col(id_col).alias("a"), "band", "band_hash")
    right = bands.select(F.col(id_col).alias("b"), "band", "band_hash")
    return (
        left.join(right, on=["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(sdf: SparkDF, text_col: str, id_col: str,
                  threshold: float = 0.5, k: int = 3,
                  candidates: SparkDF | None = None,
                  postings: SparkDF | None = None) -> SparkDF:
    """True Jaccard similarity over word-k-gram shingle sets.

    Without ``candidates`` this is the all-pairs inverted-index join
    (explode shingles → self-join on shingle → count); with candidates
    it verifies only the LSH survivors. The inverted-index join is the
    classic scalable form: pairs are generated per posting list, so
    cost is sum over shingles of df²(shingle), not n².
    """
    if postings is None:
        postings = shingle_postings(sdf, text_col, id_col, k)
    # cache the distinct posting list: it feeds BOTH self-join sides
    # and the size agg — uncached, the scan-side shingle work would
    # re-run once per consumer (3×). materialize_spill_aware demotes
    # the cache to DISK_ONLY when it mostly spills anyway (sf30: a
    # corpus-sized cache pinning the unified pool starves the
    # self-join's execution memory).
    # Materialize the shared cache BEFORE the join plans against it:
    # un-materialized, Catalyst's size estimate for the window+explode
    # +distinct subtree undershoots structurally and elects to
    # BROADCAST the full posting list into its own self-join (seen at
    # 100x scale, SCALE.md sf10: a corpus-sized HashedRelation build
    # that dies in the driver with no graceful fallback). Materialized,
    # the InMemoryRelation reports its TRUE size, so Catalyst keeps the
    # broadcast exactly while the posting list is genuinely small
    # (shuffle-free probe, ~1.5 s faster per bench row at sf0.1) and
    # flips to a shuffle join on its own once it grows — the correct
    # strategy at every scale, chosen from real stats instead of a
    # pinned hint. The count() costs nothing extra: the cache feeds
    # 3+ consumers and would materialize on the first one anyway.
    sh = materialize_spill_aware(postings.distinct())
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "sh")
    b = sh.select(F.col(id_col).alias("b"), "sh")
    inter = (
        a.join(b, on="sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # The sizes and candidate sides stay ADAPTIVE too: they are plain
    # count/distinct aggregates over the now-materialized cache, so
    # their size estimates track the true input — Catalyst broadcasts
    # them while they are genuinely small (measured ~2 s faster per
    # bench row at sf0.1 than pinned shuffles) and flips them to
    # shuffle on its own as they grow. Only un-cached subtrees whose
    # estimates UNDERSHOOT structurally (the collect_list reassembly
    # shapes in line_dedup / remove_duplicate_spans) keep pinned
    # strategies.
    if candidates is not None:
        inter = inter.join(candidates, on=["a", "b"], how="leftsemi")
    sza = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    szb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    out = (
        inter.join(sza, "a")
        .join(szb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    # snapshot the (small: threshold-filtered pairs) result and RELEASE
    # the posting cache — returned lazy, the plan would pin `sh`
    # persisted for the caller's lifetime, accumulating corpus-sized
    # cached storage across calls in a long session (memory bounded by
    # the DISK_ONLY demotion, disk unbounded). The checkpoint costs
    # one evaluation the consumer would pay anyway.
    out = out.localCheckpoint()
    sh.unpersist()
    return out


def minhash_dedup(sdf: SparkDF, text_col: str, id_col: str,
                  threshold: float = 0.7, num_hashes: int = 8,
                  band_size: int = 2, k: int = 3) -> SparkDF:
    """Full near-dup pipeline: LSH candidates → Jaccard verify →
    connected-pair collapse (min-id representative via one iteration of
    min-propagation; full transitive closure is iterative — see
    docstring note).

    The (id, shingle) posting list is computed once and cached — it
    feeds the signature stage AND the verify stage; at 100 TB this is
    the frame you would checkpoint rather than recompute from raw text
    (the spill-aware policy demotes it to DISK_ONLY once it outgrows
    memory — see materialize_spill_aware).
    """
    postings = materialize_spill_aware(
        shingle_postings(sdf, text_col, id_col, k))
    cands = minhash_candidate_pairs(sdf, text_col, id_col, num_hashes,
                                    band_size, k, postings=postings)
    verified = jaccard_pairs(sdf, text_col, id_col, threshold, k,
                             candidates=cands, postings=postings)
    # jaccard_pairs checkpointed `verified`, so nothing downstream
    # references the posting cache anymore — release it here instead
    # of leaking one corpus-sized cache per call in a long session
    postings.unpersist()
    # one-hop min-id union: b maps to min(a) over verified pairs.
    # (For chained near-dup clusters run to fixpoint; one hop removes
    # every doc that has ANY smaller near-duplicate, which is the
    # standard keep-first policy.)
    drop = verified.select(F.col("b").alias(id_col)).distinct()
    return sdf.join(drop, on=id_col, how="left_anti")


class _shuffle_width:
    """Temporarily pin ``spark.sql.shuffle.partitions`` for an
    iterative driver loop (the streaming `_state_partitions`
    discipline applied to batch iteration). The CC loops materialize
    every round via localCheckpoint, which executes through the RDD
    path and so never benefits from AQE partition coalescing — each
    round inherited the full batch shuffle width (measured 64-65
    tasks per in-loop job on a KB-sized edge list at sf0.1, ~10 jobs
    per round of pure task-launch overhead). Width is derived from
    the MEASURED edge count (scale-adaptive: clamps to the session
    width at real scale, shrinks to a few tasks on small graphs).
    Restores the previous width on exit, exception-safe."""

    def __init__(self, spark, n: int):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


# target rows per in-loop shuffle partition: CC state rows are two
# bigints, so 64k rows ≈ 1 MB — far below a task's fixed cost until
# well past this
_ITER_ROWS_PER_PARTITION = 65_536


def _iter_width(sdf: SparkDF, n_rows: int) -> int:
    cur = int(sdf.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    need = -(-max(n_rows, 1) // _ITER_ROWS_PER_PARTITION)
    return max(1, min(cur, need))


def dedup_clusters(pairs: SparkDF, max_iter: int = 10) -> SparkDF:
    """Connected components over near-dup pairs (a, b) → (id, cluster)
    with cluster = min id reachable. Iterative min-label propagation:
    each round joins labels through the edge list (both directions)
    and keeps the minimum; converges in O(diameter) rounds — near-dup
    clusters are tiny, so 2-3 rounds in practice. The driver loop runs
    one Spark job per round and stops early when no label changes
    (the same large-graph CC pattern GraphX/GraphFrames uses).

    Measured scaling (r7, SCALE.md): sublinear slopes (0.49/0.24 on
    3×/10× data steps) — round count stays O(diameter) while per-round
    shuffle volume grows linearly. The warm-session bench's ±1 s
    run-to-run band on this row is scheduler/GC noise, confirmed by a
    10-rep isolation bench (see SCALE.md); don't chase it.
    """
    # Snapshot the PAIRS before fanning out into the two edge
    # directions: Spark does not reuse identical exchanges across
    # separate branches of one plan (the r9 plan-dedup sweep's
    # recurring finding), so union-then-materialize would run the
    # whole upstream pair computation twice. The union over the
    # checkpointed blocks is then just a double block-read.
    #
    # localCheckpoint each round: iterative plans otherwise nest the
    # whole history (planning cost doubles per iteration — measured
    # minutes by round 10 even on toy data). Checkpointing truncates
    # lineage to the materialized result; on a real cluster with
    # unreliable executors use checkpoint() to HDFS instead.
    p = (pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
         .localCheckpoint())
    # count over the checkpointed blocks (cheap) sizes the loop's
    # shuffle width — see _shuffle_width
    width = _iter_width(p, p.count() * 2)
    edges = p.unionByName(
        p.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).repartition(width, "y").localCheckpoint()
    with _shuffle_width(p.sparkSession, width):
        labels = (edges.select(F.col("x").alias("id"))
                  .distinct()
                  .withColumn("cluster", F.col("id"))
                  .localCheckpoint())
    # Both in-loop joins are data-sized × data-sized (labels grows
    # with the corpus), so they are pinned to shuffle-hash joins: a
    # 100x-scale sweep (SCALE.md sf10) showed Spark electing to
    # broadcast the checkpointed label table and dying in the driver-
    # side build ("Not enough memory to build and broadcast") once
    # round-over-round checkpoint blocks filled the unified pool —
    # and at cluster scale a billion-row label broadcast is never
    # right. Shuffle-hash (not sort-merge) because each round's join
    # is a few heavy keys joined once — no sort amortization.
    with _shuffle_width(p.sparkSession, width):
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels.hint("shuffle_hash"),
                           edges.y == labels.id)
                .groupBy("x").agg(F.min("cluster").alias("nbr_min"))
            )
            # Carry a per-row changed flag through the SAME plan so
            # the convergence test is a cheap agg over the
            # checkpointed result instead of a second join against
            # the previous labels (one shuffle join per round
            # instead of two).
            new_min = F.least(
                F.col("cluster"),
                F.coalesce(F.col("nbr_min"), F.col("cluster")))
            new_labels = (
                labels.join(neighbor_min.hint("shuffle_hash"),
                            labels.id == neighbor_min.x, "left")
                .select(
                    "id",
                    new_min.alias("cluster"),
                    (new_min < F.col("cluster")).cast("long")
                    .alias("__chg__"),
                )
            ).localCheckpoint()
            changed = new_labels.agg(F.sum("__chg__")).collect()[0][0]
            labels = new_labels.drop("__chg__")
            if not changed:
                break
    return labels


def dedup_clusters_star(pairs: SparkDF, max_iter: int = 25) -> SparkDF:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the same (id, cluster = min reachable id)
    contract as :func:`dedup_clusters`, evaluated head-to-head for
    diameter-heavy graphs (SCALE.md r10).

    Each round rewrites the EDGE set twice:

    - large-star: for every node u, attach every LARGER neighbor v
      directly to m(u) = min(Γ(u) ∪ {u}) — one symmetric groupBy-min
      + one join; output edges always point larger → smaller;
    - small-star: for every node u of the directed set, re-point its
      (all smaller) neighbors and u itself at m(u).

    The star steps provably converge to per-component stars rooted
    at the component minimum in O(log² n) rounds INDEPENDENT of
    graph diameter — the regime where min-label propagation's
    O(diameter) rounds lose (long chains). The trade: each round
    shuffles the edge table twice plus two node-keyed aggregates,
    vs min-label's single label join — so on the shallow, tiny
    clusters near-dup dedup actually produces, min-label does less
    work per round and stays the default. In-loop joins are
    shuffle-hash-pinned for the same reason as dedup_clusters
    (checkpointed sides mis-estimate toward broadcast).
    """
    p = (pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
         .filter(F.col("x") != F.col("y")).distinct()
         .localCheckpoint())
    # measured edge count sizes the loop's shuffle width (see
    # _shuffle_width — localCheckpoint rounds never see AQE coalescing)
    width = _iter_width(p, p.count() * 2)
    with _shuffle_width(p.sparkSession, width):
        nodes = (p.select(F.col("x").alias("id"))
                 .unionByName(p.select(F.col("y").alias("id")))
                 .distinct().localCheckpoint())
        edges, prev = p, None
        for _ in range(max_iter):
            sym = edges.unionByName(
                edges.select(F.col("y").alias("x"),
                             F.col("x").alias("y")))
            lmin = (sym.groupBy("x")
                    .agg(F.least(F.min("y"), F.first("x")).alias("m")))
            large = (sym.filter(F.col("y") > F.col("x"))
                     .join(lmin.hint("shuffle_hash"), "x")
                     .select(F.col("y").alias("x"),
                             F.col("m").alias("y"))
                     .distinct())
            smin = (large.groupBy("x")
                    .agg(F.least(F.min("y"), F.first("x")).alias("m")))
            small = (large.join(smin.hint("shuffle_hash"), "x")
                     .select(F.col("y").alias("x"),
                             F.col("m").alias("y"))
                     .unionByName(smin.select("x", F.col("m").alias("y")))
                     .filter(F.col("x") != F.col("y"))
                     .distinct())
            edges = small.localCheckpoint()
            lbl = edges.groupBy("x").agg(F.min("y").alias("c"))
            if prev is not None:
                diff = (lbl.withColumnRenamed("c", "cn")
                        .join(prev.hint("shuffle_hash"), "x",
                              "full_outer")
                        .filter(~F.col("cn").eqNullSafe(F.col("c")))
                        .limit(1).count())
                if diff == 0:
                    break
            prev = lbl.localCheckpoint()
    final = prev if prev is not None else (
        edges.groupBy("x").agg(F.min("y").alias("c")))
    return (nodes.join(
        final.withColumnRenamed("x", "id").hint("shuffle_hash"),
        "id", "left")
        .select("id", F.coalesce(F.col("c"), F.col("id"))
                .alias("cluster")))


# ---------------------------------------------------------------- simhash
def hash32(col: Column) -> Column:
    """Portable 32-bit token hash: first 8 hex chars of md5 → bigint.
    (xxhash64 would be faster but is Spark-only; md5 keeps the oracle.)"""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


@_memo_builder
def simhash(col: Column | str, bits: int = 32) -> Column:
    """SimHash signature of the token set, computed as 'bits' parallel
    aggregates over the token array — all higher-order expressions.

    For each bit b: sign(sum over tokens of (tokhash bit b ? +1 : -1)).
    """
    t = F.array_distinct(tokens(col))
    h = F.transform(t, hash32)

    def voter(mask: int):
        # two-arg lambda closure (see minhash_signature note on arity)
        return lambda acc, x: acc + F.when(
            x.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1)

    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        vote = F.aggregate(h, F.lit(0), voter(1 << b))
        sig = sig + F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def simhash_near_pairs(sdf: SparkDF, text_col: str, id_col: str,
                       max_hamming: int = 3, bits: int = 32) -> SparkDF:
    """Near-dup pairs by simhash hamming distance, banded join.

    Split the signature into (max_hamming+1) bands; by pigeonhole any
    pair within hamming r shares ≥1 exact band → equi-join per band,
    then verify with bit_count(xor). Only (band, value, id) shuffles.
    """
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    sig = sdf.select(F.col(id_col), simhash(text_col, bits).alias("sig"))
    bands = []
    for b in range(n_bands):
        shifted = F.shiftright(F.col("sig"), b * band_bits)
        mask = (1 << band_bits) - 1
        bands.append(
            sig.select(
                F.col(id_col), F.lit(b).alias("band"),
                shifted.bitwiseAND(F.lit(mask)).alias("bv"), F.col("sig"),
            )
        )
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionByName(x)
    left = allb.select(F.col(id_col).alias("a"), "band", "bv",
                       F.col("sig").alias("sig_a"))
    right = allb.select(F.col(id_col).alias("b"), "band", "bv",
                        F.col("sig").alias("sig_b"))
    return (
        left.join(right, on=["band", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# -------------------------------------------------------- curation (r8)
def best_in_cluster_dedup(sdf: SparkDF, text_col: str, id_col: str,
                          score_col: str) -> SparkDF:
    """Exact-duplicate clusters keep their BEST row — max ``score_col``,
    min-id tie-break — instead of exact_dedup's min-id rule. This is
    what a curation pipeline actually wants: when a doc appears on
    three domains, keep the copy with the highest quality score (least
    boilerplate damage), not an arbitrary one. The winner set is
    computed on a SKINNY (fp, id, score) projection — only
    fingerprint-sized rows shuffle through the window, never the
    documents — then kept via a semi-join on the id (the exact_dedup
    shape; the r8 first cut windowed the full rows and paid a
    text-sized shuffle). Deterministic and SQL-oracle-replayable as
    long as ``score_col`` is (round scores before passing them in)."""
    from pyspark.sql import Window

    w = Window.partitionBy("__fp").orderBy(F.desc(score_col),
                                           F.asc(id_col))
    keys = (sdf.select(fingerprint(text_col).alias("__fp"),
                       F.col(id_col), F.col(score_col))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).select(id_col))
    return sdf.join(keys, id_col, "leftsemi")


def cross_doc_gram_stats(sdf: SparkDF, text_col: str, id_col: str,
                         k: int = 8) -> SparkDF:
    """Per-doc cross-document repeated-substring stats: for every doc,
    the count and fraction of its word k-gram POSITIONS whose gram
    also occurs in at least one OTHER document — the relational form
    of the "duplicate spans" signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": repeated ≥k-token
    substrings across a corpus are memorization fuel even when whole
    docs aren't duplicates). Returns (id, n_grams, n_dup, dup_frac).

    Scale shape (r9 rewrite — the first cut re-ran the regex gram
    scan three times and shuffled ALL positions twice): ONE gram
    scan, collapsed immediately to (gram-hash, doc, positions) pair
    counts with a map-side combine; a gram-keyed window then counts
    distinct docs per gram over those SKINNY pair rows, and one
    doc-keyed aggregate emits the stats. Keys are md5(gram) — fixed
    32 bytes regardless of k, so shuffle bytes are bounded by the
    DISTINCT (gram, doc) pair count, not the position count
    (measured 6.3 → 1.2 s on the sf0.1 documents). This is the
    honest Θ(total tokens) scan cost of the signal; the suffix-array
    formulation reads fewer bytes but has no distributed relational
    equivalent. Docs shorter than k tokens contribute their single
    whole-doc gram (word_ngrams truncation rule)."""
    from pyspark.sql import Window

    from mars_spark.llm.text import word_ngrams

    grams = sdf.select(
        F.col(id_col),
        F.explode(F.transform(word_ngrams(text_col, k),
                              lambda g: F.md5(g))).alias("gh"))
    pair = grams.groupBy("gh", id_col).agg(F.count(F.lit(1)).alias("c"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    return (pair.withColumn("__nd", nd)
            .groupBy(id_col)
            .agg(F.sum("c").alias("n_grams"),
                 F.sum(F.when(F.col("__nd") >= 2, F.col("c"))
                       .otherwise(F.lit(0))).alias("n_dup"))
            .withColumn("dup_frac",
                        F.round(F.col("n_dup")
                                / F.greatest(F.col("n_grams"), F.lit(1)),
                                4)))


def line_dedup(sdf: SparkDF, text_col: str, id_col: str,
               sep: str = "\n") -> SparkDF:
    """C4-style GLOBAL line deduplication (Raffel et al. 2020, §2.2:
    "we discarded all but one of any three-sentence span occurring
    more than once" — here at line granularity, the form most
    curation stacks run): every distinct line keeps only its FIRST
    occurrence in the corpus (min (doc_id, position)), each doc is
    reassembled from its surviving lines in original order, and docs
    whose every line was seen earlier drop out entirely. Returns the
    input schema with ``text_col`` rewritten.

    Scale shape: two word-count-shaped shuffles — one keyed on
    md5(line) (32-byte key regardless of line length) for the global
    first-occurrence window, one on the doc id for reassembly. Line
    text rides the shuffle once each way; no O(n²) stage, no
    driver-side state. Deterministic (min-(id,pos) winner) and
    SQL-oracle-replayable. ``sep`` is a LITERAL separator (escaped
    before it reaches Spark's regex-based split)."""
    import re as _re

    from pyspark.sql import Window

    lines = sdf.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(_re.escape(sep)), -1))
        .alias("__pos", "__line"))
    w = (Window.partitionBy(F.md5(F.col("__line")))
         .orderBy(F.col(id_col).asc(), F.col("__pos").asc()))
    kept = (lines.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1))
    reassembled = (
        kept.groupBy(id_col)
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"]),
            sep).alias("__newtext")))
    # sort-merge-pinned: the reassembled side carries the full
    # rewritten TEXT per doc, but Catalyst's estimate for the
    # collect_list aggregate undershoots badly and elects to
    # broadcast it (seen in the sf10 plan audit, SCALE.md) — a
    # corpus-text broadcast can never be right, and SMJ spills
    # gracefully where a per-task hash build of text rows would not.
    # Narrow id-list sides elsewhere (exact_dedup's kept ids) stay
    # adaptive: their estimates track input and flip to shuffle on
    # their own as they grow.
    return (sdf.join(reassembled.hint("merge"), id_col, "inner")
            .withColumn(text_col, F.col("__newtext")).drop("__newtext"))


def winnow_fingerprints(sdf: SparkDF, text_col: str, id_col: str,
                        k: int = 5, w: int = 4) -> SparkDF:
    """MOSS-style winnowing fingerprints (Schleimer, Wilkerson &
    Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the rolling-hash fingerprint scheme; reference has
    no equivalent, ADDITIVE like the rest of llm/): hash every word
    k-gram, slide a window over each ``w`` consecutive hashes, and
    select each window's MINIMUM; a document's fingerprint is the
    DISTINCT selected set. The winnowing guarantee: any token run of
    length >= w + k - 1 shared by two documents contributes at least
    one common selected hash, at ~2/(w+1) the density of the full
    gram set — so an fp-keyed join finds copied spans the way the
    full-gram join (cross_doc_gram_stats) would, at a fraction of the
    shuffle volume. Only hash VALUES are kept (the SET is invariant
    to the positional tie-break rules the paper discusses). Documents
    with fewer than ``w`` grams contribute their single minimum;
    empty texts contribute nothing.

    100 TB shape: ONE narrow map — the codegen'd overlapping-
    lookahead regex gram pass plus array hash/window expressions —
    then explode; the only shuffle is whatever the caller joins on
    (fp). Returns (id_col, fp) long-form."""
    from mars_spark.llm.text import _gram_extract

    # _gram_extract yields a single empty capture on empty/whitespace
    # text — drop it (an empty doc has no fingerprints)
    grams = F.filter(_gram_extract(text_col, k),
                     lambda g: g != F.lit(""))
    hashes = F.transform(grams, hash32)
    n = F.size(hashes)
    sel = (F.when(n <= 0, F.array().cast("array<bigint>"))
           .when(n < w, F.array(F.array_min(hashes)))
           .otherwise(F.array_distinct(F.transform(
               F.sequence(F.lit(1), n - w + 1),
               lambda i: F.array_min(F.slice(hashes, i, w))))))
    return sdf.select(F.col(id_col), F.explode(sel).alias("fp"))


def remove_duplicate_spans(sdf: SparkDF, text_col: str, id_col: str,
                           k: int = 8) -> SparkDF:
    """Duplicate-SPAN removal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", ExactSubstr): every
    duplicated word k-gram keeps its tokens only at its corpus-FIRST
    occurrence (smallest (doc_id, position)); each LATER occurrence
    has its k covered tokens removed, and docs are reassembled from
    the surviving tokens in original order. Completes the span story:
    ``cross_doc_gram_stats`` measures the signal, this op acts on it.
    A run of L >= k duplicated tokens is covered end-to-end by its
    duplicated grams, so the whole repeated span vanishes from every
    copy but the first — including repeats WITHIN one document
    (occurrences rank by position). Returns the input schema with
    ``text_col`` rewritten as the space-joined surviving tokens of
    the NORMALIZED text (same normalization note as chunk_documents);
    a fully-duplicated doc keeps its row with '' text (filter with
    min_tokens downstream); NULL text stays NULL. Docs shorter than
    k tokens participate via their single whole-doc partial gram
    (word_ngrams truncation rule), i.e. short-doc exact duplicates
    lose their text too.

    100 TB shape: four word-count-shaped shuffles, no O(n^2) stage —
    (1) gram positions keyed on md5(gram) (fixed 32-byte key; a
    SINGLE ordered window — rn >= 2 alone identifies a duplicated
    later occurrence, no separate count pass); (2/3) the marked
    occurrences explode to their k covered positions, distinct +
    anti-join both keyed on (doc, position); (4) doc-keyed
    reassembly. Θ(total tokens) rows ride each shuffle — the honest
    relational cost; the suffix-array formulation reads fewer bytes
    but has no distributed relational equivalent."""
    from pyspark.sql import Window

    from mars_spark.llm.text import tokens, word_ngrams

    toks = sdf.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("__tpos", "__w"))
    grams = sdf.select(
        F.col(id_col),
        F.posexplode(F.transform(word_ngrams(text_col, k),
                                 lambda g: F.md5(g)))
        .alias("__gpos", "__gh"))
    wo = (Window.partitionBy("__gh")
          .orderBy(F.col(id_col).asc(), F.col("__gpos").asc()))
    marks = (grams.withColumn("__rn", F.row_number().over(wo))
             .filter(F.col("__rn") >= 2))
    covered = (marks.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("__gpos"),
                             F.col("__gpos") + (k - 1))).alias("__tpos"))
        .distinct())
    # Both pinned joins below guard the same sf10 plan-audit finding
    # (SCALE.md): Catalyst undershoots aggregate-output estimates and
    # elects to broadcast sides that grow with the corpus — the
    # covered-position table here, and the reassembled side which
    # carries the full rewritten TEXT per doc. Sort-merge spills
    # gracefully when the partition count lags the data.
    kept = toks.join(covered.hint("merge"), [id_col, "__tpos"],
                     "left_anti")
    reassembled = (kept.groupBy(id_col)
                   .agg(F.array_join(F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("__tpos", "__w"))),
                       lambda s: s["__w"]), " ").alias("__newtext")))
    return (sdf.join(reassembled.hint("merge"), id_col, "left")
            .withColumn(text_col,
                        F.when(F.col(text_col).isNotNull(),
                               F.coalesce(F.col("__newtext"), F.lit("")))
                        .otherwise(F.lit(None).cast("string")))
            .drop("__newtext"))
