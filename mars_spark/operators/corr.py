"""Rank correlations: Spearman rho and Kendall tau-b.

Reference: mars/dataframe/statistics/corr.py:29 honors the pandas
``method=`` parameter (pearson/spearman/kendall, delegated to pandas
per chunk-pair). Spark's ``df.stat.corr`` is pearson-only, so the two
rank methods are built from primitives the repo already owns:

- **Spearman** = Pearson on average-method ranks. Ranks come from
  ``operators.rank.add_rank`` (per-value counts + prefix sums + one
  join back — no global single-partition window), so the whole
  statistic is two rank passes + one aggregate and scales like any
  groupBy. Pairwise-complete semantics match pandas: rows where
  either side is null are dropped BEFORE ranking.

- **Kendall tau-b** (the pandas variant, tie-corrected) counts
  concordant/discordant pairs. The statistic is inherently O(n²) in
  pairs, but it only depends on the multiset of (x, y) VALUE pairs —
  so the corpus is first compressed to distinct value pairs with
  counts (one groupBy), and the quadratic join runs over the m
  distinct pairs with multiplicative weights, not the n rows. For
  continuous data m ≈ n, so a guard raises beyond ``max_items``
  distinct pairs — at 100 TB silently shipping an n² shuffle is not
  an option. ``approx=True`` instead quantile-bins both sides to
  ``floor(sqrt(max_items))`` rank buckets (exact min-ranks from the
  distributed rank machinery — deterministic, engine-replayable
  integer arithmetic, NO sketch) and returns the exact tau-b of the
  binned data. All pair/tie counts are exact integers, so both the
  exact and the binned statistic replay bit-identically in any
  engine (the DuckDB oracle uses the same formula over the same
  integer counts).

Degenerate inputs (no pairwise-complete rows, zero variance,
min_periods unmet) return ``float('nan')`` — pandas parity, not None.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.operators.rank import add_rank

_NAN = float("nan")


def _pair_frame(sdf: SparkDF, ca: str, cb: str) -> SparkDF:
    """Pairwise-complete (x, y) projection — pandas corr drops rows
    where either side is null before computing the statistic.

    NaN is dropped too (r15, advisor item): pandas treats a double NaN
    like a missing value here, while Spark SQL orders NaN above every
    double — without this filter the plan-side finish counted NaN rows
    in P/Q/ties but the driver-side numpy finish silently excluded
    them from P/Q only, so the two finishes disagreed and neither
    matched pandas. Filtering makes driver and plan agree by
    construction. isnan(NULL) is false, so the NaN predicate never
    masks the null filter."""
    return (sdf.select(F.col(ca).cast("double").alias("x"),
                       F.col(cb).cast("double").alias("y"))
            .filter(F.col("x").isNotNull() & F.col("y").isNotNull()
                    & ~F.isnan("x") & ~F.isnan("y")))


def spearman_pair(sdf: SparkDF, ca: str, cb: str,
                  min_periods: int | None = None) -> float | None:
    """Spearman rho of two columns: average-method ranks over the
    pairwise-complete rows, then one Pearson aggregate.
    ``min_periods`` follows pandas corr: None when fewer
    pairwise-complete observations exist.

    r14 (optimization): the two rank passes are independent, so their
    per-value stats tables (value → average rank, the same
    ``__before + (cnt+1)/2`` closed form add_rank uses) are built
    CONCURRENTLY from a single snapshot of the pairwise-complete
    projection, then both joined in one plan. Same ranks, same
    Pearson — the serial chain of two full add_rank passes (each with
    its own eager prefix job) becomes one snapshot + two overlapped
    small-stats passes (guide §2.6)."""
    from concurrent.futures import ThreadPoolExecutor

    from mars_spark.operators.rank import prefix_stats

    # one snapshot: the frame is scanned by both stats passes and the
    # final join; without it each consumer re-runs the scan + filter
    d = _pair_frame(sdf, ca, cb).localCheckpoint()

    def _avg_rank_map(side: str):
        pv = (d.groupBy(F.col(side).alias("__v"))
              .agg(F.count(F.lit(1)).alias("__cnt")))
        st = prefix_stats(pv, "__v", "__cnt")
        return st.select(
            F.col("__v").alias(f"__v{side}"),
            (F.col("__before") + (F.col("__cnt") + 1) / 2.0)
            .cast("double").alias(f"__r{side}"))

    with ThreadPoolExecutor(max_workers=2) as ex:
        fx = ex.submit(_avg_rank_map, "x")
        fy = ex.submit(_avg_rank_map, "y")
        sx, sy = fx.result(), fy.result()
    dd = (d.join(sx, d["x"] == sx["__vx"])
          .join(sy, d["y"] == sy["__vy"]))
    try:
        row = dd.agg(F.corr("__rx", "__ry").alias("c"),
                     F.count(F.lit(1)).alias("n")).collect()[0]
    except Exception as e:  # ANSI DIVIDE_BY_ZERO: zero rank variance
        if "DIVIDE_BY_ZERO" not in str(e):
            raise
        return _NAN
    if min_periods and int(row["n"]) < min_periods:
        return _NAN
    return _NAN if row["c"] is None else float(row["c"])


def kendall_pair(sdf: SparkDF, ca: str, cb: str,
                 max_items: int = 20_000,
                 min_periods: int | None = None,
                 approx: bool = False) -> float:
    """Kendall tau-b of two columns (tie-corrected).

    tau_b = (P − Q) / sqrt((n0 − n1)(n0 − n2)) with
    n0 = n(n−1)/2, n1/n2 = Σ t(t−1)/2 over x/y tie groups, P/Q the
    concordant/discordant pair counts. The pair join runs over
    DISTINCT (x, y) value pairs weighted by their multiplicities;
    ``max_items`` bounds that distinct count (the join is O(m²)).

    Beyond the bound: with ``approx=False`` raise (never silently
    ship an n² shuffle); with ``approx=True`` deterministically
    quantile-bin both sides to B = floor(sqrt(max_items)) rank
    buckets — bucket = floor((min_rank−1)·B/n), exact distributed
    min-ranks, integer arithmetic — and return the exact tau-b of
    the binned data (≤ B² ≤ max_items distinct pairs at ANY corpus
    size). The binned tau is itself deterministic and replays
    bit-identically in SQL.
    """
    d = _pair_frame(sdf, ca, cb)
    if approx:
        # r14 (optimization): decide + bin from the RAW pair frame.
        # The old path materialized the distinct-(x,y) table first —
        # for continuous data m ≈ n, so that was a full-width shuffle
        # + checkpoint bought purely to count it, followed by two
        # SERIAL stats-join rounds over the same n-row frame. Now one
        # snapshot + one aggregate makes the decision, the two
        # per-side bucket maps build CONCURRENTLY (they are
        # independent — guide §2.6), and one join+groupBy compresses
        # straight to ≤ B² bucket pairs: the n-row frame is shuffled
        # zero times (per-side groupBys are map-side-combined
        # distinct-value aggregates). Buckets use the identical
        # integer arithmetic ((min_rank−1)·B div n), so the binned
        # tau is bit-identical to the previous form.
        d = d.localCheckpoint()
        arow = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("x"), F.col("y")).alias("m")
        ).collect()[0]
        n_all, m = int(arow["n"]), int(arow["m"])
        if m == 0:
            return _NAN
        if m > max_items:
            bins = max(2, int(math.isqrt(max_items)))
            bound = bins * bins
            from concurrent.futures import ThreadPoolExecutor

            from mars_spark.operators.rank import prefix_stats

            def _bucket_map(side: str):
                pv = (d.groupBy(F.col(side).alias("__v"))
                      .agg(F.count(F.lit(1)).alias("__cnt")))
                stats = prefix_stats(pv, "__v", "__cnt")
                # bucket = (min_rank−1)·B div n — pure INTEGER
                # division (`div`), so the bucket ids replay
                # bit-identically in any engine
                return stats.select(
                    F.col("__v").alias(f"__v{side}"),
                    F.expr(f"(__before * {bins}) div {n_all}")
                    .cast("bigint").alias(f"__b{side}"))

            with ThreadPoolExecutor(max_workers=2) as ex:
                fx = ex.submit(_bucket_map, "x")
                fy = ex.submit(_bucket_map, "y")
                sx, sy = fx.result(), fy.result()
            g = (d.join(sx, d["x"] == sx["__vx"])
                 .join(sy, d["y"] == sy["__vy"])
                 .groupBy(F.col("__bx").alias("x"),
                          F.col("__by").alias("y"))
                 .agg(F.count(F.lit(1)).alias("w")))
        else:
            bound = m
            g = d.groupBy("x", "y").agg(F.count(F.lit(1)).alias("w"))
        # the compressed frame is ≤ bound ≤ max_items rows; finish on
        # the driver only when the O(bound²) numpy sweep is cheap
        rows = g.collect() if bound <= _DRIVER_FINISH_CAP else None
        if rows is None:
            g, n = g.localCheckpoint(), n_all
    else:
        g = (d.groupBy("x", "y").agg(F.count(F.lit(1)).alias("w"))
             .localCheckpoint())  # reused by the finish aggregates
        grow = g.agg(F.count(F.lit(1)).alias("m"),
                     F.sum("w").alias("n")).collect()[0]
        m = int(grow["m"])
        if m == 0:
            return _NAN
        if m > max_items:
            raise ValueError(
                f"kendall: {m} distinct value pairs exceeds max_items="
                f"{max_items} (the concordance join is O(m^2)); pass "
                "approx=True for a deterministic rank-binned tau, "
                "pre-bin or sample the inputs, or raise max_items "
                "(Series.corr/DataFrame.corr/corr_matrix/corrwith all "
                "accept max_items= and approx=)")
        n = int(grow["n"])
        rows = g.collect() if m <= _DRIVER_FINISH_CAP else None
    if rows is not None:
        # r14 (optimization): the compressed frame is provably small
        # (≤ _DRIVER_FINISH_CAP distinct pairs / ≤ B² buckets), so the
        # tie counts and the O(m²) concordance sweep finish on the
        # driver in one vectorized numpy pass — replacing FOUR
        # driver-synchronous Spark jobs (n agg, two tie aggs, the
        # pair-join agg) with the one collect above. Identical
        # arithmetic: integer weights, double products, the same
        # tau-b closed form (guide §5: driver work is fine when the
        # data is bounded by construction).
        return _tau_b_driver(rows, min_periods)
    return _tau_b_plan(g, n, min_periods)


# bound on the driver-side finish. r14: the concordance sweep is
# Knight's O(m log m) Fenwick form (was O(m²) pair masks), so the cap
# rises 2048 → 65536 and EVERY default path finishes on the driver —
# including binned kendall at the default max_items=20000 (B² = 19881
# bucket pairs), which previously ran a 4-job plan-side finish with an
# O(m²) broadcast pair join. The plan-side path remains only for
# user-raised max_items beyond the cap (guide §5: driver work is fine
# when the data is bounded by construction — 65536 rows ≈ 1.5 MB).
_DRIVER_FINISH_CAP = 65536


def _tau_b_driver(rows, min_periods) -> float:
    """Exact tau-b from collected (x, y, w) distinct-pair rows.

    r14 (optimization): P and Q come from a weighted inversion sweep
    (Knight 1966) — x-groups ascending, a Fenwick tree over dense
    y-ranks accumulates the weight of already-passed groups, so each
    row reads its concordant (#y below) and discordant (#y above)
    mass in O(log m). All arithmetic is exact integers (weights are
    counts), so P/Q/n1/n2 are the same integers the O(m²) mask form
    produced and the returned tau is bit-identical. Rows with NaN on
    either side contribute to n and to the tie terms exactly as
    before (every comparison against NaN is false, so they never
    reach P/Q) — preserved by sweeping only the NaN-free subset."""
    import numpy as np

    n = sum(int(r["w"]) for r in rows)
    if n < 2 or (min_periods and n < min_periods):
        return _NAN
    xs = np.array([r["x"] for r in rows], dtype=np.float64)
    ys = np.array([r["y"] for r in rows], dtype=np.float64)
    ws = np.array([r["w"] for r in rows], dtype=np.float64)
    _, xinv = np.unique(xs, return_inverse=True)
    _, yinv = np.unique(ys, return_inverse=True)
    cx = np.bincount(xinv, weights=ws)
    cy = np.bincount(yinv, weights=ws)
    n1 = float((cx * (cx - 1) / 2.0).sum())
    n2 = float((cy * (cy - 1) / 2.0).sum())
    ok = ~(np.isnan(xs) | np.isnan(ys))
    xv = xs[ok]
    yv = ys[ok]
    wv = ws[ok].astype(np.int64)
    order = np.lexsort((yv, xv))
    xv, yv, wv = xv[order], yv[order], wv[order]
    _, yrk = np.unique(yv, return_inverse=True)
    yrk = yrk.astype(np.int64) + 1          # Fenwick is 1-indexed
    k = int(yrk.max()) if len(yrk) else 0
    tree = [0] * (k + 1)

    def _add(i: int, w: int) -> None:
        while i <= k:
            tree[i] += w
            i += i & -i

    def _pre(i: int) -> int:                # Σ weight at ranks ≤ i
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & -i
        return s

    p_i = 0
    q_i = 0
    seen = 0                                # total weight inserted
    m = len(xv)
    i = 0
    while i < m:
        j = i
        while j < m and xv[j] == xv[i]:
            j += 1
        for t in range(i, j):               # query before inserting
            r = int(yrk[t])
            w = int(wv[t])
            below = _pre(r - 1)
            at_or_below = _pre(r)
            p_i += w * below
            q_i += w * (seen - at_or_below)
        for t in range(i, j):               # then insert the x-group
            _add(int(yrk[t]), int(wv[t]))
            seen += int(wv[t])
        i = j
    p = float(p_i)
    q = float(q_i)
    n0 = n * (n - 1) / 2.0
    denom = math.sqrt((n0 - n1) * (n0 - n2))
    if denom == 0.0:
        return _NAN
    return (p - q) / denom


def _tau_b_plan(g: SparkDF, n: int, min_periods) -> float:
    """Plan-side tau-b finish over a snapshotted distinct-pair frame —
    the path for m beyond the driver cap (still ≤ max_items)."""
    if n < 2 or (min_periods and n < min_periods):
        return _NAN
    tx = (g.groupBy("x").agg(F.sum("w").alias("c"))
          .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("t"))
          .collect()[0]["t"])
    ty = (g.groupBy("y").agg(F.sum("w").alias("c"))
          .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("t"))
          .collect()[0]["t"])
    n1 = float(tx or 0.0)
    n2 = float(ty or 0.0)
    # ordered pair join over distinct value pairs: the condition
    # (xa < xb) OR (xa = xb AND ya < yb) enumerates each unordered
    # pair exactly once; build side is the guarded m-row frame, so
    # broadcast it and the join is one pruned nested-loop pass
    a = g.select(F.col("x").alias("xa"), F.col("y").alias("ya"),
                 F.col("w").alias("wa"))
    b = g.select(F.col("x").alias("xb"), F.col("y").alias("yb"),
                 F.col("w").alias("wb"))
    cond = (F.col("xa") < F.col("xb")) | (
        (F.col("xa") == F.col("xb")) & (F.col("ya") < F.col("yb")))
    ww = (F.col("wa") * F.col("wb")).cast("double")
    pq = (a.join(F.broadcast(b), cond)
          .agg(F.sum(F.when((F.col("xa") < F.col("xb"))
                            & (F.col("ya") < F.col("yb")), ww))
               .alias("p"),
               F.sum(F.when((F.col("xa") < F.col("xb"))
                            & (F.col("ya") > F.col("yb")), ww))
               .alias("q")).collect()[0])
    p = float(pq["p"] or 0.0)
    q = float(pq["q"] or 0.0)
    n0 = n * (n - 1) / 2.0
    denom = math.sqrt((n0 - n1) * (n0 - n2))
    if denom == 0.0:
        return _NAN
    return (p - q) / denom


def spearman_matrix_nulls(sdf: SparkDF, cols: list[str]):
    """Null-tolerant Spearman matrix in O(k) passes + ONE aggregate
    (replaces the old per-pair fallback: k(k−1)/2 sequential rank
    jobs — 1225 at k=50).

    pandas pairwise-complete semantics: for pair (a, b) each side is
    ranked over the rows where BOTH are non-null. Key identity: the
    average rank of a row's a-value within the (a,b)-complete subset
    is derivable from per-VALUE prefix counts of a alone —

        min_rank  = (#a<v, a non-null) − (#a<v, b null) + 1
        tie size  = (#a=v) − (#a=v, b null)
        avg rank  = (before_all − before_bnull) + (tie + 1) / 2

    so ONE groupBy per ordering column a (counting, per distinct
    a-value, the total rows and each other column's null rows) plus
    one shared multi-weight prefix pass (rank.prefix_stats_multi)
    yields the pair-complete ranks of a vs EVERY b simultaneously.
    k such passes + k value-joins + one aggregate of k(k−1)/2
    F.corr's finish the whole matrix — job count linear in k,
    independent of null patterns.

    Returns (vals, valid) — vals[(a, b)] the rho (float, NaN when
    undefined), valid[a] the column's non-null count (diagonal is
    1.0 only when ≥ 2 valid observations, pandas parity).
    """
    from mars_spark.operators.rank import prefix_stats_multi

    k = len(cols)
    names = [f"__c{i}" for i in range(k)]
    base = (sdf.select(*[F.col(c).alias(n)
                         for c, n in zip(cols, names)])
            .withColumn("__rid", F.monotonically_increasing_id())
            .localCheckpoint())   # one stable row id for every pass
    # One skinny LONG frame per ordering column — (rid, ia, ib,
    # rank) — instead of k chained joins onto one ever-wider frame:
    # the chained form made Catalyst re-analyze an O(k^2)-column
    # plan k times (measured super-cubic driver-side: k=16 57 s,
    # k=24 348 s). Here every branch is base JOIN (small per-value
    # stats) -> explode, the union is k branches of depth 2, and the
    # pair statistics come from ONE self-join on (rid, ia, ib) —
    # plan size O(k), data volume k(k-1)*n long rows (inherent to a
    # k x k pairwise-complete rank matrix).
    def _one_long(ia: int):
        # per-column stats pass = a localCheckpoint + an offsets
        # collect (driver-synchronous) — submit all k from a thread
        # pool so their stages interleave instead of serializing.
        # Expressions are SQL text (one F.expr each), not Column
        # trees: the O(k²) per-Column py4j round-trips otherwise
        # dominate the driver wall (round-2 lesson).
        a = names[ia]
        others = [ib for ib in range(k) if ib != ia]
        pv = (base.filter(F.col(a).isNotNull())
              .groupBy(F.col(a).alias("__v"))
              .agg(F.expr("count(1)").alias("__cnt"),
                   *[F.expr(f"sum(cast(({names[ib]} is null) as "
                            "bigint))").alias(f"__nb{ib}")
                     for ib in others]))
        stats = prefix_stats_multi(
            pv, "__v", ["__cnt"] + [f"__nb{ib}" for ib in others])
        # snap the (small, per-distinct-value) stats table: without
        # this every union branch re-embeds the k-weight window +
        # offset-map machinery and the UNION's analysis/codegen goes
        # quadratic-in-k on the driver (measured: 155 s of the k=50
        # wall was the union evaluation)
        stats = stats.localCheckpoint()
        j = base.join(stats, base[a] == stats["__v"], "left")
        parts = []
        for ib in others:
            parts.append(
                f"named_struct('ia', {ia}, 'ib', {ib}, 'r', "
                f"CASE WHEN {a} IS NOT NULL AND {names[ib]} IS NOT "
                f"NULL THEN CAST((__before___cnt - __before___nb{ib})"
                f" + (__cnt - __nb{ib} + 1) / 2.0 AS DOUBLE) END)")
        # materialize the branch (skinny (rid, ia, ib, r) rows, the
        # k²·n volume the pair statistics inherently need): the
        # thread pool overlaps the k branch jobs, and the UNION
        # becomes 50 leaf scans instead of one 2450-CASE plan whose
        # analysis alone took most of the k=50 wall
        return (j.select("__rid",
                         F.expr("explode(array(" + ", ".join(parts)
                                + "))").alias("e"))
                .select("__rid", "e.ia", "e.ib", "e.r")
                .filter(F.col("r").isNotNull())
                .localCheckpoint())

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, k)) as ex:
        longs = list(ex.map(_one_long, range(k)))
    u = longs[0]
    for nxt in longs[1:]:
        u = u.unionByName(nxt)
    # (no union snapshot needed: the branches are already
    # materialized leaves, so the self-join's two reads are cheap
    # block scans)
    lhs = u.filter(F.col("ia") < F.col("ib"))
    rhs = (u.filter(F.col("ia") > F.col("ib"))
           .select("__rid", F.col("ib").alias("ia"),
                   F.col("ia").alias("ib"), F.col("r").alias("rb")))
    pairs = lhs.join(rhs, ["__rid", "ia", "ib"])
    # manual pearson (try_divide) rather than F.corr: under ANSI a
    # zero-variance pair would abort the aggregate with
    # DIVIDE_BY_ZERO; try_divide yields null -> NaN for just that
    # pair (pandas parity). Rows are pair-complete by construction
    # (null ranks were filtered before the union).
    g = pairs.groupBy("ia", "ib").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("sx"), F.sum("rb").alias("sy"),
        F.sum(F.col("r") * F.col("rb")).alias("sxy"),
        F.sum(F.col("r") * F.col("r")).alias("sx2"),
        F.sum(F.col("rb") * F.col("rb")).alias("sy2"))
    rows = g.select(
        "ia", "ib",
        F.try_divide(
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
            F.sqrt(F.col("n") * F.col("sx2")
                   - F.col("sx") * F.col("sx"))
            * F.sqrt(F.col("n") * F.col("sy2")
                     - F.col("sy") * F.col("sy"))).alias("rho")
    ).collect()
    counts = base.agg(*[F.count(names[i]).alias(f"n_{i}")
                        for i in range(k)]).collect()[0]
    valid: dict[str, int] = {c: int(counts[f"n_{i}"])
                             for i, c in enumerate(cols)}
    vals: dict[tuple[str, str], float] = {}
    for ia in range(k):
        for ib in range(ia + 1, k):
            vals[(cols[ia], cols[ib])] = _NAN
            vals[(cols[ib], cols[ia])] = _NAN
    for r in rows:
        v = _NAN if r["rho"] is None else float(r["rho"])
        vals[(cols[int(r["ia"])], cols[int(r["ib"])])] = v
        vals[(cols[int(r["ib"])], cols[int(r["ia"])])] = v
    return vals, valid


def spearman_matrix_ranks(sdf: SparkDF, cols: list[str]) -> SparkDF:
    """Replace each column with its average-method global rank — the
    null-free fast path for corr_matrix(method='spearman'): k rank
    passes, then the existing one-agg Pearson matrix runs on the
    ranked frame. Only valid when no column has nulls (pandas'
    pairwise-complete deletion would otherwise re-rank per pair)."""
    out = sdf
    for c in cols:
        out = add_rank(out, c, method="average", out=f"__rk_{c}")
    return out.select(
        *[F.col(f"__rk_{c}").alias(c) for c in cols])
