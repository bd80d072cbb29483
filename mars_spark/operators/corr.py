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
  distinct pairs with guidance to pre-aggregate/sample — at 100 TB a
  sampled tau is the honest answer, silently shipping an n² shuffle
  is not. All pair/tie counts are exact integers, so the statistic
  replays bit-identically in any engine (the DuckDB oracle uses the
  same formula over the same integer counts).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.operators.rank import add_rank


def _pair_frame(sdf: SparkDF, ca: str, cb: str) -> SparkDF:
    """Pairwise-complete (x, y) projection — pandas corr drops rows
    where either side is null before computing the statistic."""
    return (sdf.select(F.col(ca).cast("double").alias("x"),
                       F.col(cb).cast("double").alias("y"))
            .filter(F.col("x").isNotNull() & F.col("y").isNotNull()))


def spearman_pair(sdf: SparkDF, ca: str, cb: str,
                  min_periods: int | None = None) -> float | None:
    """Spearman rho of two columns: average-method ranks over the
    pairwise-complete rows, then one Pearson aggregate.
    ``min_periods`` follows pandas corr: None when fewer
    pairwise-complete observations exist."""
    d = _pair_frame(sdf, ca, cb)
    d = add_rank(d, "x", method="average", out="__rx")
    d = add_rank(d, "y", method="average", out="__ry")
    row = d.agg(F.corr("__rx", "__ry").alias("c"),
                F.count(F.lit(1)).alias("n")).collect()[0]
    if min_periods and int(row["n"]) < min_periods:
        return None
    return row["c"]


def kendall_pair(sdf: SparkDF, ca: str, cb: str,
                 max_items: int = 20_000,
                 min_periods: int | None = None) -> float | None:
    """Kendall tau-b of two columns (exact, tie-corrected).

    tau_b = (P − Q) / sqrt((n0 − n1)(n0 − n2)) with
    n0 = n(n−1)/2, n1/n2 = Σ t(t−1)/2 over x/y tie groups, P/Q the
    concordant/discordant pair counts. The pair join runs over
    DISTINCT (x, y) value pairs weighted by their multiplicities;
    ``max_items`` bounds that distinct count (the join is O(m²)) —
    beyond it, pre-bin or sample the input and call again.
    """
    d = _pair_frame(sdf, ca, cb)
    g = (d.groupBy("x", "y").agg(F.count(F.lit(1)).alias("w"))
         .localCheckpoint())  # reused by 3 aggregates + the pair join
    m = g.count()
    if m == 0:
        return None
    if m > max_items:
        raise ValueError(
            f"kendall: {m} distinct value pairs exceeds max_items="
            f"{max_items} (the concordance join is O(m^2)); pre-bin "
            "or sample the inputs, or raise max_items explicitly")
    # marginal tie counts from the compressed frame (exact integers)
    row = g.agg(F.sum("w").alias("n")).collect()[0]
    n = int(row["n"])
    if n < 2 or (min_periods and n < min_periods):
        return None
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
        return None
    return (p - q) / denom


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
