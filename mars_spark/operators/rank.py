"""Distributed rank: global ranks without a single-partition window.

Reference: mars/dataframe/base/rank.py ranks within chunks then merges
cumulative chunk counts — the same two-level scheme implemented here
with Spark primitives. A naive ``Window.orderBy(col)`` (no partition)
funnels the ENTIRE dataset through one WindowExec partition — a
driver-style bottleneck that dies at 100 TB. Instead:

1. aggregate per distinct value (shuffle with map-side combine —
   the stats table is |distinct values|, usually ≪ rows);
2. range-partition the stats table on the value (tiny shuffle), snap
   the layout (localCheckpoint), and compute per-partition subtotal
   offsets driver-side (#partitions rows — bounded);
3. intra-partition running sums via a window PARTITIONED BY the
   physical partition id (parallel, codegen'd) + the broadcast
   offsets give each distinct value its exclusive prefix count
   ``before`` and distinct index ``didx``;
4. every rank method is then a per-value closed form joined back:
   min = before+1, max = before+cnt, average = before+(cnt+1)/2,
   dense = didx+1, first = before + row_number within the tie group
   (a window partitioned by the VALUE — parallel).

All shuffles are on the (small) distinct-value table except the final
join back, which Catalyst/AQE makes a broadcast join whenever the
stats table is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window
from pyspark.sql import functions as F

# widest offset table inlined as a plan literal; beyond this the
# offsets broadcast-join instead (plan size must not grow with the
# cluster's shuffle width)
_OFFSET_LITERAL_MAX = 256


def prefix_stats(per_value: SparkDF, value_col: str, weight_col: str,
                 ascending: bool = True, with_total: bool = False):
    """Given an aggregated per-distinct-value table, add:

    - ``__before``: sum of ``weight_col`` over all strictly-preceding
      values (exclusive prefix sum in value order);
    - ``__didx``: number of strictly-preceding distinct values.

    No global window: range partition + driver-side offsets of the
    per-partition subtotals (the set_sequence_index prefix-sum scheme
    generalized to weighted counts).
    """
    order = (F.col(value_col).asc() if ascending
             else F.col(value_col).desc())
    d = (per_value.repartitionByRange(order)
         .sortWithinPartitions(order)
         .localCheckpoint())
    d = d.withColumn("__pid", F.spark_partition_id())
    offs = (d.groupBy("__pid")
            .agg(F.sum(weight_col).alias("__t"),
                 F.count(F.lit(1)).alias("__k"))
            .orderBy("__pid").collect())
    cum_off: dict[int, int] = {}
    idx_off: dict[int, int] = {}
    acc = dacc = 0
    for r in offs:
        cum_off[int(r["__pid"])] = acc
        idx_off[int(r["__pid"])] = dacc
        acc += int(r["__t"])
        dacc += int(r["__k"])
    if not cum_off:
        empty = (d.withColumn("__before", F.lit(0).cast("bigint"))
                 .withColumn("__didx", F.lit(0).cast("bigint"))
                 .drop("__pid"))
        return (empty, (0, 0)) if with_total else empty
    # Offset delivery is width-adaptive. Small partition counts inline
    # the offsets as create_map literals (measured ~1.5 s cheaper per
    # rank call at 32 partitions than a broadcast-join round trip);
    # past _OFFSET_LITERAL_MAX the offsets travel as a broadcast side
    # table instead — at 100 TB shuffle widths (10^4+ partitions) a
    # map literal grows the PLAN with the cluster size, while the
    # broadcast stays O(1) in the plan and O(#partitions) on the wire.
    w = (Window.partitionBy("__pid").orderBy(order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    if len(cum_off) <= _OFFSET_LITERAL_MAX:
        cmap = F.create_map(*[F.lit(x) for kv in cum_off.items()
                              for x in kv])
        imap = F.create_map(*[F.lit(x) for kv in idx_off.items()
                              for x in kv])
        coff, ioff = cmap[F.col("__pid")], imap[F.col("__pid")]
        joined = d
    else:
        off_tbl = F.broadcast(d.sparkSession.createDataFrame(
            [(p, cum_off[p], idx_off[p]) for p in cum_off],
            "__pid int, __coff bigint, __ioff bigint"))
        joined = d.join(off_tbl, "__pid", "left")
        coff = F.coalesce(F.col("__coff"), F.lit(0))
        ioff = F.coalesce(F.col("__ioff"), F.lit(0))
    stats = (joined
            .withColumn(
                "__before",
                (coff + F.sum(weight_col).over(w)
                 - F.col(weight_col)).cast("bigint"))
            .withColumn(
                "__didx",
                (ioff + F.count(F.lit(1)).over(w)
                 - 1).cast("bigint"))
            .drop("__pid", "__coff", "__ioff"))
    # acc / dacc are the grand total of weight_col and the distinct-
    # value count — already computed for the offsets, free for callers
    # (rank pct denominators: total rows, except dense which pandas
    # divides by the DISTINCT count)
    return (stats, (acc, dacc)) if with_total else stats


def prefix_stats_multi(per_value: SparkDF, value_col: str,
                       weight_cols: list[str],
                       ascending: bool = True) -> SparkDF:
    """``prefix_stats`` generalized to SEVERAL weight columns sharing
    one range partitioning: adds ``__before_<w>`` (exclusive prefix
    sum in value order) for each ``w`` in ``weight_cols``. One
    repartitionByRange + one per-partition-subtotal job total — the
    per-weight work is only extra window-sum columns inside the same
    codegen'd projection. Powers the one-pass null-tolerant Spearman
    matrix (operators/corr.py), where each ordering column needs
    prefix counts of every OTHER column's null indicator."""
    order = (F.col(value_col).asc() if ascending
             else F.col(value_col).desc())
    d = (per_value.repartitionByRange(order)
         .sortWithinPartitions(order)
         .localCheckpoint())
    d = d.withColumn("__pid", F.spark_partition_id())
    offs = (d.groupBy("__pid")
            .agg(*[F.sum(w).alias(w) for w in weight_cols])
            .orderBy("__pid").collect())
    acc = {w: 0 for w in weight_cols}
    cum: dict[str, dict[int, int]] = {w: {} for w in weight_cols}
    for r in offs:
        pid = int(r["__pid"])
        for w in weight_cols:
            cum[w][pid] = acc[w]
            acc[w] += int(r[w] or 0)
    if not offs:
        for w in weight_cols:
            d = d.withColumn(f"__before_{w}",
                             F.lit(0).cast("bigint"))
        return d.drop("__pid")
    win = (Window.partitionBy("__pid").orderBy(order)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    if len(offs) <= _OFFSET_LITERAL_MAX:
        # map literals as ONE F.expr per weight, not 2·P F.lit
        # columns: with many weights × partitions the per-Column py4j
        # round-trips dominated the whole pass (round-2 lesson)
        offc = {w: F.expr(
            "map(" + ", ".join(f"{p}, {v}L"
                               for p, v in cum[w].items()) + ")"
            + "[__pid]")
            for w in weight_cols}
        joined = d
    else:
        off_tbl = F.broadcast(d.sparkSession.createDataFrame(
            [(p, *[cum[w][p] for w in weight_cols])
             for p in sorted(cum[weight_cols[0]])],
            "__pid int, " + ", ".join(
                f"`__off_{w}` bigint" for w in weight_cols)))
        joined = d.join(off_tbl, "__pid", "left")
        offc = {w: F.coalesce(F.col(f"__off_{w}"), F.lit(0))
                for w in weight_cols}
    for w in weight_cols:
        joined = joined.withColumn(
            f"__before_{w}",
            (offc[w] + F.sum(w).over(win) - F.col(w)).cast("bigint"))
    return joined.drop("__pid",
                       *[f"__off_{w}" for w in weight_cols])


def add_ranks(sdf: SparkDF, col: str, methods: dict[str, str],
              ascending: bool = True,
              order_col: str | None = None) -> SparkDF:
    """Multi-method rank with ONE shared stats pass: the per-value
    aggregate, prefix sums, and the join back are method-independent,
    so ranking the same column under several methods (a common
    analytics shape) costs one scan + one join instead of one per
    method. ``methods`` maps output column name → method name."""
    bad = set(methods.values()) - {"average", "min", "max", "dense", "first"}
    if bad:
        raise ValueError(sorted(bad))
    per_value = (sdf.select(F.col(col).alias("__v"))
                 .filter(F.col("__v").isNotNull())
                 .groupBy("__v")
                 .agg(F.count(F.lit(1)).alias("__cnt")))
    stats = prefix_stats(per_value, "__v", "__cnt", ascending=ascending)

    tie_col = order_col
    if "first" in methods.values() and tie_col is None:
        tie_col = "__mid"
        sdf = sdf.withColumn("__mid", F.monotonically_increasing_id())
    j = sdf.join(stats, sdf[col] == stats["__v"], "left").drop("__v")
    forms = {
        "min": lambda: F.col("__before") + 1,
        "max": lambda: F.col("__before") + F.col("__cnt"),
        "dense": lambda: F.col("__didx") + 1,
        "average": lambda: F.col("__before") + (F.col("__cnt") + 1) / 2.0,
        "first": lambda: F.col("__before") + F.row_number().over(
            Window.partitionBy(col).orderBy(F.col(tie_col).asc())),
    }
    for out, method in methods.items():
        j = j.withColumn(out, F.when(F.col(col).isNotNull(),
                                     forms[method]().cast("double")))
    j = j.drop("__before", "__didx", "__cnt")
    return j.drop("__mid") if tie_col == "__mid" else j


def add_rank(sdf: SparkDF, col: str, method: str = "average",
             ascending: bool = True, out: str = "__rank__",
             order_col: str | None = None, pct: bool = False) -> SparkDF:
    """Return ``sdf`` with a global rank column (pandas semantics:
    nulls unranked → null rank). Methods: average/min/max/dense/first.

    ``order_col``: column that defines the frame's logical row order
    (a materialized sequence index) — used to break ties for
    method='first'. Without one, ties break by the physical plan
    order (monotonically_increasing_id), which matches pandas only
    when the layout preserves read order.

    ``pct=True`` divides by the count of ranked (non-null) values —
    except method='dense', which pandas divides by the number of
    DISTINCT values; both denominators fall out of the prefix-sum
    offsets pass, so pct costs no extra job.
    """
    if method not in ("average", "min", "max", "dense", "first"):
        raise ValueError(method)
    per_value = (sdf.select(F.col(col).alias("__v"))
                 .filter(F.col("__v").isNotNull())
                 .groupBy("__v")
                 .agg(F.count(F.lit(1)).alias("__cnt")))
    stats, (total, n_distinct) = prefix_stats(
        per_value, "__v", "__cnt", ascending=ascending, with_total=True)

    tie_col = order_col
    if method == "first" and tie_col is None:
        # no logical order available: physical plan order disambiguates
        # ties; the id is assigned BEFORE the join so it reflects the
        # input frame's layout
        tie_col = "__mid"
        sdf = sdf.withColumn("__mid", F.monotonically_increasing_id())
    j = sdf.join(stats, sdf[col] == stats["__v"], "left").drop("__v")
    if method == "min":
        r = F.col("__before") + 1
    elif method == "max":
        r = F.col("__before") + F.col("__cnt")
    elif method == "dense":
        r = F.col("__didx") + 1
    elif method == "average":
        r = F.col("__before") + (F.col("__cnt") + 1) / 2.0
    else:  # first
        tie = Window.partitionBy(col).orderBy(F.col(tie_col).asc())
        r = F.col("__before") + F.row_number().over(tie)
    r = r.cast("double")
    if pct:
        # pandas: dense pct divides by the number of DISTINCT values,
        # every other method by the non-null row count
        denom = n_distinct if method == "dense" else total
        r = r / F.lit(float(denom or 1))
    j = j.withColumn(out, F.when(F.col(col).isNotNull(), r))
    j = j.drop("__before", "__didx", "__cnt")
    return j.drop("__mid") if tie_col == "__mid" else j
