"""Join / concat operators (SURVEY.md §2.3).

Reference parity: mars/dataframe/merge/merge.py:166 (DataFrameMerge),
concat.py:41, append.py:32.

Mars hand-implements three physical join strategies and an auto-chooser
(merge.py:417,535,486,674). All of that is Catalyst + AQE here:

- one-chunk / broadcast strategy  → ``F.broadcast`` hint or
  ``autoBroadcastJoinThreshold`` (AQE also converts shuffle joins to
  broadcast at runtime when the built side turns out small);
- shuffle strategy                → shuffle-hash / sort-merge join,
  Catalyst picks;
- bloom-filter pre-filter (merge.py:369) →
  ``spark.sql.optimizer.runtime.bloomFilter.enabled`` (session.py);
- auto chunk re-merge (merge.py:741) → AQE coalescePartitions.

What we own is only pandas *API* semantics: suffixes on overlapping
non-key columns, keeping both key columns for left_on != right_on,
pandas how= names, indicator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mars_spark.core.frame import DataFrame

_HOW = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full",
    "full": "full",
    "cross": "cross",
    "leftsemi": "leftsemi",
    "semi": "leftsemi",
    "leftanti": "leftanti",
    "anti": "leftanti",
}


def merge(left: DataFrame, right: DataFrame, how: str = "inner", on=None,
          left_on=None, right_on=None, suffixes=("_x", "_y"),
          broadcast: bool | None = None,
          indicator: bool | str = False,
          null_matches: bool = True) -> DataFrame:
    """pandas.merge semantics on Spark joins (equi-join, like Mars).

    ``broadcast=True`` forces the small-side hint (Mars's explicit
    ``method='broadcast'``); default None lets Catalyst/AQE choose —
    the equivalent of Mars ``auto`` (merge.py:674) without the manual
    chunk-count heuristic. ``indicator`` adds the pandas provenance
    column (left_only/right_only/both — reference merge.py:166) from
    per-side marker columns, no extra join.

    ``null_matches=True`` (default) follows pandas/Mars: NaN join keys
    match each other, via a null-safe equi-join (Catalyst still plans
    hash/sort-merge). The semantic price is that scans cannot prune
    null keys (no IsNotNull pushdown — null rows might match). On keys
    known non-null (fact/dim ids at 100 TB), pass
    ``null_matches=False`` to restore SQL semantics and the pruning.
    """
    how = _HOW[how]
    lsdf, rsdf = left._sdf, right._sdf
    ind_name = None
    if indicator and how in ("leftsemi", "leftanti"):
        # semi/anti joins drop the right side entirely — an indicator is
        # meaningless (pandas has no semi/anti merge at all); refusing
        # beats the AnalysisException the marker column would raise.
        raise ValueError("indicator= is not supported with semi/anti joins")
    if indicator:
        ind_name = "_merge" if indicator is True else str(indicator)
        lsdf = lsdf.withColumn("__from_l", F.lit(1))
        rsdf = rsdf.withColumn("__from_r", F.lit(1))

    if on is not None:
        keys = [on] if isinstance(on, str) else list(on)
        left_keys = right_keys = keys
        same_key_names = True
    elif left_on is not None:
        left_keys = [left_on] if isinstance(left_on, str) else list(left_on)
        right_keys = [right_on] if isinstance(right_on, str) else list(right_on)
        same_key_names = left_keys == right_keys
    else:
        common = [c for c in left.columns if c in set(right.columns)]
        if not common:
            raise ValueError("no common columns to merge on")
        left_keys = right_keys = common
        same_key_names = True

    # pandas suffix rule: overlapping NON-key output columns get suffixes
    overlap = (set(lsdf.columns) & set(rsdf.columns)) - (
        set(left_keys) & set(right_keys) if same_key_names else set()
    )
    lsuf, rsuf = suffixes
    for c in overlap:
        lsdf = lsdf.withColumnRenamed(c, c + lsuf)
        rsdf = rsdf.withColumnRenamed(c, c + rsuf)
        left_keys = [c + lsuf if k == c else k for k in left_keys]
        right_keys = [c + rsuf if k == c else k for k in right_keys]

    if same_key_names and left_keys == right_keys and not null_matches:
        if broadcast:
            rsdf = F.broadcast(rsdf)
        joined = lsdf.join(rsdf, on=left_keys, how=how)
    elif same_key_names and left_keys == right_keys:
        # pandas (and Mars) match null keys as equal — NaN joins NaN.
        # Spark's USING join follows SQL and drops them, so join on
        # null-safe equality (still an equi-join: Catalyst extracts
        # EqualNullSafe keys into hash/sort-merge joins, no BNLJ) and
        # rebuild the single key column pandas emits.
        rtmp = {k: f"__rk_{k}" for k in right_keys}
        r2 = rsdf
        for k, t in rtmp.items():
            r2 = r2.withColumnRenamed(k, t)
        if broadcast:
            r2 = F.broadcast(r2)
        cond = None
        for k in left_keys:
            c = lsdf[k].eqNullSafe(r2[rtmp[k]])
            cond = c if cond is None else (cond & c)
        joined = lsdf.join(r2, on=cond, how=how)
        if how not in ("leftsemi", "leftanti"):
            # one key column under the original name: left's value,
            # falling back to right's for right/outer-only rows
            if how == "right":
                key_of = {k: F.coalesce(F.col(rtmp[k]), F.col(k))
                          for k in left_keys}
            elif how in ("outer", "full", "fullouter", "full_outer"):
                key_of = {k: F.coalesce(F.col(k), F.col(rtmp[k]))
                          for k in left_keys}
            else:
                key_of = {k: F.col(k) for k in left_keys}
            out_cols = [key_of[c].alias(c) if c in key_of else F.col(c)
                        for c in lsdf.columns]
            out_cols += [F.col(c) for c in r2.columns
                         if c not in rtmp.values()]
            joined = joined.select(*out_cols)
    else:
        if broadcast:
            rsdf = F.broadcast(rsdf)
        cond = None
        for lk, rk in zip(left_keys, right_keys):
            c = (lsdf[lk].eqNullSafe(rsdf[rk]) if null_matches
                 else lsdf[lk] == rsdf[rk])
            cond = c if cond is None else (cond & c)
        joined = lsdf.join(rsdf, on=cond, how=how)
    if ind_name is not None:
        joined = joined.withColumn(
            ind_name,
            F.when(F.col("__from_l").isNotNull()
                   & F.col("__from_r").isNotNull(), F.lit("both"))
            .when(F.col("__from_l").isNotNull(), F.lit("left_only"))
            .otherwise(F.lit("right_only")),
        ).drop("__from_l", "__from_r")
    return DataFrame(joined)


def concat(objs, axis: int = 0, join: str = "outer",
           ignore_index: bool = False) -> DataFrame:
    """reference: mars/dataframe/merge/concat.py:41.

    axis=0 → unionByName (allowMissingColumns for outer join semantics);
    axis=1 would require index alignment (a join on the index columns) —
    supported only when all inputs share identical index columns.
    """
    if axis == 0:
        out = objs[0]._sdf
        for o in objs[1:]:
            out = out.unionByName(o._sdf, allowMissingColumns=(join == "outer"))
        # ignore_index drops the index metadata (pandas: fresh range
        # index; positional ops would rebuild a sequence index lazily)
        return DataFrame(out, None if ignore_index else objs[0]._index)
    # axis=1: join successive frames on shared index columns
    base = objs[0]
    idx = base._index
    if not idx:
        raise NotImplementedError("concat(axis=1) requires set_index on all inputs")
    out = base._sdf
    for o in objs[1:]:
        if o._index != idx:
            raise ValueError("concat(axis=1): mismatched index columns")
        out = out.join(o._sdf, on=idx, how="full" if join == "outer" else "inner")
    return DataFrame(out, idx)


def merge_asof(left: DataFrame, right: DataFrame, on: str, by=None,
               direction: str = "backward", tolerance=None,
               suffixes=("_x", "_y"),
               allow_exact_matches: bool = True) -> DataFrame:
    """As-of join — absent from the reference (SURVEY.md §2.3 notes no
    merge_asof exists); added here because time-series pipelines need it.

    Spark-first plan: union both sides tagged with a source marker, sort
    within (by, on) once, and carry the most recent right-side row
    forward with a last(ignorenulls) window — one shuffle on ``by``,
    no per-key loops, no crossJoin. 'forward' is the mirrored window;
    'nearest' composes the backward and forward carries over the same
    union and keeps the closer timestamp (ties prefer backward, pandas
    semantics). allow_exact_matches=False flips the equal-key tie
    order so same-``on`` right rows fall outside the window frame.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    by = [by] if isinstance(by, str) else list(by or [])

    lsdf, rsdf = left._sdf, right._sdf
    overlap = (set(lsdf.columns) & set(rsdf.columns)) - {on, *by}
    for c in overlap:
        lsdf = lsdf.withColumnRenamed(c, c + suffixes[0])
        rsdf = rsdf.withColumnRenamed(c, c + suffixes[1])

    lcols = [c for c in lsdf.columns if c not in (on, *by)]
    rcols = [c for c in rsdf.columns if c not in (on, *by)]
    rtypes = dict(rsdf.dtypes)
    # The right side travels as ONE struct so a single last(ignorenulls)
    # carries the whole matched row — per-column fills would mix values
    # from different right rows whenever right columns contain nulls
    # (pandas carries the matched row verbatim, nulls included).
    null_struct = F.struct(
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in rcols],
        F.lit(None).cast(rtypes[on]).alias("__on"),
    )
    tagged_l = lsdf.select(
        *by, F.col(on), F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        null_struct.alias("__r"),
    )
    tagged_r = rsdf.select(
        *by, F.col(on), F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(lsdf.dtypes)[c]).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols],
                 F.col(on).alias("__on")).alias("__r"),
    )
    u = tagged_l.unionByName(tagged_r)

    def _matched(dirn):
        # equal-``on`` tie order controls exact-match visibility: a
        # right row at the same key matches only when it sorts INSIDE
        # the left row's window frame
        if dirn == "backward":
            tie = (F.col("__is_left").asc() if allow_exact_matches
                   else F.col("__is_left").desc())
            w = (Window.partitionBy(*by)
                 .orderBy(F.col(on).asc(), tie)
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            fill = F.last
        else:
            tie = (F.col("__is_left").desc() if allow_exact_matches
                   else F.col("__is_left").asc())
            w = (Window.partitionBy(*by)
                 .orderBy(F.col(on).asc(), tie)
                 .rowsBetween(Window.currentRow, Window.unboundedFollowing))
            fill = F.first
        return fill(
            F.when(F.col("__is_left") == 0, F.col("__r")), ignorenulls=True
        ).over(w)

    if direction == "nearest":
        out = (u.withColumn("__mb", _matched("backward"))
               .withColumn("__mf", _matched("forward"))
               .filter(F.col("__is_left") == 1))
        bd = F.col(on) - F.col("__mb.__on")
        fd = F.col("__mf.__on") - F.col(on)
        use_b = F.col("__mf.__on").isNull() | (
            F.col("__mb.__on").isNotNull() & (bd <= fd))
        out = out.withColumn(
            "__m", F.when(use_b, F.col("__mb")).otherwise(F.col("__mf")))
    else:
        out = (u.withColumn("__m", _matched(direction))
               .filter(F.col("__is_left") == 1))
    out = out.withColumn("__r_on", F.col("__m.__on"))
    for c in rcols:
        out = out.withColumn(c, F.col(f"__m.{c}"))
    if tolerance is not None:
        # direction-agnostic |on - matched_on| (backward matches have
        # __r_on <= on, forward the reverse, nearest either)
        within = F.when(
            F.col("__r_on") <= F.col(on), F.col(on) - F.col("__r_on")
        ).otherwise(F.col("__r_on") - F.col(on))
        keep = within <= F.lit(tolerance)
        for c in rcols:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return DataFrame(out.drop("__is_left", "__r", "__m", "__r_on",
                              "__mb", "__mf"))


def merge_range(left: DataFrame, right: DataFrame, point_col: str,
                lo_col: str, hi_col: str, by=None,
                bucket_width: int | None = None) -> DataFrame:
    """Point-in-interval (range) join — absent from the reference
    (SURVEY.md §2.3 lists it as unimplemented); added because
    time-series / attribution pipelines need it. Matches left rows
    whose ``point_col`` falls in ``[lo_col, hi_col)`` of a right row
    (optionally per ``by`` key).

    Spark plans a raw ``p >= lo AND p < hi`` theta-join as
    BroadcastNestedLoopJoin — O(|L|·|R|) and undriveable at scale when
    neither side broadcasts. This is the standard bucket
    decomposition instead: each interval is exploded to the
    ``bucket_width``-sized buckets it overlaps, each point hashes to
    exactly one bucket, and the equi-join on (by, bucket) + residual
    filter meets every (point, interval) pair exactly once — an
    ordinary shuffle(+broadcast when tiny) hash join. Replication is
    ~interval_width/bucket_width rows per interval and 1 per point,
    so pick bucket_width near the MEDIAN interval width: wider wastes
    bucket co-residents on the filter, narrower multiplies the
    interval side. Column names must be disjoint apart from ``by``.
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("merge_range requires a positive bucket_width")
    by = [by] if isinstance(by, str) else list(by or [])
    w = int(bucket_width)
    lsdf = left._sdf if isinstance(left, DataFrame) else left
    rsdf = right._sdf if isinstance(right, DataFrame) else right
    lb = lsdf.withColumn("__rb", F.floor(F.col(point_col) / w))
    rb = rsdf.withColumn(
        "__rb",
        F.explode(F.sequence(F.floor(F.col(lo_col) / w),
                             F.floor(F.col(hi_col) / w))))
    out = (lb.join(rb, on=["__rb"] + by)
           .filter((F.col(point_col) >= F.col(lo_col))
                   & (F.col(point_col) < F.col(hi_col)))
           .drop("__rb"))
    return DataFrame(out)
