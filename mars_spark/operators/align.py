"""Index alignment: the machinery behind pandas binary arithmetic
between two distinct frames.

Reference: mars/dataframe/indexing/reindex.py:49 (900-LoC chunk
realignment), mars/dataframe/align.py:48 + indexing/align.py:44 (the
DataFrameAlign operand every cross-frame binop tiles through). Mars
re-chunks both operands onto a common index partitioning; Spark-first,
alignment IS a join on the index columns — Catalyst picks broadcast vs
shuffle, and the union index falls out of the outer join. No row
materialization on the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _index_of(frame, what: str) -> list[str]:
    if not frame._index:
        raise ValueError(
            f"{what} requires an index on both frames — call "
            f"set_index()/set_sequence_index() first")
    return frame._index


def align_series(left, right, op, fill_value=None, name: str | None = None):
    """df1.a <op> df2.b — outer-join the two frames on their index and
    apply the op to the aligned value columns. fill_value substitutes
    for a missing side BEFORE the op (pandas .add(fill_value=...)
    contract: rows missing from both sides stay null)."""
    from mars_spark.core.frame import DataFrame
    from mars_spark.core.series import Series

    lf, rf = left._frame, right._frame
    li = _index_of(lf, "cross-frame arithmetic")
    ri = _index_of(rf, "cross-frame arithmetic")
    if len(li) != len(ri):
        raise ValueError(f"index arity mismatch: {li} vs {ri}")
    lsdf = lf._sdf.select(*li, left._col.alias("__l"))
    rsdf = rf._sdf.select(
        *[F.col(a).alias(b) for a, b in zip(ri, li)],
        right._col.alias("__r"),
    )
    j = lsdf.join(rsdf, on=li, how="outer")
    lcol, rcol = F.col("__l"), F.col("__r")
    if fill_value is not None:
        # pandas contract: fill substitutes for a missing SIDE; a row
        # missing from both sides stays missing (never op(fill, fill))
        lit = F.lit(fill_value)
        res = F.when(lcol.isNull() & rcol.isNull(), F.lit(None)).otherwise(
            op(F.coalesce(lcol, lit), F.coalesce(rcol, lit)))
    else:
        res = op(lcol, rcol)
    out = DataFrame(j, index=list(li))
    return Series(out, res, name or left.name)


def align_frames(lf, rf, join: str = "outer", fill_value=None):
    """pandas DataFrame.align: returns the two frames reindexed onto
    the union (or intersection/left/right) of their indexes."""
    from mars_spark.core.frame import DataFrame

    li = _index_of(lf, "align")
    ri = _index_of(rf, "align")
    if len(li) != len(ri):
        raise ValueError(f"index arity mismatch: {li} vs {ri}")
    how = {"outer": "outer", "inner": "inner", "left": "left",
           "right": "right"}[join]
    lsel = lf._sdf.select(
        *li, *[F.col(c).alias(f"__l_{c}") for c in lf.columns])
    rsel = rf._sdf.select(
        *[F.col(a).alias(b) for a, b in zip(ri, li)],
        *[F.col(c).alias(f"__r_{c}") for c in rf.columns],
    )
    j = lsel.join(rsel, on=li, how=how)

    def _side(prefix: str, cols: list[str]) -> DataFrame:
        out = j.select(
            *li, *[F.col(f"{prefix}{c}").alias(c) for c in cols])
        if fill_value is not None:
            out = out.fillna(fill_value, subset=cols)
        return DataFrame(out, index=list(li))

    return _side("__l_", lf.columns), _side("__r_", rf.columns)


def reindex(frame, index, fill_value=None):
    """Conform the frame to a new label list on its index columns
    (reference: mars/dataframe/indexing/reindex.py:49); a multi-column
    (MultiIndex) frame takes a list of label tuples. The label list is
    driver-provided by contract (it's a Python list in pandas too) —
    it becomes a broadcast side of a left join, so the data never
    funnels through the driver."""
    from mars_spark.core.frame import DataFrame

    idx = _index_of(frame, "reindex")
    spark = frame._sdf.sparkSession
    dtypes = dict(frame._sdf.dtypes)
    schema = ", ".join(f"`{c}` {dtypes[c]}" for c in idx)
    if len(idx) == 1:
        rows = [(v,) for v in index]
    else:
        rows = [tuple(v) for v in index]
    lbl = spark.createDataFrame(rows, schema)
    j = F.broadcast(lbl).join(frame._sdf, on=list(idx), how="left")
    if fill_value is not None:
        j = j.fillna(fill_value, subset=frame.columns)
    return DataFrame(j, index=list(idx))
