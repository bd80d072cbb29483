"""Binning & encoding ops (SURVEY.md §2.8: cut/qcut/get_dummies).

Reference parity: mars/dataframe/base/cut.py:43, qcut.py,
get_dummies.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mars_spark.core.frame import DataFrame
from mars_spark.core.series import Series


def cut(series: Series, bins: list[float], labels: list[str] | None = None,
        right: bool = True) -> Series:
    """Fixed-edge binning → when-chain (JVM-side; equivalent to MLlib
    Bucketizer without the vector detour). Values outside the edges →
    NULL, matching pandas NaN."""
    col = series._col
    expr = None
    for i in range(len(bins) - 1):
        lo, hi = bins[i], bins[i + 1]
        if right:
            cond = (col > F.lit(lo)) & (col <= F.lit(hi))
        else:
            cond = (col >= F.lit(lo)) & (col < F.lit(hi))
        label = labels[i] if labels else f"({lo}, {hi}]" if right else f"[{lo}, {hi})"
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label))
    return Series(series._frame, expr, series.name)


def qcut(series: Series, q: int, labels: list[str] | None = None,
         relative_error: float = 1e-4, exact: bool = False) -> Series:
    """Quantile binning: edges from approxQuantile. The DEFAULT is
    approximate (relative_error=1e-4, indistinguishable at any sane bin
    count) because exact quantiles plan a full-precision pass — at
    100 TB the user should opt INTO exactness, not out of it. Pass
    exact=True (or relative_error=0) for bit-exact pandas-parity edges
    (the reference computes exact quantiles through its tensor
    machinery, mars/dataframe/base/qcut.py, same two-pass shape)."""
    if exact:
        relative_error = 0.0
    sdf = series._frame._sdf
    name = "__qcut_in"
    probe = sdf.select(series._col.alias(name))
    ps = [i / q for i in range(q + 1)]
    if relative_error == 0.0:
        # route through the distributed exact path (frame.quantile):
        # approxQuantile(err=0) degenerates at scale — see
        # DataFrame.quantile's docstring
        from mars_spark.core.frame import DataFrame as _DF

        edges = _DF(probe).quantile(name, ps, 0.0)[0]
    else:
        edges = probe.approxQuantile(name, ps, relative_error)
    edges[0] = edges[0] - 1e-9  # pandas includes the minimum
    uniq = sorted(set(edges))
    return cut(series, uniq, labels=labels)


def get_dummies(frame: DataFrame, column: str, prefix: str | None = None,
                max_categories: int = 1000) -> DataFrame:
    """One-hot encode a column (reference: base/get_dummies.py:360 —
    Mars computes global uniques then maps per chunk; here: distinct
    (one small agg) → static when-columns so downstream stays columnar).
    Guardrail: refuses blow-ups past max_categories."""
    values = [
        r[0] for r in
        frame._sdf.select(column).distinct().limit(max_categories + 1).collect()
    ]
    if len(values) > max_categories:
        raise ValueError(f"get_dummies: >{max_categories} categories")
    pref = prefix if prefix is not None else column
    sdf = frame._sdf
    for v in sorted(map(str, values)):
        sdf = sdf.withColumn(
            f"{pref}_{v}",
            (F.col(column).cast("string") == v).cast("int"))
    return DataFrame(sdf, frame._index)
