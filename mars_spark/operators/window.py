"""Moving-window operators (SURVEY.md §2.5).

Reference parity: mars/dataframe/window/rolling/aggregation.py:41
(rolling), expanding/aggregation.py:119, ewm/aggregation.py:207,
base/shift.py:31, base/diff.py:29, base/pct_change.py.

Mars tiles windows by pulling boundary rows from neighboring chunks
(rolling/aggregation.py:236). Spark's Window spec does the same thing
inside the shuffle service: ``rowsBetween`` frames never materialize a
group, they stream sorted partitions. The one true gap is EWM — no
native exponentially-weighted aggregate — handled in ewm_agg as an
Arrow-batched applyInPandas per group (pandas' C ewm kernel), the
sanctioned per-group escape hatch; every other operator here is a pure
JVM window expression.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Window
from pyspark.sql import functions as F

from mars_spark.core.frame import DataFrame


def _global_window_warning(what: str) -> None:
    """An unpartitioned ordered window funnels the ENTIRE dataset
    through one WindowExec task — fine on a laptop-sized frame, fatal
    at cluster scale. The corpus always partitions; warn naive callers
    instead of silently planning the bottleneck."""
    warnings.warn(
        f"{what} without partition_by plans a single-partition global "
        f"window — every row flows through ONE task. Pass partition_by "
        f"(or groupby(...) first) for a partition-parallel plan.",
        UserWarning, stacklevel=4)

# every value takes (col, window_spec) -> Column so composite
# expressions (the pandas-corrected moments, r13) can apply .over(w)
# to each inner aggregate instead of to one wrapped function
def _windowed_skew_g1(c, w):
    n = F.count(c).over(w).cast("double")
    return F.when(n > 2, F.skewness(c).over(w)
                  * F.sqrt(n * (n - 1)) / (n - 2))


def _windowed_kurt_g2(c, w):
    n = F.count(c).over(w).cast("double")
    return F.when(n > 3, (n - 1) / ((n - 2) * (n - 3))
                  * ((n + 1) * F.kurtosis(c).over(w) + 6))


def _windowed_median(c, w):
    arr = F.array_sort(F.collect_list(c).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return F.when(n > 0, (lo + hi) / 2.0)


_ROLL_FUNCS = {
    "sum": lambda c, w: F.sum(c).over(w),
    "mean": lambda c, w: F.avg(c).over(w),
    "min": lambda c, w: F.min(c).over(w),
    "max": lambda c, w: F.max(c).over(w),
    "count": lambda c, w: F.count(c).over(w),
    "std": lambda c, w: F.stddev_samp(c).over(w),
    "var": lambda c, w: F.var_samp(c).over(w),
    # r13 parity fill-ins (reference rolling/core.py exposes
    # median/skew/kurt): exact in-window median; skew/kurt carry the
    # same pandas G1/G2 sample corrections as the frame and groupby
    # forms, so rolling(n).skew() == pandas on every window.
    # median builds from collect_list (frame-capable) because Spark's
    # median/percentile aggregates reject ordered window frames —
    # per-row memory is bounded by the rolling window width, which is
    # small by definition
    "median": _windowed_median,
    "skew": _windowed_skew_g1,
    "kurt": _windowed_kurt_g2,
}


def _numeric_cols(frame: DataFrame) -> list[str]:
    num = ("int", "bigint", "double", "float", "smallint", "tinyint",
           "decimal")
    return [c for c, t in frame._sdf.dtypes
            if any(t.startswith(n) for n in num)]


def _offset_seconds(offset: str) -> int:
    """'90s' / '5min' / '2h' / '1d' → seconds (pandas offset subset)."""
    import re

    m = re.fullmatch(r"(\d+)\s*(s|sec|min|t|h|d)", offset.strip().lower())
    if not m:
        raise ValueError(f"unsupported window offset: {offset!r}")
    n, unit = int(m.group(1)), m.group(2)
    return n * {"s": 1, "sec": 1, "min": 60, "t": 60, "h": 3600, "d": 86400}[unit]


def _order_cols(frame: DataFrame, order_by):
    if order_by is None:
        if frame._index:
            order_by = frame._index
        else:
            raise ValueError(
                "window ops need an explicit order_by (no implicit row order "
                "on a distributed frame)"
            )
    return [order_by] if isinstance(order_by, str) else list(order_by)


class Rolling:
    """df.rolling(n) — int windows via rowsBetween; offset (time-based)
    windows via rangeBetween on the epoch seconds of a timestamp col."""

    def __init__(self, frame: DataFrame, window, min_periods=None,
                 order_by=None, partition_by=None, on=None):
        self._frame = frame
        self._window = window
        self._min_periods = min_periods
        self._order_by = order_by
        self._partition_by = ([partition_by] if isinstance(partition_by, str)
                              else list(partition_by or []))
        self._on = on

    def over(self, order_by=None, partition_by=None) -> "Rolling":
        return Rolling(self._frame, self._window, self._min_periods,
                       order_by or self._order_by,
                       partition_by or self._partition_by, self._on)

    def _spec(self):
        order = _order_cols(self._frame, self._order_by)
        if not self._partition_by:
            _global_window_warning("rolling")
        w = Window.partitionBy(*self._partition_by) if self._partition_by else Window.partitionBy()
        if isinstance(self._window, int):
            return (w.orderBy(*[F.col(c) for c in order])
                    .rowsBetween(-(self._window - 1), 0))
        # offset window: '10s', '5min' … over a single timestamp order col
        secs = _offset_seconds(self._window)
        return (w.orderBy(F.col(order[0]).cast("timestamp").cast("long"))
                .rangeBetween(-(secs - 1), 0))

    def agg(self, spec: dict) -> DataFrame:
        w = self._spec()
        sdf = self._frame._sdf
        mp = self._min_periods if self._min_periods is not None else (
            self._window if isinstance(self._window, int) else 1)
        for col, fns in spec.items():
            fns = fns if isinstance(fns, (list, tuple)) else [fns]
            for fn in fns:
                out = f"{col}_roll_{fn}"
                val = _ROLL_FUNCS[fn](F.col(col), w)
                if mp and mp > 1:
                    val = F.when(F.count(F.col(col)).over(w) >= mp, val)
                sdf = sdf.withColumn(out, val)
        return DataFrame(sdf, self._frame._index)

    def sum(self, cols=None):
        return self.agg({c: "sum" for c in cols or self._numeric_cols()})

    def mean(self, cols=None):
        return self.agg({c: "mean" for c in cols or self._numeric_cols()})

    def min(self, cols=None):
        return self.agg({c: "min" for c in cols or self._numeric_cols()})

    def max(self, cols=None):
        return self.agg({c: "max" for c in cols or self._numeric_cols()})

    def median(self, cols=None):
        return self.agg({c: "median"
                         for c in cols or self._numeric_cols()})

    def skew(self, cols=None):
        return self.agg({c: "skew" for c in cols or self._numeric_cols()})

    def kurt(self, cols=None):
        return self.agg({c: "kurt" for c in cols or self._numeric_cols()})

    kurtosis = kurt

    def _numeric_cols(self):
        return _numeric_cols(self._frame)


class Expanding(Rolling):
    """reference: mars/dataframe/window/expanding/aggregation.py:119"""

    def __init__(self, frame: DataFrame, min_periods: int = 1,
                 order_by=None, partition_by=None):
        super().__init__(frame, window=None, min_periods=min_periods,
                         order_by=order_by, partition_by=partition_by)

    def over(self, order_by=None, partition_by=None) -> "Expanding":
        # Rolling.over would rebuild a Rolling (positional window arg);
        # keep the expanding frame spec
        return Expanding(self._frame, self._min_periods,
                         order_by or self._order_by,
                         partition_by or self._partition_by)

    def _spec(self):
        order = _order_cols(self._frame, self._order_by)
        if not self._partition_by:
            _global_window_warning("expanding")
        w = Window.partitionBy(*self._partition_by) if self._partition_by else Window.partitionBy()
        return (w.orderBy(*[F.col(c) for c in order])
                .rowsBetween(Window.unboundedPreceding, 0))

    def agg(self, spec: dict) -> DataFrame:
        w = self._spec()
        sdf = self._frame._sdf
        for col, fns in spec.items():
            fns = fns if isinstance(fns, (list, tuple)) else [fns]
            for fn in fns:
                out = f"{col}_exp_{fn}"
                val = _ROLL_FUNCS[fn](F.col(col), w)
                if self._min_periods > 1:
                    val = F.when(
                        F.count(F.col(col)).over(w) >= self._min_periods, val)
                sdf = sdf.withColumn(out, val)
        return DataFrame(sdf, self._frame._index)


def shift(frame: DataFrame, periods: int = 1, order_by=None,
          partition_by=None, cols=None, suffix: str = "_shift") -> DataFrame:
    """reference: mars/dataframe/base/shift.py:31. Mars exchanges
    boundary rows between chunks; lag/lead over a sorted window is the
    built-in equivalent."""
    order = _order_cols(frame, order_by)
    w = (Window.partitionBy(*(partition_by or []))
         .orderBy(*[F.col(c) for c in order]))
    fn = (lambda c: F.lag(c, periods)) if periods >= 0 else (
        lambda c: F.lead(c, -periods))
    sdf = frame._sdf
    for c in cols or [x for x in frame.columns if x not in order]:
        sdf = sdf.withColumn(c + suffix, fn(F.col(c)).over(w))
    return DataFrame(sdf, frame._index)


def diff(frame: DataFrame, periods: int = 1, order_by=None,
         partition_by=None, cols=None) -> DataFrame:
    """reference: mars/dataframe/base/diff.py:29 → col - lag(col, n)"""
    order = _order_cols(frame, order_by)
    w = (Window.partitionBy(*(partition_by or []))
         .orderBy(*[F.col(c) for c in order]))
    sdf = frame._sdf
    num = ("int", "bigint", "double", "float", "smallint", "tinyint")
    targets = cols or [c for c, t in frame._sdf.dtypes
                       if any(t.startswith(n) for n in num) and c not in order]
    for c in targets:
        sdf = sdf.withColumn(c + "_diff", F.col(c) - F.lag(F.col(c), periods).over(w))
    return DataFrame(sdf, frame._index)


def pct_change(frame: DataFrame, periods: int = 1, order_by=None,
               partition_by=None, cols=None) -> DataFrame:
    """reference: mars/dataframe/base/pct_change.py → col/lag(col) - 1"""
    order = _order_cols(frame, order_by)
    w = (Window.partitionBy(*(partition_by or []))
         .orderBy(*[F.col(c) for c in order]))
    sdf = frame._sdf
    for c in cols or []:
        # try_divide: a zero previous value yields null (not an ANSI
        # error — Spark 4 runs ANSI-on by default)
        sdf = sdf.withColumn(
            c + "_pct",
            F.try_divide(F.col(c), F.lag(F.col(c), periods).over(w)) - 1)
    return DataFrame(sdf, frame._index)


def cumsum(frame: DataFrame, cols, order_by, partition_by=None) -> DataFrame:
    """reference: mars/dataframe/reduction/cumsum.py:21 — Mars computes
    per-chunk cumulatives plus carried summaries (reduction/core.py:453);
    an ordered running-frame window is the one-liner equivalent."""
    order = _order_cols(frame, order_by)
    w = (Window.partitionBy(*(partition_by or []))
         .orderBy(*[F.col(c) for c in order])
         .rowsBetween(Window.unboundedPreceding, 0))
    sdf = frame._sdf
    for c in ([cols] if isinstance(cols, str) else cols):
        sdf = sdf.withColumn(c + "_cumsum", F.sum(F.col(c)).over(w))
    return DataFrame(sdf, frame._index)


def cumprod(frame: DataFrame, cols, order_by, partition_by=None) -> DataFrame:
    """reference: mars/dataframe/reduction/cumprod.py:21 — running
    product. F.product is a first-class Spark aggregate, so the window
    form handles signs and zeros natively (no exp/ln round-trip, exact
    match with DuckDB's product() window); pandas NaN-passthrough
    semantics via the isNotNull gate like the other cum* ops."""
    order = _order_cols(frame, order_by)
    w = (Window.partitionBy(*(partition_by or []))
         .orderBy(*[F.col(c) for c in order])
         .rowsBetween(Window.unboundedPreceding, 0))
    sdf = frame._sdf
    for c in ([cols] if isinstance(cols, str) else cols):
        sdf = sdf.withColumn(
            c + "_cumprod",
            F.when(F.col(c).isNotNull(), F.product(F.col(c)).over(w)))
    return DataFrame(sdf, frame._index)


def ewm_agg(frame: DataFrame, col: str, alpha: float, order_by,
            partition_by=None, stats=("mean",), adjust: bool = True,
            bias: bool = False, prefix: str | None = None) -> DataFrame:
    """Exponentially-weighted mean/var/std, pandas semantics.

    reference: mars/dataframe/window/ewm/aggregation.py:207 — Mars
    distributes EWM with per-chunk partials and decay-weight combines,
    and implements mean+var+std. EWM is a sequential recurrence with no
    native Spark aggregate (SURVEY.md §4.2 custom-work item (c)).
    Spark-first treatment: when ``partition_by`` is given, each group
    is independent → one shuffle on the keys, then pandas'
    C-implemented ewm per group via Arrow-batched applyInPandas (the
    sanctioned per-group escape hatch). A global EWM (no partition_by)
    is inherently sequential and runs as a single group — correct, but
    not parallel; callers at scale should always partition.
    """
    if not (0 < alpha <= 1):
        raise ValueError("alpha must be in (0, 1]")
    bad = set(stats) - {"mean", "var", "std"}
    if bad:
        raise ValueError(f"unsupported ewm stats: {bad}")
    order = _order_cols(frame, order_by)
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    prefix = prefix or f"{col}_ewm"
    sdf = frame._sdf
    if not keys:
        sdf = sdf.withColumn("__g", F.lit(0))
        keys = ["__g"]

    out_cols = [f"{prefix}_{s}" for s in stats]
    schema_str = ", ".join(f"`{n}` {t}" for n, t in sdf.dtypes) + "".join(
        f", `{c}` double" for c in out_cols)

    def _ewm(pdf):
        pdf = pdf.sort_values(order)
        ew = pdf[col].ewm(alpha=alpha, adjust=adjust)
        for s, out_name in zip(stats, out_cols):
            if s == "mean":
                pdf[out_name] = ew.mean()
            elif s == "var":
                pdf[out_name] = ew.var(bias=bias)
            else:
                pdf[out_name] = ew.std(bias=bias)
        return pdf

    res = sdf.groupBy(*keys).applyInPandas(_ewm, schema=schema_str)
    if "__g" in res.columns:
        res = res.drop("__g")
    return DataFrame(res, frame._index)


def ewm_mean(frame: DataFrame, col: str, alpha: float, order_by,
             partition_by=None, out: str | None = None,
             adjust: bool = True) -> DataFrame:
    """Back-compat wrapper: single-stat EWM mean (see ewm_agg)."""
    prefix = out or f"{col}_ewm"
    res = ewm_agg(frame, col, alpha, order_by, partition_by=partition_by,
                  stats=("mean",), adjust=adjust, prefix="__tmp_ewm")
    sdf = res._sdf.withColumnRenamed("__tmp_ewm_mean", prefix)
    return DataFrame(sdf, frame._index)


class EWM:
    """``df.ewm(alpha=..., order_by=...)`` — the reference's method
    form (mars/dataframe/window/ewm/core.py builds an EWM window
    object with .agg/.mean/.var/.std) over :func:`ewm_agg`. Column
    goes to the stat call: ``df.ewm(alpha=0.2,
    order_by="ts").mean("value")``."""

    def __init__(self, frame: DataFrame, alpha: float, order_by=None,
                 partition_by=None, adjust: bool = True,
                 bias: bool = False):
        self._frame = frame
        self._alpha = alpha
        self._order_by = order_by
        self._partition_by = partition_by
        self._adjust = adjust
        self._bias = bias

    def agg(self, col: str, stats=("mean",),
            prefix: str | None = None) -> DataFrame:
        return ewm_agg(self._frame, col, self._alpha, self._order_by,
                       partition_by=self._partition_by, stats=stats,
                       adjust=self._adjust, bias=self._bias,
                       prefix=prefix)

    def mean(self, col: str) -> DataFrame:
        return self.agg(col, stats=("mean",))

    def var(self, col: str) -> DataFrame:
        return self.agg(col, stats=("var",))

    def std(self, col: str) -> DataFrame:
        return self.agg(col, stats=("std",))


class Resampler:
    """``df.resample(rule, on).agg({...})`` — pandas-style time
    resampling as a tumbling-window groupBy (additive; the reference
    has no resample op). The bucket is ``F.window(on, rule)``: epoch-
    aligned, matching pandas' default origin for intraday rules; the
    agg is map-side-combined, so at 100 TB this is the cheapest shape
    a time rollup can take (one shuffle keyed by bucket [+ ``by``]).
    """

    def __init__(self, frame: DataFrame, rule: str, on: str, by=()):
        self._frame = frame
        self._rule = rule
        self._on = on
        self._by = list(by)

    def agg(self, spec: dict) -> DataFrame:
        secs = _offset_seconds(self._rule)
        win = F.window(F.col(self._on), f"{secs} seconds")
        exprs = []
        for col, fns in spec.items():
            fns = fns if isinstance(fns, (list, tuple)) else [fns]
            for fn in fns:
                # "size" = row count of the bucket (count(*) — the
                # pandas .size()/len semantics); "count" = non-null
                # count of the column, matching pandas .count().
                # Plain (non-window) aggregates come from the groupby
                # map, which carries the same pandas corrections.
                from mars_spark.core.groupby import _AGG_FUNCS

                agg = (F.count(F.lit(1)) if fn == "size"
                       else _AGG_FUNCS[fn](F.col(col)))
                exprs.append(agg.alias(f"{col}_{fn}"))
        out = (self._frame._sdf
               .groupBy(*self._by, win.alias("__w"))
               .agg(*exprs)
               .withColumn(self._on, F.col("__w.start"))
               .drop("__w"))
        return DataFrame(out, self._frame._index)

    def _agg_cols(self):
        # pandas semantics: grouping keys and the time column are
        # never aggregated
        skip = set(self._by) | {self._on}
        return [c for c in _numeric_cols(self._frame) if c not in skip]

    def sum(self):
        return self.agg({c: "sum" for c in self._agg_cols()})

    def mean(self):
        return self.agg({c: "mean" for c in self._agg_cols()})
