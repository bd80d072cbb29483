"""GroupBy: deferred grouped frame → Spark groupBy().agg() plans.

Reference parity: mars/dataframe/groupby/aggregation.py:164
(DataFrameGroupByAgg, supported funcs :92-110), groupby/core.py:47.

Mars picks between three physical plans (tree / shuffle / auto-sampled —
aggregation.py:552-925). Spark needs none of that: ``groupBy().agg()``
always plans a partial (map-side) hash aggregate before the shuffle and
a final hash aggregate after, and AQE handles skew/coalescing — the
"auto" strategy is built-in. Our job is only the pandas API surface:
named aggs, dict aggs, as_index, per-group transforms via Window or
applyInPandas.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Window
from pyspark.sql import functions as F

from mars_spark.core.series import Series

# pandas agg-func name → Spark function. pandas skew/kurt are *sample*
# statistics (G1/G2 bias corrections); Spark's skewness/kurtosis are
# population moments, so those two entries apply the same corrections
# frame.py:1272/1285 use — df.skew() and df.groupby(k).skew() agree on
# identical data (reference: Mars groupby delegates to pandas
# skew(bias=False), mars/dataframe/groupby/aggregation.py).


def _skew_g1(c):
    n = F.count(c).cast("double")
    return F.when(n > 2, F.skewness(c) * F.sqrt(n * (n - 1)) / (n - 2))


def _kurt_g2(c):
    n = F.count(c).cast("double")
    return F.when(n > 3, (n - 1) / ((n - 2) * (n - 3))
                  * ((n + 1) * F.kurtosis(c) + 6))


_AGG_FUNCS: dict[str, Callable] = {
    "sum": F.sum,
    "prod": F.product,
    "product": F.product,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "size": lambda c: F.count(F.lit(1)),
    "mean": F.avg,
    "avg": F.avg,
    "median": F.median,
    "var": F.var_samp,
    "std": F.stddev_samp,
    "sem": lambda c: F.stddev_samp(c) / F.sqrt(F.count(c)),
    "skew": _skew_g1,
    "kurt": _kurt_g2,
    "nunique": F.countDistinct,
    "any": lambda c: F.max(c.cast("boolean")),
    "all": lambda c: F.min(c.cast("boolean")),
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "approx_nunique": F.approx_count_distinct,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
    # reference reduction/str_concat.py concatenates in chunk order;
    # a distributed frame has no inherent row order, so the
    # deterministic contract here is sorted-value order
    "str_concat": lambda c: F.concat_ws("", F.sort_array(
        F.collect_list(c.cast("string")))),
}


def _resolve(func, col_name: str):
    if callable(func) and not isinstance(func, str):
        return func(F.col(col_name))
    if func not in _AGG_FUNCS:
        raise ValueError(f"unsupported agg func: {func}")
    return _AGG_FUNCS[func](F.col(col_name))


def build_agg_exprs(arg, named: dict, default_cols: list[str]):
    """Compile a pandas-style agg spec into aliased Spark agg exprs.

    Supports: named aggs ``agg(out=('col','sum'))``, dict specs
    ``{'col': 'sum'}`` / ``{'col': ['sum','mean']}``, a single func name
    applied to all columns. Returns (exprs, out_names).
    """
    exprs, names = [], []
    if named:
        for out_name, spec in named.items():
            col, fn = spec
            exprs.append(_resolve(fn, col).alias(out_name))
            names.append(out_name)
    elif isinstance(arg, dict):
        for col, fns in arg.items():
            if isinstance(fns, (list, tuple)):
                for fn in fns:
                    out = f"{col}_{fn}"
                    exprs.append(_resolve(fn, col).alias(out))
                    names.append(out)
            else:
                # pandas: single func keeps the column name
                exprs.append(_resolve(fns, col).alias(col))
                names.append(col)
    elif isinstance(arg, str):
        for col in default_cols:
            exprs.append(_resolve(arg, col).alias(col))
            names.append(col)
    elif isinstance(arg, (list, tuple)):
        for col in default_cols:
            for fn in arg:
                out = f"{col}_{fn}"
                exprs.append(_resolve(fn, col).alias(out))
                names.append(out)
    else:
        raise TypeError(f"unsupported agg spec: {arg!r}")
    return exprs, names


class GroupBy:
    """df.groupby(keys) — deferred; nothing shuffles until an agg.

    ``kind`` extends the same surface to the multi-dimensional
    groupings Spark gives for free (SURVEY §2.4: Mars/pandas have no
    cube/rollup — additive): 'cube' aggregates every key subset,
    'rollup' the hierarchical prefixes. Physically both are ONE
    shuffle — Spark expands grouping sets map-side, so a d-dimension
    cube is 2^d partial aggregates in the same stage, not 2^d scans
    (exactly how a 100 TB OLAP rollup must run)."""

    def __init__(self, frame, keys: list[str], as_index: bool = True,
                 sort: bool = False, selection: list[str] | None = None,
                 kind: str = "groupby"):
        self._frame = frame
        self._keys = keys
        self._as_index = as_index
        self._sort = sort
        self._selection = selection
        self._kind = kind

    def __getitem__(self, cols):
        # gb[cols] — mars/dataframe/groupby/getitem.py:25. Column
        # pruning happens in Catalyst regardless; this narrows the
        # default agg target set.
        cols = [cols] if isinstance(cols, str) else list(cols)
        return GroupBy(self._frame, self._keys, self._as_index, self._sort,
                       cols, self._kind)

    @property
    def _value_cols(self) -> list[str]:
        if self._selection is not None:
            return self._selection
        return [c for c in self._frame._sdf.columns if c not in self._keys]

    def _finish(self, out):
        from mars_spark.core.frame import DataFrame

        if self._sort:
            out = out.orderBy(*self._keys)
        return DataFrame(out, index=self._keys if self._as_index else [])

    def agg(self, arg=None, **named):
        exprs, _ = build_agg_exprs(arg, named, self._value_cols)
        grouped = {
            "groupby": self._frame._sdf.groupBy,
            "cube": self._frame._sdf.cube,
            "rollup": self._frame._sdf.rollup,
        }[self._kind](*self._keys)
        return self._finish(grouped.agg(*exprs))

    aggregate = agg

    # single-func conveniences (reference: reduction ops of §2.4)
    def sum(self):
        return self.agg({c: "sum" for c in self._value_cols})

    def mean(self):
        return self.agg({c: "mean" for c in self._value_cols})

    def min(self):
        return self.agg({c: "min" for c in self._value_cols})

    def max(self):
        return self.agg({c: "max" for c in self._value_cols})

    def count(self):
        return self.agg({c: "count" for c in self._value_cols})

    def nunique(self):
        return self.agg({c: "nunique" for c in self._value_cols})

    def prod(self):
        return self.agg({c: "prod" for c in self._value_cols})

    product = prod

    def std(self):
        return self.agg({c: "std" for c in self._value_cols})

    def var(self):
        return self.agg({c: "var" for c in self._value_cols})

    def sem(self):
        return self.agg({c: "sem" for c in self._value_cols})

    def skew(self):
        return self.agg({c: "skew" for c in self._value_cols})

    def kurt(self):
        return self.agg({c: "kurt" for c in self._value_cols})

    kurtosis = kurt

    def all(self):
        return self.agg({c: "all" for c in self._value_cols})

    def any(self):
        return self.agg({c: "any" for c in self._value_cols})

    def first(self):
        return self.agg({c: "first" for c in self._value_cols})

    def last(self):
        return self.agg({c: "last" for c in self._value_cols})

    def median(self):
        return self.agg({c: "median" for c in self._value_cols})

    def fillna(self, value=None, method: str | None = None,
               order_by=None):
        """pandas DataFrameGroupBy.fillna: method='ffill'/'bfill' runs
        the per-group window fill; a scalar/dict value fills
        group-independently (same as frame fillna, kept here for API
        parity)."""
        if method in ("ffill", "pad"):
            return self.ffill(order_by)
        if method in ("bfill", "backfill"):
            return self.bfill(order_by)
        if value is None:
            raise ValueError("fillna needs value or method")
        from mars_spark.core.frame import DataFrame

        return DataFrame(self._frame._sdf.fillna(value),
                         self._frame._index)

    def size(self):
        grouped = {
            "groupby": self._frame._sdf.groupBy,
            "cube": self._frame._sdf.cube,
            "rollup": self._frame._sdf.rollup,
        }[self._kind](*self._keys)
        return self._finish(grouped.agg(F.count(F.lit(1)).alias("size")))

    def _require_plain_groupby(self, op: str):
        # Per-group row ops are windowed over exact key partitions —
        # cube/rollup strata have no single-row-level meaning here.
        if self._kind != "groupby":
            raise NotImplementedError(
                f"{op} is not defined for {self._kind}(); use agg()")

    # ------------------------------------------------- per-group row ops
    def head(self, n: int = 5, order_by=None):
        """mars/dataframe/groupby/head.py:30 → row_number window.
        The window shuffles once on the group keys — same cost as the
        groupby itself; no per-group collection."""
        self._require_plain_groupby("head")
        from mars_spark.core.frame import DataFrame

        order = [F.col(c) for c in (order_by or self._keys)]
        w = Window.partitionBy(*self._keys).orderBy(*order)
        sdf = (
            self._frame._sdf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn")
        )
        return DataFrame(sdf, self._frame._index)

    def rank(self, order_by, method: str = "min", ascending: bool = True):
        self._require_plain_groupby("rank")
        from mars_spark.core.frame import DataFrame

        order_by = [order_by] if isinstance(order_by, str) else list(order_by)
        cols = [F.col(c).asc() if ascending else F.col(c).desc() for c in order_by]
        w = Window.partitionBy(*self._keys).orderBy(*cols)
        fn = {"min": F.rank, "dense": F.dense_rank, "first": F.row_number}[method]
        return DataFrame(
            self._frame._sdf.withColumn("rank", fn().over(w)), self._frame._index
        )

    def cumsum(self, order_by):
        return self._cum(order_by, F.sum)

    def cummax(self, order_by):
        return self._cum(order_by, F.max)

    def cummin(self, order_by):
        return self._cum(order_by, F.min)

    def cumprod(self, order_by):
        """mars/dataframe/reduction/cumprod.py:21 — F.product is a
        native Spark aggregate (sign/zero exact, no exp/ln trick)."""
        return self._cum(order_by, F.product)

    def cumcount(self, order_by):
        self._require_plain_groupby("cumcount")
        from mars_spark.core.frame import DataFrame

        w = Window.partitionBy(*self._keys).orderBy(order_by)
        return DataFrame(
            self._frame._sdf.withColumn("cumcount", F.row_number().over(w) - 1),
            self._frame._index,
        )

    def _cum(self, order_by, fn):
        """mars/dataframe/groupby/cum.py:154 → running window agg"""
        self._require_plain_groupby("cum*")
        from mars_spark.core.frame import DataFrame

        w = (
            Window.partitionBy(*self._keys)
            .orderBy(order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sdf = self._frame._sdf
        for c in self._value_cols:
            t = dict(sdf.dtypes).get(c, "")
            if t in ("timestamp", "date", "string") or c == order_by:
                continue
            # pandas cum* semantics: NaN input rows stay NaN (the window
            # agg itself skips nulls in the running state)
            sdf = sdf.withColumn(
                c, F.when(F.col(c).isNotNull(), fn(F.col(c)).over(w)))
        return DataFrame(sdf, self._frame._index)

    def ffill(self, order_by):
        """mars/dataframe/groupby/fill.py:149 → last(ignorenulls) window"""
        self._require_plain_groupby("ffill")
        from mars_spark.core.frame import DataFrame

        w = (
            Window.partitionBy(*self._keys)
            .orderBy(order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sdf = self._frame._sdf
        for c in self._value_cols:
            sdf = sdf.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
        return DataFrame(sdf, self._frame._index)

    pad = ffill

    def bfill(self, order_by):
        self._require_plain_groupby("bfill")
        from mars_spark.core.frame import DataFrame

        w = (
            Window.partitionBy(*self._keys)
            .orderBy(order_by)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        sdf = self._frame._sdf
        for c in self._value_cols:
            sdf = sdf.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
        return DataFrame(sdf, self._frame._index)

    backfill = bfill

    def interpolate(self, order_by):
        """Per-group LINEAR interpolation of nulls (additive — the
        reference has no interpolate; pandas parity:
        ``g.interpolate(method='linear')``): a gap row gets
        ``prev + (next−prev)·(pos−pos_prev)/(pos_next−pos_prev)``
        over the ``order_by`` ordering. Pandas edge semantics: leading
        nulls stay null, trailing nulls forward-fill from the last
        valid value. Four window functions over ONE partition spec —
        a single shuffle on the group keys, no UDF.

        ``order_by`` values must be unique within each group: ties are
        broken by ``row_number`` nondeterministically, so duplicate
        order keys can make the fill positions (and interpolated
        values) vary across runs and partition layouts."""
        self._require_plain_groupby("interpolate")
        from mars_spark.core.frame import DataFrame

        wp = Window.partitionBy(*self._keys).orderBy(order_by)
        back = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fwd = wp.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        sdf = self._frame._sdf
        rn = F.row_number().over(wp)
        # ONE select over the original frame: rewriting columns in
        # sequence would let a later column's window order by an
        # already-interpolated order_by (nulls filled, cast changed).
        # The order column and non-numeric columns pass through.
        numeric = ("int", "bigint", "double", "float", "smallint",
                   "tinyint", "decimal")
        types = dict(sdf.dtypes)
        filled_cols = []
        for c in sdf.columns:
            v = F.col(c)
            if (c == order_by or c not in self._value_cols
                    or not any(types.get(c, "").startswith(n)
                               for n in numeric)):
                filled_cols.append(v)
                continue
            marked = F.when(v.isNotNull(), rn)
            prev_v = F.last(v, ignorenulls=True).over(back)
            next_v = F.first(v, ignorenulls=True).over(fwd)
            prev_rn = F.last(marked, ignorenulls=True).over(back)
            next_rn = F.first(marked, ignorenulls=True).over(fwd)
            filled_cols.append(
                F.when(v.isNotNull(), v)
                .when(prev_v.isNull(), F.lit(None))
                .when(next_v.isNull(), prev_v)
                .otherwise(prev_v + (next_v - prev_v)
                           * (rn - prev_rn) / (next_rn - prev_rn))
                .alias(c))
        return DataFrame(sdf.select(*filled_cols), self._frame._index)

    def transform(self, spec):
        """Same-length groupby transform, window fast path (reference:
        mars/dataframe/groupby/transform.py:28). ``spec`` is a builtin
        agg name or {col: name}: each value column gets the whole-group
        aggregate broadcast onto every row via an unordered window —
        ONE shuffle on the keys, no Python. For arbitrary callables use
        transform_udf (applyInPandas)."""
        self._require_plain_groupby("transform")
        from mars_spark.core.frame import DataFrame

        if isinstance(spec, str):
            spec = {c: spec for c in self._value_cols}
        w = Window.partitionBy(*self._keys)
        sdf = self._frame._sdf
        for c, fn_name in spec.items():
            fn = _AGG_FUNCS[fn_name]
            sdf = sdf.withColumn(c, fn(F.col(c)).over(w))
        return DataFrame(sdf, self._frame._index)

    def sample(self, n: int | None = None, frac: float | None = None,
               seed: int | None = None):
        """Per-group sampling (reference: mars/dataframe/groupby/
        sample.py:75). Exact-n (or exact ceil(frac·count)) per group via
        row_number over a seeded random order — one window shuffle, no
        driver pass, unlike sampleBy's bernoulli rows."""
        self._require_plain_groupby("sample")
        from mars_spark.core.frame import DataFrame

        w = Window.partitionBy(*self._keys).orderBy(
            F.rand(seed) if seed is not None else F.rand())
        sdf = self._frame._sdf.withColumn("__rn", F.row_number().over(w))
        if n is not None:
            keep = F.col("__rn") <= n
        elif frac is not None:
            sdf = sdf.withColumn(
                "__cnt",
                F.count(F.lit(1)).over(Window.partitionBy(*self._keys)))
            keep = F.col("__rn") <= F.ceil(F.col("__cnt") * F.lit(frac))
        else:
            raise ValueError("groupby.sample needs n or frac")
        return DataFrame(sdf.filter(keep).drop("__rn", "__cnt"),
                         self._frame._index)

    # --------------------------------------------------- UDF escape hatch
    def agg_udf(self, col: str, func, return_type: str = "double",
                name: str | None = None):
        """CustomReduction analog (reference: mars/dataframe/reduction/
        core.py:652-701 — pre/agg/post compiled reduction): a grouped-agg
        pandas UDF (pandas Series per group → scalar, Arrow-batched).
        Spark runs Python UDAFs post-shuffle per group — no partial
        aggregation — so prefer builtin F.* aggregates when the
        reduction is expressible; this is the escape hatch for the rest.
        """
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        udf = pandas_udf(func, return_type, PandasUDFType.GROUPED_AGG)
        out = self._frame._sdf.groupBy(*self._keys).agg(
            udf(F.col(col)).alias(name or f"{col}_agg"))
        return self._finish(out)

    def apply(self, func, schema):
        """mars/dataframe/groupby/apply.py:58 → applyInPandas. ``func``
        receives a pandas DataFrame per group; Arrow-batched, the only
        sane per-group escape hatch at scale."""
        from mars_spark.core.frame import DataFrame

        grouped = self._frame._sdf.groupBy(*self._keys)
        return DataFrame(grouped.applyInPandas(func, schema=schema))

    def transform_udf(self, func, schema):
        """mars/dataframe/groupby/transform.py:28 — same-length variant;
        caller's func must preserve group length."""
        return self.apply(func, schema)
