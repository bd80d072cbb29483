"""Series: a named column expression bound to a DataFrame lineage.

Reference parity: mars/dataframe/core.py:1450 (Series surface),
mars/dataframe/arithmetic/*.py (binary/unary ops),
mars/dataframe/base/string_.py:34 and base/datetimes.py:31 (accessors).

Spark-first design: a Series is *not* materialized — it is a
``pyspark.sql.Column`` expression plus a reference to the owning frame.
Arithmetic composes Column expressions eagerly, so chains of pandas-API
calls collapse into a single Catalyst projection (this is what Mars's
``SeriesArithmeticToEval`` rewrite does after the fact —
mars/optimization/logical/tileable/arithmetic_query.py:70 — and what we
get for free by composing expressions up front).
"""

from __future__ import annotations

import operator
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit(value):
    if isinstance(value, Column):
        return value
    if isinstance(value, Series):
        return value._col
    return F.lit(value)



def _floordiv_cols(a, b):
    # Column has no __floordiv__; floor-divide is floor(a/b) (Spark
    # floor() returns LONG for double input - integer-valued result)
    return F.floor(a / b)


def _extension_frame(a, b):
    """If frame ``b`` is a row-preserving extension of ``a`` (tagged
    via ``_origin_sdf``, e.g. by Series.rank) return ``b``; if ``a``
    extends ``b`` return ``a``; else None.

    Keyed SOLELY on plan identity: the extension captured its origin's
    ``_sdf`` object at tag time, and adoption requires the base frame
    to still hold that exact plan. If the base was mutated in place
    since (``f['v'] = f.v * 2``), the captured plan no longer matches
    and we fall back to the align path — adopting would silently
    revert the mutation."""
    for derived, base in ((b, a), (a, b)):
        origin_sdf = getattr(derived, "_origin_sdf", None)
        if origin_sdf is not None and origin_sdf is base._sdf:
            return derived
    return None


class Series:
    """A lazy column of a mars_spark DataFrame."""

    def __init__(self, frame, col: Column, name: str | None = None):
        self._frame = frame
        self._col = col
        self.name = name

    # ------------------------------------------------------------- dunder
    def __repr__(self):
        return f"Series(name={self.name!r}, expr={self._col})"

    def _binop(self, other, op, reverse=False):
        if isinstance(other, Series) and other._frame is not self._frame:
            # if one frame is a row-preserving extension of the other
            # (e.g. the stats-join frame Series.rank returns, tagged
            # with _origin), evaluate both expressions on the extended
            # frame — no align join needed and no index required
            ext = _extension_frame(self._frame, other._frame)
            if ext is not None:
                left, right = self._col, other._col
                if reverse:
                    left, right = right, left
                return Series(ext, op(left, right), self.name)
            # cross-frame arithmetic: align on the index via outer join
            # (reference: mars/dataframe/align.py:48)
            from mars_spark.operators.align import align_series

            if reverse:
                return align_series(other, self, op)
            return align_series(self, other, op)
        left, right = self._col, _lit(other)
        if reverse:
            left, right = right, left
        return Series(self._frame, op(left, right), self.name)

    def add(self, other, fill_value=None) -> "Series":
        """pandas .add with fill_value (cross-frame aligns on index)."""
        return self._fill_binop(other, operator.add, fill_value)

    def sub(self, other, fill_value=None) -> "Series":
        return self._fill_binop(other, operator.sub, fill_value)

    def mul(self, other, fill_value=None) -> "Series":
        return self._fill_binop(other, operator.mul, fill_value)

    def div(self, other, fill_value=None) -> "Series":
        return self._fill_binop(other, operator.truediv, fill_value)

    def _fill_binop(self, other, op, fill_value):
        if isinstance(other, Series) and other._frame is not self._frame:
            from mars_spark.operators.align import align_series

            return align_series(self, other, op, fill_value=fill_value)
        if fill_value is not None:
            # fill only when exactly one side is missing — pandas keeps
            # the result missing when BOTH locations are missing
            fill = _lit(fill_value)
            ocol = other._col if isinstance(other, Series) else _lit(other)
            res = F.when(self._col.isNull() & ocol.isNull(), F.lit(None)) \
                .otherwise(op(F.coalesce(self._col, fill),
                              F.coalesce(ocol, fill)))
            return Series(self._frame, res, self.name)
        return self._binop(other, op)

    def __add__(self, o):
        return self._binop(o, operator.add)

    def __radd__(self, o):
        return self._binop(o, operator.add, reverse=True)

    def __sub__(self, o):
        return self._binop(o, operator.sub)

    def __rsub__(self, o):
        return self._binop(o, operator.sub, reverse=True)

    def __mul__(self, o):
        return self._binop(o, operator.mul)

    def __rmul__(self, o):
        return self._binop(o, operator.mul, reverse=True)

    def __truediv__(self, o):
        return self._binop(o, operator.truediv)

    def __rtruediv__(self, o):
        return self._binop(o, operator.truediv, reverse=True)

    def __floordiv__(self, o):
        s = self._binop(o, operator.truediv)
        return Series(self._frame, F.floor(s._col), self.name)

    def __mod__(self, o):
        return self._binop(o, operator.mod)

    def __pow__(self, o):
        return self._binop(o, lambda a, b: F.pow(a, b))

    def __neg__(self):
        return Series(self._frame, -self._col, self.name)

    def __abs__(self):
        return Series(self._frame, F.abs(self._col), self.name)

    # comparisons → boolean Series (filter masks)
    def __eq__(self, o):  # noqa: A003 - pandas semantics, not identity
        return self._binop(o, operator.eq)

    def __ne__(self, o):
        return self._binop(o, operator.ne)

    def __lt__(self, o):
        return self._binop(o, operator.lt)

    def __le__(self, o):
        return self._binop(o, operator.le)

    def __gt__(self, o):
        return self._binop(o, operator.gt)

    def __ge__(self, o):
        return self._binop(o, operator.ge)

    def __and__(self, o):
        return self._binop(o, operator.and_)

    def __rand__(self, o):
        return self._binop(o, operator.and_, reverse=True)

    def __or__(self, o):
        return self._binop(o, operator.or_)

    def __ror__(self, o):
        return self._binop(o, operator.or_, reverse=True)

    def __invert__(self):
        return Series(self._frame, ~self._col, self.name)

    def __hash__(self):
        return id(self)

    # ------------------------------------------------------- element-wise
    def isin(self, values) -> "Series":
        """mars/dataframe/base/isin.py:31 → Column.isin (Catalyst turns
        large literal lists into a hash set; use a semi-join for big
        dynamic sets via DataFrame.merge)."""
        return Series(self._frame, self._col.isin(list(values)), self.name)

    def rank(self, method: str = "average", ascending: bool = True,
             pct: bool = False) -> "Series":
        """mars/dataframe/base/rank.py — Mars ranks within chunks and
        merges cumulative chunk counts; the Spark-first equivalent is
        operators/rank.py: per-distinct-value stats + range-partitioned
        prefix sums + a join back. Fully partition-parallel — no
        single-partition ``Window.orderBy`` (that plan funnels the
        whole dataset through one task and dies at scale).

        Returns a Series over a NEW frame (the stats join), like all
        alignment-producing ops; the frame carries every original
        column plus the rank. The new frame is row-for-row derived
        from the original (``_origin``), so ``f['r'] = f.v.rank()``
        and arithmetic against the original frame's columns both
        resolve without an explicit align.

        The ranked expression is always materialized under a private
        helper name — never reusing an existing column whose name
        happens to match, so derived series (``(f.v * -1).rank()``)
        rank the derived values, not the base column. method='first'
        breaks ties by the materialized sequence index when the frame
        has one (pandas row order under any partitioning); otherwise
        by physical plan order."""
        from mars_spark.core.frame import DataFrame
        from mars_spark.operators.rank import add_rank

        base = self._frame._sdf.withColumn("__rank_in__", self._col)
        # pct: rank / count of valid values — the denominator falls out
        # of add_rank's prefix-sum offsets pass (no extra job, and no
        # global window, which would funnel the dataset into one task)
        out = add_rank(base, "__rank_in__", method=method,
                       ascending=ascending, out="__rank__",
                       order_col=self._frame._seq, pct=pct)
        out = out.drop("__rank_in__")
        nf = DataFrame(out, self._frame._index, seq=self._frame._seq,
                       seq_dirty=self._frame._seq_dirty)
        nf._origin_sdf = self._frame._sdf
        return Series(nf, F.col("__rank__"), self.name)

    def ranks(self, methods, ascending: bool = True):
        """Multi-method rank sharing ONE stats pass (see
        operators/rank.py add_ranks — the per-value aggregate, prefix
        sums, and join back are method-independent). ``methods`` is a
        dict {out_col: method} or an iterable of method names (output
        columns ``r_<method>``). Returns the extended DataFrame."""
        from mars_spark.core.frame import DataFrame
        from mars_spark.operators.rank import add_ranks

        if not isinstance(methods, dict):
            methods = {f"r_{m}": m for m in methods}
        base = self._frame._sdf.withColumn("__rank_in__", self._col)
        out = add_ranks(base, "__rank_in__", methods, ascending=ascending,
                        order_col=self._frame._seq).drop("__rank_in__")
        nf = DataFrame(out, self._frame._index, seq=self._frame._seq,
                       seq_dirty=self._frame._seq_dirty)
        nf._origin_sdf = self._frame._sdf
        return nf

    def nlargest(self, n: int = 5) -> "Series":
        f = self._frame
        name = self.name or "value"
        sdf = f._sdf.select(self._col.alias(name)) \
            .orderBy(F.desc(name)).limit(n)
        from mars_spark.core.frame import DataFrame

        nf = DataFrame(sdf)
        return Series(nf, F.col(name), name)

    def nsmallest(self, n: int = 5) -> "Series":
        f = self._frame
        name = self.name or "value"
        sdf = f._sdf.select(self._col.alias(name)) \
            .orderBy(F.asc(name)).limit(n)
        from mars_spark.core.frame import DataFrame

        nf = DataFrame(sdf)
        return Series(nf, F.col(name), name)

    def mode(self):
        """mars/dataframe/base/mode.py — most frequent value (ties →
        smallest, pandas keeps all; scalar form here)."""
        name = self.name or "value"
        out = (self._frame._sdf.groupBy(self._col.alias(name))
               .agg(F.count(F.lit(1)).alias("__n"))
               .orderBy(F.desc("__n"), F.asc(name)).limit(1).collect())
        return out[0][name] if out else None

    def idxmax(self):
        """Index label of the max value (needs an index column)."""
        idx = self._frame._require_index("idxmax")
        row = (self._frame._sdf.orderBy(self._col.desc())
               .select(idx).limit(1).collect())
        return row[0][idx] if row else None

    def idxmin(self):
        idx = self._frame._require_index("idxmin")
        row = (self._frame._sdf.orderBy(self._col.asc())
               .select(idx).limit(1).collect())
        return row[0][idx] if row else None

    def dot(self, other) -> float:
        """mars/dataframe/arithmetic/dot.py — Series·Series inner
        product as one distributed agg (same-frame columns; for
        cross-frame operands the binop alignment path applies first).
        Array-column dot products live in llm.similarity.dot."""
        if isinstance(other, Series) and other._frame is not self._frame:
            import operator

            prod = self._binop(other, operator.mul)
            sdf = prod._frame._sdf.select(prod._col.alias("__p"))
        else:
            ocol = other._col if isinstance(other, Series) else _lit(other)
            sdf = self._frame._sdf.select((self._col * ocol).alias("__p"))
        row = sdf.agg(F.sum("__p").alias("s")).collect()[0]
        return float(row["s"]) if row["s"] is not None else 0.0

    def between(self, left, right, inclusive="both") -> "Series":
        c = self._col
        lo = c >= _lit(left) if inclusive in ("both", "left") else c > _lit(left)
        hi = c <= _lit(right) if inclusive in ("both", "right") else c < _lit(right)
        return Series(self._frame, lo & hi, self.name)

    def isna(self) -> "Series":
        """mars/dataframe/missing/checkna.py:38"""
        return Series(self._frame, self._col.isNull(), self.name)

    isnull = isna

    def notna(self) -> "Series":
        return Series(self._frame, self._col.isNotNull(), self.name)

    notnull = notna

    def fillna(self, value) -> "Series":
        return Series(self._frame, F.coalesce(self._col, _lit(value)), self.name)

    def astype(self, dtype) -> "Series":
        """mars/dataframe/base/astype.py:32 → Column.cast.
        ``astype('category')`` additionally pins the category set as a
        LAZY distinct plan over the column at this point (Mars computes
        global uniques at execute time, astype.py 'categorical via
        global uniques') — downstream where/mask filtering keeps the
        full set, so value_counts can report zero-count categories."""
        spark_type = _dtype_to_spark(dtype)
        out = Series(self._frame, self._col.cast(spark_type), self.name)
        key = dtype if isinstance(dtype, str) else getattr(
            dtype, "name", str(dtype))
        if key == "category":
            out._cat_plan = (self._frame._sdf
                             .select(self._col.cast("string").alias("v"))
                             .filter(F.col("v").isNotNull()).distinct())
        return out

    def round(self, decimals=0) -> "Series":
        return Series(self._frame, F.round(self._col, decimals), self.name)

    def abs(self) -> "Series":
        return Series(self._frame, F.abs(self._col), self.name)

    def check_monotonic(self, decreasing: bool = False,
                        strict: bool = False,
                        order_by: str | None = None) -> bool:
        """mars/dataframe/base/check_monotonic.py:27 (chunk-level
        results combined on the driver) → distributed monotonicity in
        index order WITHOUT a global-order window: range-partition on
        the index, per-partition lag comparison, then a
        (num-partitions)-row driver check of the partition boundary
        values. Any null value makes the result False (pandas: NaN
        breaks monotonicity); an empty series is monotonic.
        ``order_by`` overrides the ordering column (Index monotonicity
        orders by the sequence carrier — in index order the index is
        trivially monotonic)."""
        idx = order_by or self._frame._require_index("check_monotonic")
        name = self.name or "value"
        base = self._frame._sdf.select(
            F.col(idx).alias("__o"), self._col.alias(name))
        d = (base.repartitionByRange(F.col("__o").asc())
             .sortWithinPartitions(F.col("__o").asc())
             .withColumn("__pid", F.spark_partition_id()))
        from pyspark.sql import Window

        w = Window.partitionBy("__pid").orderBy("__o")
        prev = F.lag(name).over(w)
        v = F.col(name)
        if decreasing:
            cond = (v < prev) if strict else (v <= prev)
        else:
            cond = (v > prev) if strict else (v >= prev)
        ok = F.when(prev.isNull(), F.lit(True)).otherwise(
            F.coalesce(cond, F.lit(False)))
        rows = (d.withColumn("__ok", ok)
                .groupBy("__pid")
                .agg(F.min("__ok").alias("__all"),
                     F.max(v.isNull().cast("int")).alias("__has_null"),
                     F.min_by(name, F.col("__o")).alias("__first"),
                     F.max_by(name, F.col("__o")).alias("__last"))
                .orderBy("__pid").collect())
        if not rows:
            return True
        if any((not r["__all"]) or r["__has_null"] for r in rows):
            return False
        # range partitions carry ascending index ranges in pid order —
        # only the per-boundary pair remains to check
        for a, b in zip(rows, rows[1:]):
            x, y = a["__last"], b["__first"]
            good = ((y < x if strict else y <= x) if decreasing
                    else (y > x if strict else y >= x))
            if not good:
                return False
        return True

    @property
    def is_monotonic_increasing(self) -> bool:
        return self.check_monotonic(decreasing=False)

    @property
    def is_monotonic_decreasing(self) -> bool:
        return self.check_monotonic(decreasing=True)

    def _unary(self, fn) -> "Series":
        return Series(self._frame, fn(self._col), self.name)

    def clip(self, lower=None, upper=None) -> "Series":
        c = self._col
        if lower is not None:
            c = F.greatest(c, _lit(lower))
        if upper is not None:
            c = F.least(c, _lit(upper))
        return Series(self._frame, c, self.name)

    def where(self, cond, other=None) -> "Series":
        """mars/dataframe/indexing/where.py:28 → when/otherwise.
        Categorical metadata survives filtering (pandas parity)."""
        cond_col = cond._col if isinstance(cond, Series) else cond
        out = Series(
            self._frame,
            F.when(cond_col, self._col).otherwise(_lit(other)),
            self.name,
        )
        if getattr(self, "_cat_plan", None) is not None:
            out._cat_plan = self._cat_plan
        return out

    def mask(self, cond, other=None) -> "Series":
        cond_col = cond._col if isinstance(cond, Series) else cond
        return self.where(Series(self._frame, ~cond_col), other)

    def map(self, mapping, return_type: str = "double") -> "Series":
        """mars/dataframe/base/map.py:32. Dict → literal map lookup
        (JVM-side, codegen). Callable → Arrow-batched pandas UDF
        (``func(pd.Series) -> pd.Series`` element semantics via
        Series.map inside); declare return_type since a distributed
        engine cannot probe-execute to infer it."""
        if isinstance(mapping, dict):
            pairs = []
            for k, v in mapping.items():
                pairs.extend([F.lit(k), F.lit(v)])
            m = F.create_map(*pairs)
            return Series(self._frame, m[self._col], self.name)
        if callable(mapping):
            from pyspark.sql.functions import pandas_udf

            fn = mapping

            @pandas_udf(return_type)
            def _mapper(s):
                return s.map(fn)

            return Series(self._frame, _mapper(self._col), self.name)
        raise TypeError(f"Series.map: unsupported mapping {type(mapping)}")

    def to_numeric(self, errors: str = "coerce") -> "Series":
        """mars/dataframe/base/to_numeric.py — try_cast keeps malformed
        values null (errors='coerce'); errors='raise' uses a strict
        ANSI cast that fails the job on bad input."""
        if errors == "coerce":
            c = self._col.try_cast("double")
        elif errors == "raise":
            c = self._col.cast("double")
        else:
            raise ValueError(errors)
        return Series(self._frame, c, self.name)

    def alias(self, name: str) -> "Series":
        return Series(self._frame, self._col.alias(name), name)

    rename = alias

    # ---------------------------------------------------------- accessors
    @property
    def str(self):
        from mars_spark.functions.strings import StringAccessor

        return StringAccessor(self)

    @property
    def dt(self):
        from mars_spark.functions.datetimes import DatetimeAccessor

        return DatetimeAccessor(self)

    @property
    def cat(self):
        from mars_spark.functions.categorical import CategoricalAccessor

        return CategoricalAccessor(self)

    # ------------------------------------------------------ aggregations
    # Scalar reductions run eagerly (single-row Spark job). Mars keeps a
    # lazy scalar tileable (mars/dataframe/reduction/*); eager scalars
    # keep the API ergonomic and each is one Catalyst partial/final agg.
    def _agg_scalar(self, col: Column) -> Any:
        row = self._frame._sdf.select(col.alias("v")).collect()[0]
        return row["v"]

    def agg(self, func):
        """Series aggregation (mars/dataframe/reduction/aggregation.py
        Series form). Accepts the named reductions (str or list of
        str — a list returns a pandas Series of results, one job per
        name) or a ``CustomReduction`` instance, which runs the
        distributed pre/agg/post contract (core/reduction.py)."""
        from mars_spark.core.reduction import (CustomReduction,
                                               run_custom_reduction)

        if isinstance(func, CustomReduction):
            return run_custom_reduction(self, func)
        if isinstance(func, str):
            return getattr(self, func)()
        if isinstance(func, (list, tuple)):
            import pandas as pd

            return pd.Series({f: self.agg(f) for f in func})
        raise TypeError(
            "Series.agg takes a reduction name, a list of names, or a "
            "CustomReduction (callables compile via CustomReduction — "
            "the reference's lambda mock-tracing path is out of scope)")

    aggregate = agg

    def sum(self):
        return self._agg_scalar(F.sum(self._col))

    def mean(self):
        return self._agg_scalar(F.avg(self._col))

    def min(self):
        return self._agg_scalar(F.min(self._col))

    def max(self):
        return self._agg_scalar(F.max(self._col))

    def count(self):
        return self._agg_scalar(F.count(self._col))

    def nunique(self, approx: bool = False, rsd: float = 0.05):
        """Distinct count. ``approx=True`` → HyperLogLog++
        (approx_count_distinct): one pass, fixed ~1.5KB of state per
        partition instead of a distinct shuffle — the only viable form
        at 100 TB cardinalities; ``rsd`` is the relative error."""
        if approx:
            return self._agg_scalar(
                F.approx_count_distinct(self._col, rsd=rsd))
        return self._agg_scalar(F.countDistinct(self._col))

    def std(self, ddof=1):
        f = F.stddev_samp if ddof == 1 else F.stddev_pop
        return self._agg_scalar(f(self._col))

    def var(self, ddof=1):
        f = F.var_samp if ddof == 1 else F.var_pop
        return self._agg_scalar(f(self._col))

    def quantile(self, q=0.5):
        """Exact percentile (mars routes through tensor percentile —
        mars/dataframe/statistics/quantile.py:46). Spark ``percentile``
        is exact; ``percentile_approx`` is the scale path."""
        return self._agg_scalar(F.percentile(self._col, F.lit(q)))

    def prod(self):
        """mars/dataframe/reduction/prod.py → one product aggregate."""
        return self._agg_scalar(F.product(self._col))

    product = prod

    def sem(self, ddof: int = 1):
        """mars/dataframe/reduction/sem.py — standard error of the
        mean, std(ddof)/sqrt(count) (pandas semantics)."""
        f = F.stddev_samp if ddof == 1 else F.stddev_pop
        return self._agg_scalar(f(self._col) / F.sqrt(F.count(self._col)))

    def skew(self, bias: bool = False):
        """mars/dataframe/reduction/skew.py — pandas-parity SAMPLE
        skewness by default: Spark's ``skewness`` is the population
        moment g1, corrected here to the adjusted Fisher-Pearson G1 =
        g1·√(n(n−1))/(n−2) that pandas reports; ``bias=True`` returns
        raw g1. One aggregate pass either way."""
        g1 = F.skewness(self._col)
        if bias:
            return self._agg_scalar(g1)
        n = F.count(self._col).cast("double")
        # n <= 2 → pandas NaN (the (n-2) correction is undefined)
        return self._agg_scalar(
            F.when(n > 2, g1 * F.sqrt(n * (n - 1)) / (n - 2)))

    def kurt(self, bias: bool = False):
        """mars/dataframe/reduction/kurtosis.py — pandas-parity sample
        excess kurtosis by default: Spark's ``kurtosis`` is population
        excess g2, corrected to G2 = ((n−1)/((n−2)(n−3)))·((n+1)·g2+6);
        ``bias=True`` returns raw g2."""
        g2 = F.kurtosis(self._col)
        if bias:
            return self._agg_scalar(g2)
        n = F.count(self._col).cast("double")
        # n <= 3 → pandas NaN (the (n-2)(n-3) correction is undefined)
        return self._agg_scalar(
            F.when(n > 3,
                   (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6)))

    kurtosis = kurt

    def all(self):
        """mars/dataframe/reduction/all.py — TRUE iff every non-null
        value is truthy (pandas skipna semantics)."""
        v = self._agg_scalar(F.min(self._col.cast("boolean")))
        return True if v is None else bool(v)

    def any(self):
        """mars/dataframe/reduction/any.py — TRUE iff any non-null
        value is truthy."""
        v = self._agg_scalar(F.max(self._col.cast("boolean")))
        return False if v is None else bool(v)

    def median(self):
        return self.quantile(0.5)

    def unique(self):
        rows = self._frame._sdf.select(self._col.alias("v")).distinct().collect()
        return [r["v"] for r in rows]

    def value_counts(self, normalize=False, ascending=False, dropna=True):
        """mars/dataframe/base/value_counts.py:31 → groupBy().count().
        pandas drops NaN by default; proportions divide by the NON-null
        count (dropna=False keeps the null group and divides by all)."""
        name = self.name or "value"
        sdf = self._frame._sdf.select(self._col.alias(name))
        if dropna:
            sdf = sdf.filter(F.col(name).isNotNull())
        out = sdf.groupBy(name).agg(F.count(F.lit(1)).alias("count"))
        cat_plan = getattr(self, "_cat_plan", None)
        if cat_plan is not None:
            # categorical: every pinned category appears, zero-filled
            # (pandas semantics). The category side is |categories|
            # rows — broadcast, no extra shuffle.
            cats = cat_plan.select(F.col("v").alias(name))
            # full outer keeps the null group under dropna=False;
            # unseen categories zero-fill
            out = cats.join(out, on=name, how="full").fillna({"count": 0})
        if normalize:
            total = sdf.count()
            out = out.withColumn("proportion", F.col("count") / F.lit(total)).drop(
                "count"
            )
        order_col = "proportion" if normalize else "count"
        out = out.orderBy(
            F.col(order_col).asc() if ascending else F.col(order_col).desc(),
            F.col(name),
        )
        from mars_spark.core.frame import DataFrame

        return DataFrame(out, index=[name])

    # ------------------------------------------- parity surface (r9)
    # Method forms the reference documents on Series (docs/source/
    # reference/dataframe/series.rst) that route through machinery the
    # engine already has: most delegate through to_frame() to the
    # DataFrame op, window forms extend the owning frame in place
    # (the Series.rank extension pattern), scalars are one agg.

    @property
    def index(self):
        """Lazy Index facade over the owning frame's index."""
        from mars_spark.core.index import Index

        return Index(_frame=self._frame)

    @property
    def dtype(self) -> str:
        """Spark SQL type of the column expression (plan analysis
        only — no job)."""
        return (self._frame._sdf.select(self._col.alias("__t"))
                .schema[0].dataType.simpleString())

    @property
    def shape(self) -> tuple:
        return (self._frame._sdf.count(),)

    @property
    def ndim(self) -> int:
        return 1

    @property
    def T(self) -> "Series":
        return self

    @property
    def is_monotonic(self) -> bool:
        return self.is_monotonic_increasing

    def copy(self, deep: bool = True) -> "Series":
        return Series(self._frame, self._col, self.name)

    def to_frame(self, name: str | None = None):
        """Series → one-column frame carrying the index (and the
        sequence column when it is part of the index)."""
        from mars_spark.core.frame import DataFrame

        fr = self._frame
        nm = name or self.name or "0"
        if nm in fr._index:
            raise ValueError(
                f"to_frame: name {nm!r} collides with an index column "
                f"— pass name=")
        sdf = fr._sdf.select(*[F.col(c) for c in fr._index],
                             self._col.alias(nm))
        seq = fr._seq if fr._seq in fr._index else None
        return DataFrame(sdf, fr._index, seq=seq,
                         seq_dirty=fr._seq_dirty)

    def to_spark(self):
        """One-column Spark DataFrame (index columns + values) — the
        Series form of DataFrame.to_spark."""
        return self.to_frame(self.name or "0")._sdf

    def to_tensor(self):
        """reference: mars/dataframe exposes Series.to_tensor as a
        lazy tensor; the facade materializes to a numpy array (the
        tensor layer here is the thin facade of SURVEY §2.9) —
        driver-sized by the same contract as to_pandas."""
        return self.to_pandas().to_numpy()

    def memory_usage(self, deep: bool = False):
        nm = self.name or "0"
        return self.to_frame(nm).memory_usage(deep=deep).get(nm)

    # ------------------------------------------------ frame delegates
    def _via_frame(self, method: str, *args, **kwargs):
        from mars_spark.core.frame import DataFrame

        nm = self.name or "0"
        res = getattr(self.to_frame(nm), method)(*args, **kwargs)
        if isinstance(res, DataFrame) and nm in res.columns:
            return Series(res, F.col(nm), self.name)
        return res

    def head(self, n: int = 5) -> "Series":
        return self._via_frame("head", n)

    def tail(self, n: int = 5) -> "Series":
        return self._via_frame("tail", n)

    def sample(self, frac=None, n=None, replace=False, weights=None,
               seed=None) -> "Series":
        return self._via_frame("sample", frac=frac, n=n,
                               replace=replace, weights=weights,
                               seed=seed)

    def drop(self, labels) -> "Series":
        return self._via_frame("drop", labels=labels, axis=0)

    def dropna(self) -> "Series":
        nm = self.name or "0"
        return self._via_frame("dropna", subset=[nm])

    def drop_duplicates(self, keep: str = "first") -> "Series":
        nm = self.name or "0"
        return self._via_frame("drop_duplicates", subset=[nm],
                               keep=keep)

    def duplicated(self) -> "Series":
        nm = self.name or "0"
        res = self.to_frame(nm).duplicated(subset=[nm])
        return Series(res, F.col("duplicated"), self.name)

    def explode(self) -> "Series":
        nm = self.name or "0"
        return self._via_frame("explode", nm)

    def sort_values(self, ascending: bool = True,
                    na_position: str = "last") -> "Series":
        nm = self.name or "0"
        return self._via_frame("sort_values", nm, ascending=ascending,
                               na_position=na_position)

    def sort_index(self, ascending: bool = True) -> "Series":
        return self._via_frame("sort_index", ascending=ascending)

    def reset_index(self, drop: bool = False):
        """pandas parity: drop=True → Series without the old index;
        drop=False → the index-promoted DataFrame."""
        nm = self.name or "0"
        res = self.to_frame(nm).reset_index(drop=drop)
        if drop:
            return Series(res, F.col(nm), self.name)
        return res

    def rename_axis(self, mapper) -> "Series":
        return self._via_frame("rename_axis", mapper)

    def set_axis(self, labels) -> "Series":
        return self._via_frame("set_axis", labels, axis=0)

    def reindex(self, index, fill_value=None) -> "Series":
        return self._via_frame("reindex", index=index,
                               fill_value=fill_value)

    def reindex_like(self, other: "Series", fill_value=None) -> "Series":
        """Conform to ``other``'s index (the join='right' align)."""
        from mars_spark.operators.align import align_frames

        nm = self.name or "0"
        lf, _ = align_frames(self.to_frame(nm),
                             other.to_frame("__other"),
                             join="right", fill_value=fill_value)
        return Series(lf, F.col(nm), self.name)

    def add_prefix(self, prefix: str) -> "Series":
        """pandas Series.add_prefix prefixes the INDEX labels (cast to
        string) — one narrow map on the index column."""
        return self._relabel(lambda c: F.concat(F.lit(prefix),
                                                c.cast("string")))

    def add_suffix(self, suffix: str) -> "Series":
        return self._relabel(lambda c: F.concat(c.cast("string"),
                                                F.lit(suffix)))

    def _relabel(self, fn) -> "Series":
        from mars_spark.core.frame import DataFrame

        fr = self._frame
        if len(fr._index) != 1:
            raise ValueError("add_prefix/add_suffix need a single "
                             "index column")
        idx = fr._index[0]
        nm = self.name or "0"
        sdf = fr._sdf.select(fn(F.col(idx)).alias(idx),
                             self._col.alias(nm))
        return Series(DataFrame(sdf, [idx]), F.col(nm), self.name)

    def align(self, other: "Series", join: str = "outer",
              fill_value=None):
        """pandas Series.align → the two series conformed to the
        union/intersection of their indexes (operators/align.py)."""
        from mars_spark.operators.align import align_frames

        lnm = self.name or "0"
        rnm = other.name or "0"
        lf, rf = align_frames(self.to_frame(lnm), other.to_frame(rnm),
                              join=join, fill_value=fill_value)
        return (Series(lf, F.col(lnm), self.name),
                Series(rf, F.col(rnm), other.name))

    def append(self, other: "Series") -> "Series":
        """row-append (reference: mars/dataframe/merge/append.py
        Series form) — unionByName on the aligned one-column frames."""
        from mars_spark.core.frame import DataFrame

        nm = self.name or "0"
        lf = self.to_frame(nm)
        rf = other.to_frame(nm)
        if len(lf._index) != len(rf._index):
            raise ValueError("append: index arity mismatch")
        rsdf = rf._sdf.select(
            *[F.col(a).alias(b) for a, b in zip(rf._index, lf._index)],
            F.col(nm))
        out = DataFrame(lf._sdf.unionByName(rsdf), lf._index)
        return Series(out, F.col(nm), self.name)

    def to_csv(self, path: str, **kwargs):
        return self.to_frame(self.name or "0").to_csv(path, **kwargs)

    def to_sql(self, table: str, url: str, **kwargs):
        return self.to_frame(self.name or "0").to_sql(table, url,
                                                      **kwargs)

    def map_chunk(self, func, schema: str):
        return self.to_frame(self.name or "0").map_chunk(func, schema)

    def hist(self, *args, **kwargs):
        return self.plot(kind="hist", *args, **kwargs)

    # ------------------------------------------------- indexer parity
    @property
    def at(self):
        return _SeriesAt(self, positional=False)

    @property
    def iat(self):
        return _SeriesAt(self, positional=True)

    @property
    def loc(self):
        return _SeriesLoc(self, positional=False)

    @property
    def iloc(self):
        return _SeriesLoc(self, positional=True)

    # ---------------------------------------------- binop method forms
    def truediv(self, other, fill_value=None) -> "Series":
        return self._fill_binop(other, operator.truediv, fill_value)

    def floordiv(self, other, fill_value=None) -> "Series":
        return self._fill_binop(other, _floordiv_cols, fill_value)

    def mod(self, other, fill_value=None) -> "Series":
        return self._fill_binop(other, operator.mod, fill_value)

    def pow(self, other, fill_value=None) -> "Series":
        return self._fill_binop(other, operator.pow, fill_value)

    def _rev_binop(self, other, op, fill_value):
        if isinstance(other, Series):
            return other._fill_binop(self, op, fill_value)
        lit = Series(self._frame, _lit(other), None)
        return lit._fill_binop(self, op, fill_value)

    def radd(self, other, fill_value=None) -> "Series":
        return self._rev_binop(other, operator.add, fill_value)

    def rsub(self, other, fill_value=None) -> "Series":
        return self._rev_binop(other, operator.sub, fill_value)

    def rmul(self, other, fill_value=None) -> "Series":
        return self._rev_binop(other, operator.mul, fill_value)

    def rdiv(self, other, fill_value=None) -> "Series":
        return self._rev_binop(other, operator.truediv, fill_value)

    rtruediv = rdiv

    def rfloordiv(self, other, fill_value=None) -> "Series":
        return self._rev_binop(other, _floordiv_cols, fill_value)

    def rmod(self, other, fill_value=None) -> "Series":
        return self._rev_binop(other, operator.mod, fill_value)

    def rpow(self, other, fill_value=None) -> "Series":
        return self._rev_binop(other, operator.pow, fill_value)

    def lt(self, other) -> "Series":
        return self._binop(other, operator.lt)

    def gt(self, other) -> "Series":
        return self._binop(other, operator.gt)

    def le(self, other) -> "Series":
        return self._binop(other, operator.le)

    def ge(self, other) -> "Series":
        return self._binop(other, operator.ge)

    def eq(self, other) -> "Series":
        return self._binop(other, operator.eq)

    def ne(self, other) -> "Series":
        return self._binop(other, operator.ne)

    # ------------------------------------------- apply / group / window
    def apply(self, func, return_type: str = "double") -> "Series":
        """mars/dataframe/base/apply.py Series form — element-wise, the
        same Arrow-batched UDF path as map(callable)."""
        return self.map(func, return_type=return_type)

    def transform(self, func, return_type: str = "double") -> "Series":
        return self.map(func, return_type=return_type)

    def groupby(self, by=None, level=None):
        """Series groupby (reference: mars/dataframe/core.py:2798
        SeriesGroupBy) — group the one-column frame by external keys
        (engine Series on the same frame) or index level(s), selected
        down to this series' column."""
        nm = self.name or "0"
        if by is not None and isinstance(by, Series):
            from mars_spark.core.frame import DataFrame

            fr = self._frame
            base = fr
            if by._frame is not fr:
                # a row-preserving extension of either frame carries
                # both columns (the _binop adoption rule); anything
                # else needs an explicit align first
                base = _extension_frame(fr, by._frame)
                if base is None:
                    raise ValueError(
                        "Series.groupby: the key Series must live on "
                        "the same frame (align the frames first)")
            key = by.name or "__key"
            sdf = base._sdf.select(*[F.col(c) for c in base._index],
                                   by._col.alias(key),
                                   self._col.alias(nm))
            return DataFrame(sdf, base._index).groupby(key)[nm]
        return self.to_frame(nm).groupby(by=by, level=level)[nm]

    def rolling(self, window, min_periods=None, order_by=None,
                partition_by=None):
        nm = self.name or "0"
        return _SeriesWindowAgg(
            self.to_frame(nm).rolling(window, min_periods)
            .over(order_by=order_by, partition_by=partition_by),
            nm, self.name)

    def expanding(self, min_periods: int = 1, order_by=None,
                  partition_by=None):
        nm = self.name or "0"
        return _SeriesWindowAgg(
            self.to_frame(nm).expanding(min_periods)
            .over(order_by=order_by, partition_by=partition_by),
            nm, self.name)

    def ewm(self, alpha: float, order_by=None, partition_by=None,
            adjust: bool = True, bias: bool = False):
        nm = self.name or "0"
        return _SeriesEWM(
            self.to_frame(nm).ewm(alpha, order_by=order_by,
                                  partition_by=partition_by,
                                  adjust=adjust, bias=bias),
            nm, self.name)

    # ------------------------------------------------ window-form stats
    def _order_window(self, partition_by=None):
        from pyspark.sql import Window

        from mars_spark.operators.window import (_global_window_warning,
                                                 _order_cols)

        order = _order_cols(self._frame, None)
        if not partition_by:
            # the Series method forms ride the owning frame's plan
            # (the _extend/_origin fast path), which pins them to a
            # window expression — the frame-level operators
            # (operators/window.py shift/diff/cumsum/…) are the
            # boundary-exchange-distributed ungrouped forms
            _global_window_warning("Series shift/diff/cum* method form")
        return (Window.partitionBy(*(partition_by or []))
                .orderBy(*[F.col(c) for c in order]))

    def _extend(self, expr, out: str) -> "Series":
        """Attach a derived column to the owning frame (the rank
        extension pattern — binops against the original frame's
        series need no align join)."""
        from mars_spark.core.frame import DataFrame

        nf = DataFrame(self._frame._sdf.withColumn(out, expr),
                       self._frame._index, seq=self._frame._seq,
                       seq_dirty=self._frame._seq_dirty)
        nf._origin_sdf = self._frame._sdf
        return Series(nf, F.col(out), self.name)

    def shift(self, periods: int = 1, partition_by=None) -> "Series":
        w = self._order_window(partition_by)
        fn = (F.lag(self._col, periods) if periods >= 0
              else F.lead(self._col, -periods))
        return self._extend(fn.over(w), "__shift")

    def diff(self, periods: int = 1, partition_by=None) -> "Series":
        w = self._order_window(partition_by)
        return self._extend(
            self._col - F.lag(self._col, periods).over(w), "__diff")

    def pct_change(self, periods: int = 1, partition_by=None) -> "Series":
        w = self._order_window(partition_by)
        return self._extend(
            F.try_divide(self._col,
                         F.lag(self._col, periods).over(w)) - 1,
            "__pct")

    def _cum(self, fn, out: str, partition_by=None) -> "Series":
        from pyspark.sql import Window

        w = self._order_window(partition_by).rowsBetween(
            Window.unboundedPreceding, 0)
        return self._extend(
            F.when(self._col.isNotNull(), fn(self._col).over(w)), out)

    def cumsum(self, partition_by=None) -> "Series":
        return self._cum(F.sum, "__cumsum", partition_by)

    def cumprod(self, partition_by=None) -> "Series":
        return self._cum(F.product, "__cumprod", partition_by)

    def cummin(self, partition_by=None) -> "Series":
        return self._cum(F.min, "__cummin", partition_by)

    def cummax(self, partition_by=None) -> "Series":
        return self._cum(F.max, "__cummax", partition_by)

    def autocorr(self, lag: int = 1):
        """pandas Series.autocorr — Pearson corr of the series with its
        lagged self: one window + one corr aggregate."""
        w = self._order_window()
        lagged = F.lag(self._col, lag).over(w)
        sdf = self._frame._sdf.select(self._col.alias("__a"),
                                      lagged.alias("__b"))
        return sdf.agg(F.corr("__a", "__b")).collect()[0][0]

    def corr(self, other: "Series", method: str = "pearson",
             min_periods: int | None = None,
             max_items: int = 20_000, approx: bool = False):
        """Correlation with another series — pearson / spearman /
        kendall, the pandas method set (reference
        mars/dataframe/statistics/corr.py:29). Same-frame pearson
        pairs are one aggregate; spearman ranks both sides
        (operators/corr.py) and kendall runs the tie-corrected
        weighted pair count. Cross-frame pairs align on the index
        first. ``min_periods`` follows pandas: NaN when fewer
        pairwise-complete observations exist. kendall on
        high-cardinality pairs: raise ``max_items`` or pass
        ``approx=True`` for the deterministic rank-binned tau
        (operators/corr.kendall_pair docstring)."""
        if method not in ("pearson", "spearman", "kendall"):
            raise ValueError(f"corr: unknown method {method!r}")
        if isinstance(other, Series) and other._frame is self._frame:
            if method == "pearson" and not min_periods:
                try:
                    v = self._agg_scalar(F.corr(self._col, other._col))
                except Exception as e:  # ANSI: zero variance → NaN
                    if "DIVIDE_BY_ZERO" not in str(e):
                        raise
                    v = None
                return float("nan") if v is None else float(v)
            pair_sdf = self._frame._sdf.select(
                self._col.alias("__a"), other._col.alias("__b"))
        else:
            from mars_spark.operators.align import align_series

            pair = align_series(self, other, lambda a, b: F.struct(
                a.alias("a"), b.alias("b")), name="__pair")
            pair_sdf = (pair._frame._sdf.select(pair._col.alias("__p"))
                        .select(F.col("__p.a").alias("__a"),
                                F.col("__p.b").alias("__b")))
        if method == "pearson":
            try:
                row = pair_sdf.agg(
                    F.corr("__a", "__b").alias("c"),
                    F.count(F.when(F.col("__a").isNotNull()
                                   & F.col("__b").isNotNull(), 1))
                    .alias("n")).collect()[0]
            except Exception as e:  # ANSI: zero variance → NaN
                if "DIVIDE_BY_ZERO" not in str(e):
                    raise
                return float("nan")
            if min_periods and int(row["n"]) < min_periods:
                return float("nan")
            return float("nan") if row["c"] is None else float(row["c"])
        from mars_spark.operators.corr import kendall_pair, spearman_pair

        if method == "spearman":
            return spearman_pair(pair_sdf, "__a", "__b",
                                 min_periods=min_periods)
        return kendall_pair(pair_sdf, "__a", "__b",
                            min_periods=min_periods,
                            max_items=max_items, approx=approx)

    def describe(self, percentiles=(0.25, 0.5, 0.75)):
        """mars/dataframe/base/describe.py Series form — ONE aggregate
        (count/mean/std/min/exact percentiles/max), returned as the
        pandas-shaped Series."""
        import pandas as pd

        qs = list(percentiles)
        row = self._frame._sdf.agg(
            F.count(self._col).alias("count"),
            F.avg(self._col).alias("mean"),
            F.stddev_samp(self._col).alias("std"),
            F.min(self._col).alias("min"),
            *[F.percentile(self._col, F.lit(q)).alias(f"q{i}")
              for i, q in enumerate(qs)],
            F.max(self._col).alias("max")).collect()[0]
        out = {"count": float(row["count"]), "mean": row["mean"],
               "std": row["std"], "min": row["min"]}
        for i, q in enumerate(qs):
            out[f"{int(q * 100)}%"] = row[f"q{i}"]
        out["max"] = row["max"]
        return pd.Series(out)

    def to_pandas(self):
        import pandas as pd

        name = self.name or "0"
        pdf = self._frame._sdf.select(self._col.alias(name)).toPandas()
        return pdf[name]

    def _indexed_pandas(self, limit: int | None = None,
                        ordered: bool = False):
        """Collect this series as an index-labeled pandas Series. The
        value column projects under a reserved alias so a series
        NAMED like an index column (f.set_index('k').k) doesn't
        create a duplicate-name projection — the one place that
        invariant lives (to_dict and plot both route here)."""
        idx = getattr(self._frame, "_index", None) or []
        sdf = self._frame._sdf.select(
            *[F.col(c) for c in idx], self._col.alias("__sval"))
        if ordered and idx:
            sdf = sdf.orderBy(*idx)
        if limit is not None:
            sdf = sdf.limit(limit)
        pdf = sdf.toPandas()
        if idx:
            pdf = pdf.set_index(idx[0] if len(idx) == 1 else list(idx))
        return pdf["__sval"]

    def to_dict(self, into=dict):
        """reference: mars/dataframe/core.py:1605 — {index: value};
        positions when the parent frame has no index columns."""
        return self._indexed_pandas().to_dict(into=into)

    def items(self, batch_size: int = 1000):
        """pandas Series.items parity — batched (label, value)
        iteration via the parent frame's streamed fetch (reserved
        value alias: see to_dict)."""
        from mars_spark.core.frame import DataFrame as _DF

        proj = _DF(self._frame._sdf.select(
            *[F.col(c) for c in (self._frame._index or [])],
            self._col.alias("__sval")), self._frame._index)
        for pdf in proj._iter_pandas_batches(batch_size):
            yield from pdf["__sval"].items()

    iteritems = items

    @property
    def plot(self):
        """mars/dataframe/plotting/core.py:23 (Series form) — bounded
        collect + ``pandas.Series.plot`` delegate."""
        from mars_spark.core.plotting import PlotAccessor

        return PlotAccessor(self)

    def _plot_pandas(self, limit: int):
        # ordered: line/area plots render rows in collected order —
        # sort by the label index (Spark defines no row order)
        return self._indexed_pandas(limit, ordered=True).rename(
            self.name or "0")

    def execute(self):
        return self


class _SeriesWindowAgg:
    """Series rolling/expanding facade: runs the frame-level window op
    on the one-column frame and hands back the single derived column
    as a Series (new column located by set difference — the window
    ops suffix their outputs)."""

    def __init__(self, win, col: str, name):
        self._win = win
        self._colname = col
        self._name = name

    def agg(self, fn: str) -> "Series":
        before = set(self._win._frame._sdf.columns)
        res = self._win.agg({self._colname: fn})
        new = [c for c in res._sdf.columns if c not in before]
        return Series(res, F.col(new[-1]), self._name)

    def sum(self) -> "Series":
        return self.agg("sum")

    def mean(self) -> "Series":
        return self.agg("mean")

    def min(self) -> "Series":
        return self.agg("min")

    def max(self) -> "Series":
        return self.agg("max")

    def count(self) -> "Series":
        return self.agg("count")

    def std(self) -> "Series":
        return self.agg("std")

    def var(self) -> "Series":
        return self.agg("var")


class _SeriesEWM:
    """Series EWM facade over operators/window.EWM."""

    def __init__(self, ewm, col: str, name):
        self._ewm = ewm
        self._colname = col
        self._name = name

    def _stat(self, stat: str) -> "Series":
        before = set(self._ewm._frame._sdf.columns)
        res = self._ewm.agg(self._colname, stats=(stat,))
        new = [c for c in res._sdf.columns if c not in before]
        return Series(res, F.col(new[-1]), self._name)

    def mean(self) -> "Series":
        return self._stat("mean")

    def var(self) -> "Series":
        return self._stat("var")

    def std(self) -> "Series":
        return self._stat("std")


class _SeriesAt:
    """s.at[label] / s.iat[pos] → scalar via the frame indexers."""

    def __init__(self, series: Series, positional: bool):
        self._s = series
        self._positional = positional

    def __getitem__(self, key):
        nm = self._s.name or "0"
        fr = self._s.to_frame(nm)
        if self._positional:
            return fr.iat[key, 0]
        return fr.at[key, nm]


class _SeriesLoc:
    """s.loc[...] / s.iloc[...] — frame indexer, projected back to the
    value column (label-scalar lookups collapse to Python scalars via
    at/iat, pandas-style)."""

    def __init__(self, series: Series, positional: bool):
        self._s = series
        self._positional = positional

    def __getitem__(self, key):
        from mars_spark.core.frame import DataFrame

        s = self._s
        nm = s.name or "0"
        if self._positional and isinstance(key, int):
            return s.iat[key]
        fr = s.to_frame(nm)
        res = fr.iloc[key] if self._positional else fr.loc[key]
        if isinstance(res, DataFrame) and nm in res.columns:
            return Series(res, F.col(nm), s.name)
        return res


# Unary ufunc surface (reference: mars/dataframe/arithmetic/{sqrt,exp,
# log,log2,log10,sin,cos,tan,...}.py — one operand class per file there;
# each is a single JVM expression here, stays in whole-stage codegen).
_UFUNCS = {
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "exp": F.exp,
    "expm1": F.expm1,
    "log": F.log,
    "log2": F.log2,
    "log10": F.log10,
    "log1p": F.log1p,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "arcsin": F.asin,
    "arccos": F.acos,
    "arctan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    "arcsinh": F.asinh,
    "arccosh": F.acosh,
    "arctanh": F.atanh,
    "floor": F.floor,
    "ceil": F.ceil,
    "degrees": F.degrees,
    "radians": F.radians,
    "sign": F.signum,
    "isnan": F.isnan,
}


def _make_ufunc(fn):
    def method(self) -> "Series":
        return self._unary(fn)
    return method


for _name, _fn in _UFUNCS.items():
    setattr(Series, _name, _make_ufunc(_fn))


def _dtype_to_spark(dtype) -> str:
    """numpy/pandas dtype spec → Spark SQL type name.

    Mirrors the dtype surface of mars/dataframe/base/astype.py; pandas
    int→float NaN promotion is replaced by Spark nullability
    (SURVEY.md §1.3).
    """
    m = {
        "int": "bigint",
        "int8": "tinyint",
        "int16": "smallint",
        "int32": "int",
        "int64": "bigint",
        "float": "double",
        "float32": "float",
        "float64": "double",
        "str": "string",
        "string": "string",
        "object": "string",
        "bool": "boolean",
        "datetime64[ns]": "timestamp",
        "datetime64": "timestamp",
        "date": "date",
        "category": "string",
    }
    key = dtype if isinstance(dtype, str) else getattr(dtype, "name", str(dtype))
    return m.get(key, key)
