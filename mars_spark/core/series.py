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
                        strict: bool = False) -> bool:
        """mars/dataframe/base/check_monotonic.py:27 (chunk-level
        results combined on the driver) → distributed monotonicity in
        index order WITHOUT a global-order window: range-partition on
        the index, per-partition lag comparison, then a
        (num-partitions)-row driver check of the partition boundary
        values. Any null value makes the result False (pandas: NaN
        breaks monotonicity); an empty series is monotonic."""
        idx = self._frame._require_index("check_monotonic")
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
