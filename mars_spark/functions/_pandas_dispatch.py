"""Generic pandas-accessor fallback dispatch.

Reference parity: mars/dataframe/base/string_.py:411-418 and
mars/dataframe/base/datetimes.py:152-154 — Mars auto-registers every
method of ``pd.Series.str`` / ``pd.Series.dt`` and executes it with
pandas per chunk. Spark-first we keep the hot methods JVM-side
(strings.py / datetimes.py); everything else routes through here: the
pandas method runs once on a tiny driver-side probe series to infer
the result dtype, then executes distributed as ONE Arrow-batched
pandas UDF (vectorized, no per-row Python).
"""

from __future__ import annotations

import warnings

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def spark_type_for(probe: pd.Series) -> T.DataType:
    """Map a pandas probe result dtype onto a Spark type."""
    from pandas.api import types as pt

    dt = probe.dtype
    if pt.is_bool_dtype(dt):
        return T.BooleanType()
    if pt.is_integer_dtype(dt):
        return T.LongType()
    if pt.is_float_dtype(dt):
        return T.DoubleType()
    if pt.is_datetime64_any_dtype(dt):
        return T.TimestampType()
    vals = probe.dropna()
    if len(vals) and isinstance(vals.iloc[0], (list, tuple)):
        return T.ArrayType(T.StringType())
    return T.StringType()


def _normalize(out: pd.Series, rtype: T.DataType) -> pd.Series:
    if isinstance(rtype, T.ArrayType):
        return out.map(lambda v: [str(x) for x in v]
                       if isinstance(v, (list, tuple)) else None)
    if isinstance(rtype, T.StringType):
        # object results (datetime.time, Period, …) stringify for Arrow
        return out.map(lambda v: None if v is None or v != v else str(v))
    return out


def accessor_fallback(series, accessor: str, name: str, probe_src: pd.Series):
    """Return a bound method (or a Series for dt properties) that runs
    ``pd.Series.<accessor>.<name>`` distributed via a pandas UDF."""
    probe_acc = getattr(probe_src, accessor)
    attr = getattr(probe_acc, name)  # raises AttributeError -> caller

    def build(probe_out: pd.Series, args, kwargs):
        if isinstance(probe_out, pd.DataFrame):
            raise NotImplementedError(
                f"Series.{accessor}.{name} returns a DataFrame "
                "(expand-style) — not supported by the fallback path")
        rtype = spark_type_for(probe_out)
        warnings.warn(
            f"Series.{accessor}.{name} has no JVM-side implementation — "
            "executing via an Arrow-batched pandas UDF (vectorized slow "
            "path).", stacklevel=3)

        @pandas_udf(rtype)
        def _f(s: pd.Series) -> pd.Series:
            acc = getattr(s, accessor)
            out = getattr(acc, name)
            if callable(out) and not isinstance(out, pd.Series):
                out = out(*args, **kwargs)
            return _normalize(out, rtype)

        from mars_spark.core.series import Series

        return Series(series._frame, _f(series._col), series.name)

    if isinstance(attr, pd.Series):  # dt property (is_leap_year, …)
        return build(attr, (), {})

    def method(*args, **kwargs):
        probe_out = attr(*args, **kwargs)
        return build(probe_out, args, kwargs)

    return method
