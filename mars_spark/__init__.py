"""mars_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mars-project/mars.

Mars (the reference, at /root/reference) is a tensor/dataframe framework
that scales numpy/pandas/scikit-learn on a custom actor runtime. This
package re-expresses its *capabilities* Spark-first:

- pandas-semantics DataFrame/Series API  ->  Spark DataFrame / Column
  expressions (Catalyst plans, whole-stage codegen; see SURVEY.md §3).
- Mars's own tiling/shuffle/scheduling/spill machinery is NOT rebuilt —
  Spark already provides it (SURVEY.md §1, §4.2).
- Additive, beyond the reference: Structured Streaming surface and
  LLM-training-data operators (dedup, similarity search, text analysis,
  multimodal plumbing) under ``mars_spark.llm``.

Entry points mirror the reference's public API (``mars.dataframe`` =
``md``)::

    import mars_spark as ms
    df = ms.read_parquet("/path/lineitem.parquet")
    out = df[df["l_shipdate"] <= "1998-09-02"].groupby("l_returnflag").agg(
        sum_qty=("l_quantity", "sum"))
    out.to_pandas()          # or .execute() / .to_spark()
"""

from mars_spark import remote
from mars_spark.functions.encoding import cut, qcut, get_dummies
from mars_spark.session import get_spark, register, sql, stop_spark
from mars_spark.core.frame import DataFrame
from mars_spark.core.series import Series
from mars_spark.sources.io import (
    read_parquet,
    read_csv,
    read_json,
    read_orc,
    read_sql,
    from_pandas,
    from_spark,
    range as range_,
    date_range,
)

__version__ = "0.1.0"

__all__ = [
    "DataFrame",
    "Series",
    "get_spark",
    "register",
    "sql",
    "stop_spark",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "read_sql",
    "from_pandas",
    "from_spark",
    "range_",
    "date_range",
    "concat",
    "merge",
    "remote",
    "cut",
    "qcut",
    "get_dummies",
]


def concat(objs, axis=0, join="outer", ignore_index=False):
    from mars_spark.operators.merge import concat as _concat

    return _concat(objs, axis=axis, join=join, ignore_index=ignore_index)


def merge(left, right, **kwargs):
    return left.merge(right, **kwargs)


def to_numeric(series, errors="coerce"):
    """pandas.to_numeric (reference: mars/dataframe/base/to_numeric.py)."""
    return series.to_numeric(errors=errors)


def to_datetime(series, format=None):
    """pandas.to_datetime (reference: mars/dataframe/tseries/
    to_datetime.py:37 — module-level form)."""
    from mars_spark.functions.datetimes import to_datetime as _td

    return _td(series, format=format)


def isna(obj):
    """reference: mars/dataframe/missing/checkna.py — module form of
    DataFrame/Series.isna."""
    return obj.isna()


def notna(obj):
    return obj.notna()


# the reference exports both spellings (pandas parity)
isnull = isna
notnull = notna


def melt(frame, id_vars=None, value_vars=None, var_name="variable",
         value_name="value"):
    """reference: mars/dataframe/base/melt.py — module form."""
    return frame.melt(id_vars=id_vars, value_vars=value_vars,
                      var_name=var_name, value_name=value_name)


def unique(series):
    """reference: mars/dataframe/base/unique.py — module form of
    Series.unique (distinct collect)."""
    return series.unique()


def from_records(records, columns=None):
    """reference: mars/dataframe/datasource/from_records.py —
    list-of-tuples/dicts → distributed frame via the Arrow path."""
    import pandas as pd

    return from_pandas(pd.DataFrame.from_records(records,
                                                 columns=columns))


def from_tensor(tensor, index=None, columns=None, name=None):
    """reference: mars/dataframe/datasource/from_tensor.py:42
    (DataFrameFromTensor) and :555 (SeriesFromTensor) — ndarray →
    frame (2-D, columns default 0..m−1) or Series (1-D), parallelized
    through the Arrow createDataFrame path like from_pandas. An
    ``index`` lands as the frame's index (set_index), matching the
    reference's index-tensor support."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(tensor)
    if index is not None:
        # the index lands as a column named 'index' (the engine's
        # index-as-column contract) — a data column with that name
        # would be silently clobbered, so refuse the collision
        clash = (columns is not None and "index" in
                 [str(c) for c in columns]) or name == "index"
        if clash:
            raise ValueError(
                "from_tensor with an index cannot also have a "
                "column/Series named 'index' (the index occupies "
                "that column)")
    if arr.ndim == 1:
        pdf = pd.DataFrame({name or "0": arr})
        if index is not None:
            pdf["index"] = np.asarray(index)
        f = from_pandas(pdf)
        if index is not None:
            f = f.set_index("index")
        s = f[name or "0"]
        s.name = name
        return s
    if arr.ndim != 2:
        raise ValueError("from_tensor supports 1-D and 2-D input "
                         "(the reference's frame/series shapes)")
    cols = ([str(c) for c in columns] if columns is not None
            else [str(j) for j in range(arr.shape[1])])
    pdf = pd.DataFrame(arr, columns=cols)
    if index is not None:
        pdf["index"] = np.asarray(index)
    f = from_pandas(pdf)
    if index is not None:
        f = f.set_index("index")
    return f


def read_sql_query(sql_query: str, url: str, **kwargs):
    """reference: mars/dataframe/datasource/read_sql.py read_sql_query
    — a query pushes down as a JDBC dbtable subquery."""
    return read_sql(f"({sql_query}) AS q", url, **kwargs)


def read_sql_table(table: str, url: str, **kwargs):
    """reference: mars/dataframe/datasource/read_sql.py
    read_sql_table — same as read_sql on a bare table name."""
    return read_sql(table, url, **kwargs)


__all__ += ["to_numeric", "to_datetime", "isna", "isnull", "notna",
            "notnull", "melt", "unique", "from_records", "from_tensor",
            "read_sql_query", "read_sql_table"]

# module-level eval + CustomReduction (reference exports both from
# mars.dataframe: base/eval.py:417, reduction/core.py:652), the Index
# initializer (mars/dataframe/initializer.py), and ExecutableTuple
# (mars/core) — see each module's docstring for the Spark-first shape
from mars_spark.core.eval import mars_eval as eval  # noqa: E402,A001
from mars_spark.core.executable import ExecutableTuple  # noqa: E402
from mars_spark.core.index import Index  # noqa: E402
from mars_spark.core.reduction import CustomReduction  # noqa: E402

__all__ += ["eval", "CustomReduction", "Index", "ExecutableTuple"]


def _module_ufunc(name):
    def fn(series):
        return getattr(series, name)()
    fn.__name__ = name
    fn.__doc__ = (f"Element-wise {name} (reference: mars/dataframe/"
                  f"arithmetic/{name}.py — module-level ufunc form).")
    return fn


# module-level ufuncs mirroring the reference's md.sqrt(s) surface
from mars_spark.core.series import _UFUNCS as _SERIES_UFUNCS  # noqa: E402

for _n in _SERIES_UFUNCS:
    globals()[_n] = _module_ufunc(_n)
    __all__.append(_n)
del _n
