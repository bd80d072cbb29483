"""Index facade (reference: mars/dataframe/core.py:958 ``Index`` and
the ``md.Index`` initializer, mars/dataframe/initializer.py).

Two modes, both cheap:

- **lazy view** (``df.index`` / ``s.index``): wraps the owning frame's
  index column(s); nothing is planned or collected until
  ``to_pandas()`` / iteration / ``len()`` — the same laziness the
  reference's Index tileable has. Collection is driver-sized by
  definition (one column of labels), the same contract as
  ``to_pandas``.
- **label list** (``ms.Index([...], name=...)``): an in-memory label
  holder, accepted anywhere the engine takes a label list
  (``reindex``, ``loc``) since it iterates like one.
"""

from __future__ import annotations


class Index:
    def __init__(self, data=None, name=None, _frame=None):
        if _frame is not None:
            self._frame = _frame
            self._data = None
            self._name = name
        else:
            self._frame = None
            self._data = list(data if data is not None else [])
            self._name = name

    # ------------------------------------------------------------ meta
    @property
    def names(self) -> list:
        if self._frame is not None:
            return list(self._frame._index)
        return [self._name]

    @property
    def name(self):
        names = self.names
        return names[0] if len(names) == 1 else tuple(names)

    @property
    def nlevels(self) -> int:
        return len(self.names) if self._frame is not None else 1

    def __repr__(self):
        if self._frame is not None:
            return f"Index(columns={self._frame._index}, lazy)"
        return f"Index({self._data!r}, name={self._name!r})"

    # ----------------------------------------------------- materialize
    def to_pandas(self):
        import pandas as pd

        if self._frame is None:
            return pd.Index(self._data, name=self._name)
        cols = self._frame._index
        if not cols:
            raise ValueError("frame has no index — call set_index()/"
                             "set_sequence_index() first")
        pdf = self._frame._sdf.select(*cols).toPandas()
        if len(cols) == 1:
            return pd.Index(pdf[cols[0]], name=cols[0])
        return pd.MultiIndex.from_frame(pdf[cols])

    @property
    def values(self):
        return self.to_pandas().values

    def tolist(self) -> list:
        if self._frame is None:
            return list(self._data)
        return list(self.to_pandas())

    def __iter__(self):
        return iter(self.tolist())

    def __len__(self):
        if self._frame is None:
            return len(self._data)
        return self._frame._sdf.count()

    @property
    def size(self) -> int:
        return len(self)

    @property
    def ndim(self) -> int:
        return 1

    @property
    def T(self) -> "Index":
        return self

    # ------------------------------------------------ value delegates
    # (reference indexing.rst: Index value ops) — the lazy mode rides
    # the engine Series over the index column; the label mode rides
    # pandas directly. Value ops need a single index level.

    def _series(self):
        from pyspark.sql import functions as F

        from mars_spark.core.series import Series

        if self._frame is None:
            raise ValueError("label-list Index has no backing frame")
        cols = self._frame._index
        if len(cols) != 1:
            raise ValueError("Index value ops need a single level")
        return Series(self._frame, F.col(cols[0]), cols[0])

    def _pd(self):
        import pandas as pd

        return pd.Index(self._data, name=self._name)

    def to_series(self):
        if self._frame is None:
            return self._pd().to_series()
        return self._series()

    def to_frame(self):
        from pyspark.sql import functions as F

        from mars_spark.core.frame import DataFrame

        if self._frame is None:
            return self._pd().to_frame()
        cols = self._frame._index
        return DataFrame(self._frame._sdf.select(*[F.col(c)
                                                   for c in cols]), cols)

    @property
    def dtype(self):
        if self._frame is None:
            return self._pd().dtype
        return self._series().dtype

    @property
    def inferred_type(self) -> str:
        if self._frame is None:
            return self._pd().inferred_type
        t = self._series().dtype
        if t in ("int", "bigint", "smallint", "tinyint"):
            return "integer"
        if t in ("double", "float") or t.startswith("decimal"):
            return "floating"
        if t == "string":
            return "string"
        if t.startswith("timestamp") or t == "date":
            return "datetime64"
        if t == "boolean":
            return "boolean"
        return t

    def _monotonic(self, decreasing: bool) -> bool:
        # in index order the index is trivially sorted — positional
        # monotonicity must order by the sequence carrier (built over
        # the current plan order when absent)
        from pyspark.sql import functions as F

        from mars_spark.core.series import Series

        cols = self._frame._index
        if len(cols) != 1:
            raise ValueError("Index monotonicity needs a single level")
        f2 = self._frame._ensure_seq()
        order = f2._seq if f2 is not self._frame else None
        s = Series(f2, F.col(cols[0]), cols[0])
        if order is None:
            # the frame's own clean sequence column is the carrier
            order = self._frame._seq
            if order is None or order == cols[0]:
                # the index IS the engine sequence (RangeIndex
                # analog) — increasing by construction
                return (len(self) <= 1) if decreasing else True
        return s.check_monotonic(decreasing=decreasing, order_by=order)

    @property
    def is_monotonic_increasing(self) -> bool:
        if self._frame is None:
            return bool(self._pd().is_monotonic_increasing)
        return self._monotonic(decreasing=False)

    @property
    def is_monotonic_decreasing(self) -> bool:
        if self._frame is None:
            return bool(self._pd().is_monotonic_decreasing)
        return self._monotonic(decreasing=True)

    @property
    def is_monotonic(self) -> bool:
        return self.is_monotonic_increasing

    def memory_usage(self, deep: bool = False):
        if self._frame is None:
            return self._pd().memory_usage(deep=deep)
        return self._series().memory_usage(deep=deep)

    def all(self):
        if self._frame is None:
            return bool(self._pd().all())
        return self._series().all()

    def any(self):
        if self._frame is None:
            return bool(self._pd().any())
        return self._series().any()

    def max(self):
        if self._frame is None:
            return self._pd().max()
        return self._series().max()

    def min(self):
        if self._frame is None:
            return self._pd().min()
        return self._series().min()

    def isna(self):
        if self._frame is None:
            return self._pd().isna()
        return self._series().isna()

    def notna(self):
        if self._frame is None:
            return self._pd().notna()
        return self._series().notna()

    def duplicated(self):
        if self._frame is None:
            return self._pd().duplicated()
        return self._series().duplicated()

    def map(self, mapping, return_type: str = "double"):
        if self._frame is None:
            return Index(self._pd().map(mapping), name=self._name)
        return self._series().map(mapping, return_type=return_type)

    def astype(self, dtype):
        if self._frame is None:
            return Index(self._pd().astype(dtype), name=self._name)
        return self._series().astype(dtype)

    # ----------------------------------------- index-shaped transforms
    def _rewrap(self, sdf) -> "Index":
        from mars_spark.core.frame import DataFrame

        return Index(_frame=DataFrame(sdf, self._frame._index))

    def drop(self, labels) -> "Index":
        if self._frame is None:
            return Index(self._pd().drop(labels), name=self._name)
        from pyspark.sql import functions as F

        col = F.col(self._frame._index[0])
        return self._rewrap(self._frame._sdf.filter(
            ~col.isin(list(labels))))

    def drop_duplicates(self) -> "Index":
        if self._frame is None:
            return Index(self._pd().drop_duplicates(), name=self._name)
        cols = self._frame._index
        return self._rewrap(self._frame._sdf.select(*cols).distinct())

    def dropna(self) -> "Index":
        if self._frame is None:
            return Index(self._pd().dropna(), name=self._name)
        from pyspark.sql import functions as F

        col = F.col(self._frame._index[0])
        return self._rewrap(self._frame._sdf.filter(col.isNotNull()))

    def fillna(self, value) -> "Index":
        if self._frame is None:
            return Index(self._pd().fillna(value), name=self._name)
        name = self._frame._index[0]
        return self._rewrap(self._frame._sdf.fillna({name: value}))

    def rename(self, name) -> "Index":
        if self._frame is None:
            return Index(self._data, name=name)
        old = self._frame._index[0]
        from mars_spark.core.frame import DataFrame

        sdf = self._frame._sdf.withColumnRenamed(old, name)
        return Index(_frame=DataFrame(sdf, [name]))

    def set_names(self, names) -> "Index":
        names = [names] if isinstance(names, str) else list(names)
        if self._frame is None:
            return Index(self._data, name=names[0])
        from mars_spark.core.frame import DataFrame

        sdf = self._frame._sdf
        for old, new in zip(self._frame._index, names):
            sdf = sdf.withColumnRenamed(old, new)
        return Index(_frame=DataFrame(sdf, names))
