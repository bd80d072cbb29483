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
