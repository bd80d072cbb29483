"""Minimal pandas ``.cat`` parity over string-backed categoricals.

Reference: mars/dataframe/core.py:167 (CategoricalIndex) and :3012
(categorical dtype chunks). Spark has no categorical type — parquet
already dictionary-encodes strings, so the engine stores categories as
plain strings (``astype('category')`` is a string cast, documented in
core/series.py _dtype_to_spark) and exposes the pandas surface as
derived, bounded operations:

- ``categories``: the sorted distinct values (one distributed
  distinct over a column that is small by definition — categoricals
  have low cardinality; the collect is |categories| rows).
- ``codes``: position of each value in ``categories`` via a literal
  ``create_map`` lookup (JVM-side, codegen; -1 for nulls like pandas).
"""

from __future__ import annotations

from pyspark.sql import functions as F


class CategoricalAccessor:
    def __init__(self, series):
        self._s = series

    @property
    def categories(self) -> list:
        plan = getattr(self._s, "_cat_plan", None)
        if plan is not None:
            # pinned at astype('category') time — survives filtering
            return [r["v"] for r in plan.orderBy("v").collect()]
        rows = (self._s._frame._sdf
                .select(self._s._col.alias("v"))
                .filter(F.col("v").isNotNull())
                .distinct().orderBy("v").collect())
        return [r["v"] for r in rows]

    @property
    def codes(self):
        from mars_spark.core.series import Series

        cats = self.categories
        pairs = []
        for i, c in enumerate(cats):
            pairs.extend([F.lit(c), F.lit(i)])
        if not pairs:
            return Series(self._s._frame, F.lit(-1).cast("int"),
                          self._s.name)
        m = F.create_map(*pairs)
        code = F.coalesce(m[self._s._col], F.lit(-1)).cast("int")
        return Series(self._s._frame, code, self._s.name)

    def rename_categories(self, mapping: dict):
        """New Series with category values renamed (a literal map —
        no shuffle)."""
        from mars_spark.core.series import Series

        pairs = []
        for k, v in mapping.items():
            pairs.extend([F.lit(k), F.lit(v)])
        m = F.create_map(*pairs)
        col = F.coalesce(m[self._s._col], self._s._col)
        return Series(self._s._frame, col, self._s.name)
