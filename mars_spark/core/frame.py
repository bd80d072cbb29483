"""DataFrame: pandas-semantics frame compiled to Spark DataFrame plans.

Reference parity: mars/dataframe/core.py:2243 (DataFrame surface);
indexing ops mars/dataframe/indexing/{getitem,setitem,loc,iloc}.py;
row ops mars/dataframe/base/*; missing-data mars/dataframe/missing/*.

Design (SURVEY.md §7): every frame wraps a ``pyspark.sql.DataFrame``
plus a list of "index" column names (pandas row-index analog — plain
columns, surfaced by groupby(as_index=True), set_index, etc.). All
transformations are lazy Catalyst plans; actions happen only on
``to_pandas()/collect()/count()``. No Mars-style tiling/chunking — row
partitioning is Spark's job; column-axis chunking is dropped in favor
of Catalyst column pruning (SURVEY.md §1.2).
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F

from mars_spark.core.series import Series, _dtype_to_spark


class _LocIndexer:
    """df.loc[:, [cols]] / df.loc[mask] / df.loc[label(s)/label-slice].

    Reference: mars/dataframe/indexing/loc.py:241. Label-based *row*
    selection on an explicit index uses a filter on the index columns —
    which Catalyst turns into partition/file pruning when the data is
    laid out on the index (Mars does this manually with chunk min/max).
    """

    def __init__(self, frame: "DataFrame"):
        self._frame = frame

    def __getitem__(self, key):
        if isinstance(key, tuple) and len(key) == 2:
            # disambiguate (rows, cols) from a 2-part composite label
            # on a 2-level index: the second element of a (rows, cols)
            # pair is a column selector (slice/list/column name/None).
            # pandas precedence (indexing/_LocIndexer._getitem_lowerdim):
            # on a MultiIndex a full-length tuple is FIRST tried as a
            # row label — so when the second index level is string-typed
            # a string key[1] is a label even if it collides with a
            # column name. Schema-only decision, no job.
            second_is_cols = (
                key[1] is None or isinstance(key[1], (slice, list))
                or (isinstance(key[1], str)
                    and key[1] in self._frame._sdf.columns))
            if (len(self._frame._index) == 2 and isinstance(key[1], str)
                    and second_is_cols
                    and not isinstance(key[0], (slice, list, Series, tuple))):
                lvl2 = self._frame._index[1]
                lvl2_type = dict(self._frame._sdf.dtypes).get(lvl2, "")
                if lvl2_type == "string" and key[1] != lvl2:
                    second_is_cols = False
            if (len(self._frame._index) == 2 and not second_is_cols
                    and not isinstance(key[0], (slice, list, Series))):
                rows, cols = key, None
            else:
                rows, cols = key
        else:
            rows, cols = key, None
        out = self._frame
        if isinstance(rows, Series):
            out = out[rows]
        elif isinstance(rows, slice):
            if rows.start is not None or rows.stop is not None:
                # label-range on the (single) index column — pandas loc
                # slices are inclusive on both ends
                idx = self._frame._require_index("loc label slice")
                cond = F.lit(True)
                if rows.start is not None:
                    cond = cond & (F.col(idx) >= F.lit(rows.start))
                if rows.stop is not None:
                    cond = cond & (F.col(idx) <= F.lit(rows.stop))
                out = DataFrame(out._sdf.filter(cond), out._index)
        elif isinstance(rows, list):
            out = DataFrame(out._sdf.filter(self._frame._label_cond(rows)),
                            out._index)
        elif isinstance(rows, tuple):
            # tuple = one composite (MultiIndex) label
            out = DataFrame(
                out._sdf.filter(self._frame._label_cond(rows)), out._index)
        elif rows is not None:
            out = DataFrame(out._sdf.filter(self._frame._label_cond(rows)),
                            out._index)
        if cols is not None:
            if isinstance(cols, str):
                return out[cols]
            out = out[list(cols)]
        return out


class _AtIndexer:
    """Single-cell access: ``df.at[label, col]`` / ``df.iat[pos,
    col_offset]`` — one filtered single-row job, the eager-scalar
    companion of loc/iloc (reference: mars/dataframe/indexing/at.py,
    iat.py, which restrict loc/iloc to integer scalars)."""

    def __init__(self, frame: "DataFrame", positional: bool):
        self._frame = frame
        self._positional = positional

    def __getitem__(self, key):
        if not (isinstance(key, tuple) and len(key) == 2):
            raise KeyError("at/iat take a (row, column) pair")
        row, col = key
        f = self._frame
        if self._positional:
            if not isinstance(col, int):
                raise KeyError("iat column must be an integer offset")
            col = f.columns[col]
            sub = f.iloc[row if isinstance(row, slice)
                         else slice(row, row + 1 if row != -1 else None)]
            rows = sub._sdf.select(col).collect()
        else:
            idx = f._require_index("at")
            rows = (f._sdf.filter(F.col(idx) == F.lit(row))
                    .select(col).collect())
        if len(rows) != 1:
            raise KeyError(f"at/iat: expected exactly one row, "
                           f"got {len(rows)}")
        return rows[0][col]


class _ILocIndexer:
    """df.iloc[a:b] / df.iloc[i] / df.iloc[[i, j]] positional selection.

    Reference: mars/dataframe/indexing/iloc.py:251 — Mars resolves
    positions against cumulative chunk sizes computed at tile time;
    the distributed-sequence index here is the same prefix-sum, built
    once per frame (see set_sequence_index) with no global sort and no
    single-partition window. Negative positions resolve against the
    index max (one tiny agg job).
    """

    def __init__(self, frame: "DataFrame"):
        self._frame = frame

    def __getitem__(self, key):
        if isinstance(key, tuple) and len(key) == 2:
            rows, cols = key
        else:
            rows, cols = key, None
        f = self._frame._ensure_seq()
        seq = F.col(f._seq)
        if isinstance(rows, slice):
            if rows.step not in (None, 1):
                raise NotImplementedError("iloc step != 1")
            start, stop = rows.start, rows.stop
            cond = F.lit(True)
            if start is not None:
                s = seq >= F.lit(start) if start >= 0 else \
                    seq >= f._seq_len() + start
                cond = cond & s
            if stop is not None:
                s = seq < F.lit(stop) if stop >= 0 else \
                    seq < f._seq_len() + stop
                cond = cond & s
        elif isinstance(rows, int):
            pos = rows if rows >= 0 else f._seq_len() + rows
            cond = seq == F.lit(pos)
        elif isinstance(rows, (list, tuple)):
            cond = seq.isin([int(r) for r in rows])
        else:
            raise NotImplementedError(f"iloc row selector {type(rows)}")
        sel = f._sdf.filter(cond)
        if f._seq != self._frame._seq:
            # ephemeral helper index: don't leak the column; a stale
            # user-visible sequence column (if any) stays as data
            sel = sel.drop(f._seq)
        # any propagated sequence now has gaps → positional ops against
        # the result must rebuild (seq_dirty)
        out = DataFrame(sel, self._frame._index, seq=self._frame._seq,
                        seq_dirty=True)
        if cols is not None:
            names = self._frame.columns
            if isinstance(cols, int):
                return out[names[cols]]
            out = out[[names[c] for c in cols]]
        return out


class DataFrame:
    """Distributed pandas-semantics frame backed by a Spark plan."""

    def __init__(self, sdf: SparkDataFrame, index: list[str] | None = None,
                 seq: str | None = None, seq_dirty: bool = False):
        self._sdf = sdf
        self._index = list(index or [])
        # name of the engine-managed sequence-index column, if one was
        # materialized by set_sequence_index (None = positional ops
        # build an ephemeral one over the current plan order)
        self._seq = seq
        # True when rows were filtered AFTER the sequence was assigned:
        # the labels are still a valid ordering (drop_duplicates keep=
        # first/last) but have gaps, so positional ops (iloc/tail) must
        # rebuild a dense sequence against the CURRENT frame — pandas
        # positional semantics are always against the current frame.
        self._seq_dirty = seq_dirty and seq is not None

    # ------------------------------------------------------------ basics
    @property
    def spark(self) -> SparkDataFrame:
        return self._sdf

    def to_spark(self) -> SparkDataFrame:
        return self._sdf

    @property
    def columns(self) -> list[str]:
        return [c for c in self._sdf.columns if c not in self._index]

    @property
    def dtypes(self):
        return dict(self._sdf.dtypes)

    @property
    def index(self):
        """Lazy Index facade over the index column(s) (reference:
        mars/dataframe/core.py:958) — plans nothing until
        materialized."""
        from mars_spark.core.index import Index

        return Index(_frame=self)

    @property
    def ndim(self) -> int:
        return 2

    @property
    def shape(self) -> tuple:
        """(rows, cols). The row count is an eager job — Mars keeps a
        lazy nan-shaped tileable; an eager count is the Spark-honest
        form (one codegen'd count aggregate)."""
        return (self._sdf.count(), len(self.columns))

    @property
    def T(self) -> "DataFrame":
        """transpose() with its explicit driver-side row guard."""
        return self.transpose()

    def copy(self, deep: bool = True) -> "DataFrame":
        """Plans are immutable — a copy is a new handle on the same
        plan, insulating the original from in-place ``__setitem__``
        (Mars copies the tileable node the same way; no data moves)."""
        return DataFrame(self._sdf, self._index, seq=self._seq,
                         seq_dirty=self._seq_dirty)

    def pop(self, column: str) -> "Series":
        """pandas df.pop: return the column bound to a snapshot of the
        current plan, then drop it from this frame in place."""
        snapshot = self.copy()
        out = Series(snapshot, F.col(column), column)
        self._sdf = self._sdf.drop(column)
        self._drop_range_shadow()
        return out

    @property
    def loc(self) -> _LocIndexer:
        return _LocIndexer(self)

    @property
    def iloc(self) -> _ILocIndexer:
        return _ILocIndexer(self)

    @property
    def at(self) -> "_AtIndexer":
        """mars/dataframe/indexing/at.py — single cell by (label,
        column); returns the scalar (eager single-row job)."""
        return _AtIndexer(self, positional=False)

    @property
    def iat(self) -> "_AtIndexer":
        """mars/dataframe/indexing/iat.py — single cell by (position,
        column offset)."""
        return _AtIndexer(self, positional=True)

    def set_axis(self, labels, axis: int | str = 1) -> "DataFrame":
        """mars/dataframe/indexing/set_axis.py — replace the column
        labels (axis=1; the only distributed-cheap form — row-axis
        relabeling requires a full index rewrite, use set_index)."""
        if axis in (0, "index"):
            raise NotImplementedError(
                "set_axis(axis=0): relabel rows via set_index / "
                "set_sequence_index")
        cols = self.columns
        labels = list(labels)
        if len(labels) != len(cols):
            raise ValueError(
                f"set_axis: {len(labels)} labels for {len(cols)} columns")
        return self.rename(columns=dict(zip(cols, labels)))

    def _require_index(self, what: str) -> str:
        if len(self._index) != 1:
            raise NotImplementedError(
                f"{what} needs a single-column index (set_index first)")
        return self._index[0]

    def _label_cond(self, labels) -> Column:
        """Filter condition for index label(s); composite (MultiIndex)
        labels are tuples matched across every index column
        (reference: mars/dataframe/core.py:275 carries MultiIndex
        through loc/reindex/drop). A list is a set of labels; for a
        multi-column index each list element is one tuple."""
        idx = self._index
        if not idx:
            raise NotImplementedError(
                "label selection needs an index (set_index first)")
        if len(idx) == 1:
            if isinstance(labels, (list, tuple)):
                return F.col(idx[0]).isin(list(labels))
            return F.col(idx[0]) == F.lit(labels)

        def one(lbl):
            if not isinstance(lbl, (tuple, list)) or len(lbl) != len(idx):
                raise ValueError(
                    f"composite label {lbl!r} must have {len(idx)} parts "
                    f"(index: {idx})")
            c = F.lit(True)
            for col, v in zip(idx, lbl):
                c = c & (F.col(col) == F.lit(v))
            return c

        if isinstance(labels, list):
            cond = F.lit(False)
            for lbl in labels:
                cond = cond | one(lbl)
            return cond
        return one(labels)

    def __repr__(self):
        return f"DataFrame(columns={self._sdf.columns}, index={self._index})"

    def __len__(self):
        return self._sdf.count()

    def __getattr__(self, name: str):
        if not name.startswith("_") and name in self._sdf.columns:
            return Series(self, F.col(name), name)
        raise AttributeError(name)

    def __getitem__(self, key):
        # df[col] → Series; df[[cols]] → projection; df[mask] → filter
        # Reference: mars/dataframe/indexing/getitem.py:44,266
        if isinstance(key, str):
            return Series(self, F.col(key), key)
        if isinstance(key, Series):
            return DataFrame(self._sdf.filter(key._col), self._index)
        if isinstance(key, (list, tuple)):
            cols = [F.col(c) for c in self._index] + [F.col(c) for c in key]
            return DataFrame(self._sdf.select(*cols), self._index)
        raise TypeError(f"invalid getitem key: {type(key)}")

    def __setitem__(self, key: str, value):
        # Reference: mars/dataframe/indexing/setitem.py:35 → withColumn
        if isinstance(value, Series):
            origin_sdf = getattr(value._frame, "_origin_sdf", None)
            if value._frame is not self:
                if origin_sdf is self._sdf:
                    # the value rides a row-preserving extension of
                    # this frame's CURRENT plan (e.g. Series.rank's
                    # stats join): adopt the extended plan, keeping
                    # exactly this frame's columns plus the assigned
                    # one. Keyed on plan identity — if this frame was
                    # mutated after the extension was produced, the
                    # captured plan no longer matches and we align
                    # instead (adoption would revert the mutation).
                    base = value._frame._sdf.withColumn(key, value._col)
                    cols = [c for c in self._sdf.columns
                            if c != key] + [key]
                    self._sdf = base.select(*cols)
                    self._drop_range_shadow()
                    return
                if origin_sdf is not None:
                    # rides an extension of some OTHER plan: align on
                    # the index. Plain Series from a derived frame
                    # (projection/filter of this one) fall through to
                    # name resolution, which is correct for any
                    # row-preserving derivation.
                    self._setitem_aligned(key, value)
                    return
            col = value._col
        elif isinstance(value, Column):
            col = value
        else:
            col = F.lit(value)
        self._sdf = self._sdf.withColumn(key, col)
        self._carry_range_shadow(key, col)

    def _carry_range_shadow(self, key: str, col) -> None:
        """Keep the ungrouped-window chain token (see
        operators/window._range_partitioned) alive through a plain
        in-place column assignment: the same expression extends the
        shadow plan, so a following ungrouped op still reuses the
        clustered layout. Dropped when the assignment could diverge
        between the two plans (an order column overwrite, or a
        non-deterministic expression evaluated independently)."""
        tok = getattr(self, "_range_layout", None)
        if tok is None:
            return
        shadow = tok[1]
        if shadow is not None and key not in tok[0]:
            # Spark 4 removed Column.expr(), so determinism must be
            # read off the ANALYZED extension (the unresolved
            # ColumnNode reports UnresolvedFunction children as
            # deterministic regardless of the function). Two guards:
            # the extension must stay a pure Project over the shadow
            # (a Window/generator between them could hide
            # non-determinism behind an AttributeReference), and every
            # resolved project entry named ``key`` must be
            # deterministic.
            try:
                ext = shadow.withColumn(key, col)
                qe = ext._jdf.queryExecution().analyzed()
                # the shadow's analyzed plan only changes when the
                # shadow does — cache it on the DataFrame so an
                # assignment-heavy loop pays ONE analysis round-trip
                # per assignment (the extension), not two (r15,
                # advisor item)
                base = getattr(shadow, "_ms_analyzed", None)
                if base is None:
                    base = shadow._jdf.queryExecution().analyzed()
                    shadow._ms_analyzed = base
                ok = (qe.children().size() == 1
                      and qe.children().apply(0).sameResult(base))
                if ok:
                    exprs = qe.expressions()
                    seen = False
                    for i in range(exprs.size()):
                        e = exprs.apply(i)
                        if e.name() == key:
                            seen = True
                            ok = ok and e.deterministic()
                    ok = ok and seen
                if ok:
                    ext._ms_analyzed = qe
                shadow = ext if ok else None
            except Exception:
                shadow = None
        else:
            shadow = None
        self._range_layout = (tok[0], shadow, tok[2], tok[3])

    def _drop_range_shadow(self) -> None:
        """Invalidate the chain token's reusable shadow (keeps cache
        ownership so the finalizer still fires on GC)."""
        tok = getattr(self, "_range_layout", None)
        if tok is not None and tok[1] is not None:
            self._range_layout = (tok[0], None, tok[2], tok[3])

    def _setitem_aligned(self, key: str, value) -> None:
        """Assignment of a Series from another frame (or from a stale
        extension of this frame's plan): align on the index — a left
        join, the distributed form of pandas' df[k] = s reindexing
        (unmatched rows get null; extra value rows drop). Requires an
        index on both frames, like all cross-frame ops (align.py)."""
        from mars_spark.operators.align import _index_of

        li = _index_of(self, "cross-frame setitem")
        ri = _index_of(value._frame, "cross-frame setitem")
        if len(li) != len(ri):
            raise ValueError(f"index arity mismatch: {li} vs {ri}")
        vsdf = value._frame._sdf.select(
            *[F.col(a).alias(b) for a, b in zip(ri, li)],
            value._col.alias("__setitem_v"),
        )
        # pandas contract: a duplicated value index raises ('cannot
        # reindex from a duplicate axis') rather than silently
        # multiplying target rows through the join. Enforced in-plan via
        # raise_error over a per-key window — no extra driver job, and
        # the window's shuffle on the index is the same exchange the
        # join needs anyway.
        from pyspark.sql import Window

        dup = F.count(F.lit(1)).over(Window.partitionBy(*li))
        vsdf = vsdf.select(
            *li,
            F.when(dup > 1, F.raise_error(
                "cannot reindex from a duplicate axis"))
            .otherwise(F.col("__setitem_v")).alias("__setitem_v"),
        )
        cols = [c for c in self._sdf.columns if c != key]
        joined = self._sdf.select(*cols).join(vsdf, on=li, how="left")
        self._sdf = joined.select(*cols, F.col("__setitem_v").alias(key))
        self._drop_range_shadow()

    # ------------------------------------------------------- projections
    def assign(self, **kwargs) -> "DataFrame":
        # delegate to __setitem__ on a shallow copy so extension-plan
        # adoption (rank etc.) and cross-frame alignment work the same
        # whether a column arrives via assign or via df[k] = v
        out = DataFrame(self._sdf, self._index, seq=self._seq,
                        seq_dirty=self._seq_dirty)
        for name, value in kwargs.items():
            out[name] = value
        return out

    def withColumn(self, name: str, value) -> "DataFrame":
        return self.assign(**{name: value})

    def select(self, *cols) -> "DataFrame":
        return self[list(cols)]

    def drop(self, columns=None, labels=None, axis=1,
             index=None) -> "DataFrame":
        """mars/dataframe/base/drop.py:29. axis=1 (or columns=) drops
        columns; axis=0 with labels/index= drops ROWS whose index-column
        value matches — a Catalyst NOT-IN filter (partition-prunable),
        the distributed form of pandas label drops."""
        if axis == 0 or index is not None:
            rows = index if index is not None else labels
            return DataFrame(
                self._sdf.filter(~self._label_cond(rows)), self._index,
                seq=self._seq, seq_dirty=True)
        cols = columns if columns is not None else labels
        if isinstance(cols, str):
            cols = [cols]
        return DataFrame(self._sdf.drop(*cols), self._index)

    def rename(self, columns: dict | None = None) -> "DataFrame":
        """mars/dataframe/indexing/rename.py:26"""
        sdf = self._sdf
        for old, new in (columns or {}).items():
            sdf = sdf.withColumnRenamed(old, new)
        index = [columns.get(c, c) if columns else c for c in self._index]
        return DataFrame(sdf, index)

    def rename_axis(self, mapper) -> "DataFrame":
        """mars/dataframe/indexing/rename_axis.py — rename the (single)
        index column."""
        idx = self._require_index("rename_axis")
        return DataFrame(self._sdf.withColumnRenamed(idx, mapper),
                         index=[mapper], seq=mapper if self._seq == idx
                         else self._seq, seq_dirty=self._seq_dirty)

    def insert(self, loc: int, column: str, value) -> None:
        """mars/dataframe/indexing/insert.py — positional column
        insert (in-place, pandas contract). Column order is metadata
        in Spark; the select re-projects, no data movement."""
        col = value._col if isinstance(value, Series) else (
            value if isinstance(value, Column) else F.lit(value))
        cols = list(self.columns)
        cols.insert(loc, column)
        sdf = self._sdf.withColumn(column, col)
        self._sdf = sdf.select(*self._index,
                               *[F.col(c) for c in cols])
        self._drop_range_shadow()

    def astype(self, dtypes: dict | str) -> "DataFrame":
        sdf = self._sdf
        if isinstance(dtypes, dict):
            for c, t in dtypes.items():
                sdf = sdf.withColumn(c, F.col(c).cast(_dtype_to_spark(t)))
        else:
            for c in self.columns:
                sdf = sdf.withColumn(c, F.col(c).cast(_dtype_to_spark(dtypes)))
        return DataFrame(sdf, self._index)

    # ------------------------------------------------------------ filters
    def query(self, expr: str) -> "DataFrame":
        """mars/dataframe/base/eval.py:690 (df.query): Mars parses the
        expression with a Python AST visitor and re-executes via
        numexpr; Spark-first this is just a SQL predicate that Catalyst
        compiles into codegen."""
        return DataFrame(self._sdf.filter(expr), self._index)

    def eval(self, expr: str) -> Series:
        """mars/dataframe/base/eval.py:263 → F.expr"""
        return Series(self, F.expr(expr), expr)

    def filter(self, cond) -> "DataFrame":
        cond = cond._col if isinstance(cond, Series) else cond
        return DataFrame(self._sdf.filter(cond), self._index)

    def where(self, cond, other=None) -> "DataFrame":
        """mars/dataframe/indexing/where.py:28 applied to every column."""
        cond_col = cond._col if isinstance(cond, Series) else cond
        sdf = self._sdf
        for c in self.columns:
            sdf = sdf.withColumn(
                c, F.when(cond_col, F.col(c)).otherwise(F.lit(other))
            )
        return DataFrame(sdf, self._index)

    def mask(self, cond, other=None) -> "DataFrame":
        cond_col = cond._col if isinstance(cond, Series) else cond
        return self.where(Series(self, ~cond_col), other)

    def isin(self, values) -> "DataFrame":
        sdf = self._sdf.select(
            *[F.col(c) for c in self._index],
            *[F.col(c).isin(list(values)).alias(c) for c in self.columns],
        )
        return DataFrame(sdf, self._index)

    # ------------------------------------------------------ missing data
    def dropna(self, how="any", subset=None, thresh=None) -> "DataFrame":
        """mars/dataframe/missing/dropna.py:33 → DataFrameNaFunctions"""
        return DataFrame(
            self._sdf.dropna(how=how, thresh=thresh, subset=subset), self._index
        )

    def fillna(self, value) -> "DataFrame":
        """mars/dataframe/missing/fillna.py:36 (scalar/dict; ffill/bfill
        live in operators.window — they need an ordering)."""
        return DataFrame(self._sdf.fillna(value), self._index)

    def replace(self, to_replace, value=None) -> "DataFrame":
        """mars/dataframe/missing/replace.py:38"""
        return DataFrame(self._sdf.replace(to_replace, value), self._index)

    def isna(self) -> "DataFrame":
        sdf = self._sdf.select(
            *[F.col(c) for c in self._index],
            *[F.col(c).isNull().alias(c) for c in self.columns],
        )
        return DataFrame(sdf, self._index)

    def notna(self) -> "DataFrame":
        sdf = self._sdf.select(
            *[F.col(c) for c in self._index],
            *[F.col(c).isNotNull().alias(c) for c in self.columns],
        )
        return DataFrame(sdf, self._index)

    # ---------------------------------------------------------- groupby
    def groupby(self, by=None, level=None, as_index: bool = True,
                sort: bool = False):
        """mars/dataframe/groupby/core.py — ``level=`` groups by index
        column(s): positions resolve against the (Multi)Index column
        list, names pass through."""
        from mars_spark.core.groupby import GroupBy

        if by is None:
            if level is None:
                raise TypeError("groupby needs 'by' or 'level'")
            levels = level if isinstance(level, (list, tuple)) else [level]
            keys = [self._index[lv] if isinstance(lv, int) else lv
                    for lv in levels]
        else:
            keys = [by] if isinstance(by, str) else list(by)
        return GroupBy(self, keys, as_index=as_index, sort=sort)

    def cube(self, *cols) -> "GroupBy":
        """Aggregate every subset of the grouping keys in ONE shuffle
        (SURVEY §2.4: pandas/Mars have no cube — Spark gives it free;
        null key = the 'all' stratum, as in SQL GROUPING SETS)."""
        from mars_spark.core.groupby import GroupBy

        return GroupBy(self, list(cols), as_index=False, kind="cube")

    def rollup(self, *cols) -> "GroupBy":
        """Hierarchical prefix aggregates of the keys, one shuffle."""
        from mars_spark.core.groupby import GroupBy

        return GroupBy(self, list(cols), as_index=False, kind="rollup")

    def agg(self, arg=None, **named) -> "DataFrame":
        """Frame-wide aggregation (mars/dataframe/reduction/aggregation.py:86).
        Catalyst plans the partial/final split that Mars's
        ReductionCompiler builds by hand (reduction/core.py:790)."""
        from mars_spark.core.groupby import build_agg_exprs

        exprs, _ = build_agg_exprs(arg, named, self.columns)
        return DataFrame(self._sdf.agg(*exprs))

    # ------------------------------------------------------------- joins
    def merge(self, right: "DataFrame", how: str = "inner", on=None,
              left_on=None, right_on=None, suffixes=("_x", "_y"),
              broadcast: bool | None = None,
              indicator: bool | str = False,
              null_matches: bool = True) -> "DataFrame":
        from mars_spark.operators.merge import merge as _merge

        return _merge(self, right, how=how, on=on, left_on=left_on,
                      right_on=right_on, suffixes=suffixes,
                      broadcast=broadcast, indicator=indicator,
                      null_matches=null_matches)

    def join(self, right: "DataFrame", on=None, how: str = "left",
             lsuffix: str = "", rsuffix: str = "") -> "DataFrame":
        suffixes = (lsuffix or "_x", rsuffix or "_y")
        return self.merge(right, how=how, on=on, suffixes=suffixes)

    def crossJoin(self, right: "DataFrame") -> "DataFrame":
        return DataFrame(self._sdf.crossJoin(right._sdf))

    # ------------------------------------------------------------- sorts
    def sort_values(self, by, ascending=True, na_position="last") -> "DataFrame":
        """mars/dataframe/sort/sort_values.py:29. Mars implements PSRS
        by hand; Spark's orderBy IS sample-based range partitioning
        (RangePartitioner) — same algorithm, built-in."""
        by = [by] if isinstance(by, str) else list(by)
        if isinstance(ascending, bool):
            ascending = [ascending] * len(by)
        cols = []
        for c, asc in zip(by, ascending):
            col = F.col(c)
            if asc:
                col = col.asc_nulls_last() if na_position == "last" else col.asc_nulls_first()
            else:
                col = col.desc_nulls_last() if na_position == "last" else col.desc_nulls_first()
            cols.append(col)
        return DataFrame(self._sdf.orderBy(*cols), self._index)

    def sort_index(self, ascending=True, level=None) -> "DataFrame":
        """mars/dataframe/sort/sort_index.py:34. ``level=`` sorts by the
        chosen (Multi)Index level(s) first — positions or names — then
        the remaining levels, pandas-style."""
        if not self._index:
            return self
        by = self._index
        if level is not None:
            levels = level if isinstance(level, (list, tuple)) else [level]
            chosen = [self._index[lv] if isinstance(lv, int) else lv
                      for lv in levels]
            by = chosen + [c for c in self._index if c not in chosen]
        return self.sort_values(by, ascending=ascending)

    def swaplevel(self, i: int = -2, j: int = -1) -> "DataFrame":
        """mars/dataframe/core.py:275 (MultiIndex) — reorder index
        levels; plan-only, no shuffle."""
        idx = list(self._index)
        idx[i], idx[j] = idx[j], idx[i]
        return DataFrame(self._sdf, idx)

    def droplevel(self, level) -> "DataFrame":
        """Drop index level(s) by position or name; the dropped level
        returns to being invisible (column removed)."""
        levels = level if isinstance(level, (list, tuple)) else [level]
        names = {self._index[lv] if isinstance(lv, int) else lv
                 for lv in levels}
        keep = [c for c in self._index if c not in names]
        return DataFrame(self._sdf.drop(*names), keep)

    def head(self, n: int = 5) -> "DataFrame":
        """head-pushdown (mars/optimization/logical/common/head.py:30)
        is Catalyst's LimitPushDown — ``limit`` after orderBy plans as
        TakeOrderedAndProject (a distributed top-k, no full sort)."""
        return DataFrame(self._sdf.limit(n), self._index)

    def tail(self, n: int = 5) -> "DataFrame":
        """Last n rows in plan order (reference:
        mars/dataframe/indexing/iloc.py:823). Distributed: sequence
        index + one max(seq) agg + filter — no driver-side collect of
        data rows."""
        f = self._ensure_seq()
        out = f._sdf.filter(F.col(f._seq) >= f._seq_len() - n)
        if f._seq != self._seq:
            out = out.drop(f._seq)
        return DataFrame(out, self._index, seq=self._seq, seq_dirty=True)

    def nlargest(self, n: int, columns) -> "DataFrame":
        return self.sort_values(columns, ascending=False).head(n)

    def nsmallest(self, n: int, columns) -> "DataFrame":
        return self.sort_values(columns, ascending=True).head(n)

    def sample(self, frac: float = None, n: int = None, replace: bool = False,
               seed: int = None, weights=None) -> "DataFrame":
        """mars/dataframe/indexing/sample.py:41; exact-n sampling is a
        count-then-fraction two-pass like Mars's. ``weights`` (a column
        name or Series) samples without replacement proportional to the
        weight via the Efraimidis-Spirakis exponential-keys trick:
        key = rand^(1/w), keep the n largest keys — one pass, the top-n
        is TakeOrderedAndProject (per-partition heaps, no global sort,
        nothing through the driver)."""
        if n is None and frac is None:
            n = 1  # pandas default: one row
        if weights is not None:
            if replace:
                raise NotImplementedError("weighted sample with replace")
            from mars_spark.core.series import Series

            wcol = (F.col(weights) if isinstance(weights, str)
                    else weights._col if isinstance(weights, Series)
                    else weights)
            w = wcol.cast("double")
            # one bounded agg: validate weights (pandas raises on any
            # negative weight, and when fewer positive-weight rows
            # exist than the requested sample size) and get the total
            stats = self._sdf.agg(
                F.sum((w < 0).cast("long")).alias("__neg"),
                F.sum((w > 0).cast("long")).alias("__pos"),
                F.count(F.lit(1)).alias("__tot")).collect()[0]
            if stats["__neg"]:
                raise ValueError("weight vector may not include negative values")
            if n is None:
                n = int(round((frac or 0.0) * int(stats["__tot"])))
            if int(stats["__pos"] or 0) < n:
                raise ValueError("Fewer non-zero entries in p than size")
            # zero-weight rows → null key → sort last (never sampled
            # while positive-weight rows remain)
            r = F.rand(seed) if seed is not None else F.rand()
            key = F.when(w > 0, F.pow(r, F.try_divide(F.lit(1.0), w)))
            out = (self._sdf.withColumn("__wk", key)
                   .orderBy(F.desc_nulls_last("__wk")).limit(n).drop("__wk"))
            return DataFrame(out, self._index)
        if frac is None:
            if not replace:
                # exact-n without replacement: uniform random key +
                # top-n (TakeOrderedAndProject: per-partition heaps,
                # no global sort) — always returns exactly n rows,
                # unlike fraction-oversampling which can undershoot.
                # pandas contract: n > population without replacement
                # raises — proved with a bounded probe: limit(n) stops
                # scanning after n rows (CollectLimit early-exit), so
                # tiny n never pays a full-input count
                if self._sdf.limit(n).count() < n:
                    raise ValueError(
                        "Cannot take a larger sample than population "
                        "when 'replace=False'")
                r = F.rand(seed) if seed is not None else F.rand()
                out = (self._sdf.withColumn("__rk", r)
                       .orderBy("__rk").limit(n).drop("__rk"))
                return DataFrame(out, self._index)
            total = self._sdf.count()
            frac = min(1.0, (n / total) * 1.2 if total else 0.0)
            out = self._sdf.sample(withReplacement=replace, fraction=frac, seed=seed)
            return DataFrame(out.limit(n), self._index)
        return DataFrame(
            self._sdf.sample(withReplacement=replace, fraction=frac, seed=seed),
            self._index,
        )

    def limit(self, n: int) -> "DataFrame":
        return self.head(n)

    # ----------------------------------------------------------- dedup/set
    def drop_duplicates(self, subset=None, keep="first") -> "DataFrame":
        """mars/dataframe/base/drop_duplicates.py:35. keep=first/last on
        an unordered distributed frame needs a tie-break ordering: with
        a sequence index present the winner is the min/max-seq row per
        key (one window shuffle); without one, Spark's dropDuplicates
        picks an arbitrary winner (same rows-kept semantics)."""
        if keep not in ("first", "last", False):
            raise ValueError(keep)
        if keep is False:
            sub = subset or self.columns
            counts = self._sdf.groupBy(*sub).agg(F.count(F.lit(1)).alias("__n"))
            keep_keys = counts.filter(F.col("__n") == 1).drop("__n")
            return DataFrame(self._sdf.join(keep_keys, on=sub, how="leftsemi"),
                             self._index)
        if self._seq is not None:
            from pyspark.sql import Window

            sub = subset or self.columns
            order = (F.col(self._seq).asc() if keep == "first"
                     else F.col(self._seq).desc())
            w = Window.partitionBy(*sub).orderBy(order)
            out = (
                self._sdf.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            return DataFrame(out, self._index, seq=self._seq, seq_dirty=True)
        return DataFrame(self._sdf.dropDuplicates(subset=subset), self._index)

    def duplicated(self, subset=None) -> "DataFrame":
        """mars/dataframe/base/duplicated.py:25 → windowed count"""
        from pyspark.sql import Window

        sub = subset or self.columns
        w = Window.partitionBy(*sub)
        sdf = self._sdf.withColumn(
            "duplicated", F.count(F.lit(1)).over(w) > 1
        )
        return DataFrame(sdf, self._index)

    def value_counts(self, subset=None, ascending=False) -> "DataFrame":
        sub = subset or self.columns
        out = self._sdf.groupBy(*sub).agg(F.count(F.lit(1)).alias("count"))
        order = F.col("count").asc() if ascending else F.col("count").desc()
        return DataFrame(out.orderBy(order, *sub), index=list(sub))

    def union(self, other: "DataFrame") -> "DataFrame":
        return DataFrame(self._sdf.unionByName(other._sdf, allowMissingColumns=True),
                         self._index)

    append = union  # mars/dataframe/merge/append.py:32

    def intersect(self, other: "DataFrame") -> "DataFrame":
        return DataFrame(self._sdf.intersect(other._sdf), self._index)

    def exceptAll(self, other: "DataFrame") -> "DataFrame":
        return DataFrame(self._sdf.exceptAll(other._sdf), self._index)

    # ------------------------------------------------------------ windows
    def rolling(self, window: int, min_periods: int | None = None):
        from mars_spark.operators.window import Rolling

        return Rolling(self, window, min_periods=min_periods)

    def expanding(self, min_periods: int = 1):
        from mars_spark.operators.window import Expanding

        return Expanding(self, min_periods=min_periods)

    def resample(self, rule: str, on: str, by: list[str] | None = None):
        """pandas-style time resampling (additive — the reference has
        no resample; `mars/dataframe/tseries/` holds only
        to_datetime): ``df.resample("1h", on="ts").agg({"v": "sum"})``
        plans as a tumbling-window groupBy — map-side-combined, the
        same shape as the streaming hourly rollup. ``rule`` accepts
        pandas offsets with h/min/s/d units. Buckets are
        epoch-aligned; this coincides with pandas' default
        ``origin='start_day'`` only for rules whose period evenly
        divides 86400s (1h, 15min, 1d, ...) — a rule like ``7min``
        buckets differently from pandas. Optional ``by`` adds
        grouping keys next to the time bucket."""
        from mars_spark.operators.window import Resampler

        return Resampler(self, rule, on, by=by or [])

    def shift(self, periods: int = 1, order_by=None, partition_by=None) -> "DataFrame":
        from mars_spark.operators.window import shift

        return shift(self, periods, order_by=order_by, partition_by=partition_by)

    def diff(self, periods: int = 1, order_by=None, partition_by=None) -> "DataFrame":
        from mars_spark.operators.window import diff

        return diff(self, periods, order_by=order_by, partition_by=partition_by)

    def pct_change(self, periods: int = 1, order_by=None,
                   partition_by=None, cols=None) -> "DataFrame":
        """reference: mars/dataframe/base/pct_change.py — method form
        over operators/window.pct_change (col/lag(col) − 1).
        ``cols`` defaults to every numeric column."""
        from mars_spark.operators.window import pct_change

        if cols is None:
            # exact names + decimal(p,s): a prefix match on 'int'
            # would false-positive interval dtypes
            num = {"int", "bigint", "smallint", "tinyint", "double",
                   "float"}
            cols = [c for c, t in self._sdf.dtypes
                    if t in num or t.startswith("decimal")]
        return pct_change(self, periods, order_by=order_by,
                          partition_by=partition_by, cols=cols)

    def ewm(self, alpha: float, order_by=None, partition_by=None,
            adjust: bool = True, bias: bool = False):
        """reference: mars/dataframe/window/ewm/core.py — method form
        returning an EWM window object (``.mean(col)`` / ``.var`` /
        ``.std`` / ``.agg``) over operators/window.ewm_agg."""
        from mars_spark.operators.window import EWM

        return EWM(self, alpha, order_by=order_by,
                   partition_by=partition_by, adjust=adjust, bias=bias)

    # --------------------------------------------------------- reshaping
    def melt(self, id_vars=None, value_vars=None, var_name="variable",
             value_name="value") -> "DataFrame":
        """mars/dataframe/base/melt.py:27 → native Spark melt (3.4+)"""
        return DataFrame(
            self._sdf.melt(
                ids=id_vars or [], values=value_vars,
                variableColumnName=var_name, valueColumnName=value_name,
            ),
            self._index,
        )

    def explode(self, column: str) -> "DataFrame":
        """mars/dataframe/base/explode.py:27 → F.explode"""
        others = [c for c in self._sdf.columns if c != column]
        sdf = self._sdf.select(*others, F.explode(F.col(column)).alias(column))
        return DataFrame(sdf.select(*self._sdf.columns), self._index)

    def stack(self, dropna: bool = True) -> "DataFrame":
        """mars/dataframe/base/stack.py:29 — move the column axis into
        rows: (index, variable, value) long form via native melt; pandas
        drops missing values by default."""
        out = self.melt(id_vars=list(self._index),
                        value_vars=self.columns)
        if dropna:
            out = DataFrame(out._sdf.filter(F.col("value").isNotNull()),
                            out._index)
        return out

    def corr_matrix(self, cols=None, method: str = "pearson",
                    max_items: int = 20_000,
                    approx: bool = False) -> "DataFrame":
        """All-pairs correlation matrix (reference:
        mars/dataframe/statistics/corr.py:29 computes the full matrix;
        frame.corr(c1,c2) is the pairwise fast path). pearson: ONE
        distributed agg pass computes every pairwise corr; the k×k
        scalar result is reshaped driver-side (bounded by column
        count, not rows). spearman: when no column has nulls, each
        column is replaced by its average-method rank (k rank passes)
        and the same one-agg pearson matrix runs on the ranked frame;
        with nulls present, pairwise-complete ranks for ALL pairs
        come from one multi-weight prefix pass per column + ONE
        aggregate (operators/corr.spearman_matrix_nulls — O(k) jobs,
        not k²). kendall: per-pair by nature (the weighted
        concordance count is pair-specific); ``max_items`` bounds
        each pair's distinct-value join and ``approx=True`` switches
        oversize pairs to the deterministic rank-binned tau."""
        if method not in ("pearson", "spearman", "kendall"):
            raise ValueError(f"corr_matrix: unknown method {method!r}")
        cols = list(cols) if cols else [
            c for c, t in self._sdf.dtypes
            if c in self.columns and t in (
                "double", "float", "int", "bigint", "smallint", "tinyint")]
        if method != "pearson":
            return self._rank_corr_matrix(cols, method,
                                          max_items=max_items,
                                          approx=approx)
        # manual pair-complete pearson with try_divide, NOT F.corr:
        # under ANSI one zero-variance pair aborts the whole agg with
        # DIVIDE_BY_ZERO; try_divide yields null → NaN for just that
        # entry (pandas parity: constant / <2-valid columns are NaN,
        # including their own diagonal)
        exprs = []
        for i, a in enumerate(cols):
            for b in cols[i:]:
                if a == b:
                    va = F.var_pop(F.col(a).cast("double"))
                    exprs.append(F.try_divide(va, va)
                                 .alias(f"{a}__{b}"))
                    continue
                both = F.col(a).isNotNull() & F.col(b).isNotNull()
                xa = F.when(both, F.col(a).cast("double"))
                xb = F.when(both, F.col(b).cast("double"))
                exprs.append(F.try_divide(
                    F.covar_pop(xa, xb),
                    F.stddev_pop(xa) * F.stddev_pop(xb))
                    .alias(f"{a}__{b}"))
        row = self._sdf.agg(*exprs).collect()[0]
        vals = {}
        for i, a in enumerate(cols):
            for b in cols[i:]:
                v = row[f"{a}__{b}"]
                vals[(a, b)] = v
                vals[(b, a)] = v
        spark = self._sdf.sparkSession
        data = [(a, *[float(vals[(a, b)]) if vals[(a, b)] is not None
                      else None for b in cols]) for a in cols]
        schema = "col string, " + ", ".join(f"`{b}` double" for b in cols)
        return DataFrame(spark.createDataFrame(data, schema), index=["col"])

    def _rank_corr_matrix(self, cols: list[str], method: str,
                          max_items: int = 20_000,
                          approx: bool = False) -> "DataFrame":
        """spearman/kendall matrix body (see corr_matrix docstring)."""
        from mars_spark.operators.corr import (kendall_pair,
                                               spearman_matrix_nulls,
                                               spearman_matrix_ranks,
                                               spearman_pair)

        spark = self._sdf.sparkSession
        counts = self._sdf.agg(
            F.count(F.lit(1)).alias("__n_total__"),
            *[F.count(F.col(c)).alias(c) for c in cols]).collect()[0]
        n_total = int(counts["__n_total__"])
        valid = {c: int(counts[c] or 0) for c in cols}
        # pandas parity: a column with <2 valid observations has NaN
        # everywhere INCLUDING its own diagonal
        diag = {c: (1.0 if valid[c] >= 2 else float("nan"))
                for c in cols}
        if method == "spearman":
            if all(valid[c] == n_total for c in cols):
                ranked = spearman_matrix_ranks(
                    self._sdf.select(*cols), cols)
                out = DataFrame(ranked, index=[]).corr_matrix(
                    cols, method="pearson")
                if all(v >= 2 for v in valid.values()):
                    return out
            else:
                vals, _valid = spearman_matrix_nulls(self._sdf, cols)
                for a in cols:
                    vals[(a, a)] = diag[a]
                data = [(a, *[vals[(a, b)] for b in cols])
                        for a in cols]
                schema = ("col string, "
                          + ", ".join(f"`{b}` double" for b in cols))
                return DataFrame(spark.createDataFrame(data, schema),
                                 index=["col"])
        fn = (spearman_pair if method == "spearman"
              else lambda s, a, b: kendall_pair(
                  s, a, b, max_items=max_items, approx=approx))
        # each pair statistic is an independent sequence of driver
        # actions — submit them from a thread pool so the k(k-1)/2
        # pairs' stages interleave instead of serializing
        from concurrent.futures import ThreadPoolExecutor

        pairs = [(a, b) for i, a in enumerate(cols)
                 for b in cols[i + 1:]]
        vals = {(a, a): diag[a] for a in cols}
        if pairs:
            with ThreadPoolExecutor(
                    max_workers=min(8, len(pairs))) as ex:
                for (a, b), v in zip(pairs, ex.map(
                        lambda p: fn(self._sdf, p[0], p[1]), pairs)):
                    vals[(a, b)] = v
                    vals[(b, a)] = v
        data = [(a, *[vals[(a, b)] for b in cols]) for a in cols]
        schema = "col string, " + ", ".join(f"`{b}` double" for b in cols)
        return DataFrame(spark.createDataFrame(data, schema),
                         index=["col"])

    def pivot_table(self, index, columns, values, aggfunc="mean") -> "DataFrame":
        from mars_spark.core.groupby import _AGG_FUNCS

        idx = [index] if isinstance(index, str) else list(index)
        fn = _AGG_FUNCS[aggfunc]
        out = self._sdf.groupBy(*idx).pivot(columns).agg(fn(F.col(values)))
        return DataFrame(out, index=idx)

    # -------------------------------------------------------- index mgmt
    def set_index(self, keys) -> "DataFrame":
        keys = [keys] if isinstance(keys, str) else list(keys)
        return DataFrame(self._sdf, index=keys)

    def set_sequence_index(self, name: str = "index",
                           reliable: bool = False) -> "DataFrame":
        """Engine-managed distributed sequence index 0..n-1 in current
        plan order (reference: StandardizeRangeIndex,
        mars/dataframe/base/standardize_range_index.py:29; same
        prefix-sum scheme as pandas-on-Spark's distributed-sequence):
        monotonically_increasing_id packs (partition, position) into
        one long, a tiny per-partition count job feeds a driver-side
        prefix sum (#partitions rows — bounded), and the sequence is
        offset[partition] + position. No global sort, no
        single-partition window, no zipWithIndex plan break.

        The frame is snapshotted first (localCheckpoint): the id
        assignment must be identical between the count job and every
        downstream use. localCheckpoint rather than cache() so the
        executor-side blocks are released by the ContextCleaner as soon
        as the (often ephemeral — see _ensure_seq) frame is GC'd,
        instead of pinning a full copy of the dataset in executor
        memory for the session lifetime. After a sort_values on a
        total-order key the sequence equals the sort rank (range
        partitions are emitted in key order).

        Cluster caveat: localCheckpoint truncates lineage — its blocks
        live only on executors, so losing an executor makes downstream
        reads of this frame fail instead of recomputing. On a real
        cluster with preemptible nodes pass ``reliable=True`` (needs
        ``spark.sparkContext.setCheckpointDir`` set): the snapshot goes
        to the checkpoint filesystem and survives executor loss, at
        the cost of one write+read of the frame. The id-stability
        requirement (count job and downstream reads must see identical
        ids) is the same either way.
        """
        sdf = self._sdf.withColumn(
            "__mid", F.monotonically_increasing_id())
        sdf = sdf.checkpoint() if reliable else sdf.localCheckpoint()
        pid = F.shiftright(F.col("__mid"), 33)
        pos = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
        counts = (
            sdf.groupBy(pid.alias("__pid"))
            .agg(F.count(F.lit(1)).alias("__n"))
            .orderBy("__pid")
            .collect()
        )
        offsets: dict[int, int] = {}
        acc = 0
        for r in counts:
            offsets[int(r["__pid"])] = acc
            acc += int(r["__n"])
        if offsets:
            mapping = F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv])
            seq = (mapping[pid] + pos).cast("bigint")
        else:
            seq = F.lit(0).cast("bigint")
        out = sdf.select(
            seq.alias(name),
            *[c for c in self._sdf.columns],
        ).drop("__mid")
        res = DataFrame(out, index=[name], seq=name)
        # the prefix-sum job already produced the total row count —
        # tail()/negative iloc reuse it instead of running a max agg
        res._seq_total = acc
        return res

    def align(self, other: "DataFrame", join: str = "outer",
              fill_value=None):
        """pandas align → (left, right) on the union/intersection of
        indexes (reference: mars/dataframe/align.py:48)."""
        from mars_spark.operators.align import align_frames

        return align_frames(self, other, join=join, fill_value=fill_value)

    def reindex(self, index=None, fill_value=None) -> "DataFrame":
        """Conform to a new index label list (reference:
        mars/dataframe/indexing/reindex.py:49) — broadcast left join."""
        from mars_spark.operators.align import reindex as _reindex

        return _reindex(self, index, fill_value=fill_value)

    def _ensure_seq(self) -> "DataFrame":
        if self._seq is not None and not self._seq_dirty:
            return self
        # no sequence, or a stale (gappy) one after row filtering:
        # build a dense ephemeral sequence over the CURRENT plan order
        # (narrow filters preserve order, so this matches pandas'
        # position-after-slice semantics); pick a helper name that
        # can't collide with a stale engine column.
        name = "__seq__" if self._seq != "__seq__" else "__seq2__"
        return self.set_sequence_index(name)

    def _seq_len(self):
        """Row count: free when set_sequence_index recorded it, else
        one max(seq)+1 agg job."""
        total = getattr(self, "_seq_total", None)
        if total is not None:
            return F.lit(total)
        v = self._sdf.agg(F.max(F.col(self._seq)).alias("m")).collect()[0]["m"]
        return F.lit((v if v is not None else -1) + 1)

    def reset_index(self, drop: bool = False) -> "DataFrame":
        if drop:
            return DataFrame(self._sdf.drop(*self._index))
        return DataFrame(self._sdf)

    def rebalance(self, num_partitions: int | None = None) -> "DataFrame":
        """mars/dataframe/base/rebalance.py:25 → repartition (AQE
        coalesces automatically after shuffles; explicit only for
        output-file sizing)."""
        sdf = self._sdf.repartition(num_partitions) if num_partitions else self._sdf
        return DataFrame(sdf, self._index, seq=self._seq,
                         seq_dirty=self._seq_dirty)

    def repartition(self, n: int, *cols) -> "DataFrame":
        # rows are unchanged, so an existing sequence index stays a
        # valid logical order (physical layout no longer matches it —
        # exactly why rank(method='first') ties break on the seq)
        sdf = self._sdf.repartition(n, *cols) if cols else self._sdf.repartition(n)
        return DataFrame(sdf, self._index, seq=self._seq,
                         seq_dirty=self._seq_dirty)

    def memory_usage(self, deep: bool = False) -> dict:
        """mars/dataframe/base/memory_usage.py:34 — per-column byte
        estimate. On a distributed engine the honest number is the
        SERIALIZED working size, not a pandas heap size: fixed-width
        columns = width × rows; strings/binary (deep=True) = one
        distributed octet_length sum. One count job (+ one agg when
        deep) — bounded output, no collect of data."""
        widths = {"bigint": 8, "double": 8, "int": 4, "float": 4,
                  "smallint": 2, "tinyint": 1, "boolean": 1,
                  "date": 4, "timestamp": 8, "timestamp_ntz": 8}
        n = self._sdf.count()
        out, var_cols = {}, []
        for c, t in self._sdf.dtypes:
            if t in widths:
                out[c] = widths[t] * n
            elif t in ("string", "binary") and deep:
                var_cols.append(c)
            else:
                out[c] = None  # unknown/nested: no honest estimate
        if var_cols:
            row = self._sdf.agg(*[
                F.sum(F.octet_length(F.col(c))).alias(c)
                for c in var_cols]).collect()[0]
            for c in var_cols:
                out[c] = int(row[c] or 0)
        return out

    def add_prefix(self, prefix: str) -> "DataFrame":
        """mars/dataframe/base/add_prefix_suffix.py — metadata-only."""
        return self.rename(columns={c: prefix + c for c in self.columns})

    def add_suffix(self, suffix: str) -> "DataFrame":
        return self.rename(columns={c: c + suffix for c in self.columns})

    def clip(self, lower=None, upper=None) -> "DataFrame":
        """mars/dataframe/base/clip.py applied per numeric column."""
        sdf = self._sdf
        for c in self.columns:
            col = F.col(c)
            if lower is not None:
                col = F.greatest(col, F.lit(lower))
            if upper is not None:
                col = F.least(col, F.lit(upper))
            sdf = sdf.withColumn(c, col)
        return DataFrame(sdf, self._index)

    _DTYPE_FAMILIES = {
        "number": {"tinyint", "smallint", "int", "bigint", "float",
                   "double", "decimal"},
        "integer": {"tinyint", "smallint", "int", "bigint"},
        "int": {"tinyint", "smallint", "int", "bigint"},
        "floating": {"float", "double"},
        "float": {"float", "double"},
        "object": {"string"},
        "string": {"string"},
        "str": {"string"},
        "bool": {"boolean"},
        "boolean": {"boolean"},
        "datetime": {"timestamp", "timestamp_ntz", "date"},
        "datetime64": {"timestamp", "timestamp_ntz", "date"},
    }

    def select_dtypes(self, include=None, exclude=None) -> "DataFrame":
        """mars/dataframe/base/select_dtypes.py (pandas parity) —
        subset columns by dtype family. Accepts pandas-style family
        names ('number', 'integer', 'floating', 'object', 'bool',
        'datetime') or exact Spark type names ('bigint', 'double',
        ...). Index columns always survive. Pure projection — column
        pruning reaches the scan."""
        def _norm(spec):
            if spec is None:
                return None
            items = [spec] if isinstance(spec, str) else list(spec)
            out: set[str] = set()
            for it in items:
                out |= self._DTYPE_FAMILIES.get(it, {it})
            return out

        inc, exc = _norm(include), _norm(exclude)
        if inc is None and exc is None:
            raise ValueError("at least one of include/exclude required")
        if inc is not None and exc is not None and inc & exc:
            raise ValueError("include and exclude overlap")

        def _base(t: str) -> str:
            return t.split("(")[0]  # decimal(10,2) -> decimal

        keep = []
        for c, t in self._sdf.dtypes:
            if c not in self.columns:
                continue
            b = _base(t)
            if inc is not None and b not in inc:
                continue
            if exc is not None and b in exc:
                continue
            keep.append(c)
        return DataFrame(self._sdf.select(*self._index, *keep),
                         self._index)

    def transpose(self, limit: int = 10_000) -> "DataFrame":
        """mars/dataframe/base/transpose.py (pandas ``df.T``) — via
        unpivot + pivot on the index labels. Only sensible when the
        frame has FEW rows (each input row becomes an output COLUMN):
        guarded by ``limit`` — a transpose of a billion-row frame is a
        billion-column schema and no engine's answer is 'yes'. Mixed
        dtypes surface as string columns (pandas produces object).
        The pivot receives the explicit label list (no extra distinct
        scan); labels keep input-row order."""
        idx = self._require_index("transpose")
        labels = [r[idx] for r in
                  self._sdf.select(idx).limit(limit + 1).collect()]
        if len(labels) > limit:
            raise ValueError(
                f"transpose: more than {limit} rows; each row becomes "
                "a column — raise `limit` only if you mean it")
        cols = [c for c in self.columns]
        melted = self._sdf.select(
            F.col(idx).cast("string").alias("__lbl"),
            *[F.col(c).cast("string").alias(c) for c in cols],
        ).melt(ids=["__lbl"], values=cols,
               variableColumnName="column", valueColumnName="__val")
        out = (melted.groupBy("column")
               .pivot("__lbl", [str(x) for x in labels])
               .agg(F.first("__val")))
        return DataFrame(out, ["column"])

    def round(self, decimals: int = 0) -> "DataFrame":
        sdf = self._sdf
        for c, t in self._sdf.dtypes:
            if c in self.columns and t in ("double", "float"):
                sdf = sdf.withColumn(c, F.round(F.col(c), decimals))
        return DataFrame(sdf, self._index)

    def abs(self) -> "DataFrame":
        sdf = self._sdf
        for c in self.columns:
            sdf = sdf.withColumn(c, F.abs(F.col(c)))
        return DataFrame(sdf, self._index)

    def nunique(self) -> dict:
        """Per-column exact distinct counts in ONE agg pass
        (mars/dataframe/reduction/nunique.py — Mars builds a
        drop-duplicates tree per column; countDistinct partials do the
        same map-side)."""
        row = self._sdf.agg(*[
            F.countDistinct(F.col(c)).alias(c) for c in self.columns
        ]).collect()[0]
        return {c: row[c] for c in self.columns}

    def _reduce_all(self, fn, numeric_only: bool = True) -> dict:
        num_types = ("double", "float", "int", "bigint", "smallint",
                     "tinyint", "decimal")
        cols = [c for c, t in self._sdf.dtypes
                if c in self.columns
                and (not numeric_only or t.startswith(num_types))]
        row = self._sdf.agg(*[fn(F.col(c)).alias(c) for c in cols]
                            ).collect()[0]
        return {c: row[c] for c in cols}

    def sum(self) -> dict:
        """Frame-wide per-column reductions (pandas df.sum() analog;
        mars/dataframe/reduction/sum.py) — one distributed agg."""
        return self._reduce_all(F.sum)

    def mean(self) -> dict:
        return self._reduce_all(F.avg)

    def min(self) -> dict:
        return self._reduce_all(F.min, numeric_only=False)

    def max(self) -> dict:
        return self._reduce_all(F.max, numeric_only=False)

    def std(self) -> dict:
        return self._reduce_all(F.stddev_samp)

    def var(self) -> dict:
        return self._reduce_all(F.var_samp)

    def prod(self) -> dict:
        """mars/dataframe/reduction/prod.py frame form — one agg."""
        return self._reduce_all(F.product)

    product = prod

    def sem(self, ddof: int = 1) -> dict:
        f = F.stddev_samp if ddof == 1 else F.stddev_pop
        return self._reduce_all(lambda c: f(c) / F.sqrt(F.count(c)))

    def skew(self, bias: bool = False) -> dict:
        """Frame form of Series.skew (pandas G1 correction) — one agg
        across every numeric column."""
        if bias:
            return self._reduce_all(F.skewness)

        def e(c):
            n = F.count(c).cast("double")
            return F.when(n > 2,
                          F.skewness(c) * F.sqrt(n * (n - 1)) / (n - 2))

        return self._reduce_all(e)

    def kurt(self, bias: bool = False) -> dict:
        if bias:
            return self._reduce_all(F.kurtosis)

        def e(c):
            n = F.count(c).cast("double")
            return F.when(n > 3, (n - 1) / ((n - 2) * (n - 3))
                          * ((n + 1) * F.kurtosis(c) + 6))

        return self._reduce_all(e)

    kurtosis = kurt

    def all(self) -> dict:
        """mars/dataframe/reduction/all.py frame form (pandas skipna:
        empty/all-null column → True)."""
        raw = self._reduce_all(lambda c: F.min(c.cast("boolean")),
                               numeric_only=False)
        return {c: (True if v is None else bool(v))
                for c, v in raw.items()}

    def any(self) -> dict:
        raw = self._reduce_all(lambda c: F.max(c.cast("boolean")),
                               numeric_only=False)
        return {c: (False if v is None else bool(v))
                for c, v in raw.items()}

    def corrwith(self, other: "DataFrame", method: str = "pearson",
                 max_items: int = 20_000, approx: bool = False):
        """pandas df.corrwith: per-common-column correlation after
        index alignment — pearson is ONE join + ONE agg for all
        columns; spearman/kendall reuse the joined frame and compute
        each column pair through operators/corr.py (rank statistics
        are pair-specific under pairwise-complete deletion, so they
        cannot fold into one agg). ``max_items``/``approx`` reach
        the kendall pair guard (see operators/corr.kendall_pair)."""
        if method not in ("pearson", "spearman", "kendall"):
            raise ValueError(f"corrwith: unknown method {method!r}")
        import pandas as pd

        j, common = self._aligned_join(other)
        num = ("double", "float", "int", "bigint", "smallint",
               "tinyint", "decimal")
        dt = dict(self._sdf.dtypes)
        cols = [c for c in common if dt[c].startswith(num)]
        if method == "pearson":
            row = j.agg(*[F.corr(F.col(f"__l_{c}"), F.col(f"__r_{c}"))
                          .alias(c) for c in cols]).collect()[0]
            return pd.Series({c: row[c] for c in cols})
        from mars_spark.operators.corr import kendall_pair, spearman_pair

        fn = (spearman_pair if method == "spearman"
              else lambda s, a, b: kendall_pair(
                  s, a, b, max_items=max_items, approx=approx))
        j = j.localCheckpoint()  # one snapshot feeds every pair pass
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(cols) or 1)) as ex:
            out = list(ex.map(
                lambda c: fn(j, f"__l_{c}", f"__r_{c}"), cols))
        return pd.Series(dict(zip(cols, out)))

    # ------------------------------------------------ frame arithmetic
    def _aligned_join(self, other: "DataFrame"):
        """Outer-join two frames on their index (the alignment every
        frame-level binop rides — reference mars/dataframe/align.py:48);
        returns (joined sdf with __l_/__r_ prefixed value columns,
        common column names)."""
        from mars_spark.operators.align import _index_of

        li = _index_of(self, "frame arithmetic")
        ri = _index_of(other, "frame arithmetic")
        if len(li) != len(ri):
            raise ValueError(f"index arity mismatch: {li} vs {ri}")
        lsel = self._sdf.select(
            *li, *[F.col(c).alias(f"__l_{c}") for c in self.columns])
        rsel = other._sdf.select(
            *[F.col(a).alias(b) for a, b in zip(ri, li)],
            *[F.col(c).alias(f"__r_{c}") for c in other.columns])
        common = [c for c in self.columns if c in set(other.columns)]
        return lsel.join(rsel, on=li, how="outer"), common

    def _frame_binop(self, other, op, fill_value=None, reverse=False):
        """pandas df.add/sub/…: scalars broadcast; engine frames align
        on the index (outer) and on the sorted union of columns, with
        the fill_value contract of Series._fill_binop (a cell missing
        from BOTH sides stays missing)."""
        if not isinstance(other, DataFrame):
            lit = F.lit(other)

            def one(c):
                left, right = F.col(c), lit
                if reverse:
                    left, right = right, left
                return op(left, right).alias(c)

            return DataFrame(
                self._sdf.select(*self._index,
                                 *[one(c) for c in self.columns]),
                self._index)
        from mars_spark.operators.align import _index_of

        li = _index_of(self, "frame arithmetic")
        j, _ = self._aligned_join(other)
        mine, theirs = set(self.columns), set(other.columns)
        out_cols = []
        for c in sorted(mine | theirs):
            left = F.col(f"__l_{c}") if c in mine else F.lit(None)
            right = F.col(f"__r_{c}") if c in theirs else F.lit(None)
            if reverse:
                left, right = right, left
            if fill_value is not None:
                lit = F.lit(fill_value)
                e = F.when(left.isNull() & right.isNull(), F.lit(None)) \
                    .otherwise(op(F.coalesce(left, lit),
                                  F.coalesce(right, lit)))
            else:
                e = op(left, right)
            out_cols.append(e.alias(c))
        return DataFrame(j.select(*li, *out_cols), list(li))

    def add(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.add, fill_value)

    def sub(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.sub, fill_value)

    def mul(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.mul, fill_value)

    def div(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.truediv, fill_value)

    truediv = div

    def floordiv(self, other, fill_value=None) -> "DataFrame":
        from mars_spark.core.series import _floordiv_cols

        return self._frame_binop(other, _floordiv_cols, fill_value)

    def mod(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.mod, fill_value)

    def pow(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.pow, fill_value)

    def radd(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.add, fill_value, reverse=True)

    def rsub(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.sub, fill_value, reverse=True)

    def rmul(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.mul, fill_value, reverse=True)

    def rdiv(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.truediv, fill_value,
                                 reverse=True)

    rtruediv = rdiv

    def rfloordiv(self, other, fill_value=None) -> "DataFrame":
        from mars_spark.core.series import _floordiv_cols

        return self._frame_binop(other, _floordiv_cols, fill_value,
                                 reverse=True)

    def rmod(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.mod, fill_value, reverse=True)

    def rpow(self, other, fill_value=None) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.pow, fill_value, reverse=True)

    def lt(self, other) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.lt)

    def gt(self, other) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.gt)

    def le(self, other) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.le)

    def ge(self, other) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.ge)

    def eq(self, other) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.eq)

    def ne(self, other) -> "DataFrame":
        import operator as _op

        return self._frame_binop(other, _op.ne)

    def dot(self, other) -> "Series":
        """mars/dataframe/arithmetic/dot.py frame form: frame · weight
        vector keyed by column name → per-row weighted sum. Weights
        (dict / pandas Series / single-index engine Series) are
        column-count-sized by contract, so they inline as literals —
        one narrow projection, no join."""
        import pandas as pd

        if isinstance(other, Series):
            idx = other._frame._index
            if len(idx) != 1:
                raise ValueError("dot: weight Series needs a single "
                                 "index of column labels")
            pdf = other._frame._sdf.select(
                F.col(idx[0]).alias("k"),
                other._col.alias("v")).toPandas()
            weights = dict(zip(pdf["k"], pdf["v"]))
        elif isinstance(other, pd.Series):
            weights = other.to_dict()
        elif isinstance(other, dict):
            weights = other
        else:
            raise TypeError("dot: expected dict / pandas Series / "
                            "engine Series of column weights")
        missing = [c for c in weights if c not in self.columns]
        if missing:
            raise ValueError(f"dot: unknown columns {missing}")
        if not weights:
            raise ValueError("dot: empty weight vector")
        expr = None
        for c, w in weights.items():
            term = F.col(c) * F.lit(float(w))
            expr = term if expr is None else expr + term
        out = DataFrame(self._sdf.withColumn("__dot", expr), self._index)
        out._origin_sdf = self._sdf
        return Series(out, F.col("__dot"), None)

    # ----------------------------------------------- fills / cum / apply
    def ffill(self, order_by=None, partition_by=None,
              cols=None) -> "DataFrame":
        """mars/dataframe/missing/fillna.py (method='ffill'):
        last(ignorenulls) over the running window. Order defaults to
        the engine's order carrier; without partition_by the fill is
        boundary-carry distributed over a range partitioning (r14) —
        no global single-partition window."""
        from pyspark.sql import Window

        from mars_spark.operators.window import (
            _order_cols, fill_directional_ungrouped)

        order = _order_cols(self, order_by)
        targets = cols or [x for x in self.columns if x not in order]
        if not partition_by:
            # r14: running last-non-null per bucket + a driver-carried
            # boundary value — no global window, and the prefix pass
            # reuses the bucket exchange (chain-aware, see
            # operators/window._range_partitioned)
            return fill_directional_ungrouped(
                self, order, targets, forward=True)
        w = (Window.partitionBy(*partition_by)
             .orderBy(*[F.col(c) for c in order])
             .rowsBetween(Window.unboundedPreceding, 0))
        sdf = self._sdf
        for c in targets:
            sdf = sdf.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w))
        return DataFrame(sdf, self._index)

    def bfill(self, order_by=None, partition_by=None,
              cols=None) -> "DataFrame":
        from pyspark.sql import Window

        from mars_spark.operators.window import (
            _order_cols, fill_directional_ungrouped)

        order = _order_cols(self, order_by)
        targets = cols or [x for x in self.columns if x not in order]
        if not partition_by:
            return fill_directional_ungrouped(
                self, order, targets, forward=False)
        w = (Window.partitionBy(*partition_by)
             .orderBy(*[F.col(c) for c in order])
             .rowsBetween(0, Window.unboundedFollowing))
        sdf = self._sdf
        for c in targets:
            sdf = sdf.withColumn(
                c, F.first(F.col(c), ignorenulls=True).over(w))
        return DataFrame(sdf, self._index)

    pad = ffill
    backfill = bfill

    def isnull(self) -> "DataFrame":
        return self.isna()

    def notnull(self) -> "DataFrame":
        return self.notna()

    def _cum_all(self, kind: str, order_by=None,
                 partition_by=None) -> "DataFrame":
        """Frame-wide running aggregates replacing each numeric column
        in place (pandas df.cumsum() semantics; the suffixing
        primitives live in operators/window.py). NaN rows stay NaN
        (pandas passthrough) while the running state skips them.
        Ungrouped (r14): per-range-partition prefixes + driver-carried
        subtotals instead of a global single-partition window."""
        from pyspark.sql import Window

        from mars_spark.operators.window import (_numeric_cols,
                                                 _order_cols,
                                                 _running_ungrouped)

        order = _order_cols(self, order_by)
        targets = [c for c in _numeric_cols(self) if c not in order]
        if not partition_by:
            run_kind = {"cumsum": "sum", "cumprod": "prod",
                        "cummin": "min", "cummax": "max"}[kind]
            return _running_ungrouped(self, order, targets,
                                      run_kind, "", gate_nonnull=True)
        w = (Window.partitionBy(*partition_by)
             .orderBy(*[F.col(c) for c in order])
             .rowsBetween(Window.unboundedPreceding, 0))
        fn = {"cumsum": F.sum, "cumprod": F.product,
              "cummin": F.min, "cummax": F.max}[kind]
        sdf = self._sdf
        for c in targets:
            sdf = sdf.withColumn(
                c, F.when(F.col(c).isNotNull(), fn(F.col(c)).over(w)))
        return DataFrame(sdf, self._index)

    def cumsum(self, order_by=None, partition_by=None) -> "DataFrame":
        return self._cum_all("cumsum", order_by, partition_by)

    def cumprod(self, order_by=None, partition_by=None) -> "DataFrame":
        return self._cum_all("cumprod", order_by, partition_by)

    def cummin(self, order_by=None, partition_by=None) -> "DataFrame":
        return self._cum_all("cummin", order_by, partition_by)

    def cummax(self, order_by=None, partition_by=None) -> "DataFrame":
        return self._cum_all("cummax", order_by, partition_by)

    def apply(self, func, axis=1, dtype: str | None = None, args=(),
              **kwds) -> "Series":
        """mars/dataframe/base/apply.py:69, the row-wise (axis=1) form:
        Arrow-batched mapInPandas running pandas' own row apply per
        batch. The result dtype is inferred by running ``func`` on a
        driver-side head sample (the reference infers by executing on
        mock data — base/apply.py) unless passed. axis=0 would need
        whole columns in one place — use agg / transform_batch.
        UDF-cost caveat (SURVEY §2.8): per-row Python; prefer Column
        expressions when the function is expressible."""
        if axis not in (1, "columns"):
            raise NotImplementedError("apply: axis=1 only")
        import pandas as pd

        cols = self.columns
        if dtype is None:
            head = self._sdf.select(*cols).limit(5).toPandas()
            if len(head):
                probe = head.apply(lambda r: func(r, *args, **kwds),
                                   axis=1)
                dtype = {"int64": "bigint", "int32": "int",
                         "float64": "double", "float32": "float",
                         "bool": "boolean", "object": "string"}.get(
                    str(probe.dtype), "double")
            else:
                dtype = "double"
        idx = list(self._index)
        dt = dict(self._sdf.dtypes)
        schema = ", ".join([f"`{c}` {dt[c]}" for c in idx]
                           + [f"`__apply` {dtype}"])

        def _run(batches):
            for pdf in batches:
                res = pdf[cols].apply(
                    lambda row: func(row, *args, **kwds), axis=1)
                out = pdf[idx].copy() if idx else pd.DataFrame(
                    index=pdf.index)
                out["__apply"] = res
                yield out

        nf = DataFrame(self._sdf.mapInPandas(_run, schema), self._index)
        return Series(nf, F.col("__apply"), None)

    def aggregate(self, arg=None, **named) -> "DataFrame":
        return self.agg(arg, **named)

    def transform(self, func) -> "DataFrame":
        """mars/dataframe/base/transform.py:39 — same-shape transform;
        rides transform_batch (Arrow-batched, schema-preserving)."""
        return self.transform_batch(func)

    def reindex_like(self, other: "DataFrame",
                     fill_value=None) -> "DataFrame":
        """Conform this frame's rows to ``other``'s index (the
        join='right' align)."""
        from mars_spark.operators.align import align_frames

        return align_frames(self, other, join="right",
                            fill_value=fill_value)[0]

    def hist(self, *args, **kwargs):
        """plot-accessor delegate (bounded collect — core/plotting.py)."""
        return self.plot(kind="hist", *args, **kwargs)

    def boxplot(self, *args, **kwargs):
        return self.plot(kind="box", *args, **kwargs)

    # ------------------------------------------------------- aggregates
    def describe(self, percentiles=(0.25, 0.5, 0.75)) -> "DataFrame":
        """mars/dataframe/base/describe.py:241 → summary()"""
        stats = ["count", "mean", "stddev", "min"] + [
            f"{int(p * 100)}%" for p in percentiles
        ] + ["max"]
        return DataFrame(self._sdf.summary(*stats))

    def count(self) -> int:
        return self._sdf.count()

    def nunique_rows(self) -> int:
        return self._sdf.distinct().count()

    def corr(self, c1: str, c2: str, method: str = "pearson",
             max_items: int = 20_000, approx: bool = False) -> float:
        """Pairwise correlation, pandas method set (reference
        mars/dataframe/statistics/corr.py:29): pearson stays Spark's
        one-agg stat.corr; spearman/kendall route through
        operators/corr.py (rank+pearson / weighted pair count).
        kendall on high-cardinality pairs: raise ``max_items`` or
        pass ``approx=True`` for the deterministic rank-binned tau
        (operators/corr.kendall_pair docstring)."""
        if method == "spearman":
            from mars_spark.operators.corr import spearman_pair

            return spearman_pair(self._sdf, c1, c2)
        if method == "kendall":
            from mars_spark.operators.corr import kendall_pair

            return kendall_pair(self._sdf, c1, c2,
                                max_items=max_items, approx=approx)
        try:
            return self._sdf.stat.corr(c1, c2, method)
        except Exception as e:  # ANSI: zero variance → NaN
            if "DIVIDE_BY_ZERO" not in str(e):
                raise
            return float("nan")

    def cov(self, c1: str, c2: str) -> float:
        return self._sdf.stat.cov(c1, c2)

    def quantile(self, cols, q, relative_error: float = 0.0):
        """Exact when relative_error=0 (approxQuantile contract:
        same element-returning rule, null/NaN ignored).

        The exact path does NOT use approxQuantile(err=0): Spark's
        Greenwald-Khanna sketch degenerates at zero error (every
        partition retains every sample — measured 152 s on a 60 M-row
        column at sf10 where the replacement takes ~5 s). Instead:
        one value-count shuffle (distinct-sized output), the
        range-partitioned prefix-sum machinery from operators/rank.py
        (no global window), and per-quantile "first value whose
        cumulative count reaches ceil(p*N)" — the element GK itself
        returns at err=0 (property-pinned in tests). Scales as a
        word-count job at 100 TB."""
        cols = [cols] if isinstance(cols, str) else list(cols)
        qs = [q] if isinstance(q, float) else list(q)
        if relative_error == 0.0:
            return [self._exact_quantiles(c, qs) for c in cols]
        return self._sdf.approxQuantile(cols, qs, relative_error)

    def _exact_quantiles(self, col: str, qs) -> list:
        import math

        from mars_spark.operators.rank import prefix_stats

        v = F.col(col).cast("double")
        per = (self._sdf.select(v.alias("__v"))
               .filter(F.col("__v").isNotNull() &
                       ~F.isnan(F.col("__v")))
               .groupBy("__v").agg(F.count(F.lit(1)).alias("__c")))
        stats, (total, _) = prefix_stats(per, "__v", "__c",
                                         with_total=True)
        if total == 0:
            return []          # approxQuantile contract on empty input
        aggs = [F.min(F.when(
                    F.col("__before") + F.col("__c")
                    >= max(1, math.ceil(p * total)), F.col("__v")))
                .alias(f"__q{i}") for i, p in enumerate(qs)]
        row = stats.agg(*aggs).collect()[0]
        return [float(row[i]) for i in range(len(qs))]

    # ----------------------------------------------------------- actions
    def to_pandas(self):
        return self._sdf.toPandas()

    @property
    def plot(self):
        """mars/dataframe/plotting/core.py:23 — bounded collect +
        ``pandas.DataFrame.plot`` delegate (see core/plotting.py for
        the explicit driver-side row bound)."""
        from mars_spark.core.plotting import PlotAccessor

        return PlotAccessor(self)

    def _plot_pandas(self, limit: int):
        # Order-sensitive plot kinds (line/area) render rows in
        # collected order, which Spark does not define — sort by the
        # engine's own order carrier (sequence index, else the label
        # index) before collecting, matching the reference's
        # order-preserving fetch.
        sdf = self._sdf
        if self._seq and not self._seq_dirty:
            sdf = sdf.orderBy(self._seq)
        elif self._index:
            sdf = sdf.orderBy(*self._index)
        pdf = sdf.limit(limit).toPandas()
        if self._index:
            pdf = pdf.set_index(self._index[0] if len(self._index) == 1
                                else list(self._index))
        if self._seq and self._seq in pdf.columns:
            pdf = pdf.drop(columns=[self._seq])
        return pdf

    def _iter_pandas_batches(self, batch_size: int):
        """pandas frames of ``batch_size`` rows, streamed — one
        partition at a time reaches the driver (toLocalIterator), so
        iteration over a 100 TB frame holds one batch in RAM, the
        same contract as the reference's batched fetch. Index columns
        (when set) become the pandas index; otherwise a running
        RangeIndex keeps positions globally consistent."""
        import pandas as pd

        cols = self._sdf.columns
        pos = 0

        def _mk(buf):
            nonlocal pos
            pdf = pd.DataFrame([r.asDict(recursive=True) for r in buf],
                               columns=cols)
            if self._index:
                pdf = pdf.set_index(
                    self._index[0] if len(self._index) == 1
                    else list(self._index))
            else:
                pdf.index = range(pos, pos + len(pdf))
            pos += len(pdf)
            return pdf

        buf: list = []
        for row in self._sdf.toLocalIterator(prefetchPartitions=True):
            buf.append(row)
            if len(buf) >= batch_size:
                yield _mk(buf)
                buf = []
        if buf:
            yield _mk(buf)

    def iterrows(self, batch_size: int = 1000):
        """reference: mars/dataframe/core.py:2229 — batched driver
        row iteration, yielding (label, pandas Series)."""
        for pdf in self._iter_pandas_batches(batch_size):
            yield from pdf.iterrows()

    def itertuples(self, index: bool = True, name: str = "Pandas",
                   batch_size: int = 1000):
        """reference: mars/dataframe/core.py:2233 — batched driver
        namedtuple iteration."""
        for pdf in self._iter_pandas_batches(batch_size):
            yield from pdf.itertuples(index=index, name=name)

    def to_dict(self, into=dict):
        """reference: mars/dataframe/core.py:1443 — the result is a
        fully-materialized dict either way, so this collects once
        (Arrow path) rather than batching the fetch."""
        pdf = self.to_pandas()
        if self._index:
            pdf = pdf.set_index(
                self._index[0] if len(self._index) == 1
                else list(self._index))
        return pdf.to_dict(into=into)

    def collect(self):
        return self._sdf.collect()

    def execute(self) -> "DataFrame":
        """Mars's .execute() triggers the graph (mars/session.py:444);
        here the nearest action-forcing equivalent is a count, with the
        plan staying lazy for downstream composition."""
        self._sdf.count()
        return self

    def cache(self) -> "DataFrame":
        self._sdf.cache()
        return self

    def persist(self, level=None) -> "DataFrame":
        from pyspark import StorageLevel

        self._sdf.persist(level or StorageLevel.MEMORY_AND_DISK)
        return self

    def explain(self, mode: str = "formatted"):
        return self._sdf.explain(mode=mode)

    # --------------------------------------------------- UDF escape hatches
    def map_in_pandas(self, func, schema) -> "DataFrame":
        """Per-partition pandas function (reference: DataFrameMapChunk
        mars/dataframe/base/map_chunk.py:51). Arrow-batched mapInPandas
        — THE escape hatch; everything expressible as columns should
        stay columns (10-100× faster, SURVEY.md 'UDFs are the slow
        path')."""
        return DataFrame(self._sdf.mapInPandas(func, schema=schema))

    map_chunk = map_in_pandas

    def apply_batch(self, func, schema) -> "DataFrame":
        """Row-batch apply (reference: DataFrameApply
        mars/dataframe/base/apply.py:69): ``func(pdf) -> pdf`` applied
        per Arrow batch."""
        def _gen(batches):
            for pdf in batches:
                yield func(pdf)

        return DataFrame(self._sdf.mapInPandas(_gen, schema=schema))

    def transform_batch(self, func) -> "DataFrame":
        """Same-schema transform (reference: DataFrameTransform
        mars/dataframe/base/transform.py:39)."""
        return self.apply_batch(func, schema=self._sdf.schema)

    def cartesian_chunk(self, other: "DataFrame", func, schema) -> "DataFrame":
        """Pairwise-partition product + pandas func (reference:
        mars/dataframe/base/cartesian_chunk.py:39) → crossJoin +
        mapInPandas."""
        joined = self._sdf.crossJoin(other._sdf)
        return DataFrame(joined.mapInPandas(func, schema=schema))

    # -------------------------------------------------------------- IO
    def to_parquet(self, path: str, mode: str = "overwrite", partition_by=None):
        """mars/dataframe/datastore/to_parquet.py:44 → df.write.parquet"""
        w = self._sdf.write.mode(mode)
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(path)

    def to_csv(self, path: str, mode: str = "overwrite", header: bool = True):
        """mars/dataframe/datastore/to_csv.py:41 → df.write.csv"""
        self._sdf.write.mode(mode).option("header", header).csv(path)

    def to_orc(self, path: str, mode: str = "overwrite"):
        self._sdf.write.mode(mode).orc(path)

    def to_json(self, path: str, mode: str = "overwrite"):
        self._sdf.write.mode(mode).json(path)

    def to_sql(self, table: str, url: str, mode: str = "append", properties=None):
        """mars/dataframe/datastore/to_sql.py:60 → df.write.jdbc"""
        self._sdf.write.jdbc(url=url, table=table, mode=mode,
                             properties=properties or {})
