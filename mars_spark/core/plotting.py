"""Plot accessor (reference: mars/dataframe/plotting/core.py:23 —
Mars' PlotAccessor executes the tileable, then delegates rendering to
``pandas.DataFrame.plot``; the distributed engine's only job is the
collect).

Spark-first: plotting is inherently a driver-side act on a BOUNDED
result, so the accessor makes the bound explicit — ``max_rows``
(default 100 000) is enforced with a ``limit(max_rows + 1)`` probe
(one bounded job, never a full-table count) and a clear error above
it. Aggregate, sample, or filter first to get under the bound; a
100 TB frame must never silently stream into the driver because
someone typed ``.plot()``. Rendering itself needs matplotlib — absent
in this container, pandas raises its own ImportError, which is passed
through untouched (the collect contract is what this engine owns and
tests).
"""

from __future__ import annotations

_KINDS = ("line", "bar", "barh", "hist", "box", "kde", "density",
          "area", "pie", "scatter", "hexbin")

DEFAULT_MAX_ROWS = 100_000


class PlotAccessor:
    """``df.plot(...)`` / ``df.plot.<kind>(...)`` for DataFrame and
    Series (the object passed in decides which pandas plot runs)."""

    def __init__(self, obj):
        self._obj = obj

    def _collect(self, max_rows: int):
        pdf = self._obj._plot_pandas(max_rows + 1)
        if len(pdf) > max_rows:
            raise ValueError(
                f"plot() collects to the driver; the frame has more "
                f"than max_rows={max_rows} rows. Aggregate, sample, "
                f"or filter first, or raise max_rows explicitly.")
        return pdf

    def __call__(self, kind: str = "line", *args,
                 max_rows: int = DEFAULT_MAX_ROWS, **kwargs):
        if kind not in _KINDS:
            raise ValueError(f"unknown plot kind {kind!r}; "
                             f"one of {_KINDS}")
        data = self._collect(max_rows)
        # positional args forward to pandas' plot (x, y, ... — the
        # pandas-standard df.plot.scatter("x", "y") form)
        return data.plot(*args, kind=kind, **kwargs)


def _gen(kind: str):
    def _inner(self, *args, max_rows: int = DEFAULT_MAX_ROWS, **kwargs):
        return self(kind, *args, max_rows=max_rows, **kwargs)
    _inner.__name__ = kind
    _inner.__doc__ = (f"Collect (bounded by max_rows) and render a "
                      f"pandas {kind!r} plot.")
    return _inner


for _k in _KINDS:
    setattr(PlotAccessor, _k, _gen(_k))
