"""CustomReduction: user-defined pre/agg/post reductions.

Reference: ``mars/dataframe/reduction/core.py:652-704`` — Mars's
``CustomReduction`` contract: ``pre(value)`` transforms a chunk's data
(optionally into a tuple of partials), ``agg(*values)`` combines
partials (applied per chunk and again tree-wise across chunks), and
``post(*values)`` finishes. Mars compiles this into its map→combine→
agg stages (``reduction/core.py:711-737``).

Spark-first mapping: the per-chunk stage is ``mapInPandas`` — each
Arrow batch runs ``pre``→``agg`` and emits one pickled partial row, so
only partial-sized data ever leaves an executor; the cross-chunk
combine concatenates the collected partials on the driver and runs
``agg`` once more, then ``post`` (exactly the final step of a
``treeAggregate``: partials are bounded by partition count, not data
size, so the driver hop is 100 TB-safe as long as the user's partials
are — the same contract Mars imposes).

The grouped form is ``GroupBy.agg_udf`` (``core/groupby.py``), which
rides Spark's grouped-agg pandas UDF instead.
"""

from __future__ import annotations

import pickle


class CustomReduction:
    """Subclass and override ``agg`` (and optionally ``pre``/``post``).

    ``pre(value)`` receives a pandas Series (one Arrow batch of the
    column) and may return any picklable partial or tuple of partials;
    ``agg(*values)`` must be MERGEABLE — it is applied both to a
    batch's ``pre`` output and to the concatenation of many batches'
    partials (mean therefore needs (sum, count) partials, exactly as
    in Mars); ``post(*values)`` finishes. ``__call__`` runs the whole
    contract locally on an in-memory pandas object (the reference's
    ``__call_agg__`` path)."""

    def __init__(self, name: str | None = None):
        self.name = name or "<custom>"

    @property
    def __name__(self):  # parity: reference exposes name this way
        return self.name

    def pre(self, value):
        return (value,)

    def agg(self, *values):
        raise NotImplementedError

    def post(self, *values):
        assert len(values) == 1
        return values[0]

    def __call__(self, value):
        r = self.pre(value)
        if not isinstance(r, tuple):
            r = (r,)
        r = self.agg(*r)
        if not isinstance(r, tuple):
            r = (r,)
        return self.post(*r)


def run_custom_reduction(series, reduction: CustomReduction):
    """Distributed pre→agg→post over an engine Series (see module
    docstring for the stage mapping)."""
    import sys

    import pandas as pd
    from pyspark import cloudpickle

    sdf = series._frame._sdf.select(series._col.alias("__v"))
    # ship the reduction BY VALUE: executors don't import the user's
    # module, so a by-reference pickle of the subclass fails with
    # ModuleNotFoundError (Mars ships it the same way —
    # reference core.py:705 __mars_tokenize__ uses cloudpickle)
    mod = sys.modules.get(type(reduction).__module__)
    if mod is not None and mod.__name__ not in ("builtins", __name__):
        try:
            cloudpickle.register_pickle_by_value(mod)
            payload = cloudpickle.dumps(reduction)
        finally:
            cloudpickle.unregister_pickle_by_value(mod)
    else:
        payload = cloudpickle.dumps(reduction)

    def _partial(batches):
        red = cloudpickle.loads(payload)
        for pdf in batches:
            r = red.pre(pdf["__v"])
            if not isinstance(r, tuple):
                r = (r,)
            r = red.agg(*r)
            if not isinstance(r, tuple):
                r = (r,)
            yield pd.DataFrame({"p": [pickle.dumps(r)]})

    rows = sdf.mapInPandas(_partial, "p binary").collect()
    partials = [pickle.loads(r["p"]) for r in rows]
    if not partials:
        # empty input: run the local contract on an empty column,
        # letting the user's reduction decide the empty semantics
        return reduction(pd.Series([], dtype="float64"))
    combined = []
    for j in range(len(partials[0])):
        vals = [p[j] for p in partials]
        if isinstance(vals[0], (pd.Series, pd.DataFrame)):
            combined.append(pd.concat(vals))
        else:
            combined.append(pd.Series(vals))
    r = reduction.agg(*combined)
    if not isinstance(r, tuple):
        r = (r,)
    return reduction.post(*r)
