"""Dask-on-engine shim (reference: mars/contrib/dask/ —
``mars_scheduler`` executes a dask task graph by turning each task
into a ``mars.remote.spawn`` node; ``convert_dask_collection`` maps a
dask collection onto Mars objects).

Spark-first translation: the dask GRAPH SPEC is plain Python (a dict
of ``key -> (callable, *args)`` tasks — no dask import needed to
execute one), so the scheduler runs it with the same leaves-first
wave scheduling as ``mars_spark.remote`` — ready tasks fan out on a
thread pool, dependency chains deeper than the pool cannot deadlock,
and any task whose callable drives engine frames does its heavy
lifting inside Spark actions. ``convert_dask_collection`` needs dask
itself (absent here — re-checked at call time) to produce the graph.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def _is_task(x) -> bool:
    # dask spec: a tuple whose head is callable IS a task
    return isinstance(x, tuple) and bool(x) and callable(x[0])


def _hashable(x) -> bool:
    try:
        hash(x)
    except TypeError:
        return False
    return True


def _keys_in(x, dsk, acc) -> None:
    if _is_task(x):
        for a in x[1:]:
            _keys_in(a, dsk, acc)
    elif isinstance(x, list):
        for a in x:
            _keys_in(a, dsk, acc)
    elif _hashable(x) and x in dsk:
        acc.add(x)


def _execute_task(x, results, dsk):
    if _is_task(x):
        return x[0](*[_execute_task(a, results, dsk) for a in x[1:]])
    if isinstance(x, list):
        return [_execute_task(a, results, dsk) for a in x]
    if _hashable(x) and x in results:
        return results[x]
    return x


def mars_scheduler(dsk: dict, keys):
    """dask ``get``-style entry point: execute the graph, return
    results in the (possibly nested) shape of ``keys``. Usable as
    ``collection.compute(scheduler=mars_scheduler)``."""
    deps: dict = {}
    for k, t in dsk.items():
        acc: set = set()
        _keys_in(t, dsk, acc)
        acc.discard(k)
        deps[k] = acc
    results: dict = {}
    pending = dict(deps)
    with ThreadPoolExecutor(max_workers=8) as pool:
        while pending:
            done = set(results)
            ready = [k for k, d in pending.items() if d <= done]
            if not ready:
                raise ValueError("cycle detected in dask graph")
            futs = {k: pool.submit(_execute_task, dsk[k], results, dsk)
                    for k in ready}
            for k, fut in futs.items():
                results[k] = fut.result()
            for k in ready:
                del pending[k]

    def unpack(ks):
        if isinstance(ks, list):
            return [unpack(k) for k in ks]
        return results[ks]

    return unpack(keys)


def convert_dask_collection(collection):
    """reference: mars/contrib/dask/converter.py — compute the dask
    collection through ``mars_scheduler`` and wrap pandas-shaped
    results as engine frames. Requires dask itself (re-checked at
    call time; absent in this environment)."""
    try:
        import dask  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "convert_dask_collection requires dask, which is not "
            "installed in this environment; mars_scheduler itself "
            "executes plain dask-spec graphs without it") from e
    import pandas as pd

    out = collection.compute(scheduler=mars_scheduler)
    from mars_spark.sources.io import from_pandas

    if isinstance(out, pd.DataFrame):
        return from_pandas(out)
    if isinstance(out, pd.Series):
        return from_pandas(out.to_frame())
    return out
