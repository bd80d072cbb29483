"""mars.remote.spawn facade — minimal driver-side task graph.

Reference parity: mars/remote/core.py:42,187 — Mars turns arbitrary
Python functions into graph nodes executed across the cluster. The
Spark-first stance (SURVEY.md §2.10): the DataFrame engine is the
scale path; ad-hoc function DAGs run on a driver thread pool, with
``parallel_map`` provided for data-parallel fanout through Spark when
the iterable is large.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable


class Spawned:
    """Lazy node: function + args (args may be other Spawned nodes)."""

    def __init__(self, func: Callable, args: tuple, kwargs: dict):
        self.func, self.args, self.kwargs = func, args, kwargs
        self._result: Any = None
        self._done = False

    def execute(self, pool: ThreadPoolExecutor | None = None) -> Any:
        if self._done:
            return self._result
        own_pool = pool is None
        pool = pool or ThreadPoolExecutor(max_workers=8)
        try:
            self._result = _resolve(self, pool)
            self._done = True
        finally:
            if own_pool:
                pool.shutdown()
        return self._result

    fetch = execute


def _resolve(node: Any, pool: ThreadPoolExecutor) -> Any:
    if not isinstance(node, Spawned):
        return node
    dep_futs = {
        i: pool.submit(_resolve, a, pool)
        for i, a in enumerate(node.args) if isinstance(a, Spawned)
    }
    args = [dep_futs[i].result() if i in dep_futs else a
            for i, a in enumerate(node.args)]
    kwargs = {k: _resolve(v, pool) for k, v in node.kwargs.items()}
    return node.func(*args, **kwargs)


def spawn(func: Callable, args: tuple = (), kwargs: dict | None = None) -> Spawned:
    """reference: mars/remote/core.py:187 (mars.remote.spawn)."""
    return Spawned(func, tuple(args), dict(kwargs or {}))


def execute(*nodes: Spawned) -> list[Any]:
    """Batch-execute a set of spawned nodes sharing one pool."""
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [pool.submit(_resolve, n, pool) for n in nodes]
        results = [f.result() for f in futs]
    for n, r in zip(nodes, results):
        n._result, n._done = r, True
    return results


def parallel_map(func: Callable, items: list, spark=None,
                 num_partitions: int | None = None) -> list:
    """Data-parallel map THROUGH Spark for large iterables — the scale
    path for spawn-style fanout (each item becomes a task; results
    collect to the driver)."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    sc = spark.sparkContext
    rdd = sc.parallelize(items, num_partitions or min(len(items), 64))
    return rdd.map(func).collect()
