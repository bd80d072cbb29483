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

    def _deps(self) -> list["Spawned"]:
        return [a for a in list(self.args) + list(self.kwargs.values())
                if isinstance(a, Spawned)]

    def _run(self) -> Any:
        args = [a._result if isinstance(a, Spawned) else a
                for a in self.args]
        kwargs = {k: (v._result if isinstance(v, Spawned) else v)
                  for k, v in self.kwargs.items()}
        self._result = self.func(*args, **kwargs)
        self._done = True
        return self._result

    def execute(self, pool: ThreadPoolExecutor | None = None) -> Any:
        if self._done:
            return self._result
        own_pool = pool is None
        pool = pool or ThreadPoolExecutor(max_workers=8)
        try:
            _run_graph([self], pool)
        finally:
            if own_pool:
                pool.shutdown()
        return self._result

    fetch = execute


def _topo(roots: list[Spawned]) -> list[Spawned]:
    """Post-order (children before parents), deduped by identity."""
    seen: set[int] = set()
    order: list[Spawned] = []
    stack: list[tuple[Spawned, bool]] = []
    for r in roots:
        if isinstance(r, Spawned) and id(r) not in seen:
            seen.add(id(r))
            stack.append((r, False))
    while stack:
        node, processed = stack.pop()
        if processed:
            order.append(node)
            continue
        stack.append((node, True))
        for dep in node._deps():
            if id(dep) not in seen:
                seen.add(id(dep))
                stack.append((dep, False))
    return order


def _run_graph(roots: list[Spawned], pool: ThreadPoolExecutor) -> None:
    """Leaves-first wave scheduling: only READY nodes (all deps done)
    are ever submitted, and only the caller blocks on futures — pool
    workers never wait on other tasks, so dependency chains deeper than
    the pool size cannot deadlock (the previous recursive scheme
    exhausted all workers with blocked parents)."""
    pending = [n for n in _topo(roots) if not n._done]
    while pending:
        ready = [n for n in pending
                 if all(d._done for d in n._deps())]
        if not ready:
            raise ValueError("cycle detected in spawned task graph")
        futs = [pool.submit(n._run) for n in ready]
        for f in futs:
            f.result()
        pending = [n for n in pending if not n._done]


def spawn(func: Callable, args: tuple = (), kwargs: dict | None = None) -> Spawned:
    """reference: mars/remote/core.py:187 (mars.remote.spawn)."""
    return Spawned(func, tuple(args), dict(kwargs or {}))


def execute(*nodes: Spawned) -> list[Any]:
    """Batch-execute a set of spawned nodes sharing one pool."""
    with ThreadPoolExecutor(max_workers=8) as pool:
        _run_graph(list(nodes), pool)
    return [n._result for n in nodes]


def run_script(code: str, data: dict | None = None,
               retrieve: list[str] | None = None) -> dict:
    """reference: mars/remote/run_script.py — execute a Python script
    with injected globals and return requested names. Mars ships the
    script to a worker; driver-side execution is the single-node
    equivalent (the DataFrame engine remains the scale path — scripts
    receive handles, not data copies)."""
    ns: dict = dict(data or {})
    exec(compile(code, "<run_script>", "exec"), ns)
    if retrieve is None:
        return {k: v for k, v in ns.items()
                if not k.startswith("__")}
    return {k: ns[k] for k in retrieve}


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
