"""ExecutableTuple (reference: mars/core — exported from
mars.dataframe): execute/fetch several lazy results as one unit.

Mars batches the tileables into a single graph submission; here every
object is already a lazy Catalyst plan, so "execute together" means
firing the collect actions CONCURRENTLY from one thread pool (the
engine's standard threaded-driver-actions idiom — one round of
scheduling latency instead of len(items))."""

from __future__ import annotations


class ExecutableTuple(tuple):
    def execute(self) -> "ExecutableTuple":
        return self

    def to_pandas(self, max_workers: int = 8) -> tuple:
        """Collect every element (engine frames/Series via their
        to_pandas; scalars pass through) concurrently."""
        from concurrent.futures import ThreadPoolExecutor

        def one(x):
            return x.to_pandas() if hasattr(x, "to_pandas") else x

        if len(self) <= 1:
            return tuple(one(x) for x in self)
        with ThreadPoolExecutor(
                max_workers=min(max_workers, len(self))) as ex:
            return tuple(ex.map(one, self))

    fetch = to_pandas
