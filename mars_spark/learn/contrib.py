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
    _hint = "pip install xgboost  # provides xgboost.spark.SparkXGBClassifier"

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
