"""Spark-native tree ensembles: gradient-boosted trees, random
forests, and single decision trees.

reference: mars/learn/contrib/xgboost/ and mars/learn/contrib/lightgbm/
hand the sharded dataset to the native libraries' own distributed
trainers; when those libraries are absent the reference has NO tree
trainer at all. This module is the Spark-first answer: MLlib's
distributed histogram-based tree learner (the same algorithmic family
as LightGBM's — quantile-binned features, per-split stats aggregated
map-side) already runs the full fit as Spark jobs, so the engine
wraps it in the repo's sklearn-shaped facade conventions instead of
bridging out. `contrib.XGBClassifier` et al. stay honest ImportError
stubs for the native libs; these classes are the in-repo trainer a
user actually runs.

100 TB design notes: MLlib trees aggregate per-node split statistics
with a treeAggregate over binned features — one pass over the data
per tree level, map-side combined, so the shuffled volume is
O(nodes × features × bins), independent of row count. Feature
binning (maxBins quantile sketch) is a single approxQuantile-style
pass. Nothing here collects rows to the driver; models (split trees)
are driver-held and broadcast for scoring, identical in shape to the
reference's per-chunk predict
(mars/learn/contrib/xgboost/predict.py).

Input convention matches learn.facade: a Spark or mars_spark
DataFrame, `features` as an array<numeric> column name or a list of
scalar columns, `label` a plain column name.
"""

from __future__ import annotations

from mars_spark.learn.facade import _sdf, _Wrapper, _with_features


class _TreeEnsemble(_Wrapper):
    """Shared fit/predict plumbing; subclasses name the MLlib
    estimator and the params it takes."""

    _drop_cols = ("__features",)

    def _estimator(self, fcol: str, label: str):
        raise NotImplementedError

    def fit(self, df, features, label: str):
        sdf, fcol = _with_features(_sdf(df), features)
        self.model_ = self._estimator(fcol, label).fit(sdf)
        self._features = features
        return self

    def predict(self, df, features=None):
        sdf, fcol = _with_features(_sdf(df), features or self._features)
        return self.model_.transform(sdf).drop(*self._drop_cols)

    @property
    def feature_importances_(self):
        """Impurity-based importances, normalized to sum 1 (the
        xgboost/lightgbm `feature_importances_` contract)."""
        return list(self.model_.featureImportances.toArray())


class GBTClassifier(_TreeEnsemble):
    """Binary gradient-boosted classifier (logistic loss).
    reference API shape: mars/learn/contrib/xgboost/classifier.py /
    lightgbm LGBMClassifier."""

    _drop_cols = ("__features", "rawPrediction", "probability")

    def __init__(self, n_estimators: int = 20, max_depth: int = 5,
                 learning_rate: float = 0.1, subsample: float = 1.0,
                 max_bins: int = 32, seed: int = 42):
        super().__init__(n_estimators=n_estimators, max_depth=max_depth,
                         learning_rate=learning_rate, subsample=subsample,
                         max_bins=max_bins, seed=seed)

    def _estimator(self, fcol: str, label: str):
        from pyspark.ml.classification import GBTClassifier as M

        p = self.params
        return M(featuresCol=fcol, labelCol=label,
                 maxIter=p["n_estimators"], maxDepth=p["max_depth"],
                 stepSize=p["learning_rate"],
                 subsamplingRate=p["subsample"], maxBins=p["max_bins"],
                 seed=p["seed"])


class GBTRegressor(_TreeEnsemble):
    """Gradient-boosted regressor (squared loss).
    reference API shape: mars/learn/contrib/xgboost/regressor.py."""

    def __init__(self, n_estimators: int = 20, max_depth: int = 5,
                 learning_rate: float = 0.1, subsample: float = 1.0,
                 max_bins: int = 32, seed: int = 42):
        super().__init__(n_estimators=n_estimators, max_depth=max_depth,
                         learning_rate=learning_rate, subsample=subsample,
                         max_bins=max_bins, seed=seed)

    def _estimator(self, fcol: str, label: str):
        from pyspark.ml.regression import GBTRegressor as M

        p = self.params
        return M(featuresCol=fcol, labelCol=label,
                 maxIter=p["n_estimators"], maxDepth=p["max_depth"],
                 stepSize=p["learning_rate"],
                 subsamplingRate=p["subsample"], maxBins=p["max_bins"],
                 seed=p["seed"])


class RandomForestClassifier(_TreeEnsemble):
    """Multiclass random forest. With ``bootstrap=False`` and
    ``feature_subset='all'`` a 1-tree forest degenerates to a plain
    decision tree — deterministic under any partition layout, which
    is what the driver contract stratum pins."""

    _drop_cols = ("__features", "rawPrediction", "probability")

    def __init__(self, n_estimators: int = 20, max_depth: int = 5,
                 feature_subset: str = "auto", bootstrap: bool = True,
                 max_bins: int = 32, seed: int = 42):
        super().__init__(n_estimators=n_estimators, max_depth=max_depth,
                         feature_subset=feature_subset,
                         bootstrap=bootstrap, max_bins=max_bins,
                         seed=seed)

    def _estimator(self, fcol: str, label: str):
        from pyspark.ml.classification import RandomForestClassifier as M

        p = self.params
        return M(featuresCol=fcol, labelCol=label,
                 numTrees=p["n_estimators"], maxDepth=p["max_depth"],
                 featureSubsetStrategy=p["feature_subset"],
                 bootstrap=p["bootstrap"], maxBins=p["max_bins"],
                 seed=p["seed"])


class RandomForestRegressor(_TreeEnsemble):
    def __init__(self, n_estimators: int = 20, max_depth: int = 5,
                 feature_subset: str = "auto", bootstrap: bool = True,
                 max_bins: int = 32, seed: int = 42):
        super().__init__(n_estimators=n_estimators, max_depth=max_depth,
                         feature_subset=feature_subset,
                         bootstrap=bootstrap, max_bins=max_bins,
                         seed=seed)

    def _estimator(self, fcol: str, label: str):
        from pyspark.ml.regression import RandomForestRegressor as M

        p = self.params
        return M(featuresCol=fcol, labelCol=label,
                 numTrees=p["n_estimators"], maxDepth=p["max_depth"],
                 featureSubsetStrategy=p["feature_subset"],
                 bootstrap=p["bootstrap"], maxBins=p["max_bins"],
                 seed=p["seed"])


class DecisionTreeClassifier(_TreeEnsemble):
    """Single CART tree — deterministic given the binning (no
    subsampling, no feature subsets)."""

    _drop_cols = ("__features", "rawPrediction", "probability")

    def __init__(self, max_depth: int = 5, max_bins: int = 32):
        super().__init__(max_depth=max_depth, max_bins=max_bins)

    def _estimator(self, fcol: str, label: str):
        from pyspark.ml.classification import DecisionTreeClassifier as M

        p = self.params
        return M(featuresCol=fcol, labelCol=label,
                 maxDepth=p["max_depth"], maxBins=p["max_bins"])


class DecisionTreeRegressor(_TreeEnsemble):
    def __init__(self, max_depth: int = 5, max_bins: int = 32):
        super().__init__(max_depth=max_depth, max_bins=max_bins)

    def _estimator(self, fcol: str, label: str):
        from pyspark.ml.regression import DecisionTreeRegressor as M

        p = self.params
        return M(featuresCol=fcol, labelCol=label,
                 maxDepth=p["max_depth"], maxBins=p["max_bins"])
