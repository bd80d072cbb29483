"""Learn facade on MLlib (SURVEY.md §2.10).

Reference parity: mars/learn — Mars reimplements sklearn estimators on
its tensor runtime (KMeans mars/learn/cluster/_kmeans.py:596, PCA
mars/learn/decomposition/_pca.py, LinearRegression
mars/learn/linear_model/_base.py, train_test_split
mars/learn/model_selection/_split.py:29, scalers mars/learn/
preprocessing/_data.py, metrics mars/learn/metrics/). Spark-first,
each maps to the MLlib estimator; this facade exposes the sklearn-ish
call shape over array/feature columns so pipeline code stays close to
the reference's API.
"""

from mars_spark.learn.facade import (
    KMeans,
    PCA,
    LinearRegression,
    LogisticRegression,
    MinMaxScaler,
    StandardScaler,
    train_test_split,
    hash_split,
    accuracy_score,
    mean_squared_error,
    r2_score,
)

__all__ = [
    "KMeans", "PCA", "LinearRegression", "LogisticRegression",
    "MinMaxScaler", "StandardScaler", "train_test_split", "hash_split",
    "accuracy_score", "mean_squared_error", "r2_score",
]
