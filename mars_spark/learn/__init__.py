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
    TruncatedSVD,
    LinearRegression,
    LogisticRegression,
    GeneralizedLinearModel,
    MinMaxScaler,
    StandardScaler,
    LabelEncoder,
    normalize,
    train_test_split,
    hash_split,
    shuffle,
    accuracy_score,
    mean_squared_error,
    r2_score,
    precision_recall_f1,
    log_loss,
    roc_auc_score,
    KNeighborsClassifier,
    NearestNeighbors,
    kneighbors_graph,
    BaggingRegressor,
    IsolationForest,
    label_propagation,
)
from mars_spark.learn.pairwise import (
    pairwise_distances,
    pairwise_distances_topk,
)
from mars_spark.learn.datasets import (
    make_blobs,
    make_classification,
    make_regression,
)

__all__ = [
    "KMeans", "PCA", "TruncatedSVD", "LinearRegression",
    "LogisticRegression", "GeneralizedLinearModel", "MinMaxScaler",
    "StandardScaler", "LabelEncoder", "normalize", "train_test_split",
    "hash_split", "shuffle", "accuracy_score", "mean_squared_error",
    "r2_score", "precision_recall_f1", "log_loss", "roc_auc_score",
    "KNeighborsClassifier", "NearestNeighbors", "kneighbors_graph",
    "BaggingRegressor", "IsolationForest", "label_propagation",
    "pairwise_distances", "pairwise_distances_topk", "make_blobs",
    "make_classification", "make_regression",
]
