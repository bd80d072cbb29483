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
    make_low_rank_matrix,
    make_regression,
)
from mars_spark.learn.extras import (
    KFold,
    LabelBinarizer,
    LabelPropagation,
    ParallelPostFit,
    BaggingClassifier,
    BlockwiseVotingClassifier,
    BlockwiseVotingRegressor,
    assert_all_finite,
    auc,
    check_X_y,
    check_array,
    check_consistent_length,
    check_is_fitted,
    column_or_1d,
    cosine_distances,
    cosine_similarity,
    euclidean_distances,
    f1_score,
    fbeta_score,
    haversine_distances,
    is_multilabel,
    k_means,
    label_binarize,
    manhattan_distances,
    minmax_scale,
    multilabel_confusion_matrix,
    precision_recall_fscore_support,
    precision_score,
    rbf_kernel,
    recall_score,
    roc_curve,
    type_of_target,
)
from mars_spark.learn.gbm import (
    DecisionTreeClassifier,
    DecisionTreeRegressor,
    GBTClassifier,
    GBTRegressor,
    RandomForestClassifier,
    RandomForestRegressor,
)
from mars_spark.learn.tsfeatures import (extract_features, impute,
                                          roll_time_series)
from mars_spark.learn import contrib  # noqa: F401

__all__ = [
    "KMeans", "PCA", "TruncatedSVD", "LinearRegression",
    "LogisticRegression", "GeneralizedLinearModel", "MinMaxScaler",
    "StandardScaler", "LabelEncoder", "normalize", "train_test_split",
    "hash_split", "shuffle", "accuracy_score", "mean_squared_error",
    "r2_score", "precision_recall_f1", "log_loss", "roc_auc_score",
    "KNeighborsClassifier", "NearestNeighbors", "kneighbors_graph",
    "BaggingRegressor", "IsolationForest", "label_propagation",
    "pairwise_distances", "pairwise_distances_topk", "make_blobs",
    "make_classification", "make_regression", "make_low_rank_matrix",
    "k_means", "precision_score", "recall_score", "f1_score",
    "fbeta_score", "precision_recall_fscore_support",
    "multilabel_confusion_matrix", "roc_curve", "auc",
    "euclidean_distances", "manhattan_distances", "cosine_distances",
    "cosine_similarity", "rbf_kernel", "haversine_distances",
    "KFold", "minmax_scale", "LabelBinarizer", "label_binarize",
    "LabelPropagation", "check_array", "check_X_y",
    "check_consistent_length", "assert_all_finite", "column_or_1d",
    "check_is_fitted", "type_of_target", "is_multilabel",
    "ParallelPostFit", "BaggingClassifier",
    "BlockwiseVotingClassifier", "BlockwiseVotingRegressor",
    "GBTClassifier", "GBTRegressor", "RandomForestClassifier",
    "RandomForestRegressor", "DecisionTreeClassifier",
    "DecisionTreeRegressor", "extract_features", "roll_time_series",
    "impute",
    "contrib",
]
