"""Discriminative quality classification (fasttext/CCNet style).

ADDITIVE (SURVEY.md §1.1) — the trained counterpart of the
closed-form ``text.quality_score`` heuristic: pretraining pipelines
since CCNet (Wenzek et al. 2020) and LLaMA train a linear classifier
over hashed bag-of-words features to score "does this look like the
target corpus" (wiki-vs-crawl), then keep/resample by the predicted
probability. fasttext is the usual tool; its model IS a linear
classifier over hashed n-gram features.

Spark-first shape: tokenization is the engine's own codegen'd
``text.tokens`` expression; the hashing trick is MLlib ``HashingTF``
(JVM murmur hashing straight to a sparse vector — no Python, no
vocabulary build, no shuffle); the model is MLlib
``LogisticRegression`` (distributed LBFGS). Scoring is one narrow
map — tokenize → hash → dot product — so classifying 100 TB is a
scan, and the model broadcasts (2^n_features weights).

No SQL oracle can replay murmur hashing, so driver verification uses
a layout-robust CONTRACT (holdout accuracy on disjoint-vocabulary
corpora — the op_learn_metrics ensemble precedent); the pytest suite
pins behavior on synthetic separable data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.llm import text as T


class QualityClassifier:
    """Hashed-BoW logistic quality classifier.

    ``fit(docs, text_col, label_col)`` trains on a 0/1 label (1 =
    target/high-quality exemplars, 0 = generic crawl);
    ``score(docs, text_col)`` adds ``quality_prob`` (P(label=1)) and
    ``quality_pred``. ``n_features`` is the hash width — collisions
    degrade gracefully (the classic hashing-trick trade)."""

    def __init__(self, n_features: int = 4096, reg_param: float = 1e-3,
                 max_iter: int = 30):
        self.n_features = n_features
        self.reg_param = reg_param
        self.max_iter = max_iter
        self._model = None

    def _featurize(self, sdf: SparkDF, text_col: str) -> SparkDF:
        from pyspark.ml.feature import HashingTF

        toks = sdf.withColumn("__toks", F.filter(
            T.tokens(text_col), lambda w: w != F.lit("")))
        tf = HashingTF(inputCol="__toks", outputCol="__features",
                       numFeatures=self.n_features)
        return tf.transform(toks).drop("__toks")

    def fit(self, docs: SparkDF, text_col: str,
            label_col: str) -> "QualityClassifier":
        from pyspark.ml.classification import LogisticRegression

        feats = self._featurize(docs, text_col)
        self._model = LogisticRegression(
            featuresCol="__features", labelCol=label_col,
            predictionCol="quality_pred",
            probabilityCol="__prob", rawPredictionCol="__raw",
            regParam=self.reg_param, maxIter=self.max_iter,
        ).fit(feats)
        return self

    def score(self, docs: SparkDF, text_col: str) -> SparkDF:
        """Input schema + quality_prob (P(label=1)) + quality_pred."""
        if self._model is None:
            raise ValueError("fit() before score()")
        from pyspark.ml.functions import vector_to_array

        feats = self._featurize(docs, text_col)
        out = self._model.transform(feats)
        return (out.withColumn(
            "quality_prob",
            vector_to_array(F.col("__prob")).getItem(1))
            .drop("__features", "__prob", "__raw"))


def train_score_split(docs: SparkDF, text_col: str, label_col: str,
                      id_col: str, test_mod: int = 2,
                      **clf_kwargs) -> tuple:
    """Convenience: hash-split by id parity (deterministic), train on
    one side, score the other; returns (classifier, scored_holdout)."""
    clf = QualityClassifier(**clf_kwargs)
    train = docs.filter(F.col(id_col) % test_mod == 0)
    test = docs.filter(F.col(id_col) % test_mod != 0)
    clf.fit(train, text_col, label_col)
    return clf, clf.score(test, text_col)
