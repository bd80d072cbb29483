"""Trained language identification (CCNet / fastText style).

ADDITIVE (SURVEY.md §1.1) — the trained counterpart of the
marker-word ``text.language_id`` heuristic: CCNet (Wenzek et al.
2020) and RefinedWeb lead their curation pipelines with fastText
langid (Joulin et al. 2016), a linear classifier over hashed
character-n-gram features. This is that public formulation on
Spark's own primitives, the same shape as ``quality.
QualityClassifier``:

- char n-grams come from ONE codegen'd lookahead-regex scan
  (``char_ngram_list`` — multiplicity kept; lambda-HOF forms never
  enter codegen and measured 10-30x slower elsewhere in this repo);
- the hashing trick is MLlib ``HashingTF`` (JVM murmur straight to a
  sparse count vector — no vocabulary build, no shuffle);
- the model is MLlib multinomial ``NaiveBayes`` — it fits in ONE
  distributed aggregation pass (per-class feature sums), no
  iterative LBFGS, which is exactly what you want when the training
  corpus is itself large;
- scoring is a narrow map (n-gram scan → hash → class log-odds), so
  language-tagging 100 TB is a single pass and the model broadcasts
  (n_classes × 2^n_features log-probs).

No SQL oracle can replay murmur hashing, so driver verification uses
a planted-fixture CONTRACT (three synthetic languages with disjoint
character distributions classified correctly on a holdout — the
docs_text_metrics ``lid:*`` stratum); pytest pins holdout accuracy
and partition-layout determinism on separable synthetic data.

Reference capability analog: mars/learn classifier surface
(mars/learn/contrib, naive_bayes) — Mars itself ships no langid;
this is additive-brief territory (training-data pipeline ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDF
from pyspark.sql import functions as F


def char_ngram_list(col: Column | str, n: int = 3) -> Column:
    """ALL overlapping character n-grams of the lowercased text,
    multiplicity kept, via one codegen'd lookahead regex ((?s) so
    grams span newlines): position i captures chars [i, i+n) and
    consumes one char, so a length-L string yields L-n+1 grams.
    Unlike ``text.char_ngrams`` (distinct, interpreted transform)
    this keeps counts — the feature NB wants — and stays JVM-side."""
    s = F.lower(F.col(col) if isinstance(col, str) else col)
    pat = f"(?s)(?=(.{{{n}}}))."
    return F.regexp_extract_all(s, F.lit(pat), 1)


class NGramLangID:
    """Hashed char-n-gram Naive Bayes language identifier.

    ``fit(docs, text_col, lang_col)`` learns from labelled examples
    (labels are indexed deterministically: sorted distinct language
    tags); ``predict(docs, text_col)`` adds ``lang_pred`` (the tag)
    and ``lang_conf`` (posterior of the argmax)."""

    def __init__(self, n: int = 3, n_features: int = 4096,
                 smoothing: float = 1.0):
        self.n = n
        self.n_features = n_features
        self.smoothing = smoothing
        self._model = None
        self._langs: list[str] | None = None

    def _featurize(self, sdf: SparkDF, text_col: str) -> SparkDF:
        from pyspark.ml.feature import HashingTF

        grams = sdf.withColumn(
            "__grams", char_ngram_list(text_col, self.n))
        tf = HashingTF(inputCol="__grams", outputCol="__features",
                       numFeatures=self.n_features)
        return tf.transform(grams).drop("__grams")

    def _label_expr(self) -> Column:
        expr = None
        for i, lang in enumerate(self._langs):
            cond = F.col("__langid_raw") == F.lit(lang)
            expr = (F.when(cond, F.lit(float(i))) if expr is None
                    else expr.when(cond, F.lit(float(i))))
        return expr.otherwise(F.lit(float(len(self._langs))))

    def fit(self, docs: SparkDF, text_col: str,
            lang_col: str) -> "NGramLangID":
        from pyspark.ml.classification import NaiveBayes

        self._langs = sorted(
            r[0] for r in docs.select(lang_col).distinct().collect())
        feats = self._featurize(
            docs.withColumn("__langid_raw", F.col(lang_col)), text_col
        ).withColumn("__label", self._label_expr())
        self._model = NaiveBayes(
            featuresCol="__features", labelCol="__label",
            predictionCol="__pred", probabilityCol="__prob",
            rawPredictionCol="__raw", modelType="multinomial",
            smoothing=self.smoothing,
        ).fit(feats)
        return self

    def predict(self, docs: SparkDF, text_col: str) -> SparkDF:
        """Input schema + lang_pred (string tag) + lang_conf."""
        if self._model is None:
            raise ValueError("fit() before predict()")
        from pyspark.ml.functions import vector_to_array

        out = self._model.transform(self._featurize(docs, text_col))
        tag = F.element_at(
            F.array(*[F.lit(lang) for lang in self._langs]),
            F.col("__pred").cast("int") + 1)
        return (out
                .withColumn("lang_pred", tag)
                .withColumn("lang_conf", F.round(F.array_max(
                    vector_to_array(F.col("__prob"))), 6))
                .drop("__features", "__pred", "__prob", "__raw"))
