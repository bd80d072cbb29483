"""Eval-set decontamination for training-data pipelines.

ADDITIVE — the reference has no decontamination operator (SURVEY.md
§1.1); this is the "drop training documents that overlap the eval
benchmarks" step (the 13-gram rule of GPT-3 appendix C / PaLM) that
every serious pretraining pipeline runs. Design at 100 TB:

- The eval side is SMALL by definition (benchmarks are a few MB), so
  its distinct n-gram set broadcasts: the scan over the 100 TB train
  side stays a narrow map + broadcast semi-join — **zero shuffle of
  train data**. ``broadcast=False`` falls back to a shuffle join for
  pathological mega-eval sets.
- N-grams come from ``text.word_shingles`` (higher-order Column
  expressions, codegen'd); the train side explodes its shingles only
  into the join, never materializing them to storage.
- Deterministic and engine-portable: whitespace tokenization + exact
  string n-gram equality, replayable in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.llm import text as T


def eval_ngrams(eval_df: SparkDF, text_col: str, k: int = 13) -> SparkDF:
    """The distinct word k-gram set of the eval corpus — one column
    ``gram``. Cache/persist this when decontaminating many shards."""
    return (
        eval_df.select(
            F.explode(T.word_shingles(text_col, k)).alias("gram"))
        .distinct()
    )


def contaminated_ids(train_df: SparkDF, eval_df: SparkDF, text_col: str,
                     id_col: str, k: int = 13,
                     broadcast: bool = True) -> SparkDF:
    """IDs of train docs sharing >= 1 word k-gram with the eval corpus.

    Train shingles are exploded straight into a semi-join against the
    (broadcast) eval gram set; distinct on the id collapses multi-gram
    hits without ever shuffling full documents.
    """
    grams = eval_ngrams(eval_df, text_col, k)
    if broadcast:
        grams = F.broadcast(grams)
    tr = train_df.select(
        F.col(id_col),
        F.explode(T.word_shingles(text_col, k)).alias("gram"))
    return tr.join(grams, "gram", "left_semi").select(id_col).distinct()


def decontaminate(train_df: SparkDF, eval_df: SparkDF, text_col: str,
                  id_col: str, k: int = 13,
                  broadcast: bool = True) -> SparkDF:
    """Training frame minus contaminated docs (left-anti on id)."""
    bad = contaminated_ids(train_df, eval_df, text_col, id_col, k,
                           broadcast)
    return train_df.join(bad, id_col, "left_anti")
