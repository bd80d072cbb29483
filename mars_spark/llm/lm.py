"""Corpus-level unigram language-model scoring.

ADDITIVE (SURVEY.md §1.1) — the no-model-artifact version of the
CCNet/KenLM perplexity filter every pretraining pipeline runs: score
each document by its negative mean log-probability under the corpus'
own unigram distribution. Low NLL ≈ ordinary fluent text; high NLL ≈
gibberish, boilerplate-stripped residue, wrong-language content.
A production pipeline swaps in a real LM via mapInPandas; this is the
JVM+SQL-replayable baseline that needs one corpus pass and no model.

Scale shape:
- vocabulary build = ONE word-count shuffle (explode + map-side
  combined groupBy), identical to the BM25 posting pass;
- only the top-``vocab_size`` rows (plus the scalar total) leave the
  aggregation — a bounded table that BROADCASTS into scoring;
- scoring is explode → broadcast-hash left join → per-doc groupBy:
  the corpus shuffles once more keyed on the doc id (word-count
  shape), never on text.

Smoothing is add-alpha over the truncated vocab: p(w) =
(c_w + α) / (total + α·(V+1)) with c_w = 0 for out-of-vocab words —
deterministic, engine-portable (ln/arithmetic only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.llm import text as T


def unigram_counts(docs: SparkDF, text_col: str) -> SparkDF:
    """(word, c) corpus unigram counts — one explode + combine-heavy
    shuffle."""
    return (docs.select(F.explode(T.tokens(text_col)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("c")))


def unigram_logprob(docs: SparkDF, text_col: str, id_col: str,
                    vocab_size: int = 1024,
                    alpha: float = 1.0) -> SparkDF:
    """Per-doc (id, n_tokens, nll): negative mean ln p(token) under
    the corpus unigram LM with add-``alpha`` smoothing over the
    deterministic top-``vocab_size`` vocabulary (count desc, word asc
    tie-break — bit-stable across partitionings, so the score is
    SQL-oracle-replayable)."""
    counts = unigram_counts(docs, text_col)
    # the scalar total equals Σ token_count — a narrow no-shuffle scan;
    # deriving it from `counts` instead re-ran the whole word-count
    # shuffle (no exchange reuse across the two plan branches)
    # NULL-text guard: explode emits 0 rows for a NULL doc, but
    # size(split(NULL)) is -1 under legacy sizeOfNull (and NULL under
    # ANSI) — pin those rows to 0 so the closed form matches the
    # exploded count in both conf regimes
    total = docs.agg(
        F.sum(F.when(F.col(text_col).isNull(), F.lit(0))
              .otherwise(T.token_count(text_col))).alias("__tot"))
    vocab = (counts.orderBy(F.desc("c"), F.asc("word"))
             .limit(vocab_size))
    toks = docs.select(
        F.col(id_col), F.explode(T.tokens(text_col)).alias("word"))
    denom = F.col("__tot") + alpha * (vocab_size + 1)
    scored = (
        toks.join(F.broadcast(vocab), "word", "left")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col),
                F.log((F.coalesce(F.col("c"), F.lit(0)) + alpha)
                      / denom).alias("__lp")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(-F.avg("__lp"), 4).alias("nll")))
