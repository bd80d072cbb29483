"""DSIR-style importance weighting for data selection.

ADDITIVE (SURVEY.md §1.1) — the hashed-n-gram importance-weighting
step of Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, public method): score every raw document by how much
it resembles a (small) target corpus under bag-of-hashed-n-gram
unigram models,

    w(doc) = Σ_grams ln( p_target(bucket(g)) / p_raw(bucket(g)) ),

with add-1 smoothing over ``n_buckets`` hash buckets. High-weight
docs look like the target; resampling by weight (the stochastic step
— seed it explicitly) yields a target-like subcorpus.

Spark-first shape: bucket counting is an explode + combine shuffle
per corpus; the log-ratio table has exactly ``n_buckets`` rows and
BROADCASTS, so scoring the (huge) raw side is one narrow pass +
map-side join — nothing about the raw corpus ever shuffles except
the per-doc sum. Hashing is the md5-based ``hash32`` (dedup.py), so
the whole weight computation replays in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.llm import text as T
from mars_spark.llm.dedup import hash32


def _exploded_buckets(docs: SparkDF, text_col: str, n_buckets: int,
                      k: int, extra: list[str] = ()) -> SparkDF:
    g = docs.select(*extra,
                    F.explode(T.word_ngrams(text_col, k)).alias("g"))
    return g.withColumn("b", F.pmod(hash32(F.col("g")),
                                    F.lit(n_buckets)))


def bucket_counts(docs: SparkDF, text_col: str, n_buckets: int = 1024,
                  k: int = 2) -> SparkDF:
    """(bucket, cnt) hashed word-k-gram histogram of a corpus."""
    return (_exploded_buckets(docs, text_col, n_buckets, k)
            .groupBy("b").agg(F.count(F.lit(1)).alias("cnt")))


def dsir_weights(raw: SparkDF, target: SparkDF, text_col: str,
                 id_col: str = "doc_id", n_buckets: int = 1024,
                 k: int = 2) -> SparkDF:
    """(id, weight) log importance weight of every raw doc. The raw
    corpus must be the frame being scored (its own grams define the
    raw model); ``target`` is the small exemplar corpus."""
    tc = bucket_counts(target, text_col, n_buckets, k) \
        .withColumnRenamed("cnt", "tcnt")
    rc = bucket_counts(raw, text_col, n_buckets, k) \
        .withColumnRenamed("cnt", "rcnt")

    # scalar gram totals via the word_ngrams closed form (docs with
    # >= k tokens contribute tokens-k+1 grams, shorter docs their one
    # partial gram) — a narrow no-shuffle scan; deriving them from the
    # bucket tables re-ran each corpus' explode+shuffle as a second
    # plan branch (no exchange reuse)
    def _gram_total(alias):
        s = F.col(text_col)
        n = T.token_count(s)
        per = F.when(n >= k, n - k + 1).otherwise(F.lit(1))
        if k == 1:
            # k=1 on empty-normalized text: _gram_extract's regexp
            # path emits 0 grams (no token to match), not the one
            # partial gram the short-doc branch emits for k>=2
            per = F.when(T.normalize(s) == "", F.lit(0)).otherwise(per)
        # NULL docs explode to 0 grams; without the guard the
        # otherwise(1) branch would count them (n is NULL/-1 there)
        per = F.when(s.isNull(), F.lit(0)).otherwise(per)
        return F.sum(per).alias(alias)

    t_tot = target.agg(_gram_total("tt"))
    r_tot = raw.agg(_gram_total("rt"))
    lw = (tc.join(rc, "b", "outer")
          .crossJoin(F.broadcast(t_tot)).crossJoin(F.broadcast(r_tot))
          .select("b", (
              F.log((F.coalesce(F.col("tcnt"), F.lit(0)) + 1)
                    / (F.col("tt") + n_buckets))
              - F.log((F.coalesce(F.col("rcnt"), F.lit(0)) + 1)
                      / (F.col("rt") + n_buckets))).alias("lw")))
    per_gram = _exploded_buckets(raw, text_col, n_buckets, k,
                                 extra=[id_col])
    return (per_gram.join(F.broadcast(lw), "b")
            .groupBy(id_col).agg(F.sum("lw").alias("weight")))
