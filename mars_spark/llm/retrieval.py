"""TF-IDF / BM25 retrieval over a document corpus.

ADDITIVE (SURVEY.md §1.1) — the sparse-retrieval baseline every
corpus-curation pipeline keeps next to the embedding path (seed-set
expansion, quality-by-similarity filtering, eval-query probes).
Spark-first shape:

- the posting list is ONE explode + groupBy((id, term)) — the same
  map-side-combined shuffle as a word count, linear in corpus bytes;
- document lengths ride the same pass; the average length is a
  1-row aggregate broadcast back;
- for a QUERY, df/idf are computed only for the query's terms — a
  tiny frame broadcast into the posting-list join, so scoring a
  query is a narrow map over one corpus pass, never a global join;
- scores are pure Column arithmetic (ln/sums), oracle-replayable.

BM25 uses the standard smoothed idf ``ln(1 + (N - df + .5)/(df + .5))``
and the k1/b saturation form (Robertson & Zaragoza 2009).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.llm import text as T


def term_counts(docs: SparkDF, text_col: str,
                id_col: str = "doc_id") -> SparkDF:
    """Posting list (id, term, dl, tf) — one explode + one
    combine-heavy shuffle. Doc length ``dl`` is computed BEFORE the
    explode (size of the token array) and rides each posting row, so
    no second pass or per-doc window is needed."""
    base = docs.select(F.col(id_col), T.tokens(text_col).alias("__t"))
    return (base.select(F.col(id_col), F.size("__t").alias("dl"),
                        F.explode("__t").alias("term"))
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def tf_idf(docs: SparkDF, text_col: str,
           id_col: str = "doc_id") -> SparkDF:
    """(id, term, tfidf) with smooth idf ``ln((N+1)/(df+1)) + 1`` —
    the sklearn-style form, deterministic and engine-portable."""
    from pyspark.sql import Window

    tc = term_counts(docs, text_col, id_col)
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    # postings are unique per (id, term), so df = row count per term —
    # ONE term-keyed window over the posting build instead of a second
    # posting build + df self-join (no exchange reuse across branches)
    df = F.count(F.lit(1)).over(Window.partitionBy("term"))
    return (tc.withColumn("__df", df)
            .crossJoin(F.broadcast(n_docs))
            .select(id_col, "term",
                    (F.col("tf")
                     * (F.log((F.col("__n") + 1) / (F.col("__df") + 1))
                        + 1)).alias("tfidf")))


def bm25_scores(docs: SparkDF, query_terms: list[str], text_col: str,
                id_col: str = "doc_id", k1: float = 1.2,
                b: float = 0.75) -> SparkDF:
    """(id, score) BM25 of every matching doc for a bag of query
    terms. df/idf exist only for the (few) query terms and broadcast;
    non-matching docs don't appear (score 0)."""
    from pyspark.sql import Window

    tc = term_counts(docs, text_col, id_col)
    hits = tc.filter(F.col("term").isin(list(query_terms)))
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.size(T.tokens(text_col))).alias("__avgdl"))
    # postings are unique per (id, term): query-term df = row count
    # per term, computed as a window over the (tiny, filtered) hits
    # instead of a second full posting build feeding a df self-join
    scored = (
        hits.withColumn("df",
                        F.count(F.lit(1))
                        .over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (F.log(1 + (F.col("__n") - F.col("df") + 0.5)
                   / (F.col("df") + 0.5))
             * (F.col("tf") * (k1 + 1))
             / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                    / F.col("__avgdl"))))
            .alias("__s")))
    return scored.groupBy(id_col).agg(F.sum("__s").alias("score"))
