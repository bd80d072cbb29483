"""Training-data pipeline query corpus: events (streaming-shaped),
documents (text/dedup), embeddings (similarity search).

These exercise the additive LLM-data operators (mars_spark.llm) plus
the window/sessionization surface. Same contract as tpch.py: engine
API in, Spark DataFrame out, value-matched DuckDB oracle in
pipeline_oracles.py (md5-based hashing keeps every stage portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, SparkSession, Window
from pyspark.sql import functions as F

import mars_spark as ms
from mars_spark.llm import dedup as D
from mars_spark.llm import similarity as S
from mars_spark.llm import text as T
from mars_spark.queries.tpch import load


# ----------------------------------------------------------------- events
def events_hourly(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Tumbling-window agg (batch form of the streaming hourly rollup).
    Map-side combine makes this shuffle tiny at any scale."""
    e = load(sf_dir, "events").to_spark()
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def events_sessions(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Sessionization: 30-min inactivity gap splits sessions. One
    shuffle on user_id; the gap/cum-count is a sorted window within
    each user partition (reference has no streaming ops — SURVEY §1.1;
    this is the batch twin of the Structured Streaming session window)."""
    e = load(sf_dir, "events").to_spark()
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_new = e.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    return (
        with_new.groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Ordered funnel view→click→purchase per user (min-timestamp
    comparison form — one agg, no self-joins)."""
    e = load(sf_dir, "events").to_spark()
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
              ).alias("n_view_click"),
        F.sum(F.when((F.col("t_click") > F.col("t_view"))
                     & (F.col("t_buy") > F.col("t_click")), 1).otherwise(0)
              ).alias("n_full_funnel"),
    )


def events_cumsum(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Per-user running total (reference: mars cumsum §2.4 — Mars's
    chunk-summary machinery is one ordered window frame here)."""
    e = load(sf_dir, "events")
    from mars_spark.operators.window import cumsum

    out = cumsum(e, "value", order_by=["ts", "event_id"],
                 partition_by=["user_id"])
    sdf = out.to_spark().select(
        "event_id", "user_id",
        F.round("value_cumsum", 2).alias("value_cumsum"))
    return sdf


def events_rolling_avg(spark: SparkSession, sf_dir: str) -> SparkDF:
    """3-row rolling mean per user (reference: rolling §2.5)."""
    e = load(sf_dir, "events")
    out = e.rolling(3, min_periods=1).over(
        order_by=["ts", "event_id"], partition_by=["user_id"]
    ).agg({"value": "mean"})
    return out.to_spark().select(
        "event_id",
        F.round("value_roll_mean", 4).alias("roll_avg"))


def events_value_diff(spark: SparkSession, sf_dir: str) -> SparkDF:
    """shift/diff surface (reference: base/shift.py:31, diff.py:29)."""
    e = load(sf_dir, "events")
    from mars_spark.operators.window import diff

    out = diff(e, 1, order_by=["ts", "event_id"], partition_by=["user_id"],
               cols=["value"])
    return out.to_spark().select(
        "event_id", F.round("value_diff", 4).alias("value_diff"))


def events_top_users(spark: SparkSession, sf_dir: str) -> SparkDF:
    e = load(sf_dir, "events")
    g = e.groupby("user_id", as_index=False).agg(
        total_value=("value", "sum"), n_events=("event_id", "count"))
    sdf = g.to_spark().withColumn("total_value", F.round("total_value", 2))
    return sdf.orderBy(F.desc("total_value"), F.asc("user_id")).limit(10)


def events_dau(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Daily active users — exact countDistinct (the approx_count_
    distinct variant is the 100 TB path; exact keeps the oracle)."""
    e = load(sf_dir, "events").to_spark()
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def events_type_stats(spark: SparkSession, sf_dir: str) -> SparkDF:
    """describe-style per-type stats (reference: describe §2.4)."""
    e = load(sf_dir, "events")
    g = e.groupby("event_type", as_index=False).agg(
        n=("event_id", "count"),
        avg_value=("value", "mean"),
        min_value=("value", "min"),
        max_value=("value", "max"),
        std_value=("value", "std"),
    )
    sdf = g.to_spark()
    for c in ["avg_value", "min_value", "max_value", "std_value"]:
        sdf = sdf.withColumn(c, F.round(c, 4))
    return sdf


# -------------------------------------------------------------- documents
def docs_token_stats(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Token counting over the documents table (llm.text.token_count)."""
    d = load(sf_dir, "documents").to_spark()
    with_tok = d.select(
        "lang",
        T.token_count(F.col("text")).alias("n_tok"),
        F.length("text").alias("n_char"),
    )
    return (
        with_tok.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_tok"), 2).alias("avg_tokens"),
            F.round(F.avg("n_char"), 2).alias("avg_chars"),
        )
    )


def docs_quality(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Quality scoring (llm.text.quality_score) — closed-form heuristic."""
    d = load(sf_dir, "documents").to_spark()
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id", T.quality_score(F.col("text")).alias("quality"))


def docs_langid(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Language-ID heuristic vs gold label → confusion counts."""
    d = load(sf_dir, "documents").to_spark()
    pred = d.select("lang", T.language_id(F.col("text")).alias("pred_lang"))
    return pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))


def docs_fingerprint(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Document fingerprinting: md5-of-normalized-text content key."""
    d = load(sf_dir, "documents").to_spark()
    fp = d.select(T.fingerprint(F.col("text")).alias("fp"))
    return fp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
    )


def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Exact dedup (hash-groupBy, min-id winner) → kept docs per source."""
    d = load(sf_dir, "documents").to_spark()
    kept = D.exact_dedup(d, "text", "doc_id")
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


def docs_minhash_sig(spark: SparkSession, sf_dir: str) -> SparkDF:
    """MinHash signatures (first 2 of 8 permutations) — portable md5
    minwise hashing over word-3-gram shingles, via the codegen'd
    posting-list hash-agg (llm.dedup.minhash_sig_frame)."""
    d = load(sf_dir, "documents").to_spark()
    return D.minhash_sig_frame(
        d.filter(F.col("doc_id") < 100), "text", "doc_id", num_hashes=2)


def docs_jaccard_pairs(spark: SparkSession, sf_dir: str) -> SparkDF:
    """n-gram Jaccard near-dup pairs ≥0.5 via the inverted-index join
    (the testdata contains real near-dups at ~0.98)."""
    d = load(sf_dir, "documents").to_spark()
    return D.jaccard_pairs(d, "text", "doc_id", threshold=0.5, k=3)


def docs_minhash_dedup(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Full MinHash-LSH dedup pipeline: bands → candidates → Jaccard
    verify → drop near-dups. Returns surviving count per source."""
    d = load(sf_dir, "documents").to_spark()
    kept = D.minhash_dedup(d, "text", "doc_id", threshold=0.5)
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


def docs_simhash(spark: SparkSession, sf_dir: str) -> SparkDF:
    """16-bit SimHash signatures (llm.dedup.simhash)."""
    d = load(sf_dir, "documents").to_spark()
    return d.filter(F.col("doc_id") < 50).select(
        "doc_id", D.simhash(F.col("text"), bits=16).alias("sig"))


# ------------------------------------------------------------- embeddings
def emb_topk(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Brute-force cosine top-10 against vec_id=0's embedding — the
    exact ANN baseline; TakeOrderedAndProject, no shuffle."""
    e = load(sf_dir, "embeddings").to_spark()
    q = e.filter(F.col("vec_id") == 0).select(
        S.to_double(F.col("embedding")).alias("q"))
    base = e.select("vec_id", S.to_double(F.col("embedding")).alias("emb"))
    out = base.join(F.broadcast(q)).select(
        "vec_id",
        F.round(S.cosine(F.col("emb"), F.col("q")), 4).alias("cos_sim"),
    )
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)


def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> SparkDF:
    """All-pairs cosine ≥0.4 through the cost-based similarity join —
    at this low threshold it picks the EXACT blocked theta-join
    (shuffle join on block-pair keys, bounded reducers, no crossJoin;
    r01's broadcast-nested-loop brute path survives only as the DuckDB
    oracle). A ≥0.7 threshold would dispatch to multiband LSH, which
    was measured miss-free here but 95%-candidate at t=0.4 — see
    similarity.similarity_self_join for the measured tradeoff."""
    e = load(sf_dir, "embeddings").to_spark()
    dim = e.select(F.size("embedding").alias("d")).first()["d"]
    return S.similarity_self_join(e, "embedding", threshold=0.4, dim=dim,
                                  id_col="vec_id")


def emb_label_stats(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Per-label vector stats (norm = JVM-side aggregate expression)."""
    e = load(sf_dir, "embeddings").to_spark()
    with_norm = e.select(
        "label", S.norm(S.to_double(F.col("embedding"))).alias("nrm"))
    return (
        with_norm.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
    )


def emb_ann_ivf(spark: SparkSession, sf_dir: str) -> SparkDF:
    """IVF (coarse k-means) ANN search — MLlib KMeans index, probes the
    4 nearest of 8 clusters. Non-SQL-expressible (iterative training):
    no oracle; the driver records a rows-only check. Top-10 for the
    vec_id=0 query vector; recall vs emb_topk is the quality metric."""
    e = load(sf_dir, "embeddings").to_spark()
    assigned, centroids = S.ivf_index(e, "embedding", n_clusters=8)
    query = [r.e for r in
             assigned.filter(F.col("vec_id") == 0).select("e").collect()][0]
    return S.ivf_search(assigned, centroids, list(query), k=10, n_probe=4)


PIPELINE_QUERIES = {
    "events_hourly": events_hourly,
    "events_sessions": events_sessions,
    "events_funnel": events_funnel,
    "events_cumsum": events_cumsum,
    "events_rolling_avg": events_rolling_avg,
    "events_value_diff": events_value_diff,
    "events_top_users": events_top_users,
    "events_dau": events_dau,
    "events_type_stats": events_type_stats,
    "docs_token_stats": docs_token_stats,
    "docs_quality": docs_quality,
    "docs_langid": docs_langid,
    "docs_fingerprint": docs_fingerprint,
    "docs_exact_dedup": docs_exact_dedup,
    "docs_minhash_sig": docs_minhash_sig,
    "docs_jaccard_pairs": docs_jaccard_pairs,
    "docs_minhash_dedup": docs_minhash_dedup,
    "docs_simhash": docs_simhash,
    "emb_topk": emb_topk,
    "emb_neardup_pairs": emb_neardup_pairs,
    "emb_label_stats": emb_label_stats,
    "emb_ann_ivf": emb_ann_ivf,
}
