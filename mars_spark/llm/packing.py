"""Sequence packing for training-data pipelines.

ADDITIVE — the reference has no packing op (SURVEY.md §1.1). This is
the "fill each training sequence up to the token budget" step that
turns a document corpus into fixed-length samples. True first-fit
bin packing is inherently sequential; the distributed form used here
is the streaming **contiguous-fill** rule every large pipeline
actually ships:

1. hash documents into ``n_buckets`` independent streams (bounded
   reducers — bucket count scales with the cluster, not the data);
2. within a bucket, order by a deterministic key and fill greedily:
   ``pack = floor((cumsum(tokens) - tokens) / budget)``.

Properties at 100 TB: ONE shuffle (on the bucket key), per-bucket
sort via the partition window, no driver state, and the assignment
is a closed-form expression over (bucket, order, tokens) — fully
replayable by the SQL oracle, unlike greedy per-partition packers
whose output depends on physical partitioning. Packs can overflow
the budget by at most one document (the straddler) — callers that
need hard caps split the straddling document first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window
from pyspark.sql import functions as F


def pack_documents(sdf: SparkDF, token_col: str, budget: int,
                   id_col: str = "doc_id",
                   n_buckets: int = 64, bucket=None) -> SparkDF:
    """Assign (pack_bucket, pack_id) to every row. Documents larger
    than the budget become single-document packs (cumsum crosses one
    or more whole budgets — subsequent documents land in later packs,
    never share theirs). ``bucket`` overrides the stream-assignment
    Column (default murmur3 ``pmod(hash(id), n)``); pass an
    engine-portable rule like ``pmod(id, n)`` when the assignment
    must be replayable outside Spark."""
    if bucket is None:
        bucket = F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets))
    w = Window.partitionBy("pack_bucket").orderBy(id_col)
    out = sdf.withColumn("pack_bucket", bucket.cast("bigint"))
    run = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return out.withColumn(
        "pack_id", F.floor(run / F.lit(budget)).cast("bigint"))


def pack_stats(packed: SparkDF, token_col: str) -> SparkDF:
    """Per-pack rollup: documents per pack and fill level — the
    packing-efficiency report (waste = budget − fill on non-straddler
    packs)."""
    return (packed.groupBy("pack_bucket", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(token_col).alias("fill")))


def chunk_documents(sdf: SparkDF, text_col: str, id_col: str = "doc_id",
                    size: int = 64, overlap: int = 8,
                    passthrough: list[str] = ()) -> SparkDF:
    """Split each document into token windows of ``size`` with
    ``overlap`` tokens shared between consecutive chunks (stride =
    size − overlap) — the context-window prep every long-document
    pipeline runs before tokenization/embedding. Returns one row per
    chunk: (id, chunk_idx, chunk_text, n_tokens).

    NOTE: ``chunk_text`` is built from the NORMALIZED text
    (``text.normalize``: lowercased, whitespace-collapsed), not the
    original — token boundaries must be deterministic for the regex
    pass and the closed-form count oracle to agree. Case-sensitive
    consumers (exact-match dedup against raw text, cased tokenizers)
    should re-slice the original text by token offsets or chunk a
    case-preserving normalization instead.

    Chunk COUNT is closed-form over the token count — ``1`` when
    n ≤ size else ``ceil((n − size)/stride) + 1`` — so the rollup is
    SQL-oracle-replayable without re-splitting text; chunk TEXT is
    built by ONE native regex pass (same overlapping-lookahead trick
    as text._gram_extract: each match CAPTURES up to ``size`` tokens
    and CONSUMES ``stride`` while more than a full window remains,
    else consumes the tail and stops — the interpreted
    ``transform``+``slice`` form this replaces cost 2.8 s at sf0.1
    for 5 000 docs). A narrow map + explode: no shuffle, scales with
    corpus bytes. ``passthrough`` columns ride along the explode —
    carry metadata (source, lang, …) here instead of joining it back
    on the id afterwards (that join is a shuffle of every chunk)."""
    from mars_spark.llm import text as T

    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    s = T.normalize(text_col)
    n = F.size(F.split(s, " "))
    # capture: up to `size` tokens with no trailing space; branch:
    # while > `size` tokens remain, consume `stride` tokens (another
    # chunk follows), else consume the rest (this was the last chunk).
    # Possessive quantifiers (Java-regex-only, measured 6× faster
    # here): token boundaries are deterministic, so backtracking is
    # pure waste — the engine otherwise re-tries every quantified
    # group at each position. The SQL oracle never runs this pattern
    # (chunk rollups replay via closed-form arithmetic).
    pat = (f"(?=((?:[^ ]++ ){{0,{size - 1}}}+[^ ]++))"
           f"(?:(?=(?:[^ ]++ ){{{size}}}+[^ ]+)(?:[^ ]++ ){{{stride}}}+|.*+)")
    chunks = F.when(n <= size, F.array(s)).otherwise(
        F.regexp_extract_all(s, F.lit(pat), 1))
    return (
        sdf.select(F.col(id_col), *[F.col(c) for c in passthrough],
                   F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn("n_tokens",
                    F.size(F.split(F.col("chunk_text"), " ")))
    )


def take_token_budget(sdf: SparkDF, text_col: str, budget: int,
                      order_col: str, ascending: bool = True,
                      token_col: str | None = None) -> SparkDF:
    """Deterministic token-budget cut: keep the maximal PREFIX of the
    corpus, in ``order_col`` order, whose cumulative token total fits
    ``budget`` ("take the first N tokens" — how a training run pins
    its data size). The running sum is monotone, so the kept set is
    exactly the docs with cumulative count ≤ budget; the first doc
    that would cross the line, and everything after it, is cut.

    NOT a global-order window (a partitionless window funnels the
    whole corpus through one task): the cumulative count comes from
    operators.rank.prefix_stats — range partition on the order key,
    per-partition running sums, driver-side offsets of the
    (num-partitions-sized) subtotal list. ``order_col`` values must
    be UNIQUE (a total order — use an id or a precomputed composite
    sort key) for the kept set to be deterministic and
    oracle-replayable. Pass ``token_col`` to reuse a precomputed
    token count."""
    from mars_spark.llm import text as T
    from mars_spark.operators.rank import prefix_stats

    nt = (F.col(token_col) if token_col
          else T.token_count(text_col))
    base = sdf.withColumn("__nt", nt)
    stats = prefix_stats(base, order_col, "__nt", ascending=ascending)
    return (stats.filter(F.col("__before") + F.col("__nt") <= budget)
            .drop("__nt", "__before", "__didx"))


def write_shards(sdf: SparkDF, path: str, order_col: str,
                 docs_per_shard: int | None = None,
                 token_budget: int | None = None,
                 token_col: str | None = None,
                 text_col: str | None = None,
                 fmt: str = "parquet", mode: str = "overwrite") -> int:
    """Materialize the corpus as size-bounded SHARDS — the export
    step a pretraining pipeline ends with (training loaders stream
    shard files independently, so shard size bounds loader memory
    and restart granularity). Exactly one sizing rule:

    - ``docs_per_shard``: fixed row count per shard, globally exact,
      in ``order_col`` order (shard 0 holds the first N docs, ...);
    - ``token_budget`` (+ ``token_col`` or ``text_col``): contiguous
      token fill — shard = floor(exclusive-prefix-tokens / budget),
      the pack_documents rule applied globally, so a shard overflows
      by at most its straddling document.

    Both ride operators.rank.prefix_stats (range partition +
    driver-side offsets of the per-partition subtotals — no global
    window, no single-reducer stage). ``order_col`` values must be
    unique. Rows are re-shuffled BY SHARD before the write so each
    shard directory is written by one task (without it every task
    appends a file fragment to every shard — the small-files
    explosion). Output: ``{path}/shard=N/...`` in ``fmt``; returns
    the number of shard directories written. Under the token rule
    shard ids may be NON-CONTIGUOUS (a document larger than the
    budget advances the prefix past whole shard numbers) — enumerate
    shards by listing ``shard=*``, not ``range(n)``."""
    from mars_spark.llm import text as T
    from mars_spark.operators.rank import prefix_stats

    if (docs_per_shard is None) == (token_budget is None):
        raise ValueError(
            "exactly one of docs_per_shard / token_budget required")
    if token_budget is not None:
        if token_col is None and text_col is None:
            raise ValueError("token_budget needs token_col or text_col")
        nt = (F.col(token_col) if token_col
              else T.token_count(text_col))
        stats = prefix_stats(sdf.withColumn("__nt", nt),
                             order_col, "__nt")
        shard = F.floor(F.col("__before") / F.lit(token_budget))
    else:
        stats = prefix_stats(sdf.withColumn("__nt", F.lit(1)),
                             order_col, "__nt")
        shard = F.floor(F.col("__didx") / F.lit(docs_per_shard))
    out = (stats.withColumn("shard", shard.cast("bigint"))
           .drop("__nt", "__before", "__didx"))
    (out.repartition("shard").write.mode(mode)
     .partitionBy("shard").format(fmt).save(path))
    # distinct count, not max+1: gapped ids would overcount. Cheap —
    # prefix_stats localCheckpoints its frame, so this re-runs only
    # a projection + small agg over the snapshot, not the pipeline.
    return out.select("shard").distinct().count()
