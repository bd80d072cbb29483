"""Structured Streaming surface — ADDITIVE, not reference-derived.

The reference has no streaming abstraction at all (SURVEY.md §1.1: no
watermark, no event-time window, no stateful operator anywhere in
Mars). This module gives the engine the streaming counterpart of its
batch ops with the same column conventions, so the batch queries in
queries/pipeline.py (events_hourly, events_sessions) have streaming
twins:

- tumbling/sliding windows → ``F.window`` + watermark
- session windows          → ``F.session_window`` + watermark
- arbitrary stateful ops   → applyInPandasWithState (escape hatch)

Scale notes: watermark bounds state size (old windows evict); the
shuffle key is (window, keys) so skewed keys behave like any batch
groupBy under AQE-less streaming — salt hot keys upstream if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, SparkSession
from pyspark.sql import functions as F


def read_stream(spark: SparkSession, fmt: str, path: str | None = None,
                schema=None, **options) -> SparkDF:
    """readStream wrapper: file sources need an explicit schema (no
    inference scans on a stream); 'rate' is the built-in test source."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    if path is not None:
        reader = reader.option("path", path)
    return reader.load()


def tumbling_agg(sdf: SparkDF, ts_col: str, duration: str, keys: list[str],
                 aggs: dict[str, str], watermark: str = "10 minutes") -> SparkDF:
    """Non-overlapping event-time windows (streaming twin of
    queries/pipeline.events_hourly)."""
    from mars_spark.core.groupby import _AGG_FUNCS

    exprs = [_AGG_FUNCS[fn](F.col(c)).alias(f"{c}_{fn}")
             for c, fn in aggs.items()]
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("win"), *keys)
        .agg(*exprs)
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"), *keys,
                *[f"{c}_{fn}" for c, fn in aggs.items()])
    )


def sliding_agg(sdf: SparkDF, ts_col: str, duration: str, slide: str,
                keys: list[str], aggs: dict[str, str],
                watermark: str = "10 minutes") -> SparkDF:
    from mars_spark.core.groupby import _AGG_FUNCS

    exprs = [_AGG_FUNCS[fn](F.col(c)).alias(f"{c}_{fn}")
             for c, fn in aggs.items()]
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration, slide).alias("win"), *keys)
        .agg(*exprs)
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"), *keys,
                *[f"{c}_{fn}" for c, fn in aggs.items()])
    )


def session_agg(sdf: SparkDF, ts_col: str, gap: str, keys: list[str],
                aggs: dict[str, str], watermark: str = "10 minutes") -> SparkDF:
    """Session windows with an inactivity gap (streaming twin of
    queries/pipeline.events_sessions)."""
    from mars_spark.core.groupby import _AGG_FUNCS

    exprs = [_AGG_FUNCS[fn](F.col(c)).alias(f"{c}_{fn}")
             for c, fn in aggs.items()]
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *keys)
        .agg(*exprs)
        .select(F.col("win.start").alias("session_start"),
                F.col("win.end").alias("session_end"), *keys,
                *[f"{c}_{fn}" for c, fn in aggs.items()])
    )


def write_stream(sdf: SparkDF, fmt: str = "memory", query_name: str = "out",
                 output_mode: str = "append", path: str | None = None,
                 checkpoint: str | None = None, **options):
    """Start the sink; returns the StreamingQuery (caller manages
    lifecycle / processAllAvailable in tests)."""
    writer = (sdf.writeStream.format(fmt).outputMode(output_mode)
              .queryName(query_name))
    if path is not None:
        writer = writer.option("path", path)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer.start()


def stream_dedup(sdf: SparkDF, subset: list[str], ts_col: str,
                 watermark: str = "10 minutes") -> SparkDF:
    """Streaming exact dedup — the streaming twin of
    llm.dedup.exact_dedup: keeps the first arrival per key and drops
    later duplicates that land within the watermark horizon
    (dropDuplicatesWithinWatermark bounds the dedup state exactly like
    the watermark bounds window state; an unbounded dropDuplicates
    would grow state forever on a 100 TB/day firehose)."""
    return (
        sdf.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(subset)
    )


def stream_static_join(stream: SparkDF, static: SparkDF, on,
                       how: str = "inner",
                       broadcast: bool = True) -> SparkDF:
    """Stream-static enrichment join (dimension lookup on a stream).
    The static side re-reads per micro-batch; broadcasting it keeps
    the stream side shuffle-free — the streaming analog of the batch
    dimension broadcast."""
    s = F.broadcast(static) if broadcast else static
    return stream.join(s, on=on, how=how)


def stream_stream_join(left: SparkDF, right: SparkDF, on: str,
                       left_ts: str, right_ts: str,
                       within: str = "10 minutes",
                       watermark: str = "10 minutes",
                       how: str = "inner") -> SparkDF:
    """Watermarked stream-stream join — the attribution shape (join
    each left event to right events for the same key that happened at
    or before it, within a bounded horizon).

    Both sides carry watermarks and the join condition carries the
    time bound ``right_ts <= left_ts AND right_ts >= left_ts - within``,
    which is what lets Spark EVICT buffered rows: state per side is
    bounded by (watermark + within) of data, not the whole stream. An
    unbounded stream-stream join (no time bound) would buffer forever —
    refuse that shape at 100 TB. Outer variants emit the unmatched row
    once the watermark passes the bound.

    The key equality makes this a shuffle hash join on ``on`` per
    micro-batch; the range predicate only gates the state lookup.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    # disambiguate the key column for the output
    rw = rw.withColumnRenamed(on, f"__r_{on}")
    cond = (
        (lw[on] == rw[f"__r_{on}"])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {within}"))
    )
    out = lw.join(rw, on=cond, how=how)
    # outer hows: a right-unmatched row has NULL in left's key column
    # — coalesce the two key copies before dropping the renamed one,
    # or the emitted row's key would be unrecoverable
    return (out.withColumn(on, F.coalesce(F.col(on), F.col(f"__r_{on}")))
            .drop(f"__r_{on}"))


def stream_incremental_dedup(stream: SparkDF, seen_fps: SparkDF,
                             text_col: str, ts_col: str = "ts",
                             watermark: str = "10 minutes") -> SparkDF:
    """STREAMING incremental corpus dedup — the daily-delivery shape of
    llm.dedup.incremental_dedup run continuously: arriving documents
    are dropped when their content fingerprint is already in the
    persisted corpus store OR has been seen earlier in the stream.

    Two stages, both bounded-state:
    1. corpus check — a stream-static join against ``seen_fps`` (one
       ``fp`` column, e.g. exact_dedup_keys(...).select('fp') written
       to parquet). Spark's stream-static support matrix has no
       left_anti, so this is the documented equivalent: LEFT OUTER
       against the store + filter the store side null. The static
       side broadcasts when small; re-read per micro-batch, so a
       store appended between batches is picked up.
    2. in-stream check — dropDuplicatesWithinWatermark on the
       fingerprint: state holds fps only within the watermark bound
       (two deliveries of the same doc inside one watermark dedup;
       across waterlines the corpus store, refreshed by the batch
       appender, takes over — that division of labor is what keeps
       stream state from growing with corpus size).
    """
    from mars_spark.llm.text import fingerprint

    fp = stream.withColumn("__fp", fingerprint(F.col(text_col)))
    store = seen_fps.select(F.col("fp").alias("__seen_fp"))
    fresh = (fp.join(store, fp["__fp"] == store["__seen_fp"], "left")
             .filter(F.col("__seen_fp").isNull()).drop("__seen_fp"))
    return (fresh.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__fp"]).drop("__fp"))


def stream_minhash_dedup(stream: SparkDF, seen_bands: SparkDF,
                         text_col: str, ts_col: str = "ts",
                         watermark: str = "10 minutes",
                         num_hashes: int = 8, band_size: int = 2,
                         k: int = 3) -> SparkDF:
    """STREAMING NEAR-dup dedup (r10) — the minhash/LSH pipeline's
    daily-delivery shape: an arriving document is dropped when ANY of
    its LSH band hashes already exists in the persisted corpus band
    store (``seen_bands`` = the (band, band_hash) table
    ``llm.dedup.minhash_bands`` emits for the accepted corpus — same
    salts, bit-identical hashes), so near-duplicates of ANYTHING in
    the corpus never make it in.

    Spark shape, all bounded-state:

    - signatures ride ``llm.dedup.minhash_signature`` — pure Column
      expressions (array_min over salted md5), a stateless per-row
      map that streaming supports natively (the posting-agg form the
      batch path uses needs a shuffle, which a stream map must not);
    - the corpus check is ONE stream-static LEFT join PER BAND
      against the store PRE-FILTERED to that band index (n_bands
      small, fixed); survivors are the rows where every band probe
      missed. Join-per-band instead of explode+groupBy keeps the
      stream side aggregation-free (append semantics, no extra
      watermark state). The ``band == b`` filter is applied to the
      static side BEFORE the join (not as a join condition), so when
      the store is parquet written ``partitionBy("band")`` — the
      layout ``llm.dedup.write_band_store`` produces — each probe is
      a PARTITION-PRUNED scan of 1/n_bands of the store rather than
      n_bands full-store scans per micro-batch. Duplicate rows in
      the store cannot duplicate output: only NON-matching rows
      survive — but matched (dropped) rows multiply against
      duplicate store entries before the filter, so pass the
      DISTINCT (band, band_hash) projection (write_band_store
      distincts on write). The static side re-reads per micro-batch,
      so a store appended between deliveries is picked up.
    - in-stream, documents with an IDENTICAL full signature inside
      the watermark dedup via dropDuplicatesWithinWatermark (state =
      one md5 per distinct signature within the watermark). Two
      DIFFERENT-signature near-dups arriving in the same delivery
      are accepted — by design: the nightly batch pass that appends
      the delivery's bands to the store (minhash_dedup +
      minhash_bands) owns intra-delivery near-dup resolution, the
      stream owns the corpus boundary. That division of labor is
      what keeps stream state O(delivery), never O(corpus).
    """
    from mars_spark.llm.dedup import minhash_signature
    from mars_spark.learn.tsfeatures import _check_user_cols

    # the builder injects __b{n}/__sigfp working columns; a stream
    # already carrying a '__'-name would be clobbered or break the
    # miss-filter — fail fast (mirrors tsfeatures._check_user_cols)
    _check_user_cols("stream_minhash_dedup", list(stream.columns))

    sig = minhash_signature(F.col(text_col), num_hashes, k)
    n_bands = num_hashes // band_size
    out = stream
    for b in range(n_bands):
        out = out.withColumn(
            f"__b{b}",
            F.md5(F.concat_ws(
                "|", *sig[b * band_size:(b + 1) * band_size])))
    out = out.withColumn(
        "__sigfp",
        F.md5(F.concat_ws("|", *[F.col(f"__b{b}")
                                 for b in range(n_bands)])))
    for b in range(n_bands):
        # filter BEFORE the join: a static-side filter reaches the
        # scan (partition pruning on a partitionBy("band") store);
        # the same predicate as a join condition would probe the
        # whole store per band
        sb = (seen_bands.filter(F.col("band") == b)
              .select(F.col("band_hash").alias(f"__shit{b}")))
        out = out.join(
            sb, F.col(f"__b{b}") == F.col(f"__shit{b}"), "left")
    miss = F.lit(True)
    for b in range(n_bands):
        miss = miss & F.col(f"__shit{b}").isNull()
    fresh = out.filter(miss).drop(
        *[f"__b{b}" for b in range(n_bands)],
        *[f"__shit{b}" for b in range(n_bands)])
    return (fresh.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__sigfp"]).drop("__sigfp"))


def stream_semantic_dedup(stream: SparkDF, seen_index: SparkDF,
                          centroids: list[list[float]], vec_col: str,
                          ts_col: str = "ts",
                          watermark: str = "10 minutes",
                          threshold: float = 0.95) -> SparkDF:
    """STREAMING semantic (embedding) near-dup dedup — the SemDeDup
    pipeline's delivery shape, the embedding twin of
    stream_minhash_dedup: an arriving row is dropped when its nearest
    IVF cell in the persisted corpus index contains ANY vector with
    unit-dot >= threshold. ``seen_index`` is the (cluster, e)
    assignment table ``llm.similarity.ivf_index_deterministic``
    produces for the accepted corpus (unit vectors; write it with
    write_ivf_index so it lives partitionBy(cluster));
    ``centroids`` are the same index's unit seed centroids, so the
    stream assigns with bit-identical argmax/first-max semantics.

    Spark shape, all bounded-state:

    - unit-normalization and cell assignment are Arrow-batched
      STATELESS maps (one gemm per batch against the broadcast
      centroid matrix) — streaming-legal, no shuffle, no state;
    - the corpus check is ONE stream-static LEFT join on
      (cluster equality AND dot >= threshold); survivors are the
      null-extended misses. Matched rows multiply per in-cell
      neighbor before the filter, which is fine — they are all
      dropped. Like the batch SemDeDup, the check probes only the
      NEAREST cell (a boundary near-dup in an adjacent cell is
      accepted and left to the nightly batch pass, which owns
      intra-delivery and cross-cell resolution);
    - in-stream, rows with an identical 6dp-rounded unit vector
      dedup via dropDuplicatesWithinWatermark (state = one md5 per
      distinct arrival signature inside the watermark — O(delivery),
      never O(corpus)).

    At 100 TB the static side re-reads per micro-batch; the join
    shuffles on `cluster`, so store the index bucketed by cluster
    (or accept the re-shuffle and keep deliveries chunked —
    stage_chunked_delivery bounds the per-batch volume). Size the
    index's n_clusters WITH the corpus (cells of a few hundred
    vectors, the same rule as batch SemDeDup): the per-arrival probe
    cost is the cell population, so a fixed cell count makes the
    join's pair work grow quadratically with scale — measured in
    SCALE.md r11 (564 s at sf10 with 64 pinned cells vs 120 s with
    ~256-vector cells)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from mars_spark.learn.tsfeatures import _check_user_cols
    from mars_spark.llm.similarity import dot, to_double, unit

    _check_user_cols("stream_semantic_dedup", list(stream.columns))

    C = np.asarray(centroids, dtype=np.float64)

    # no type hints: PEP 563 postponed annotations break pandas_udf
    # signature inspection (see similarity._cosine_to_query_udf)
    def _assign(e):
        if e.empty:
            return pd.Series([], dtype="int32")
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in e])
        # first-max tie-break = smallest centroid id (np.argmax),
        # matching ivf_index_deterministic and the SQL oracle
        return pd.Series(np.argmax(m @ C.T, axis=1).astype(np.int32))

    out = (stream
           .withColumn("__se", unit(to_double(F.col(vec_col))))
           .withColumn("__cl", pandas_udf(_assign, "int")(F.col("__se")))
           .withColumn("__sigfp", F.md5(F.concat_ws(
               "|", F.transform(F.col("__se"),
                                lambda x: F.round(x, 6).cast("string"))))))
    store = seen_index.select(F.col("cluster").alias("__scl"),
                              F.col("e").alias("__ce"))
    joined = out.join(
        store,
        (F.col("__cl") == F.col("__scl"))
        & (dot(F.col("__se"), F.col("__ce")) >= F.lit(threshold)),
        "left")
    fresh = (joined.filter(F.col("__scl").isNull())
             .drop("__scl", "__ce", "__se", "__cl"))
    return (fresh.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__sigfp"]).drop("__sigfp"))


def stage_chunked_delivery(sdf: SparkDF, ts_col: str, path: str,
                           n_chunks: int = 8) -> None:
    """Stage a bounded delivery as ``n_chunks`` event-time-ordered
    parquet files with strictly increasing mtimes — the layout that,
    consumed with ``read_stream(..., maxFilesPerTrigger=1)``, lets the
    watermark advance BETWEEN micro-batches so stateful operators
    evict as they go.

    Why this exists (measured, SCALE.md r11): an availableNow run over
    a single-file delivery is ONE micro-batch, and watermarks only
    advance between batches — a watermarked stream-stream join
    buffered the ENTIRE delivery (4 M state rows / 838 MB at sf10).
    The same delivery staged as 8 time-ordered chunks produced
    IDENTICAL output with ~8× lower peak state: O(delivery/n_chunks +
    watermark window), tunable to any executor budget. At 100 TB:
    never feed a backfill day as one batch; partition the landing
    directory by arrival window.

    Chunk boundaries are epoch-second quantiles (equi-sized chunks
    under any event-time distribution). File mtimes are forced
    strictly increasing because FileStreamSource orders its backlog
    by (modification time, path) — same-second writes would otherwise
    interleave chunks and bounce the watermark (late rows dropped).
    """
    import os
    import shutil
    import time

    from pyspark.sql.types import LongType, TimestampNTZType

    dt = sdf.schema[ts_col].dataType
    if isinstance(dt, LongType):     # TIMESTAMP(NANOS) nanosAsLong read
        sdf = sdf.withColumn(ts_col, F.timestamp_seconds(
            F.expr(f"`{ts_col}` div 1000000000")))
    elif isinstance(dt, TimestampNTZType):   # watermarks reject NTZ
        sdf = sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    evs = sdf.withColumn("__es", F.col(ts_col).cast("long"))
    qs = evs.approxQuantile(
        "__es", [i / n_chunks for i in range(1, n_chunks)], 0.001)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    t0 = time.time()
    lo = None
    for i, hi in enumerate(list(qs) + [None]):
        c = evs
        if lo is not None:
            c = c.filter(F.col("__es") >= lo)
        if hi is not None:
            c = c.filter(F.col("__es") < hi)
        lo = hi
        tmp = f"{path}__w{i}"
        c.drop("__es").coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = f"{path}/chunk_{i:02d}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        os.utime(dst, (t0 + i, t0 + i))
        shutil.rmtree(tmp, ignore_errors=True)
