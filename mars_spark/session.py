"""SparkSession factory with scale-oriented defaults.

Centralizes the configuration we want on a real cluster as well as in
local tests. The knobs below are the Spark-native replacements for the
reference engine's adaptive machinery (see SURVEY.md §4.2): AQE replaces
Mars's dynamic tiling / auto merge-method selection, runtime bloom
filters replace its join bloom-filter pre-filter
(reference: mars/dataframe/merge/merge.py:369), skew-join handling
replaces its groupby auto-method sampling
(reference: mars/dataframe/groupby/aggregation.py:887).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # --- adaptive execution: Spark's answer to Mars's runtime re-tiling ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalescing target (upstream default stated explicitly).
    # Per-stage parallelism is data-volume / advisory by design — at
    # bench scale that is a handful of reduce tasks, at 100 TB it is
    # thousands. Env-overridable for core-scaling probes.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes":
        os.environ.get("SPARK_GRAFT_ADVISORY", "64m"),
    # runtime semi-join filtering (Mars: bloom_filter pre-join filter).
    # NOTE: runtimeFilter.semiJoinReduction hangs job execution on this
    # Spark 4.1.2 local build — do not enable it.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # read TIMESTAMP(NANOS) parquet as long; sources.io.read_parquet
    # converts back to timestamp (Spark has no native nanos reader)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # --- Arrow for every Python<->JVM hop (pandas UDFs, toPandas) ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # --- shuffle sizing: tests run tiny; a real cluster should size
    # partitions so ~128MB each lands per reducer. AQE coalesces down. ---
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # scan split size: 128 MB default (the upstream default). On a real
    # table the scan fans out over thousands of files; the local scale
    # fixtures are ONE parquet file per table, so split size alone
    # decides scan parallelism there — overridable for core-scaling
    # probes without changing the production default.
    "spark.sql.files.maxPartitionBytes":
        os.environ.get("SPARK_GRAFT_MAXPART", "134217728"),
    # broadcast threshold: dimension tables (region/nation/supplier/part
    # at small SF) should broadcast; AQE can also convert at runtime.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # generated-class cache: the default 100-entry LRU thrashes on a
    # many-query session (a 50-row analytics corpus compiles hundreds
    # of distinct wholestage classes; evicted entries recompile at
    # ~0.1-0.5 s each on every subsequent pass). Static conf, read
    # once at codegen-cache construction.
    "spark.sql.codegen.cache.maxEntries": "5000",
    # whole-stage-codegen fallback threshold, aligned to HotSpot's JIT
    # HugeMethodLimit (8000 bytecode bytes): a generated method bigger
    # than that is NEVER JIT-compiled, so the "compiled" stage runs as
    # interpreted bytecode — slower than Spark's own interpreted
    # expression path with its compiled-regex caching. The big
    # regex-conjunction predicates (quality_predicate & co) hit this:
    # measured 2.4 s -> 0.66 s on the clean_corpus filter stage and
    # docs_curation_ops 7.4 -> 6.6 s, with every other corpus row flat
    # (8-row interleaved A/B, values identical). Scale-independent:
    # the JIT limit is a JVM constant, not a local-mode artifact.
    "spark.sql.codegen.hugeMethodLimit": "8000",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "mars_spark", master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster, leave unset and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    spark = SparkSession.getActiveSession()
    if spark is not None:
        spark.stop()


def register(df, name: str) -> None:
    """Expose a frame to SQL as a temp view (Mars has no SQL surface —
    SURVEY.md §2.8 notes Spark's is free). Lazy: registering plans
    nothing."""
    sdf = df._sdf if hasattr(df, "_sdf") else df
    sdf.createOrReplaceTempView(name)


def sql(query: str):
    """Run ANSI SQL over registered views and get an engine frame
    back — the full Catalyst surface (CTEs, window functions,
    grouping sets) composes with the pandas-style API on the result."""
    from mars_spark.core.frame import DataFrame

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession — call get_spark()")
    return DataFrame(spark.sql(query))
