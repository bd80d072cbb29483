"""Skew-mitigation operators: salting for hot keys, bucketed layouts
for shuffle-free joins.

At 100 TB, a handful of hot keys (a viral user_id, an empty-string
fingerprint, a null join key) can pin a whole stage on one reducer.
Spark's first line of defense is AQE skew-join splitting
(session.py enables it); these helpers cover what AQE cannot:

- skewed AGGREGATIONS (AQE only splits joins): two-stage salted agg;
- skewed joins against a small-but-not-broadcastable side: explicit
  salt + replicate;
- repeat joins on the same key: bucketed table layout so the shuffle
  happens once at write time (reference analog: Mars pre-aligns chunks
  by hash — mars/dataframe/merge/merge.py:70 DataFrameMergeAlign —
  which is exactly a bucketed exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from mars_spark.core.groupby import _AGG_FUNCS

# aggregate functions that decompose into (partial, final) pairs for
# the two-stage salted plan
_SALT_DECOMP = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def salted_groupby_agg(sdf: SparkDF, keys: list[str], aggs: dict[str, str],
                       salt_buckets: int = 16) -> SparkDF:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups on (keys, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 re-aggregates the partials on
    the true keys (tiny input: one row per key per bucket). Supports
    decomposable aggs (sum/count/min/max) plus mean (sum+count pair).
    Catalyst's own partial aggregation handles MODERATE skew already —
    use this when one key dominates entire partitions.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    salted = sdf.withColumn("__salt", salt)

    partial_exprs, final_exprs = [], []
    for col, fn in aggs.items():
        if fn == "mean":
            partial_exprs += [F.sum(col).alias(f"__s_{col}"),
                              F.count(col).alias(f"__c_{col}")]
            final_exprs += [
                (F.sum(f"__s_{col}") / F.sum(f"__c_{col}")).alias(col)]
        elif fn in _SALT_DECOMP:
            p, f_ = _SALT_DECOMP[fn]
            partial_exprs.append(_AGG_FUNCS[p](F.col(col)).alias(f"__p_{col}"))
            final_exprs.append(_AGG_FUNCS[f_](F.col(f"__p_{col}")).alias(col))
        else:
            raise ValueError(f"non-decomposable agg for salting: {fn}")
    stage1 = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return stage1.groupBy(*keys).agg(*final_exprs)


def salted_join(big: SparkDF, small: SparkDF, on: str,
                salt_buckets: int = 8, how: str = "inner") -> SparkDF:
    """Skewed equi-join without broadcast: salt the big side's key,
    replicate the small side once per salt bucket (explode over a
    literal range — small side grows ×buckets, big side's hot key
    spreads over ``salt_buckets`` reducers).

    Prefer broadcast when the small side fits; prefer AQE skew-join
    when both sides are large. This is the middle case.
    """
    big_s = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_r = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    out = big_s.join(small_r, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(sdf: SparkDF, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist with a bucketed layout: the shuffle happens ONCE at
    write; every later join/agg on ``bucket_cols`` between tables with
    matching bucketing plans with NO Exchange (check explain_audit).
    The Spark-native answer to Mars's chunk-aligned merge."""
    writer = (sdf.write.mode(mode)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark, table: str) -> SparkDF:
    return spark.table(table)
