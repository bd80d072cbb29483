"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``mars_spark`` — pandas-semantics API over Spark plans
(SURVEY.md §7); queries live in mars_spark/queries/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q01 shape) on /root/testdata/sf0.001."""
    from mars_spark.queries.tpch import q1

    return q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mars_spark.queries.tpch import TPCH_QUERIES
    from mars_spark.queries.pipeline import PIPELINE_QUERIES
    from mars_spark.queries.ops import OPS_QUERIES

    out: dict[str, Callable] = {}
    out.update(TPCH_QUERIES)
    out.update(PIPELINE_QUERIES)
    out.update(OPS_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from mars_spark.queries.tpch_oracles import TPCH_ORACLES
    from mars_spark.queries.pipeline_oracles import PIPELINE_ORACLES
    from mars_spark.queries.ops_oracles import OPS_ORACLES

    out: dict[str, str] = {}
    out.update(TPCH_ORACLES)
    out.update(PIPELINE_ORACLES)
    out.update(OPS_ORACLES)
    return out
