"""Data sources (SURVEY.md §2.1).

Every Mars reader hand-rolls what Spark's DataSource V2 framework gives
natively: byte-range splitting (read_csv.py:81), column pruning hooks
(read_csv.py:119), row-group chunking (read_parquet.py:406), JDBC range
partitioning (read_sql.py:348). Here each source is a thin wrapper that
*preserves* those built-ins — the key discipline is passing explicit
schemas (no inference scans) and letting Catalyst push filters/columns
into the scan (check ``PushedFilters``/``ReadSchema`` in .explain).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mars_spark.core.frame import DataFrame


def _spark() -> SparkSession:
    from mars_spark.session import get_spark

    s = SparkSession.getActiveSession()
    if s is not None:
        return s
    # getActiveSession() is THREAD-LOCAL: inside a ThreadPoolExecutor
    # worker it returns None even though a session exists, and falling
    # through to get_spark() would getOrCreate() — which MUTATES the
    # existing session's runtime SQL confs with mars defaults
    # (observed: shuffle.partitions and nanosAsLong rewritten mid-run
    # under a driver-threaded query row, perturbing every later plan).
    # The process-wide instantiated session is the correct fallback.
    s = SparkSession._instantiatedSession
    return s if s is not None else get_spark()


def _ns_timestamp_cols(path) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    long (nanosAsLong, session.py); we cast back to timestamp."""
    try:
        import pyarrow.dataset as pads

        schema = pads.dataset(path).schema
        return [f.name for f in schema
                if str(f.type).startswith("timestamp[ns")]
    except Exception:
        return []


def epoch_seconds(sdf, col: str):
    """Event-time column → exact epoch seconds, dispatched on the dtype
    Spark actually REPORTS for the column — never on an assumed parquet
    encoding (testdata has shipped the same logical column as
    TIMESTAMP(NANOS)->long, TIMESTAMP_NTZ, and TIMESTAMP across
    environments; reference precedent: Mars infers per-column dtypes at
    graph-build time and dispatches on them,
    mars/dataframe/utils.py build_empty_df).

    - LongType: legacy nanosAsLong read — integer div, exact.
    - TimestampNTZType: NTZ has no BIGINT cast; route through LTZ
      (interpreted in the session timezone — differences/sessionization
      are tz-invariant, and the driver session runs UTC).
    - TimestampType: direct long cast (epoch seconds) is defined.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = sdf.schema[col].dataType
    if isinstance(dt, LongType):
        return F.expr(f"`{col}` div 1000000000")
    if isinstance(dt, TimestampNTZType):
        return F.col(col).cast("timestamp_ltz").cast("long")
    return F.col(col).cast("long")


def read_parquet(path, columns=None, **options) -> DataFrame:
    """reference: mars/dataframe/datasource/read_parquet.py:277.
    File/row-group splitting, partitioned datasets, predicate pushdown
    are native; ``columns`` narrows ReadSchema immediately."""
    paths = path if isinstance(path, (list, tuple)) else [path]
    spark = _spark()
    ns_cols = _ns_timestamp_cols(paths[0])
    if ns_cols:
        # TIMESTAMP(NANOS) is illegal for Spark's vectorized reader unless
        # nanosAsLong is on. Runtime-settable SQL conf — set it on whatever
        # session we were handed (the driver builds its own session, not
        # mars_spark.session.get_spark, so we cannot rely on session.py).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sdf = spark.read.options(**options).parquet(*paths)
    for c in ns_cols:
        # nanos since epoch (long) → micros → timestamp; integer `div`
        # keeps the arithmetic exact (float division loses precision
        # above 2^53 and can flip the truncated microsecond).
        sdf = sdf.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if columns:
        sdf = sdf.select(*columns)
    return DataFrame(sdf)


def read_csv(path, schema=None, header: bool = True, sep: str = ",",
             columns=None, **options) -> DataFrame:
    """reference: mars/dataframe/datasource/read_csv.py:96. Mars splits
    CSVs at byte offsets and seeks newlines by hand; Spark's text
    datasource does identical splitting. Pass ``schema`` to avoid an
    inference scan (Mars mock-infers from the head — same motivation)."""
    reader = _spark().read.options(header=header, sep=sep, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    sdf = reader.csv(path)
    if columns:
        sdf = sdf.select(*columns)
    return DataFrame(sdf)


def read_json(path, schema=None, **options) -> DataFrame:
    reader = _spark().read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return DataFrame(reader.json(path))


def read_orc(path, **options) -> DataFrame:
    return DataFrame(_spark().read.options(**options).orc(path))


def read_sql(table: str, url: str, partition_column: str | None = None,
             lower_bound=None, upper_bound=None, num_partitions: int = 8,
             properties: dict | None = None) -> DataFrame:
    """reference: mars/dataframe/datasource/read_sql.py:73. Mars
    partitions by LIMIT/OFFSET (:289) or numeric/datetime range (:348);
    Spark JDBC implements the range strategy natively. Verified
    end-to-end against embedded Derby (ships in Spark's jars):
    tests/test_sources.py and the op_io_roundtrip driver row."""
    reader = _spark().read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return DataFrame(reader.load())


def from_pandas(pdf, num_partitions: int | None = None) -> DataFrame:
    """reference: mars/dataframe/datasource/dataframe.py:34 (parallelize
    a pandas object) — Arrow-path createDataFrame. Empty frames carry
    no rows to infer from, so the schema is derived from the pandas
    dtypes instead of failing."""
    if len(pdf) == 0:
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema

        schema = from_arrow_schema(
            pa.Schema.from_pandas(pdf, preserve_index=False))
        # an empty object-dtype column infers NullType (VOID) — it
        # would fail confusingly at first write/union; demand dtypes
        void = [f.name for f in schema.fields
                if f.dataType.typeName() == "void"]
        if void:
            raise ValueError(
                f"cannot infer a Spark type for empty object-dtype "
                f"column(s) {void}: give the pandas frame concrete "
                f"dtypes (e.g. .astype({{'col': 'string'}}))")
        sdf = _spark().createDataFrame([], schema=schema)
    else:
        sdf = _spark().createDataFrame(pdf)
    if num_partitions:
        sdf = sdf.repartition(num_partitions)
    return DataFrame(sdf)


def from_spark(sdf) -> DataFrame:
    return DataFrame(sdf)


def range(start: int, end: int | None = None, step: int = 1,
          num_partitions: int | None = None) -> DataFrame:
    """Tensor-creation analog (mars/tensor/datasource/arange.py) —
    spark.range is the scalable constructor for synthetic columns."""
    sdf = _spark().range(start, end, step, num_partitions)
    return DataFrame(sdf)


def date_range(start: str, periods: int, freq: str = "D",
               name: str = "ts") -> DataFrame:
    """reference: mars/dataframe/datasource/date_range.py:122.
    spark.range + interval arithmetic — no driver-side materialization."""
    unit = {"D": "DAY", "H": "HOUR", "h": "HOUR", "T": "MINUTE",
            "min": "MINUTE", "S": "SECOND", "s": "SECOND", "W": "WEEK",
            "M": "MONTH", "MS": "MONTH", "Y": "YEAR"}[freq]
    sdf = _spark().range(0, periods).select(
        F.expr(f"timestampadd({unit}, id, cast('{start}' as timestamp))").alias(name)
    )
    return DataFrame(sdf)
