"""Local mirror of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, compare row count, schema (column names), and
order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [name_prefix...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, d = normalize(spark_df), normalize(duck_df)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(dv):
            ok = np.allclose(sv.fillna(-1e307), dv.fillna(-1e307),
                             rtol=1e-6, atol=1e-6)
        else:
            ok = (sv.astype(str) == dv.astype(str)).all()
        if not ok:
            bad = (sv.astype(str) != dv.astype(str))
            i = int(np.argmax(bad.values))
            problems.append(
                f"col {c}: first mismatch row {i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    prefixes = sys.argv[2:] or None

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    # Build a PLAIN session (NOT mars_spark.get_spark) to mirror the
    # driver, which passes its own session into queries() — round 1's
    # nanosAsLong bug was invisible here because get_spark set the conf.
    # CHECK_MASTER / CHECK_SHUFFLE / CHECK_MAXPART override the shape —
    # re-running with e.g. local[7] + 200 partitions + 1m splits
    # catches partition-layout-dependent results (verify skill recipe)
    import os
    from pyspark.sql import SparkSession
    builder = (SparkSession.builder
               .master(os.environ.get("CHECK_MASTER", "local[32]"))
               .config("spark.sql.shuffle.partitions",
                       os.environ.get("CHECK_SHUFFLE", "32"))
               .config("spark.driver.memory", "8g"))
    if os.environ.get("CHECK_MAXPART"):
        builder = builder.config("spark.sql.files.maxPartitionBytes",
                                 os.environ["CHECK_MAXPART"])
    spark = builder.appName("check").getOrCreate()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_con(sf_dir)

    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"---- {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_noracle += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex).splitlines()[0][:160]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems[:4]:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} without oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
