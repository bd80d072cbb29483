"""Testdata-schema canary (VERDICT r5 #2): r5's 169-test suite was
green while three driver rows were broken, because the suite only
exercises synthetic frames — the driver regenerated
/root/testdata with events.ts as timestamp[us] (TIMESTAMP_NTZ) and the
engine's timestamp handling assumed the old TIMESTAMP(NANOS) encoding.

These tests read the LIVE testdata parquet and drive the exact code
paths that broke (events_sessions gap arithmetic, _stream_source plan
construction, epoch_seconds dispatch), so environment drift fails fast
in pytest instead of surfacing only in the driver run.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"),
    reason="driver testdata not present")


def test_events_ts_reads_as_timestamp(spark):
    from mars_spark.sources.io import read_parquet

    e = read_parquet(f"{SF_DIR}/events.parquet")
    dt = e.to_spark().schema["ts"].dataType.typeName()
    # whatever the parquet encoding (nanos-as-long converted, us, ltz),
    # the engine must surface a timestamp dtype to query code
    assert dt.startswith("timestamp"), dt


def test_epoch_seconds_all_dtypes(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from mars_spark.sources.io import epoch_seconds, read_parquet

    # live testdata flavor
    e = read_parquet(f"{SF_DIR}/events.parquet").to_spark()
    row = (e.select(epoch_seconds(e, "ts").alias("sec"), "ts")
           .orderBy("event_id").first())
    pdf = e.select("ts").orderBy(e.event_id).limit(1).toPandas()
    expect = pd.Timestamp(pdf.ts.iloc[0]).value // 1_000_000_000
    assert row["sec"] == expect
    # synthetic LTZ + legacy long flavors dispatch correctly too
    ltz = spark.createDataFrame([("2024-01-01 00:00:10",)], "s string") \
        .select(F.col("s").cast("timestamp").alias("ts"))
    assert ltz.select(epoch_seconds(ltz, "ts").alias("x")).first()["x"] \
        == 1704067210
    lng = spark.createDataFrame([(1704067210_000_000_000,)], "ts long")
    assert lng.select(epoch_seconds(lng, "ts").alias("x")).first()["x"] \
        == 1704067210


def test_events_sessions_runs_on_live_testdata(spark):
    import duckdb

    from mars_spark.queries.pipeline import events_sessions

    got = {(r["user_id"], r["n_sessions"], r["n_events"])
           for r in events_sessions(spark, SF_DIR).collect()}
    exp = {tuple(r) for r in duckdb.sql(f"""
        SELECT user_id, sum(new_sess), count(*) FROM (
            SELECT user_id,
                   CASE WHEN prev IS NULL
                             OR floor(epoch(ts))::BIGINT
                                - floor(epoch(prev))::BIGINT > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             AS prev
                  FROM read_parquet('{SF_DIR}/events.parquet'))
        ) GROUP BY user_id""").fetchall()}
    assert got == exp


def test_stream_source_plan_builds_on_live_testdata(spark):
    from mars_spark.queries.pipeline import _stream_source
    from mars_spark.streaming.core import tumbling_agg

    src = _stream_source(spark, SF_DIR)
    assert src.isStreaming
    # watermark requires TIMESTAMP (not NTZ/long) — plan construction
    # throws at analysis time if the dtype normalization regressed
    agg = tumbling_agg(src, "ts", "1 hour", ["event_type"],
                       {"value": "sum"}, watermark="30 minutes")
    assert "window_start" in agg.columns
