"""Stateful streaming + connected-components dedup clusters."""

import os
import tempfile

import pandas as pd
import pytest

import mars_spark as ms
from mars_spark.llm.dedup import dedup_clusters
from mars_spark.streaming import read_stream
from mars_spark.streaming.stateful import running_totals


def test_dedup_clusters_transitive(spark):
    # chain 1-2-3, pair 10-11, singleton edges 20-21
    pairs = spark.createDataFrame(pd.DataFrame({
        "a": [1, 2, 10, 20],
        "b": [2, 3, 11, 21],
    }))
    out = dedup_clusters(pairs).toPandas().sort_values("id")
    by_id = dict(zip(out.id, out.cluster))
    assert by_id[1] == by_id[2] == by_id[3] == 1   # transitive chain
    assert by_id[10] == by_id[11] == 10
    assert by_id[20] == by_id[21] == 20


def test_dedup_clusters_long_chain(spark):
    # pathological chain 0-1-2-...-8 converges via min propagation
    pairs = spark.createDataFrame(pd.DataFrame({
        "a": list(range(8)), "b": list(range(1, 9))}))
    out = dedup_clusters(pairs, max_iter=10).toPandas()
    assert set(out.cluster) == {0}


def test_dedup_clusters_star_matches_min_label(spark):
    # the Kiveris'14 alternating-star variant must produce the exact
    # label set of min-label propagation on every topology: chains
    # (diameter-heavy — the star algorithm's home turf), stars,
    # random unions, singleton pairs
    import random

    from mars_spark.llm.dedup import dedup_clusters_star

    rng = random.Random(7)
    edges = (
        [(i, i + 1) for i in range(20)]                 # 21-node chain
        + [(100, 100 + i) for i in range(1, 6)]         # star at 100
        + [(200, 201), (300, 301)]                      # pairs
        + [(rng.randrange(400, 430), rng.randrange(400, 430))
           for _ in range(25)])                         # random blob
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(pd.DataFrame(
        {"a": [a for a, _ in edges], "b": [b for _, b in edges]}))
    want = {r["id"]: r["cluster"]
            for r in dedup_clusters(pairs, max_iter=30).collect()}
    got = {r["id"]: r["cluster"]
           for r in dedup_clusters_star(pairs).collect()}
    assert got == want
    # chain roots at the minimum — diameter 20 handled well inside
    # the O(log^2 n) round bound
    assert got[20] == 0


def test_running_totals_stateful_stream(spark):
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:01", "2024-01-01 00:00:02",
                              "2024-01-01 00:00:03"]),
        "user_id": [1, 1, 2],
        "value": [1.0, 2.0, 5.0],
    })
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = read_stream(spark, "parquet", src,
                             schema="ts timestamp, user_id bigint, value double")
        out = running_totals(stream, "user_id", "value")
        q = (out.writeStream.format("memory").queryName("rt")
             .outputMode("update").start())
        try:
            q.processAllAvailable()
            res = spark.sql("select * from rt").toPandas()
        finally:
            q.stop()
    by_user = res.set_index("user_id")
    assert by_user.loc[1, "n"] == 2 and by_user.loc[1, "total"] == 3.0
    assert by_user.loc[2, "n"] == 1 and by_user.loc[2, "total"] == 5.0
