"""Skew-mitigation + bucketing tests (incl. plan assertions)."""

import numpy as np
import pandas as pd
import pytest

import mars_spark as ms
from mars_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark, rng):
    # one key owns 80% of rows
    keys = np.where(rng.random(5000) < 0.8, 7, rng.integers(0, 100, 5000))
    return pd.DataFrame({"k": keys, "v": rng.standard_normal(5000)})


def test_salted_groupby_matches_plain(spark, skewed):
    sdf = ms.from_pandas(skewed, num_partitions=8).to_spark()
    out = skew.salted_groupby_agg(
        sdf, ["k"], {"v": "sum"}, salt_buckets=16).toPandas()
    exp = skewed.groupby("k", as_index=False).agg(v=("v", "sum"))
    m = out.sort_values("k").reset_index(drop=True)
    e = exp.sort_values("k").reset_index(drop=True)
    np.testing.assert_allclose(m.v.values, e.v.values)


def test_salted_mean(spark, skewed):
    sdf = ms.from_pandas(skewed, num_partitions=8).to_spark()
    out = skew.salted_groupby_agg(
        sdf, ["k"], {"v": "mean"}, salt_buckets=8).toPandas()
    exp = skewed.groupby("k", as_index=False).agg(v=("v", "mean"))
    np.testing.assert_allclose(
        out.sort_values("k").v.values, exp.sort_values("k").v.values)


def test_salted_join_matches_plain(spark, skewed):
    big = ms.from_pandas(skewed, num_partitions=8).to_spark()
    dim = ms.from_pandas(pd.DataFrame({
        "k": range(100), "name": [f"k{i}" for i in range(100)]})).to_spark()
    out = skew.salted_join(big, dim, on="k", salt_buckets=4).toPandas()
    exp = skewed.merge(pd.DataFrame({
        "k": range(100), "name": [f"k{i}" for i in range(100)]}), on="k")
    assert len(out) == len(exp)
    assert out[out.k == 7].name.eq("k7").all()


def test_non_decomposable_raises(spark, skewed):
    sdf = ms.from_pandas(skewed).to_spark()
    with pytest.raises(ValueError, match="non-decomposable"):
        skew.salted_groupby_agg(sdf, ["k"], {"v": "median"})


def test_bucketed_join_no_exchange(spark, rng, tmp_path):
    """The point of bucketing: repeat joins on the bucket key plan
    without a shuffle of either side."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    n = 2000
    a = pd.DataFrame({"k": rng.integers(0, 500, n), "x": rng.random(n)})
    b = pd.DataFrame({"k": rng.integers(0, 500, n), "y": rng.random(n)})
    skew.write_bucketed(ms.from_pandas(a).to_spark(), "bt_a", ["k"], 8)
    skew.write_bucketed(ms.from_pandas(b).to_spark(), "bt_b", ["k"], 8)
    ta, tb = skew.read_table(spark, "bt_a"), skew.read_table(spark, "bt_b")
    # disable broadcast so the join must co-locate
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert joined.count() == len(a.merge(b, on="k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
