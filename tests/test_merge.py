"""Join tests vs pandas oracle.

Reference test pattern: mars/dataframe/merge/tests/
test_merge_execution.py:26-148 (Mars sweeps method=auto|shuffle|
broadcast + bloom on/off; Spark's planner picks, we sweep the
broadcast hint only).
"""

import pandas as pd
import pytest

import mars_spark as ms
from mars_spark.operators.merge import merge_asof
from tests.conftest import assert_frame_equal


@pytest.fixture(scope="module")
def frames(spark, pdf_join):
    left, right = pdf_join
    return (ms.from_pandas(left, num_partitions=4),
            ms.from_pandas(right, num_partitions=2), left, right)


@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
@pytest.mark.parametrize("broadcast", [None, True])
def test_merge_hows(frames, how, broadcast):
    ml, mr, left, right = frames
    out = ml.merge(mr, on="key", how=how, broadcast=broadcast).to_pandas()
    exp = left.merge(right, on="key", how=how)
    assert len(out) == len(exp)
    assert sorted(out.columns) == sorted(exp.columns)
    # value check on the joined sums (order-insensitive)
    assert abs(out.val_x.sum() - exp.val_x.sum()) < 1e-6


def test_merge_left_on_right_on(frames):
    ml, mr, left, right = frames
    r2 = mr.rename(columns={"key": "rkey"})
    out = ml.merge(r2, left_on="key", right_on="rkey").to_pandas()
    exp = left.merge(right.rename(columns={"key": "rkey"}),
                     left_on="key", right_on="rkey")
    assert len(out) == len(exp)
    assert "key" in out.columns and "rkey" in out.columns


def test_merge_suffixes(frames):
    ml, mr, left, right = frames
    out = ml.merge(mr, on="key", suffixes=("_l", "_r")).to_pandas()
    exp = left.merge(right, on="key", suffixes=("_l", "_r"))
    assert sorted(out.columns) == sorted(exp.columns)


def test_semi_anti(frames):
    ml, mr, left, right = frames
    semi = ml.merge(mr[["key"]].drop_duplicates(), on="key", how="semi")
    anti = ml.merge(mr[["key"]].drop_duplicates(), on="key", how="anti")
    in_right = left.key.isin(set(right.key))
    assert semi.count() == int(in_right.sum())
    assert anti.count() == int((~in_right).sum())


def test_cross_join(spark):
    a = ms.from_pandas(pd.DataFrame({"x": [1, 2]}))
    b = ms.from_pandas(pd.DataFrame({"y": [10, 20, 30]}))
    assert a.crossJoin(b).count() == 6


def test_merge_asof_vs_pandas(spark):
    left = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 5,
        "t": list(range(0, 50, 10)) * 2,
        "lv": range(10),
    })
    right = pd.DataFrame({
        "g": ["a", "a", "b", "b"],
        "t": [5, 25, 14, 40],
        "rv": [100, 200, 300, 400],
    })
    ml, mr = ms.from_pandas(left), ms.from_pandas(right)
    out = merge_asof(ml, mr, on="t", by="g").to_pandas()
    exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                        on="t", by="g")
    assert_frame_equal(out, exp, sort_by=["g", "t"])


def test_merge_asof_tolerance(spark):
    left = pd.DataFrame({"t": [1, 10, 20], "lv": [1, 2, 3]})
    right = pd.DataFrame({"t": [0, 9], "rv": [10, 20]})
    out = merge_asof(ms.from_pandas(left), ms.from_pandas(right),
                     on="t", tolerance=2).to_pandas().sort_values("t")
    exp = pd.merge_asof(left, right, on="t", tolerance=2)
    assert_frame_equal(out, exp, sort_by=["t"])


def test_merge_asof_carries_matched_row_nulls(spark):
    import pandas as pd
    left = pd.DataFrame({"t": [5, 10], "g": ["a", "a"]})
    # the matched right row (t=4) has a null in v2: pandas carries that
    # null, not an older non-null value from t=1
    right = pd.DataFrame({"t": [1, 4], "g": ["a", "a"],
                          "v1": [100.0, 200.0], "v2": [7.0, None]})
    lf = ms.from_spark(spark.createDataFrame(left))
    rf = ms.from_spark(spark.createDataFrame(right))
    out = (merge_asof(lf, rf, on="t", by="g").to_pandas()
           .sort_values("t").reset_index(drop=True))
    assert list(out.v1) == [200.0, 200.0]
    assert out.v2.isna().all()


def test_merge_indicator(spark):
    import pandas as pd
    l = ms.from_spark(spark.createDataFrame(pd.DataFrame({"k": [1, 2]})))
    r = ms.from_spark(spark.createDataFrame(pd.DataFrame({"k": [2, 3]})))
    out = l.merge(r, on="k", how="outer", indicator=True).to_pandas()
    got = dict(zip(out.k, out._merge))
    assert got == {1: "left_only", 2: "both", 3: "right_only"}


def test_merge_asof_nearest_and_exact_matches(spark):
    left = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4,
        "t": [0, 7, 15, 30] * 2,
        "lv": range(8),
    })
    right = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b"],
        "t": [5, 15, 26, 8, 30],
        "rv": [100, 200, 300, 400, 500],
    })
    ml, mr = ms.from_pandas(left), ms.from_pandas(right)
    for direction in ["nearest", "backward", "forward"]:
        for exact in [True, False]:
            out = merge_asof(ml, mr, on="t", by="g", direction=direction,
                             allow_exact_matches=exact).to_pandas()
            exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                                on="t", by="g", direction=direction,
                                allow_exact_matches=exact)
            assert_frame_equal(out, exp, sort_by=["g", "t"]), (direction, exact)
    # nearest + tolerance
    out = merge_asof(ml, mr, on="t", by="g", direction="nearest",
                     tolerance=4).to_pandas()
    exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                        on="t", by="g", direction="nearest", tolerance=4)
    assert_frame_equal(out, exp, sort_by=["g", "t"])


def test_merge_range_bucket_decomposition(spark):
    """merge_range: point-in-[lo,hi) with by-keys; the bucket
    decomposition must plan an equi hash join, never
    BroadcastNestedLoopJoin; boundary semantics lo inclusive / hi
    exclusive."""
    from mars_spark.operators.merge import merge_range

    pts = ms.from_pandas(pd.DataFrame({
        "g": ["a", "a", "b", "a"], "p": [5, 10, 5, 29]}))
    iv = ms.from_pandas(pd.DataFrame({
        "g": ["a", "a", "b"], "lo": [0, 8, 0], "hi": [10, 30, 4],
        "tag": ["i1", "i2", "i3"]}))
    out = merge_range(pts, iv, "p", "lo", "hi", by="g",
                      bucket_width=8).to_pandas()
    got = sorted(zip(out.p, out.tag))
    # p=5(a)->i1 only; p=10(a)->i2 (hi=10 exclusive on i1);
    # p=5(b) outside i3 (hi=4); p=29(a)->i2
    assert got == [(5, "i1"), (10, "i2"), (29, "i2")]
    plan = merge_range(pts, iv, "p", "lo", "hi", by="g", bucket_width=8) \
        .to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
