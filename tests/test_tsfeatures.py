"""learn.tsfeatures (the tsfresh surface) vs a pure-numpy oracle
implementing the published tsfresh formulas, plus the
contrib.MarsDistributor chunk-fanout contract (reference:
mars/learn/contrib/tsfresh/core.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mars_spark.learn.contrib import MarsDistributor
from mars_spark.learn.tsfeatures import ALL_FEATURES, extract_features


def _oracle(x: np.ndarray) -> dict:
    x = np.asarray(x, float)
    n = len(x)
    mu = x.mean()
    varp = ((x - mu) ** 2).mean()
    d = np.diff(x)

    def strike(mask):
        best = cur = 0
        for m in mask:
            cur = cur + 1 if m else 0
            best = max(best, cur)
        return float(best)

    return {
        "length": float(n),
        "sum_values": x.sum(),
        "mean": mu,
        "standard_deviation": np.sqrt(varp),
        "minimum": x.min(),
        "maximum": x.max(),
        "median": float(np.median(x)),
        "abs_energy": float((x ** 2).sum()),
        "mean_abs_change": float(np.abs(d).mean()) if n > 1 else None,
        "mean_change": float((x[-1] - x[0]) / (n - 1)) if n > 1 else None,
        "cid_ce": float(np.sqrt((d ** 2).sum())),
        "autocorrelation": (
            float(((x[1:] - mu) * (x[:-1] - mu)).sum() / ((n - 1) * varp))
            if n > 1 and varp > 0 else None),
        "linear_trend_slope": (
            float(np.polyfit(np.arange(n), x, 1)[0]) if n > 1 else None),
        "count_above_mean": float((x > mu).sum()),
        "count_below_mean": float((x < mu).sum()),
        "number_crossing_mean": float(np.sum(np.diff(x > mu))),
        "longest_strike_above_mean": strike(x > mu),
        "longest_strike_below_mean": strike(x < mu),
        "absolute_sum_of_changes": float(np.abs(d).sum()),
        "mean_second_derivative_central": (
            float(((x[2:] - 2 * x[1:-1] + x[:-2]) / 2).mean())
            if n > 2 else None),
        "c3": (float((x[2:] * x[1:-1] * x[:-2]).mean())
               if n > 2 else None),
        "time_reversal_asymmetry_statistic": (
            float((x[2:] ** 2 * x[1:-1] - x[1:-1] * x[:-2] ** 2).mean())
            if n > 2 else None),
        "number_peaks": (
            float(np.sum((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:])))
            if n > 2 else 0.0),
        "first_location_of_maximum": float(np.argmax(x)) / n,
        "last_location_of_maximum": (
            float(n - np.argmax(x[::-1])) / n),
        "first_location_of_minimum": float(np.argmin(x)) / n,
        "last_location_of_minimum": (
            float(n - np.argmin(x[::-1])) / n),
        "variance_larger_than_standard_deviation": float(
            varp > np.sqrt(varp)),
        "ratio_beyond_r_sigma": float(
            np.mean(np.abs(x - mu) > np.sqrt(varp))),
        "root_mean_square": float(np.sqrt((x ** 2).mean())),
        "absolute_maximum": float(np.abs(x).max()),
    }


@pytest.fixture(scope="module")
def series_pdf(rng):
    rows = []
    # n=1 (degenerate), n=2, a long one, a constant one (varp == 0),
    # and a few mid-size — shuffled input order so the sort matters
    specs = [(0, 1), (1, 2), (2, 200), (3, 8), (4, 33), (5, 5)]
    for gid, n in specs:
        xs = (np.full(n, 3.25) if gid == 3
              else rng.normal(10, 5, n).round(3))
        for t, v in enumerate(xs):
            rows.append((gid, t, float(v)))
    pdf = pd.DataFrame(rows, columns=["id", "t", "x"])
    return pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)


def test_extract_features_vs_numpy(spark, series_pdf):
    sdf = spark.createDataFrame(series_pdf).repartition(4)
    out = (extract_features(sdf, "id", "t", "x")
           .toPandas().set_index("id").sort_index())
    assert len(out) == series_pdf["id"].nunique()
    for gid, grp in series_pdf.groupby("id"):
        exp = _oracle(grp.sort_values("t")["x"].values)
        for f in ALL_FEATURES:
            got = out.loc[gid, f"x__{f}"]
            if exp[f] is None:
                assert pd.isna(got), (gid, f, got)
            else:
                assert np.isclose(got, exp[f], rtol=1e-9, atol=1e-12), (
                    gid, f, got, exp[f])


def test_constant_series_null_autocorr(spark, series_pdf):
    # gid=3 is constant: sigma^2 == 0 -> autocorrelation null (tsfresh
    # returns nan), strikes/counts 0, crossing 0
    sdf = spark.createDataFrame(series_pdf)
    row = (extract_features(sdf, "id", "t", "x",
                            features=["autocorrelation",
                                      "count_above_mean",
                                      "number_crossing_mean",
                                      "longest_strike_above_mean"])
           .filter("id = 3").toPandas().iloc[0])
    assert pd.isna(row["x__autocorrelation"])
    assert row["x__count_above_mean"] == 0
    assert row["x__number_crossing_mean"] == 0
    assert row["x__longest_strike_above_mean"] == 0


def test_feature_subset_and_unknown(spark, series_pdf):
    sdf = spark.createDataFrame(series_pdf)
    out = extract_features(sdf, "id", "t", "x",
                           features=["mean", "abs_energy"])
    assert out.columns == ["id", "x__mean", "x__abs_energy"]
    with pytest.raises(ValueError, match="unknown features"):
        extract_features(sdf, "id", "t", "x", features=["nope"])


def test_strike_only_request(spark, series_pdf):
    # zero non-strike features: the agg placeholder path
    sdf = spark.createDataFrame(series_pdf)
    out = (extract_features(sdf, "id", "t", "x",
                            features=["longest_strike_below_mean"])
           .toPandas().set_index("id").sort_index())
    assert list(out.columns) == ["x__longest_strike_below_mean"]
    for gid, grp in series_pdf.groupby("id"):
        exp = _oracle(grp.sort_values("t")["x"].values)
        assert (out.loc[gid, "x__longest_strike_below_mean"]
                == exp["longest_strike_below_mean"])


def test_sort_tiebreaker_list(spark):
    # duplicate primary sort key: the tiebreaker column decides the
    # order, so mean_change flips sign between the two orderings
    pdf = pd.DataFrame({"id": [0, 0], "ts": [1, 1],
                        "k": [0, 1], "x": [1.0, 5.0]})
    sdf = spark.createDataFrame(pdf)
    fwd = (extract_features(sdf, "id", ["ts", "k"], "x",
                            features=["mean_change"])
           .toPandas().iloc[0]["x__mean_change"])
    assert fwd == 4.0


def test_mars_distributor_threadpool_and_spark(spark):
    dist = MarsDistributor(spark=spark, n_workers=4)
    assert dist.calculate_best_chunk_size(10) == 3
    # tsfresh contract: distribute returns ONE RESULT LIST PER CHUNK
    # (map_reduce flattens exactly once with chain.from_iterable)
    chunks = [list(range(i)) for i in (1, 2, 3)]
    got = dist.distribute(lambda c, add=0: [sum(c) + add], chunks,
                          {"add": 10})
    assert got == [[10], [11], [13]]
    import itertools
    assert list(itertools.chain.from_iterable(got)) == [10, 11, 13]
    assert dist.distribute(lambda c: [len(c)], [], {}) == []
    # no-session fallback goes through remote.spawn's thread pool
    nospark = MarsDistributor(spark=None)
    nospark._spark = None
    # force the fallback path regardless of the active test session
    import pyspark.sql as _s

    class _NoSess:
        @staticmethod
        def getActiveSession():
            return None

    real = _s.SparkSession
    _s.SparkSession = _NoSess
    try:
        got = nospark.distribute(lambda c: [max(c)], [[1, 2], [9]], {})
    finally:
        _s.SparkSession = real
    assert got == [[2], [9]]
    nospark.close()


def test_extract_features_large_mean_stability(spark):
    # timestamp-like magnitudes: mean ~1e8, std ~1 — the naive
    # E[x^2]-E[x]^2 variance cancels to garbage; var_pop must not
    base = 1.234e8
    xs = [base + v for v in (-1.5, -0.5, 0.0, 0.5, 1.5, 0.25)]
    pdf = pd.DataFrame({"id": [0] * len(xs), "t": range(len(xs)),
                        "x": xs})
    row = (extract_features(spark.createDataFrame(pdf), "id", "t", "x",
                            features=["standard_deviation",
                                      "autocorrelation",
                                      "ratio_beyond_r_sigma"])
           .toPandas().iloc[0])
    x = np.asarray(xs)
    mu, sg = x.mean(), x.std()
    assert np.isclose(row["x__standard_deviation"], sg, rtol=1e-6)
    exp_ac = ((x[1:] - mu) * (x[:-1] - mu)).sum() / ((len(x) - 1) * sg**2)
    assert np.isclose(row["x__autocorrelation"], exp_ac, rtol=1e-3)
    assert row["x__ratio_beyond_r_sigma"] == float(
        np.mean(np.abs(x - mu) > sg))


def test_crossing_through_exact_mean_point(spark):
    # x = [0,1,2], mu = 1: the boolean (x>mu) transitions once
    # ([F,F,T]); the product-sign form would report 0
    pdf = pd.DataFrame({"id": [0, 0, 0], "t": [0, 1, 2],
                        "x": [0.0, 1.0, 2.0]})
    row = (extract_features(spark.createDataFrame(pdf), "id", "t", "x",
                            features=["number_crossing_mean"])
           .toPandas().iloc[0])
    assert row["x__number_crossing_mean"] == 1.0


def test_joblib_backend_batch_path():
    import pytest as _pt

    from mars_spark.learn.contrib import (MarsDistributedBackend,
                                          register_mars_backend)

    be = MarsDistributedBackend(n_parallel=4)
    assert be.configure(n_jobs=-1) == 4

    class _Batch:  # joblib BatchedCalls contract: .items + callable
        def __init__(self, items):
            self.items = items

    got, seen = [], []
    fut = be.apply_async(
        _Batch([(lambda a, b=0: a + b, (2,), {"b": 3}),
                (len, ("abcd",), {})]),
        callback=seen.append)
    got = fut.get()
    assert got == [5, 4] and seen == [[5, 4]]
    nested, _ = be.get_nested_backend()
    assert isinstance(nested, MarsDistributedBackend)
    be.abort_everything(ensure_ready=True)
    assert be.executor is not None
    # joblib itself is absent in this environment: registering the
    # backend must say so honestly
    with _pt.raises(ImportError, match="joblib"):
        register_mars_backend()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# adversarial shapes the fixed fixtures can't reach: repeated values
# (argmax/argmin ties, zero diffs), exact-mean points, negatives,
# single-element and constant series — values kept on a small integer
# lattice so every aggregate is exact in double and the comparison
# can be tight
_series = st.lists(
    st.integers(min_value=-8, max_value=8).map(lambda v: v / 4.0),
    min_size=1, max_size=40)


@given(xs=_series)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_extract_features_property(spark, xs):
    pdf = pd.DataFrame({"id": [0] * len(xs), "t": range(len(xs)),
                        "x": xs})
    out = (extract_features(spark.createDataFrame(pdf), "id", "t", "x")
           .toPandas().iloc[0])
    exp = _oracle(np.asarray(xs))
    for f in ALL_FEATURES:
        got = out[f"x__{f}"]
        if exp[f] is None:
            assert pd.isna(got), (f, got, xs)
        else:
            # sqrt/division features tolerate one ulp of accumulation
            assert np.isclose(got, exp[f], rtol=1e-9, atol=1e-12), (
                f, got, exp[f], xs)


def test_long_format_kind_pivot(spark, series_pdf):
    # tsfresh long format: two kinds per id, featurized independently
    # and pivoted to <kind>__<feature>; values must equal two separate
    # single-kind runs
    a = series_pdf.assign(kind="temp")
    b = series_pdf.assign(kind="hum", x=series_pdf["x"] * 2 + 1)
    long = pd.concat([a, b], ignore_index=True)
    sdf = spark.createDataFrame(long)
    feats = ["mean", "abs_energy", "longest_strike_above_mean"]
    piv = (extract_features(sdf, "id", "t", "x", features=feats,
                            column_kind="kind")
           .toPandas().set_index("id").sort_index())
    assert list(piv.columns) == [f"{k}__{f}" for k in ("hum", "temp")
                                 for f in feats]
    for kname, kdf in (("temp", a), ("hum", b)):
        solo = (extract_features(spark.createDataFrame(kdf),
                                 "id", "t", "x", features=feats)
                .toPandas().set_index("id").sort_index())
        for f in feats:
            assert np.allclose(piv[f"{kname}__{f}"], solo[f"x__{f}"],
                               rtol=1e-12, equal_nan=True), (kname, f)
    # explicit kinds list skips discovery and honors single-feature
    # pivot naming
    one = (extract_features(sdf, "id", "t", "x", features=["mean"],
                            column_kind="kind", kinds=["temp", "hum"])
           .toPandas())
    assert list(one.columns) == ["id", "hum__mean", "temp__mean"]


def test_roll_time_series(spark):
    from mars_spark.learn.tsfeatures import roll_time_series

    # positional windows (gap between t=2 and t=4 does NOT shrink the
    # window, matching tsfresh's observed-point semantics)
    pdf = pd.DataFrame({"id": [0] * 4 + [1] * 2,
                        "t": [1, 2, 4, 5, 10, 11],
                        "x": [1.0, 2.0, 3.0, 4.0, 7.0, 8.0]})
    r = roll_time_series(spark.createDataFrame(pdf), "id", "t",
                         max_timeshift=2)
    got = r.toPandas()
    got["key"] = got["rolled_id"].map(lambda s: (s["id"], s["t"]))
    windows = {k: tuple(sorted(v)) for k, v in
               got.groupby("key")["x"].apply(list).items()}
    assert windows == {
        (0, 1): (1.0,), (0, 2): (1.0, 2.0), (0, 4): (1.0, 2.0, 3.0),
        (0, 5): (2.0, 3.0, 4.0), (1, 10): (7.0,), (1, 11): (7.0, 8.0)}
    # min_timeshift drops windows with <= min_timeshift rows
    r2 = roll_time_series(spark.createDataFrame(pdf), "id", "t",
                          max_timeshift=2, min_timeshift=1)
    keys2 = {(s["id"], s["t"]) for s in
             r2.select("rolled_id").toPandas()["rolled_id"]}
    assert keys2 == {(0, 2), (0, 4), (0, 5), (1, 11)}
    # composes with extract_features via the struct id
    f = (extract_features(r, "rolled_id", "t", "x",
                          features=["length", "mean", "mean_change"])
         .toPandas())
    f["key"] = f["rolled_id"].map(lambda s: (s["id"], s["t"]))
    f = f.set_index("key").sort_index()
    assert f.loc[[(0, 5)], "x__mean"].iloc[0] == 3.0
    assert f.loc[[(0, 4)], "x__length"].iloc[0] == 3.0
    assert f.loc[[(0, 4)], "x__mean_change"].iloc[0] == 1.0
    with pytest.raises(ValueError, match="non-negative"):
        roll_time_series(spark.createDataFrame(pdf), "id", "t", -1)


def test_roll_min_gt_max_raises_and_kind_nulls(spark):
    from mars_spark.learn.tsfeatures import roll_time_series

    pdf = pd.DataFrame({"id": [0, 0], "t": [1, 2], "x": [1.0, 2.0]})
    with pytest.raises(ValueError, match="would drop every window"):
        roll_time_series(spark.createDataFrame(pdf), "id", "t",
                         max_timeshift=2, min_timeshift=5)
    # null kind values: excluded from discovery, pivot drops them
    kpdf = pd.DataFrame({"id": [0, 0, 0], "t": [0, 1, 2],
                         "kind": ["a", None, "a"],
                         "x": [1.0, 9.0, 3.0]})
    out = (extract_features(spark.createDataFrame(kpdf), "id", "t",
                            "x", features=["mean", "length"],
                            column_kind="kind").toPandas())
    assert list(out.columns) == ["id", "a__mean", "a__length"]
    assert out["a__mean"].iloc[0] == 2.0 and out["a__length"].iloc[0] == 2.0


def test_roll_plan_is_equi_join(spark):
    # the window expansion must stay an entity-keyed equi-join (range
    # predicate as a join filter) — a BNLJ/cartesian here would be a
    # scale killer at corpus size
    from mars_spark.learn.tsfeatures import roll_time_series

    pdf = pd.DataFrame({"id": [0] * 5, "t": range(5),
                        "x": np.arange(5.0)})
    r = roll_time_series(spark.createDataFrame(pdf), "id", "t",
                         max_timeshift=2, min_timeshift=1)
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_impute_tsfresh_semantics(spark):
    from mars_spark.learn.tsfeatures import impute

    inf = float("inf")
    pdf = pd.DataFrame({
        "a": [1.0, 2.0, 10.0, np.nan, inf, -inf],   # finite med 2.0
        "b": [np.nan] * 6,                           # all-NaN -> 0
        "c": [5.0] * 6,                              # untouched
        "k": ["x"] * 6,                              # non-numeric
    })
    out = (impute(spark.createDataFrame(pdf))
           .toPandas().sort_values("c").reset_index(drop=True))
    a = sorted(out["a"])
    assert a == [1.0, 1.0, 2.0, 2.0, 10.0, 10.0]  # nan->med(2), inf->10, -inf->1
    assert (out["b"] == 0.0).all()
    assert (out["c"] == 5.0).all() and (out["k"] == "x").all()
    # column_kind-free feature matrix path: nulls from n<2 features
    sdf = spark.createDataFrame(pd.DataFrame(
        {"id": [0, 1, 1], "t": [0, 0, 1], "x": [1.0, 2.0, 4.0]}))
    f = extract_features(sdf, "id", "t", "x",
                         features=["mean", "mean_change"])
    imp = impute(f).toPandas().set_index("id").sort_index()
    # id=0 has n=1 -> mean_change null -> imputed with the column's
    # finite median (id=1's 2.0)
    assert imp.loc[0, "x__mean_change"] == 2.0
