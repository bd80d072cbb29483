"""Learn-surface parity extras (learn/extras.py, datasets
make_low_rank_matrix, contrib name coverage) — sklearn-formula
numpy/pandas oracles (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import mars_spark as ms
from mars_spark import learn as L


@pytest.fixture(scope="module")
def mdf(spark):
    return spark.createDataFrame(pd.DataFrame(
        {"y": [1.0, 1, 1, 0, 0, 0, 1, 0],
         "p": [1.0, 1, 0, 0, 0, 1, 1, 1],
         "s": [.9, .8, .4, .3, .2, .7, .85, .6]}))


def test_k_means_function_form(spark):
    pts = pd.DataFrame({"vec_id": range(6),
                        "v": [[0.0, 0], [0.1, 0], [0, 0.1],
                              [5.0, 5], [5.1, 5], [5, 5.1]]})
    cents, labeled, inertia = L.k_means(
        spark.createDataFrame(pts), "v", n_clusters=2,
        init=[[0.0, 0.0], [5.0, 5.0]], max_iter=3)
    assert sorted(r.cluster for r in labeled.collect()) == [0] * 3 + [1] * 3
    # converged centers are the cluster means; inertia = within-ss
    assert cents.round(3).tolist() == [[0.033, 0.033], [5.033, 5.033]]
    X = np.asarray(pts.v.tolist())
    exp = sum(((X[i * 3:(i + 1) * 3] - X[i * 3:(i + 1) * 3].mean(0)) ** 2)
              .sum() for i in (0, 1))
    assert inertia == pytest.approx(exp, rel=1e-6)


def test_classification_metric_forms(mdf):
    # hand confusion: TP=3 FP=2 FN=1 TN=2
    assert L.precision_score(mdf, "y", "p") == pytest.approx(3 / 5)
    assert L.recall_score(mdf, "y", "p") == pytest.approx(3 / 4)
    assert L.f1_score(mdf, "y", "p") == pytest.approx(2 * 0.6 * 0.75
                                                      / 1.35)
    b2 = 4.0
    p, r = 0.6, 0.75
    assert L.fbeta_score(mdf, "y", "p", beta=2.0) == pytest.approx(
        (1 + b2) * p * r / (b2 * p + r))
    prfs = L.precision_recall_fscore_support(mdf, "y", "p")
    assert prfs[0] == pytest.approx(p) and prfs[3] == 4
    mcm, classes = L.multilabel_confusion_matrix(mdf, "y", "p")
    assert classes == [0.0, 1.0]
    assert mcm[1].tolist() == [[2, 2], [1, 3]]
    assert mcm[0].tolist() == [[3, 1], [2, 2]]


def test_roc_curve_and_auc(mdf):
    fpr, tpr, thr = L.roc_curve(mdf, "y", "s")
    assert fpr[0] == 0.0 and tpr[0] == 0.0 and np.isinf(thr[0])
    assert fpr[-1] == 1.0 and tpr[-1] == 1.0
    assert (np.diff(fpr) >= 0).all() and (np.diff(tpr) >= 0).all()
    # trapezoid AUC equals the rank-based estimator (no score ties)
    assert L.auc(fpr, tpr) == pytest.approx(
        L.roc_auc_score(mdf, "y", "s"))


def test_roc_curve_binned_parity(mdf, spark):
    # scores on a 0.05 grid with 100 bins: each distinct score owns
    # its bucket, so the bounded variant is IDENTICAL to exact
    fpr, tpr, thr = L.roc_curve(mdf, "y", "s")
    bf, bt, bthr = L.roc_curve(mdf, "y", "s", thresholds=100)
    assert bf.tolist() == fpr.tolist()
    assert bt.tolist() == tpr.tolist()
    assert bthr.tolist() == thr.tolist()
    # coarse bins: still a valid monotone curve ending at (1,1),
    # with at most thresholds+1 points, and trapezoid auc within
    # one-bin resolution of the exact curve
    cf, ct, cthr = L.roc_curve(mdf, "y", "s", thresholds=3)
    assert len(cthr) <= 4
    assert cf[0] == 0.0 and ct[0] == 0.0
    assert cf[-1] == 1.0 and ct[-1] == 1.0
    assert (np.diff(cf) >= 0).all() and (np.diff(ct) >= 0).all()
    assert abs(L.auc(cf, ct) - L.auc(fpr, tpr)) < 0.5
    # degenerate constant-score column falls back to one point
    const = spark.createDataFrame(pd.DataFrame(
        {"y": [1.0, 0.0], "s": [0.5, 0.5]}))
    df2, dt2, _ = L.roc_curve(const, "y", "s", thresholds=8)
    assert df2[-1] == 1.0 and dt2[-1] == 1.0


def test_pairwise_named_forms(spark):
    e = spark.createDataFrame(pd.DataFrame(
        {"vec_id": [0, 1], "v": [[1.0, 0], [0.0, 1]]}))
    sim = {r.vec_id: r.similarity for r in
           L.cosine_similarity(e, [[1.0, 0]], "v", "vec_id").collect()}
    assert sim[0] == pytest.approx(1.0) and sim[1] == pytest.approx(0.0)
    d = {r.vec_id: r.dist for r in
         L.euclidean_distances(e, [[0.0, 0]], "v", "vec_id").collect()}
    assert d == {0: pytest.approx(1.0), 1: pytest.approx(1.0)}
    rk = {r.vec_id: r.dist for r in
          L.rbf_kernel(e, [[1.0, 0]], "v", "vec_id",
                       gamma=1.0).collect()}
    assert rk[0] == pytest.approx(1.0)
    assert rk[1] == pytest.approx(np.exp(-2.0))


def test_kfold_partition(spark):
    kf = L.KFold(3, seed=1)
    base = spark.range(30)
    folds = list(kf.split(base, "id"))
    test_ids = [set(r.id for r in t.collect()) for _, t in folds]
    # disjoint cover
    assert set().union(*test_ids) == set(range(30))
    assert sum(len(t) for t in test_ids) == 30
    # train = complement
    for (tr, _), te in zip(folds, test_ids):
        assert set(r.id for r in tr.collect()) == set(range(30)) - te
    # deterministic across layouts
    again = [set(r.id for r in t.collect())
             for _, t in L.KFold(3, seed=1).split(base.repartition(7),
                                                  "id")]
    assert again == test_ids


def test_label_binarize_and_minmax(spark):
    lbdf = spark.createDataFrame(pd.DataFrame(
        {"c": ["a", "b", "c", "a"], "v": [0.0, 5.0, 10.0, 2.5]}))
    lb = L.LabelBinarizer().fit(lbdf, "c")
    assert lb.classes_ == ["a", "b", "c"]
    out = lb.transform(lbdf, "c").orderBy("c", "v").toPandas()
    assert out.c_a.tolist() == [1, 1, 0, 0]
    # binary contract: single indicator column
    bdf = spark.createDataFrame(pd.DataFrame({"c": ["x", "y"]}))
    assert "c_bin" in L.label_binarize(bdf, "c").columns
    sc = L.minmax_scale(lbdf, "v").toPandas()
    assert sorted(sc.v) == [0.0, 0.25, 0.5, 1.0]


def test_utils_validators(spark, mdf):
    L.check_consistent_length(mdf, mdf)
    with pytest.raises(ValueError, match="inconsistent"):
        L.check_consistent_length(mdf, mdf.limit(3))
    L.assert_all_finite(mdf)
    bad = spark.createDataFrame(pd.DataFrame({"v": [1.0, float("nan")]}))
    with pytest.raises(ValueError, match="null/NaN/inf"):
        L.assert_all_finite(bad)
    L.check_array(mdf)
    L.check_X_y(mdf, "s", "y")
    with pytest.raises(ValueError, match="missing column"):
        L.check_X_y(mdf, "nope", "y")
    f = ms.from_spark(mdf)
    assert L.type_of_target(f.y) == "binary"
    assert L.type_of_target(f.s) == "continuous"
    assert not L.is_multilabel(f.y)
    assert L.column_or_1d(f[["y"]]).name == "y"
    est = L.MinMaxScaler()
    with pytest.raises(ValueError, match="not fitted"):
        L.check_is_fitted(est, "mins_")


def test_parallel_post_fit(spark):
    class Doubler:
        def predict(self, X):
            return X.sum(axis=1) * 2

    e = spark.createDataFrame(pd.DataFrame(
        {"vec_id": [0, 1], "v": [[1.0, 2.0], [3.0, 4.0]]}))
    out = {r.vec_id: r.prediction for r in
           L.ParallelPostFit(Doubler()).predict(e, "v").collect()}
    assert out == {0: 6.0, 1: 14.0}


def test_blockwise_and_bagging_classifier(spark, rng):
    n = 200
    X = rng.normal(0, 1, (n, 2))
    yl = 3 * X[:, 0] - X[:, 1] + 1
    bdf = spark.createDataFrame(pd.DataFrame(
        {"x1": X[:, 0], "x2": X[:, 1], "y": yl})).repartition(4)
    bv = L.BlockwiseVotingRegressor().fit(bdf, ["x1", "x2"], "y")
    assert len(bv.models_) == 4
    pred = bv.predict(bdf).toPandas()
    assert ((pred.y - pred.prediction) ** 2).mean() < 1e-12
    a = rng.normal(0, .3, (100, 2))
    b = rng.normal(5, .3, (100, 2))
    cdf = spark.createDataFrame(pd.DataFrame(
        {"x1": np.r_[a[:, 0], b[:, 0]], "x2": np.r_[a[:, 1], b[:, 1]],
         "y": [0.0] * 100 + [1.0] * 100})).repartition(4)
    bc = L.BlockwiseVotingClassifier().fit(cdf, ["x1", "x2"], "y")
    pc = bc.predict(cdf).toPandas()
    assert (pc.y == pc.prediction).all()
    import pyspark.sql.functions as SF

    fdf = cdf.withColumn("f", SF.array("x1", "x2"))
    bag = L.BaggingClassifier(n_estimators=2, max_iter=10) \
        .fit(fdf, "f", "y")
    pb = bag.predict(fdf).toPandas()
    assert (pb.y == pb.prediction).mean() == 1.0


def test_blockwise_regressor_rank_deficient_block(spark, rng):
    """r14 (ADVICE): a partition where a feature is constant is
    collinear with the intercept column — QR's R is singular there.
    The fit must fall back to the min-norm lstsq solution for that
    block instead of raising LinAlgError inside the UDF."""
    n = 120
    x1 = rng.normal(0, 1, n)
    pdf = pd.DataFrame({
        # x2 constant on the whole frame -> constant in EVERY block
        "x1": x1, "x2": np.full(n, 3.0), "y": 2 * x1 + 5})
    bdf = spark.createDataFrame(pdf).repartition(3)
    bv = L.BlockwiseVotingRegressor().fit(bdf, ["x1", "x2"], "y")
    assert len(bv.models_) == 3
    pred = bv.predict(bdf).toPandas()
    # min-norm solution still reproduces y exactly on the fit data
    assert ((pred.y - pred.prediction) ** 2).mean() < 1e-12


def test_make_low_rank_matrix(spark):
    lr = L.make_low_rank_matrix(spark, 60, n_features=8,
                                effective_rank=2, seed=3)
    M = np.vstack([np.asarray(r.features) for r in lr.collect()])
    assert M.shape == (60, 8)
    sv = np.linalg.svd(M, compute_uv=False)
    # bell-shaped profile: energy concentrates in the leading ranks
    assert sv[3] / sv[0] < 0.5
    # deterministic across partition layouts
    lr2 = L.make_low_rank_matrix(spark, 60, n_features=8,
                                 effective_rank=2, seed=3) \
        .repartition(5)
    M2rows = {r.sample_id: r.features for r in lr2.collect()}
    assert np.allclose(M, np.vstack(
        [np.asarray(M2rows[i]) for i in range(60)]))


def test_contrib_names_and_docs_sweep():
    import re

    from mars_spark.learn import contrib as C

    # the documented bridge names exist and raise the honest
    # library-absent signal (libs re-verified absent by import)
    with pytest.raises(ImportError, match="lightgbm"):
        C.LGBMRanker().fit(None)
    with pytest.raises(ImportError):
        C.run_pytorch_script()
    with pytest.raises(ImportError):
        C.MarsDataset()
    m = C.MarsDMatrix(None, "f", "y")  # holder constructs fine
    with pytest.raises(ImportError, match="xgboost"):
        C.train({}, m)
    # full learn docs page resolves
    path = ("/root/reference/docs/source/reference/learn/"
            "reference.rst")
    try:
        entries = [mm.group(1) for line in open(path)
                   for mm in [re.match(r'^   ([\w.]+)\s*$', line)] if mm]
    except OSError:
        pytest.skip("reference docs not available")
    missing = [e for e in entries
               if not (hasattr(L, e.split(".")[-1])
                       or hasattr(C, e.split(".")[-1]))]
    assert missing == []


# ------------------------------------------------------------- gbm ----
@pytest.fixture(scope="module")
def sep_df(spark):
    """Deterministic, margin-separated binary problem: y = 1 iff
    x0 >= 0.55, no points in (0.45, 0.55) — separable by any
    reasonable split, so training accuracy 1.0 is a layout-robust
    contract."""
    rows = []
    for i in range(120):
        x0 = (i % 60) / 60.0          # 0.00 .. 0.983
        if 0.45 < x0 < 0.55:
            x0 += 0.12                # clear the margin band
        x1 = ((i * 37) % 100) / 100.0  # decorrelated noise dim
        rows.append((float(x0), float(x1), 1.0 if x0 >= 0.55 else 0.0))
    return spark.createDataFrame(rows, "x0 double, x1 double, y double")


def test_gbt_classifier_separable(sep_df):
    m = L.GBTClassifier(n_estimators=5, max_depth=3, seed=7).fit(
        sep_df, ["x0", "x1"], "y")
    acc = L.accuracy_score(m.predict(sep_df), "y", "prediction")
    assert acc == 1.0
    imp = m.feature_importances_
    assert len(imp) == 2 and sum(imp) == pytest.approx(1.0)
    # the informative dim dominates the importances
    assert imp[0] > imp[1]


def test_gbt_regressor_exact_step(spark):
    # label is a step function of a 4-valued feature: a depth-3 tree
    # represents it exactly WHATEVER greedy split order the trainer
    # picks (depth 2 is enough leaves but greedy can isolate the 80
    # first and strand {10,20,40} at depth 1), so GBT with one tree +
    # stepSize 1.0 reproduces it bitwise
    rows = [(float(i % 4), float([10, 20, 40, 80][i % 4]))
            for i in range(80)]
    df = spark.createDataFrame(rows, "x double, y double")
    m = L.GBTRegressor(n_estimators=1, max_depth=3,
                       learning_rate=1.0).fit(df, ["x"], "y")
    mse = L.mean_squared_error(m.predict(df), "y", "prediction")
    assert mse < 1e-18


def test_random_forest_and_tree(sep_df, spark):
    rf = L.RandomForestClassifier(n_estimators=10, seed=3).fit(
        sep_df, ["x0", "x1"], "y")
    assert L.accuracy_score(rf.predict(sep_df), "y", "prediction") >= 0.95
    # bootstrap=False + all features + 1 tree == a plain CART tree:
    # deterministic, exact on separable data
    dt1 = L.RandomForestClassifier(n_estimators=1, bootstrap=False,
                                   feature_subset="all").fit(
        sep_df, ["x0", "x1"], "y")
    assert L.accuracy_score(dt1.predict(sep_df), "y", "prediction") == 1.0
    dt = L.DecisionTreeClassifier(max_depth=4).fit(
        sep_df, ["x0", "x1"], "y")
    assert L.accuracy_score(dt.predict(sep_df), "y", "prediction") == 1.0

    rows = [(float(i % 4), float(i % 4) * 3 - 1) for i in range(40)]
    rdf = spark.createDataFrame(rows, "x double, y double")
    dtr = L.DecisionTreeRegressor(max_depth=2).fit(rdf, ["x"], "y")
    assert L.mean_squared_error(dtr.predict(rdf), "y", "prediction") < 1e-18
    rfr = L.RandomForestRegressor(n_estimators=1, bootstrap=False,
                                  feature_subset="all").fit(
        rdf, ["x"], "y")
    assert L.mean_squared_error(rfr.predict(rdf), "y", "prediction") < 1e-18


def test_gbm_array_column_input(spark):
    # array<double> feature-column form (the repo's embedding shape)
    rows = [([float(i % 2), float(i % 5)], float(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "v array<double>, y double")
    m = L.GBTClassifier(n_estimators=3, max_depth=2, seed=1).fit(
        df, "v", "y")
    out = m.predict(df)
    assert L.accuracy_score(out, "y", "prediction") == 1.0
    assert "__features" not in out.columns
