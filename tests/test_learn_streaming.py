"""Learn facade + Structured Streaming tests."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

import mars_spark as ms
from mars_spark import learn as L
from mars_spark import streaming as St


@pytest.fixture(scope="module")
def reg_data(rng):
    n = 500
    x1, x2 = rng.standard_normal(n), rng.standard_normal(n)
    y = 3.0 * x1 - 2.0 * x2 + 1.0 + rng.standard_normal(n) * 0.01
    return pd.DataFrame({"x1": x1, "x2": x2, "y": y})


def test_linear_regression(spark, reg_data):
    f = ms.from_pandas(reg_data)
    m = L.LinearRegression().fit(f, ["x1", "x2"], "y")
    np.testing.assert_allclose(m.coef_, [3.0, -2.0], atol=0.01)
    assert abs(m.intercept_ - 1.0) < 0.01
    pred = m.predict(f)
    assert L.r2_score(pred, "y") > 0.999
    assert L.mean_squared_error(pred, "y") < 0.001


def test_kmeans(spark, rng):
    a = rng.standard_normal((100, 2)) + [10, 10]
    b = rng.standard_normal((100, 2)) - [10, 10]
    pdf = pd.DataFrame(np.vstack([a, b]), columns=["x", "y"])
    m = L.KMeans(n_clusters=2).fit(ms.from_pandas(pdf), ["x", "y"])
    centers = sorted(m.cluster_centers_)
    np.testing.assert_allclose(centers[0], [-10, -10], atol=0.5)
    np.testing.assert_allclose(centers[1], [10, 10], atol=0.5)
    out = m.predict(ms.from_pandas(pdf)).toPandas()
    assert out.cluster.nunique() == 2


def test_pca_array_col(spark, rng):
    base = rng.standard_normal((200, 2))
    emb = np.hstack([base, base @ np.array([[1.0, 2.0], [0.5, -1.0]])])
    pdf = pd.DataFrame({"embedding": [list(map(float, v)) for v in emb]})
    m = L.PCA(n_components=2).fit(ms.from_pandas(pdf), "embedding")
    assert sum(m.explained_variance_ratio_) > 0.99  # rank-2 data
    out = m.transform(ms.from_pandas(pdf)).toPandas()
    assert all(len(v) == 2 for v in out.pca_features)


def test_logistic(spark, rng):
    n = 400
    x = rng.standard_normal(n)
    y = (x > 0).astype(float)
    f = ms.from_pandas(pd.DataFrame({"x": x, "y": y}))
    m = L.LogisticRegression().fit(f, ["x"], "y")
    assert L.accuracy_score(m.predict(f), "y") > 0.95


def test_scalers(spark, reg_data):
    f = ms.from_pandas(reg_data)
    mm = L.MinMaxScaler().fit(f, ["x1"]).transform(f).toPandas()
    assert 0 <= mm.x1.min() < 0.01 and 0.99 < mm.x1.max() <= 1
    st = L.StandardScaler().fit(f, ["x1"]).transform(f).toPandas()
    assert abs(st.x1.mean()) < 1e-9 and abs(st.x1.std(ddof=1) - 1) < 1e-9


def test_train_test_split(spark, reg_data):
    tr, te = L.train_test_split(ms.from_pandas(reg_data), test_size=0.3)
    n_tr, n_te = tr.count(), te.count()
    assert n_tr + n_te == len(reg_data)
    assert 0.2 < n_te / len(reg_data) < 0.4


def test_hash_split_deterministic(spark, reg_data):
    import pandas as pd

    pdf = reg_data.copy()
    pdf["id"] = range(len(pdf))
    f = ms.from_pandas(pdf)
    tr, te = L.hash_split(f, test_size=0.3, id_col="id", seed=5)
    tr_ids = sorted(r.id for r in tr.select("id").collect())
    te_ids = sorted(r.id for r in te.select("id").collect())
    # exact partition: disjoint, exhaustive, roughly sized
    assert len(tr_ids) + len(te_ids) == len(pdf)
    assert not set(tr_ids) & set(te_ids)
    assert 0.2 < len(te_ids) / len(pdf) < 0.4
    # membership survives repartitioning (randomSplit's does NOT)
    f2 = ms.from_pandas(pdf).to_spark().repartition(7)
    _, te2 = L.hash_split(f2, test_size=0.3, id_col="id", seed=5)
    assert sorted(r.id for r in te2.select("id").collect()) == te_ids
    # and replays in any engine with md5: pandas re-derivation
    import hashlib

    expect = sorted(
        i for i in pdf.id
        if hashlib.md5(f"5|{i}".encode()).hexdigest()[:6]
        < format(int(round(0.3 * 16**6)), "06x"))
    assert te_ids == expect
    # degenerate fractions short-circuit
    tr0, te0 = L.hash_split(f, test_size=0.0, id_col="id")
    tr1, te1 = L.hash_split(f, test_size=1.0, id_col="id")
    assert te0.count() == 0 and tr0.count() == len(pdf)
    assert tr1.count() == 0 and te1.count() == len(pdf)


def test_streaming_tumbling(spark):
    """File-source stream → tumbling window agg → memory sink."""
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:10", "2024-01-01 00:00:50",
             "2024-01-01 00:01:10", "2024-01-01 00:02:05"]),
        "k": ["a", "a", "a", "b"],
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = St.read_stream(spark, "parquet", src,
                                schema="ts timestamp, k string, v double")
        agg = St.tumbling_agg(stream, "ts", "1 minute", ["k"], {"v": "sum"})
        q = St.write_stream(agg, "memory", query_name="tumb",
                            output_mode="complete")
        try:
            q.processAllAvailable()
            out = spark.sql("select * from tumb").toPandas()
        finally:
            q.stop()
    assert len(out) == 3  # windows: [00:00 a], [00:01 a], [00:02 b]
    w0 = out[out.window_start.astype(str) == "2024-01-01 00:00:00"]
    assert w0.v_sum.iloc[0] == 3.0


def test_streaming_append_watermark_eviction(spark):
    """Append mode + watermark eviction across two micro-batches — the
    production semantics (complete-mode bounded runs don't exercise
    eviction). Batch 1 advances the watermark past window [00:00,00:01);
    batch 2 then delivers a LATE row into that window, which must be
    dropped (its state was evicted), plus a fresh row that closes
    window [00:02,00:03). Final appended rows = on-time windows only."""
    import shutil

    b1 = pd.DataFrame({
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:10", "2024-01-01 00:00:20",
             "2024-01-01 00:02:00"]),
        "k": ["a", "a", "a"],
        "v": [1.0, 2.0, 10.0],
    })
    b2 = pd.DataFrame({
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:40",    # LATE: watermark is 00:01:30
             "2024-01-01 00:04:00"]),  # advances watermark to 00:03:30
        "k": ["a", "a"],
        "v": [100.0, 5.0],
    })
    with tempfile.TemporaryDirectory() as d:
        src_dir = os.path.join(d, "src")
        os.makedirs(src_dir)

        def _stage(pdf, name):
            tmp = os.path.join(d, f"tmp_{name}")
            spark.createDataFrame(pdf).coalesce(1).write.parquet(tmp)
            part = [f for f in os.listdir(tmp)
                    if f.startswith("part-") and f.endswith(".parquet")][0]
            shutil.copy(os.path.join(tmp, part),
                        os.path.join(src_dir, f"{name}.parquet"))

        _stage(b1, "b1")
        stream = St.read_stream(spark, "parquet", src_dir,
                                schema="ts timestamp, k string, v double")
        agg = St.tumbling_agg(stream, "ts", "1 minute", ["k"], {"v": "sum"},
                              watermark="30 seconds")
        q = St.write_stream(agg, "memory", query_name="apw",
                            output_mode="append")
        try:
            q.processAllAvailable()   # batch 1 + no-data flush
            _stage(b2, "b2")
            q.processAllAvailable()   # batch 2: late row dropped + flush
            out = spark.sql("select * from apw").toPandas()
        finally:
            q.stop()
    got = {str(r.window_start): r.v_sum for r in out.itertuples()}
    # [00:00,00:01) closed after batch 1 with ONLY the on-time rows —
    # the late 100.0 appears nowhere; [00:02,00:03) closed after
    # batch 2; [00:04,00:05) is still open (> watermark), not emitted
    assert got == {"2024-01-01 00:00:00": 3.0,
                   "2024-01-01 00:02:00": 10.0}


def test_streaming_session_append_merge_and_eviction(spark):
    """Session windows in append mode across two micro-batches: a
    session that closed under the watermark is emitted once and a
    late event into it is dropped; the still-open session MERGES with
    a batch-2 event (session_window state merge) and closes only when
    the watermark passes; the stream-tail session is never emitted."""
    import shutil

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)

        def _stage(rows, name):
            pdf = pd.DataFrame({
                "ts": pd.to_datetime([r[0] for r in rows]),
                "u": [r[1] for r in rows], "v": [1.0] * len(rows)})
            tmp = os.path.join(d, f"tmp_{name}")
            spark.createDataFrame(pdf).coalesce(1).write.parquet(tmp)
            part = [f for f in os.listdir(tmp)
                    if f.startswith("part-")][0]
            shutil.copy(os.path.join(tmp, part),
                        os.path.join(src, f"{name}.parquet"))

        _stage([("2024-01-01 00:00:00", 1), ("2024-01-01 00:00:40", 1),
                ("2024-01-01 00:05:00", 1)], "b1")
        stream = St.read_stream(spark, "parquet", src,
                                schema="ts timestamp, u bigint, v double")
        agg = St.session_agg(stream, "ts", "1 minute", ["u"],
                             {"v": "count"}, watermark="30 seconds")
        q = St.write_stream(agg, "memory", query_name="sessapw",
                            output_mode="append")
        try:
            q.processAllAvailable()
            first = spark.sql("select * from sessapw").toPandas()
            # watermark = 00:05:00-30s: session [00:00,00:01:40) closed
            assert len(first) == 1 and first.v_count.iloc[0] == 2
            _stage([("2024-01-01 00:00:50", 1),   # LATE: dropped
                    ("2024-01-01 00:05:30", 1),   # merges open session
                    ("2024-01-01 00:10:00", 1)], "b2")  # advances wm
            q.processAllAvailable()
            out = (spark.sql("select * from sessapw").toPandas()
                   .sort_values("session_start").reset_index(drop=True))
        finally:
            q.stop()
    assert len(out) == 2
    assert out.v_count.tolist() == [2, 2]  # late row in NEITHER session
    assert str(out.session_end[1]) == "2024-01-01 00:06:30"  # merged
    # the 00:10 session is still open → not emitted


def test_streaming_session(spark):
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 00:00:30",
             "2024-01-01 00:10:00"]),
        "u": [1, 1, 1],
        "v": [1.0, 1.0, 1.0],
    })
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = St.read_stream(spark, "parquet", src,
                                schema="ts timestamp, u bigint, v double")
        agg = St.session_agg(stream, "ts", "5 minutes", ["u"], {"v": "count"})
        q = St.write_stream(agg, "memory", query_name="sess",
                            output_mode="complete")
        try:
            q.processAllAvailable()
            out = spark.sql("select * from sess").toPandas()
        finally:
            q.stop()
    assert len(out) == 2  # 30s gap joins, 9.5min gap splits


def test_precision_recall_f1_and_logloss(spark):
    import pandas as pd
    from mars_spark.learn import facade as L
    p = pd.DataFrame({"y": [1.0, 1.0, 0.0, 0.0],
                      "pred": [1.0, 0.0, 1.0, 0.0],
                      "prob": [0.9, 0.4, 0.6, 0.1]})
    sdf = spark.createDataFrame(p)
    m = L.precision_recall_f1(sdf, "y", "pred")
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5
    import numpy as np
    exp = -np.mean([np.log(0.9), np.log(0.4), np.log(1 - 0.6),
                    np.log(1 - 0.1)])
    assert abs(L.log_loss(sdf, "y", "prob") - exp) < 1e-9


def test_roc_auc_matches_sklearn_formula(spark):
    import pandas as pd
    import numpy as np
    from mars_spark.learn import facade as L
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    s = y * 0.5 + rng.random(200)  # informative score
    sdf = spark.createDataFrame(pd.DataFrame({"y": y.astype(float),
                                              "s": s}))
    got = L.roc_auc_score(sdf, "y", "s")
    # rank-based reference implementation in numpy
    order = np.argsort(s)
    ranks = np.empty(200); ranks[order] = np.arange(1, 201)
    # average ties (none expected with random floats)
    npos, nneg = y.sum(), (1 - y).sum()
    exp = (ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert abs(got - exp) < 1e-9


def test_knn_classifier(spark):
    import pandas as pd
    from mars_spark.learn.facade import KNeighborsClassifier
    train = pd.DataFrame({
        "features": [[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]],
        "label": [0, 0, 1, 1]})
    test = pd.DataFrame({"id": [1, 2],
                         "features": [[0.05, 0.0], [5.05, 5.0]]})
    knn = KNeighborsClassifier(n_neighbors=2).fit(
        spark.createDataFrame(train))
    out = knn.predict(spark.createDataFrame(test), "id").toPandas()
    got = dict(zip(out.id, out.prediction))
    assert got == {1: 0, 2: 1}


def test_gbm_bridges_stub_interface(spark):
    import pandas as pd
    import pytest
    from mars_spark.learn import contrib
    sdf = spark.createDataFrame(pd.DataFrame({
        "features": [[1.0, 2.0]], "label": [1.0]}))
    prepped = contrib.prepare_dataset(sdf, "features", "label",
                                      num_workers=2)
    assert prepped.rdd.getNumPartitions() == 2
    assert set(prepped.columns) == {"features", "label"}
    for cls in (contrib.XGBClassifier, contrib.XGBRegressor,
                contrib.LGBMClassifier, contrib.LGBMRegressor):
        with pytest.raises(ImportError, match="not[ \n]*installed|requires"):
            cls(max_depth=3).fit(prepped)


def test_stream_dedup_and_static_join(spark, tmp_path):
    import pandas as pd
    import time
    src = str(tmp_path / "dsrc")
    pdf = pd.DataFrame({
        "k": [1, 1, 2, 2, 3],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:30",
            "2024-01-01 00:01:00", "2024-01-01 00:01:10",
            "2024-01-01 00:02:00"]),
        "v": [1.0, 1.0, 2.0, 2.0, 3.0],
    })
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]}))

    stream = St.read_stream(spark, "parquet", src, schema=schema)
    deduped = St.stream_dedup(stream, ["k"], "ts")
    joined = St.stream_static_join(deduped, dim, on="k")
    q = St.write_stream(joined, "memory", query_name="dedup_join",
                        output_mode="append")
    try:
        q.processAllAvailable()
        out = spark.sql("select * from dedup_join").toPandas()
    finally:
        q.stop()
    assert sorted(out.k) == [1, 2, 3]       # one row per key
    assert set(out.name) == {"a", "b", "c"}


def test_glm_and_truncated_svd(spark, rng):
    import numpy as np
    import pandas as pd
    from mars_spark.learn.facade import GeneralizedLinearModel, TruncatedSVD
    n = 400
    X = rng.normal(0, 1, (n, 3))
    y = 2.0 * X[:, 0] - 1.0 * X[:, 1] + 0.5 + rng.normal(0, 0.01, n)
    pdf = pd.DataFrame({"f": list(map(list, X)), "y": y})
    sdf = spark.createDataFrame(pdf)
    glm = GeneralizedLinearModel(family="gaussian").fit(sdf, "f", "y")
    assert abs(glm.coef_[0] - 2.0) < 0.05
    assert abs(glm.intercept_ - 0.5) < 0.05
    svd = TruncatedSVD(n_components=2).fit(sdf, "f")
    assert svd.components_.shape == (2, 3)
    # components are orthonormal rows
    C = svd.components_
    assert np.allclose(C @ C.T, np.eye(2), atol=1e-8)
    out = svd.transform(sdf)
    assert out.select("svd").first()["svd"] is not None
    # projection matches numpy
    row0 = out.select("f", "svd").first()
    exp = C @ np.array(row0["f"])
    assert np.allclose(np.array(row0["svd"]), exp, atol=1e-8)


def test_bagging_and_isolation_forest(spark, rng):
    import numpy as np
    import pandas as pd
    from mars_spark.learn.facade import BaggingRegressor, IsolationForest
    n = 300
    X = rng.normal(0, 1, (n, 2))
    y = 3.0 * X[:, 0] + X[:, 1]
    pdf = pd.DataFrame({"f": list(map(list, X)), "y": y})
    sdf = spark.createDataFrame(pdf)
    bag = BaggingRegressor(n_estimators=3).fit(sdf, "f", "y")
    pred = bag.predict(sdf).select("y", "prediction").toPandas()
    resid = (pred.y - pred.prediction).abs().mean()
    assert resid < 0.1
    # isolation forest: inliers cluster at origin, outliers far away
    inliers = rng.normal(0, 1, (500, 2))
    outliers = np.array([[8.0, 8.0], [-9.0, 7.5], [10.0, -10.0]])
    pdf2 = pd.DataFrame({"f": list(map(list, np.vstack([inliers, outliers]))),
                         "is_out": [0] * 500 + [1] * 3})
    sdf2 = spark.createDataFrame(pdf2)
    forest = IsolationForest(n_estimators=40, seed=7).fit(sdf2, "f")
    scored = forest.scores(sdf2).select("is_out", "anomaly_score").toPandas()
    out_mean = scored[scored.is_out == 1].anomaly_score.mean()
    in_mean = scored[scored.is_out == 0].anomaly_score.mean()
    assert out_mean > in_mean + 0.1
    assert out_mean > 0.6


def test_label_propagation(spark):
    import numpy as np
    import pandas as pd
    from mars_spark.learn.facade import label_propagation
    # two well-separated clusters, one seed label each. Local rng, NOT
    # the session-scoped fixture: this test's pass depends on the 5-NN
    # graph diameter staying under max_iter, so the geometry must not
    # shift with test execution order.
    lrng = np.random.default_rng(7)
    a = lrng.normal(0, 0.3, (40, 2))
    b = lrng.normal(5, 0.3, (40, 2))
    X = np.vstack([a, b])
    y = [0.0] + [None] * 39 + [1.0] + [None] * 39
    pdf = pd.DataFrame({"id": range(80), "f": list(map(list, X)), "y": y})
    sdf = spark.createDataFrame(pdf)
    out = label_propagation(sdf, "f", "y", "id", n_neighbors=5,
                            max_iter=20).toPandas()
    m = dict(zip(out.id, out.y))
    assert all(m[i] == 0.0 for i in range(40))
    assert all(m[i] == 1.0 for i in range(40, 80))


def test_kmeans_provided_init_lloyd(spark, rng):
    """init= runs the DataFrame-native Lloyd loop; must equal a numpy
    replay of the same quantized iterations bit-for-bit, regardless of
    partition layout (mars/learn/cluster/_kmeans.py:596)."""
    X = rng.standard_normal((300, 8))
    pdf = pd.DataFrame({"vid": range(300), "emb": [list(r) for r in X]})
    f = ms.from_pandas(pdf).to_spark().repartition(13)
    init = [list(X[i]) for i in range(3)]
    m = L.KMeans(n_clusters=3, init=init, max_iter=4, tol=0.0,
                 centroid_decimals=6).fit(f, "emb")
    C = np.asarray(init)
    for _ in range(4):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        C = np.vstack([X[a == j].mean(0) if (a == j).any() else C[j]
                       for j in range(3)])
        C = np.floor(C * 1e6 + 0.5) / 1e6
    np.testing.assert_array_equal(np.asarray(m.cluster_centers_), C)
    got = m.predict(f, "emb").toPandas().sort_values("vid")
    exp = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    np.testing.assert_array_equal(got.cluster.values, exp)


def test_label_encoder_and_normalize(spark):
    """mars/learn/preprocessing/_label.py and normalize."""
    pdf = pd.DataFrame({"c": ["b", "a", "c", "a", "b", "a"],
                        "e": [[3.0, 4.0], [0.0, 0.0], [1.0, 1.0],
                              [6.0, 8.0], [-3.0, 4.0], [2.0, 0.0]]})
    f = ms.from_pandas(pdf).to_spark()
    from mars_spark.learn.facade import LabelEncoder, normalize

    le = LabelEncoder().fit(f, "c")
    assert le.classes_ == ["a", "b", "c"]
    out = le.transform(f).toPandas()
    assert list(out.c_code) == [1, 0, 2, 0, 1, 0]

    nz = normalize(f, "e").toPandas()
    got = np.vstack([np.array(v) for v in nz.e])
    exp = np.vstack([
        np.array(v) / (np.linalg.norm(v) or np.nan) for v in pdf.e])
    np.testing.assert_allclose(got[[0, 2, 3, 4, 5]],
                               exp[[0, 2, 3, 4, 5]], rtol=1e-12)
    assert all(x is None or np.isnan(x) for x in got[1])  # zero vector

    l1 = normalize(f, "e", norm="l1").toPandas()
    assert list(l1.e[0]) == [3.0 / 7.0, 4.0 / 7.0]


def test_label_encoder_nulls_and_unseen(spark):
    """Nulls are excluded from classes_ and pass through as null codes;
    unseen non-null labels code to the -1 sentinel (the distributed
    handle_unknown convention — see LabelEncoder.transform)."""
    from mars_spark.learn.facade import LabelEncoder

    pdf = pd.DataFrame({"c": ["b", None, "a", "b", None]})
    f = ms.from_pandas(pdf).to_spark()
    le = LabelEncoder().fit(f, "c")
    assert le.classes_ == ["a", "b"]
    out = le.transform(f).toPandas().c_code
    assert [None if pd.isna(v) else int(v) for v in out] == \
        [1, None, 0, 1, None]

    other = ms.from_pandas(
        pd.DataFrame({"c": ["a", "z", None]})).to_spark()
    got = le.transform(other).toPandas().c_code
    assert [None if pd.isna(v) else int(v) for v in got] == [0, -1, None]

    # large-cardinality path (broadcast-join branch) honors the same
    # null/unseen contract (join output order is not guaranteed —
    # compare as a multiset of (label, code) pairs)
    le._MAP_THRESHOLD = 1
    out2 = le.transform(other).toPandas()
    pairs = sorted(
        (str(c), None if pd.isna(v) else int(v))
        for c, v in zip(out2.c, out2.c_code))
    assert pairs == [("None", None), ("a", 0), ("z", -1)]


def test_stateful_emit_on_close_event_time_timeout(spark):
    """streaming.stateful.emit_on_close_totals: state accumulates
    silently and emits exactly once when the watermark passes
    last_event + gap (EventTimeTimeout firing hasTimedOut); keys
    still inside their gap emit nothing and keep their state."""
    import shutil
    from mars_spark.streaming.stateful import emit_on_close_totals

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)

        def _stage(rows, name):
            pdf = pd.DataFrame({
                "ts": pd.to_datetime([r[0] for r in rows]),
                "u": [r[1] for r in rows],
                "v": [float(r[2]) for r in rows]})
            tmp = os.path.join(d, f"tmp_{name}")
            spark.createDataFrame(pdf).coalesce(1).write.parquet(tmp)
            part = [f for f in os.listdir(tmp)
                    if f.startswith("part-")][0]
            shutil.copy(os.path.join(tmp, part),
                        os.path.join(src, f"{name}.parquet"))

        # key 1: two events then quiet; key 2: active into batch 2
        _stage([("2024-01-01 00:00:00", 1, 1.0),
                ("2024-01-01 00:00:30", 1, 2.0),
                ("2024-01-01 00:01:00", 2, 5.0)], "b1")
        stream = St.read_stream(spark, "parquet", src,
                                schema="ts timestamp, u bigint, v double")
        out_df = emit_on_close_totals(stream, "u", "v", gap="1 minute",
                                      watermark="30 seconds")
        q = St.write_stream(out_df, "memory", query_name="closetot",
                            output_mode="append")
        try:
            q.processAllAvailable()
            assert len(spark.sql("select * from closetot").toPandas()) == 0
            # batch 2: key 2 stays active; watermark jumps past
            # key 1's last_event+gap -> key 1 closes with its total
            _stage([("2024-01-01 00:05:00", 2, 7.0)], "b2")
            q.processAllAvailable()
            mid = spark.sql("select * from closetot").toPandas()
            assert mid.set_index("u").total.to_dict() == {1: 3.0}
            # batch 3: advance watermark past key 2's gap -> closes
            # with BOTH its events (state merged across batches)
            _stage([("2024-01-01 00:20:00", 3, 0.0)], "b3")
            q.processAllAvailable()
            out = spark.sql("select * from closetot").toPandas()
        finally:
            q.stop()
    tot = out.set_index("u").total.to_dict()
    assert tot == {1: 3.0, 2: 12.0}
    assert out.set_index("u").n.to_dict() == {1: 2, 2: 2}


def test_streaming_checkpoint_restart_recovers_state(spark, tmpdir):
    """Stop a checkpointed append-mode query, deliver data while it is
    down, restart from the same checkpoint (parquet sink — the
    production shape): the open window's state survives the restart
    and closes with its pre-restart contents; emitted windows are not
    re-emitted (exactly-once over the sink)."""
    import shutil

    d = str(tmpdir)
    src, ckpt, out = f"{d}/src", f"{d}/ckpt", f"{d}/out"
    os.makedirs(src)

    def _stage(rows, name):
        pdf = pd.DataFrame({
            "ts": pd.to_datetime([r[0] for r in rows]),
            "k": [r[1] for r in rows], "v": [float(r[2]) for r in rows]})
        tmp = f"{d}/tmp_{name}"
        spark.createDataFrame(pdf).coalesce(1).write.parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
        shutil.copy(os.path.join(tmp, part), f"{src}/{name}.parquet")

    def _start():
        stream = St.read_stream(spark, "parquet", src,
                                schema="ts timestamp, k string, v double")
        agg = St.tumbling_agg(stream, "ts", "1 minute", ["k"],
                              {"v": "sum"}, watermark="30 seconds")
        return (agg.writeStream.format("parquet").option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append").start())

    _stage([("2024-01-01 00:00:10", "a", 1.0),
            ("2024-01-01 00:02:00", "a", 10.0)], "b1")
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    p1 = {str(r.window_start): r.v_sum
          for r in spark.read.parquet(out).toPandas().itertuples()}
    assert p1 == {"2024-01-01 00:00:00": 1.0}  # [00:02) still open

    _stage([("2024-01-01 00:04:00", "a", 7.0)], "b2")  # while DOWN
    q2 = _start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    p2 = {str(r.window_start): r.v_sum
          for r in spark.read.parquet(out).toPandas().itertuples()}
    # state recovered: [00:02) closes with its PRE-restart sum;
    # [00:00) emitted exactly once; [00:04) still open
    assert p2 == {"2024-01-01 00:00:00": 1.0,
                  "2024-01-01 00:02:00": 10.0}

def test_stream_stream_join_bounded_state(spark):
    """Watermarked stream-stream interval join (streaming/core.py
    stream_stream_join): clicks join prior views for the same user
    within 2 minutes. Two micro-batches prove (a) matches across the
    time bound land, (b) a view OUTSIDE the bound never matches, and
    (c) the join accepts late-arriving clicks only inside the
    watermark horizon — the state-bounded attribution shape."""
    import shutil

    views = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:00",
                              "2024-01-01 00:05:00"]),
        "user": [1, 2],
        "view_id": [100, 200],
    })
    clicks_b1 = pd.DataFrame({
        "cts": pd.to_datetime(["2024-01-01 00:01:00",    # within 2m of view 100
                               "2024-01-01 00:04:00"]),  # >2m after view 100
        "user": [1, 1],
        "click_id": [7, 8],
    })
    clicks_b2 = pd.DataFrame({
        "cts": pd.to_datetime(["2024-01-01 00:06:00"]),  # within 2m of view 200
        "user": [2],
        "click_id": [9],
    })
    with tempfile.TemporaryDirectory() as d:
        vdir, cdir = os.path.join(d, "v"), os.path.join(d, "c")
        os.makedirs(vdir); os.makedirs(cdir)

        def _stage(pdf, out_dir, name):
            tmp = os.path.join(d, f"tmp_{name}")
            spark.createDataFrame(pdf).coalesce(1).write.parquet(tmp)
            part = [f for f in os.listdir(tmp)
                    if f.startswith("part-") and f.endswith(".parquet")][0]
            shutil.copy(os.path.join(tmp, part),
                        os.path.join(out_dir, f"{name}.parquet"))

        _stage(views, vdir, "v1")
        _stage(clicks_b1, cdir, "c1")
        vs = St.read_stream(spark, "parquet", vdir,
                            schema="ts timestamp, user bigint, view_id bigint")
        cs = St.read_stream(spark, "parquet", cdir,
                            schema="cts timestamp, user bigint, click_id bigint")
        j = St.stream_stream_join(cs, vs, on="user", left_ts="cts",
                                  right_ts="ts", within="2 minutes",
                                  watermark="10 minutes")
        q = St.write_stream(j.select("click_id", "view_id"), "memory",
                            query_name="ssj", output_mode="append")
        try:
            q.processAllAvailable()
            _stage(clicks_b2, cdir, "c2")
            q.processAllAvailable()
            out = spark.sql("select * from ssj").toPandas()
        finally:
            q.stop()
    pairs = sorted(map(tuple, out[["click_id", "view_id"]].values.tolist()))
    # click 7 attributes to view 100; click 8 is outside the 2-minute
    # bound (no row); click 9 (batch 2) attributes to view 200
    assert pairs == [(7, 100), (9, 200)]


def test_streaming_corpus_hygiene(spark):
    """Streaming corpus ingestion: the hygiene stages (quality/
    repetition predicate, PII redaction, fingerprinting) are all
    stateless narrow maps, so they compose directly onto a stream;
    dedup becomes dropDuplicatesWithinWatermark on the fingerprint.
    The streamed result must equal the batch clean_corpus verdict on
    the same data (everything arrives inside one watermark here)."""
    from pyspark.sql import functions as F

    from mars_spark.llm import pii as P
    from mars_spark.llm import recipe as R
    from mars_spark.llm import text as T

    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:05"] * 5),
        "doc_id": range(5),
        "text": [
            "a rich and varied document about the nature of things",
            "a rich and varied document about the nature of things",
            "spam spam spam spam spam spam",
            "write to ann@example.org for the complete archive",
            "an unrelated clean document mentioning nothing special",
        ],
    })
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = St.read_stream(
            spark, "parquet", src,
            schema="ts timestamp, doc_id long, text string")
        cleaned = (
            stream
            .filter(R.quality_predicate(F.col("text"), max_topw=0.5,
                                        min_tokens=3))
            .withColumn("text", P.redact(F.col("text")))
            .withColumn("fp", T.fingerprint(F.col("text"))))
        deduped = St.stream_dedup(cleaned, ["fp"], "ts", "10 minutes")
        q = St.write_stream(deduped, "memory", query_name="hyg",
                            output_mode="append")
        try:
            q.processAllAvailable()
            out = spark.sql("select doc_id, text from hyg").toPandas()
        finally:
            q.stop()
    batch = R.clean_corpus(
        spark.createDataFrame(pdf.drop(columns="ts")), max_topw=0.5,
        min_tokens=3, redact_pii=True, dedup="exact").toPandas()
    # batch exact dedup keeps min-id deterministically; the streaming
    # dedup keeps the FIRST-SEEN row of a fingerprint, which within a
    # single micro-batch is partition-order-dependent — either of the
    # two identical docs may survive (semantics, not a bug: arrival
    # order IS the streaming contract). Compare modulo that choice.
    assert sorted(batch.doc_id) == [0, 3, 4]
    got = sorted(out.doc_id)
    assert got in ([0, 3, 4], [1, 3, 4])
    assert "<EMAIL>" in out.set_index("doc_id").text[3]


def test_streaming_heavy_hitters(spark):
    """Space-saving sketch invariants on a bounded stream: exact when
    a group's distinct items fit the capacity; when over capacity,
    count-err <= true <= count and the true heavy hitter leads."""
    rows = (
        [("a", "x")] * 8 + [("a", "y")] * 3 + [("a", "z")] * 1
        # group b: 5 distinct items through capacity 3, skewed to hot
        + [("b", "hot")] * 20
        + [("b", it) for it in ["c1", "c2", "c3", "c4"] * 2]
    )
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:01"] * len(rows)),
        "g": [1 if g == "a" else 2 for g, _ in rows],
        "item": [it for _, it in rows],
    })
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = St.read_stream(
            spark, "parquet", src,
            schema="ts timestamp, g long, item string")
        hh = St.heavy_hitters(stream, "g", "item", capacity=3)
        q = St.write_stream(hh, "memory", query_name="hh",
                            output_mode="update")
        try:
            q.processAllAvailable()
            out = spark.sql("select * from hh").toPandas()
        finally:
            q.stop()
    a = out[out.g == 1].set_index("item")
    # group a: 3 distinct items == capacity -> exact, err 0
    assert a["count"].to_dict() == {"x": 8, "y": 3, "z": 1}
    assert (a.err == 0).all()
    b = out[out.g == 2].set_index("item").sort_values(
        "count", ascending=False)
    true_b = {"hot": 20, "c1": 2, "c2": 2, "c3": 2, "c4": 2}
    assert len(b) == 3
    assert b.index[0] == "hot"
    for item, row in b.iterrows():
        true = true_b[item]
        assert row["count"] - row["err"] <= true <= row["count"]


def test_streaming_quantile_p2(spark):
    """P² online median on a bounded stream: constant 5-marker state,
    estimate within ~2% of the exact median of what was seen."""
    rng = np.random.default_rng(9)
    vals = rng.normal(loc=50.0, scale=10.0, size=600)
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:01"] * (len(vals) + 3)),
        "g": [1] * len(vals) + [2] * 3,
        "v": list(vals) + [10.0, 20.0, 30.0],  # group 2: < 5 obs
    })
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = St.read_stream(spark, "parquet", src,
                                schema="ts timestamp, g long, v double")
        sq = St.streaming_quantile(stream, "g", "v", q=0.5)
        q = St.write_stream(sq, "memory", query_name="p2",
                            output_mode="update")
        try:
            q.processAllAvailable()
            out = spark.sql("select * from p2").toPandas()
        finally:
            q.stop()
    g1 = out[out.g == 1].iloc[-1]
    exact = float(np.median(vals))
    assert g1.n == len(vals)
    assert abs(g1.estimate - exact) / exact < 0.02
    # under 5 observations the estimate is an exact order statistic
    g2 = out[out.g == 2].iloc[-1]
    assert g2.n == 3 and g2.estimate == 20.0


def test_streaming_heavy_hitters_string_key(spark):
    """The group column's type is inferred from the input schema —
    string keys must work, not just bigint."""
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:01"] * 6),
        "src": ["crawl"] * 4 + ["wiki"] * 2,
        "item": ["x", "x", "y", "x", "z", "z"],
    })
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = St.read_stream(
            spark, "parquet", src,
            schema="ts timestamp, src string, item string")
        hh = St.heavy_hitters(stream, "src", "item", capacity=4)
        q = St.write_stream(hh, "memory", query_name="hhs",
                            output_mode="update")
        try:
            q.processAllAvailable()
            out = spark.sql("select * from hhs").toPandas()
        finally:
            q.stop()
    crawl = out[out.src == "crawl"].set_index("item")["count"].to_dict()
    assert crawl == {"x": 3, "y": 1}
    assert out[out.src == "wiki"].set_index("item")["count"].to_dict() == {"z": 2}


def test_stream_incremental_dedup(spark, tmp_path):
    import pandas as pd

    from mars_spark.llm.dedup import exact_dedup_keys

    src = str(tmp_path / "inc_src")
    # corpus store from a prior batch: docs "alpha" and "beta"
    prior = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["alpha doc", "beta doc"]}))
    store = exact_dedup_keys(prior, "text", "doc_id").select("fp")

    # arriving stream: a store dup (alpha), an in-stream dup pair
    # (gamma twice), and a fresh doc (delta)
    pdf = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["alpha  DOC",      # normalizes to the stored alpha fp
                 "gamma doc", "gamma doc", "delta doc"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:10",
            "2024-01-01 00:00:20", "2024-01-01 00:00:30"]),
    })
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = St.read_stream(spark, "parquet", src, schema=schema)
    fresh = St.stream_incremental_dedup(stream, store, "text")
    q = St.write_stream(fresh, "memory", query_name="inc_dedup",
                        output_mode="append")
    try:
        q.processAllAvailable()
        out = spark.sql("select * from inc_dedup").toPandas()
    finally:
        q.stop()
    # alpha dropped (store hit), one gamma survives, delta survives
    assert sorted(out.doc_id) in ([11, 13], [12, 13])
    assert set(out.columns) == {"doc_id", "text", "ts"}


def test_stream_minhash_dedup(spark, tmp_path):
    """Streaming near-dup dedup vs a persisted band store: expected
    survivors are computed from the BATCH band path (any-band hit
    against the store — the exact semantics the stream implements),
    so the test pins stream/batch signature compatibility too."""
    import pandas as pd

    from mars_spark.llm.dedup import minhash_bands

    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["the quick brown fox jumps over the lazy dog today",
                 "completely different corpus content about spark engines"],
    }))
    store = minhash_bands(corpus, "text", "doc_id").select(
        "band", "band_hash")

    arrive = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [
            # exact text of doc 0 → every band hits → dropped
            "the quick brown fox jumps over the lazy dog today",
            # near-dup of doc 0 (one word changed) → expected from batch
            "the quick brown fox jumps over the lazy dog tonight",
            # fresh doc, repeated → one survives (in-stream signature dup)
            "a genuinely fresh document with novel words entirely",
            "a genuinely fresh document with novel words entirely",
        ],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:05",
            "2024-01-01 00:00:10", "2024-01-01 00:00:15"]),
    })
    src = str(tmp_path / "mh_src")
    spark.createDataFrame(arrive).write.parquet(src)

    # expected: arriving docs whose bands (batch path) all miss the
    # store, then signature-distinct
    ab = minhash_bands(spark.createDataFrame(arrive), "text", "doc_id")
    hits = set(r["doc_id"] for r in ab.join(
        store, on=["band", "band_hash"], how="leftsemi")
        .select("doc_id").distinct().collect())
    assert 10 in hits  # exact copy must band-hit
    expected_ids = {i for i in arrive.doc_id if i not in hits}

    stream = St.read_stream(spark, "parquet", src,
                            schema=spark.read.parquet(src).schema)
    fresh = St.stream_minhash_dedup(stream, store, "text")
    q = St.write_stream(fresh, "memory", query_name="mh_dedup",
                        output_mode="append")
    try:
        q.processAllAvailable()
        out = spark.sql("select * from mh_dedup").toPandas()
    finally:
        q.stop()
    got = set(out.doc_id)
    # the 12/13 signature-dup pair: exactly one survives, either id
    assert len(got & {12, 13}) == (1 if not ({12, 13} & hits) else 0)
    assert got - {12, 13} == expected_ids - {12, 13}
    assert set(out.columns) == {"doc_id", "text", "ts"}


def test_stream_semantic_dedup(spark, tmp_path):
    """Streaming embedding near-dup dedup vs a persisted IVF index:
    expected survivors are replayed in numpy with the exact engine
    semantics (unit vectors, argmax/first-max cell assignment,
    nearest-cell-only probe, dot >= threshold), so the test pins
    stream/batch index compatibility too."""
    import numpy as np
    import pandas as pd

    from mars_spark.llm import similarity as S

    rng = np.random.default_rng(46)
    base = rng.standard_normal((8, 16))
    corpus = spark.createDataFrame(pd.DataFrame({
        "vec_id": range(8),
        "embedding": [list(map(float, v)) for v in base]}))
    assigned, cents = S.ivf_index_deterministic(corpus, "embedding",
                                                n_clusters=4)
    index = assigned.select("cluster", "e").localCheckpoint()

    novel = rng.standard_normal(16)
    novel2 = rng.standard_normal(16)
    arrive_vecs = [
        base[2] * 1.3,          # same direction as corpus 2 -> dot 1.0
        novel,                  # fresh
        novel2 * 2.0, novel2 * 2.0,  # in-stream unit-identical pair
    ]
    arrive = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "embedding": [list(map(float, v)) for v in arrive_vecs],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:05",
            "2024-01-01 00:00:10", "2024-01-01 00:00:15"]),
    })

    # numpy replay of the drop rule
    Cu = base / np.linalg.norm(base, axis=1)[:, None]
    seeds = np.asarray(cents)
    cell = {int(r.vec_id): int(r.cluster) for r in
            assigned.select("vec_id", "cluster").collect()}
    dropped = set()
    for did, v in zip(arrive.doc_id, arrive_vecs):
        u = np.asarray(v) / np.linalg.norm(v)
        cl = int(np.argmax(seeds @ u))
        hits = [j for j in range(8)
                if cell[j] == cl and float(Cu[j] @ u) >= 0.95]
        if hits:
            dropped.add(int(did))
    assert 10 in dropped and 11 not in dropped

    src = str(tmp_path / "sem_src")
    spark.createDataFrame(arrive).write.parquet(src)
    stream = St.read_stream(spark, "parquet", src,
                            schema=spark.read.parquet(src).schema)
    fresh = St.stream_semantic_dedup(stream, index, cents, "embedding")
    q = St.write_stream(fresh, "memory", query_name="sem_dedup",
                        output_mode="append")
    try:
        q.processAllAvailable()
        out = spark.sql("select * from sem_dedup").toPandas()
    finally:
        q.stop()
    got = set(out.doc_id)
    assert got & dropped == set()
    assert 11 in got
    # the unit-identical in-stream pair: exactly one survives
    assert len(got & {12, 13}) == (1 if not ({12, 13} & dropped) else 0)
    assert set(out.columns) == {"doc_id", "embedding", "ts"}


def test_pairwise_distances_metrics(spark):
    import numpy as np
    import pandas as pd

    from mars_spark.learn import pairwise as PW

    rng = np.random.default_rng(13)
    X = rng.standard_normal((40, 6))
    Y = rng.standard_normal((5, 6))
    pdf = pd.DataFrame({"vec_id": range(40),
                        "v": [list(map(float, r)) for r in X]})
    sdf = spark.createDataFrame(pdf)
    for metric, ref in [
        ("euclidean", lambda x, y: np.sqrt(((x - y) ** 2).sum())),
        ("sqeuclidean", lambda x, y: ((x - y) ** 2).sum()),
        ("manhattan", lambda x, y: np.abs(x - y).sum()),
        ("cosine", lambda x, y: 1 - x @ y
         / (np.linalg.norm(x) * np.linalg.norm(y))),
        ("rbf", lambda x, y: np.exp(-0.3 * ((x - y) ** 2).sum())),
    ]:
        got = (PW.pairwise_distances(sdf, [list(map(float, r)) for r in Y],
                                     "v", "vec_id", metric=metric,
                                     gamma=0.3).toPandas()
               .set_index(["vec_id", "y_idx"]).dist)
        assert len(got) == 40 * 5
        for i in (0, 7, 39):
            for j in range(5):
                np.testing.assert_allclose(got[(i, j)], ref(X[i], Y[j]),
                                           rtol=1e-9, atol=1e-12)

    # top-k keeps each row's k nearest with deterministic tie-break
    top = PW.pairwise_distances_topk(sdf, [list(map(float, r)) for r in Y],
                                     "v", "vec_id", k=2).toPandas()
    assert len(top) == 40 * 2
    full = (PW.pairwise_distances(sdf, [list(map(float, r)) for r in Y],
                                  "v", "vec_id").toPandas())
    for i in (0, 17, 39):
        exp = (full[full.vec_id == i]
               .sort_values(["dist", "y_idx"]).y_idx.iloc[:2].tolist())
        got_i = (top[top.vec_id == i].sort_values("rank").y_idx.tolist())
        assert got_i == exp


def test_haversine_distance(spark):
    import math

    import pandas as pd

    from mars_spark.learn import pairwise as PW

    # London -> Paris is ~344 km great-circle
    lon = [math.radians(51.5074), math.radians(-0.1278)]
    par = [math.radians(48.8566), math.radians(2.3522)]
    sdf = spark.createDataFrame(pd.DataFrame({"vec_id": [0],
                                              "v": [lon]}))
    d = PW.haversine_distances(sdf, [par], "v", "vec_id").collect()[0]["dist"]
    assert abs(d / 1000 - 344) < 5


def test_make_blobs_deterministic_and_separable(spark):
    import numpy as np

    from mars_spark.learn import datasets as DS
    from mars_spark.learn.facade import KMeans

    df, centers = DS.make_blobs(spark, 300, n_features=4, centers=3,
                                cluster_std=0.5, seed=7)
    pdf = df.toPandas().sort_values("sample_id").reset_index(drop=True)
    assert len(pdf) == 300 and set(pdf.label) == {0, 1, 2}
    # partition-independence: a different layout generates identical bytes
    pdf2 = (df._sdf.repartition(13).toPandas()
            if hasattr(df, "_sdf") else
            df.repartition(13).toPandas()
            ).sort_values("sample_id").reset_index(drop=True)
    np.testing.assert_array_equal(
        np.vstack(pdf.features.to_numpy()),
        np.vstack(pdf2.features.to_numpy()))
    # points sit near their centers (std 0.5, 4 dims -> E||x-c|| ~ 1)
    X = np.vstack(pdf.features.to_numpy())
    C = np.asarray(centers)
    d_own = np.linalg.norm(X - C[pdf.label.to_numpy()], axis=1)
    assert np.mean(d_own) < 2.0
    # normals look standard: mean ~0, std ~cluster_std per coordinate
    resid = (X - C[pdf.label.to_numpy()]).ravel()
    assert abs(resid.mean()) < 0.1 and abs(resid.std() - 0.5) < 0.1


def test_make_regression_recoverable(spark):
    import numpy as np

    from mars_spark.learn import datasets as DS

    df, coef = DS.make_regression(spark, 500, n_features=3, noise=0.0,
                                  bias=2.0, seed=3)
    pdf = df.toPandas()
    X = np.vstack(pdf.features.to_numpy())
    y = pdf.target.to_numpy()
    # noiseless: least squares recovers coef and bias exactly
    sol, *_ = np.linalg.lstsq(np.hstack([X, np.ones((len(X), 1))]),
                              y, rcond=None)
    np.testing.assert_allclose(sol[:3], coef, rtol=1e-8)
    np.testing.assert_allclose(sol[3], 2.0, rtol=1e-8)


def test_nearest_neighbors_and_graph(spark):
    import numpy as np

    from mars_spark.learn.facade import NearestNeighbors, kneighbors_graph
    rng = np.random.default_rng(13)
    X = rng.standard_normal((60, 8))
    sdf = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)],
        "vec_id long, embedding array<double>")
    Q = rng.standard_normal((4, 8))
    nn = NearestNeighbors(n_neighbors=5).fit(sdf, "embedding")
    got = nn.kneighbors([[float(v) for v in q] for q in Q]).collect()
    for j in range(4):
        d = np.sqrt(((X - Q[j]) ** 2).sum(axis=1))
        exp = sorted(range(60), key=lambda i: (d[i], i))[:5]
        rows = sorted([r for r in got if r.query_idx == j],
                      key=lambda r: r.rank)
        assert [r.vec_id for r in rows] == exp
        np.testing.assert_allclose([r.dist for r in rows],
                                   np.round(sorted(d)[:5], 6), atol=1e-6)
    # repartitioned input produces the identical result (the
    # per-batch lexsort boundary rule is layout-invariant)
    nn2 = NearestNeighbors(n_neighbors=5).fit(sdf.repartition(13),
                                              "embedding")
    got2 = nn2.kneighbors([[float(v) for v in q] for q in Q]).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))
    # cosine metric path
    nc = NearestNeighbors(n_neighbors=3, metric="cosine").fit(
        sdf, "embedding")
    gc = nc.kneighbors([[float(v) for v in Q[0]]]).collect()
    dc = 1 - (X @ Q[0]) / (np.linalg.norm(X, axis=1)
                           * np.linalg.norm(Q[0]))
    expc = sorted(range(60), key=lambda i: (dc[i], i))[:3]
    assert [r.vec_id for r in sorted(gc, key=lambda r: r.rank)] == expc
    # unfitted refuses
    import pytest as _pt
    with _pt.raises(ValueError):
        NearestNeighbors().kneighbors([[0.0] * 8])

    # self-graph: each node's 3 nearest others, vs numpy
    g = kneighbors_graph(sdf, "embedding", "vec_id", n_neighbors=3)
    by_src = {}
    for r in g.collect():
        by_src.setdefault(r.src, []).append((r.dist, r.dst))
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    for i in range(60):
        exp = sorted((j for j in range(60) if j != i),
                     key=lambda j: (D[i, j], j))[:3]
        gotn = [d for _, d in sorted(by_src[i])]
        assert gotn == exp, i


def test_stage_chunked_delivery_evicts_state(spark, tmp_path):
    """stage_chunked_delivery + maxFilesPerTrigger=1: identical join
    output to the single-batch delivery with strictly lower peak
    state (the SCALE.md r11 backfill pattern)."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from mars_spark.streaming import core as St

    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    for u in range(20):
        for i in range(30):
            rows.append((u, "view", u * 1000 + i,
                         base + pd.Timedelta(minutes=2 * i)))
        rows.append((u, "purchase", u * 1000 + 999,
                     base + pd.Timedelta(minutes=45)))
    pdf = pd.DataFrame(rows, columns=["user", "event_type", "eid", "ts"])
    sdf = spark.createDataFrame(pdf)
    path = str(tmp_path / "chunks")
    St.stage_chunked_delivery(sdf, "ts", path, n_chunks=4)
    files = sorted(os.listdir(path))
    assert len(files) == 4
    mt = [os.path.getmtime(f"{path}/{f}") for f in files]
    assert mt == sorted(mt) and len(set(mt)) == 4
    src = St.read_stream(spark, "parquet", path,
                         schema=spark.read.parquet(path).schema,
                         maxFilesPerTrigger=1)
    views = (src.filter(F.col("event_type") == "view")
             .select("user", F.col("ts").alias("vts"),
                     F.col("eid").alias("vid")))
    purch = (src.filter(F.col("event_type") == "purchase")
             .select("user", F.col("ts").alias("pts"),
                     F.col("eid").alias("pid")))
    j = St.stream_stream_join(purch, views, on="user", left_ts="pts",
                              right_ts="vts", within="30 minutes",
                              watermark="10 minutes")
    q = (j.writeStream.format("memory").queryName("chunked_ssj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("chunked_ssj")
    # purchases at minute 45 match views in (15, 45] — 15 per user
    assert got.count() == 20 * 15
    # more than one micro-batch actually ran (one per chunk file)
    batches = [p for p in q.recentProgress
               if p.get("numInputRows", 0) > 0]
    assert len(batches) >= 3
