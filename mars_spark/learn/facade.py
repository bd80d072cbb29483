"""sklearn-shaped estimators over MLlib.

Input convention: a Spark DataFrame (or mars_spark.DataFrame) with
either an array<numeric> column or a list of feature columns; labels
are a plain column. fit() returns the wrapper with the MLlib model on
`.model_`; transform/predict return DataFrames with appended columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def _sdf(df) -> SparkDF:
    return df.to_spark() if hasattr(df, "to_spark") else df


def _with_features(sdf: SparkDF, features) -> tuple[SparkDF, str]:
    """Assemble a `features` vector column from array col or col list."""
    from pyspark.ml.functions import array_to_vector

    if isinstance(features, str):
        dtype = dict(sdf.dtypes)[features]
        if dtype.startswith("array"):
            arr = F.col(features)
            if "float" in dtype or "int" in dtype or "bigint" in dtype:
                arr = F.transform(arr, lambda x: x.cast("double"))
            return sdf.withColumn("__features", array_to_vector(arr)), "__features"
        features = [features]
    arr = F.array(*[F.col(c).cast("double") for c in features])
    return sdf.withColumn("__features", array_to_vector(arr)), "__features"


class _Wrapper:
    def __init__(self, **params):
        self.params = params
        self.model_ = None


class KMeans(_Wrapper):
    """reference: mars/learn/cluster/_kmeans.py:596 (Lloyd/Elkan in
    Cython) → MLlib KMeans (distributed Lloyd with kmeans|| init)."""

    def __init__(self, n_clusters: int = 8, seed: int = 42,
                 max_iter: int = 20, init=None, tol: float = 1e-4,
                 centroid_decimals: int | None = None):
        """``init=`` with explicit centroid vectors (sklearn's ndarray
        init) runs a DataFrame-native Lloyd loop instead of MLlib —
        MLlib KMeans has no user-provided-centroid init, and its
        kmeans|| seeding samples per partition, so results shift with
        the reader's split count. The Lloyd path is bit-deterministic
        given the init (assignment is a BLAS gemm per Arrow batch, the
        update one groupBy agg); ``centroid_decimals`` additionally
        quantizes centroids after each update so reduction-order fp
        noise cannot flip a near-tie assignment across engines/layouts.
        """
        super().__init__(n_clusters=n_clusters, seed=seed,
                         max_iter=max_iter, init=init, tol=tol,
                         centroid_decimals=centroid_decimals)

    def fit(self, df, features):
        if self.params["init"] is not None:
            return self._fit_lloyd(_sdf(df), features)
        from pyspark.ml.clustering import KMeans as MLKMeans

        sdf, fcol = _with_features(_sdf(df), features)
        self.model_ = MLKMeans(
            k=self.params["n_clusters"], seed=self.params["seed"],
            maxIter=self.params["max_iter"], featuresCol=fcol,
            predictionCol="cluster",
        ).fit(sdf)
        self._fcol, self._features = fcol, features
        return self

    # ------------------------------------------------------ Lloyd path
    @staticmethod
    def _assign_euclid(sdf: SparkDF, arr_col: str, cents):
        """argmin_k ||x - c_k||² as ONE gemm per Arrow batch: the
        n×d batch times dᵀ×k centroids; ||x||² is row-constant so
        argmin(-2x·c + ||c||²) suffices. Ties break to the lowest
        cluster id (np.argmin first-min), matching the SQL
        min-then-first ordering an oracle replays. Same design as the
        IVF quantizer (llm/similarity.py ivf_index_deterministic);
        reference: mars/learn/cluster/_kmeans.py:596."""
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        cmat = np.asarray(cents, dtype=np.float64)      # k × d
        c2 = (cmat ** 2).sum(axis=1)                    # k

        def _argmin(e):
            if e.empty:
                return pd.Series([], dtype="int32")
            m = np.vstack([np.asarray(v, dtype=np.float64) for v in e])
            scores = -2.0 * (m @ cmat.T) + c2
            return pd.Series(np.argmin(scores, axis=1).astype("int32"))

        _argmin_udf = pandas_udf(_argmin, "int")
        return sdf.withColumn("cluster", _argmin_udf(F.col(arr_col)))

    def _fit_lloyd(self, sdf: SparkDF, features):
        cents = [[float(x) for x in c] for c in self.params["init"]]
        k, dim = len(cents), len(cents[0])
        dec = self.params["centroid_decimals"]
        base = sdf.select(F.transform(
            features, lambda x: x.cast("double")).alias("e"))
        # the loop scans base max_iter times — keep the projected
        # doubles resident (MEMORY_AND_DISK: spills, never OOMs;
        # explicit unpersist, not localCheckpoint — lineage survives
        # executor loss at cluster scale)
        from pyspark import StorageLevel

        cached = self.params["max_iter"] > 1
        if cached:
            base = base.persist(StorageLevel.MEMORY_AND_DISK)
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml.stat import Summarizer

        for _ in range(self.params["max_iter"]):
            assigned = self._assign_euclid(base, "e", cents)
            # centroid update = ONE JVM vector-mean aggregate
            # (Summarizer), not d per-element agg expressions — the
            # wide-agg form spent seconds in Catalyst codegen per call.
            # k×(d+1) collect — bounded by cluster count, never
            # data-sized.
            rows = {r["cluster"]: r for r in assigned
                    .select("cluster", array_to_vector("e").alias("fv"))
                    .groupBy("cluster")
                    .agg(Summarizer.mean(F.col("fv")).alias("m"))
                    .collect()}
            new = []
            for ci in range(k):
                if ci in rows:
                    c = [float(x) for x in rows[ci]["m"]]
                    if dec is not None:
                        import math
                        c = [math.floor(x * 10**dec + 0.5) / 10**dec
                             for x in c]
                else:
                    c = cents[ci]  # empty cluster keeps its centroid
                new.append(c)
            shift = max(abs(a - b) for cn, co in zip(new, cents)
                        for a, b in zip(cn, co))
            cents = new
            if shift <= self.params["tol"]:
                break
        if cached:
            base.unpersist()
        self._centers, self._features = cents, features
        return self

    def predict(self, df, features=None):
        if self.params["init"] is not None:
            sdf = _sdf(df)
            feat = features or self._features
            out = self._assign_euclid(
                sdf.withColumn("__e", F.transform(
                    feat, lambda x: x.cast("double"))), "__e",
                self._centers)
            return out.drop("__e")
        sdf, fcol = _with_features(_sdf(df), features or self._features)
        return self.model_.transform(sdf).drop("__features")

    @property
    def cluster_centers_(self):
        if self.params["init"] is not None:
            return [list(c) for c in self._centers]
        return [list(c) for c in self.model_.clusterCenters()]


class PCA(_Wrapper):
    """reference: mars/learn/decomposition/_pca.py → MLlib PCA."""

    def __init__(self, n_components: int = 2):
        super().__init__(n_components=n_components)

    def fit(self, df, features):
        from pyspark.ml.feature import PCA as MLPCA

        sdf, fcol = _with_features(_sdf(df), features)
        self.model_ = MLPCA(k=self.params["n_components"], inputCol=fcol,
                            outputCol="pca_features").fit(sdf)
        self._features = features
        return self

    def transform(self, df, features=None):
        sdf, fcol = _with_features(_sdf(df), features or self._features)
        from pyspark.ml.functions import vector_to_array

        out = self.model_.transform(sdf)
        return out.withColumn(
            "pca_features", vector_to_array("pca_features")).drop("__features")

    @property
    def explained_variance_ratio_(self):
        return list(self.model_.explainedVariance)


class LinearRegression(_Wrapper):
    """reference: mars/learn/linear_model/_base.py → MLlib (normal-eq
    solver for small feature counts, L-BFGS otherwise — MLlib picks)."""

    def __init__(self, reg_param: float = 0.0, elastic_net: float = 0.0):
        super().__init__(reg_param=reg_param, elastic_net=elastic_net)

    def fit(self, df, features, label: str):
        from pyspark.ml.regression import LinearRegression as MLLR

        sdf, fcol = _with_features(_sdf(df), features)
        self.model_ = MLLR(
            featuresCol=fcol, labelCol=label,
            regParam=self.params["reg_param"],
            elasticNetParam=self.params["elastic_net"],
            predictionCol="prediction",
        ).fit(sdf)
        self._features = features
        return self

    def predict(self, df, features=None):
        sdf, fcol = _with_features(_sdf(df), features or self._features)
        return self.model_.transform(sdf).drop("__features")

    @property
    def coef_(self):
        return list(self.model_.coefficients)

    @property
    def intercept_(self):
        return float(self.model_.intercept)


class LogisticRegression(_Wrapper):
    """reference: mars/learn/glm → MLlib LogisticRegression."""

    def __init__(self, reg_param: float = 0.0, max_iter: int = 100):
        super().__init__(reg_param=reg_param, max_iter=max_iter)

    def fit(self, df, features, label: str):
        from pyspark.ml.classification import LogisticRegression as MLLogit

        sdf, fcol = _with_features(_sdf(df), features)
        self.model_ = MLLogit(
            featuresCol=fcol, labelCol=label,
            regParam=self.params["reg_param"],
            maxIter=self.params["max_iter"],
        ).fit(sdf)
        self._features = features
        return self

    def predict(self, df, features=None):
        sdf, fcol = _with_features(_sdf(df), features or self._features)
        return self.model_.transform(sdf).drop(
            "__features", "rawPrediction", "probability")


class MinMaxScaler(_Wrapper):
    """reference: mars/learn/preprocessing/_data.py. Implemented as a
    pure aggregate + projection (no MLlib vector detour): one pass for
    min/max, broadcast back — the exact two-stage plan Mars builds."""

    def fit(self, df, cols: list[str]):
        sdf = _sdf(df)
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        self.bounds_ = sdf.agg(*aggs).collect()[0].asDict()
        self._cols = cols
        return self

    def transform(self, df):
        sdf = _sdf(df)
        for c in self._cols:
            mn, mx = self.bounds_[f"__mn_{c}"], self.bounds_[f"__mx_{c}"]
            span = (mx - mn) or 1.0
            sdf = sdf.withColumn(c, (F.col(c) - F.lit(mn)) / F.lit(span))
        return sdf


class StandardScaler(_Wrapper):
    def fit(self, df, cols: list[str]):
        sdf = _sdf(df)
        aggs = []
        for c in cols:
            aggs += [F.avg(c).alias(f"__mu_{c}"),
                     F.stddev_samp(c).alias(f"__sd_{c}")]
        self.stats_ = sdf.agg(*aggs).collect()[0].asDict()
        self._cols = cols
        return self

    def transform(self, df):
        sdf = _sdf(df)
        for c in self._cols:
            mu, sd = self.stats_[f"__mu_{c}"], self.stats_[f"__sd_{c}"] or 1.0
            sdf = sdf.withColumn(c, (F.col(c) - F.lit(mu)) / F.lit(sd))
        return sdf


class LabelEncoder:
    """reference: mars/learn/preprocessing/_label.py — codes are the
    position in the sorted distinct values (sklearn contract). The
    distinct set is label-cardinality-sized by definition; small sets
    become a literal map expression (whole-stage codegen), large ones
    a broadcast join against the code table — never a global window."""

    _MAP_THRESHOLD = 10_000

    def fit(self, df, col: str):
        sdf = _sdf(df)
        # NULLs are excluded from the class set (sorting a distinct set
        # containing None is a TypeError, and a null is "no label", not
        # a label); transform passes nulls through as null codes
        self.classes_ = [r[0] for r in
                         sdf.select(col).distinct().collect()
                         if r[0] is not None]
        self.classes_.sort()
        self._col = col
        return self

    def transform(self, df, col: str | None = None):
        """Unseen (non-null) labels code to -1 — the distributed
        handle_unknown convention (sklearn OrdinalEncoder's
        use_encoded_value; Spark ML StringIndexer's handleInvalid):
        raising per-row inside a cluster job is not actionable, a
        sentinel is filterable. Nulls stay null."""
        sdf, col = _sdf(df), col or self._col
        out_name = f"{col}_code"
        if len(self.classes_) <= self._MAP_THRESHOLD:
            pairs = []
            for i, v in enumerate(self.classes_):
                pairs += [F.lit(v), F.lit(i)]
            code = F.element_at(F.create_map(*pairs), F.col(col))
            code = F.when(F.col(col).isNull(), F.lit(None)).otherwise(
                F.coalesce(code, F.lit(-1)))
            return sdf.withColumn(out_name, code.cast("int"))
        codes = sdf.sparkSession.createDataFrame(
            [(v, i) for i, v in enumerate(self.classes_)],
            f"{col} string, {out_name} int")
        out = sdf.join(F.broadcast(codes), on=col, how="left")
        unseen = F.when(F.col(col).isNull(), F.lit(None)).otherwise(
            F.coalesce(F.col(out_name), F.lit(-1)))
        return out.withColumn(out_name, unseen.cast("int"))

    def fit_transform(self, df, col: str):
        return self.fit(df, col).transform(df)


def normalize(df, col: str, norm: str = "l2"):
    """reference: mars/learn/preprocessing (normalize) — row-wise
    array normalization, Arrow-batched (r11): the HOF form
    ``transform(arr, x -> try_divide(x, mag))`` re-evaluated the
    ``mag`` aggregate PER ELEMENT (interpreted lambdas get no
    subexpression elimination — the same O(d²)-per-row bug the
    similarity module's unit() had, measured 47.6 s vs 0.8 s per
    evaluation over 200k 64-dim rows). One vectorized numpy norm per
    Arrow batch; zero-magnitude rows normalize to NaN elements
    (the try_divide null contract)."""
    if norm not in ("l2", "l1", "max"):
        raise ValueError(norm)
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sdf = _sdf(df)

    # no type hints: PEP 563 postponed annotations break pandas_udf
    # signature inspection
    def _nrm(e):
        if e.empty:
            return pd.Series([], dtype=object)
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in e])
        if norm == "l2":
            n = np.linalg.norm(m, axis=1)
        elif norm == "l1":
            n = np.abs(m).sum(axis=1)
        else:
            n = np.abs(m).max(axis=1) if m.shape[1] else \
                np.zeros(len(m))
        n = np.where(n == 0.0, np.nan, n)
        return pd.Series(list(m / n[:, None]))

    arr = F.transform(col, lambda x: x.cast("double"))
    return sdf.withColumn(col, pandas_udf(_nrm, "array<double>")(arr))


def shuffle(*dfs, random_state: int = 0):
    """Shuffle aligned collections with ONE shared permutation
    (reference: mars/learn/utils/shuffle.py:464 — Mars draws one
    permutation and reindexes every input with it).

    Spark-first: the permutation IS the sort order of
    ``md5(seed ‖ index)`` — a deterministic keyed range-partition
    sort, no RNG state, so (a) every input carrying the same index
    values reorders identically (the alignment Mars gets from the
    shared permutation), and (b) the result is reproducible across
    partition layouts and cluster sizes. Engine frames keep their
    index; bare Spark DataFrames are keyed on all columns."""
    from mars_spark.core.frame import DataFrame as _EngineDF

    outs = []
    for df in dfs:
        sdf = _sdf(df)
        # key on the index when the frame carries one (that is what
        # aligns multi-input shuffles); otherwise on all columns
        key_src = (df._index if isinstance(df, _EngineDF) and df._index
                   else sdf.columns)
        key = F.md5(F.concat_ws(
            "\x1f", F.lit(str(random_state)),
            *[F.col(c).cast("string") for c in key_src]))
        shuffled = sdf.orderBy(key)
        if isinstance(df, _EngineDF):
            outs.append(_EngineDF(shuffled, df._index))
        else:
            outs.append(shuffled)
    return outs[0] if len(outs) == 1 else tuple(outs)


def train_test_split(df, test_size: float = 0.25, seed: int = 42):
    """reference: mars/learn/model_selection/_split.py:29 →
    randomSplit (per-partition Bernoulli — no global shuffle).

    NOTE: randomSplit membership depends on the partition layout —
    re-running after a repartition yields a DIFFERENT split. For the
    reproducible production contract, use ``hash_split``."""
    sdf = _sdf(df)
    train, test = sdf.randomSplit([1 - test_size, test_size], seed=seed)
    return train, test


def hash_split(df, test_size: float = 0.25, id_col: str = "id",
               seed=42):
    """Deterministic train/test split keyed on ``md5(seed|id)`` (the
    llm/mixture.py hash-Bernoulli rule): a row is test iff its first 6
    md5 hex chars fall under the test_size threshold.

    Unlike ``randomSplit`` (per-partition seeded), membership depends
    only on (id, seed): it is stable under repartitioning, speculative
    retries, cluster size, and engine choice — the SQL oracle replays
    the exact rule. Both halves are narrow filters over the input (no
    shuffle, no materialization); resolution is 16^-6 ≈ 6e-8."""
    from mars_spark.llm.mixture import _HEX_SPAN, _hex_threshold, hash_key

    sdf = _sdf(df)
    t = max(0, min(_HEX_SPAN, int(round(test_size * _HEX_SPAN))))
    if t >= _HEX_SPAN:
        return sdf.filter(F.lit(False)), sdf
    if t <= 0:
        return sdf, sdf.filter(F.lit(False))
    is_test = hash_key(id_col, seed) < F.lit(_hex_threshold(test_size))
    return sdf.filter(~is_test), sdf.filter(is_test)


# ------------------------------------------------------------------ metrics
def accuracy_score(df, label: str, pred: str = "prediction") -> float:
    """reference: mars/learn/metrics (classification)."""
    sdf = _sdf(df)
    row = sdf.agg(
        F.avg((F.col(label) == F.col(pred)).cast("double")).alias("acc")
    ).collect()[0]
    return float(row.acc)


def mean_squared_error(df, label: str, pred: str = "prediction") -> float:
    sdf = _sdf(df)
    row = sdf.agg(F.avg(F.pow(F.col(label) - F.col(pred), 2)).alias("mse")
                  ).collect()[0]
    return float(row.mse)


def r2_score(df, label: str, pred: str = "prediction") -> float:
    sdf = _sdf(df)
    # one pass: ss_tot = sum(y²) - n·ȳ² (computational form)
    s = sdf.agg(
        F.sum(F.pow(F.col(label) - F.col(pred), 2)).alias("ss_res"),
        F.sum(F.pow(F.col(label), 2)).alias("sum_y2"),
        F.sum(F.col(label)).alias("sum_y"),
        F.count(F.col(label)).alias("n"),
    ).collect()[0]
    ss_tot = s.sum_y2 - (s.sum_y ** 2) / s.n
    return 1.0 - s.ss_res / ss_tot


def precision_recall_f1(df, label: str, pred: str = "prediction",
                        positive=1.0) -> dict:
    """Binary precision/recall/F1 in ONE distributed agg pass
    (reference: mars/learn/metrics/_classification.py — Mars computes
    the confusion counts with tensor reductions; here they are four
    conditional sums)."""
    sdf = _sdf(df)
    is_pos = F.col(label) == F.lit(positive)
    pred_pos = F.col(pred) == F.lit(positive)
    s = sdf.agg(
        F.sum((is_pos & pred_pos).cast("long")).alias("tp"),
        F.sum((~is_pos & pred_pos).cast("long")).alias("fp"),
        F.sum((is_pos & ~pred_pos).cast("long")).alias("fn"),
    ).collect()[0]
    prec = s.tp / (s.tp + s.fp) if (s.tp + s.fp) else 0.0
    rec = s.tp / (s.tp + s.fn) if (s.tp + s.fn) else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    return {"precision": prec, "recall": rec, "f1": f1}


def log_loss(df, label: str, prob: str = "probability",
             eps: float = 1e-15) -> float:
    """Binary cross-entropy (reference: mars/learn/metrics). Clipped
    probabilities, single agg."""
    sdf = _sdf(df)
    p = F.least(F.greatest(F.col(prob), F.lit(eps)), F.lit(1 - eps))
    row = sdf.agg(F.avg(
        -(F.col(label) * F.log(p) + (1 - F.col(label)) * F.log(1 - p))
    ).alias("ll")).collect()[0]
    return float(row.ll)


def roc_auc_score(df, label: str, score: str) -> float:
    """Rank-based AUC (Mann-Whitney U): AUC = (R_pos − n_pos(n_pos+1)/2)
    / (n_pos·n_neg) where R_pos is the rank-sum of positives with
    average ranks over score ties. Reference: mars/learn/metrics/
    _ranking.py computes the same integral via sorted cum-sums.

    Fully distributed: ONE per-score aggregation (cnt, n_pos), the
    range-partitioned prefix-sum machinery (operators/rank.py) for the
    exclusive cumulative counts, then a scalar agg over the per-score
    table — the full dataset is touched exactly once (the groupBy) and
    never funnels through a single-partition window."""
    from mars_spark.operators.rank import prefix_stats

    per_score = (_sdf(df)
                 .select(F.col(label).alias("y"), F.col(score).alias("s"))
                 .filter(F.col("s").isNotNull() & F.col("y").isNotNull())
                 .groupBy("s")
                 .agg(F.count(F.lit(1)).alias("__cnt"),
                      F.sum((F.col("y") == 1).cast("long")).alias("np"),
                      F.sum((F.col("y") == 0).cast("long")).alias("nn")))
    stats = prefix_stats(per_score, "s", "__cnt", ascending=True)
    # avg rank of every row at score s = before + (cnt+1)/2; negatives
    # are counted explicitly (y == 0), not inferred as cnt - np, so
    # rows with labels outside {0, 1} never shift the AUC
    agg = stats.agg(
        F.sum((F.col("__before") + (F.col("__cnt") + 1) / 2.0)
              * F.col("np")).alias("rpos"),
        F.sum("np").alias("npos"),
        F.sum("nn").alias("nneg"),
    ).collect()[0]
    if not agg.npos or not agg.nneg:
        return float("nan")
    return float((agg.rpos - agg.npos * (agg.npos + 1) / 2)
                 / (agg.npos * agg.nneg))


class KNeighborsClassifier:
    """Brute-force k-NN estimator (reference: mars/learn/neighbors/
    — Mars wraps kd/ball-tree and faiss/proxima backends per chunk).
    Spark-first: the train set broadcasts (dimension tables of up to
    ~100s of MB are broadcastable); each test row scores all train
    rows via a JVM dot/distance expression, keeps top-k with a
    row_number window, and majority-votes. For train sets beyond
    broadcast size use llm.similarity (IVF / LSH) — those are the
    scale backends, exactly as Mars swaps in ANN libraries."""

    def __init__(self, n_neighbors: int = 5, features: str = "features",
                 label: str = "label"):
        self.k = n_neighbors
        self.features = features
        self.label = label
        self._train = None

    def fit(self, df):
        self._train = _sdf(df).select(
            F.col(self.features).alias("__tf"),
            F.col(self.label).alias("__tl"))
        return self

    def predict(self, df, id_col: str):
        """Top-k search is ONE BLAS gemm per Arrow batch: the train
        matrix (broadcast-sized by the class contract) rides into the
        UDF closure; each test batch computes b×n distances and keeps
        its k nearest. No pair blow-up ever materializes — the old
        test×train join evaluated an interpreted zip_with/aggregate
        distance per pair and funneled 100k+ rows through a window.
        Per-test-row d² values share the −‖x‖² shift, so every
        ordering (neighbor rank, best-distance tie-break) is
        unchanged."""
        import numpy as np
        from pyspark.sql import Window
        from pyspark.sql.functions import pandas_udf

        rows = self._train.collect()
        M = np.vstack([np.asarray(r["__tf"], dtype=np.float64)
                       for r in rows])
        labels = np.asarray([r["__tl"] for r in rows])
        M2 = (M ** 2).sum(axis=1)
        k = min(self.k, len(rows))

        def _topk(e):
            out = []
            for lo in range(0, len(e), 1024):
                chunk = e.iloc[lo:lo + 1024]
                B = np.vstack([np.asarray(v, dtype=np.float64)
                               for v in chunk])
                D = -2.0 * (B @ M.T) + M2          # b × n (+‖x‖² const)
                # equal-distance ties break on label, not on the
                # train rows' collect() order — the selection is then
                # deterministic across partitionings and replayable by
                # a SQL oracle (ORDER BY distance, label); among equal
                # (d, label) pairs any pick yields identical votes
                L = np.broadcast_to(labels, D.shape)
                idx = np.lexsort((L, D), axis=1)[:, :k]
                out.extend(
                    [(int(labels[j]), float(D[i, j])) for j in idx[i]]
                    for i in range(len(chunk)))
            return pd.Series(out)

        topk_udf = pandas_udf(_topk, "array<struct<l: long, d: double>>")
        test = _sdf(df).select(F.col(id_col), F.col(self.features))
        ex = test.select(
            id_col, F.explode(topk_udf(F.col(self.features))).alias("nb"))
        votes = ex.groupBy(id_col, F.col("nb.l").alias("__tl")).agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("nb.d").alias("__best"))
        wv = Window.partitionBy(id_col).orderBy(
            F.desc("__n"), F.asc("__best"), F.asc("__tl"))
        return (votes.withColumn("__rv", F.row_number().over(wv))
                .filter(F.col("__rv") == 1)
                .select(id_col, F.col("__tl").alias("prediction")))


class NearestNeighbors:
    """Unsupervised kNN queries (reference: mars/learn/neighbors/
    unsupervised.py — NearestNeighbors.fit / kneighbors; Mars selects
    kd-tree / ball-tree / faiss / proxima backends per chunk).
    Spark-first: the FITTED table stays distributed; queries are a
    driver-side list (the broadcast direction, like
    learn/pairwise). kneighbors computes one BLAS block per Arrow
    batch, keeps each query's k nearest WITHIN the batch (so only
    ~n_batches × m × k candidate rows shuffle, never the b × m
    block), and a per-query window takes the global top-k with a
    deterministic (dist, id) tie-break. For table-vs-table neighbor
    joins use kneighbors_graph below or llm.similarity's IVF/PQ."""

    def __init__(self, n_neighbors: int = 5,
                 metric: str = "euclidean"):
        self.n_neighbors = n_neighbors
        self.metric = metric

    def fit(self, df, features: str, id_col: str = "vec_id"):
        self._fit_sdf = _sdf(df)
        self._features = features
        self._id = id_col
        return self

    def kneighbors(self, queries, n_neighbors: int | None = None):
        """(query_idx, rank, <id_col>, dist) for each query vector —
        rank 1 = nearest."""
        import numpy as np
        import pandas as pd
        from pyspark.sql import Window

        from mars_spark.learn.pairwise import _METRICS, _block

        if not hasattr(self, "_fit_sdf"):
            raise ValueError("fit() before kneighbors()")
        if self.metric not in _METRICS:
            raise ValueError(f"unknown metric {self.metric!r}")
        k = n_neighbors or self.n_neighbors
        ym = np.asarray(queries, dtype=np.float64)
        m = len(queries)
        metric = self.metric
        id_col = self._id
        id_type = dict(self._fit_sdf.dtypes)[id_col]
        base = self._fit_sdf.select(F.col(id_col),
                                    F.col(self._features).alias("__e"))

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                xs = np.vstack([np.asarray(v, dtype=np.float64)
                                for v in pdf["__e"]])
                d = _block(metric, xs, ym, 1.0)      # b × m
                ids = pdf[id_col].to_numpy()
                kk = min(k, len(pdf))
                # per query: kk smallest with (dist, id) lexsort so
                # boundary ties never drop the smaller id — the
                # global window re-ranks by the same key, keeping
                # the result deterministic across partitionings
                sel_ids, sel_d, sel_q = [], [], []
                for j in range(m):
                    order = np.lexsort((ids, d[:, j]))[:kk]
                    sel_ids.append(ids[order])
                    sel_d.append(d[order, j])
                    sel_q.append(np.full(kk, j, dtype=np.int32))
                yield pd.DataFrame({
                    "query_idx": np.concatenate(sel_q),
                    id_col: np.concatenate(sel_ids),
                    "dist": np.concatenate(sel_d),
                })

        part = base.mapInPandas(
            gen, schema=f"query_idx int, {id_col} {id_type}, dist double")
        w = Window.partitionBy("query_idx").orderBy(
            F.col("dist").asc(), F.col(id_col).asc())
        return (part.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_idx", "rank", id_col,
                        F.round("dist", 6).alias("dist")))


def kneighbors_graph(df, features: str, id_col: str,
                     n_neighbors: int = 5,
                     include_self: bool = False):
    """kNN edge list of a table against ITSELF (reference:
    mars/learn/neighbors/_kneighbors_graph.py — Mars materializes the
    sparse connectivity matrix; the relational form is the edge
    list). Broadcast self-join + per-source window, the same scale
    envelope (and edge shape) as label_propagation's internal graph
    builder; beyond broadcast size, llm.similarity's IVF/LSH paths
    produce the same (src, dst) edges approximately. Returns
    (src, dst, dist) with rank-(dist, dst) determinism."""
    from pyspark.sql import Window

    sdf = _sdf(df)
    arr = F.transform(F.col(features), lambda x: x.cast("double"))
    base = sdf.select(F.col(id_col).alias("src"), arr.alias("fs"))
    rhs = sdf.select(F.col(id_col).alias("dst"), arr.alias("fd"))
    dist = F.sqrt(F.aggregate(
        F.zip_with(F.col("fs"), F.col("fd"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x))
    w = Window.partitionBy("src").orderBy(F.asc("__d"), F.asc("dst"))
    out = base.join(F.broadcast(rhs))
    if not include_self:
        out = out.filter(F.col("src") != F.col("dst"))
    return (out.withColumn("__d", dist)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_neighbors)
            .select("src", "dst", F.round("__d", 6).alias("dist")))


class GeneralizedLinearModel(_Wrapper):
    """GLM (reference: mars/learn/glm/ — Mars implements multinomial
    logistic by hand over tensors) → MLlib GeneralizedLinearRegression:
    gaussian/binomial/poisson/gamma/tweedie families with IRLS, fully
    distributed."""

    def __init__(self, family: str = "gaussian", link: str | None = None,
                 reg_param: float = 0.0, max_iter: int = 25):
        super().__init__(family=family, link=link, reg_param=reg_param,
                         max_iter=max_iter)

    def fit(self, df, features, label: str):
        from pyspark.ml.regression import GeneralizedLinearRegression

        sdf, fcol = _with_features(_sdf(df), features)
        kw = dict(family=self.params["family"],
                  regParam=self.params["reg_param"],
                  maxIter=self.params["max_iter"],
                  featuresCol=fcol, labelCol=label,
                  predictionCol="prediction")
        if self.params["link"]:
            kw["link"] = self.params["link"]
        self.model_ = GeneralizedLinearRegression(**kw).fit(sdf)
        self._features = features
        return self

    def predict(self, df, features=None):
        sdf, _ = _with_features(_sdf(df), features or self._features)
        return self.model_.transform(sdf).drop("__features")

    @property
    def coef_(self):
        return list(self.model_.coefficients)

    @property
    def intercept_(self):
        return float(self.model_.intercept)


class TruncatedSVD(_Wrapper):
    """reference: mars/learn/decomposition/_truncated_svd.py (randomized
    SVD over tensors). Spark-first: one distributed gramian pass
    (X'X, d×d — bounded by feature count, not rows), driver-side eigh
    on the d×d matrix, transform as a JVM matrix-vector projection.
    Unlike PCA the data is NOT centered (TruncatedSVD contract — works
    on sparse/long-tailed features without densifying a mean)."""

    def __init__(self, n_components: int = 2):
        super().__init__(n_components=n_components)

    def fit(self, df, features: str):
        import numpy as np

        sdf = _sdf(df)
        k = self.params["n_components"]
        arr = F.transform(F.col(features), lambda x: x.cast("double"))
        d = sdf.select(F.size(arr).alias("d")).first()["d"]
        # gramian via aggregate of outer-product rows: one pass,
        # d(d+1)/2 sums map-side-combined
        exprs = []
        for i in range(d):
            for j in range(i, d):
                exprs.append(F.sum(arr[i] * arr[j]).alias(f"g_{i}_{j}"))
        row = sdf.agg(*exprs).collect()[0]
        G = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
        w, v = np.linalg.eigh(G)
        order = np.argsort(w)[::-1][:k]
        self.singular_values_ = np.sqrt(np.maximum(w[order], 0.0))
        self.components_ = v[:, order].T  # k × d
        self._features = features
        return self

    def transform(self, df, features=None):
        sdf = _sdf(df)
        features = features or self._features
        arr = F.transform(F.col(features), lambda x: x.cast("double"))
        comps = self.components_
        out = F.array(*[
            sum((arr[j] * float(comps[i, j]) for j in range(comps.shape[1])),
                start=F.lit(0.0)).alias(f"c{i}")
            for i in range(comps.shape[0])
        ])
        return sdf.withColumn("svd", out)


class BaggingRegressor(_Wrapper):
    """reference: mars/learn/ensemble/_bagging.py (chunk-level bagging
    with shuffle reducers). Spark-first: each base model fits on a
    Bernoulli subsample (no data movement — sample() is a scan
    filter), predictions average column-wise. The driver loop is over
    n_estimators (bounded, small); every fit/predict is distributed."""

    def __init__(self, n_estimators: int = 5, sample_frac: float = 0.8,
                 seed: int = 42):
        super().__init__(n_estimators=n_estimators,
                         sample_frac=sample_frac, seed=seed)

    def fit(self, df, features, label: str):
        from pyspark.ml.regression import LinearRegression as MLLinReg

        sdf = _sdf(df)
        self.models_ = []
        for i in range(self.params["n_estimators"]):
            sub = sdf.sample(fraction=self.params["sample_frac"],
                             seed=self.params["seed"] + i)
            s, fcol = _with_features(sub, features)
            self.models_.append(MLLinReg(
                featuresCol=fcol, labelCol=label,
                predictionCol="prediction").fit(s))
        self._features = features
        return self

    def predict(self, df, features=None):
        sdf, fcol = _with_features(_sdf(df), features or self._features)
        preds = []
        for i, m in enumerate(self.models_):
            sdf = m.transform(sdf).withColumnRenamed("prediction", f"__p{i}")
            preds.append(f"__p{i}")
        avg = sum((F.col(p) for p in preds), start=F.lit(0.0)) / len(preds)
        return sdf.withColumn("prediction", avg).drop(*preds, "__features")


class IsolationForest(_Wrapper):
    """reference: mars/learn/ensemble/_iforest.py (wraps per-chunk
    trees). The iForest algorithm itself trains each tree on a tiny
    uniform subsample (ψ=256 in the original paper) — so tree BUILD is
    a driver-side numpy loop over bounded samples by design, and only
    SCORING touches the full data: an Arrow-batched pandas UDF walks
    the broadcast trees per row batch. No sklearn dependency."""

    def __init__(self, n_estimators: int = 50, max_samples: int = 256,
                 seed: int = 42):
        super().__init__(n_estimators=n_estimators,
                         max_samples=max_samples, seed=seed)

    @staticmethod
    def _build_tree(X, rng, depth_limit):
        # nodes: (feature, threshold, left, right) or (-1, size, -1, -1)
        nodes = []

        def rec(idx, depth):
            node_id = len(nodes)
            nodes.append(None)
            if depth >= depth_limit or len(idx) <= 1:
                nodes[node_id] = (-1, float(len(idx)), -1, -1)
                return node_id
            cols = X.shape[1]
            f = int(rng.integers(0, cols))
            lo, hi = X[idx, f].min(), X[idx, f].max()
            if lo == hi:
                nodes[node_id] = (-1, float(len(idx)), -1, -1)
                return node_id
            t = float(rng.uniform(lo, hi))
            lmask = X[idx, f] < t
            l = rec(idx[lmask], depth + 1)
            r = rec(idx[~lmask], depth + 1)
            nodes[node_id] = (f, t, l, r)
            return node_id

        import numpy as np

        rec(np.arange(len(X)), 0)
        return nodes

    def fit(self, df, features: str):
        import numpy as np

        sdf = _sdf(df)
        psi = self.params["max_samples"]
        n_est = self.params["n_estimators"]
        total = sdf.count()
        frac = min(1.0, (psi * 1.3) / max(total, 1))
        rng = np.random.default_rng(self.params["seed"])
        self.psi_ = min(psi, total)
        depth = int(np.ceil(np.log2(max(self.psi_, 2))))
        # ONE scan for all trees: per tree i an independent per-row
        # uniform draw (rand(seed+i)); a row ships to the driver iff
        # it enters at least one tree's Bernoulli pre-sample, carrying
        # its draw vector so the driver can split it back per tree.
        # Replaces n_estimators sequential sample() jobs — at cluster
        # scale one read of the table instead of n, with the shipped
        # volume still bounded at ~1.3·ψ·n rows in expectation.
        # (The earlier per-tree form also had an ORDER-BIAS bug:
        # .limit(psi) kept only whatever partitions were read first.
        # The Bernoulli-then-driver-rng-downsample here keeps every
        # row equally likely, as the iForest paper's ψ-subsample
        # requires.)
        draws = F.array(*[F.rand(self.params["seed"] + i)
                          for i in range(n_est)])
        pdf = (sdf.select(F.col(features).alias("x"), draws.alias("u"))
               .where(F.array_min("u") < F.lit(frac))
               .toPandas())
        if len(pdf):
            X_all = np.vstack(pdf["x"].to_numpy()).astype("float64")
            U = np.vstack(pdf["u"].to_numpy())
        else:
            X_all = np.empty((0, 1))
            U = np.empty((0, n_est))
        self.trees_ = []
        for i in range(n_est):
            X = X_all[U[:, i] < frac]
            if len(X) > psi:
                X = X[rng.choice(len(X), psi, replace=False)]
            self.trees_.append(self._build_tree(X, rng, depth))
        self._features = features
        return self

    def scores(self, df, features=None):
        """Anomaly score in (0, 1] per the iForest paper:
        s = 2^(−E[h(x)]/c(ψ)); ≥0.5-ish = anomalous."""
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        trees = self.trees_
        psi = self.psi_

        def c(n):
            if n <= 1:
                return 0.0
            return 2.0 * (np.log(n - 1) + 0.5772156649) - 2.0 * (n - 1) / n

        cpsi = c(psi)

        def path_len(x, nodes):
            node, depth = 0, 0
            while True:
                f, t, l, r = nodes[node]
                if f == -1:
                    return depth + c(int(t))
                node = l if x[f] < t else r
                depth += 1

        @pandas_udf("double")
        def _score(col: pd.Series) -> pd.Series:
            X = np.vstack(col.to_numpy()).astype("float64")
            out = np.empty(len(X))
            for i in range(len(X)):
                e = np.mean([path_len(X[i], t) for t in trees])
                out[i] = 2.0 ** (-e / cpsi) if cpsi > 0 else 0.5
            return pd.Series(out)

        sdf = _sdf(df)
        features = features or self._features
        arr = F.transform(F.col(features), lambda x: x.cast("double"))
        return sdf.withColumn("anomaly_score", _score(arr))


def label_propagation(df, features: str, label: str, id_col: str,
                      n_neighbors: int = 5, max_iter: int = 10,
                      check_convergence: bool = True):
    """Semi-supervised label propagation (reference:
    mars/learn/semi_supervised/_label_propagation.py — Mars builds the
    rbf/knn kernel as a tensor and iterates the propagation matrix).
    Spark-first kNN-graph variant: edges are the k nearest neighbors
    per node (broadcast train side — the same scale envelope as
    KNeighborsClassifier; swap in llm.similarity IVF/LSH for beyond-
    broadcast data), then iterative majority vote over neighbors with
    clamped seeds. Each round is one join + one groupBy, lineage
    truncated per round (localCheckpoint, same pattern as
    llm.dedup.dedup_clusters); unlabeled rows carry label NULL.
    Returns (id_col, label) with propagated labels.

    ``check_convergence=False`` skips the per-round changed-row count
    (one extra join+count job per iteration) and always runs
    ``max_iter`` rounds — the right trade for a small fixed iteration
    budget; identical output either way because each round is a
    deterministic fixed-point map (a converged labeling reproduces
    itself).

    Materialization policy (r13): per-round localCheckpoints exist to
    truncate lineage, but each one is an eager job whose fixed stage
    cost dominates small/medium inputs — so rounds snapshot only when
    the convergence check needs an action anyway, or every 4th round
    for lineage control; a short check_convergence=False run is ONE
    lazy plan executed at the consumer's action. The edge list keeps
    its snapshot (it feeds every round; recomputing the n² window
    per round is real work at scale), the seed projection does not
    (it is a column select off the cached source).
    """
    from pyspark.sql import Window

    sdf = _sdf(df)
    arr = F.transform(F.col(features), lambda x: x.cast("double"))
    base = sdf.select(F.col(id_col).alias("id"), arr.alias("f"),
                      F.col(label).alias("y"))
    lhs = base.select(F.col("id").alias("src"), F.col("f").alias("fs"))
    rhs = base.select(F.col("id").alias("dst"), F.col("f").alias("fd"))
    dist = F.sqrt(F.aggregate(
        F.zip_with(F.col("fs"), F.col("fd"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x))
    w = Window.partitionBy("src").orderBy(F.asc("__d"), F.asc("dst"))
    edges = (lhs.join(F.broadcast(rhs))
             .filter(F.col("src") != F.col("dst"))
             .withColumn("__d", dist)
             .withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") <= n_neighbors)
             .select("src", "dst")
             .localCheckpoint())
    seeds = base.select("id", "y")
    labels = seeds
    for it in range(max_iter):
        votes = (edges.join(labels.withColumnRenamed("id", "dst"), on="dst")
                 .filter(F.col("y").isNotNull())
                 .groupBy("src", "y")
                 .agg(F.count(F.lit(1)).alias("n")))
        wv = Window.partitionBy("src").orderBy(F.desc("n"), F.asc("y"))
        prop = (votes.withColumn("__rv", F.row_number().over(wv))
                .filter(F.col("__rv") == 1)
                .select(F.col("src").alias("id"), F.col("y").alias("py")))
        new_labels = (seeds.join(prop, on="id", how="left")
                      .select("id", F.coalesce(seeds.y, F.col("py"))
                              .alias("y")))
        if check_convergence or (it + 1) % 4 == 0:
            new_labels = new_labels.localCheckpoint()
        if check_convergence:
            changed = (new_labels.alias("n").join(labels.alias("o"), "id")
                       .filter(F.col("n.y").eqNullSafe(F.col("o.y")) == False)  # noqa: E712
                       .count())
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels.withColumnRenamed("id", id_col) \
        .withColumnRenamed("y", label)
