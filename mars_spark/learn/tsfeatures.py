"""Distributed time-series feature extraction (the tsfresh surface).

reference: mars/learn/contrib/tsfresh/core.py hands tsfresh's
per-entity chunks to a ``MarsDistributor`` and lets the *local*
tsfresh library compute every feature inside ``mr.spawn`` tasks; when
tsfresh is absent the reference has no feature extractor at all. This
module is the Spark-first answer for the canonical feature set: each
feature is a closed-form aggregate over an ordered per-entity window,
so the whole extraction compiles to ONE hash exchange on the entity
key + an in-partition sort feeding (a) lag/row-number window columns
and (b) a map-side-combined groupBy — no Python in the hot path.
Formulas follow the published tsfresh definitions
(tsfresh.feature_extraction.feature_calculators; Christ et al.,
Neurocomputing 307 (2018) — "tsfresh" paper).

100 TB design notes: the non-strike features compile to ONE
Exchange(hashpartitioning(id)) feeding the sort-window, the
whole-partition mean window, and the final map-side-combined
aggregate. Per-entity series are streamed through lag-1 frames; the
only buffered frame is the whole-partition mean (one entity's rows),
which is the same bound any per-entity extractor has. Each
``longest_strike_*`` feature is the classic gaps-and-islands shape
(two row_numbers, run-key = difference); it is a second consumer of
the windowed frame, so it costs one more skinny (id, sort, value)
scan + exchange per strike feature, and its one-row-per-entity
result joins back onto the aggregate, which AQE broadcasts. At
corpus scale, request strike features only when needed.

Feature semantics (x = value series ordered by ``column_sort``,
mu/sigma^2 = population mean/variance, per tsfresh):

- ``length``, ``sum_values``, ``mean``, ``standard_deviation``
  (population, ddof=0), ``minimum``, ``maximum``, ``median``
- ``abs_energy``            sum(x_t^2)
- ``mean_abs_change``       mean(|x_{t+1} - x_t|)         (null if n<2)
- ``mean_change``           (x_n - x_1) / (n - 1)          (null if n<2)
- ``cid_ce``                sqrt(sum((x_{t+1} - x_t)^2))   (0 if n<2)
- ``autocorrelation``(lag=1)  sum((x_t-mu)(x_{t+1}-mu)) /
                              ((n-1) * sigma^2)   (null if n<2 or
                              sigma^2 == 0)
- ``linear_trend_slope``    least-squares slope over t = 0..n-1
                            (null if n<2)
- ``count_above_mean``, ``count_below_mean``   strict comparisons
- ``number_crossing_mean``  count of transitions of the boolean
                            (x_t > mu), i.e. crossings through a
                            point exactly on the mean count too.
                            NOTE: this is a mean-anchored VARIANT of
                            tsfresh's ``number_crossing_m`` (which
                            counts crossings of a fixed constant m,
                            default m in {0, -1, 1}) — it is not
                            itself a tsfresh feature; values differ
                            from tsfresh's unless m happens to equal
                            the series mean
- ``longest_strike_above_mean`` / ``longest_strike_below_mean``
                            longest run of consecutive strict
                            above/below-mean points (0 if none)
- ``absolute_sum_of_changes``  sum(|x_{t+1} - x_t|)       (0 if n<2)
- ``mean_second_derivative_central``
                            mean((x_{t+2} - 2x_{t+1} + x_t)/2)
                            (null if n<3)
- ``c3`` (lag=1)            mean(x_{t+2} x_{t+1} x_t)     (null if n<3)
- ``time_reversal_asymmetry_statistic`` (lag=1)
                            mean(x_{t+2}^2 x_{t+1} - x_{t+1} x_t^2)
                            (null if n<3)
- ``number_peaks`` (n=1)    count of points strictly above both
                            neighbors (edges excluded)
- ``first/last_location_of_maximum/minimum``
                            argmax/argmin position over n — first is
                            argmax/n, last is (argmax+1)/n, ties
                            resolved first/last occurrence (tsfresh)
- ``variance_larger_than_standard_deviation``  1.0 iff sigma^2 > sigma
- ``ratio_beyond_r_sigma`` (r=1)  mean(|x_t - mu| > sigma)
- ``root_mean_square``      sqrt(mean(x_t^2))
- ``absolute_maximum``      max(|x_t|)

``median`` uses an exact distributed median (percentile on the
grouped values — exact, not approx, matching the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window
from pyspark.sql import functions as F

from mars_spark.learn.facade import _sdf

#: canonical feature order (column order of the wide output)
ALL_FEATURES = (
    "length", "sum_values", "mean", "standard_deviation", "minimum",
    "maximum", "median", "abs_energy", "mean_abs_change", "mean_change",
    "cid_ce", "autocorrelation", "linear_trend_slope",
    "count_above_mean", "count_below_mean", "number_crossing_mean",
    "longest_strike_above_mean", "longest_strike_below_mean",
    # lag-2 / neighborhood / location family (parameterized tsfresh
    # features fixed at their canonical defaults: lag=1, r=1, n=1)
    "absolute_sum_of_changes", "mean_second_derivative_central",
    "c3", "time_reversal_asymmetry_statistic", "number_peaks",
    "first_location_of_maximum", "last_location_of_maximum",
    "first_location_of_minimum", "last_location_of_minimum",
    "variance_larger_than_standard_deviation", "ratio_beyond_r_sigma",
    "root_mean_square", "absolute_maximum",
)

_STRIKE = ("longest_strike_above_mean", "longest_strike_below_mean")


def _check_user_cols(fn: str, cols) -> None:
    """The builders reserve ``__``-prefixed internal names and
    reference user columns by bare string (where a dotted name would
    resolve as a struct field); fail fast with a clear message
    instead of silently mis-resolving."""
    for c in cols:
        if c is None:
            continue
        if c.startswith("__"):
            raise ValueError(
                f"{fn}: column name {c!r} collides with reserved "
                "internal '__'-prefixed names; rename it first")
        if "." in c:
            raise ValueError(
                f"{fn}: column name {c!r} contains '.', which Spark "
                "resolves as a struct field; rename it first")


def extract_features(df, column_id: str, column_sort,
                     column_value: str,
                     features=None, column_kind: str | None = None,
                     kinds=None) -> SparkDF:
    """One row per ``column_id`` entity; one ``<value>__<feature>``
    double column per requested feature (tsfresh's flat output
    naming). ``column_sort`` may be a single name or a list (ties in
    the primary sort key need a deterministic tiebreaker for
    order-dependent features).

    ``column_kind`` enables tsfresh's long-format input: each
    (entity, kind) series is featurized independently and the kinds
    pivot into ``<kind>__<feature>`` columns. The pivot needs the
    distinct kind values — pass ``kinds`` explicitly to skip the
    discovery job (kinds are a handful of sensor names, never
    data-scale; the per-(id, kind) plan is the same single
    exchange, now keyed on both columns).

    NOTE: like tsfresh, the series is assumed null-free — a null
    ``column_value`` row would still occupy a position (row_number)
    while being skipped by the aggregates, silently shifting the
    location/trend features; drop or impute nulls first."""
    sdf = _sdf(df)
    feats = list(features) if features is not None else list(ALL_FEATURES)
    unknown = sorted(set(feats) - set(ALL_FEATURES))
    if unknown:
        raise ValueError(f"unknown features: {unknown}; "
                         f"choose from {sorted(ALL_FEATURES)}")
    sort_cols = ([column_sort] if isinstance(column_sort, str)
                 else list(column_sort))
    _check_user_cols("extract_features",
                     [column_id, column_value, column_kind, *sort_cols])
    pk = ["__id"] + (["__kind"] if column_kind is not None else [])

    x = F.col("__x")
    wo = Window.partitionBy(*pk).orderBy(*sort_cols)
    wp = Window.partitionBy(*pk)
    base = (sdf.select(
        F.col(column_id).alias("__id"),
        *([F.col(column_kind).cast("string").alias("__kind")]
          if column_kind is not None else []),
        *[F.col(c) for c in sort_cols],
        F.col(column_value).cast("double").alias("__x"))
        .withColumn("__xl", F.lag("__x").over(wo))
        .withColumn("__xl2", F.lag("__x", 2).over(wo))
        .withColumn("__xn", F.lead("__x").over(wo))
        .withColumn("__t", (F.row_number().over(wo) - 1).cast("double"))
        .withColumn("__mu", F.avg("__x").over(wp))
        .withColumn("__sg", F.stddev_pop("__x").over(wp))
        .withColumn("__mx", F.max("__x").over(wp))
        .withColumn("__mn", F.min("__x").over(wp)))

    n = F.count("__x")
    npairs = F.count("__xl")
    s1, s2 = F.sum("__x"), F.sum(x * x)
    mu = s1 / n
    # var_pop's central-moment merge, NOT E[x^2]-E[x]^2: the latter
    # cancels catastrophically for large-mean series (mean ~1e8,
    # std ~1 loses every significant digit in double)
    varp = F.var_pop("__x")
    d = x - F.col("__xl")
    dmu, lmu = x - F.col("__mu"), F.col("__xl") - F.col("__mu")
    t = F.col("__t")
    slope_den = n * F.sum(t * t) - F.sum(t) * F.sum(t)

    aggs = {
        "length": n.cast("double"),
        "sum_values": s1,
        "mean": mu,
        "standard_deviation": F.stddev_pop("__x"),
        "minimum": F.min(x),
        "maximum": F.max(x),
        "median": F.expr("percentile(__x, 0.5)"),
        "abs_energy": s2,
        "mean_abs_change": F.avg(F.abs(d)),
        "mean_change": F.when(
            npairs > 0,
            (F.max_by("__x", "__t") - F.min_by("__x", "__t")) / npairs),
        "cid_ce": F.sqrt(F.coalesce(F.sum(d * d), F.lit(0.0))),
        "autocorrelation": F.when(
            (npairs > 0) & (varp > 0),
            F.sum(dmu * lmu) / (npairs * varp)),
        "linear_trend_slope": F.when(
            slope_den > 0,
            (n * F.sum(t * x) - F.sum(t) * s1) / slope_den),
        "count_above_mean": F.sum(
            (x > F.col("__mu")).cast("long")).cast("double"),
        "count_below_mean": F.sum(
            (x < F.col("__mu")).cast("long")).cast("double"),
        # tsfresh counts TRANSITIONS of the boolean (x > m), which
        # also catches crossings through a point exactly ON the mean
        # (the product-sign form (x_t-mu)(x_{t+1}-mu) < 0 misses them)
        "number_crossing_mean": F.coalesce(
            F.sum(((x > F.col("__mu")) != (F.col("__xl") > F.col("__mu")))
                  .cast("long")), F.lit(0)).cast("double"),
        "absolute_sum_of_changes": F.coalesce(
            F.sum(F.abs(d)), F.lit(0.0)),
        # avg() skips the null-lag edge rows, matching tsfresh's
        # (n-2)-term means for the three lag-2 statistics below
        "mean_second_derivative_central": F.avg(
            (x - 2 * F.col("__xl") + F.col("__xl2")) / 2),
        "c3": F.avg(x * F.col("__xl") * F.col("__xl2")),
        "time_reversal_asymmetry_statistic": F.avg(
            x * x * F.col("__xl")
            - F.col("__xl") * F.col("__xl2") * F.col("__xl2")),
        "number_peaks": F.coalesce(
            F.sum(((x > F.col("__xl")) & (x > F.col("__xn")))
                  .cast("long")), F.lit(0)).cast("double"),
        "first_location_of_maximum": F.min(
            F.when(x == F.col("__mx"), t)) / n,
        "last_location_of_maximum": (F.max(
            F.when(x == F.col("__mx"), t)) + 1) / n,
        "first_location_of_minimum": F.min(
            F.when(x == F.col("__mn"), t)) / n,
        "last_location_of_minimum": (F.max(
            F.when(x == F.col("__mn"), t)) + 1) / n,
        "variance_larger_than_standard_deviation": (
            varp > F.sqrt(varp)).cast("double"),
        "ratio_beyond_r_sigma": F.avg(
            (F.abs(x - F.col("__mu")) > F.col("__sg")).cast("double")),
        "root_mean_square": F.sqrt(s2 / n),
        "absolute_maximum": F.max(F.abs(x)),
    }
    # in kind mode the per-(id, kind) frame carries plain feature
    # names; the pivot below prefixes them with the kind value
    prefix = "" if column_kind is not None else f"{column_value}__"
    keys = ([column_id] if column_kind is None
            else [column_id, column_kind])
    key_cols = [F.col(p).alias(k) for p, k in zip(pk, keys)]
    plain = [f for f in feats if f not in _STRIKE]
    # agg() needs >=1 expression; a strike-only request aggregates a
    # dropped placeholder so the per-entity row set still materializes
    out = base.groupBy(*key_cols).agg(
        *([aggs[f].alias(f"{prefix}{f}") for f in plain]
          or [F.count(F.lit(1)).alias("__n_placeholder")]))
    if not plain:
        out = out.drop("__n_placeholder")

    for feat, above in (("longest_strike_above_mean", True),
                        ("longest_strike_below_mean", False)):
        if feat not in feats:
            continue
        cond = (x > F.col("__mu")) if above else (x < F.col("__mu"))
        flagged = base.withColumn("__f", cond)
        # gaps-and-islands: within an entity, consecutive rows with the
        # same flag share (global row_number - per-flag row_number)
        runs = flagged.withColumn(
            "__run",
            F.row_number().over(wo)
            - F.row_number().over(
                Window.partitionBy(*pk, "__f").orderBy(*sort_cols)))
        strike = (runs.filter(F.col("__f"))
                  .groupBy(*pk, "__run")
                  .agg(F.count(F.lit(1)).alias("__len"))
                  .groupBy(*key_cols)
                  .agg(F.max("__len").cast("double")
                       .alias(f"{prefix}{feat}")))
        out = (out.join(strike, on=keys, how="left")
               .withColumn(f"{prefix}{feat}",
                           F.coalesce(F.col(f"{prefix}{feat}"),
                                      F.lit(0.0))))

    if column_kind is None:
        return out.select(column_id,
                          *[f"{prefix}{f}" for f in feats])

    # discover kinds from a plain scan+distinct of the INPUT (hanging
    # the discovery job off `out` would execute the whole feature
    # plan just to list a handful of strings); null kinds are
    # excluded — their rows group under a null key that the explicit
    # pivot list drops. `kinds` must be given as the STRING form of
    # the cast column (e.g. '1.0' for a double kind column).
    vals = (sorted(str(k) for k in kinds) if kinds is not None
            else sorted(r[0] for r in
                        sdf.select(F.col(column_kind).cast("string"))
                        .filter(F.col(column_kind).isNotNull())
                        .distinct().collect()))
    aggs_p = [F.first(f).alias(f) for f in feats]
    piv = out.groupBy(column_id).pivot(column_kind, vals).agg(*aggs_p)
    # Spark's pivot names ("<val>_<alias>" multi-agg, bare "<val>"
    # single-agg) are ambiguous when kind values contain underscores
    # (kinds 'k'/'k_absolute' with features 'absolute_maximum' /
    # 'maximum' both yield 'k_absolute_maximum'); the column ORDER is
    # deterministic — groupBy key first, then vals x feats — so
    # rename positionally to tsfresh's <kind>__<feature>
    return piv.toDF(column_id,
                    *[f"{v}__{f}" for v in vals for f in feats])


def roll_time_series(df, column_id: str, column_sort: str,
                     max_timeshift: int, min_timeshift: int = 0,
                     id_out: str = "rolled_id") -> SparkDF:
    """tsfresh's forecasting-window expansion
    (tsfresh.utilities.dataframe_functions.roll_time_series): every
    observed row of an entity becomes a window END carrying the last
    ``max_timeshift + 1`` OBSERVED points up to and including it
    (positional, like tsfresh — gaps in the sort values do not shrink
    windows); windows with fewer than ``min_timeshift + 1`` rows are
    dropped. The output carries ``id_out`` — a struct<id, t> column
    naming the (entity, window-end-sort-value) pair — ready to be
    passed as ``column_id`` to :func:`extract_features` (grouping by
    a struct column works). Duplicate sort values within an entity
    are rejected nowhere but make window identity ambiguous — give
    ties a tiebreaker upstream, as tsfresh requires unique
    timestamps.

    Spark shape: one row_number window pass, then an equi-join on the
    entity key with a row-number range predicate — per-entity groups
    stay together through one hash exchange and the blowup factor is
    bounded by the window length (max_timeshift + 1), exactly
    tsfresh's own memory model. At corpus scale size max_timeshift
    to the forecasting horizon, never to the series length."""
    if max_timeshift < 0 or min_timeshift < 0:
        raise ValueError("timeshifts must be non-negative")
    if min_timeshift > max_timeshift:
        # tsfresh raises too: every window holds at most
        # max_timeshift + 1 rows, so nothing could ever survive
        raise ValueError(
            f"min_timeshift ({min_timeshift}) > max_timeshift "
            f"({max_timeshift}) would drop every window")
    _check_user_cols("roll_time_series", [column_id, column_sort])
    sdf = _sdf(df)
    wo = Window.partitionBy(column_id).orderBy(column_sort)
    withrn = sdf.withColumn("__rn", F.row_number().over(wo))
    rows = withrn.alias("__r")
    ends = (withrn.select(F.col(column_id).alias("__eid"),
                          F.col(column_sort).alias("__t"),
                          F.col("__rn").alias("__ern"))
            .alias("__e"))
    if min_timeshift > 0:
        # per-entity row_numbers are contiguous, so the window ending
        # at __ern holds exactly min(__ern, max_timeshift + 1) rows —
        # filter the (skinny) ends side BEFORE the expansion instead
        # of aggregating + semi-joining the exploded output
        ends = ends.filter(
            F.least(F.col("__ern"), F.lit(max_timeshift + 1))
            > min_timeshift)
    rrn = F.col("__r.__rn")
    joined = rows.join(
        ends,
        (F.col(f"__r.{column_id}") == F.col("__eid"))
        & (rrn <= F.col("__ern"))
        & (rrn >= F.col("__ern") - F.lit(max_timeshift)),
        "inner")
    return joined.select(
        F.struct(F.col(f"__r.{column_id}").alias("id"),
                 F.col("__t").alias("t")).alias(id_out),
        *[F.col(f"__r.{c}") for c in sdf.columns])


def impute(df, columns=None) -> SparkDF:
    """tsfresh's feature-matrix imputation
    (tsfresh.utilities.dataframe_functions.impute): column-wise,
    NaN/null -> median of the column's finite values, +inf -> max,
    -inf -> min; a column with no finite values at all becomes 0
    (tsfresh's rule). One aggregate pass computes the three finite
    statistics for every column (driver receives 3 x n_features
    scalars), then one projection rewrites the matrix — two jobs
    total, no per-column scans.

    ``columns`` defaults to every float/double column."""
    sdf = _sdf(df)
    if columns is None:
        columns = [f.name for f in sdf.schema.fields
                   if f.dataType.typeName() in ("double", "float")]
    if not columns:
        return sdf

    def finite(c):
        col = F.col(c)
        return F.when(~F.isnan(col) & (F.abs(col) != float("inf")), col)

    def finite_sql(c):
        return (f"CASE WHEN NOT isnan(`{c}`) AND abs(`{c}`) != "
                f"double('inf') THEN `{c}` END")

    stats = sdf.agg(*[e for c in columns for e in (
        F.min(finite(c)).alias(f"__mn_{c}"),
        F.max(finite(c)).alias(f"__mx_{c}"),
        F.expr(f"percentile({finite_sql(c)}, 0.5)")
         .alias(f"__md_{c}"))]).collect()[0]

    out = sdf
    for c in columns:
        mn = stats[f"__mn_{c}"]
        mx = stats[f"__mx_{c}"]
        md = stats[f"__md_{c}"]
        mn = 0.0 if mn is None else float(mn)
        mx = 0.0 if mx is None else float(mx)
        md = 0.0 if md is None else float(md)
        col = F.col(c)
        out = out.withColumn(c, F.when(col == float("inf"), mx)
                             .when(col == float("-inf"), mn)
                             .when(F.isnan(col) | col.isNull(), md)
                             .otherwise(col))
    return out
