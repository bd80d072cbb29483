"""Operator-level query corpus: one query per SURVEY.md §2 operator
family not already covered by the TPC-H/pipeline corpora. Same
contract: engine API in, Spark DataFrame out, DuckDB oracle in
ops_oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, SparkSession, Window
from pyspark.sql import functions as F

import mars_spark as ms
from mars_spark.queries.tpch import load


def op_isin(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.2/§2.8 isin (mars/dataframe/base/isin.py:31)."""
    li = load(sf_dir, "lineitem")
    f = li[li.l_returnflag.isin(["A", "R"])]
    return f.groupby("l_returnflag", as_index=False).agg(
        n=("l_orderkey", "count")).to_spark()


def op_where_mask(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.2 where/mask (mars/dataframe/indexing/where.py:28)."""
    li = load(sf_dir, "lineitem")
    f = li[li.l_orderkey < 100][["l_orderkey", "l_linenumber", "l_quantity"]]
    f["qty_masked"] = f.l_quantity.where(f.l_quantity > 25, other=-1.0)
    return f.to_spark()


def op_string_funcs(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.8 string accessor (mars/dataframe/base/string_.py:34)."""
    c = load(sf_dir, "customer")
    f = c[c.c_custkey < 100]
    f["name_upper"] = f.c_name.str.upper()
    f["name_len"] = f.c_name.str.len()
    f["id_num"] = f.c_name.str.extract(r"Customer#([0-9]+)").astype("int64")
    return f[["c_custkey", "name_upper", "name_len", "id_num"]].to_spark()


def op_dt_funcs(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.8 datetime accessor (mars/dataframe/base/datetimes.py:31)."""
    o = load(sf_dir, "orders")
    o["y"] = o.o_orderdate.dt.year
    o["m"] = o.o_orderdate.dt.month
    o["q"] = o.o_orderdate.dt.quarter
    return o.groupby(["y", "m", "q"], as_index=False).agg(
        n=("o_orderkey", "count")).to_spark()


def op_nullif_fillna(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.8 missing-data ops (mars/dataframe/missing/fillna.py:36)."""
    li = load(sf_dir, "lineitem").to_spark()
    d = li.select(F.nullif(F.col("l_discount"), F.lit(0.0)).alias("d"))
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("d").isNull().cast("bigint")).alias("n_null"),
        F.round(F.avg(F.coalesce(F.col("d"), F.lit(-1.0))), 6).alias("avg_filled"),
    )


def op_drop_duplicates(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.4 drop_duplicates (mars/dataframe/base/drop_duplicates.py:35)."""
    li = load(sf_dir, "lineitem")
    return li[["l_returnflag", "l_linestatus"]].drop_duplicates().to_spark()


def op_set_ops(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.7 set ops — nations having BOTH customers and suppliers."""
    c = load(sf_dir, "customer")[["c_nationkey"]].rename(
        columns={"c_nationkey": "nationkey"}).drop_duplicates()
    s = load(sf_dir, "supplier")[["s_nationkey"]].rename(
        columns={"s_nationkey": "nationkey"}).drop_duplicates()
    return c.intersect(s).to_spark()


def op_window_rank(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.6 ranking / groupby-head (mars/dataframe/groupby/head.py:30):
    top-2 orders per customer by total price."""
    o = load(sf_dir, "orders")[["o_custkey", "o_orderkey", "o_totalprice"]]
    o = o[o.o_custkey < 200]
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    sdf = o.to_spark().withColumn("rn", F.row_number().over(w))
    return sdf.filter(F.col("rn") <= 2).withColumn(
        "o_totalprice", F.round("o_totalprice", 2))


def op_pivot(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.4 pivot — event-type counts per user as columns."""
    e = load(sf_dir, "events").to_spark()
    types = ["view", "click", "purchase", "signup", "error"]
    out = e.groupBy("user_id").pivot("event_type", types).agg(
        F.count(F.lit(1)))
    return out.fillna(0).select(
        "user_id", *[F.col(t).cast("bigint").alias(t) for t in types])


def op_melt(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.8 melt (mars/dataframe/base/melt.py:27 → native Spark melt)."""
    p = load(sf_dir, "part")
    f = p[p.p_partkey < 100][["p_partkey", "p_size", "p_retailprice"]]
    f = f.astype({"p_size": "float64"})
    return f.melt(id_vars=["p_partkey"],
                  value_vars=["p_size", "p_retailprice"]).to_spark()


def op_explode_seq(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.8 explode (mars/dataframe/base/explode.py:27) over a
    generated sequence column."""
    li = load(sf_dir, "lineitem").to_spark()
    f = li.filter(F.col("l_orderkey") < 50).select(
        "l_orderkey", "l_linenumber",
        F.explode(F.sequence(F.lit(1), F.col("l_linenumber"))).alias("pos"))
    return f.groupBy("l_linenumber").agg(F.count(F.lit(1)).alias("n"))


def op_quantile(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.4 quantiles — EXACT percentile (the reference computes exact
    via tensor machinery, mars/dataframe/statistics/quantile.py:46;
    percentile_approx is the 100 TB path, exact keeps the oracle)."""
    li = load(sf_dir, "lineitem").to_spark()
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.75)), 4).alias("p75"),
    )


def op_corr_cov(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.4 corr/cov (mars/dataframe/statistics/corr.py:29)."""
    li = load(sf_dir, "lineitem").to_spark()
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qp"),
    )


def op_json_extract(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.8 JSON functions — ADDITIVE (Mars has no JSON ops; free in
    Spark via get_json_object)."""
    e = load(sf_dir, "events").to_spark()
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select((k % 7).alias("k_mod"), k.alias("k"))
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


def op_cut_bucket(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.8 cut binning (mars/dataframe/base/cut.py:43)."""
    li = load(sf_dir, "lineitem")
    band = ms.cut(li.l_quantity, [0, 10, 25, 50], labels=["low", "mid", "high"])
    f = li.assign(band=band)
    return f.groupby("band", as_index=False).agg(
        n=("l_orderkey", "count")).to_spark()


def op_asof_join(spark: SparkSession, sf_dir: str) -> SparkDF:
    """As-of join — mars has NO merge_asof (SURVEY.md §2.3); ours is
    the union+window plan (operators/merge.py). For every click, the
    most recent prior-or-equal view by the same user. DuckDB oracle
    uses its native ASOF JOIN."""
    from mars_spark.operators.merge import merge_asof

    e = load(sf_dir, "events")
    clicks = e[e.event_type == "click"][["user_id", "ts", "event_id"]]
    views = e[e.event_type == "view"][["user_id", "ts", "event_id"]].rename(
        columns={"event_id": "view_id"})
    out = merge_asof(clicks, views, on="ts", by="user_id")
    return out.to_spark().select("event_id", "user_id", "view_id")


def op_value_counts(spark: SparkSession, sf_dir: str) -> SparkDF:
    """§2.4 value_counts (mars/dataframe/base/value_counts.py:31)."""
    o = load(sf_dir, "orders")
    vc = o.o_orderpriority.value_counts()
    return vc.to_spark()


OPS_QUERIES = {
    "op_isin": op_isin,
    "op_where_mask": op_where_mask,
    "op_string_funcs": op_string_funcs,
    "op_dt_funcs": op_dt_funcs,
    "op_nullif_fillna": op_nullif_fillna,
    "op_drop_duplicates": op_drop_duplicates,
    "op_set_ops": op_set_ops,
    "op_window_rank": op_window_rank,
    "op_pivot": op_pivot,
    "op_melt": op_melt,
    "op_explode_seq": op_explode_seq,
    "op_quantile": op_quantile,
    "op_corr_cov": op_corr_cov,
    "op_json_extract": op_json_extract,
    "op_cut_bucket": op_cut_bucket,
    "op_asof_join": op_asof_join,
    "op_value_counts": op_value_counts,
}
