"""TPC-H-style query corpus over the driver's star schema.

Reference parity: the 22 hand-written pandas-API TPC-H queries in
/root/reference/benchmarks/tpch/run_queries.py:110-983 are the
reference's semantic corpus. The driver's tables carry a column subset
(no partsupp, no comment/address/phone/shipmode/commitdate), so queries
needing missing columns are adapted (suffix `_adapted`) while keeping
the reference query's *shape* (same joins, same aggregation pattern).

Every query is written in the mars_spark pandas-semantics API (the
engine under test), returns a Spark DataFrame, and has a value-matched
DuckDB oracle in oracles.py: identical aliases, doubles rounded on both
sides, deterministic total ordering before any LIMIT.

Scale notes are per-query docstrings: what broadcasts, what shuffles,
what AQE is expected to do at 100 TB.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame as SparkDF, SparkSession
from pyspark.sql import functions as F

import mars_spark as ms


_LOAD_CACHE: "WeakKeyDictionary" = WeakKeyDictionary()


def load(sf_dir: str, name: str) -> ms.DataFrame:
    """Corpus-table scan, memoized per live SparkContext.

    Opening a parquet source costs ~0.1 s of fixed work (pyarrow
    footer read for the nanos-timestamp probe + Spark schema
    inference) and the 50-row corpus re-opens the same handful of
    tables hundreds of times per bench run. The underlying Spark
    DataFrame is an immutable plan, so one instance serves every
    query; each call re-wraps it in a FRESH engine frame because the
    wrapper itself is mutable (in-place ``df[col] = ...``). Keyed on
    file mtime so a regenerated testdata dir is re-opened, and
    weakref-keyed on the SparkContext so a stopped session cannot
    leak JVM handles."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    path = f"{sf_dir}/{name}.parquet"
    if sc is None:
        return ms.read_parquet(path)
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None
    try:
        cache = _LOAD_CACHE.setdefault(sc, {})
    except TypeError:
        return ms.read_parquet(path)
    key = (path, mtime)
    if key not in cache:
        cache[key] = ms.read_parquet(path).to_spark()
    return ms.DataFrame(cache[key])


def q1(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Pricing summary. reference run_queries.py:110 (q01).
    One scan + partial/final hash agg on a 6-value grouping key — no
    join; at 100 TB the map-side combine reduces the shuffle to bytes."""
    li = load(sf_dir, "lineitem")
    f = li[li.l_shipdate <= "1998-09-02"]
    f["disc_price"] = f.l_extendedprice * (1 - f.l_discount)
    f["charge"] = f.l_extendedprice * (1 - f.l_discount) * (1 + f.l_tax)
    out = f.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_orderkey", "count"),
    )
    sdf = out.to_spark()
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]:
        sdf = sdf.withColumn(c, F.round(c, 2))
    for c in ["avg_qty", "avg_price", "avg_disc"]:
        sdf = sdf.withColumn(c, F.round(c, 4))
    return sdf


def q3(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Shipping priority. reference run_queries.py:214 (q03).
    customer is the small side → broadcast; lineitem⋈orders shuffles on
    orderkey. Top-10 is TakeOrderedAndProject (no global sort)."""
    cust = load(sf_dir, "customer")
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")
    c = cust[cust.c_mktsegment == "BUILDING"][["c_custkey"]]
    o = orders[orders.o_orderdate < "1996-06-30"][
        ["o_orderkey", "o_custkey", "o_orderdate"]]
    l = li[li.l_shipdate > "1996-06-30"][
        ["l_orderkey", "l_extendedprice", "l_discount"]]
    j = c.merge(o, left_on="c_custkey", right_on="o_custkey", broadcast=True)
    j = j.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["o_orderkey", "o_orderdate"], as_index=False).agg(
        revenue=("rev", "sum"))
    sdf = g.to_spark().withColumn("revenue", F.round("revenue", 2))
    return sdf.orderBy(F.desc("revenue"), F.asc("o_orderdate"),
                       F.asc("o_orderkey")).limit(10)


def q4_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Order priority checking. reference run_queries.py:259 (q04) uses
    l_commitdate < l_receiptdate (columns absent here); adapted
    late-predicate: a lineitem shipped >60 days after the order date.
    EXISTS → leftsemi join; Spark builds it as a semi shuffle join and
    the runtime bloom filter prunes the probe side."""
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")
    o = orders[(orders.o_orderdate >= "1996-01-01")
               & (orders.o_orderdate < "1997-01-01")]
    late = o.to_spark().join(
        li.to_spark(),
        on=[
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"),
        ],
        how="leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q5(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Local supplier volume. reference run_queries.py:291 (q05).
    region/nation/supplier/customer all broadcast; the only large
    shuffle is lineitem⋈orders. c_nationkey = s_nationkey is the
    classic same-nation constraint."""
    region = load(sf_dir, "region")
    nation = load(sf_dir, "nation")
    cust = load(sf_dir, "customer")
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")
    sup = load(sf_dir, "supplier")

    r = region[region.r_name == "ASIA"][["r_regionkey"]]
    n = nation.merge(r, left_on="n_regionkey", right_on="r_regionkey",
                     broadcast=True)[["n_nationkey", "n_name"]]
    o = orders[(orders.o_orderdate >= "1996-01-01")
               & (orders.o_orderdate < "1997-01-01")][
        ["o_orderkey", "o_custkey"]]
    j = (
        cust.merge(n, left_on="c_nationkey", right_on="n_nationkey",
                   broadcast=True)[["c_custkey", "c_nationkey", "n_name"]]
        .merge(o, left_on="c_custkey", right_on="o_custkey")
        .merge(li, left_on="o_orderkey", right_on="l_orderkey")
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
    )
    j = j[j.c_nationkey == j.s_nationkey]
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby("n_name", as_index=False).agg(revenue=("rev", "sum"))
    return g.to_spark().withColumn("revenue", F.round("revenue", 2))


def q6(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Forecast revenue change. reference run_queries.py:341 (q06).
    Expressed through the SQL passthrough (session.register + ms.sql)
    so the driver hash-verifies that surface: a registered frame is a
    lazy temp view, and Catalyst pushes the predicates through it to
    the parquet scan (PushedFilters) exactly as the DataFrame form
    does — same physical plan, different front-end."""
    from mars_spark.session import register, sql

    register(load(sf_dir, "lineitem"), "lineitem_q6")
    out = sql("""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem_q6
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """)
    return out.to_spark()


def q7(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Volume shipping NATION_7<->NATION_8 (driver data uses synthetic nation names). reference run_queries.py:375
    (q07). Nation frames broadcast twice (supplier & customer sides);
    the or-ed nation pair filter is applied post-join like the
    reference does."""
    nation = load(sf_dir, "nation")
    cust = load(sf_dir, "customer")
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")
    sup = load(sf_dir, "supplier")

    n1 = nation.rename(columns={"n_nationkey": "sn_key", "n_name": "supp_nation"})[
        ["sn_key", "supp_nation"]]
    n2 = nation.rename(columns={"n_nationkey": "cn_key", "n_name": "cust_nation"})[
        ["cn_key", "cust_nation"]]
    j = (
        li.merge(sup, left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
    )
    j = j.merge(n1, left_on="s_nationkey", right_on="sn_key", broadcast=True)
    j = j.merge(n2, left_on="c_nationkey", right_on="cn_key", broadcast=True)
    j = j[
        ((j.supp_nation == "NATION_7") & (j.cust_nation == "NATION_8"))
        | ((j.supp_nation == "NATION_8") & (j.cust_nation == "NATION_7"))
    ]
    j = j[(j.l_shipdate >= "1996-01-01") & (j.l_shipdate < "1998-01-01")]
    j["l_year"] = j.l_shipdate.dt.year
    j["volume"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False).agg(
        revenue=("volume", "sum"))
    return g.to_spark().withColumn("revenue", F.round("revenue", 2))


def q8_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """National market share. reference run_queries.py:441 (q08),
    adapted: share of NATION_3 suppliers in ASIA-customer revenue for
    p_type='ECONOMY' parts by order year (reference uses BRAZIL/
    AMERICA/anodized steel on columns we don't have)."""
    region = load(sf_dir, "region")
    nation = load(sf_dir, "nation")
    cust = load(sf_dir, "customer")
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")
    sup = load(sf_dir, "supplier")
    part = load(sf_dir, "part")

    r = region[region.r_name == "ASIA"][["r_regionkey"]]
    cn = nation.merge(r, left_on="n_regionkey", right_on="r_regionkey",
                      broadcast=True)[["n_nationkey"]]
    c = cust.merge(cn, left_on="c_nationkey", right_on="n_nationkey",
                   broadcast=True)[["c_custkey"]]
    p = part[part.p_type == "ECONOMY"][["p_partkey"]]
    sn = nation.rename(columns={"n_name": "supp_nation"})[
        ["n_nationkey", "supp_nation"]]
    s = sup.merge(sn, left_on="s_nationkey", right_on="n_nationkey",
                  broadcast=True)[["s_suppkey", "supp_nation"]]

    j = (
        li.merge(p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
    )
    j["o_year"] = j.o_orderdate.dt.year
    j["volume"] = j.l_extendedprice * (1 - j.l_discount)
    sdf = j.to_spark()
    g = sdf.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                  .otherwise(F.lit(0.0)))
            / F.sum("volume"),
            4,
        ).alias("mkt_share")
    )
    return g.orderBy("o_year")


def q9_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Product-type profit. reference run_queries.py:526 (q09) needs
    partsupp.ps_supplycost (absent); adapted profit-proxy: revenue by
    supplier nation × order year for parts whose name contains 'a'."""
    nation = load(sf_dir, "nation")
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")
    sup = load(sf_dir, "supplier")
    part = load(sf_dir, "part")

    p = part[part.p_name.str.contains("a", regex=False)][["p_partkey"]]
    j = (
        li.merge(p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey", broadcast=True)
        .merge(nation, left_on="s_nationkey", right_on="n_nationkey",
               broadcast=True)
        .merge(orders[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
               right_on="o_orderkey")
    )
    j["o_year"] = j.o_orderdate.dt.year
    # decimal sum: addition is associative, so the hash is deterministic
    # regardless of partial-agg order (double sums are not).
    j["amount"] = (j.l_extendedprice * (1 - j.l_discount)).astype("decimal(30,6)")
    g = j.groupby(["n_name", "o_year"], as_index=False).agg(
        sum_profit=("amount", "sum"))
    return (
        g.to_spark()
        .withColumn("sum_profit", F.round("sum_profit", 2).cast("double"))
        .withColumnRenamed("n_name", "nation")
    )


def q10(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Returned-item reporting. reference run_queries.py:570 (q10).
    Top-20 customers by returned revenue; one big shuffle
    (lineitem⋈orders), everything else broadcast."""
    nation = load(sf_dir, "nation")
    cust = load(sf_dir, "customer")
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")

    o = orders[(orders.o_orderdate >= "1996-01-01")
               & (orders.o_orderdate < "1997-01-01")][
        ["o_orderkey", "o_custkey"]]
    l = li[li.l_returnflag == "R"][
        ["l_orderkey", "l_extendedprice", "l_discount"]]
    j = (
        l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey",
               broadcast=True)
    )
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["c_custkey", "c_name", "c_acctbal", "n_name"],
                  as_index=False).agg(revenue=("rev", "sum"))
    sdf = g.to_spark().withColumn("revenue", F.round("revenue", 2)).withColumn(
        "c_acctbal", F.round("c_acctbal", 2))
    return sdf.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


def q12_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Shipping mode / priority. reference run_queries.py:634 (q12)
    counts late lineitems split by priority class per l_shipmode
    (absent); adapted: per o_orderpriority, lineitems shipped >60 days
    after order date vs total, 1996 orders."""
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")
    j = orders[(orders.o_orderdate >= "1996-01-01")
               & (orders.o_orderdate < "1997-01-01")][
        ["o_orderkey", "o_orderdate", "o_orderpriority"]].merge(
        li[["l_orderkey", "l_shipdate"]], left_on="o_orderkey",
        right_on="l_orderkey")
    sdf = j.to_spark()
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
    return (
        sdf.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.count(F.lit(1)).alias("total_count"),
        )
        .orderBy("o_orderpriority")
    )


def q13(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Customer order-count distribution. reference run_queries.py:668
    (q13). Left join keeps zero-order customers; two aggregations, both
    with map-side combine."""
    cust = load(sf_dir, "customer")
    orders = load(sf_dir, "orders")
    # null_matches=False: TPC-H keys are non-null by spec — restores
    # the IsNotNull scan pruning pandas NaN-matching has to give up
    j = cust[["c_custkey"]].merge(
        orders[["o_orderkey", "o_custkey"]],
        left_on="c_custkey", right_on="o_custkey", how="left",
        null_matches=False)
    per_cust = j.groupby("c_custkey", as_index=False).agg(
        c_count=("o_orderkey", "count"))
    dist = per_cust.groupby("c_count", as_index=False).agg(
        custdist=("c_custkey", "count"))
    return dist.to_spark().orderBy(F.desc("custdist"), F.desc("c_count"))


def q14(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Promotion effect. reference run_queries.py:700 (q14): % of
    revenue from PROMO parts in a date window. part broadcasts."""
    li = load(sf_dir, "lineitem")
    part = load(sf_dir, "part")
    l = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")]
    j = l.merge(part[["p_partkey", "p_type"]], left_on="l_partkey",
                right_on="p_partkey", broadcast=True)
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    sdf = j.to_spark()
    return sdf.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev"))
                    .otherwise(F.lit(0.0)))
            / F.sum("rev"),
            4,
        ).alias("promo_revenue")
    )


def q15(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Top supplier. reference run_queries.py:729 (q15): revenue view →
    max → equality join back (no LIMIT ambiguity under ties)."""
    li = load(sf_dir, "lineitem")
    sup = load(sf_dir, "supplier")
    l = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")]
    l["rev"] = l.l_extendedprice * (1 - l.l_discount)
    revenue = l.groupby("l_suppkey", as_index=False).agg(
        total_revenue=("rev", "sum"))
    # supplier-sized aggregate consumed by BOTH the max branch and the
    # equality join — snapshot it, or the lineitem scan+shuffle runs
    # twice (Spark does not reuse exchanges across plan branches).
    # persist, not localCheckpoint: the broadcast branch materializes
    # the cache before the probe branch reads it, lineage survives
    # executor loss, and the parquet scan (with PushedFilters) stays
    # visible to plan audits.
    sdf = revenue.to_spark().withColumn(
        "total_revenue", F.round("total_revenue", 2)).persist()
    max_rev = sdf.agg(F.max("total_revenue").alias("m"))
    out = sdf.join(F.broadcast(max_rev),
                   sdf.total_revenue == max_rev.m).drop("m")
    sup_sdf = sup.to_spark().select("s_suppkey", "s_name")
    return out.join(sup_sdf, out.l_suppkey == sup_sdf.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue")


def q17_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Small-quantity-order revenue. reference run_queries.py:810 (q17):
    lineitems under 20% of the part's average quantity, for one brand
    (container filter dropped — column absent). The per-part average is
    a broadcast-able agg joined back — Mars does the same two-pass."""
    li = load(sf_dir, "lineitem")
    part = load(sf_dir, "part")
    p = part[part.p_brand == "Brand#13"][["p_partkey"]]
    l = li.merge(p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
    avg_qty = l.groupby("l_partkey", as_index=False).agg(
        avg_q=("l_quantity", "mean"))
    avg_sdf = avg_qty.to_spark().withColumnRenamed("l_partkey", "ap_key")
    j = l.to_spark().join(F.broadcast(avg_sdf),
                          F.col("l_partkey") == F.col("ap_key"))
    j = j.filter(F.col("l_quantity") < 0.2 * F.col("avg_q"))
    return j.agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


def q18(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Large-volume customers. reference run_queries.py:849 (q18):
    orders with >300 total quantity. The qty-sum agg shuffles on
    orderkey — same key as the join, so Spark reuses the partitioning."""
    cust = load(sf_dir, "customer")
    orders = load(sf_dir, "orders")
    li = load(sf_dir, "lineitem")
    qty = li.groupby("l_orderkey", as_index=False).agg(
        sum_qty=("l_quantity", "sum"))
    big = qty[qty.sum_qty > 300]
    # null_matches=False: non-null keys by spec — keep IsNotNull pruning
    j = big.merge(orders, left_on="l_orderkey", right_on="o_orderkey",
                  null_matches=False).merge(
        cust[["c_custkey", "c_name"]], left_on="o_custkey",
        right_on="c_custkey", null_matches=False)
    sdf = j.to_spark().select(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round("sum_qty", 2).alias("sum_qty"),
    )
    return sdf.orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"),
                       F.asc("o_orderkey")).limit(100)


def q19_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Discounted revenue, disjunctive predicates. reference
    run_queries.py:892 (q19) adapted to available columns: three
    (brand, size-range, qty-range) disjuncts. Catalyst pushes the
    common p_partkey equi-join and evaluates the OR post-join."""
    li = load(sf_dir, "lineitem")
    part = load(sf_dir, "part")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey",
                 broadcast=True)
    j = j[
        ((j.p_brand == "Brand#12") & (j.p_size.between(1, 15))
         & (j.l_quantity >= 1) & (j.l_quantity <= 11))
        | ((j.p_brand == "Brand#23") & (j.p_size.between(1, 25))
           & (j.l_quantity >= 10) & (j.l_quantity <= 20))
        | ((j.p_brand == "Brand#34") & (j.p_size.between(1, 35))
           & (j.l_quantity >= 20) & (j.l_quantity <= 30))
    ]
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    out = j[["rev"]].agg(revenue=("rev", "sum"))
    return out.to_spark().withColumn("revenue", F.round("revenue", 2))


def q22_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Global sales opportunity. reference run_queries.py:952 (q22):
    customers with above-average positive balance and no orders,
    grouped by market segment (reference groups by phone country code —
    column absent). Anti-join = leftanti; the avg is a scalar subquery
    broadcast."""
    cust = load(sf_dir, "customer")
    orders = load(sf_dir, "orders")
    csdf = cust.to_spark()
    avg_bal = csdf.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab"))
    rich = csdf.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab"))
    no_orders = rich.join(orders.to_spark().select("o_custkey"),
                          rich.c_custkey == F.col("o_custkey"), "leftanti")
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q2_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Minimum-cost supplier. reference run_queries.py:166 (q02) uses
    partsupp.ps_supplycost (absent); adapted: per part type, the
    EUROPE supplier(s) with the cheapest observed lineitem price for
    that type — min-join-back pattern, all dims broadcast."""
    region = load(sf_dir, "region")
    nation = load(sf_dir, "nation")
    sup = load(sf_dir, "supplier")
    part = load(sf_dir, "part")
    li = load(sf_dir, "lineitem")

    r = region[region.r_name == "EUROPE"][["r_regionkey"]]
    n = nation.merge(r, left_on="n_regionkey", right_on="r_regionkey",
                     broadcast=True)[["n_nationkey", "n_name"]]
    s = sup.merge(n, left_on="s_nationkey", right_on="n_nationkey",
                  broadcast=True)[["s_suppkey", "s_name", "n_name"]]
    j = (li.merge(part[["p_partkey", "p_type"]], left_on="l_partkey",
                  right_on="p_partkey", broadcast=True)
         .merge(s, left_on="l_suppkey", right_on="s_suppkey",
                broadcast=True))
    j["unit_price"] = j.l_extendedprice / j.l_quantity
    per_sup = j.groupby(["p_type", "s_suppkey", "s_name", "n_name"],
                        as_index=False).agg(min_price=("unit_price", "min"))
    # (type, supplier)-sized aggregate consumed by BOTH the per-type
    # min branch and the equality join — snapshot it, or the lineitem
    # join+shuffle runs twice (no exchange reuse across branches).
    # persist (not localCheckpoint) keeps lineage + scan visibility.
    sdf = (per_sup.to_spark()
           .withColumn("min_price", F.round("min_price", 2))
           .persist())
    best = sdf.groupBy("p_type").agg(F.min("min_price").alias("best"))
    out = sdf.join(F.broadcast(best), on="p_type").filter(
        F.col("min_price") == F.col("best")).drop("best")
    return out


def q11_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Important stock. reference run_queries.py:600 (q11) sums
    ps_supplycost*ps_availqty per part (partsupp absent); adapted:
    lineitem value per part for NATION_8 suppliers, keeping parts whose
    value exceeds 0.0001 of the total — scalar-subquery broadcast."""
    nation = load(sf_dir, "nation")
    sup = load(sf_dir, "supplier")
    li = load(sf_dir, "lineitem")

    n = nation[nation.n_name == "NATION_8"][["n_nationkey"]]
    s = sup.merge(n, left_on="s_nationkey", right_on="n_nationkey",
                  broadcast=True)[["s_suppkey"]]
    j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey",
                 broadcast=True)
    # decimal sum for order-independent (hash-stable) aggregation
    j["value"] = (j.l_extendedprice * (1 - j.l_discount)).astype("decimal(30,6)")
    per_part = j.groupby("l_partkey", as_index=False).agg(
        value=("value", "sum"))
    # part-sized aggregate consumed by BOTH the threshold branch and
    # the filter — snapshot it, or the lineitem scan+shuffle runs
    # twice (no exchange reuse across plan branches).
    # persist (not localCheckpoint) keeps lineage + scan visibility.
    sdf = per_part.to_spark().persist()
    total = sdf.agg((F.sum("value") * 0.0001).alias("thresh"))
    out = sdf.join(F.broadcast(total)).filter(
        F.col("value") > F.col("thresh")).select(
        "l_partkey", F.round("value", 2).cast("double").alias("value"))
    return out


def q16_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Parts/supplier relationship. reference run_queries.py:747 (q16):
    supplier counts per (brand, type, size) excluding one brand —
    partsupp replaced by the lineitem part-supplier relation."""
    part = load(sf_dir, "part")
    li = load(sf_dir, "lineitem")
    p = part[(part.p_brand != "Brand#1") & (part.p_size.isin([1, 2, 3, 4, 5]))]
    j = li[["l_partkey", "l_suppkey"]].merge(
        p[["p_partkey", "p_brand", "p_type", "p_size"]],
        left_on="l_partkey", right_on="p_partkey", broadcast=True)
    sdf = j.to_spark()
    return (
        sdf.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Potential part promotion. reference run_queries.py:908 (q20):
    suppliers who shipped more than half the average quantity of
    'widget' parts in 1996 — semi-join chain, avg as broadcast scalar."""
    part = load(sf_dir, "part")
    sup = load(sf_dir, "supplier")
    li = load(sf_dir, "lineitem")
    p = part[part.p_name.str.contains("widget", regex=False)][["p_partkey"]]
    l = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")]
    lw = l.merge(p, left_on="l_partkey", right_on="p_partkey", broadcast=True)
    per_sup = lw.groupby("l_suppkey", as_index=False).agg(
        qty=("l_quantity", "sum"))
    # supplier-sized aggregate consumed by BOTH the avg branch and the
    # filter — snapshot it, or the widget-lineitem join+shuffle runs
    # twice (no exchange reuse across branches).
    # persist (not localCheckpoint) keeps lineage + scan visibility.
    sdf = per_sup.to_spark().persist()
    avg_qty = sdf.agg((F.avg("qty") * 0.5).alias("half_avg"))
    keep = sdf.join(F.broadcast(avg_qty)).filter(
        F.col("qty") > F.col("half_avg")).select("l_suppkey")
    out = load(sf_dir, "supplier").to_spark().join(
        keep, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
    return out.select("s_suppkey", "s_name").orderBy("s_suppkey")


def q21_adapted(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Suppliers who kept orders waiting. reference run_queries.py:922
    (q21): the multi-relation EXISTS + NOT-EXISTS self-join on
    lineitem. Testdata lacks l_receiptdate/l_commitdate, so "late" is
    adapted to l_shipdate > o_orderdate + 60 days. Shape preserved:
    EXISTS (another supplier on the same order) as a semi-join against
    the multi-supplier order keys; NOT EXISTS (another LATE supplier)
    as a semi-join against orders whose late lineitems have exactly one
    distinct supplier. Both key sets are tiny relative to lineitem —
    Catalyst broadcasts them; the only big shuffles are the two
    per-order aggregations."""
    nation = load(sf_dir, "nation")
    sup = load(sf_dir, "supplier")
    li = load(sf_dir, "lineitem")
    orders = load(sf_dir, "orders")

    o = orders[["o_orderkey", "o_orderdate", "o_orderstatus"]]
    j = li[["l_orderkey", "l_suppkey", "l_shipdate"]].merge(
        o, left_on="l_orderkey", right_on="o_orderkey")
    # ONE per-order aggregation answers everything — both distinct
    # counts collapse to min/max flags (countDistinct would plan an
    # Expand that doubles the shuffled rows; min!=max ⇔ >1 distinct,
    # min==max ∧ count>0 ⇔ exactly 1 distinct), and because a
    # qualified order has exactly ONE late supplier, that supplier is
    # min(late_sup) and its late-row count is count(late_sup) — so the
    # big join is consumed exactly once (no recompute, no cache needed,
    # no semi-join back against lineitem).
    late_cond = j.eval("l_shipdate > date_add(o_orderdate, 60)")
    j["late_sup"] = j.l_suppkey.where(late_cond)
    sdf = j.to_spark()
    per_order = sdf.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("minsup"),
        F.max("l_suppkey").alias("maxsup"),
        F.count("late_sup").alias("nlate_rows"),
        F.min("late_sup").alias("minlate"),
        F.max("late_sup").alias("maxlate"),
        F.min("o_orderstatus").alias("status"),
    )
    qualified = per_order.filter(
        (F.col("minsup") != F.col("maxsup"))
        & (F.col("nlate_rows") > 0)
        & (F.col("minlate") == F.col("maxlate"))
        & (F.col("status") == "F")
    ).select(F.col("minlate").alias("l_suppkey"),
             F.col("nlate_rows"))
    n3 = nation[nation.n_name == "NATION_3"][["n_nationkey"]]
    s = (sup.merge(n3, left_on="s_nationkey", right_on="n_nationkey",
                   broadcast=True)[["s_suppkey", "s_name"]]).to_spark()
    g = (qualified.join(F.broadcast(s),
                        qualified.l_suppkey == s.s_suppkey)
         .groupBy("s_name").agg(F.sum("nlate_rows").alias("numwait")))
    return g.orderBy(F.desc("numwait"), F.asc("s_name"))


def q06_12_14_17_19(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Composite of the scan+filter+(broadcast-join)+conditional-agg
    family (r3 verdict item 1: merged to free corpus slots under the
    50-row cap; every sub-plan still runs in full): q12's 5-row
    priority split carries the q06/q14/q17/q19 scalar aggregates as
    broadcast columns. Reference shapes: run_queries.py:341 (q06),
    :634 (q12), :700 (q14), :810 (q17), :892 (q19)."""
    base = q12_adapted(spark, sf_dir)
    scalars = [
        q6(spark, sf_dir).withColumnRenamed("revenue", "q06_revenue"),
        q14(spark, sf_dir),
        q17_adapted(spark, sf_dir),
        q19_adapted(spark, sf_dir).withColumnRenamed("revenue", "q19_revenue"),
    ]
    out = base
    for s in scalars:
        out = out.crossJoin(F.broadcast(s))
    return out


def q04_22(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Composite of the semi/anti-join aggregate family (r3 verdict
    item 1): q04's EXISTS semi-join priority counts unioned with q22's
    NOT-EXISTS anti-join segment totals under a harmonized
    (grp, cnt, val) schema. Reference: run_queries.py:259 (q04),
    :952 (q22)."""
    a = q4_adapted(spark, sf_dir).select(
        F.concat(F.lit("prio:"), F.col("o_orderpriority")).alias("grp"),
        F.col("order_count").alias("cnt"),
        F.lit(None).cast("double").alias("val"))
    b = q22_adapted(spark, sf_dir).select(
        F.concat(F.lit("seg:"), F.col("c_mktsegment")).alias("grp"),
        F.col("numcust").alias("cnt"),
        F.col("totacctbal").alias("val"))
    return a.unionByName(b)


def q03_10(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Composite of the join+agg+top-k family: q03's shipping-priority
    top-10 unioned with q10's returned-item top-20 under a harmonized
    (grp, k, name, nat, acctbal, odate, revenue) schema. Both member
    plans run in full (broadcast dims, one big shuffle each, top-k via
    TakeOrderedAndProject). Reference: run_queries.py:214 (q03),
    :570 (q10)."""
    a = q3(spark, sf_dir).select(
        F.lit("q03").alias("grp"),
        F.col("o_orderkey").alias("k"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("nat"),
        F.lit(None).cast("double").alias("acctbal"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.col("revenue"))
    b = q10(spark, sf_dir).select(
        F.lit("q10").alias("grp"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("n_name").alias("nat"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit(None).cast("string").alias("odate"),
        F.col("revenue"))
    return a.unionByName(b)


def q05_07(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Composite of the multi-join volume family (r4 slot merge; both
    member plans run in full): q05's same-nation revenue and q07's
    cross-nation shipping volume under a harmonized (grp, yr, revenue)
    schema. Reference: run_queries.py:291 (q05), :375 (q07)."""
    a = q5(spark, sf_dir).select(
        F.concat(F.lit("q5:"), F.col("n_name")).alias("grp"),
        F.lit(None).cast("int").alias("yr"),
        F.col("revenue"))
    b = q7(spark, sf_dir).select(
        F.concat(F.lit("q7:"), F.col("supp_nation"), F.lit(">"),
                 F.col("cust_nation")).alias("grp"),
        F.col("l_year").cast("int").alias("yr"),
        F.col("revenue"))
    return a.unionByName(b)


def q08_09(spark: SparkSession, sf_dir: str) -> SparkDF:
    """Composite of the market-share / profit-by-year family (r4 slot
    merge; both member plans run in full): q08's yearly NATION_3 market
    share and q09's nation×year profit under a harmonized
    (grp, yr, val) schema. Reference: run_queries.py:441 (q08),
    :526 (q09)."""
    a = q8_adapted(spark, sf_dir).select(
        F.lit("q8").alias("grp"),
        F.col("o_year").cast("int").alias("yr"),
        F.col("mkt_share").alias("val"))
    b = q9_adapted(spark, sf_dir).select(
        F.concat(F.lit("q9:"), F.col("nation")).alias("grp"),
        F.col("o_year").cast("int").alias("yr"),
        F.col("sum_profit").alias("val"))
    return a.unionByName(b)


TPCH_QUERIES = {
    "tpch_q21_adapted": q21_adapted,
    "tpch_q02_adapted": q2_adapted,
    "tpch_q11_adapted": q11_adapted,
    "tpch_q16_adapted": q16_adapted,
    "tpch_q20_adapted": q20_adapted,
    "tpch_q01": q1,
    "tpch_q05_07": q05_07,
    "tpch_q08_09": q08_09,
    "tpch_q13": q13,
    "tpch_q15": q15,
    "tpch_q18": q18,
    # r4 composites — the merged members (q03 q04 q06 q10 q12 q14 q17
    # q19 q22) still run in full inside these rows; merging frees
    # corpus slots for previously driver-unverified operator families
    "tpch_q06_12_14_17_19": q06_12_14_17_19,
    "tpch_q04_22": q04_22,
    "tpch_q03_10": q03_10,
}
