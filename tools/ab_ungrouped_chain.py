"""Same-JVM interleaved A/B for the r14 ungrouped-window layout rework
(operators/window.py): OLD = repartitionByRange(order) + localCheckpoint
+ spark_partition_id (no chain token, no persist) vs NEW = value-pure
__pid buckets + persist + chain-token reuse.

The OLD form is restored by monkeypatching _range_partitioned /
_layout_of so the surrounding op bodies (pads, carries, publishes) are
byte-identical between arms — the A/B isolates exactly the layout
mechanism. Run: python tools/ab_ungrouped_chain.py [sf_dir] [reps]
"""
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")
import mars_spark as ms                                    # noqa: E402
from mars_spark.operators import window as W               # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

NEW_RP, NEW_LO = W._range_partitioned, W._layout_of


def old_range_partitioned(sdf, order, frame=None):
    ocols = [F.col(c) for c in order]
    width = max(sdf.rdd.getNumPartitions(), 1)
    base = (sdf.repartitionByRange(width, *ocols)
            .sortWithinPartitions(*ocols)
            .localCheckpoint())
    return base.withColumn("__pid", F.spark_partition_id())


def use(arm):
    if arm == "old":
        W._range_partitioned = old_range_partitioned
        W._layout_of = lambda frame, order: None
    else:
        W._range_partitioned = NEW_RP
        W._layout_of = NEW_LO


def chain():
    """op_ewm_expanding's ungrouped g-chain, to a checksum collect."""
    from mars_spark.operators.window import cumsum, ewm_agg, shift
    e = ms.read_parquet(f"{SF}/events.parquet")
    g = e[e.user_id < 10][["event_id", "value"]]
    g = ewm_agg(g, "value", alpha=0.2, order_by="event_id",
                stats=("mean", "var"))
    g = shift(g, 1, order_by=["event_id"], cols=["value"])
    g = cumsum(g, "value", order_by=["event_id"])
    g["vn"] = g.value.where(g.value >= 50)
    g = g.ffill(order_by="event_id", cols=["vn"])
    row = g.to_spark().agg(
        F.sum("value_ewm_mean"), F.sum("value_ewm_var"),
        F.sum("value_shift"), F.sum("value_cumsum"),
        F.sum("vn")).collect()[0]
    return tuple(round(float(x), 6) for x in row)


def roll_ug():
    """op_stats' ungrouped rolling stratum (lineitem-wide)."""
    li = ms.read_parquet(f"{SF}/lineitem.parquet")
    lif = (li[["l_orderkey", "l_linenumber", "l_quantity"]]
           .groupby(["l_orderkey", "l_linenumber"], as_index=False)
           .agg(q=("l_quantity", "sum")))
    r = lif.rolling(5, min_periods=1).over(
        order_by=["l_orderkey", "l_linenumber"]).agg({"q": "sum"})
    row = r.to_spark().agg(F.sum("q_roll_sum").alias("s")).collect()[0]
    return round(float(row["s"]), 6)


def main():
    spark = ms.get_spark("ab_ungrouped")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    vals = {}
    for fn in (chain, roll_ug):
        # warmup both arms once (JVM/Arrow/codegen priming)
        for arm in ("old", "new"):
            use(arm)
            v = fn()
            vals.setdefault(fn.__name__, {})[arm] = v
        times = {"old": [], "new": []}
        for rep in range(REPS):
            for arm in ("old", "new") if rep % 2 == 0 else ("new", "old"):
                use(arm)
                t0 = time.time()
                v = fn()
                dt = time.time() - t0
                times[arm].append(dt)
                assert v == vals[fn.__name__][arm], (arm, v)
                print(f"{fn.__name__} {arm} rep{rep} {dt:.3f}s",
                      flush=True)
        results[fn.__name__] = times
        same = vals[fn.__name__]["old"] == vals[fn.__name__]["new"]
        print(f"{fn.__name__}: values identical across arms: {same} "
              f"({vals[fn.__name__]['new']})", flush=True)
        assert same
    use("new")
    for name, t in results.items():
        print(f"RESULT {name}: old min {min(t['old']):.3f} "
              f"median {sorted(t['old'])[len(t['old'])//2]:.3f} | "
              f"new min {min(t['new']):.3f} "
              f"median {sorted(t['new'])[len(t['new'])//2]:.3f}")


if __name__ == "__main__":
    main()
