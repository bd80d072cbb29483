"""Same-JVM interleaved A/B for the r14 `__setitem__` chain-token carry
fix (core/frame.py _carry_range_shadow): OLD = shadow dropped on every
column assignment (the pre-fix behavior — the Spark-3 Column.expr()
determinism probe raised on Spark 4.1, so the except branch killed the
token unconditionally) vs NEW = determinism read off the analyzed
extension, token carried through deterministic assignments.

Workload: op_ewm_expanding's ungrouped g-chain (ewm -> shift -> cumsum
-> setitem(where) -> ffill); the OLD arm re-buckets at the ffill (extra
exchange + sort), the NEW arm rides the carried layout.
Run: python tools/ab_setitem_carry.py [sf_dir] [reps]
"""
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")
import mars_spark as ms                                    # noqa: E402
from mars_spark.core.frame import DataFrame                # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

NEW_CARRY = DataFrame._carry_range_shadow


def old_carry(self, key, col):
    tok = getattr(self, "_range_layout", None)
    if tok is None:
        return
    self._range_layout = (tok[0], None, tok[2], tok[3])


def use(arm):
    DataFrame._carry_range_shadow = old_carry if arm == "old" else NEW_CARRY


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


def main():
    spark = ms.get_spark("ab_setitem_carry")
    spark.sparkContext.setLogLevel("ERROR")
    vals = {}
    for arm in ("old", "new"):
        use(arm)
        vals[arm] = chain()
    times = {"old": [], "new": []}
    for rep in range(REPS):
        for arm in ("old", "new") if rep % 2 == 0 else ("new", "old"):
            use(arm)
            t0 = time.time()
            v = chain()
            dt = time.time() - t0
            times[arm].append(dt)
            assert v == vals[arm], (arm, v)
            print(f"chain {arm} rep{rep} {dt:.3f}s", flush=True)
    use("new")
    same = vals["old"] == vals["new"]
    print(f"values identical across arms: {same} ({vals['new']})")
    assert same
    for arm in ("old", "new"):
        t = sorted(times[arm])
        print(f"RESULT chain: {arm} min {t[0]:.3f} "
              f"median {t[len(t)//2]:.3f}")


if __name__ == "__main__":
    main()
