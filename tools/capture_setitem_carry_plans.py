"""Capture the ab_setitem_carry g-chain plan under both arms.

Writes plans/r14/op_ewm_expanding_{before,after}_setitem_carry.txt:
before = shadow token dropped on every __setitem__ (the pre-fix Spark-4
behavior, where Column.expr() raised), after = the analyzed-plan carry.
"""
import os
import sys

import pyspark.sql.functions as F  # noqa: F401

sys.path.insert(0, "/root/repo")
import mars_spark as ms                                    # noqa: E402
from mars_spark.core.frame import DataFrame                # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = "/root/repo/plans/r14"

NEW_CARRY = DataFrame._carry_range_shadow


def old_carry(self, key, col):
    tok = getattr(self, "_range_layout", None)
    if tok is None:
        return
    self._range_layout = (tok[0], None, tok[2], tok[3])


def chain():
    from mars_spark.operators.window import cumsum, ewm_agg, shift
    e = ms.read_parquet(f"{SF}/events.parquet")
    g = e[e.user_id < 10][["event_id", "value"]]
    g = ewm_agg(g, "value", alpha=0.2, order_by="event_id",
                stats=("mean", "var"))
    g = shift(g, 1, order_by=["event_id"], cols=["value"])
    g = cumsum(g, "value", order_by=["event_id"])
    g["vn"] = g.value.where(g.value >= 50)
    g = g.ffill(order_by="event_id", cols=["vn"])
    return g.to_spark().agg(
        F.sum("value_ewm_mean"), F.sum("value_ewm_var"),
        F.sum("value_shift"), F.sum("value_cumsum"), F.sum("vn"))


def main():
    spark = ms.get_spark("setitem_carry_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for arm, fn in (("before", old_carry), ("after", NEW_CARRY)):
        DataFrame._carry_range_shadow = fn
        df = chain()
        plan = (df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted")))
        path = os.path.join(OUT, f"op_ewm_expanding_{arm}_setitem_carry.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_sort = plan.count("Sort ")
        print(f"{arm}: {path} Exchange={n_ex} Sort={n_sort}")


if __name__ == "__main__":
    main()
