"""Capture the binned-kendall finish plans under both arms.

Writes plans/r14/op_stats_kendall_finish_{before,after}.txt for the
DEFAULT public path (max_items=20000 -> B=141 rank bins, 19881 bucket
pairs): before = _DRIVER_FINISH_CAP forced to 0, so the tau-b finish
runs plan-side (two tie aggregates + the O(m^2) broadcast pair join —
the captured plan is the pq aggregate, the join over ~19881^2/2
ordered bucket pairs); after = the raised cap, where the finish is ONE
collect of the compressed bucket-pair frame (the captured plan — no
join behind it) followed by the O(m log m) Fenwick sweep on the
driver. Both arms are asserted to return the identical tau.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import mars_spark as ms                                     # noqa: E402
import mars_spark.operators.corr as C                       # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = "/root/repo/plans/r14"


def main():
    # Spark 4: pyspark.sql.DataFrame is the abstract facade — collect
    # must be patched on the concrete classic class
    from pyspark.sql.classic.dataframe import DataFrame as SDF

    spark = ms.get_spark("kendall_finish_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    sdf = (ms.read_parquet(f"{SF}/lineitem.parquet").to_spark()
           .select("l_extendedprice", "l_quantity"))

    captured = {}
    orig_collect = SDF.collect

    def spy(self):
        cols = [f.name for f in self.schema.fields]
        if cols == ["x", "y", "w"]:
            captured["after"] = _explain(self)      # the driver finish
        elif cols == ["p", "q"]:
            captured["before"] = _explain(self)     # the pair-join agg
        return orig_collect(self)

    def _explain(df):
        return (df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted")))

    SDF.collect = spy
    try:
        v_after = C.kendall_pair(sdf, "l_extendedprice", "l_quantity",
                                 approx=True)
        old_cap = C._DRIVER_FINISH_CAP
        try:
            C._DRIVER_FINISH_CAP = 0
            v_before = C.kendall_pair(sdf, "l_extendedprice",
                                      "l_quantity", approx=True)
        finally:
            C._DRIVER_FINISH_CAP = old_cap
    finally:
        SDF.collect = orig_collect
    assert v_after == v_before, (v_after, v_before)

    for arm in ("before", "after"):
        path = os.path.join(OUT, f"op_stats_kendall_finish_{arm}.txt")
        plan = captured[arm]
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{arm}: {path} Exchange={plan.count('Exchange')} "
              f"Join={plan.count('Join')}")
    print(f"tau identical across arms: {v_after}")


if __name__ == "__main__":
    main()
