"""Capture .explain('formatted') for named corpus rows into files.

Usage: python tools/capture_plans.py <outdir> <suffix> <row> [row...]

Writes <outdir>/<row>_<suffix>.txt. Run from the repo checkout whose
plans you want (a temp worktree of the pre-change commit for
'_before', the working tree for '_after'). NOTE: building a composite
row's DataFrame executes its eager driver sections — do not run this
concurrently with a bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    rows = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import mars_spark as ms
    import __spark_entry__ as entry

    spark = ms.get_spark("plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    q = entry.queries()
    for name in rows:
        df = q[name](spark, sf_dir)
        plan = (df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted")))
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
