"""Physical-plan audit: for each query, report the plan features that
matter at 100 TB — join strategies, filter/column pushdown into the
parquet scan, exchange (shuffle) count, whole-stage codegen spans,
Python UDF presence (ArrowEvalPython/MapInPandas = deliberate escape
hatches only).

Usage: python tools/explain_audit.py [sf_dir] [prefix...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit_plan(plan: str) -> dict:
    return {
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "exchanges": len(re.findall(r"Exchange (hash|range)partitioning", plan)),
        # "pushed/total" scan counts: multi-strata rows legitimately
        # mix filtered slices (pushed) with full-corpus scans (no
        # predicate to push) — a bare boolean misread those as 'n'
        "pushed_filters": (
            sum(1 for m in re.findall(r"PushedFilters: \[([^\]]*)\]",
                                      plan) if m.strip()),
            len(re.findall(r"PushedFilters: \[", plan)),
        ),
        # codegen stages show as "*(N) Operator" in simpleString
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python": len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
        "row_scan_cols": (re.search(r"ReadSchema: struct<([^>]*)", plan) or [None, ""])[1][:90],
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:] or None

    import mars_spark as ms
    import __spark_entry__ as entry

    spark = ms.get_spark("audit")
    for name, fn in entry.queries().items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit_plan(plan)
            flags = []
            if a["smj"] or a["shj"]:
                flags.append(f"shuffle-joins={a['smj'] + a['shj']}")
            if a["python"]:
                flags.append(f"python-stages={a['python']}")
            np_, nt = a["pushed_filters"]
            print(f"{name:24s} bcast={a['broadcast_joins']} "
                  f"exch={a['exchanges']} codegen={a['codegen_spans']} "
                  f"pushed={np_}/{nt} "
                  f"{' '.join(flags)}")
        except Exception as ex:
            print(f"{name:24s} ERROR {str(ex).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
