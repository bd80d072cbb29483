"""Isolation scale bench: time named corpus rows at multiple scale
factors, each measurement in its OWN fresh Spark JVM (subprocess), so
neither cache warmth nor session-state drift pollutes the numbers
(r5 postmortem: shared-session bench rows inflated unrelated rows).

Prints one JSON line per (query, sf) measurement and a final summary
with s-vs-sf slopes: slope = log(t_hi/t_lo) / log(sf_hi/sf_lo) — 1.0
is perfectly linear scaling, 2.0 quadratic. Wall-clock includes plan
build + execution + collect, minus session startup (measured inside
the subprocess).

Usage:
  python tools/scale_bench.py [--reps N] [--queries a,b,c]
                              [--sfs dir1,dir2,...]
Defaults: the 8 heaviest rows, sf0.1 vs scaledata/sf0.3 + sf1, reps=3.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

HEAVY = [
    "docs_cc_clusters", "emb_neardup_pairs", "docs_minhash_dedup",
    "tpch_q21_adapted", "tpch_q08_09", "tpch_q05_07",
    "docs_jaccard_pairs", "op_knn_kmeans",
]

DEFAULT_SFS = [
    ("0.1", "/root/testdata/sf0.1"),
    ("0.3", "/root/repo/scaledata/sf0.3"),
    ("1", "/root/repo/scaledata/sf1"),
]

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import mars_spark as ms
import __spark_entry__ as entry
name, sf_dir = sys.argv[1], sys.argv[2]
spark = ms.get_spark("scalebench")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warmup
t0 = time.time()
df = entry.queries()[name](spark, sf_dir)
n = len(df.collect())
print(json.dumps({"t": round(time.time() - t0, 3), "rows": n}))
"""


def run_one(name: str, sf_dir: str, timeout: int = 1200,
            cpus: str | None = None) -> dict:
    import os

    env = dict(os.environ)
    if cpus:
        # core-scaling mode (r15, judge VERDICT item 7): the child's
        # get_spark reads local[$SPARK_GRAFT_CPUS]
        env["SPARK_GRAFT_CPUS"] = cpus
    try:
        p = subprocess.run(
            [sys.executable, "-c", CHILD, name, sf_dir],
            capture_output=True, text=True, timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        # one slow point must not kill the whole matrix — the slope
        # summary for every OTHER query is the tool's purpose
        return {"t": -1.0, "rows": -1, "err": f"timeout after {timeout}s"}
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"t": -1.0, "rows": -1,
            "err": (p.stderr or "no output").splitlines()[-1][:200]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=",".join(HEAVY))
    ap.add_argument("--sfs", default=",".join(d for _, d in DEFAULT_SFS))
    ap.add_argument("--cpus", default=None,
                    help="core count for the child JVMs (core-scaling "
                         "mode: run once with 32, once with 8, compare)")
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()
    queries = args.queries.split(",")
    sf_dirs = args.sfs.split(",")

    results: dict[str, dict[str, dict]] = {}
    for name in queries:
        results[name] = {}
        for sf_dir in sf_dirs:
            sf = sf_dir.rstrip("/").split("sf")[-1]
            ts, rows = [], None
            for _ in range(args.reps):
                r = run_one(name, sf_dir, timeout=args.timeout,
                            cpus=args.cpus)
                if r["t"] < 0:
                    print(json.dumps({"q": name, "sf": sf, **r}),
                          flush=True)
                    break
                ts.append(r["t"])
                rows = r["rows"]
            if ts:
                rec = {"median": round(statistics.median(ts), 3),
                       "min": min(ts), "max": max(ts), "rows": rows,
                       "reps": len(ts)}
                results[name][sf] = rec
                print(json.dumps({"q": name, "sf": sf, **rec}),
                      flush=True)

    # slopes between consecutive sf points (log-log)
    import math
    summary = {}
    for name, by_sf in results.items():
        pts = sorted(((float(sf), rec["median"]) for sf, rec
                      in by_sf.items()), key=lambda x: x[0])
        slopes = []
        for (s0, t0), (s1, t1) in zip(pts, pts[1:]):
            if t0 > 0 and t1 > 0:
                slopes.append(round(
                    math.log(t1 / t0) / math.log(s1 / s0), 2))
        summary[name] = {"points": {str(s): t for s, t in pts},
                         "slopes": slopes}
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
