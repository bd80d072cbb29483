"""Solo row profiler (optimization guide §1): run ONE corpus row in
this process with the Spark UI enabled, then scrape the UI REST API
for per-job wall times and descriptions — the empirical loop of guide
§1.1 without clicking through a browser.

Usage: python tools/profile_row.py <row> [sf_dir] [--reps N]

Prints each rep's wall, then the top jobs by duration with their
descriptions/stage names so the expensive strata of a composite row
are attributable.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.1"
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    import mars_spark as ms
    import __spark_entry__ as entry

    spark = ms.get_spark("profile", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedJobs": "5000",
        "spark.ui.retainedStages": "5000",
    })
    ui = spark.sparkContext.uiWebUrl
    # warmup: page caches + codegen like bench.py does
    import glob
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()

    fn = entry.queries()[name]
    walls = []
    marks = []
    for i in range(reps):
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = len(df.collect())
        walls.append(round(time.time() - t0, 3))
        marks.append(spark.sparkContext._jsc.sc().dagScheduler().nextJobId().get()
                     if False else None)
    print(f"rows={n} walls={walls}")

    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded") as r:
        jobs = json.load(r)
    tot = 0.0
    rows = []
    def _ts(s):
        # "2026-08-17T09:13:43.123GMT"
        base = time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))
        ms_part = s[20:23]
        return base + (int(ms_part) / 1000.0 if ms_part.isdigit() else 0.0)

    for j in jobs:
        try:
            dur = _ts(j["completionTime"]) - _ts(j["submissionTime"])
        except Exception:
            dur = -1
        rows.append((dur, j["jobId"],
                     (j.get("description") or j.get("name", ""))[:110],
                     j.get("numTasks", 0)))
        tot += max(dur, 0)
    rows.sort(reverse=True)
    print(f"# {len(rows)} jobs, serial-sum {tot:.1f}s (overlap makes wall lower)")
    for dur, jid, desc, ntasks in rows[:40]:
        print(f"{dur:7.1f}s  job={jid:4d} tasks={ntasks:4d}  {desc}")


if __name__ == "__main__":
    main()
