"""Interleaved same-JVM A/B: default HDFSBackedStateStoreProvider vs
RocksDBStateStoreProvider on the three streaming rows (r15, judge
VERDICT item 2 — the ~12 s lifecycle floor was localized to addBatch +
queryPlanning in r14; the state-store provider is the remaining
engine-level lever).

The provider conf is read per query start, so both arms run in ONE
JVM, alternating order each rep (the only trustworthy methodology on
this box). Results are asserted identical across arms every rep.

Usage: python tools/ab_state_provider.py [sf_dir] [--reps N] [--rows a,b]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.1"
    reps = 4
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    rows = ["events_stream_windows", "op_stream_stateful",
            "docs_dedup_simhash"]
    if "--rows" in sys.argv:
        rows = sys.argv[sys.argv.index("--rows") + 1].split(",")

    import mars_spark as ms
    import __spark_entry__ as entry

    spark = ms.get_spark("ab_state_provider")
    default_provider = spark.conf.get(
        PROVIDER_KEY,
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")
    qs = entry.queries()

    # warm both arms once (RocksDB loads its native lib on first use)
    import glob
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()

    def run(name, provider):
        spark.conf.set(PROVIDER_KEY, provider)
        try:
            t0 = time.time()
            out = qs[name](spark, sf_dir)
            vals = sorted(map(str, out.collect()))
            return time.time() - t0, vals
        finally:
            spark.conf.set(PROVIDER_KEY, default_provider)

    for name in rows:
        walls = {"hdfs": [], "rocksdb": []}
        base_vals = None
        for rep in range(reps):
            order = [("hdfs", default_provider), ("rocksdb", ROCKSDB)]
            if rep % 2:
                order.reverse()
            for tag, prov in order:
                w, vals = run(name, prov)
                walls[tag].append(round(w, 3))
                if base_vals is None:
                    base_vals = vals
                else:
                    assert vals == base_vals, (
                        f"{name}: {tag} results differ from first arm")
                print(f"{name} rep{rep} {tag}: {w:.3f}s", flush=True)
        print(f"== {name}: hdfs min {min(walls['hdfs']):.3f} "
              f"med {sorted(walls['hdfs'])[len(walls['hdfs'])//2]:.3f} | "
              f"rocksdb min {min(walls['rocksdb']):.3f} "
              f"med {sorted(walls['rocksdb'])[len(walls['rocksdb'])//2]:.3f}"
              f"  (values identical all reps)", flush=True)


if __name__ == "__main__":
    main()
