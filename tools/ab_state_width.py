"""Interleaved same-JVM A/B of the streaming state-store width
(_state_partitions n) on the streaming rows — r14 measured 8 -> 4 as a
~25% win; this probes 4 -> 2 and 4 -> 1 (r15). Results asserted
identical across arms every rep (the key spaces are bounded by query
semantics, so the emitted rows are width-independent).

Usage: python tools/ab_state_width.py [sf_dir] [--reps N]
       [--rows a,b] [--widths 4,2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.1"
    reps = 4
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    rows = ["events_stream_windows", "op_stream_stateful"]
    if "--rows" in sys.argv:
        rows = sys.argv[sys.argv.index("--rows") + 1].split(",")
    widths = [4, 2]
    if "--widths" in sys.argv:
        widths = [int(w) for w in
                  sys.argv[sys.argv.index("--widths") + 1].split(",")]

    import mars_spark as ms
    import __spark_entry__ as entry
    import mars_spark.queries.pipeline as P

    spark = ms.get_spark("ab_state_width")
    qs = entry.queries()

    import glob
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()

    orig_cls = P._state_partitions
    forced_n = [None]

    class _forced(orig_cls):
        def __init__(self, spark, n):
            super().__init__(spark, forced_n[0] if forced_n[0] else n)

    P._state_partitions = _forced

    def run(name, width):
        forced_n[0] = width
        t0 = time.time()
        out = qs[name](spark, sf_dir)
        vals = sorted(map(str, out.collect()))
        return time.time() - t0, vals

    for name in rows:
        walls = {w: [] for w in widths}
        base_vals = None
        for rep in range(reps):
            order = list(widths)
            if rep % 2:
                order.reverse()
            for w in order:
                wall, vals = run(name, w)
                walls[w].append(round(wall, 3))
                if base_vals is None:
                    base_vals = vals
                else:
                    assert vals == base_vals, (
                        f"{name}: width {w} results differ")
                print(f"{name} rep{rep} w{w}: {wall:.3f}s", flush=True)
        base_vals = None
        summary = " | ".join(
            f"w{w} min {min(ts):.3f} med {sorted(ts)[len(ts)//2]:.3f}"
            for w, ts in walls.items())
        print(f"== {name}: {summary}  (values identical all reps)",
              flush=True)


if __name__ == "__main__":
    main()
