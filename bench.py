"""Benchmark harness: runs the full query corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is timed end-to-end (plan build + execution + collect).
A warmup action runs first so JVM/codegen startup isn't billed to the
first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = None

    import mars_spark as ms
    import __spark_entry__ as entry

    spark = ms.get_spark("bench")
    # warmup: JVM + codegen + parquet footer caches
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # three back-to-back passes, report the per-query MIN: single-pass
    # timings on a shared machine carry ambient inflation (r3 measured
    # a 1.23x median swing on untouched queries; r9's box spikes
    # individual rows 2-4x against a stable solo-warm floor — 23.5 s
    # observed once on a row whose 4-rep isolation floor is 5.5 s, and
    # consecutive identical-code run totals spanned 65-99 s) —
    # best-of-N bounds it and the pass totals expose the variance for
    # the record
    passes: list[dict[str, float]] = []
    for _ in range(3):
        times: dict[str, float] = {}
        for name, fn in entry.queries().items():
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.collect()
                times[name] = round(time.time() - t0, 3)
            except Exception as ex:  # report, don't abort the whole bench
                print(f"# ERROR {name}: {str(ex).splitlines()[0][:120]}",
                      file=sys.stderr)
                times[name] = -1.0
        passes.append(times)

    best = {name: (min(ts) if all(t >= 0 for t in ts) else -1.0)
            for name, ts in ((n, [p[n] for p in passes])
                             for n in passes[0])}
    # failed queries (-1 markers) are named explicitly and excluded
    # from the headline total — a 47-row total must not read as
    # comparable to a 50-row one (r5 postmortem)
    failed = sorted(n for n, t in best.items() if t < 0)
    total = round(sum(t for t in best.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "corpus_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": sf,
        "passes": 3,
        "n_queries": len(best),
        "n_green": len(best) - len(failed),
        "failed": failed,
        "pass_totals": [round(sum(t for t in p.values() if t >= 0), 3)
                        for p in passes],
    }))


if __name__ == "__main__":
    main()
