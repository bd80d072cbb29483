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

    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "corpus_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
