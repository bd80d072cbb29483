"""Streaming-at-scale measurement: the two heaviest stream lifecycles
(the watermarked stream-stream interval join and stream_minhash_dedup
against a persisted band store) run as REAL availableNow queries over
the scale-factor parquet, each in its own fresh JVM, recording wall
clock and the state store's peak (rows, memory bytes) from the
query's progress events — the numbers that decide whether watermark
state stays bounded as deliveries grow.

Usage:
  python tools/stream_scale.py [--sfs dir1,dir2] [--which ssj,smh]
Prints one JSON line per (lifecycle, sf).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
which, sf_dir = sys.argv[1], sys.argv[2]
import mars_spark as ms
from pyspark.sql import functions as F
spark = ms.get_spark("streamscale")
spark.conf.set("spark.sql.shuffle.partitions", "8")

def peak_state(q):
    best_rows = best_mem = 0
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        rows = sum(o.get("numRowsTotal", 0) for o in ops)
        mem = sum(o.get("memoryUsedBytes", 0) for o in ops)
        best_rows, best_mem = max(best_rows, rows), max(best_mem, mem)
    return best_rows, best_mem

t0 = time.time()
if which == "ssjc":
    # CHUNKED delivery: the same interval join, but the delivery is
    # staged as 8 event-time-ordered files consumed one per
    # micro-batch (maxFilesPerTrigger=1) — the watermark advances
    # between batches, so buffered state EVICTS and the peak is
    # O(watermark + interval window), not O(delivery). This is the
    # production shape for backfills: never feed a day as one batch.
    import shutil
    from mars_spark.streaming.core import read_stream, \
        stream_stream_join
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # normalize ts to plain TIMESTAMP whatever the parquet encoding
    # (nanos-long / NTZ / LTZ — the testdata canary's known drift)
    ts_t = dict(ev.dtypes)["ts"]
    if ts_t == "bigint":
        ev = ev.withColumn(
            "ts", F.timestamp_seconds(F.expr("ts div 1000000000")))
    elif ts_t == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    evs = ev.withColumn("__es", F.col("ts").cast("long"))
    qs = evs.approxQuantile("__es", [i / 8 for i in range(1, 8)], 0.001)
    stage = f"/tmp/ssjc_{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    lo = None
    schema = None
    for i, hi in enumerate(list(qs) + [None]):
        c = evs
        if lo is not None:
            c = c.filter(F.col("__es") >= lo)
        if hi is not None:
            c = c.filter(F.col("__es") < hi)
        lo = hi
        tmp = f"{stage}_w{i}"
        c.drop("__es").coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = f"{stage}/chunk_{i:02d}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        os.utime(dst, (t0 + i, t0 + i))   # strictly increasing mtimes
        shutil.rmtree(tmp, ignore_errors=True)
        if schema is None:
            schema = spark.read.parquet(dst).schema
    src = read_stream(spark, "parquet", stage, schema=schema,
                      maxFilesPerTrigger=1)
    views = (src.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("user"),
                     F.col("ts").alias("vts"),
                     F.col("value").alias("vval")))
    purch = (src.filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("user"),
                     F.col("ts").alias("pts"),
                     F.col("event_id").alias("pid")))
    j = stream_stream_join(purch, views, on="user", left_ts="pts",
                           right_ts="vts", within="1 hour",
                           watermark="30 minutes")
    q = (j.writeStream.format("memory").queryName("ssjc_scale")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    n = spark.table("ssjc_scale").count()
elif which == "ssj":
    from mars_spark.queries.pipeline import _stream_source
    from mars_spark.streaming.core import stream_stream_join
    src = _stream_source(spark, sf_dir)
    views = (src.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("user"),
                     F.col("ts").alias("vts"),
                     F.col("value").alias("vval")))
    purch = (src.filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("user"),
                     F.col("ts").alias("pts"),
                     F.col("event_id").alias("pid")))
    j = stream_stream_join(purch, views, on="user", left_ts="pts",
                           right_ts="vts", within="1 hour",
                           watermark="30 minutes")
    q = (j.writeStream.format("memory").queryName("ss_scale")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    n = spark.table("ss_scale").count()
elif which == "smd":
    # streaming SEMANTIC dedup at scale: odd embeddings stream
    # against the even-embedding IVF index staged
    # partitionBy(cluster). n_clusters MUST scale with the corpus
    # (same rule as the batch SemDeDup path): the per-arrival probe
    # cost is the cell population, so a FIXED cell count makes the
    # join pair work quadratic in sf — measured 564 s at sf10 with
    # 64 pinned cells vs bounded-cell cost with ~256-vector cells
    from mars_spark.llm.similarity import ivf_index_deterministic, \
        write_ivf_index
    from mars_spark.streaming.core import read_stream, \
        stream_semantic_dedup
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ecorp = e.filter(F.col("vec_id") % 2 == 0)
    n_cells = max(16, ecorp.count() // 256)
    asg, cents = ivf_index_deterministic(
        ecorp, "embedding", n_clusters=n_cells)
    store_path = f"/tmp/ss_ivfstore_{os.getpid()}"
    write_ivf_index(asg.select("vec_id", "cluster", "e"), store_path)
    idx = spark.read.parquet(store_path).select("cluster", "e")
    delivery = (e.filter(F.col("vec_id") % 2 == 1)
                .select("vec_id", "embedding",
                        F.timestamp_seconds(
                            F.lit(1600000000) + (F.col("vec_id") % 7))
                        .alias("ts")))
    stage = f"/tmp/ss_smd_delivery_{os.getpid()}"
    delivery.write.mode("overwrite").parquet(stage)
    src = read_stream(spark, "parquet", stage,
                      schema=spark.read.parquet(stage).schema)
    surv = stream_semantic_dedup(src, idx, cents, "embedding",
                                 ts_col="ts", watermark="10 minutes",
                                 threshold=0.4)
    q = (surv.writeStream.format("memory").queryName("smd_scale")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    n = spark.table("smd_scale").count()
else:
    from mars_spark.llm.dedup import exact_dedup, minhash_bands, \
        write_band_store
    from mars_spark.streaming.core import read_stream, \
        stream_minhash_dedup
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store_path = f"/tmp/ss_bandstore_{os.getpid()}"
    write_band_store(
        minhash_bands(d.filter(F.col("doc_id") % 2 == 0),
                      "text", "doc_id"), store_path)
    bands = spark.read.parquet(store_path)
    delivery = exact_dedup(
        d.filter(F.col("doc_id") % 2 == 1), "text", "doc_id").select(
        "doc_id", "text",
        F.timestamp_seconds(F.lit(1600000000)
                            + (F.col("doc_id") % 7)).alias("ts"))
    stage = f"/tmp/ss_smh_delivery_{os.getpid()}"
    delivery.write.mode("overwrite").parquet(stage)
    src = read_stream(spark, "parquet", stage,
                      schema=spark.read.parquet(stage).schema)
    surv = stream_minhash_dedup(src, bands, "text", ts_col="ts",
                                watermark="10 minutes")
    q = (surv.writeStream.format("memory").queryName("smh_scale")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    n = spark.table("smh_scale").count()
rows, mem = peak_state(q)
print(json.dumps({"t": round(time.time() - t0, 2), "out_rows": n,
                  "state_rows_peak": rows,
                  "state_mb_peak": round(mem / 1048576, 1)}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="/root/testdata/sf0.1,"
                    "/root/repo/scaledata/sf1,/root/repo/scaledata/sf10")
    ap.add_argument("--which", default="ssj,smh")
    args = ap.parse_args()
    for which in args.which.split(","):
        for sf_dir in args.sfs.split(","):
            sf = sf_dir.rstrip("/").split("sf")[-1]
            try:
                p = subprocess.run(
                    [sys.executable, "-c", CHILD, which, sf_dir],
                    capture_output=True, text=True, timeout=1800)
                rec = None
                for line in reversed(p.stdout.strip().splitlines()):
                    try:
                        rec = json.loads(line)
                        break
                    except json.JSONDecodeError:
                        continue
                if rec is None:
                    rec = {"err": (p.stderr or "no output")
                           .splitlines()[-1][:200]}
            except subprocess.TimeoutExpired:
                rec = {"err": "timeout 1800s"}
            print(json.dumps({"lifecycle": which, "sf": sf, **rec}),
                  flush=True)


if __name__ == "__main__":
    main()
