"""Value-verify the ANN probe subset at a given scale dir: the PQ
pipeline (codes → ADC top-10 for the vec_id=0 query) and the batched
brute-force query table (top-5 for queries 0/7/19), each replayed
independently in DuckDB.

The FULL emb_ann_recall oracle is intractable in DuckDB at sf30: its
semantic-dedup drops CTE is quadratic per IVF cell (~2.8B 64-dim list
dots at 600k vectors). The probe subset is the part whose SQL replay
stays scan-shaped — exactly the query-path contract that matters at
100 TB (the quadratic stage is the Spark side's Arrow gemm, verified
value-exact at sf0.01–sf1 and measured, not value-replayed, beyond).

Usage: python tools/ann_probe_verify.py [sf_dir]
Prints PASS/FAIL per probe + one summary JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf30"
    import duckdb
    from pyspark.sql import functions as F

    import mars_spark as ms
    from mars_spark.llm import similarity as S

    spark = ms.get_spark("annprobe")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # ---- Spark side ----
    cb = S.pq_codebook(e, "embedding", m=8, nbits=4)
    codes = S.pq_encode(e, "embedding", cb)
    q0 = [float(v) for v in
          e.filter(F.col("vec_id") == 0)
          .select(S.to_double(F.col("embedding")).alias("q"))
          .collect()[0]["q"]]
    pq_top = [(r.vec_id, r.adc_dist)
              for r in S.pq_search(codes, cb, q0, k=10).collect()]
    qf = e.filter(F.col("vec_id").isin(0, 7, 19)).select(
        F.col("vec_id").alias("query_id"),
        S.to_double(F.col("embedding")).alias("q"))
    bq = sorted((r.query_id, r.vec_id, r.cos_sim) for r in
                S.topk_bruteforce_queries(e, "embedding", qf, k=5)
                .collect())
    sq_codes, mins, maxs = S.sq8_index(e, "embedding")
    sq_top = [(r.vec_id, r.adc_dist)
              for r in S.sq8_search(sq_codes, mins, maxs, q0,
                                    k=10).collect()]

    # ---- DuckDB replay ----
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    oracle_pq = con.execute("""
        WITH raw AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), sub AS (
            SELECT vec_id, ss.s AS s, v[ss.s*8+1 : ss.s*8+8] AS sv
            FROM raw, range(8) ss(s)
        ), pqids AS (
            SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
            FROM (SELECT DISTINCT vec_id FROM raw
                  ORDER BY vec_id LIMIT 16)
        ), pqcb AS (
            SELECT pqids.c, sub.s, sub.sv AS cent
            FROM sub JOIN pqids USING (vec_id)
        ), cdist AS (
            SELECT sub.vec_id, sub.s, pqcb.c,
                   list_sum(list_transform(range(1, 9),
                       i -> (sub.sv[i] - pqcb.cent[i])^2)) AS d
            FROM sub JOIN pqcb USING (s)
        ), codes AS (
            SELECT vec_id, s, c FROM (
                SELECT vec_id, s, c,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d, c) AS rn
                FROM cdist) WHERE rn = 1
        ), tbl AS (
            SELECT cdist.s, cdist.c, cdist.d AS t
            FROM cdist WHERE cdist.vec_id = 0
        ), adc AS (
            SELECT codes.vec_id, round(sum(tbl.t), 6) AS ad
            FROM codes JOIN tbl USING (s, c)
            GROUP BY codes.vec_id
        )
        SELECT vec_id, ad FROM adc ORDER BY ad, vec_id LIMIT 10
    """).fetchall()
    pq_pass = ([v for v, _ in pq_top] == [v for v, _ in oracle_pq]
               and all(abs(a - b) < 1e-6 for (_, a), (_, b)
                       in zip(pq_top, oracle_pq)))
    print(f"{'PASS' if pq_pass else 'FAIL'} pq_adc_top10 "
          f"spark={pq_top[:3]}... oracle={oracle_pq[:3]}...", flush=True)

    oracle_bq = sorted(con.execute("""
        SELECT query_id, vec_id, rc FROM (
            SELECT query_id, vec_id, rc,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY rc DESC, vec_id ASC) AS rn
            FROM (
                SELECT query_id, vec_id,
                       (CASE WHEN c >= 0 THEN floor(c * 1e4 + 0.5)
                             ELSE -floor(-c * 1e4 + 0.5) END) / 1e4 AS rc
                FROM (
                    SELECT q0.query_id, e1.vec_id,
                           list_cosine_similarity(
                               e1.embedding::DOUBLE[], q0.qv) AS c
                    FROM embeddings e1
                    CROSS JOIN (SELECT vec_id AS query_id,
                                       embedding::DOUBLE[] AS qv
                                FROM embeddings
                                WHERE vec_id IN (0, 7, 19)) q0
                )
            )
        ) WHERE rn <= 5
    """).fetchall())
    bq_pass = (len(bq) == len(oracle_bq)
               and all(a[0] == b[0] and a[1] == b[1]
                       and abs(a[2] - b[2]) < 1e-9
                       for a, b in zip(bq, oracle_bq)))
    print(f"{'PASS' if bq_pass else 'FAIL'} bq_top5 "
          f"spark={bq[:2]}... oracle={oracle_bq[:2]}...", flush=True)

    oracle_sq = con.execute("""
        WITH raw AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), sqmm AS (
            SELECT s.i AS i, min(v[s.i+1]) AS mn, max(v[s.i+1]) AS mx
            FROM raw, range(64) s(i) GROUP BY s.i
        ), sqcd AS (
            SELECT raw.vec_id, m.i,
                   CASE WHEN m.mx > m.mn THEN
                        CAST(least(255, greatest(0,
                             floor((v[m.i+1] - m.mn)
                                   * (255.0/(m.mx - m.mn)) + 0.5)))
                             AS INT)
                        ELSE 0 END AS code,
                   m.mn, m.mx
            FROM raw, sqmm m
        ), sqadc AS (
            SELECT sqcd.vec_id,
                   round(sum((q.v[sqcd.i+1] - (sqcd.mn + sqcd.code *
                        (CASE WHEN sqcd.mx > sqcd.mn
                              THEN (sqcd.mx - sqcd.mn)/255.0
                              ELSE 0.0 END)))^2), 6) AS ad
            FROM sqcd, (SELECT v FROM raw WHERE vec_id = 0) q
            GROUP BY sqcd.vec_id
        )
        SELECT vec_id, ad FROM sqadc ORDER BY ad, vec_id LIMIT 10
    """).fetchall()
    sq_pass = ([v for v, _ in sq_top] == [v for v, _ in oracle_sq]
               and all(abs(a - b) < 1e-6 for (_, a), (_, b)
                       in zip(sq_top, oracle_sq)))
    print(f"{'PASS' if sq_pass else 'FAIL'} sq8_adc_top10 "
          f"spark={sq_top[:3]}... oracle={oracle_sq[:3]}...", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "pq_adc_top10": pq_pass,
                      "bq_top5": bq_pass, "sq8_adc_top10": sq_pass}))


if __name__ == "__main__":
    main()
