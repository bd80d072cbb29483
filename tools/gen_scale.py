"""Self-generate larger scale factors from the driver's sf0.1 testdata
by deterministic replication — the in-sandbox path to measuring
s-vs-sf scaling slopes (the driver only ships sf0.001/0.01/0.1).

Replica i (0-based) offsets every key column by i * <domain size>, so
foreign keys stay consistent and key cardinality grows linearly —
joins and aggregations see 10x the groups, not 10x-deep groups.
Content columns are perturbed where identity would corrupt the
workload's scaling structure:

- documents.text: every token is prefixed ``r{i}_`` for i>0, so
  cross-replica shingle sets are disjoint — near-dup/dedup structure
  per replica is identical to sf0.1 and the global pair count scales
  linearly (verbatim copies would weld replicas into 10x-deep dup
  clusters and force quadratic pair growth that says nothing about
  the engine).
- embeddings.embedding: replica i cyclically rotates the vector by
  7*i positions — norms are preserved, cross-replica cosines drop to
  noise (~N(0, 1/sqrt(64))), so near-dup structure again replicates
  per-replica instead of welding.
- events.ts is left unchanged: user count grows 10x with per-user
  session shapes intact.

Usage: python tools/gen_scale.py <out_dir> <replicas>
e.g.   python tools/gen_scale.py /root/repo/scaledata/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {key column -> domain size (max+1 in sf0.1)}
KEYS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY = ["nation", "region"]


def generate(out_dir: str, replicas: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
    for t, keys in KEYS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + i * {keys[c]} AS {c}")
            elif t == "documents" and c == "text":
                sel.append(
                    "CASE WHEN i = 0 THEN text ELSE 'r' || i || '_' || "
                    "replace(text, ' ', ' r' || i || '_') END AS text")
            elif t == "embeddings" and c == "embedding":
                # rotate by 7*i (1-indexed list slices; len 64)
                sel.append(
                    "CASE WHEN i = 0 THEN embedding ELSE "
                    "list_concat(embedding[(7*i) % 64 + 1:], "
                    "embedding[:(7*i) % 64]) END AS embedding")
            else:
                sel.append(c)
        q = (f"COPY (SELECT {', '.join(sel)} "
             f"FROM read_parquet('{SRC}/{t}.parquet'), "
             f"generate_series(0, {replicas - 1}) g(i) "
             f"ORDER BY i) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET, "
             f"ROW_GROUP_SIZE 122880)")
        con.execute(q)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    generate(out, reps)
