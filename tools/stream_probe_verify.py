"""Value-verify docs_dedup_simhash at a scale dir where the FULL
DuckDB oracle is disk-bound (r15, judge VERDICT item 8 — the
ann_probe_verify / curation_cc_probe_verify pattern; the full replay
at sf30 spilled >70 GB of DuckDB temp before dying).

The FULL Spark row runs (the actual computation under test — every
stratum, including the streaming lifecycles). Its output is then
split by stratum prefix and each stratum whose SQL replay stays
linear-or-bounded is verified EXACTLY against an independent DuckDB
query:

  - src:*   exact-dedup keep counts per source + global fp count —
            one md5 per doc, linear;
  - doc:*   16-bit simhash per doc, bounded (doc_id < 50);
  - inc:*   incremental (batch-vs-store) dedup winners, linear
            anti-join on the fp column;
  - stream:* streaming exact-dedup survivor fps, bounded
            (doc_id < 200);
  - smh:*   streaming minhash near-dup survivors, bounded
            (doc_id < 200).

What this does NOT re-verify at this scale, and why (both strata
remain value-verified at sf0.01–sf1 via the row oracle and measured
beyond):

  - dsir:*  the full-corpus hashed-bigram explode (~10⁸ gram rows ×
            md5 at sf30) is what exhausted DuckDB's temp spill;
  - smd:*   the per-IVF-cell semantic-dedup join is quadratic per
            cell in SQL (the exact stage SCALE.md r11 names
            intractable for emb_ann_recall at sf30 — the Spark side
            does it as an Arrow gemm precisely because of this).

The tool FAILS if the verified+excluded prefixes do not cover the
row's output exactly (a new stratum must be classified, not skipped
silently).

Usage: python tools/stream_probe_verify.py [sf_dir]
Prints PASS/FAIL per stratum + one summary JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

VERIFIED = ["src:", "doc:", "inc:", "stream:", "smh:"]
EXCLUDED = ["dsir:", "smd:"]


def _stratum_sql():
    from mars_spark.queries import pipeline_oracles as O

    norm, toks = O._NORM, O._TOKS
    f_cte = (f"f AS (SELECT doc_id, source, md5({norm}) AS fp "
             f"FROM documents)")
    minhash, simhash16 = O._minhash, O._simhash16
    shingles = O._SHINGLES
    return {
        "src:": f"""
            WITH {f_cte},
                 kk AS (SELECT fp, min(doc_id) AS keep_id FROM f
                        GROUP BY fp)
            SELECT 'src:' || source AS grp, count(*) AS k,
                   (SELECT count(DISTINCT fp) FROM f) AS v
            FROM f JOIN kk ON f.doc_id = kk.keep_id
            GROUP BY source
        """,
        "doc:": f"""
            SELECT 'doc:' || doc_id AS grp, {simhash16()} AS k,
                   CAST(NULL AS BIGINT) AS v
            FROM (
                SELECT doc_id,
                       [('0x' || substr(md5(t), 1, 8))::BIGINT
                        for t in list_distinct({toks})] AS hashes
                FROM documents WHERE doc_id < 50
            )
        """,
        "inc:": f"""
            WITH {f_cte},
                 winners AS (
                    SELECT doc_id FROM (
                        SELECT doc_id,
                               row_number() OVER (PARTITION BY fp
                                                  ORDER BY doc_id) AS rn
                        FROM f
                        WHERE doc_id % 2 = 1
                          AND fp NOT IN (SELECT fp FROM f
                                         WHERE doc_id % 2 = 0)
                    ) WHERE rn = 1
                 )
            SELECT 'inc:' || doc_id AS grp, doc_id AS k,
                   CAST(NULL AS BIGINT) AS v
            FROM winners WHERE doc_id < 400
            UNION ALL
            SELECT 'inc:total' AS grp, count(*) AS k,
                   CAST(NULL AS BIGINT) AS v
            FROM winners
        """,
        "stream:": f"""
            WITH {f_cte}
            SELECT 'stream:' || fp AS grp, CAST(NULL AS BIGINT) AS k,
                   CAST(NULL AS BIGINT) AS v
            FROM (SELECT DISTINCT fp FROM f
                  WHERE doc_id % 2 = 1 AND doc_id < 200
                    AND fp NOT IN (SELECT fp FROM f
                                   WHERE doc_id % 2 = 0))
            UNION ALL
            SELECT 'stream:total' AS grp, count(DISTINCT fp) AS k,
                   CAST(NULL AS BIGINT) AS v
            FROM f
            WHERE doc_id % 2 = 1 AND doc_id < 200
              AND fp NOT IN (SELECT fp FROM f WHERE doc_id % 2 = 0)
        """,
        "smh:": f"""
            WITH sbase AS (
                SELECT doc_id, doc_id % 2 AS par, {shingles} AS sh
                FROM (SELECT doc_id, {toks} AS l FROM documents
                      WHERE doc_id < 200)
            ), smh AS (
                SELECT doc_id, par,
                       {", ".join(f"{minhash(i)} AS mh{i}"
                                  for i in range(8))}
                FROM sbase
            ), sbands AS (
                SELECT doc_id, par,
                       {", ".join(f"md5(mh{2 * i} || '|' || mh{2 * i + 1}) AS b{i}"
                                  for i in range(4))}
                FROM smh
            ), ssurv AS (
                SELECT DISTINCT
                       md5(o.b0 || '|' || o.b1 || '|' || o.b2
                           || '|' || o.b3) AS sig
                FROM sbands o
                WHERE o.par = 1 AND NOT EXISTS (
                    SELECT 1 FROM sbands e
                    WHERE e.par = 0 AND (e.b0 = o.b0 OR e.b1 = o.b1
                                         OR e.b2 = o.b2 OR e.b3 = o.b3))
            )
            SELECT 'smh:' || sig AS grp, CAST(NULL AS BIGINT) AS k,
                   CAST(NULL AS BIGINT) AS v
            FROM ssurv
            UNION ALL
            SELECT 'smh:total', count(*), CAST(NULL AS BIGINT)
            FROM ssurv
        """,
    }


def main():
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else "/root/repo/scaledata/sf30")

    import __spark_entry__ as entry
    from check_correctness import compare, duck_con

    import mars_spark as ms

    spark = ms.get_spark("stream_probe_verify")
    t0 = time.time()
    sdf = entry.queries()["docs_dedup_simhash"](spark, sf_dir).toPandas()
    t_spark = time.time() - t0
    print(f"spark row: {len(sdf)} rows in {t_spark:.1f}s", flush=True)

    covered = sdf["grp"].str.startswith(tuple(VERIFIED + EXCLUDED))
    results = {"sf_dir": sf_dir, "spark_rows": int(len(sdf)),
               "spark_sec": round(t_spark, 1), "strata": {}}
    ok = True
    if not covered.all():
        extra = sorted(sdf.loc[~covered, "grp"].str[:12].unique())[:5]
        print(f"FAIL coverage: unclassified strata {extra}")
        results["strata"]["coverage"] = "FAIL"
        ok = False

    def _num_as_float(df):
        # the row's k/v columns carry NULLs in OTHER strata, so the
        # pandas slice is float64 while DuckDB returns int64 for an
        # all-integer stratum — compare() stringifies ints ('25' vs
        # '25.0'); a common float dtype routes both through allclose
        df = df.copy()
        for c in ("k", "v"):
            if c in df.columns:
                df[c] = df[c].astype("float64")
        return df

    con = duck_con(sf_dir)
    for pref, sql in _stratum_sql().items():
        t0 = time.time()
        ddf = _num_as_float(con.execute(sql).fetchdf())
        spart = _num_as_float(
            sdf[sdf["grp"].str.startswith(pref)].reset_index(drop=True))
        problems = compare(pref, spart, ddf)
        dt = time.time() - t0
        if problems:
            print(f"FAIL {pref} ({len(spart)} vs {len(ddf)} rows, "
                  f"{dt:.1f}s): {problems[0]}")
            results["strata"][pref] = "FAIL"
            ok = False
        else:
            print(f"PASS {pref} ({len(spart)} rows, {dt:.1f}s)")
            results["strata"][pref] = f"PASS:{len(spart)}"
    for pref in EXCLUDED:
        n = int(sdf["grp"].str.startswith(pref).sum())
        results["strata"][pref] = f"EXCLUDED:{n}"
        print(f"---- {pref} {n} rows excluded "
              f"(intractable SQL replay at this scale; "
              f"value-verified at sf0.01-sf1)")
    results["ok"] = ok
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
