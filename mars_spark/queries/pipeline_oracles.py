"""DuckDB oracle SQL for the pipeline corpus (pipeline.py).

The text/dedup oracles re-derive the exact md5-based definitions used
by mars_spark.llm — normalization, shingling, minwise hashing, LSH
banding and simhash are all reproduced in portable SQL so every stage
of the dedup pipelines is value-checked, not just row-counted.
"""

# normalized text (must match llm.text.normalize): lower + collapse ws
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKS = f"regexp_split_to_array({_NORM}, ' ')"

# word-3-gram distinct shingles (must match llm.text.word_shingles k=3):
# DuckDB list slice l[i:i+2] is 1-based inclusive → 3 elements.
_SHINGLES = (
    "list_distinct([array_to_string(l[i:i+2], ' ') "
    "for i in range(1, greatest(len(l)-1, 2))])"
)

# PII redaction chain over `text` (must match llm.pii.PII_PATTERNS
# order: email, ipv4, phone, ssn)
_REDACT_TXT = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'), "
    "'\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'), "
    "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g')"
)
# normalization + tokens + distinct word-13-gram shingles of the
# REDACTED text `rtext` (must match llm.text.word_shingles k=13 incl.
# the <k-token whole-doc truncation)
_RNORM = r"trim(regexp_replace(lower(rtext), '\s+', ' ', 'g'))"
_RL = f"regexp_split_to_array({_RNORM}, ' ')"
_SHINGLES13 = ("list_distinct([array_to_string(rl[i:i+12], ' ') "
               "for i in range(1, greatest(len(rl)-11, 2))])")

_STOP5 = ["the", "and", "of", "to", "a"]
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " et ", " les ", " des ", " est "],
    "es": [" el ", " y ", " los ", " que ", " es "],
}


def _occ(expr: str, word: str) -> str:
    """Occurrence count by length difference (llm.text.occurrences)."""
    w = word.replace("'", "''")
    return (f"CAST((length({expr}) - length(replace({expr}, '{w}', '')))"
            f" / {len(word)} AS INT)")


def _lang_score(lang: str) -> str:
    return " + ".join(_occ("padded", w) for w in _LANG_MARKERS[lang])


def _langid_case() -> str:
    whens = "\n".join(
        f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'"
        for lang in sorted(_LANG_MARKERS)
    )
    return f"CASE {whens} ELSE 'und' END"


def _minhash(i: int) -> str:
    return f"list_min([md5('{i}|' || s) for s in sh])"


def _simhash16() -> str:
    bits = " + ".join(
        f"(CASE WHEN list_sum([CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END "
        f"for h in hashes]) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(16)
    )
    return f"CAST({bits} AS BIGINT)"


# Corpus-hygiene oracle (r7): repetition filters + PII redaction +
# eval-set decontamination, unioned into docs_text_metrics. The
# Spark side computes dup-ngram / top-word fractions with
# higher-order Column folds; this SQL states the same per-doc
# quantities relationally (list ops / unnest + group). PII strings
# are rebuilt from doc_id with identical CASE rules; regexes live
# in the Java-regex / RE2 intersection so both engines agree.
_HYGIENE_SQL = """
        WITH norm AS (
            SELECT doc_id, source,
                   string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
            FROM documents
        ), rep_doc AS (
            SELECT doc_id, source, ws,
                   list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
                                  i -> array_to_string(ws[i:i+1], ' ')) AS g2
            FROM norm
        ), rep_frac AS (
            SELECT doc_id, source,
                   round((len(g2) - len(list_distinct(g2)))
                         / greatest(len(g2), 1)::DOUBLE, 4) AS dup2
            FROM rep_doc
        ), wcount AS (
            SELECT doc_id, any_value(source) AS source,
                   round(max(c)::DOUBLE / greatest(sum(c), 1), 4) AS topw
            FROM (SELECT doc_id, source, w, count(*) AS c
                  FROM norm, UNNEST(ws) AS u(w) GROUP BY 1, 2, 3)
            GROUP BY doc_id
        ), rep AS (
            SELECT 'rep' AS grp, r.source AS k, count(*) AS n,
                   round(avg(r.dup2), 4) AS v1, round(avg(w.topw), 4) AS v2
            FROM rep_frac r JOIN wcount w USING (doc_id)
            GROUP BY r.source
        ), aug AS (
            SELECT doc_id, source, text
                || CASE WHEN doc_id % 2 = 0 THEN ' contact u' || doc_id
                        || '@ex' || (doc_id % 7) || 'a.com' ELSE '' END
                || CASE WHEN doc_id % 3 = 0 THEN ' ip 10.' || (doc_id % 256)
                        || '.0.1' ELSE '' END
                || ' tel 555-' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || CASE WHEN doc_id % 5 = 0 THEN ' ssn 987-65-4321' ELSE '' END AS a
            FROM documents
        ), pii_doc AS (
            SELECT source,
                   len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                 + len(regexp_extract_all(a, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                 + len(regexp_extract_all(a, '\\b\\d{3}-\\d{3}-\\d{4}\\b'))
                 + len(regexp_extract_all(a, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS tot,
                   length(a) - length(
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(a,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
                           '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
                           '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g')) AS removed
            FROM aug
        ), pii AS (
            SELECT 'pii' AS grp, source AS k, count(*) AS n,
                   CAST(sum(tot) AS DOUBLE) AS v1,
                   round(avg(removed), 2) AS v2
            FROM pii_doc GROUP BY source
        ), chdoc AS (
            -- chunking closed form (size 32, stride 24): n_chunks and
            -- total chunk tokens per doc; size-sized chunks plus a
            -- partial tail of n - (n_chunks-1)*stride tokens
            SELECT source,
                   CASE WHEN len(ws) <= 32 THEN 1
                        ELSE CAST(ceil((len(ws) - 32) / 24.0) AS BIGINT) + 1
                   END AS nch,
                   CASE WHEN len(ws) <= 32 THEN len(ws)
                        ELSE (CAST(ceil((len(ws) - 32) / 24.0) AS BIGINT)) * 32
                             + len(ws)
                             - CAST(ceil((len(ws) - 32) / 24.0) AS BIGINT) * 24
                   END AS tot
            FROM norm
        ), chunkrows AS (
            SELECT 'chunk' AS grp, source AS k,
                   CAST(sum(nch) AS BIGINT) AS n,
                   CAST(sum(tot) AS DOUBLE) AS v1,
                   round(sum(tot) / CAST(sum(nch) AS DOUBLE), 2) AS v2
            FROM chdoc GROUP BY source
        ), evg AS (
            SELECT DISTINCT array_to_string(ws[i:i+7], ' ') AS gram
            FROM norm, UNNEST(range(1, greatest(len(ws) - 7, 1) + 1)) AS t(i)
            WHERE doc_id % 7 = 0
        ), trg AS (
            SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+7], ' ') AS gram
            FROM norm, UNNEST(range(1, greatest(len(ws) - 7, 1) + 1)) AS t(i)
            WHERE doc_id % 7 <> 0
        ), bad AS (
            SELECT DISTINCT doc_id, source FROM trg
            WHERE gram IN (SELECT gram FROM evg)
        ), bad_src AS (
            SELECT source, count(*) AS n_bad FROM bad GROUP BY source
        ), dec AS (
            SELECT 'decon' AS grp, t.source AS k, t.n,
                   CAST(coalesce(b.n_bad, 0) AS DOUBLE) AS v1,
                   round(coalesce(b.n_bad, 0) / t.n::DOUBLE, 4) AS v2
            FROM (SELECT source, count(*) AS n FROM documents
                  WHERE doc_id % 7 <> 0 GROUP BY source) t
            LEFT JOIN bad_src b USING (source)
        )
        SELECT * FROM rep
        UNION ALL SELECT * FROM pii
        UNION ALL SELECT * FROM chunkrows
        UNION ALL SELECT * FROM dec
    """

def _bpe_rounds_sql(n_rounds: int) -> str:
    """Unrolled BPE trainer rounds (llm/bpe.py learn_bpe): each round
    counts adjacent symbol pairs over the word histogram (weighted by
    word count), picks the (count desc, pair asc) argmax, and applies
    it leftmost-first via a list_reduce fold — the same
    non-overlapping left-to-right merge the engine's pandas UDF
    performs. Generated, not hand-written: one CTE triple per round."""
    rounds = []
    for r in range(1, n_rounds + 1):
        prev = f"w{r - 1}"
        rounds.append(f"""
            , pc{r} AS (
                SELECT p.a AS a, p.b AS b, sum(wc) AS pc FROM (
                    SELECT c AS wc,
                           UNNEST([{{'a': s[i], 'b': s[i+1]}}
                                   for i in range(1, len(s))]) AS p
                    FROM {prev}) GROUP BY 1, 2
            ), bp{r} AS (
                SELECT a, b, pc FROM pc{r} WHERE pc >= 2
                ORDER BY pc DESC, a, b LIMIT 1
            ), w{r} AS (
                SELECT w, c,
                       list_reduce(list_transform(s, x -> [x]),
                           (acc, x) -> CASE WHEN acc[-1] = bp{r}.a
                                             AND x[1] = bp{r}.b
                                        THEN acc[:-2]
                                             || [bp{r}.a || bp{r}.b]
                                        ELSE acc || x END) AS s
                FROM {prev}, bp{r}
            )""")
    merge_rows = "\n            UNION ALL\n            ".join(
        f"SELECT 'bpe' AS grp, a || '|' || b AS k, "
        f"CAST({r} AS BIGINT) AS n, CAST(pc AS DOUBLE) AS v FROM bp{r}"
        for r in range(1, n_rounds + 1))
    return "".join(rounds), merge_rows


_BPE_ROUNDS, _BPE_MERGE_ROWS = _bpe_rounds_sql(8)

# corpus BPE strata of docs_curation_ops: 8-merge trainer trajectory
# + per-source encoded token mass (join doc tokens to the final word
# segmentation — word-level determinism makes the join exact)
_BPE_BLOCK = f"""
        UNION ALL
        SELECT * FROM (
            WITH bst AS (
                SELECT doc_id, source, {_TOKS} AS l
                FROM documents WHERE doc_id < 120
            ), wh AS (
                SELECT w, count(*) AS c
                FROM (SELECT UNNEST(l) AS w FROM bst)
                WHERE w != '' GROUP BY w
            ), w0 AS (
                SELECT w, c, string_split(w, '') || ['</w>'] AS s
                FROM wh
            ){_BPE_ROUNDS}
            {_BPE_MERGE_ROWS}
            UNION ALL
            SELECT 'bpet' AS grp, nd.source AS k, nd.n,
                   CAST(coalesce(tv.v, 0) AS DOUBLE) AS v
            FROM (SELECT source, count(*) AS n
                  FROM bst GROUP BY source) nd
            LEFT JOIN (
                SELECT t2.source, sum(len(w8.s)) AS v
                FROM (SELECT source, UNNEST(l) AS w FROM bst) t2
                JOIN w8 ON t2.w = w8.w
                GROUP BY t2.source) tv USING (source)
        )
"""

PIPELINE_ORACLES: dict[str, str] = {
    # ------------------------------------------------------------- events
    # oracle for the REAL Structured Streaming run: bounded stream +
    # event-time windows must equal the batch group-by exactly
    # one oracle for all three streaming window types: tumbling =
    # hour-trunc; sliding = each event lands in the two half-hour-
    # aligned 1h windows covering it; session = gap>=30min islands
    # per user (lag + running sum), session_start = min ts
    # the apw: CTEs replay the append-mode watermark rules of
    # pipeline._append_watermark_run: batch 1 = event_id % 4 != 0;
    # watermark = floor-to-ms(max ts seen) - 30 min (Spark tracks
    # event-time stats in ms); batch-2 rows in windows whose END <=
    # the batch-1 watermark are dropped; emitted windows are those
    # with END <= the final watermark, over surviving rows only
    "events_stream_windows": """
        WITH apw_b1 AS (
            SELECT ts, event_type, value FROM events
            WHERE event_id % 4 != 0
        ), apw_wm1 AS (
            SELECT date_trunc('milliseconds', max(ts))
                   - INTERVAL 30 MINUTE AS w
            FROM apw_b1
        ), apw_wm2 AS (
            SELECT date_trunc('milliseconds', max(ts))
                   - INTERVAL 30 MINUTE AS w
            FROM events
        ), apw_surv AS (
            SELECT * FROM apw_b1
            UNION ALL
            SELECT ts, event_type, value FROM events
            WHERE event_id % 4 = 0
              AND date_trunc('hour', ts) + INTERVAL 1 HOUR
                  > (SELECT w FROM apw_wm1)
        )
        SELECT 'apw:' || event_type AS grp,
               date_trunc('hour', ts) AS wstart,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM apw_surv
        GROUP BY grp, wstart
        HAVING date_trunc('hour', min(ts)) + INTERVAL 1 HOUR
               <= (SELECT w FROM apw_wm2)
        UNION ALL
        SELECT 'tum:' || event_type AS grp,
               date_trunc('hour', ts) AS wstart,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY grp, wstart
        UNION ALL
        -- stream-stream interval join (attribution): purchases join
        -- prior views of the same user within 1 hour, inclusive ends
        SELECT 'ssj:' || p.user_id AS grp,
               date_trunc('hour', p.ts) AS wstart,
               count(*) AS n, round(sum(v.value), 2) AS sum_value
        FROM events p JOIN events v
          ON p.user_id = v.user_id
         AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase' AND v.event_type = 'view'
          AND p.user_id < 20
        GROUP BY 1, 2
        UNION ALL
        SELECT 'sli:' || event_type AS grp, wstart,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM (
            SELECT event_type, value,
                   unnest([base, base - INTERVAL 30 MINUTE]) AS wstart
            FROM (SELECT event_type, value,
                         date_trunc('hour', ts)
                         + CASE WHEN minute(ts) >= 30
                                THEN INTERVAL 30 MINUTE
                                ELSE INTERVAL 0 MINUTE END AS base
                  FROM events)
        ) GROUP BY grp, wstart
        UNION ALL
        -- aps: append-mode SESSION windows (pipeline.
        -- _append_session_run): rank-derived rows (uid = r%4,
        -- minute m = 10r + 60*(r//8)), batch 2 = {6, 33, r>=36};
        -- a b2 row is dropped iff m + gap(45) <= batch-1 watermark
        -- (max b1 m - 30); sessions = islands with merge rule
        -- (ts - prev < 45 min); emitted iff last ts + 45 <= final
        -- watermark (max m - 30). Epoch-minute keys: tz-free.
        SELECT * FROM (
            WITH aps_rows AS (
                SELECT row_number() OVER (ORDER BY event_id) - 1 AS r,
                       value
                FROM (SELECT event_id, value FROM events
                      ORDER BY event_id LIMIT 48)
            ), aps_m AS (
                SELECT r % 4 AS uid, 10 * r + 60 * (r // 8) AS m,
                       value,
                       (r = 6 OR r = 33 OR r >= 36) AS b2
                FROM aps_rows
            ), aps_wm1 AS (
                SELECT max(m) - 30 AS w FROM aps_m WHERE NOT b2
            ), aps_surv AS (
                SELECT * FROM aps_m
                WHERE NOT b2 OR m + 45 > (SELECT w FROM aps_wm1)
            ), aps_wmf AS (
                SELECT max(m) - 30 AS w FROM aps_surv
            ), aps_sess AS (
                SELECT uid, m, value,
                       sum(ns) OVER (PARTITION BY uid ORDER BY m
                                     ROWS UNBOUNDED PRECEDING) AS sid
                FROM (
                    SELECT uid, m, value,
                           CASE WHEN prev IS NULL OR m - prev >= 45
                                THEN 1 ELSE 0 END AS ns
                    FROM (SELECT uid, m, value,
                                 lag(m) OVER (PARTITION BY uid
                                              ORDER BY m) AS prev
                          FROM aps_surv)
                )
            )
            SELECT 'aps:' || uid || ':' || min(m) AS grp,
                   CAST(NULL AS TIMESTAMP) AS wstart,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM aps_sess
            GROUP BY uid, sid
            HAVING max(m) + 45 <= (SELECT w FROM aps_wmf)
        )
        UNION ALL
        SELECT 'ses:' || user_id AS grp, min(ts) AS wstart,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM (
            SELECT user_id, ts, value,
                   sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
            FROM (
                SELECT user_id, ts, value,
                       CASE WHEN prev IS NULL
                                 OR ts - prev >= INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS ns
                FROM (SELECT user_id, ts, value,
                             lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts) AS prev
                      FROM events WHERE user_id < 10)
            )
        ) GROUP BY user_id, sid
    """,
    # final per-key stateful totals (single-batch bounded source =
    # batch group-by), distinct dedup keys, broadcast-join rollup
    "op_stream_stateful": """
        SELECT 'tot:' || user_id AS grp, count(*) AS n,
               round(sum(value), 2) AS v
        FROM events WHERE user_id < 100 GROUP BY user_id
        UNION ALL
        SELECT DISTINCT 'ddp:' || user_id || ':' || event_type AS grp,
               CAST(1 AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS v
        FROM events WHERE user_id < 200
        UNION ALL
        SELECT 'seg:' || c_mktsegment AS grp, count(*) AS n,
               round(sum(value), 2) AS v
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
        UNION ALL
        -- space-saving heavy hitters, exact regime (capacity 16 >= 5
        -- distinct event types => no eviction, counts exact, err 0)
        SELECT 'hh:' || (user_id % 4) || ':' || event_type AS grp,
               count(*) AS n, 0.0 AS v
        FROM events GROUP BY 1
        UNION ALL
        -- P2 quantile, exact regime (dense event_ids < 500 mod 100 =>
        -- exactly 5 obs/group; estimate = exact median = marker 2)
        SELECT 'pq:' || (event_id % 100) AS grp, count(*) AS n,
               round(quantile_cont(value, 0.5), 4) AS v
        FROM events WHERE event_id < 500 GROUP BY 1
    """,
    "op_multimodal": """
        SELECT doc_id AS id,
               list_extract(['image', 'audio', 'video'],
                            CAST(doc_id % 3 + 1 AS INT)) AS modality,
               CAST(floor((doc_id % 90) / 30) + 1 AS BIGINT) AS n_frames,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(32 AS BIGINT) AS feat_dim,
               '64x64' AS resize
        FROM documents WHERE doc_id < 200
        UNION ALL
        -- real-PNG decode stratum: the fixture's pixel grid restated
        -- with range() arithmetic; feature slots are float32 on the
        -- engine side, so the oracle round-trips through REAL before
        -- the 4-dp floor (identical IEEE rounding both engines)
        SELECT * FROM (
            WITH px AS (
                SELECT CAST((x * 29 + y * 31) % 256 AS DOUBLE) AS r,
                       CAST((x * 17 + y * 5 + 100) % 256 AS DOUBLE) AS g,
                       CAST((x * 3 + y * 23 + 200) % 256 AS DOUBLE) AS b
                FROM range(9) t1(x), range(7) t2(y)
            ), st AS (
                SELECT avg(r) AS mr, avg(g) AS mg, avg(b) AS mb,
                       stddev_pop(0.299 * r + 0.587 * g + 0.114 * b)
                           AS gs
                FROM px
            ), vals AS (
                SELECT 0 AS pos, 9.0 AS val
                UNION ALL SELECT 1, 7.0
                UNION ALL SELECT 2, 3.0
                UNION ALL SELECT 3, mr FROM st
                UNION ALL SELECT 4, mg FROM st
                UNION ALL SELECT 5, mb FROM st
                UNION ALL SELECT 6, gs FROM st
            )
            SELECT CAST(1000000 + pos AS BIGINT) AS id,
                   'png' AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(63 AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM vals
        )
        UNION ALL
        -- PGM/PBM decode strata: the same restatement for the
        -- grayscale grid (13x+7y mod 256) and the (x+y)-parity
        -- checkerboard (bit 1 = black -> gray 0)
        SELECT * FROM (
            WITH gpx AS (
                SELECT CAST((x * 13 + y * 7) % 256 AS DOUBLE) AS v
                FROM range(9) t1(x), range(7) t2(y)
            ), gst AS (
                SELECT avg(v) AS m, stddev_pop(v) AS s FROM gpx
            ), bpx AS (
                SELECT CAST(255 * (1 - (x + y) % 2) AS DOUBLE) AS v
                FROM range(9) t1(x), range(7) t2(y)
            ), bst AS (
                SELECT avg(v) AS m, stddev_pop(v) AS s FROM bpx
            ), pvals AS (
                SELECT 10 AS fid, 'pgm' AS md, 0 AS pos, 9.0 AS val
                UNION ALL SELECT 10, 'pgm', 1, 7.0
                UNION ALL SELECT 10, 'pgm', 2, 1.0
                UNION ALL SELECT 10, 'pgm', 3, m FROM gst
                UNION ALL SELECT 10, 'pgm', 4, m FROM gst
                UNION ALL SELECT 10, 'pgm', 5, m FROM gst
                UNION ALL SELECT 10, 'pgm', 6, s FROM gst
                UNION ALL SELECT 20, 'pbm', 0, 9.0
                UNION ALL SELECT 20, 'pbm', 1, 7.0
                UNION ALL SELECT 20, 'pbm', 2, 1.0
                UNION ALL SELECT 20, 'pbm', 3, m FROM bst
                UNION ALL SELECT 20, 'pbm', 4, m FROM bst
                UNION ALL SELECT 20, 'pbm', 5, m FROM bst
                UNION ALL SELECT 20, 'pbm', 6, s FROM bst
            )
            SELECT CAST(1000000 + fid * 100 + pos AS BIGINT) AS id,
                   md AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(63 AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM pvals
        )
        UNION ALL
        -- baseline-JPEG gray stratum: the fixture's DC + (4,0)/(0,4)/
        -- (4,4) coefficients (all multiples of 8) have the exact
        -- closed-form IDCT pixel = 128 + (dc + s(x)f40 + s(y)f04 +
        -- s(x)s(y)f44)/8 with sign pattern s = [+,-,-,+,+,-,-,+] —
        -- no cos() needed, integer-exact on both engines
        SELECT * FROM (
            WITH jsgn AS (
                SELECT i, CAST(1 - 2 * (((i + 1) // 2) % 2) AS DOUBLE)
                           AS s
                FROM range(8) t(i)
            ), jgp AS (
                SELECT * FROM (VALUES (0, 80, 24, 16, 8),
                                      (1, -160, -32, 40, 16),
                                      (2, 320, 48, -24, -16),
                                      (3, -40, 8, 56, 24))
                    AS t(bi, dc, f40, f04, f44)
            ), jgpx AS (
                SELECT least(255.0, greatest(0.0,
                           128 + (dc + sx.s * f40 + sy.s * f04
                                  + sx.s * sy.s * f44) / 8.0)) AS v
                FROM range(16) t1(gx), range(16) t2(gy)
                JOIN jgp ON jgp.bi = (gx // 8) * 2 + (gy // 8)
                JOIN jsgn sx ON sx.i = gx % 8
                JOIN jsgn sy ON sy.i = gy % 8
            ), jgst AS (
                SELECT avg(v) AS m, stddev_pop(v) AS sd FROM jgpx
            ), jvals AS (
                SELECT 0 AS pos, 16.0 AS val
                UNION ALL SELECT 1, 16.0
                UNION ALL SELECT 2, 1.0
                UNION ALL SELECT 3, m FROM jgst
                UNION ALL SELECT 4, m FROM jgst
                UNION ALL SELECT 5, m FROM jgst
                UNION ALL SELECT 6, sd FROM jgst
            )
            SELECT CAST(1003000 + pos AS BIGINT) AS id,
                   'jpg' AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(256 AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM jvals
        )
        UNION ALL
        -- progressive-JPEG gray stratum (r14, SOF2 successive
        -- approximation + spectral selection, six scans): quant=8 at
        -- the coded zigzag positions folds the dequantized IDCT to
        -- pixel = 128 + dc + s·f terms with the RAW (odd)
        -- coefficients — same sign-pattern closed form, no /8
        SELECT * FROM (
            WITH pjsgn AS (
                SELECT i, CAST(1 - 2 * (((i + 1) // 2) % 2) AS DOUBLE)
                           AS s
                FROM range(8) t(i)
            ), pjp AS (
                SELECT * FROM (VALUES (0, 13, 5, -7, 3),
                                      (1, -9, 6, 4, 0),
                                      (2, 21, -3, 5, -5),
                                      (3, 7, 2, 1, 1))
                    AS t(bi, dc, f40, f04, f44)
            ), pjpx AS (
                SELECT least(255.0, greatest(0.0,
                           128 + dc + sx.s * f40 + sy.s * f04
                           + sx.s * sy.s * f44)) AS v
                FROM range(16) t1(gx), range(16) t2(gy)
                JOIN pjp ON pjp.bi = (gx // 8) * 2 + (gy // 8)
                JOIN pjsgn sx ON sx.i = gx % 8
                JOIN pjsgn sy ON sy.i = gy % 8
            ), pjst AS (
                SELECT avg(v) AS m, stddev_pop(v) AS sd FROM pjpx
            ), pjvals AS (
                SELECT 0 AS pos, 16.0 AS val
                UNION ALL SELECT 1, 16.0
                UNION ALL SELECT 2, 1.0
                UNION ALL SELECT 3, m FROM pjst
                UNION ALL SELECT 4, m FROM pjst
                UNION ALL SELECT 5, m FROM pjst
                UNION ALL SELECT 6, sd FROM pjst
            )
            SELECT CAST(1010000 + pos AS BIGINT) AS id,
                   'pjpg' AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(291 AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM pjvals
        )
        UNION ALL
        -- baseline-JPEG 4:2:0 color stratum (32x16, DRI=1): Y from
        -- the 8 DC-only blocks, Cb with a (4,0) AC in MCU 0 on the
        -- SUBSAMPLED plane (row gx//2, col gy//2, replication
        -- upsample), Cr DC-only per MCU; RGB via the pinned JFIF
        -- floor(x+0.5) rule — expression shapes match the engine's
        -- numpy ops term for term, so the doubles agree bitwise
        SELECT * FROM (
            WITH csgn AS (
                SELECT i, CAST(1 - 2 * (((i + 1) // 2) % 2) AS DOUBLE)
                           AS s
                FROM range(8) t(i)
            ), cydc AS (
                SELECT * FROM (VALUES (0, 80.0), (1, 160.0), (2, -80.0),
                                      (3, 240.0), (4, 40.0), (5, -200.0),
                                      (6, 320.0), (7, 120.0)) AS t(bi, dc)
            ), ccb AS (
                SELECT * FROM (VALUES (0, 96.0, 32.0), (1, -64.0, 0.0))
                    AS t(m, dc, ac)
            ), ccr AS (
                SELECT * FROM (VALUES (0, -128.0), (1, 192.0)) AS t(m, dc)
            ), cpx AS (
                SELECT 128 + cydc.dc / 8.0 AS yv,
                       (ccb.dc + sx.s * ccb.ac) / 8.0 AS cbd,
                       ccr.dc / 8.0 AS crd
                FROM range(16) t1(gx), range(32) t2(gy)
                JOIN cydc ON cydc.bi = (gy // 16) * 4 + (gx // 8) * 2
                                       + ((gy % 16) // 8)
                JOIN csgn sx ON sx.i = gx // 2
                JOIN ccb ON ccb.m = (gy // 2) // 8
                JOIN ccr ON ccr.m = (gy // 2) // 8
            ), crgb AS (
                SELECT least(255.0, greatest(0.0,
                           floor(yv + 1.402 * crd + 0.5))) AS r,
                       least(255.0, greatest(0.0,
                           floor(yv - 0.344136 * cbd
                                 - 0.714136 * crd + 0.5))) AS g,
                       least(255.0, greatest(0.0,
                           floor(yv + 1.772 * cbd + 0.5))) AS b
                FROM cpx
            ), cst AS (
                SELECT avg(r) AS mr, avg(g) AS mg, avg(b) AS mb,
                       stddev_pop(0.299 * r + 0.587 * g + 0.114 * b)
                           AS gs
                FROM crgb
            ), cvals AS (
                SELECT 0 AS pos, 32.0 AS val
                UNION ALL SELECT 1, 16.0
                UNION ALL SELECT 2, 3.0
                UNION ALL SELECT 3, mr FROM cst
                UNION ALL SELECT 4, mg FROM cst
                UNION ALL SELECT 5, mb FROM cst
                UNION ALL SELECT 6, gs FROM cst
            )
            SELECT CAST(1004000 + pos AS BIGINT) AS id,
                   'jpgc' AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(512 AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM cvals
        )
        UNION ALL
        -- G.711 strata: µ-law mono fixture cycles the table anchors
        -- [0x00,0xFF,0x80] (linear -32124/0/+32124), so rms =
        -- sqrt(200·(32124/32768)²/300), peak = 32124/32768, and zcr
        -- over 299 signbit diffs of the 1,0,0 pattern = 199/299;
        -- A-law stereo fixture is constant 0x55 (linear -8):
        -- rms = peak = 8/32768, zcr 0. Exact arithmetic restated
        -- through the same float32 + 4dp-floor roundtrip.
        SELECT * FROM (
            WITH gvals AS (
                SELECT 50 AS fid, 'mu' AS md, 300 AS nb, 0 AS pos,
                       8000.0 AS val
                UNION ALL SELECT 50, 'mu', 300, 1, 1.0
                UNION ALL SELECT 50, 'mu', 300, 2, 300.0 / 8000
                UNION ALL SELECT 50, 'mu', 300, 3,
                    sqrt((200 * (32124.0/32768.0) * (32124.0/32768.0))
                         / 300)
                UNION ALL SELECT 50, 'mu', 300, 4, 32124.0/32768.0
                UNION ALL SELECT 50, 'mu', 300, 5, 199.0/299
                UNION ALL SELECT 60, 'al', 3200, 0, 16000.0
                UNION ALL SELECT 60, 'al', 3200, 1, 2.0
                UNION ALL SELECT 60, 'al', 3200, 2, 1600.0 / 16000
                UNION ALL SELECT 60, 'al', 3200, 3, 8.0/32768.0
                UNION ALL SELECT 60, 'al', 3200, 4, 8.0/32768.0
                UNION ALL SELECT 60, 'al', 3200, 5, 0.0
            )
            SELECT CAST(1000000 + fid * 100 + pos AS BIGINT) AS id,
                   md AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(nb AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM gvals
        )
        UNION ALL
        -- MJPEG-AVI stratum: 7 DC-only 16x8 gray frames (constant
        -- pixel 128 + dc/8), sampler reads frames 0/3/6 -> channel
        -- means (138+123+158)/3, gray std 0, n_frames 7, fps 12.5
        SELECT * FROM (
            WITH avals AS (
                SELECT 0 AS pos, 16.0 AS val
                UNION ALL SELECT 1, 8.0
                UNION ALL SELECT 2, 1.0
                UNION ALL SELECT 3, (138.0 + 123.0 + 158.0) / 3
                UNION ALL SELECT 4, (138.0 + 123.0 + 158.0) / 3
                UNION ALL SELECT 5, (138.0 + 123.0 + 158.0) / 3
                UNION ALL SELECT 6, 0.0
                UNION ALL SELECT 7, 7.0
                UNION ALL SELECT 8, 12.5
            )
            SELECT CAST(1007000 + pos AS BIGINT) AS id,
                   'avi' AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(7 AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM avals
        )
        UNION ALL
        -- GIF stratum: 9x7 grid of palette index (3x+5y)%4 mapped
        -- through the 4-color table, restated with range()
        -- arithmetic (float32 + 4dp-floor roundtrip as everywhere)
        SELECT * FROM (
            WITH gpal AS (
                SELECT * FROM (VALUES (0, 250.0, 10.0, 30.0),
                                      (1, 10.0, 250.0, 60.0),
                                      (2, 20.0, 40.0, 250.0),
                                      (3, 200.0, 200.0, 0.0))
                    AS t(ci, r, g, b)
            ), gifpx AS (
                SELECT p.r, p.g, p.b
                FROM range(9) t1(x), range(7) t2(y)
                JOIN gpal p ON p.ci = (x * 3 + y * 5) % 4
            ), gifst AS (
                SELECT avg(r) AS mr, avg(g) AS mg, avg(b) AS mb,
                       stddev_pop(0.299 * r + 0.587 * g + 0.114 * b)
                           AS gs
                FROM gifpx
            ), gifv AS (
                SELECT 0 AS pos, 9.0 AS val
                UNION ALL SELECT 1, 7.0
                UNION ALL SELECT 2, 3.0
                UNION ALL SELECT 3, mr FROM gifst
                UNION ALL SELECT 4, mg FROM gifst
                UNION ALL SELECT 5, mb FROM gifst
                UNION ALL SELECT 6, gs FROM gifst
            )
            SELECT CAST(1008000 + pos AS BIGINT) AS id,
                   'gif' AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(63 AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM gifv
        )
        UNION ALL
        -- TIFF stratum: the decoder recovers the SAME channel grid
        -- as the PNG fixture — identical restatement, tif ids
        SELECT * FROM (
            WITH tpx AS (
                SELECT CAST((x * 29 + y * 31) % 256 AS DOUBLE) AS r,
                       CAST((x * 17 + y * 5 + 100) % 256 AS DOUBLE)
                           AS g,
                       CAST((x * 3 + y * 23 + 200) % 256 AS DOUBLE)
                           AS b
                FROM range(9) t1(x), range(7) t2(y)
            ), tst AS (
                SELECT avg(r) AS mr, avg(g) AS mg, avg(b) AS mb,
                       stddev_pop(0.299 * r + 0.587 * g + 0.114 * b)
                           AS gs
                FROM tpx
            ), tvals AS (
                SELECT 0 AS pos, 9.0 AS val
                UNION ALL SELECT 1, 7.0
                UNION ALL SELECT 2, 3.0
                UNION ALL SELECT 3, mr FROM tst
                UNION ALL SELECT 4, mg FROM tst
                UNION ALL SELECT 5, mb FROM tst
                UNION ALL SELECT 6, gs FROM tst
            )
            SELECT CAST(1009000 + pos AS BIGINT) AS id,
                   'tif' AS modality,
                   CAST(pos AS BIGINT) AS n_frames,
                   CAST(63 AS BIGINT) AS n_bytes,
                   CAST(floor(CAST(CAST(val AS REAL) AS DOUBLE) * 1e4
                              * (1 + 1e-12) + 0.5) AS BIGINT)
                       AS feat_dim,
                   CAST(NULL AS VARCHAR) AS resize
            FROM tvals
        )
    """,
    "op_tensor": """
        WITH mm AS (
            SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
                   CAST(max(l_extendedprice) AS DOUBLE) AS hi,
                   (CAST(max(l_extendedprice) AS DOUBLE)
                    - CAST(min(l_extendedprice) AS DOUBLE)) / 10 AS w
            FROM lineitem
        ), buckets AS (
            SELECT least(floor((CAST(l_extendedprice AS DOUBLE) - lo) / w),
                         9) AS b
            FROM lineitem, mm
        ), hist AS (
            SELECT b, count(*) AS n FROM buckets GROUP BY b
        ), q AS (
            SELECT quantile_cont(CAST(l_quantity AS DOUBLE),
                                 [0.25, 0.5, 0.75]) AS v
            FROM lineitem
        ), gram AS (
            SELECT r1.i AS i, r2.j AS j,
                   sum(CAST(list_extract(embedding, CAST(r1.i + 1 AS INT))
                            AS DOUBLE)
                       * CAST(list_extract(embedding, CAST(r2.j + 1 AS INT))
                              AS DOUBLE)) AS v
            FROM embeddings, range(4) r1(i), range(4) r2(j)
            GROUP BY 1, 2
        ), gp AS (
            -- the leading 4x4 of the Cholesky factor depends only on
            -- the leading 4x4 of the Gramian; unroll the
            -- factorization column by column (chained CTEs)
            SELECT max(CASE WHEN i=0 AND j=0 THEN v END) AS g00,
                   max(CASE WHEN i=1 AND j=0 THEN v END) AS g10,
                   max(CASE WHEN i=1 AND j=1 THEN v END) AS g11,
                   max(CASE WHEN i=2 AND j=0 THEN v END) AS g20,
                   max(CASE WHEN i=2 AND j=1 THEN v END) AS g21,
                   max(CASE WHEN i=2 AND j=2 THEN v END) AS g22,
                   max(CASE WHEN i=3 AND j=0 THEN v END) AS g30,
                   max(CASE WHEN i=3 AND j=1 THEN v END) AS g31,
                   max(CASE WHEN i=3 AND j=2 THEN v END) AS g32,
                   max(CASE WHEN i=3 AND j=3 THEN v END) AS g33
            FROM gram
        ), c1 AS (
            SELECT *, sqrt(g00) AS l00 FROM gp
        ), c2 AS (
            SELECT *, g10/l00 AS l10, g20/l00 AS l20, g30/l00 AS l30
            FROM c1
        ), c3 AS (
            SELECT *, sqrt(g11 - l10*l10) AS l11 FROM c2
        ), c4 AS (
            SELECT *, (g21 - l20*l10)/l11 AS l21,
                      (g31 - l30*l10)/l11 AS l31 FROM c3
        ), c5 AS (
            SELECT *, sqrt(g22 - l20*l20 - l21*l21) AS l22 FROM c4
        ), c6 AS (
            SELECT *, (g32 - l30*l20 - l31*l21)/l22 AS l32 FROM c5
        ), chol AS (
            SELECT *, sqrt(g33 - l30*l30 - l31*l31 - l32*l32) AS l33
            FROM c6
        ), mmv AS (
            -- column sums of V . B, B[i][j] = ((i*4+j) % 7 - 3)/3
            SELECT r2.j AS j,
                   sum(list_sum(list_transform(range(0, 64),
                       i -> CAST(list_extract(embedding,
                                CAST(i + 1 AS INT)) AS DOUBLE)
                            * (((i * 4 + r2.j) % 7 - 3) / 3.0)))) AS s
            FROM embeddings, range(4) r2(j)
            GROUP BY 1
        ), st AS (
            -- r14 statistics facade: weighted average (exact BIGINT
            -- sums, one deterministic division), ptp, the two
            -- bincount functionals, digitize bucket-index sum
            SELECT (SELECT CAST(sum(CAST(l_quantity AS BIGINT)
                                   * CAST(l_linenumber AS BIGINT))
                               AS DOUBLE)
                          / CAST(sum(CAST(l_linenumber AS BIGINT))
                                 AS DOUBLE)
                    FROM lineitem) AS avgw,
                   (SELECT CAST(max(l_extendedprice) AS DOUBLE)
                         - CAST(min(l_extendedprice) AS DOUBLE)
                    FROM lineitem) AS ptp,
                   (SELECT sum((CAST(l_linenumber AS BIGINT) + 3)
                               * (CAST(l_linenumber AS BIGINT) + 3))
                    FROM lineitem) AS binc,
                   (SELECT max(CAST(l_linenumber AS BIGINT)) + 1
                    FROM lineitem) AS bincn,
                   (SELECT sum(CASE WHEN CAST(l_extendedprice AS
                                             DOUBLE) >= 20000 THEN 1
                                    ELSE 0 END
                             + CASE WHEN CAST(l_extendedprice AS
                                             DOUBLE) >= 40000 THEN 1
                                    ELSE 0 END
                             + CASE WHEN CAST(l_extendedprice AS
                                             DOUBLE) >= 60000 THEN 1
                                    ELSE 0 END)
                    FROM lineitem) AS dig
        ), spd AS (
            -- cityblock pdist over the vec_id<40 slice: per-dim
            -- |a−b| in double, folded in dimension order
            SELECT sum(list_sum(list_transform(range(0, 64),
                       t -> abs(CAST(list_extract(a.embedding,
                                  CAST(t + 1 AS INT)) AS DOUBLE)
                              - CAST(list_extract(b.embedding,
                                  CAST(t + 1 AS INT)) AS DOUBLE)))))
                       AS s,
                   count(*) AS n
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < b.vec_id
            WHERE a.vec_id < 40 AND b.vec_id < 40
        ), nrm AS (
            -- r14 linalg completion: Frobenius / max-row-abs-sum of
            -- the embedding matrix, exact integer vector norms of
            -- l_quantity (sqrt of an exact BIGINT sum is an IEEE
            -- correctly-rounded double in both engines)
            SELECT (SELECT sqrt(sum(list_sum(list_transform(embedding,
                        e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))))
                    FROM embeddings) AS fro,
                   (SELECT max(list_sum(list_transform(embedding,
                        e -> abs(CAST(e AS DOUBLE)))))
                    FROM embeddings) AS minf,
                   (SELECT max(s) FROM (
                        SELECT sum(abs(CAST(list_extract(embedding,
                                   CAST(r.j + 1 AS INT)) AS DOUBLE)))
                                   AS s
                        FROM embeddings, range(64) r(j)
                        GROUP BY r.j)) AS m1,
                   (SELECT sqrt(CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE))
                    FROM lineitem) AS q2,
                   (SELECT sum(CAST(l_quantity AS BIGINT))
                    FROM lineitem) AS q1,
                   (SELECT max(CAST(l_quantity AS BIGINT))
                    FROM lineitem) AS qinf
        ), tdv AS (
            -- tensordot vector-rhs dot checksum, c[i] = i%5 - 2
            SELECT sum(list_sum(list_transform(range(0, 64),
                       i -> CAST(list_extract(embedding,
                                CAST(i + 1 AS INT)) AS DOUBLE)
                            * CAST(i % 5 - 2 AS DOUBLE)))) AS s
            FROM embeddings
        ), xty AS (
            -- row-axis column x column contraction: (V.B)t(V.B)
            -- leading 2x2 — per-row closed form, no 64x64 gramian
            SELECT r1.i AS i, r2.j AS j,
                   sum(list_sum(list_transform(range(0, 64),
                       t -> CAST(list_extract(embedding,
                                CAST(t + 1 AS INT)) AS DOUBLE)
                            * (((t * 4 + r1.i) % 7 - 3) / 3.0)))
                     * list_sum(list_transform(range(0, 64),
                       t -> CAST(list_extract(embedding,
                                CAST(t + 1 AS INT)) AS DOUBLE)
                            * (((t * 4 + r2.j) % 7 - 3) / 3.0)))) AS v
            FROM embeddings, range(2) r1(i), range(2) r2(j)
            GROUP BY 1, 2
        ), slvd AS (
            -- exact-integer 2x2 normal equations over the 1/199
            -- orderkey slice: Cramér det/numerators, adjugate, and
            -- the partial-pivot LU's re-integerized entries
            SELECT g00, g01, g11, b0, b1,
                   g00 * g11 - g01 * g01 AS det,
                   b0 * g11 - b1 * g01 AS x0n,
                   b1 * g00 - b0 * g01 AS x1n,
                   CASE WHEN abs(g01) > abs(g00) THEN 1 ELSE 0
                        END AS lup,
                   CASE WHEN abs(g01) > abs(g00) THEN g00 ELSE g01
                        END AS lul10,
                   CASE WHEN abs(g01) > abs(g00)
                        THEN -(g00 * g11 - g01 * g01)
                        ELSE g00 * g11 - g01 * g01 END AS luu11
            FROM (
                SELECT sum(q * q) AS g00, sum(q * ln) AS g01,
                       sum(ln * ln) AS g11, sum(q * b) AS b0,
                       sum(ln * b) AS b1
                FROM (
                    SELECT CAST(l_quantity AS BIGINT) % 7 + 1 AS q,
                           CAST(l_linenumber AS BIGINT) AS ln,
                           CAST(l_partkey AS BIGINT) % 23 AS b
                    FROM lineitem
                    WHERE CAST(l_orderkey AS BIGINT) % 199 = 0))
        )
        SELECT 'hist:' || x.i AS grp,
               floor((x.lo + CAST(x.i AS DOUBLE) * x.w) * 1e6 + 0.5) / 1e6 AS v1,
               floor((x.lo + CAST(x.i + 1 AS DOUBLE) * x.w) * 1e6 + 0.5) / 1e6 AS v2,
               CAST(coalesce(hist.n, 0) AS BIGINT) AS n
        FROM (SELECT r.i AS i, mm.lo AS lo, mm.w AS w
              FROM range(10) r(i), mm) x
        LEFT JOIN hist ON hist.b = x.i
        UNION ALL
        SELECT 'pct:' || (r.i - 1) AS grp,
               floor(list_extract(q.v, CAST(r.i AS INT)) * 1e6 + 0.5) / 1e6
                   AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS BIGINT) AS n
        FROM range(1, 4) r(i), q
        UNION ALL
        SELECT 'gram:' || i || ':' || j AS grp,
               floor(v * 1e4 + 0.5) / 1e4 AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS BIGINT) AS n
        FROM gram
        UNION ALL
        -- R = L^T upper triangle (Cholesky-QR leading corner)
        SELECT 'r:' || t.i || ':' || t.j AS grp,
               floor(t.v * 1e4 + 0.5) / 1e4 AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS BIGINT) AS n
        FROM chol, LATERAL (VALUES
            (0, 0, l00), (0, 1, l10), (0, 2, l20), (0, 3, l30),
            (1, 1, l11), (1, 2, l21), (1, 3, l31),
            (2, 2, l22), (2, 3, l32), (3, 3, l33)) t(i, j, v)
        UNION ALL
        SELECT 'mm:' || j AS grp,
               floor(s * 1e4 + 0.5) / 1e4 AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS BIGINT) AS n
        FROM mmv
        UNION ALL
        -- orthonormality contract: Q^T.Q is the identity in exact
        -- arithmetic; Cholesky-QR satisfies it to ~cond(A)^2*eps,
        -- far inside the 1e-4 rounding
        SELECT 'qtq:' || r1.i || ':' || r2.j AS grp,
               CASE WHEN r1.i = r2.j THEN 1.0 ELSE 0.0 END AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS BIGINT) AS n
        FROM range(4) r1(i), range(4) r2(j)
        UNION ALL
        SELECT 'st:' || t.k AS grp, t.v AS v1,
               CAST(NULL AS DOUBLE) AS v2, t.n AS n
        FROM st, LATERAL (VALUES
            ('avgw', floor(avgw * 1e6 + 0.5) / 1e6,
             CAST(NULL AS BIGINT)),
            ('ptp', floor(ptp * 1e4 + 0.5) / 1e4,
             CAST(NULL AS BIGINT)),
            ('binc', CAST(NULL AS DOUBLE), binc),
            ('bincn', CAST(NULL AS DOUBLE), bincn),
            ('dig', CAST(NULL AS DOUBLE), dig)) t(k, v, n)
        UNION ALL
        SELECT 'sp:pd' AS grp, floor(s * 1e4 + 0.5) / 1e4 AS v1,
               CAST(NULL AS DOUBLE) AS v2, n AS n
        FROM spd
        UNION ALL
        -- distributed 4-step FFT of the period-7 ramp over
        -- N = 3584 = 7*2^9: DC = 512*21, Parseval power = 512*91,
        -- spikes |X[512m]| = 1792/sin(pi*m/7) (geometric-sum
        -- identity), zero off-spike — no DFT needed to state them
        SELECT 'fft:' || t.k AS grp, t.v AS v1,
               CAST(NULL AS DOUBLE) AS v2, t.n AS n
        FROM (VALUES
            ('dc', CAST(NULL AS DOUBLE), CAST(10752 AS BIGINT)),
            ('par', 46592.0, CAST(NULL AS BIGINT)),
            ('off', 0.0, CAST(NULL AS BIGINT)),
            ('s1', floor(1792.0 / sin(pi() * 1 / 7) * 1e4 + 0.5)
                   / 1e4, CAST(NULL AS BIGINT)),
            ('s2', floor(1792.0 / sin(pi() * 2 / 7) * 1e4 + 0.5)
                   / 1e4, CAST(NULL AS BIGINT)),
            ('s3', floor(1792.0 / sin(pi() * 3 / 7) * 1e4 + 0.5)
                   / 1e4, CAST(NULL AS BIGINT))) t(k, v, n)
        UNION ALL
        SELECT 'nrm:' || t.k AS grp, t.v AS v1,
               CAST(NULL AS DOUBLE) AS v2, t.n AS n
        FROM nrm, LATERAL (VALUES
            ('fro', floor(fro * 1e4 + 0.5) / 1e4, CAST(NULL AS BIGINT)),
            ('m1', floor(m1 * 1e4 + 0.5) / 1e4, CAST(NULL AS BIGINT)),
            ('minf', floor(minf * 1e4 + 0.5) / 1e4,
             CAST(NULL AS BIGINT)),
            ('q2', floor(q2 * 1e6 + 0.5) / 1e6, CAST(NULL AS BIGINT)),
            ('q1', CAST(NULL AS DOUBLE), q1),
            ('qinf', CAST(NULL AS DOUBLE), qinf)) t(k, v, n)
        UNION ALL
        SELECT 'tdot:v' AS grp, floor(s * 1e4 + 0.5) / 1e4 AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS BIGINT) AS n
        FROM tdv
        UNION ALL
        SELECT 'xty:' || i || ':' || j AS grp,
               floor(v * 1e4 + 0.5) / 1e4 AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS BIGINT) AS n
        FROM xty
        UNION ALL
        SELECT 'slv:' || t.k AS grp, CAST(NULL AS DOUBLE) AS v1,
               CAST(NULL AS DOUBLE) AS v2, t.n AS n
        FROM slvd, LATERAL (VALUES
            ('det', det), ('x0', x0n), ('x1', x1n)) t(k, n)
        UNION ALL
        SELECT 'inv:' || t.k AS grp, CAST(NULL AS DOUBLE) AS v1,
               CAST(NULL AS DOUBLE) AS v2, t.n AS n
        FROM slvd, LATERAL (VALUES
            ('00', g11), ('01', -g01), ('11', g00)) t(k, n)
        UNION ALL
        SELECT 'lu:' || t.k AS grp, CAST(NULL AS DOUBLE) AS v1,
               CAST(NULL AS DOUBLE) AS v2, t.n AS n
        FROM slvd, LATERAL (VALUES
            ('p', lup), ('l10', lul10), ('u11', luu11)) t(k, n)
        UNION ALL
        SELECT 'rsvd:ok' AS grp, 1.0 AS v1,
               CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS BIGINT) AS n
    """,
    "events_window_funcs": """
        SELECT event_id, user_id,
               round(sum(value) OVER w_run, 2) AS value_cumsum,
               round(value - lag(value) OVER w, 4) AS value_diff,
               round(lag(value) OVER w, 4) AS value_shift,
               round(avg(value) OVER w_roll, 4) AS roll_avg,
               -- r13 rolling parity fill-ins over a width-5 frame:
               -- DuckDB's windowed median/skewness/kurtosis are the
               -- interpolated / G1 / G2 sample forms pandas uses
               floor(median(value) OVER w_roll5 * 10000 + 0.5) / 10000
                   AS roll_med,
               floor(skewness(value) OVER w_roll5 * 10000 + 0.5) / 10000
                   AS roll_skew,
               floor(kurtosis(value) OVER w_roll5 * 10000 + 0.5) / 10000
                   AS roll_kurt,
               floor((value - lag(value) OVER w)
                     / nullif(lag(value) OVER w, 0) * 10000 + 0.5) / 10000
                   AS pct_change
        FROM events
        WINDOW
            w AS (PARTITION BY user_id ORDER BY ts, event_id),
            w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_roll AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
            w_roll5 AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    "events_sessions_activity": """
        -- tsfresh strata (learn/tsfeatures.py): one ordered window
        -- pass + per-user aggregate, formulas restated verbatim
        WITH ts0 AS (
            SELECT user_id, value AS x,
                   lag(value) OVER w AS xl,
                   lag(value, 2) OVER w AS xl2,
                   CAST(row_number() OVER w AS DOUBLE) - 1 AS t,
                   row_number() OVER w AS rn,
                   avg(value) OVER (PARTITION BY user_id) AS mu,
                   stddev_pop(value) OVER (PARTITION BY user_id) AS sg,
                   max(value) OVER (PARTITION BY user_id) AS mx
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), tsagg AS (
            SELECT user_id,
                   count(x) AS n,
                   count(xl) AS npairs,
                   sum(x * x) AS abs_energy,
                   avg(abs(x - xl)) AS mac,
                   sqrt(coalesce(sum((x - xl) * (x - xl)), 0)) AS cid,
                   var_pop(x) AS varp,
                   sum((x - mu) * (xl - mu)) AS accov,
                   count(x) * sum(t * x) - sum(t) * sum(x) AS slope_num,
                   count(x) * sum(t * t) - sum(t) * sum(t) AS slope_den,
                   sum(CASE WHEN x > mu THEN 1 ELSE 0 END) AS cam,
                   coalesce(sum(CASE WHEN (x > mu) <> (xl > mu)
                                     THEN 1 ELSE 0 END), 0) AS ncross,
                   avg(x * xl * xl2) AS c3,
                   avg(x * x * xl - xl * xl2 * xl2) AS tras,
                   min(CASE WHEN x = mx THEN t END) / count(x) AS flmax,
                   avg(CASE WHEN abs(x - mu) > sg
                            THEN 1.0 ELSE 0.0 END) AS rbs
            FROM ts0 GROUP BY user_id
        ), tsrun AS (
            -- gaps-and-islands: longest strike strictly above mean
            SELECT user_id, max(cnt) AS strike
            FROM (SELECT user_id, runkey, count(*) AS cnt
                  FROM (SELECT user_id,
                               rn - row_number() OVER (
                                   PARTITION BY user_id ORDER BY rn)
                                   AS runkey
                        FROM ts0 WHERE x > mu)
                  GROUP BY user_id, runkey)
            GROUP BY user_id
        ), rsub AS (
            -- roll_time_series replay (learn/tsfeatures.py): the
            -- user subset, per-user diff column for the in-window
            -- mean_abs_change pairs
            SELECT user_id, event_id, value,
                   value - lag(value) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS d
            FROM events WHERE user_id % 29 = 1
        ), rwin AS (
            -- every row is a window END over the last 4 observed
            -- points; the dw frame holds exactly the in-window
            -- adjacent-pair diffs (d of the window's first row
            -- falls outside and is lag-null / frame-excluded)
            SELECT user_id, event_id,
                   row_number() OVER w AS rn,
                   count(value) OVER fw AS wn,
                   sum(value) OVER fw AS wsum,
                   max(value) OVER fw AS wmax,
                   avg(abs(d)) OVER dw AS wmac
            FROM rsub
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
                   fw AS (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
                   dw AS (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ), rkeep AS (
            SELECT * FROM rwin WHERE rn >= 2
        ), istat AS (
            -- impute's column stats over the FINITE values of the
            -- corrupted column (t%7 in 0/1/2 are null/+inf/-inf)
            SELECT median(wsum) AS med, max(wsum) AS mx,
                   min(wsum) AS mn
            FROM rkeep WHERE event_id % 7 > 2
        )
        SELECT 'day' AS dim, strftime(date_trunc('day', ts), '%Y-%m-%d') AS key,
               count(*) AS n, CAST(count(DISTINCT user_id) AS DOUBLE) AS metric,
               CAST(NULL AS DOUBLE) AS metric2
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'type', event_type, count(*), round(avg(value), 4),
               round(stddev_samp(value), 4)
        FROM events GROUP BY 2
        UNION ALL
        (SELECT 'user', CAST(user_id AS VARCHAR), count(*),
                round(sum(value), 2), CAST(NULL AS DOUBLE)
         FROM events GROUP BY user_id
         ORDER BY round(sum(value), 2) DESC, user_id LIMIT 10)
        UNION ALL
        SELECT 'sess', CAST(user_id AS VARCHAR), count(*),
               CAST(sum(new_sess) AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM (
            SELECT user_id,
                   CASE WHEN prev IS NULL
                             OR floor(epoch(ts))::BIGINT - floor(epoch(prev))::BIGINT > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                  FROM events)
        ) GROUP BY user_id
        UNION ALL
        SELECT 'tsf:energy', CAST(user_id AS VARCHAR), n,
               floor(abs_energy * 1e4 * (1 + 1e-12) + 0.5) / 1e4,
               floor(mac * 1e4 * (1 + 1e-12) + 0.5) / 1e4
        FROM tsagg
        UNION ALL
        SELECT 'tsf:auto', CAST(user_id AS VARCHAR), n,
               floor(CASE WHEN npairs > 0 AND varp > 0
                          THEN accov / (npairs * varp) END
                     * 1e4 * (1 + 1e-12) + 0.5) / 1e4,
               floor(cid * 1e4 * (1 + 1e-12) + 0.5) / 1e4
        FROM tsagg
        UNION ALL
        SELECT 'tsf:trend', CAST(user_id AS VARCHAR), n,
               floor(CASE WHEN slope_den > 0
                          THEN slope_num / slope_den END
                     * 1e4 * (1 + 1e-12) + 0.5) / 1e4,
               CAST(cam AS DOUBLE)
        FROM tsagg
        UNION ALL
        SELECT 'tsf:cross', CAST(a.user_id AS VARCHAR), a.n,
               CAST(a.ncross AS DOUBLE),
               CAST(coalesce(r.strike, 0) AS DOUBLE)
        FROM tsagg a LEFT JOIN tsrun r USING (user_id)
        UNION ALL
        SELECT 'tsf:shape', CAST(user_id AS VARCHAR), n,
               floor(c3 * 1e4 * (1 + 1e-12) + 0.5) / 1e4,
               floor(tras * 1e4 * (1 + 1e-12) + 0.5) / 1e4
        FROM tsagg
        UNION ALL
        SELECT 'tsf:loc', CAST(user_id AS VARCHAR), n,
               floor(flmax * 1e4 * (1 + 1e-12) + 0.5) / 1e4,
               floor(rbs * 1e4 * (1 + 1e-12) + 0.5) / 1e4
        FROM tsagg
        UNION ALL
        SELECT 'tsfr:roll',
               CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR),
               wn,
               floor(wsum * 1e4 * (1 + 1e-12) + 0.5) / 1e4,
               floor(wmac * 1e4 * (1 + 1e-12) + 0.5) / 1e4
        FROM rkeep
        UNION ALL
        SELECT 'tsfr:imp',
               CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR),
               wn,
               floor((CASE WHEN event_id % 7 = 0 THEN istat.med
                           WHEN event_id % 7 = 1 THEN istat.mx
                           WHEN event_id % 7 = 2 THEN istat.mn
                           ELSE wsum END)
                     * 1e4 * (1 + 1e-12) + 0.5) / 1e4,
               floor(wmax * 1e4 * (1 + 1e-12) + 0.5) / 1e4
        FROM rkeep CROSS JOIN istat
    """,
    # ---------------------------------------------------------- documents
    "docs_text_metrics": f"""
        WITH t AS (
            SELECT lang,
                   CAST(length(text) AS DOUBLE) AS n,
                   CAST(array_length({_TOKS}) AS DOUBLE) AS n_tok,
                   length(text) AS n_char,
                   (CAST(length(text) AS DOUBLE)
                    - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS n_alpha,
                   ' ' || {_NORM} || ' ' AS padded
            FROM documents
        ), s AS (
            SELECT lang, n, n_tok, n_char,
                   n_alpha / greatest(n, 1.0) AS alpha,
                   n / greatest(n_tok, 1.0) AS mean_word,
                   ({" + ".join(_occ("padded", f" {w} ") for w in _STOP5)})
                       / greatest(n_tok, 1.0) AS stop_ratio,
                   {", ".join(f"({_lang_score(lang)}) AS s_{lang}" for lang in sorted(_LANG_MARKERS))}
            FROM t
        ), q AS (
            SELECT lang, n_tok, n_char,
                   0.3 * (CASE WHEN n < 20 THEN n / 20.0
                               WHEN n > 5000 THEN 0.5 ELSE 1.0 END)
                   + 0.3 * least(alpha * 1.5, 1.0)
                   + 0.2 * (CASE WHEN mean_word >= 3 AND mean_word <= 12
                                 THEN 1.0 ELSE 0.5 END)
                   + 0.2 * least(stop_ratio * 5.0, 1.0) AS quality,
                   greatest(s_de, s_en, s_es, s_fr) AS best,
                   s_de, s_en, s_es, s_fr
            FROM s
        )
        SELECT lang, {_langid_case()} AS pred_lang, count(*) AS n_docs,
               round(avg(n_tok), 2) AS avg_tokens,
               round(avg(n_char), 2) AS avg_chars,
               round(avg(round(quality, 4)), 4) AS avg_quality
        FROM q GROUP BY lang, pred_lang
        UNION ALL
        -- deterministic corpus mixture (llm/mixture.py): keep iff the
        -- first 6 md5 hex chars of 'seed:i|doc_id' are under the
        -- per-corpus fraction threshold (0.9/0.5/0.1 of 16^6)
        SELECT 'mix' AS lang, 'c' || (doc_id % 3) AS pred_lang,
               count(*) AS n_docs,
               round(avg(doc_id), 2) AS avg_tokens,
               round(avg(length(text)), 2) AS avg_chars,
               CAST(NULL AS DOUBLE) AS avg_quality
        FROM documents
        WHERE substr(md5('7:' || (doc_id % 3) || '|' || doc_id), 1, 6)
              < CASE doc_id % 3 WHEN 0 THEN 'e66666'
                                WHEN 1 THEN '800000'
                                ELSE '19999a' END
        GROUP BY doc_id % 3
        UNION ALL
        -- sequence packing (llm/packing.py): contiguous fill,
        -- pack = floor((cumsum(tokens) - tokens) / budget) per
        -- id-mod-8 stream ordered by doc_id, budget 2048
        SELECT 'pack' AS lang, 'b' || pb AS pred_lang,
               count(*) AS n_docs,
               round(avg(fill), 2) AS avg_tokens,
               CAST(max(fill) AS DOUBLE) AS avg_chars,
               CAST(NULL AS DOUBLE) AS avg_quality
        FROM (
            SELECT pb, pack_id, sum(n_tok) AS fill
            FROM (
                SELECT pb, n_tok,
                       floor((sum(n_tok) OVER (
                            PARTITION BY pb ORDER BY doc_id) - n_tok)
                             / 2048) AS pack_id
                FROM (SELECT doc_id, doc_id % 8 AS pb,
                             CAST(array_length({_TOKS}) AS BIGINT)
                                 AS n_tok
                      FROM documents)
            ) GROUP BY pb, pack_id
        ) GROUP BY pb
        UNION ALL
        SELECT grp AS lang, k AS pred_lang, n AS n_docs,
               v1 AS avg_tokens, v2 AS avg_chars,
               CAST(NULL AS DOUBLE) AS avg_quality
        FROM ({_HYGIENE_SQL}) hyg
        UNION ALL
        -- quality-classifier contract (expected constant — murmur
        -- hashing has no SQL replay; see docs_text_metrics' qc
        -- stratum: 60 holdout docs, accuracy exactly 1.0)
        SELECT 'qcls' AS lang, 'holdout' AS pred_lang,
               CAST(60 AS BIGINT) AS n_docs, 1.0 AS avg_tokens,
               CAST(NULL AS DOUBLE) AS avg_chars,
               CAST(NULL AS DOUBLE) AS avg_quality
        UNION ALL
        -- trained-langid contract (llm/langid.py NGramLangID): the
        -- predicted language index of every odd holdout doc equals
        -- its planted truth doc_id % 3 (three disjoint character
        -- substitutions -> huge NB margins; murmur hashing itself
        -- has no SQL replay)
        SELECT 'lid' AS lang, 'd' || CAST(i AS VARCHAR) AS pred_lang,
               CAST(i % 3 AS BIGINT) AS n_docs,
               CAST(NULL AS DOUBLE) AS avg_tokens,
               CAST(NULL AS DOUBLE) AS avg_chars,
               CAST(NULL AS DOUBLE) AS avg_quality
        FROM range(120) t(i) WHERE i % 2 = 1
    """,
    "docs_dedup_simhash": f"""
        WITH f AS (SELECT doc_id, source, md5({_NORM}) AS fp FROM documents),
             kk AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY fp),
             -- incremental dedup: odd-id batch vs even-id batch's store
             winners AS (
                SELECT doc_id FROM (
                    SELECT doc_id,
                           row_number() OVER (PARTITION BY fp
                                              ORDER BY doc_id) AS rn
                    FROM f
                    WHERE doc_id % 2 = 1
                      AND fp NOT IN (SELECT fp FROM f WHERE doc_id % 2 = 0)
                ) WHERE rn = 1
             )
        SELECT 'src:' || source AS grp,
               count(*) AS k,
               (SELECT count(DISTINCT fp) FROM f) AS v
        FROM f JOIN kk ON f.doc_id = kk.keep_id
        GROUP BY source
        UNION ALL
        SELECT 'doc:' || doc_id AS grp, {_simhash16()} AS k,
               CAST(NULL AS BIGINT) AS v
        FROM (
            SELECT doc_id,
                   [('0x' || substr(md5(t), 1, 8))::BIGINT
                    for t in list_distinct({_TOKS})] AS hashes
            FROM documents WHERE doc_id < 50
        )
        UNION ALL
        SELECT 'inc:' || doc_id AS grp, doc_id AS k,
               CAST(NULL AS BIGINT) AS v
        FROM winners WHERE doc_id < 400
        UNION ALL
        SELECT 'inc:total' AS grp, count(*) AS k,
               CAST(NULL AS BIGINT) AS v
        FROM winners
        UNION ALL
        -- streaming incremental dedup: the surviving-fp set of the
        -- odd (<200) stream batch after the store anti-join; the
        -- in-stream duplicate copies add no fps and the row total
        -- equals the fp count (within-watermark dedup contract)
        SELECT 'stream:' || fp AS grp, CAST(NULL AS BIGINT) AS k,
               CAST(NULL AS BIGINT) AS v
        FROM (SELECT DISTINCT fp FROM f
              WHERE doc_id % 2 = 1 AND doc_id < 200
                AND fp NOT IN (SELECT fp FROM f WHERE doc_id % 2 = 0))
        UNION ALL
        SELECT 'stream:total' AS grp, count(DISTINCT fp) AS k,
               CAST(NULL AS BIGINT) AS v
        FROM f
        WHERE doc_id % 2 = 1 AND doc_id < 200
          AND fp NOT IN (SELECT fp FROM f WHERE doc_id % 2 = 0)
        UNION ALL
        -- streaming NEAR-dup dedup (stream_minhash_dedup): a
        -- surviving odd (<200) doc's 4 band hashes must ALL miss
        -- the even store's SAME-index bands; survivors reported as
        -- their distinct full-signature md5s (which row of a
        -- same-signature pair survives is not contractual)
        SELECT * FROM (
            WITH sbase AS (
                SELECT doc_id, doc_id % 2 AS par, {_SHINGLES} AS sh
                FROM (SELECT doc_id, {_TOKS} AS l FROM documents
                      WHERE doc_id < 200)
            ), smh AS (
                SELECT doc_id, par,
                       {", ".join(f"{_minhash(i)} AS mh{i}"
                                  for i in range(8))}
                FROM sbase
            ), sbands AS (
                SELECT doc_id, par,
                       {", ".join(f"md5(mh{2*i} || '|' || mh{2*i+1}) AS b{i}"
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
        )
        UNION ALL
        -- DSIR importance weights (llm/dsir.py): hashed-bigram
        -- log-likelihood ratio vs the id%7 target slice, add-1
        -- smoothed over 1024 md5 buckets, top-10 by 4-dp weight
        SELECT * FROM (
            WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
            gr AS (
                SELECT doc_id,
                       unnest(CASE WHEN len(l) < 2
                                   THEN [array_to_string(l, ' ')]
                                   ELSE [array_to_string(l[i:i+1], ' ')
                                         for i in range(1, len(l))]
                              END) AS g
                FROM toks
            ), gb AS (
                SELECT doc_id,
                       ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS bk
                FROM gr
            ), tcnt AS (
                SELECT bk, count(*) AS tc FROM gb
                WHERE doc_id % 7 = 0 GROUP BY bk
            ), rcnt AS (
                SELECT bk, count(*) AS rc FROM gb GROUP BY bk
            ), lw AS (
                SELECT r0.bk,
                       ln((coalesce(tc, 0) + 1)
                          / ((SELECT sum(tc) FROM tcnt) + 1024.0))
                     - ln((rc + 1)
                          / ((SELECT sum(rc) FROM rcnt) + 1024.0)) AS w
                FROM rcnt r0 LEFT JOIN tcnt USING (bk)
            ), wsum AS (
                SELECT doc_id, sum(w) AS w FROM gb JOIN lw USING (bk)
                GROUP BY doc_id
            )
            SELECT 'dsir:' || doc_id AS grp, doc_id AS k,
                   CAST(floor(w * 10000 + 0.5) AS BIGINT) AS v
            FROM wsum
            ORDER BY floor(w * 10000 + 0.5) DESC, doc_id LIMIT 10
        )
        UNION ALL
        -- streaming SEMANTIC dedup (stream_semantic_dedup): odd
        -- embeddings vs the even-embedding IVF index — an arrival
        -- drops when its argmax cell (16 seeds = the 16 smallest
        -- even vec_ids' unit vectors, first-max tie = smallest seed
        -- rank) holds an even vector at unit-dot >= 0.4
        SELECT * FROM (
            WITH eu AS (
                SELECT vec_id, vec_id % 2 AS par,
                       list_transform(embedding::DOUBLE[],
                           x -> x / sqrt(list_dot_product(
                               embedding::DOUBLE[],
                               embedding::DOUBLE[]))) AS e
                FROM embeddings
            ), eseeds AS (
                -- seed count replays the Spark side's corpus-scaled
                -- sizing (pipeline.py n_cells3 = max(16, n_even//256))
                -- so the oracle stays correct at ANY sf, not just the
                -- gated sizes where the floor of 16 wins
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS sid,
                       e AS se
                FROM (SELECT vec_id, e FROM eu WHERE par = 0
                      ORDER BY vec_id
                      LIMIT greatest(16, (SELECT count(*) // 256
                                          FROM eu WHERE par = 0)))
            ), easg AS (
                SELECT vec_id, par, e, sid AS cluster FROM (
                    SELECT u.vec_id, u.par, u.e, s.sid,
                           row_number() OVER (
                               PARTITION BY u.vec_id
                               ORDER BY list_dot_product(u.e, s.se)
                                            DESC,
                                        s.sid ASC) AS rn
                    FROM eu u CROSS JOIN eseeds s
                ) WHERE rn = 1
            ), sdrop AS (
                SELECT DISTINCT o.vec_id
                FROM easg o JOIN easg c
                  ON o.cluster = c.cluster AND c.par = 0
                WHERE o.par = 1
                  AND list_dot_product(o.e, c.e) >= 0.4
            ), ssem AS (
                SELECT vec_id FROM eu
                WHERE par = 1
                  AND vec_id NOT IN (SELECT vec_id FROM sdrop)
            )
            SELECT 'smd:' || CAST(vec_id AS VARCHAR) AS grp,
                   CAST(NULL AS BIGINT) AS k,
                   CAST(NULL AS BIGINT) AS v
            FROM ssem
            UNION ALL
            SELECT 'smd:total', count(*), CAST(NULL AS BIGINT)
            FROM ssem
        )
    """,
    # transitive closure of the Jaccard near-dup edge list — the
    # recursive CTE replays what the Spark side computes iteratively
    "docs_cc_clusters": f"""
        WITH RECURSIVE base AS (
            SELECT doc_id, {_SHINGLES} AS sh
            FROM (SELECT doc_id, {_TOKS} AS l FROM documents)
        ), ex AS (
            SELECT doc_id, unnest(sh) AS s FROM base
        ), sizes AS (
            SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id
        ), inter AS (
            SELECT ea.doc_id AS a, eb.doc_id AS b, count(*) AS i
            FROM ex ea JOIN ex eb ON ea.s = eb.s AND ea.doc_id < eb.doc_id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT a, b
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) >= 0.5
        ), edges AS (
            SELECT a AS x, b AS y FROM pairs
            UNION
            SELECT b AS x, a AS y FROM pairs
        ), reach AS (
            SELECT x AS id, y AS r FROM edges
            UNION
            SELECT reach.id, e.y FROM reach JOIN edges e ON reach.r = e.x
        ), clus AS (
            SELECT id, least(id, min(r)) AS cluster FROM reach GROUP BY id
        )
        -- both Spark CC algorithms (min-label + Kiveris'14 stars)
        -- must produce the SAME closure labels: one closure, two tags
        SELECT alg, id, cluster
        FROM clus CROSS JOIN (SELECT 'ml' AS alg
                              UNION ALL SELECT 'star') algs
    """,
    "docs_jaccard_pairs": f"""
        WITH base AS (
            SELECT doc_id, {_SHINGLES} AS sh
            FROM (SELECT doc_id, {_TOKS} AS l FROM documents)
        ), ex AS (
            SELECT doc_id, unnest(sh) AS s FROM base
        ), sizes AS (
            SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id
        ), inter AS (
            SELECT ea.doc_id AS a, eb.doc_id AS b, count(*) AS i
            FROM ex ea JOIN ex eb ON ea.s = eb.s AND ea.doc_id < eb.doc_id
            GROUP BY 1, 2
        )
        SELECT a, b, round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) >= 0.5
        UNION ALL
        -- BM25 stratum (llm/retrieval.py): smoothed idf
        -- ln(1+(N-df+.5)/(df+.5)), k1=1.2, b=0.75, query-term-only df
        SELECT * FROM (
            WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
            tc AS (
                SELECT doc_id, len(l) AS dl, t AS term, count(*) AS tf
                FROM toks, UNNEST(l) AS u(t)
                WHERE t IN ('spark', 'window', 'merge')
                GROUP BY 1, 2, 3
            ), st AS (
                SELECT count(*) AS n, avg(len(l)) AS avgdl FROM toks
            ), qdf AS (
                SELECT term, count(DISTINCT doc_id) AS df
                FROM tc GROUP BY term
            ), sc AS (
                SELECT doc_id,
                       sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                           * tf * 2.2
                           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                       ) AS s
                FROM tc JOIN qdf USING (term) CROSS JOIN st
                GROUP BY doc_id
            )
            SELECT CAST(-1 AS BIGINT) AS a, doc_id AS b,
                   round(s, 4) AS jaccard
            FROM sc ORDER BY round(s, 4) DESC, doc_id LIMIT 10
        )
        UNION ALL
        -- TF-IDF stratum (llm/retrieval.py tf_idf): sklearn smooth
        -- idf ln((N+1)/(df+1)) + 1, df = docs containing the term
        SELECT * FROM (
            WITH toks AS (SELECT doc_id, {_TOKS} AS l FROM documents),
            tc AS (
                SELECT doc_id, t AS term, count(*) AS tf
                FROM toks, UNNEST(l) AS u(t) GROUP BY 1, 2
            ), nn AS (SELECT count(*) AS n FROM toks),
            dfq AS (SELECT count(*) AS df FROM tc WHERE term = 'the'),
            sc2 AS (
                SELECT doc_id,
                       tf * (ln((n + 1.0) / (df + 1.0)) + 1) AS s
                FROM tc, nn, dfq WHERE term = 'the'
            )
            SELECT CAST(-2 AS BIGINT) AS a, doc_id AS b,
                   round(s, 4) AS jaccard
            FROM sc2 ORDER BY round(s, 4) DESC, doc_id LIMIT 10
        )
        UNION ALL
        -- winnowing fingerprints (Schleimer et al. SIGMOD'03):
        -- word-5-gram hashes, min per 4-hash window, distinct set;
        -- a=-3 set size, a=-4 checksum (sum of selected hashes)
        SELECT * FROM (
            WITH toks AS (
                SELECT doc_id, {_TOKS} AS l FROM documents
                WHERE doc_id < 40
            ), g AS (
                SELECT doc_id,
                       CASE WHEN len(l) >= 5
                            THEN [array_to_string(l[i:i+4], ' ')
                                  for i in range(1, len(l) - 3)]
                            WHEN array_to_string(l, ' ') != ''
                            THEN [array_to_string(l, ' ')]
                            ELSE []::VARCHAR[] END AS grams
                FROM toks
            ), h AS (
                SELECT doc_id,
                       list_transform(grams,
                           x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)
                           AS hs
                FROM g
            ), sel AS (
                SELECT doc_id,
                       CASE WHEN len(hs) = 0 THEN []::BIGINT[]
                            WHEN len(hs) < 4 THEN [list_min(hs)]
                            ELSE list_distinct(
                                [list_min(hs[i:i+3])
                                 for i in range(1, len(hs) - 2)])
                       END AS fps
                FROM h
            )
            SELECT CAST(-3 AS BIGINT) AS a, doc_id AS b,
                   CAST(len(fps) AS DOUBLE) AS jaccard
            FROM sel WHERE len(fps) > 0
            UNION ALL
            SELECT CAST(-4 AS BIGINT), doc_id,
                   CAST(list_sum(fps) AS DOUBLE)
            FROM sel WHERE len(fps) > 0
        )
    """,
    # curation quartet (r8): best-of-cluster dedup, per-source cap,
    # corpus unigram NLL, cross-doc duplicate-gram fraction
    "docs_curation_ops": f"""
        WITH t AS (
            SELECT doc_id, source, text,
                   CAST(length(text) AS DOUBLE) AS n, {_TOKS} AS l,
                   (CAST(length(text) AS DOUBLE)
                    - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS n_alpha,
                   ' ' || {_NORM} || ' ' AS padded
            FROM documents
        ), q AS (
            SELECT doc_id, source, text,
                   round(0.3 * (CASE WHEN n < 20 THEN n / 20.0
                                     WHEN n > 5000 THEN 0.5 ELSE 1.0 END)
                         + 0.3 * least(alpha * 1.5, 1.0)
                         + 0.2 * (CASE WHEN mean_word >= 3 AND mean_word <= 12
                                       THEN 1.0 ELSE 0.5 END)
                         + 0.2 * least(stop_ratio * 5.0, 1.0), 4) AS quality
            FROM (SELECT doc_id, source, text, n,
                         n_alpha / greatest(n, 1.0) AS alpha,
                         n / greatest(len(l), 1.0) AS mean_word,
                         ({" + ".join(_occ("padded", f" {w} ") for w in _STOP5)})
                             / greatest(len(l), 1.0) AS stop_ratio
                  FROM t)
        ), best AS (
            SELECT source, count(*) AS n, CAST(sum(doc_id) AS DOUBLE) AS v
            FROM (SELECT doc_id, source,
                         row_number() OVER (PARTITION BY md5({_NORM})
                                            ORDER BY quality DESC, doc_id) AS rn
                  FROM q)
            WHERE rn = 1 GROUP BY source
        ), cap AS (
            SELECT source, count(*) AS n, CAST(sum(doc_id) AS DOUBLE) AS v
            FROM (SELECT doc_id, source,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY quality DESC, doc_id) AS rn
                  FROM q)
            WHERE rn <= 10 GROUP BY source
        ), toks AS (
            SELECT doc_id, source, w AS word FROM t, UNNEST(l) AS u(w)
        ), cnt AS (
            SELECT word, count(*) AS c FROM toks GROUP BY 1
        ), tot AS (
            SELECT sum(c) AS tt FROM cnt
        ), vocab AS (
            SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT 1024
        ), lp AS (
            SELECT toks.doc_id, toks.source,
                   ln((coalesce(v.c, 0) + 1.0) / (tt + 1025.0)) AS lp
            FROM toks LEFT JOIN vocab v USING (word) CROSS JOIN tot
        ), docnll AS (
            SELECT doc_id, any_value(source) AS source,
                   round(-avg(lp), 4) AS nll
            FROM lp GROUP BY doc_id
        ), lmrow AS (
            SELECT source, count(*) AS n, round(avg(nll), 4) AS v
            FROM docnll GROUP BY source
        ), g8 AS (
            SELECT doc_id, source,
                   list_transform(range(1, greatest(len(l) - 7, 1) + 1),
                                  i -> array_to_string(l[i:i+7], ' ')) AS g
            FROM t
        ), ge AS (
            SELECT doc_id, source, md5(gr) AS gh FROM g8, UNNEST(g) AS u(gr)
        ), nd AS (
            SELECT gh, count(DISTINCT doc_id) AS nd FROM ge GROUP BY 1
        ), per AS (
            SELECT ge.doc_id, any_value(ge.source) AS source,
                   count(*) AS ng,
                   sum(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) AS ndup
            FROM ge JOIN nd USING (gh) GROUP BY ge.doc_id
        ), spanrow AS (
            SELECT source, count(*) AS n,
                   round(avg(round(CAST(ndup AS DOUBLE)
                                   / greatest(ng, 1), 4)), 4) AS v
            FROM per GROUP BY source
        )
        SELECT 'best' AS grp, source AS k, n, v FROM best
        UNION ALL SELECT 'cap' AS grp, source AS k, n, v FROM cap
        UNION ALL SELECT 'lm' AS grp, source AS k, n, v FROM lmrow
        UNION ALL SELECT 'span' AS grp, source AS k, n, v FROM spanrow
        UNION ALL
        -- C4 global line dedup over the synthetic line-broken corpus
        SELECT * FROM (
            WITH aug2 AS (
                SELECT doc_id, source,
                       replace(text, 'table ', 'table' || chr(10)) AS a
                FROM documents
            ), le AS (
                SELECT doc_id, source, s.pos, s.line
                FROM (SELECT doc_id, source,
                             UNNEST(list_transform(
                                 range(1, len(string_split(a, chr(10))) + 1),
                                 i -> {{'pos': i - 1,
                                       'line': string_split(a, chr(10))[i]}}))
                             AS s
                      FROM aug2)
            ), fk AS (
                SELECT doc_id, source, pos, line,
                       row_number() OVER (PARTITION BY md5(line)
                                          ORDER BY doc_id, pos) AS rn
                FROM le
            ), keptl AS (
                SELECT doc_id, any_value(source) AS source,
                       count(*) AS nl,
                       string_agg(line, chr(10) ORDER BY pos) AS newtext
                FROM fk WHERE rn = 1 GROUP BY doc_id
            )
            SELECT 'line' AS grp, source AS k, count(*) AS n,
                   CAST(sum(nl) AS DOUBLE) AS v
            FROM keptl GROUP BY source
            UNION ALL
            SELECT 'linelen' AS grp, source AS k, count(*) AS n,
                   CAST(sum(length(newtext)) AS DOUBLE) AS v
            FROM keptl GROUP BY source
        )
        UNION ALL
        -- temperature mixture alpha=0.5: keep_s = pow(p,0.5)/p,
        -- max-normalized, md5-rule membership (same float op order
        -- as llm/mixture.temperature_weights)
        SELECT * FROM (
            WITH cnts AS (
                SELECT source, CAST(count(*) AS DOUBLE) AS cn
                FROM documents GROUP BY source
            ), tt AS (SELECT sum(cn) AS t FROM cnts),
            kw AS (
                SELECT source, pow(cn / t, 0.5) / (cn / t) AS raw
                FROM cnts, tt
            ), mx AS (SELECT max(raw) AS m FROM kw),
            th AS (
                SELECT source,
                       CAST(round((raw / m) * 16777216) AS BIGINT) AS ti
                FROM kw, mx
            ), keep AS (
                SELECT d.doc_id, d.source
                FROM documents d JOIN th USING (source)
                WHERE th.ti >= 16777216
                   OR (th.ti > 0 AND
                       substr(md5('0' || '|' || d.doc_id), 1, 6)
                       < lpad(lower(hex(th.ti)), 6, '0'))
            )
            SELECT 'temp' AS grp, source AS k, count(*) AS n,
                   CAST(sum(doc_id) AS DOUBLE) AS v
            FROM keep GROUP BY source
        )
        UNION ALL
        -- weighted_sample (llm/mixture.py, DSIR resample step):
        -- per-row keep prob = the 4dp quality score; keep iff the
        -- md5(0|id) 6-hex prefix as an integer is below
        -- floor(clip(q)*16^6 + 0.5)
        SELECT 'wres' AS grp, source AS k, count(*) AS n,
               CAST(sum(doc_id) AS DOUBLE) AS v
        FROM q
        WHERE ('0x' || substr(md5('0' || '|' || doc_id), 1, 6))::BIGINT
              < floor(least(1.0, greatest(0.0, quality))
                      * 16777216.0 + 0.5)
        GROUP BY source
        UNION ALL
        -- token-budget prefix cut: first docs (by doc_id) whose
        -- running token total fits 20000
        SELECT * FROM (
            WITH tk AS (
                SELECT doc_id, source, len({_TOKS}) AS nt
                FROM documents
            ), cum AS (
                SELECT doc_id, source,
                       sum(nt) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS c
                FROM tk
            )
            SELECT 'tok' AS grp, source AS k, count(*) AS n,
                   CAST(sum(doc_id) AS DOUBLE) AS v
            FROM cum WHERE c <= 20000 GROUP BY source
        )
        UNION ALL
        -- write_shards (llm/packing.py): both sizing rules in
        -- closed form over the doc_id % 7 = 3 slice — docs rule
        -- shard = 0-based rank // 29, token rule shard =
        -- exclusive-prefix-token-sum // 1500 (a doc longer than the
        -- budget may skip whole shard ids — same non-contiguity the
        -- engine documents); 'nd' pins the shard-directory counts
        SELECT * FROM (
            WITH ss AS (
                SELECT doc_id, len({_TOKS}) AS ntk,
                       row_number() OVER (ORDER BY doc_id) - 1 AS idx
                FROM documents WHERE doc_id % 7 = 3 AND doc_id < 3500
            ), asg AS (
                SELECT doc_id, idx // 29 AS dshard,
                       coalesce(sum(ntk) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) // 1500 AS tshard
                FROM ss
            )
            SELECT 'shard' AS grp,
                   'd' || CAST(dshard AS VARCHAR) AS k,
                   count(*) AS n, CAST(sum(doc_id) AS DOUBLE) AS v
            FROM asg GROUP BY dshard
            UNION ALL
            SELECT 'shard', 't' || CAST(tshard AS VARCHAR),
                   count(*), CAST(sum(doc_id) AS DOUBLE)
            FROM asg GROUP BY tshard
            UNION ALL
            SELECT 'shard', 'nd', count(DISTINCT dshard),
                   CAST(count(DISTINCT tshard) AS DOUBLE)
            FROM asg
        )
        UNION ALL
        -- duplicate-span removal (Lee'22 keep-first, word 5-grams,
        -- doc_id < 120): later occurrences of a duplicated gram drop
        -- their 5 covered tokens, docs reassemble from survivors;
        -- n = changed docs, v = Σ 32-bit md5-prefix of rewritten text
        SELECT * FROM (
            WITH st AS (
                SELECT doc_id, source, {_TOKS} AS l, {_NORM} AS nm
                FROM documents WHERE doc_id < 120
            ), sg0 AS (
                SELECT doc_id,
                       CASE WHEN len(l) >= 5
                            THEN [{{'gpos': i - 1,
                                  'gram': array_to_string(l[i:i+4], ' ')}}
                                  for i in range(1, len(l) - 3)]
                            ELSE [{{'gpos': 0, 'gram': nm}}] END AS gs
                FROM st
            ), sg AS (
                SELECT doc_id, s.gpos AS gpos, s.gram AS gram
                FROM sg0, UNNEST(gs) AS u(s)
            ), srk AS (
                SELECT doc_id, gpos,
                       row_number() OVER (PARTITION BY gram
                                          ORDER BY doc_id, gpos) AS rn
                FROM sg
            ), scov AS (
                SELECT DISTINCT doc_id, gpos + q AS tpos
                FROM srk, UNNEST([0, 1, 2, 3, 4]) AS o(q)
                WHERE rn >= 2
            ), stok0 AS (
                SELECT doc_id,
                       [{{'tpos': i - 1, 'w': l[i]}}
                        for i in range(1, len(l) + 1)] AS ts
                FROM st
            ), stok AS (
                SELECT doc_id, s.tpos AS tpos, s.w AS w
                FROM stok0, UNNEST(ts) AS u(s)
            ), sk AS (
                SELECT stok.doc_id, stok.tpos, stok.w
                FROM stok LEFT JOIN scov
                  ON stok.doc_id = scov.doc_id
                 AND stok.tpos = scov.tpos
                WHERE scov.doc_id IS NULL
            ), snew AS (
                SELECT st.doc_id, st.source, st.nm,
                       coalesce(sa.newt, '') AS newt
                FROM st LEFT JOIN (
                    SELECT doc_id,
                           string_agg(w, ' ' ORDER BY tpos) AS newt
                    FROM sk GROUP BY doc_id) sa USING (doc_id)
            )
            SELECT 'sprm' AS grp, source AS k,
                   CAST(sum(CASE WHEN newt != nm
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n,
                   CAST(sum(('0x' || substr(md5(newt), 1, 8))::BIGINT)
                        AS DOUBLE) AS v
            FROM snew GROUP BY source
        )
        {_BPE_BLOCK}
        UNION ALL
        -- end-to-end clean_corpus contract (llm/recipe.py),
        -- folded from the standalone docs_clean_corpus row
        SELECT * FROM (

        WITH t AS (
            SELECT doc_id, source, text,
                   CAST(length(text) AS DOUBLE) AS n, {_TOKS} AS l,
                   (CAST(length(text) AS DOUBLE)
                    - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS n_alpha,
                   ' ' || {_NORM} || ' ' AS padded
            FROM documents
        ), s AS (
            SELECT doc_id, source, text, n, len(l) AS n_tok,
                   n_alpha / greatest(n, 1.0) AS alpha,
                   n / greatest(len(l), 1.0) AS mean_word,
                   ({" + ".join(_occ("padded", f" {w} ") for w in _STOP5)})
                       / greatest(len(l), 1.0) AS stop_ratio,
                   list_transform(range(1, greatest(len(l) - 1, 1) + 1),
                                  i -> array_to_string(l[i:i+1], ' ')) AS g2
            FROM t
        ), q AS (
            SELECT doc_id, source, text,
                   round(0.3 * (CASE WHEN n < 20 THEN n / 20.0
                                     WHEN n > 5000 THEN 0.5 ELSE 1.0 END)
                         + 0.3 * least(alpha * 1.5, 1.0)
                         + 0.2 * (CASE WHEN mean_word >= 3 AND mean_word <= 12
                                       THEN 1.0 ELSE 0.5 END)
                         + 0.2 * least(stop_ratio * 5.0, 1.0), 4) AS quality,
                   n_tok,
                   round((len(g2) - len(list_distinct(g2)))
                         / greatest(len(g2), 1)::DOUBLE, 4) AS dup2
            FROM s
        ), filt AS (
            SELECT doc_id, source, {_REDACT_TXT} AS rtext
            FROM q WHERE quality >= 0.85 AND n_tok >= 5 AND dup2 <= 0.15
        ), dd AS (
            SELECT doc_id, source, rtext,
                   min(doc_id) OVER (PARTITION BY md5({_RNORM})) AS keep_id
            FROM filt
        ), surv AS (
            SELECT doc_id, source, rtext, {_RL} AS rl
            FROM dd WHERE doc_id = keep_id
        ), shing AS (
            SELECT doc_id, source, rtext, {_SHINGLES13} AS sh FROM surv
        ), evr AS (
            SELECT {_REDACT_TXT} AS rtext
            FROM documents WHERE doc_id % 97 = 0
        ), evl AS (
            SELECT {_RL} AS rl FROM evr
        ), evg AS (
            SELECT DISTINCT g FROM evl, UNNEST({_SHINGLES13}) AS u(g)
        ), cont AS (
            SELECT DISTINCT sh2.doc_id
            FROM shing sh2, UNNEST(sh2.sh) AS u(g)
            WHERE g IN (SELECT g FROM evg)
        ), ccroll AS (
            SELECT source, count(*) AS n_kept,
                   CAST(sum(length(rtext)) AS BIGINT) AS chars_red,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM shing
            WHERE doc_id NOT IN (SELECT doc_id FROM cont)
            GROUP BY source
        )
        SELECT 'cchyg' AS grp, source AS k, n_kept AS n,
               CAST(chars_red AS DOUBLE) AS v FROM ccroll
        UNION ALL
        SELECT 'ccid' AS grp, source AS k, min_id AS n,
               CAST(max_id AS DOUBLE) AS v FROM ccroll
        )
    """,
    "docs_minhash_dedup": f"""
        WITH base AS (
            SELECT doc_id, source, {_SHINGLES} AS sh
            FROM (SELECT doc_id, source, {_TOKS} AS l FROM documents)
        ), mh AS (
            SELECT doc_id,
                   {", ".join(f"{_minhash(i)} AS mh{i}" for i in range(8))}
            FROM base
        ), bands AS (
            SELECT doc_id,
                   {", ".join(f"md5(mh{2*i} || '|' || mh{2*i+1}) AS b{i}" for i in range(4))}
            FROM mh
        ), cand AS (
            SELECT x.doc_id AS a, y.doc_id AS b
            FROM bands x JOIN bands y
              ON x.doc_id < y.doc_id
             AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
        ), ex AS (
            SELECT doc_id, unnest(sh) AS s FROM base
        ), sizes AS (
            SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id
        ), inter AS (
            SELECT ea.doc_id AS a, eb.doc_id AS b, count(*) AS i
            FROM ex ea JOIN ex eb ON ea.s = eb.s AND ea.doc_id < eb.doc_id
            GROUP BY 1, 2
        ), ver AS (
            SELECT inter.a, inter.b
            FROM inter
            JOIN cand USING (a, b)
            JOIN sizes sa ON sa.doc_id = inter.a
            JOIN sizes sb ON sb.doc_id = inter.b
            WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) >= 0.5
        )
        SELECT source, count(*) AS n_kept
        FROM documents
        WHERE doc_id NOT IN (SELECT DISTINCT b FROM ver)
        GROUP BY source
    """,
    # --------------------------------------------------------- embeddings
    "emb_neardup_pairs": """
        SELECT x.vec_id AS a, y.vec_id AS b,
               round(list_cosine_similarity(x.embedding::DOUBLE[],
                                            y.embedding::DOUBLE[]), 4) AS cos_sim
        FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
        WHERE round(list_cosine_similarity(x.embedding::DOUBLE[],
                                           y.embedding::DOUBLE[]), 4) >= 0.4
    """,
    # The IVF search contract: recall@10 >= 0.9 vs the exact top-10,
    # computed inside the Spark plan (emb_ann_recall); the oracle is the
    # expected constant row — a regression flips recall_pass.
    # recall_pass is the expected-constant contract (an index/search
    # regression flips it); the semantic-dedup counts are a FULL value
    # replay: unit-normalize, assign to the argmax of the 64 smallest-
    # id seed vectors (first-max tie-break = smallest seed id), drop
    # any vector with a smaller-id same-cluster neighbor at cos>=0.95
    "emb_ann_recall": """
        WITH u AS (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                       x -> x / sqrt(list_dot_product(
                           embedding::DOUBLE[], embedding::DOUBLE[]))) AS e
            FROM embeddings
        ), seeds AS (
            -- 64 SMALLEST ids, cluster label = 0-based rank (mirrors
            -- ivf_index_deterministic's orderBy(id).limit(k) seeding)
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS sid,
                   e AS se
            FROM (SELECT vec_id, e FROM u ORDER BY vec_id LIMIT 64)
        ), asg AS (
            SELECT vec_id, e, sid AS cluster FROM (
                SELECT u.vec_id, u.e, s.sid,
                       row_number() OVER (
                           PARTITION BY u.vec_id
                           ORDER BY list_dot_product(u.e, s.se) DESC,
                                    s.sid ASC) AS rn
                FROM u CROSS JOIN seeds s
            ) WHERE rn = 1
        ), drops AS (
            SELECT DISTINCT a.vec_id
            FROM asg a JOIN asg b
              ON a.cluster = b.cluster AND b.vec_id < a.vec_id
            WHERE list_dot_product(a.e, b.e) >= 0.95
        ), raw AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), sub AS (
            -- m=8 subspaces of 8 dims (1-based inclusive slices)
            SELECT vec_id, ss.s AS s, v[ss.s*8+1 : ss.s*8+8] AS sv
            FROM raw, range(8) ss(s)
        ), pqids AS (
            -- 16 SMALLEST ids, codebook index = rank (mirrors
            -- pq_codebook's orderBy(id).limit(2^nbits))
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
        ), pqtop AS (
            SELECT vec_id FROM adc ORDER BY ad, vec_id LIMIT 10
        ), extop AS (
            SELECT e2.vec_id
            FROM embeddings e2
            CROSS JOIN (SELECT embedding FROM embeddings
                        WHERE vec_id = 0) q
            ORDER BY round(list_cosine_similarity(
                         e2.embedding::DOUBLE[],
                         q.embedding::DOUBLE[]), 6) DESC, e2.vec_id
            LIMIT 10
        ), sqmm AS (
            -- SQ8 bounds: per-dim min/max (mirrors sq8_train's one
            -- codegen'd agg pass; min/max are order-exact on doubles)
            SELECT s.i AS i, min(v[s.i+1]) AS mn, max(v[s.i+1]) AS mx
            FROM raw, range(64) s(i) GROUP BY s.i
        ), sqcd AS (
            -- sq8_encode replay: floor(x+0.5) rounding, [0,255] clip,
            -- degenerate dims (mx == mn) encode as 0
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
        ), sqtop AS (
            SELECT vec_id FROM sqadc ORDER BY ad, vec_id LIMIT 10
        ), bmm AS (
            -- 1-bit binarization thresholds: per-dim midpoint
            -- (min+max)/2 (mirrors bq1_train — order-exact, unlike a
            -- mean); replay is bit-level, equivalent to the engine's
            -- 32-bits-per-word packing + bit_count(xor)
            SELECT s.i AS i,
                   (min(v[s.i+1]) + max(v[s.i+1])) / 2.0 AS t
            FROM raw, range(64) s(i) GROUP BY s.i
        ), bbits AS (
            SELECT raw.vec_id, m.i,
                   CASE WHEN v[m.i+1] > m.t THEN 1 ELSE 0 END AS b
            FROM raw, bmm m
        ), bham AS (
            SELECT bbits.vec_id,
                   sum(CASE WHEN bbits.b <> qb.b THEN 1 ELSE 0 END) AS h
            FROM bbits
            JOIN (SELECT i, b FROM bbits WHERE vec_id = 0) qb USING (i)
            GROUP BY bbits.vec_id
        ), bqtop AS (
            SELECT vec_id, h FROM bham ORDER BY h, vec_id LIMIT 10
        ), bq AS (
            -- batched-query brute-force top-5 per query: cosine
            -- rounded away-from-zero to 4dp (the engine's
            -- _round_half_away), id tie-break
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY (CASE WHEN c >= 0
                                     THEN floor(c * 1e4 + 0.5)
                                     ELSE -floor(-c * 1e4 + 0.5)
                                     END) / 1e4 DESC,
                                    vec_id ASC) AS rn
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
            ) WHERE rn <= 5
        )
        SELECT 10 AS k, true AS recall_pass,
               (SELECT count(*) FROM u)
                   - (SELECT count(*) FROM drops) AS sem_kept,
               (SELECT count(*) FROM u) AS n_vec,
               (SELECT CAST(sum(vec_id) AS BIGINT) FROM pqtop)
                   AS pq_idsum,
               (SELECT count(*) FROM pqtop JOIN extop USING (vec_id))
                   AS pq_recall10,
               (SELECT CAST(sum(vec_id) AS BIGINT) FROM sqtop)
                   AS sq8_idsum,
               (SELECT count(*) FROM sqtop JOIN extop USING (vec_id))
                   AS sq8_recall10,
               (SELECT CAST(sum(vec_id) AS BIGINT) FROM bqtop)
                   AS bq1_idsum,
               (SELECT CAST(sum(h) AS BIGINT) FROM bqtop)
                   AS bq1_hamsum,
               (SELECT CAST(sum((query_id + 1) * vec_id) AS BIGINT)
                FROM bq) AS bq_idsum,
               (SELECT CAST(count(*) AS BIGINT) FROM bq) AS bq_n
    """,
    "events_hourly_funnel": """
        WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY hour, event_type
    ),
        funnel AS (
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
            FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view_click,
               CAST(sum(CASE WHEN t_click > t_view AND t_buy > t_click
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        FROM per_user
    )
        SELECT * FROM hourly CROSS JOIN funnel
    """,
    "emb_topk_label_stats": """
        WITH topk AS (
        SELECT e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 4) AS cos_sim
        FROM embeddings e
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        ORDER BY cos_sim DESC, e.vec_id ASC
        LIMIT 10
    ),
        lbl AS (
        SELECT label, count(*) AS n,
               round(avg(sqrt(list_dot_product(embedding::DOUBLE[],
                                               embedding::DOUBLE[]))), 4) AS avg_norm
        FROM embeddings GROUP BY label
    )
        SELECT 'top:' || CAST(vec_id AS VARCHAR) AS key, cos_sim AS m1,
               CAST(NULL AS DOUBLE) AS m2
        FROM topk
        UNION ALL
        SELECT 'lbl:' || CAST(label AS VARCHAR), CAST(n AS DOUBLE), avg_norm
        FROM lbl
        UNION ALL
        -- label_propagation: 2 unrolled iterations over the kNN(3)
        -- edge list; seeds (vec_id % 3 = 0) clamp each round, vote
        -- ties break on the smaller label, edge ties on neighbor id
        SELECT * FROM (
            WITH b AS (
                SELECT vec_id AS id, embedding::DOUBLE[] AS f,
                       CASE WHEN vec_id % 3 = 0 THEN label END AS y
                FROM embeddings WHERE vec_id < 60
            ), e0 AS (
                SELECT a.id AS src, c.id AS dst,
                       sqrt(list_sum(list_transform(
                           range(1, len(a.f) + 1),
                           i -> (a.f[i] - c.f[i])
                                * (a.f[i] - c.f[i])))) AS d
                FROM b a JOIN b c ON a.id != c.id
            ), edges AS (
                SELECT src, dst FROM (
                    SELECT src, dst,
                           row_number() OVER (PARTITION BY src
                                              ORDER BY d, dst) AS rn
                    FROM e0) WHERE rn <= 3
            ), p1 AS (
                SELECT src AS id, y FROM (
                    SELECT src, y,
                           row_number() OVER (PARTITION BY src
                                              ORDER BY n DESC, y) AS rv
                    FROM (SELECT e.src, l.y, count(*) AS n
                          FROM edges e JOIN b l ON l.id = e.dst
                          WHERE l.y IS NOT NULL GROUP BY e.src, l.y))
                WHERE rv = 1
            ), l1 AS (
                SELECT b.id, coalesce(b.y, p1.y) AS y
                FROM b LEFT JOIN p1 USING (id)
            ), p2 AS (
                SELECT src AS id, y FROM (
                    SELECT src, y,
                           row_number() OVER (PARTITION BY src
                                              ORDER BY n DESC, y) AS rv
                    FROM (SELECT e.src, l.y, count(*) AS n
                          FROM edges e JOIN l1 l ON l.id = e.dst
                          WHERE l.y IS NOT NULL GROUP BY e.src, l.y))
                WHERE rv = 1
            ), l2 AS (
                SELECT b.id, coalesce(b.y, p2.y) AS y
                FROM b LEFT JOIN p2 USING (id)
            )
            SELECT 'lp:' || CAST(id AS VARCHAR) AS key,
                   CAST(y AS DOUBLE) AS m1, CAST(NULL AS DOUBLE) AS m2
            FROM l2
        )
        UNION ALL
        -- knn_join: exact two-table top-3, 5 query vectors vs the
        -- corpus — full cross join replay, 4dp rounding, rank by
        -- (cos desc, id asc)
        SELECT 'kj:' || CAST(query_id AS VARCHAR) || ':'
                     || CAST(rn AS VARCHAR) AS key,
               CAST(vec_id AS DOUBLE) AS m1, rc AS m2
        FROM (
            SELECT query_id, vec_id, rc,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY rc DESC, vec_id ASC) AS rn
            FROM (
                SELECT q1.vec_id AS query_id, e1.vec_id AS vec_id,
                       round(list_cosine_similarity(
                           e1.embedding::DOUBLE[],
                           q1.embedding::DOUBLE[]), 4) AS rc
                FROM embeddings e1
                CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                            WHERE vec_id < 5) q1
            )
        ) WHERE rn <= 3
        UNION ALL
        -- IVFADC (residual PQ, ivfadc_index/search): full bit-level
        -- replay — 16 smallest-id unit seeds, argmax-dot assignment
        -- (first-max = smallest seed), residual r = e − seed, m=8
        -- subspaces of 8 dims, codebook = residual subvectors of the
        -- 16 smallest ids, codes = argmin (dist, c), query vec 0
        -- probes its 4 nearest cells with PER-CELL tables from the
        -- query residual; top-10 by (round(adc,6), id)
        SELECT * FROM (
            WITH au AS (
                SELECT vec_id,
                       list_transform(embedding::DOUBLE[],
                           x -> x / sqrt(list_dot_product(
                               embedding::DOUBLE[],
                               embedding::DOUBLE[]))) AS e
                FROM embeddings
            ), aseeds AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS sid,
                       e AS se
                FROM (SELECT vec_id, e FROM au
                      ORDER BY vec_id LIMIT 16)
            ), aasg AS (
                SELECT vec_id, e, sid AS cluster FROM (
                    SELECT u.vec_id, u.e, s.sid,
                           row_number() OVER (
                               PARTITION BY u.vec_id
                               ORDER BY list_dot_product(u.e, s.se)
                                            DESC,
                                        s.sid ASC) AS rn
                    FROM au u CROSS JOIN aseeds s
                ) WHERE rn = 1
            ), ares AS (
                SELECT a.vec_id, a.cluster,
                       list_transform(range(1, 65),
                           i -> a.e[i] - s.se[i]) AS r
                FROM aasg a JOIN aseeds s ON s.sid = a.cluster
            ), apqids AS (
                SELECT vec_id,
                       row_number() OVER (ORDER BY vec_id) - 1 AS c
                FROM (SELECT vec_id FROM ares
                      ORDER BY vec_id LIMIT 16)
            ), asub AS (
                SELECT vec_id, cluster, ss.s AS s,
                       r[ss.s*8+1 : ss.s*8+8] AS sv
                FROM ares, range(8) ss(s)
            ), acb AS (
                SELECT apqids.c, asub.s, asub.sv AS cent
                FROM asub JOIN apqids USING (vec_id)
            ), acdist AS (
                SELECT asub.vec_id, asub.cluster, asub.s, acb.c,
                       list_sum(list_transform(range(1, 9),
                           i -> (asub.sv[i] - acb.cent[i])^2)) AS d
                FROM asub JOIN acb USING (s)
            ), acodes AS (
                SELECT vec_id, cluster, s, c FROM (
                    SELECT vec_id, cluster, s, c,
                           row_number() OVER (
                               PARTITION BY vec_id, s
                               ORDER BY d, c) AS rn
                    FROM acdist) WHERE rn = 1
            ), aq AS (
                SELECT e FROM au WHERE vec_id = 0
            ), aprobes AS (
                SELECT sid, se FROM (
                    SELECT s.sid, s.se,
                           row_number() OVER (
                               ORDER BY list_dot_product(s.se, q.e)
                                            DESC,
                                        s.sid ASC) AS rn
                    FROM aseeds s, aq q) WHERE rn <= 4
            ), aqres AS (
                SELECT p.sid, ss.s,
                       list_transform(range(1, 9),
                           i -> q.e[ss.s*8 + i] - p.se[ss.s*8 + i])
                           AS qsv
                FROM aprobes p, aq q, range(8) ss(s)
            ), atab AS (
                SELECT aqres.sid, aqres.s, acb.c,
                       list_sum(list_transform(range(1, 9),
                           i -> (aqres.qsv[i] - acb.cent[i])^2)) AS t
                FROM aqres JOIN acb USING (s)
            ), aadc AS (
                SELECT acodes.vec_id, round(sum(atab.t), 6) AS ad
                FROM acodes
                JOIN atab ON atab.sid = acodes.cluster
                         AND atab.s = acodes.s AND atab.c = acodes.c
                GROUP BY acodes.vec_id
            )
            SELECT 'adc:' || CAST(vec_id AS VARCHAR) AS key,
                   ad AS m1, CAST(NULL AS DOUBLE) AS m2
            FROM aadc ORDER BY ad, vec_id LIMIT 10
        )
    """,
}
