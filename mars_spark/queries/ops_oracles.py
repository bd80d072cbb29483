"""DuckDB oracle SQL for the operator-level corpus (ops.py)."""

OPS_ORACLES: dict[str, str] = {
    "op_accessors": """
        SELECT CAST(year(o_orderdate) AS INT) AS y,
               CAST(quarter(o_orderdate) AS INT) AS q,
               upper(o_orderpriority) AS prio_up,
               length(o_orderpriority) AS prio_len,
               CAST(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS BIGINT)
                   AS prio_num,
               count(o_orderkey) AS n,
               CAST(min(month(o_orderdate)) AS INT) AS m_min
        FROM orders GROUP BY y, q, prio_up, prio_len, prio_num
    """,
    "op_stats": """
        WITH per_flag AS (
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.25), 4) AS p25,
                   round(quantile_cont(l_quantity, 0.50), 4) AS p50,
                   round(quantile_cont(l_quantity, 0.75), 4) AS p75
            FROM lineitem GROUP BY l_returnflag
        ), tot AS (
            SELECT count(*) AS n_rows,
                   CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                   round(avg(coalesce(nullif(l_discount, 0.0), -1.0)), 6)
                       AS avg_filled,
                   round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
                   round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp,
                   round(avg(sqrt(l_quantity)), 6) AS avg_sqrt_qty,
                   round(avg(ln(l_extendedprice)), 6) AS avg_log_price,
                   round(avg(cos(l_discount)), 6) AS avg_cos_disc,
                   floor(stddev_samp(l_quantity)
                         / sqrt(count(l_quantity)) * 1e6 + 0.5) / 1e6
                       AS sem_qty,
                   floor(skewness(l_quantity) * 1e6 + 0.5) / 1e6
                       AS skew_qty,
                   floor(kurtosis(l_quantity) * 1e6 + 0.5) / 1e6
                       AS kurt_qty
            FROM lineitem
        ), mono AS (
            -- check_monotonic replay: strict on the (unique) orderkey
            -- copy, non-strict on totalprice, both in orderkey order
            SELECT coalesce(bool_and(ok_key), TRUE) AS mono_okey,
                   coalesce(bool_and(ok_tp), TRUE) AS mono_price,
                   'o_custkey,o_orderkey,o_totalprice,okey2'
                       AS num_cols
            FROM (
                SELECT o_orderkey > lag(o_orderkey) OVER w AS ok_key,
                       o_totalprice >= lag(o_totalprice) OVER w AS ok_tp
                FROM orders WINDOW w AS (ORDER BY o_orderkey)
            )
        ), mem AS (
            -- memory_usage closed form: 2 fixed-width 8-byte cols
            -- + deep octet-length sum of the string col
            SELECT CAST(16 * count(*)
                        + sum(strlen(o_orderpriority))
                        AS DOUBLE) AS mem_ck
            FROM orders
        ), sprank AS (
            -- Spearman = pearson on average-method ranks: min-rank
            -- + (ties−1)/2, exactly operators/rank.py's prefix form
            SELECT rank() OVER (ORDER BY l_quantity)
                   + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0
                       AS rq,
                   rank() OVER (ORDER BY l_extendedprice)
                   + (count(*) OVER (PARTITION BY l_extendedprice) - 1)
                     / 2.0 AS rp
            FROM lineitem
        ), sp AS (
            SELECT round(corr(rq, rp), 6) AS corr_sp FROM sprank
        ), kg AS (
            -- Kendall tau-b replay over the SAME distinct-value-pair
            -- compression the Spark side uses (operators/corr.py):
            -- discrete quantity × discount keeps m ~ 550 pairs
            SELECT l_quantity AS x, l_discount AS y,
                   count(*)::DOUBLE AS w
            FROM lineitem GROUP BY 1, 2
        ), kn AS (
            SELECT sum(w) AS n,
                   (SELECT sum(c * (c - 1) / 2.0) FROM (
                        SELECT sum(w) AS c FROM kg GROUP BY x)) AS n1,
                   (SELECT sum(c * (c - 1) / 2.0) FROM (
                        SELECT sum(w) AS c FROM kg GROUP BY y)) AS n2
            FROM kg
        ), kpq AS (
            SELECT coalesce(sum(CASE WHEN a.x < b.x AND a.y < b.y
                                     THEN a.w * b.w END), 0) AS p,
                   coalesce(sum(CASE WHEN a.x < b.x AND a.y > b.y
                                     THEN a.w * b.w END), 0) AS q
            FROM kg a JOIN kg b
              ON a.x < b.x OR (a.x = b.x AND a.y < b.y)
        ), kd AS (
            SELECT round((p - q) / sqrt((n * (n - 1) / 2.0 - n1)
                                        * (n * (n - 1) / 2.0 - n2)), 6)
                       AS corr_kd
            FROM kpq CROSS JOIN kn
        ), kb AS (
            -- r14 binned kendall replay (approx=True, max_items=400):
            -- distinct value pairs of the CONTINUOUS pair, then each
            -- side bucketed by (min_rank-1)*20 // n — exact integer
            -- arithmetic identical to operators/corr.py's prefix form
            SELECT l_extendedprice AS x, l_quantity AS y,
                   count(*)::BIGINT AS w
            FROM lineitem GROUP BY 1, 2
        ), kb_n AS (
            SELECT sum(w)::BIGINT AS n FROM kb
        ), kbx AS (
            SELECT x, (coalesce(sum(wx) OVER (ORDER BY x
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) * 20)
                      // (SELECT n FROM kb_n) AS bx
            FROM (SELECT x, sum(w)::BIGINT AS wx FROM kb GROUP BY x)
        ), kby AS (
            SELECT y, (coalesce(sum(wy) OVER (ORDER BY y
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) * 20)
                      // (SELECT n FROM kb_n) AS yb
            FROM (SELECT y, sum(w)::BIGINT AS wy FROM kb GROUP BY y)
        ), kg2 AS (
            SELECT kbx.bx AS x, kby.yb AS y, sum(kb.w)::DOUBLE AS w
            FROM kb JOIN kbx USING (x) JOIN kby USING (y)
            GROUP BY 1, 2
        ), kn2 AS (
            SELECT sum(w) AS n,
                   (SELECT sum(c * (c - 1) / 2.0) FROM (
                        SELECT sum(w) AS c FROM kg2 GROUP BY x)) AS n1,
                   (SELECT sum(c * (c - 1) / 2.0) FROM (
                        SELECT sum(w) AS c FROM kg2 GROUP BY y)) AS n2
            FROM kg2
        ), kpq2 AS (
            SELECT coalesce(sum(CASE WHEN a.x < b.x AND a.y < b.y
                                     THEN a.w * b.w END), 0) AS p,
                   coalesce(sum(CASE WHEN a.x < b.x AND a.y > b.y
                                     THEN a.w * b.w END), 0) AS q
            FROM kg2 a JOIN kg2 b
              ON a.x < b.x OR (a.x = b.x AND a.y < b.y)
        ), kd2 AS (
            SELECT round((p - q) / sqrt((n * (n - 1) / 2.0 - n1)
                                        * (n * (n - 1) / 2.0 - n2)), 6)
                       AS corr_kd_bin
            FROM kpq2 CROSS JOIN kn2
        ), rug AS (
            -- r14 ungrouped rolling(5).sum checksum over the
            -- UNIQUE-keyed (orderkey, linenumber) aggregate: raw
            -- pairs duplicate (tie-order-dependent rows frame), the
            -- grouped key is strictly unique so the integer total
            -- is exact in any engine / any layout
            SELECT sum(rs)::DOUBLE AS roll_ug_sum FROM (
                SELECT sum(q) OVER (
                    ORDER BY l_orderkey, l_linenumber
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rs
                FROM (SELECT l_orderkey, l_linenumber,
                             sum(l_quantity) AS q
                      FROM lineitem GROUP BY 1, 2))
        )
        SELECT * FROM per_flag CROSS JOIN tot CROSS JOIN mono
                   CROSS JOIN mem CROSS JOIN sp CROSS JOIN kd
                   CROSS JOIN kd2 CROSS JOIN rug
    """,
    "op_set_ops": """
        SELECT 'both' AS op, nationkey, CAST(1 AS BIGINT) AS n
        FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
              INTERSECT
              SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        UNION ALL
        SELECT 'cust_extra', nationkey, count(*) AS n
        FROM (SELECT c_nationkey AS nationkey FROM customer
              EXCEPT ALL
              SELECT s_nationkey FROM supplier)
        GROUP BY nationkey
    """,
    "op_window_rank": """
        SELECT 'rank' AS tag, o_custkey AS a, o_orderkey AS b,
               round(o_totalprice, 2) AS v1, rn::DOUBLE AS v2,
               FALSE AS flag
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders WHERE o_custkey < 200
        ) WHERE rn <= 2
        UNION ALL
        SELECT 'cond' AS tag, l_orderkey AS a,
               l_linenumber::BIGINT AS b,
               CAST(l_quantity AS DOUBLE) AS v1,
               CAST(CASE WHEN l_quantity > 25 THEN l_quantity
                         ELSE -1.0 END AS DOUBLE) AS v2,
               l_returnflag IN ('A', 'R') AS flag
        FROM lineitem WHERE l_orderkey < 100
    """,
    "op_pivot": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        FROM events GROUP BY user_id
    """,
    "op_melt_explode": """
        SELECT p_partkey AS k, 'p_size' AS variable,
               CAST(p_size AS DOUBLE) AS value
        FROM part WHERE p_partkey < 100
        UNION ALL
        SELECT p_partkey, 'p_retailprice', p_retailprice
        FROM part WHERE p_partkey < 100
        UNION ALL
        SELECT l_linenumber AS k, 'explode_n' AS variable,
               CAST(count(*) AS DOUBLE) AS value
        FROM (SELECT l_linenumber, unnest(range(1, l_linenumber + 1)) AS pos
              FROM lineitem WHERE l_orderkey < 50)
        GROUP BY l_linenumber
        UNION ALL
        SELECT 0 AS k,
               'cube:' || coalesce(l_returnflag, '*') || ':'
                       || coalesce(l_linestatus, '*') AS variable,
               CAST(round(sum(l_quantity), 2) AS DOUBLE) AS value
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 0 AS k,
               'rollup:' || coalesce(l_returnflag, '*') || ':'
                         || coalesce(l_linestatus, '*') AS variable,
               CAST(round(sum(l_quantity), 2) AS DOUBLE) AS value
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        UNION ALL
        -- range join (merge_range): point-in-[lo,hi) over sliding
        -- 90-day windows, counted per window
        SELECT w.win_id AS k, 'rjoin' AS variable,
               CAST(count(*) AS DOUBLE) AS value
        FROM (SELECT datediff('day', DATE '1992-01-01', l_shipdate)
                  AS d FROM lineitem) p
        JOIN (SELECT x AS win_id, x * 30 AS lo, x * 30 + 90 AS hi
              FROM generate_series(0, 83) t(x)) w
          ON p.d >= w.lo AND p.d < w.hi
        GROUP BY w.win_id
    """,
    # plain group-by / plain join — the engine side must reproduce
    # these exactly through the salted two-stage plans
    "op_skew_salted": """
        SELECT 'type:' || event_type AS grp, count(event_id) AS n,
               round(sum(value), 2) AS val
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'seg:' || c_mktsegment AS grp, count(*) AS n,
               round(sum(value), 2) AS val
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    "op_json_extract": """
        SELECT CAST(props->>'k' AS BIGINT) % 7 AS k_mod, count(*) AS n,
               CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY k_mod
    """,
    "op_cut_value_counts": """
        WITH qe AS (
            SELECT quantile_disc(l_quantity, [0.25, 0.5, 0.75]) AS e
            FROM lineitem
        )
        SELECT 'cut:' ||
               CASE WHEN l_quantity > 0  AND l_quantity <= 10 THEN 'low'
                    WHEN l_quantity > 10 AND l_quantity <= 25 THEN 'mid'
                    WHEN l_quantity > 25 AND l_quantity <= 50 THEN 'high'
               END AS key,
               count(*) AS n, CAST(NULL AS DOUBLE) AS v
        FROM lineitem
        WHERE l_quantity > 0 AND l_quantity <= 50
        GROUP BY key
        UNION ALL
        SELECT 'qcut:' ||
               CASE WHEN l_quantity <= e[1] THEN 'q1'
                    WHEN l_quantity <= e[2] THEN 'q2'
                    WHEN l_quantity <= e[3] THEN 'q3'
                    ELSE 'q4' END AS key,
               count(*) AS n, CAST(NULL AS DOUBLE) AS v
        FROM lineitem, qe
        GROUP BY key
        UNION ALL
        SELECT 'dum:' || l_returnflag AS key, count(*) AS n,
               CAST(NULL AS DOUBLE) AS v
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT 'cat:' || o_orderpriority AS key, n,
               CAST(rk - 1 AS DOUBLE) AS v
        FROM (SELECT o_orderpriority, count(*) AS n,
                     dense_rank() OVER (ORDER BY o_orderpriority) AS rk
              FROM orders GROUP BY o_orderpriority)
        UNION ALL
        SELECT 'nunique:approx_ok' AS key, 1 AS n,
               CAST(count(DISTINCT l_partkey) AS DOUBLE) AS v
        FROM lineitem
    """,
    "op_asof_join": """
        SELECT c.event_id, c.user_id, v.event_id AS view_id
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                        WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    "op_iloc_tail": """
        WITH s AS (
            SELECT row_number() OVER (ORDER BY event_id) - 1 AS seq,
                   event_id, user_id, round(value, 4) AS value
            FROM events
        )
        SELECT * FROM s
        WHERE (seq >= 100 AND seq < 110)
           OR seq >= (SELECT count(*) FROM events) - 5
        UNION ALL
        -- at[min label, user_id] + iat[107, col 1] scalar lookups
        SELECT -1 AS seq,
               (SELECT min(event_id) FROM events) AS event_id,
               (SELECT user_id FROM events
                WHERE event_id = (SELECT min(event_id) FROM events))
                   AS user_id,
               CAST((SELECT user_id FROM s WHERE seq = 107) AS DOUBLE)
                   AS value
        UNION ALL
        -- guarded transpose of the 3 lowest-id events: cells survive
        -- the string round-trip of the unpivot+pivot exactly
        SELECT -2 AS seq, event_id, user_id,
               floor(value * 1e4 + 0.5) / 1e4 AS value
        FROM (SELECT event_id, user_id, value FROM events
              ORDER BY event_id LIMIT 3)
    """,
    "op_align": """
        WITH a AS (
            SELECT o_custkey, sum(o_totalprice) AS total
            FROM orders
            WHERE o_custkey < 200 AND year(o_orderdate) = 1995
            GROUP BY o_custkey
        ), b AS (
            SELECT o_custkey, sum(o_totalprice) AS total
            FROM orders
            WHERE o_custkey < 200 AND year(o_orderdate) = 1996
            GROUP BY o_custkey
        )
        SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
               round(coalesce(a.total, 0) - coalesce(b.total, 0), 2) AS diff,
               CASE WHEN a.o_custkey IS NOT NULL AND b.o_custkey IS NOT NULL
                    THEN 'both'
                    WHEN a.o_custkey IS NOT NULL THEN 'left_only'
                    ELSE 'right_only' END AS src
        FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
        UNION ALL
        SELECT CAST(NULL AS BIGINT) AS o_custkey,
               round(sum(o_totalprice), 2) AS diff,
               'lvl:' || o_orderpriority AS src
        FROM orders WHERE o_custkey < 200 GROUP BY o_orderpriority
        UNION ALL
        SELECT o_custkey, round(sum(o_totalprice), 2) AS diff,
               'loc_list' AS src
        FROM orders WHERE o_custkey IN (11, 13, 17) GROUP BY o_custkey
        UNION ALL
        SELECT o_custkey, round(sum(o_totalprice), 2) AS diff,
               'loc_slice' AS src
        FROM orders WHERE o_custkey BETWEEN 30 AND 40 GROUP BY o_custkey
        UNION ALL
        SELECT o_custkey, round(sum(o_totalprice), 2) AS diff,
               'swapdrop' AS src
        FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
        UNION ALL
        SELECT o_custkey, CAST(o_orderkey AS DOUBLE) AS diff,
               'mi_head' AS src
        FROM (SELECT o_custkey, o_orderkey FROM orders
              ORDER BY o_custkey, o_orderkey LIMIT 5)
    """,
    "op_groupby_custom": """
        WITH f AS (
            SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM orders WHERE o_custkey < 100
        ), g AS (
            SELECT o_orderpriority,
                   avg(o_totalprice) AS grp_mean,
                   exp(avg(ln(o_totalprice))) AS geomean,
                   md5(string_agg(CAST(o_orderkey AS VARCHAR), ''
                       ORDER BY CAST(o_orderkey AS VARCHAR))) AS keycat_md5
            FROM f GROUP BY o_orderpriority
        )
        SELECT o_orderkey, f.o_orderpriority,
               round(o_totalprice - grp_mean, 2) AS dev,
               round(geomean, 2) AS geomean,
               keycat_md5
        FROM f JOIN g ON f.o_orderpriority = g.o_orderpriority
    """,
    "op_learn_metrics": """
        WITH t AS (
            SELECT CAST(event_id % 2 AS BIGINT) AS y,
                   CAST((event_id * 37) % 1000 AS DOUBLE) / 1000.0 AS s
            FROM events
        ), p AS (
            SELECT y, s, CASE WHEN s >= 0.5 THEN 1 ELSE 0 END AS pred FROM t
        ), base AS (
            SELECT avg(CASE WHEN pred = y THEN 1.0 ELSE 0.0 END) AS acc,
                   CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS tp,
                   CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS fp,
                   CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS fn,
                   avg(-(y * ln(least(greatest(s, 1e-15), 1 - 1e-15))
                         + (1 - y) * ln(1 - least(greatest(s, 1e-15),
                                                  1 - 1e-15)))) AS ll
            FROM p
        ), per_s AS (
            SELECT s, count(*) AS c, sum(y) AS np FROM t GROUP BY s
        ), pre AS (
            SELECT s, c, np,
                   sum(c) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                       AS bef
            FROM per_s
        ), a AS (
            SELECT sum((bef + (c + 1) / 2.0) * np) AS rpos,
                   sum(np) AS npos, sum(c - np) AS nneg
            FROM pre
        )
        , reg AS (
            SELECT covar_samp(s2.s, e2.value) / var_samp(s2.s) AS slope,
                   avg(e2.value) - covar_samp(s2.s, e2.value)
                       / var_samp(s2.s) * avg(s2.s) AS intercept,
                   corr(s2.s, e2.value) * corr(s2.s, e2.value) AS r2,
                   var_pop(e2.value)
                       * (1 - corr(s2.s, e2.value) * corr(s2.s, e2.value))
                       AS mse
            FROM (SELECT event_id,
                         CAST((event_id * 37) % 1000 AS DOUBLE) / 1000.0 AS s
                  FROM events) s2
            JOIN events e2 USING (event_id)
        )
        SELECT floor(acc * 1e6 + 0.5) / 1e6 AS accuracy,
               floor(tp / (tp + fp) * 1e6 + 0.5) / 1e6 AS prec,
               floor(tp / (tp + fn) * 1e6 + 0.5) / 1e6 AS recall,
               floor(2 * (tp / (tp + fp)) * (tp / (tp + fn))
                     / ((tp / (tp + fp)) + (tp / (tp + fn)))
                     * 1e6 + 0.5) / 1e6 AS f1,
               floor(ll * 1e6 + 0.5) / 1e6 AS log_loss,
               floor((rpos - npos * (npos + 1) / 2) / (npos * nneg)
                     * 1e6 + 0.5) / 1e6 AS auc,
               floor(slope * 1e4 + 0.5) / 1e4 AS slope,
               floor(intercept * 1e4 + 0.5) / 1e4 AS intercept,
               floor(r2 * 1e6 + 0.5) / 1e6 AS r2,
               floor(mse * 1e4 + 0.5) / 1e4 AS mse,
               floor(((pc.vx + pc.vy) / 2
                      + sqrt(power((pc.vx - pc.vy) / 2, 2)
                             + pc.cv * pc.cv)) / (pc.vx + pc.vy)
                     * 1e6 + 0.5) / 1e6 AS pca_ev1,
               floor(mm.mm_mean * 1e6 + 0.5) / 1e6 AS mm_mean,
               le.le_sum,
               floor(slope * 1e4 + 0.5) / 1e4 AS glm_slope,
               sp.split_tr_n, sp.split_tr_vsum,
               sp.split_te_n, sp.split_te_vsum,
               -- ensemble contracts (expected constants — see
               -- op_learn_metrics._ens: subsamples are layout-
               -- dependent, the contracts are not)
               CAST(3 AS BIGINT) AS ifor_top,
               CAST(1 AS BIGINT) AS bag_exact,
               -- fbeta (β=2) from the same confusion sums
               floor(5 * (tp / (tp + fp)) * (tp / (tp + fn))
                     / (4 * (tp / (tp + fp)) + (tp / (tp + fn)))
                     * 1e6 + 0.5) / 1e6 AS fbeta2,
               -- trapezoid auc over the distinct-score roc curve ==
               -- the rank-based estimator (ties are the diagonal
               -- segment in both)
               floor((rpos - npos * (npos + 1) / 2) / (npos * nneg)
                     * 1e6 + 0.5) / 1e6 AS auc_trap,
               kfold.kf0, kfold.kf1, kfold.kf2, kfold.kf3,
               -- blockwise per-partition OLS recovers an exact linear
               -- label from any block (constant contract)
               CAST(1 AS BIGINT) AS bv_exact,
               -- tree-ensemble contracts (learn/gbm.py _gbm: GBT
               -- training accuracy 1.0 on a margin-separated problem
               -- with every inter-value split available; informative
               -- dim leads the importances; depth-3 tree exact on a
               -- 4-valued step — constants under any layout)
               CAST(1 AS BIGINT) AS gbt_sep,
               CAST(1 AS BIGINT) AS gbt_imp,
               CAST(1 AS BIGINT) AS dtr_exact,
               -- bounded roc_curve (1000 equal-width bins, bucket
               -- threshold = max in-bucket score) is IDENTICAL to
               -- the exact distinct-score curve on the k/1000 score
               -- grid: every distinct score owns its own bucket
               -- (floor((k/1000)/0.999*1000) = k for k<999), so the
               -- parity is an expected constant
               CAST(1 AS BIGINT) AS roc_binned_eq,
               vu.vu_n, vsh.vu_sh, vet.vu_et0, vet.vu_et1, vu.vu_ok
        FROM base CROSS JOIN a CROSS JOIN reg
        CROSS JOIN (
            -- KFold md5 hash folds (learn/extras.py): fold =
            -- hex-prefix of md5('seed|id') mod 4, seed 5
            SELECT sum(CASE WHEN fold = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS kf0,
                   sum(CASE WHEN fold = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS kf1,
                   sum(CASE WHEN fold = 2 THEN 1 ELSE 0 END)::BIGINT
                       AS kf2,
                   sum(CASE WHEN fold = 3 THEN 1 ELSE 0 END)::BIGINT
                       AS kf3
            FROM (SELECT ('0x' || substr(md5('5|' ||
                              CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                         % 4 AS fold
                  FROM events)) kfold
        CROSS JOIN (
            SELECT var_samp(CAST((event_id * 37) % 1000 AS DOUBLE)
                            / 1000.0) AS vx,
                   var_samp(value) AS vy,
                   covar_samp(CAST((event_id * 37) % 1000 AS DOUBLE)
                              / 1000.0, value) AS cv
            FROM events) pc
        CROSS JOIN (
            SELECT (avg(value) - min(value))
                   / (max(value) - min(value)) AS mm_mean
            FROM events) mm
        CROSS JOIN (
            SELECT sum(code)::BIGINT AS le_sum
            FROM events ev
            JOIN (SELECT event_type,
                         row_number() OVER (ORDER BY event_type) - 1
                             AS code
                  FROM (SELECT DISTINCT event_type FROM events))
                USING (event_type)) le
        -- hash_split (learn/facade.py): test iff substr(md5(seed|id),
        -- 1,6) < hex(0.25 * 16^6) = '400000', seed 11
        CROSS JOIN (
            SELECT CAST(sum(CASE WHEN k >= '400000' THEN 1 ELSE 0 END)
                        AS BIGINT) AS split_tr_n,
                   floor(sum(CASE WHEN k >= '400000' THEN value END)
                         * 1e4 + 0.5) / 1e4 AS split_tr_vsum,
                   CAST(sum(CASE WHEN k < '400000' THEN 1 ELSE 0 END)
                        AS BIGINT) AS split_te_n,
                   floor(sum(CASE WHEN k < '400000' THEN value END)
                         * 1e4 + 0.5) / 1e4 AS split_te_vsum
            FROM (SELECT value,
                         substr(md5('11|' || event_id), 1, 6) AS k
                  FROM events)) sp
        -- r13 graduations: validation utils (vu_n = the consistent
        -- length both slices share; vu_ok pins check_array/check_X_y
        -- completing), learn.shuffle (first-5 sum under the SAME
        -- md5('0' || US || id) permutation key), ExecutableTuple
        -- (two aggregates collected as one unit)
        CROSS JOIN (
            SELECT count(*)::BIGINT AS vu_n,
                   CAST(1 AS BIGINT) AS vu_ok
            FROM events WHERE event_id < 500) vu
        CROSS JOIN (
            SELECT sum(event_id)::BIGINT AS vu_sh FROM (
                SELECT event_id FROM events WHERE event_id < 500
                ORDER BY md5(concat_ws(chr(31), '0',
                                       CAST(event_id AS VARCHAR)))
                LIMIT 5)) vsh
        CROSS JOIN (
            SELECT count(*)::BIGINT AS vu_et0,
                   floor(sum(value) * 1e4 + 0.5) / 1e4 AS vu_et1
            FROM events WHERE event_id < 200) vet
    """,
    "op_groupby_rowops": """
        WITH f AS (
            SELECT user_id, event_id, value,
                   CASE WHEN value > 5.0 THEN value END AS v0
            FROM events WHERE user_id < 40
        ), ff AS (
            SELECT user_id, event_id, value,
                   coalesce(
                       last_value(v0 IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       first_value(v0 IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   ) AS v
            FROM f
        ), ag AS (
            SELECT user_id, count(event_id) AS n,
                   round(sum(v), 4) AS v_sum,
                   round(max(v) - min(v), 4) AS v_rng,
                   round(quantile_cont(v, 0.5), 4) AS v_med,
                   -- gb.median convenience method on the RAW value
                   round(quantile_cont(value, 0.5), 4) AS g_med,
                   -- gb.sem = stddev_samp / sqrt(count)
                   round(stddev_samp(value)
                         / sqrt(count(value)), 4) AS g_sem,
                   least(5, count(*)) AS n_samp
            FROM ff GROUP BY user_id
        ), gp AS (
            -- gb.prod over integer-exact factors ((event_id%3)+1 on
            -- the event_id%53 slice; product < 2^53, bit-identical
            -- in any accumulation order)
            SELECT user_id,
                   product(CAST(event_id % 3 + 1 AS DOUBLE)) AS g_prod
            FROM f WHERE event_id % 53 = 0 GROUP BY user_id
        ), gmean AS (
            SELECT user_id, avg(value) AS mu FROM f GROUP BY user_id
        ), gmom AS (
            -- gb.skew / gb.kurt: pandas SAMPLE statistics (G1/G2
            -- bias corrections over the population central moments),
            -- replayed two-pass (mean join, then moments) — the
            -- well-conditioned formulation, correction factors
            -- applied exactly as core/groupby.py _skew_g1/_kurt_g2 do
            SELECT f.user_id,
                   round(avg(pow(value - mu, 3))
                         / pow(avg(pow(value - mu, 2)), 1.5)
                         * sqrt(count(*) * (count(*) - 1.0))
                         / (count(*) - 2.0), 4)
                       AS g_skew,
                   round((count(*) - 1.0)
                         / ((count(*) - 2.0) * (count(*) - 3.0))
                         * ((count(*) + 1.0)
                            * (avg(pow(value - mu, 4))
                               / pow(avg(pow(value - mu, 2)), 2) - 3)
                            + 6), 4)
                       AS g_kurt
            FROM f JOIN gmean USING (user_id)
            GROUP BY f.user_id
        ), gbool AS (
            -- gb.any / gb.all on derived predicates
            SELECT user_id,
                   bool_or(value > 500.0) AS g_any,
                   bool_and(value > 1.0) AS g_all
            FROM f GROUP BY user_id
        ), d AS (
            SELECT CAST(count(value) AS BIGINT) AS desc_count,
                   floor(avg(value) * 1e4 + 0.5) / 1e4 AS desc_mean,
                   floor(stddev_samp(value) * 1e4 + 0.5) / 1e4 AS desc_std
            FROM f
        ), itp_base AS (
            SELECT user_id, v0,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY event_id) AS rn
            FROM f
        ), itp_win AS (
            SELECT user_id, v0, rn,
                   last_value(v0 IGNORE NULLS) OVER wb AS pv,
                   first_value(v0 IGNORE NULLS) OVER wf AS nv,
                   last_value(CASE WHEN v0 IS NOT NULL THEN rn END
                              IGNORE NULLS) OVER wb AS prn,
                   first_value(CASE WHEN v0 IS NOT NULL THEN rn END
                               IGNORE NULLS) OVER wf AS nrn
            FROM itp_base
            WINDOW wb AS (PARTITION BY user_id ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW),
                   wf AS (PARTITION BY user_id ORDER BY rn
                          ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING)
        ), itp AS (
            SELECT user_id, round(sum(
                CASE WHEN v0 IS NOT NULL THEN v0
                     WHEN pv IS NULL THEN NULL
                     WHEN nv IS NULL THEN pv
                     ELSE pv + (nv - pv) * (rn - prn)
                          / CAST(nrn - prn AS DOUBLE)
                END), 4) AS vi_sum
            FROM itp_win GROUP BY user_id
        )
        SELECT user_id, n, v_sum, v_rng, v_med, vi_sum, g_med,
               g_sem, g_skew, g_kurt, g_any, g_all, g_prod,
               n_samp, desc_count, desc_mean, desc_std
        FROM ag CROSS JOIN d JOIN itp USING (user_id)
        JOIN gmom USING (user_id)
        JOIN gbool USING (user_id)
        LEFT JOIN gp USING (user_id)
    """,
    "op_ewm_expanding": """
        WITH b AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY event_id) - 1 AS i
            FROM events WHERE user_id < 30
        ), s AS (
            SELECT user_id, event_id, i,
                   sum(value * power(0.8, -i)) OVER (
                       PARTITION BY user_id ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc,
                   sum(value) OVER (
                       PARTITION BY user_id ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS es,
                   -- mean as the sequential sum over count: DuckDB's
                   -- windowed AVG accumulates differently from Spark's
                   -- sum/count and drifts in the last ulp
                   sum(value) OVER (
                       PARTITION BY user_id ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       / (i + 1) AS em
            FROM b
        ), ug AS (
            -- r14 ungrouped dims: GLOBAL event_id order over the
            -- user_id < 10 slice; the engine side distributes via
            -- boundary pads / prefix + geometric carries, the oracle
            -- replays plain global windows + the scaled-prefix EWM
            -- closed forms (safe: power(0.8, -i) needs i < ~3300)
            SELECT event_id, value,
                   row_number() OVER (ORDER BY event_id) - 1 AS i
            FROM events WHERE user_id < 10
        ), ugs AS (
            SELECT event_id, value, i,
                   sum(value * power(0.8, -i)) OVER w AS scx,
                   sum(value * value * power(0.8, -i)) OVER w AS scx2,
                   sum(value) OVER w AS cs,
                   lag(value) OVER (ORDER BY i) AS sh,
                   last_value(CASE WHEN value >= 50 THEN value END
                              IGNORE NULLS) OVER w AS fl
            FROM ug
            WINDOW w AS (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ), ugv AS (
            SELECT event_id, i, cs, sh, fl,
                   (1 - power(0.8, i + 1)) / 0.2 AS sw,
                   (1 - power(0.64, i + 1)) / 0.36 AS sw2,
                   scx * power(0.8, i) AS swx,
                   scx2 * power(0.8, i) AS swx2
            FROM ugs
        ), ugr AS (
            SELECT event_id,
                   floor(swx / sw * 1e4 + 0.5 + 1e-6) / 1e4 AS ug_ewm,
                   CASE WHEN sw * sw - sw2 > 0 THEN
                       floor(greatest(swx2 / sw - (swx / sw) * (swx / sw),
                                      0.0) * sw * sw / (sw * sw - sw2)
                             * 1e4 + 0.5 + 1e-6) / 1e4
                   END AS ug_ewm_var,
                   floor(sh * 1e4 + 0.5 + 1e-6) / 1e4 AS ug_shift,
                   floor(cs * 1e4 + 0.5 + 1e-6) / 1e4 AS ug_cumsum,
                   floor(fl * 1e4 + 0.5 + 1e-6) / 1e4 AS ug_ffill
            FROM ugv
        )
        SELECT s.user_id, s.event_id,
               floor(sc * power(0.8, i) * 0.2 / (1 - power(0.8, i + 1))
                     * 1e4 + 0.5 + 1e-6) / 1e4 AS ewm_mean,
               floor(es * 1e4 + 0.5 + 1e-6) / 1e4 AS exp_sum,
               floor(em * 1e4 + 0.5 + 1e-6) / 1e4 AS exp_mean,
               ugr.ug_ewm, ugr.ug_ewm_var, ugr.ug_shift,
               ugr.ug_cumsum, ugr.ug_ffill
        FROM s LEFT JOIN ugr USING (event_id)
    """,
    "op_series_misc": """
        WITH f AS (SELECT * FROM part WHERE p_partkey < 80),
        sc AS (
            SELECT round(sum(p_retailprice * p_size), 2) AS dot,
                   sum(CAST(regexp_extract(p_brand, '#([0-9]+)', 1)
                            AS DOUBLE)) AS brand_sum,
                   sum(CASE p_type WHEN 'ECONOMY' THEN 1.0
                        WHEN 'SMALL' THEN 2.0 WHEN 'STANDARD' THEN 3.0
                        WHEN 'LARGE' THEN 4.0 WHEN 'PROMO' THEN 5.0
                        WHEN 'MEDIUM' THEN 6.0 END) AS type_sum,
                   -- map_chunk / transform_batch row-wise funcs
                   round(sum(CAST(p_size AS DOUBLE) * 2.0
                             + p_retailprice), 2) AS mc_sum,
                   round(sum(p_retailprice + 1.0), 2) AS tb_sum,
                   -- CustomReduction mergeable mean (sum/count
                   -- partials) and module-level eval expression
                   round(sum(p_retailprice) / count(p_retailprice), 2)
                       AS cred_mean,
                   round(sum(p_retailprice * 2
                             + CAST(p_size AS DOUBLE) / 4), 2)
                       AS meval_sum,
                   -- mars_scheduler dask-spec graph: leaf engine
                   -- aggregates combined by the dependent task
                   round(sum(p_retailprice)
                         + 2.0 * sum(CAST(p_size AS DOUBLE)), 2)
                       AS dask_ck,
                   -- joblib batch path: 3*4 + (1.5+2.5), a closed
                   -- form the batched spawn/execute must reproduce
                   CAST(16.0 AS DOUBLE) AS jl_ck,
                   -- plot accessor: the bounded collect returns the
                   -- full slice (79 rows < max_rows); content pinned
                   -- by the retailprice sum, guard fired (else -1)
                   round(sum(p_retailprice), 2) AS plot_ck,
                   -- remote.spawn graph (max + 3*min through the
                   -- wave scheduler) finished by run_script's
                   -- injected-globals arithmetic (*2 + 1)
                   round((max(p_retailprice)
                          + 3.0 * min(p_retailprice)) * 2.0 + 1.0, 2)
                       AS spawn_ck
            FROM f
        ), cc AS (
            -- cartesian_chunk: part slice x region, row-wise func
            SELECT round(sum(f.p_retailprice
                             * (r.r_regionkey + 1.0)), 2) AS cc_sum
            FROM f CROSS JOIN region r
        ), sh AS (
            -- learn.shuffle: the permutation IS the md5(seed||key)
            -- sort order; weight the first five keys by position
            SELECT CAST(sum(rn * p_partkey) AS DOUBLE) AS shuf_ck
            FROM (
                SELECT p_partkey, row_number() OVER (
                    ORDER BY md5(concat('1', chr(31),
                                        CAST(p_partkey AS VARCHAR))))
                    AS rn
                FROM f)
            WHERE rn <= 5
        )
        SELECT p_partkey, 'size_d' AS variable,
               round(CAST(p_size AS DOUBLE), 2) AS value,
               dot, brand_sum, type_sum, mc_sum, tb_sum, cc_sum,
               cred_mean, meval_sum, shuf_ck, dask_ck, jl_ck,
               plot_ck, spawn_ck
        FROM f CROSS JOIN sc CROSS JOIN cc CROSS JOIN sh
        UNION ALL
        SELECT p_partkey, 'p_retailprice', round(p_retailprice, 2),
               dot, brand_sum, type_sum, mc_sum, tb_sum, cc_sum,
               cred_mean, meval_sum, shuf_ck, dask_ck, jl_ck,
               plot_ck, spawn_ck
        FROM f CROSS JOIN sc CROSS JOIN cc CROSS JOIN sh
    """,
    "op_rank_cumprod": """
        WITH f AS (
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
                   row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                                      l_quantity, l_discount) - 1 AS sq
            FROM lineitem WHERE l_orderkey < 1500
        ), r AS (
            SELECT *,
                   rank() OVER (ORDER BY l_quantity) AS rmin,
                   count(*) OVER (PARTITION BY l_quantity) AS cnt,
                   dense_rank() OVER (ORDER BY l_quantity) AS rdense,
                   row_number() OVER (ORDER BY l_quantity, sq) AS rfirst
            FROM f
        )
        SELECT sq, l_orderkey, l_linenumber,
               CAST(rmin + (cnt - 1) / 2.0 AS DOUBLE) AS r_avg,
               CAST(rmin AS DOUBLE) AS r_min,
               CAST(rmin + cnt - 1 AS DOUBLE) AS r_max,
               CAST(rdense AS DOUBLE) AS r_dense,
               CAST(rfirst AS DOUBLE) AS r_first,
               round((rmin + (cnt - 1) / 2.0)
                     / (count(*) OVER ()), 6) AS r_pct,
               round(product(1.0 + l_discount) OVER (
                   PARTITION BY l_orderkey ORDER BY sq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS cum_growth,
               CAST(50 AS BIGINT) AS n_samp
        FROM r
    """,
    "op_io_roundtrip": """
        WITH agg AS (
            SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id,
                   round(sum(value), 2) AS sum_value
            FROM events
        ), range_agg AS (
            SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s
            FROM generate_series(0, 999, 3) t(x)
        ), dr_agg AS (
            SELECT count(*) AS n,
                   CAST(sum(CAST(epoch(TIMESTAMP '2024-01-01 00:00:00'
                                       + x * INTERVAL 1 HOUR) AS BIGINT))
                        AS BIGINT) AS s
            FROM generate_series(0, 239) t(x)
        ), fp_agg AS (
            SELECT count(*) AS n, round(sum(x + x * 0.5), 2) AS s
            FROM generate_series(0, 19) t(x)
        ), sql_agg AS (
            SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS s,
                   round(sum(value), 2) AS sv
            FROM events WHERE event_id % 97 = 0
        ), fr_agg AS (
            -- r14 from_records: (i, i*i mod 13) over range(37)
            SELECT count(*) AS n,
                   CAST(sum(x * ((x * x) % 13)) AS BIGINT) AS s
            FROM generate_series(0, 36) t(x)
        ), ft_agg AS (
            -- r14 from_tensor 2-D: row i = ((3i)%7, (3i+1)%7,
            -- (3i+2)%7); checksum a + 2b + 3c
            SELECT count(*) AS n,
                   CAST(sum((3 * x) % 7 + 2 * ((3 * x + 1) % 7)
                            + 3 * ((3 * x + 2) % 7)) AS BIGINT) AS s
            FROM generate_series(0, 15) t(x)
        ), fts_agg AS (
            -- r14 from_tensor 1-D (Series): i*i mod 11 over range(29)
            SELECT count(*) AS n,
                   CAST(sum((x * x) % 11) AS BIGINT) AS s
            FROM generate_series(0, 28) t(x)
        )
        SELECT agg.n AS n_csv, sum_id AS sum_id_csv,
               sum_value AS sum_value_csv,
               agg.n AS n_json, sum_id AS sum_id_json,
               sum_value AS sum_value_json,
               agg.n AS n_orc, sum_id AS sum_id_orc,
               sum_value AS sum_value_orc,
               range_agg.n AS n_range, range_agg.s AS sum_range,
               dr_agg.n AS n_dr, dr_agg.s AS sum_dr,
               fp_agg.n AS n_fp, CAST(fp_agg.s AS DOUBLE) AS sum_fp,
               agg.n AS n_shuf, sum_id AS sum_id_shuf,
               fr_agg.n AS n_fr, fr_agg.s AS sum_fr,
               ft_agg.n AS n_ft, ft_agg.s AS sum_ft,
               fts_agg.n AS n_fts, fts_agg.s AS sum_fts,
               sql_agg.n AS n_sql, sql_agg.s AS sum_id_sql,
               sql_agg.sv AS sum_value_sql
        FROM agg, range_agg, dr_agg, fp_agg, sql_agg, fr_agg, ft_agg,
             fts_agg
    """,
    "op_knn_kmeans": """
        WITH X AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
        ), test AS (
            SELECT vec_id, e AS f FROM X WHERE vec_id < 20
        ), train AS (
            SELECT e AS tf, label FROM X
        ), dists AS (
            -- k-selection tie-break mirrors the engine's lexsort
            -- (distance, then label) — deterministic on equal distances
            SELECT t.vec_id, tr.label,
                   list_distance(t.f, tr.tf) AS d,
                   row_number() OVER (PARTITION BY t.vec_id
                                      ORDER BY list_distance(t.f, tr.tf),
                                               tr.label)
                       AS rn
            FROM test t CROSS JOIN train tr
        ), votes AS (
            SELECT vec_id, label, count(*) AS n, min(d) AS best
            FROM dists WHERE rn <= 5
            GROUP BY vec_id, label
        ), knn AS (
            SELECT vec_id, label AS prediction
            FROM (SELECT vec_id, label,
                         row_number() OVER (PARTITION BY vec_id
                             ORDER BY n DESC, best ASC, label ASC) AS rv
                  FROM votes)
            WHERE rv = 1
        ), pos AS (
            -- dims derived from the data, not hard-coded
            SELECT unnest(range(1, (SELECT len(e) FROM X LIMIT 1) + 1))
                AS i
        ), c0 AS (
            SELECT vec_id::INT AS cl, e AS c FROM X WHERE vec_id < 4
        ), asg1 AS (
            SELECT vec_id, e, cl FROM (
                SELECT x.vec_id, x.e, c.cl,
                       row_number() OVER (PARTITION BY x.vec_id
                           ORDER BY list_distance(x.e, c.c), c.cl) AS rn
                FROM X x CROSS JOIN c0 c) WHERE rn = 1
        ), m1 AS (
            SELECT cl, list(floor(m * 1e6 + 0.5) / 1e6 ORDER BY i) AS c
            FROM (SELECT cl, i, avg(e[i]) AS m
                  FROM asg1 CROSS JOIN pos GROUP BY cl, i)
            GROUP BY cl
        ), c1 AS (
            SELECT c0.cl, coalesce(m1.c, c0.c) AS c
            FROM c0 LEFT JOIN m1 ON c0.cl = m1.cl
        ), asg2 AS (
            SELECT vec_id, e, cl FROM (
                SELECT x.vec_id, x.e, c.cl,
                       row_number() OVER (PARTITION BY x.vec_id
                           ORDER BY list_distance(x.e, c.c), c.cl) AS rn
                FROM X x CROSS JOIN c1 c) WHERE rn = 1
        ), m2 AS (
            SELECT cl, list(floor(m * 1e6 + 0.5) / 1e6 ORDER BY i) AS c
            FROM (SELECT cl, i, avg(e[i]) AS m
                  FROM asg2 CROSS JOIN pos GROUP BY cl, i)
            GROUP BY cl
        ), c2 AS (
            SELECT c1.cl, coalesce(m2.c, c1.c) AS c
            FROM c1 LEFT JOIN m2 ON c1.cl = m2.cl
        ), fin AS (
            SELECT vec_id, e, cl FROM (
                SELECT x.vec_id, x.e, c.cl,
                       row_number() OVER (PARTITION BY x.vec_id
                           ORDER BY list_distance(x.e, c.c), c.cl) AS rn
                FROM X x CROSS JOIN c2 c) WHERE rn = 1
        ), km AS (
            SELECT f.cl, count(*) AS n,
                   floor(avg(power(list_distance(f.e, c.c), 2)) * 1e4
                         + 0.5) / 1e4 AS msd
            FROM fin f JOIN c2 c ON f.cl = c.cl
            GROUP BY f.cl
        )
        SELECT 'knn' AS tag, vec_id::BIGINT AS id,
               prediction::BIGINT AS val, NULL::DOUBLE AS score
        FROM knn
        UNION ALL
        SELECT 'km' AS tag, cl::BIGINT AS id, n::BIGINT AS val,
               msd AS score
        FROM km
        UNION ALL
        -- pairwise-distance family (learn/pairwise.py): the gemm
        -- kernel's ||x||^2+||y||^2-2x.y expansion restated with list
        -- ops; Y = the 4 lowest-id vectors
        SELECT * FROM (
            WITH ev AS (
                SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), yv AS (
                SELECT vec_id AS yid, v AS yvec FROM ev WHERE vec_id < 4
            ), pw AS (
                SELECT ev.vec_id AS a, yid AS b,
                       list_sum(list_transform(ev.v, x -> x*x)) AS x2,
                       list_sum(list_transform(yvec, x -> x*x)) AS y2,
                       list_sum([ev.v[i] * yvec[i]
                                 for i in range(1, len(ev.v) + 1)]) AS xy
                FROM ev CROSS JOIN yv
            )
            SELECT 'eu' AS tag, a AS id, b AS val,
                   round(sqrt(greatest(x2 + y2 - 2*xy, 0)), 4) AS score
            FROM pw
            UNION ALL
            SELECT 'cos' AS tag, a AS id, b AS val,
                   round(greatest(1 - xy / (sqrt(x2) * sqrt(y2)), 0), 4)
                       AS score
            FROM pw
            UNION ALL
            SELECT 'tk' || rn AS tag, a AS id, b AS val,
                   round(sqrt(greatest(x2 + y2 - 2*xy, 0)), 4) AS score
            FROM (SELECT a, b, x2, y2, xy,
                         row_number() OVER (
                             PARTITION BY a
                             ORDER BY sqrt(greatest(x2 + y2 - 2*xy, 0)), b)
                             AS rn
                  FROM pw)
            WHERE rn <= 2
            UNION ALL
            -- NearestNeighbors: per-QUERY 3 nearest table rows
            -- (engine rounds dist to 6 dp then the stratum to 4)
            SELECT 'nn' || rq AS tag, a AS id, b AS val,
                   round(round(sqrt(greatest(x2 + y2 - 2*xy, 0)), 6), 4)
                       AS score
            FROM (SELECT a, b, x2, y2, xy,
                         row_number() OVER (
                             PARTITION BY b
                             ORDER BY sqrt(greatest(x2 + y2 - 2*xy, 0)), a)
                             AS rq
                  FROM pw)
            WHERE rq <= 3
        )
        UNION ALL
        -- make_blobs(400x3, 3 centers, std .5, seed 7): regenerate the
        -- md5-derived Box-Muller draws (learn/datasets.py) in SQL
        SELECT * FROM (
            WITH cent AS (
                SELECT c, j,
                       (2 * ((CAST(concat('0x', substr(md5(
                            '7|c|' || c || '|' || j), 1, 15)) AS BIGINT)
                            + 1.0) / (16.0^15 + 1.0)) - 1) * 10.0 AS cv
                FROM range(3) tc(c), range(3) tj(j)
            ), bf AS (
                SELECT s.range AS sid, s.range % 3 AS label,
                       cent.cv + 0.5
                       * sqrt(-2 * ln((CAST(concat('0x', substr(md5(
                             '7|' || s.range || '|' || cent.j || '|u1'),
                             1, 15)) AS BIGINT) + 1.0) / (16.0^15 + 1.0)))
                       * cos(2 * pi() * ((CAST(concat('0x', substr(md5(
                             '7|' || s.range || '|' || cent.j || '|u2'),
                             1, 15)) AS BIGINT) + 1.0) / (16.0^15 + 1.0)))
                       AS f
                FROM range(400) s, cent
                WHERE cent.c = s.range % 3
            )
            SELECT 'blob' AS tag, label::BIGINT AS id,
                   count(*)::BIGINT AS val,
                   round(sum(round(f, 4)), 4) AS score
            FROM bf GROUP BY label
        )
        UNION ALL
        -- make_regression(300x3, noise 0, bias 2, seed 3): target =
        -- 2 + sum_j w_j x_j with w_j = 100*u('3|w|j'), x_j Box-Muller
        SELECT * FROM (
            WITH xs AS (
                SELECT s.range AS sid, tj.j,
                       sqrt(-2 * ln((CAST(concat('0x', substr(md5(
                            '3|' || s.range || '|' || tj.j || '|u1'),
                            1, 15)) AS BIGINT) + 1.0) / (16.0^15 + 1.0)))
                       * cos(2 * pi() * ((CAST(concat('0x', substr(md5(
                            '3|' || s.range || '|' || tj.j || '|u2'),
                            1, 15)) AS BIGINT) + 1.0) / (16.0^15 + 1.0)))
                       AS x,
                       100.0 * ((CAST(concat('0x', substr(md5('3|w|' || tj.j),
                            1, 15)) AS BIGINT) + 1.0) / (16.0^15 + 1.0)) AS w
                FROM range(300) s, range(3) tj(j)
            ), tgt AS (
                SELECT sid, 2.0 + sum(w * x) AS t
                FROM xs GROUP BY sid
            )
            SELECT 'reg' AS tag, (sid % 5)::BIGINT AS id,
                   count(*)::BIGINT AS val,
                   round(sum(round(t, 4)), 4) AS score
            FROM tgt GROUP BY sid % 5
        )
    """,
}
