"""DuckDB oracle SQL for the operator-level corpus (ops.py)."""

OPS_ORACLES: dict[str, str] = {
    "op_conditional": """
        SELECT l_orderkey, l_linenumber, l_quantity,
               CASE WHEN l_quantity > 25 THEN l_quantity ELSE -1.0 END
                   AS qty_masked,
               l_returnflag IN ('A', 'R') AS in_ar
        FROM lineitem WHERE l_orderkey < 100
    """,
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
                   round(avg(cos(l_discount)), 6) AS avg_cos_disc
            FROM lineitem
        )
        SELECT * FROM per_flag CROSS JOIN tot
    """,
    "op_set_ops": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    "op_window_rank": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders WHERE o_custkey < 200
        ) WHERE rn <= 2
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
    "op_melt": """
        SELECT p_partkey, 'p_size' AS variable, CAST(p_size AS DOUBLE) AS value
        FROM part WHERE p_partkey < 100
        UNION ALL
        SELECT p_partkey, 'p_retailprice', p_retailprice
        FROM part WHERE p_partkey < 100
    """,
    "op_explode_seq": """
        SELECT l_linenumber, count(*) AS n
        FROM (SELECT l_linenumber, unnest(range(1, l_linenumber + 1)) AS pos
              FROM lineitem WHERE l_orderkey < 50)
        GROUP BY l_linenumber
    """,
    "op_json_extract": """
        SELECT CAST(props->>'k' AS BIGINT) % 7 AS k_mod, count(*) AS n,
               CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY k_mod
    """,
    "op_cut_value_counts": """
        SELECT CASE WHEN l_quantity > 0  AND l_quantity <= 10 THEN 'low'
                    WHEN l_quantity > 10 AND l_quantity <= 25 THEN 'mid'
                    WHEN l_quantity > 25 AND l_quantity <= 50 THEN 'high'
               END AS band,
               count(*) AS count
        FROM lineitem
        WHERE l_quantity > 0 AND l_quantity <= 50
        GROUP BY band
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
    """,
    "op_groupby_custom": """
        WITH f AS (
            SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM orders WHERE o_custkey < 100
        ), g AS (
            SELECT o_orderpriority,
                   avg(o_totalprice) AS grp_mean,
                   exp(avg(ln(o_totalprice))) AS geomean
            FROM f GROUP BY o_orderpriority
        )
        SELECT o_orderkey, f.o_orderpriority,
               round(o_totalprice - grp_mean, 2) AS dev,
               round(geomean, 2) AS geomean
        FROM f JOIN g ON f.o_orderpriority = g.o_orderpriority
    """,
}
