"""DuckDB oracle SQL for the operator-level corpus (ops.py)."""

OPS_ORACLES: dict[str, str] = {
    "op_isin": """
        SELECT l_returnflag, count(l_orderkey) AS n
        FROM lineitem WHERE l_returnflag IN ('A', 'R')
        GROUP BY l_returnflag
    """,
    "op_where_mask": """
        SELECT l_orderkey, l_linenumber, l_quantity,
               CASE WHEN l_quantity > 25 THEN l_quantity ELSE -1.0 END AS qty_masked
        FROM lineitem WHERE l_orderkey < 100
    """,
    "op_string_funcs": """
        SELECT c_custkey, upper(c_name) AS name_upper,
               length(c_name) AS name_len,
               CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT)
                   AS id_num
        FROM customer WHERE c_custkey < 100
    """,
    "op_dt_funcs": """
        SELECT CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(quarter(o_orderdate) AS INT) AS q,
               count(o_orderkey) AS n
        FROM orders GROUP BY y, m, q
    """,
    "op_nullif_fillna": """
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               round(avg(coalesce(nullif(l_discount, 0.0), -1.0)), 6)
                   AS avg_filled
        FROM lineitem
    """,
    "op_drop_duplicates": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
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
    "op_quantile": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 4) AS p25,
               round(quantile_cont(l_quantity, 0.50), 4) AS p50,
               round(quantile_cont(l_quantity, 0.75), 4) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    "op_corr_cov": """
        SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
        FROM lineitem
    """,
    "op_json_extract": """
        SELECT CAST(props->>'k' AS BIGINT) % 7 AS k_mod, count(*) AS n,
               CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY k_mod
    """,
    "op_cut_bucket": """
        SELECT CASE WHEN l_quantity > 0  AND l_quantity <= 10 THEN 'low'
                    WHEN l_quantity > 10 AND l_quantity <= 25 THEN 'mid'
                    WHEN l_quantity > 25 AND l_quantity <= 50 THEN 'high'
               END AS band,
               count(l_orderkey) AS n
        FROM lineitem GROUP BY band
    """,
    "op_asof_join": """
        SELECT c.event_id, c.user_id, v.event_id AS view_id
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                        WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    "op_value_counts": """
        SELECT o_orderpriority, count(*) AS count
        FROM orders GROUP BY o_orderpriority
    """,
}
