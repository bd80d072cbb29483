"""DuckDB oracle SQL for the TPC-H-style corpus (tpch.py).

Aliases, rounding, and pre-LIMIT orderings match the Spark queries
exactly — the driver hash-compares values column-sorted-by-name.
"""

TPCH_ORACLES: dict[str, str] = {
    "tpch_q21_adapted": """
        WITH j AS (
            SELECT l_orderkey, l_suppkey, l_shipdate,
                   o_orderdate, o_orderstatus
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        multi AS (
            SELECT l_orderkey FROM j
            GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1
        ),
        late AS (
            SELECT * FROM j WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        ),
        onelate AS (
            SELECT l_orderkey FROM late
            GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) = 1
        )
        SELECT s_name, count(*) AS numwait
        FROM late
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
          AND l_orderkey IN (SELECT l_orderkey FROM multi)
          AND l_orderkey IN (SELECT l_orderkey FROM onelate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    "tpch_q02_adapted": """
        WITH per_sup AS (
            SELECT p_type, s_suppkey, s_name, n_name,
                   round(min(l_extendedprice / l_quantity), 2) AS min_price
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY p_type, s_suppkey, s_name, n_name
        )
        SELECT per_sup.p_type, s_suppkey, s_name, n_name, min_price
        FROM per_sup
        JOIN (SELECT p_type, min(min_price) AS best
              FROM per_sup GROUP BY p_type) b
          ON per_sup.p_type = b.p_type AND per_sup.min_price = b.best
    """,
    "tpch_q11_adapted": """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_8'
            GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(round(value, 2) AS DOUBLE) AS value
        FROM per_part
        WHERE value > (SELECT sum(value) * 0.0001 FROM per_part)
    """,
    "tpch_q16_adapted": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4, 5)
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q20_adapted": """
        WITH per_sup AS (
            SELECT l_suppkey, sum(l_quantity) AS qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%widget%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM per_sup
            WHERE qty > (SELECT avg(qty) * 0.5 FROM per_sup))
        ORDER BY s_suppkey
    """,
    "tpch_q01": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                   AS sum_qty,
               round(sum(l_extendedprice), 2)                              AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4)                                   AS avg_qty,
               round(avg(l_extendedprice), 4)                              AS avg_price,
               round(avg(l_discount), 4)                                   AS avg_disc,
               count(l_orderkey)                                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q03_10": """
        WITH a AS (
            SELECT o_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1996-06-30'
              AND l_shipdate  > TIMESTAMP '1996-06-30'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC
            LIMIT 10
        ), b AS (
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        )
        SELECT 'q03' AS grp, o_orderkey AS k,
               CAST(NULL AS VARCHAR) AS name, CAST(NULL AS VARCHAR) AS nat,
               CAST(NULL AS DOUBLE) AS acctbal,
               strftime(o_orderdate, '%Y-%m-%d') AS odate, revenue
        FROM a
        UNION ALL
        SELECT 'q10' AS grp, c_custkey AS k, c_name AS name, n_name AS nat,
               round(c_acctbal, 2) AS acctbal,
               CAST(NULL AS VARCHAR) AS odate, revenue
        FROM b
    """,
    "tpch_q05_07": """
        SELECT 'q5:' || n_name AS grp, CAST(NULL AS INT) AS yr,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        UNION ALL
        SELECT 'q7:' || n1.n_name || '>' || n2.n_name AS grp,
               CAST(year(l_shipdate) AS INT) AS yr,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_7'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY grp, yr
    """,
    "tpch_q08_09": """
        SELECT 'q8' AS grp, CAST(year(o_orderdate) AS INT) AS yr,
               round(sum(CASE WHEN sn.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS val
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        GROUP BY yr
        UNION ALL
        SELECT 'q9:' || n_name AS grp, CAST(year(o_orderdate) AS INT) AS yr,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(30,6))), 2) AS DOUBLE) AS val
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%a%'
        GROUP BY grp, yr
    """,
    "tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q15": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
        ) q
        JOIN orders   ON q.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE sum_qty > 300
        ORDER BY round(o_totalprice, 2) DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 100
    """,
    "tpch_q06_12_14_17_19": """
        WITH q12 AS (
            SELECT o_orderpriority,
                   CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                 THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
                   count(*) AS total_count
            FROM orders
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY o_orderpriority
        ), q06 AS (
            SELECT round(sum(l_extendedprice * l_discount), 2) AS q06_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        ), q14 AS (
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                          THEN l_extendedprice * (1 - l_discount)
                                          ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
        ), q17l AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#13'
        ), q17a AS (
            SELECT l_partkey AS ap_key, avg(l_quantity) AS avg_q
            FROM q17l GROUP BY l_partkey
        ), q17 AS (
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM q17l JOIN q17a ON l_partkey = ap_key
            WHERE l_quantity < 0.2 * avg_q
        ), q19 AS (
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS q19_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity >= 1 AND l_quantity <= 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                   AND l_quantity >= 10 AND l_quantity <= 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                   AND l_quantity >= 20 AND l_quantity <= 30)
        )
        SELECT * FROM q12
        CROSS JOIN q06 CROSS JOIN q14 CROSS JOIN q17 CROSS JOIN q19
    """,
    "tpch_q04_22": """
        SELECT 'prio:' || o_orderpriority AS grp,
               count(*) AS cnt, CAST(NULL AS DOUBLE) AS val
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'seg:' || c_mktsegment AS grp,
               count(*) AS cnt, round(sum(c_acctbal), 2) AS val
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
}
