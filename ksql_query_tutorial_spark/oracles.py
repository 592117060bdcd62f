"""DuckDB oracle SQL for every declared query (SURVEY.md §2.8).

Keys match :data:`ksql_query_tutorial_spark.queries.TUTORIAL_QUERIES`.
Column names/aliases match the Spark DataFrames exactly (driver sorts
columns by name before hashing). Integer SUMs are cast to BIGINT because
DuckDB's SUM(int) yields HUGEINT while Spark yields LongType.
"""

TUTORIAL_ORACLES: dict[str, str] = {
    "q01_full_scan": """
        SELECT * FROM region ORDER BY r_regionkey
    """,
    "q02_projection": """
        SELECT c_name, c_mktsegment AS segment FROM customer ORDER BY c_name
    """,
    "q03_ucase": """
        SELECT n_nationkey, UPPER(n_name) AS n_name_uc
        FROM nation ORDER BY n_nationkey
    """,
    "q04_case_when": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 150000 THEN 'BIG' ELSE 'SMALL' END AS bucket
        FROM orders ORDER BY o_orderkey
    """,
    "q05_eq_filter": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey
    """,
    "q06_conj_filter": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        ORDER BY l_orderkey, l_linenumber
    """,
    "q07_bool_not": """
        SELECT event_id FROM events
        WHERE NOT (event_type = 'view') AND value > 50.0
        ORDER BY event_id
    """,
    "q08_not_null": """
        SELECT event_id, user_id FROM events
        WHERE props IS NOT NULL ORDER BY event_id
    """,
    "q09_group_count": """
        SELECT event_type, COUNT(event_id) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q10_filtered_group_count": """
        SELECT user_id, COUNT(event_id) AS purchases
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id ORDER BY user_id
    """,
    "q11_conditional_sums": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
               CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS clicks
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q12_count_distinct_ratio": """
        SELECT user_id,
               ROUND(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(DISTINCT event_type) AS DOUBLE), 6) AS purchase_ratio
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q13_latest_by_offset": """
        SELECT user_id, MAX_BY(event_type, event_id) AS latest_event
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q14_inner_join": """
        SELECT n.n_nationkey, n.n_name, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY n.n_nationkey
    """,
    "q15_left_join": """
        SELECT c.c_custkey, c.c_name, n.n_name
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        ORDER BY c.c_custkey
    """,
    "q16_join_group_count": """
        SELECT o.o_custkey, COUNT(l.l_orderkey) AS items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey ORDER BY o.o_custkey
    """,
    "q17_player_stats": """
        SELECT e.user_id,
               MAX_BY(c.c_name, e.event_id) AS user_name,
               CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
               ROUND(CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(DISTINCT e.event_type) AS DOUBLE), 6) AS purchase_ratio,
               CAST(SUM(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY e.user_id ORDER BY e.user_id
    """,
    "q18_multi_group": """
        SELECT l_returnflag, l_linestatus,
               COUNT(l_orderkey) AS n, ROUND(SUM(l_quantity), 6) AS qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q19_csas_projection": """
        SELECT event_id, event_type, user_id FROM events ORDER BY event_id
    """,
    "q20_windowed_agg": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(event_id) AS n, ROUND(SUM(value), 6) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q21_semi_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    "q22_anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
        ORDER BY c_custkey
    """,
    "q23_revenue_by_region": """
        SELECT r.r_name,
               ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
    """,
    "q24_parts_by_supplier_nation": """
        SELECT s.s_nationkey,
               COUNT(*) AS n_lineitems,
               CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_parts,
               ROUND(CAST(SUM(l.l_quantity) AS DOUBLE), 6) AS qty
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size < 25
        GROUP BY s.s_nationkey ORDER BY s.s_nationkey
    """,
    "q25_full_outer_join": """
        WITH p AS (
          SELECT user_id, count(*) AS purchases FROM events
          WHERE event_type = 'purchase' GROUP BY user_id HAVING count(*) >= 12
        ),
        c AS (
          SELECT user_id, count(*) AS clicks FROM events
          WHERE event_type = 'click' GROUP BY user_id HAVING count(*) >= 12
        )
        SELECT COALESCE(p.user_id, c.user_id) AS user_id, p.purchases, c.clicks
        FROM p FULL JOIN c ON p.user_id = c.user_id
        ORDER BY user_id
    """,
    "q26_percentiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95,
               ROUND(MIN(value), 6) AS vmin,
               ROUND(MAX(value), 6) AS vmax
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q27_pivot": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q28_cube": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n, ROUND(SUM(l_quantity), 6) AS qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus
    """,
    # each event belongs to the size/hop = 4 hopping windows whose
    # epoch-aligned starts cover it: bucket15(ts) - k*15min, k in 0..3
    "q29_hopping_window": """
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                   - (offs.k * INTERVAL '15 minutes') AS window_start,
               event_type, COUNT(event_id) AS n,
               ROUND(SUM(value), 6) AS total_value
        FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) offs(k)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # gaps-and-islands: a session breaks when the gap to the previous
    # event is >= 30 min (Spark's per-row window is [ts, ts+gap) with
    # an EXCLUSIVE end, so a gap of exactly 30 min does NOT merge);
    # session_end = last ts + gap, matching session_window.end
    "q30_session_window": """
        WITH marked AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             < INTERVAL '30 minutes'
                        THEN 0 ELSE 1 END AS new_s
            FROM events
        ), sess AS (
            SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               user_id, COUNT(event_id) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
    """,
}
