"""DuckDB oracle SQL for every SQL-expressible query in the registry.

The driver runs each ``queries()`` entry on Spark and the matching SQL here
on DuckDB over the same parquet fixtures, then compares row count + schema +
order-insensitive value hash. Column names/aliases MUST match the Spark plan
exactly; double aggregates are rounded identically (4 decimals unless noted)
on both sides so order-of-summation noise cannot flip the hash.
"""

RELATIONAL_ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4)                                AS sum_qty,
               round(sum(l_extendedprice), 4)                          AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4)       AS sum_disc_price,
               round(avg(l_quantity), 4)                               AS avg_qty,
               round(avg(l_discount), 4)                               AS avg_disc,
               count(*)                                                AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q3_top_unshipped_orders": """
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q_broadcast_dim_join": """
        SELECT r_name,
               count(*)                       AS order_count,
               round(sum(o_totalprice), 4)    AS total_price
        FROM orders
        JOIN customer ON o_custkey   = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q_anti_join_customers_without_orders": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-06-01'
        )
    """,
    "q_semi_join_suppliers_with_big_lineitems": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem WHERE l_quantity >= 48
        )
    """,
    "q_union_distinct_nations": """
        SELECT DISTINCT nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
    """,
    "q_topk_per_group": """
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rank
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                   ) AS rank
            FROM lineitem
        )
        WHERE rank <= 3
    """,
    "q_sort_limit_top_orders": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    "q_case_conditional_agg": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                                                                   AS returned_count,
               round(sum(CASE WHEN l_discount > 0.05
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END), 4)                    AS discounted_revenue,
               count(*)                                            AS total_count
        FROM lineitem
        GROUP BY l_linestatus
    """,
    "q_grouped_having": """
        SELECT o_custkey,
               count(*)                    AS order_count,
               round(sum(o_totalprice), 4) AS total_spent
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12
    """,
    "q_events_first_per_user": """
        SELECT user_id, event_id, ts, event_type
        FROM (
            SELECT user_id, event_id, ts, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    "q_events_type_rollup": """
        SELECT event_type,
               count(*)                        AS n_events,
               round(avg(value), 4)            AS avg_value,
               count(DISTINCT user_id)         AS n_users
        FROM events
        GROUP BY event_type
    """,
}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    return out
