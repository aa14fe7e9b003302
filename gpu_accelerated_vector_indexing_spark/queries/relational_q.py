"""Relational breadth query family (SURVEY.md §2.2 checklist rows).

Every oracle mirrors the Spark query's decimal-safe numeric policy
(see operators/relational.py): DECIMAL(18,2) sums cast to DOUBLE are
bit-identical across engines; row_number/rank/date_diff results are
cast to the Spark-side integer width.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import relational as R

_DSUM = "CAST(sum({col}::DECIMAL(18,2)) AS DOUBLE)"
_DISC_PRICE = "l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))"

QUERIES = {
    "filtered_scan": R.filtered_scan,
    "pricing_summary": R.pricing_summary,
    "rollup_counts": R.rollup_counts,
    "cube_counts": R.cube_counts,
    "having_groups": R.having_groups,
    "distinct_agg": R.distinct_agg,
    "join_multiway": R.join_multiway,
    "join_semi": R.join_semi,
    "join_anti": R.join_anti,
    "join_outer": R.join_outer,
    "join_bucketed_colocate": R.join_bucketed_colocate,
    "scalar_subquery": R.scalar_subquery,
    "window_running": R.window_running,
    "window_topk_per_group": R.window_topk_per_group,
    "window_lag_frames": R.window_lag_frames,
    "window_distribution": R.window_distribution,
    "percentile_summary": R.percentile_summary,
    "set_operations": R.set_operations,
    "string_functions": R.string_functions,
    "date_functions": R.date_functions,
    "math_functions": R.math_functions,
    "array_functions": R.array_functions,
    "json_functions": R.json_functions,
    "map_functions": R.map_functions,
    "case_bucketing": R.case_bucketing,
    "pivot_status": R.pivot_status,
    "grouping_sets": R.grouping_sets_counts,
    "skew_salted_agg": R.skew_salted_agg,
    "join_bloom_pruned": R.join_bloom_pruned,
    "shipping_priority": R.shipping_priority,
    "exists_late_shipment": R.exists_late_shipment,
    "large_volume_orders": R.large_volume_orders,
    "disjunctive_revenue": R.disjunctive_revenue,
    "bilateral_trade_volume": R.bilateral_trade_volume,
    "local_supplier_volume": R.local_supplier_volume,
    "revenue_forecast": R.revenue_forecast,
    "returned_item_revenue": R.returned_item_revenue,
    "promo_revenue": R.promo_revenue,
    "small_quantity_revenue": R.small_quantity_revenue,
    "dormant_rich_customers": R.dormant_rich_customers,
    "customer_order_distribution": R.customer_order_distribution,
    "top_revenue_suppliers": R.top_revenue_suppliers,
}

ORACLES = {
    "grouping_sets": """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    "filtered_scan": """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND o_orderstatus = 'F'
""",
    "pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
  {_DSUM.format(col='l_quantity')} AS sum_qty,
  {_DSUM.format(col='l_extendedprice')} AS sum_base_price,
  CAST(sum({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
  CAST(sum(({_DISC_PRICE})::DECIMAL(18,4) * (1::DECIMAL(18,2) + l_tax::DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
  {_DSUM.format(col='l_quantity')} / count(*) AS avg_qty,
  {_DSUM.format(col='l_extendedprice')} / count(*) AS avg_price,
  {_DSUM.format(col='l_discount')} / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "rollup_counts": f"""
SELECT n_name, o_orderpriority, count(*) AS n_orders,
       {_DSUM.format(col='o_totalprice')} AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_orderpriority)
""",
    "cube_counts": f"""
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       {_DSUM.format(col='l_quantity')} AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "having_groups": f"""
SELECT l_suppkey, count(*) AS n_items, {_DSUM.format(col='l_extendedprice')} AS revenue
FROM lineitem GROUP BY l_suppkey HAVING count(*) > 500
""",
    "distinct_agg": """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
FROM orders GROUP BY o_orderstatus
""",
    "join_multiway": f"""
SELECT r_name, CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue, count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    "join_semi": """
SELECT c_mktsegment, count(*) AS n_customers FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_mktsegment
""",
    "join_anti": """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    "join_outer": """
SELECT c_custkey, count(o_orderkey) AS n_big_orders,
       coalesce(CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE), 0.0) AS big_total
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 200000) o ON c_custkey = o.o_custkey
GROUP BY c_custkey
""",
    "scalar_subquery": """
WITH stats AS (
  SELECT CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) / count(*) AS avg_price FROM orders
)
SELECT o_orderpriority, count(*) AS n_above_avg
FROM orders, stats WHERE o_totalprice > avg_price
GROUP BY o_orderpriority
""",
    "window_running": """
SELECT o_custkey, o_orderkey,
  CAST(row_number() OVER w AS INT) AS rn,
  CAST(sum(o_totalprice::DECIMAL(18,2)) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    "window_topk_per_group": """
SELECT c_mktsegment, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
""",
    "window_lag_frames": """
SELECT o_custkey, o_orderkey,
  lag(o_totalprice, 1) OVER w AS prev_price,
  lead(o_totalprice, 1) OVER w AS next_price,
  CAST(sum(o_totalprice::DECIMAL(18,2)) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS moving_sum,
  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS price_rank
FROM orders WHERE o_custkey <= 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    # physical layout (bucketing) never changes results — plain join oracle
    "join_bucketed_colocate": f"""
SELECT o_orderstatus, l_returnflag,
       CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue, count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus, l_returnflag
""",
    # map semantics validated by recomputing the scalar outputs directly
    "map_functions": """
SELECT o_orderkey,
  o_orderstatus AS status_v,
  CASE WHEN o_totalprice > 150000 THEN 'high' ELSE 'low' END AS tier_v,
  3 AS n_keys,
  'priority,status,tier' AS keys_csv,
  lower(o_orderpriority) AS priority_lower,
  1 AS n_status_keys
FROM orders WHERE o_orderkey <= 500
""",
    "bilateral_trade_volume": f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue, count(*) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         {_DISC_PRICE} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
""",
    "local_supplier_volume": f"""
SELECT n_name,
       CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    "revenue_forecast": """
SELECT CAST(sum(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2)) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    "returned_item_revenue": f"""
SELECT c_custkey, c_name, n_name,
       CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    "promo_revenue": f"""
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} ELSE 0::DECIMAL(37,4) END) AS DOUBLE) AS promo_revenue,
       CAST(sum({_DISC_PRICE}) AS DOUBLE) AS total_revenue,
       round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} ELSE 0::DECIMAL(37,4) END) AS DOUBLE)
             / CAST(sum({_DISC_PRICE}) AS DOUBLE), 6) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
""",
    "small_quantity_revenue": f"""
WITH avg_qty AS (
  SELECT l_partkey AS a_partkey,
         {_DSUM.format(col='l_quantity')} / count(*) AS part_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {_DSUM.format(col='l_extendedprice')} AS small_qty_revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty ON l_partkey = a_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * part_avg_qty
""",
    "dormant_rich_customers": f"""
WITH avg_bal AS (
  SELECT {_DSUM.format(col='c_acctbal')} / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       count(*) AS n_customers,
       {_DSUM.format(col='c_acctbal')} AS total_bal
FROM customer CROSS JOIN avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_mktsegment
""",
    "large_volume_orders": """
WITH qualifying AS (
  SELECT l_orderkey, sum(l_quantity::DECIMAL(18,2)) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity::DECIMAL(18,2)) > 150
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM orders
JOIN qualifying ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
""",
    "disjunctive_revenue": f"""
SELECT CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
""",
    "window_distribution": """
SELECT c_mktsegment, c_custkey, c_acctbal,
  CAST(ntile(4) OVER w AS INT) AS quartile,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    "percentile_summary": """
SELECT l_returnflag,
  round(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
  round(quantile_cont(l_quantity, 0.75), 6) AS p75_qty,
  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
  count(*) AS n_items
FROM lineitem GROUP BY l_returnflag
""",
    "set_operations": """
SELECT nationkey, 'both' AS src FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS src FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'supplier_only' AS src FROM (
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
  EXCEPT SELECT DISTINCT c_nationkey FROM customer)
""",
    "string_functions": """
SELECT p_partkey,
  upper(p_name) AS name_upper,
  lower(p_brand) AS brand_lower,
  CAST(length(p_name) AS INT) AS name_len,
  substring(p_type, 1, 5) AS type_prefix,
  concat_ws('|', p_brand, p_type) AS brand_type,
  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
  replace(p_name, ' ', '_') AS name_snake,
  trim(p_name) AS name_trim
FROM part WHERE p_partkey <= 100
""",
    "date_functions": """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INT) AS yr,
  CAST(month(o_orderdate) AS INT) AS mo,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  CAST(day(o_orderdate) AS INT) AS dom,
  date_trunc('month', o_orderdate) AS month_start,
  CAST(date_diff('day', o_orderdate::DATE, DATE '1999-01-01') AS INT) AS days_to_1999,
  (o_orderdate::DATE + 30)::TIMESTAMP AS due_date
FROM orders WHERE o_orderkey <= 200
""",
    "math_functions": """
SELECT l_orderkey, l_linenumber,
  abs(l_discount - 0.05) AS disc_dev,
  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
  sqrt(l_quantity) AS qty_sqrt,
  round(ln(l_extendedprice), 6) AS price_ln,
  round(exp(l_discount), 6) AS disc_exp,
  l_quantity * l_quantity AS qty_sq,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
FROM lineitem WHERE l_orderkey <= 100
""",
    "array_functions": """
SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
       CAST(i - 1 AS INT) AS pos, embedding[i]::DOUBLE AS val
FROM embeddings CROSS JOIN range(1, 4) t(i)
WHERE vec_id < 50
""",
    "json_functions": """
SELECT event_type, count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
""",
    "case_bucketing": f"""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_band,
       o_orderstatus, count(*) AS n_orders,
       {_DSUM.format(col='o_totalprice')} AS band_total
FROM orders GROUP BY 1, 2
""",
    # the Bloom-pruned plan must equal the plain semi-join exactly
    # (false positives are removed by the verify join)
    "join_bloom_pruned": """
SELECT p_brand, count(*) AS n_items,
       CAST(sum(l_extendedprice::DECIMAL(18,2)
                * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 48
GROUP BY p_brand
""",
    # the salted two-stage plan must equal the plain aggregate exactly
    "skew_salted_agg": """
SELECT event_type, count(*) AS n_events,
       CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
    "shipping_priority": """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(l_extendedprice::DECIMAL(18,2)
                * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND l_shipdate > TIMESTAMP '1997-03-15'
  AND o_orderdate < TIMESTAMP '1997-09-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
    "exists_late_shipment": """
SELECT o_orderpriority, count(*) AS n_late_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
""",
    "pivot_status": """
SELECT user_id,
  count(*) FILTER (event_type = 'view') AS n_view,
  count(*) FILTER (event_type = 'click') AS n_click,
  count(*) FILTER (event_type = 'purchase') AS n_purchase,
  count(*) FILTER (event_type = 'signup') AS n_signup,
  count(*) FILTER (event_type = 'error') AS n_error
FROM events WHERE user_id < 30 GROUP BY user_id
""",
}

ORACLES["customer_order_distribution"] = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) GROUP BY c_count
"""

ORACLES["top_revenue_suppliers"] = """
WITH revenue0 AS (
  SELECT l_suppkey,
         sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM revenue0 JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM revenue0)
"""

QUERIES["cheapest_supplier_per_part"] = R.cheapest_supplier_per_part
QUERIES["null_safe_semantics"] = R.null_safe_semantics
QUERIES["fuzzy_customer_pairs"] = R.fuzzy_customer_pairs

# the oracle spells Q2's correlated form literally — the window-min Spark
# plan must produce the identical relation
ORACLES["cheapest_supplier_per_part"] = """
WITH unit AS (
  SELECT l_partkey, l_suppkey, round(l_extendedprice / l_quantity, 6) AS unit_price
  FROM lineitem
)
SELECT DISTINCT p_partkey, p_name, s_name, u.unit_price
FROM unit u
JOIN part ON p_partkey = l_partkey AND p_size < 10
JOIN supplier ON s_suppkey = l_suppkey
WHERE u.unit_price = (
  SELECT min(u2.unit_price) FROM unit u2 WHERE u2.l_partkey = u.l_partkey
)
"""

ORACLES["null_safe_semantics"] = """
WITH l AS (
  SELECT nullif(o_custkey % 7, 3) AS k, count(*) AS n_orders FROM orders GROUP BY 1
),
r AS (
  SELECT nullif(c_custkey % 7, 3) AS k, count(*) AS n_customers FROM customer GROUP BY 1
)
SELECT l.k, n_orders, n_customers
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
"""

ORACLES["fuzzy_customer_pairs"] = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""

QUERIES["window_topk_with_ties"] = R.window_topk_with_ties
QUERIES["events_value_histogram"] = R.events_value_histogram

ORACLES["window_topk_with_ties"] = """
SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
"""

ORACLES["events_value_histogram"] = """
WITH bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
SELECT event_type,
       CAST(CASE WHEN value >= hi THEN 11
                 ELSE floor((value - lo) / (hi - lo) * 10) + 1 END AS INT) AS bucket,
       count(*) AS n
FROM events CROSS JOIN bounds
GROUP BY event_type, bucket
"""

QUERIES["market_share"] = R.market_share
QUERIES["copurchase_part_pairs"] = R.copurchase_part_pairs
QUERIES["supplier_ship_delay"] = R.supplier_ship_delay

ORACLES["market_share"] = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0::DECIMAL(37,4) END) AS DOUBLE) AS nation_revenue,
  CAST(sum(volume) AS DOUBLE) AS total_revenue,
  round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0::DECIMAL(37,4) END) AS DOUBLE)
        / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT o_orderdate, n1.n_name AS supp_nation, {_DISC_PRICE} AS volume
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
)
GROUP BY o_year
"""

ORACLES["copurchase_part_pairs"] = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""

ORACLES["supplier_ship_delay"] = """
SELECT s_suppkey, s_name, count(*) AS n_items,
       round(sum(date_diff('day', o_orderdate, l_shipdate)) / count(*), 6) AS avg_delay_days,
       CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS INT) AS max_delay_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
HAVING count(*) >= 20
ORDER BY avg_delay_days DESC, s_suppkey
LIMIT 10
"""

# --- TPC-H Q9/Q11/Q12/Q16/Q20 shapes (fixture-adapted; no partsupp) -------

QUERIES["profit_by_nation_year"] = R.profit_by_nation_year
QUERIES["important_part_value"] = R.important_part_value
QUERIES["ship_delay_priority"] = R.ship_delay_priority
QUERIES["parts_supplier_count"] = R.parts_supplier_count
QUERIES["excess_inventory_suppliers"] = R.excess_inventory_suppliers

ORACLES["profit_by_nation_year"] = f"""
SELECT n.n_name AS nation,
       EXTRACT(year FROM o.o_orderdate)::INT AS o_year,
       CAST(sum({_DISC_PRICE}
                - p.p_retailprice::DECIMAL(18,2) * 0.80::DECIMAL(18,2)
                  * l.l_quantity::DECIMAL(18,0)) AS DOUBLE) AS profit,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY nation, o_year
"""

ORACLES["important_part_value"] = f"""
WITH per_part AS (
  SELECT l_partkey, sum({_DISC_PRICE}) AS value_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3')
  GROUP BY l_partkey
),
total AS (SELECT sum(value_dec) AS total_dec FROM per_part)
SELECT l_partkey AS partkey,
       CAST(value_dec AS DOUBLE) AS part_value,
       round(CAST(value_dec AS DOUBLE) / CAST(total_dec AS DOUBLE), 6) AS value_share
FROM per_part CROSS JOIN total
WHERE CAST(value_dec AS DOUBLE) > 0.001 * CAST(total_dec AS DOUBLE)
"""

ORACLES["ship_delay_priority"] = """
SELECT CAST(greatest(least(floor(date_diff('day', o.o_orderdate, l.l_shipdate) / 30), 3), 0) AS INT)
         AS delay_bucket,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_priority_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_priority_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY delay_bucket
"""

ORACLES["parts_supplier_count"] = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
  AND p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO' AND p.p_size <= 25
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
LIMIT 40
"""

ORACLES["excess_inventory_suppliers"] = """
WITH per_pair AS (
  SELECT l_suppkey, l_partkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'
                  THEN l_quantity::DECIMAL(18,0) ELSE 0::DECIMAL(18,0) END) AS qty_1997,
         sum(l_quantity::DECIMAL(18,0)) AS qty_total
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey, l_partkey
  HAVING CAST(qty_1997 AS DOUBLE) > 0.5 * CAST(qty_total AS DOUBLE)
),
qualifying AS (
  SELECT l_suppkey, count(*) AS n_concentrated_parts,
         CAST(sum(qty_1997) AS DOUBLE) AS qty_1997_total
  FROM per_pair GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
       q.n_concentrated_parts, q.qty_1997_total
FROM supplier s
JOIN qualifying q ON s.s_suppkey = q.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""

QUERIES["unpivot_flag_measures"] = R.unpivot_flag_measures

ORACLES["unpivot_flag_measures"] = f"""
WITH wide AS (
  SELECT l_returnflag,
         {_DSUM.format(col='l_quantity')} AS sum_qty,
         {_DSUM.format(col='l_extendedprice')} AS sum_price,
         CAST(count(*) AS DOUBLE) AS n_items
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS measure, sum_price AS val FROM wide
UNION ALL
SELECT l_returnflag, 'n_items' AS measure, n_items AS val FROM wide
"""


def _copurchase_pagerank(spark, sf_dir):
    """Iterative PageRank (driver-loop Pregel-as-joins). Each round's
    contribution sum goes through DECIMAL(28,18) (exact, order-
    independent) and ranks re-round to 10 d.p., so the fixed-iteration
    computation is bit-stable → the staged-CTE oracle below replays all
    rounds exactly."""
    from gpu_accelerated_vector_indexing_spark.operators.graph import copurchase_pagerank

    return copurchase_pagerank(spark, sf_dir)


QUERIES["copurchase_pagerank"] = _copurchase_pagerank


def _pagerank_oracle() -> str:
    """Replay the fixed-iteration PageRank as chained CTEs: r0 = 1.0,
    r_{t+1}(v) = round((1-d) + d·inflow, 10) with inflow summed in
    DECIMAL(28,18) exactly like the Spark operator. The float literals
    are repr()'d so both engines damp with bit-identical constants."""
    from gpu_accelerated_vector_indexing_spark.operators.graph import DAMPING, PR_ITERS

    base = (1.0 - DAMPING).__repr__()
    d = DAMPING.__repr__()
    stages = [
        """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, count(*) AS outdeg FROM p GROUP BY src),
e AS (SELECT p.src, p.dst, d.outdeg FROM p JOIN deg d USING (src)),
nodes AS (SELECT DISTINCT src AS part FROM p),
r0 AS (SELECT part, CAST(1.0 AS DOUBLE) AS rank FROM nodes)"""
    ]
    for t in range(PR_ITERS):
        stages.append(f"""
r{t + 1} AS (
  SELECT n.part,
         round({base} + {d} * CAST(coalesce(s.inflow, 0.0) AS DOUBLE), 10) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst, CAST(sum(CAST(r.rank / e.outdeg AS DECIMAL(28,18))) AS DOUBLE) AS inflow
    FROM e JOIN r{t} r ON e.src = r.part GROUP BY e.dst
  ) s ON n.part = s.dst
)""")
    return (
        ",\n".join(stages)
        + f"\nSELECT part, round(rank, 6) AS rank FROM r{PR_ITERS}"
        + "\nORDER BY rank DESC, part LIMIT 25"
    )


ORACLES["copurchase_pagerank"] = _pagerank_oracle()


def _copurchase_triangles(spark, sf_dir):
    """Degree-oriented triangle counting (skew-safe wedge join) —
    operators/graph.triangle_counts."""
    from gpu_accelerated_vector_indexing_spark.operators.graph import triangle_counts

    return triangle_counts(spark, sf_dir)


QUERIES["copurchase_triangles"] = _copurchase_triangles

# integer joins end to end — the oracle replays orientation, wedge join
# and closure verbatim
ORACLES["copurchase_triangles"] = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src AS node, count(*) AS d FROM p GROUP BY src),
und AS (SELECT src, dst FROM p WHERE src < dst),
e AS (
  SELECT u.src, u.dst, ds.d AS sd, dd.d AS dd
  FROM und u JOIN deg ds ON u.src = ds.node JOIN deg dd ON u.dst = dd.node
),
oriented AS (
  SELECT CASE WHEN sd < dd OR (sd = dd AND src < dst) THEN src ELSE dst END AS u,
         CASE WHEN sd < dd OR (sd = dd AND src < dst) THEN dst ELSE src END AS v,
         CASE WHEN sd < dd OR (sd = dd AND src < dst) THEN dd ELSE sd END AS vd
  FROM e
),
wedges AS (
  SELECT o1.u, o1.v AS v1, o2.v AS v2
  FROM oriented o1 JOIN oriented o2 ON o1.u = o2.u
  WHERE (o1.vd < o2.vd) OR (o1.vd = o2.vd AND o1.v < o2.v)
),
tris AS (
  SELECT w.u, w.v1, w.v2
  FROM wedges w JOIN oriented c ON c.u = w.v1 AND c.v = w.v2
),
corners AS (
  SELECT u AS node FROM tris
  UNION ALL SELECT v1 FROM tris
  UNION ALL SELECT v2 FROM tris
)
SELECT node, count(*) AS n_tri FROM corners GROUP BY node
ORDER BY n_tri DESC, node ASC LIMIT 20
"""

QUERIES["copurchase_lift"] = R.copurchase_lift
QUERIES["events_cohort_retention"] = R.events_cohort_retention

ORACLES["copurchase_lift"] = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
pc AS (SELECT l_partkey, count(*) AS n_part FROM op GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_pair
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT part_a, part_b, n_pair,
       round(CAST(n_pair AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS support,
       round(CAST(n_pair AS DOUBLE) / CAST(ca.n_part AS DOUBLE), 6) AS confidence_a_b,
       round(CAST(n_pair AS DOUBLE) * CAST(n_orders AS DOUBLE) /
             (CAST(ca.n_part AS DOUBLE) * CAST(cb.n_part AS DOUBLE)), 6) AS lift
FROM pairs
JOIN pc ca ON ca.l_partkey = part_a
JOIN pc cb ON cb.l_partkey = part_b
CROSS JOIN tot
ORDER BY lift DESC, part_a, part_b LIMIT 20
"""

ORACLES["events_cohort_retention"] = """
WITH ev AS (
  SELECT user_id, date_trunc('week', date_trunc('second', ts))::TIMESTAMP AS wts FROM events
),
first AS (SELECT user_id, min(wts) AS cohort_week FROM ev GROUP BY user_id)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, e.wts) // 7 AS INT) AS week_offset,
       count(DISTINCT e.user_id) AS n_active_users
FROM ev e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2
"""

QUERIES["stats_exact_moments"] = R.stats_exact_moments

# exact integer LIMB sums (the same MOMENT_LIMBS splits the Spark agg
# runs, rendered with DuckDB's `//` integer division), then the SAME
# reassembly + closed-form double expressions (MOMENT_STAT_EXPRS is
# rendered verbatim into both engines) — bit-equal by construction
_LIMB_COLS = ",\n         ".join(
    f"sum({expr.format(d='//')}) AS {name}" for name, expr in R.MOMENT_LIMBS.items()
)
_STAT_COLS = ",\n       ".join(R.MOMENT_STAT_EXPRS)
ORACLES["stats_exact_moments"] = f"""
WITH c AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS qc,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
  FROM lineitem
),
sums AS (
  SELECT l_returnflag,
         count(*) AS n,
         {_LIMB_COLS}
  FROM c GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       {_STAT_COLS}
FROM sums
"""

QUERIES["listagg_nations"] = R.listagg_nations
QUERIES["try_arithmetic_summary"] = R.try_arithmetic_summary

# LISTAGG ≙ DuckDB string_agg with the same ORDER BY (deterministic)
ORACLES["listagg_nations"] = """
SELECT r.r_name,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
       count(*) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""

# try_divide(x, 0) → NULL ≙ explicit CASE; decimal-summed ratios
ORACLES["try_arithmetic_summary"] = """
WITH t AS (
  SELECT l_returnflag, l_quantity,
         CASE WHEN l_discount = 0 THEN NULL
              ELSE l_extendedprice / l_discount END AS ratio,
         l_discount
  FROM lineitem
)
SELECT l_returnflag,
       count(*) AS n_lines,
       count(*) FILTER (WHERE l_discount = 0) AS n_zero_discount,
       count(ratio) AS n_ratios,
       CAST(sum(CAST(ratio AS DECIMAL(18,4))) AS DOUBLE) AS sum_ratio,
       bool_and(l_quantity > 0) AS all_qty_positive
FROM t GROUP BY l_returnflag
"""


QUERIES["quantiles_histogram"] = R.quantiles_histogram

# histogram + cumulative window, integer thresholds — replays exactly
ORACLES["quantiles_histogram"] = """
WITH hist AS (
  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, v,
         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
         sum(cnt) OVER (PARTITION BY l_returnflag) AS n
  FROM hist
)
SELECT l_returnflag,
       CAST(max(n) AS BIGINT) AS n_rows,
       min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) / 100.0 AS p50_price,
       min(CASE WHEN cum >= ceil(0.9 * n) THEN v END) / 100.0 AS p90_price,
       min(CASE WHEN cum >= ceil(0.99 * n) THEN v END) / 100.0 AS p99_price
FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
"""


def _copurchase_kcore(spark, sf_dir):
    from gpu_accelerated_vector_indexing_spark.operators.graph import kcore_trajectory

    return kcore_trajectory(spark, sf_dir)


QUERIES["copurchase_kcore"] = _copurchase_kcore


def _kcore_oracle() -> str:
    """Unrolled peeling rounds as staged CTEs (the fixed-rounds pattern
    of the PageRank/NN-descent oracles): a_{i} = nodes of a_{i-1} whose
    within-a_{i-1} degree is >= k; one digest row per round."""
    from gpu_accelerated_vector_indexing_spark.operators.graph import KCORE_K, KCORE_ROUNDS

    parts = [
        "op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""",
        "a0 AS (SELECT DISTINCT src AS node FROM edges)",
    ]
    for i in range(1, KCORE_ROUNDS + 1):
        parts.append(f"""a{i} AS MATERIALIZED (
  SELECT src AS node FROM edges
  WHERE src IN (SELECT node FROM a{i - 1}) AND dst IN (SELECT node FROM a{i - 1})
  GROUP BY src HAVING count(*) >= {KCORE_K})""")
    digests = "\nUNION ALL\n".join(
        f"SELECT {i} AS iter, CAST(count(*) AS BIGINT) AS n_alive,"
        f" CAST(coalesce(sum(node), 0) AS BIGINT) AS node_id_sum FROM a{i}"
        for i in range(KCORE_ROUNDS + 1)
    )
    joined = ",\n".join(parts)
    return f"WITH {joined}\n{digests}\nORDER BY iter"


ORACLES["copurchase_kcore"] = _kcore_oracle()


# --- r7: RFM segmentation -----------------------------------------------------

QUERIES["orders_rfm_segments"] = R.rfm_segments

ORACLES["orders_rfm_segments"] = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_c
  FROM orders GROUP BY o_custkey
),
cut AS (
  SELECT o_custkey, spend_c,
         CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey ASC) AS INT) AS r_q,
         CAST(ntile(4) OVER (ORDER BY n_orders DESC, o_custkey ASC) AS INT) AS f_q,
         CAST(ntile(4) OVER (ORDER BY spend_c DESC, o_custkey ASC) AS INT) AS m_q
  FROM per_cust
)
SELECT r_q, f_q, m_q,
       count(*)::BIGINT AS n_customers,
       sum(spend_c)::BIGINT AS segment_spend_c
FROM cut GROUP BY r_q, f_q, m_q
ORDER BY r_q, f_q, m_q
"""


# --- r7: supplier concentration (HHI) ----------------------------------------

# r8: ANALYZE-style column profile of the big fact table — one pass,
# row per column; the oracle recomputes each column's exact stats.
QUERIES["lineitem_profile"] = R.table_profile

ORACLES["lineitem_profile"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       (SELECT count(*) FROM lineitem)::BIGINT AS n_rows,
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       count(DISTINCT {c})::BIGINT AS n_distinct
FROM lineitem"""
    for c in R.PROFILE_COLS
)

QUERIES["supplier_concentration"] = R.supplier_concentration

ORACLES["supplier_concentration"] = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(floor(sum({_DISC_PRICE})) AS BIGINT) AS r
  FROM lineitem GROUP BY l_suppkey
),
per AS (
  SELECT n.n_name, rev.r
  FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT n_name,
       count(*)::BIGINT AS n_suppliers,
       round(max(r) / sum(r), 6) AS top_share,
       round(CAST(sum(r * r) AS DOUBLE) /
             (CAST(sum(r) AS DOUBLE) * CAST(sum(r) AS DOUBLE)), 6) AS hhi
FROM per GROUP BY n_name ORDER BY n_name
"""
