"""Modern-SQL query family (operators/modern_sql.py): LATERAL,
VARIANT, recursive CTE, Z-order layout keys.

Oracle notes:
* ``lateral_topk``: DuckDB restates the correlated LATERAL LIMIT as the
  equivalent per-group window (what Catalyst decorrelates it into) —
  same deterministic tie-break (acctbal DESC, custkey DESC).
* ``variant_props_stats``: integer-only aggregates — bit-exact between
  Variant extraction and DuckDB's JSON text extraction.
* ``revenue_monthly_gapfill``: DuckDB runs the same WITH RECURSIVE
  month spine; money goes through DECIMAL(18,2).
* ``zorder_layout``: the bit interleave is integer arithmetic in both
  engines (fold of shifts) — exact.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import modern_sql as M

QUERIES = {
    "lateral_topk": M.lateral_topk_customers,
    "variant_props_stats": M.variant_props_stats,
    "revenue_monthly_gapfill": M.revenue_monthly_gapfill,
    "zorder_layout": M.zorder_layout,
    "sql_scripting_report": M.scripted_threshold_report,
}

ORACLES = {
    "lateral_topk": """
SELECT n_name, c_name, c_acctbal FROM (
  SELECT n.n_name, c.c_name, c.c_acctbal,
         row_number() OVER (PARTITION BY n.n_nationkey
                            ORDER BY c.c_acctbal DESC, c.c_custkey DESC) AS rn
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
) WHERE rn <= 2
""",
    "variant_props_stats": """
WITH v AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM v GROUP BY event_type
""",
    "revenue_monthly_gapfill": """
WITH RECURSIVE spine(month_start, hi) AS (
  SELECT date_trunc('month', min(o_orderdate)),
         date_trunc('month', max(o_orderdate)) FROM orders
  UNION ALL
  SELECT month_start + INTERVAL 1 MONTH, hi FROM spine
  WHERE month_start < hi
),
monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month_start,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT CAST(s.month_start AS TIMESTAMP) AS month_start,
       coalesce(m.n_orders, 0) AS n_orders,
       coalesce(m.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
""",
    "zorder_layout": """
WITH keyed AS (
  SELECT CAST(o_custkey % 4096 AS BIGINT) AS x,
         CAST(date_diff('day', DATE '1992-01-01', o_orderdate::DATE) % 4096 AS BIGINT) AS y
  FROM orders
),
zed AS (
  SELECT x, y,
         CAST(list_sum(list_transform(range(0, 12), i ->
              ((x >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i))
            + ((y >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i + 1)))) AS BIGINT) AS zval
  FROM keyed
)
SELECT zval >> 20 AS zbucket,
       count(*) AS n_rows,
       min(zval) AS z_min, max(zval) AS z_max,
       min(x) AS custkey_min, max(x) AS custkey_max,
       min(y) AS day_min, max(y) AS day_max
FROM zed GROUP BY 1
""",
    # the script's variable bindings restated as scalar CTEs — the same
    # decimal-exact mean and the same 90-day cutoff arithmetic
    "sql_scripting_report": """
WITH t AS (
  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
         max(o_orderdate) - INTERVAL 90 DAY AS cutoff
  FROM orders
)
SELECT o_orderpriority,
       count(*) AS n_recent_above,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders, t
WHERE o_totalprice > t.avg_price AND o_orderdate >= t.cutoff
GROUP BY o_orderpriority
""",
}
