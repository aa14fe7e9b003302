"""Temporal join query family (as-of + band-bucketed range join).

Oracles replay the SAME union-window / inequality-join logic in DuckDB
(the as-of oracle uses ``last_value(... IGNORE NULLS)`` with the
identical ``(ts, kind, event_id)`` ordering, so ties resolve the same
way on both engines). Events go through the second-truncating ``ev``
CTE exactly like streaming_q.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import temporal as TP
from gpu_accelerated_vector_indexing_spark.operators.temporal import RANGE_WINDOW_S

_EV = """
WITH ev AS (
  SELECT event_id, date_trunc('second', ts)::TIMESTAMP AS ts,
         user_id, event_type, value
  FROM events
)
"""

QUERIES = {
    "join_asof": TP.asof_join_events,
    "join_range_bucketed": TP.range_join_events,
    "events_rollup_hierarchy": TP.rollup_time_hierarchy,
    "events_funnel": TP.funnel_stages,
    "events_trailing_window": TP.sliding_value_window,
    "merge_upsert_latest": TP.merge_upsert_latest,
    "join_interval": TP.interval_join_view_purchase,
}

ORACLES = {
    "join_asof": _EV
    + """,
u AS (
  SELECT user_id, ts, event_id, 0 AS kind, event_id AS v_id, ts AS v_ts
  FROM ev WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS kind, NULL::BIGINT, NULL::TIMESTAMP
  FROM ev WHERE event_type = 'purchase'
),
filled AS (
  SELECT user_id, ts, event_id, kind,
    last_value(v_id IGNORE NULLS) OVER w AS asof_view_id,
    last_value(v_ts IGNORE NULLS) OVER w AS asof_view_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, asof_view_id, asof_view_ts,
       CAST(epoch(ts) - epoch(asof_view_ts) AS BIGINT) AS gap_seconds
FROM filled WHERE kind = 1
""",
    "join_range_bucketed": _EV
    + f""",
err AS (
  SELECT event_id, ts, epoch(ts) AS e FROM ev WHERE event_type = 'error'
),
j AS (
  SELECT err.event_id, err.ts, c.event_id AS c_id, c.value
  FROM err LEFT JOIN ev c
    ON epoch(c.ts) >= err.e AND epoch(c.ts) < err.e + {RANGE_WINDOW_S}
   AND c.event_id <> err.event_id
)
SELECT event_id, ts, count(c_id) AS n_nearby,
       coalesce(CAST(sum(value::DECIMAL(18,2)) AS DOUBLE), 0.0) AS sum_value
FROM j GROUP BY event_id, ts
""",
    "events_rollup_hierarchy": _EV
    + """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       date_trunc('hour', ts)::TIMESTAMP AS hour,
       date_trunc('minute', ts)::TIMESTAMP AS minute,
       count(*) AS n_events,
       CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS sum_value
FROM ev GROUP BY ROLLUP (day, hour, minute)
""",
    "events_funnel": _EV
    + """,
views AS (
  SELECT user_id, min(ts) AS t_view FROM ev WHERE event_type = 'view' GROUP BY user_id
),
clicks AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM ev e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
purchases AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM ev e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM views) AS n_view_users,
       (SELECT count(*) FROM clicks) AS n_click_users,
       (SELECT count(*) FROM purchases) AS n_purchase_users
""",
    "events_trailing_window": _EV
    + """
SELECT event_id, event_type, ts,
       count(*) OVER w AS n_trailing,
       CAST(sum(value::DECIMAL(18,2)) OVER w AS DOUBLE) AS sum_trailing
FROM ev
WINDOW w AS (
  PARTITION BY event_type ORDER BY ts
  RANGE BETWEEN INTERVAL '3599 seconds' PRECEDING AND CURRENT ROW
)
""",
    # union of snapshot(<cutoff) and changes(>=cutoff) is the whole table,
    # so latest-wins over the union ≙ latest-wins over ev — restated with
    # the same (ts DESC, event_id DESC) tie-break
    "merge_upsert_latest": _EV
    + """
SELECT user_id, event_type AS last_type, value AS last_value, ts AS last_ts
FROM (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM ev
)
WHERE rn = 1
""",
    "join_interval": _EV
    + """
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       CAST(epoch(p.ts) - epoch(v.ts) AS BIGINT) AS secs_to_purchase
FROM ev v JOIN ev p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND epoch(p.ts) <= epoch(v.ts) + 1800
""",
}

QUERIES["events_zscore_outliers"] = TP.value_outliers

ORACLES["events_zscore_outliers"] = """
WITH stats AS (
  SELECT event_type,
         CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) / count(*) AS mu,
         sqrt(CAST(sum(value::DECIMAL(18,2) * value::DECIMAL(18,2)) AS DOUBLE) / count(*)
              - (CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) / count(*))
                * (CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) / count(*))) AS sigma
  FROM events GROUP BY event_type
)
SELECT event_id, event_type, value, z FROM (
  SELECT e.event_id, e.event_type, e.value,
         round((e.value - s.mu) / s.sigma, 6) AS z
  FROM events e JOIN stats s USING (event_type)
)
WHERE abs(z) > 3.0
"""

QUERIES["scd2_user_state"] = TP.scd2_user_state

ORACLES["scd2_user_state"] = _EV + """,
changes AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM ev
),
surv AS (
  SELECT user_id, event_type, ts, event_id FROM changes
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(lead(ts) OVER w IS NULL AS INT) AS is_current
FROM surv
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

QUERIES["events_transition_matrix"] = TP.event_transition_matrix

ORACLES["events_transition_matrix"] = _EV + """,
pairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM ev
),
counts AS (
  SELECT event_type, next_type, count(*) AS n
  FROM pairs WHERE next_type IS NOT NULL GROUP BY event_type, next_type
),
totals AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_from FROM counts GROUP BY event_type
)
SELECT c.event_type, c.next_type, c.n, round(c.n / t.n_from, 6) AS p
FROM counts c JOIN totals t USING (event_type)
"""

# plan-equivalence: the cogrouped-pandas as-of must match the
# union-window as-of bit-for-bit — same oracle
QUERIES["join_asof_cogroup"] = TP.asof_join_cogroup
ORACLES["join_asof_cogroup"] = ORACLES["join_asof"]

# merging partial aggregates must equal the from-scratch aggregate
QUERIES["incremental_agg_merge"] = TP.incremental_agg_merge
ORACLES["incremental_agg_merge"] = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


QUERIES["events_mad_outliers"] = TP.mad_outliers

# integer-exact median/MAD via histogram cumulative windows; the flag
# inequality is a cross-multiplied integer — replays bit-exactly
ORACLES["events_mad_outliers"] = f"""
WITH vals AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
h1 AS (SELECT event_type, v, count(*) AS cnt FROM vals GROUP BY event_type, v),
c1 AS (
  SELECT event_type, v,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM h1
),
med AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS med_c
  FROM c1 GROUP BY event_type
),
devs AS (
  SELECT va.event_type, abs(va.v - m.med_c) AS dev
  FROM vals va JOIN med m USING (event_type)
),
h2 AS (SELECT event_type, dev, count(*) AS cnt FROM devs GROUP BY event_type, dev),
c2 AS (
  SELECT event_type, dev,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM h2
),
mad AS (
  SELECT event_type,
         min(CASE WHEN cum >= ceil(0.5 * n) THEN dev END) AS mad_c
  FROM c2 GROUP BY event_type
)
SELECT va.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       any_value(m.med_c) / 100.0 AS median_value,
       any_value(d.mad_c) / 100.0 AS mad_value,
       CAST(sum(CASE WHEN {TP.MAD_Z_NUM} * abs(va.v - m.med_c)
                          > {TP.MAD_CUT_NUM} * d.mad_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM vals va JOIN med m USING (event_type) JOIN mad d USING (event_type)
GROUP BY va.event_type
ORDER BY va.event_type
"""

QUERIES["events_sequence_dataset"] = TP.event_sequence_dataset

# (ts, event_id) is unique per user, so both engines window identically;
# the context string is an exact concat of discrete event types. The
# lag list is generated from the operator's SEQ_CONTEXT so a context-
# width retune cannot desynchronize the twins.
_SEQ_LAGS = ",\n         ".join(
    f"lag(event_type, {k}) OVER w AS c{k}" for k in range(TP.SEQ_CONTEXT, 0, -1)
)
_SEQ_COLS = ", ".join(f"c{k}" for k in range(TP.SEQ_CONTEXT, 0, -1))
ORACLES["events_sequence_dataset"] = f"""
WITH lagged AS (
  SELECT user_id, event_id, event_type,
         {_SEQ_LAGS}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       concat_ws('>', {_SEQ_COLS}) AS context,
       event_type AS next_event
FROM lagged WHERE c{TP.SEQ_CONTEXT} IS NOT NULL
"""

QUERIES["join_asof_forward"] = TP.asof_join_forward

# the backward oracle mirrored: DESC traversal + carry-backward gives
# each view the earliest at-or-after purchase; ts ties resolve to the
# smallest purchase event_id in both engines (identical window order)
ORACLES["join_asof_forward"] = _EV + """,
u AS (
  SELECT user_id, ts, event_id, 0 AS kind, event_id AS p_id, ts AS p_ts
  FROM ev WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS kind, NULL::BIGINT, NULL::TIMESTAMP
  FROM ev WHERE event_type = 'view'
),
filled AS (
  SELECT user_id, ts, event_id, kind,
    last_value(p_id IGNORE NULLS) OVER w AS next_purchase_id,
    last_value(p_ts IGNORE NULLS) OVER w AS next_purchase_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, kind ASC, event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, next_purchase_id, next_purchase_ts,
       CAST(epoch(next_purchase_ts) - epoch(ts) AS BIGINT) AS secs_to_purchase
FROM filled WHERE kind = 1
"""


# --- r7: CUSUM changepoint ---------------------------------------------------

QUERIES["events_cusum_changepoint"] = TP.cusum_changepoint

# same n-scaled integer deviation: D_i = n·cumsum_i − i·total (BIGINT),
# argmax |D| with smallest-index tie-break, mean-units conversion last
ORACLES["events_cusum_changepoint"] = """
WITH ev AS (
  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
staged AS (
  SELECT user_id, event_id,
         sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx,
         count(*) OVER (PARTITION BY user_id) AS n,
         sum(cents) OVER (PARTITION BY user_id) AS total
  FROM ev
),
dev AS (
  SELECT user_id, event_id, idx, n, n * cum - idx * total AS dev FROM staged
),
ranked AS (
  SELECT user_id, event_id, idx, n, dev,
         row_number() OVER (PARTITION BY user_id ORDER BY abs(dev) DESC, idx ASC) AS rn
  FROM dev
)
SELECT user_id,
       n AS n_events,
       CAST(idx AS INT) AS cp_index,
       event_id AS cp_event_id,
       round(abs(dev) / (n * 100.0), 6) AS max_dev
FROM ranked WHERE rn = 1 ORDER BY user_id
"""


# --- r7: as-of with tolerance -------------------------------------------------

QUERIES["join_asof_tolerance"] = TP.asof_join_tolerance

# the join_asof oracle with the tolerance cutoff applied post-carry
ORACLES["join_asof_tolerance"] = ORACLES["join_asof"].replace(
    """SELECT event_id, user_id, ts, asof_view_id, asof_view_ts,
       CAST(epoch(ts) - epoch(asof_view_ts) AS BIGINT) AS gap_seconds
FROM filled WHERE kind = 1""",
    f"""SELECT event_id, user_id, ts,
       CASE WHEN epoch(ts) - epoch(asof_view_ts) <= {TP.ASOF_TOLERANCE_S}
            THEN asof_view_id END AS asof_view_id,
       CASE WHEN epoch(ts) - epoch(asof_view_ts) <= {TP.ASOF_TOLERANCE_S}
            THEN asof_view_ts END AS asof_view_ts,
       CASE WHEN epoch(ts) - epoch(asof_view_ts) <= {TP.ASOF_TOLERANCE_S}
            THEN CAST(epoch(ts) - epoch(asof_view_ts) AS BIGINT) END AS gap_seconds
FROM filled WHERE kind = 1""",
)
assert "CASE WHEN" in ORACLES["join_asof_tolerance"], "tolerance rewrite failed"
