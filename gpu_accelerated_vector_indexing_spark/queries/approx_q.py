"""Sketch + deterministic-sampling query family.

Sketch values (HLL, approximate percentile) are engine-specific, so the
cross-engine contract is a property flag (error within bound = true);
the oracle asserts the exact aggregates and expects every flag true.
Sampling uses the portable multiplicative hash (operators/approx.py), so
its oracle is an EXACT row-level twin — same arithmetic, same rows.
"""

from __future__ import annotations

from gpu_accelerated_vector_indexing_spark.operators import approx as AP
from gpu_accelerated_vector_indexing_spark.operators.approx import (
    DEFAULT_FRAC,
    HASH_A,
    HASH_B,
    HASH_M,
    STRATA_FRACS,
    TRAIN_FRAC,
    VAL_FRAC,
)

_HASH_U = f"(((doc_id % {HASH_M}) * {HASH_A} + {HASH_B}) % {HASH_M}) / {float(HASH_M)}"

_STRATA_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{lang}' THEN {f}" for lang, f in STRATA_FRACS.items())
    + f" ELSE {DEFAULT_FRAC} END"
)

QUERIES = {
    "sketch_functions": AP.sketch_functions,
    "sample_train_split": AP.sample_train_split,
    "sample_stratified": AP.sample_stratified,
}

ORACLES = {
    "sketch_functions": """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact_users,
       count(*) AS n_events,
       true AS hll_ok,
       true AS p50_ok
FROM events GROUP BY event_type
""",
    "sample_train_split": f"""
SELECT doc_id, lang,
  CASE WHEN {_HASH_U} < {TRAIN_FRAC} THEN 'train'
       WHEN {_HASH_U} < {TRAIN_FRAC + VAL_FRAC} THEN 'val'
       ELSE 'test' END AS split
FROM documents
""",
    "sample_stratified": f"""
SELECT doc_id, lang, source FROM documents
WHERE {_HASH_U} < {_STRATA_CASE}
""",
}

QUERIES["sketch_cms_heavy_hitters"] = AP.cms_heavy_hitters

# full sketch replay (r3): the 2-universal hash family is plain BIGINT
# arithmetic, so counters, min-estimates and collisions reproduce
# exactly — one VALUES row per hash row d
_CMS_D = ", ".join(
    f"({d}, {a}, {b})" for d, (a, b) in enumerate(zip(AP.CMS_AS, AP.CMS_BS))
)
ORACLES["sketch_cms_heavy_hitters"] = f"""
WITH hashes(row, a, b) AS (VALUES {_CMS_D}),
coords AS (
  SELECT e.user_id, h.row,
         ((e.user_id % {AP.CMS_P}) * h.a + h.b) % {AP.CMS_P} % {AP.CMS_WIDTH} AS bucket
  FROM events e CROSS JOIN hashes h
),
sketch AS (SELECT row, bucket, count(*) AS cnt FROM coords GROUP BY row, bucket),
exact AS (SELECT user_id, count(*) AS exact FROM events GROUP BY user_id),
est AS (
  SELECT x.user_id, x.exact, min(s.cnt) AS est
  FROM exact x CROSS JOIN hashes h
  JOIN sketch s ON s.row = h.row
   AND s.bucket = ((x.user_id % {AP.CMS_P}) * h.a + h.b) % {AP.CMS_P} % {AP.CMS_WIDTH}
  GROUP BY x.user_id, x.exact
)
SELECT user_id, exact, CAST(est AS BIGINT) AS est
FROM est ORDER BY exact DESC, user_id DESC LIMIT 20
"""

QUERIES["sketch_cms_merge"] = AP.cms_merge

# same portable hash family as the heavy-hitters replay: both the
# per-slice→SUM route and the direct sketch reproduce exactly, so the
# per-cell mismatch count and checksums carry a full value oracle
ORACLES["sketch_cms_merge"] = f"""
WITH hashes(row, a, b) AS (VALUES {_CMS_D}),
coords AS (
  SELECT e.event_type, h.row,
         ((e.user_id % {AP.CMS_P}) * h.a + h.b) % {AP.CMS_P} % {AP.CMS_WIDTH} AS bucket
  FROM events e CROSS JOIN hashes h
),
per_slice AS (
  SELECT event_type, row, bucket, count(*) AS cnt
  FROM coords GROUP BY event_type, row, bucket
),
merged AS (SELECT row, bucket, sum(cnt) AS cnt_m FROM per_slice GROUP BY row, bucket),
direct AS (SELECT row, bucket, count(*) AS cnt_d FROM coords GROUP BY row, bucket),
direct_agg AS (
  SELECT count(*) AS n_cells,
         CAST(sum(cnt_d) AS BIGINT) AS total_count,
         CAST(sum((row * {AP.CMS_WIDTH} + bucket + 1) * cnt_d) AS BIGINT)
           AS cell_checksum
  FROM direct
),
mism AS (
  SELECT CAST(sum(CASE WHEN coalesce(d.cnt_d, -1) <> coalesce(m.cnt_m, -1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch_cells
  FROM direct d FULL OUTER JOIN merged m USING (row, bucket)
)
SELECT (SELECT count(DISTINCT event_type) FROM events) AS n_slices,
       n_cells, total_count, cell_checksum, n_mismatch_cells,
       n_mismatch_cells = 0 AS merge_exact
FROM direct_agg CROSS JOIN mism
"""

QUERIES["sketch_quantile_merge"] = AP.quantile_sketch_merge

# the third sketch merge contract: bin-wise SUM over integer cents —
# both routes replay exactly (integer thresholds, no interpolation)
ORACLES["sketch_quantile_merge"] = """
WITH ev AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
per_slice AS (SELECT event_type, v, count(*) AS cnt FROM ev GROUP BY event_type, v),
merged AS (SELECT v, sum(cnt) AS cnt_m FROM per_slice GROUP BY v),
direct AS (SELECT v, count(*) AS cnt_d FROM ev GROUP BY v),
mism AS (
  SELECT CAST(sum(CASE WHEN coalesce(d.cnt_d, -1) <> coalesce(m.cnt_m, -1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch_bins
  FROM direct d FULL OUTER JOIN merged m USING (v)
),
cum_m AS (SELECT v, sum(cnt_m) OVER (ORDER BY v) AS cum, sum(cnt_m) OVER () AS n FROM merged),
cum_d AS (SELECT v, sum(cnt_d) OVER (ORDER BY v) AS cum, sum(cnt_d) OVER () AS n FROM direct),
qm AS (
  SELECT CAST(max(n) AS BIGINT) AS n_rows,
         min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS p50,
         min(CASE WHEN cum >= ceil(0.9 * n) THEN v END) AS p90,
         min(CASE WHEN cum >= ceil(0.99 * n) THEN v END) AS p99
  FROM cum_m
),
qd AS (
  SELECT min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS p50,
         min(CASE WHEN cum >= ceil(0.9 * n) THEN v END) AS p90,
         min(CASE WHEN cum >= ceil(0.99 * n) THEN v END) AS p99
  FROM cum_d
)
SELECT (SELECT count(DISTINCT event_type) FROM events) AS n_slices,
       (SELECT count(*) FROM direct) AS n_bins,
       qm.n_rows AS n_rows,
       CAST(qm.p50 AS DOUBLE) / 100.0 AS p50,
       CAST(qm.p90 AS DOUBLE) / 100.0 AS p90,
       CAST(qm.p99 AS DOUBLE) / 100.0 AS p99,
       mism.n_mismatch_bins,
       mism.n_mismatch_bins = 0 AS merge_exact,
       qm.p50 = qd.p50 AND qm.p90 = qd.p90 AND qm.p99 = qd.p99 AS quantiles_equal
FROM qm CROSS JOIN qd CROSS JOIN mism
"""

QUERIES["sketch_hll_distinct"] = AP.hll_distinct

# full HLL replay (r3): bucket/rank/register/estimator arithmetic is
# integer + exact-dyadic doubles end to end (operators/approx.hll_distinct),
# so the ESTIMATE — not just an error flag — value-hashes across engines.
_RHO = " + ".join(
    f"CASE WHEN rest < {1 << (AP.HLL_REST_BITS - i)} THEN 1 ELSE 0 END"
    for i in range(1, AP.HLL_REST_BITS + 1)
)
_HLL_ALPHA = f"0.7213 / (1.0 + 1.079 / {AP.HLL_M}.0)"
ORACLES["sketch_hll_distinct"] = f"""
WITH h1 AS (
  SELECT event_type,
         ((user_id % {AP.CMS_P}) * {AP.HLL_A} + {AP.HLL_B}) % {AP.CMS_P} AS h1
  FROM events
),
h2 AS (
  SELECT event_type,
         (((h1 * h1) % {AP.CMS_P}) * {AP.HLL_A2} + {AP.HLL_B2}) % {AP.CMS_P} AS h
  FROM h1
),
hashed AS (
  SELECT event_type,
         h % {AP.HLL_M} AS bucket,
         ({_RHO}) + 1 AS rho
  FROM (SELECT event_type, h, h // {AP.HLL_M} AS rest FROM h2)
),
regs AS (SELECT event_type, bucket, max(rho) AS reg FROM hashed GROUP BY event_type, bucket),
per_type AS (
  SELECT event_type, count(*) AS n_buckets,
         sum(1.0 / (1::BIGINT << reg)) AS s
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type,
         CAST({AP.HLL_M} - n_buckets AS DOUBLE) AS zeros,
         ({_HLL_ALPHA}) * {AP.HLL_M} * {AP.HLL_M} / (s + ({AP.HLL_M} - n_buckets)) AS raw
  FROM per_type
),
final_est AS (
  SELECT event_type,
         CASE WHEN raw <= 2.5 * {AP.HLL_M} AND zeros > 0
              THEN ([{AP.HLL_LC_VALUES}]::DOUBLE[])[CAST(zeros AS INT)]
              ELSE floor(raw * 10000) / 10000 END AS hll_est
  FROM est
),
exact AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY event_type)
SELECT x.event_type, x.n_exact, f.hll_est,
       floor(abs(f.hll_est - x.n_exact) / x.n_exact * 1000000) / 1000000 AS rel_err,
       abs(f.hll_est - x.n_exact) / x.n_exact <= {AP.HLL_REL_ERR} AS hll_ok
FROM exact x JOIN final_est f USING (event_type)
ORDER BY x.event_type
"""

QUERIES["sample_weighted_pps"] = AP.sample_weighted_pps

# exact integer cross-multiplied inclusion test — no floats, so the
# sampled id-set replays bit-identically (operators/approx.sample_weighted_pps)
ORACLES["sample_weighted_pps"] = f"""
WITH weighted AS (
  SELECT doc_id, lang, length(text)::BIGINT AS weight FROM documents
),
total AS (SELECT sum(weight) AS w_total FROM weighted)
SELECT w.doc_id, w.lang, w.weight
FROM weighted w CROSS JOIN total t
WHERE ((((w.doc_id % {AP.HASH_M}) * {AP.HASH_A} + {AP.HASH_B}) % {AP.HASH_M})::DECIMAL(38,0)) * t.w_total
      < ({AP.PPS_TARGET}::DECIMAL(38,0)) * w.weight * {AP.HASH_M}
"""

QUERIES["sketch_hll_merge"] = AP.hll_merge

# register-wise merge replay: merged(per-type max) and the direct global
# registers are the same integers by max-algebra, so both estimates —
# and the merge_exact equality — value-hash across engines.
ORACLES["sketch_hll_merge"] = f"""
WITH h1 AS (
  SELECT event_type,
         ((user_id % {AP.CMS_P}) * {AP.HLL_A} + {AP.HLL_B}) % {AP.CMS_P} AS h1
  FROM events
),
h2 AS (
  SELECT event_type,
         (((h1 * h1) % {AP.CMS_P}) * {AP.HLL_A2} + {AP.HLL_B2}) % {AP.CMS_P} AS h
  FROM h1
),
hashed AS (
  SELECT event_type,
         h % {AP.HLL_M} AS bucket,
         ({_RHO}) + 1 AS rho
  FROM (SELECT event_type, h, h // {AP.HLL_M} AS rest FROM h2)
),
per_type AS (SELECT event_type, bucket, max(rho) AS reg FROM hashed GROUP BY event_type, bucket),
merged AS (SELECT bucket, max(reg) AS reg FROM per_type GROUP BY bucket),
direct AS (SELECT bucket, max(rho) AS reg FROM hashed GROUP BY bucket),
est_m AS (
  SELECT count(*) AS n_buckets, sum(1.0 / (1::BIGINT << reg)) AS s FROM merged
),
est_d AS (
  SELECT count(*) AS n_buckets, sum(1.0 / (1::BIGINT << reg)) AS s FROM direct
),
fin_m AS (
  SELECT CASE WHEN raw <= 2.5 * {AP.HLL_M} AND zeros > 0
              THEN ([{AP.HLL_LC_VALUES}]::DOUBLE[])[CAST(zeros AS INT)]
              ELSE floor(raw * 10000) / 10000 END AS est_merged
  FROM (SELECT CAST({AP.HLL_M} - n_buckets AS DOUBLE) AS zeros,
               ({_HLL_ALPHA}) * {AP.HLL_M} * {AP.HLL_M} / (s + ({AP.HLL_M} - n_buckets)) AS raw
        FROM est_m)
),
fin_d AS (
  SELECT CASE WHEN raw <= 2.5 * {AP.HLL_M} AND zeros > 0
              THEN ([{AP.HLL_LC_VALUES}]::DOUBLE[])[CAST(zeros AS INT)]
              ELSE floor(raw * 10000) / 10000 END AS est_direct
  FROM (SELECT CAST({AP.HLL_M} - n_buckets AS DOUBLE) AS zeros,
               ({_HLL_ALPHA}) * {AP.HLL_M} * {AP.HLL_M} / (s + ({AP.HLL_M} - n_buckets)) AS raw
        FROM est_d)
),
exact AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
SELECT x.n_exact, d.est_direct, m.est_merged,
       m.est_merged = d.est_direct AS merge_exact,
       floor(abs(d.est_direct - x.n_exact) / x.n_exact * 1000000) / 1000000 AS rel_err,
       abs(d.est_direct - x.n_exact) / x.n_exact <= {AP.HLL_REL_ERR} AS hll_ok
FROM exact x, fin_d d, fin_m m
"""
