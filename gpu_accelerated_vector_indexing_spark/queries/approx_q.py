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

_HASH_U = f"((doc_id * {HASH_A} + {HASH_B}) % {HASH_M}) / {float(HASH_M)}"

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
