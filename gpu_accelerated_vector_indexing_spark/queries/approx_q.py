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

QUERIES["sketch_cms_heavy_hitters"] = AP.cms_heavy_hitters  # rows-only (xxhash64)
