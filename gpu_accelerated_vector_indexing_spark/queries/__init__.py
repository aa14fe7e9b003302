"""Named query registry: every operator the engine claims is here.

Each family module exposes
  QUERIES: dict[name, Callable[[SparkSession, str], DataFrame]]
  ORACLES: dict[name, str]      # DuckDB ANSI SQL; omit → rows-only check

The driver contract (``__spark_entry__.py``) merges all families.
Column names are aliased identically in the Spark code and the oracle
SQL — the driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Driver-gate rotation, round 7 (VERDICT r6 "Next round" #8): the
# driver samples a ~50-query PREFIX of this registry, so registration
# order decides which queries earn a driver-written CORRECTNESS row.
# The union closed at 247/247 in r6; this round's 50 = the 16 r7
# novelties + the 10 rows r7's changes touch (the fuzzy rewrite, the
# fixpoint-kernel diff filter, the batched-walk chunking, the shared
# DSIR model CTE refactor, the SQ4 margin contract) + 24 of the names
# whose most recent gate is r1/r2 vintage (computed against
# CORRECTNESS_r01..r06), so every name's freshest green keeps
# rotating forward.
_GATE_FIRST = [
    # --- round-7 novelties (never gated by definition)
    "retrieval_ndcg", "knn_ivf_shard_merge", "graph_shard_merge_search",
    "corpus_curriculum_plan", "graph_retrieval_ndcg",
    "ivf_shard_state_roundtrip", "graph_merge_serve",
    "events_cusum_changepoint", "dedup_containment", "embedding_outliers",
    "streaming_outlier_alerts", "join_asof_tolerance", "corpus_ngram_novelty",
    "knn_ivf_adaptive", "orders_rfm_segments",
    "ivf_adaptive_sweep", "supplier_concentration",
    "graph_serve_after_repair", "dsir_state_roundtrip",
    "curation_dsir_score_pretrained", "graph_repair_recall",
    "text_typo_pairs", "text_typo_clusters",
    # --- re-confirmations: rows round-7 changes touch
    "fuzzy_customer_pairs",            # deletion-neighborhood rewrite
    "graph_relink_after_deletes",      # relink_edges refactor
    "graph_engine_batch_search",       # chunked search_batch
    "curation_dsir_sample",            # shared model-CTE oracle refactor
    "streaming_dsir_score",
    "dedup_components",                # fixpoint ckpt-diff filter + lock
    "dedup_semantic_graph",
    "dedup_keep_canonical",
    "knn_sq4", "knn_ivf_sq4",          # margin-headroom contract
    # --- freshness rotation: r1/r2-vintage names (oldest last-green)
    "knn_bruteforce", "knn_bruteforce_pandas", "knn_ivf_combined",
    "knn_ivf_sequential", "knn_ivf_np1", "knn_ivf_np5", "knn_ivf_np10",
    "knn_lsh", "knn_sq8", "knn_ivf_sq8", "knn_bq", "knn_ivf_bq",
    "knn_prenorm", "knn_ivf_prenorm", "knn_filtered", "knn_ivf_filtered",
    "knn_per_cluster_topk",
]


def merged() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from gpu_accelerated_vector_indexing_spark.queries import (
        approx_q,
        curation_q,
        dedup_q,
        graph_ann_q,
        ivf_q,
        knn_q,
        lsh_q,
        modern_q,
        multimodal_q,
        refshape_q,
        relational_q,
        streaming_q,
        temporal_q,
        text_q,
        udx_q,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (
        knn_q,
        ivf_q,
        refshape_q,
        lsh_q,
        modern_q,
        relational_q,
        temporal_q,
        approx_q,
        curation_q,
        dedup_q,
        graph_ann_q,
        text_q,
        multimodal_q,
        streaming_q,
        udx_q,
    ):
        overlap = queries.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    missing = oracles.keys() - queries.keys()
    if missing:
        raise ValueError(f"oracle without query: {missing}")
    unknown = [n for n in _GATE_FIRST if n not in queries]
    if unknown:
        # a silent skip would quietly forfeit that family's curated
        # gate slot — the exact drift this list exists to prevent
        raise ValueError(f"_GATE_FIRST names not in registry: {unknown}")
    ordered = {n: queries[n] for n in _GATE_FIRST}
    ordered.update(queries)
    return ordered, oracles
