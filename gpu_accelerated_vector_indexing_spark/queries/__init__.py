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


# Driver-gate rotation, round 8 (VERDICT r7 "Next round" #2): the
# driver samples a ~50-query PREFIX of this registry, so registration
# order decides which queries earn a driver-written CORRECTNESS row.
# The union closed at 270/270 through r7; this round's prefix = the 6
# r8 novelties + the 9 rows r8's changes touch (the DECIMAL-fold
# promotions, the exact shard merge, the pagerank and cogroup-as-of
# rewrites, the shared curriculum-stage refactor) + kmeans_invariants
# (the ONE name whose only driver rows predate its oracle — r1/r2
# recorded it ``no_oracle``; it has carried a full value oracle since,
# so this slot records its first driver hash row) + the 37 names whose
# most recent gate is r1/r2 vintage in oldest-first order (computed
# from CORRECTNESS_r01..r07; at a strict 50-row cut the last three
# spill to the next rotation), so every name's freshest green keeps
# rotating forward.
_GATE_FIRST = [
    # --- round-8 novelties (never gated by definition)
    "engine_ivf_merge_serve", "corpus_curriculum_pack",
    "corpus_dedup_pack", "corpus_pack_shuffled",
    "corpus_snapshot_diff", "lineitem_profile",
    # --- re-confirmations: rows round-8 changes touch
    "knn_ivf_shard_merge",             # DECIMAL-exact shard merge
    "ivf_shard_state_roundtrip",       # decimal partials + n_shards memo key
    "supplier_concentration",          # DECIMAL(38,0) Σr/Σr² folds
    "curation_dsir_sample",            # DECIMAL mean-cut fold
    "dsir_state_roundtrip",            # hi/lo split digest
    "curation_dsir_score_pretrained",  # scores through the promoted fold
    "copurchase_pagerank",             # one-shuffle-per-round rewrite
    "join_asof_cogroup",               # bucketed merge_asof(by=) rewrite
    "corpus_curriculum_plan",          # curriculum_bucket_phases refactor
    # --- first driver hash row (oracle added after its r1/r2 gates)
    "kmeans_invariants",
    # --- freshness rotation: the 37 r1/r2-vintage names (oldest
    # last-green)
    "distinct_agg", "join_anti", "join_bucketed_colocate",
    "join_multiway", "join_outer", "join_semi", "scalar_subquery",
    "window_running",
    "corpus_validation", "cube_counts", "embed_and_search",
    "engine_full_probe", "filtered_scan", "having_groups",
    "hybrid_search_rrf", "hybrid_search_rrf_topn",
    "ivf_assign_incremental", "ivf_centroids", "ivf_index_stats",
    "ivf_rebalance_plan", "ivf_recall", "ivf_recall_sweep",
    "knn_with_docs", "lateral_topk", "lsh_bucket_stats", "lsh_recall",
    "mmr_rerank", "multi_query_knn", "multi_query_knn_ivf",
    "multi_query_knn_prenorm", "pricing_summary",
    "revenue_monthly_gapfill", "rollup_counts",
    "similarity_range_search", "sql_scripting_report",
    "variant_props_stats", "zorder_layout",
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
