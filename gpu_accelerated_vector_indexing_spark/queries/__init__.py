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


# Driver-gate rotation, round 9 (VERDICT r8 "Next round" #2): the
# driver samples a ~50-query PREFIX of this registry, so registration
# order decides which queries earn a driver-written CORRECTNESS row.
# The union closed at 276/276 through r8 (judge-computed, zero
# never-gated names). This round's prefix = the 4 r9 novelties (the
# CDC index-refresh composition, its accounting row, its streaming
# twin, and the compaction close) + the 12 rows r9's changes touch
# (the shared snapshot edit definition, the salted
# as-of cogroup, the DSIR oracle HUGEINT promotion, the embed-CTE
# refactor, and the graph-walk job-overhead pass) + the 3 r2-vintage
# names that spilled past r8's cut + the 34 oldest r3-vintage names
# (last-green computed from CORRECTNESS_r01..r08; at a strict 50 cut
# the last three names spill with the remaining 14 r3 names to the
# r10 rotation), so every name's freshest green keeps rotating forward.
_GATE_FIRST = [
    # --- round-9 novelties (never gated by definition)
    "index_refresh_cdc", "index_refresh_stats", "streaming_index_refresh",
    "index_refresh_compacted",
    # --- re-confirmations: rows round-9 changes touch
    "corpus_snapshot_diff",            # edit def now upper(text)||' rev2'
    "join_asof_cogroup",               # hot-bucket salt + realiased branch
    "embed_and_search",                # oracle rebuilt through embed_cte()
    "curation_dsir_sample",            # oracle r_b::HUGEINT product
    "dsir_state_roundtrip",            # ditto (hi/lo digest)
    "curation_dsir_score_pretrained",  # ditto
    "graph_engine_batch_search",       # serving-state memo + fused broadcast
    "graph_serve_after_repair",        # serving-state memo
    "graph_repair_recall",             # exact side collected once (InSet)
    "multi_query_graph_beam",          # fused pair/query broadcast
    "knn_graph_beam",                  # entry-id memo
    "knn_graph_beam_with_deletes",     # masked-walk entry-id memo
    # --- freshness rotation: 3 r2-vintage spills, then the 34 oldest
    # r3-vintage names
    "sql_scripting_report", "variant_props_stats", "zorder_layout",
    "ann_method_comparison", "contrastive_triplets",
    "copurchase_triangles", "corpus_clean_manifest", "corpus_integrity",
    "corpus_pack_sequences", "corpus_shard_manifest",
    "curation_decontaminate", "curation_decontaminate_semantic",
    "curation_domain_cap", "curation_nb_language",
    "curation_quality_filter", "curation_repetition_signals",
    "dedup_embedding_topk", "dedup_exact_summary",
    "dedup_incremental_batch", "dedup_jaccard_verified_lsh",
    "dedup_minhash_lsh", "dedup_state_roundtrip",
    "dedup_substring_spans", "embedding_drift", "ivf_centroid_refresh",
    "ivf_delete_compact", "join_asof", "knn_chunk_pooled", "knn_ivf_pq",
    "knn_ivf_pq_residual", "knn_matryoshka", "knn_maxsim", "knn_pq",
    "knn_with_deletes", "quantiles_histogram", "refshape_search_bq",
    "refshape_search_cli",
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
