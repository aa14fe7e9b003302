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


# Driver-gate rotation, round 4 (VERDICT r3 "Next round" #1): the
# driver samples a ~50-query PREFIX of this registry, so registration
# order decides which queries earn a driver-written CORRECTNESS row.
# After r1-r3 the gated union is 105/199; the names below lead with
# the round-4 novelties, then ALL 94 never-gated queries (flagships
# VERDICT names first), so this round's sample comes entirely from the
# never-gated set and the union crosses 150. Already-green legacy
# names follow in merged()'s natural order. Rotate again next round.
_GATE_FIRST = [
    "graph_ann_build", "knn_graph_beam", "knn_graph_beam_bq",
    "knn_graph_beam_filtered", "knn_graph_beam_with_deletes",
    "graph_state_roundtrip", "graph_search_with_docs", "graph_recall_sweep",
    "streaming_graph_attach", "graph_ann_recall", "ann_compression_error",
    "filtered_method_recall", "copurchase_kcore",
    "corpus_compaction_plan", "sample_split_leakage_safe", "graph_ann_insert",
    "dedup_corpus_overlap", "curation_temperature_mix", "sketch_hll_merge",
    "events_sequence_dataset", "text_zipf_profile", "streaming_hll_merge",
    "join_asof_forward", "knn_ivf_matryoshka", "pq_state_roundtrip",
    "dedup_substring_spans_hashed", "refshape_kmeans_invariants",
    "events_mad_outliers", "stats_exact_moments", "join_range_bucketed",
    "events_funnel", "scd2_user_state", "streaming_sessions",
    "streaming_interval_join", "text_tfidf_top", "text_winnow",
    "multimodal_features", "sketch_cms_heavy_hitters", "dedup_simhash_pairs",
    "curation_pii_redact", "merge_upsert_latest", "copurchase_lift",
    "events_cohort_retention", "events_tumbling", "streaming_sliding",
    "streaming_dedup", "udtf_sentences", "curation_mix_rebalance",
    "dedup_exact_keep", "dedup_keep_canonical", "dedup_ngram_jaccard",
    "curation_decontaminate_hashed", "events_rollup_hierarchy",
    "events_trailing_window", "join_interval", "events_zscore_outliers",
    "events_transition_matrix", "join_asof_cogroup", "incremental_agg_merge",
    "skew_salted_agg", "grouping_sets", "events_sliding",
    "events_sessionize", "streaming_stream_static",
    "streaming_foreach_upsert", "window_topk_per_group", "window_lag_frames",
    "window_distribution", "percentile_summary", "set_operations",
    "string_functions", "date_functions", "math_functions",
    "array_functions", "json_functions", "map_functions", "case_bucketing",
    "pivot_status", "join_bloom_pruned", "shipping_priority",
    "exists_late_shipment", "large_volume_orders", "disjunctive_revenue",
    "bilateral_trade_volume", "local_supplier_volume", "revenue_forecast",
    "returned_item_revenue", "promo_revenue", "small_quantity_revenue",
    "dormant_rich_customers", "customer_order_distribution",
    "top_revenue_suppliers", "cheapest_supplier_per_part",
    "null_safe_semantics", "fuzzy_customer_pairs", "window_topk_with_ties",
    "events_value_histogram", "market_share", "copurchase_part_pairs",
    "supplier_ship_delay", "profit_by_nation_year", "important_part_value",
    "ship_delay_priority", "parts_supplier_count",
    "excess_inventory_suppliers", "unpivot_flag_measures", "listagg_nations",
    "try_arithmetic_summary", "sketch_functions", "sample_train_split",
    "sample_stratified", "text_stats", "text_lang_id", "text_vocab_top",
    "text_fingerprints", "text_token_count", "corpus_pipeline",
    "text_bigram_logprob", "corpus_chunks", "multimodal_frames",
    "multimodal_meta",
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
